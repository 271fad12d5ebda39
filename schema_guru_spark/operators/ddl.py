"""Redshift-style DDL + JSONPaths generation from JSON Schemas.

Reference: the ``ddl`` command pipeline (SURVEY.md §3.3 —
DdlCommand.scala:66-161, RedshiftMigration.scala:77-109, type mapping
documented at README.md:256-270: uuid -> CHAR(36), ipv4 -> VARCHAR(14),
date-time -> TIMESTAMP, etc.). Driver-side pure string templating over
the tiny flattened schema; no Spark involvement (as in the reference).

Two output modes, as in the reference (DdlCommand.scala:79,
transformSelfDescribing vs transformRaw):

* non-raw (default): inputs are self-describing schemas; the table gets
  the Snowplow envelope columns (schema_vendor..ref_parent), a FOREIGN
  KEY to atomic.events, DISTSTYLE KEY / DISTKEY (root_id) /
  SORTKEY (root_tstamp), an iglu-URI table comment, and the JSONPaths
  file is prefixed with the $.schema.* / $.hierarchy.* entries with data
  columns under $.data.* (schema-ddl RedshiftDdlGenerator /
  JsonPathGenerator behavior).
* raw (--raw-mode): plain JSON Schemas — columns only, no envelope, no
  dist/sort keys (root_id does not exist), no migrations
  (DdlCommand.scala:166-171: "we cannot produce migrations ... for raw
  DDL"), JSONPaths entries are plain $.path.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from schema_guru_spark.operators.migrations import (
    Migration, SchemaVer, build_migration_matrix, flatten_properties,
)

# format -> SQL type (reference README.md:256-270)
_FORMAT_TYPES = {
    "uuid": "CHAR(36)",
    "ipv4": "VARCHAR(14)",
    "ipv6": "VARCHAR(39)",
    "date-time": "TIMESTAMP",
    "uri": "VARCHAR(8192)",
}


def _snakify(name: str) -> str:
    import re
    return re.sub(r"([^A-Z_])([A-Z])", r"\1_\2", name).lower().replace(".", "_")


def sql_type(prop: dict, varchar_size: int = 4096) -> str:
    """JSON Schema property -> SQL column type (schema-ddl behavior).
    ``varchar_size`` is the default width for strings without a
    maxLength (reference --varchar-size, DdlCommand.scala:151-155)."""
    t = prop.get("type")
    types = t if isinstance(t, list) else [t]
    types = [x for x in types if x != "null"]
    if len(types) != 1:
        return f"VARCHAR({varchar_size})"  # product/unknown -> widest
    t = types[0]
    if t == "string":
        fmt = prop.get("format")
        if fmt in _FORMAT_TYPES:
            return _FORMAT_TYPES[fmt]
        if prop.get("enum"):
            width = max(len(str(v)) for v in prop["enum"])
            return f"VARCHAR({max(width, 1)})"
        ml = prop.get("maxLength")
        return f"VARCHAR({ml})" if ml else f"VARCHAR({varchar_size})"
    if t == "integer":
        mx = prop.get("maximum")
        mn = prop.get("minimum")
        # BOTH bounds must fit the narrower type: the ddl command accepts
        # arbitrary schemas from disk, where a large negative minimum can
        # pair with a small maximum (r05 review)
        if mx is not None:
            if mx <= 32767 and (mn is None or mn >= -32768):
                return "SMALLINT"
            if mx <= 2147483647 and (mn is None or mn >= -2147483648):
                return "INT"
        return "BIGINT"
    if t == "number":
        return "DOUBLE PRECISION"
    if t == "boolean":
        return "BOOLEAN"
    return f"VARCHAR({varchar_size})"


DDL_HEADER = """-- AUTO-GENERATED. Generation accuracy is not guaranteed.
-- Please refer to the original JSON Schema before editing.
"""

# Snowplow envelope: self-describing + parentage columns prepended to
# every non-raw table (schema-ddl RedshiftDdlGenerator
# selfDescSchemaColumns/parentageColumns); the shredder fills these.
_ENVELOPE_COLUMNS = [
    '"schema_vendor" VARCHAR(128) ENCODE RUNLENGTH NOT NULL',
    '"schema_name" VARCHAR(128) ENCODE RUNLENGTH NOT NULL',
    '"schema_format" VARCHAR(128) ENCODE RUNLENGTH NOT NULL',
    '"schema_version" VARCHAR(128) ENCODE RUNLENGTH NOT NULL',
    '"root_id" CHAR(36) ENCODE RAW NOT NULL',
    '"root_tstamp" TIMESTAMP ENCODE LZO NOT NULL',
    '"ref_root" VARCHAR(255) ENCODE RUNLENGTH NOT NULL',
    '"ref_tree" VARCHAR(1500) ENCODE RUNLENGTH NOT NULL',
    '"ref_parent" VARCHAR(255) ENCODE RUNLENGTH NOT NULL',
]
_ENVELOPE_JSONPATHS = [
    "$.schema.vendor", "$.schema.name", "$.schema.format",
    "$.schema.version", "$.hierarchy.rootId", "$.hierarchy.rootTstamp",
    "$.hierarchy.refRoot", "$.hierarchy.refTree", "$.hierarchy.refParent",
]


def _column_types(prop: dict, varchar_size: int,
                  split_product: bool) -> List[Tuple[str, str]]:
    """(suffix, sql_type) pairs for one property. With split_product
    (reference --split-product, DdlCommand.scala:164-167) a product
    type like ["string","integer"] becomes one column per kind,
    suffixed _string/_integer; otherwise one widest column."""
    t = prop.get("type")
    types = [x for x in (t if isinstance(t, list) else [t]) if x != "null"]
    if split_product and len(types) > 1:
        return [(f"_{x}", sql_type({**prop, "type": x}, varchar_size))
                for x in types]
    return [("", sql_type(prop, varchar_size))]


def _table_name(vendor: str, name: str, schema_name: str,
                version: str) -> str:
    prefix = f"{_snakify(vendor)}_" if vendor else ""
    model = SchemaVer.parse(version).model
    qualified = f"{prefix}{_snakify(name)}_{model}"
    return f"{schema_name}.{qualified}" if schema_name else qualified


def table_ddl(json_schema: dict, vendor: str, name: str,
              schema_name: str = "atomic",
              version: str = "1-0-0", varchar_size: int = 4096,
              split_product: bool = False,
              no_header: bool = False,
              raw_mode: bool = False) -> str:
    """CREATE TABLE DDL from a (possibly nested) JSON Schema — nested
    paths flattened to snake_case columns in property order
    (DdlCommand.scala:94-161). Header comment suppressed by
    ``no_header`` (DdlCommand.scala:229). Layout mirrors the reference's
    makeDdlFile (DdlCommand.scala:229-237): header, CREATE SCHEMA,
    CREATE TABLE, COMMENT ON TABLE."""
    flat = flatten_properties(json_schema)
    table = _table_name(vendor, name, schema_name, version)
    required = set(json_schema.get("required", []))
    cols = [] if raw_mode else list(_ENVELOPE_COLUMNS)
    for path, prop in flat.items():
        col = _snakify(path)
        null = " NOT NULL" if path in required else ""
        for suffix, typ in _column_types(prop, varchar_size, split_product):
            cols.append(f'"{col}{suffix}" {typ}{null}')
    body = ",\n".join(f"    {c}" for c in cols)
    header = "" if no_header else DDL_HEADER + "\n"
    schema_create = (f"CREATE SCHEMA IF NOT EXISTS {schema_name};\n\n"
                     if schema_name else "")
    if raw_mode:
        # raw tables have no root_id/root_tstamp: no FK, no dist/sort
        create = (f"CREATE TABLE IF NOT EXISTS {table} (\n{body}\n);"
                  if cols else f"CREATE TABLE IF NOT EXISTS {table} ();")
        comment_text = table.split(".")[-1]
    else:
        fk_target = f"{schema_name or 'atomic'}.events"
        create = (
            f"CREATE TABLE IF NOT EXISTS {table} (\n{body},\n"
            f"    FOREIGN KEY (root_id) REFERENCES {fk_target}(event_id)\n)\n"
            "DISTSTYLE KEY\nDISTKEY (root_id)\nSORTKEY (root_tstamp);")
        comment_text = (f"iglu:{vendor or 'com.unknown'}/{name}/jsonschema/"
                        f"{SchemaVer.parse(version)}")
    comment = f"\n\nCOMMENT ON TABLE {table} IS '{comment_text}';"
    return header + schema_create + create + comment


def jsonpaths(json_schema: dict, raw_mode: bool = True) -> List[str]:
    """JSONPaths file entries, one per flattened column, in DDL column
    order (DdlCommand.scala:94-161). Non-raw mode prepends the envelope
    paths and nests data columns under $.data (schema-ddl
    JsonPathGenerator.getJsonPathsFile)."""
    flat = flatten_properties(json_schema)
    if raw_mode:
        return [f"$.{path}" for path in flat]
    return _ENVELOPE_JSONPATHS + [f"$.data.{path}" for path in flat]


def migration_sql(m: Migration, json_schema_target: dict,
                  schema_name: str = "atomic",
                  varchar_size: int = 4096,
                  split_product: bool = False) -> str:
    """ALTER TABLE ADD COLUMN statements for one migration
    (RedshiftMigration.scala:77-109). Columns appended AFTER the
    originals in target order — O2's stable ordering
    (DdlCommand.scala:328-336). ``varchar_size``/``split_product``
    must match the CREATE TABLE options so migrated and freshly-created
    tables agree on column types (r05 review)."""
    flat = flatten_properties(json_schema_target)
    table = _table_name(m.vendor, m.name, schema_name, str(m.to_ver))
    stmts = [
        f'ALTER TABLE {table}\n    ADD COLUMN "{_snakify(path)}{suffix}" '
        f"{typ};"
        for path in m.added if path in flat
        for suffix, typ in _column_types(flat[path], varchar_size,
                                         split_product)
    ]
    header = (f"-- Migration of {m.vendor}/{m.name} from {m.from_ver} "
              f"to {m.to_ver}")
    return "\n".join([header] + stmts) if stmts else header + "\n-- no-op"


def ddl_file_tree(versions: List[Tuple[str, str, str, dict]],
                  schema_name: str = "atomic",
                  varchar_size: int = 4096,
                  with_json_paths: bool = True,
                  split_product: bool = False,
                  no_header: bool = False,
                  raw_mode: bool = False) -> Dict[str, str]:
    """The sql/vendor/name/... output layout (DdlCommand.scala:251-268,
    Migrations.scala:244-256) as a {relative_path: content} dict —
    callers write it wherever (K5). ``with_json_paths`` gates the
    jsonpaths/ files (reference --with-json-paths, off by default in
    the reference CLI; kept on here for API compatibility). Raw mode
    emits no migrations (DdlCommand.scala:166-171)."""
    out: Dict[str, str] = {}
    for vendor, name, ver, schema in versions:
        sv = SchemaVer.parse(ver)
        # raw schemas have no vendor: files sit at the tree root
        # (produceRawTable path ".", DdlCommand.scala:221)
        vdir = f"{vendor}/" if vendor else ""
        out[f"sql/{vdir}{name}_{sv.model}.sql"] = table_ddl(
            schema, vendor, name, schema_name, ver,
            varchar_size=varchar_size, split_product=split_product,
            no_header=no_header, raw_mode=raw_mode)
        if not with_json_paths:
            continue
        paths = jsonpaths(schema, raw_mode=raw_mode)
        out[f"jsonpaths/{vdir}{name}_{sv.model}.json"] = "\n".join(
            ['{', '    "jsonpaths": ['] +
            [f'        "{p}",' for p in paths[:-1]] +
            ([f'        "{paths[-1]}"'] if paths else []) +
            ['    ]', '}'])
    if raw_mode:
        return out
    # canonical SchemaVer keys: '1-0-01' parses to the same version as
    # '1-0-1', and the migration matrix reports canonical strings
    by_ver = {(v, n, str(SchemaVer.parse(ver))): s
              for v, n, ver, s in versions}
    for m in build_migration_matrix(versions):
        target = by_ver[(m.vendor, m.name, str(m.to_ver))]
        out[f"sql/{m.vendor}/migrate_{m.name}_{m.from_ver}_to_{m.to_ver}.sql"] = \
            migration_sql(m, target, schema_name,
                          varchar_size=varchar_size,
                          split_product=split_product)
    return out
