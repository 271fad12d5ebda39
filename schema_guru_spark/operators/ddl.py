"""Redshift-style DDL + JSONPaths generation from JSON Schemas.

Reference: the ``ddl`` command pipeline (SURVEY.md §3.3 —
DdlCommand.scala:66-161, RedshiftMigration.scala:77-109, type mapping
documented at README.md:256-270: uuid -> CHAR(36), ipv4 -> VARCHAR(14),
date-time -> TIMESTAMP, etc.). Driver-side pure string templating over
the tiny flattened schema; no Spark involvement (as in the reference).
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
        if mx is not None:
            if mx <= 32767:
                return "SMALLINT"
            if mx <= 2147483647:
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


def table_ddl(json_schema: dict, vendor: str, name: str,
              schema_name: str = "atomic",
              version: str = "1-0-0", varchar_size: int = 4096,
              split_product: bool = False,
              no_header: bool = False) -> str:
    """CREATE TABLE DDL from a (possibly nested) JSON Schema — nested
    paths flattened to snake_case columns in property order
    (DdlCommand.scala:94-161). Header comment suppressed by
    ``no_header`` (DdlCommand.scala:229)."""
    flat = flatten_properties(json_schema)
    prefix = f"{_snakify(vendor)}_" if vendor else ""
    table = f"{schema_name}.{prefix}{_snakify(name)}_{SchemaVer.parse(version).model}"
    required = set(json_schema.get("required", []))
    cols = []
    for path, prop in flat.items():
        col = _snakify(path)
        null = " NOT NULL" if path in required else ""
        for suffix, typ in _column_types(prop, varchar_size, split_product):
            cols.append(f'    "{col}{suffix}" {typ}{null}')
    body = ",\n".join(cols)
    header = "" if no_header else DDL_HEADER + "\n"
    return header + (
        f"CREATE TABLE IF NOT EXISTS {table} (\n{body}\n)\n"
        f"DISTSTYLE KEY\nSORTKEY (\"{cols and _snakify(next(iter(flat)))}\");"
        if cols else f"CREATE TABLE IF NOT EXISTS {table} ();")


def jsonpaths(json_schema: dict) -> List[str]:
    """JSONPaths file entries, one per flattened column, in DDL column
    order (DdlCommand.scala:94-161)."""
    return [f"$.{path}" for path in flatten_properties(json_schema)]


def migration_sql(m: Migration, json_schema_target: dict,
                  schema_name: str = "atomic") -> str:
    """ALTER TABLE ADD COLUMN statements for one migration
    (RedshiftMigration.scala:77-109). Columns appended AFTER the
    originals in target order — O2's stable ordering
    (DdlCommand.scala:328-336)."""
    flat = flatten_properties(json_schema_target)
    table = f"{schema_name}.{_snakify(m.vendor)}_{_snakify(m.name)}_{m.to_ver.model}"
    stmts = [
        f'ALTER TABLE {table}\n    ADD COLUMN "{_snakify(path)}" '
        f"{sql_type(flat[path])};"
        for path in m.added if path in flat
    ]
    header = (f"-- Migration of {m.vendor}/{m.name} from {m.from_ver} "
              f"to {m.to_ver}")
    return "\n".join([header] + stmts) if stmts else header + "\n-- no-op"


def ddl_file_tree(versions: List[Tuple[str, str, str, dict]],
                  schema_name: str = "atomic",
                  varchar_size: int = 4096,
                  with_json_paths: bool = True,
                  split_product: bool = False,
                  no_header: bool = False) -> Dict[str, str]:
    """The sql/vendor/name/... output layout (DdlCommand.scala:251-268,
    Migrations.scala:244-256) as a {relative_path: content} dict —
    callers write it wherever (K5). ``with_json_paths`` gates the
    jsonpaths/ files (reference --with-json-paths, off by default in
    the reference CLI; kept on here for API compatibility)."""
    out: Dict[str, str] = {}
    for vendor, name, ver, schema in versions:
        sv = SchemaVer.parse(ver)
        out[f"sql/{vendor}/{name}_{sv.model}.sql"] = table_ddl(
            schema, vendor, name, schema_name, ver,
            varchar_size=varchar_size, split_product=split_product,
            no_header=no_header)
        if not with_json_paths:
            continue
        out[f"jsonpaths/{vendor}/{name}_{sv.model}.json"] = "\n".join(
            ['{', '    "jsonpaths": ['] +
            [f'        "{p}",' for p in jsonpaths(schema)[:-1]] +
            ([f'        "{jsonpaths(schema)[-1]}"'] if jsonpaths(schema) else []) +
            ['    ]', '}'])
    by_ver = {(v, n, ver): s for v, n, ver, s in versions}
    for m in build_migration_matrix(versions):
        target = by_ver[(m.vendor, m.name, str(m.to_ver))]
        out[f"sql/{m.vendor}/migrate_{m.name}_{m.from_ver}_to_{m.to_ver}.sql"] = \
            migration_sql(m, target, schema_name)
    return out
