"""Redshift-style DDL + JSONPaths generation from JSON Schemas.

Reference: the ``ddl`` command pipeline (SURVEY.md §3.3 —
DdlCommand.scala:66-161, RedshiftMigration.scala:77-109, type mapping
documented at README.md:256-270: uuid -> CHAR(36), ipv4 -> VARCHAR(14),
date-time -> TIMESTAMP, etc.). Driver-side pure string templating over
the tiny flattened schema; no Spark involvement (as in the reference).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

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


def sql_type(prop: dict) -> str:
    """JSON Schema property -> SQL column type (schema-ddl behavior)."""
    t = prop.get("type")
    types = t if isinstance(t, list) else [t]
    types = [x for x in types if x != "null"]
    if len(types) != 1:
        return "VARCHAR(4096)"  # product/unknown -> widest
    t = types[0]
    if t == "string":
        fmt = prop.get("format")
        if fmt in _FORMAT_TYPES:
            return _FORMAT_TYPES[fmt]
        if prop.get("enum"):
            width = max(len(str(v)) for v in prop["enum"])
            return f"VARCHAR({max(width, 1)})"
        ml = prop.get("maxLength")
        return f"VARCHAR({ml})" if ml else "VARCHAR(4096)"
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
    return "VARCHAR(4096)"


def table_ddl(json_schema: dict, vendor: str, name: str,
              schema_name: str = "atomic",
              version: str = "1-0-0") -> str:
    """CREATE TABLE DDL from a (possibly nested) JSON Schema — nested
    paths flattened to snake_case columns in property order
    (DdlCommand.scala:94-161)."""
    flat = flatten_properties(json_schema)
    table = f"{schema_name}.{_snakify(vendor)}_{_snakify(name)}_{SchemaVer.parse(version).model}"
    required = set(json_schema.get("required", []))
    cols = []
    for path, prop in flat.items():
        col = _snakify(path)
        null = " NOT NULL" if path in required else ""
        cols.append(f'    "{col}" {sql_type(prop)}{null}')
    body = ",\n".join(cols)
    return (f"CREATE TABLE IF NOT EXISTS {table} (\n{body}\n)\n"
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
                  schema_name: str = "atomic") -> Dict[str, str]:
    """The sql/vendor/name/... output layout (DdlCommand.scala:251-268,
    Migrations.scala:244-256) as a {relative_path: content} dict —
    callers write it wherever (K5)."""
    out: Dict[str, str] = {}
    for vendor, name, ver, schema in versions:
        sv = SchemaVer.parse(ver)
        out[f"sql/{vendor}/{name}_{sv.model}.sql"] = table_ddl(
            schema, vendor, name, schema_name, ver)
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
