"""SchemaVer ordering + migration diffs between schema versions.

Reference: Migrations.scala (SURVEY.md §2 O1/SET1-3, §3.3):
  - SchemaVer "model-revision-addition" parse (Common.scala:202-212, F6)
  - version ordering by addition (Migrations.scala:54,158 — O1)
  - added keys: current.keys diff previous.keys, order preserving
    (Migrations.scala:117-122 — SET1)
  - removed keys (Migrations.scala:106 — SET2)
  - modified properties (Migrations.scala:133-136 — SET3)
  - group-by-revision-criterion + source->target chains
    (Migrations.scala:67-68,157-181)

Driver-side structures (schemas are tiny); the DataFrame analogs for key
diffs live in operators/stats.py (keys_diff) for when key sets are big.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Dict, List, Tuple

SCHEMAVER_RE = re.compile(r"^([0-9]+)-([0-9]+)-([0-9]+)$")


@dataclass(frozen=True, order=True)
class SchemaVer:
    model: int
    revision: int
    addition: int

    @staticmethod
    def parse(s: str) -> "SchemaVer":
        m = SCHEMAVER_RE.match(s)
        if not m:
            raise ValueError(f"invalid SchemaVer: {s!r}")
        return SchemaVer(*(int(g) for g in m.groups()))

    def __str__(self) -> str:
        return f"{self.model}-{self.revision}-{self.addition}"


def flatten_properties(json_schema: dict, prefix: str = "") -> Dict[str, dict]:
    """JSON Schema -> ordered flat property map, dotted paths (the
    FlatSchema/PropertyList IR of the reference's schema-ddl step,
    package.scala:70)."""
    out: Dict[str, dict] = {}
    props = json_schema.get("properties", {})
    for k, v in props.items():
        path = f"{prefix}{k}"
        t = v.get("type")
        types = t if isinstance(t, list) else [t]
        # recurse into anything object-shaped: the engine's own render
        # emits type ["object","null"] for sometimes-null objects (a
        # product of obj+null), and schemas may omit "type" entirely —
        # keying off the string "object" alone silently collapsed such
        # subtrees into one VARCHAR leaf (r05 review)
        if "properties" in v and (t is None or "object" in types):
            out.update(flatten_properties(v, prefix=f"{path}."))
        else:
            out[path] = {kk: vv for kk, vv in v.items() if kk != "properties"}
    return out


def added_keys(source: dict, target: dict) -> List[str]:
    """SET1: keys in target missing from source, target order preserved
    (Migrations.scala:117-122)."""
    s = set(flatten_properties(source))
    return [k for k in flatten_properties(target) if k not in s]


def removed_keys(source: dict, target: dict) -> List[str]:
    """SET2 (Migrations.scala:106)."""
    t = set(flatten_properties(target))
    return [k for k in flatten_properties(source) if k not in t]


def modified_properties(source: dict, target: dict) -> List[str]:
    """SET3: keys present in both whose property maps differ
    (Migrations.scala:133-136)."""
    fs, ft = flatten_properties(source), flatten_properties(target)
    return [k for k in ft if k in fs and fs[k] != ft[k]]


@dataclass
class Migration:
    vendor: str
    name: str
    from_ver: SchemaVer
    to_ver: SchemaVer
    added: List[str]
    removed: List[str]
    modified: List[str]


def build_migration_matrix(
    versions: List[Tuple[str, str, str, dict]],
) -> List[Migration]:
    """All source->target chains within each (vendor, name, model) —
    the reference's buildMigrationMap (Migrations.scala:225-234):
    enumerate ordered pairs of versions (Migrations.scala:157-181)."""
    groups: Dict[Tuple[str, str, int], List[Tuple[SchemaVer, dict]]] = {}
    for vendor, name, ver, schema in versions:
        sv = SchemaVer.parse(ver)
        groups.setdefault((vendor, name, sv.model), []).append((sv, schema))
    out: List[Migration] = []
    for (vendor, name, _model), items in sorted(groups.items()):
        items.sort(key=lambda t: t[0])  # O1: SchemaVer ordering
        for i, (sv_a, sch_a) in enumerate(items):
            for sv_b, sch_b in items[i + 1:]:
                out.append(Migration(
                    vendor, name, sv_a, sv_b,
                    added=added_keys(sch_a, sch_b),
                    removed=removed_keys(sch_a, sch_b),
                    modified=modified_properties(sch_a, sch_b),
                ))
    return out


def describe(schema: dict, vendor: str, name: str,
             version: str = "1-0-0") -> dict:
    """Self-describing schema header (Common.scala:101-134): wrap a JSON
    Schema with the self-describing envelope."""
    return {
        "$schema": ("http://iglucentral.com/schemas/com.snowplowanalytics"
                    ".self-desc/schema/jsonschema/1-0-0#"),
        "self": {
            "vendor": vendor,
            "name": name,
            "format": "jsonschema",
            "version": str(SchemaVer.parse(version)),
        },
        **schema,
    }


def latest_per_model(
    versions: List[Tuple[str, str, str]],
) -> Dict[Tuple[str, str, int], SchemaVer]:
    """G3 (DdlCommand.scala:374-389): per (vendor, name, model) keep the
    max (revision, addition)."""
    best: Dict[Tuple[str, str, int], SchemaVer] = {}
    for vendor, name, ver in versions:
        sv = SchemaVer.parse(ver)
        key = (vendor, name, sv.model)
        if key not in best or (sv.revision, sv.addition) > (
                best[key].revision, best[key].addition):
            best[key] = sv
    return best
