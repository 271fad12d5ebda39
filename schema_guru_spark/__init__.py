"""schema_guru_spark — a PySpark-native schema-inference + constraint-validation engine.

Brand-new engine with the query/data-processing capabilities of
snowplow-archive/schema-guru (reference at /root/reference, cited by
file:line in docstrings), re-expressed Spark-first:

- ``core``       pure-Python micro-schema kernel (derive / merge monoid /
                 transforms / format detectors) — picklable, executor-portable.
- ``operators``  Spark DataFrame operators: distributed schema inference,
                 flat column statistics, constraint suite (uniqueness,
                 referential integrity, distribution drift), deduplication,
                 similarity search, text analysis, segmentation.
- ``sources``    readers + the deterministic synthetic repo table
                 (repo, path, commit, lang, content).
- ``functions``  scalar helpers (key normalization, snakify, uniform_string).
- ``plans``      per-partition checkpoint manifest / resume logic.
- ``pipeline``   the end-to-end validation job (north_rule shape).
"""

__version__ = "0.1.0"

from schema_guru_spark.core.context import SchemaContext  # noqa: F401

# Spark-dependent API is exported lazily so the pure-Python kernel
# (schema_guru_spark.core) imports without a JVM on the driver path.
_LAZY = {
    "infer_json_column": "schema_guru_spark.operators.infer",
    "infer_json_column_by_key": "schema_guru_spark.operators.infer",
    "validate_repo_table": "schema_guru_spark.pipeline",
    "constraint_report": "schema_guru_spark.pipeline",
    "key_violation_rows": "schema_guru_spark.pipeline",
    "synthesize_repo_table": "schema_guru_spark.sources.repo_table",
    "get_spark": "schema_guru_spark.session",
}


def __getattr__(name):
    mod = _LAZY.get(name)
    if mod is None:
        raise AttributeError(name)
    import importlib

    return getattr(importlib.import_module(mod), name)


def __dir__():
    return sorted(set(globals()) | set(_LAZY))
