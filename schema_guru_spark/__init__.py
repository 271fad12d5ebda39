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
