from schema_guru_spark.core.context import SchemaContext  # noqa: F401
from schema_guru_spark.core.microschema import (  # noqa: F401
    ZERO,
    derive,
    derive_sub,
    merge,
    render,
)
