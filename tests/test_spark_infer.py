"""Distributed schema inference over real parquet (sf0.001 events.props)."""

import json

import pytest
from pyspark.sql import functions as F

from schema_guru_spark.core.context import SchemaContext
from schema_guru_spark.operators.infer import infer_json_column, infer_json_column_by_key

CTX = SchemaContext.make(0)


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def test_infer_events_props(events):
    res = infer_json_column(events, "props", CTX)
    assert res.n_err == 0
    assert res.n_ok == events.count()
    schema = res.schema(CTX)
    assert schema["type"] == "object"
    k = schema["properties"]["k"]
    assert k["type"] == "integer"
    # T1 encasing: k in [0, 99] -> snapped to [0, 32767]
    assert k["minimum"] == 0 and k["maximum"] == 32767
    assert res.violations.count() == 0


def test_infer_matches_driver_side_merge(events):
    """Distributed result == sequential driver-side fold (merge-order
    insensitivity at the Spark level)."""
    from schema_guru_spark.core.microschema import derive_text, merge_all, dumps
    res = infer_json_column(events.repartition(7), "props", CTX)
    texts = [r["props"] for r in events.select("props").collect()]
    seq = merge_all([derive_text(t, CTX)[0] for t in texts], CTX)
    assert dumps(res.state) == dumps(seq)


def test_infer_error_routing(spark):
    df = spark.createDataFrame(
        [("ok1", '{"a": 1}'), ("bad", "{nope"), ("scalar", "42"), ("nul", None)],
        ["id", "doc"],
    )
    res = infer_json_column(df, "doc", CTX)
    assert res.n_ok == 1 and res.n_err == 3
    errs = [r["error"] for r in res.violations.collect()]
    assert len(errs) == 3
    assert any("unacceptable" in e for e in errs)  # reference message shape


def test_infer_by_key(events):
    out = infer_json_column_by_key(events, "props", "event_type", CTX)
    rows = {r["event_type"]: r for r in out.collect()}
    assert set(rows) == {"click", "view", "signup", "purchase", "error"}
    for r in rows.values():
        sch = json.loads(r["schema"])
        assert sch["properties"]["k"]["type"] == "integer"
        assert r["n_err"] == 0


def test_infer_by_key_total_matches(events):
    out = infer_json_column_by_key(events, "props", "event_type", CTX)
    total = out.agg(F.sum("n_ok")).collect()[0][0]
    assert total == events.count()
