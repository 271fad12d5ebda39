"""Structured Streaming schema inference: incremental global state and
per-key applyInPandasWithState."""

import json
import time

import pytest
from pyspark.sql import functions as F

from schema_guru_spark.core.context import SchemaContext
from schema_guru_spark.streaming.infer_stream import (
    IncrementalSchemaState, keyed_schema_stream, run_incremental_inference,
)

CTX = SchemaContext.make(0)


def _write_batch(d, name, lines):
    p = d / name
    p.write_text("\n".join(lines) + "\n")


def test_incremental_inference(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    _write_batch(src, "b1.ndjson", ['{"a": 1}', '{"a": 2, "b": "x"}'])

    stream = (spark.readStream.format("text")
              .schema("value string").load(str(src))
              .withColumnRenamed("value", "content"))
    state_path = str(tmp_path / "state.json")
    q = run_incremental_inference(stream, "content", CTX, state_path,
                                  str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    sch = json.load(open(state_path + ".schema.json"))
    assert sch["properties"]["a"]["type"] == "integer"
    st, n_ok, n_err, _last = IncrementalSchemaState(state_path).read()
    assert (n_ok, n_err) == (2, 0)

    # second batch arrives; restart stream from checkpoint -> merges
    _write_batch(src, "b2.ndjson", ['{"a": 2.5, "c": null}', '{broken'])
    q2 = run_incremental_inference(stream, "content", CTX, state_path,
                                   str(tmp_path / "ckpt"))
    q2.awaitTermination(120)
    sch = json.load(open(state_path + ".schema.json"))
    assert sch["properties"]["a"]["type"] == "number"  # int widened
    assert sch["properties"]["c"]["type"] == "null"
    st, n_ok, n_err, _last = IncrementalSchemaState(state_path).read()
    assert (n_ok, n_err) == (3, 1)


def test_keyed_schema_stream(spark, tmp_path):
    src = tmp_path / "kin"
    src.mkdir()
    _write_batch(src, "b1.ndjson", [
        'click|{"x": 1}',
        'click|{"x": 9, "y": "s"}',
        'view|{"z": true}',
    ])
    raw = (spark.readStream.format("text")
           .schema("value string").load(str(src)))
    parsed = raw.select(
        F.split_part("value", F.lit("|"), F.lit(1)).alias("segment"),
        F.split_part("value", F.lit("|"), F.lit(2)).alias("content"))

    out = keyed_schema_stream(parsed, "content", "segment", CTX)
    q = (out.writeStream.format("memory").queryName("keyed_schemas")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "kckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    rows = {r["key"]: r for r in spark.sql(
        "select * from keyed_schemas").collect()}
    assert set(rows) == {"click", "view"}
    click = json.loads(rows["click"]["schema"])
    assert click["properties"]["x"]["type"] == "integer"
    assert rows["click"]["n_ok"] == 2
    view = json.loads(rows["view"]["schema"])
    assert view["properties"]["z"]["type"] == "boolean"


def test_incremental_state_replay_is_idempotent(tmp_path):
    """A foreachBatch replay (same batch_id, failure between sink write
    and checkpoint commit) must not double-merge counters."""
    from schema_guru_spark.streaming.infer_stream import IncrementalSchemaState
    p = str(tmp_path / "state.json")
    store = IncrementalSchemaState(p)
    st, ok, err, last = store.read()
    assert (st, ok, err, last) == ({}, 0, 0, None)
    store.write({"int": {"min": 1, "max": 2, "enum": None}}, 10, 1, 0)
    st, ok, err, last = store.read()
    assert ok == 10 and last == 0
    # the guard a replayed batch hits:
    assert last is not None and 0 <= last
