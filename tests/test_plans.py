"""Physical-plan shape assertions — the 100TB-readiness checks.

Captures .explain() output and asserts the properties that matter at
scale: column pruning reaches the parquet scan, dimension sides
broadcast, anti-joins stay broadcast, LSH candidate joins never
degenerate to a cartesian, top-k stays TakeOrderedAndProject, flat
aggregates are whole-stage-codegen'd, and pandas-UDF passes shuffle
only state rows.
"""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from schema_guru_spark.operators import constraints as C
from schema_guru_spark.operators import stats as S


def plan_of(df, mode="formatted"):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def tables(spark, sf_dir):
    return {
        "lineitem": spark.read.parquet(f"{sf_dir}/lineitem.parquet"),
        "orders": spark.read.parquet(f"{sf_dir}/orders.parquet"),
        "customer": spark.read.parquet(f"{sf_dir}/customer.parquet"),
        "documents": spark.read.parquet(f"{sf_dir}/documents.parquet"),
    }


def test_profile_scan_is_column_pruned(tables):
    plan = plan_of(S.numeric_profile(tables["lineitem"], "l_quantity"))
    assert "ReadSchema: struct<l_quantity:double>" in plan
    # partial + final hash aggregate (map-side combine)
    assert plan.count("HashAggregate") >= 2


def test_string_profile_single_column_scan(tables):
    plan = plan_of(S.string_profile(tables["customer"], "c_name"))
    assert "ReadSchema: struct<c_name:string>" in plan


def test_ri_anti_join_is_broadcast(tables):
    df = C.referential_violations(tables["orders"], tables["customer"],
                                  "o_custkey", "c_custkey")
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # fact side never exchanges on the join key
    assert "Exchange hashpartitioning(o_custkey" not in plan


def test_filter_pushdown_reaches_scan(tables):
    df = tables["lineitem"].where(F.col("l_quantity") > 40) \
        .select("l_orderkey", "l_quantity")
    plan = plan_of(df)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,40.0)]" in plan


def test_duplicate_keys_local_pairs(tables):
    # the data-scale stage is the distributed DISTINCT; the pair step is
    # schema-cardinality and runs on the driver (reference parity:
    # LevenshteinAnnotator is a driver-side pass). The result plan must
    # therefore be a local table — no shuffled cartesian anywhere.
    df = S.duplicate_keys(tables["documents"], "source")
    plan = plan_of(df, mode="simple")
    assert ("LocalTableScan" in plan or "EmptyRelation" in plan
            or "Scan ExistingRDD" in plan), plan
    assert "CartesianProduct" not in plan, plan
    # and it matches a from-scratch driver computation
    from schema_guru_spark.core.levenshtein import get_duplicates
    keys = {r.source for r in
            tables["documents"].select("source").distinct().collect()
            if r.source is not None and len(r.source) > 3}
    assert {(r.key_a, r.key_b) for r in df.collect()} == get_duplicates(keys)


def test_uniqueness_hashed_shuffles_hash_only(tables):
    df = C.uniqueness_hashed(tables["orders"],
                             ["o_orderkey", "o_custkey"])
    plan = plan_of(df, mode="simple")
    # the exchange carries the xxhash64, not the raw key columns
    assert "xxhash64" in plan


def test_group_with_latest_single_shuffle(tables):
    df = S.group_with_latest(tables["orders"], ["o_custkey"],
                             ["o_orderdate", "o_orderkey"])
    plan = plan_of(df, mode="simple")
    assert plan.count("Exchange") == 1  # one shuffle on the window key


def test_minhash_lsh_no_cartesian(spark, sf_dir):
    from schema_guru_spark.operators import dedup as D
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = D.minhash_lsh_pairs(docs, "doc_id", "text")
    plan = plan_of(df, mode="simple")
    # candidate pairs come from the band-bucket equi-join, never a
    # cross join of documents
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_cosine_topk_stays_jvm_side(spark, sf_dir):
    from schema_guru_spark.operators import similarity as SIM
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = [0.1] * len(emb.select("embedding").first()["embedding"])
    df = SIM.cosine_topk(emb, q, "embedding", "vec_id", k=5)
    plan = plan_of(df)
    # the dot product is F.aggregate/zip_with — JVM expressions, no
    # Python in the hot path (higher-order fns are interpreted, not
    # codegen'd, so we assert absence of Python eval instead)
    assert "BatchEvalPython" not in plan, plan
    assert "ArrowEvalPython" not in plan, plan
    # top-k is TakeOrderedAndProject — per-partition heaps + driver
    # merge, never a global sort-then-limit
    assert "TakeOrderedAndProject" in plan, plan
    assert "ReadSchema: struct<vec_id:bigint,embedding" in plan, plan


def test_quality_scores_no_python(spark, sf_dir):
    from schema_guru_spark.operators import textstats as T
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = plan_of(T.quality_scores(docs, "text", "doc_id"))
    assert "BatchEvalPython" not in plan, plan
    assert "ReadSchema: struct<doc_id" in plan  # pruned to used columns


def test_exact_duplicates_single_shuffle(spark, sf_dir):
    from schema_guru_spark.operators import dedup as D
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = plan_of(D.exact_duplicates(docs, "text", "doc_id"),
                   mode="simple")
    # one shuffle on the content digest; no Python, no content in the
    # exchange (digest + id only)
    assert "BatchEvalPython" not in plan, plan
    assert plan.count("Exchange") <= 2, plan  # digest groupBy (+AQE sort)


def test_segment_counts_pruned_scan(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan = plan_of(S.segment_counts(events, "props", "$.k"))
    assert "ReadSchema: struct<props:string>" in plan
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_by_key_inference_single_state_shuffle(spark, sf_dir):
    from schema_guru_spark.core.context import SchemaContext
    from schema_guru_spark.operators.infer import infer_json_column_by_key
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    df = infer_json_column_by_key(events, "props", "event_type",
                                  SchemaContext.make(0))
    plan = plan_of(df, mode="simple")
    # raw documents never shuffle: the ONLY exchange is the tiny
    # per-(task, key) state rows into groupBy(key)
    assert plan.count("Exchange") == 1, plan
    assert "ReadSchema: struct<event_type:string,props:string>" in \
        plan_of(df)


def test_simhash_is_pure_jvm(tables):
    """Round 2 moved simhash from mapInPandas to JVM expressions — no
    Python evaluation node may appear in the plan (the final aggregate
    and the fingerprint reassembly are codegen-able expressions)."""
    from schema_guru_spark.operators import dedup as D
    fp = D.simhash_fingerprints(tables["documents"], "doc_id", "text")
    p = plan_of(fp)
    assert "EvalPython" not in p and "mapInPandas" not in p.lower()


def test_winnow_fingerprints_pure_jvm_no_shuffle(tables):
    from schema_guru_spark.operators import textstats as TS
    fp = TS.fingerprints(tables["documents"], "text", "doc_id")
    p = plan_of(fp)
    assert "EvalPython" not in p
    # one pass: the only exchange allowed is the final orderBy's range
    # exchange — no aggregation/join shuffles
    import re
    exchanges = re.findall(r"Exchange (\w+)", p)
    assert all("range" in e.lower() for e in exchanges), exchanges


def test_minhash_verified_pairs_no_cartesian(spark, sf_dir):
    from schema_guru_spark.operators import dedup as D
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .where(F.col("doc_id") < 60)
    pairs = D.minhash_verified_pairs(docs, "doc_id", "text", threshold=0.6)
    p = plan_of(pairs)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_duplicate_keys_distributed_no_cartesian(tables):
    out = S.duplicate_keys_distributed(tables["documents"], "source")
    p = plan_of(out)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    # the deletion-variant equi-join is a real join on the variant key
    assert "variant" in p


def test_per_row_ops_sort_below_signal_projection(tables):
    """The per-row signal operators must sort the NARROW (id, text)
    input and project the signals ABOVE the sort: a trailing orderBy
    over a shuffle-less per-row plan makes range-partitioning's bound
    sampling re-execute the whole signal computation (measured 2.4x on
    repetition_signals at sf0.1). Plans print top-down, so the signal
    marker expression must appear BEFORE the range exchange."""
    from schema_guru_spark.operators import textstats as TS
    docs = tables["documents"]
    cases = [
        # regexp_count prints as size(regexp_extract_all(...)) in plans
        (TS.repetition_signals(docs, "text", "doc_id"), "array_sort"),
        (TS.quality_scores(docs, "text", "doc_id"), "regexp_extract_all"),
        (TS.pii_scan(docs, "text", "doc_id"), "regexp_extract_all"),
        (TS.token_stats(docs, "text", "doc_id"), "regexp_extract_all"),
        (TS.lang_id(docs, "text", "doc_id"), "array_intersect"),
        (TS.fingerprints(docs, "text", "doc_id"), "array_sort"),
        (TS.curation_report(docs, "text", "doc_id"), "array_sort"),
    ]
    for df, marker in cases:
        # simple mode prints ONE top-down tree (formatted mode's
        # numbered detail section is bottom-up and would lie here)
        lines = plan_of(df, mode="simple").splitlines()
        i_marker = next((i for i, ln in enumerate(lines)
                         if marker in ln), -1)
        i_range = next((i for i, ln in enumerate(lines)
                        if "rangepartitioning" in ln), -1)
        assert i_marker != -1 and i_range != -1, (marker, lines[:6])
        assert i_marker < i_range, \
            f"signal '{marker}' computed below the sort exchange"
