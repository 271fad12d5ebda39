"""End-to-end repo-table validation: synthesis, verdicts, violations,
sha256 invariant, checkpoint/resume."""

import json

import pytest
from pyspark.sql import functions as F

from schema_guru_spark.pipeline import (
    bucket_expr, constraint_report, validate_repo_table,
)
from schema_guru_spark.plans.checkpoint import CheckpointManager
from schema_guru_spark.sources.repo_table import synthesize_repo_table

N_FILES = 2000
N_BUCKETS = 8


@pytest.fixture(scope="module")
def repo_df(spark):
    return synthesize_repo_table(spark, N_FILES, n_repos=20).cache()


def test_synthesis_deterministic(spark, repo_df):
    again = synthesize_repo_table(spark, N_FILES, n_repos=20)
    a = sorted(tuple(r) for r in repo_df.collect())
    b = sorted(tuple(r) for r in again.collect())
    assert a == b
    assert repo_df.columns == ["repo", "path", "commit", "lang", "content",
                               "content_sha"]


def test_synthesis_skew(repo_df):
    top = (repo_df.groupBy("repo").count().orderBy(F.desc("count"))
           .first())
    # mega-repo: ~30% of rows
    assert top["count"] > 0.2 * N_FILES


def test_validate_basic(spark, repo_df):
    res = validate_repo_table(spark, repo_df, n_buckets=N_BUCKETS)
    verd = res.verdicts.collect()
    assert len(verd) == N_BUCKETS
    total_rows = sum(r["n_rows"] for r in verd)
    assert total_rows == N_FILES
    # ~1% of json rows are deliberately truncated -> parse errors
    total_err = sum(r["n_json_err"] for r in verd)
    assert total_err > 0
    failed = [r for r in verd if not r["passed"]]
    assert failed  # strict default: corrupt docs force bucket failures
    # with an error tolerance above the ~1% corruption rate, parse dirt
    # no longer fails buckets (violation rows still emitted)
    tol = validate_repo_table(spark, repo_df, n_buckets=N_BUCKETS,
                              max_err_rate=0.05)
    tol_verd = tol.verdicts.collect()
    assert all(r["passed"] for r in tol_verd)
    assert sum(r["n_json_err"] for r in tol_verd) == total_err
    # every bucket got a merged schema; valid buckets' schema has pkg keys
    sch = json.loads(verd[0]["schema"])
    assert sch.get("type") == "object"
    props = sch["properties"]
    assert props["uuid"]["format"] == "uuid"
    assert props["created"]["format"] == "date-time"
    assert props["homepage"]["format"] == "uri"
    assert props["meta"]["properties"]["archived"]["type"] == "boolean"
    # violations carry (repo, lang, bucket)
    v = res.violations.collect()
    assert len(v) == total_err
    assert all(r["lang"] == "json" for r in v)


def test_sha_invariant_violations(spark, tmp_path):
    from schema_guru_spark.sources.repo_table import write_repo_table
    p = str(tmp_path / "repo_bad")
    write_repo_table(spark, p, 500, n_repos=5, corrupt_shas=10)
    df = spark.read.parquet(p)
    res = validate_repo_table(spark, df, n_buckets=4)
    sha_bad = res.verdicts.agg(F.sum("n_sha_bad")).collect()[0][0]
    assert sha_bad == 10  # exact planting (r05: was binomial-in-expectation)
    v = res.violations.where(F.col("detail") == "sha256 mismatch")
    assert v.count() == sha_bad


def test_checkpoint_resume(spark, repo_df, tmp_path):
    ck = str(tmp_path / "ckpt")
    # first run: only 2 chunks of 2 buckets => simulate partial completion
    res1 = validate_repo_table(spark, repo_df, checkpoint_dir=ck,
                               n_buckets=N_BUCKETS, chunk_size=3)
    assert sorted(res1.processed_buckets) == list(range(N_BUCKETS))

    # second run resumes: nothing left to do, results still visible
    res2 = validate_repo_table(spark, repo_df, checkpoint_dir=ck,
                               n_buckets=N_BUCKETS, chunk_size=3)
    assert res2.processed_buckets == []
    assert res2.resumed_buckets == list(range(N_BUCKETS))
    assert res2.verdicts.select("bucket").distinct().count() == N_BUCKETS

    mgr = CheckpointManager(spark, ck)
    assert mgr.finished_buckets() == set(range(N_BUCKETS))


def test_resume_skips_finished_work(spark, repo_df, tmp_path):
    """Kill mid-run (emulated by pre-recording some buckets as done) ->
    restart only processes the rest."""
    ck = str(tmp_path / "ckpt2")
    mgr = CheckpointManager(spark, ck)
    mgr.record_done([{"bucket": b, "n_rows": 0, "n_ok": 0, "n_err": 0}
                     for b in range(4)])
    res = validate_repo_table(spark, repo_df, checkpoint_dir=ck,
                              n_buckets=N_BUCKETS)
    assert res.processed_buckets == [4, 5, 6, 7]
    assert res.resumed_buckets == [0, 1, 2, 3]


def test_bucket_salting_spreads_megarepo(spark, repo_df):
    n_salts = 8
    buckets = (repo_df.withColumn("b", bucket_expr(64, n_salts))
               .where(F.col("repo").rlike("repo000"))
               .select("b").distinct().count())
    # the mega-repo spans ~n_salts buckets, not one
    assert buckets >= n_salts // 2


def test_constraint_report(spark, repo_df):
    rep = constraint_report(spark, repo_df, n_buckets=N_BUCKETS)
    assert rep["keys_unique"] is True
    assert rep["hll_ok"] is True
    assert rep["n_ri_orphans"] == 0  # self-derived dim resolves all
    assert rep["worst_bucket_psi"] < 0.25  # buckets are hash-uniform


def test_constraint_report_ri_orphans(spark, repo_df):
    # an incomplete external dim: drop one repo -> its rows are orphans
    full = repo_df.select("repo").distinct()
    missing = full.orderBy("repo").limit(1).collect()[0]["repo"]
    dims = full.where(F.col("repo") != missing)
    rep = constraint_report(spark, repo_df, n_buckets=N_BUCKETS,
                            repo_dims=dims)
    expected = repo_df.where(F.col("repo") == missing).count()
    assert rep["n_ri_orphans"] == expected > 0


def test_drift_psi_report_matches_sql_path(spark, repo_df):
    from schema_guru_spark.operators import constraints as C
    from schema_guru_spark.pipeline import bucket_expr
    slim = (repo_df.withColumn("bucket", bucket_expr(N_BUCKETS, 4))
            .select("bucket", F.length("content").alias("clen")))
    sql_path = {r["bucket"]: r["psi"]
                for r in C.drift_by_partition(slim, "clen", "bucket").collect()}
    fast_path = C.drift_psi_report(slim, "clen", "bucket")
    assert set(sql_path) == set(fast_path)
    for b in sql_path:
        assert abs(sql_path[b] - fast_path[b]) < 1e-6, (b, sql_path[b],
                                                        fast_path[b])


def test_planted_duplicate_keys_detected(spark, tmp_path):
    from schema_guru_spark.operators import constraints as C
    from schema_guru_spark.sources.repo_table import write_repo_table
    p = str(tmp_path / "repo_dups")
    write_repo_table(spark, p, 600, n_repos=5, dup_keys=7)
    df = spark.read.parquet(p)
    uniq = C.uniqueness_exact(df, ["repo", "path", "commit"]).collect()[0]
    assert uniq["n_rows"] == 600
    assert uniq["n_duplicates"] == 7
    assert uniq["is_unique"] is False
    # the violating tuples are recoverable with their multiplicity
    rows = C.duplicate_key_rows(df, ["repo", "path", "commit"]).collect()
    assert len(rows) == 7
    assert all(r["n_occurrences"] == 2 for r in rows)
    # report pipeline sees them too (hashed screen)
    rep = constraint_report(spark, df, n_buckets=N_BUCKETS)
    assert rep["keys_unique"] is False
    assert rep["n_rows"] - rep["n_exact_distinct"] == 7


def test_planted_drift_detected(spark, tmp_path):
    from schema_guru_spark.sources.repo_table import write_repo_table
    base = str(tmp_path / "repo_base")
    drift = str(tmp_path / "repo_drift")
    write_repo_table(spark, base, 2000, n_repos=5)
    target = spark.read.parquet(base).groupBy("repo").count() \
        .orderBy(F.desc("count")).collect()[1]["repo"]  # 2nd-largest repo
    write_repo_table(spark, drift, 2000, n_repos=5, drift_repo=target)
    # 64 buckets x 8 salts: the padded repo concentrates in ~8 buckets
    # (with only 8 buckets the salting would spread it everywhere and
    # dilute the planted shift into the global distribution)
    rep_base = constraint_report(spark, spark.read.parquet(base),
                                 n_buckets=64)
    rep_drift = constraint_report(spark, spark.read.parquet(drift),
                                  n_buckets=64)
    # sha invariant still holds on the padded table
    df = spark.read.parquet(drift)
    assert df.where(F.sha2("content", 256) != F.col("content_sha")).count() == 0
    # the planted shift is visible and substantially above baseline
    assert rep_drift["worst_bucket_psi"] > 3 * rep_base["worst_bucket_psi"]
    assert rep_drift["worst_bucket_psi"] > 0.1


def test_run_validation_table_source(spark, repo_df, capsys):
    """--table reads from the session catalog (Iceberg-style source);
    getOrCreate in the runner reuses this test session, so a temp view
    stands in for the catalog table."""
    import json as _json
    from schema_guru_spark.run_validation import main as run_main
    repo_df.createOrReplaceTempView("repos_v")
    out = run_main(["--table", "repos_v", "--buckets", "4",
                    "--cpus", "4"])
    assert out["rows"] == N_FILES
    assert out["json_ok"] > 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert _json.loads(line)["rows"] == N_FILES


def test_key_violation_rows(spark, tmp_path):
    from schema_guru_spark.pipeline import key_violation_rows
    from schema_guru_spark.sources.repo_table import write_repo_table
    p = str(tmp_path / "repo_kv")
    write_repo_table(spark, p, 400, n_repos=5, dup_keys=3)
    df = spark.read.parquet(p)
    rows = key_violation_rows(df).collect()
    assert len(rows) == 3
    assert all(r["detail"].startswith("duplicate key: ") for r in rows)
    # with an incomplete dim, orphan rows appear too
    dims = df.select("repo").distinct().orderBy("repo").limit(3)
    missing = 5 - 3  # repos not in the dim
    rows2 = key_violation_rows(df, repo_dims=dims).collect()
    kinds = {r["detail"].split(":")[0] for r in rows2}
    assert kinds == {"duplicate key", "ri orphan repo"}


def test_ks_sketch_close_to_exact(spark, sf_dir):
    from schema_guru_spark.operators import constraints as C
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact = C.ks_two_sample(li, "l_quantity", "l_linestatus",
                            "O", "F").collect()[0]["ks_stat"]
    approx = C.ks_two_sample_sketch(li, "l_quantity", "l_linestatus",
                                    "O", "F")
    assert abs(approx - exact) < 0.02, (approx, exact)
    # a genuinely shifted pair must register a large statistic
    shifted = li.withColumn(
        "l_quantity",
        F.when(F.col("l_linestatus") == "O",
               F.col("l_quantity") + 30).otherwise(F.col("l_quantity")))
    big = C.ks_two_sample_sketch(shifted, "l_quantity", "l_linestatus",
                                 "O", "F")
    assert big > 0.5


def test_bucket_balance_under_megarepo_skew(spark, repo_df):
    """The salted bucketing must keep the mega-repo (~30% of rows) from
    hot-spotting: no bucket may exceed a small multiple of the mean."""
    counts = [r["n"] for r in
              (repo_df.withColumn("b", bucket_expr(64, 8))
               .groupBy("b").agg(F.count(F.lit(1)).alias("n")).collect())]
    mean = sum(counts) / len(counts)
    assert max(counts) <= 5 * mean, (max(counts), mean)


def test_crash_between_sink_and_manifest_does_not_duplicate(spark, repo_df,
                                                            tmp_path):
    """Kill window: data sinks written, manifest append lost. On
    restart the chunk re-runs; the per-chunk OVERWRITE sink must
    converge instead of appending duplicates."""
    import shutil
    ck = str(tmp_path / "ckpt3")
    res1 = validate_repo_table(spark, repo_df, checkpoint_dir=ck,
                               n_buckets=N_BUCKETS, chunk_size=3)
    n_verd = res1.verdicts.count()
    n_viol = res1.violations.count()
    # simulate the crash: manifest lost, data sinks survive
    shutil.rmtree(f"{ck}/manifest")
    res2 = validate_repo_table(spark, repo_df, checkpoint_dir=ck,
                               n_buckets=N_BUCKETS, chunk_size=3)
    assert res2.verdicts.count() == n_verd == N_BUCKETS
    assert res2.violations.count() == n_viol
    # one verdict row per bucket, not two
    per_bucket = res2.verdicts.groupBy("bucket").count().collect()
    assert all(r["count"] == 1 for r in per_bucket)


def test_bucketed_layout_prunes(spark, tmp_path):
    """materialize_bucketed writes bucket=N/ directories; the validation's
    chunk filter over that layout prunes at the scan, and verdicts match
    the compute-bucket-per-run path exactly."""
    from conftest import scan_metrics
    from schema_guru_spark.pipeline import (
        materialize_bucketed, validate_repo_table)
    from schema_guru_spark.sources.repo_table import synthesize_repo_table

    df = synthesize_repo_table(spark, 2000)
    path = str(tmp_path / "repo_bucketed")
    materialize_bucketed(df, path, n_buckets=16, n_salts=4)

    bucketed = spark.read.parquet(path)
    import glob
    n_dirs = len(glob.glob(path + "/bucket=*"))
    assert n_dirs > 4  # layout materialized

    # a chunk filter physically reads only its directories
    chunk = [0, 1, 2]
    sub = bucketed.where(F.col("bucket").isin(chunk))
    sub.count()
    m = scan_metrics(sub)
    assert m.get("numPartitions", 99) <= len(chunk), m

    # identical verdicts through both layouts
    r_layout = validate_repo_table(spark, bucketed, n_buckets=16, n_salts=4,
                                   max_err_rate=0.02)
    r_compute = validate_repo_table(spark, df, n_buckets=16, n_salts=4,
                                    max_err_rate=0.02)
    a = sorted(tuple(r) for r in r_layout.verdicts
               .select("bucket", "n_rows", "n_json_ok", "n_json_err",
                       "passed").collect())
    b = sorted(tuple(r) for r in r_compute.verdicts
               .select("bucket", "n_rows", "n_json_ok", "n_json_err",
                       "passed").collect())
    assert a == b


def test_constraint_report_completeness(spark, repo_df):
    rep = constraint_report(spark, repo_df, n_buckets=N_BUCKETS)
    # synthesized table has fully-populated key columns
    assert rep["keys_complete"] is True
    assert rep["completeness"]["repo"] == 1.0
    assert 0.0 <= rep["completeness"]["content"] <= 1.0
    # planted null keys must show up
    from pyspark.sql import functions as F
    holed = repo_df.withColumn(
        "path", F.when(F.rand(seed=1) < 0.5, F.col("path")))
    rep2 = constraint_report(spark, holed, n_buckets=N_BUCKETS)
    assert rep2["keys_complete"] is False
    assert 0.3 < rep2["completeness"]["path"] < 0.7


def test_constraint_report_empty_table_and_tiny_null(spark):
    from pyspark.sql import functions as F
    empty = spark.createDataFrame(
        [], "repo string, path string, commit string, lang string, "
            "content string")
    rep = constraint_report(spark, empty, n_buckets=N_BUCKETS)
    assert rep["n_rows"] == 0 and rep["keys_complete"] is True
    # ONE null key among many rows must still flip the verdict even
    # though the rounded fraction is 1.0
    df = synthesize_repo_table(spark, 2000)
    holed = df.withColumn(
        "commit", F.when(F.col("path") != df.first()["path"],
                         F.col("commit")))
    rep2 = constraint_report(spark, holed, n_buckets=N_BUCKETS)
    assert rep2["keys_complete"] is False
    assert rep2["key_null_counts"]["commit"] >= 1


def test_layout_sidecar_rejects_parameter_mismatch(spark, tmp_path):
    """ADVICE r02: a layout materialized under different (n_buckets,
    n_salts) has different row-to-bucket membership even when every
    bucket id falls in range — the sidecar must catch what the bare
    range check cannot."""
    from schema_guru_spark.pipeline import (
        materialize_bucketed, validate_repo_table)
    from schema_guru_spark.sources.repo_table import synthesize_repo_table

    df = synthesize_repo_table(spark, 400)
    path = str(tmp_path / "repo_layout")
    materialize_bucketed(df, path, n_buckets=16, n_salts=4)
    bucketed = spark.read.parquet(path)

    # same n_buckets, different n_salts: range check alone would pass
    with pytest.raises(ValueError, match="materialized with"):
        validate_repo_table(spark, bucketed, n_buckets=16, n_salts=8)
    # matching parameters still run
    res = validate_repo_table(spark, bucketed, n_buckets=16, n_salts=4,
                              max_err_rate=0.02)
    assert res.verdicts.count() > 0


def test_keyed_infer_parses_each_distinct_doc_once():
    """VERDICT r02 #5: the per-key phase-1 fold factorizes documents, so
    a duplicate-heavy batch costs O(distinct) Python parses, not
    O(rows) — same fast path as the global derive pass."""
    import pandas as pd

    from schema_guru_spark.core.context import SchemaContext
    from schema_guru_spark.core.json_fast import loads as fast_loads
    from schema_guru_spark.operators.infer import _fold_keyed_batch

    ctx = SchemaContext.make(0)
    docs = ['{"a": 1}', '{"a": 2, "b": "x"}', "not-json"]
    pdf = pd.DataFrame({
        "k": ["t1", "t2"] * 300,
        "props": [docs[i % 3] for i in range(600)],
    })
    calls = {"n": 0}

    def counting_loads(text):
        calls["n"] += 1
        return fast_loads(text)

    accs, counts = {}, {}
    _fold_keyed_batch(accs, counts, pdf, "k", "props", ctx,
                      loads_fn=counting_loads)
    assert calls["n"] == 3                      # O(distinct), not 600
    assert set(accs) == {"t1", "t2"}
    # ok/err accounting still per ROW: 600 rows, every 3rd is bad json
    assert counts["t1"][0] + counts["t2"][0] == 400
    assert counts["t1"][1] + counts["t2"][1] == 200

    # bit-parity with the row-at-a-time fold it replaced
    from schema_guru_spark.core.accumulate import accumulate_doc
    from schema_guru_spark.core.microschema import dumps
    ref_accs, ref_counts = {}, {}
    for k, text in zip(pdf["k"], pdf["props"]):
        st = ref_accs.setdefault(k, {})
        c = ref_counts.setdefault(k, [0, 0])
        try:
            v = fast_loads(text)
            if v is None:
                raise ValueError("null content")
            accumulate_doc(st, v, ctx)
            c[0] += 1
        except (ValueError, TypeError):
            c[1] += 1
    assert counts == ref_counts
    for k in ref_accs:
        assert dumps(accs[k]) == dumps(ref_accs[k])


def test_scan_pass_vectorized_equals_naive_reference():
    """The vectorized per-batch scan pass (one factorize per batch,
    fused (bucket, doc) key, lazy repo attribution) must produce the
    exact counters, states and violation rows a naive per-row reference
    would — on a batch that exercises every branch at once: cross-bucket
    duplicate docs (parse-once path), repeated docs in one bucket
    (self-merge law), parse errors, null content, non-json rows, and
    sha/lang violations."""
    import pandas as pd

    from schema_guru_spark.core.accumulate import accumulate_doc
    from schema_guru_spark.core.context import SchemaContext
    from schema_guru_spark.core.json_fast import loads as fast_loads
    from schema_guru_spark.core.microschema import dumps
    from schema_guru_spark.pipeline import _scan_pass

    ctx = SchemaContext.make(0)
    doc_a = '{"k": 1}'
    doc_b = '{"k": "x", "n": 2.5}'
    rows = [
        # (bucket, repo, lang, content, sha_ok, lang_ok)
        (0, "r0", "json", doc_a, True, True),
        (1, "r1", "json", doc_a, True, True),     # same doc, other bucket
        (0, "r2", "json", doc_a, True, True),     # duplicate in bucket 0
        (0, "r3", "json", doc_b, True, True),
        (1, "r4", "json", "{broken", True, True),  # parse error
        (1, "r5", "json", None, True, True),       # null content
        (0, "r6", "py", None, True, True),         # non-json row
        (1, "r7", "md", None, False, True),        # sha violation
        (0, "r8", "go", None, True, False),        # lang violation
    ]
    pdf = pd.DataFrame(rows, columns=["bucket", "repo", "lang", "content",
                                      "sha_ok", "lang_ok"])
    out = list(_scan_pass(ctx, max_violation_examples=100)(iter([pdf])))
    got = pd.concat(out, ignore_index=True)

    # naive reference: per-row fold
    ref_states: dict[int, dict] = {}
    ref_counters: dict[int, dict] = {}
    for b, repo, lang, content, sha_ok, lang_ok in rows:
        c = ref_counters.setdefault(b, {"n_rows": 0, "n_json_ok": 0,
                                        "n_json_err": 0, "n_sha_bad": 0,
                                        "n_lang_bad": 0})
        c["n_rows"] += 1
        c["n_sha_bad"] += int(not sha_ok)
        c["n_lang_bad"] += int(not lang_ok)
        if lang != "json":
            continue
        if content is None:
            c["n_json_err"] += 1
            continue
        try:
            v = fast_loads(content)
        except (ValueError, TypeError):
            c["n_json_err"] += 1
            continue
        accumulate_doc(ref_states.setdefault(b, {}), v, ctx)
        c["n_json_ok"] += 1

    got_counters = {int(r["bucket"]): json.loads(r["payload"])
                    for _, r in got[got["kind"] == "counter"].iterrows()}
    assert got_counters == ref_counters

    got_states = {int(r["bucket"]): r["payload"]
                  for _, r in got[got["kind"] == "state"].iterrows()}
    assert got_states == {b: dumps(s) for b, s in ref_states.items()}

    viol = got[got["kind"] == "violation"]
    # one row per violating instance, repo attributed to a real example
    assert sorted(zip(viol["bucket"], viol["payload"])) == sorted([
        (1, "sha256 mismatch"), (0, "lang not allowed"),
        (1, "null content"),
        (1, "invalid JSON: Expecting property name enclosed in double "
            "quotes: line 1 column 2 (char 1)"),
    ])
    by_payload = dict(zip(viol["payload"], viol["repo"]))
    assert by_payload["null content"] == "r5"
    assert by_payload[
        "invalid JSON: Expecting property name enclosed in double quotes: "
        "line 1 column 2 (char 1)"] == "r4"


def test_null_fields_are_violations_not_crashes(spark):
    """Real corpora have NULLs. A NULL content/content_sha/lang makes
    the JVM-side sha/lang flags three-valued; before the coalesce fix
    the NULL crossed Arrow as a pandas object column and the scan
    pass's ``~sha_ok`` crashed with TypeError. NULL-flag rows must be
    counted as violations instead."""
    base = synthesize_repo_table(spark, 200, n_repos=5)
    dirty = base.unionByName(spark.createDataFrame(
        [("rX", "p1", "c1", None, '{"k": 1}',               # null lang
          "4514a0c66d60ecfeb7170caceddfb3d012a7ede1afea4863ba8bcc490"
          "ccf63b8"),  # correct sha: isolate the lang violation
         ("rX", "p2", "c1", "json", None, "0" * 64),         # null content
         ("rX", "p3", "c1", "json", '{"k": 2}', None)],      # null sha
        "repo string, path string, commit string, lang string, "
        "content string, content_sha string"))
    res = validate_repo_table(spark, dirty, n_buckets=N_BUCKETS)
    agg = res.verdicts.agg(
        F.sum("n_rows").alias("rows"), F.sum("n_sha_bad").alias("sha"),
        F.sum("n_lang_bad").alias("lang")).collect()[0]
    assert agg["rows"] == 203
    # null lang -> lang violation; null content / null sha -> sha
    # violations (the invariant cannot be verified, so it fails)
    assert agg["lang"] == 1
    assert agg["sha"] == 2
    details = [r["detail"] for r in res.violations.collect()]
    assert details.count("lang not allowed") == 1
    assert details.count("sha256 mismatch") >= 2


def test_run_validation_empty_table_vacuous_pass(spark, tmp_path):
    """An EMPTY input table reports zero counters and a vacuously
    passing rate 1.0 (same rule as the incremental cumulative view),
    instead of a TypeError on the NULL aggregate row."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from schema_guru_spark.run_validation import main as run_main
    sch = pa.schema([(n, pa.string()) for n in (
        "repo", "path", "commit", "lang", "content", "content_sha")])
    pq.write_table(pa.Table.from_pylist([], schema=sch),
                   str(tmp_path / "empty.parquet"))
    out = run_main(["--input", str(tmp_path), "--cpus", "4"])
    assert out["rows"] == 0 and out["buckets"] == 0
    assert out["pass_rate"] == 1.0
    assert out["constraints"]["keys_unique"]


def test_enum_context_rejected(spark, repo_df):
    """The reference's enum merge is non-commutative and the bucket
    combine folds state rows in shuffle-arrival order — enum-bearing
    contexts would make verdict schemas scheduler-dependent, so the
    job refuses them loudly (same guard as the keyed schema stream)."""
    from schema_guru_spark.core.context import SchemaContext
    with pytest.raises(ValueError, match="enum-free"):
        validate_repo_table(spark, repo_df, n_buckets=N_BUCKETS,
                            ctx=SchemaContext.make(4))


def test_duplicate_key_rows_ignore_lang(spark):
    """key_violation_rows groups by EXACTLY the uniqueness key
    (repo, path, commit): two rows sharing the key but differing in
    lang ARE a duplicate and must surface, or the violations sink
    would contradict constraint_report's keys_unique=False."""
    from schema_guru_spark.pipeline import key_violation_rows
    rows = [("r1", "a.py", "c1", "py", "{}"),
            ("r1", "a.py", "c1", "md", "{}"),   # same key, other lang
            ("r2", "b.py", "c1", "py", "{}")]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")
    got = key_violation_rows(df).collect()
    assert len(got) == 1
    assert got[0]["repo"] == "r1" and "x2" in got[0]["detail"]
    rep = constraint_report(spark, df, n_buckets=4, n_salts=2)
    assert rep["keys_unique"] is False


def test_error_rows_attributed_per_repo(spark):
    """Copies of the same invalid text in DIFFERENT repos of one bucket
    must each surface under their own repo — the unique-doc fast path
    used to attribute every copy to the first occurrence's repo."""
    bad = "{not json"
    rows = [("rA", "a.py", "c1", "json", bad),
            ("rB", "b.py", "c1", "json", bad)]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string").coalesce(1)
    res = validate_repo_table(spark, df, n_buckets=1, max_err_rate=1.0)
    viol = res.violations.collect()
    assert sorted(v["repo"] for v in viol) == ["rA", "rB"]
