"""Column-id-based schema evolution through the pure-Python Iceberg
metadata layer: a rename is a metadata-only commit; files written
before it keep the old PHYSICAL parquet name and the reader projects
them to the current schema by field id (the resolution rule the spec
mandates — name-based reads would silently drop renamed columns)."""

import json

import pytest

from schema_guru_spark.sources.iceberg_meta import (
    _project_to_schema,
    append_snapshot,
    delete_where_equal,
    load_table_metadata,
    plan_scan,
    read_iceberg,
    rename_column,
)

SCHEMA = [("repo", "string"), ("lang", "string"), ("content", "string")]


def _rows(n, start=0, content_key="content"):
    return [{"repo": f"r{i % 3}", "lang": ("py", "go")[i % 2],
             content_key: json.dumps({"i": i})}
            for i in range(start, start + n)]


def test_rename_maps_old_files_by_field_id(spark, tmp_path):
    tp = str(tmp_path / "t")
    append_snapshot(tp, _rows(10), SCHEMA, partition_by="lang")
    rename_column(tp, "content", "body")
    new_schema = [("repo", "string"), ("lang", "string"),
                  ("body", "string")]
    append_snapshot(tp, _rows(5, start=100, content_key="body"),
                    new_schema, partition_by="lang")

    df = read_iceberg(spark, tp)
    assert df.columns == ["repo", "lang", "body"]
    rows = {r["body"] for r in df.collect()}
    # both eras' content arrives under the NEW name
    assert json.dumps({"i": 0}) in rows
    assert json.dumps({"i": 100}) in rows
    assert df.count() == 15
    # field ids are stable across the rename
    meta = load_table_metadata(tp)
    ids = {s["schema-id"]: {f["name"]: f["id"] for f in s["fields"]}
           for s in meta["schemas"]}
    assert ids[0]["content"] == ids[meta["current-schema-id"]]["body"]


def test_rename_partition_column_still_prunes(spark, tmp_path):
    tp = str(tmp_path / "t")
    append_snapshot(tp, _rows(10), SCHEMA, partition_by="lang")
    rename_column(tp, "lang", "language")
    plan = plan_scan(tp, partition_filter={"language": "py"})
    assert len(plan.data) == 1
    assert all(f.partition == {"language": "py"} for f in plan.data)
    df = read_iceberg(spark, tp, partition_filter={"language": "py"})
    assert {r["language"] for r in df.collect()} == {"py"}


def test_equality_delete_written_before_rename_still_applies(
        spark, tmp_path):
    tp = str(tmp_path / "t")
    append_snapshot(tp, _rows(10), SCHEMA, partition_by="lang")
    delete_where_equal(tp, [{"repo": "r0"}])
    rename_column(tp, "repo", "repository")
    df = read_iceberg(spark, tp)
    assert df.columns == ["repository", "lang", "content"]
    got = {r["repository"] for r in df.collect()}
    assert got == {"r1", "r2"}


def test_rename_validation_errors(tmp_path):
    tp = str(tmp_path / "t")
    append_snapshot(tp, _rows(4), SCHEMA, partition_by="lang")
    with pytest.raises(ValueError, match="no column"):
        rename_column(tp, "nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        rename_column(tp, "repo", "lang")


def test_append_requires_current_schema_names(tmp_path):
    tp = str(tmp_path / "t")
    append_snapshot(tp, _rows(4), SCHEMA, partition_by="lang")
    rename_column(tp, "content", "body")
    with pytest.raises(ValueError, match="CURRENT schema"):
        append_snapshot(tp, _rows(2, start=50), SCHEMA,
                        partition_by="lang")


def test_project_widens_and_nulls_added_columns(spark):
    meta = {"schemas": [
        {"schema-id": 0, "fields": [
            {"id": 1, "name": "a", "type": "int"},
            {"id": 2, "name": "b", "type": "float"}]},
        {"schema-id": 1, "fields": [
            {"id": 1, "name": "a", "type": "long"},
            {"id": 2, "name": "b2", "type": "double"},
            {"id": 3, "name": "c", "type": "string"}]},
    ]}
    df = spark.createDataFrame([(1, 2.5)], "a int, b float")
    out = _project_to_schema(df, meta, 0, meta["schemas"][1])
    assert [f.simpleString() for f in out.schema.fields] == \
        ["a:bigint", "b2:double", "c:string"]
    row = out.collect()[0]
    assert (row["a"], row["b2"], row["c"]) == (1, 2.5, None)
    # non-widening changes refuse loudly
    bad = {"schemas": [meta["schemas"][0], {"schema-id": 2, "fields": [
        {"id": 1, "name": "a", "type": "string"},
        {"id": 2, "name": "b", "type": "float"}]}]}
    with pytest.raises(NotImplementedError, match="widening"):
        _project_to_schema(df, bad, 0, bad["schemas"][1])


def test_rename_is_metadata_only_no_snapshot(spark, tmp_path):
    from schema_guru_spark.plans.incremental import incremental_validate
    tp = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    rows = [{"repo": f"r{i}", "path": f"p{i}", "commit": "c",
             "lang": "py", "content": "x"} for i in range(6)]
    sch = [("repo", "string"), ("path", "string"), ("commit", "string"),
           ("lang", "string"), ("content", "string")]
    s1 = append_snapshot(tp, rows, sch, partition_by="lang")
    incremental_validate(spark, tp, ckpt, n_buckets=4,
                         allowed_langs=("py",))
    rename_column(tp, "path", "filepath")
    meta = load_table_metadata(tp)
    assert meta["current-snapshot-id"] == s1  # no new snapshot
    # ... so an incremental run after the rename has nothing to do
    rep = incremental_validate(spark, tp, ckpt, n_buckets=4,
                               allowed_langs=("py",))
    assert rep["mode"] == "up-to-date"


def _expire_noncurrent_snapshots(table_path):
    """Simulate snapshot expiry: drop every snapshot except the current
    one from the metadata's snapshot list (what expire_snapshots does;
    data files stay, their adding-snapshot ids dangle)."""
    import glob, os
    meta = load_table_metadata(table_path)
    cur = meta["current-snapshot-id"]
    meta["snapshots"] = [s for s in meta["snapshots"]
                         if s["snapshot-id"] == cur]
    mdir = os.path.join(table_path, "metadata")
    latest = max(glob.glob(os.path.join(mdir, "v*.metadata.json")))
    with open(latest, "w") as fh:
        json.dump(meta, fh)


def test_expired_snapshot_multi_schema_fails_loudly(spark, tmp_path):
    """ADVICE r04: a file whose adding snapshot has been expired out of
    the metadata CANNOT be attributed to the current schema when the
    table has evolved — pre-rename parquet projected under post-rename
    names gives AnalysisException or silent nulls. plan_scan must raise
    a clear error instead."""
    from schema_guru_spark.sources.iceberg_meta import plan_scan
    tp = str(tmp_path / "t")
    append_snapshot(tp, _rows(10), SCHEMA, partition_by="lang")
    rename_column(tp, "content", "body")
    new_schema = [("repo", "string"), ("lang", "string"),
                  ("body", "string")]
    append_snapshot(tp, _rows(5, start=100, content_key="body"),
                    new_schema, partition_by="lang")
    _expire_noncurrent_snapshots(tp)
    with pytest.raises(LookupError, match="expired"):
        plan_scan(tp)


def test_expired_snapshot_single_schema_still_plans(spark, tmp_path):
    """With only one schema ever, the current-schema default is provably
    right — expiry must NOT break reads of never-evolved tables."""
    from schema_guru_spark.sources.iceberg_meta import plan_scan
    tp = str(tmp_path / "t")
    append_snapshot(tp, _rows(10), SCHEMA, partition_by="lang")
    append_snapshot(tp, _rows(5, start=100), SCHEMA, partition_by="lang")
    _expire_noncurrent_snapshots(tp)
    plan = plan_scan(tp)
    assert len(plan.data) > 0
    assert read_iceberg(spark, tp).count() == 15
