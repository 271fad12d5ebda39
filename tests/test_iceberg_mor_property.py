"""Model-based property test of the merge-on-read Iceberg read path.

The spec-heavy logic under test (iceberg_meta.read_iceberg):

  * position deletes apply to data files with data.seq <= delete.seq;
  * equality deletes apply STRICTLY (data.seq < delete.seq), so a row
    re-inserted after the delete survives it;
  * column renames are metadata-only and resolve by field id, so
    files (data AND delete) written before the rename still read
    correctly;
  * carried-forward manifests keep their original sequence numbers.

The model is a driver-side dict of live rows keyed by (file, pos):
appends add rows at known ordinals (unpartitioned tables write one
parquet per snapshot, rows in input order), a position delete removes
the named ordinals, an equality delete removes currently-live matches
(exactly the strict-sequence semantics: rows appended later are
untouched). After a random op sequence, ``read_iceberg`` must return
the model's multiset exactly.
"""

import os

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from schema_guru_spark.sources.iceberg_meta import (
    append_snapshot,
    delete_positions,
    delete_where_equal,
    read_iceberg,
    rename_column,
)

SCHEMA = [("k", "long"), ("v", "string")]


def _data_file(table_path: str, snap_id: int) -> str:
    return os.path.join(os.path.abspath(table_path), "data",
                        f"{snap_id:05d}-00000.parquet")


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(data=st.data())
def test_read_iceberg_matches_live_row_model(spark, tmp_path_factory,
                                             data):
    tp = str(tmp_path_factory.mktemp("mor_prop") / "t")
    live: dict[tuple, dict] = {}  # (file, pos) -> row
    renamed = False
    n_appends = 0
    uid = 0

    # first op is always an append so every sequence has data
    ops = ["append"] + data.draw(
        st.lists(st.sampled_from(["append", "pos_del", "eq_del",
                                  "rename"]),
                 min_size=1, max_size=5))
    for op in ops:
        if op == "append":
            n = data.draw(st.integers(min_value=1, max_value=6))
            # k values collide across appends on purpose: a re-insert
            # of a previously equality-deleted k must SURVIVE
            rows = []
            for _ in range(n):
                k = data.draw(st.integers(min_value=0, max_value=9))
                rows.append({"k": k, "v": f"v{uid}"})
                uid += 1
            key = "vv" if renamed else "v"
            sid = append_snapshot(
                tp, [{"k": r["k"], key: r["v"]} for r in rows],
                [("k", "long"), (key, "string")])
            n_appends += 1
            f = _data_file(tp, sid)
            for pos, r in enumerate(rows):
                live[(f, pos)] = r
        elif op == "pos_del" and live:
            targets = data.draw(st.lists(
                st.sampled_from(sorted(live)), min_size=1,
                max_size=len(live), unique=True))
            delete_positions(tp, [(f, pos) for f, pos in targets])
            for t in targets:
                live.pop(t, None)
        elif op == "eq_del" and live:
            k = data.draw(st.integers(min_value=0, max_value=9))
            delete_where_equal(tp, [{"k": k}])
            live = {fp: r for fp, r in live.items() if r["k"] != k}
        elif op == "rename" and not renamed:
            rename_column(tp, "v", "vv")
            renamed = True

    got = read_iceberg(spark, tp).collect()
    vcol = "vv" if renamed else "v"
    got_rows = sorted((r["k"], r[vcol]) for r in got)
    want_rows = sorted((r["k"], r["v"]) for r in live.values())
    assert got_rows == want_rows


def test_reinsert_after_equality_delete_survives(spark, tmp_path):
    """The strict-sequence rule in one deterministic picture."""
    tp = str(tmp_path / "t")
    append_snapshot(tp, [{"k": 1, "v": "old"}], SCHEMA)
    delete_where_equal(tp, [{"k": 1}])
    append_snapshot(tp, [{"k": 1, "v": "new"}], SCHEMA)
    got = [(r["k"], r["v"]) for r in read_iceberg(spark, tp).collect()]
    assert got == [(1, "new")]


def test_position_delete_applies_to_same_sequence(spark, tmp_path):
    """Position deletes use >= (a delete committed in the same
    sequence as the data file still applies)."""
    tp = str(tmp_path / "t")
    sid = append_snapshot(
        tp, [{"k": i, "v": str(i)} for i in range(4)], SCHEMA)
    delete_positions(tp, [(_data_file(tp, sid), 1),
                          (_data_file(tp, sid), 3)])
    got = sorted(r["k"] for r in read_iceberg(spark, tp).collect())
    assert got == [0, 2]


def test_equality_delete_key_survives_later_rename(spark, tmp_path):
    """An equality-delete file written BEFORE the keyed column was
    renamed must still apply: its physical column name resolves by
    field id against the schema at ITS write time, the data side by
    the current schema."""
    tp = str(tmp_path / "t")
    append_snapshot(tp, [{"k": 1, "v": "a"}, {"k": 2, "v": "b"}], SCHEMA)
    delete_where_equal(tp, [{"k": 1}])
    rename_column(tp, "k", "kk")
    append_snapshot(tp, [{"kk": 1, "v": "c"}],
                    [("kk", "long"), ("v", "string")])
    got = sorted((r["kk"], r["v"])
                 for r in read_iceberg(spark, tp).collect())
    # pre-rename k=1 deleted; post-rename kk=1 re-insert survives
    assert got == [(1, "c"), (2, "b")]
