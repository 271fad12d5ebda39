"""Distributed schema inference — the engine's core custom aggregation.

Reference lifecycle (SURVEY.md §3.1): RDD[JValue] -> map(jsonToSchema) ->
RDD.reduce(_.merge(_)) -> transforms on the driver
(SchemaGuruRDD.scala:45-102). The recursive merge state cannot be a Spark
SQL aggregate (no recursive types), so the idiomatic Spark shape is:

  1. ONE pass over the data with ``mapInPandas`` (Arrow-batched): each
     task derives micro-schemas per document and folds them into a single
     per-partition state — map-side combine, the moral equivalent of
     ``treeAggregate``'s seqOp. Parse/derive errors are emitted as
     violation ROWS in the same pass (fixing the reference's double
     traversal, SchemaGuruRDD.scala:49, and driver-side errors.collect,
     SchemaDerive.scala:98).
  2. The per-partition states (one tiny JSON row per task) are combined:
     intermediate fan-in rounds while the row count is large, then a
     final driver-side fold. At 1000 executors / 100k partitions the
     state rows total a few MB — the combine is never the bottleneck;
     the single data pass is.

Segmented (per-key) inference folds per-key accumulators map-side in
each scan task, then shuffles only the tiny states (groupBy(key)) —
replacing the reference's RDD.groupBy that ships whole groups to
single tasks (JsonPathExtractorRDD.scala:74). A hot key costs the same
as any other key, so skew cannot concentrate data movement.
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from schema_guru_spark.core.context import SchemaContext
from schema_guru_spark.core.json_fast import loads as fast_loads
from schema_guru_spark.core.microschema import ZERO, derive, dumps, loads, merge
from schema_guru_spark.core.transforms import apply_transforms, extract_keys
from schema_guru_spark.core.levenshtein import get_duplicates

_OUT_SCHEMA = ("kind string, payload string, n_ok bigint, n_err bigint, "
               "pid int")
_STATE_KIND, _VIOLATION_KIND = "s", "v"


def _enum_order_sensitive(ctx: SchemaContext) -> bool:
    """True when the enum machinery is live. The reference's enum merge
    checks size on the CONCATENATION before distinct
    (SchemaWithEnum.scala:57-70, pinned by
    test_concat_size_check_precedes_distinct), which is neither
    commutative nor associative — merging partial states in task-
    completion order would make the inferred enums depend on the
    scheduler. Such contexts fold their partial states in PARTITION
    ORDER on the driver instead of through the combine tree: the result
    is deterministic for a fixed input partitioning (the reference's
    own Spark job folds the same non-commutative merge through
    RDD.aggregate with no ordering guarantee at all,
    SchemaGuruRDD.scala:44-60)."""
    return ctx.enum_cardinality > 0 or bool(ctx.enum_sets)


def _require_commutative(ctx: SchemaContext) -> None:
    """Strict reference-product mode reproduces an ORDER-DEPENDENT merge
    (ProductSchema.scala:124-159) — correct only for sequential
    arrival-order folds. The distributed engine merges partial states in
    partition/tree order, so silently accepting it would make results
    depend on task scheduling. Fail loudly instead."""
    if getattr(ctx, "strict_reference_product", False):
        raise ValueError(
            "strict_reference_product is a kernel-level parity mode "
            "(non-commutative merge) and cannot run distributed; use "
            "core.microschema.merge_all on an ordered document list, or "
            "the default commutative context for Spark inference")


def _derive_partial(ctx: SchemaContext, column: str):
    """Build the mapInPandas function: per-task derive+fold, single pass,
    violations streamed out as rows.

    Unique-document fast path: each batch is ``pd.factorize``d
    (order-preserving, C-speed) and each DISTINCT document is parsed and
    derived exactly once. A document seen n >= 2 times contributes
    ``s ⊕ s`` — the monoid stabilizes after one self-merge (bounds and
    flags are idempotent), so this is bit-identical to folding all
    n copies (law pinned by test_merge_self_stabilizes) — for ENUM-OFF
    contexts. Enum-bearing contexts fold in row order instead: the
    collapse reorders documents (first-appearance, duplicates adjacent)
    and the enum merge is order-sensitive. Real-world JSON-bearing
    corpora are heavily duplicated, so the collapse cuts the per-doc
    Python work from O(rows) to O(distinct)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        from pyspark import TaskContext

        from schema_guru_spark.core.accumulate import gate_error_message
        from schema_guru_spark.core.accumulate_batch import fold_docs

        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else -1
        enum_on = _enum_order_sensitive(ctx)
        acc: dict = {}  # task-private (accumulate mutates in place)
        n_ok = 0
        n_err = 0
        for pdf in batches:
            errs = []
            codes, uniques = pd.factorize(pdf[column], use_na_sentinel=True)
            valid: list = []
            if enum_on:
                # ROW-ORDER fold: the enum merge is order-sensitive, so
                # the unique-doc collapse below (first-appearance order,
                # duplicates made adjacent) would change inferred enums
                # within the partition. Parse each distinct text once,
                # but fold every row in its original position.
                parsed: list = []
                for text in uniques:
                    try:
                        parsed.append((fast_loads(text), None))
                    except (ValueError, TypeError) as e:
                        parsed.append((None, f"invalid JSON: {e}"))
                for code in codes.tolist():
                    if code < 0:
                        n_err += 1
                        errs.append("null content")
                        continue
                    value, msg = parsed[code]
                    if msg is not None:
                        n_err += 1
                        errs.append(msg)
                    elif isinstance(value, (dict, list)):
                        valid.append(value)
                        n_ok += 1
                    else:
                        n_err += 1
                        errs.append(gate_error_message(value))
            else:
                counts = np.bincount(codes[codes >= 0],
                                     minlength=len(uniques)).tolist()
                n_null = int((codes < 0).sum())
                if n_null:
                    n_err += n_null
                    errs.extend(["null content"] * n_null)
                # parse + top-level gate per distinct doc; the fold
                # itself runs once per batch as a columnar pass
                # (accumulate_batch: fold == sequential accumulate,
                # law-pinned). A doc seen n >= 2 times enters the batch
                # twice (monoid stabilizes after one self-merge —
                # test_merge_self_stabilizes).
                for text, cnt in zip(uniques, counts):
                    try:
                        value = fast_loads(text)
                    except (ValueError, TypeError) as e:
                        n_err += cnt
                        errs.extend([f"invalid JSON: {e}"] * cnt)
                        continue
                    if isinstance(value, (dict, list)):
                        valid.append(value)
                        if cnt > 1:
                            valid.append(value)
                        n_ok += cnt
                    else:
                        n_err += cnt
                        errs.extend([gate_error_message(value)] * cnt)
            if valid:
                fold_docs(acc, valid, ctx)
            if errs:
                yield pd.DataFrame({
                    "kind": _VIOLATION_KIND, "payload": errs,
                    "n_ok": 0, "n_err": 1, "pid": pid,
                })
        yield pd.DataFrame({
            "kind": [_STATE_KIND], "payload": [dumps(acc)],
            "n_ok": [n_ok], "n_err": [n_err], "pid": [pid],
        })

    return fn


def _state_combiner(ctx: SchemaContext):
    # only reachable for commutative (enum-off) contexts — see
    # infer_json_column; pid carries the min so the column stays defined
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = ZERO
        n_ok = 0
        n_err = 0
        pid = None
        for pdf in batches:
            for payload, ok, err, p in zip(pdf["payload"], pdf["n_ok"],
                                           pdf["n_err"], pdf["pid"]):
                acc = merge(acc, loads(payload), ctx)
                n_ok += int(ok)
                n_err += int(err)
                p = int(p)
                if pid is None or p < pid:
                    pid = p
        yield pd.DataFrame({
            "kind": [_STATE_KIND], "payload": [dumps(acc)],
            "n_ok": [n_ok], "n_err": [n_err],
            "pid": [pid if pid is not None else -1],
        })

    return fn


@dataclass
class InferResult:
    """Merged schema state + counters + violations as a DataFrame sink."""

    state: dict
    n_ok: int
    n_err: int
    violations: DataFrame
    # the persisted mapInPandas output the violations DataFrame reads
    # from; callers that are done with violations release it via
    # unpersist() — a per-micro-batch caller (run_incremental_inference)
    # would otherwise leak one cached RDD per batch, forever
    _cached: Optional[DataFrame] = None

    def unpersist(self) -> None:
        """Release the cached scan output backing ``violations``.
        Reading ``violations`` afterwards still works (recomputes)."""
        if self._cached is not None:
            self._cached.unpersist()
            self._cached = None

    def schema(self, ctx: SchemaContext) -> dict:
        """Final JSON Schema (transform passes applied, SchemaGuru.scala:74-78)."""
        from schema_guru_spark.core.microschema import render
        return render(apply_transforms(self.state, ctx), ctx)

    def duplicated_keys(self) -> set:
        """Levenshtein near-duplicate warning over the merged tree
        (SchemaGuruRDD.scala:99)."""
        return get_duplicates(extract_keys(self.state))


def _widen_small_scan(src: DataFrame) -> DataFrame:
    """A small input can plan fewer scan tasks than the session has
    cores, serializing the Python derive pass. Widen it ONLY when a
    task would carry substantial bytes: for tiny inputs the extra
    exchange + per-task scheduling costs more than single-task derive
    (measured 0.4s single-task vs 1.0s repartitioned on a 2 MB file),
    while at production scale the scan already has >> cores splits and
    neither branch fires — no shuffle is ever added there."""
    spark = src.sparkSession
    par = spark.sparkContext.defaultParallelism
    try:
        # private JVM API (tested against Spark 4.1.x) — the broad
        # except degrades to no-widening on a Spark upgrade rather than
        # breaking; revisit the call chain if the stats() shape changes
        total_bytes = int(
            src._jdf.queryExecution().optimizedPlan().stats()
               .sizeInBytes())
    except Exception:  # stats API unavailable -> keep the plan as-is
        return src
    # cheap size check FIRST: tiny inputs (the common small-SF case)
    # skip the .rdd partition-count probe entirely — converting the
    # plan to an RDD costs a plan compilation. Worst case a single
    # split carries all bytes, so anything <= the per-task threshold
    # can never need widening.
    if total_bytes <= 8 * 1024 * 1024:
        return src
    n_parts = src.rdd.getNumPartitions()
    if n_parts < par and total_bytes // max(n_parts, 1) > 8 * 1024 * 1024:
        return src.repartition(par)
    return src


def infer_json_column(df: DataFrame, column: str, ctx: SchemaContext,
                      fanin: int = 64) -> InferResult:
    """Infer one merged schema for a JSON-bearing string column.

    Single distributed pass + logarithmic state combine. ``fanin``
    controls intermediate combine rounds: with P partial states, rounds
    run while P > fanin, each shrinking P by ``fanin``×.
    """
    _require_commutative(ctx)
    spark = df.sparkSession
    enum_on = _enum_order_sensitive(ctx)
    src = df.select(column)
    if not enum_on:
        # widening repartitions rows round-robin, which would make an
        # order-sensitive (enum-bearing) fold depend on the session's
        # parallelism instead of the input layout alone — skip it there
        src = _widen_small_scan(src)
    raw = src.mapInPandas(_derive_partial(ctx, column), _OUT_SCHEMA)
    raw = raw.persist()
    violations = raw.filter(F.col("kind") == _VIOLATION_KIND) \
                    .select(F.col("payload").alias("error"))

    states = raw.filter(F.col("kind") == _STATE_KIND)
    # intermediate tree-combine rounds executor-side; counting the (tiny,
    # persisted) state rows also materializes the single data pass
    n = states.count()
    if not enum_on:
        while n > fanin:
            n = max(1, math.ceil(n / fanin))
            states = states.repartition(n).mapInPandas(
                _state_combiner(ctx), _OUT_SCHEMA)

    rows = states.collect()
    if enum_on:
        # the enum merge is order-sensitive (see _enum_order_sensitive):
        # no combine tree (a tree fold of a non-associative merge varies
        # with its shape), one driver-side fold in partition order —
        # P tiny state rows, so driver cost is O(partitions), same as
        # the final fold below
        rows = sorted(rows, key=lambda r: r["pid"])
    acc, n_ok, n_err = ZERO, 0, 0
    for row in rows:
        acc = merge(acc, loads(row["payload"]), ctx)
        n_ok += row["n_ok"]
        n_err += row["n_err"]
    return InferResult(acc, n_ok, n_err, violations, _cached=raw)


def _fold_keyed_batch(accs: dict, counts: dict, pdf: pd.DataFrame,
                      key_col: str, column: str, ctx: SchemaContext,
                      loads_fn=fast_loads,
                      ctx_by_key: Optional[dict] = None) -> None:
    """Fold one Arrow batch into per-key accumulators — the keyed twin
    of the global derive pass's unique-document fast path (see
    ``_derive_partial``): documents are ``pd.factorize``d so each
    DISTINCT text is parsed and derived exactly once per batch,
    multiplicities folding in via the one-self-merge stabilization law
    (``s ⊕ s`` is the fixed point — test_merge_self_stabilizes). Cuts
    the per-doc Python work from O(rows) to O(distinct (key, doc)) on
    duplicate-heavy corpora, which JSON-bearing code repos are.

    ``loads_fn`` is injectable so tests can count parse calls.
    ``ctx_by_key`` (optional) maps a key to the context its documents
    fold under — the reference's segmented mode derives each segment
    with that segment's own valid-doc count as ``quantity``
    (SchemaCommand.scala:146, produce() per segment), which gates the
    base64 pattern suggestion at derive time.
    """
    from schema_guru_spark.core.accumulate import accumulate_doc

    def _ctx_for(key):
        if ctx_by_key is None:
            return ctx
        return ctx_by_key.get(key, ctx)

    codes, uniques = pd.factorize(pdf[column], use_na_sentinel=True)
    parsed: list = []
    for text in uniques:
        try:
            value = loads_fn(text)
            if value is None:
                raise ValueError("null content")
            parsed.append((value, False))
        except (ValueError, TypeError):
            parsed.append((None, True))
    if _enum_order_sensitive(ctx):
        # ROW-ORDER fold per key: the (key, doc) collapse below
        # reorders a key's documents (first-appearance, duplicates
        # adjacent), which changes order-sensitive enum merges. Parsing
        # is still once per distinct text; only the fold is per row.
        for key, code in zip(pdf[key_col].to_numpy(), codes.tolist()):
            if key is not None and pd.isna(key):
                key = None
            st = accs.get(key)
            if st is None:
                st = accs[key] = {}
                counts[key] = [0, 0]
            if code < 0:
                counts[key][1] += 1
                continue
            value, bad = parsed[code]
            if bad:
                counts[key][1] += 1
                continue
            try:
                accumulate_doc(st, value, _ctx_for(key))
                counts[key][0] += 1
            except ValueError:
                counts[key][1] += 1
        return
    sub = pd.DataFrame({"k": pdf[key_col].to_numpy(), "c": codes})
    # dropna=False: a NULL key is still a key (matches the row-loop
    # behavior this fast path replaced)
    grouped = sub.groupby(["k", "c"], sort=False, dropna=False).size()
    for (key, code), cnt in grouped.items():
        if key is not None and pd.isna(key):
            key = None
        cnt = int(cnt)
        st = accs.get(key)
        if st is None:
            st = accs[key] = {}
            counts[key] = [0, 0]
        if code < 0:   # factorize NA sentinel: null content rows
            counts[key][1] += cnt
            continue
        value, bad = parsed[code]
        if bad:
            counts[key][1] += cnt
            continue
        try:
            kctx = _ctx_for(key)
            accumulate_doc(st, value, kctx)
            if cnt > 1:
                accumulate_doc(st, value, kctx)
            counts[key][0] += cnt
        except ValueError:
            counts[key][1] += cnt


def infer_json_column_by_key(df: DataFrame, column: str, key_col: str,
                             ctx: SchemaContext, n_salts: int = 8,
                             quantity_by_key: Optional[dict] = None
                             ) -> DataFrame:
    """Per-key (segmented) schema inference — G1/A8 of SURVEY.md §2.

    Phase 1 is MAP-SIDE: each scan task folds per-key accumulators for
    the rows it already holds and emits one tiny (key, state) row per
    key seen — the raw documents are NEVER shuffled. (The reference's
    RDD.groupBy ships whole groups to single tasks,
    JsonPathExtractorRDD.scala:74; an earlier salted groupBy here still
    shuffled every row once.) Phase 2 shuffles only the states:
    groupBy(key) merges <= #tasks rows per key, so a mega-key costs the
    same as any other — skew cannot concentrate data movement.
    ``n_salts`` is retained for API compatibility; map-side combine
    makes salting unnecessary.

    Map-side state is O(distinct keys present in the task) — for
    segmentation-style keys (bounded cardinality) a few accumulators
    per task; the worst case (all-unique keys) degrades to exactly the
    old per-row state volume, never more.

    Returns DataFrame(key string, schema string, n_ok long, n_err long)
    where ``schema`` is the rendered JSON Schema (transforms applied).
    """
    _require_commutative(ctx)
    part_schema = (f"{key_col} string, payload string, n_ok bigint, "
                   "n_err bigint, pid int")
    # per-segment quantity (reference segmented mode: produce() derives
    # each segment with its own doc count, SchemaCommand.scala:118-146):
    # a tiny driver-built {key: ctx} map, shipped in the task closure
    ctx_by_key = None
    if quantity_by_key:
        from dataclasses import replace
        ctx_by_key = {k: replace(ctx, quantity=q)
                      for k, q in quantity_by_key.items()}

    def phase1(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else -1
        accs: dict = {}
        counts: dict = {}
        for pdf in batches:
            _fold_keyed_batch(accs, counts, pdf, key_col, column, ctx,
                              ctx_by_key=ctx_by_key)
        if accs:
            yield pd.DataFrame(
                [(k, dumps(a), counts[k][0], counts[k][1], pid)
                 for k, a in accs.items()],
                columns=[key_col, "payload", "n_ok", "n_err", "pid"])

    def phase2(key, pdf: pd.DataFrame) -> pd.DataFrame:
        # partial states arrive in grouped-shuffle order; fold them in
        # scan-partition order so enum-bearing contexts (order-sensitive
        # merge, see _enum_order_sensitive) stay deterministic for a
        # fixed input partitioning — <= #tasks rows per key, so the sort
        # is O(tasks log tasks) on tiny rows
        pdf = pdf.sort_values("pid")
        acc, n_ok, n_err = ZERO, 0, 0
        for payload, ok, err in zip(pdf["payload"], pdf["n_ok"], pdf["n_err"]):
            acc = merge(acc, loads(payload), ctx)
            n_ok += int(ok)
            n_err += int(err)
        from schema_guru_spark.core.microschema import render
        rendered = render(apply_transforms(acc, ctx), ctx)
        return pd.DataFrame({
            key_col: [key[0]],
            "schema": [json.dumps(rendered, sort_keys=True)],
            "n_ok": [n_ok], "n_err": [n_err],
        })

    src = df.select(key_col, column)
    if not _enum_order_sensitive(ctx):
        # same rule as infer_json_column: enum-bearing contexts keep the
        # input layout so the per-key pid-ordered fold in phase2 is a
        # function of the input alone
        src = _widen_small_scan(src)
    partial = src.mapInPandas(phase1, part_schema)
    return partial.groupBy(key_col).applyInPandas(
        phase2, f"{key_col} string, schema string, n_ok bigint, n_err bigint")
