"""High-volume seeded fuzz of the kernel laws (NOT collected by pytest —
run directly: ``python tests/stress_fuzz_kernel.py [--docs 100000] [--seed 1]``).

Plain ``random``-based generation runs ~50x more documents per minute
than the hypothesis suites in test_core_roundtrip.py, so this is the
round-close soak: same laws, far deeper draws. Laws checked per doc /
doc-list (mirrors test_core_roundtrip.py, which remains the
shrinking-capable authority for any failure found here):

  L1 derive(doc) renders to a schema that validates doc (also after
     apply_transforms)
  L2 enum-OFF merge is commutative + associative (canon modulo enum order)
  L3 accumulate_doc over a list == derive+merge fold (plain, enum,
     cardinality-1, predefined-set contexts)
  L4 fold_docs (columnar batch fold) == accumulate_doc loop, and is
     batch-split invariant
  L5 dumps/loads state roundtrip is exact

Exit code 0 and a one-line JSON summary on success; on failure prints
the offending seed + repr(docs) so the case can be replayed and then
pinned as a regression test.
"""

from __future__ import annotations

import argparse
import json
import random
import string
import sys

# runnable as `python tests/<this>.py` from anywhere
import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import uuid as _uuid

from schema_guru_spark.core.context import SchemaContext
from schema_guru_spark.core.microschema import (
    derive, dumps, loads, merge, merge_all, render,
)
from schema_guru_spark.core.accumulate import accumulate_doc
from schema_guru_spark.core.accumulate_batch import fold_docs
from schema_guru_spark.core.transforms import apply_transforms
from schema_guru_spark.core.validate import validate

KEY_CHARS = string.ascii_letters + "_"

FORMAT_POOL = [
    "http://example.com/a", "https://x.io", "ftp://h.org/f",
    "1.2.3.4", "255.255.255.255", "256.1.1.1", "1.2.3.4\n",
    "::1", "2001:db8::8a2e:370:7334", "not-a-url://x",
    "123e4567-e89b-12d3-a456-426614174000",
    "123e4567-e89b-12d3-a456-426614174000\n",
    "2024-01-02T03:04:05Z", "2024-01-02T03:04:05.123456",
    "2024-13-40T99:99:99", "2024-01-02", "03:04:05",
    "aGVsbG8gd29ybGQ=", "QUJDRA==", "not base64!!",
    "", " ", "\n", "é中文", "a" * 40,
    # ISO near-misses / oddballs that split regex-vs-fromisoformat
    "2024-01-02T03:04:05", "2024-01-02T03", "2024-01-02T03:04:05+05:30",
    "2024-01-02 03:04:05", "20240102T030405", "2024-01-02T03:04:05,5",
    "0001-01-01T00:00:00", "9999-12-31T23:59:59.999999",
    "2024-02-30T00:00:00", "2024-01-02T24:00:00",
    # base64-shaped near-misses (padding / charset / length)
    "QUJDRA=", "QUJDRA===", "QUJD RA==", "QQ==", "====",
    # uuid near-misses
    "123E4567-E89B-12D3-A456-426614174000",
    "123e4567e89b12d3a456426614174000",
    "g23e4567-e89b-12d3-a456-426614174000",
    # ip near-misses
    "1.2.3", "1.2.3.4.5", "01.2.3.4", " 1.2.3.4", "::", ":::",
]

EDGE_NUMBERS = [0, -1, 1, 2**31 - 1, -(2**31), 2**53 - 1, -(2**53) + 1,
                0.0, -0.0, 0.5, -1.5, 1e-300, 1e300, 123456.789]


def gen_scalar(rng: random.Random):
    r = rng.random()
    if r < 0.08:
        return None
    if r < 0.16:
        return rng.random() < 0.5
    if r < 0.34:
        return rng.choice(EDGE_NUMBERS) if rng.random() < 0.5 else \
            rng.randint(-(2**53) + 1, 2**53 - 1)
    if r < 0.44:
        return rng.uniform(-1e6, 1e6)
    if r < 0.62:
        return rng.choice(FORMAT_POOL)
    if r < 0.70:
        return str(_uuid.UUID(int=rng.getrandbits(128)))
    return "".join(rng.choice(string.printable[:80])
                   for _ in range(rng.randint(0, 24)))


def gen_value(rng: random.Random, depth: int):
    if depth <= 0 or rng.random() < 0.6:
        return gen_scalar(rng)
    if rng.random() < 0.5:
        return [gen_value(rng, depth - 1) for _ in range(rng.randint(0, 4))]
    return {"".join(rng.choice(KEY_CHARS) for _ in range(rng.randint(1, 8))):
            gen_value(rng, depth - 1) for _ in range(rng.randint(0, 4))}


def gen_doc(rng: random.Random):
    # mostly flat docs (the columnar fast path's target shape), some nested
    depth = rng.choice([1, 1, 1, 2, 3])
    if rng.random() < 0.85:
        return {"".join(rng.choice(KEY_CHARS) for _ in range(rng.randint(1, 8))):
                gen_value(rng, depth) for _ in range(rng.randint(0, 5))}
    return [gen_value(rng, depth) for _ in range(rng.randint(0, 5))]


def _has_partial_enum_node(state: dict) -> bool:
    """True if any node carries a LIVE enum on some scalar kind while
    also admitting instances the enum can't contain: a container
    (obj/arr), bool, null, or another scalar kind whose own enum is
    tombstoned. Render emits the union of the live enums on such
    product nodes (reference render parity), so strict enum semantics
    reject the node's non-member instances — the one shape excluded
    from the L1-enum self-validation law."""
    if not isinstance(state, dict):
        return False
    live_enum = any(
        isinstance(state.get(k), dict) and state[k].get("enum")
        for k in ("str", "int", "num"))
    if live_enum:
        if "obj" in state or "arr" in state or "bool" in state \
                or "null" in state:
            return True
        if any(isinstance(state.get(k), dict)
               and not state[k].get("enum")
               for k in ("str", "int", "num")):
            return True
    sub = state.get("obj")
    if sub is not None and any(_has_partial_enum_node(v)
                               for v in sub.get("props", {}).values()):
        return True
    sub = state.get("arr")
    if sub is not None and _has_partial_enum_node(sub.get("items", {})):
        return True
    return False


def canon(s):
    o = json.loads(dumps(s))

    def fix(node):
        if isinstance(node, dict):
            for k, v in node.items():
                if k == "enum" and isinstance(v, list):
                    node[k] = sorted(map(repr, v))
                else:
                    fix(v)
    fix(o)
    return json.dumps(o, sort_keys=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100_000)
    ap.add_argument("--seed", type=int, default=1)
    args = ap.parse_args()
    rng = random.Random(args.seed)

    ctxs = [SchemaContext.make(0), SchemaContext.make(5),
            SchemaContext.make(1),
            SchemaContext.make(0, enum_sets=[["a", "b", 1, True]])]
    ctx0 = ctxs[0]

    t0 = time.time()
    n = 0
    while n < args.docs:
        batch = [gen_doc(rng) for _ in range(rng.randint(1, 6))]
        n += len(batch)
        try:
            # L1: self-validation (plain ctx; every doc)
            for d in batch:
                sch, err = derive(d, ctx0)
                assert err is None, (args.seed, d, err)
                assert validate(d, render(sch, ctx0)) == [], (args.seed, d)
                assert validate(
                    d, render(apply_transforms(sch, ctx0), ctx0)) == [], \
                    (args.seed, d)
                # L5: state roundtrip (enum ctx keeps enum payloads live)
                se, _ = derive(d, ctxs[1])
                assert loads(dumps(se)) == se, (args.seed, d)
                # L1-enum: an enum-bearing derived schema still
                # validates its own instance — EXCEPT nodes where a
                # container kind shares an items/props node with an
                # enum-bearing scalar: render then emits an enum that
                # object/array instances can't be members of (reference
                # render parity — products carry their scalar enums),
                # so strict enum semantics reject the source container.
                if not _has_partial_enum_node(se):
                    assert validate(d, render(se, ctxs[1])) == [], \
                        (args.seed, d)

            # L6: malformed-text error path never raises, never derives
            junk = "".join(rng.choice(string.printable)
                           for _ in range(rng.randint(0, 30)))
            from schema_guru_spark.core.microschema import derive_text
            sch_t, err_t = derive_text(junk, ctx0)
            assert (sch_t is None) != (err_t is None), (args.seed, junk)

            # L2: enum-off merge laws over the batch
            schemas = [derive(d, ctx0)[0] for d in batch]
            fwd = merge_all(schemas, ctx0)
            rev = merge_all(list(reversed(schemas)), ctx0)
            tree = schemas[0]
            for s in schemas[1:]:
                tree = merge(s, tree, ctx0)
            assert canon(fwd) == canon(rev) == canon(tree), \
                (args.seed, batch)

            # L3 + L4 under every context
            for ctx in ctxs:
                ref = {}
                for d in batch:
                    ref = accumulate_doc(ref, d, ctx)
                got = fold_docs({}, list(batch), ctx)
                assert dumps(got) == dumps(ref), (args.seed, batch, ctx)
                k = rng.randint(0, len(batch))
                split = fold_docs({}, list(batch[:k]), ctx)
                fold_docs(split, list(batch[k:]), ctx)
                assert dumps(split) == dumps(ref), (args.seed, batch, k)
        except AssertionError:
            print("FUZZ FAILURE — replay with:", file=sys.stderr)
            print(f"  seed={args.seed} docs={batch!r}", file=sys.stderr)
            raise
    dt = time.time() - t0
    print(json.dumps({"fuzz": "kernel_laws", "docs": n,
                      "seed": args.seed, "sec": round(dt, 1),
                      "docs_per_sec": round(n / dt)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
