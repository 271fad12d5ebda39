"""Near-duplicate key detection (pure-Python core).

Reference: LevenshteinAnnotator.scala:27-114 — cross product of all
extracted keys longer than 3 chars, uniform them (strip [-_], lowercase),
DP edit distance, pairs with distance <= 1 reported in canonical
(min, max) order. The Spark-side analog (keys as a DataFrame, built-in
``F.levenshtein``) lives in operators/stats.py.
"""

from __future__ import annotations

import re

THRESHOLD_LENGTH = 3    # LevenshteinAnnotator.scala:27 (strictly greater)
THRESHOLD_DISTANCE = 1  # LevenshteinAnnotator.scala:31

_UNIFORM_RE = re.compile(r"[-_]")


def uniform_string(s: str) -> str:
    """LevenshteinAnnotator.scala:87-89."""
    return _UNIFORM_RE.sub("", s).lower()


def calculate_distance(a, b) -> int:
    """Classic DP Levenshtein (LevenshteinAnnotator.scala:56-61)."""
    prev = list(range(len(b) + 1))
    for x in a:
        cur = [prev[0] + 1]
        for j, y in enumerate(b):
            cur.append(min(cur[j] + 1, prev[j + 1] + 1,
                           prev[j] + (0 if x == y else 1)))
        prev = cur
    return prev[-1]


def cross_product(xs: set, ys: set) -> set:
    """All pairs with both sides longer than THRESHOLD_LENGTH
    (LevenshteinAnnotator.scala:72-78)."""
    return {
        (x, y)
        for x in xs for y in ys
        if len(x) > THRESHOLD_LENGTH and len(y) > THRESHOLD_LENGTH
    }


def compare_sets(sch_keys: set, acc_keys: set) -> set:
    """LevenshteinAnnotator.scala:96-114. Streams the pair space
    instead of materializing ``cross_product`` first — K x K tuples in
    one set is O(K²) driver memory before any distance filtering; the
    inline loop keeps only the (rare) matches."""
    out = set()
    for first in sch_keys:
        if len(first) <= THRESHOLD_LENGTH:
            continue
        ufirst = uniform_string(first)
        for second in acc_keys:
            if len(second) <= THRESHOLD_LENGTH or first == second:
                continue
            if calculate_distance(ufirst, uniform_string(second)) \
                    <= THRESHOLD_DISTANCE:
                out.add((first, second))
    return out


def get_duplicates(keys: set) -> set:
    """Probably-duplicated key pairs in canonical (min, max) order
    (LevenshteinAnnotator.scala:39-46)."""
    return {
        (a, b) if a <= b else (b, a)
        for a, b in compare_sets(keys, keys)
    }
