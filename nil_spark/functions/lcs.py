"""Hunt-Szymanski LCS — the engine's verification kernel.

Port of the reference's O((r+n)·log n) algorithm
(/root/reference/src/main/kotlin/jp/ac/osaka_u/sdl/nil/entity/
HuntSzymanskiLCS.kt:8-34): inverted index of one sequence's match
positions + patience-style binary search over tail positions.  This is
an *independent* implementation from the test oracle's
(nil_spark/testing/oracle.py), and both are property-tested against the
naive O(NM) DP (reference NaiveLCS.kt:6-23).
"""

from __future__ import annotations

from bisect import bisect_left

import numpy as np


def hs_lcs(a: np.ndarray | list, b: np.ndarray | list) -> int:
    """LCS length of two integer sequences."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0
    if la > lb:
        a, b = b, a
        la, lb = lb, la
    # match-position index of the longer sequence, positions descending
    pos: dict[int, list[int]] = {}
    for j in range(lb - 1, -1, -1):
        pos.setdefault(int(b[j]), []).append(j)
    tails: list[int] = []
    for x in a:
        lst = pos.get(int(x))
        if not lst:
            continue
        for j in lst:
            i = bisect_left(tails, j)
            if i == len(tails):
                tails.append(j)
            else:
                tails[i] = j
    return len(tails)


def lcs_similarity_int(a, b) -> int:
    """Reference verification score: lcs·100 // min(|a|,|b|)
    (LCSBasedVerification.kt:9-10, integer division)."""
    if len(a) == 0 or len(b) == 0:
        return 0
    return hs_lcs(a, b) * 100 // min(len(a), len(b))
