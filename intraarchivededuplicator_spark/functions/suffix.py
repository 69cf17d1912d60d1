"""Suffix-array construction + substring search (the J12 containment kernel).

Prefix-doubling construction (Manber-Myers) vectorized with numpy argsort:
O(n log^2 n), pure numpy, no per-char Python. Used inside the containment
verify stage (operators/containment.py): one array per outer document
amortizes many inner-document probes — the distributed analog of the
reference's archive-containment check
(/root/reference/deduplicator/ProcessArchive.py:351-394).
"""

from __future__ import annotations

import numpy as np


def suffix_array(s: bytes | str) -> np.ndarray:
    """Indices of all suffixes of s in lexicographic order."""
    if isinstance(s, str):
        s = s.encode("utf-8")
    n = len(s)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = np.frombuffer(s, dtype=np.uint8).astype(np.int64)
    sa = np.argsort(rank, kind="stable")
    k = 1
    while k < n:
        # key = (rank[i], rank[i+k]) with -1 past the end
        second = np.full(n, -1, dtype=np.int64)
        second[: n - k] = rank[k:]
        order = np.lexsort((second, rank))
        new_rank = np.empty(n, dtype=np.int64)
        prev = order[0]
        new_rank[prev] = 0
        r = 0
        key1 = rank[order]
        key2 = second[order]
        bumps = (key1[1:] != key1[:-1]) | (key2[1:] != key2[:-1])
        new_rank[order[1:]] = np.cumsum(bumps)
        rank = new_rank
        sa = order
        if rank[sa[-1]] == n - 1:
            break
        k <<= 1
    return sa.astype(np.int64)


def sa_contains(text: bytes | str, sa: np.ndarray, needle: bytes | str) -> bool:
    """Binary search for needle as a substring of text using its suffix array."""
    if isinstance(text, str):
        text = text.encode("utf-8")
    if isinstance(needle, str):
        needle = needle.encode("utf-8")
    m = len(needle)
    if m == 0:
        return True
    if m > len(text):
        return False
    lo, hi = 0, len(sa)
    while lo < hi:
        mid = (lo + hi) // 2
        start = int(sa[mid])
        if text[start : start + m] < needle:
            lo = mid + 1
        else:
            hi = mid
    if lo == len(sa):
        return False
    start = int(sa[lo])
    return text[start : start + m] == needle
