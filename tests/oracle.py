"""Trusted NumPy oracles for conformance testing.

The reference's own tests only check the k-ordered sortedness property
(reference: tests/kiss.cpp:26-28). We go further (per SURVEY.md section 4)
and check exact equality against a brute-force oracle implementing the
full ordering contract: sort by first k characters, end-of-text smallest,
ties broken by ascending position, SA[0] = n.
"""

from __future__ import annotations

import numpy as np


def k_ordered_sa(text: np.ndarray, k: int | None) -> np.ndarray:
    """Brute-force k-ordered suffix array over n+1 suffixes.

    Implements the reference comparator semantics directly
    (reference: include/biovoltron/algo/sort/kiss1_core.hpp:94-135):
    compare min(k, remaining) characters with end-of-text sorting
    smallest, ties at >= k characters resolved by text position.
    """
    text = np.asarray(text, dtype=np.int16)
    n = len(text)
    if k is None or k < 0 or k > n:
        k = n
    k = max(int(k), 1)
    # pad with -1 (smaller than every character): a suffix that ends gets
    # -1 lanes, which sorts it before any suffix with real characters.
    pad = np.full(n + k, -1, dtype=np.int16)
    pad[:n] = text
    if n == 0:
        return np.zeros(1, dtype=np.uint32)
    windows = np.lib.stride_tricks.sliding_window_view(pad, k)[: n + 1]
    # np.lexsort: LAST key is primary; ties fall through to earlier keys,
    # ending at position (arange) for the i<j rule.
    keys = [np.arange(n + 1)]
    keys.extend(windows[:, j] for j in range(k - 1, -1, -1))
    return np.lexsort(keys).astype(np.uint32)


def check_k_sorted(text: np.ndarray, sa: np.ndarray, k: int | None) -> None:
    """The reference's own oracle: adjacent suffixes non-decreasing under
    k-prefix comparison (reference: tests/kiss.cpp:26-28), plus the
    permutation property the reference does not check."""
    n = len(text)
    assert sorted(sa.tolist()) == list(range(n + 1)), "SA is not a permutation"
    if k is None or k < 0:
        k = n
    text = np.asarray(text)
    for a, b in zip(sa[:-1], sa[1:]):
        sa_a = text[a : a + k].tobytes()
        sa_b = text[b : b + k].tobytes()
        assert sa_a <= sa_b, f"suffixes {a},{b} out of k-order"


def search_all(text: np.ndarray, pattern: np.ndarray) -> np.ndarray:
    """All occurrence positions of pattern in text (brute force)."""
    text = np.asarray(text)
    pattern = np.asarray(pattern)
    m = len(pattern)
    if m == 0 or m > len(text):
        return np.empty(0, dtype=np.int64)
    windows = np.lib.stride_tricks.sliding_window_view(text, m)
    return np.nonzero((windows == pattern).all(axis=1))[0]


def random_dna(n: int, seed: int = 0) -> np.ndarray:
    return np.random.default_rng(seed).integers(0, 4, n, dtype=np.int8)


def repeat_heavy_dna(n: int, unit: int = 50, seed: int = 0) -> np.ndarray:
    """Tandem-repeat-rich text: stresses deep ties and the exact-k cut."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 4, unit, dtype=np.int8)
    reps = -(-n // unit)
    text = np.tile(base, reps)[:n].copy()
    # sprinkle ~0.5% mutations so groups eventually split
    nmut = max(1, n // 200)
    idx = rng.integers(0, n, nmut)
    text[idx] = rng.integers(0, 4, nmut, dtype=np.int8)
    return text


def genome_like_dna(n: int, ancestral: int = 1 << 20, seed: int = 0):
    """Genome-like text: segments copied from a smaller ancestral sequence
    with ~1% mutations, giving long approximate repeats (the workload
    shape that makes real genomes hard to suffix-sort)."""
    rng = np.random.default_rng(seed)
    anc = rng.integers(0, 4, min(ancestral, max(n, 1)), dtype=np.int8)
    out = np.empty(n, dtype=np.int8)
    pos = 0
    while pos < n:
        seg = int(rng.integers(1000, 20000))
        seg = min(seg, n - pos, len(anc))
        start = int(rng.integers(0, max(len(anc) - seg, 1)))
        chunk = anc[start : start + seg].copy()
        nmut = max(1, seg // 100)
        mi = rng.integers(0, seg, nmut)
        chunk[mi] = rng.integers(0, 4, nmut, dtype=np.int8)
        out[pos : pos + seg] = chunk
        pos += seg
    return out
