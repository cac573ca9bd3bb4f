"""Mel-cepstral-distortion-style metric over coded envelope coefficients
(BASELINE.json:2 "MCD parity"). Standard formula on cepstra c_1..c_D
(c_0 / energy excluded), optional DTW alignment for unequal lengths.
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
        d = np.array([np.sqrt(((a[i] - b[j]) ** 2).sum()) for i, j in path])
        return float(_MCD_CONST * d.mean())
    n = min(len(a), len(b))
    d = np.sqrt(((a[:n] - b[:n]) ** 2).sum(axis=1))
    return float(_MCD_CONST * d.mean())


def _dtw_path(a: np.ndarray, b: np.ndarray):
    Ta, Tb = len(a), len(b)
    dist = np.sqrt(((a[:, None, :] - b[None, :, :]) ** 2).sum(-1))
    acc = np.full((Ta + 1, Tb + 1), np.inf)
    acc[0, 0] = 0.0
    for i in range(1, Ta + 1):
        for j in range(1, Tb + 1):
            acc[i, j] = dist[i - 1, j - 1] + min(acc[i - 1, j],
                                                 acc[i, j - 1],
                                                 acc[i - 1, j - 1])
    path = []
    i, j = Ta, Tb
    while i > 0 and j > 0:
        path.append((i - 1, j - 1))
        k = int(np.argmin([acc[i - 1, j - 1], acc[i - 1, j], acc[i, j - 1]]))
        if k == 0:
            i, j = i - 1, j - 1
        elif k == 1:
            i -= 1
        else:
            j -= 1
    return path[::-1]
