"""Feature coding: (f0, sp, ap) <-> fixed-size frame vectors.

The reference's preprocessing compresses WORLD output into ~63-dim
frames (SURVEY.md §3.3: coded spectral envelope + band aperiodicity +
log-F0 + V/UV). Layout here (frame_size = n_sp + n_ap + 2, default
57 + 4 + 1 + 1 = 63):

  [0:n_sp]            DCT-II (ortho) coefficients of log spectral envelope
  [n_sp:n_sp+n_ap]    band aperiodicity means (bands as in world.cpp)
  [-2]                log f0 (0 when unvoiced)
  [-1]                V/UV flag in {0, 1}
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
from scipy.fft import dct, idct

from parrot_tpu.vocoder import world as _w

N_SP_DEFAULT = 57
N_AP_DEFAULT = _w.N_AP_BANDS


def code_sp(sp: np.ndarray, n_sp: int = N_SP_DEFAULT) -> np.ndarray:
    """sp (N, F) power envelope -> (N, n_sp) cepstral-DCT coefficients."""
    logsp = np.log(np.maximum(sp, 1e-12))
    return dct(logsp, type=2, norm="ortho", axis=-1)[:, :n_sp]


def decode_sp(coded: np.ndarray, F: int) -> np.ndarray:
    full = np.zeros((coded.shape[0], F), np.float64)
    full[:, :coded.shape[1]] = coded
    return np.exp(idct(full, type=2, norm="ortho", axis=-1))


def _band_ownership(F: int, n_ap: int):
    """Final per-bin band ownership as world.cpp writes it: band b fills
    [lo_b, hi_b] inclusive but band b+1 then overwrites the shared bin
    hi_b, so b effectively owns [lo_b, lo_{b+1} - 1] (last band to F-1)."""
    bounds = [int(np.floor(b / n_ap * (F - 1))) for b in range(n_ap + 1)]
    out = []
    for b in range(n_ap):
        lo = bounds[b]
        hi = (F - 1) if b == n_ap - 1 else bounds[b + 1] - 1
        out.append((lo, hi))
    return out


def code_ap(ap: np.ndarray, n_ap: int = N_AP_DEFAULT) -> np.ndarray:
    """ap (N, F) -> (N, n_ap) band means (lossless for ap written by
    world_aperiodicity, whose band ownership _band_ownership mirrors)."""
    N, F = ap.shape
    out = np.zeros((N, n_ap), np.float64)
    for b, (lo, hi) in enumerate(_band_ownership(F, n_ap)):
        out[:, b] = ap[:, lo:hi + 1].mean(axis=1)
    return out


def decode_ap(coded: np.ndarray, F: int) -> np.ndarray:
    N, n_ap = coded.shape
    out = np.zeros((N, F), np.float64)
    for b, (lo, hi) in enumerate(_band_ownership(F, n_ap)):
        out[:, lo:hi + 1] = coded[:, b:b + 1]
    return np.clip(out, 0.001, 0.999)


def code_frames(f0: np.ndarray, sp: np.ndarray, ap: np.ndarray,
                n_sp: int = N_SP_DEFAULT,
                n_ap: int = N_AP_DEFAULT) -> np.ndarray:
    """(f0, sp, ap) -> (N, n_sp + n_ap + 2) float32 frames."""
    vuv = (f0 > 0).astype(np.float64)
    lf0 = np.where(f0 > 0, np.log(np.maximum(f0, 1e-6)), 0.0)
    return np.concatenate(
        [code_sp(sp, n_sp), code_ap(ap, n_ap),
         lf0[:, None], vuv[:, None]], axis=1).astype(np.float32)


def decode_frames(frames: np.ndarray, fs: int,
                  n_ap: int = N_AP_DEFAULT,
                  fft_size: Optional[int] = None
                  ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """frames (N, D) -> (f0, sp, ap) ready for synthesis."""
    if fft_size is None:
        fft_size = _w.get_fft_size(fs)
    F = fft_size // 2 + 1
    frames = np.asarray(frames, np.float64)
    n_sp = frames.shape[1] - n_ap - 2
    sp = decode_sp(frames[:, :n_sp], F)
    ap = decode_ap(frames[:, n_sp:n_sp + n_ap], F)
    vuv = frames[:, -1] > 0.5
    f0 = np.where(vuv, np.exp(frames[:, -2]), 0.0)
    f0 = np.clip(f0, 0.0, _w.F0_CEIL)
    f0 = np.where(f0 < _w.F0_FLOOR, 0.0, f0)
    return f0, sp, ap
