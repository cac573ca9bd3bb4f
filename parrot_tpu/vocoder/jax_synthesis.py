"""Jittable JAX synthesis reference path (BASELINE.json:5 "WORLD ...
waveform synthesis get JAX-jittable reference paths for output-fidelity
checks").

Implements the same synthesis spec as cpp/world.cpp `world_synthesize`
(see the comment block there) — pulse-train + noise excitation split
per-bin by aperiodicity, zero-phase IRs, centered overlap-add. The
deterministic LCG noise is passed in as an array (world.lcg_noise) so the
function stays pure. Precision: this path computes in float32 while the
C++ uses float64, so outputs agree to f32 roundoff (~1e-7 relative), not
bitwise; pass `pulses` (world.pulse_excitation) for exact pulse timing.
Change both implementations together.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


@partial(jax.jit, static_argnames=("fs", "hop", "fft_size"))
def synthesize_jax(f0, sp, ap, noise, fs: int, hop: int, fft_size: int,
                   pulses=None):
    """f0 (N,), sp (N, F), ap (N, F), noise (N*hop,) -> waveform (N*hop,).

    `pulses`: optional precomputed voiced excitation (world.pulse_excitation)
    for bit-stable pulse timing vs the C++ path; without it the pulse train
    is built in-graph (float32 phase — a pulse can land one sample off the
    float64 C++ placement, harmless acoustically).
    """
    N, F = sp.shape
    T = N * hop
    dtype = sp.dtype

    if pulses is None:
        # voiced excitation: global phase accumulator, pulses on floor steps
        f0_samp = jnp.repeat(f0, hop)                    # (T,)
        phase = jnp.cumsum(f0_samp / fs)
        floor = jnp.floor(phase)
        prev_floor = jnp.concatenate([jnp.zeros((1,), floor.dtype),
                                      floor[:-1]])
        pulse = (floor > prev_floor).astype(dtype)
        amp = jnp.sqrt(jnp.where(f0_samp > 0,
                                 fs / jnp.maximum(f0_samp, 1e-6),
                                 0.0)).astype(dtype)
        ev = pulse * amp                                 # (T,)
    else:
        ev = pulses.astype(dtype)
    en = noise.astype(dtype)                             # (T,)

    # --- per-frame zero-phase IRs, centered by rolling fft/2
    sp_pos = jnp.maximum(sp, 0.0)
    ap_c = jnp.clip(ap, 0.0, 1.0)
    hv = jnp.fft.irfft(jnp.sqrt(sp_pos * (1.0 - ap_c)).astype(jnp.float32),
                       n=fft_size, axis=-1)
    hn = jnp.fft.irfft(jnp.sqrt(sp_pos * ap_c).astype(jnp.float32),
                       n=fft_size, axis=-1)
    hv = jnp.roll(hv, fft_size // 2, axis=-1)            # (N, fft)
    hn = jnp.roll(hn, fft_size // 2, axis=-1)

    # --- per-frame excitation segments -> FFT convolution (batched GEMM-ish)
    conv_len = hop + fft_size
    cn = _next_pow2(hop + 2 * fft_size)                  # match C++ size
    ev_seg = ev.reshape(N, hop)
    en_seg = en.reshape(N, hop)
    EV = jnp.fft.rfft(ev_seg, n=cn, axis=-1)
    EN = jnp.fft.rfft(en_seg, n=cn, axis=-1)
    HV = jnp.fft.rfft(hv, n=cn, axis=-1)
    HN = jnp.fft.rfft(hn, n=cn, axis=-1)
    contrib = jnp.fft.irfft(EV * HV + EN * HN, n=cn, axis=-1)[:, :conv_len]

    # --- centered OLA: frame i adds at i*hop - fft/2 (padded accumulator)
    pad = fft_size
    y0 = jnp.zeros((T + 2 * pad,), dtype)

    def body(i, y):
        base = i * hop - fft_size // 2 + pad
        cur = jax.lax.dynamic_slice(y, (base,), (conv_len,))
        return jax.lax.dynamic_update_slice(y, cur + contrib[i], (base,))

    y = jax.lax.fori_loop(0, N, body, y0)
    return y[pad:pad + T]
