"""Pallas fused autoregressive decode kernel — the north-star op
(BASELINE.json:5: "the frame-level LSTM decoder with Graves-style GMM
window attention runs as a fused Pallas scan kernel; the mixture-density
head sampling is fused into the same autoregressive step so generation
never leaves HBM").

Design (see /opt/skills/guides/pallas_guide.md):
- ONE pallas_call runs the whole generation: grid = (T,) steps. TPU grid
  iterations execute sequentially on a core, so decoder state (h/c per
  layer, kappa, context, fed-back frame) lives in VMEM scratch and
  persists across steps — state never round-trips to HBM.
- All weights are VMEM-resident for the whole call (pass bfloat16 to
  halve footprint; matmuls accumulate in float32 via
  preferred_element_type).
- Speaker conditioning and biases are folded into per-layer (B, 4H) gate
  bias inputs outside the kernel, so the kernel is speaker-agnostic.
- MDN sampling happens in-kernel with the TPU PRNG: Gumbel-max over
  mixture logits, Box-Muller for the Gaussian draw, biased-sampling
  transform applied to both.
- Deterministic: reseeded per step from (seed, step).

Decoder layer count is fixed at 3 (the flagship architecture). Parity
with the plain-JAX `Parrot.sample_step` is asserted in
tests/test_fused_decode.py (MSE head: exact; GMM: moments + determinism).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class FusedDecodeParams(NamedTuple):
    """Weights prepared for the kernel (see `prepare` below)."""

    wx1x: jax.Array  # (D, 4H)
    wx1w: jax.Array  # (E, 4H)
    wh1: jax.Array   # (H, 4H)
    wx2x: jax.Array
    wx2w: jax.Array
    wx2h: jax.Array  # (H, 4H)
    wh2: jax.Array
    wx3x: jax.Array
    wx3w: jax.Array
    wx3h: jax.Array
    wh3: jax.Array
    bias1: jax.Array  # (B, 4H) = b + spk @ wx_s  (per-example)
    bias2: jax.Array
    bias3: jax.Array
    wattn: jax.Array  # (H, 3K)
    battn: jax.Array  # (1, 3K)
    wread: jax.Array  # (3H + E, R)
    bread: jax.Array  # (1, R)
    whead: jax.Array  # (R, HD)
    bhead: jax.Array  # (1, HD)


def prepare_params(model, params, speaker, batch_size,
                   weight_dtype=jnp.bfloat16) -> FusedDecodeParams:
    """Slice/cast the Parrot pytree into kernel layout.

    Folds the per-example speaker gate contribution and the cell bias
    into (B, 4H) bias tensors, mirroring Parrot._wx_slices.
    """
    D, E, H, S = model.D, model.E, model.H, model.S
    assert model.L == 3, "fused kernel supports the 3-layer flagship decoder"
    dec = params["dec"]
    spk = model._speaker_vec(params, speaker)  # (B, S) or None

    def split(cell, layer):
        wx = cell["wx"]
        o = 0
        x_w = wx[o:o + D]; o += D
        w_w = wx[o:o + E]; o += E
        h_w = None
        if layer > 0:
            h_w = wx[o:o + H]; o += H
        s_w = wx[o:o + S] if S else None
        bias = jnp.broadcast_to(cell["b"][None, :], (batch_size, 4 * H))
        if spk is not None:
            bias = bias + jnp.dot(spk, s_w)
        return x_w, w_w, h_w, bias

    x1, w1, _, b1 = split(dec[0], 0)
    x2, w2, h2, b2 = split(dec[1], 1)
    x3, w3, h3, b3 = split(dec[2], 2)
    c = lambda a: a.astype(weight_dtype)
    f = lambda a: a.astype(jnp.float32)
    return FusedDecodeParams(
        wx1x=c(x1), wx1w=c(w1), wh1=c(dec[0]["wh"]),
        wx2x=c(x2), wx2w=c(w2), wx2h=c(h2), wh2=c(dec[1]["wh"]),
        wx3x=c(x3), wx3w=c(w3), wx3h=c(h3), wh3=c(dec[2]["wh"]),
        bias1=f(b1), bias2=f(b2), bias3=f(b3),
        wattn=c(params["attn"]["proj"]["w"]),
        battn=f(params["attn"]["proj"]["b"])[None, :],
        wread=c(params["readout"]["w"]),
        bread=f(params["readout"]["b"])[None, :],
        whead=c(params["head"]["w"]),
        bhead=f(params["head"]["b"])[None, :],
    )


def _uniform(shape):
    """random bits -> uniform in (0, 1). prng_random_bits yields int32
    here; bitcast to uint32 BEFORE shifting or sign extension produces
    negative "uniforms" (and NaNs downstream)."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # top 24 bits fit in int32 (Mosaic can't cast uint32->f32 directly)
    top = pltpu.bitcast(bits >> 8, jnp.int32)
    u = top.astype(jnp.float32) * (1.0 / (1 << 24))
    # clamp strictly inside (0, 1): u == 1.0 would make the Gumbel
    # -log(-log(u)) infinite and hijack the categorical argmax
    return jnp.clip(u, 1e-7, 0.999999)


def _make_kernel(*, B, D, E, H, K, M, U, C, alignment, bias,
                 min_log_sigma, is_gmm, stop_threshold=1.0, debug_mode=0):
    """Returns the kernel body. Shapes are static (closed over)."""

    def kernel(seed_ref,
               wx1x, wx1w, wh1, wx2x, wx2w, wx2h, wh2,
               wx3x, wx3w, wx3h, wh3, bias1, bias2, bias3,
               wattn, battn, wread, bread, whead, bhead,
               enc, mask,
               h1_0, c1_0, h2_0, c2_0, h3_0, c3_0, kappa_0, w_0, x_0,
               frames_out, kappa_out,
               h1, c1, h2, c2, h3, c3, kappa_s, w_s, x_s, done_s):
        chunk = pl.program_id(0)

        @pl.when(chunk == 0)
        def _init():
            h1[:] = h1_0[:]
            c1[:] = c1_0[:]
            h2[:] = h2_0[:]
            c2[:] = c2_0[:]
            h3[:] = h3_0[:]
            c3[:] = c3_0[:]
            kappa_s[:] = kappa_0[:]
            w_s[:] = w_0[:]
            x_s[:] = x_0[:]
            done_s[0] = 0

        # early exit: once every row's window has passed its text end,
        # skip the remaining chunks entirely (outputs zero-filled; the
        # host computes lengths from the kappa trajectory).
        all_done = done_s[0] == 1

        @pl.when(all_done)
        def _skip():
            frames_out[:] = jnp.zeros_like(frames_out)
            kappa_out[:] = jnp.zeros_like(kappa_out)

        if is_gmm and debug_mode != 2:
            pltpu.prng_seed(seed_ref[0] + chunk)

        f32 = jnp.float32
        dot = lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=f32)

        def step_body(c, _):
            def lstm(gates, h_ref, c_ref, wh):
                g = gates + dot(h_ref[:].astype(wh.dtype), wh)
                i = jax.nn.sigmoid(g[:, :H])
                fgt = jax.nn.sigmoid(g[:, H:2 * H])
                cand = jnp.tanh(g[:, 2 * H:3 * H])
                o = jax.nn.sigmoid(g[:, 3 * H:])
                c_new = fgt * c_ref[:] + i * cand
                h_new = o * jnp.tanh(c_new)
                h_ref[:] = h_new
                c_ref[:] = c_new
                return h_new

            x = x_s[:]
            wctx = w_s[:]
            wd = wx1x[:].dtype

            # layer 1: input [x, w_prev] (+ folded speaker bias)
            g1 = (bias1[:] + dot(x.astype(wd), wx1x[:])
                  + dot(wctx.astype(wd), wx1w[:]))
            h1_new = lstm(g1, h1, c1, wh1[:])

            # attention
            a = dot(h1_new.astype(wd), wattn[:]) + battn[:]      # (B, 3K)
            alpha = jnp.exp(a[:, :K])
            beta = jnp.exp(a[:, K:2 * K])
            kappa = kappa_s[:] + alignment * jnp.exp(a[:, 2 * K:])
            kappa_s[:] = kappa

            u = jax.lax.broadcasted_iota(jnp.int32, (1, U), 1).astype(f32)
            phi = jnp.zeros((B, U), f32)
            for k in range(K):
                diff = kappa[:, k:k + 1] - u                      # (B, U)
                phi += alpha[:, k:k + 1] * jnp.exp(-beta[:, k:k + 1] * diff * diff)
            phi = phi * mask[:]
            # context: batched (1,U)x(U,E) matmul per example via dot_general
            wctx = jax.lax.dot_general(
                phi[:, None, :], enc[:].astype(f32),
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=f32)[:, 0, :]              # (B, E)
            w_s[:] = wctx

            # layers 2, 3: input [x, w_t, h_below]
            g2 = (bias2[:] + dot(x.astype(wd), wx2x[:])
                  + dot(wctx.astype(wd), wx2w[:])
                  + dot(h1_new.astype(wd), wx2h[:]))
            h2_new = lstm(g2, h2, c2, wh2[:])
            g3 = (bias3[:] + dot(x.astype(wd), wx3x[:])
                  + dot(wctx.astype(wd), wx3w[:])
                  + dot(h2_new.astype(wd), wx3h[:]))
            h3_new = lstm(g3, h3, c3, wh3[:])

            feats = jnp.concatenate([h1_new, h2_new, h3_new, wctx], axis=-1)
            readout = jnp.tanh(dot(feats.astype(wd), wread[:]) + bread[:])
            raw = dot(readout.astype(wd), whead[:]) + bhead[:]    # (B, head)

            if is_gmm:
                # Mosaic dislikes 3D reshapes of non-128-aligned dims, so the
                # (B, M, D) mixture tensors stay flat (B, M*D) and selection
                # is a 2D mask + one MXU matmul with a block-sum matrix.
                MD = M * D
                mu_flat = raw[:, :MD]                             # (B, M*D)
                ls_flat = jnp.maximum(raw[:, MD:2 * MD], min_log_sigma)
                logits = raw[:, 2 * MD:] * (1.0 + bias)           # (B, M)
                # Gumbel-max categorical
                if debug_mode == 2:
                    comp = jnp.zeros((B,), jnp.int32)
                else:
                    gu = _uniform((B, M))
                    comp = jnp.argmax(logits - jnp.log(-jnp.log(gu)), axis=-1)
                col = jax.lax.broadcasted_iota(jnp.int32, (B, MD), 1) // D
                rep = (comp[:, None] == col).astype(f32)          # (B, M*D)
                # block-sum matrix: (M*D, D), 1 where row % D == col
                r_id = jax.lax.broadcasted_iota(jnp.int32, (MD, D), 0)
                c_id = jax.lax.broadcasted_iota(jnp.int32, (MD, D), 1)
                sum_mat = (r_id % D == c_id).astype(f32)
                mu_c = dot(mu_flat * rep, sum_mat)                # (B, D)
                ls_c = dot(ls_flat * rep, sum_mat)
                # Box-Muller normal
                if debug_mode in (1, 2):
                    x_new = mu_c
                elif debug_mode == 3:
                    u1 = _uniform((B, D))
                    u2 = _uniform((B, D))
                    z = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * np.pi * u2)
                    x_new = raw[:, :D] + 0.0 * z
                else:
                    u1 = _uniform((B, D))
                    u2 = _uniform((B, D))
                    z = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * np.pi * u2)
                    x_new = mu_c + jnp.exp(ls_c - bias) * z
            else:
                x_new = raw                                       # MSE head

            x_s[:] = x_new
            frames_out[pl.ds(c, 1)] = x_new[None]
            kappa_out[pl.ds(c, 1)] = kappa[None]
            return 0

        @pl.when(jnp.logical_not(all_done))
        def _run_chunk():
            jax.lax.fori_loop(0, C, step_body, 0, unroll=False)
            if stop_threshold < 1.0:
                text_len = jnp.sum(mask[:], axis=-1, keepdims=True)  # (B,1)
                past = (kappa_s[:] > text_len).astype(jnp.float32)
                frac = jnp.mean(past, axis=-1)                       # (B,)
                row_done = frac > stop_threshold
                done_s[0] = jnp.all(row_done).astype(jnp.int32)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("T", "D", "E", "H", "K", "M", "head_dim", "alignment",
                     "bias", "min_log_sigma", "is_gmm", "interpret",
                     "debug_mode", "chunk_steps", "stop_threshold"))
def fused_decode(kp: FusedDecodeParams, enc, mask, init_state, seed,
                 *, T, D, E, H, K, M, head_dim, alignment=1.0, bias=0.0,
                 min_log_sigma=-7.0, is_gmm=True, interpret=False,
                 debug_mode=0, chunk_steps=16, stop_threshold=1.0):
    """Run T fused autoregressive steps.

    kp: FusedDecodeParams; enc (B, U, E) f32; mask (B, U) f32;
    init_state: (h1,c1,h2,c2,h3,c3, kappa (B,K), w (B,E), x (B,D));
    seed: int32 array (1,). Returns (frames (T, B, D), kappas (T, B, K)).
    """
    B, U, _ = enc.shape
    C = chunk_steps
    assert T % C == 0, f"T={T} must be a multiple of chunk_steps={C}"
    kernel = _make_kernel(B=B, D=D, E=E, H=H, K=K, M=M, U=U, C=C,
                          alignment=alignment, bias=bias,
                          min_log_sigma=min_log_sigma, is_gmm=is_gmm,
                          stop_threshold=stop_threshold,
                          debug_mode=debug_mode)

    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    n_weights = 20
    in_specs = [vm() for _ in range(n_weights)]          # weights/biases
    in_specs += [vm(), vm()]                             # enc, mask
    in_specs += [vm() for _ in range(9)]                 # init state

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T // C,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((C, B, D), lambda t, seed: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, B, K), lambda t, seed: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),   # h1
            pltpu.VMEM((B, H), jnp.float32),   # c1
            pltpu.VMEM((B, H), jnp.float32),   # h2
            pltpu.VMEM((B, H), jnp.float32),   # c2
            pltpu.VMEM((B, H), jnp.float32),   # h3
            pltpu.VMEM((B, H), jnp.float32),   # c3
            pltpu.VMEM((B, K), jnp.float32),   # kappa
            pltpu.VMEM((B, E), jnp.float32),   # w
            pltpu.VMEM((B, D), jnp.float32),   # x
            pltpu.SMEM((1,), jnp.int32),        # all-done flag
        ],
    )

    frames, kappas = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, B, D), jnp.float32),
            jax.ShapeDtypeStruct((T, B, K), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary",),  # sequential steps: state
                                                 # carries across the grid
        ),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32),
      *kp,
      enc.astype(jnp.float32), mask.astype(jnp.float32),
      *[s.astype(jnp.float32) for s in init_state])
    return frames, kappas
