"""Pallas fused autoregressive decode kernel — the north-star op
(BASELINE.json:5: "the frame-level LSTM decoder with Graves-style GMM
window attention runs as a fused Pallas scan kernel; the mixture-density
head sampling is fused into the same autoregressive step so generation
never leaves HBM").

Design (see /opt/skills/guides/pallas_guide.md):
- ONE pallas_call runs the whole generation: grid = (T/C,) chunks of C
  steps (inner fori_loop). TPU grid iterations execute sequentially on a
  core, so decoder state (h/c per layer, kappa, context, fed-back frame)
  lives in VMEM scratch and persists across steps — state never
  round-trips to HBM.
- All weights are VMEM-resident for the whole call (pass bfloat16 to
  halve footprint; matmuls accumulate in float32 via
  preferred_element_type).
- Speaker conditioning and biases are folded into per-layer (B, 4H) gate
  bias inputs outside the kernel, so the kernel is speaker-agnostic.
- MDN sampling happens in-kernel with the TPU PRNG: Gumbel-max over
  mixture logits, Box-Muller for the Gaussian draw, biased-sampling
  transform applied to both. Deterministic: reseeded per chunk.
- Early exit: once every row's window has passed its text end, remaining
  chunks zero-fill their outputs and skip all compute.

Any decoder depth L >= 1 is supported (the arg list is built
programmatically). Parity with the plain-JAX `Parrot.sample_step` is
asserted in tests/test_fused_decode.py (MSE head: exact; GMM:
determinism + statistics).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def n_weight_arrays(L: int, layer_norm: bool = False) -> int:
    """Flat weight-tuple length: per layer [wx_x, wx_w, (wx_h l>0), wh,
    bias, (ln_gg, ln_gb, ln_cg, ln_cb when layer_norm)] plus
    attn/readout/head (6)."""
    per = sum(4 if l == 0 else 5 for l in range(L))
    if layer_norm:
        per += 4 * L
    return per + 6


def prepare_params(model, params, speaker, batch_size,
                   weight_dtype=jnp.bfloat16) -> Tuple[jax.Array, ...]:
    """Slice/cast the Parrot pytree into the kernel's flat weight tuple.

    Folds the per-example speaker gate contribution and the cell bias
    into (B, 4H) bias tensors, mirroring Parrot._wx_slices. Order per
    layer: wx_x (D,4H), wx_w (E,4H), [wx_h (H,4H) for l>0], wh (H,4H),
    bias (B,4H); then wattn, battn, wread, bread, whead, bhead.
    """
    D, E, H, S = model.D, model.E, model.H, model.S
    dec = params["dec"]
    spk = model._speaker_vec(params, speaker)  # (B, S) or None
    c = lambda a: a.astype(weight_dtype)
    f = lambda a: a.astype(jnp.float32)

    out = []
    for l, cell in enumerate(dec):
        wx = cell["wx"]
        o = 0
        x_w = wx[o:o + D]; o += D
        w_w = wx[o:o + E]; o += E
        h_w = None
        if l > 0:
            h_w = wx[o:o + H]; o += H
        s_w = wx[o:o + S] if S else None
        bias = jnp.broadcast_to(cell["b"][None, :], (batch_size, 4 * H))
        if spk is not None:
            bias = bias + jnp.dot(spk, s_w)
        out += [c(x_w), c(w_w)]
        if h_w is not None:
            out.append(c(h_w))
        out += [c(cell["wh"]), f(bias)]
        if "ln_g" in cell:  # layer_norm params ride along as f32 rows
            out += [f(cell["ln_g"]["g"])[None, :],
                    f(cell["ln_g"]["b"])[None, :],
                    f(cell["ln_c"]["g"])[None, :],
                    f(cell["ln_c"]["b"])[None, :]]
    out += [
        c(params["attn"]["proj"]["w"]),
        f(params["attn"]["proj"]["b"])[None, :],
        c(params["readout"]["w"]),
        f(params["readout"]["b"])[None, :],
        c(params["head"]["w"]),
        f(params["head"]["b"])[None, :],
    ]
    return tuple(out)


def flatten_state(st) -> Tuple[jax.Array, ...]:
    """DecoderState -> the kernel's flat init tuple
    (h_0, c_0, ..., h_{L-1}, c_{L-1}, kappa, w, x_last)."""
    flat = []
    for h, c in st.hs:
        flat += [h, c]
    return tuple(flat) + (st.kappa, st.w, st.x_last)


def split_state(flat, *, L, H, K, E, D) -> Tuple[jax.Array, ...]:
    """(B, 2LH+K+E+D) emit_state output -> the flat init-state tuple
    (h_0, c_0, ..., h_{L-1}, c_{L-1}, kappa, w, x_last) — the inverse
    of the kernel's final-state concatenation."""
    sizes = [H, H] * L + [K, E, D]
    out, o = [], 0
    for sz in sizes:
        out.append(flat[:, o:o + sz])
        o += sz
    assert o == flat.shape[-1], (o, flat.shape)
    return tuple(out)


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


def _make_kernel(*, B, D, E, H, K, M, U, C, L, alignment, bias,
                 min_log_sigma, is_gmm, layer_norm=False,
                 stop_threshold=1.0, debug_mode=0, emit_attention=False,
                 inject_uniforms=False, emit_state=False):
    """Returns the kernel body. Shapes, depth and LN are static.

    emit_attention=True adds an (C, B, 2K) output of per-step (alpha,
    beta); with the kappa trajectory this lets phi — and so the
    attention-alignment plots — be reconstructed OUTSIDE the kernel
    (2K floats/step instead of streaming the (B, U) phi itself).

    inject_uniforms=True replaces the TPU PRNG with a (C, B, M+2D)
    uniform input block per chunk — a TEST hook: the TPU interpreter
    stubs prng_random_bits to zeros on CPU, so distribution tests of
    the sampling plumbing (Gumbel-max, selection matmuls, Box-Muller,
    bias transform) inject host uniforms instead; the hardware PRNG
    itself is covered on-chip by scripts/tpu_checks.py."""

    def kernel(*refs):
        i = 0
        seed_ref = refs[i]; i += 1
        layers = []  # (wx_x, wx_w, wx_h|None, wh, bias, ln|None) per layer
        for l in range(L):
            if l == 0:
                wx_x, wx_w, wh, bi = refs[i:i + 4]; i += 4
                wx_h = None
            else:
                wx_x, wx_w, wx_h, wh, bi = refs[i:i + 5]; i += 5
            ln = None
            if layer_norm:
                ln = refs[i:i + 4]; i += 4  # (gg, gb, cg, cb)
            layers.append((wx_x, wx_w, wx_h, wh, bi, ln))
        wattn, battn, wread, bread, whead, bhead = refs[i:i + 6]; i += 6
        enc, mask = refs[i:i + 2]; i += 2
        un_ref = None
        if inject_uniforms:
            un_ref = refs[i]; i += 1
        init = refs[i:i + 2 * L + 3]; i += 2 * L + 3
        n_out = 2 + int(emit_attention) + int(emit_state)
        outs = refs[i:i + n_out]; i += n_out
        frames_out, kappa_out = outs[0], outs[1]
        ab_out = outs[2] if emit_attention else None
        state_out = outs[-1] if emit_state else None
        scratch = refs[i:i + 2 * L + 3]; i += 2 * L + 3
        done_s = refs[i]
        hs = [(scratch[2 * l], scratch[2 * l + 1]) for l in range(L)]
        kappa_s, w_s, x_s = scratch[2 * L:2 * L + 3]

        chunk = pl.program_id(0)

        @pl.when(chunk == 0)
        def _init():
            for s_ref, i_ref in zip(scratch, init):
                s_ref[:] = i_ref[:]
            done_s[0] = 0

        all_done = done_s[0] == 1

        @pl.when(all_done)
        def _skip():
            frames_out[:] = jnp.zeros_like(frames_out)
            kappa_out[:] = jnp.zeros_like(kappa_out)
            if ab_out is not None:
                ab_out[:] = jnp.zeros_like(ab_out)

        if is_gmm and debug_mode != 2 and not inject_uniforms:
            pltpu.prng_seed(seed_ref[0] + chunk)

        f32 = jnp.float32
        dot = lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=f32)

        def step_body(c, _):
            def layernorm(x, g_ref, b_ref):
                mean = jnp.mean(x, axis=-1, keepdims=True)
                var = jnp.mean((x - mean) * (x - mean), axis=-1,
                               keepdims=True)
                return (g_ref[:] * (x - mean) * jax.lax.rsqrt(var + 1e-5)
                        + b_ref[:])

            def lstm(gates, h_ref, c_ref, wh, ln):
                g = gates + dot(h_ref[:].astype(wh.dtype), wh[:])
                if ln is not None:
                    g = layernorm(g, ln[0], ln[1])
                i_ = jax.nn.sigmoid(g[:, :H])
                fgt = jax.nn.sigmoid(g[:, H:2 * H])
                cand = jnp.tanh(g[:, 2 * H:3 * H])
                o = jax.nn.sigmoid(g[:, 3 * H:])
                c_new = fgt * c_ref[:] + i_ * cand
                if ln is not None:
                    h_new = o * jnp.tanh(layernorm(c_new, ln[2], ln[3]))
                else:
                    h_new = o * jnp.tanh(c_new)
                h_ref[:] = h_new
                c_ref[:] = c_new
                return h_new

            x = x_s[:]
            wctx = w_s[:]
            wd = layers[0][0][:].dtype

            # layer 0: input [x, w_prev] (+ folded speaker bias)
            wx_x, wx_w, _, wh, bi, ln0 = layers[0]
            g0 = (bi[:] + dot(x.astype(wd), wx_x[:])
                  + dot(wctx.astype(wd), wx_w[:]))
            h_new = [lstm(g0, hs[0][0], hs[0][1], wh, ln0)]

            # attention from layer-0 state
            a = dot(h_new[0].astype(wd), wattn[:]) + battn[:]   # (B, 3K)
            alpha = jnp.exp(a[:, :K])
            beta = jnp.exp(a[:, K:2 * K])
            kappa = kappa_s[:] + alignment * jnp.exp(a[:, 2 * K:])
            kappa_s[:] = kappa

            u = jax.lax.broadcasted_iota(jnp.int32, (1, U), 1).astype(f32)
            phi = jnp.zeros((B, U), f32)
            for k in range(K):
                diff = kappa[:, k:k + 1] - u                    # (B, U)
                phi += alpha[:, k:k + 1] * jnp.exp(
                    -beta[:, k:k + 1] * diff * diff)
            phi = phi * mask[:]
            # context: batched (1,U)x(U,E) matmul per example
            wctx = jax.lax.dot_general(
                phi[:, None, :], enc[:].astype(f32),
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=f32)[:, 0, :]            # (B, E)
            w_s[:] = wctx

            # layers 1..L-1: input [x, w_t, h_below]
            for l in range(1, L):
                wx_x, wx_w, wx_h, wh, bi, lnl = layers[l]
                gl = (bi[:] + dot(x.astype(wd), wx_x[:])
                      + dot(wctx.astype(wd), wx_w[:])
                      + dot(h_new[-1].astype(wd), wx_h[:]))
                h_new.append(lstm(gl, hs[l][0], hs[l][1], wh, lnl))

            feats = jnp.concatenate(h_new + [wctx], axis=-1)
            readout = jnp.tanh(dot(feats.astype(wd), wread[:]) + bread[:])
            raw = dot(readout.astype(wd), whead[:]) + bhead[:]  # (B, head)

            if is_gmm:
                # Mosaic dislikes 3D reshapes of non-128-aligned dims, so
                # (B, M, D) mixture tensors stay flat (B, M*D); selection
                # is a 2D mask + one MXU matmul with a block-sum matrix.
                MD = M * D
                mu_flat = raw[:, :MD]                           # (B, M*D)
                ls_flat = jnp.maximum(raw[:, MD:2 * MD], min_log_sigma)
                logits = raw[:, 2 * MD:] * (1.0 + bias)         # (B, M)
                if inject_uniforms:
                    un_t = un_ref[pl.ds(c, 1)][0]           # (B, M+2D)
                # Gumbel-max categorical
                if debug_mode == 2:
                    comp = jnp.zeros((B,), jnp.int32)
                else:
                    gu = (un_t[:, :M] if inject_uniforms
                          else _uniform((B, M)))
                    comp = jnp.argmax(logits - jnp.log(-jnp.log(gu)),
                                      axis=-1)
                col = jax.lax.broadcasted_iota(jnp.int32, (B, MD), 1) // D
                rep = (comp[:, None] == col).astype(f32)        # (B, M*D)
                # block-sum matrix: (M*D, D), 1 where row % D == col
                r_id = jax.lax.broadcasted_iota(jnp.int32, (MD, D), 0)
                c_id = jax.lax.broadcasted_iota(jnp.int32, (MD, D), 1)
                sum_mat = (r_id % D == c_id).astype(f32)
                mu_c = dot(mu_flat * rep, sum_mat)              # (B, D)
                ls_c = dot(ls_flat * rep, sum_mat)
                # Box-Muller normal
                if debug_mode in (1, 2):
                    x_new = mu_c
                else:
                    # injected uniforms replace the TPU PRNG everywhere
                    # (prng_seed is skipped when injecting, so _uniform
                    # must never run on an unseeded generator)
                    if inject_uniforms:
                        u1 = un_t[:, M:M + D]
                        u2 = un_t[:, M + D:]
                    else:
                        u1 = _uniform((B, D))
                        u2 = _uniform((B, D))
                    z = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(
                        2.0 * np.pi * u2)
                    if debug_mode == 3:  # draws executed, output exact
                        x_new = raw[:, :D] + 0.0 * z
                    else:
                        x_new = mu_c + jnp.exp(ls_c - bias) * z
            else:
                x_new = raw                                     # MSE head

            x_s[:] = x_new
            frames_out[pl.ds(c, 1)] = x_new[None]
            kappa_out[pl.ds(c, 1)] = kappa[None]
            if ab_out is not None:
                ab_out[pl.ds(c, 1)] = jnp.concatenate([alpha, beta],
                                                      axis=-1)[None]
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

        if emit_state:
            # final carried state for streaming continuation: written
            # every chunk (same block, last write wins) and OUTSIDE the
            # all_done guard, so an early-exited call still reports the
            # state it stopped with
            state_out[:] = jnp.concatenate([s_ref[:] for s_ref in scratch],
                                           axis=-1)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("T", "D", "E", "H", "K", "M", "L", "head_dim",
                     "alignment", "bias", "min_log_sigma", "is_gmm",
                     "layer_norm", "interpret", "debug_mode", "chunk_steps",
                     "stop_threshold", "emit_attention", "emit_state"))
def fused_decode(kp, enc, mask, init_state, seed, uniforms=None,
                 *, T, D, E, H, K, M, L=3, head_dim=None, alignment=1.0,
                 bias=0.0, min_log_sigma=-7.0, is_gmm=True,
                 layer_norm=False, interpret=False,
                 debug_mode=0, chunk_steps=16, stop_threshold=1.0,
                 emit_attention=False, emit_state=False):
    """Run T fused autoregressive steps.

    kp: flat weight tuple from prepare_params; enc (B, U, E) f32; mask
    (B, U) f32; init_state: flat tuple from flatten_state (or the legacy
    (h1,c1,...,kappa,w,x) layout); seed: int32 (1,).
    Returns (frames (T, B, D), kappas (T, B, K)); with
    emit_attention=True also (alphas_betas (T, B, 2K)) for phi
    reconstruction via `reconstruct_phi` (attention plots from the
    fused serving path); with emit_state=True a FINAL output
    (B, 2LH+K+E+D) — the carried decoder state after the last step,
    split back into the flat init layout by `split_state` — so a next
    call can continue exactly where this one stopped (streaming
    synthesis: sample/streaming.py).
    """
    B, U, _ = enc.shape
    C = chunk_steps
    assert T % C == 0, f"T={T} must be a multiple of chunk_steps={C}"
    want_nw = n_weight_arrays(L, layer_norm)
    assert len(kp) == want_nw, \
        f"weight tuple has {len(kp)} arrays, expected {want_nw}"
    assert len(init_state) == 2 * L + 3
    inject = uniforms is not None
    if inject:
        assert uniforms.shape == (T, B, M + 2 * D), uniforms.shape
    kernel = _make_kernel(B=B, D=D, E=E, H=H, K=K, M=M, U=U, C=C, L=L,
                          alignment=alignment, bias=bias,
                          min_log_sigma=min_log_sigma, is_gmm=is_gmm,
                          layer_norm=layer_norm,
                          stop_threshold=stop_threshold,
                          debug_mode=debug_mode,
                          emit_attention=emit_attention,
                          inject_uniforms=inject,
                          emit_state=emit_state)

    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = [vm() for _ in range(len(kp))]            # weights/biases
    in_specs += [vm(), vm()]                             # enc, mask
    if inject:                                           # per-chunk block
        in_specs.append(pl.BlockSpec((C, B, M + 2 * D),
                                     lambda t, seed: (t, 0, 0),
                                     memory_space=pltpu.VMEM))
    in_specs += [vm() for _ in range(2 * L + 3)]         # init state

    state_scratch = []
    for _ in range(L):
        state_scratch += [pltpu.VMEM((B, H), jnp.float32),   # h_l
                          pltpu.VMEM((B, H), jnp.float32)]   # c_l
    state_scratch += [pltpu.VMEM((B, K), jnp.float32),       # kappa
                      pltpu.VMEM((B, E), jnp.float32),       # w
                      pltpu.VMEM((B, D), jnp.float32)]       # x
    state_scratch.append(pltpu.SMEM((1,), jnp.int32))        # all-done

    out_specs = [
        pl.BlockSpec((C, B, D), lambda t, seed: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((C, B, K), lambda t, seed: (t, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((T, B, D), jnp.float32),
        jax.ShapeDtypeStruct((T, B, K), jnp.float32),
    ]
    if emit_attention:
        out_specs.append(pl.BlockSpec((C, B, 2 * K),
                                      lambda t, seed: (t, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((T, B, 2 * K), jnp.float32))
    if emit_state:
        SDIM = 2 * L * H + K + E + D
        out_specs.append(pl.BlockSpec((B, SDIM), lambda t, seed: (0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((B, SDIM), jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T // C,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=state_scratch,
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary",),  # sequential steps: state
                                                 # carries across the grid
        ),
        interpret=interpret,
    )
    args = [jnp.asarray(seed, jnp.int32),
            *kp,
            # enc rides at the serving weight dtype: bf16 halves the
            # largest VMEM-resident block (B, U, E), raising the max
            # batch the kernel fits; the context matmul accumulates in
            # f32 either way
            enc.astype(kp[0].dtype), mask.astype(jnp.float32)]
    if inject:
        args.append(uniforms.astype(jnp.float32))
    args += [s.astype(jnp.float32) for s in init_state]
    return tuple(call(*args))


def reconstruct_phi(kappas, alphas_betas, mask):
    """Rebuild the window weights phi outside the kernel.

    kappas (T, B, K), alphas_betas (T, B, 2K) from fused_decode with
    emit_attention=True, mask (B, U). Returns phi (T, B, U) — the same
    quantity the kernel used for its context (phi = sum_k alpha_k *
    exp(-beta_k (kappa_k - u)^2), masked). Accumulated per mixture
    component (as the kernel does) so the largest intermediate is the
    (T, B, U) output itself, not a K-times-larger broadcast — at the
    serving shape (T=1024, B=256, K=10, U=128) that difference is
    ~135 MB vs ~1.3 GB if XLA declined to fuse the reduction.
    """
    K = kappas.shape[-1]
    u = jnp.arange(mask.shape[-1], dtype=jnp.float32)    # (U,)
    phi = jnp.zeros(kappas.shape[:2] + (mask.shape[-1],), jnp.float32)
    for k in range(K):
        diff = kappas[..., k:k + 1] - u                  # (T, B, U)
        phi = phi + alphas_betas[..., k:k + 1] * jnp.exp(
            -alphas_betas[..., K + k:K + k + 1] * diff * diff)
    return phi * mask[None]
