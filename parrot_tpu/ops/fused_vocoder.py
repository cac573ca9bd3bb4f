"""Pallas fused neural-vocoder (SampleRNN) generation kernel.

Extends the framework's north-star serving design (ops/fused_decode.py,
BASELINE.json:5 "generation never leaves HBM") to Char2Wav's second
half: ONE pallas_call generates the whole mu-law waveform. Per grid
step (a chunk of conditioning frames, sequential on the core):

  per frame-tier step (16 samples): one fused-gate LSTM step + one
  (B, H) x (H, FS*M) upsample GEMM, state in VMEM scratch;
  per sample: 3 small GEMMs (window-MLP), Gumbel-max over the Q=256
  softmax with the in-kernel TPU PRNG, mu-law decode of the sampled id
  for feedback, and a rolling (B, RF*E) window of PREVIOUS-sample
  embeddings updated by a one-hot (B, Q) x (Q, E) matmul (no gathers).

Weights stay VMEM-resident for the whole call (~12 MB bf16 at flagship
dims). temperature <= 0 selects greedy argmax — deterministic and
PRNG-free, which is also the CPU-interpret parity mode against
models/samplernn.py::generate (the TPU interpreter stubs the PRNG).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from parrot_tpu.vocoder.mulaw import mulaw_decode_jax

N_WEIGHTS = 13  # wx_x, wx_c, wh, b, w_up, b_up, w1, b1, w2, b2, wq, bq, emb


def n_weight_arrays(layer_norm: bool = False) -> int:
    """Flat weight-tuple length (+4 layer-norm rows when enabled)."""
    return N_WEIGHTS + (4 if layer_norm else 0)


def prepare_vocoder_params(model, params, weight_dtype=jnp.bfloat16,
                           speaker=None) -> Tuple[jax.Array, ...]:
    """SampleRNN param pytree -> the kernel's flat weight tuple.

    Splits the tier cell's wx into its prev-frame (FS rows) and
    conditioning (D rows) blocks, mirroring the concat order in
    SampleRNN.generate's tier input. For use_speaker models the
    speaker rows of wx fold into a PER-ROW gate bias
    (b + emb[speaker] @ wx_spk, shape (B, 4H)) — the same
    fold-constant-conditioning-into-the-bias trick as the reader
    kernel's speaker handling; `speaker` is then required. (The fold
    stays exact under layer_norm: training adds the speaker rows to the
    pre-LN gate sum, which is precisely where b4 enters the kernel.)

    For layer_norm tier cells, four f32 LN rows (gate g/b, cell g/b)
    ride at the END of the tuple — pass layer_norm=True to
    fused_vocoder_decode to consume them.
    """
    FS, D = model.FS, model.D
    tier = params["tier"]
    c = lambda a: a.astype(weight_dtype)
    f = lambda a: a.astype(jnp.float32)
    b4 = f(tier["b"])[None, :]         # (1, 4H)
    if model.cfg.use_speaker:
        if speaker is None:
            raise ValueError("use_speaker model: prepare_vocoder_params "
                             "needs speaker ids")
        sv = jnp.take(params["spk"]["table"], speaker, axis=0)  # (B, sd)
        b4 = b4 + jnp.dot(sv.astype(jnp.float32),
                          f(tier["wx"][FS + D:]))               # (B, 4H)
    out = [
        c(tier["wx"][:FS]),            # (FS, 4H)
        c(tier["wx"][FS:FS + D]),      # (D, 4H)
        c(tier["wh"]),                 # (H, 4H)
        b4,                            # (1 or B, 4H)
        c(params["up"]["w"]),          # (H, FS*M)
        f(params["up"]["b"])[None, :],
        c(params["mlp1"]["w"]),        # (RF*E, M)
        f(params["mlp1"]["b"])[None, :],
        c(params["mlp2"]["w"]),        # (M, M)
        f(params["mlp2"]["b"])[None, :],
        c(params["head"]["w"]),        # (M, Q)
        f(params["head"]["b"])[None, :],
        # (Q, E+1) f32: embedding table with the mu-law decode LUT as the
        # last column — one one-hot matmul yields both the new window
        # embedding and the exact feedback value (expm1 itself does not
        # lower in Mosaic, and the LUT is bit-identical to
        # mulaw_decode_jax by construction)
        jnp.concatenate(
            [f(params["embed"]["table"]),
             mulaw_decode_jax(jnp.arange(params["embed"]["table"].shape[0]),
                              params["embed"]["table"].shape[0])[:, None]],
            axis=1),
    ]
    if "ln_g" in tier:  # layer_norm rows (f32) at the end
        out += [f(tier["ln_g"]["g"])[None, :],   # (1, 4H)
                f(tier["ln_g"]["b"])[None, :],
                f(tier["ln_c"]["g"])[None, :],   # (1, H)
                f(tier["ln_c"]["b"])[None, :]]
    return tuple(out)


def make_vocoder_init(params, state, rf_size: int, embed_dim: int):
    """(h, c, prev, win_emb) kernel init tuple from a SampleRNNState.

    win_emb is the rolling window of previous-sample embeddings,
    MOST-RECENT-FIRST (matching emb(prev_q)[:, ::-1] in the plain
    sampler; state.prev_q is oldest-first)."""
    table = params["embed"]["table"]
    emb = jnp.take(table, state.prev_q, axis=0)        # (B, RF, E) oldest 1st
    win = emb[:, ::-1].reshape(state.prev_q.shape[0], rf_size * embed_dim)
    return (state.h, state.c, state.prev, win.astype(jnp.float32))


def split_vocoder_state(flat, *, H, FS, RF, E):
    """(B, 2H+FS+RF*E) emit_state output -> the (h, c, prev, win)
    kernel init tuple (the inverse of the final-state concatenation).
    `win` feeds straight back as the rolling-window init — no prev_q
    round trip needed between streaming chunks."""
    sizes = [H, H, FS, RF * E]
    out, o = [], 0
    for sz in sizes:
        out.append(flat[:, o:o + sz])
        o += sz
    assert o == flat.shape[-1], (o, flat.shape)
    return tuple(out)


def _uniform(shape):
    """TPU PRNG bits -> uniform in (0, 1) (same recipe as fused_decode)."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    top = pltpu.bitcast(bits >> 8, jnp.int32)
    u = top.astype(jnp.float32) * (1.0 / (1 << 24))
    return jnp.clip(u, 1e-7, 0.999999)


def _make_kernel(*, B, D, FS, RF, E, H, M, Q, SPC, C, temperature,
                 layer_norm=False, emit_state=False):
    """C = conditioning frames per grid step; SPC = tier steps per
    conditioning frame. One grid step emits C * SPC * FS samples."""
    greedy = temperature <= 0.0
    inv_temp = 0.0 if greedy else 1.0 / float(temperature)

    def kernel(*refs):
        i = 0
        (seed_ref, wx_x, wx_c, wh, b4, w_up, b_up, w1, b1, w2, b2,
         wq, bq, emb_t) = refs[i:i + 14]; i += 14
        ln = None
        if layer_norm:
            ln = refs[i:i + 4]; i += 4  # (gate g, gate b, cell g, cell b)
        cond, mask, h0, c0, prev0, win0, ids_out = refs[i:i + 7]; i += 7
        state_out = None
        if emit_state:
            state_out = refs[i]; i += 1
        h_s, c_s, prev_s, win_s, up_s = refs[i:i + 5]; i += 5

        chunk = pl.program_id(0)

        @pl.when(chunk == 0)
        def _init():
            h_s[:] = h0[:]
            c_s[:] = c0[:]
            prev_s[:] = prev0[:]
            win_s[:] = win0[:]

        if not greedy:
            pltpu.prng_seed(seed_ref[0] + chunk)

        f32 = jnp.float32
        dot = lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=f32)
        wd = wx_x[:].dtype
        col_q = jax.lax.broadcasted_iota(jnp.int32, (B, Q), 1)
        col_fs = jax.lax.broadcasted_iota(jnp.int32, (B, FS), 1)

        def frame_step(j, _):
            cf = j // SPC                                  # cond frame in chunk
            cond_j = cond[pl.ds(cf, 1)][0]                 # (B, D)
            m = mask[pl.ds(cf, 1)][0][:, None]             # (B, 1)

            h_old, c_old = h_s[:], c_s[:]
            gates = (b4[:] + dot(prev_s[:].astype(wd), wx_x[:])
                     + dot(cond_j.astype(wd), wx_c[:])
                     + dot(h_old.astype(wd), wh[:]))

            def layernorm(x, g_ref, b_ref):
                mean = jnp.mean(x, axis=-1, keepdims=True)
                var = jnp.mean((x - mean) * (x - mean), axis=-1,
                               keepdims=True)
                return (g_ref[:] * (x - mean) * jax.lax.rsqrt(var + 1e-5)
                        + b_ref[:])

            if ln is not None:
                gates = layernorm(gates, ln[0], ln[1])
            i_ = jax.nn.sigmoid(gates[:, :H])
            fgt = jax.nn.sigmoid(gates[:, H:2 * H])
            cand = jnp.tanh(gates[:, 2 * H:3 * H])
            o = jax.nn.sigmoid(gates[:, 3 * H:])
            c_new = fgt * c_old + i_ * cand
            # LN on the cell feeds h only; c itself carries un-normalized
            # (mirrors nn.recurrent.LSTMCell.step and the reader kernel)
            if ln is not None:
                h_new = o * jnp.tanh(layernorm(c_new, ln[2], ln[3]))
            else:
                h_new = o * jnp.tanh(c_new)
            h_new = m * h_new + (1 - m) * h_old
            c_new = m * c_new + (1 - m) * c_old
            h_s[:] = h_new
            c_s[:] = c_new

            # (B, FS*M) upsample rides in scratch: Mosaic lowers dynamic
            # slices of REFS (pl.ds), not of values. Stored at the
            # serving weight dtype — the largest scratch buffer (16 MB
            # f32 at B=512 flagship dims) halves in bf16 serving, and
            # the f32 greedy/parity mode is unchanged.
            up_s[:] = (dot(h_new.astype(wd), w_up[:])
                       + b_up[:]).astype(up_s.dtype)

            def sample_one(p, carry):
                win, xs_acc, ids_acc = carry
                up_p = up_s[:, pl.ds(p * M, M)]
                a1 = jax.nn.relu(dot(win.astype(wd), w1[:]) + up_p + b1[:])
                a2 = jax.nn.relu(dot(a1.astype(wd), w2[:]) + b2[:])
                logits = dot(a2.astype(wd), wq[:]) + bq[:]  # (B, Q)
                if greedy:
                    s = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                else:
                    g = -jnp.log(-jnp.log(_uniform((B, Q))))
                    s = jnp.argmax(logits * inv_temp + g,
                                   axis=-1).astype(jnp.int32)
                onehot = (s[:, None] == col_q).astype(f32)  # (B, Q)
                r = dot(onehot, emb_t[:])                   # (B, E+1)
                e_new = r[:, :E]
                x = r[:, E]  # mu-law decode LUT column (exact feedback)
                win = jnp.concatenate([e_new, win[:, :(RF - 1) * E]], -1)
                xs_acc = jnp.where(col_fs == p, x[:, None], xs_acc)
                ids_acc = jnp.where(col_fs == p, s[:, None], ids_acc)
                return win, xs_acc, ids_acc

            win0_f = win_s[:]
            win_f, xs, ids = jax.lax.fori_loop(
                0, FS, sample_one,
                (win0_f, jnp.zeros((B, FS), f32),
                 jnp.full((B, FS), Q // 2, jnp.int32)))
            # commit gated on the frame mask (masked frames: state rolls
            # back, output is the mu-law silence id)
            win_s[:] = jnp.where(m > 0, win_f, win0_f)
            prev_s[:] = jnp.where(m > 0, xs, prev_s[:])
            ids = jnp.where(m > 0, ids, jnp.full_like(ids, Q // 2))
            ids_out[pl.ds(j * FS, FS)] = ids.T              # (FS, B)
            return 0

        jax.lax.fori_loop(0, C * SPC, frame_step, 0, unroll=False)
        if emit_state:
            # carried state for streaming continuation (written every
            # chunk, same block: last write wins)
            state_out[:] = jnp.concatenate(
                [h_s[:], c_s[:], prev_s[:], win_s[:]], axis=-1)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("T_c", "D", "FS", "RF", "E", "H", "M", "Q", "SPC",
                     "temperature", "chunk_frames", "interpret",
                     "layer_norm", "emit_state"))
def fused_vocoder_decode(kp, cond, mask, init, seed, *, T_c, D, FS, RF, E,
                         H, M, Q, SPC, temperature=1.0, chunk_frames=8,
                         interpret=False, layer_norm=False,
                         emit_state=False):
    """Generate T_c * SPC * FS mu-law samples in one pallas_call.

    kp: tuple from prepare_vocoder_params; cond (T_c, B, D) NORMALIZED
    conditioning frames; mask (T_c, B) f32; init: (h, c, prev, win_emb)
    from make_vocoder_init; seed int32 (1,). Returns ids (T_samples, B)
    int32; with emit_state=True, (ids, state (B, 2H+FS+RF*E)) — the
    carried (h, c, prev, win) after the last frame, split by
    `split_vocoder_state`, so a next call continues exactly here
    (streaming synthesis).
    """
    _, B, _ = cond.shape
    C = chunk_frames
    assert T_c % C == 0, f"T_c={T_c} must be a multiple of {C}"
    assert C % 8 == 0 or C == T_c, \
        f"chunk_frames={C} must be a multiple of 8 (Mosaic block shape)"
    # the per-position upsample slice up_s[:, p*M : (p+1)*M] must be
    # provably 128-lane aligned for the Mosaic lowering
    assert interpret or M % 128 == 0, \
        f"fused vocoder needs mlp_dim % 128 == 0 on hardware (got {M})"
    want_nw = n_weight_arrays(layer_norm)
    assert len(kp) == want_nw, \
        (f"weight tuple has {len(kp)} arrays, expected {want_nw} "
         f"(layer_norm={layer_norm}) — a layer_norm-trained vocoder must "
         f"be served with layer_norm=True")
    kernel = _make_kernel(B=B, D=D, FS=FS, RF=RF, E=E, H=H, M=M, Q=Q,
                          SPC=SPC, C=C, temperature=temperature,
                          layer_norm=layer_norm, emit_state=emit_state)

    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = [vm() for _ in range(want_nw)]
    in_specs += [
        pl.BlockSpec((C, B, D), lambda t, seed: (t, 0, 0),
                     memory_space=pltpu.VMEM),                # cond chunk
        pl.BlockSpec((C, B), lambda t, seed: (t, 0),
                     memory_space=pltpu.VMEM),                # mask chunk
    ]
    in_specs += [vm() for _ in range(4)]                      # init state

    samples_per_chunk = C * SPC * FS
    out_specs = [pl.BlockSpec((samples_per_chunk, B),
                              lambda t, seed: (t, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((T_c * SPC * FS, B), jnp.int32)]
    if emit_state:
        SDIM = 2 * H + FS + RF * E
        out_specs.append(pl.BlockSpec((B, SDIM), lambda t, seed: (0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((B, SDIM), jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T_c // C,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),       # h
            pltpu.VMEM((B, H), jnp.float32),       # c
            pltpu.VMEM((B, FS), jnp.float32),      # prev frame samples
            pltpu.VMEM((B, RF * E), jnp.float32),  # rolling window embeds
            # per-frame upsample at the serving weight dtype (see kernel)
            pltpu.VMEM((B, FS * M), kp[0].dtype),
        ],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary",),    # sequential: state carry
        ),
        interpret=interpret,
    )
    h, c, prev, win = init
    out = call(jnp.asarray(seed, jnp.int32), *kp,
               cond.astype(kp[0].dtype), mask.astype(jnp.float32),
               h.astype(jnp.float32), c.astype(jnp.float32),
               prev.astype(jnp.float32), win.astype(jnp.float32))
    return tuple(out) if emit_state else out[0]
