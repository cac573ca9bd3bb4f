"""Pallas fused TRAINING scan for the Parrot decoder: fwd + bwd kernels.

The split-backward scan (models/scan_vjp.py) made the reverse pass
carry only the true recurrent cotangents, but both passes still run as
`lax.scan` — per-timestep XLA loop iterations whose measured cost
(~91 us fwd / ~220 us bwd per step at B=256 flagship dims) sits far
above the compute/BW speed-of-light (~25-75 us), and whose attention
context re-reads the whole (B, U, E) encoder block from HBM every step
in both directions (docs/PERFORMANCE.md round-3 breakdown).

This module runs each pass as ONE `pallas_call` instead:

- grid = (T/C,) chunks of C steps, sequential on the core
  (`dimension_semantics=("arbitrary",)`); the recurrent state (h/c per
  layer, kappa, w — and their cotangents in the bwd kernel) lives in
  VMEM scratch and never round-trips to HBM;
- the decoder weight matrices (transposed copies for the bwd kernel)
  and the encoder block stay VMEM-RESIDENT for the whole pass — the
  per-step weight/enc re-reads that dominate the lax.scan version's
  HBM traffic disappear;
- per-step tensors stream through chunked HBM blocks: the fwd kernel
  emits feats/phi plus the residuals the bwd kernel consumes (gates at
  `residual_dtype`, post-mix cell states, raw attention params, kappa);
  the bwd kernel emits the dgates/draw/dw' streams that the SAME
  post-hoc (T·B)-row weight-gradient GEMMs as the lax.scan path
  (scan_vjp.posthoc_grads) turn into weight gradients;
- the C steps inside a chunk are Python-unrolled so every intra-chunk
  index is static (Mosaic: dynamic lane slices must be 128-aligned;
  static slices are free).

Math contract: EXACTLY scan_vjp.make_decoder_scan's computation — same
forward values up to f32 reduction order, same residual layout, same
gradient structure. Parity is pinned by tests/test_pallas_train_scan.py
(interpret mode) and scripts/tpu_checks.py (on chip).

Enabled by ModelConfig.pallas_scan (requires split_backward semantics:
no layer_norm / stacked_scan — guarded by the caller).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from parrot_tpu.models.scan_vjp import posthoc_grads, shifted_inputs

_MASK_LANES = 128  # mask rides as (T, B, 128) so the kernel can take a
                   # static (B, 1) lane slice (dynamic lane slices must
                   # be 128-aligned on TPU)


def _sigmoid(x):
    return jax.nn.sigmoid(x)


# ----------------------------------------------------------------------
# VMEM planning: the kernels keep the weights and the whole (B, U, E)
# encoder block resident, so feasibility depends on the *data* shapes
# (B and especially U — real corpora reach U=256 where the f32 enc
# block alone is 64 MB). Per pass we pick the largest chunk C that
# fits, dropping the enc block to bf16 when f32 cannot fit at C=1
# (its multiplies already round to bf16 on the MXU; only the extra
# rounding of the tiny phi/dw operand is new). Returns None when even
# bf16 at C=1 overflows -> caller falls back to the lax.scan path.
# ----------------------------------------------------------------------

_VMEM_BUDGET_MB = 126  # vs the 127 MB compile limit; the estimate
                       # matched Mosaic's accounting to 0.1 MB on the
                       # shapes checked (e.g. 154.0 MB at B=256 U=256
                       # C=2 f32-enc), so only a small margin is needed


def _weights_bytes(L, H, K, E):
    b = H * 3 * K * 4 + 3 * K * 4
    for l in range(L):
        b += E * 4 * H * 4 + H * 4 * H * 4
        if l > 0:
            b += H * 4 * H * 4
    return b


def estimate_vmem_bytes(B, U, *, L, H, K, E, C, res_bytes, enc_bytes,
                        emit_res=True):
    """(fwd_bytes, bwd_bytes) VMEM footprint estimate for one chunk
    configuration. Streamed blocks are double-buffered (x2).
    emit_res=False drops the fwd kernel's residual output streams
    (gates/cs/raw/kappa) — the forward-only variant used by
    undifferentiated consumers (VERDICT r4 weak #3)."""
    SD = 2 * L * H + K + E
    FD = L * H + E
    w = _weights_bytes(L, H, K, E)
    common = (B * U * E * enc_bytes + B * U * 4    # enc/encT + text_mask
              + B * SD * 4                         # init / dcarry
              + 2 * B * SD * 4                     # final out (buffered)
              + (2 * L * H + K + E) * B * 4)       # scratch
    per_step = 2 * C * B  # double-buffered chunk rows
    res_out = (L * 4 * H * res_bytes  # gates out
               + L * H * 4            # cs out
               + 3 * K * 4 + K * 4)   # raw/kappa out
    fwd = (w + common
           + per_step * (L * 4 * H * 4            # gx in
                         + _MASK_LANES * 4        # mask in
                         + FD * 4 + U * 4         # feats/phi out
                         + (res_out if emit_res else 0)))
    bwd = (w + common
           + per_step * (FD * 4 + U * 4           # dfeat/dphi in
                         + L * 4 * H * res_bytes  # gates in
                         + L * H * 4              # c_prev in
                         + K * 4 + 3 * K * 4      # kappa_prev/raw in
                         + _MASK_LANES * 4        # mask in
                         + L * 4 * H * res_bytes  # dgates out
                         + 3 * K * 4 + E * 4))    # draw/dwp out
    return fwd, bwd


def plan_pass(which, B, U, *, L, H, K, E, max_chunk, res_bytes,
              budget_mb=_VMEM_BUDGET_MB):
    """Pick (C, enc_dtype) for one pass ('fwd' | 'fwd_only' | 'bwd');
    None if nothing fits."""
    idx = 0 if which in ("fwd", "fwd_only") else 1
    budget = budget_mb * 1024 * 1024
    if which == "fwd_only":
        # Value-parity contract: the undifferentiated primal must
        # compute the SAME numbers as the differentiated forward, so it
        # inherits the fwd plan's enc_dtype (its smaller footprint
        # could otherwise pick f32 enc at shapes where fwd fits only
        # with bf16, giving eval/train a systematic forward offset) and
        # re-plans only the chunk size.
        base = plan_pass("fwd", B, U, L=L, H=H, K=K, E=E,
                         max_chunk=max_chunk, res_bytes=res_bytes,
                         budget_mb=budget_mb)
        if base is None:
            return None
        _, enc_dtype = base
        enc_choices = ((2 if enc_dtype == jnp.bfloat16 else 4,
                        enc_dtype),)
    else:
        enc_choices = ((4, jnp.float32), (2, jnp.bfloat16))
    for enc_bytes, enc_dtype in enc_choices:
        C = max_chunk
        while C >= 1:
            est = estimate_vmem_bytes(B, U, L=L, H=H, K=K, E=E, C=C,
                                      res_bytes=res_bytes,
                                      enc_bytes=enc_bytes,
                                      emit_res=(which != "fwd_only"))[idx]
            if est <= budget:
                return C, enc_dtype
            C //= 2
    return None


def pallas_scan_fits(B, U, *, L, H, K, E, res_bytes=2):
    """Model-side guard: can both passes run at these shapes at all?"""
    return all(plan_pass(w, B, U, L=L, H=H, K=K, E=E, max_chunk=1,
                         res_bytes=res_bytes) is not None
               for w in ("fwd", "bwd"))


# In-kernel matmul precision. Measured on this chip: XLA's own f32
# plain dots run as a SINGLE bf16 MXU pass (2.5e-3 max err vs fp64 on a
# 512-deep 0.1-scale contraction) and Mosaic's default is the identical
# scheme — with DEFAULT the kernel's h0/attention trajectory matches
# the lax.scan path essentially bit-for-bit. (Precision.HIGHEST would
# make the kernel MORE accurate than the XLA path it must mirror, and
# thereby diverge from it.) The one place the two paths round
# differently is the batched context/dphi contraction, which XLA
# evaluates at full f32; its bf16-multiply rounding here (~1e-3 on
# [0,1]-weight sums) sits inside the training-precision envelope the
# bf16-residual default already accepts — on-chip parity is pinned by
# scripts/tpu_checks.py at that tolerance, exact parity by the
# interpret-mode tests.
_PREC = jax.lax.Precision.DEFAULT


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_PREC)


def _bdot(phi_like, enc_like):
    """Batched (B, X) x (B, U, E)-style contraction.

    phi_like (B, U) with enc (B, U, E)  -> (B, E)   (context)
    dw  (B, E) with encT (B, E, U)      -> (B, U)   (dphi)  — pass the
    matching last-two-dims layout; contraction is lhs dim 2 x rhs dim 1
    with batch dim 0 on both.
    """
    return jax.lax.dot_general(
        phi_like[:, None, :], enc_like,
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=_PREC)[:, 0, :]


# ======================================================================
# forward kernel
# ======================================================================

def _make_fwd_kernel(*, B, E, H, K, U, C, L, alignment, res_dtype,
                     emit_residuals=True):
    FD = L * H + E          # feats row
    F32 = jnp.float32

    def kernel(*refs):
        i = 0
        attn_w, attn_b = refs[i:i + 2]; i += 2
        layers = []          # (w_w, hb_w|None, wh)
        for l in range(L):
            if l == 0:
                w_w, wh = refs[i:i + 2]; i += 2
                layers.append((w_w, None, wh))
            else:
                w_w, hb_w, wh = refs[i:i + 3]; i += 3
                layers.append((w_w, hb_w, wh))
        enc, text_mask = refs[i:i + 2]; i += 2
        init = refs[i:i + 2 * L + 2]; i += 2 * L + 2
        gx = refs[i:i + L]; i += L                   # (C, B, 4H) each
        mask_ref = refs[i]; i += 1                   # (C, B, 128)
        feats_out, phi_out = refs[i:i + 2]; i += 2
        if emit_residuals:
            gates_out = refs[i:i + L]; i += L        # residual dtype
            cs_out = refs[i:i + L]; i += L
            raw_out, kappa_out = refs[i:i + 2]; i += 2
        final_out = refs[i]; i += 1
        scratch = refs[i:i + 2 * L + 2]; i += 2 * L + 2
        hs = [(scratch[2 * l], scratch[2 * l + 1]) for l in range(L)]
        kappa_s, w_s = scratch[2 * L], scratch[2 * L + 1]

        @pl.when(pl.program_id(0) == 0)
        def _init():
            for s_ref, i_ref in zip(scratch, init):
                s_ref[:] = i_ref[:]

        u_iota = jax.lax.broadcasted_iota(jnp.int32, (1, U), 1).astype(F32)

        for s in range(C):
            m = mask_ref[s][:, 0:1]                  # (B, 1)

            # layer 0: hoisted gates + w_prev and h_prev projections
            w_w0, _, wh0 = layers[0]
            g0 = (gx[0][s] + _dot(w_s[:], w_w0[:])
                  + _dot(hs[0][0][:], wh0[:]))
            i0 = _sigmoid(g0[:, :H])
            f0 = _sigmoid(g0[:, H:2 * H])
            z0 = jnp.tanh(g0[:, 2 * H:3 * H])
            o0 = _sigmoid(g0[:, 3 * H:])
            c0p = f0 * hs[0][1][:] + i0 * z0
            h0p = o0 * jnp.tanh(c0p)
            h0 = m * h0p + (1 - m) * hs[0][0][:]
            c0 = m * c0p + (1 - m) * hs[0][1][:]
            hs[0][0][:] = h0
            hs[0][1][:] = c0

            # attention (Graves window, monotonic kappa)
            raw = _dot(h0, attn_w[:]) + attn_b[:]    # (B, 3K)
            alpha = jnp.exp(raw[:, :K])
            beta = jnp.exp(raw[:, K:2 * K])
            kap_p = kappa_s[:] + alignment * jnp.exp(raw[:, 2 * K:])
            phi = jnp.zeros((B, U), F32)
            for k in range(K):
                diff = kap_p[:, k:k + 1] - u_iota
                phi += alpha[:, k:k + 1] * jnp.exp(
                    -beta[:, k:k + 1] * diff * diff)
            phi = phi * text_mask[:]
            # enc may ride VMEM at bf16 (plan_pass); cast the tiny phi
            # operand to match — accumulation stays f32 on the MXU
            w_p = _bdot(phi.astype(enc.dtype), enc[:])   # (B, E)
            kappa_n = m * kap_p + (1 - m) * kappa_s[:]
            w_n = m * w_p + (1 - m) * w_s[:]
            kappa_s[:] = kappa_n
            w_s[:] = w_n

            h_cols = [h0]
            gate_vals = [g0]
            c_cols = [c0]
            h_below = h0
            for l in range(1, L):
                w_wl, hb_wl, whl = layers[l]
                gl = (gx[l][s] + _dot(w_n, w_wl[:])
                      + _dot(h_below, hb_wl[:])
                      + _dot(hs[l][0][:], whl[:]))
                il = _sigmoid(gl[:, :H])
                fl = _sigmoid(gl[:, H:2 * H])
                zl = jnp.tanh(gl[:, 2 * H:3 * H])
                ol = _sigmoid(gl[:, 3 * H:])
                clp = fl * hs[l][1][:] + il * zl
                hlp = ol * jnp.tanh(clp)
                hl = m * hlp + (1 - m) * hs[l][0][:]
                cl = m * clp + (1 - m) * hs[l][1][:]
                hs[l][0][:] = hl
                hs[l][1][:] = cl
                h_cols.append(hl)
                gate_vals.append(gl)
                c_cols.append(cl)
                h_below = hl

            feats_out[s] = jnp.concatenate(h_cols + [w_n], axis=-1)
            phi_out[s] = phi
            if emit_residuals:
                for l in range(L):
                    gates_out[l][s] = gate_vals[l].astype(res_dtype)
                    cs_out[l][s] = c_cols[l]
                raw_out[s] = raw
                kappa_out[s] = kappa_n

        # carried state after the last step of this chunk (constant
        # index map: last write wins -> final scan carry)
        final_out[:] = jnp.concatenate([s_ref[:] for s_ref in scratch],
                                       axis=-1)

    return kernel


# ======================================================================
# backward kernel
# ======================================================================

def _make_bwd_kernel(*, B, E, H, K, U, C, L, alignment, res_dtype,
                     grad_dtype):
    F32 = jnp.float32

    def kernel(*refs):
        i = 0
        attn_wT = refs[i]; i += 1                    # (3K, H)
        layersT = []                                 # (w_wT, hb_wT|None, whT)
        for l in range(L):
            if l == 0:
                w_wT, whT = refs[i:i + 2]; i += 2
                layersT.append((w_wT, None, whT))
            else:
                w_wT, hb_wT, whT = refs[i:i + 3]; i += 3
                layersT.append((w_wT, hb_wT, whT))
        encT, text_mask = refs[i:i + 2]; i += 2      # (B, E, U), (B, U)
        dcarry = refs[i:i + 2 * L + 2]; i += 2 * L + 2
        dfeat_ref, dphi_ref = refs[i:i + 2]; i += 2
        gates_refs = refs[i:i + L]; i += L
        c_prev_refs = refs[i:i + L]; i += L
        kappa_prev_ref, raw_ref, mask_ref = refs[i:i + 3]; i += 3
        dgates_out = refs[i:i + L]; i += L
        draw_out, dwp_out, dfinal_out = refs[i:i + 3]; i += 3
        scratch = refs[i:i + 2 * L + 2]; i += 2 * L + 2
        dhs = [(scratch[2 * l], scratch[2 * l + 1]) for l in range(L)]
        dkap_s, dw_s = scratch[2 * L], scratch[2 * L + 1]

        @pl.when(pl.program_id(0) == 0)
        def _init():
            for s_ref, i_ref in zip(scratch, dcarry):
                s_ref[:] = i_ref[:]

        u_iota = jax.lax.broadcasted_iota(jnp.int32, (1, U), 1).astype(F32)

        for s in reversed(range(C)):
            m = mask_ref[s][:, 0:1]                  # (B, 1)
            dfeat_t = dfeat_ref[s]                   # (B, LH+E)
            raw_t = raw_ref[s]
            kappa_prev_t = kappa_prev_ref[s]

            # upstream cotangents into this step's outputs
            dh = [dhs[l][0][:] + dfeat_t[:, l * H:(l + 1) * H]
                  for l in range(L)]
            dc = [dhs[l][1][:] for l in range(L)]
            dw_tot = dw_s[:] + dfeat_t[:, L * H:]
            dkap_tot = dkap_s[:]

            # layers L-1 .. 1 (consume w_n and h_below of step t)
            for l in range(L - 1, 0, -1):
                g = gates_refs[l][s].astype(F32)
                il = _sigmoid(g[:, :H])
                fl = _sigmoid(g[:, H:2 * H])
                zl = jnp.tanh(g[:, 2 * H:3 * H])
                ol = _sigmoid(g[:, 3 * H:])
                cpv = c_prev_refs[l][s]
                clp = fl * cpv + il * zl
                tc = jnp.tanh(clp)
                dhp = m * dh[l]
                dclp = m * dc[l] + dhp * ol * (1 - tc * tc)
                dgl = jnp.concatenate([
                    dclp * zl * il * (1 - il),
                    dclp * cpv * fl * (1 - fl),
                    dclp * il * (1 - zl * zl),
                    dhp * tc * ol * (1 - ol)], axis=-1)
                w_wT, hb_wT, whT = layersT[l]
                dw_tot = dw_tot + _dot(dgl, w_wT[:])
                dh[l - 1] = dh[l - 1] + _dot(dgl, hb_wT[:])
                dhs[l][0][:] = (1 - m) * dh[l] + _dot(dgl, whT[:])
                dhs[l][1][:] = (1 - m) * dc[l] + dclp * fl
                dgates_out[l][s] = dgl.astype(grad_dtype)

            # attention backward
            dw_p = m * dw_tot
            dkap_p = m * dkap_tot
            dphi = (_bdot(dw_p.astype(encT.dtype), encT[:])
                    + dphi_ref[s]) * text_mask[:]    # (B, U)
            kexp = jnp.exp(raw_t[:, 2 * K:])
            kap_p = kappa_prev_t + alignment * kexp
            dalpha_cols, dbeta_cols, dkap_cols = [], [], []
            for k in range(K):
                alpha_k = jnp.exp(raw_t[:, k:k + 1])
                beta_k = jnp.exp(raw_t[:, K + k:K + k + 1])
                diff = kap_p[:, k:k + 1] - u_iota    # (B, U)
                s_k = jnp.exp(-beta_k * diff * diff)
                as_k = alpha_k * s_k
                dphi_s = dphi * s_k
                dalpha_cols.append(
                    jnp.sum(dphi_s, axis=-1, keepdims=True) * alpha_k)
                dbeta_cols.append(
                    -jnp.sum(dphi * as_k * diff * diff, axis=-1,
                             keepdims=True) * beta_k)
                dkap_cols.append(
                    -2.0 * jnp.sum(dphi * as_k * diff, axis=-1,
                                   keepdims=True) * beta_k)
            dkap_p = dkap_p + jnp.concatenate(dkap_cols, axis=-1)
            draw = jnp.concatenate(
                dalpha_cols + dbeta_cols
                + [dkap_p * alignment * kexp], axis=-1)          # (B, 3K)
            dh[0] = dh[0] + _dot(draw, attn_wT[:])
            dkap_s[:] = (1 - m) * dkap_tot + dkap_p

            # layer 0
            g = gates_refs[0][s].astype(F32)
            i0 = _sigmoid(g[:, :H])
            f0 = _sigmoid(g[:, H:2 * H])
            z0 = jnp.tanh(g[:, 2 * H:3 * H])
            o0 = _sigmoid(g[:, 3 * H:])
            cpv0 = c_prev_refs[0][s]
            c0p = f0 * cpv0 + i0 * z0
            tc0 = jnp.tanh(c0p)
            dhp0 = m * dh[0]
            dc0p = m * dc[0] + dhp0 * o0 * (1 - tc0 * tc0)
            dg0 = jnp.concatenate([
                dc0p * z0 * i0 * (1 - i0),
                dc0p * cpv0 * f0 * (1 - f0),
                dc0p * i0 * (1 - z0 * z0),
                dhp0 * tc0 * o0 * (1 - o0)], axis=-1)
            w_wT0, _, whT0 = layersT[0]
            dw_s[:] = (1 - m) * dw_tot + _dot(dg0, w_wT0[:])
            dhs[0][0][:] = (1 - m) * dh[0] + _dot(dg0, whT0[:])
            dhs[0][1][:] = (1 - m) * dc[0] + dc0p * f0
            dgates_out[0][s] = dg0.astype(grad_dtype)
            draw_out[s] = draw
            dwp_out[s] = dw_p

        dfinal_out[:] = jnp.concatenate([s_ref[:] for s_ref in scratch],
                                        axis=-1)

    return kernel


# ======================================================================
# host-side wrappers
# ======================================================================

def _pad_t(x, Tp):
    T = x.shape[0]
    if T == Tp:
        return x
    pad = [(0, Tp - T)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)


def _vm():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def _chunked(C, *dims):
    return pl.BlockSpec((C,) + dims, lambda t: (t,) + (0,) * len(dims),
                        memory_space=pltpu.VMEM)


def _chunked_rev(C, nc, *dims):
    return pl.BlockSpec((C,) + dims,
                        lambda t: (nc - 1 - t,) + (0,) * len(dims),
                        memory_space=pltpu.VMEM)


def _const(*dims):
    return pl.BlockSpec(dims, lambda t: (0,) * len(dims),
                        memory_space=pltpu.VMEM)


def _split_state(flat, L, H, K, E):
    """(B, 2LH+K+E) -> (hs tuple, kappa, w)."""
    sizes = [H, H] * L + [K, E]
    parts, o = [], 0
    for sz in sizes:
        parts.append(flat[:, o:o + sz])
        o += sz
    hs = tuple((parts[2 * l], parts[2 * l + 1]) for l in range(L))
    return hs, parts[2 * L], parts[2 * L + 1]


def make_pallas_decoder_scan(L: int, H: int, K: int, E: int,
                             alignment: float,
                             residual_dtype=jnp.float32,
                             chunk: int = 2,
                             interpret: bool = False,
                             vmem_limit_mb: int = 127,
                             enc_dtype=None):
    """Drop-in replacement for scan_vjp.make_decoder_scan backed by the
    fused Pallas kernels. Same signature and residual/gradient layout;
    dgates stream at residual_dtype (the bf16 knob's rounding contract
    extends to the gradient stream)."""
    alignment = float(alignment)
    res_dtype = jnp.dtype(residual_dtype)
    grad_dtype = res_dtype
    max_chunk = int(chunk)
    SD = 2 * L * H + K + E
    FD = L * H + E

    def _plan(which, B, U):
        """Per-pass (C, enc_dtype) at trace time — data shapes, not the
        factory, decide what fits (plan_pass docstring). Interpret mode
        keeps the requested chunk and f32 enc (tests pin exactness)."""
        if interpret:
            return max_chunk, (enc_dtype or jnp.float32)
        plan = plan_pass(which, B, U, L=L, H=H, K=K, E=E,
                         max_chunk=max_chunk,
                         res_bytes=res_dtype.itemsize)
        if plan is not None and enc_dtype is not None:
            plan = (plan[0], enc_dtype)
        if plan is None:
            raise ValueError(
                f"pallas train scan does not fit VMEM at B={B} U={U} "
                f"(H={H} E={E} L={L}) — caller should use the lax.scan "
                f"path (pallas_scan_fits)")
        return plan

    def _run_fwd(params_t, gates_x, mask, enc, text_mask, init,
                 emit_res=True):
        """emit_res=False: the residual-free forward variant — no
        gates/cs/raw/kappa HBM streams (VERDICT r4 weak #3). Used by
        the custom_vjp PRIMAL, i.e. every undifferentiated consumer
        (Trainer eval step, evaluate.teacher_forced_predictions, the
        scheduled-sampling pass-1 forward); the differentiated path
        (scan_fwd) keeps the residual-emitting kernel."""
        attn_w, attn_b, layers = params_t
        T, B = mask.shape
        U = enc.shape[1]
        C, enc_dtype = _plan("fwd" if emit_res else "fwd_only", B, U)
        nc = -(-T // C)
        Tp = nc * C
        gx = [_pad_t(g.astype(jnp.float32), Tp) for g in gates_x]
        mask_exp = jnp.broadcast_to(
            _pad_t(mask.astype(jnp.float32), Tp)[:, :, None],
            (Tp, B, _MASK_LANES))
        init_hs, init_kappa, init_w = init

        weights = [attn_w.astype(jnp.float32),
                   attn_b.astype(jnp.float32)[None]]
        for l in range(L):
            w_w, hb_w, wh = layers[l]
            weights.append(w_w.astype(jnp.float32))
            if l > 0:
                weights.append(hb_w.astype(jnp.float32))
            weights.append(wh.astype(jnp.float32))
        init_flat = []
        for h, c in init_hs:
            init_flat += [h.astype(jnp.float32), c.astype(jnp.float32)]
        init_flat += [init_kappa.astype(jnp.float32),
                      init_w.astype(jnp.float32)]

        kernel = _make_fwd_kernel(B=B, E=E, H=H, K=K, U=U, C=C, L=L,
                                  alignment=alignment,
                                  res_dtype=res_dtype,
                                  emit_residuals=emit_res)
        in_specs = ([_vm()] * len(weights) + [_vm(), _vm()]
                    + [_vm()] * len(init_flat)
                    + [_chunked(C, B, 4 * H)] * L
                    + [_chunked(C, B, _MASK_LANES)])
        out_specs = [_chunked(C, B, FD), _chunked(C, B, U)]
        out_shape = [jax.ShapeDtypeStruct((Tp, B, FD), jnp.float32),
                     jax.ShapeDtypeStruct((Tp, B, U), jnp.float32)]
        if emit_res:
            out_specs += ([_chunked(C, B, 4 * H)] * L
                          + [_chunked(C, B, H)] * L
                          + [_chunked(C, B, 3 * K), _chunked(C, B, K)])
            out_shape += ([jax.ShapeDtypeStruct((Tp, B, 4 * H), res_dtype)
                           for _ in range(L)]
                          + [jax.ShapeDtypeStruct((Tp, B, H), jnp.float32)
                             for _ in range(L)]
                          + [jax.ShapeDtypeStruct((Tp, B, 3 * K),
                                                  jnp.float32),
                             jax.ShapeDtypeStruct((Tp, B, K),
                                                  jnp.float32)])
        out_specs += [_const(B, SD)]
        out_shape += [jax.ShapeDtypeStruct((B, SD), jnp.float32)]
        scratch = ([pltpu.VMEM((B, H), jnp.float32)
                    for _ in range(2 * L)]
                   + [pltpu.VMEM((B, K), jnp.float32),
                      pltpu.VMEM((B, E), jnp.float32)])
        call = pl.pallas_call(
            kernel,
            grid=(nc,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit_mb * 1024 * 1024,
                dimension_semantics=("arbitrary",)),
            interpret=interpret,
        )
        outs = call(*weights, enc.astype(enc_dtype),
                    text_mask.astype(jnp.float32),
                    *init_flat, *gx, mask_exp)
        feats = outs[0][:T]
        phis = outs[1][:T]
        if not emit_res:
            carry = _split_state(outs[2], L, H, K, E)
            return feats, phis, carry, None, None, None, None
        gates_s = tuple(outs[2 + l][:T] for l in range(L))
        cs_s = tuple(outs[2 + L + l][:T] for l in range(L))
        raw_s = outs[2 + 2 * L][:T]
        kappa_s = outs[3 + 2 * L][:T]
        carry = _split_state(outs[4 + 2 * L], L, H, K, E)
        return feats, phis, carry, gates_s, cs_s, raw_s, kappa_s

    def _run_bwd(params_t, gates_s, cs_s, raw_s, kappa_s, mask, enc,
                 text_mask, init, dfeats, dphis, dcarry):
        attn_w, attn_b, layers = params_t
        T, B = mask.shape
        U = enc.shape[1]
        C, enc_dtype = _plan("bwd", B, U)
        nc = -(-T // C)
        Tp = nc * C
        init_hs, init_kappa, init_w = init

        # previous-step sequences the reverse kernel streams (c/kappa;
        # h_prev/w_prev feed only the post-hoc GEMMs, not the kernel)
        shift = lambda seq, x0: jnp.concatenate(
            [x0[None].astype(seq.dtype), seq[:-1]], axis=0)
        c_prev = [shift(cs_s[l], init_hs[l][1]) for l in range(L)]
        kappa_prev = shift(kappa_s, init_kappa)

        weightsT = [attn_w.astype(jnp.float32).T]
        for l in range(L):
            w_w, hb_w, wh = layers[l]
            weightsT.append(w_w.astype(jnp.float32).T)
            if l > 0:
                weightsT.append(hb_w.astype(jnp.float32).T)
            weightsT.append(wh.astype(jnp.float32).T)
        encT = jnp.swapaxes(enc.astype(enc_dtype), 1, 2)  # (B, E, U)

        d_final_hs, d_final_kappa, d_final_w = dcarry
        dcarry_flat = []
        for l in range(L):
            dcarry_flat += [d_final_hs[l][0].astype(jnp.float32),
                            d_final_hs[l][1].astype(jnp.float32)]
        dcarry_flat += [d_final_kappa.astype(jnp.float32),
                        d_final_w.astype(jnp.float32)]

        mask_exp = jnp.broadcast_to(
            _pad_t(mask.astype(jnp.float32), Tp)[:, :, None],
            (Tp, B, _MASK_LANES))
        dfeats_p = _pad_t(dfeats.astype(jnp.float32), Tp)
        dphis_p = _pad_t(dphis.astype(jnp.float32), Tp)
        gates_p = [_pad_t(g, Tp) for g in gates_s]
        c_prev_p = [_pad_t(c, Tp) for c in c_prev]
        kappa_prev_p = _pad_t(kappa_prev, Tp)
        raw_p = _pad_t(raw_s, Tp)

        kernel = _make_bwd_kernel(B=B, E=E, H=H, K=K, U=U, C=C, L=L,
                                  alignment=alignment,
                                  res_dtype=res_dtype,
                                  grad_dtype=grad_dtype)
        rc = functools.partial(_chunked_rev, C, nc)
        in_specs = ([_vm()] * len(weightsT) + [_vm(), _vm()]
                    + [_vm()] * len(dcarry_flat)
                    + [rc(B, FD), rc(B, U)]
                    + [rc(B, 4 * H)] * L
                    + [rc(B, H)] * L
                    + [rc(B, K), rc(B, 3 * K), rc(B, _MASK_LANES)])
        out_specs = ([rc(B, 4 * H)] * L
                     + [rc(B, 3 * K), rc(B, E), _const(B, SD)])
        out_shape = ([jax.ShapeDtypeStruct((Tp, B, 4 * H), grad_dtype)
                      for _ in range(L)]
                     + [jax.ShapeDtypeStruct((Tp, B, 3 * K), jnp.float32),
                        jax.ShapeDtypeStruct((Tp, B, E), jnp.float32),
                        jax.ShapeDtypeStruct((B, SD), jnp.float32)])
        scratch = ([pltpu.VMEM((B, H), jnp.float32)
                    for _ in range(2 * L)]
                   + [pltpu.VMEM((B, K), jnp.float32),
                      pltpu.VMEM((B, E), jnp.float32)])
        call = pl.pallas_call(
            kernel,
            grid=(nc,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit_mb * 1024 * 1024,
                dimension_semantics=("arbitrary",)),
            interpret=interpret,
        )
        outs = call(*weightsT, encT, text_mask.astype(jnp.float32),
                    *dcarry_flat, dfeats_p, dphis_p, *gates_p,
                    *c_prev_p, kappa_prev_p, raw_p, mask_exp)
        dgates = tuple(outs[l][:T] for l in range(L))
        draws = outs[L][:T]
        dw_ps = outs[L + 1][:T]
        dinit = _split_state(outs[L + 2], L, H, K, E)
        return dgates, draws, dw_ps, dinit

    # ------------------------------------------------------------------
    @jax.custom_vjp
    def scan_pallas(params_t, gates_x, mask, enc, text_mask, init):
        # PRIMAL = the residual-free forward kernel: an undifferentiated
        # call (eval step, teacher-forced predictions, SS pass-1) pays
        # zero residual HBM traffic (VERDICT r4 weak #3). Differentiated
        # calls route through scan_fwd below instead.
        feats, phis, carry, *_ = _run_fwd(params_t, gates_x, mask, enc,
                                          text_mask, init, emit_res=False)
        return feats, phis, carry

    def scan_fwd(params_t, gates_x, mask, enc, text_mask, init):
        (feats, phis, carry, gates_s, cs_s, raw_s,
         kappa_s) = _run_fwd(params_t, gates_x, mask, enc, text_mask,
                             init)
        res = (params_t, gates_s, cs_s, raw_s, kappa_s, feats, phis,
               mask, enc, text_mask, init)
        return (feats, phis, carry), res

    def scan_bwd(res, cts):
        (params_t, gates_s, cs_s, raw_s, kappa_s, feats, phis, mask,
         enc, text_mask, init) = res
        dfeats, dphis, dcarry = cts
        dgates, draws, dw_ps, dinit = _run_bwd(
            params_t, gates_s, cs_s, raw_s, kappa_s, mask, enc,
            text_mask, init, dfeats, dphis, dcarry)

        # identical post-hoc GEMMs to the lax.scan split path
        h_prev, _c, w_prev, _k = shifted_inputs(feats, cs_s, kappa_s,
                                                init, L, H)
        d_layers, dattn_w, dattn_b, denc = posthoc_grads(
            feats, h_prev, w_prev, dgates, draws, dw_ps, phis, enc,
            L, H)
        dgates_x = tuple(dgates[l].astype(jnp.float32)
                         for l in range(L))
        dparams_t = (dattn_w, dattn_b, tuple(d_layers))
        return (dparams_t, dgates_x, jnp.zeros_like(mask), denc,
                jnp.zeros_like(text_mask), dinit)

    scan_pallas.defvjp(scan_fwd, scan_bwd)
    return scan_pallas


# ======================================================================
# Fused Pallas LSTM scan (the encoder's per-direction pass)
# ======================================================================
#
# Same design as the decoder kernels, one plain LSTM layer: the
# recurrent weight matrix stays VMEM-resident for the whole pass, the
# (h, c) state (and (dh, dc) in the reverse kernel) lives in VMEM
# scratch, and the per-step streams (hoisted input projections in;
# h / gate residuals / post-mix cell states out) ride chunked
# double-buffered HBM blocks. Replaces the lax.scan in
# nn/recurrent.lstm_scan_split, whose per-step loop iterations and
# per-step wh re-reads dominate the encoder's cost
# (docs/PERFORMANCE.md round-3 breakdown: encoder = 5.1 ms of the
# 15.2 ms B=256 step). Math contract: EXACTLY
# recurrent._make_lstm_scan_split's computation — same forward values,
# same gradient structure (dwh/db fall out of the same post-hoc
# (T·B)-row GEMM on the host side).


def lstm_plan_chunk(B, H, *, max_chunk, res_bytes,
                    budget_mb=_VMEM_BUDGET_MB):
    """Largest chunk C whose fwd/bwd footprints both fit VMEM (None if
    even C=1 overflows — tiny weights make that effectively impossible
    at sane (B, H), but guard anyway)."""
    budget = budget_mb * 1024 * 1024
    w = H * 4 * H * 4 + 4 * H * 4          # wh (or whT) + bias
    common = w + 2 * B * 2 * H * 4 * 2     # init + final (buffered)
    common += 2 * B * H * 4                # scratch h/c (or dh/dc)
    C = int(max_chunk)
    while C >= 1:
        per = 2 * C * B                     # double-buffered chunk rows
        fwd = (common
               + per * (4 * H * 4           # x_proj in
                        + _MASK_LANES * 4   # mask in
                        + H * 4             # hs out
                        + 4 * H * res_bytes  # gates out
                        + H * 4))           # cs out
        bwd = (common
               + per * (H * 4               # dh_up in
                        + 4 * H * res_bytes  # gates in
                        + H * 4             # c_prev in
                        + _MASK_LANES * 4   # mask in
                        + 4 * H * res_bytes))  # dgates out
        if max(fwd, bwd) <= budget:
            return C
        C //= 2
    return None


def _lstm_cell_fwd(g, h, c, m, H):
    """One plain-LSTM cell step from gate pre-activations g; returns
    the MASKED (h, c) plus g for the residual stream. Shared by the
    single-direction and direction-fused kernels — one copy of the
    gate math keeps the 'exactly the two single-direction passes'
    parity contract mechanical."""
    i = _sigmoid(g[:, :H])
    f = _sigmoid(g[:, H:2 * H])
    z = jnp.tanh(g[:, 2 * H:3 * H])
    o = _sigmoid(g[:, 3 * H:])
    c_new = f * c + i * z
    h_new = o * jnp.tanh(c_new)
    return m * h_new + (1 - m) * h, m * c_new + (1 - m) * c, g


def _lstm_cell_bwd(g, cp, dh_tot, dc, m, H):
    """Backward of _lstm_cell_fwd: (dgates, dc_prev) from the f32 gate
    residuals, the previous cell, the TOTAL incoming dh (carry +
    upstream), and the carried dc. The caller adds the recurrent
    _dot(dg, whT) term into its dh carry."""
    i = _sigmoid(g[:, :H])
    f = _sigmoid(g[:, H:2 * H])
    z = jnp.tanh(g[:, 2 * H:3 * H])
    o = _sigmoid(g[:, 3 * H:])
    cpv = f * cp + i * z
    tc = jnp.tanh(cpv)
    dhp = m * dh_tot
    dcp = m * dc + dhp * o * (1 - tc * tc)
    dg = jnp.concatenate([
        dcp * z * i * (1 - i),
        dcp * cp * f * (1 - f),
        dcp * i * (1 - z * z),
        dhp * tc * o * (1 - o)], axis=-1)
    dc_new = (1 - m) * dc + dcp * f
    return dg, dc_new


def _make_lstm_fwd_kernel(*, B, H, C, reverse, res_dtype,
                          emit_residuals=True):
    def kernel(*refs):
        if emit_residuals:
            (wh_ref, b_ref, init_ref, xp_ref, mask_ref,
             hs_out, gates_out, cs_out, final_out, h_s, c_s) = refs
        else:
            (wh_ref, b_ref, init_ref, xp_ref, mask_ref,
             hs_out, final_out, h_s, c_s) = refs

        @pl.when(pl.program_id(0) == 0)
        def _init():
            h_s[:] = init_ref[:, :H]
            c_s[:] = init_ref[:, H:]

        steps = reversed(range(C)) if reverse else range(C)
        for s in steps:
            g = xp_ref[s] + _dot(h_s[:], wh_ref[:]) + b_ref[:]
            h, c, g = _lstm_cell_fwd(g, h_s[:], c_s[:],
                                     mask_ref[s][:, 0:1], H)
            h_s[:] = h
            c_s[:] = c
            hs_out[s] = h
            if emit_residuals:
                gates_out[s] = g.astype(res_dtype)
                cs_out[s] = c
        final_out[:] = jnp.concatenate([h_s[:], c_s[:]], axis=-1)

    return kernel


def _make_lstm_bwd_kernel(*, B, H, C, reverse, res_dtype, grad_dtype):
    F32 = jnp.float32

    def kernel(whT_ref, dcarry_ref, dh_up_ref, gates_ref, cprev_ref,
               mask_ref, dgates_out, dfinal_out, dh_s, dc_s):
        @pl.when(pl.program_id(0) == 0)
        def _init():
            dh_s[:] = dcarry_ref[:, :H]
            dc_s[:] = dcarry_ref[:, H:]

        # walk time in the direction OPPOSITE to the forward pass
        steps = range(C) if reverse else reversed(range(C))
        for s in steps:
            m = mask_ref[s][:, 0:1]
            dh_tot = dh_s[:] + dh_up_ref[s]
            dg, dc_new = _lstm_cell_bwd(gates_ref[s].astype(F32),
                                        cprev_ref[s], dh_tot, dc_s[:],
                                        m, H)
            dh_s[:] = (1 - m) * dh_tot + _dot(dg, whT_ref[:])
            dc_s[:] = dc_new
            dgates_out[s] = dg.astype(grad_dtype)
        dfinal_out[:] = jnp.concatenate([dh_s[:], dc_s[:]], axis=-1)

    return kernel


@functools.lru_cache(maxsize=None)
def make_pallas_lstm_scan(H: int, reverse: bool,
                          residual_dtype_name: str = "float32",
                          chunk: int = 8,
                          interpret: bool = False,
                          vmem_limit_mb: int = 127):
    """Drop-in replacement for recurrent._LSTM_SCAN_SPLIT[reverse]
    backed by the fused Pallas kernels: run(wh, b, x_proj, mask, init)
    -> (hs, final). Cached per (H, direction, dtype, chunk) so repeated
    traces reuse one custom_vjp closure."""
    res_dtype = jnp.dtype(residual_dtype_name)
    grad_dtype = res_dtype
    reverse = bool(reverse)

    def _plan(B):
        if interpret:
            return int(chunk)
        C = lstm_plan_chunk(B, H, max_chunk=chunk,
                            res_bytes=res_dtype.itemsize)
        if C is None:
            raise ValueError(
                f"pallas lstm scan does not fit VMEM at B={B} H={H}")
        return C

    def _call_fwd(wh, b, x_proj, mask, init, emit_res=True):
        T, B = mask.shape
        C = _plan(B)
        nc = -(-T // C)
        Tp = nc * C
        xp = _pad_t(x_proj.astype(jnp.float32), Tp)
        mask_exp = jnp.broadcast_to(
            _pad_t(mask.astype(jnp.float32), Tp)[:, :, None],
            (Tp, B, _MASK_LANES))
        init_flat = jnp.concatenate(
            [init[0].astype(jnp.float32), init[1].astype(jnp.float32)],
            axis=-1)
        kernel = _make_lstm_fwd_kernel(B=B, H=H, C=C, reverse=reverse,
                                       res_dtype=res_dtype,
                                       emit_residuals=emit_res)
        # the fwd pass streams chunks in time order for reverse=False
        # and from the tail for reverse=True (zero-padded steps are
        # masked passthrough, so tail padding is direction-agnostic)
        ch = (functools.partial(_chunked_rev, C, nc) if reverse
              else functools.partial(_chunked, C))
        out_specs = [ch(B, H)]
        out_shape = [jax.ShapeDtypeStruct((Tp, B, H), jnp.float32)]
        if emit_res:
            out_specs += [ch(B, 4 * H), ch(B, H)]
            out_shape += [jax.ShapeDtypeStruct((Tp, B, 4 * H), res_dtype),
                          jax.ShapeDtypeStruct((Tp, B, H), jnp.float32)]
        out_specs += [_const(B, 2 * H)]
        out_shape += [jax.ShapeDtypeStruct((B, 2 * H), jnp.float32)]
        call = pl.pallas_call(
            kernel,
            grid=(nc,),
            in_specs=[_vm(), _vm(), _vm(),
                      ch(B, 4 * H), ch(B, _MASK_LANES)],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((B, H), jnp.float32),
                            pltpu.VMEM((B, H), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit_mb * 1024 * 1024,
                dimension_semantics=("arbitrary",)),
            interpret=interpret,
        )
        outs = call(
            wh.astype(jnp.float32), b.astype(jnp.float32)[None],
            init_flat, xp, mask_exp)
        if not emit_res:
            hs, final = outs
            return hs[:T], None, None, (final[:, :H], final[:, H:])
        hs, gates, cs, final = outs
        return (hs[:T], gates[:T], cs[:T],
                (final[:, :H], final[:, H:]))

    def _call_bwd(wh, gates, c_prev, mask, dhs_up, dcarry):
        T, B = mask.shape
        C = _plan(B)
        nc = -(-T // C)
        Tp = nc * C
        mask_exp = jnp.broadcast_to(
            _pad_t(mask.astype(jnp.float32), Tp)[:, :, None],
            (Tp, B, _MASK_LANES))
        dh_up = _pad_t(dhs_up.astype(jnp.float32), Tp)
        gates_p = _pad_t(gates, Tp)
        c_prev_p = _pad_t(c_prev, Tp)
        dcarry_flat = jnp.concatenate(
            [dcarry[0].astype(jnp.float32),
             dcarry[1].astype(jnp.float32)], axis=-1)
        kernel = _make_lstm_bwd_kernel(B=B, H=H, C=C, reverse=reverse,
                                       res_dtype=res_dtype,
                                       grad_dtype=grad_dtype)
        # opposite chunk order to the fwd pass
        ch = (functools.partial(_chunked, C) if reverse
              else functools.partial(_chunked_rev, C, nc))
        call = pl.pallas_call(
            kernel,
            grid=(nc,),
            in_specs=[_vm(), _vm(),
                      ch(B, H), ch(B, 4 * H), ch(B, H),
                      ch(B, _MASK_LANES)],
            out_specs=[ch(B, 4 * H), _const(B, 2 * H)],
            out_shape=[jax.ShapeDtypeStruct((Tp, B, 4 * H), grad_dtype),
                       jax.ShapeDtypeStruct((B, 2 * H), jnp.float32)],
            scratch_shapes=[pltpu.VMEM((B, H), jnp.float32),
                            pltpu.VMEM((B, H), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit_mb * 1024 * 1024,
                dimension_semantics=("arbitrary",)),
            interpret=interpret,
        )
        dgates, dfinal = call(wh.astype(jnp.float32).T, dcarry_flat,
                              dh_up, gates_p, c_prev_p, mask_exp)
        return dgates[:T], (dfinal[:, :H], dfinal[:, H:])

    def _shift_prev(seq, x0):
        """Previous-step value along the scan direction (recurrent.py
        run_bwd contract: for reverse=True step t's predecessor is
        t+1)."""
        if reverse:
            return jnp.concatenate([seq[1:], x0[None].astype(seq.dtype)],
                                   axis=0)
        return jnp.concatenate([x0[None].astype(seq.dtype), seq[:-1]],
                               axis=0)

    @jax.custom_vjp
    def run(wh, b, x_proj, mask, init):
        # PRIMAL = residual-free forward (no gate/cell HBM streams) —
        # undifferentiated consumers only; see the decoder scan_pallas
        hs, _, _, final = _call_fwd(wh, b, x_proj, mask, init,
                                    emit_res=False)
        return hs, final

    def run_fwd(wh, b, x_proj, mask, init):
        hs, gates, cs, final = _call_fwd(wh, b, x_proj, mask, init)
        return (hs, final), (wh, gates, cs, hs, mask, init)

    def run_bwd(res, cts):
        wh, gates, cs, hs, mask, init = res
        dhs_up, dcarry = cts
        c_prev = _shift_prev(cs, init[1])
        h_prev = _shift_prev(hs, init[0])
        dgates, dinit = _call_bwd(wh, gates, c_prev, mask, dhs_up,
                                  dcarry)
        T, B = mask.shape
        dg_flat = dgates.astype(jnp.float32).reshape(T * B, 4 * H)
        dwh = jnp.dot(h_prev.reshape(T * B, H).T, dg_flat,
                      preferred_element_type=jnp.float32)
        db = dg_flat.sum(axis=0)
        return (dwh, db, dgates.astype(jnp.float32),
                jnp.zeros_like(mask), dinit)

    run.defvjp(run_fwd, run_bwd)
    return run


# ======================================================================
# Direction-fused BiLSTM scan (the encoder's two passes in ONE kernel)
# ======================================================================
#
# The encoder's fwd and bwd directions are independent sequential
# kernels above; at production shapes each per-step (B, H) x (H, 4H)
# GEMM is far below the MXU's useful width, so both kernels are
# LATENCY-bound — the roofline accounting put the BiLSTM at ~6x its
# bandwidth floor (docs/PERFORMANCE.md round 4; VERDICT r4 weak #4).
# This kernel steps BOTH directions in one grid pass: per inner
# iteration, direction f advances one step forward in time and
# direction b one step backward. Each direction keeps its own chunked
# HBM streams with its own index map (forward order for f, reversed
# for b), so one grid traversal serves both time orders. Sequential
# kernel steps halve at double per-step GEMM width.
#
# MEASURED OUTCOME (scripts/encoder_fusion_ab.py, on chip, B=256
# U=128): NO gain — encoder fwd+bwd 3.66 -> 3.64 ms, full step
# 14.24 -> 14.29 ms. Halving the step count at double width is a wash
# because the per-step cost is the Mosaic grid-step pipeline overhead
# (width-invariant), not the VPU/MXU work; the doubled resident
# working set pays back what the halved count saves. The production
# encoder therefore keeps the two single-direction kernels
# (nn/recurrent.py bidirectional_lstm_split, fuse_directions=False);
# this kernel stays parity-tested for shapes where the tradeoff may
# flip (docs/PERFORMANCE.md round 5).
#
# Math contract: EXACTLY the two make_pallas_lstm_scan passes run
# separately (identical per-direction computation, merely interleaved;
# the directions share no state).


def bilstm_plan_chunk(B, H, *, max_chunk, res_bytes,
                      budget_mb=_VMEM_BUDGET_MB):
    """Largest chunk C whose fused fwd/bwd footprints fit VMEM (two
    directions' weights, streams, and scratch)."""
    budget = budget_mb * 1024 * 1024
    w = 2 * (H * 4 * H * 4 + 4 * H * 4)     # wh_f/wh_b (or T) + biases
    common = w + 2 * B * 4 * H * 4 * 2      # init + final (buffered)
    common += 4 * B * H * 4                 # scratch h/c (or dh/dc) x2
    C = int(max_chunk)
    while C >= 1:
        per = 2 * C * B                     # double-buffered chunk rows
        fwd = (common
               + per * 2 * (4 * H * 4          # xp in (per direction)
                            + _MASK_LANES * 4  # mask in
                            + H * 4            # hs out
                            + 4 * H * res_bytes  # gates out
                            + H * 4))          # cs out
        bwd = (common
               + per * 2 * (H * 4              # dh_up in
                            + 4 * H * res_bytes  # gates in
                            + H * 4            # c_prev in
                            + _MASK_LANES * 4  # mask in
                            + 4 * H * res_bytes))  # dgates out
        if max(fwd, bwd) <= budget:
            return C
        C //= 2
    return None


def _make_bilstm_fwd_kernel(*, B, H, C, res_dtype, emit_residuals=True):
    def kernel(*refs):
        i = 0
        whf, bf, whb, bb, init_ref = refs[i:i + 5]; i += 5
        xpf, xpb, mf, mb = refs[i:i + 4]; i += 4
        hsf_out, hsb_out = refs[i:i + 2]; i += 2
        if emit_residuals:
            gf_out, cf_out, gb_out, cb_out = refs[i:i + 4]; i += 4
        final_out = refs[i]; i += 1
        hf_s, cf_s, hb_s, cb_s = refs[i:i + 4]; i += 4

        @pl.when(pl.program_id(0) == 0)
        def _init():
            hf_s[:] = init_ref[:, :H]
            cf_s[:] = init_ref[:, H:2 * H]
            hb_s[:] = init_ref[:, 2 * H:3 * H]
            cb_s[:] = init_ref[:, 3 * H:]

        for k in range(C):
            # direction f: time order within the (forward-streamed) chunk
            s = k
            g = xpf[s] + _dot(hf_s[:], whf[:]) + bf[:]
            h, c, g = _lstm_cell_fwd(g, hf_s[:], cf_s[:],
                                     mf[s][:, 0:1], H)
            hf_s[:] = h
            cf_s[:] = c
            hsf_out[s] = h
            if emit_residuals:
                gf_out[s] = g.astype(res_dtype)
                cf_out[s] = c
            # direction b: reversed order within the (reverse-streamed)
            # chunk — one step of each direction per inner iteration
            s = C - 1 - k
            g = xpb[s] + _dot(hb_s[:], whb[:]) + bb[:]
            h, c, g = _lstm_cell_fwd(g, hb_s[:], cb_s[:],
                                     mb[s][:, 0:1], H)
            hb_s[:] = h
            cb_s[:] = c
            hsb_out[s] = h
            if emit_residuals:
                gb_out[s] = g.astype(res_dtype)
                cb_out[s] = c
        final_out[:] = jnp.concatenate(
            [hf_s[:], cf_s[:], hb_s[:], cb_s[:]], axis=-1)

    return kernel


def _make_bilstm_bwd_kernel(*, B, H, C, res_dtype, grad_dtype):
    F32 = jnp.float32

    def kernel(*refs):
        i = 0
        whfT, whbT, dcarry_ref = refs[i:i + 3]; i += 3
        dhf_up, gf_in, cpf_in, mf = refs[i:i + 4]; i += 4
        dhb_up, gb_in, cpb_in, mb = refs[i:i + 4]; i += 4
        dgf_out, dgb_out, dfinal_out = refs[i:i + 3]; i += 3
        dhf_s, dcf_s, dhb_s, dcb_s = refs[i:i + 4]; i += 4

        @pl.when(pl.program_id(0) == 0)
        def _init():
            dhf_s[:] = dcarry_ref[:, :H]
            dcf_s[:] = dcarry_ref[:, H:2 * H]
            dhb_s[:] = dcarry_ref[:, 2 * H:3 * H]
            dcb_s[:] = dcarry_ref[:, 3 * H:]

        for k in range(C):
            # direction f backward walks time T-1 -> 0: its chunks are
            # reverse-streamed and the inner order is reversed
            s = C - 1 - k
            m = mf[s][:, 0:1]
            dh_tot = dhf_s[:] + dhf_up[s]
            dg, dc_new = _lstm_cell_bwd(gf_in[s].astype(F32), cpf_in[s],
                                        dh_tot, dcf_s[:], m, H)
            dhf_s[:] = (1 - m) * dh_tot + _dot(dg, whfT[:])
            dcf_s[:] = dc_new
            dgf_out[s] = dg.astype(grad_dtype)
            # direction b backward walks time 0 -> T-1: forward-streamed
            s = k
            m = mb[s][:, 0:1]
            dh_tot = dhb_s[:] + dhb_up[s]
            dg, dc_new = _lstm_cell_bwd(gb_in[s].astype(F32), cpb_in[s],
                                        dh_tot, dcb_s[:], m, H)
            dhb_s[:] = (1 - m) * dh_tot + _dot(dg, whbT[:])
            dcb_s[:] = dc_new
            dgb_out[s] = dg.astype(grad_dtype)
        dfinal_out[:] = jnp.concatenate(
            [dhf_s[:], dcf_s[:], dhb_s[:], dcb_s[:]], axis=-1)

    return kernel


@functools.lru_cache(maxsize=None)
def make_pallas_bilstm_scan(H: int, residual_dtype_name: str = "float32",
                            chunk: int = 8, interpret: bool = False,
                            vmem_limit_mb: int = 127):
    """Direction-fused BiLSTM: run(whf, bf, whb, bb, xpf, xpb, mask,
    init) -> (hs_f, hs_b, final_f, final_b), where init is
    ((hf0, cf0), (hb0, cb0)). Math contract: exactly
    make_pallas_lstm_scan(H, False) on (whf, bf, xpf) plus
    make_pallas_lstm_scan(H, True) on (whb, bb, xpb), interleaved into
    one pallas_call per pass (VERDICT r4 weak #4). The custom_vjp
    primal is the residual-free forward (VERDICT r4 weak #3)."""
    res_dtype = jnp.dtype(residual_dtype_name)
    grad_dtype = res_dtype

    def _plan(B):
        if interpret:
            return int(chunk)
        C = bilstm_plan_chunk(B, H, max_chunk=chunk,
                              res_bytes=res_dtype.itemsize)
        if C is None:
            raise ValueError(
                f"pallas bilstm scan does not fit VMEM at B={B} H={H}")
        return C

    def _call_fwd(whf, bf, whb, bb, xpf, xpb, mask, init, emit_res=True):
        T, B = mask.shape
        C = _plan(B)
        nc = -(-T // C)
        Tp = nc * C
        xpf_p = _pad_t(xpf.astype(jnp.float32), Tp)
        xpb_p = _pad_t(xpb.astype(jnp.float32), Tp)
        mask_exp = jnp.broadcast_to(
            _pad_t(mask.astype(jnp.float32), Tp)[:, :, None],
            (Tp, B, _MASK_LANES))
        (hf0, cf0), (hb0, cb0) = init
        init_flat = jnp.concatenate(
            [hf0.astype(jnp.float32), cf0.astype(jnp.float32),
             hb0.astype(jnp.float32), cb0.astype(jnp.float32)], axis=-1)
        kernel = _make_bilstm_fwd_kernel(B=B, H=H, C=C,
                                         res_dtype=res_dtype,
                                         emit_residuals=emit_res)
        fc = functools.partial(_chunked, C)               # forward order
        rc = functools.partial(_chunked_rev, C, nc)       # reversed
        in_specs = [_vm()] * 5 + [fc(B, 4 * H), rc(B, 4 * H),
                                  fc(B, _MASK_LANES), rc(B, _MASK_LANES)]
        out_specs = [fc(B, H), rc(B, H)]
        out_shape = [jax.ShapeDtypeStruct((Tp, B, H), jnp.float32),
                     jax.ShapeDtypeStruct((Tp, B, H), jnp.float32)]
        if emit_res:
            out_specs += [fc(B, 4 * H), fc(B, H),
                          rc(B, 4 * H), rc(B, H)]
            out_shape += [
                jax.ShapeDtypeStruct((Tp, B, 4 * H), res_dtype),
                jax.ShapeDtypeStruct((Tp, B, H), jnp.float32),
                jax.ShapeDtypeStruct((Tp, B, 4 * H), res_dtype),
                jax.ShapeDtypeStruct((Tp, B, H), jnp.float32)]
        out_specs += [_const(B, 4 * H)]
        out_shape += [jax.ShapeDtypeStruct((B, 4 * H), jnp.float32)]
        call = pl.pallas_call(
            kernel,
            grid=(nc,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)
                            for _ in range(4)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit_mb * 1024 * 1024,
                dimension_semantics=("arbitrary",)),
            interpret=interpret,
        )
        outs = call(whf.astype(jnp.float32),
                    bf.astype(jnp.float32)[None],
                    whb.astype(jnp.float32),
                    bb.astype(jnp.float32)[None],
                    init_flat, xpf_p, xpb_p, mask_exp, mask_exp)
        hs_f, hs_b = outs[0][:T], outs[1][:T]
        final = outs[-1]
        finals = ((final[:, :H], final[:, H:2 * H]),
                  (final[:, 2 * H:3 * H], final[:, 3 * H:]))
        if not emit_res:
            return hs_f, hs_b, finals, None
        res = (outs[2][:T], outs[3][:T], outs[4][:T], outs[5][:T])
        return hs_f, hs_b, finals, res

    def _call_bwd(whf, whb, gf, cpf, gb, cpb, mask, dhf_up, dhb_up,
                  dcarry):
        T, B = mask.shape
        C = _plan(B)
        nc = -(-T // C)
        Tp = nc * C
        mask_exp = jnp.broadcast_to(
            _pad_t(mask.astype(jnp.float32), Tp)[:, :, None],
            (Tp, B, _MASK_LANES))
        (dhf, dcf), (dhb, dcb) = dcarry
        dcarry_flat = jnp.concatenate(
            [dhf.astype(jnp.float32), dcf.astype(jnp.float32),
             dhb.astype(jnp.float32), dcb.astype(jnp.float32)], axis=-1)
        kernel = _make_bilstm_bwd_kernel(B=B, H=H, C=C,
                                         res_dtype=res_dtype,
                                         grad_dtype=grad_dtype)
        fc = functools.partial(_chunked, C)
        rc = functools.partial(_chunked_rev, C, nc)
        # direction f's backward consumes its streams in reverse time
        # order; direction b's in forward order (opposite of each
        # direction's forward pass)
        in_specs = ([_vm()] * 3
                    + [rc(B, H), rc(B, 4 * H), rc(B, H),
                       rc(B, _MASK_LANES)]
                    + [fc(B, H), fc(B, 4 * H), fc(B, H),
                       fc(B, _MASK_LANES)])
        out_specs = [rc(B, 4 * H), fc(B, 4 * H), _const(B, 4 * H)]
        out_shape = [jax.ShapeDtypeStruct((Tp, B, 4 * H), grad_dtype),
                     jax.ShapeDtypeStruct((Tp, B, 4 * H), grad_dtype),
                     jax.ShapeDtypeStruct((B, 4 * H), jnp.float32)]
        call = pl.pallas_call(
            kernel,
            grid=(nc,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)
                            for _ in range(4)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit_mb * 1024 * 1024,
                dimension_semantics=("arbitrary",)),
            interpret=interpret,
        )
        dgf, dgb, dfinal = call(
            whf.astype(jnp.float32).T, whb.astype(jnp.float32).T,
            dcarry_flat,
            _pad_t(dhf_up.astype(jnp.float32), Tp), _pad_t(gf, Tp),
            _pad_t(cpf, Tp), mask_exp,
            _pad_t(dhb_up.astype(jnp.float32), Tp), _pad_t(gb, Tp),
            _pad_t(cpb, Tp), mask_exp)
        dinit = ((dfinal[:, :H], dfinal[:, H:2 * H]),
                 (dfinal[:, 2 * H:3 * H], dfinal[:, 3 * H:]))
        return dgf[:T], dgb[:T], dinit

    def _shift_fwd(seq, x0):
        return jnp.concatenate([x0[None].astype(seq.dtype), seq[:-1]],
                               axis=0)

    def _shift_rev(seq, x0):
        return jnp.concatenate([seq[1:], x0[None].astype(seq.dtype)],
                               axis=0)

    @jax.custom_vjp
    def run(whf, bf, whb, bb, xpf, xpb, mask, init):
        hs_f, hs_b, finals, _ = _call_fwd(whf, bf, whb, bb, xpf, xpb,
                                          mask, init, emit_res=False)
        return hs_f, hs_b, finals

    def run_fwd(whf, bf, whb, bb, xpf, xpb, mask, init):
        hs_f, hs_b, finals, res = _call_fwd(whf, bf, whb, bb, xpf, xpb,
                                            mask, init, emit_res=True)
        gf, cf, gb, cb = res
        return (hs_f, hs_b, finals), (whf, whb, gf, cf, gb, cb,
                                      hs_f, hs_b, mask, init)

    def run_bwd(resid, cts):
        whf, whb, gf, cf, gb, cb, hs_f, hs_b, mask, init = resid
        dhs_f, dhs_b, dfinals = cts
        (if_, ib_) = init
        cpf = _shift_fwd(cf, if_[1])
        cpb = _shift_rev(cb, ib_[1])
        dgf, dgb, dinit = _call_bwd(whf, whb, gf, cpf, gb, cpb, mask,
                                    dhs_f, dhs_b, dfinals)
        T, B = mask.shape
        hpf = _shift_fwd(hs_f, if_[0]).reshape(T * B, H)
        hpb = _shift_rev(hs_b, ib_[0]).reshape(T * B, H)
        dgf_flat = dgf.astype(jnp.float32).reshape(T * B, 4 * H)
        dgb_flat = dgb.astype(jnp.float32).reshape(T * B, 4 * H)
        dwhf = jnp.dot(hpf.T, dgf_flat,
                       preferred_element_type=jnp.float32)
        dwhb = jnp.dot(hpb.T, dgb_flat,
                       preferred_element_type=jnp.float32)
        return (dwhf, dgf_flat.sum(axis=0).astype(jnp.float32),
                dwhb, dgb_flat.sum(axis=0).astype(jnp.float32),
                dgf.astype(jnp.float32), dgb.astype(jnp.float32),
                jnp.zeros_like(mask), dinit)

    run.defvjp(run_fwd, run_bwd)
    return run
