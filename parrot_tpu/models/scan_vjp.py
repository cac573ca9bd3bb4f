"""Hand-written VJP for the decoder scan: post-hoc weight gradients.

XLA's autodiff of `lax.scan` accumulates the cotangent of every
loop-invariant tensor INSIDE the reverse scan's carry: for the Parrot
decoder that is ~26 MB of weight gradients plus the (B, U, E) encoder
cotangent read+written EVERY timestep — the dominant share of the
backward's HBM traffic (docs/PERFORMANCE.md round-3 breakdown; the
backward is ~2/3 of the train step).

This module reimplements the scan's VJP so the reverse scan carries
ONLY the true recurrent cotangents (dh/dc per layer, dkappa, dw — a few
hundred KB) and emits per-step dgates/draw/dw' tensors; every weight
gradient and the encoder cotangent then falls out as ONE big (T·B)-row
GEMM after the scan:

    dWh_l  = h_l[t-1]^T  @ dgates_l[t]      (one GEMM over T·B rows)
    dWhb_l = h_{l-1}[t]^T @ dgates_l[t]
    dWw_l  = w^T          @ dgates_l[t]     (w_prev for layer 0)
    dWa    = h_0[t]^T     @ draw[t]
    denc   = einsum('tbu,tbe->bue', phi, dw')

Math contract: EXACTLY the computation of Parrot.scan_decoder's plain
path (same forward values bit-for-bit; gradients equal to autodiff up
to f32 reduction order — pinned by tests/test_model.py). Scope: no
layer_norm, no stacked_scan (guarded by the caller).

Enabled by ModelConfig.split_backward.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def _sigmoid(x):
    return jax.nn.sigmoid(x)


def shifted_inputs(feats, cs_s, kappa_s, init, L, H):
    """Per-step PREVIOUS-state sequences for the reverse pass: shift the
    saved post-mix sequences by one step, step 0 taking the init values.
    Returns (h_prev list, c_prev list, w_prev, kappa_prev)."""
    init_hs, init_kappa, init_w = init

    def shift_prev(x_seq, x0):
        return jnp.concatenate([x0[None], x_seq[:-1]], axis=0)

    h_prev = [shift_prev(feats[..., l * H:(l + 1) * H], init_hs[l][0])
              for l in range(L)]
    c_prev = [shift_prev(cs_s[l], init_hs[l][1]) for l in range(L)]
    w_prev = shift_prev(feats[..., L * H:], init_w)
    kappa_prev = shift_prev(kappa_s, init_kappa)
    return h_prev, c_prev, w_prev, kappa_prev


def posthoc_grads(feats, h_prev, w_prev, dgates, draws, dw_ps, phis, enc,
                  L, H):
    """Weight gradients as single (T·B)-row GEMMs from the per-step
    cotangent streams the reverse scan emitted (module docstring).
    Returns (d_layers, dattn_w, dattn_b, denc)."""
    F32 = jnp.float32
    T, B = feats.shape[:2]
    TB = T * B

    def flat(x):
        return x.reshape(TB, x.shape[-1]).astype(F32)

    d_layers = []
    for l in range(L):
        dg = flat(dgates[l])                             # (TB, 4H)
        if l == 0:
            dWw = jnp.dot(flat(w_prev).T, dg,
                          preferred_element_type=F32)
            dWhb = None
        else:
            dWw = jnp.dot(flat(feats[..., L * H:]).T, dg,
                          preferred_element_type=F32)
            dWhb = jnp.dot(
                flat(feats[..., (l - 1) * H:l * H]).T, dg,
                preferred_element_type=F32)
        dWh = jnp.dot(flat(h_prev[l]).T, dg,
                      preferred_element_type=F32)
        d_layers.append((dWw, dWhb, dWh))
    dattn_w = jnp.dot(flat(feats[..., :H]).T, flat(draws),
                      preferred_element_type=F32)
    dattn_b = flat(draws).sum(axis=0)
    denc = jnp.einsum("tbu,tbe->bue", phis, dw_ps,
                      preferred_element_type=F32).astype(enc.dtype)
    return d_layers, dattn_w, dattn_b, denc


class _Dims(NamedTuple):
    L: int
    H: int
    K: int
    E: int
    alignment: float


def make_decoder_scan(L: int, H: int, K: int, E: int, alignment: float,
                      residual_dtype=jnp.float32):
    """Returns scan(params_t, gates_x, mask, enc, text_mask, init) ->
    (feats, phis, final_carry) with a custom VJP.

    params_t: (attn_w (H,3K), attn_b (3K,),
               per-layer tuples (w_w (E,4H), hb_w (H,4H) | None,
               wh (H,4H)))
    gates_x:  tuple of L arrays (T, B, 4H) — hoisted input projections
              INCLUDING bias and speaker.
    mask:     (T, B); enc: (B, U, E); text_mask: (B, U)
    init:     (hs tuple of L (h, c) pairs, kappa (B, K), w (B, E))
    """
    dims = _Dims(L, H, K, E, float(alignment))

    def fwd_step(params_t, enc, text_mask, carry, t_in):
        """One forward step; returns (carry, per-step tensors)."""
        attn_w, attn_b, layers = params_t
        hs, kappa, w = carry
        gates_x, m = t_in[:-1], t_in[-1]
        m = m[:, None]
        F32 = jnp.float32

        # layer 0
        w_w0, _, wh0 = layers[0]
        g0 = (gates_x[0]
              + jnp.dot(w, w_w0, preferred_element_type=F32)
              + jnp.dot(hs[0][0], wh0, preferred_element_type=F32))
        i0 = _sigmoid(g0[:, :H])
        f0 = _sigmoid(g0[:, H:2 * H])
        z0 = jnp.tanh(g0[:, 2 * H:3 * H])
        o0 = _sigmoid(g0[:, 3 * H:])
        c0p = f0 * hs[0][1] + i0 * z0
        h0p = o0 * jnp.tanh(c0p)
        h0 = m * h0p + (1 - m) * hs[0][0]
        c0 = m * c0p + (1 - m) * hs[0][1]

        # attention
        raw = jnp.dot(h0, attn_w, preferred_element_type=F32) + attn_b
        alpha = jnp.exp(raw[:, :K])
        beta = jnp.exp(raw[:, K:2 * K])
        kap_p = kappa + dims.alignment * jnp.exp(raw[:, 2 * K:])
        U = enc.shape[1]
        u = jnp.arange(U, dtype=F32)[None, :, None]
        diff = kap_p[:, None, :] - u
        phi = jnp.sum(alpha[:, None, :]
                      * jnp.exp(-beta[:, None, :] * diff * diff), axis=-1)
        phi = phi * text_mask
        w_p = jnp.einsum("bu,bue->be", phi, enc,
                         preferred_element_type=F32)
        kappa_n = m * kap_p + (1 - m) * kappa
        w_n = m * w_p + (1 - m) * w

        new_hs = [(h0, c0)]
        gates_all = [g0]
        h_below = h0
        for l in range(1, L):
            w_wl, hb_wl, whl = layers[l]
            gl = (gates_x[l]
                  + jnp.dot(w_n, w_wl, preferred_element_type=F32)
                  + jnp.dot(h_below, hb_wl, preferred_element_type=F32)
                  + jnp.dot(hs[l][0], whl, preferred_element_type=F32))
            il = _sigmoid(gl[:, :H])
            fl = _sigmoid(gl[:, H:2 * H])
            zl = jnp.tanh(gl[:, 2 * H:3 * H])
            ol = _sigmoid(gl[:, 3 * H:])
            clp = fl * hs[l][1] + il * zl
            hlp = ol * jnp.tanh(clp)
            hl = m * hlp + (1 - m) * hs[l][0]
            cl = m * clp + (1 - m) * hs[l][1]
            new_hs.append((hl, cl))
            gates_all.append(gl)
            h_below = hl

        feats = jnp.concatenate([h for h, _ in new_hs] + [w_n], axis=-1)
        carry = (tuple(new_hs), kappa_n, w_n)
        # gates are the big residual ((T, L, B, 4H)); storing them at
        # residual_dtype (bf16 knob) halves that stream both ways at
        # ~1e-3 relative gradient rounding
        saved = (tuple(g.astype(residual_dtype) for g in gates_all),
                 tuple(c for _, c in new_hs), raw, kappa_n)
        return carry, (feats, phi, saved)

    # ------------------------------------------------------------------
    def scan(params_t, gates_x, mask, enc, text_mask, init):
        xs = tuple(gates_x) + (mask,)
        carry, (feats, phis) = jax.lax.scan(
            lambda c, x: _drop_saved(fwd_step(params_t, enc, text_mask,
                                              c, x)), init, xs)
        return feats, phis, carry

    def _drop_saved(step_out):
        carry, (feats, phi, _saved) = step_out
        return carry, (feats, phi)

    # ------------------------------------------------------------------
    @jax.custom_vjp
    def scan_vjp(params_t, gates_x, mask, enc, text_mask, init):
        return scan(params_t, gates_x, mask, enc, text_mask, init)

    def scan_fwd(params_t, gates_x, mask, enc, text_mask, init):
        xs = tuple(gates_x) + (mask,)
        carry, (feats, phis, saved) = jax.lax.scan(
            lambda c, x: fwd_step(params_t, enc, text_mask, c, x),
            init, xs)
        gates_s, cs_s, raw_s, kappa_s = saved
        res = (params_t, gates_s, cs_s, raw_s, kappa_s, feats, phis,
               mask, enc, text_mask, init)
        return (feats, phis, carry), res

    def scan_bwd(res, cts):
        (params_t, gates_s, cs_s, raw_s, kappa_s, feats, phis, mask,
         enc, text_mask, init) = res
        dfeats, dphis, dcarry = cts
        attn_w, attn_b, layers = params_t
        init_hs, init_kappa, init_w = init
        T, B = mask.shape
        F32 = jnp.float32

        # per-step inputs to the REVERSE scan: current-step residuals
        # plus the PREVIOUS step's c/kappa (shift by one; step 0 uses the
        # init values). h_prev/w_prev are needed only by the post-hoc
        # GEMMs below — NOT streamed through the reverse scan.
        h_prev, c_prev, w_prev, kappa_prev = shifted_inputs(
            feats, cs_s, kappa_s, init, L, H)

        d_final_hs, d_final_kappa, d_final_w = dcarry

        def bwd_step(carry, t_in):
            dh, dc, dkap, dw = carry
            (dfeat_t, dphi_up, gates_t, c_prev_t,
             kappa_prev_t, raw_t, m) = t_in
            # residuals may be stored bf16; compute the backward in f32
            gates_t = tuple(g.astype(jnp.float32) for g in gates_t)
            m = m[:, None]

            # upstream cotangents into this step's outputs
            dh = [dh[l] + dfeat_t[:, l * H:(l + 1) * H]
                  for l in range(L)]
            dw_tot = dw + dfeat_t[:, L * H:]
            dkap_tot = dkap

            new_dh = [None] * L
            new_dc = [None] * L
            dgates_out = [None] * L

            # layers L-1 .. 1 (they consume w_n and h_below of step t)
            for l in range(L - 1, 0, -1):
                g = gates_t[l]
                il = _sigmoid(g[:, :H])
                fl = _sigmoid(g[:, H:2 * H])
                zl = jnp.tanh(g[:, 2 * H:3 * H])
                ol = _sigmoid(g[:, 3 * H:])
                clp = fl * c_prev_t[l] + il * zl
                tc = jnp.tanh(clp)
                dhp = m * dh[l]
                dclp = m * dc[l] + dhp * ol * (1 - tc * tc)
                dgl = jnp.concatenate([
                    dclp * zl * il * (1 - il),
                    dclp * c_prev_t[l] * fl * (1 - fl),
                    dclp * il * (1 - zl * zl),
                    dhp * tc * ol * (1 - ol)], axis=-1)
                w_wl, hb_wl, whl = layers[l]
                dw_tot = dw_tot + jnp.dot(dgl, w_wl.T,
                                          preferred_element_type=F32)
                dh[l - 1] = dh[l - 1] + jnp.dot(
                    dgl, hb_wl.T, preferred_element_type=F32)
                new_dh[l] = (1 - m) * dh[l] + jnp.dot(
                    dgl, whl.T, preferred_element_type=F32)
                new_dc[l] = (1 - m) * dc[l] + dclp * fl
                dgates_out[l] = dgl

            # attention backward
            dw_p = m * dw_tot                   # cotangent of w' = phi@enc
            dkap_p = m * dkap_tot               # from the kappa mix
            dphi = (jnp.einsum("be,bue->bu", dw_p, enc,
                               preferred_element_type=F32)
                    + dphi_up) * text_mask
            alpha = jnp.exp(raw_t[:, :K])
            beta = jnp.exp(raw_t[:, K:2 * K])
            kexp = jnp.exp(raw_t[:, 2 * K:])
            kap_p = kappa_prev_t + dims.alignment * kexp
            U = enc.shape[1]
            u = jnp.arange(U, dtype=F32)[None, :, None]
            diff = kap_p[:, None, :] - u                     # (B,U,K)
            s = jnp.exp(-beta[:, None, :] * diff * diff)     # (B,U,K)
            as_ = alpha[:, None, :] * s
            dalpha = jnp.einsum("bu,buk->bk", dphi, s,
                                preferred_element_type=F32)
            dbeta = -jnp.einsum("bu,buk->bk", dphi,
                                as_ * diff * diff,
                                preferred_element_type=F32)
            dkap_p = dkap_p - 2.0 * jnp.einsum(
                "bu,buk->bk", dphi, as_ * beta[:, None, :] * diff,
                preferred_element_type=F32)
            draw = jnp.concatenate(
                [dalpha * alpha, dbeta * beta,
                 dkap_p * dims.alignment * kexp], axis=-1)   # (B,3K)
            dh[0] = dh[0] + jnp.dot(draw, attn_w.T,
                                    preferred_element_type=F32)
            dkap_carry = (1 - m) * dkap_tot + dkap_p

            # layer 0
            g = gates_t[0]
            i0 = _sigmoid(g[:, :H])
            f0 = _sigmoid(g[:, H:2 * H])
            z0 = jnp.tanh(g[:, 2 * H:3 * H])
            o0 = _sigmoid(g[:, 3 * H:])
            c0p = f0 * c_prev_t[0] + i0 * z0
            tc0 = jnp.tanh(c0p)
            dhp0 = m * dh[0]
            dc0p = m * dc[0] + dhp0 * o0 * (1 - tc0 * tc0)
            dg0 = jnp.concatenate([
                dc0p * z0 * i0 * (1 - i0),
                dc0p * c_prev_t[0] * f0 * (1 - f0),
                dc0p * i0 * (1 - z0 * z0),
                dhp0 * tc0 * o0 * (1 - o0)], axis=-1)
            w_w0, _, wh0 = layers[0]
            dw_carry = ((1 - m) * dw_tot
                        + jnp.dot(dg0, w_w0.T,
                                  preferred_element_type=F32))
            new_dh[0] = (1 - m) * dh[0] + jnp.dot(
                dg0, wh0.T, preferred_element_type=F32)
            new_dc[0] = (1 - m) * dc[0] + dc0p * f0
            dgates_out[0] = dg0

            carry = (new_dh, new_dc, dkap_carry, dw_carry)
            return carry, (tuple(dgates_out), draw, dw_p)

        init_carry = ([d_final_hs[l][0] for l in range(L)],
                      [d_final_hs[l][1] for l in range(L)],
                      d_final_kappa, d_final_w)
        xs = (dfeats, dphis, tuple(gates_s), tuple(c_prev),
              kappa_prev, raw_s, mask)
        (dh0, dc0, dkap0, dw0), (dgates, draws, dw_ps) = jax.lax.scan(
            bwd_step, init_carry, xs, reverse=True)

        # ---- post-hoc weight gradients: one GEMM each over T·B rows
        d_layers, dattn_w, dattn_b, denc = posthoc_grads(
            feats, h_prev, w_prev, dgates, draws, dw_ps, phis, enc, L, H)
        # text_mask multiplies phi, whose raw value we did not store;
        # it is data (never differentiated) — zero cotangent
        dtext_mask = jnp.zeros_like(text_mask)
        dmask = jnp.zeros_like(mask)
        dgates_x = tuple(dgates[l] for l in range(L))
        dinit = (tuple((dh0[l], dc0[l]) for l in range(L)), dkap0, dw0)
        dparams_t = (dattn_w, dattn_b, tuple(d_layers))
        return (dparams_t, dgates_x, dmask, denc, dtext_mask, dinit)

    scan_vjp.defvjp(scan_fwd, scan_bwd)
    return scan_vjp
