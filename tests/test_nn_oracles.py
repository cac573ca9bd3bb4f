"""Numerics-core tests: JAX layers vs pure-NumPy oracles (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parrot_tpu.nn import (
    LSTMCell, lstm_scan, bidirectional_lstm, GravesWindow,
    gmm_nll, gmm_sample, split_gmm_params, Linear, Embedding,
)
from tests.oracles import numpy_oracle as oracle


RNG = np.random.default_rng(0)


def test_lstm_step_matches_oracle():
    B, IN, H = 4, 6, 8
    key = jax.random.PRNGKey(0)
    p = LSTMCell.init(key, IN, H, forget_bias=1.0)
    x = RNG.normal(size=(B, IN)).astype(np.float32)
    h = RNG.normal(size=(B, H)).astype(np.float32)
    c = RNG.normal(size=(B, H)).astype(np.float32)

    h_j, c_j = LSTMCell.step(p, (jnp.array(h), jnp.array(c)), x=jnp.array(x))
    h_o, c_o = oracle.lstm_step(
        np.array(p["wx"]), np.array(p["wh"]), np.array(p["b"]), x, h, c)
    np.testing.assert_allclose(np.array(h_j), h_o, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.array(c_j), c_o, rtol=1e-5, atol=1e-5)


def test_lstm_scan_equals_step_loop_and_respects_mask():
    T, B, IN, H = 7, 3, 5, 8
    key = jax.random.PRNGKey(1)
    p = LSTMCell.init(key, IN, H)
    xs = jnp.array(RNG.normal(size=(T, B, IN)), jnp.float32)
    lengths = np.array([7, 4, 1])
    mask = jnp.array((np.arange(T)[:, None] < lengths[None, :]), jnp.float32)

    hs, (h_f, c_f) = lstm_scan(p, xs, LSTMCell.zero_state(B, H), mask)

    # step-by-step loop
    h = c = jnp.zeros((B, H))
    for t in range(T):
        h_new, c_new = LSTMCell.step(p, (h, c), x=xs[t])
        m = mask[t][:, None]
        h = m * h_new + (1 - m) * h
        c = m * c_new + (1 - m) * c
        np.testing.assert_allclose(np.array(hs[t]), np.array(h),
                                   rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.array(h_f), np.array(h), rtol=1e-5, atol=1e-5)

    # masked steps: final state for example 2 equals state after its 1 step
    hs1, _ = lstm_scan(p, xs[:1], LSTMCell.zero_state(B, H), mask[:1])
    np.testing.assert_allclose(np.array(hs[-1][2]), np.array(hs1[0][2]),
                               rtol=1e-5, atol=1e-5)


def test_bidirectional_backward_equals_reversed_unpadded():
    T, B, IN, H = 6, 2, 4, 8
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    pf = LSTMCell.init(k1, IN, H)
    pb = LSTMCell.init(k2, IN, H)
    xs = jnp.array(RNG.normal(size=(T, B, IN)), jnp.float32)
    lengths = np.array([6, 3])
    mask = jnp.array((np.arange(T)[:, None] < lengths[None, :]), jnp.float32)

    out = bidirectional_lstm(pf, pb, xs, mask)  # (T, B, 2H)

    # Oracle for example 1 (length 3): run backward LSTM on reversed
    # unpadded sequence, compare at valid positions.
    xs1 = np.array(xs[:3, 1])  # (3, IN)
    h = c = np.zeros((1, H))
    back = []
    for t in range(2, -1, -1):
        h, c = oracle.lstm_step(np.array(pb["wx"]), np.array(pb["wh"]),
                                np.array(pb["b"]), xs1[t:t + 1], h, c)
        back.append(h[0])
    back = back[::-1]  # back[t] = backward state at position t
    for t in range(3):
        np.testing.assert_allclose(np.array(out[t, 1, H:]), back[t],
                                   rtol=1e-5, atol=1e-5)


def test_window_attention_matches_oracle():
    B, U, E, H, K = 3, 11, 6, 8, 4
    key = jax.random.PRNGKey(3)
    p = GravesWindow.init(key, H, K)
    h = jnp.array(RNG.normal(size=(B, H)), jnp.float32)
    kappa = jnp.abs(jnp.array(RNG.normal(size=(B, K)), jnp.float32))
    enc = jnp.array(RNG.normal(size=(B, U, E)), jnp.float32)
    lengths = np.array([11, 7, 2])
    mask = jnp.array((np.arange(U)[None, :] < lengths[:, None]), jnp.float32)

    w, kap, phi = GravesWindow.step(p, h, kappa, enc, mask, alignment=0.5)
    w_o, kap_o, phi_o = oracle.window_step(
        np.array(p["proj"]["w"]), np.array(p["proj"]["b"]),
        np.array(h), np.array(kappa), np.array(enc), np.array(mask),
        alignment=0.5)
    np.testing.assert_allclose(np.array(kap), kap_o, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.array(phi), phi_o, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.array(w), w_o, rtol=1e-4, atol=1e-4)


def test_kappa_monotone():
    B, U, E, H, K = 2, 5, 4, 6, 3
    p = GravesWindow.init(jax.random.PRNGKey(4), H, K)
    enc = jnp.zeros((B, U, E))
    mask = jnp.ones((B, U))
    kappa = jnp.zeros((B, K))
    for i in range(5):
        h = jnp.array(RNG.normal(size=(B, H)), jnp.float32)
        _, kappa_new, _ = GravesWindow.step(p, h, kappa, enc, mask)
        assert np.all(np.array(kappa_new) > np.array(kappa))
        kappa = kappa_new


def test_gmm_nll_matches_oracle_and_scipy():
    B, M, D = 4, 3, 5
    x = RNG.normal(size=(B, D))
    mu = RNG.normal(size=(B, M, D))
    log_sigma = RNG.normal(size=(B, M, D)) * 0.3
    logit_pi = RNG.normal(size=(B, M))

    nll_j = np.array(gmm_nll(jnp.array(x, jnp.float32),
                             jnp.array(mu, jnp.float32),
                             jnp.array(log_sigma, jnp.float32),
                             jnp.array(logit_pi, jnp.float32)))
    nll_o = oracle.gmm_nll(x, mu, log_sigma, logit_pi)
    np.testing.assert_allclose(nll_j, nll_o, rtol=1e-4, atol=1e-4)

    # cross-check against scipy for one example
    from scipy.stats import norm
    log_pi = logit_pi[0] - logit_pi[0].max()
    pi = np.exp(log_pi) / np.exp(log_pi).sum()
    lik = sum(pi[m] * np.prod(norm.pdf(x[0], mu[0, m], np.exp(log_sigma[0, m])))
              for m in range(M))
    np.testing.assert_allclose(nll_j[0], -np.log(lik), rtol=1e-4)


def test_gmm_sample_bias_shrinks_spread():
    B, M, D = 512, 2, 4
    key = jax.random.PRNGKey(5)
    mu = jnp.zeros((B, M, D))
    log_sigma = jnp.zeros((B, M, D))  # sigma = 1
    logit_pi = jnp.zeros((B, M))
    s0 = np.array(gmm_sample(key, mu, log_sigma, logit_pi, bias=0.0))
    s3 = np.array(gmm_sample(key, mu, log_sigma, logit_pi, bias=3.0))
    assert s3.std() < 0.2 * s0.std()  # exp(-3) ~ 0.05
    assert abs(s0.std() - 1.0) < 0.1


def test_split_gmm_params_shapes_and_clamp():
    B, M, D = 2, 3, 4
    raw = jnp.array(RNG.normal(size=(B, 2 * M * D + M)) * 10, jnp.float32)
    mu, ls, pi = split_gmm_params(raw, D, M, min_log_sigma=-2.0)
    assert mu.shape == (B, M, D) and ls.shape == (B, M, D) and pi.shape == (B, M)
    assert float(ls.min()) >= -2.0
    # mu must be the first M*D entries, untouched
    np.testing.assert_allclose(np.array(mu).reshape(B, -1),
                               np.array(raw[:, :M * D]))


def test_linear_embedding():
    p = Linear.init(jax.random.PRNGKey(6), 4, 3)
    x = jnp.array(RNG.normal(size=(5, 4)), jnp.float32)
    y = Linear.apply(p, x)
    np.testing.assert_allclose(np.array(y),
                               np.array(x) @ np.array(p["w"]) + np.array(p["b"]),
                               rtol=1e-5, atol=1e-5)
    pe = Embedding.init(jax.random.PRNGKey(7), 10, 3)
    ids = jnp.array([[1, 2], [9, 0]])
    emb = Embedding.apply(pe, ids)
    assert emb.shape == (2, 2, 3)
    np.testing.assert_allclose(np.array(emb[0, 1]), np.array(pe["table"][2]))


def test_bf16_matmul_forward_and_grads():
    """nn.core.bf16_matmul: forward equals the bf16-quantized reference
    matmul exactly; custom_vjp grads match autodiff-of-the-forward to
    bf16 cotangent rounding (the wrapper's only extra rounding is the
    dy -> bf16 cast that keeps the transpose GEMMs on the bf16 MXU
    path). 3D batch input exercises the dW reshape."""
    from parrot_tpu.nn.core import bf16_matmul
    rng = np.random.default_rng(11)
    x = jnp.array(rng.normal(size=(3, 5, 8)), jnp.float32)
    w = jnp.array(rng.normal(size=(8, 6)), jnp.float32)
    y = bf16_matmul(x, w)
    assert y.dtype == jnp.float32
    ref = np.array(x, np.float32).astype(jnp.bfloat16).astype(np.float32)
    refw = np.array(w, np.float32).astype(jnp.bfloat16).astype(np.float32)
    np.testing.assert_allclose(np.array(y),
                               np.einsum("tbi,io->tbo", ref, refw),
                               rtol=2e-2, atol=2e-2)

    def f_custom(x_, w_):
        return (bf16_matmul(x_, w_) * jnp.arange(1.0, 7.0)).sum()

    def f_plain(x_, w_):
        yy = jnp.dot(x_.astype(jnp.bfloat16), w_.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
        return (yy * jnp.arange(1.0, 7.0)).sum()

    gx, gw = jax.grad(f_custom, argnums=(0, 1))(x, w)
    px, pw = jax.grad(f_plain, argnums=(0, 1))(x, w)
    assert gx.dtype == jnp.float32 and gw.dtype == jnp.float32
    np.testing.assert_allclose(np.array(gx), np.array(px),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.array(gw), np.array(pw),
                               rtol=2e-2, atol=2e-2)
