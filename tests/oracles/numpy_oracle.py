"""Pure-NumPy oracle implementations of the model math (SURVEY.md §4).

These are deliberately naive, loop-based, float64 implementations of the
contract in SURVEY.md §3.3 — the ground truth every JAX and Pallas
implementation is checked against.
"""

import numpy as np


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def lstm_step(wx, wh, b, x, h, c):
    """Gate order (i, f, g, o). x: (B, in); h, c: (B, H)."""
    gates = x @ wx + h @ wh + b
    H = h.shape[-1]
    i = sigmoid(gates[:, :H])
    f = sigmoid(gates[:, H:2 * H])
    g = np.tanh(gates[:, 2 * H:3 * H])
    o = sigmoid(gates[:, 3 * H:])
    c_new = f * c + i * g
    h_new = o * np.tanh(c_new)
    return h_new, c_new


def window_step(w_proj, b_proj, h, kappa_prev, enc, enc_mask, alignment=1.0):
    """Graves window attention, one step, looped over batch/positions."""
    B, U, E = enc.shape
    K = kappa_prev.shape[-1]
    raw = h @ w_proj + b_proj
    alpha = np.exp(raw[:, :K])
    beta = np.exp(raw[:, K:2 * K])
    kappa = kappa_prev + alignment * np.exp(raw[:, 2 * K:])
    w = np.zeros((B, E))
    phi_out = np.zeros((B, U))
    for bi in range(B):
        for u in range(U):
            phi = 0.0
            for k in range(K):
                phi += alpha[bi, k] * np.exp(
                    -beta[bi, k] * (kappa[bi, k] - u) ** 2)
            phi *= enc_mask[bi, u]
            phi_out[bi, u] = phi
            w[bi] += phi * enc[bi, u]
    return w, kappa, phi_out


def gmm_nll(x, mu, log_sigma, logit_pi):
    """Looped diagonal-GMM NLL. x: (B, D); mu/ls: (B, M, D); pi: (B, M)."""
    B, M, D = mu.shape
    out = np.zeros((B,))
    for bi in range(B):
        logit = logit_pi[bi] - logit_pi[bi].max()
        log_pi = logit - np.log(np.exp(logit).sum())
        comp = np.zeros((M,))
        for m in range(M):
            ll = 0.0
            for d in range(D):
                s = np.exp(log_sigma[bi, m, d])
                ll += (-0.5 * ((x[bi, d] - mu[bi, m, d]) / s) ** 2
                       - log_sigma[bi, m, d] - 0.5 * np.log(2 * np.pi))
            comp[m] = log_pi[m] + ll
        mx = comp.max()
        out[bi] = -(mx + np.log(np.exp(comp - mx).sum()))
    return out
