"""Shared fixed-head GMM distribution machinery.

Used by tests/test_gmm_distribution.py (CPU, injected uniforms) AND
scripts/tpu_checks.py (real chip, hardware PRNG) so the mixture
definition, the fixed-head construction, and the statistical bounds
live in exactly one place.

The trick: zero the output head's weights and pin its BIAS to fixed GMM
parameters — every decode step then draws an i.i.d. sample from a known
mixture regardless of the recurrent dynamics, turning T*B generated
frames into T*B samples for frequency/moment tests.
"""

import jax
import numpy as np

M = 3
CENTERS = np.array([-20.0, 0.0, 20.0], np.float32)   # component means
LOG_SIGMA = np.float32(np.log(0.5))                  # sigma = 0.5
LOGITS = np.array([0.0, 0.8, -0.4], np.float32)


def fixed_head_model(decoder_layers=2):
    """Tiny GMM Parrot whose head always emits the fixed mixture."""
    import jax.numpy as jnp
    from parrot_tpu.config import ModelConfig
    from parrot_tpu.models import Parrot

    cfg = ModelConfig(frame_size=7, vocab_size=9, embed_dim=8,
                      encoder_dim=8, rnn_h_dim=16,
                      decoder_layers=decoder_layers,
                      readouts_dim=16, attention_mixtures=2,
                      num_mixtures=M, which_cost="GMM")
    model = Parrot(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    D = cfg.frame_size
    raw0 = np.zeros((model.head_dim,), np.float32)
    raw0[:M * D] = np.repeat(CENTERS, D)              # mu
    raw0[M * D:2 * M * D] = LOG_SIGMA                 # log sigma
    raw0[2 * M * D:] = LOGITS                         # pi logits
    params["head"]["w"] = jnp.zeros_like(params["head"]["w"])
    params["head"]["b"] = jnp.asarray(raw0)
    return cfg, model, params


def draw_kernel_samples(bias, T=256, B=16, seed=7, uniforms=None,
                        interpret=False):
    """Run the fused kernel on a fixed-head model and return the
    generated frames flattened to (T*B, D) i.i.d. samples.

    uniforms: host-injected (T, B, M+2D) uniforms (CPU interpret runs —
    the TPU interpreter stubs prng_random_bits); None uses the real
    hardware PRNG (scripts/tpu_checks.py)."""
    import jax.numpy as jnp
    from parrot_tpu.ops.fused_decode import (fused_decode, flatten_state,
                                             prepare_params)

    cfg, model, params = fixed_head_model()
    rng = np.random.default_rng(0)
    U = 6
    text = jnp.asarray(rng.integers(1, 9, (B, U)), jnp.int32)
    mask = jnp.ones((B, U))

    # one jitted pre-stage (eager op-by-op dispatch is pathologically
    # slow over the axon TPU tunnel)
    @jax.jit
    def pre(params, text, mask):
        enc = model.encode(params, text, mask)
        kp = prepare_params(model, params, jnp.zeros((B,), jnp.int32), B,
                            weight_dtype=jnp.float32)
        return enc, kp, flatten_state(model.init_state(B, U))

    enc, kp, init = pre(params, text, mask)
    frames, _ = fused_decode(
        kp, enc, mask, init, np.array([seed], np.int32),
        None if uniforms is None else jnp.asarray(uniforms),
        T=T, D=model.D, E=model.E, H=model.H, K=model.K, M=M, L=model.L,
        bias=bias, is_gmm=True, interpret=interpret, chunk_steps=64)
    return np.asarray(frames).reshape(-1, model.D)


def check_mixture_stats(samples, bias, nsigma=4.0, std_slack=0.02):
    """samples (N, D) drawn under sampling bias `bias`. Returns
    (ok_freq, ok_mean, ok_std, detail): per-component frequencies vs
    softmax(logits*(1+b)) within nsigma binomial bounds, pooled means
    within nsigma*sigma_eff/sqrt(n), stds within relative
    nsigma/sqrt(2n) + std_slack of sigma*e^-b."""
    n = samples.shape[0]
    probs = np.exp(LOGITS * (1.0 + bias))
    probs /= probs.sum()
    sigma_eff = np.exp(LOG_SIGMA) * np.exp(-bias)
    # classify by nearest center (separation 40*sigma: exact w.h.p.)
    comp = np.abs(samples.mean(-1, keepdims=True) - CENTERS).argmin(-1)
    ok_freq = ok_mean = ok_std = True
    detail = []
    for m in range(M):
        sel = samples[comp == m]
        se = np.sqrt(probs[m] * (1 - probs[m]) / n)
        ok_freq &= abs(sel.shape[0] / n - probs[m]) < nsigma * se + 1e-9
        vals = sel.ravel()
        ok_mean &= abs(vals.mean() - CENTERS[m]) < \
            nsigma * sigma_eff / np.sqrt(max(vals.size, 1))
        ok_std &= abs(vals.std() / sigma_eff - 1.0) < \
            nsigma / np.sqrt(max(2 * vals.size, 1)) + std_slack
        detail.append(f"m{m}: p={sel.shape[0] / n:.3f}/{probs[m]:.3f}"
                      f" mu={vals.mean():+.2f} sd={vals.std():.3f}")
    return ok_freq, ok_mean, ok_std, "; ".join(detail)
