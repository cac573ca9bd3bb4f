"""Distribution parity of the IN-KERNEL GMM sampler (interpret mode).

The fused kernel samples the MDN head with its own plumbing (Gumbel-max
categorical + selection matmuls + Box-Muller normal + biased
transform). The round-1 tests only proved determinism/finiteness — a
sign or scale error in that plumbing would have passed. Via the
fixed-head trick (tests/gmm_stats.py) every kernel step draws an i.i.d.
sample from a KNOWN mixture; component frequencies and per-component
moments are asserted against the analytic values, and nn/mdn.gmm_sample
is held to the same bounds (so the two samplers agree with the
distribution and with each other). Covers bias=0 and bias=1
(sigma -> sigma*e^-b, logits -> logits*(1+b), BASELINE.json:9).

The TPU interpreter stubs prng_random_bits to zeros on CPU, so these
tests inject host uniforms through the kernel's test hook — everything
downstream of the raw bits runs as the kernel code. The hardware PRNG
itself (plus this same statistical check) runs on-chip in
scripts/tpu_checks.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gmm_stats import (CENTERS, LOG_SIGMA, LOGITS, M, check_mixture_stats,
                       draw_kernel_samples)
from parrot_tpu.nn.mdn import gmm_sample


def _host_uniforms(T=256, B=16, D=7, seed=7):
    return np.random.default_rng(seed).uniform(
        1e-7, 1.0 - 1e-7, size=(T, B, M + 2 * D)).astype(np.float32)


@pytest.mark.slow
@pytest.mark.parametrize("bias", [0.0, 1.0])
def test_kernel_gmm_sampling_distribution(bias):
    samples = draw_kernel_samples(bias, uniforms=_host_uniforms(),
                                  interpret=True)
    ok_f, ok_m, ok_s, detail = check_mixture_stats(samples, bias)
    assert ok_f and ok_m and ok_s, f"kernel(bias={bias}): {detail}"


@pytest.mark.parametrize("bias", [0.0, 1.0])
def test_mdn_gmm_sample_distribution(bias):
    """The plain-path sampler must satisfy the same analytic bounds, so
    the kernel and nn/mdn.gmm_sample agree with each other too."""
    D = 7
    N = 4096
    mu = jnp.asarray(np.repeat(CENTERS, D).reshape(1, M, D)
                     ).repeat(N, axis=0)
    ls = jnp.full((N, M, D), LOG_SIGMA)
    logits = jnp.asarray(LOGITS)[None].repeat(N, axis=0)
    x = gmm_sample(jax.random.PRNGKey(11), mu, ls, logits, bias=bias)
    ok_f, ok_m, ok_s, detail = check_mixture_stats(np.asarray(x), bias)
    assert ok_f and ok_m and ok_s, f"mdn(bias={bias}): {detail}"
