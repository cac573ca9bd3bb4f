"""Pallas fused decode kernel tests (interpret mode on CPU; the real-chip
run is exercised by bench.py). SURVEY.md §4 "Kernel parity"."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parrot_tpu.config import ModelConfig, SampleConfig
from parrot_tpu.models import Parrot
from parrot_tpu.ops.fused_decode import (fused_decode, prepare_params,
                                          flatten_state, n_weight_arrays)
from parrot_tpu.sample import Sampler


def build(which="MSE", layers=3, **kw):
    cfg = ModelConfig(frame_size=7, vocab_size=9, embed_dim=8,
                      encoder_dim=8, rnn_h_dim=16, decoder_layers=layers,
                      readouts_dim=16, attention_mixtures=2, num_mixtures=2,
                      which_cost=which, **kw)
    model = Parrot(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    return cfg, model, params


def setup_inputs(model, params, B=3, U=6):
    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.integers(1, 9, (B, U)), jnp.int32)
    mask = jnp.ones((B, U))
    enc = model.encode(params, text, mask)
    st = model.init_state(B, U)
    return text, mask, enc, st, flatten_state(st)


def run_fused(model, params, enc, mask, init, T, chunk, is_gmm=False):
    kp = prepare_params(model, params, jnp.zeros((enc.shape[0],), jnp.int32),
                        enc.shape[0], weight_dtype=jnp.float32)
    return fused_decode(kp, enc, mask, init, np.array([0], np.int32),
                        T=T, D=model.D, E=model.E, H=model.H, K=model.K,
                        M=model.cfg.num_mixtures, L=model.L,
                        layer_norm=model.cfg.layer_norm,
                        is_gmm=is_gmm, interpret=True, chunk_steps=chunk)


def reference_chain(model, params, mask, enc, st, T):
    """Plain-JAX sample_step chain (deterministic for MSE heads)."""
    s = st._replace(enc=enc)
    ref = []
    B = enc.shape[0]
    for t in range(T):
        s, x, phi, raw = model.sample_step(
            params, s, mask, jnp.zeros((B,), jnp.int32),
            jax.random.PRNGKey(t))
        ref.append(np.asarray(x))
    return np.stack(ref)


def test_fused_mse_matches_sample_step_exactly():
    """The north-star parity check: fused kernel == plain-JAX step chain
    (MSE head is deterministic so the match is bitwise-tight)."""
    cfg, model, params = build("MSE")
    text, mask, enc, st, init = setup_inputs(model, params)
    T = 6
    s = st._replace(enc=enc)
    ref = []
    for t in range(T):
        s, x, phi, raw = model.sample_step(
            params, s, mask, jnp.zeros((3,), jnp.int32),
            jax.random.PRNGKey(t))
        ref.append(np.asarray(x))
    ref = np.stack(ref)

    frames, kappas = run_fused(model, params, enc, mask, init, T, chunk=3)
    np.testing.assert_allclose(np.asarray(frames), ref, rtol=1e-5, atol=1e-6)
    # kappa trajectory monotone
    k = np.asarray(kappas)
    assert (np.diff(k[:, 0, 0]) > 0).all()


def test_fused_chunking_invariance():
    """chunk_steps must not change the result (state carries across both
    the inner fori_loop and the sequential grid)."""
    cfg, model, params = build("MSE")
    text, mask, enc, st, init = setup_inputs(model, params)
    f2, k2 = run_fused(model, params, enc, mask, init, T=12, chunk=2)
    f6, k6 = run_fused(model, params, enc, mask, init, T=12, chunk=6)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f6),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(k2), np.asarray(k6),
                               rtol=1e-6, atol=1e-7)


def test_fused_rejects_bad_chunking():
    cfg, model, params = build("MSE")
    text, mask, enc, st, init = setup_inputs(model, params)
    with pytest.raises(AssertionError, match="multiple of"):
        run_fused(model, params, enc, mask, init, T=5, chunk=3)


def test_sampler_fused_falls_back_on_cpu():
    """On the CPU test platform the fused path must silently fall back to
    the reference while_loop path and produce identical MSE output."""
    cfg, model, params = build("MSE")
    norm = {"mean": jnp.zeros((7,)), "std": jnp.ones((7,))}
    s = Sampler(model, params, norm,
                SampleConfig(max_steps=8, use_fused_kernel=True))
    text = jnp.ones((2, 4), jnp.int32)
    mask = jnp.ones((2, 4))
    f1, l1, phis = s.generate(text, mask, key=jax.random.PRNGKey(0),
                              return_phis=True)
    f2, l2, none = s.generate(text, mask, key=jax.random.PRNGKey(0),
                              return_phis=False)
    assert jax.default_backend() == "cpu"
    assert none is None or none.shape == phis.shape  # fused returns None
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_fused_any_depth_matches_sample_step():
    """The kernel arg plumbing is depth-generic: L=2 and L=4 must match
    the plain-JAX step chain like L=3 does."""
    for L in (1, 2, 4):
        cfg, model, params = build("MSE", layers=L)
        text, mask, enc, st, init = setup_inputs(model, params)
        ref = reference_chain(model, params, mask, enc, st, T=4)
        frames, _ = run_fused(model, params, enc, mask, init, 4, chunk=2)
        np.testing.assert_allclose(np.asarray(frames), ref,
                                   rtol=1e-5, atol=1e-6, err_msg=f"L={L}")


def test_prepare_params_speaker_folding():
    cfg = ModelConfig(frame_size=7, vocab_size=9, embed_dim=8,
                      encoder_dim=8, rnn_h_dim=16, decoder_layers=3,
                      readouts_dim=16, attention_mixtures=2, num_mixtures=2,
                      use_speaker=True, num_speakers=3, speaker_dim=4)
    model = Parrot(cfg)
    params = model.init_params(jax.random.PRNGKey(1))
    spk = jnp.asarray([0, 2], jnp.int32)
    kp = prepare_params(model, params, spk, 2, weight_dtype=jnp.float32)
    assert len(kp) == n_weight_arrays(3)
    bias1 = kp[3]  # layer-0 order: wx_x, wx_w, wh, bias
    # bias = b + spk_emb @ wx_s for each layer
    emb = model._speaker_vec(params, spk)
    wx = params["dec"][0]["wx"]
    s_w = wx[-cfg.speaker_dim:]
    want = params["dec"][0]["b"][None, :] + emb @ s_w
    np.testing.assert_allclose(np.asarray(bias1), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
    # different speakers -> different biases
    assert np.abs(np.asarray(bias1[0] - bias1[1])).max() > 1e-6


def test_fused_layer_norm_matches_sample_step():
    """LN models run through the kernel too (was a fallback-only config)."""
    cfg, model, params = build("MSE", layer_norm=True)
    text, mask, enc, st, init = setup_inputs(model, params)
    ref = reference_chain(model, params, mask, enc, st, T=4)
    kp = prepare_params(model, params, jnp.zeros((3,), jnp.int32), 3,
                        weight_dtype=jnp.float32)
    assert len(kp) == n_weight_arrays(3, layer_norm=True)
    frames, _ = run_fused(model, params, enc, mask, init, 4, chunk=2)
    np.testing.assert_allclose(np.asarray(frames), ref,
                               rtol=1e-4, atol=1e-5)


def test_fused_emit_attention_phi_matches_reference():
    """emit_attention returns per-step (alpha, beta); phi reconstructed
    outside the kernel must match the plain-JAX step chain's phi — the
    fused serving path can then feed generate.py's attention plots
    (no silent fallback to the while_loop path)."""
    from parrot_tpu.ops.fused_decode import reconstruct_phi

    cfg, model, params = build("MSE")
    text, mask, enc, st, init = setup_inputs(model, params)
    # ragged mask: row 2 has a shorter text -> masking must match too
    mask = mask.at[2, 4:].set(0.0)
    enc = model.encode(params, text, mask)
    init = flatten_state(st._replace(enc=enc))
    T = 6
    s = st._replace(enc=enc)
    ref_phi = []
    for t in range(T):
        s, x, phi, raw = model.sample_step(
            params, s, mask, jnp.zeros((3,), jnp.int32),
            jax.random.PRNGKey(t))
        ref_phi.append(np.asarray(phi))
    ref_phi = np.stack(ref_phi)                       # (T, B, U)

    kp = prepare_params(model, params, jnp.zeros((3,), jnp.int32), 3,
                        weight_dtype=jnp.float32)
    frames, kappas, ab = fused_decode(
        kp, enc, mask, init, np.array([0], np.int32),
        T=T, D=model.D, E=model.E, H=model.H, K=model.K,
        M=model.cfg.num_mixtures, L=model.L, is_gmm=False,
        interpret=True, chunk_steps=3, emit_attention=True)
    got_phi = np.asarray(reconstruct_phi(kappas, ab, mask))
    np.testing.assert_allclose(got_phi, ref_phi, rtol=1e-5, atol=1e-6)
    # emit_attention must not perturb the generation itself
    f_plain, _ = fused_decode(
        kp, enc, mask, init, np.array([0], np.int32),
        T=T, D=model.D, E=model.E, H=model.H, K=model.K,
        M=model.cfg.num_mixtures, L=model.L, is_gmm=False,
        interpret=True, chunk_steps=3)
    np.testing.assert_allclose(np.asarray(frames), np.asarray(f_plain),
                               rtol=1e-6, atol=1e-7)


def test_fused_sharded_serving_matches_unsharded():
    """Multi-chip fused serving: one Pallas kernel per shard under
    shard_map (batch split along 'data', weights replicated) must
    reproduce the single-kernel result — decode has no cross-chip
    dependence, so sharding is pure throughput. 8-device CPU mesh,
    interpret mode, deterministic MSE head, phi included."""
    from parrot_tpu.config import SampleConfig
    from parrot_tpu.parallel import make_mesh

    cfg, model, params = build("MSE")
    B, U = 8, 6
    rng = np.random.default_rng(3)
    text = jnp.asarray(rng.integers(1, 9, (B, U)), jnp.int32)
    mask = jnp.ones((B, U))
    # ragged text lengths: per-row stop logic must survive sharding
    mask = mask.at[5, 4:].set(0.0)
    norm = {"mean": jnp.zeros((model.D,)), "std": jnp.ones((model.D,))}
    scfg = SampleConfig(max_steps=16, stop_threshold=1.1)

    def make(mesh):
        s = Sampler(model, params, norm, scfg, mesh=mesh)
        s._force_interpret = True
        return s

    f1, l1, p1 = make(None).generate(text, mask, return_phis=True)
    f2, l2, p2 = make(make_mesh(8)).generate(text, mask, return_phis=True)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                               rtol=1e-5, atol=1e-6)


def test_fused_sharded_pads_ragged_batch():
    """A final length-bucket smaller than the mesh (B=5 on 8 devices)
    must be padded with empty rows internally and sliced back off."""
    from parrot_tpu.config import SampleConfig
    from parrot_tpu.parallel import make_mesh

    cfg, model, params = build("MSE")
    B, U = 5, 6
    rng = np.random.default_rng(4)
    text = jnp.asarray(rng.integers(1, 9, (B, U)), jnp.int32)
    mask = jnp.ones((B, U))
    norm = {"mean": jnp.zeros((model.D,)), "std": jnp.ones((model.D,))}
    scfg = SampleConfig(max_steps=16, stop_threshold=1.1)

    s0 = Sampler(model, params, norm, scfg)
    s0._force_interpret = True
    f1, l1, p1 = s0.generate(text, mask, return_phis=True)
    s8 = Sampler(model, params, norm, scfg, mesh=make_mesh(8))
    s8._force_interpret = True
    f2, l2, p2 = s8.generate(text, mask, return_phis=True)
    assert f2.shape[0] == B and l2.shape[0] == B and p2.shape[0] == B
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2),
                               rtol=1e-5, atol=1e-6)


def test_fused_sharded_early_stop_matches_unsharded():
    """Per-row stop logic under sharding, with stops that actually fire:
    short texts + stop_threshold < 1 make different rows stop at
    different steps; sharded lengths and frames must match unsharded."""
    from parrot_tpu.config import SampleConfig
    from parrot_tpu.parallel import make_mesh

    cfg, model, params = build("MSE")
    B, U = 8, 8
    rng = np.random.default_rng(7)
    text = jnp.asarray(rng.integers(1, 9, (B, U)), jnp.int32)
    mask = np.ones((B, U), np.float32)
    for r in range(B):  # staggered text lengths -> staggered stops
        mask[r, 2 + (r % 5):] = 0.0
    mask = jnp.asarray(mask)
    norm = {"mean": jnp.zeros((model.D,)), "std": jnp.ones((model.D,))}
    scfg = SampleConfig(max_steps=32, stop_threshold=0.5)

    def make(mesh):
        s = Sampler(model, params, norm, scfg, mesh=mesh)
        s._force_interpret = True
        return s

    f1, l1, _ = make(None).generate(text, mask, return_phis=False)
    f2, l2, _ = make(make_mesh(8)).generate(text, mask, return_phis=False)
    l1, l2 = np.asarray(l1), np.asarray(l2)
    np.testing.assert_array_equal(l1, l2)
    assert len(set(l1.tolist())) > 1, "stops never staggered: weak test"
    assert l1.min() < 32, "no row stopped early: weak test"
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2),
                               rtol=1e-5, atol=1e-6)
