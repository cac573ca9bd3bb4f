"""Parrot model tests: cost, TBPTT carry exactness, scan/step parity,
speaker conditioning, gradient health (SURVEY.md §4)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parrot_tpu.config import ModelConfig
from parrot_tpu.data.pipeline import Batch
from parrot_tpu.models import Parrot


def tiny_cfg(**kw):
    base = dict(frame_size=7, vocab_size=10, embed_dim=6, encoder_dim=5,
                rnn_h_dim=12, decoder_layers=3, readouts_dim=9,
                attention_mixtures=3, num_mixtures=2, which_cost="GMM")
    base.update(kw)
    return ModelConfig(**base)


def make_batch(rng, B=3, S=8, D=7, U=6, start=1.0, vocab=10, prev=None):
    feats = rng.normal(size=(B, S, D)).astype(np.float32)
    fmask = np.ones((B, S), np.float32)
    fmask[1, 5:] = 0  # one short utterance
    text = rng.integers(1, vocab, size=(B, U)).astype(np.int32)
    tmask = np.ones((B, U), np.float32)
    tmask[2, 4:] = 0
    return Batch(
        features=jnp.array(feats), features_mask=jnp.array(fmask),
        prev_frame=jnp.array(prev if prev is not None
                             else np.zeros((B, D), np.float32)),
        text=jnp.array(text), text_mask=jnp.array(tmask),
        speaker=jnp.zeros((B,), jnp.int32),
        start_flag=jnp.float32(start))


def norm_id(D):
    return {"mean": jnp.zeros((D,)), "std": jnp.ones((D,))}


@pytest.fixture(scope="module")
def model_and_params():
    cfg = tiny_cfg()
    model = Parrot(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


def test_cost_runs_and_is_finite(model_and_params):
    model, params = model_and_params
    rng = np.random.default_rng(0)
    batch = make_batch(rng)
    loss, state, metrics = model.compute_cost(params, norm_id(7), batch, None)
    assert np.isfinite(float(loss))
    assert state.kappa.shape == (3, 3)
    assert float(metrics["frames"]) == 3 * 8 - 3


@pytest.mark.slow
def test_tbptt_two_segments_equals_full(model_and_params):
    """Core TBPTT contract: full-sequence cost == carried two-segment cost
    (SURVEY.md §7 hard part 4)."""
    model, params = model_and_params
    rng = np.random.default_rng(1)
    B, S, D, U = 3, 8, 7, 6
    full = make_batch(rng, B=B, S=S, D=D, U=U, start=1.0)

    loss_full, state_full, m_full = model.compute_cost(
        params, norm_id(D), full, None)

    half = S // 2
    seg1 = Batch(full.features[:, :half], full.features_mask[:, :half],
                 full.prev_frame, full.text, full.text_mask, full.speaker,
                 jnp.float32(1.0))
    seg2 = Batch(full.features[:, half:], full.features_mask[:, half:],
                 np.asarray(full.features[:, half - 1]), full.text,
                 full.text_mask, full.speaker, jnp.float32(0.0))
    l1, st1, m1 = model.compute_cost(params, norm_id(D), seg1, None)
    l2, st2, m2 = model.compute_cost(params, norm_id(D), seg2, st1)

    total_seg = float(l1) * float(m1["frames"]) + float(l2) * float(m2["frames"])
    total_full = float(loss_full) * float(m_full["frames"])
    np.testing.assert_allclose(total_seg, total_full, rtol=1e-4)
    np.testing.assert_allclose(np.array(st2.kappa), np.array(state_full.kappa),
                               rtol=1e-5, atol=1e-6)
    for (h2, c2), (hf, cf) in zip(st2.hs, state_full.hs):
        np.testing.assert_allclose(np.array(h2), np.array(hf),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_start_flag_resets_state(model_and_params):
    model, params = model_and_params
    rng = np.random.default_rng(2)
    b1 = make_batch(rng, start=1.0)
    _, dirty, _ = model.compute_cost(params, norm_id(7), b1, None)
    b2 = make_batch(rng, start=1.0)
    loss_fresh, st_fresh, _ = model.compute_cost(params, norm_id(7), b2, None)
    loss_dirty, st_dirty, _ = model.compute_cost(params, norm_id(7), b2, dirty)
    np.testing.assert_allclose(float(loss_fresh), float(loss_dirty), rtol=1e-5)
    np.testing.assert_allclose(np.array(st_fresh.kappa),
                               np.array(st_dirty.kappa), rtol=1e-5)


@pytest.mark.slow
def test_scan_matches_stepwise_sample_step(model_and_params):
    """Pallas-style parity harness: the training scan and the generation
    step function must compute identical head outputs when fed the same
    inputs (teacher-forced)."""
    model, params = model_and_params
    cfg = model.cfg
    rng = np.random.default_rng(3)
    B, S, D, U = 3, 5, 7, 6
    batch = make_batch(rng, B=B, S=S, D=D, U=U)

    # scan path (mask all ones for clean comparison)
    b = batch._replace(features_mask=jnp.ones((B, S)))
    xn = b.features  # norm is identity
    x_tgt = xn.transpose(1, 0, 2)
    x_in = jnp.concatenate([jnp.zeros((1, B, D)), x_tgt[:-1]], 0)
    state0 = model.init_state(B, U)
    enc = model.encode(params, b.text, b.text_mask)
    state0 = state0._replace(enc=enc)
    raw_scan, st_scan, phis = model.scan_decoder(
        params, state0, x_in, jnp.ones((S, B)), b.text_mask, None)

    # step path: force x_last to the teacher-forced input each step
    st = state0
    for t in range(S):
        st = st._replace(x_last=x_in[t])
        st, x, phi, raw = model.sample_step(
            params, st, b.text_mask, b.speaker, jax.random.PRNGKey(t))
        np.testing.assert_allclose(np.array(raw), np.array(raw_scan[t]),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_speaker_conditioning_changes_output():
    cfg = tiny_cfg(use_speaker=True, num_speakers=4, speaker_dim=5)
    model = Parrot(cfg)
    params = model.init_params(jax.random.PRNGKey(1))
    rng = np.random.default_rng(4)
    batch = make_batch(rng)
    l0, _, _ = model.compute_cost(params, norm_id(7), batch, None)
    batch2 = batch._replace(speaker=jnp.ones((3,), jnp.int32))
    l1, _, _ = model.compute_cost(params, norm_id(7), batch2, None)
    assert np.isfinite(float(l0)) and np.isfinite(float(l1))
    assert abs(float(l0) - float(l1)) > 1e-6


@pytest.mark.slow
def test_mse_cost_path():
    cfg = tiny_cfg(which_cost="MSE")
    model = Parrot(cfg)
    params = model.init_params(jax.random.PRNGKey(2))
    rng = np.random.default_rng(5)
    batch = make_batch(rng)
    loss, _, _ = model.compute_cost(params, norm_id(7), batch, None)
    assert np.isfinite(float(loss)) and float(loss) > 0


@pytest.mark.slow
def test_grads_finite_and_nonzero(model_and_params):
    model, params = model_and_params
    rng = np.random.default_rng(6)
    batch = make_batch(rng)

    def loss_fn(p):
        l, _, _ = model.compute_cost(p, norm_id(7), batch, None)
        return l

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree.leaves(g)
    assert all(bool(jnp.isfinite(x).all()) for x in leaves)
    # every major component gets gradient signal
    for name in ["embed", "enc_fwd", "attn", "readout", "head"]:
        sub = jax.tree.leaves(g[name])
        assert any(float(jnp.abs(x).max()) > 0 for x in sub), name


@pytest.mark.slow
def test_normalization_applied_on_device(model_and_params):
    model, params = model_and_params
    rng = np.random.default_rng(7)
    batch = make_batch(rng)
    # shifting features and mean identically must leave the loss unchanged
    shift = 5.0
    norm1 = {"mean": jnp.zeros((7,)), "std": jnp.ones((7,))}
    norm2 = {"mean": jnp.full((7,), shift), "std": jnp.ones((7,))}
    batch2 = batch._replace(features=batch.features + shift,
                            prev_frame=batch.prev_frame + shift)
    l1, _, _ = model.compute_cost(params, norm1, batch, None)
    l2, _, _ = model.compute_cost(params, norm2, batch2, None)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-4)


@pytest.mark.slow
def test_stacked_encoder_layers():
    cfg = tiny_cfg(encoder_layers=2)
    model = Parrot(cfg)
    params = model.init_params(jax.random.PRNGKey(3))
    assert len(params["enc_fwd"]) == 2
    rng = np.random.default_rng(8)
    batch = make_batch(rng)
    loss, state, _ = model.compute_cost(params, norm_id(7), batch, None)
    assert np.isfinite(float(loss))
    # gradient reaches both encoder levels
    g = jax.grad(lambda p: model.compute_cost(p, norm_id(7), batch, None)[0])(
        params)
    for l in range(2):
        assert max(float(jnp.abs(x).max())
                   for x in jax.tree.leaves(g["enc_fwd"][l])) > 0


@pytest.mark.slow
def test_remat_scan_matches_plain():
    """remat_scan trades memory for recompute; loss and grads must be
    identical to the plain scan."""
    rng = np.random.default_rng(11)
    batch = make_batch(rng)
    outs = []
    for remat in (False, True):
        # pin f32 residuals: this test isolates the remat knob, and the
        # bf16 default perturbs grads ~1e-3 relative (covered by
        # test_split_backward_grad_parity)
        cfg = tiny_cfg(remat_scan=remat, scan_residual_dtype="float32")
        model = Parrot(cfg)
        params = model.init_params(jax.random.PRNGKey(7))
        loss, g = jax.value_and_grad(
            lambda p: model.compute_cost(p, norm_id(7), batch, None)[0])(
            params)
        outs.append((float(loss), g))
    np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=1e-6)
    for a, b in zip(jax.tree.leaves(outs[0][1]), jax.tree.leaves(outs[1][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


@pytest.mark.slow
def test_stacked_scan_matches_plain():
    """stacked_scan fuses each layer's scan-body dots into one GEMM
    against the row-stacked weights; loss and grads must match the
    plain scan (bit-identical on CPU, f32 tolerance kept anyway)."""
    rng = np.random.default_rng(12)
    batch = make_batch(rng)
    outs = []
    for stacked in (False, True):
        for ln in (False, True):
            cfg = tiny_cfg(stacked_scan=stacked, layer_norm=ln,
                           use_speaker=True, num_speakers=3, speaker_dim=4,
                           scan_residual_dtype="float32")
            model = Parrot(cfg)
            params = model.init_params(jax.random.PRNGKey(7))
            loss, g = jax.value_and_grad(
                lambda p: model.compute_cost(p, norm_id(7), batch,
                                             None)[0])(params)
            outs.append((float(loss), g))
    for k in (0, 1):  # ln off/on
        a, b = outs[k], outs[2 + k]
        np.testing.assert_allclose(a[0], b[0], rtol=1e-6)
        for x, y in zip(jax.tree.leaves(a[1]), jax.tree.leaves(b[1])):
            # different GEMM accumulation order: f32 roundoff on grads
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_layer_norm_paths():
    """layer_norm=True exercises the LN branches in cells and encoder:
    cost + grads finite, sampler falls back off the fused kernel."""
    cfg = tiny_cfg(layer_norm=True)
    model = Parrot(cfg)
    params = model.init_params(jax.random.PRNGKey(5))
    assert "ln_g" in params["dec"][0]
    rng = np.random.default_rng(12)
    batch = make_batch(rng)
    loss, g = jax.value_and_grad(
        lambda p: model.compute_cost(p, norm_id(7), batch, None)[0])(params)
    assert np.isfinite(float(loss))
    assert all(bool(jnp.isfinite(x).all()) for x in jax.tree.leaves(g))
    # LN params receive gradient
    assert float(jnp.abs(g["dec"][0]["ln_g"]["g"]).max()) > 0
    # generation path (sample_step) also handles LN
    st = model.init_state(3, 6)
    st = st._replace(enc=model.encode(params, batch.text, batch.text_mask))
    st2, x, phi, raw = model.sample_step(params, st, batch.text_mask,
                                         batch.speaker, jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(x)).all()


@pytest.mark.slow
def test_scan_unroll_equivalence():
    rng = np.random.default_rng(13)
    batch = make_batch(rng)
    losses = []
    for unroll in (1, 3):
        cfg = tiny_cfg(scan_unroll=unroll)
        model = Parrot(cfg)
        params = model.init_params(jax.random.PRNGKey(9))
        loss, _, _ = model.compute_cost(params, norm_id(7), batch, None)
        losses.append(float(loss))
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)


@pytest.mark.slow
def test_bf16_streaming_knobs_grad_parity():
    """scan_weight_dtype / scan_enc_dtype = bfloat16 stream materialized
    bf16 copies through the scan (a train-step HBM-traffic lever,
    docs/PERFORMANCE.md). The math must stay the same computation to
    bf16 rounding: loss and every gradient within ~1% of the f32 run,
    and the carried state's enc must stay f32."""
    rng = np.random.default_rng(0)
    batch = make_batch(rng)
    norm = norm_id(7)

    def lossg(cfg):
        m = Parrot(cfg)
        p = m.init_params(jax.random.PRNGKey(0))
        f = lambda q: m.compute_cost(q, norm, batch, None)[0]
        return jax.jit(jax.value_and_grad(f))(p)

    l0, g0 = lossg(tiny_cfg())
    for kw in ({"scan_weight_dtype": "bfloat16"},
               {"scan_enc_dtype": "bfloat16"},
               {"head_dtype": "bfloat16"},
               {"scan_weight_dtype": "bfloat16",
                "scan_enc_dtype": "bfloat16",
                "head_dtype": "bfloat16"}):
        l1, g1 = lossg(tiny_cfg(**kw))
        assert abs(float(l1) - float(l0)) < 1e-2 * abs(float(l0)), kw
        rel = jax.tree.map(
            lambda a, b: float(np.max(np.abs(a - b))
                               / (np.max(np.abs(a)) + 1e-9)), g0, g1)
        worst = max(jax.tree.leaves(rel))
        assert worst < 0.05, (kw, worst)

    m = Parrot(tiny_cfg(scan_weight_dtype="bfloat16",
                        scan_enc_dtype="bfloat16"))
    p = m.init_params(jax.random.PRNGKey(0))
    _, st, _ = m.compute_cost(p, norm, batch, None)
    assert st.enc.dtype == jnp.float32


@pytest.mark.slow
def test_split_backward_grad_parity():
    """ModelConfig.split_backward (hand-written decoder-scan + encoder
    VJPs, models/scan_vjp.py + nn/recurrent.lstm_scan_split) and
    remat_head must reproduce the autodiff gradients exactly (same
    math, f32 reduction-order differences only) with a bit-identical
    forward, including masked rows, speaker conditioning, carried
    TBPTT state, and a 2-layer encoder."""
    import dataclasses
    rng = np.random.default_rng(3)
    batch = make_batch(rng, start=0.0)
    norm = norm_id(7)
    base = tiny_cfg(use_speaker=True, num_speakers=3, speaker_dim=4,
                    encoder_layers=2)

    def run(cfg):
        m = Parrot(cfg)
        p = m.init_params(jax.random.PRNGKey(0))
        st = m.init_state(3, 6)
        st = st._replace(kappa=st.kappa + 0.3,
                         w=st.w + 0.1,
                         x_last=st.x_last + 0.05)
        def f(q):
            loss, ns, _ = m.compute_cost(q, norm, batch, st)
            return loss, ns
        (loss, ns), g = jax.jit(
            jax.value_and_grad(f, has_aux=True))(p)
        return loss, ns, g

    base = dataclasses.replace(base, split_backward=False)
    l0, s0, g0 = run(base)
    # (strict f32 residuals for the 1e-5 check; the bf16-residual
    # default is checked at its own tolerance below)
    for kw in ({"split_backward": True,
                "scan_residual_dtype": "float32"},
               {"split_backward": True, "scan_residual_dtype": "float32",
                "remat_head": True}):
        l1, s1, g1 = run(dataclasses.replace(base, **kw))
        assert float(l1) == float(l0), kw   # forward bit-identical
        for a, b in zip(jax.tree.leaves(s0), jax.tree.leaves(s1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        rel = jax.tree.map(
            lambda a, b: float(np.max(np.abs(a - b))
                               / (np.max(np.abs(a)) + 1e-12)), g0, g1)
        worst = max(jax.tree.leaves(rel))
        assert worst < 1e-5, (kw, worst)

    # default mode: bf16 gate residuals — forward still bit-identical,
    # grads within bf16 rounding of autodiff
    l2, s2, g2 = run(dataclasses.replace(base, split_backward=True,
                                         scan_residual_dtype="bfloat16"))
    assert float(l2) == float(l0)
    for a, b in zip(jax.tree.leaves(s0), jax.tree.leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    rel2 = jax.tree.map(
        lambda a, b: float(np.max(np.abs(a - b))
                           / (np.max(np.abs(a)) + 1e-12)), g0, g2)
    assert max(jax.tree.leaves(rel2)) < 0.03
