"""Parity tests for the fused Pallas training scan
(parrot_tpu/ops/fused_train_scan.py) against the lax.scan split path
(models/scan_vjp.py) — interpret mode on CPU; the on-chip leg lives in
scripts/tpu_checks.py."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from parrot_tpu.models.scan_vjp import make_decoder_scan
from parrot_tpu.ops.fused_train_scan import make_pallas_decoder_scan


def _problem(L, T, seed=0, H=8, K=3, E=6, U=7, B=4):
    rng = np.random.RandomState(seed)
    f = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.3)
    layers = tuple((f(E, 4 * H), f(H, 4 * H) if l else None, f(H, 4 * H))
                   for l in range(L))
    params_t = (f(H, 3 * K), f(3 * K), layers)
    gates_x = tuple(f(T, B, 4 * H) for _ in range(L))
    mask = jnp.asarray((rng.rand(T, B) > 0.2).astype(np.float32))
    enc = f(B, U, E)
    text_mask = jnp.asarray((rng.rand(B, U) > 0.1).astype(np.float32))
    init = (tuple((f(B, H), f(B, H)) for _ in range(L)), f(B, K),
            f(B, E))
    dims = dict(L=L, H=H, K=K, E=E)
    return params_t, gates_x, mask, enc, text_mask, init, dims


def _loss(fn, mask, text_mask):
    def go(params_t, gates_x, enc, init):
        feats, phis, carry = fn(params_t, gates_x, mask, enc, text_mask,
                                init)
        w = jnp.cos(jnp.arange(feats.size, dtype=jnp.float32)
                    .reshape(feats.shape) * 0.01)
        return (jnp.sum(feats * w) + jnp.sum(phis * 0.3)
                + sum(jnp.sum(x * 0.1) for x in jax.tree.leaves(carry)))
    return go


@pytest.mark.parametrize("L,T,chunk", [
    pytest.param(3, 6, 2, marks=pytest.mark.slow),
    pytest.param(3, 5, 2, marks=pytest.mark.slow),
    pytest.param(1, 7, 4, marks=pytest.mark.slow),
    (2, 6, 3),  # the fast-tier representative: L=2, T % chunk != 0
])
def test_pallas_scan_matches_split(L, T, chunk):
    """Forward values, final carry, and every input gradient match the
    lax.scan split path (f32 residuals) — including T not divisible by
    the chunk (masked zero-padding) and L=1."""
    params_t, gates_x, mask, enc, text_mask, init, d = _problem(L, T)
    ref = make_decoder_scan(d["L"], d["H"], d["K"], d["E"], 0.5)
    pal = make_pallas_decoder_scan(d["L"], d["H"], d["K"], d["E"], 0.5,
                                   chunk=chunk, interpret=True)
    r = ref(params_t, gates_x, mask, enc, text_mask, init)
    p = pal(params_t, gates_x, mask, enc, text_mask, init)
    for a, b in zip(jax.tree.leaves(r), jax.tree.leaves(p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-6)
    gr = jax.grad(_loss(ref, mask, text_mask), argnums=(0, 1, 2, 3))(
        params_t, gates_x, enc, init)
    gp = jax.grad(_loss(pal, mask, text_mask), argnums=(0, 1, 2, 3))(
        params_t, gates_x, enc, init)
    for a, b in zip(jax.tree.leaves(gr), jax.tree.leaves(gp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5)


def test_pallas_scan_bf16_residuals_close():
    """bf16 residual/gradient streams stay within the documented ~1e-2
    relative envelope of the f32-residual gradients."""
    params_t, gates_x, mask, enc, text_mask, init, d = _problem(2, 6,
                                                                seed=3)
    ref = make_decoder_scan(d["L"], d["H"], d["K"], d["E"], 0.5)
    pal = make_pallas_decoder_scan(d["L"], d["H"], d["K"], d["E"], 0.5,
                                   residual_dtype=jnp.bfloat16,
                                   chunk=2, interpret=True)
    gr = jax.grad(_loss(ref, mask, text_mask), argnums=(0, 2))(
        params_t, gates_x, enc, init)
    gp = jax.grad(_loss(pal, mask, text_mask), argnums=(0, 2))(
        params_t, gates_x, enc, init)
    for a, b in zip(jax.tree.leaves(gr), jax.tree.leaves(gp)):
        a, b = np.asarray(a), np.asarray(b)
        denom = max(1e-3, float(np.abs(a).max()))
        assert float(np.abs(a - b).max()) / denom < 2e-2


@pytest.mark.slow
def test_pallas_scan_bf16_enc_close():
    """The VMEM planner may drop the encoder block to bf16 for long
    text (plan_pass); forward context and gradients stay within the
    bf16-multiply rounding envelope of the f32-enc kernel."""
    params_t, gates_x, mask, enc, text_mask, init, d = _problem(2, 6,
                                                                seed=5)
    ref = make_decoder_scan(d["L"], d["H"], d["K"], d["E"], 0.5)
    pal = make_pallas_decoder_scan(d["L"], d["H"], d["K"], d["E"], 0.5,
                                   chunk=2, interpret=True,
                                   enc_dtype=jnp.bfloat16)
    r = ref(params_t, gates_x, mask, enc, text_mask, init)
    p = pal(params_t, gates_x, mask, enc, text_mask, init)
    for a, b in zip(jax.tree.leaves(r), jax.tree.leaves(p)):
        a, b = np.asarray(a), np.asarray(b)
        denom = max(1e-3, float(np.abs(a).max()))
        assert float(np.abs(a - b).max()) / denom < 2e-2
    gr = jax.grad(_loss(ref, mask, text_mask), argnums=(0, 2))(
        params_t, gates_x, enc, init)
    gp = jax.grad(_loss(pal, mask, text_mask), argnums=(0, 2))(
        params_t, gates_x, enc, init)
    for a, b in zip(jax.tree.leaves(gr), jax.tree.leaves(gp)):
        a, b = np.asarray(a), np.asarray(b)
        denom = max(1e-3, float(np.abs(a).max()))
        assert float(np.abs(a - b).max()) / denom < 3e-2


def _pallas_eqns(jaxpr):
    out = []

    def walk(j):
        for eqn in j.eqns:
            if eqn.primitive.name == "pallas_call":
                out.append(eqn)
            for v in eqn.params.values():
                if hasattr(v, "jaxpr"):
                    walk(v.jaxpr)
                elif isinstance(v, (list, tuple)):
                    for x in v:
                        if hasattr(x, "jaxpr"):
                            walk(x.jaxpr)
    walk(jaxpr.jaxpr)
    return out


def test_fwd_only_primal_is_residual_free():
    """The custom_vjp PRIMAL (every undifferentiated consumer: eval
    step, teacher-forced predictions, scheduled-sampling pass 1) traces
    the residual-free forward kernel — 3 pallas outputs (feats, phi,
    final carry) instead of 3 + 2L + 2 — and its values match the
    residual-emitting differentiated forward exactly (VERDICT r4 #3)."""
    L = 2
    params_t, gates_x, mask, enc, text_mask, init, d = _problem(L, 6)
    pal = make_pallas_decoder_scan(d["L"], d["H"], d["K"], d["E"], 0.5,
                                   chunk=2, interpret=True)

    def run(params_t, gates_x, enc, init):
        return pal(params_t, gates_x, mask, enc, text_mask, init)

    primal_jaxpr = jax.make_jaxpr(run)(params_t, gates_x, enc, init)
    eqns = _pallas_eqns(primal_jaxpr)
    assert len(eqns) == 1
    assert len(eqns[0].outvars) == 3  # feats, phis, final carry

    # the differentiated trace keeps the residual streams
    diff_jaxpr = jax.make_jaxpr(
        jax.grad(_loss(pal, mask, text_mask), argnums=0))(
        params_t, gates_x, enc, init)
    fwd_eqns = [e for e in _pallas_eqns(diff_jaxpr)
                if len(e.outvars) > 3]
    assert fwd_eqns and len(fwd_eqns[0].outvars) == 3 + 2 * L + 2

    # value parity: primal outputs == the residual kernel's outputs
    prim = run(params_t, gates_x, enc, init)
    via_vjp, _ = jax.vjp(run, params_t, gates_x, enc, init)
    for a, b in zip(jax.tree.leaves(prim), jax.tree.leaves(via_vjp)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lstm_fwd_only_primal_is_residual_free():
    """Encoder-kernel counterpart of the decoder pin above."""
    from parrot_tpu.nn.recurrent import _LSTM_SCAN_SPLIT
    from parrot_tpu.ops.fused_train_scan import make_pallas_lstm_scan

    H, B, T = 8, 4, 6
    rng = np.random.RandomState(2)
    f = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.3)
    wh, b = f(H, 4 * H), f(4 * H)
    x_proj = f(T, B, 4 * H)
    mask = jnp.asarray((rng.rand(T, B) > 0.2).astype(np.float32))
    init = (f(B, H), f(B, H))
    pal = make_pallas_lstm_scan(H, False, chunk=2, interpret=True)

    def run(wh, b, x_proj, init):
        return pal(wh, b, x_proj, mask, init)

    eqns = _pallas_eqns(jax.make_jaxpr(run)(wh, b, x_proj, init))
    assert len(eqns) == 1 and len(eqns[0].outvars) == 2  # hs, final

    def loss(wh, b, x_proj, init):
        hs, (hf, cf) = run(wh, b, x_proj, init)
        return jnp.sum(hs) + jnp.sum(hf) + jnp.sum(cf)

    diff_eqns = _pallas_eqns(
        jax.make_jaxpr(jax.grad(loss))(wh, b, x_proj, init))
    assert any(len(e.outvars) == 4 for e in diff_eqns)  # +gates, cs

    prim = run(wh, b, x_proj, init)
    via_vjp, _ = jax.vjp(run, wh, b, x_proj, init)
    for a, bb in zip(jax.tree.leaves(prim), jax.tree.leaves(via_vjp)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))
    ref = _LSTM_SCAN_SPLIT[False](wh, b, x_proj, mask, init)
    for a, bb in zip(jax.tree.leaves(ref), jax.tree.leaves(prim)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=2e-6)


def test_vmem_planner():
    """plan_pass degrades chunk -> bf16 enc -> None as shapes grow, and
    the estimate reproduces Mosaic's measured totals (154.0 MB at
    B=256 U=256 C=2 f32-enc bf16-res, observed on chip)."""
    from parrot_tpu.ops.fused_train_scan import (estimate_vmem_bytes,
                                                 pallas_scan_fits,
                                                 plan_pass)
    dims = dict(L=3, H=512, K=10, E=256)
    f, _ = estimate_vmem_bytes(256, 256, C=2, res_bytes=2, enc_bytes=4,
                               **dims)
    assert abs(f / 2**20 - 154.0) < 0.5
    c, dt = plan_pass("fwd", 256, 128, max_chunk=2, res_bytes=2, **dims)
    assert (c, dt) == (2, jnp.float32)
    c, dt = plan_pass("fwd", 256, 256, max_chunk=2, res_bytes=2, **dims)
    assert dt == jnp.bfloat16
    assert plan_pass("fwd", 256, 512, max_chunk=2, res_bytes=2,
                     **dims) is None
    assert pallas_scan_fits(256, 128, **dims)
    assert not pallas_scan_fits(256, 512, **dims)
    # value-parity contract: the fwd_only plan INHERITS the fwd plan's
    # enc dtype even though its smaller footprint would fit f32 enc —
    # the undifferentiated primal must compute the same forward numbers
    # as the differentiated pass (round-5 review fix)
    c, dt = plan_pass("fwd_only", 256, 256, max_chunk=2, res_bytes=2,
                      **dims)
    assert dt == jnp.bfloat16
    c, dt = plan_pass("fwd_only", 256, 128, max_chunk=2, res_bytes=2,
                      **dims)
    assert dt == jnp.float32
    assert plan_pass("fwd_only", 256, 512, max_chunk=2, res_bytes=2,
                     **dims) is None


@pytest.mark.parametrize("reverse,T,chunk", [(False, 6, 2), (True, 6, 2),
                                             (False, 7, 4), (True, 5, 2)])
def test_pallas_lstm_scan_matches_split(reverse, T, chunk):
    """The fused Pallas LSTM scan (encoder pass) matches the lax.scan
    split path bit-for-bit in interpret mode: forward values, final
    state, and every gradient — both directions, T not divisible by
    the chunk."""
    from parrot_tpu.nn.recurrent import _LSTM_SCAN_SPLIT
    from parrot_tpu.ops.fused_train_scan import make_pallas_lstm_scan

    H, B = 8, 4
    rng = np.random.RandomState(11 + int(reverse))
    f = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.3)
    wh, b = f(H, 4 * H), f(4 * H)
    x_proj = f(T, B, 4 * H)
    mask = jnp.asarray((rng.rand(T, B) > 0.2).astype(np.float32))
    init = (f(B, H), f(B, H))
    ref = _LSTM_SCAN_SPLIT[reverse]
    pal = make_pallas_lstm_scan(H, reverse, chunk=chunk, interpret=True)

    r = ref(wh, b, x_proj, mask, init)
    p = pal(wh, b, x_proj, mask, init)
    for a, bb in zip(jax.tree.leaves(r), jax.tree.leaves(p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=2e-6)

    def loss(fn):
        def go(wh, b, x_proj, init):
            hs, (hf, cf) = fn(wh, b, x_proj, mask, init)
            w = jnp.cos(jnp.arange(hs.size, dtype=jnp.float32)
                        .reshape(hs.shape) * 0.01)
            return jnp.sum(hs * w) + jnp.sum(hf * 0.2) + jnp.sum(cf * 0.1)
        return go

    gr = jax.grad(loss(ref), argnums=(0, 1, 2, 3))(wh, b, x_proj, init)
    gp = jax.grad(loss(pal), argnums=(0, 1, 2, 3))(wh, b, x_proj, init)
    for a, bb in zip(jax.tree.leaves(gr), jax.tree.leaves(gp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=1e-5)


@pytest.mark.parametrize("T,chunk", [(6, 2), (7, 4), (5, 2)])
def test_pallas_bilstm_fused_matches_directions(T, chunk):
    """The direction-fused BiLSTM kernel (one pallas_call stepping both
    directions, VERDICT r4 #4) matches the two single-direction split
    scans bit-for-bit in interpret mode: forward values, finals, and
    every gradient — including T not divisible by the chunk."""
    from parrot_tpu.nn.recurrent import _LSTM_SCAN_SPLIT
    from parrot_tpu.ops.fused_train_scan import make_pallas_bilstm_scan

    H, B = 8, 4
    rng = np.random.RandomState(21 + T)
    f = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.3)
    whf, bf, whb, bb = f(H, 4 * H), f(4 * H), f(H, 4 * H), f(4 * H)
    xpf, xpb = f(T, B, 4 * H), f(T, B, 4 * H)
    mask = jnp.asarray((rng.rand(T, B) > 0.2).astype(np.float32))
    init = ((f(B, H), f(B, H)), (f(B, H), f(B, H)))
    fused = make_pallas_bilstm_scan(H, chunk=chunk, interpret=True)

    def ref(whf, bf, whb, bb, xpf, xpb, init):
        hs_f, fin_f = _LSTM_SCAN_SPLIT[False](whf, bf, xpf, mask, init[0])
        hs_b, fin_b = _LSTM_SCAN_SPLIT[True](whb, bb, xpb, mask, init[1])
        return hs_f, hs_b, (fin_f, fin_b)

    def fus(whf, bf, whb, bb, xpf, xpb, init):
        return fused(whf, bf, whb, bb, xpf, xpb, mask, init)

    args = (whf, bf, whb, bb, xpf, xpb, init)
    r, p = ref(*args), fus(*args)
    for a, bb_ in zip(jax.tree.leaves(r), jax.tree.leaves(p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb_),
                                   atol=2e-6)

    def loss(fn):
        def go(*args):
            hs_f, hs_b, fins = fn(*args)
            w1 = jnp.cos(jnp.arange(hs_f.size, dtype=jnp.float32)
                         .reshape(hs_f.shape) * 0.01)
            w2 = jnp.sin(jnp.arange(hs_b.size, dtype=jnp.float32)
                         .reshape(hs_b.shape) * 0.013)
            return (jnp.sum(hs_f * w1) + jnp.sum(hs_b * w2)
                    + sum(0.1 * jnp.sum(x)
                          for x in jax.tree.leaves(fins)))
        return go

    gr = jax.grad(loss(ref), argnums=tuple(range(7)))(*args)
    gp = jax.grad(loss(fus), argnums=tuple(range(7)))(*args)
    for a, bb_ in zip(jax.tree.leaves(gr), jax.tree.leaves(gp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb_),
                                   atol=1e-5)

    # primal (undifferentiated) is the residual-free variant: 3 pallas
    # outputs (hs_f, hs_b, final) instead of 7
    eqns = _pallas_eqns(jax.make_jaxpr(fus)(*args))
    assert len(eqns) == 1 and len(eqns[0].outvars) == 3


def test_pallas_lstm_scan_carried_state_and_full_mask():
    """Nonzero initial state carries through; a fully-masked batch row
    passes the state through unchanged with zero gradient flow."""
    from parrot_tpu.nn.recurrent import _LSTM_SCAN_SPLIT
    from parrot_tpu.ops.fused_train_scan import make_pallas_lstm_scan

    H, B, T = 8, 4, 6
    rng = np.random.RandomState(3)
    f = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.3)
    wh, b = f(H, 4 * H), f(4 * H)
    x_proj = f(T, B, 4 * H)
    mask = np.ones((T, B), np.float32)
    mask[:, 0] = 0.0  # row 0 fully padded
    mask = jnp.asarray(mask)
    init = (f(B, H), f(B, H))
    pal = make_pallas_lstm_scan(H, False, chunk=3, interpret=True)
    hs, (hf, cf) = pal(wh, b, x_proj, mask, init)
    np.testing.assert_array_equal(np.asarray(hf)[0], np.asarray(init[0])[0])
    np.testing.assert_array_equal(np.asarray(cf)[0], np.asarray(init[1])[0])
    r = _LSTM_SCAN_SPLIT[False](wh, b, x_proj, mask, init)
    for a, bb in zip(jax.tree.leaves(r), jax.tree.leaves((hs, (hf, cf)))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=2e-6)


@pytest.mark.slow
def test_shard_map_trainer_matches_single_device(tmp_path):
    """pallas_scan on a multi-device mesh runs through the shard_map
    per-device step (each device's pallas_call sees only its local batch
    rows; grads psum'd explicitly). Params after 3 steps must match the
    single-device pallas trainer and the 8-device GSPMD lax.scan
    trainer."""
    import dataclasses

    from parrot_tpu.config import (DataConfig, ModelConfig, ParrotConfig,
                                   TrainConfig)
    from parrot_tpu.data import H5Corpus, make_fixture_corpus
    from parrot_tpu.train import Trainer

    path = str(tmp_path / "fix.h5")
    make_fixture_corpus(path, num_utterances=32, vocab_size=8,
                        frame_size=6, frames_per_char=3, min_chars=3,
                        max_chars=8, seed=3)
    corpus = H5Corpus(path)
    model = ModelConfig(frame_size=6, vocab_size=8, embed_dim=8,
                        encoder_dim=8, rnn_h_dim=16, decoder_layers=2,
                        readouts_dim=16, attention_mixtures=2,
                        num_mixtures=2, which_cost="GMM",
                        split_backward=True, pallas_scan=True,
                        scan_residual_dtype="float32")
    data = DataConfig(dataset=path, batch_size=8, seq_size=12,
                      max_text_len=10, prefetch=1)

    def run(ndev, sub, pallas):
        m = dataclasses.replace(model, pallas_scan=pallas)
        tr_cfg = TrainConfig(model_name="t", save_dir=str(tmp_path / sub),
                             learning_rate=3e-3, num_steps=3,
                             save_every=0, eval_every=0, log_every=1000,
                             num_devices=ndev)
        t = Trainer(ParrotConfig(model=m, data=data, train=tr_cfg),
                    corpus, quiet=True)
        t.train(num_steps=3)
        return t.params

    p1 = run(1, "a", pallas=True)       # single-device pallas (interpret)
    p8 = run(8, "b", pallas=True)       # shard_map per-device pallas
    p8_gspmd = run(8, "c", pallas=False)  # GSPMD lax.scan split path
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
    for a, b in zip(jax.tree.leaves(p8_gspmd), jax.tree.leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_shard_map_trainer_eval_and_resume(tmp_path):
    """The shard_map trainer's eval path and checkpoint/resume behave
    exactly like the GSPMD trainer's."""
    from parrot_tpu.config import (DataConfig, ModelConfig, ParrotConfig,
                                   TrainConfig)
    from parrot_tpu.data import H5Corpus, make_fixture_corpus
    from parrot_tpu.train import Trainer

    path = str(tmp_path / "fix.h5")
    make_fixture_corpus(path, num_utterances=32, vocab_size=8,
                        frame_size=6, frames_per_char=3, min_chars=3,
                        max_chars=8, seed=4)
    corpus = H5Corpus(path)
    model = ModelConfig(frame_size=6, vocab_size=8, embed_dim=8,
                        encoder_dim=8, rnn_h_dim=16, decoder_layers=2,
                        readouts_dim=16, attention_mixtures=2,
                        num_mixtures=2, which_cost="GMM",
                        split_backward=True, pallas_scan=True,
                        scan_residual_dtype="float32")
    data = DataConfig(dataset=path, batch_size=8, seq_size=12,
                      max_text_len=10, prefetch=1)
    tr_cfg = TrainConfig(model_name="t", save_dir=str(tmp_path / "s"),
                         learning_rate=3e-3, num_steps=4, save_every=4,
                         eval_every=2, log_every=1000, num_devices=8)
    cfg = ParrotConfig(model=model, data=data, train=tr_cfg)
    t = Trainer(cfg, corpus, quiet=True)
    t.train(num_steps=4)
    v = t.evaluate(max_batches=2)
    assert np.isfinite(v)
    t2 = Trainer(cfg, corpus, quiet=True)
    assert t2.resume()
    assert t2.step == 4
    for a, b in zip(jax.tree.leaves(t.params), jax.tree.leaves(t2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    t2.train(num_steps=6)
    assert t2.step == 6


@pytest.mark.slow
def test_model_level_batch_split_parity(monkeypatch):
    """When the full batch overflows the kernel's VMEM plan, the model
    runs the SAME kernel over independent batch slabs; loss and grads
    must match the unsplit path exactly (rows are independent)."""
    import parrot_tpu.ops.fused_train_scan as fts
    from parrot_tpu.config import ModelConfig
    from parrot_tpu.data.pipeline import Batch
    from parrot_tpu.models import Parrot

    base = dict(frame_size=5, rnn_h_dim=8, encoder_dim=4, embed_dim=6,
                vocab_size=11, attention_mixtures=3, num_mixtures=2,
                readouts_dim=12, decoder_layers=2, which_cost="GMM",
                split_backward=True, scan_residual_dtype="float32")
    rng = np.random.RandomState(9)
    B, S, U = 8, 6, 5
    batch = Batch(
        features=rng.randn(B, S, 5).astype(np.float32),
        features_mask=(rng.rand(B, S) > 0.15).astype(np.float32),
        prev_frame=np.zeros((B, 5), np.float32),
        text=rng.randint(1, 11, size=(B, U)).astype(np.int32),
        text_mask=np.ones((B, U), np.float32),
        speaker=np.zeros((B,), np.int32),
        start_flag=np.asarray(1.0, np.float32),
    )
    norm = {"mean": jnp.zeros(5), "std": jnp.ones(5)}

    real_fits = fts.pallas_scan_fits

    def fits_half_only(b, u, **kw):
        return b <= B // 2 and real_fits(b, u, **kw)

    outs = {}
    for split in (False, True):
        if split:
            monkeypatch.setattr(fts, "pallas_scan_fits", fits_half_only)
        else:
            monkeypatch.setattr(fts, "pallas_scan_fits", real_fits)
        cfg = ModelConfig(pallas_scan=True, **base)
        model = Parrot(cfg)
        params = model.init_params(jax.random.PRNGKey(0))

        def cost(p, model=model):
            loss, _, _ = model.compute_cost(p, norm, batch, None)
            return loss

        outs[split] = (cost(params), jax.grad(cost)(params))
    np.testing.assert_allclose(np.asarray(outs[False][0]),
                               np.asarray(outs[True][0]), atol=1e-6)
    for a, b in zip(jax.tree.leaves(outs[False][1]),
                    jax.tree.leaves(outs[True][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5)


@pytest.mark.slow
def test_model_level_pallas_scan_parity():
    """Parrot.compute_cost value and parameter gradients agree between
    pallas_scan on (interpret) and off, on a tiny aligned-enough model
    (the CPU path skips the TPU alignment guard)."""
    from parrot_tpu.config import ModelConfig
    from parrot_tpu.data.pipeline import Batch
    from parrot_tpu.models import Parrot

    base = dict(frame_size=5, rnn_h_dim=8, encoder_dim=4, embed_dim=6,
                vocab_size=11, attention_mixtures=3, num_mixtures=2,
                readouts_dim=12, decoder_layers=2, which_cost="GMM",
                split_backward=True, scan_residual_dtype="float32")
    rng = np.random.RandomState(7)
    B, S, U = 4, 6, 5
    batch = Batch(
        features=rng.randn(B, S, 5).astype(np.float32),
        features_mask=(rng.rand(B, S) > 0.15).astype(np.float32),
        prev_frame=np.zeros((B, 5), np.float32),
        text=rng.randint(1, 11, size=(B, U)).astype(np.int32),
        text_mask=np.ones((B, U), np.float32),
        speaker=np.zeros((B,), np.int32),
        start_flag=np.asarray(1.0, np.float32),
    )
    norm = {"mean": jnp.zeros(5), "std": jnp.ones(5)}

    outs = {}
    for flag in (False, True):
        cfg = ModelConfig(pallas_scan=flag, **base)
        model = Parrot(cfg)
        params = model.init_params(jax.random.PRNGKey(0))

        def cost(p, model=model):
            loss, _, _ = model.compute_cost(p, norm, batch, None)
            return loss

        outs[flag] = (cost(params), jax.grad(cost)(params))
    np.testing.assert_allclose(np.asarray(outs[False][0]),
                               np.asarray(outs[True][0]), atol=1e-5)
    for a, b in zip(jax.tree.leaves(outs[False][1]),
                    jax.tree.leaves(outs[True][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4)


def test_pallas_lstm_scan_bf16_residuals_close():
    """bf16 gate-residual streams for the encoder LSTM kernel (the
    production default scan_residual_dtype routes here through
    lstm_scan_split) stay within the documented ~1e-2 relative envelope
    of the f32-residual gradients — mirror of the decoder kernel's
    test_pallas_scan_bf16_residuals_close (ADVICE r3 #3)."""
    from parrot_tpu.nn.recurrent import _LSTM_SCAN_SPLIT
    from parrot_tpu.ops.fused_train_scan import make_pallas_lstm_scan

    H, B, T = 8, 4, 6
    for reverse in (False, True):
        rng = np.random.RandomState(17 + int(reverse))
        f = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.3)
        wh, b = f(H, 4 * H), f(4 * H)
        x_proj = f(T, B, 4 * H)
        mask = jnp.asarray((rng.rand(T, B) > 0.2).astype(np.float32))
        init = (f(B, H), f(B, H))
        ref = _LSTM_SCAN_SPLIT[reverse]
        pal = make_pallas_lstm_scan(H, reverse,
                                    residual_dtype_name="bfloat16",
                                    chunk=2, interpret=True)

        def loss(fn):
            def go(wh, b, x_proj, init):
                hs, (hf, cf) = fn(wh, b, x_proj, mask, init)
                w = jnp.cos(jnp.arange(hs.size, dtype=jnp.float32)
                            .reshape(hs.shape) * 0.01)
                return (jnp.sum(hs * w) + jnp.sum(hf * 0.2)
                        + jnp.sum(cf * 0.1))
            return go

        gr = jax.grad(loss(ref), argnums=(0, 1, 3))(wh, b, x_proj, init)
        gp = jax.grad(loss(pal), argnums=(0, 1, 3))(wh, b, x_proj, init)
        for a, bb in zip(jax.tree.leaves(gr), jax.tree.leaves(gp)):
            a, bb = np.asarray(a), np.asarray(bb)
            denom = max(1e-3, float(np.abs(a).max()))
            assert float(np.abs(a - bb).max()) / denom < 2e-2, reverse


def test_resolve_pallas_scan_decision_table():
    """resolve_pallas_scan is the one source of truth (VERDICT r3 #1):
    AUTO keys on backend + PER-DEVICE batch; explicit values pass
    through untouched; the model itself treats None as OFF."""
    from parrot_tpu.config import ModelConfig
    from parrot_tpu.models.parrot import resolve_pallas_scan

    auto = ModelConfig()
    assert auto.pallas_scan is None
    assert resolve_pallas_scan(auto, 64, backend="tpu") is True
    assert resolve_pallas_scan(auto, 32, backend="tpu") is False
    assert resolve_pallas_scan(auto, 256, backend="cpu") is False
    on = ModelConfig(pallas_scan=True)
    off = ModelConfig(pallas_scan=False)
    assert resolve_pallas_scan(on, 1, backend="cpu") is True
    assert resolve_pallas_scan(off, 4096, backend="tpu") is False


def test_trainer_resolves_auto_against_per_device_batch(
        tmp_path, monkeypatch):
    """The pod-slice scenario from VERDICT r3 weak #1: 8 devices,
    global batch 128 (per-device 16 < 64 <= 128). On a TPU backend the
    old model-side AUTO would have engaged the single-device Pallas
    kernels at the GLOBAL batch inside the GSPMD jit (operand
    replication). Now the Trainer resolves AUTO per-device, the model
    obeys, and the lowered GSPMD step contains no pallas/Mosaic op."""
    import dataclasses

    from parrot_tpu.config import (DataConfig, ModelConfig, ParrotConfig,
                                   TrainConfig)
    from parrot_tpu.data import H5Corpus, make_fixture_corpus, parrot_stream
    from parrot_tpu.models import parrot as parrot_mod
    from parrot_tpu.train import Trainer

    # the resolver must believe it is on a TPU backend for AUTO to even
    # be a question (on CPU it is always False)
    monkeypatch.setattr(parrot_mod, "_default_backend", lambda: "tpu")

    path = str(tmp_path / "fix.h5")
    # train split is ~87.5% of the corpus; 640 covers batch_size=512
    make_fixture_corpus(path, num_utterances=640, vocab_size=8,
                        frame_size=6, frames_per_char=2, min_chars=3,
                        max_chars=6, seed=0)
    corpus = H5Corpus(path)
    model = ModelConfig(frame_size=6, vocab_size=8, embed_dim=8,
                        encoder_dim=8, rnn_h_dim=16, decoder_layers=2,
                        readouts_dim=16, attention_mixtures=2,
                        num_mixtures=2, split_backward=True,
                        pallas_scan=None)  # AUTO
    data = DataConfig(dataset=path, batch_size=128, seq_size=8,
                      max_text_len=8, prefetch=1)
    tr_cfg = TrainConfig(model_name="g", save_dir=str(tmp_path / "g"),
                         num_steps=1, save_every=0, eval_every=0,
                         log_every=1000, num_devices=8)
    t = Trainer(ParrotConfig(model=model, data=data, train=tr_cfg),
                corpus, quiet=True)
    # per-device 16 < 64: AUTO resolves OFF -> plain GSPMD step, and the
    # model's baked config agrees (single source of truth)
    assert t._pallas_resolved() is False
    assert not t._use_shard_map()
    assert t.model.cfg.pallas_scan is False
    # the user's tri-state survives for checkpoint meta / re-resolution
    assert t.cfg.model.pallas_scan is None

    batch = next(iter(parrot_stream(corpus, data, "train", epochs=1)))
    batch = jax.device_put(batch, t._batch_sh())
    dstate = t._fresh_state()
    txt = t._train_step.lower(t.params, t.opt_state, dstate, batch,
                              jnp.int32(0)).as_text()
    for marker in ("pallas", "mosaic", "tpu_custom_call"):
        assert marker not in txt.lower(), marker

    # per-device 64 on the same mesh topology: AUTO resolves ON and the
    # Trainer selects the shard_map per-device step
    data_big = dataclasses.replace(data, batch_size=512)
    t2 = Trainer(ParrotConfig(model=model, data=data_big,
                              train=dataclasses.replace(
                                  tr_cfg, save_dir=str(tmp_path / "g2"))),
                 corpus, quiet=True)
    assert t2._pallas_resolved() is True
    assert t2._use_shard_map()
    assert t2.model.cfg.pallas_scan is True


def test_sampler_traces_inference_view(monkeypatch):
    """Serving never traces the residual-emitting TRAINING kernels
    (VERDICT r3 weak #2): a Sampler built from a pallas_scan=True model
    swaps in the inference view, so neither the encoder LSTM kernel nor
    the decoder train-scan kernel factory is ever invoked."""
    from parrot_tpu.config import ModelConfig, SampleConfig
    from parrot_tpu.models import Parrot
    from parrot_tpu.ops import fused_train_scan as fts
    from parrot_tpu.sample import Sampler

    def boom(*a, **k):
        raise AssertionError("training kernel factory called in serving")

    monkeypatch.setattr(fts, "make_pallas_lstm_scan", boom)
    monkeypatch.setattr(fts, "make_pallas_decoder_scan", boom)

    cfg = ModelConfig(frame_size=5, rnn_h_dim=8, encoder_dim=4,
                      embed_dim=6, vocab_size=11, attention_mixtures=2,
                      num_mixtures=2, readouts_dim=12, decoder_layers=2,
                      split_backward=True, pallas_scan=True)
    model = Parrot(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    norm = {"mean": jnp.zeros((5,)), "std": jnp.ones((5,))}
    s = Sampler(model, params, norm, SampleConfig(max_steps=4))
    assert s.model.cfg.pallas_scan is False
    frames, lengths, _ = s.generate(
        jnp.asarray(np.random.RandomState(0).randint(1, 11, (2, 4)),
                    jnp.int32),
        jnp.ones((2, 4), jnp.float32), return_phis=False)
    assert np.isfinite(np.asarray(frames)).all()
