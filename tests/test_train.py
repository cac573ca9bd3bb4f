"""Training-stack tests: optimizer, checkpoint roundtrip, DP grad
equivalence on the 8-device CPU mesh, end-to-end fixture overfit
(SURVEY.md §4 "Multi-chip without a pod" / "End-to-end")."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parrot_tpu.config import (DataConfig, ModelConfig, ParrotConfig,
                               TrainConfig)
from parrot_tpu.data import H5Corpus, make_fixture_corpus
from parrot_tpu.parallel import make_mesh
from parrot_tpu.train import Trainer, adam_init, adam_update
from parrot_tpu.train.checkpoint import CheckpointManager
from parrot_tpu.train.optim import clip_by_global_norm, global_norm


def test_adam_matches_reference_formula():
    cfg = TrainConfig(learning_rate=0.1, grad_clip=1e9)
    params = {"w": jnp.array([1.0, 2.0])}
    grads = {"w": jnp.array([0.5, -0.5])}
    opt = adam_init(params)
    new, opt, info = adam_update(params, grads, opt, cfg)
    # first step: mhat = g, vhat = g^2 -> update = lr * sign(g) / (1+eps)
    np.testing.assert_allclose(np.array(new["w"]),
                               [1.0 - 0.1 * (0.5 / (0.5 + cfg.adam_eps)),
                                2.0 + 0.1 * (0.5 / (0.5 + cfg.adam_eps))],
                               rtol=1e-6)
    assert int(opt["count"]) == 1


def test_clip_by_global_norm():
    tree = {"a": jnp.array([3.0]), "b": jnp.array([4.0])}
    clipped, norm = clip_by_global_norm(tree, 1.0)
    np.testing.assert_allclose(float(norm), 5.0, rtol=1e-6)
    np.testing.assert_allclose(float(global_norm(clipped)), 1.0, rtol=1e-5)
    # under the limit: untouched
    same, _ = clip_by_global_norm(tree, 100.0)
    np.testing.assert_allclose(np.array(same["a"]), [3.0])


def test_checkpoint_roundtrip_and_gc(tmp_path):
    mgr = CheckpointManager(str(tmp_path), "m", keep=2)
    params = {"lin": {"w": np.arange(6, dtype=np.float32).reshape(2, 3),
                      "b": np.zeros(3, np.float32)},
              "cells": [{"wx": np.ones((2, 2), np.float32)}]}
    for step in [10, 20, 30]:
        mgr.save(step, {"params": params}, meta={"note": f"s{step}"},
                 is_best=(step == 10))
    got = mgr.restore({"params": jax.tree.map(np.zeros_like, params)})
    assert got is not None
    step, trees, meta = got
    assert step == 30
    np.testing.assert_array_equal(trees["params"]["lin"]["w"],
                                  params["lin"]["w"])
    # best (step 10) survives GC even with keep=2
    step_b, _, _ = mgr.restore(
        {"params": jax.tree.map(np.zeros_like, params)}, which="best")
    assert step_b == 10
    # shape mismatch rejected
    bad = {"params": {"lin": {"w": np.zeros((3, 3), np.float32),
                              "b": np.zeros(3, np.float32)},
                      "cells": [{"wx": np.ones((2, 2), np.float32)}]}}
    with pytest.raises(ValueError, match="shape mismatch"):
        mgr.restore(bad)


@pytest.fixture(scope="module")
def fixture_corpus(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("d") / "fix.h5")
    make_fixture_corpus(path, num_utterances=32, vocab_size=8, frame_size=6,
                        frames_per_char=3, min_chars=3, max_chars=8, seed=3)
    return path


def small_cfg(path, tmp_path, ndev=1, **train_kw):
    model = ModelConfig(frame_size=6, vocab_size=8, embed_dim=8,
                        encoder_dim=8, rnn_h_dim=16, decoder_layers=2,
                        readouts_dim=16, attention_mixtures=2,
                        num_mixtures=2, which_cost="GMM")
    data = DataConfig(dataset=path, batch_size=8, seq_size=12,
                      max_text_len=10, prefetch=1)
    tr = dict(model_name="t", save_dir=str(tmp_path), learning_rate=3e-3,
              num_steps=30, save_every=0, eval_every=0, log_every=1000,
              num_devices=ndev)
    tr.update(train_kw)
    return ParrotConfig(model=model, data=data, train=TrainConfig(**tr))


@pytest.mark.slow
def test_dp_grads_match_single_device(fixture_corpus, tmp_path):
    """SURVEY.md §4: 8-device DP step must equal the single-device step."""
    corpus = H5Corpus(fixture_corpus)
    cfg1 = small_cfg(fixture_corpus, tmp_path / "a", ndev=1)
    cfg8 = small_cfg(fixture_corpus, tmp_path / "b", ndev=8)
    t1 = Trainer(cfg1, corpus, quiet=True)
    t8 = Trainer(cfg8, corpus, quiet=True)
    # identical init (same seed)
    r1 = t1.train(num_steps=3)
    r8 = t8.train(num_steps=3)
    for k1, k8 in zip(jax.tree.leaves(t1.params), jax.tree.leaves(t8.params)):
        np.testing.assert_allclose(np.asarray(k1), np.asarray(k8),
                                   rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_overfit_fixture_and_resume(fixture_corpus, tmp_path):
    """End-to-end: loss drops on the fixture; checkpoint resume restores
    identical params and continues."""
    corpus = H5Corpus(fixture_corpus)
    cfg = small_cfg(fixture_corpus, tmp_path, ndev=1, num_steps=300,
                    save_every=300, eval_every=100, learning_rate=1e-2)
    tr = Trainer(cfg, corpus, quiet=True)
    tr.train(num_steps=300)
    # read the metrics log
    import json
    recs = [json.loads(l) for l in
            open(os.path.join(str(tmp_path), "t", "metrics.jsonl"))]
    valid = [r for r in recs if r["kind"] == "valid"]
    assert valid, "no valid evals logged"
    best = min(v["valid_loss"] for v in valid)
    assert best < 0.0, \
        f"GMM NLL should go well below 0 on the fixture: best={best}"

    # resume: params identical after restore
    tr2 = Trainer(cfg, corpus, quiet=True)
    assert tr2.resume()
    assert tr2.step == 300
    for a, b in zip(jax.tree.leaves(tr.params), jax.tree.leaves(tr2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    tr2.train(num_steps=302)  # two more steps run without error
    assert tr2.step == 302


@pytest.mark.slow
def test_multispeaker_training_and_alignment_dump(tmp_path):
    """Config-4 shape (VCTK-style multi-speaker) + alignment dump path."""
    import json as _json
    from parrot_tpu.data import make_fixture_corpus as mk
    path = str(tmp_path / "multi.h5")
    mk(path, num_utterances=24, vocab_size=8, frame_size=6,
       frames_per_char=3, num_speakers=3, seed=9)
    corpus = H5Corpus(path)
    assert corpus.num_speakers == 3
    model = ModelConfig(frame_size=6, vocab_size=8, embed_dim=8,
                        encoder_dim=8, rnn_h_dim=16, decoder_layers=2,
                        readouts_dim=16, attention_mixtures=2,
                        num_mixtures=2, use_speaker=True, num_speakers=3,
                        speaker_dim=4)
    data = DataConfig(dataset=path, batch_size=8, seq_size=12,
                      max_text_len=10, prefetch=1)
    tr = TrainConfig(model_name="ms", save_dir=str(tmp_path),
                     learning_rate=1e-2, num_steps=60, save_every=0,
                     eval_every=30, log_every=1000, num_devices=1,
                     plot_alignments=True)
    t = Trainer(ParrotConfig(model=model, data=data, train=tr), corpus,
                quiet=True)
    t.train()
    recs = [_json.loads(l) for l in
            open(os.path.join(str(tmp_path), "ms", "metrics.jsonl"))]
    tr_losses = [r["loss"] for r in recs if r["kind"] == "train"]
    # alignment plots dumped at evals
    out = os.path.join(str(tmp_path), "ms", "alignments")
    assert os.path.isdir(out) and len(os.listdir(out)) >= 1
    valid = [r for r in recs if r["kind"] == "valid"]
    assert valid[-1]["valid_loss"] < 9.0  # started ~5.5*D/6... learning


@pytest.mark.slow
def test_exact_resume_continues_training_bitwise(fixture_corpus, tmp_path):
    """Checkpointed stream position + TBPTT carry: split training must
    reproduce straight-through training exactly."""
    corpus = H5Corpus(fixture_corpus)
    cfg_a = small_cfg(fixture_corpus, tmp_path / "x", ndev=1, num_steps=6,
                      save_every=0, eval_every=0)
    a = Trainer(cfg_a, corpus, quiet=True)
    a.train(num_steps=6)

    cfg_b = small_cfg(fixture_corpus, tmp_path / "y", ndev=1, num_steps=6,
                      save_every=0, eval_every=0)
    b = Trainer(cfg_b, corpus, quiet=True)
    b.train(num_steps=3)
    b._save()
    b2 = Trainer(cfg_b, corpus, quiet=True)
    assert b2.resume()
    assert b2.step == 3 and b2._segments_done == 3
    b2.train(num_steps=6)

    for pa, pb in zip(jax.tree.leaves(a.params), jax.tree.leaves(b2.params)):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))


@pytest.mark.slow
def test_preemption_flag_checkpoints_and_stops(fixture_corpus, tmp_path):
    """SIGTERM-style preemption: loop exits promptly and flushes a
    checkpoint that resume() picks up."""
    corpus = H5Corpus(fixture_corpus)
    cfg = small_cfg(fixture_corpus, tmp_path, ndev=1, num_steps=1000)
    t = Trainer(cfg, corpus, quiet=True)
    t.train(num_steps=2)  # warm start so _interrupted exists post-run
    t._interrupted = False

    import threading

    def interrupt_soon():
        import time as _t
        _t.sleep(0.5)
        t._interrupted = True

    threading.Thread(target=interrupt_soon, daemon=True).start()
    res = t.train(num_steps=1000)
    assert res["interrupted"] and res["step"] < 1000
    t2 = Trainer(cfg, corpus, quiet=True)
    assert t2.resume() and t2.step == res["step"]


@pytest.mark.slow
def test_resume_from_checkpoint_without_dstate(fixture_corpus, tmp_path):
    """Importer-written checkpoints carry no dstate; resume must fall back
    instead of crashing (code-review regression)."""
    corpus = H5Corpus(fixture_corpus)
    cfg = small_cfg(fixture_corpus, tmp_path, ndev=1)
    t = Trainer(cfg, corpus, quiet=True)
    # simulate scripts/import_checkpoint.py output: no dstate tree
    t.ckpt.save(0, {"params": t.params, "opt_state": t.opt_state,
                    "norm": t.norm}, meta={"config": cfg.to_json()},
                is_best=True)
    t2 = Trainer(cfg, corpus, quiet=True)
    assert t2.resume()
    assert t2.step == 0
    t2.train(num_steps=2)  # trains from the imported weights
    assert t2.step == 2


def test_norm_stats_npz_override(tmp_path):
    """--norm_stats: reference-style standalone .npz mean/std override
    the corpus-embedded stats (Fuel's ScaleAndShift semantics)."""
    from parrot_tpu.data import make_fixture_corpus
    path = str(tmp_path / "c.h5")
    make_fixture_corpus(path, num_utterances=16, vocab_size=8,
                        frame_size=6, frames_per_char=2, seed=4)
    corpus = H5Corpus(path)
    mean = np.full(6, 2.5, np.float32)
    std = np.full(6, 0.5, np.float32)
    stats = str(tmp_path / "stats.npz")
    np.savez(stats, mean=mean, std=std)
    cfg = ParrotConfig(
        model=ModelConfig(frame_size=6, vocab_size=8, embed_dim=4,
                          encoder_dim=4, rnn_h_dim=8, decoder_layers=2,
                          readouts_dim=8, attention_mixtures=2,
                          num_mixtures=2),
        data=DataConfig(batch_size=8, seq_size=6, max_text_len=12,
                        norm_stats=stats),
        train=TrainConfig(save_dir=str(tmp_path / "sm"), model_name="m"))
    t = Trainer(cfg, corpus, quiet=True)
    np.testing.assert_array_equal(np.asarray(t.norm["mean"]), mean)
    np.testing.assert_array_equal(np.asarray(t.norm["std"]), std)
    # wrong frame size fails loudly, not silently
    np.savez(stats, mean=np.zeros(5, np.float32),
             std=np.ones(5, np.float32))
    with pytest.raises(ValueError, match="norm_stats"):
        Trainer(cfg, corpus, quiet=True)


def test_fused_adam_matches_per_leaf():
    """adam_init(fused=True) keeps m/v as one flat buffer (measured
    ~7x fewer ms than the per-leaf tree-map update on chip); the math
    must match the per-leaf path exactly, including step clipping, and
    adam_update must dispatch on the state layout (old tree-layout
    checkpoints keep working)."""
    import numpy as np
    from parrot_tpu.config import TrainConfig
    from parrot_tpu.train.optim import adam_init, adam_update

    cfg = TrainConfig(grad_clip=0.5)  # small clip so clipping engages
    rng = np.random.default_rng(1)
    params = {"a": jnp.asarray(rng.normal(size=(7, 5)), jnp.float32),
              "b": [jnp.asarray(rng.normal(size=(3,)), jnp.float32),
                    jnp.asarray(rng.normal(size=(4, 2)), jnp.float32)]}
    o_t = adam_init(params, fused=False)
    o_f = adam_init(params, fused=True)
    assert o_f["m"].ndim == 1 and o_f["m"].size == 7 * 5 + 3 + 8
    p_t, p_f = params, params
    for _ in range(4):
        grads = jax.tree.map(lambda x: 0.1 * x + 0.03, p_t)
        p_t, o_t, i_t = adam_update(p_t, grads, o_t, cfg)
        p_f, o_f, i_f = adam_update(p_f, grads, o_f, cfg)
        np.testing.assert_allclose(float(i_t["grad_norm"]),
                                   float(i_f["grad_norm"]), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(p_t), jax.tree.leaves(p_f)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)


# ----------------------------------------------------------------------
# Parallel scheduled sampling (exposure-bias fine-tune; TrainConfig
# docstring). The reference is pure teacher forcing — these tests pin
# the new machinery: input_frames plumbing in compute_cost, the
# stop-gradient pass-1 predictions, and the Trainer integration.

def _one_batch(path, cfg):
    from parrot_tpu.data import parrot_stream
    corpus = H5Corpus(path)
    return corpus, next(iter(parrot_stream(corpus, cfg.data, "train",
                                           training=False, epochs=1)))


def test_compute_cost_input_frames_identity(fixture_corpus, tmp_path):
    """input_frames == batch.features must reproduce the teacher-forced
    cost exactly (the rate->0 limit of scheduled sampling)."""
    from parrot_tpu.models import Parrot
    cfg = small_cfg(fixture_corpus, tmp_path)
    corpus, batch = _one_batch(fixture_corpus, cfg)
    model = Parrot(dataclasses.replace(cfg.model,
                                       frame_size=corpus.frame_size,
                                       vocab_size=corpus.vocab_size))
    params = model.init_params(jax.random.PRNGKey(0))
    norm = {"mean": jnp.asarray(corpus.mean), "std": jnp.asarray(corpus.std)}
    l0, st0, _ = model.compute_cost(params, norm, batch, None)
    l1, st1, _ = model.compute_cost(params, norm, batch, None,
                                    input_frames=batch.features)
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    for a, b in zip(jax.tree.leaves(st0), jax.tree.leaves(st1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_compute_cost_input_frames_changes_inputs_not_targets(
        fixture_corpus, tmp_path):
    """Zeroed input_frames changes the loss (inputs really swapped) but
    the carried x_last still comes from the ground-truth TARGETS."""
    from parrot_tpu.models import Parrot
    cfg = small_cfg(fixture_corpus, tmp_path)
    corpus, batch = _one_batch(fixture_corpus, cfg)
    model = Parrot(dataclasses.replace(cfg.model,
                                       frame_size=corpus.frame_size,
                                       vocab_size=corpus.vocab_size))
    params = model.init_params(jax.random.PRNGKey(0))
    norm = {"mean": jnp.asarray(corpus.mean), "std": jnp.asarray(corpus.std)}
    l0, st0, _ = model.compute_cost(params, norm, batch, None)
    alt = np.asarray(batch.features) * 0.0 + 7.0
    l1, st1, _ = model.compute_cost(params, norm, batch, None,
                                    input_frames=jnp.asarray(alt))
    assert not np.allclose(np.asarray(l0), np.asarray(l1))
    # x_last carries the last valid TARGET frame in both cases
    np.testing.assert_array_equal(np.asarray(st0.x_last),
                                  np.asarray(st1.x_last))


def test_prediction_key_draws_vs_mean(fixture_corpus, tmp_path):
    """prediction_key switches pred_frames from the mixture expectation
    to a biased draw: shapes match, draws vary with the key, and a huge
    bias collapses the draw's variance (sigma *= exp(-bias))."""
    from parrot_tpu.models import Parrot
    cfg = small_cfg(fixture_corpus, tmp_path)
    corpus, batch = _one_batch(fixture_corpus, cfg)
    model = Parrot(dataclasses.replace(cfg.model,
                                       frame_size=corpus.frame_size,
                                       vocab_size=corpus.vocab_size))
    params = model.init_params(jax.random.PRNGKey(0))
    norm = {"mean": jnp.asarray(corpus.mean), "std": jnp.asarray(corpus.std)}
    _, _, m_mean = model.compute_cost(params, norm, batch, None,
                                      with_predictions=True)
    _, _, m_a = model.compute_cost(params, norm, batch, None,
                                   with_predictions=True,
                                   prediction_key=jax.random.PRNGKey(1))
    _, _, m_b = model.compute_cost(params, norm, batch, None,
                                   with_predictions=True,
                                   prediction_key=jax.random.PRNGKey(2))
    assert m_a["pred_frames"].shape == m_mean["pred_frames"].shape
    assert np.all(np.isfinite(np.asarray(m_a["pred_frames"])))
    assert not np.allclose(np.asarray(m_a["pred_frames"]),
                           np.asarray(m_b["pred_frames"]))
    # bias -> inf collapses sigma (sigma *= exp(-bias)): every draw must
    # land ON a component mean (whichever component the sharpened
    # categorical picks per step)
    from parrot_tpu.nn.mdn import split_gmm_params
    _, _, hi1 = model.compute_cost(params, norm, batch, None,
                                   with_predictions=True,
                                   prediction_key=jax.random.PRNGKey(3),
                                   prediction_bias=30.0)
    # recompute the per-step mixture means on the same teacher-forced path
    enc = model.encode(params, batch.text, batch.text_mask)
    st = model.init_state(*batch.text.shape)._replace(enc=enc)
    xn = (batch.features - norm["mean"]) / norm["std"]
    prev = jnp.zeros_like(xn[:, 0])
    x_in = jnp.concatenate([prev[:, None], xn[:, :-1]], 1).transpose(1, 0, 2)
    raw, _, _ = model.scan_decoder(params, st, x_in,
                                   batch.features_mask.T, batch.text_mask,
                                   model._speaker_vec(params, batch.speaker))
    D = batch.features.shape[-1]
    mu, _, _ = split_gmm_params(raw, D, model.cfg.num_mixtures,
                                model.cfg.min_log_sigma)
    mu_raw = np.asarray(mu) * np.asarray(norm["std"]) + np.asarray(
        norm["mean"])                                   # (T, B, M, D)
    draw = np.asarray(hi1["pred_frames"]).transpose(1, 0, 2)  # (T, B, D)
    dist = np.abs(mu_raw - draw[:, :, None, :]).max(axis=-1)  # (T, B, M)
    assert dist.min(axis=-1).max() < 1e-3, \
        "high-bias draws must collapse onto a component mean"


def test_scheduled_sampling_trainer_steps(fixture_corpus, tmp_path):
    """Trainer with scheduled_sampling_rate > 0 trains: finite loss,
    params move, and the step stays reproducible (same seed, same
    params after the same number of steps)."""
    corpus = H5Corpus(fixture_corpus)
    cfg = small_cfg(fixture_corpus, tmp_path / "ss", ndev=1,
                    scheduled_sampling_rate=0.5,
                    scheduled_sampling_bias=1.0)
    t1 = Trainer(cfg, corpus, quiet=True)
    t1.train(num_steps=3)
    leaves = jax.tree.leaves(t1.params)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    cfg2 = small_cfg(fixture_corpus, tmp_path / "ss2", ndev=1,
                     scheduled_sampling_rate=0.5,
                     scheduled_sampling_bias=1.0)
    t2 = Trainer(cfg2, corpus, quiet=True)
    t2.train(num_steps=3)
    for a, b in zip(leaves, jax.tree.leaves(t2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_scheduled_sampling_dp_matches_single_device(fixture_corpus,
                                                     tmp_path):
    """The shard_map/GSPMD scheduled-sampling step must stay equivalent
    to the single-device step (per-shard pass-1 draws use the same
    fold_in(axis_index) decorrelation as feedback noise, so exact
    equality is not expected across meshes — but the 8-device run must
    train stably and produce finite, moving params)."""
    corpus = H5Corpus(fixture_corpus)
    cfg8 = small_cfg(fixture_corpus, tmp_path / "dp8", ndev=8,
                     scheduled_sampling_rate=0.3,
                     scheduled_sampling_mode="mean")
    t8 = Trainer(cfg8, corpus, quiet=True)
    init = [np.asarray(l).copy() for l in jax.tree.leaves(t8.params)]
    t8.train(num_steps=2)
    after = [np.asarray(l) for l in jax.tree.leaves(t8.params)]
    assert all(np.all(np.isfinite(a)) for a in after)
    assert any(not np.array_equal(i, a) for i, a in zip(init, after))


def test_init_from_warm_starts_params_and_norm(fixture_corpus, tmp_path):
    """Trainer.init_from (the corpus-transfer fine-tune entry, round-5
    long-text robustness leg): params and NORM come from the source
    checkpoint, optimizer state and step stay fresh, and training
    proceeds on the new corpus."""
    corpus_a = H5Corpus(fixture_corpus)
    cfg_a = small_cfg(fixture_corpus, tmp_path, save_every=10,
                      num_steps=10)
    ta = Trainer(cfg_a, corpus_a, quiet=True)
    ta.train(num_steps=10)

    # a different corpus with matching dims (different seed -> stats)
    path_b = str(tmp_path / "other.h5")
    make_fixture_corpus(path_b, num_utterances=32, vocab_size=8,
                        frame_size=6, frames_per_char=3, min_chars=3,
                        max_chars=8, seed=9)
    corpus_b = H5Corpus(path_b)
    cfg_b = small_cfg(path_b, tmp_path, model_name="u")
    tb = Trainer(cfg_b, corpus_b, quiet=True)
    assert not np.allclose(np.asarray(tb.norm["mean"]),
                           np.asarray(ta.norm["mean"]))
    src_step = tb.init_from("t", which="latest")
    assert src_step == 10
    for a, b in zip(jax.tree.leaves(ta.params), jax.tree.leaves(tb.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the checkpoint's norm REPLACES corpus B's stats
    np.testing.assert_array_equal(np.asarray(tb.norm["mean"]),
                                  np.asarray(ta.norm["mean"]))
    # fresh optimizer + step counter
    assert int(tb.opt_state["count"]) == 0
    assert tb.step == 0
    tb.train(num_steps=2)
    assert tb.step == 2
    assert all(np.all(np.isfinite(np.asarray(l)))
               for l in jax.tree.leaves(tb.params))

    # architecture mismatch is rejected
    cfg_c = small_cfg(path_b, tmp_path, model_name="v")
    cfg_c = cfg_c.replace(model=dataclasses.replace(
        cfg_c.model, rnn_h_dim=32))
    tc = Trainer(cfg_c, corpus_b, quiet=True)
    with pytest.raises(ValueError, match="param tree mismatch"):
        tc.init_from("t", which="latest")


@pytest.mark.slow
def test_cli_generate_max_steps_per_token(fixture_corpus, tmp_path):
    """generate.py --max_steps_per_token scales the generation budget
    with the longest input text (round-5 robustness lever) and caps
    every emitted sample accordingly."""
    import subprocess
    import sys

    from tests.util_env import cpu_env

    corpus = H5Corpus(fixture_corpus)
    cfg = small_cfg(fixture_corpus, tmp_path, save_every=8, num_steps=8)
    Trainer(cfg, corpus, quiet=True).train(num_steps=8)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "generate.py"),
         "--dataset", fixture_corpus, "--model_name", "t",
         "--save_dir", str(tmp_path), "--num_samples", "2",
         "--max_steps_per_token", "5", "--checkpoint", "latest",
         "--no_plots"],
        cwd=repo, env=cpu_env(), capture_output=True, text=True,
        timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "max_steps scaled to" in r.stdout
    longest = max(len(corpus.text(int(i)))
                  for i in corpus.split("valid")[:2])
    out = os.path.join(str(tmp_path), "t", "samples")
    for i in range(2):
        frames = np.load(os.path.join(out, f"sample_{i}_frames.npy"))
        assert frames.shape[0] <= 5 * longest
