"""Char2Wav joint end-to-end fine-tuning (models/char2wav.py,
train_joint.py, data JointBatch path).

The reference only exposes a conditioning-feature hook to an external
SampleRNN (SURVEY.md §2.3 N3); joint training is the Char2Wav paper's
fine-tuning stage, possible here because both halves are native. These
tests pin: the aligned joint data stream, the differentiable frame
predictions, gradient flow across the conditioning boundary (and its
stop-gradient ablation), exact TBPTT carry of the joint state, and the
CLI train -> export -> generate-ready loop.
"""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parrot_tpu.config import DataConfig, ModelConfig, SampleRNNConfig
from parrot_tpu.data import H5Corpus
from parrot_tpu.data.pipeline import Batch, JointBatch, parrot_stream
from parrot_tpu.models.char2wav import Char2Wav
from parrot_tpu.models.parrot import Parrot

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def audio_corpus(tmp_path_factory):
    from parrot_tpu.data.fixture import make_audio_fixture_corpus
    path = str(tmp_path_factory.mktemp("joint") / "audio.h5")
    make_audio_fixture_corpus(path, num_utterances=10, vocab_size=5)
    return H5Corpus(path)


def _small_model(corpus, which_cost="GMM", num_mixtures=2):
    pcfg = ModelConfig(frame_size=corpus.frame_size,
                       vocab_size=corpus.vocab_size,
                       embed_dim=8, encoder_dim=8, rnn_h_dim=16,
                       decoder_layers=2, readouts_dim=16,
                       attention_mixtures=2, which_cost=which_cost,
                       num_mixtures=num_mixtures)
    vcfg = SampleRNNConfig(rnn_dim=16, mlp_dim=16, embed_dim=4,
                           cond_dim=corpus.frame_size,
                           sample_rate=corpus.sample_rate,
                           frame_period_ms=(corpus.audio_hop
                                            / corpus.sample_rate * 1000.0))
    return Char2Wav(pcfg, vcfg)


def _norm(corpus):
    return {"mean": jnp.asarray(corpus.mean), "std": jnp.asarray(corpus.std)}


# ---------------------------------------------------------------------------
# joint data stream
# ---------------------------------------------------------------------------

def test_joint_stream_aligned_audio(audio_corpus):
    c = audio_corpus
    hop = c.audio_hop
    dcfg = DataConfig(batch_size=4, seq_size=8, max_text_len=16)
    segs = list(parrot_stream(c, dcfg, split="train", training=False,
                              epochs=1, with_audio=True))
    assert segs and isinstance(segs[0], JointBatch)
    idx = list(c.split("train"))
    # first segment of the first batch: rows are the first 4 train
    # utterances in deterministic order
    jb = segs[0]
    assert float(jb.frames.start_flag) == 1.0
    for row in range(4):
        i = idx[row]
        f, a = c.features(i), c.audio(i)
        t = min(f.shape[0], 8)
        np.testing.assert_array_equal(jb.frames.features[row, :t], f[:t])
        np.testing.assert_array_equal(jb.audio[row, :t * hop], a[:t * hop])
    # padded audio region is mu-law silence everywhere in the stream
    for jb in segs:
        pad = np.repeat(jb.frames.features_mask == 0, hop, axis=1)
        assert (jb.audio[pad] == 128).all()
        assert jb.audio.shape == (4, 8 * hop)


def test_joint_stream_requires_audio(tmp_path):
    from parrot_tpu.data.fixture import make_fixture_corpus
    path = str(tmp_path / "noaudio.h5")
    make_fixture_corpus(path, num_utterances=8)
    c = H5Corpus(path)
    dcfg = DataConfig(batch_size=2, seq_size=8)
    with pytest.raises(ValueError, match="no /audio"):
        next(iter(parrot_stream(c, dcfg, with_audio=True)))


# ---------------------------------------------------------------------------
# differentiable frame predictions
# ---------------------------------------------------------------------------

def _probe_batch(corpus, B=2, S=6, U=12, seed=0):
    dcfg = DataConfig(batch_size=B, seq_size=S, max_text_len=U)
    return next(iter(parrot_stream(corpus, dcfg, split="train",
                                   training=False, epochs=1,
                                   with_audio=True)))


def test_pred_frames_mse_identity(audio_corpus):
    """For the MSE head, the reported loss must equal the masked MSE
    between normalized targets and the normalized pred_frames — pinning
    that pred_frames IS the head output, correctly de-normalized."""
    model = _small_model(audio_corpus, which_cost="MSE")
    params = model.parrot.init_params(jax.random.PRNGKey(0))
    norm = _norm(audio_corpus)
    jb = _probe_batch(audio_corpus)
    loss, _, m = model.parrot.compute_cost(params, norm, jb.frames, None,
                                           with_predictions=True)
    pred = m["pred_frames"]                                   # (B, S, D) raw
    assert pred.shape == jb.frames.features.shape
    xn = (jb.frames.features - np.asarray(norm["mean"])) / \
        np.asarray(norm["std"])
    pn = (np.asarray(pred) - np.asarray(norm["mean"])) / \
        np.asarray(norm["std"])
    mask = jb.frames.features_mask
    manual = (((xn - pn) ** 2).sum(-1) * mask).sum() / mask.sum()
    np.testing.assert_allclose(float(loss), manual, rtol=1e-5)


def test_pred_frames_gmm_single_component_is_mu(audio_corpus):
    """With M=1 the mixture expectation is the lone mu: biased sampling
    at huge bias (sigma -> 0) must land on pred_frames."""
    model = _small_model(audio_corpus, which_cost="GMM", num_mixtures=1)
    params = model.parrot.init_params(jax.random.PRNGKey(1))
    norm = _norm(audio_corpus)
    jb = _probe_batch(audio_corpus)
    _, _, m = model.parrot.compute_cost(params, norm, jb.frames, None,
                                        with_predictions=True)
    pred = m["pred_frames"]
    # recompute mu via the sampler-facing pieces: scan_decoder on the
    # same normalized teacher-forced inputs
    from parrot_tpu.nn.mdn import split_gmm_params
    batch = jb.frames
    B, S, D = batch.features.shape
    state = model.parrot.init_state(B, batch.text.shape[1])
    state = state._replace(enc=model.parrot.encode(
        params, batch.text, batch.text_mask))
    xn = (batch.features - norm["mean"]) / norm["std"]
    prev = (batch.prev_frame - norm["mean"]) / norm["std"]
    prev = (1.0 - batch.start_flag) * prev
    x_tgt = xn.transpose(1, 0, 2)
    x_in = jnp.concatenate([prev[None], x_tgt[:-1]], axis=0)
    spk = model.parrot._speaker_vec(params, batch.speaker)
    raw, _, _ = model.parrot.scan_decoder(
        params, state, x_in, batch.features_mask.T, batch.text_mask, spk)
    mu, _, _ = split_gmm_params(raw, D, 1)
    mu_raw = (mu[:, :, 0] * norm["std"] + norm["mean"]).transpose(1, 0, 2)
    np.testing.assert_allclose(np.asarray(pred), np.asarray(mu_raw),
                               rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# gradient flow across the conditioning boundary
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_joint_gradients_reach_reader_and_detach_ablation(audio_corpus):
    model = _small_model(audio_corpus)
    params = model.init_params(jax.random.PRNGKey(2))
    norm = _norm(audio_corpus)
    jb = _probe_batch(audio_corpus)

    def audio_only_loss(p, detach):
        loss, _, m = model.compute_cost(p, norm, jb, None,
                                        frame_loss_weight=0.0,
                                        audio_loss_weight=1.0,
                                        detach_frames=detach)
        return loss

    g = jax.grad(audio_only_loss)(params, False)
    norms = jax.tree.map(lambda x: float(jnp.abs(x).sum()), g)
    flat_p = jax.tree.leaves(norms["parrot"])
    flat_v = jax.tree.leaves(norms["vocoder"])
    # the vocoder NLL must reach the reader THROUGH the predicted frames
    assert sum(1 for x in flat_p if x > 0) > len(flat_p) // 2, norms["parrot"]
    assert all(np.isfinite(flat_p)) and any(x > 0 for x in flat_v)

    g0 = jax.grad(audio_only_loss)(params, True)
    flat_p0 = jax.tree.leaves(
        jax.tree.map(lambda x: float(jnp.abs(x).sum()), g0["parrot"]))
    assert all(x == 0.0 for x in flat_p0), "detach_frames leaked gradients"


# ---------------------------------------------------------------------------
# exact joint TBPTT carry
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_joint_two_segments_match_full(audio_corpus):
    """Summed (unreduced) losses over two half segments with carried
    JointState == one full segment, for both halves of the objective."""
    model = _small_model(audio_corpus)
    params = model.init_params(jax.random.PRNGKey(3))
    norm = _norm(audio_corpus)
    hop = audio_corpus.audio_hop
    jb = _probe_batch(audio_corpus, B=2, S=8)
    b = jb.frames
    S = 8
    h = S // 2

    def half(lo, hi, prev, start):
        fb = Batch(features=b.features[:, lo:hi],
                   features_mask=b.features_mask[:, lo:hi],
                   prev_frame=prev, text=b.text, text_mask=b.text_mask,
                   speaker=b.speaker, start_flag=np.float32(start))
        return JointBatch(frames=fb, audio=jb.audio[:, lo * hop:hi * hop])

    _, st_full, m_full = model.compute_cost(params, norm, jb, None)
    jb1 = half(0, h, b.prev_frame, 1.0)
    jb2 = half(h, S, b.features[:, h - 1], 0.0)
    _, st1, m1 = model.compute_cost(params, norm, jb1, None)
    _, st2, m2 = model.compute_cost(params, norm, jb2, st1)

    for key, n in (("frame_loss", "frames"), ("audio_loss", "samples")):
        full = float(m_full[key]) * float(m_full[n])
        split = (float(m1[key]) * float(m1[n])
                 + float(m2[key]) * float(m2[n]))
        np.testing.assert_allclose(split, full, rtol=2e-5)
    # carried states converge to the same point
    for a, c in zip(jax.tree.leaves(st_full), jax.tree.leaves(st2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# CLI: fresh joint train -> resume -> exported halves drive generate
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_joint_input_frames_passthrough(audio_corpus):
    """The scheduled-sampling hook: input_frames=GT features must be
    loss-identical to the default teacher-forced path (the hook only
    changes the shifted INPUT, never the targets), and genuinely
    different inputs must change the loss — pinning that the kwarg
    reaches the reader and does what Parrot.compute_cost documents."""
    model = _small_model(audio_corpus)
    params = model.init_params(jax.random.PRNGKey(0))
    norm = _norm(audio_corpus)
    jb = _probe_batch(audio_corpus)
    base, _, _ = model.compute_cost(params, norm, jb, None)
    same, _, _ = model.compute_cost(params, norm, jb, None,
                                    input_frames=jb.frames.features)
    np.testing.assert_allclose(float(base), float(same), rtol=1e-6)
    other, _, _ = model.compute_cost(
        params, norm, jb, None,
        input_frames=jnp.zeros_like(jb.frames.features))
    assert abs(float(other) - float(base)) > 1e-6


@pytest.mark.slow
def test_cli_train_joint_scheduled_sampling_and_meta(tmp_path,
                                                     audio_corpus):
    """train_joint.py with the round-5 fine-tune knobs (scheduled
    sampling, per-half reader LR scale, warmup) runs end-to-end, and
    config.json records EVERY joint-entry hyperparameter (ADVICE r4:
    the round-4 run was not reproducible from its artifacts)."""
    import json

    from tests.util_env import cpu_env
    env = cpu_env()
    save = str(tmp_path / "sm")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "train_joint.py"),
         "--dataset", audio_corpus.path, "--model_name", "c2wss",
         "--save_dir", save, "--batch_size", "4", "--seq_size", "8",
         "--max_text_len", "16", "--num_steps", "6", "--eval_every", "0",
         "--save_every", "0", "--log_every", "2", "--num_devices", "4",
         "--rnn_h_dim", "16", "--readouts_dim", "16",
         "--encoder_dim", "8", "--embed_dim", "8",
         "--decoder_layers", "2", "--attention_mixtures", "2",
         "--num_mixtures", "2", "--vocoder_rnn_dim", "24",
         "--vocoder_mlp_dim", "24", "--vocoder_embed_dim", "8",
         "--scheduled_sampling_rate", "0.5",
         "--scheduled_sampling_bias", "0.25",
         "--reader_lr_scale", "0.1", "--warmup_steps", "4"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout + r.stderr
    cfg = json.load(open(os.path.join(save, "c2wss", "config.json")))
    j = cfg["joint"]
    assert j["scheduled_sampling_rate"] == 0.5
    assert j["reader_lr_scale"] == 0.1
    assert j["warmup_steps"] == 4
    assert j["learning_rate"] == 1e-4
    assert j["frame_loss_weight"] == 1.0
    # warmup: the logged lr at step 2 is half the base reader lr
    lines = [json.loads(x) for x in open(
        os.path.join(save, "c2wss", "metrics.jsonl"))]
    tr = [x for x in lines if x["kind"] == "train" and x["step"] == 2]
    assert tr and abs(tr[0]["lr"] - 1e-4 * 0.1 * 2 / 4) < 1e-9


def test_cli_train_joint_export_and_generate(tmp_path, audio_corpus):
    from tests.util_env import cpu_env
    env = cpu_env()
    save = str(tmp_path / "sm")
    args = ["--dataset", audio_corpus.path, "--model_name", "c2w",
            "--save_dir", save, "--batch_size", "4", "--seq_size", "8",
            "--max_text_len", "16", "--eval_every", "6",
            "--save_every", "10", "--log_every", "5",
            "--num_devices", "4",
            "--rnn_h_dim", "16", "--readouts_dim", "16",
            "--encoder_dim", "8", "--embed_dim", "8",
            "--decoder_layers", "2", "--attention_mixtures", "2",
            "--num_mixtures", "2", "--vocoder_rnn_dim", "24",
            "--vocoder_mlp_dim", "24", "--vocoder_embed_dim", "8"]
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "train_joint.py"),
         "--num_steps", "12"] + args,
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout + r.stderr
    assert os.path.exists(os.path.join(save, "c2w", "best"))
    # exported halves exist in the standard formats
    assert os.path.exists(os.path.join(save, "c2w_parrot", "best"))
    assert os.path.exists(os.path.join(save, "c2w_vocoder", "best"))

    r2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "train_joint.py"),
         "--num_steps", "16", "--resume"] + args,
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert r2.returncode == 0, r2.stdout + r2.stderr
    assert "step=16" in r2.stdout

    # the exported halves load through the standard inference loaders
    from parrot_tpu.train.checkpoint import (load_for_inference,
                                             load_vocoder_for_inference)
    pm, pp, pn, pcfg, _ = load_for_inference(save, "c2w_parrot", "best")
    vm, vp, vn, vcfg, _ = load_vocoder_for_inference(save, "c2w_vocoder",
                                                     "best")
    assert pcfg.model.frame_size == vcfg.cond_dim
    # and generate.py runs text -> frames -> NEURAL waveform end-to-end
    r3 = subprocess.run(
        [sys.executable, os.path.join(REPO, "generate.py"),
         "--model_name", "c2w_parrot", "--save_dir", save,
         "--dataset", audio_corpus.path, "--num_samples", "1",
         "--max_steps", "12", "--neural_vocoder", "c2w_vocoder",
         "--samples_name", "joint", "--no_plots", "--seed", "3"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert r3.returncode == 0, r3.stdout + r3.stderr
    wavs = [f for f in os.listdir(os.path.join(save, "c2w_parrot", "joint"))
            if f.endswith(".wav")]
    assert wavs, r3.stdout


@pytest.mark.slow
def test_cli_train_joint_from_pretrained_halves(tmp_path, audio_corpus):
    """--parrot_init/--vocoder_init load pretrained halves (constructed
    checkpoints: the loading path is what's under test)."""
    import dataclasses as dc
    import json

    from parrot_tpu.config import ParrotConfig, TrainConfig
    from parrot_tpu.models.samplernn import SampleRNN
    from parrot_tpu.train.checkpoint import CheckpointManager

    save = str(tmp_path / "sm")
    c = audio_corpus
    model = _small_model(c)
    norm = {"mean": np.asarray(c.mean), "std": np.asarray(c.std)}
    pfull = ParrotConfig(model=model.pcfg, train=TrainConfig())
    pp = Parrot(model.pcfg).init_params(jax.random.PRNGKey(7))
    CheckpointManager(save, "reader").save(
        5, {"params": pp, "norm": norm},
        meta={"config": pfull.to_json()}, is_best=True)
    vp = SampleRNN(model.vcfg).init_params(jax.random.PRNGKey(8))
    CheckpointManager(save, "voc").save(
        7, {"params": vp, "norm": norm},
        meta={"config": {"samplernn": dc.asdict(model.vcfg)}}, is_best=True)

    from tests.util_env import cpu_env
    env = cpu_env()
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "train_joint.py"),
         "--dataset", c.path, "--model_name", "c2wp", "--save_dir", save,
         "--parrot_init", "reader", "--vocoder_init", "voc",
         "--batch_size", "4", "--seq_size", "8", "--max_text_len", "16",
         "--num_devices", "4",
         "--num_steps", "6", "--eval_every", "0", "--save_every", "0",
         "--log_every", "2", "--detach_frames"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "reader 'reader' loaded (step 5)" in r.stdout
    assert "vocoder 'voc' loaded (step 7)" in r.stdout
    cfg = json.load(open(os.path.join(save, "c2wp", "config.json")))
    assert cfg["parrot"]["model"]["rnn_h_dim"] == model.pcfg.rnn_h_dim


@pytest.mark.slow
def test_resume_keeps_init_norm_and_mismatched_vocoder_rejected(
        tmp_path, audio_corpus):
    """Two review-fix pins: (a) --resume restores the norm stats saved
    at init time even when the --*_init flags are dropped; (b) a
    vocoder pretrained under different conditioning stats is rejected
    with a clear error instead of silently degrading."""
    import dataclasses as dc
    import json

    from parrot_tpu.config import ParrotConfig, TrainConfig
    from parrot_tpu.models.samplernn import SampleRNN
    from parrot_tpu.train.checkpoint import CheckpointManager
    from tests.util_env import cpu_env

    save = str(tmp_path / "sm")
    c = audio_corpus
    model = _small_model(c)
    # deliberately NOT the corpus stats — the thing resume must keep
    custom = {"mean": np.asarray(c.mean) + 0.5,
              "std": np.asarray(c.std) * 2.0}
    pfull = ParrotConfig(model=model.pcfg, train=TrainConfig())
    pp = Parrot(model.pcfg).init_params(jax.random.PRNGKey(7))
    CheckpointManager(save, "reader").save(
        5, {"params": pp, "norm": custom},
        meta={"config": pfull.to_json()}, is_best=True)
    vp = SampleRNN(model.vcfg).init_params(jax.random.PRNGKey(8))
    CheckpointManager(save, "voc").save(
        7, {"params": vp, "norm": custom},
        meta={"config": {"samplernn": dc.asdict(model.vcfg)}}, is_best=True)
    # a second vocoder under DIFFERENT stats: must be rejected
    CheckpointManager(save, "voc_bad").save(
        7, {"params": vp, "norm": {"mean": np.asarray(c.mean),
                                   "std": np.asarray(c.std)}},
        meta={"config": {"samplernn": dc.asdict(model.vcfg)}}, is_best=True)

    env = cpu_env()
    base = [sys.executable, os.path.join(REPO, "train_joint.py"),
            "--dataset", c.path, "--model_name", "c2wn", "--save_dir", save,
            "--batch_size", "4", "--seq_size", "8", "--max_text_len", "16",
            "--num_devices", "4", "--eval_every", "0", "--save_every", "0",
            "--log_every", "2"]

    r_bad = subprocess.run(
        base + ["--parrot_init", "reader", "--vocoder_init", "voc_bad",
                "--num_steps", "2"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert r_bad.returncode != 0
    assert "different conditioning" in (r_bad.stdout + r_bad.stderr)

    r1 = subprocess.run(
        base + ["--parrot_init", "reader", "--vocoder_init", "voc",
                "--num_steps", "2"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert r1.returncode == 0, r1.stdout + r1.stderr
    # resume WITHOUT the init flags: the custom stats must survive
    r2 = subprocess.run(
        base + ["--num_steps", "4", "--resume"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert r2.returncode == 0, r2.stdout + r2.stderr
    root = os.path.join(save, "c2wn")
    step_dir = os.path.join(
        root, open(os.path.join(root, "latest")).read().strip())
    with np.load(os.path.join(step_dir, "arrays.npz")) as z:
        np.testing.assert_allclose(z["norm/mean"], custom["mean"],
                                   rtol=1e-6)
        np.testing.assert_allclose(z["norm/std"], custom["std"], rtol=1e-6)
