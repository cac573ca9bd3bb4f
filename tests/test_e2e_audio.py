"""Full-pipeline test: synthetic audio -> WORLD analysis -> corpus ->
train -> generate -> WORLD synthesis -> wav (SURVEY.md §4 "End-to-end",
BASELINE.json:7-11 configs 1-3/5 shape)."""

import os
import wave

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # real WORLD analysis + training end-to-end

from parrot_tpu.config import (DataConfig, ModelConfig, ParrotConfig,
                               TrainConfig, SampleConfig)
from parrot_tpu.data import H5Corpus, make_audio_fixture_corpus
from parrot_tpu.models import Parrot
from parrot_tpu.sample import Sampler
from parrot_tpu.train import Trainer
from parrot_tpu.vocoder import decode_frames, synthesize, write_wav, mcd


@pytest.fixture(scope="module")
def audio_corpus(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("a") / "audio.h5")
    make_audio_fixture_corpus(path, num_utterances=16, vocab_size=6,
                              min_chars=2, max_chars=4, char_ms=100.0,
                              seed=5)
    return path


def test_audio_fixture_properties(audio_corpus):
    c = H5Corpus(audio_corpus)
    assert c.frame_size == 63
    f = c.features(0)
    vuv = f[:, -1]
    assert ((vuv == 0) | (vuv == 1)).all()
    assert vuv.mean() > 0.5  # vowel-like audio is mostly voiced
    lf0 = f[vuv > 0.5, -2]
    assert np.exp(lf0).min() > 60 and np.exp(lf0).max() < 900


def test_train_generate_synthesize_wav(audio_corpus, tmp_path):
    c = H5Corpus(audio_corpus)
    model_cfg = ModelConfig(frame_size=63, vocab_size=c.vocab_size,
                            embed_dim=8, encoder_dim=8, rnn_h_dim=32,
                            decoder_layers=2, readouts_dim=32,
                            attention_mixtures=2, num_mixtures=2,
                            which_cost="GMM")
    cfg = ParrotConfig(
        model=model_cfg,
        data=DataConfig(dataset=audio_corpus, batch_size=4, seq_size=16,
                        max_text_len=8, prefetch=1),
        train=TrainConfig(model_name="a", save_dir=str(tmp_path),
                          learning_rate=5e-3, num_steps=120, save_every=0,
                          eval_every=0, log_every=1000, num_devices=1),
        sample=SampleConfig(max_steps=80, sampling_bias=2.0))
    tr = Trainer(cfg, c, quiet=True)
    tr.train()

    # generate from a valid-split text
    i = int(c.split("valid")[0])
    text = c.text(i)[None, :]
    mask = np.ones_like(text, np.float32)
    sampler = Sampler(tr.model, tr.params, tr.norm, cfg.sample)
    frames, lengths, phis = sampler.generate(text, mask)
    L = int(lengths[0])
    assert L > 4

    # decode + synthesize to a wav
    f0, sp, ap = decode_frames(np.asarray(frames[0][:L]), fs=16000)
    wav = synthesize(f0, sp, ap, fs=16000)
    assert np.isfinite(wav).all() and np.abs(wav).max() > 0
    p = str(tmp_path / "out.wav")
    write_wav(p, wav, 16000)
    with wave.open(p) as w:
        assert w.getnframes() == len(wav)

    # generated envelope coefficients are in a sane range vs ground truth
    ref = c.features(i)
    d = mcd(ref[:, :57], np.asarray(frames[0][:L])[:, :57], use_dtw=True)
    assert np.isfinite(d)


def test_mcd_report(audio_corpus, tmp_path):
    """Evaluation machinery: teacher-forced + free-running MCD + NLL."""
    from parrot_tpu.config import SampleConfig as SC
    from parrot_tpu.evaluate import mcd_report, teacher_forced_predictions
    c = H5Corpus(audio_corpus)
    model_cfg = ModelConfig(frame_size=63, vocab_size=c.vocab_size,
                            embed_dim=8, encoder_dim=8, rnn_h_dim=16,
                            decoder_layers=2, readouts_dim=16,
                            attention_mixtures=2, num_mixtures=2)
    model = Parrot(model_cfg)
    import jax as _jax
    params = model.init_params(_jax.random.PRNGKey(0))
    norm = {"mean": np.asarray(c.mean), "std": np.asarray(c.std)}
    import jax.numpy as _jnp
    norm = {k: _jnp.asarray(v) for k, v in norm.items()}
    data_cfg = DataConfig(dataset=audio_corpus, batch_size=4, seq_size=16,
                          max_text_len=8, prefetch=1)
    rep = mcd_report(model, params, norm, c, data_cfg,
                     SC(max_steps=32, batch_size=4), num_utterances=2)
    assert np.isfinite(rep["teacher_forced_mcd"])
    assert rep["teacher_forced_mcd"] > 0
    assert np.isfinite(rep["valid_nll"])
    assert np.isfinite(rep["free_running_mcd"])
    # the shuffled-pair calibration baseline (mismatched reference
    # pairs): finite and nonzero — free-running MCD is read against it
    assert np.isfinite(rep["shuffled_pair_mcd"])
    assert rep["shuffled_pair_mcd"] > 0
