"""Activation-diff parity harness tests (SURVEY.md §7 hard-part #2).

The harness exists so the importer name map can be pinned the day a
real reference checkpoint appears: dump_trace records per-layer
activations, diff_trace localizes the first diverging layer. These
tests prove the localization actually works — a perturbation in any
stage is reported at that stage, not just as "outputs differ".
"""

import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from parrot_tpu.config import ModelConfig
from parrot_tpu.data.pipeline import Batch
from parrot_tpu.models import Parrot
from parrot_tpu.train.parity import (diff_trace, dump_trace,
                                     first_divergence, probe_activations)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def tiny_setup(use_speaker=True):
    cfg = ModelConfig(frame_size=5, vocab_size=7, embed_dim=4,
                      encoder_dim=4, rnn_h_dim=8, decoder_layers=3,
                      readouts_dim=8, attention_mixtures=2, num_mixtures=2,
                      use_speaker=use_speaker, num_speakers=3,
                      speaker_dim=2)
    model = Parrot(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    B, S, U, D = 3, 6, 9, cfg.frame_size
    batch = Batch(
        features=rng.normal(size=(B, S, D)).astype(np.float32),
        features_mask=np.ones((B, S), np.float32),
        prev_frame=np.zeros((B, D), np.float32),
        text=rng.integers(1, cfg.vocab_size, (B, U)).astype(np.int32),
        text_mask=np.ones((B, U), np.float32),
        speaker=rng.integers(0, 3, (B,)).astype(np.int32),
        start_flag=np.float32(1.0),
    )
    norm = {"mean": np.zeros(D, np.float32), "std": np.ones(D, np.float32)}
    return model, params, norm, batch


def test_trace_roundtrip_zero_error(tmp_path):
    model, params, norm, batch = tiny_setup()
    path = str(tmp_path / "t.npz")
    dump_trace(path, model, params, norm, batch)
    report = diff_trace(path, model, params)
    assert set(report) == {"embed", "enc", "dec_h1", "dec_h2", "dec_h3",
                           "phi", "w", "readout", "head_raw"}
    for name, r in report.items():
        assert r["max_abs_err"] <= 1e-6, (name, r)
    assert first_divergence(report) == ""


@pytest.mark.parametrize("target,expected_first", [
    ("embed", "embed"),       # first stage
    ("attn", "phi"),          # attention params -> phi diverges first
    ("readout", "readout"),   # post-scan head stages
    ("head", "head_raw"),
])
def test_diff_localizes_perturbed_stage(tmp_path, target, expected_first):
    model, params, norm, batch = tiny_setup()
    path = str(tmp_path / "t.npz")
    dump_trace(path, model, params, norm, batch)
    import copy
    bad = copy.deepcopy(jax.tree.map(np.asarray, params))
    # perturb every array leaf of the targeted stage's subtree
    bad[target] = jax.tree.map(lambda x: x + 0.5, bad[target])
    report = diff_trace(path, model, bad)
    assert first_divergence(report, tol=1e-4) == expected_first, report


def test_diff_localizes_decoder_layer(tmp_path):
    """A perturbation in decoder layer 2 must leave layer 1 (and the
    attention, which hangs off layer 1) clean."""
    model, params, norm, batch = tiny_setup()
    path = str(tmp_path / "t.npz")
    dump_trace(path, model, params, norm, batch)
    import copy
    bad = copy.deepcopy(jax.tree.map(np.asarray, params))
    bad["dec"][1]["wh"] = bad["dec"][1]["wh"] + 0.5
    report = diff_trace(path, model, bad)
    for clean in ("embed", "enc", "dec_h1", "phi", "w"):
        assert report[clean]["max_abs_err"] <= 1e-6, (clean, report[clean])
    assert first_divergence(report, tol=1e-4) == "dec_h2"


@pytest.mark.slow
def test_cli_dump_and_diff(tmp_path):
    """scripts/import_checkpoint.py --dump_trace / --diff on a real
    checkpoint directory; exit 0 on parity, nonzero on a broken map."""
    from parrot_tpu.data import H5Corpus, make_fixture_corpus
    from parrot_tpu.train.checkpoint import CheckpointManager
    from parrot_tpu.train.optim import adam_init
    from parrot_tpu.config import ParrotConfig
    import dataclasses

    corpus_path = str(tmp_path / "fix.h5")
    make_fixture_corpus(corpus_path, num_utterances=12, vocab_size=9,
                        frame_size=6, frames_per_char=3, seed=2)
    corpus = H5Corpus(corpus_path)
    cfg = ParrotConfig()
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, frame_size=corpus.frame_size,
        vocab_size=corpus.vocab_size, rnn_h_dim=8, encoder_dim=4,
        embed_dim=4, readouts_dim=8, decoder_layers=2,
        attention_mixtures=2, num_mixtures=2))
    model = Parrot(cfg.model)
    params = model.init_params(jax.random.PRNGKey(0))
    save_dir = str(tmp_path / "sm")
    mgr = CheckpointManager(save_dir, "m")
    norm = {"mean": np.asarray(corpus.mean), "std": np.asarray(corpus.std)}
    mgr.save(0, {"params": params, "opt_state": adam_init(params),
                 "norm": norm}, meta={"config": cfg.to_json()})

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    cfg_path = str(tmp_path / "cfg.json")
    open(cfg_path, "w").write(cfg.to_json())
    trace = str(tmp_path / "trace.npz")
    base = [sys.executable, "scripts/import_checkpoint.py",
            "--dataset", corpus_path, "--model_name", "m",
            "--save_dir", save_dir, "--config", cfg_path,
            "--batch_size", "2", "--seq_size", "8"]
    r = subprocess.run(base + ["--dump_trace", trace], cwd=REPO, env=env,
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    r = subprocess.run(base + ["--diff", trace], cwd=REPO, env=env,
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "parity OK" in r.stdout
