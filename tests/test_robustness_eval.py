"""scripts/robustness_eval.py mechanics on a tiny rich-corpus model
(VERDICT r4 next-step #2 harness): the per-length loop must render
matched GT realizations, free-run the model, extract attention-
trajectory statistics, and emit well-formed JSON rows whose
calibration columns (same-length aleatoric floor, shuffled-pair) are
finite and ordered sanely. Quality numbers at tiny scale are
meaningless — this pins the HARNESS, the flagship numbers live in
docs/PERFORMANCE.md."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # trains a tiny model + WORLD renders

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_robustness_eval_harness(tmp_path):
    from parrot_tpu.config import (DataConfig, ModelConfig, ParrotConfig,
                                   SampleConfig, TrainConfig)
    from parrot_tpu.data import H5Corpus
    from parrot_tpu.data.fixture import make_rich_corpus
    from parrot_tpu.train import Trainer

    path = str(tmp_path / "rich.h5")
    make_rich_corpus(path, num_utterances=24, vocab_size=8,
                     num_speakers=3, min_chars=3, max_chars=6, seed=11)
    c = H5Corpus(path)
    cfg = ParrotConfig(
        model=ModelConfig(frame_size=63, vocab_size=c.vocab_size,
                          embed_dim=8, encoder_dim=8, rnn_h_dim=32,
                          decoder_layers=2, readouts_dim=32,
                          attention_mixtures=2, num_mixtures=2,
                          use_speaker=True, num_speakers=3,
                          speaker_dim=4, which_cost="GMM"),
        data=DataConfig(dataset=path, batch_size=4, seq_size=16,
                        max_text_len=8, prefetch=1),
        train=TrainConfig(model_name="r", save_dir=str(tmp_path),
                          learning_rate=5e-3, num_steps=60,
                          save_every=0, eval_every=30, log_every=1000,
                          track_best=True, num_devices=1),
        sample=SampleConfig(max_steps=64))
    Trainer(cfg, c, quiet=True).train()

    out = str(tmp_path / "rows.jsonl")
    from tests.util_env import cpu_env
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/robustness_eval.py"),
         "--model_name", "r", "--save_dir", str(tmp_path),
         "--lengths", "4,6", "--per_length", "2",
         "--frames_per_token_cap", "30",
         "--corpus_seed", "11", "--vocab_size", "8",
         "--num_speakers", "3", "--char_ms", "100.0",
         "--out", out],
        cwd=REPO, env=cpu_env(), capture_output=True, text=True,
        timeout=1200)
    assert r.returncode == 0, r.stdout + r.stderr

    rows = [json.loads(x) for x in open(out)]
    assert [row["U"] for row in rows] == [4, 6]
    for row in rows:
        assert row["n"] == 2
        assert 0.0 <= row["completion_rate"] <= 1.0
        assert 0.0 <= row["coverage_mean"] <= 1.2
        assert 0.0 <= row["mono_violation_rate"] <= 1.0
        assert row["max_stall_frames"] >= 0
        # calibration columns: the same-length floor and shuffled-pair
        # references are model-free — must always be finite, and
        # text-unrelated pairs must be worse than matched realizations
        assert np.isfinite(row["floor_mcd"]) and row["floor_mcd"] > 0
        assert np.isfinite(row["shuffled_mcd"])
        assert row["shuffled_mcd"] > row["floor_mcd"]
