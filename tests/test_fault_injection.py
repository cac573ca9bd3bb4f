"""Kill-and-resume fault injection (SURVEY.md §5 "Failure detection ...
fault injection = kill-and-resume test in CI"): SIGTERM a real train.py
process mid-run, then --resume continues from the flushed checkpoint."""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # SIGTERMs a live train.py subprocess

from parrot_tpu.data import make_fixture_corpus

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env():
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # sitecustomize would attach
    # the child to the real chip otherwise (tests/util_env.py)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=1")
    return env


def _train_cmd(corpus, save_dir, steps, resume=False):
    cmd = [sys.executable, os.path.join(REPO, "train.py"),
           "--model_name", "fi", "--dataset", corpus,
           "--save_dir", save_dir,
           "--rnn_h_dim", "16", "--decoder_layers", "2",
           "--encoder_dim", "8", "--embed_dim", "8",
           "--readouts_dim", "16", "--attention_mixtures", "2",
           "--num_mixtures", "2", "--batch_size", "8", "--seq_size", "12",
           "--max_text_len", "10", "--num_steps", str(steps),
           "--eval_every", "0", "--log_every", "5", "--save_every", "0",
           "--num_devices", "1"]
    if resume:
        cmd.append("--resume")
    return cmd


@pytest.mark.timeout(600)
def test_sigterm_mid_training_then_resume(tmp_path):
    corpus = str(tmp_path / "c.h5")
    make_fixture_corpus(corpus, num_utterances=24, vocab_size=8,
                        frame_size=6, frames_per_char=3, seed=4)
    save_dir = str(tmp_path / "s")

    # start a long run, kill it once it has logged some steps
    p = subprocess.Popen(_train_cmd(corpus, save_dir, steps=100000),
                         env=_env(), stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
    metrics = os.path.join(save_dir, "fi", "metrics.jsonl")
    deadline = time.time() + 240
    seen_step = 0
    while time.time() < deadline:
        if os.path.exists(metrics):
            recs = [json.loads(l) for l in open(metrics)]
            steps = [r["step"] for r in recs if r["kind"] == "train"]
            if steps:
                seen_step = max(steps)
                break
        time.sleep(0.5)
    assert seen_step > 0, "training never logged a step"
    p.send_signal(signal.SIGTERM)
    out, _ = p.communicate(timeout=120)
    assert p.returncode == 0, f"SIGTERM exit not clean:\n{out[-2000:]}"

    recs = [json.loads(l) for l in open(metrics)]
    assert any(r["kind"] == "preempted" for r in recs), \
        "no preemption record logged"
    ckpts = [d for d in os.listdir(os.path.join(save_dir, "fi"))
             if d.startswith("step_")]
    assert ckpts, "no checkpoint flushed on SIGTERM"

    # resume for a few more steps
    last = max(int(d.split("_")[1]) for d in ckpts)
    r = subprocess.run(_train_cmd(corpus, save_dir, steps=last + 5,
                                  resume=True),
                       env=_env(), capture_output=True, text=True,
                       timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    recs = [json.loads(l) for l in open(metrics)]
    assert any(r_["kind"] == "resume" and r_["step"] == last
               for r_ in recs), "resume did not pick up the kill checkpoint"
