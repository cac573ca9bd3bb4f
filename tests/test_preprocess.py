"""scripts/preprocess.py end-to-end: wav dir + transcript -> corpus,
char and phoneme modes, then train.py compatibility of the output."""

import os
import subprocess
import sys

import numpy as np
import pytest

from parrot_tpu.data import H5Corpus
from parrot_tpu.vocoder import write_wav

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def wav_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("wavs")
    rng = np.random.default_rng(0)
    fs = 16000
    for i in range(4):
        t = np.arange(int(0.3 * fs)) / fs
        f0 = 120 + 30 * i
        x = np.sin(2 * np.pi * f0 * t) * 0.5
        x += 0.01 * rng.normal(size=len(x))
        write_wav(str(d / f"utt{i}.wav"), x, fs)
    with open(d / "meta.tsv", "w") as f:
        for i in range(4):
            f.write(f"utt{i}\thello world {i}\t{i % 2}\n")
    with open(d / "meta_ph.tsv", "w") as f:
        for i in range(4):
            f.write(f"utt{i}\thh ax l ow w er l d\t0\n")
    return str(d)


def run_script(args):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "preprocess.py")]
        + args, capture_output=True, text=True, env=env)


def test_char_mode(wav_dir, tmp_path):
    out = str(tmp_path / "chars.h5")
    r = run_script(["--wav_dir", wav_dir, "--transcript",
                    f"{wav_dir}/meta.tsv", "--out", out])
    assert r.returncode == 0, r.stderr[-2000:]
    c = H5Corpus(out)
    assert c.num_utterances == 4
    assert c.frame_size == 63
    assert c.num_speakers == 2
    # voiced sine input -> mostly voiced frames with sane f0
    f = c.features(0)
    assert f[:, -1].mean() > 0.5
    import json
    charset = json.loads(c._f.attrs["charset"])
    assert isinstance(charset, str) and "h" in charset


def test_phoneme_mode(wav_dir, tmp_path):
    out = str(tmp_path / "ph.h5")
    r = run_script(["--wav_dir", wav_dir, "--transcript",
                    f"{wav_dir}/meta_ph.tsv", "--out", out, "--phonemes"])
    assert r.returncode == 0, r.stderr[-2000:]
    c = H5Corpus(out)
    import json
    inv = json.loads(c._f.attrs["charset"])
    assert isinstance(inv, list) and "ax" in inv
    # all 8 tokens encoded (inventory covers them)
    assert c.text_lengths[0] == 8
    assert c.vocab_size == len(inv) + 1
