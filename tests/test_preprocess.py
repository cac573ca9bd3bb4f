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
    env.pop("PALLAS_AXON_POOL_IPS", None)  # see tests/util_env.py
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


def _tone(i, fs=16000, rng=None):
    t = np.arange(int(0.25 * fs)) / fs
    x = np.sin(2 * np.pi * (110 + 25 * i) * t) * 0.5
    if rng is not None:
        x += 0.01 * rng.normal(size=len(x))
    return x


@pytest.fixture(scope="module")
def vctk_root(tmp_path_factory):
    """Fixture mimicking the real VCTK-Corpus on-disk layout."""
    root = tmp_path_factory.mktemp("VCTK-Corpus")
    rng = np.random.default_rng(1)
    fs = 16000
    i = 0
    for spk in ("p225", "p226"):
        os.makedirs(root / "txt" / spk)
        os.makedirs(root / "wav48" / spk)
        for u in range(1, 4):
            stem = f"{spk}_{u:03d}"
            (root / "txt" / spk / f"{stem}.txt").write_text(
                f"Sentence number {u} from {spk}.\n")
            write_wav(str(root / "wav48" / spk / f"{stem}.wav"),
                      _tone(i, fs, rng), fs)
            i += 1
    # a transcript with no wav (VCTK ships a few) must be skipped
    (root / "txt" / "p225" / "p225_999.txt").write_text("orphan\n")
    return str(root)


@pytest.fixture(scope="module")
def blizzard_root(tmp_path_factory):
    """Fixture mimicking a Blizzard/festival-style release."""
    root = tmp_path_factory.mktemp("blizzard")
    rng = np.random.default_rng(2)
    fs = 16000
    os.makedirs(root / "wavs")
    lines = []
    for u in range(4):
        utt = f"nancy_{u:04d}"
        write_wav(str(root / "wavs" / f"{utt}.wav"), _tone(u, fs, rng), fs)
        lines.append(f'( {utt} "Prompt   text number {u}." )')
    # an entry whose wav is missing must be skipped
    lines.append('( nancy_9999 "missing wav" )')
    (root / "prompts.data").write_text("\n".join(lines) + "\n")
    return str(root)


def test_vctk_layout(vctk_root, tmp_path):
    out = str(tmp_path / "vctk.h5")
    r = run_script(["--corpus", "vctk", "--root", vctk_root, "--out", out,
                    "--valid_frac", "0.25"])
    assert r.returncode == 0, r.stderr[-2000:]
    c = H5Corpus(out)
    assert c.num_utterances == 6          # orphan transcript skipped
    assert c.num_speakers == 2            # p225 -> 0, p226 -> 1
    spk = [c.speaker(i) for i in range(6)]
    assert sorted(set(spk)) == [0, 1]
    assert list(c._f.attrs["speaker_names"]) == ["p225", "p226"]


def test_blizzard_layout(blizzard_root, tmp_path):
    out = str(tmp_path / "bliz.h5")
    r = run_script(["--corpus", "blizzard", "--root", blizzard_root,
                    "--out", out, "--valid_frac", "0.25"])
    assert r.returncode == 0, r.stderr[-2000:]
    c = H5Corpus(out)
    assert c.num_utterances == 4          # missing-wav prompt skipped
    assert c.num_speakers == 1
    assert len(c.text(0)) > 0


def test_layout_walkers_direct(vctk_root, blizzard_root):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import preprocess as pp
    entries, names = pp.walk_vctk(vctk_root)
    assert len(entries) == 6 and names == ["p225", "p226"]
    assert all(os.path.exists(w) for w, _, _ in entries)
    assert {s for _, _, s in entries} == {0, 1}
    entries, names = pp.walk_blizzard(blizzard_root)
    assert len(entries) == 4 and names == ["blizzard"]
    # whitespace in prompts collapses to single spaces
    assert entries[0][1].startswith("Prompt text number")
