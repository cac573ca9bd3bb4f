#!/usr/bin/env python
"""Preprocess a corpus of wav files into a parrot-tpu HDF5 corpus.

Rebuilds the reference's per-corpus preprocessing scripts (SURVEY.md
§3.4: wav -> resample -> WORLD analysis -> coded features -> HDF5 +
normalization stats). Input: a directory of wavs plus a transcript TSV
with lines `<wav-stem>\t<text>[\t<speaker-id>]`.

  python scripts/preprocess.py --wav_dir wavs/ --transcript meta.tsv \
      --out data/blizzard.h5
  # phoneme inputs: the text column holds space-separated phoneme tokens
  python scripts/preprocess.py ... --phonemes
"""

import argparse
import os
import sys
import wave

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from parrot_tpu.data.hdf5_dataset import write_corpus  # noqa: E402
from parrot_tpu.vocoder import analyze, code_frames  # noqa: E402

DEFAULT_CHARSET = " abcdefghijklmnopqrstuvwxyz0123456789.,?!'-:;\""


def read_wav(path):
    with wave.open(path) as w:
        fs = w.getframerate()
        n = w.getnframes()
        raw = w.readframes(n)
        width = w.getsampwidth()
        ch = w.getnchannels()
    if width == 2:
        x = np.frombuffer(raw, np.int16).astype(np.float64) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, np.int32).astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported sample width {width} in {path}")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x, fs


def resample(x, fs_in, fs_out):
    if fs_in == fs_out:
        return x
    from scipy.signal import resample_poly
    from math import gcd
    g = gcd(fs_in, fs_out)
    return resample_poly(x, fs_out // g, fs_in // g)


def encode_text(s, charset):
    return np.asarray([charset.index(c) + 1 for c in s.lower()
                       if c in charset], np.int32)


def encode_phonemes(s, inventory):
    return np.asarray([inventory.index(t) + 1 for t in s.split()
                       if t in inventory], np.int32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--wav_dir", required=True)
    p.add_argument("--transcript", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--sample_rate", type=int, default=16000)
    p.add_argument("--valid_frac", type=float, default=0.05)
    p.add_argument("--n_sp", type=int, default=57)
    p.add_argument("--phonemes", action="store_true",
                   help="text column holds space-separated phoneme tokens")
    a = p.parse_args()

    entries = []
    for line in open(a.transcript):
        parts = line.rstrip("\n").split("\t")
        if len(parts) < 2:
            continue
        stem, text = parts[0], parts[1]
        spk = int(parts[2]) if len(parts) > 2 else 0
        entries.append((stem, text, spk))
    if not entries:
        sys.exit("empty transcript")

    if a.phonemes:
        inventory = sorted({t for _, text, _ in entries
                            for t in text.split()})
    else:
        inventory = DEFAULT_CHARSET

    features, texts, speakers = [], [], []
    for i, (stem, text, spk) in enumerate(entries):
        wav_path = os.path.join(a.wav_dir, stem + ".wav")
        x, fs = read_wav(wav_path)
        x = resample(x, fs, a.sample_rate)
        f0, sp, ap = analyze(x, a.sample_rate)
        features.append(code_frames(f0, sp, ap, n_sp=a.n_sp))
        texts.append(encode_phonemes(text, inventory) if a.phonemes
                     else encode_text(text, inventory))
        speakers.append(spk)
        if (i + 1) % 50 == 0:
            print(f"{i + 1}/{len(entries)}")

    n = len(entries)
    n_valid = max(1, int(n * a.valid_frac))
    splits = {"train": list(range(n - n_valid)),
              "valid": list(range(n - n_valid, n))}
    os.makedirs(os.path.dirname(os.path.abspath(a.out)), exist_ok=True)
    write_corpus(a.out, features, texts, speakers,
                 vocab_size=len(inventory) + 1, splits=splits,
                 num_speakers=max(speakers) + 1,
                 charset=list(inventory) if a.phonemes else inventory)
    import h5py
    with h5py.File(a.out, "a") as f:
        f.attrs["sample_rate"] = a.sample_rate
    print(f"wrote {a.out}: {n} utterances, "
          f"{sum(len(f_) for f_ in features)} frames")


if __name__ == "__main__":
    main()
