#!/usr/bin/env python
"""Preprocess a corpus of wav files into a parrot-tpu HDF5 corpus.

Rebuilds the reference's per-corpus preprocessing scripts (SURVEY.md
§3.4: wav -> resample -> WORLD analysis -> coded features -> HDF5 +
normalization stats; §2.1 per-corpus adapters).

Generic layout — a directory of wavs plus a transcript TSV with lines
`<wav-stem>\t<text>[\t<speaker-id>]`:

  python scripts/preprocess.py --wav_dir wavs/ --transcript meta.tsv \
      --out data/corpus.h5
  # phoneme inputs: the text column holds space-separated phoneme tokens
  python scripts/preprocess.py ... --phonemes

Real-corpus layouts (BASELINE.json configs 1 and 4) need no user glue:

  # VCTK on-disk layout: txt/<speaker>/<utt>.txt + wav48/<speaker>/<utt>.wav
  # (speaker ids assigned from sorted speaker directory names)
  python scripts/preprocess.py --corpus vctk --root /data/VCTK-Corpus \
      --out data/vctk.h5

  # Blizzard / festival layout: a prompts file with `( <id> "text" )`
  # lines + a flat wav directory (wavs/<id>.wav); single speaker
  python scripts/preprocess.py --corpus blizzard --root /data/blizzard \
      --out data/blizzard.h5
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


def walk_generic(wav_dir, transcript):
    """TSV transcript: `<wav-stem>\\t<text>[\\t<speaker-key>]` per line;
    wavs at <wav_dir>/<stem>.wav. Speaker keys may be arbitrary strings
    or sparse numbers — they are remapped to dense integer ids by sorted
    key (numeric sort when every key is numeric, so 0/1/2... transcripts
    keep their ids); the original keys land in the h5 `speaker_names`
    attr. Returns ([(wav_path, text, spk)], speaker_names)."""
    raw = []
    for line in open(transcript):
        parts = line.rstrip("\n").split("\t")
        if len(parts) < 2:
            continue
        stem, text = parts[0], parts[1]
        key = parts[2].strip() if len(parts) > 2 else "0"
        raw.append((os.path.join(wav_dir, stem + ".wav"), text, key))
    keys = {k for _, _, k in raw}
    all_numeric = all(k.lstrip("-").isdigit() for k in keys)
    names = sorted(keys, key=(int if all_numeric else str))
    spk_id = {k: i for i, k in enumerate(names)}
    return [(w, t, spk_id[k]) for w, t, k in raw], names


def walk_vctk(root):
    """VCTK-Corpus on-disk layout: per-utterance transcripts at
    txt/<speaker>/<utt>.txt with wavs at wav48/<speaker>/<utt>.wav
    (wav16/, wavs/, wav/ also accepted). Integer speaker ids are
    assigned from the SORTED speaker directory names (p225, p226, ...),
    recorded in the h5 `speaker_names` attr."""
    txt_root = os.path.join(root, "txt")
    if not os.path.isdir(txt_root):
        sys.exit(f"vctk layout: missing transcript dir {txt_root}")
    wav_root = None
    for d in ("wav48", "wav16", "wavs", "wav"):
        if os.path.isdir(os.path.join(root, d)):
            wav_root = os.path.join(root, d)
            break
    if wav_root is None:
        sys.exit(f"vctk layout: no wav48/wav16/wavs/wav dir under {root}")
    speakers = sorted(d for d in os.listdir(txt_root)
                      if os.path.isdir(os.path.join(txt_root, d)))
    if not speakers:
        sys.exit(f"vctk layout: no speaker dirs under {txt_root}")
    spk_id = {name: i for i, name in enumerate(speakers)}
    entries = []
    for name in speakers:
        for fn in sorted(os.listdir(os.path.join(txt_root, name))):
            if not fn.endswith(".txt"):
                continue
            stem = fn[:-4]
            wav = os.path.join(wav_root, name, stem + ".wav")
            if not os.path.exists(wav):
                continue  # VCTK ships a few transcript-only utterances
            text = open(os.path.join(txt_root, name, fn)).read().strip()
            if text:
                entries.append((wav, text, spk_id[name]))
    return entries, speakers


def walk_blizzard(root):
    """Blizzard / festival-style layout: a prompts file with
    `( <id> "text" )` entries plus a flat wav directory. Prompt file:
    --root/prompts.data|prompts.gui|*.data; wavs: wavs/<id>.wav (wav/
    also accepted). Single speaker (Blizzard is one voice)."""
    prompts = None
    for cand in ("prompts.data", "prompts.gui", "etc/prompts.data"):
        if os.path.exists(os.path.join(root, cand)):
            prompts = os.path.join(root, cand)
            break
    if prompts is None:
        data = [f for f in sorted(os.listdir(root)) if f.endswith(".data")]
        if data:
            prompts = os.path.join(root, data[0])
    if prompts is None:
        sys.exit(f"blizzard layout: no prompts file under {root}")
    wav_root = None
    for d in ("wavs", "wav"):
        if os.path.isdir(os.path.join(root, d)):
            wav_root = os.path.join(root, d)
            break
    if wav_root is None:
        sys.exit(f"blizzard layout: no wavs/ dir under {root}")
    entries = []
    import re
    pat = re.compile(r'\(\s*(\S+)\s+"(.*?)"\s*\)', re.S)
    for m in pat.finditer(open(prompts).read()):
        utt_id, text = m.group(1), " ".join(m.group(2).split())
        wav = os.path.join(wav_root, utt_id + ".wav")
        if os.path.exists(wav) and text:
            entries.append((wav, text, 0))
    return entries, ["blizzard"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--corpus", choices=["generic", "vctk", "blizzard"],
                   default="generic",
                   help="on-disk layout adapter (see module docstring)")
    p.add_argument("--root", default=None,
                   help="corpus root for --corpus vctk/blizzard")
    p.add_argument("--wav_dir", default=None,
                   help="generic layout: wav directory")
    p.add_argument("--transcript", default=None,
                   help="generic layout: TSV transcript")
    p.add_argument("--out", required=True)
    p.add_argument("--sample_rate", type=int, default=16000)
    p.add_argument("--valid_frac", type=float, default=0.05)
    p.add_argument("--n_sp", type=int, default=57)
    p.add_argument("--phonemes", action="store_true",
                   help="text column holds space-separated phoneme tokens")
    p.add_argument("--f0_method", choices=["dio", "harvest"], default="dio",
                   help="F0 estimator: dio (fast) or harvest (contour "
                        "Viterbi, fewer V/UV errors)")
    p.add_argument("--store_audio", action="store_true",
                   help="also store frame-aligned mu-law audio in the "
                        "corpus (for neural-vocoder training, "
                        "train_vocoder.py)")
    a = p.parse_args()

    if a.corpus == "generic":
        if not (a.wav_dir and a.transcript):
            sys.exit("generic layout needs --wav_dir and --transcript")
        entries, speaker_names = walk_generic(a.wav_dir, a.transcript)
    elif a.corpus == "vctk":
        if not a.root:
            sys.exit("--corpus vctk needs --root")
        entries, speaker_names = walk_vctk(a.root)
    else:
        if not a.root:
            sys.exit("--corpus blizzard needs --root")
        entries, speaker_names = walk_blizzard(a.root)
    if not entries:
        sys.exit("empty transcript")

    if a.phonemes:
        inventory = sorted({t for _, text, _ in entries
                            for t in text.split()})
    else:
        inventory = DEFAULT_CHARSET

    from parrot_tpu.vocoder import hop_samples
    from parrot_tpu.vocoder.mulaw import mulaw_encode
    hop = hop_samples(a.sample_rate)

    features, texts, speakers = [], [], []
    audio_q = [] if a.store_audio else None
    for i, (wav_path, text, spk) in enumerate(entries):
        x, fs = read_wav(wav_path)
        x = resample(x, fs, a.sample_rate)
        f0, sp, ap = analyze(x, a.sample_rate, f0_method=a.f0_method)
        feat = code_frames(f0, sp, ap, n_sp=a.n_sp)
        features.append(feat)
        if audio_q is not None:
            peak = np.abs(x).max() + 1e-9
            scale = min(1.0, 0.95 / peak)
            audio_q.append(mulaw_encode(scale * x[:feat.shape[0] * hop]))
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
                 num_speakers=max(max(speakers) + 1, len(speaker_names)),
                 charset=list(inventory) if a.phonemes else inventory,
                 audio=audio_q, sample_rate=a.sample_rate, audio_hop=hop)
    import h5py
    with h5py.File(a.out, "a") as f:
        f.attrs["sample_rate"] = a.sample_rate
        f.attrs["speaker_names"] = [str(s) for s in speaker_names]
    print(f"wrote {a.out}: {n} utterances, "
          f"{sum(len(f_) for f_ in features)} frames")


if __name__ == "__main__":
    main()
