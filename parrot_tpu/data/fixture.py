"""Synthetic fixture corpus for tests and CI (SURVEY.md §4 "golden small
HDF5 fixture").

Features are a deterministic function of the text: token id k has a
fixed D-dim template vector; an utterance's frames are each token's
template repeated `frames_per_char` times plus small noise. A correct
model + attention can drive the loss near zero and must learn a
monotonic alignment — which is exactly what the end-to-end overfit test
asserts. No real corpus is ever required.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from parrot_tpu.data.hdf5_dataset import write_corpus


def make_fixture_corpus(
    path: str,
    num_utterances: int = 32,
    vocab_size: int = 12,
    frame_size: int = 15,
    frames_per_char: int = 4,
    min_chars: int = 4,
    max_chars: int = 12,
    num_speakers: int = 1,
    noise: float = 0.01,
    seed: int = 0,
) -> str:
    rng = np.random.default_rng(seed)
    templates = rng.normal(size=(vocab_size, frame_size)).astype(np.float32)
    # per-speaker additive offset so multi-speaker conditioning is learnable
    spk_offsets = rng.normal(size=(num_speakers, frame_size)).astype(np.float32)

    features, texts, speakers = [], [], []
    for i in range(num_utterances):
        u = int(rng.integers(min_chars, max_chars + 1))
        ids = rng.integers(1, vocab_size, size=u).astype(np.int32)
        spk = int(rng.integers(0, num_speakers))
        f = np.repeat(templates[ids], frames_per_char, axis=0)
        f = f + spk_offsets[spk] + noise * rng.normal(size=f.shape)
        features.append(f.astype(np.float32))
        texts.append(ids)
        speakers.append(spk)

    n_valid = max(2, num_utterances // 8)
    splits = {
        "train": list(range(num_utterances - n_valid)),
        "valid": list(range(num_utterances - n_valid, num_utterances)),
    }
    write_corpus(path, features, texts, speakers, vocab_size=vocab_size,
                 splits=splits, num_speakers=num_speakers)
    return path


def make_audio_fixture_corpus(
    path: str,
    num_utterances: int = 16,
    vocab_size: int = 8,
    min_chars: int = 2,
    max_chars: int = 6,
    fs: int = 16000,
    char_ms: float = 120.0,
    seed: int = 0,
    num_speakers: int = 1,
) -> str:
    """End-to-end fixture with REAL vocoder features: each token id is a
    synthetic 'phoneme' (an f0 + resonant-filter pair); utterance audio is
    the concatenation of its tokens' vowel segments; features come from
    actual WORLD analysis. Trains the full text -> frames -> waveform
    pipeline without any real corpus. num_speakers > 1 gives each
    speaker a distinct voice (per-speaker pitch/formant scale), so
    speaker-conditioned models have signal to learn."""
    import h5py
    from scipy.signal import lfilter

    from parrot_tpu.vocoder import analyze, code_frames, hop_samples
    from parrot_tpu.vocoder.mulaw import mulaw_encode

    rng = np.random.default_rng(seed)
    hop = hop_samples(fs)
    # per-token (f0, resonance) "phoneme inventory"
    f0s = rng.uniform(100.0, 260.0, size=vocab_size)
    res = rng.uniform(300.0, 2500.0, size=vocab_size)
    # per-speaker voice: pitch scale + formant scale
    f0_scale = rng.uniform(0.75, 1.35, size=num_speakers)
    res_scale = rng.uniform(0.8, 1.25, size=num_speakers)
    seg_len = int(fs * char_ms / 1000.0)

    features, texts, speakers, audio_q = [], [], [], []
    for j in range(num_utterances):
        spk = j % num_speakers  # every speaker lands in both splits
        u = int(rng.integers(min_chars, max_chars + 1))
        ids = rng.integers(1, vocab_size, size=u).astype(np.int32)
        audio = []
        for k in ids:
            phase = np.cumsum(np.full(seg_len, f0_scale[spk] * f0s[k] / fs))
            pulses = np.diff(np.floor(phase), prepend=0.0)
            r = min(res_scale[spk] * res[k], 0.45 * fs)
            seg = lfilter([1.0], [1.0, -1.8 * np.cos(2 * np.pi * r / fs),
                                  0.9], pulses)
            audio.append(seg)
        x = np.concatenate(audio)
        x = x / (np.abs(x).max() + 1e-9)
        x = x + 0.001 * rng.normal(size=len(x))
        f0, sp, ap = analyze(x, fs)
        feat = code_frames(f0, sp, ap)
        features.append(feat)
        # frame-aligned mu-law audio for neural-vocoder training
        audio_q.append(mulaw_encode(0.95 * x[:feat.shape[0] * hop]))
        texts.append(ids)
        speakers.append(spk)

    n_valid = max(2, num_utterances // 8)
    splits = {"train": list(range(num_utterances - n_valid)),
              "valid": list(range(num_utterances - n_valid, num_utterances))}
    write_corpus(path, features, texts, speakers, vocab_size=vocab_size,
                 splits=splits, num_speakers=num_speakers,
                 audio=audio_q, sample_rate=fs, audio_hop=hop)
    with h5py.File(path, "a") as f:
        f.attrs["sample_rate"] = fs
    return path
