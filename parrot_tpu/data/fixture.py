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
