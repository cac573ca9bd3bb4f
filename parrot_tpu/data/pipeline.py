"""Streaming pipeline: shuffle → sort-pool bucketing → pad+mask → TBPTT segments.

Rebuilds the reference's Fuel stream assembly (reference datasets.py
`parrot_stream` — mount empty, per SURVEY.md §2.1): ShuffledScheme,
sort-by-length pools to limit padding, Padding with masks, and the
fixed-length segmenting that implements truncated BPTT with RNN state
carried across the segments of an utterance batch (BASELINE.json:5
"teacher-forced truncated-BPTT").

Static shapes for XLA: every batch has features (B, seq_size, D) and
text (B, max_text_len); the number of segments per utterance-batch
varies, but each segment is the same shape, so the train step compiles
exactly once.
"""

from __future__ import annotations

from typing import Iterator, NamedTuple, Optional, Sequence

import numpy as np

from parrot_tpu.config import DataConfig
from parrot_tpu.data.hdf5_dataset import H5Corpus
from parrot_tpu.vocoder.mulaw import MULAW_ZERO  # audio pad id: silence


class Batch(NamedTuple):
    """One TBPTT segment. All arrays are host numpy; raw (unnormalized)."""

    features: np.ndarray       # (B, S, D) target frames of this segment
    features_mask: np.ndarray  # (B, S) 1.0 where valid
    prev_frame: np.ndarray     # (B, D) last frame before segment (0 at start)
    text: np.ndarray           # (B, U) int32 ids, 0-padded
    text_mask: np.ndarray      # (B, U)
    speaker: np.ndarray        # (B,) int32
    start_flag: np.ndarray     # () float32: 1.0 = first segment (reset state)


class JointBatch(NamedTuple):
    """A Batch plus its aligned mu-law audio, for Char2Wav joint
    end-to-end fine-tuning (train_joint.py): audio[:, t*hop:(t+1)*hop]
    are the samples governed by conditioning frame features[:, t]."""

    frames: Batch
    audio: np.ndarray          # (B, S * hop) int32 mu-law ids


def _chunks(seq, n):
    for i in range(0, len(seq), n):
        yield seq[i:i + n]


def _segment_batch(corpus: H5Corpus, idx: Sequence[int],
                   cfg: DataConfig, process_index: int = 0,
                   process_count: int = 1,
                   with_audio: bool = False) -> Iterator[Batch]:
    """Yield the segments of one utterance batch.

    Multi-host: `idx` is always the GLOBAL batch's utterance list, so
    segment count / start flags stay in lockstep across processes, but
    only this process's row block [pi*B/pc, (pi+1)*B/pc) is read from
    disk and materialized (per-process stream sharding, SURVEY.md §2.4).
    """
    B = cfg.batch_size
    if B % process_count:
        raise ValueError(f"batch_size {B} not divisible by "
                         f"{process_count} processes")
    B_local = B // process_count
    rlo = process_index * B_local
    S = cfg.seq_size
    D = corpus.frame_size
    U = cfg.max_text_len

    # n_seg must come from the GLOBAL max length — all processes agree
    t_max = int(max(corpus.frame_lengths[i] for i in idx))
    n_seg = max(1, -(-t_max // S))
    padded = np.zeros((B_local, n_seg * S, D), np.float32)
    fmask = np.zeros((B_local, n_seg * S), np.float32)
    text = np.zeros((B_local, U), np.int32)
    tmask = np.zeros((B_local, U), np.float32)
    speaker = np.zeros((B_local,), np.int32)
    hop = corpus.audio_hop if with_audio else 0
    audio = (np.full((B_local, n_seg * S * hop), MULAW_ZERO, np.int32)
             if with_audio else None)

    # rows beyond len(idx) stay zero (mask 0) for short final batches
    for row, i in enumerate(idx[rlo:rlo + B_local]):
        f = corpus.features(i)
        t = corpus.text(i)[:U]
        padded[row, :f.shape[0]] = f
        fmask[row, :f.shape[0]] = 1.0
        text[row, :len(t)] = t
        tmask[row, :len(t)] = 1.0
        speaker[row] = corpus.speaker(i)
        if with_audio:
            a = corpus.audio(i)
            assert a.shape[0] == f.shape[0] * hop, (i, a.shape, f.shape, hop)
            audio[row, :a.shape[0]] = a

    for s in range(n_seg):
        lo, hi = s * S, (s + 1) * S
        prev = (padded[:, lo - 1] if s > 0
                else np.zeros((B_local, D), np.float32))
        b = Batch(
            features=padded[:, lo:hi],
            features_mask=fmask[:, lo:hi],
            prev_frame=prev.copy(),
            text=text,
            text_mask=tmask,
            speaker=speaker,
            start_flag=np.float32(1.0 if s == 0 else 0.0),
        )
        yield (JointBatch(frames=b, audio=audio[:, lo * hop:hi * hop])
               if with_audio else b)


def parrot_stream(corpus: H5Corpus, cfg: DataConfig, split: str = "train",
                  training: bool = True,
                  epochs: Optional[int] = None,
                  skip_segments: int = 0,
                  process_index: int = 0,
                  process_count: int = 1,
                  with_audio: bool = False) -> Iterator[Batch]:
    """Yield TBPTT segment batches.

    training=True: shuffle each epoch, sort within pools of
    batch_size*sort_pool_size utterances by frame length (bucketing),
    drop the final short batch. training=False: deterministic order,
    final short batch zero-padded (mask excludes pad rows).

    skip_segments: fast-forward the deterministic stream by this many
    segments WITHOUT materializing the skipped batches (resume support —
    segment counts come from frame_lengths alone).

    Multi-host: every process runs the same deterministic shuffle /
    bucketing bookkeeping (same shuffle_seed), but each yields only its
    own rows of every global batch — batches have batch_size /
    process_count rows, ready for `parallel.staging.stage_local`.

    with_audio=True yields JointBatch (the Batch plus its aligned mu-law
    audio) for Char2Wav joint fine-tuning; requires a corpus built with
    preprocess.py --store_audio.
    """
    if with_audio and not corpus.has_audio:
        raise ValueError(
            f"corpus {corpus.path} has no /audio dataset — rebuild with "
            f"preprocess.py --store_audio")
    idx = corpus.split(split)
    rng = np.random.default_rng(cfg.shuffle_seed)
    epoch = 0
    remaining = int(skip_segments)
    while epochs is None or epoch < epochs:
        order = rng.permutation(idx) if training else np.asarray(idx)
        pool_size = cfg.batch_size * max(1, cfg.sort_pool_size)
        for pool in _chunks(order, pool_size):
            if training:
                pool = sorted(pool, key=lambda i: corpus.frame_lengths[i])
            for b in _chunks(list(pool), cfg.batch_size):
                if training and len(b) < cfg.batch_size:
                    continue
                if remaining > 0:
                    t_max = int(max(corpus.frame_lengths[i] for i in b))
                    n_seg = max(1, -(-t_max // cfg.seq_size))
                    if remaining >= n_seg:
                        remaining -= n_seg
                        continue
                for k, seg in enumerate(_segment_batch(
                        corpus, b, cfg, process_index, process_count,
                        with_audio=with_audio)):
                    if k < remaining:
                        continue
                    yield seg
                remaining = 0
        epoch += 1
