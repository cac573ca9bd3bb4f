"""Streaming pipeline for neural-vocoder training: aligned (audio, cond).

Same stream shape as data/pipeline.py (shuffle -> sort-pool bucketing ->
pad+mask -> fixed-length TBPTT segments with exact state carry), but
each segment pairs `seq_size` conditioning frames with their
`seq_size * hop` mu-law audio samples. The corpus must carry the
optional /audio dataset (preprocess.py --store_audio, or the audio
fixture).

Padding uses the mu-law silence id (Q // 2) so padded samples decode to
0.0 — the same value the model's zero state feeds back.
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence

import numpy as np

from parrot_tpu.data.hdf5_dataset import H5Corpus
from parrot_tpu.models.samplernn import VocoderBatch

from parrot_tpu.vocoder.mulaw import MULAW_ZERO  # pad id: silence


def _chunks(seq, n):
    for i in range(0, len(seq), n):
        yield seq[i:i + n]


def _segment_batch(corpus: H5Corpus, idx: Sequence[int], batch_size: int,
                   seq_size: int, process_index: int = 0,
                   process_count: int = 1) -> Iterator[VocoderBatch]:
    """Multi-host: `idx` is the GLOBAL batch; only this process's row
    block is read and materialized (same contract as
    data.pipeline._segment_batch — feeds parallel.staging.stage_local).
    """
    hop = corpus.audio_hop
    D = corpus.frame_size
    S = seq_size
    if batch_size % process_count:
        raise ValueError(f"batch_size {batch_size} not divisible by "
                         f"{process_count} processes")
    B_local = batch_size // process_count
    rlo = process_index * B_local
    # segment count from the GLOBAL max length — all processes agree
    t_max = int(max(corpus.frame_lengths[i] for i in idx))
    n_seg = max(1, -(-t_max // S))
    cond = np.zeros((B_local, n_seg * S, D), np.float32)
    cmask = np.zeros((B_local, n_seg * S), np.float32)
    audio = np.full((B_local, n_seg * S * hop), MULAW_ZERO, np.int32)
    speaker = np.zeros((B_local,), np.int32)
    for row, i in enumerate(idx[rlo:rlo + B_local]):
        f = corpus.features(i)
        a = corpus.audio(i)
        t = f.shape[0]
        assert a.shape[0] == t * hop, (i, a.shape, t, hop)
        cond[row, :t] = f
        cmask[row, :t] = 1.0
        audio[row, :t * hop] = a
        speaker[row] = corpus.speaker(i)
    for s in range(n_seg):
        lo, hi = s * S, (s + 1) * S
        yield VocoderBatch(
            audio=audio[:, lo * hop:hi * hop],
            cond=cond[:, lo:hi],
            cond_mask=cmask[:, lo:hi],
            start_flag=np.float32(1.0 if s == 0 else 0.0),
            speaker=speaker,
        )


def vocoder_stream(corpus: H5Corpus, batch_size: int, seq_size: int,
                   split: str = "train", training: bool = True,
                   epochs: Optional[int] = None, shuffle_seed: int = 0,
                   sort_pool_size: int = 20,
                   skip_segments: int = 0,
                   process_index: int = 0,
                   process_count: int = 1) -> Iterator[VocoderBatch]:
    """Yield aligned (audio, conditioning) TBPTT segments.

    Semantics mirror data.pipeline.parrot_stream: training shuffles each
    epoch, sorts within pools to limit padding, drops short final
    batches; evaluation is deterministic with zero-padded final batch.
    skip_segments fast-forwards for exact resume. Multi-host: every
    process runs the same deterministic bookkeeping but yields only its
    own batch_size/process_count rows of every global batch.
    """
    if not corpus.has_audio:
        raise ValueError(
            f"corpus {corpus.path} has no /audio dataset — rebuild with "
            f"preprocess.py --store_audio")
    idx = corpus.split(split)
    rng = np.random.default_rng(shuffle_seed)
    epoch = 0
    remaining = int(skip_segments)
    while epochs is None or epoch < epochs:
        order = rng.permutation(idx) if training else np.asarray(idx)
        pool_size = batch_size * max(1, sort_pool_size)
        for pool in _chunks(order, pool_size):
            if training:
                pool = sorted(pool, key=lambda i: corpus.frame_lengths[i])
            for b in _chunks(list(pool), batch_size):
                if training and len(b) < batch_size:
                    continue
                if remaining > 0:
                    t_max = int(max(corpus.frame_lengths[i] for i in b))
                    n_seg = max(1, -(-t_max // seq_size))
                    if remaining >= n_seg:
                        remaining -= n_seg
                        continue
                for k, seg in enumerate(_segment_batch(
                        corpus, list(b), batch_size, seq_size,
                        process_index, process_count)):
                    if k < remaining:
                        continue
                    yield seg
                remaining = 0
        epoch += 1
