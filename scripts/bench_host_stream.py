#!/usr/bin/env python
"""Host-side data-stream throughput at pod-slice batch sizes
(VERDICT r2 next-step #7; SURVEY.md §2.4 per-process stream sharding).

parrot_stream already shards corpus READS per process — each process
materializes only its own row block of every global batch
(data/pipeline.py _segment_batch). This bench measures what that is
worth: host frames/sec of the stream alone (no device, no model) for

  * one process reading the WHOLE global batch (process_count=1), vs
  * one process's shard of the same global batch at process_count=N
    (what each host in an N-host pod slice actually does).

  python scripts/bench_host_stream.py --dataset data/rich2500.h5 \
      --global_batch 1024 --process_counts 1,4,8 [--cache_mb 0]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from parrot_tpu.config import DataConfig  # noqa: E402
from parrot_tpu.data.hdf5_dataset import H5Corpus  # noqa: E402
from parrot_tpu.data.pipeline import parrot_stream  # noqa: E402


def measure(path, global_batch, process_count, seq_size, cache_mb,
            seconds=8.0):
    corpus = H5Corpus(path, cache_mb=cache_mb)
    cfg = DataConfig(dataset=path, batch_size=global_batch,
                     seq_size=seq_size)
    it = parrot_stream(corpus, cfg, "train", training=True,
                       process_index=0, process_count=process_count)
    # warm one batch (file open, cache fill)
    next(it)
    t0 = time.time()
    frames = 0
    batches = 0
    while time.time() - t0 < seconds:
        b = next(it)
        frames += int(b.features_mask.sum())
        batches += 1
    dt = time.time() - t0
    return {
        "process_count": process_count,
        "local_rows": global_batch // process_count,
        "local_frames_per_sec": frames / dt,
        "global_frames_per_sec_equiv": frames / dt * process_count,
        "segments_per_sec": batches / dt,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="data/rich2500.h5")
    p.add_argument("--global_batch", type=int, default=1024)
    p.add_argument("--seq_size", type=int, default=50)
    p.add_argument("--process_counts", default="1,4,8")
    p.add_argument("--cache_mb", type=int, default=512)
    p.add_argument("--seconds", type=float, default=8.0)
    a = p.parse_args()
    out = []
    for pc in [int(x) for x in a.process_counts.split(",")]:
        r = measure(a.dataset, a.global_batch, pc, a.seq_size,
                    a.cache_mb, a.seconds)
        out.append(r)
        print(json.dumps(r))


if __name__ == "__main__":
    main()
