#!/usr/bin/env python
"""Streaming-synthesis latency benchmark: time-to-first-audio (TTFA).

The batch benches (bench.py, bench_e2e.py) measure throughput; this
measures the latency path (sample/streaming.py): how long until the
first `frame_chunk * 5 ms` of audio exists, and whether the per-chunk
cadence keeps up with real time (chunk wall < chunk audio duration =
streamable).

Flagship dims both halves, random weights (latency does not depend on
training). Prints one JSON line with TTFA and steady-state cadence for
a few (batch, chunk) points.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    from parrot_tpu.config import ModelConfig, SampleConfig, SampleRNNConfig
    from parrot_tpu.models import Parrot, SampleRNN
    from parrot_tpu.sample.streaming import StreamingSynthesizer

    cfg = ModelConfig()
    model = Parrot(cfg)
    params = jax.jit(model.init_params)(jax.random.PRNGKey(0))
    D = cfg.frame_size
    vcfg = SampleRNNConfig(cond_dim=D)
    vmodel = SampleRNN(vcfg)
    vparams = jax.jit(vmodel.init_params)(jax.random.PRNGKey(1))
    norm = {"mean": jnp.zeros((D,)), "std": jnp.ones((D,))}

    rng = np.random.default_rng(0)
    results = []
    for B, F in ((1, 32), (8, 32), (32, 64)):
        U = 64
        text = jnp.asarray(rng.integers(1, cfg.vocab_size, (B, U)),
                           jnp.int32)
        mask = jnp.ones((B, U), jnp.float32)
        syn = StreamingSynthesizer(
            model, params, norm, vmodel, vparams,
            SampleConfig(stop_threshold=1.1, sampling_bias=0.5))
        # warmup/compile pass (compile time is NOT serving latency)
        for i, _ in enumerate(syn.stream(text, mask, frame_chunk=F,
                                         max_steps=2 * F)):
            pass
        # measured pass: 8 chunks
        ttfa, cadence = None, []
        t0 = time.time()
        last = t0
        for i, ch in enumerate(syn.stream(text, mask, frame_chunk=F,
                                          max_steps=8 * F,
                                          key=jax.random.PRNGKey(2))):
            now = time.time()
            if i == 0:
                ttfa = (now - t0) * 1e3
            else:
                cadence.append((now - last) * 1e3)
            last = now
        chunk_audio_ms = F * 5.0
        med = sorted(cadence)[len(cadence) // 2]
        results.append({
            "batch": B, "frame_chunk": F,
            "ttfa_ms": round(ttfa, 1),
            "chunk_cadence_ms": round(med, 1),
            "chunk_audio_ms": chunk_audio_ms,
            "realtime_streams": round(B * chunk_audio_ms / med, 1),
        })
    print(json.dumps({"metric": "streaming_ttfa", "results": results}))


if __name__ == "__main__":
    main()
