#!/usr/bin/env python
"""Headline benchmark: batched autoregressive generation throughput on one
chip (BASELINE.json:2 — vocoder frames/sec/chip + real-time factor).

Prints ONE JSON line:
  {"metric": "batched_generation_rtf", "value": <x realtime>,
   "unit": "x_realtime", "vs_baseline": <value / 50>}

Baseline contract: the reference publishes no numbers (BASELINE.md); the
driver-defined target is >50x realtime per chip at WORLD's 5 ms hop
(200 frames/s of audio), so vs_baseline = RTF / 50.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from parrot_tpu.config import ModelConfig, SampleConfig
    from parrot_tpu.models import Parrot
    from parrot_tpu.sample import Sampler

    cfg = ModelConfig()  # flagship dims: D=63, H=512, L=3, K=10, M=20
    model = Parrot(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    D = cfg.frame_size

    B, U, STEPS = 256, 128, 512
    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.integers(1, cfg.vocab_size, (B, U)), jnp.int32)
    mask = jnp.ones((B, U), jnp.float32)
    norm = {"mean": jnp.zeros((D,)), "std": jnp.ones((D,))}
    # stop_threshold > 1 so every sequence runs the full STEPS frames
    sampler = Sampler(model, params, norm,
                      SampleConfig(max_steps=STEPS, stop_threshold=1.1,
                                   sampling_bias=0.5))

    # warmup + compile (fused Pallas path: return_phis=False)
    frames, lengths, _ = sampler.generate(text, mask,
                                          key=jax.random.PRNGKey(0),
                                          return_phis=False)
    np.asarray(frames)

    # several passes, median: timing through the TPU tunnel is noisy and
    # the final host transfer is amortized over `reps` generations
    reps, passes = 10, 3
    times = []
    for p in range(passes):
        t0 = time.time()
        for r in range(reps):
            frames, lengths, _ = sampler.generate(
                text, mask, key=jax.random.PRNGKey(p * reps + r),
                return_phis=False)
        np.asarray(frames)
        times.append((time.time() - t0) / reps)
    dt = sorted(times)[len(times) // 2]

    frames_per_sec = B * STEPS / dt
    # WORLD default hop 5 ms -> 200 frames per second of audio
    rtf = frames_per_sec / 200.0
    print(json.dumps({
        "metric": "batched_generation_rtf",
        "value": round(rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 50.0, 3),
    }))


if __name__ == "__main__":
    main()
