#!/usr/bin/env python
"""Headline benchmark: batched autoregressive generation throughput on one
chip (BASELINE.json:2 — vocoder frames/sec/chip + real-time factor).

Prints ONE JSON line:
  {"metric": "batched_generation_rtf", "value": <x realtime>,
   "unit": "x_realtime", "vs_baseline": <value / 50>,
   "spread_iqr": <x realtime>, "spread_pct": <IQR / value * 100>,
   "samples": N}

Baseline contract: the reference publishes no numbers (BASELINE.md); the
driver-defined target is >50x realtime per chip at WORLD's 5 ms hop
(200 frames/s of audio), so vs_baseline = RTF / 50.

Robustness (VERDICT r3 weak #3): timing through the axon TPU tunnel has
session-level variance of +-10-20% that a single 3-pass median does not
suppress — round-over-round driver numbers moved 19% with no code
change. The bench therefore runs GROUPS x PASSES independently timed
pass samples, where each group re-builds the Sampler (fresh jit
dispatch caches; XLA's compile cache keeps re-warmup cheap), and
reports the median of all pass samples TOGETHER WITH their
inter-quartile range. A future round's value is a regression only if it
falls outside the printed spread of the previous round's.
"""

import json
import time

import numpy as np

GROUPS = 3   # independent Sampler builds (fresh dispatch caches)
PASSES = 3   # timed passes per group
REPS = 10    # generations per pass (amortizes the host transfer)


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
    scfg = SampleConfig(max_steps=STEPS, stop_threshold=1.1,
                        sampling_bias=0.5)

    times = []  # per-generation wall time, one sample per pass
    for g in range(GROUPS):
        sampler = Sampler(model, params, norm, scfg)
        # warmup + compile (fused Pallas path: return_phis=False);
        # after group 0 this hits XLA's in-process compile cache, so a
        # fresh group costs re-dispatch, not re-compilation
        frames, lengths, _ = sampler.generate(text, mask,
                                              key=jax.random.PRNGKey(0),
                                              return_phis=False)
        np.asarray(frames)
        for p in range(PASSES):
            t0 = time.time()
            for r in range(REPS):
                frames, lengths, _ = sampler.generate(
                    text, mask,
                    key=jax.random.PRNGKey(1 + g * 100 + p * REPS + r),
                    return_phis=False)
            np.asarray(frames)
            times.append((time.time() - t0) / REPS)

    ts = np.sort(np.asarray(times))
    dt = float(np.median(ts))
    q1, q3 = np.percentile(ts, [25, 75])

    def rtf_of(t):
        # WORLD default hop 5 ms -> 200 frames per second of audio
        return B * STEPS / t / 200.0

    rtf = rtf_of(dt)
    # IQR in RTF units (q1 time -> high RTF, q3 -> low RTF)
    iqr = rtf_of(float(q1)) - rtf_of(float(q3))
    print(json.dumps({
        "metric": "batched_generation_rtf",
        "value": round(rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 50.0, 3),
        "spread_iqr": round(iqr, 2),
        "spread_pct": round(100.0 * iqr / rtf, 1),
        "samples": len(times),
    }))


if __name__ == "__main__":
    main()
