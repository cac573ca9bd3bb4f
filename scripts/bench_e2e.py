#!/usr/bin/env python
"""End-to-end Char2Wav serving benchmark: text -> frames -> WAVEFORM on
one chip, both stages through their fused Pallas kernels.

The reference's serving story is a per-step Python loop plus an external
SampleRNN process (SURVEY.md §3.2, §2.3 N3); here the whole pipeline is
two on-device programs — the fused reader decode (ops/fused_decode.py)
and the fused neural vocoder (ops/fused_vocoder.py) — with the frames
handed over as a device array (no host round trip between stages).

Prints ONE JSON line:
  {"metric": "e2e_text_to_waveform_rtf", "value": <x realtime>, ...}

RTF anchor: 16 kHz audio; each generated frame governs hop=80 samples
(5 ms), so B rows x STEPS frames = B * STEPS * 80 / 16000 seconds of
audio. The driver's headline bench stays bench.py (frame generation);
this records the full-pipeline number for docs/PERFORMANCE.md.
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
    from parrot_tpu.sample import Sampler

    cfg = ModelConfig()  # flagship reader: D=63, H=512, L=3, K=10, M=20
    model = Parrot(cfg)
    # jit: eager per-op init over the axon tunnel costs minutes
    params = jax.jit(model.init_params)(jax.random.PRNGKey(0))
    D = cfg.frame_size

    vcfg = SampleRNNConfig(cond_dim=D)  # flagship vocoder: H=512, MLP=512
    vmodel = SampleRNN(vcfg)
    vparams = jax.jit(vmodel.init_params)(jax.random.PRNGKey(1))

    B, U, STEPS = 256, 128, 512
    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.integers(1, cfg.vocab_size, (B, U)), jnp.int32)
    mask = jnp.ones((B, U), jnp.float32)
    norm = {"mean": jnp.zeros((D,)), "std": jnp.ones((D,))}
    sampler = Sampler(model, params, norm,
                      SampleConfig(max_steps=STEPS, stop_threshold=1.1,
                                   sampling_bias=0.5))
    cond_mask = jnp.ones((B, STEPS), jnp.float32)

    def e2e(seed):
        frames, _, _ = sampler.generate(
            text, mask, key=jax.random.PRNGKey(seed), return_phis=False)
        _, audio = vmodel.generate_fused(vparams, norm, frames, cond_mask,
                                         seed=seed, temperature=1.0)
        return audio

    audio = e2e(0)  # warmup + both compiles
    np.asarray(audio)

    reps, passes = 5, 3
    times = []
    for p in range(passes):
        t0 = time.time()
        for r in range(reps):
            audio = e2e(1 + p * reps + r)
        np.asarray(audio)
        times.append((time.time() - t0) / reps)
    dt = sorted(times)[len(times) // 2]

    audio_seconds = B * STEPS * vcfg.hop / vcfg.sample_rate
    rtf = audio_seconds / dt
    print(json.dumps({
        "metric": "e2e_text_to_waveform_rtf",
        "value": round(rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 50.0, 3),
        "samples_per_sec": round(B * STEPS * vcfg.hop / dt),
        "frames_per_sec": round(B * STEPS / dt),
    }))


if __name__ == "__main__":
    main()
