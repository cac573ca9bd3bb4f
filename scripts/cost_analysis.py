#!/usr/bin/env python
"""Per-step compiled cost analysis + measured roofline (SURVEY.md §5
"Tracing/profiling"; §6 perf accountability): FLOPs, bytes accessed,
arithmetic intensity of the jitted train step — and with --measure, the
achieved FLOPs/s vs peak (MFU) and achieved HBM bytes/s on the real
chip, so "is the train step actually good?" has a number.

  python scripts/cost_analysis.py [--batch_size 32] [--seq_size 50] [--cpu]
  python scripts/cost_analysis.py --measure [--reps 20]

Peak defaults are TPU v5e (v5 lite): 197 TFLOP/s bf16 MXU peak and
819 GB/s HBM — override with --peak_tflops/--peak_hbm_gbps on other
parts. MFU here uses the bf16 peak even for f32 runs (the v5e MXU
executes f32 matmuls as multi-pass bf16, so bf16 peak is the honest
denominator).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--seq_size", type=int, default=50)
    p.add_argument("--max_text_len", type=int, default=128)
    p.add_argument("--cpu", action="store_true",
                   help="analyze the CPU lowering (no TPU needed)")
    p.add_argument("--measure", action="store_true",
                   help="time the compiled step and report MFU / HBM-BW "
                        "utilization (runs on the real backend)")
    p.add_argument("--reps", type=int, default=20,
                   help="steps per timing pass (3 passes, median)")
    p.add_argument("--peak_tflops", type=float, default=197.0)
    p.add_argument("--peak_hbm_gbps", type=float, default=819.0)
    p.add_argument("--remat", action="store_true",
                   help="analyze with remat_scan (recompute scan "
                        "activations in the backward pass)")
    p.add_argument("--compute_dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--scan_weight_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="bfloat16: stream materialized bf16 copies of "
                        "the scan-resident weight matrices "
                        "(ModelConfig.scan_weight_dtype)")
    p.add_argument("--scan_enc_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="bfloat16: stream the encoder block at bf16 "
                        "through the scan (ModelConfig.scan_enc_dtype)")
    p.add_argument("--scan_residual_dtype", default="bfloat16",
                   choices=["float32", "bfloat16"],
                   help="bfloat16: store the split-backward gate "
                        "residuals at bf16 (ModelConfig; matches the "
                        "production default)")
    p.add_argument("--remat_head", action="store_true",
                   help="recompute the GMM NLL intermediates in the "
                        "backward (ModelConfig.remat_head)")
    # default True to MATCH ModelConfig — this script measures the
    # production step unless a knob is explicitly flipped (round 4: the
    # old store_true default silently timed the legacy autodiff path)
    p.add_argument("--split_backward", dest="split_backward",
                   action="store_true", default=True,
                   help="hand-written decoder-scan VJP with post-hoc "
                        "weight-grad GEMMs (ModelConfig.split_backward; "
                        "default ON like the production config)")
    p.add_argument("--no_split_backward", dest="split_backward",
                   action="store_false",
                   help="legacy autodiff scan path")
    p.add_argument("--stacked_scan", action="store_true",
                   help="one stacked GEMM per decoder layer in the scan "
                        "body (ModelConfig.stacked_scan)")
    p.add_argument("--pallas_scan", dest="pallas_scan",
                   action="store_true", default=None,
                   help="force the fused Pallas fwd/bwd kernels for the "
                        "decoder scan AND the encoder passes (default "
                        "AUTO: on for TPU when shapes fit; implies "
                        "--split_backward)")
    p.add_argument("--no_pallas_scan", dest="pallas_scan",
                   action="store_false",
                   help="disable the fused Pallas training kernels")
    a = p.parse_args()
    if a.pallas_scan:
        a.split_backward = True

    import jax
    if a.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from parrot_tpu.config import ModelConfig, TrainConfig
    from parrot_tpu.data.pipeline import Batch
    from parrot_tpu.models import Parrot
    from parrot_tpu.train.optim import adam_init, adam_update

    cfg = ModelConfig(remat_scan=a.remat, compute_dtype=a.compute_dtype,
                      stacked_scan=a.stacked_scan,
                      scan_weight_dtype=a.scan_weight_dtype,
                      scan_enc_dtype=a.scan_enc_dtype,
                      split_backward=a.split_backward,
                      scan_residual_dtype=a.scan_residual_dtype,
                      remat_head=a.remat_head,
                      pallas_scan=a.pallas_scan)
    # the model no longer auto-resolves AUTO (models.parrot
    # resolve_pallas_scan is the single source of truth) — this script
    # is single-device, so per-device batch == batch
    from parrot_tpu.models.parrot import resolve_pallas_scan
    import dataclasses as _dc
    cfg = _dc.replace(cfg, pallas_scan=resolve_pallas_scan(
        cfg, a.batch_size))
    tcfg = TrainConfig()
    model = Parrot(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    opt_state = adam_init(params)
    B, S, U, D = a.batch_size, a.seq_size, a.max_text_len, cfg.frame_size
    rng = np.random.default_rng(0)
    batch = Batch(
        features=jnp.asarray(rng.normal(size=(B, S, D)), jnp.float32),
        features_mask=jnp.ones((B, S)),
        prev_frame=jnp.zeros((B, D)),
        text=jnp.asarray(rng.integers(1, cfg.vocab_size, (B, U)), jnp.int32),
        text_mask=jnp.ones((B, U)),
        speaker=jnp.zeros((B,), jnp.int32),
        start_flag=jnp.float32(1.0))
    norm = {"mean": jnp.zeros((D,)), "std": jnp.ones((D,))}
    dstate = model.init_state(B, U)

    def train_step(params, opt_state, dstate, batch):
        def loss_fn(p):
            loss, new_state, m = model.compute_cost(p, norm, batch, dstate)
            return loss, new_state
        (loss, new_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        params, opt_state, info = adam_update(params, grads, opt_state, tcfg)
        return params, opt_state, new_state, loss

    compiled = jax.jit(train_step).lower(params, opt_state, dstate,
                                         batch).compile()
    cost = compiled.cost_analysis()
    flops = cost.get("flops", float("nan"))
    bytes_ = cost.get("bytes accessed", float("nan"))
    ai = flops / bytes_ if bytes_ else None
    out = {
        "batch_size": B,
        "seq_size": S,
        "max_text_len": U,
        "decoder_scan_path": model.scan_plan(B, U)[2],
        "flops_per_step": flops,
        "bytes_accessed_per_step": bytes_,
        "arithmetic_intensity": ai,
        "flops_per_frame": flops / (B * S),
        "backend": jax.default_backend(),
    }

    if a.measure:
        import time
        # the step donates nothing here (donation would invalidate the
        # reused inputs across reps); timing fences on a host transfer
        # because block_until_ready is unreliable through the axon
        # tunnel (see docs/PERFORMANCE.md methodology)
        params_d = jax.device_put(params)
        opt_d = jax.device_put(opt_state)
        st_d = jax.device_put(dstate)
        b_d = jax.device_put(batch)
        fn = compiled  # the already-built executable; avoid a 2nd compile
        _ = np.asarray(fn(params_d, opt_d, st_d, b_d)[3])  # warm caches
        times = []
        for _pass in range(3):
            t0 = time.time()
            loss = None
            for _ in range(a.reps):
                _p, _o, _s, loss = fn(params_d, opt_d, st_d, b_d)
            np.asarray(loss)  # fence
            times.append((time.time() - t0) / a.reps)
        step_s = sorted(times)[1]  # median of 3 passes
        peak_flops = a.peak_tflops * 1e12
        peak_bw = a.peak_hbm_gbps * 1e9
        ridge = peak_flops / peak_bw
        out.update({
            "step_time_s": step_s,
            "frames_per_sec": B * S / step_s,
            "achieved_tflops": flops / step_s / 1e12,
            "mfu": flops / step_s / peak_flops,
            "achieved_hbm_gbps": bytes_ / step_s / 1e9,
            "hbm_bw_utilization": bytes_ / step_s / peak_bw,
            "ridge_intensity_flops_per_byte": ridge,
            "bound": ("compute" if (ai or 0) > ridge else "memory"),
            "peak_tflops": a.peak_tflops,
            "peak_hbm_gbps": a.peak_hbm_gbps,
        })
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
