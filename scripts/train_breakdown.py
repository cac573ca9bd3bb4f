#!/usr/bin/env python
"""Train-step time decomposition on the real chip (perf accountability,
docs/PERFORMANCE.md). Times a ladder of partial programs so the step's
cost splits into encoder / decoder-scan / attention / readout+head /
backward / Adam contributions:

  python scripts/train_breakdown.py --batch_size 256 [--knobs]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--seq_size", type=int, default=50)
    p.add_argument("--max_text_len", type=int, default=128)
    p.add_argument("--reps", type=int, default=20)
    p.add_argument("--knobs", action="store_true",
                   help="scan_weight_dtype=scan_enc_dtype=bfloat16")
    p.add_argument("--head_dtype", default=None,
                   help="override ModelConfig.head_dtype (e.g. bfloat16)")
    p.add_argument("--remat_head", action="store_true")
    p.add_argument("--cpu", action="store_true")
    a = p.parse_args()

    import jax
    if a.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from parrot_tpu.config import ModelConfig, TrainConfig
    from parrot_tpu.data.pipeline import Batch
    from parrot_tpu.models import Parrot
    from parrot_tpu.train.optim import adam_init, adam_update

    kw = ({"scan_weight_dtype": "bfloat16", "scan_enc_dtype": "bfloat16"}
          if a.knobs else {})
    if a.head_dtype:
        kw["head_dtype"] = a.head_dtype
    if a.remat_head:
        kw["remat_head"] = True
    cfg = ModelConfig(**kw)
    # single-device script: resolve pallas AUTO explicitly (the model
    # itself no longer auto-decides — models.parrot.resolve_pallas_scan)
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

    def timed(name, fn, *args):
        c = jax.jit(fn).lower(*args).compile()
        out = c(*args)
        np.asarray(jax.tree.leaves(out)[0])  # warm + fence
        ts = []
        for _ in range(3):
            t0 = time.time()
            for _ in range(a.reps):
                out = c(*args)
            np.asarray(jax.tree.leaves(out)[0])
            ts.append((time.time() - t0) / a.reps)
        ms = sorted(ts)[1] * 1e3
        print(f"{name:42s} {ms:8.2f} ms")
        return ms

    # ladder (every program returns a SCALAR or small tree leaf-first —
    # the timing fence transfers the first leaf to host, and a large
    # first output would time the tunnel, not the chip) ----------------
    enc_const = jax.device_put(np.asarray(
        jax.jit(lambda p: model.encode(p, batch.text, batch.text_mask))(
            params)))

    def enc_only(p):
        return model.encode(p, batch.text, batch.text_mask).sum()

    def grad_enc(p):
        return jax.grad(enc_only)(p)

    def loss_only(p):
        return model.compute_cost(p, norm, batch, dstate)[0]

    def scan_given_enc(p, enc):
        # decoder scan + attention from a PRECOMPUTED encoder block;
        # skip readout/head/NLL
        st = jax.tree.map(lambda z: 0.0 * z, dstate)
        st = st._replace(enc=enc)
        xn = (batch.features - norm["mean"]) / norm["std"]
        x_in = xn.transpose(1, 0, 2)
        raw, _, _ = model.scan_decoder(p, st, x_in,
                                       batch.features_mask.T,
                                       batch.text_mask, None)
        return raw.sum()

    def grad_scan_given_enc(p, enc):
        return jax.grad(scan_given_enc)(p, enc)

    def grad_full(p):
        return jax.grad(lambda q: model.compute_cost(
            q, norm, batch, dstate)[0])(p)

    def full_step(p, o):
        grads = jax.grad(lambda q: model.compute_cost(
            q, norm, batch, dstate)[0])(p)
        p2, o2, _ = adam_update(p, grads, o, tcfg)
        return p2, o2

    def adam_only(p, o):
        grads = jax.tree.map(jnp.ones_like, p)
        return adam_update(p, grads, o, tcfg)[0]

    t_enc = timed("encoder fwd (scalar fence)", enc_only, params)
    t_genc = timed("grad(encoder)", grad_enc, params)
    t_fwd = timed("full fwd (loss)", loss_only, params)
    t_scan = timed("decoder scan fwd (given enc, no head)",
                   scan_given_enc, params, enc_const)
    t_gscan = timed("grad(decoder scan, given enc)", grad_scan_given_enc,
                    params, enc_const)
    t_grad = timed("grad(full)", grad_full, params)
    t_adam = timed("adam only", adam_only, params, opt_state)
    t_step = timed("full step (fwd+bwd+adam)", full_step, params,
                   opt_state)

    print()
    print(f"encoder fwd                   ~{t_enc:7.2f} ms; "
          f"fwd+bwd ~{t_genc:7.2f} ms")
    print(f"decoder scan fwd              ~{t_scan:7.2f} ms; "
          f"fwd+bwd ~{t_gscan:7.2f} ms")
    print(f"readout/head/NLL fwd          ~{t_fwd - t_scan - t_enc:7.2f} ms")
    print(f"backward total                ~{t_grad - t_fwd:7.2f} ms")
    print(f"adam                          ~{t_adam:7.2f} ms")


if __name__ == "__main__":
    main()
