"""Same-session A/B for the direction-fused encoder kernel (VERDICT r4 #4):
full production train step at B=256 S=50 U=128 with the encoder's two
single-direction kernels vs the fused kernel, plus an encoder-only rung.
"""
import dataclasses
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import parrot_tpu.nn.recurrent as rec
from parrot_tpu.config import ModelConfig, TrainConfig
from parrot_tpu.data.pipeline import Batch
from parrot_tpu.models import Parrot
from parrot_tpu.models.parrot import resolve_pallas_scan
from parrot_tpu.train.optim import adam_init, adam_update

B, S, U = 256, 50, 128
cfg = ModelConfig()
cfg = dataclasses.replace(cfg, pallas_scan=resolve_pallas_scan(cfg, B))
model = Parrot(cfg)
params = jax.jit(model.init_params)(jax.random.PRNGKey(0))
D = cfg.frame_size
rng = np.random.default_rng(0)
batch = Batch(
    features=jnp.asarray(rng.normal(size=(B, S, D)) * 0.5, jnp.float32),
    features_mask=jnp.ones((B, S)),
    prev_frame=jnp.zeros((B, D)),
    text=jnp.asarray(rng.integers(1, cfg.vocab_size, (B, U)), jnp.int32),
    text_mask=jnp.ones((B, U)),
    speaker=jnp.zeros((B,), jnp.int32),
    start_flag=jnp.float32(1.0))
norm = {"mean": jnp.zeros((D,)), "std": jnp.ones((D,))}
dstate = model.init_state(B, U)
tcfg = TrainConfig()
opt_state = jax.jit(adam_init)(params)

orig = rec.bidirectional_lstm_split


def timed(name, fn, *args, reps=20):
    c = jax.jit(fn).lower(*args).compile()
    out = c(*args)
    np.asarray(jax.tree.leaves(out)[0])
    ts = []
    for _ in range(3):
        t0 = time.time()
        for _ in range(reps):
            out = c(*args)
        np.asarray(jax.tree.leaves(out)[0])
        ts.append((time.time() - t0) / reps)
    dt = float(np.median(ts)) * 1e3
    print(f"{name:44s} {dt:8.2f} ms", flush=True)
    return dt


def enc_loss(p, text, text_mask):
    e = model.encode(p, text, text_mask)
    return jnp.sum(e * jnp.cos(0.01 * jnp.arange(e.size,
                                                 dtype=jnp.float32)
                               .reshape(e.shape)))


def train_step(p, o, st, b, step):
    rng_ = jax.random.fold_in(jax.random.PRNGKey(1), step)
    def loss_fn(pp):
        loss, ns, m = model.compute_cost(pp, norm, b, st, rng=rng_)
        return loss, ns
    (loss, ns), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
    p, o, info = adam_update(p, g, o, tcfg)
    return p, o, ns, loss


results = {}
for fused in (False, True):
    rec.bidirectional_lstm_split = functools.partial(
        orig, fuse_directions=fused)
    tag = "fused" if fused else "2-kernel"
    results[(tag, "enc_fwd")] = timed(
        f"encoder fwd ({tag})", enc_loss, params, batch.text,
        batch.text_mask)
    results[(tag, "enc_grad")] = timed(
        f"encoder fwd+bwd ({tag})",
        jax.grad(enc_loss), params, batch.text, batch.text_mask)
    results[(tag, "step")] = timed(
        f"FULL train step ({tag})", train_step, params, opt_state,
        dstate, batch, jnp.int32(0))
rec.bidirectional_lstm_split = orig

g = results[("fused", "step")]
b2 = results[("2-kernel", "step")]
print(f"\nfull-step gain: {b2:.2f} -> {g:.2f} ms "
      f"({100 * (b2 - g) / b2:+.1f}%)")
eg = results[("fused", "enc_grad")]
eb = results[("2-kernel", "enc_grad")]
print(f"encoder fwd+bwd gain: {eb:.2f} -> {eg:.2f} ms "
      f"({100 * (eb - eg) / eb:+.1f}%)")
