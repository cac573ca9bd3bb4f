"""Encoder's MARGINAL in-step cost (round-5 corrected decomposition):
full train step vs the same step with encode() replaced by a
precomputed constant (B, U, E) block — the BiLSTM fwd+bwd and the
embed/grad work drop out, everything downstream unchanged."""
import dataclasses
import os
import sys
import time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
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
batch = Batch(features=jnp.asarray(rng.normal(size=(B,S,D))*0.5, jnp.float32),
              features_mask=jnp.ones((B,S)), prev_frame=jnp.zeros((B,D)),
              text=jnp.asarray(rng.integers(1,cfg.vocab_size,(B,U)),jnp.int32),
              text_mask=jnp.ones((B,U)), speaker=jnp.zeros((B,),jnp.int32),
              start_flag=jnp.float32(1.0))
norm = {"mean": jnp.zeros((D,)), "std": jnp.ones((D,))}
dstate = model.init_state(B, U)
tcfg = TrainConfig()
opt = jax.jit(adam_init)(params)
enc_const = jax.jit(model.encode)(params, batch.text, batch.text_mask)

def timed(name, fn, *args, reps=20):
    c = jax.jit(fn).lower(*args).compile()
    out = c(*args); np.asarray(jax.tree.leaves(out)[0].ravel()[:4])
    ts = []
    for _ in range(3):
        t0 = time.time()
        for _ in range(reps): out = c(*args)
        np.asarray(jax.tree.leaves(out)[0].ravel()[:4])
        ts.append((time.time()-t0)/reps)
    dt = float(np.median(ts))*1e3
    print(f"{name:44s} {dt:7.2f} ms")
    return dt

def full_step(p, o, st, b, step):
    rng_ = jax.random.fold_in(jax.random.PRNGKey(1), step)
    def loss_fn(pp):
        loss, ns, m = model.compute_cost(pp, norm, b, st, rng=rng_)
        return loss, ns
    (loss, ns), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
    p, o, info = adam_update(p, g, o, tcfg)
    return p, o, ns, loss

import parrot_tpu.models.parrot as pmod
orig_encode = Parrot.encode
def frozen_encode(self, p, text, text_mask):
    return enc_const
def frozen_step(p, o, st, b, step):
    rng_ = jax.random.fold_in(jax.random.PRNGKey(1), step)
    def loss_fn(pp):
        loss, ns, m = model.compute_cost(pp, norm, b, st, rng=rng_)
        return loss, ns
    (loss, ns), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
    p, o, info = adam_update(p, g, o, tcfg)
    return p, o, ns, loss

t_full = timed("FULL step", full_step, params, opt, dstate, batch, jnp.int32(0))
Parrot.encode = frozen_encode
t_frozen = timed("step w/ frozen encoder output", frozen_step, params, opt, dstate, batch, jnp.int32(0))
Parrot.encode = orig_encode
print(f"\nencoder marginal in-step cost: {t_full-t_frozen:.2f} ms ({100*(t_full-t_frozen)/t_full:.1f}% of step)")
