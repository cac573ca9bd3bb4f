"""Adam's MARGINAL in-step cost: full train step vs identical step with
the optimizer update removed (grads still computed & returned)."""
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
    print(f"{name:40s} {dt:7.2f} ms")
    return dt

def full_step(p, o, st, b, step):
    rng_ = jax.random.fold_in(jax.random.PRNGKey(1), step)
    def loss_fn(pp):
        loss, ns, m = model.compute_cost(pp, norm, b, st, rng=rng_)
        return loss, ns
    (loss, ns), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
    p, o, info = adam_update(p, g, o, tcfg)
    return p, o, ns, loss

def no_opt_step(p, o, st, b, step):
    rng_ = jax.random.fold_in(jax.random.PRNGKey(1), step)
    def loss_fn(pp):
        loss, ns, m = model.compute_cost(pp, norm, b, st, rng=rng_)
        return loss, ns
    (loss, ns), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
    # consume grads cheaply so nothing is dead-code-eliminated
    gn = sum(jnp.sum(x*x) for x in jax.tree.leaves(g))
    return p, o, ns, loss + 0.0*gn

t_full = timed("FULL step (grad + Adam)", full_step, params, opt, dstate, batch, jnp.int32(0))
t_noop = timed("step w/o optimizer (grad only)", no_opt_step, params, opt, dstate, batch, jnp.int32(0))
print(f"\nAdam marginal in-step cost: {t_full-t_noop:.2f} ms ({100*(t_full-t_noop)/t_full:.1f}% of step)")
