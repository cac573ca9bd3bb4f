"""On-chip probe for the round-5 fwd-only kernel variant (VERDICT r4 #3):

1. forward parity: undifferentiated compute_cost (pallas fwd-only primal)
   vs the lax.scan path, loose TPU tolerance;
2. eval/forward step cost (the residual-free path every eval pays);
3. plain train step cost vs scheduled-sampling (two-pass) train step cost
   at production defaults B=256 S=50 U=128 — the 'well below 2x' gate.
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from parrot_tpu.config import ModelConfig, TrainConfig
from parrot_tpu.data.pipeline import Batch
from parrot_tpu.models import Parrot
from parrot_tpu.models.parrot import resolve_pallas_scan
from parrot_tpu.train.optim import adam_init, adam_update

B, S, U = 256, 50, 128
cfg = ModelConfig()
cfg = dataclasses.replace(cfg, pallas_scan=resolve_pallas_scan(cfg, B))
print("pallas_scan resolved:", cfg.pallas_scan)
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
tcfg = TrainConfig(scheduled_sampling_rate=0.25)


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
    print(f"{name:34s} {dt:8.2f} ms")
    return dt, out


# ---- 1. forward parity: pallas fwd-only primal vs lax path ----------
def fwd(p, b, st):
    loss, new_state, m = model.compute_cost(p, norm, b, st)
    return loss

lax_model = Parrot(dataclasses.replace(cfg, pallas_scan=False))
def fwd_lax(p, b, st):
    loss, new_state, m = lax_model.compute_cost(p, norm, b, st)
    return loss

t_fwd, l_pal = timed("eval fwd (pallas fwd-only primal)", fwd, params, batch, dstate)
t_fwd_lax, l_lax = timed("eval fwd (lax.scan path)", fwd_lax, params, batch, dstate)
print(f"loss pallas={float(l_pal):.6f} lax={float(l_lax):.6f} "
      f"diff={abs(float(l_pal)-float(l_lax)):.2e}")
assert abs(float(l_pal) - float(l_lax)) < 2e-3, "fwd parity FAIL"

# ---- 2. plain train step vs SS two-pass train step -------------------
opt_state = jax.jit(adam_init)(params)

def plain_step(p, o, st, b, step):
    rng_ = jax.random.fold_in(jax.random.PRNGKey(1), step)
    def loss_fn(pp):
        loss, ns, m = model.compute_cost(pp, norm, b, st, rng=rng_)
        return loss, ns
    (loss, ns), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
    p, o, info = adam_update(p, g, o, tcfg)
    return p, o, ns, loss

def ss_step(p, o, st, b, step):
    rng_ = jax.random.fold_in(jax.random.PRNGKey(1), step)
    rng_, k_ss = jax.random.split(rng_)
    k_pred, k_coin = jax.random.split(k_ss)
    # pass 1: undifferentiated -> pallas fwd-only primal
    _, _, m1 = model.compute_cost(p, norm, b, st, with_predictions=True,
                                  prediction_key=k_pred,
                                  prediction_bias=0.25)
    pred = jax.lax.stop_gradient(m1["pred_frames"])
    coin = jax.random.bernoulli(k_coin, 0.25,
                                (pred.shape[0], pred.shape[1], 1))
    inp = jnp.where(coin, pred, b.features)
    def loss_fn(pp):
        loss, ns, m = model.compute_cost(pp, norm, b, st, rng=rng_,
                                         input_frames=inp)
        return loss, ns
    (loss, ns), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
    p, o, info = adam_update(p, g, o, tcfg)
    return p, o, ns, loss

t_plain, _ = timed("plain train step", plain_step, params, opt_state,
                   dstate, batch, jnp.int32(0))
t_ss, _ = timed("SS two-pass train step", ss_step, params, opt_state,
                dstate, batch, jnp.int32(0))
print(f"SS/plain ratio: {t_ss / t_plain:.3f}x  (gate: well below 2x)")
