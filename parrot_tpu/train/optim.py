"""Native optimizer: Adam + global-norm step clipping + LR schedules.

Rebuilds what the reference gets from Blocks `GradientDescent(Adam(...),
StepClipping(...))` (reference train.py — mount empty, per SURVEY.md
§2.2). Pure pytree-in/pytree-out; jit/shard_map friendly.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from parrot_tpu.config import TrainConfig


def global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                        for x in leaves))


def clip_by_global_norm(tree, max_norm: float):
    """Blocks-style StepClipping: scale the whole gradient if its global
    norm exceeds max_norm. Returns (clipped_tree, norm)."""
    norm = global_norm(tree)
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
    return jax.tree.map(lambda x: x * scale, tree), norm


def lr_at(cfg: TrainConfig, step) -> jnp.ndarray:
    base = jnp.asarray(cfg.learning_rate, jnp.float32)
    if cfg.lr_schedule == "exponential":
        return base * jnp.power(cfg.lr_decay_rate,
                                step / float(cfg.lr_decay_steps))
    return base


def adam_init(params) -> Dict:
    zeros = lambda: jax.tree.map(jnp.zeros_like, params)
    return {"m": zeros(), "v": zeros(),
            "count": jnp.zeros((), jnp.int32)}


def adam_update(params, grads, opt_state, cfg: TrainConfig
                ) -> Tuple[Dict, Dict, Dict]:
    """One Adam step with step clipping. Returns (params, opt_state, info)."""
    grads, gnorm = clip_by_global_norm(grads, cfg.grad_clip)
    count = opt_state["count"] + 1
    b1, b2 = cfg.adam_b1, cfg.adam_b2
    m = jax.tree.map(lambda m_, g: b1 * m_ + (1 - b1) * g,
                     opt_state["m"], grads)
    v = jax.tree.map(lambda v_, g: b2 * v_ + (1 - b2) * g * g,
                     opt_state["v"], grads)
    c = count.astype(jnp.float32)
    mhat_scale = 1.0 / (1.0 - jnp.power(b1, c))
    vhat_scale = 1.0 / (1.0 - jnp.power(b2, c))
    lr = lr_at(cfg, c)
    new_params = jax.tree.map(
        lambda p, m_, v_: p - lr * (m_ * mhat_scale) /
        (jnp.sqrt(v_ * vhat_scale) + cfg.adam_eps),
        params, m, v)
    return new_params, {"m": m, "v": v, "count": count}, \
        {"grad_norm": gnorm, "lr": lr}
