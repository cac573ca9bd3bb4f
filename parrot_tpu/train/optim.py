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
        base = base * jnp.power(cfg.lr_decay_rate,
                                step / float(cfg.lr_decay_steps))
    if cfg.warmup_steps > 0:
        base = base * jnp.minimum(1.0, step / float(cfg.warmup_steps))
    return base


def adam_init(params, fused: bool = True) -> Dict:
    """fused=True (default): m/v live as ONE flat f32 buffer each and
    the whole update runs as a handful of fused elementwise passes —
    the per-leaf tree-map update dispatches ~100 small kernels over the
    param tree and measured ~3.4 ms/step at flagship dims vs ~0.5 ms
    fused (docs/PERFORMANCE.md round 3). adam_update dispatches on the
    state layout, so tree-layout states (pre-round-3 checkpoints, or
    fused=False) still take the per-leaf path."""
    if fused:
        n = sum(int(l.size) for l in jax.tree.leaves(params))
        return {"m": jnp.zeros((n,), jnp.float32),
                "v": jnp.zeros((n,), jnp.float32),
                "count": jnp.zeros((), jnp.int32)}
    zeros = lambda: jax.tree.map(jnp.zeros_like, params)
    return {"m": zeros(), "v": zeros(),
            "count": jnp.zeros((), jnp.int32)}


def _flatten(tree) -> jnp.ndarray:
    return jnp.concatenate(
        [l.astype(jnp.float32).ravel() for l in jax.tree.leaves(tree)])


def _unflatten_like(tree, flat):
    leaves, treedef = jax.tree.flatten(tree)
    out, o = [], 0
    for l in leaves:
        out.append(flat[o:o + l.size].reshape(l.shape).astype(l.dtype))
        o += int(l.size)
    return jax.tree.unflatten(treedef, out)


def adam_update(params, grads, opt_state, cfg: TrainConfig
                ) -> Tuple[Dict, Dict, Dict]:
    """One Adam step with step clipping. Returns (params, opt_state, info)."""
    b1, b2 = cfg.adam_b1, cfg.adam_b2
    count = opt_state["count"] + 1
    c = count.astype(jnp.float32)
    mhat_scale = 1.0 / (1.0 - jnp.power(b1, c))
    vhat_scale = 1.0 / (1.0 - jnp.power(b2, c))
    lr = lr_at(cfg, c)

    fused = (not isinstance(opt_state["m"], dict)
             and getattr(opt_state["m"], "ndim", None) == 1)
    if fused:
        g = _flatten(grads)
        gnorm = jnp.sqrt(jnp.sum(g * g))
        g = g * jnp.minimum(1.0, cfg.grad_clip
                            / jnp.maximum(gnorm, 1e-12))
        m = b1 * opt_state["m"] + (1 - b1) * g
        v = b2 * opt_state["v"] + (1 - b2) * g * g
        p = _flatten(params)
        p = p - lr * (m * mhat_scale) / (jnp.sqrt(v * vhat_scale)
                                         + cfg.adam_eps)
        new_params = _unflatten_like(params, p)
        return new_params, {"m": m, "v": v, "count": count}, \
            {"grad_norm": gnorm, "lr": lr}

    grads, gnorm = clip_by_global_norm(grads, cfg.grad_clip)
    m = jax.tree.map(lambda m_, g: b1 * m_ + (1 - b1) * g,
                     opt_state["m"], grads)
    v = jax.tree.map(lambda v_, g: b2 * v_ + (1 - b2) * g * g,
                     opt_state["v"], grads)
    new_params = jax.tree.map(
        lambda p, m_, v_: p - lr * (m_ * mhat_scale) /
        (jnp.sqrt(v_ * vhat_scale) + cfg.adam_eps),
        params, m, v)
    return new_params, {"m": m, "v": v, "count": count}, \
        {"grad_norm": gnorm, "lr": lr}
