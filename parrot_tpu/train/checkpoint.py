"""Checkpoint manager: atomic npz pytree snapshots + resume + best tracking.

Rebuilds the Blocks `Checkpoint` / `TrackTheBest` extensions (reference
train.py extension list — mount empty, per SURVEY.md §5 "Checkpoint /
resume"): periodic atomic saves of (step, params, opt state, norm stats,
config), `latest` auto-pickup for --resume, and a `best` pointer on valid
cost. Format is plain npz + json — no pickle, stable across versions.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def flatten_tree(tree, prefix="") -> Dict[str, np.ndarray]:
    """Flatten a nested dict/list/tuple of arrays into path->array."""
    out = {}
    if isinstance(tree, dict):
        for k in sorted(tree):
            out.update(flatten_tree(tree[k], f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(flatten_tree(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def unflatten_like(template, flat: Dict[str, np.ndarray], prefix=""):
    """Rebuild arrays in the shape of `template` from a flat path map."""
    if isinstance(template, dict):
        return {k: unflatten_like(v, flat, f"{prefix}{k}/")
                for k, v in template.items()}
    if isinstance(template, (list, tuple)):
        seq = [unflatten_like(v, flat, f"{prefix}{i}/")
               for i, v in enumerate(template)]
        if hasattr(template, "_fields"):   # NamedTuple (e.g. DecoderState)
            return type(template)(*seq)
        return type(template)(seq) if isinstance(template, tuple) else seq
    key = prefix[:-1]
    if key not in flat:
        raise KeyError(f"checkpoint missing array: {key}")
    arr = flat[key]
    # templates may be abstract (jax.eval_shape output) — never
    # materialize them just to read a shape
    want_shape = (tuple(template.shape) if hasattr(template, "shape")
                  else np.asarray(template).shape)
    if tuple(arr.shape) != tuple(want_shape):
        raise ValueError(f"shape mismatch for {key}: "
                         f"ckpt {arr.shape} vs model {want_shape}")
    return arr


class CheckpointManager:
    """Directory layout:

    save_dir/<model_name>/
        step_00001000/ arrays.npz meta.json
        latest  (text file: step dir name)
        best    (text file: step dir name)
    """

    def __init__(self, save_dir: str, model_name: str,
                 keep: int = 3):
        self.root = os.path.join(save_dir, model_name)
        os.makedirs(self.root, exist_ok=True)
        self.keep = keep

    def _step_dir(self, step: int) -> str:
        return os.path.join(self.root, f"step_{step:08d}")

    def save(self, step: int, trees: Dict[str, Any],
             meta: Optional[Dict] = None, is_best: bool = False) -> str:
        """trees: named pytrees, e.g. {'params':…, 'opt_state':…, 'norm':…}."""
        flat: Dict[str, np.ndarray] = {}
        for name, tree in trees.items():
            host = jax.tree.map(lambda x: np.asarray(jax.device_get(x)), tree)
            flat.update(flatten_tree(host, f"{name}/"))
        final = self._step_dir(step)
        tmp = tempfile.mkdtemp(dir=self.root, prefix=".tmp_")
        try:
            np.savez(os.path.join(tmp, "arrays.npz"), **flat)
            with open(os.path.join(tmp, "meta.json"), "w") as f:
                json.dump({"step": step, **(meta or {})}, f, indent=2)
            if os.path.exists(final):
                shutil.rmtree(final)
            os.replace(tmp, final)  # atomic publish
        except Exception:
            shutil.rmtree(tmp, ignore_errors=True)
            raise
        self._point("latest", final)
        if is_best:
            self._point("best", final)
        self._gc()
        return final

    def _point(self, name: str, target_dir: str):
        p = os.path.join(self.root, name)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            f.write(os.path.basename(target_dir))
        os.replace(tmp, p)

    def _gc(self):
        steps = sorted(d for d in os.listdir(self.root)
                       if d.startswith("step_"))
        protected = set()
        for name in ("latest", "best"):
            p = os.path.join(self.root, name)
            if os.path.exists(p):
                protected.add(open(p).read().strip())
        excess = [d for d in steps[:-self.keep] if d not in protected]
        for d in excess:
            shutil.rmtree(os.path.join(self.root, d), ignore_errors=True)

    def _resolve(self, which: str) -> Optional[str]:
        p = os.path.join(self.root, which)
        if os.path.exists(p):
            d = os.path.join(self.root, open(p).read().strip())
            if os.path.isdir(d):
                return d
        # fall back to newest step dir (pointer lost/corrupt)
        steps = sorted(d for d in os.listdir(self.root)
                       if d.startswith("step_"))
        return os.path.join(self.root, steps[-1]) if steps else None

    def restore(self, templates: Dict[str, Any], which: str = "latest"
                ) -> Optional[Tuple[int, Dict[str, Any], Dict]]:
        """Restore named pytrees shaped like `templates`.

        Returns (step, trees, meta) or None if no checkpoint exists.
        """
        d = self._resolve(which)
        if d is None:
            return None
        with np.load(os.path.join(d, "arrays.npz")) as z:
            flat = {k: z[k] for k in z.files}
        meta = json.load(open(os.path.join(d, "meta.json")))
        trees = {name: unflatten_like(tpl, flat, f"{name}/")
                 for name, tpl in templates.items()}
        return meta["step"], trees, meta


def load_for_inference(save_dir: str, model_name: str, which: str = "best"):
    """Shared restore path for generate.py / evaluation scripts.

    Returns (model, params, norm, cfg, step) from a saved checkpoint,
    rebuilding the architecture from the meta config saved at train time.
    Raises FileNotFoundError when no checkpoint exists.
    """
    import jax
    import jax.numpy as jnp

    from parrot_tpu.config import ParrotConfig
    from parrot_tpu.models import Parrot

    mgr = CheckpointManager(save_dir, model_name)
    d = mgr._resolve(which)
    if d is None:
        raise FileNotFoundError(
            f"no checkpoint under {save_dir}/{model_name}")
    meta = json.load(open(os.path.join(d, "meta.json")))
    if "config" not in meta:
        raise ValueError(f"checkpoint at {d} has no saved config")
    cfg = ParrotConfig.from_json(meta["config"])
    model = Parrot(cfg.model)
    # template only (shapes): eval_shape does no device work — eager
    # init over the axon tunnel costs minutes at load time otherwise
    params0 = jax.eval_shape(model.init_params, jax.random.PRNGKey(0))
    D = cfg.model.frame_size
    norm0 = {"mean": jnp.zeros((D,)), "std": jnp.ones((D,))}
    step, trees, _ = mgr.restore({"params": params0, "norm": norm0},
                                 which=which)
    params = jax.device_put(trees["params"])
    norm = {k: jnp.asarray(v) for k, v in trees["norm"].items()}
    return model, params, norm, cfg, step


def load_vocoder_for_inference(save_dir: str, model_name: str,
                               which: str = "best"):
    """Restore a trained SampleRNN neural vocoder (train_vocoder.py).

    Returns (model, params, norm, cfg, step). norm is the conditioning-
    feature normalization saved at train time (self-contained: neural
    synthesis needs no corpus access).
    """
    import jax
    import jax.numpy as jnp

    from parrot_tpu.config import SampleRNNConfig
    from parrot_tpu.models.samplernn import SampleRNN

    mgr = CheckpointManager(save_dir, model_name)
    d = mgr._resolve(which)
    if d is None:
        raise FileNotFoundError(
            f"no vocoder checkpoint under {save_dir}/{model_name}")
    meta = json.load(open(os.path.join(d, "meta.json")))
    if "config" not in meta or "samplernn" not in meta["config"]:
        raise ValueError(f"checkpoint at {d} is not a SampleRNN vocoder "
                         f"checkpoint (no samplernn config)")
    cfg = SampleRNNConfig(**meta["config"]["samplernn"])
    model = SampleRNN(cfg)
    params0 = jax.eval_shape(model.init_params, jax.random.PRNGKey(0))
    D = cfg.cond_dim
    norm0 = {"mean": jnp.zeros((D,)), "std": jnp.ones((D,))}
    step, trees, _ = mgr.restore({"params": params0, "norm": norm0},
                                 which=which)
    params = jax.device_put(trees["params"])
    norm = {k: jnp.asarray(v) for k, v in trees["norm"].items()}
    return model, params, norm, cfg, step
