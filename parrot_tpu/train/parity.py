"""Activation-level checkpoint parity: dump and diff per-layer traces.

Purpose (SURVEY.md §7 hard-part #2; BASELINE.json:5 "checkpoint-
compatible weights"): the day a real Theano/Blocks reference checkpoint
appears, the importer's name map must be pinned by comparing FORWARD
ACTIVATIONS layer by layer, not just by loading without error. This
module defines the trace schema and the diff:

  dump_trace(path, ...)  — run one teacher-forced probe batch, record
                           the batch inputs + every named activation;
  diff_trace(path, ...)  — rebuild the batch from the trace, run the
                           CURRENT params, report per-layer max/mean
                           abs error against the recorded activations.

Trace schema (single .npz):
  in/features (B,S,D) RAW   in/features_mask (B,S)   in/prev_frame (B,D)
  in/text (B,U) int32       in/text_mask (B,U)       in/speaker (B,)
  in/start_flag ()          norm/mean (D,)           norm/std (D,)
  act/<name> ...            meta/which_cost (str)

Activation names, in forward order (what a reference-side recorder must
produce — each maps 1:1 onto a quantity of the published Char2Wav
forward pass, SURVEY.md §3.3):
  embed    (B, U, embed_dim)  text-embedding lookups
  enc      (B, U, E)          bidirectional encoder states
  dec_h<l> (T, B, H)          decoder LSTM layer l hidden states
  phi      (T, B, U)          window attention weights
  w        (T, B, E)          attention context vectors
  readout  (T, B, R)          pre-head readout (tanh)
  head_raw (T, B, head_dim)   raw output-head values (GMM params / MSE)

A diff of a correctly imported checkpoint is ~1e-6 per layer (f32
accumulation-order differences only); a wrong name-map entry shows up
as a large error at exactly the first affected layer.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from parrot_tpu.data.pipeline import Batch
from parrot_tpu.nn.core import Embedding


def _stage_index(name: str) -> int:
    """Within-timestep forward order: embed, enc, dec_h1, phi, w,
    dec_h2.., readout, head_raw. (phi/w are produced from dec layer 1's
    output; higher decoder layers consume w.)"""
    if name == "embed":
        return 0
    if name == "enc":
        return 1
    if name == "dec_h1":
        return 2
    if name == "phi":
        return 3
    if name == "w":
        return 4
    if name.startswith("dec_h"):
        return 3 + int(name[5:])  # dec_h2 -> 5, dec_h3 -> 6, ...
    if name == "readout":
        return 1000
    if name == "head_raw":
        return 1001
    return 2000


def probe_activations(model, params, norm, batch) -> Dict[str, jnp.ndarray]:
    """One teacher-forced pass from a fresh state; returns named
    activations per the trace schema (see module docstring)."""
    text = jnp.asarray(batch.text)
    text_mask = jnp.asarray(batch.text_mask)
    B, S, D = batch.features.shape
    xn = (jnp.asarray(batch.features) - norm["mean"]) / norm["std"]
    x_tgt = xn.transpose(1, 0, 2)
    start = jnp.asarray(batch.start_flag)
    prev = (jnp.asarray(batch.prev_frame) - norm["mean"]) / norm["std"]
    prev = (1.0 - start) * prev
    x_in = jnp.concatenate([prev[None], x_tgt[:-1]], axis=0)

    state = model.init_state(B, text.shape[1])
    state = jax.tree.map(lambda z: (1.0 - start) * z, state)
    emb = Embedding.apply(params["embed"], text)
    enc = model.encode(params, text, text_mask)
    state = state._replace(enc=enc)
    spk = model._speaker_vec(params, jnp.asarray(batch.speaker))
    raw, _, phis, extra = model.scan_decoder(
        params, state, x_in, jnp.asarray(batch.features_mask).T,
        text_mask, spk, with_intermediates=True)
    H, L, E = model.H, model.L, model.E
    feats = extra["feats"]
    acts = {"embed": emb, "enc": enc}
    for l in range(L):
        acts[f"dec_h{l + 1}"] = feats[..., l * H:(l + 1) * H]
    acts["phi"] = phis
    acts["w"] = feats[..., L * H:]
    acts["readout"] = extra["readouts"]
    acts["head_raw"] = raw
    return acts


def _probe_batch_from_corpus(corpus, data_cfg, split="valid") -> Batch:
    from parrot_tpu.data.pipeline import parrot_stream
    return next(iter(parrot_stream(corpus, data_cfg, split,
                                   training=False, epochs=1)))


def dump_trace(path: str, model, params, norm, batch: Batch) -> None:
    """Record one probe batch's inputs + activations to `path` (.npz)."""
    acts = jax.jit(lambda p, b: probe_activations(model, p, norm, b))(
        params, batch)
    flat = {}
    for name, v in batch._asdict().items():
        flat[f"in/{name}"] = np.asarray(v)
    flat["norm/mean"] = np.asarray(norm["mean"])
    flat["norm/std"] = np.asarray(norm["std"])
    for name, v in acts.items():
        flat[f"act/{name}"] = np.asarray(v)
    flat["meta/which_cost"] = np.array(model.cfg.which_cost)
    np.savez(path, **flat)


def load_trace_batch(path: str) -> Tuple[Batch, Dict[str, np.ndarray],
                                         Dict[str, np.ndarray]]:
    """Returns (batch, norm, recorded activations) from a trace file."""
    with np.load(path) as z:
        batch = Batch(**{k[3:]: z[k] for k in z.files
                         if k.startswith("in/")})
        norm = {k[5:]: z[k] for k in z.files if k.startswith("norm/")}
        acts = {k[4:]: z[k] for k in z.files if k.startswith("act/")}
    return batch, norm, acts


def diff_trace(path: str, model, params,
               norm=None) -> Dict[str, Dict[str, float]]:
    """Run the current params on the trace's probe batch and report
    {layer: {max_abs_err, mean_abs_err, ref_scale}} per recorded layer.

    norm defaults to the trace's recorded stats (use the checkpoint's
    own stats only if you know they match the reference's).
    """
    batch, trace_norm, ref_acts = load_trace_batch(path)
    if norm is None:
        norm = {k: jnp.asarray(v) for k, v in trace_norm.items()}
    acts = jax.jit(lambda p, b: probe_activations(model, p, norm, b))(
        params, batch)
    return report_against(ref_acts, acts)


def report_against(ref_acts: Dict[str, np.ndarray],
                   acts) -> Dict[str, Dict[str, float]]:
    """diff_trace's comparison step, reusable with precomputed
    activations (auto_pin evaluates many candidates against one jitted
    probe)."""
    report = {}
    for name, ref in sorted(ref_acts.items()):
        if name not in acts:
            report[name] = {"max_abs_err": float("nan"),
                            "mean_abs_err": float("nan"),
                            "ref_scale": float(np.abs(ref).mean()),
                            "note": "layer absent in this model"}
            continue
        got = np.asarray(acts[name])
        if got.shape != ref.shape:
            report[name] = {"max_abs_err": float("inf"),
                            "mean_abs_err": float("inf"),
                            "ref_scale": float(np.abs(ref).mean()),
                            "note": f"shape {got.shape} vs {ref.shape}"}
            continue
        err = np.abs(got - ref)
        entry = {"max_abs_err": float(err.max()),
                 "mean_abs_err": float(err.mean()),
                 "ref_scale": float(np.abs(ref).mean())}
        # per-timestep profile for recurrent stages (leading T axis):
        # recurrence propagates any divergence to every later stage on
        # subsequent steps, so localization keys on the FIRST bad step
        if name not in ("embed", "enc") and err.ndim >= 2:
            step_max = err.reshape(err.shape[0], -1).max(axis=1)
            entry["step_max"] = step_max
        report[name] = entry
    return report


def first_divergence(report: Dict[str, Dict[str, float]],
                     tol: float = 1e-4) -> str:
    """Name of the layer where divergence ORIGINATES, or '' if none.

    Keyed on (first timestep whose error exceeds tol, within-step
    forward order): a wrong attention tensor shows as `phi` at step 0
    even though the recurrence drags dec_h1 off from step 1 onwards.
    embed/enc are pre-decoder (step -1).
    """
    best = None
    for name, r in report.items():
        if r["max_abs_err"] <= tol:
            continue
        if not np.isfinite(r["max_abs_err"]):
            # structural mismatch (layer absent / wrong shape): report it
            # only if no GENUINE numeric divergence exists — a real
            # step-0 error elsewhere is the actionable finding
            first_step = 10 ** 12
        elif "step_max" in r:
            bad_steps = np.nonzero(r["step_max"] > tol)[0]
            first_step = int(bad_steps[0]) if bad_steps.size else 10 ** 9
        else:
            first_step = -1  # pre-decoder stage (embed/enc)
        key = (first_step, _stage_index(name))
        if best is None or key < best[0]:
            best = (key, name)
    return best[1] if best else ""
