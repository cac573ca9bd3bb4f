"""Importer for reference (Theano/Blocks) checkpoints.

The north star requires "checkpoint-compatible weights" (BASELINE.json:5):
a user holding a sotelo/parrot checkpoint must be able to load it here.
Blocks' `Checkpoint` extension pickles the main loop (SURVEY.md §5
"Checkpoint / resume"); the parameter values live in a dict of
brick-path -> ndarray (e.g. "/parrot/char_embedding.W").

Because the reference mount was empty at build time (SURVEY.md §0), the
exact brick paths cannot be verified; this module therefore implements
the MACHINERY — archive loading, a declarative name map with per-tensor
transforms, strict coverage checking — with a best-effort default map to
be pinned down against a real checkpoint. Supported containers:

  * .npz            — name -> array
  * .pkl / .tar     — pickled dict (or pickled Blocks parameter dict)
  * .zip            — Blocks serialization archive holding an inner
                      pickle or npz

Transforms available in a map entry: "transpose", "gate_reorder:<perm>"
(reorder fused LSTM gate blocks, e.g. Theano order -> i,f,g,o).

NOTE: weight import only gives parity if the FEATURE SPACE matches too —
before importing against a real corpus/checkpoint, diff the reference's
preprocessing against docs/FEATURES.md field by field (frame layout,
hop, FFT sizing, band ownership, normalization).
"""

from __future__ import annotations

import os
import pickle
import re
import tarfile
import zipfile
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np


def load_reference_arrays(path: str) -> Dict[str, np.ndarray]:
    """Load a name->array dict from any supported container."""
    if path.endswith(".npz"):
        with np.load(path, allow_pickle=False) as z:
            return {k: z[k] for k in z.files}
    if zipfile.is_zipfile(path):
        with zipfile.ZipFile(path) as z:
            for name in z.namelist():
                if name.endswith(".npz"):
                    import io
                    with np.load(io.BytesIO(z.read(name))) as zz:
                        return {k: zz[k] for k in zz.files}
                if name.endswith((".pkl", ".pickle")):
                    return _from_pickle_bytes(z.read(name))
        raise ValueError(f"no parameter payload found in zip: {path}")
    if tarfile.is_tarfile(path):
        with tarfile.open(path) as t:
            for m in t.getmembers():
                if m.name.endswith((".pkl", ".pickle", "params")):
                    return _from_pickle_bytes(t.extractfile(m).read())
        raise ValueError(f"no parameter payload found in tar: {path}")
    with open(path, "rb") as f:
        return _from_pickle_bytes(f.read())


def _from_pickle_bytes(raw: bytes) -> Dict[str, np.ndarray]:
    obj = pickle.loads(raw)
    if isinstance(obj, dict):
        out = {}
        for k, v in obj.items():
            arr = np.asarray(v)
            if arr.dtype == object:
                raise ValueError(f"non-array entry in checkpoint: {k}")
            out[str(k)] = arr
        return out
    raise ValueError(f"unsupported pickle payload: {type(obj)}")


def gate_reorder(arr: np.ndarray, perm: List[int]) -> np.ndarray:
    """Reorder the fused 4-gate blocks along the last axis."""
    H4 = arr.shape[-1]
    assert H4 % 4 == 0, f"last dim {H4} not 4*H"
    H = H4 // 4
    blocks = [arr[..., i * H:(i + 1) * H] for i in perm]
    return np.concatenate(blocks, axis=-1)


def _apply_transforms(arr: np.ndarray, transforms: List[str]) -> np.ndarray:
    for t in transforms:
        if t == "transpose":
            arr = arr.T
        elif t.startswith("gate_reorder:"):
            perm = [int(c) for c in t.split(":", 1)[1].split(",")]
            arr = gate_reorder(arr, perm)
        else:
            raise ValueError(f"unknown transform: {t}")
    return arr


def build_default_map(encoder_layers: int = 1, decoder_layers: int = 3,
                      gate_perm: Optional[List[int]] = None,
                      ) -> List[Tuple[str, str, List[str]]]:
    """Best-effort name map for ANY depth: reference brick path pattern
    -> (our tree path, transforms). Our tree paths use '/'-joined keys
    matching checkpoint.flatten_tree. UNVERIFIED against the real repo
    (SURVEY.md §0) — pin against a real checkpoint with
    auto_pin.auto_pin, which searches `gate_perm` (applied to every
    fused-LSTM gate tensor: Blocks/Theano gate order is a single global
    library convention, not per-cell).
    """
    g = ([f"gate_reorder:{','.join(map(str, gate_perm))}"]
         if gate_perm and list(gate_perm) != [0, 1, 2, 3] else [])

    rules: List[Tuple[str, str, List[str]]] = [
        (r".*(char|text|lookup).*embed.*\.W$", "embed/table", []),
    ]
    for l in range(encoder_layers):
        # depth-0 paths may omit the level tag entirely (single-layer
        # bricks); deeper levels must carry their index
        lvl = (rf"(level[_]?{l}(?!\d).*)?" if l == 0 and encoder_layers == 1
               else rf"level[_]?{l}(?!\d).*")
        for d, ours in (("forward", "enc_fwd"), ("backward", "enc_bwd")):
            rules += [
                (rf".*encoder.*{d}.*{lvl}W_state$", f"{ours}/{l}/wh", g),
                (rf".*encoder.*{d}.*{lvl}\.W$", f"{ours}/{l}/wx", g),
                (rf".*encoder.*{d}.*{lvl}\.b(iases)?$", f"{ours}/{l}/b",
                 g),
            ]
    rules += [
        (r".*window.*\.W$", "attn/proj/w", []),
        (r".*window.*\.b(iases)?$", "attn/proj/b", []),
    ]
    for l in range(decoder_layers):
        rules += [
            (rf".*(rnn[_]?\d*.*)?level[_]?{l}(?!\d).*W_state$", f"dec/{l}/wh",
             g),
            (rf".*level[_]?{l}(?!\d).*(fork|input|x_to).*\.W$", f"dec/{l}/wx",
             g),
            (rf".*level[_]?{l}(?!\d).*\.b(iases)?$", f"dec/{l}/b", g),
        ]
    rules += [
        (r".*readout.*\.W$", "readout/w", []),
        (r".*readout.*\.b(iases)?$", "readout/b", []),
        (r".*(emitter|mixture|gmm).*\.W$", "head/w", []),
        (r".*(emitter|mixture|gmm).*\.b(iases)?$", "head/b", []),
        (r".*speaker.*\.W$", "speaker/table", []),
    ]
    return rules


# Kept for the flagship shape (backward compatibility with callers that
# imported the constant); equivalent to build_default_map(1, 3).
DEFAULT_MAP: List[Tuple[str, str, List[str]]] = build_default_map(1, 3)


def import_theano_checkpoint(
    path: str,
    params_template,
    name_map: Optional[List[Tuple[str, str, List[str]]]] = None,
    strict: bool = True,
):
    """Map a reference checkpoint onto our parameter tree.

    params_template: our initialized params pytree (shapes are validated).
    name_map: list of (regex over reference names, our flat path,
    transforms); defaults to DEFAULT_MAP. Returns (params, report) where
    report lists matched / unmatched-reference / unfilled-ours entries.
    """
    from parrot_tpu.train.checkpoint import flatten_tree, unflatten_like

    ref = load_reference_arrays(path)
    rules = name_map if name_map is not None else DEFAULT_MAP
    ours_flat = flatten_tree(params_template)
    filled: Dict[str, np.ndarray] = {}
    matched_ref = set()

    for ref_name, arr in ref.items():
        for pattern, our_path, transforms in rules:
            if re.match(pattern, ref_name):
                if our_path in filled:
                    # first reference tensor wins for a target; a later
                    # duplicate must NOT fall through to other rules (it
                    # would bind to the wrong target)
                    break
                out = _apply_transforms(arr, transforms)
                if our_path not in ours_flat:
                    raise KeyError(f"map target not in model: {our_path}")
                want = ours_flat[our_path].shape
                if tuple(out.shape) != tuple(want):
                    if tuple(out.T.shape) == tuple(want):
                        out = out.T  # auto-fix orientation
                    else:
                        raise ValueError(
                            f"{ref_name} -> {our_path}: shape "
                            f"{out.shape} vs model {want}")
                filled[our_path] = out.astype(np.float32)
                matched_ref.add(ref_name)
                break

    report = {
        "matched": sorted(filled),
        "unmatched_reference": sorted(set(ref) - matched_ref),
        "unfilled_model": sorted(set(ours_flat) - set(filled)),
    }
    if strict and report["unfilled_model"]:
        raise ValueError(
            "checkpoint does not cover the full model; unfilled: "
            + ", ".join(report["unfilled_model"][:8])
            + (" ..." if len(report["unfilled_model"]) > 8 else ""))
    merged = dict(ours_flat)
    merged.update(filled)
    params = unflatten_like(params_template, merged)
    return params, report
