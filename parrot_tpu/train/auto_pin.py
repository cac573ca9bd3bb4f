"""Automatic pinning of the Theano/Blocks import map against a trace.

The importer's DEFAULT_MAP (theano_import.build_default_map) is a
best-effort reconstruction — the reference mount was empty at build time
(SURVEY.md §0), so the two genuinely unverifiable conventions are:

  * the fused-LSTM **gate order** (Blocks vs ours i,f,g,o) — one global
    library convention applied to every wx/wh/b;
  * per-tensor **orientation** (Theano stores some weights transposed;
    shape-mismatched cases auto-fix, square ones are silently ambiguous)
    and the GMM head's **block layout** (mu/log_sigma/logit_pi order).

Given a reference archive plus an activation trace of the SAME
checkpoint (train/parity.py schema — the reference side records it once
with a small script), `auto_pin` searches those conventions until the
activation diff clears, so pinning a real checkpoint costs hours of
machine search, not days of by-hand tensor archaeology (VERDICT r2
next-step #2). The search is oracle-guided: parity.first_divergence
names the first layer whose activations diverge, and only the tensors
feeding that layer are refined, in forward order.

When the regex name map does not cover the archive at all (brick paths
unlike anything guessed — the exact unverifiable unknown of SURVEY.md
§0), a SHAPE-GUIDED FALLBACK takes over (VERDICT r3 weak #5): unmatched
archive arrays and unfilled model slots are grouped by
transpose-equivalent shape; singleton groups assign directly, and
ambiguous same-shape groups become additional per-stage search axes
that the same activation oracle resolves jointly with gate order /
orientation / head layout. A fully renamed archive therefore still
round-trips with zero hand-written map entries (tests/test_auto_pin.py).

Contract: BASELINE.json:5 "checkpoint-compatible weights"; expected
reference location [ref: blocks serialization — UNVERIFIED].
"""

from __future__ import annotations

import itertools
from typing import Dict, List, Tuple

import numpy as np

import re

from parrot_tpu.train.theano_import import (build_default_map,
                                            gate_reorder,
                                            load_reference_arrays)


def _assign_raw(ref: Dict[str, np.ndarray], rules,
                ours_flat: Dict[str, np.ndarray]
                ) -> Tuple[Dict[str, np.ndarray], set]:
    """Name-map matching only (no transforms): our_path -> raw ref
    array. Same first-match-wins semantics as import_theano_checkpoint;
    shape compatibility means equal or transposed-equal. Also returns
    the set of consumed archive names (the leftovers feed the
    shape-guided fallback)."""
    filled: Dict[str, np.ndarray] = {}
    used: set = set()
    for ref_name, arr in ref.items():
        for pattern, our_path, _ in rules:
            if re.match(pattern, ref_name):
                if our_path in filled:
                    break
                if our_path not in ours_flat:
                    break
                want = tuple(ours_flat[our_path].shape)
                if tuple(arr.shape) != want and tuple(arr.T.shape) != want:
                    raise ValueError(
                        f"{ref_name} -> {our_path}: shape {arr.shape} "
                        f"incompatible with model {want}")
                filled[our_path] = arr
                used.add(ref_name)
                break
    return filled, used


def _shape_class(shape: Tuple[int, ...]) -> Tuple[int, ...]:
    """Transpose-equivalence class: 2-D shapes compare unordered (the
    archive may store either orientation); other ranks compare exact."""
    return tuple(sorted(shape)) if len(shape) == 2 else tuple(shape)


def _shape_fallback(ref: Dict[str, np.ndarray], used: set,
                    ours_flat: Dict[str, np.ndarray],
                    raw: Dict[str, np.ndarray],
                    missing: List[str]):
    """Shape-guided assignment of unmatched archive arrays to unfilled
    model slots (VERDICT r3 weak #5): group both sides by
    transpose-equivalent shape, force the singleton groups, and return
    the ambiguous groups for the oracle-guided search to permute (the
    activation trace resolves them in forward order, exactly like the
    convention axes). Returns (raw with an initial assignment for every
    missing path, ambiguous groups [{'paths': [...], 'refs': [...]}]).
    """
    left = sorted(set(ref) - used)
    miss_by_class: Dict[Tuple[int, ...], List[str]] = {}
    for path in missing:
        miss_by_class.setdefault(
            _shape_class(ours_flat[path].shape), []).append(path)
    left_by_class: Dict[Tuple[int, ...], List[str]] = {}
    for name in left:
        left_by_class.setdefault(
            _shape_class(ref[name].shape), []).append(name)
    problems = []
    for cls, paths in miss_by_class.items():
        cands = left_by_class.get(cls, [])
        if len(cands) < len(paths):
            problems.append(
                f"shape {cls}: {len(paths)} model slot(s) "
                f"({', '.join(paths[:4])}) but only {len(cands)} "
                f"unmatched archive array(s)")
    if problems:
        raise ValueError(
            "shape-guided fallback cannot cover the name map's gaps: "
            + "; ".join(problems))
    raw = dict(raw)
    groups = []
    for cls in sorted(miss_by_class):
        paths = sorted(miss_by_class[cls])
        refs = left_by_class[cls]
        # surplus archive arrays of this shape (e.g. optimizer slots
        # riding in the pickle) stay unassigned; the permutation axis
        # covers which subset lands where
        for i, path in enumerate(paths):
            raw[path] = ref[refs[i]]
        if len(paths) == 1 and len(refs) == 1:
            groups.append({"paths": paths, "refs": refs, "forced": True})
        else:
            groups.append({"paths": paths, "refs": refs, "forced": False})
    return raw, groups


def _lstm_cells(ours_flat) -> List[str]:
    """Cell prefixes ('enc_fwd/0', 'dec/2', ...) of every fused-gate
    LSTM in the tree."""
    cells = set()
    for path in ours_flat:
        if path.endswith("/wx") or path.endswith("/wh"):
            cells.add(path.rsplit("/", 1)[0])
    return sorted(cells)


_GATE_TENSORS = ("wx", "wh", "b")


def _materialize(ours_flat, raw: Dict[str, np.ndarray],
                 cell_perms: Dict[str, Tuple[int, ...]],
                 transposed: frozenset,
                 head_perm: Tuple[int, int, int],
                 head_dims: Tuple[int, int]) -> Dict[str, np.ndarray]:
    """Apply (orientation, gate perm, head block perm) choices to the
    raw assignment; returns a full flat params dict."""
    M, D = head_dims
    sizes = [M * D, M * D, M]  # our layout: mu, log_sigma, logit_pi
    out = dict(ours_flat)
    for path, arr in raw.items():
        want = tuple(ours_flat[path].shape)
        a = arr
        if tuple(a.shape) != want:
            a = a.T                      # forced orientation fix
        elif path in transposed:
            a = a.T                      # searched choice (square case)
        cell = path.rsplit("/", 1)[0]
        leaf = path.rsplit("/", 1)[1]
        if leaf in _GATE_TENSORS and cell in cell_perms:
            p = cell_perms[cell]
            if tuple(p) != (0, 1, 2, 3):
                a = gate_reorder(a, list(p))
        if path in ("head/w", "head/b") and head_perm != (0, 1, 2):
            # head_perm[k] = which OUR block the k-th archive block is:
            # rebuild our (mu, sigma, pi) layout from the archive order
            arch_sizes = [sizes[i] for i in head_perm]
            off, blocks = 0, {}
            for k, i in enumerate(head_perm):
                blocks[i] = a[..., off:off + arch_sizes[k]]
                off += arch_sizes[k]
            a = np.concatenate([blocks[0], blocks[1], blocks[2]], axis=-1)
        out[path] = np.asarray(a, np.float32)
    return out


def auto_pin(archive_path: str, model, params_template, trace_path: str,
             tol: float = 1e-4, rules=None, verbose: bool = False):
    """Search import conventions until the activation trace clears.

    Returns (params, pin, report) — `pin` records the resolved
    conventions ({'gate_perm': ..., 'cell_perms': {...}, 'transposed':
    [...], 'head_perm': ...}) and `report` the final diff_trace output.
    Raises ValueError when no searched combination clears `tol` (the
    name map itself is then wrong — first_divergence in the error
    message says where).
    """
    import jax
    import jax.numpy as jnp
    from parrot_tpu.train.checkpoint import flatten_tree, unflatten_like
    from parrot_tpu.train.parity import (first_divergence,
                                         load_trace_batch,
                                         probe_activations,
                                         report_against)

    cfg = model.cfg
    ref = {k: np.asarray(v)
           for k, v in load_reference_arrays(archive_path).items()}
    if rules is None:
        rules = build_default_map(cfg.encoder_layers, cfg.decoder_layers)
    ours_flat = {k: np.asarray(v)
                 for k, v in flatten_tree(params_template).items()}
    raw, used = _assign_raw(ref, rules, ours_flat)
    missing = sorted(set(ours_flat) - set(raw))
    assign_groups: List[Dict] = []
    if missing:
        # the regexes don't cover the archive's brick names — fall back
        # to shape-guided assignment; ambiguous same-shape groups become
        # search axes resolved by the activation oracle below
        raw, assign_groups = _shape_fallback(ref, used, ours_flat, raw,
                                             missing)
        if verbose:
            amb = [g for g in assign_groups if not g["forced"]]
            print(f"shape fallback: {len(missing)} unmatched slots, "
                  f"{len(amb)} ambiguous group(s) "
                  f"{[tuple(g['paths']) for g in amb]}")
    cells = _lstm_cells(ours_flat)
    head_dims = (cfg.num_mixtures, cfg.frame_size)

    def materialize_raw(assign):
        """Current raw assignment under the searched group choices.
        assign: {group_idx: tuple sel} where sel[i] = index into the
        group's refs for its i-th path."""
        if not assign:
            return raw
        r2 = dict(raw)
        for gi, sel in assign.items():
            grp = assign_groups[gi]
            for i, path in enumerate(grp["paths"]):
                r2[path] = ref[grp["refs"][sel[i]]]
        return r2

    # one jitted probe reused for every candidate (the search runs
    # dozens of evaluations; per-candidate recompiles would dominate)
    batch, trace_norm, ref_acts = load_trace_batch(trace_path)
    norm = {k: jnp.asarray(v) for k, v in trace_norm.items()}
    probe = jax.jit(lambda p: probe_activations(model, p, norm, batch))

    def evaluate(cell_perms, transposed, head_perm, assign=None):
        flat = _materialize(ours_flat, materialize_raw(assign or {}),
                            cell_perms, transposed, head_perm, head_dims)
        params = unflatten_like(params_template, flat)
        rep = report_against(ref_acts, probe(params))
        div = first_divergence(rep, tol=tol)
        return params, rep, div

    def div_key(rep, div):
        """Lexicographic progress: (first bad step, stage) — larger is
        better; None = clean."""
        if not div:
            return None
        r = rep[div]
        from parrot_tpu.train.parity import _stage_index
        if "step_max" in r:
            bad = np.nonzero(np.asarray(r["step_max"]) > tol)[0]
            step = int(bad[0]) if bad.size else 10 ** 9
        else:
            step = -1
        return (step, _stage_index(div))

    def worst_err(rep):
        return max(r["max_abs_err"] for r in rep.values())

    def prefix_err(rep, div):
        """Worst error over the stages BEFORE the first divergence —
        the tie-breaker between candidates that diverge at the same
        place: a candidate whose clean prefix is exact (roundoff) beats
        one that merely slipped under `tol` in a near-linear regime."""
        from parrot_tpu.train.parity import _stage_index
        cut = _stage_index(div) if div else np.inf
        errs = [r["max_abs_err"] for name, r in rep.items()
                if _stage_index(name) < cut]
        return max(errs) if errs else 0.0

    def assign_report(assign) -> Dict[str, str]:
        """Final path -> archive-name mapping of the fallback groups."""
        out = {}
        for gi, grp in enumerate(assign_groups):
            sel = (assign or {}).get(gi, tuple(range(len(grp["paths"]))))
            for i, path in enumerate(grp["paths"]):
                out[path] = grp["refs"][sel[i]]
        return out

    # ---- stage A: global gate-order search (the overwhelmingly likely
    # single unknown — one library convention for every cell).
    # IMPORTANT: a near-linear regime (small pre-activations — tiny
    # test models, but also real checkpoints early in training) can
    # push a WRONG gate assignment under `tol` (an i/o swap perturbs
    # sigmoid(x)≈0.5+x/4 only at second order). The true convention is
    # exact — float-roundoff error, orders of magnitude below any
    # confusable — so among clearing candidates we keep the SMALLEST
    # activation error, never the first to clear.
    best = None
    clean = None
    for p in itertools.permutations(range(4)):
        cp = {c: p for c in cells}
        params, rep, div = evaluate(cp, frozenset(), (0, 1, 2))
        if verbose:
            print(f"gate_perm {p}: first_divergence="
                  f"{div or f'CLEAN (worst {worst_err(rep):.3g})'}")
        if not div:
            if clean is None or worst_err(rep) < worst_err(clean[2]):
                clean = (p, params, rep)
            continue
        k = (div_key(rep, div), -prefix_err(rep, div))
        if best is None or k > best[0]:
            best = (k, p, cp, frozenset(), (0, 1, 2), params, rep, div)
    if clean is not None:
        p, params, rep = clean
        pin = {"gate_perm": list(p), "cell_perms": {},
               "transposed": [], "head_perm": [0, 1, 2]}
        if assign_groups:
            pin["assignment"] = assign_report({})
        return params, pin, rep

    # ---- stage B: oracle-guided per-stage refinement. Fix the first
    # divergent stage by jointly searching only ITS conventions: a
    # shared gate perm for the stage's cell(s), square-tensor
    # transposes, the head block layout. Joint (cartesian) search within
    # one stage is required — e.g. a transposed square head/w PLUS a
    # reordered head layout shows no improvement from either fix alone.
    _, gp, cell_perms, transposed, head_perm, params, rep, div = best
    cell_perms = dict(cell_perms)
    assign: Dict[int, Tuple[int, ...]] = {}
    STAGE_TENSORS = {"embed": ["embed/table"],
                     "phi": ["attn/proj/w", "attn/proj/b"],
                     "w": ["attn/proj/w", "attn/proj/b"],
                     "readout": ["readout/w", "readout/b"],
                     "head_raw": ["head/w", "head/b"]}

    for _ in range(2 + len(cells) + len(assign_groups)):
        if not div:
            break
        if div == "enc":
            stage_cells = [c for c in cells if c.startswith("enc_")]
        elif div.startswith("dec_h"):
            stage_cells = [f"dec/{int(div[5:]) - 1}"]
        else:
            stage_cells = []
        # option axes for this stage
        axes = []
        if stage_cells:
            # one shared perm across the stage's cells (a library has
            # ONE gate convention; stage A already covered the global
            # case, this re-opens it jointly with orientation choices)
            axes.append([("perm", tuple(stage_cells), p)
                         for p in itertools.permutations(range(4))])
        stage_paths = (STAGE_TENSORS.get(div, [])
                       + [f"{c}/{t}" for c in stage_cells
                          for t in _GATE_TENSORS])
        if stage_cells and stage_cells[0].startswith("dec"):
            # speaker embeddings feed the decoder's hoisted gates
            stage_paths.append("speaker/table")
        for path in stage_paths:
            if path.endswith("/b") or path.endswith("table"):
                continue  # 1-D / embedding: no orientation choice
            a = raw.get(path)
            if (a is not None and a.ndim == 2
                    and a.shape[0] == a.shape[1]):
                axes.append([("transpose", path, False),
                             ("transpose", path, True)])
        if div == "head_raw":
            axes.append([("head", None, hp)
                         for hp in itertools.permutations(range(3))])
        # shape-fallback assignment axes: any ambiguous group with a
        # tensor feeding this stage re-opens its (k-)permutations — the
        # oracle resolves them jointly with the conventions above
        # (VERDICT r3 weak #5)
        for gi, grp in enumerate(assign_groups):
            if grp["forced"]:
                continue
            if not any(p in stage_paths for p in grp["paths"]):
                continue
            n_p, n_r = len(grp["paths"]), len(grp["refs"])
            axes.append([("assign", gi, sel)
                         for sel in itertools.permutations(range(n_r),
                                                           n_p)])
        n_combos = int(np.prod([len(a) for a in axes])) if axes else 0
        if n_combos == 0 or n_combos > 5000:
            break  # nothing searchable / unbounded -> report divergence

        def full_key(rep2, div2):
            # clean candidates rank above any divergent one and among
            # themselves by exactness (see stage-A comment)
            dk = div_key(rep2, div2) or (10 ** 9, 10 ** 9)
            return (dk, -prefix_err(rep2, div2))

        cur_key = full_key(rep, div)
        improved = None
        for combo in itertools.product(*axes):
            cp2, tr2, hp2 = dict(cell_perms), set(transposed), head_perm
            as2 = dict(assign)
            for kind, tgt, val in combo:
                if kind == "perm":
                    for c in tgt:
                        cp2[c] = val
                elif kind == "transpose":
                    tr2.discard(tgt)
                    if val:
                        tr2.add(tgt)
                elif kind == "assign":
                    as2[tgt] = val
                else:
                    hp2 = val
            params2, rep2, div2 = evaluate(cp2, frozenset(tr2), hp2, as2)
            k2 = full_key(rep2, div2)
            if k2 > cur_key:
                improved = (cp2, frozenset(tr2), hp2, as2, params2,
                            rep2, div2)
                if verbose:
                    print(f"refine {div}: {combo} -> first_divergence="
                          f"{div2 or f'CLEAN ({worst_err(rep2):.3g})'}")
                cur_key = k2
        if improved is None:
            break
        (cell_perms, transposed, head_perm, assign, params, rep,
         div) = improved

    if div:
        raise ValueError(
            f"auto_pin could not clear the trace: first divergence at "
            f"'{div}' (max_abs_err {rep[div]['max_abs_err']:.3g}). The "
            f"name map itself is wrong for this tensor — inspect the "
            f"archive names feeding it.")
    pin = {"gate_perm": list(gp),
           "cell_perms": {c: list(p) for c, p in cell_perms.items()
                          if tuple(p) != tuple(gp)},
           "transposed": sorted(transposed),
           "head_perm": list(head_perm)}
    if assign_groups:
        pin["assignment"] = assign_report(assign)
    return params, pin, rep
