#!/usr/bin/env python
"""Import a reference (Theano/Blocks) checkpoint into a parrot-tpu
checkpoint directory ("checkpoint-compatible weights", BASELINE.json:5),
and/or diff forward activations against a recorded trace to pin the
name map (SURVEY.md §7 hard-part #2).

Import:
  python scripts/import_checkpoint.py --reference ref.zip \
      --dataset corpus.h5 --model_name imported --save_dir saved_models \
      [--name_map map.json] [--report]

Auto-pinned import (recommended when a reference-side activation trace
is available): search the unverifiable conventions (fused-gate order,
per-tensor orientation, GMM head block layout) until the activation
diff against the trace clears, then save the pinned checkpoint:
  python scripts/import_checkpoint.py --reference ref.zip \
      --dataset corpus.h5 --auto_pin ref_trace.npz [--config cfg.json]

Activation parity (any checkpoint, any trace):
  # record a trace from the current checkpoint (also the schema a
  # reference-side recorder must produce — see train/parity.py)
  python scripts/import_checkpoint.py --dataset corpus.h5 \
      --model_name imported --save_dir saved_models --dump_trace t.npz
  # diff the current checkpoint against a recorded trace
  python scripts/import_checkpoint.py --dataset corpus.h5 \
      --model_name imported --save_dir saved_models --diff t.npz

--diff prints per-layer max/mean abs error and the FIRST diverging
layer, so a wrong name-map entry is localized in one run. Exit status
is nonzero when the diff exceeds --tol.

map.json entries: [["<regex over reference names>", "<our/flat/path>",
["transpose", "gate_reorder:0,1,2,3"]], ...]. Without --name_map the
best-effort DEFAULT_MAP is used; run with --report to see coverage.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    # importing is host-side work; eager init through a TPU tunnel is
    # needlessly slow (see .claude/skills/verify/SKILL.md)
    jax.config.update("jax_platforms", "cpu")
    from parrot_tpu.config import DataConfig, ParrotConfig
    from parrot_tpu.data import H5Corpus
    from parrot_tpu.models import Parrot
    from parrot_tpu.train.checkpoint import CheckpointManager
    from parrot_tpu.train.optim import adam_init
    from parrot_tpu.train.parity import (diff_trace, dump_trace,
                                         first_divergence,
                                         _probe_batch_from_corpus)
    from parrot_tpu.train.theano_import import import_theano_checkpoint
    import dataclasses
    import numpy as np

    p = argparse.ArgumentParser()
    p.add_argument("--reference", default=None,
                   help="Theano/Blocks archive to import (omit to operate "
                        "on an existing parrot-tpu checkpoint)")
    p.add_argument("--dataset", required=True)
    p.add_argument("--model_name", default="imported")
    p.add_argument("--save_dir", default="saved_models")
    p.add_argument("--name_map", default=None)
    p.add_argument("--config", default=None,
                   help="ParrotConfig json fixing the architecture "
                        "(default: ParrotConfig() with corpus io dims and "
                        "speaker setup)")
    p.add_argument("--lax", action="store_true",
                   help="allow partial coverage (unfilled params keep init)")
    p.add_argument("--report", action="store_true")
    p.add_argument("--auto_pin", default=None, metavar="TRACE.npz",
                   help="with --reference: search gate order / "
                        "orientation / head layout per tensor until the "
                        "activation diff against this trace clears "
                        "(train/auto_pin.py), instead of trusting the "
                        "name map's transforms")
    p.add_argument("--dump_trace", default=None, metavar="OUT.npz",
                   help="record a probe batch + per-layer activations")
    p.add_argument("--diff", default=None, metavar="TRACE.npz",
                   help="diff current params' activations vs a trace")
    p.add_argument("--tol", type=float, default=1e-4,
                   help="--diff failure threshold on max abs error")
    p.add_argument("--batch_size", type=int, default=4,
                   help="probe batch size for --dump_trace")
    p.add_argument("--seq_size", type=int, default=64,
                   help="probe segment length for --dump_trace")
    a = p.parse_args()
    if not (a.reference or a.diff or a.dump_trace):
        p.error("nothing to do: need --reference, --diff, or --dump_trace")

    corpus = H5Corpus(a.dataset)
    arch_fixed = True  # architecture pinned by --config / checkpoint meta
    if a.config:
        cfg = ParrotConfig.from_json(open(a.config).read())
    elif not a.reference:
        # operating on an existing checkpoint: its meta.json records the
        # architecture it was trained with — defaults would mismatch
        probe = CheckpointManager(a.save_dir, a.model_name)._resolve(
            "latest")
        if probe is None:
            sys.exit(f"no checkpoint under {a.save_dir}/{a.model_name}")
        meta = json.load(open(os.path.join(probe, "meta.json")))
        if "config" in meta:
            cfg = ParrotConfig.from_json(meta["config"])
        else:
            cfg, arch_fixed = ParrotConfig(), False
    else:
        cfg, arch_fixed = ParrotConfig(), False
    if not arch_fixed:
        # best-effort defaults: take io dims and speaker setup from the
        # corpus (a pinned config must NOT be second-guessed — e.g. a
        # speakerless model trained on a multi-speaker corpus)
        cfg = cfg.replace(model=dataclasses.replace(
            cfg.model, frame_size=corpus.frame_size,
            vocab_size=corpus.vocab_size,
            use_speaker=(cfg.model.use_speaker or corpus.num_speakers > 1),
            num_speakers=max(corpus.num_speakers, cfg.model.num_speakers)))
    model = Parrot(cfg.model)
    template = model.init_params(jax.random.PRNGKey(0))
    mgr = CheckpointManager(a.save_dir, a.model_name)

    if a.reference:
        name_map = None
        if a.name_map:
            name_map = [tuple(e) for e in json.load(open(a.name_map))]
        if a.auto_pin:
            from parrot_tpu.train.auto_pin import auto_pin
            params, pin, report = auto_pin(a.reference, model, template,
                                           a.auto_pin, tol=a.tol,
                                           rules=name_map)
            print("pinned conventions: " + json.dumps(pin))
            extra = {"auto_pin": pin}
        else:
            params, report = import_theano_checkpoint(
                a.reference, template, name_map, strict=not a.lax)
            extra = {}
        if a.report:
            print(json.dumps(report, indent=2, default=str))
        norm = {"mean": np.asarray(corpus.mean),
                "std": np.asarray(corpus.std)}
        mgr.save(0, {"params": params, "opt_state": adam_init(params),
                     "norm": norm},
                 meta={"config": cfg.to_json(), "imported_from": a.reference,
                       **extra},
                 is_best=True)
        if a.auto_pin:
            print(f"imported (activation parity over {len(report)} layers) "
                  f"-> {a.save_dir}/{a.model_name}")
        else:
            print(f"imported {len(report['matched'])} tensors -> "
                  f"{a.save_dir}/{a.model_name}")
    else:
        got = mgr.restore({"params": template,
                           "norm": {"mean": np.zeros(corpus.frame_size),
                                    "std": np.ones(corpus.frame_size)}})
        if got is None:
            sys.exit(f"no checkpoint under {a.save_dir}/{a.model_name}")
        _, trees, _ = got
        params = trees["params"]
        norm = trees["norm"]

    if a.dump_trace:
        dcfg = DataConfig(batch_size=a.batch_size, seq_size=a.seq_size,
                          max_text_len=cfg.data.max_text_len)
        batch = _probe_batch_from_corpus(corpus, dcfg)
        dump_trace(a.dump_trace, model, params, norm, batch)
        print(f"trace written: {a.dump_trace}")

    if a.diff:
        report = diff_trace(a.diff, model, params)
        width = max(len(k) for k in report)
        for name in sorted(report):
            r = report[name]
            note = f"  [{r['note']}]" if "note" in r else ""
            print(f"{name:<{width}}  max_abs_err={r['max_abs_err']:.3e}  "
                  f"mean_abs_err={r['mean_abs_err']:.3e}  "
                  f"ref_scale={r['ref_scale']:.3e}{note}")
        bad = first_divergence(report, a.tol)
        if bad:
            sys.exit(f"FIRST DIVERGING LAYER: {bad} "
                     f"(max_abs_err {report[bad]['max_abs_err']:.3e} > "
                     f"tol {a.tol:g}) — check the name-map entries feeding "
                     f"this layer")
        print(f"parity OK: every layer within tol {a.tol:g}")


if __name__ == "__main__":
    main()
