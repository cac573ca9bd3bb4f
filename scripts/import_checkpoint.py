#!/usr/bin/env python
"""Import a reference (Theano/Blocks) checkpoint into a parrot-tpu
checkpoint directory ("checkpoint-compatible weights", BASELINE.json:5).

  python scripts/import_checkpoint.py --reference ref.zip \
      --dataset corpus.h5 --model_name imported --save_dir saved_models \
      [--name_map map.json]

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
    from parrot_tpu.config import ParrotConfig
    from parrot_tpu.data import H5Corpus
    from parrot_tpu.models import Parrot
    from parrot_tpu.train.checkpoint import CheckpointManager
    from parrot_tpu.train.optim import adam_init
    from parrot_tpu.train.theano_import import import_theano_checkpoint
    import dataclasses
    import numpy as np

    p = argparse.ArgumentParser()
    p.add_argument("--reference", required=True)
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
    a = p.parse_args()

    corpus = H5Corpus(a.dataset)
    if a.config:
        cfg = ParrotConfig.from_json(open(a.config).read())
    else:
        cfg = ParrotConfig()
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, frame_size=corpus.frame_size,
        vocab_size=corpus.vocab_size,
        use_speaker=(cfg.model.use_speaker or corpus.num_speakers > 1),
        num_speakers=max(corpus.num_speakers, cfg.model.num_speakers)))
    model = Parrot(cfg.model)
    template = model.init_params(jax.random.PRNGKey(0))

    name_map = None
    if a.name_map:
        name_map = [tuple(e) for e in json.load(open(a.name_map))]
    params, report = import_theano_checkpoint(
        a.reference, template, name_map, strict=not a.lax)
    if a.report:
        print(json.dumps(report, indent=2))

    mgr = CheckpointManager(a.save_dir, a.model_name)
    norm = {"mean": np.asarray(corpus.mean), "std": np.asarray(corpus.std)}
    mgr.save(0, {"params": params, "opt_state": adam_init(params),
                 "norm": norm},
             meta={"config": cfg.to_json(), "imported_from": a.reference},
             is_best=True)
    print(f"imported {len(report['matched'])} tensors -> "
          f"{a.save_dir}/{a.model_name}")


if __name__ == "__main__":
    main()
