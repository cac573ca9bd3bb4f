#!/usr/bin/env python
"""Evaluate a trained model: teacher-forced MCD, free-running MCD, NLL.

  python scripts/evaluate_mcd.py --model_name m1 --dataset corpus.h5 \
      --save_dir saved_models [--num_utterances 8] [--checkpoint best]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    from parrot_tpu.config import ParrotConfig
    from parrot_tpu.data import H5Corpus
    from parrot_tpu.evaluate import mcd_report
    from parrot_tpu.models import Parrot
    from parrot_tpu.train.checkpoint import CheckpointManager

    p = argparse.ArgumentParser()
    p.add_argument("--model_name", required=True)
    p.add_argument("--dataset", required=True)
    p.add_argument("--save_dir", default="saved_models")
    p.add_argument("--checkpoint", default="best",
                   choices=["best", "latest"])
    p.add_argument("--num_utterances", type=int, default=8)
    p.add_argument("--sampling_bias", type=float, default=1.0)
    p.add_argument("--n_sp", type=int, default=None,
                   help="envelope coefficients used for MCD (default: all; "
                        "13 approximates the classic speech convention)")
    p.add_argument("--split", default="valid", choices=["valid", "train"])
    a = p.parse_args()

    corpus = H5Corpus(a.dataset)
    mgr = CheckpointManager(a.save_dir, a.model_name)
    d = mgr._resolve(a.checkpoint)
    if d is None:
        sys.exit(f"no checkpoint under {a.save_dir}/{a.model_name}")
    meta = json.load(open(os.path.join(d, "meta.json")))
    cfg = ParrotConfig.from_json(meta["config"])
    model = Parrot(cfg.model)
    params0 = model.init_params(jax.random.PRNGKey(0))
    D = cfg.model.frame_size
    norm0 = {"mean": jnp.zeros((D,)), "std": jnp.ones((D,))}
    step, trees, _ = mgr.restore({"params": params0, "norm": norm0},
                                 which=a.checkpoint)
    params = jax.device_put(trees["params"])
    norm = {k: jnp.asarray(v) for k, v in trees["norm"].items()}

    import dataclasses
    sample_cfg = dataclasses.replace(cfg.sample,
                                     sampling_bias=a.sampling_bias)
    report = mcd_report(model, params, norm, corpus, cfg.data, sample_cfg,
                        num_utterances=a.num_utterances, n_sp=a.n_sp,
                        split=a.split)
    report["checkpoint_step"] = step
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
