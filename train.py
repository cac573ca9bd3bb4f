#!/usr/bin/env python
"""Training entry point; mirrors the reference train.py semantics
(BASELINE.json:5 "Public entry points mirror train.py/generate.py").

Examples:
  python train.py --model_name m1 --dataset path/to/corpus.h5 \
      --which_cost GMM --num_steps 10000
  python train.py --model_name m1 --dataset blizzard --resume
"""

import dataclasses
import os
import sys


def main(argv=None):
    from parrot_tpu.utils.cli import train_parse, resolve_corpus_path
    from parrot_tpu.data import H5Corpus
    from parrot_tpu.train import Trainer

    # multi-host pod-slice training (BASELINE.json:11): each host runs this
    # same script; JAX wires the hosts into one device mesh. Activated by
    # the standard cluster env (or explicit JAX_COORDINATOR_ADDRESS).
    # On managed clusters (SLURM/GKE) num_processes/process_id are
    # auto-detected; elsewhere pass them via JAX_NUM_PROCESSES /
    # JAX_PROCESS_ID (the multi-host CI test uses this to form a
    # 2-process CPU cluster).
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or \
            os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
        import jax
        kw = {}
        if os.environ.get("JAX_NUM_PROCESSES"):
            if "JAX_PROCESS_ID" not in os.environ:
                sys.exit("JAX_NUM_PROCESSES is set but JAX_PROCESS_ID is "
                         "not — every host needs both (0-based id < "
                         "num_processes)")
            kw["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
            kw["process_id"] = int(os.environ["JAX_PROCESS_ID"])
        jax.distributed.initialize(**kw)

    cfg, args = train_parse(argv)
    path = resolve_corpus_path(cfg)
    if not os.path.exists(path):
        sys.exit(f"corpus not found: {path} — run scripts/preprocess.py "
                 f"or scripts/make_fixture.py first")
    corpus = H5Corpus(path, cache_mb=cfg.data.cache_mb)
    # corpus dictates io dims unless explicitly configured
    model = dataclasses.replace(
        cfg.model, frame_size=corpus.frame_size,
        vocab_size=corpus.vocab_size,
        num_speakers=max(corpus.num_speakers, cfg.model.num_speakers))
    cfg = cfg.replace(model=model)

    trainer = Trainer(cfg, corpus)
    if args.init_from:
        if args.resume:
            sys.exit("--init_from and --resume are mutually exclusive: "
                     "resume restores the run's own checkpoint")
        src_step = trainer.init_from(args.init_from,
                                     which=args.init_checkpoint)
        print(f"warm-started from '{args.init_from}' (step {src_step})")
    if args.resume and not trainer.resume():
        sys.exit(f"--resume: no checkpoint found under "
                 f"{cfg.train.save_dir}/{cfg.train.model_name}")
    result = trainer.train()
    print(f"done: step={result['step']} best_valid={result['best_valid']:.5g}")


if __name__ == "__main__":
    main()
