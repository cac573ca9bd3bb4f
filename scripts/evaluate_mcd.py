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
    from parrot_tpu.data import H5Corpus
    from parrot_tpu.evaluate import mcd_report
    from parrot_tpu.train.checkpoint import load_for_inference

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
    p.add_argument("--neural_vocoder", default=None,
                   help="model_name of a trained SampleRNN vocoder: also "
                        "report its resynthesis MCD (vs the WORLD "
                        "synthesis baseline) on ground-truth frames")
    p.add_argument("--vocoder_only", action="store_true",
                   help="skip the parrot model report (evaluate just "
                        "--neural_vocoder)")
    a = p.parse_args()

    corpus = H5Corpus(a.dataset)
    if a.neural_vocoder:
        from parrot_tpu.evaluate import neural_vocoder_report
        from parrot_tpu.train.checkpoint import load_vocoder_for_inference
        vmodel, vparams, vnorm, _, vstep = load_vocoder_for_inference(
            a.save_dir, a.neural_vocoder, a.checkpoint)
        vrep = neural_vocoder_report(vmodel, vparams, vnorm, corpus,
                                     num_utterances=a.num_utterances,
                                     split=a.split)
        vrep["vocoder_checkpoint_step"] = vstep
        print(json.dumps({"neural_vocoder": vrep}, indent=2))
        if a.vocoder_only:
            return

    try:
        model, params, norm, cfg, step = load_for_inference(
            a.save_dir, a.model_name, a.checkpoint)
    except (FileNotFoundError, ValueError) as e:
        sys.exit(str(e))

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
