#!/usr/bin/env python
"""Free-running quality floor analysis for the rich corpus
(VERDICT r3 weak #6).

The rich corpus (data/fixture.py::make_rich_corpus) is built with
per-utterance entropy — prosody contour, vibrato, per-phone durations,
breath/noise excitation — that is genuinely unpredictable from the
text. Free-running DTW-MCD against the single recorded ground-truth
realization therefore has an ALEATORIC FLOOR: even an oracle sampling
from the true conditional distribution produces a *different
realization* of the same utterance, and the DTW-MCD between two
ground-truth realizations of the same text/speaker measures exactly
that floor. A model's free-running score is only meaningful relative
to it.

This script reports, on held-out utterances:
  1. aleatoric floor      — DTW-MCD(GT features, alternate realization
                            of the SAME text + speaker voice rendered
                            with fresh entropy and re-analyzed by the
                            same WORLD pipeline);
  2. analysis-synthesis   — DTW-MCD(GT features, WORLD-resynthesized
     floor                  GT audio re-analyzed) — the vocoder-loop
                            floor the verdict asks for;
  3. shuffled-pair        — DTW-MCD between mismatched utterances
     calibration            (what fluent-but-text-unrelated scores);
  4. model bias sweep     — free-running DTW-MCD of a trained reader
                            at each --biases value (biased sampling
                            shrinks sampling variance toward the
                            mixture mean — the cheapest lever that
                            could move the metric if the plateau were
                            NOT the floor).

  python scripts/quality_floor.py --dataset data/rich2500.h5 \
      --model_name rich_reader --save_dir runs/rich \
      [--num 16] [--biases 0,0.5,1,2] [--floor_only]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="data/rich2500.h5")
    p.add_argument("--model_name", default="rich_reader")
    p.add_argument("--save_dir", default="runs/rich")
    p.add_argument("--checkpoint", default="best")
    p.add_argument("--num", type=int, default=16)
    p.add_argument("--biases", default="0,0.5,1,2")
    p.add_argument("--floor_only", action="store_true",
                   help="skip the model sweep (no checkpoint needed)")
    p.add_argument("--corpus_seed", type=int, default=0,
                   help="seed make_rich_corpus built the dataset with")
    p.add_argument("--vocab_size", type=int, default=30)
    p.add_argument("--num_speakers", type=int, default=10)
    p.add_argument("--n_sp", type=int, default=None)
    a = p.parse_args()

    from parrot_tpu.data import H5Corpus
    from parrot_tpu.data.fixture import rich_alternate_realization
    from parrot_tpu.vocoder import analyze, code_frames, decode_frames, \
        synthesize
    from parrot_tpu.vocoder.mcd import mcd

    corpus = H5Corpus(a.dataset)
    fs = corpus.sample_rate
    D = corpus.frame_size
    n_sp = a.n_sp if a.n_sp is not None else D - 6
    idx = corpus.split("valid")[:a.num]

    gts, alts, floor_d, world_d = [], [], [], []
    for j, i in enumerate(idx):
        gt = corpus.features(int(i))
        ids = corpus.text(int(i))
        spk = int(corpus.speaker(int(i)))
        gts.append(gt)
        # 1. same text + voice, fresh realization, same analysis chain
        x = rich_alternate_realization(
            ids, spk, vocab_size=a.vocab_size,
            num_speakers=a.num_speakers, corpus_seed=a.corpus_seed,
            fs=fs, realization_seed=10_000 + j)
        f0, sp, ap = analyze(x, fs)
        alt = code_frames(f0, sp, ap, n_sp=D - 6)
        alts.append(alt)
        floor_d.append(mcd(gt[:, :n_sp], alt[:, :n_sp], use_dtw=True))
        # 2. WORLD analysis-synthesis loop on the GT features
        f0r, spr, apr = decode_frames(gt, fs)
        yw = synthesize(f0r, spr, apr, fs)
        f0w, spw, apw = analyze(yw, fs)
        wre = code_frames(f0w, spw, apw, n_sp=D - 6)
        world_d.append(mcd(gt[:, :n_sp], wre[:, :n_sp], use_dtw=True))

    # 3. shuffled-pair calibration (same-speaker where possible)
    spks = [int(corpus.speaker(int(i))) for i in idx]
    sh_d = []
    for ai in range(len(idx)):
        cands = ([b for b in range(len(idx))
                  if b != ai and spks[b] == spks[ai]]
                 or [b for b in range(len(idx)) if b != ai])
        bi = cands[ai % len(cands)]
        sh_d.append(mcd(gts[ai][:, :n_sp], gts[bi][:, :n_sp],
                        use_dtw=True))

    out = {
        "num_utterances": len(idx),
        "aleatoric_floor_mcd": float(np.mean(floor_d)),
        "aleatoric_floor_std": float(np.std(floor_d)),
        "world_loop_floor_mcd": float(np.mean(world_d)),
        "shuffled_pair_mcd": float(np.mean(sh_d)),
    }

    if not a.floor_only:
        import dataclasses

        import jax

        from parrot_tpu.sample import Sampler, bucket_by_length
        from parrot_tpu.train.checkpoint import load_for_inference

        model, params, norm, cfg, step = load_for_inference(
            a.save_dir, a.model_name, a.checkpoint)
        out["checkpoint_step"] = step
        texts = [corpus.text(int(i)) for i in idx]
        sweep = {}
        for b in [float(x) for x in a.biases.split(",")]:
            scfg = dataclasses.replace(cfg.sample, sampling_bias=b)
            sampler = Sampler(model, params, norm, scfg)
            dists = []
            for bidx, text, mask in bucket_by_length(texts,
                                                     scfg.batch_size):
                spk = np.asarray([spks[i] for i in bidx], np.int32)
                frames, lengths, _ = sampler.generate(
                    text, mask, spk, key=jax.random.PRNGKey(17),
                    return_phis=False)
                frames = np.asarray(frames)
                for r, i in enumerate(bidx):
                    L = int(lengths[r])
                    if L < 2:
                        continue
                    dists.append(mcd(gts[i][:, :n_sp],
                                     frames[r, :L, :n_sp], use_dtw=True))
            sweep[str(b)] = float(np.mean(dists)) if dists else None
            print(f"  bias {b}: free-running DTW-MCD "
                  f"{sweep[str(b)]:.1f}", file=sys.stderr)
        out["free_running_mcd_by_bias"] = sweep

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
