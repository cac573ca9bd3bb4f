#!/usr/bin/env python
"""Attention/length robustness evaluation (VERDICT r4 next-step #2).

What parrot-class windowed-attention models actually fail at is OOD
text: lengths beyond the training range, attention stalls, skipped or
repeated regions. In-distribution DTW-MCD is floored (the flagship
model sits ON the rich10k aleatoric floor), so this harness measures
where the model BREAKS instead:

  for each text length U in --lengths (training range was 16-40):
    * render N fresh texts with the rich-corpus generator and TWO
      ground-truth realizations each (the corpus system is deterministic
      per (corpus_seed, vocab, speakers): fixture.rich_alternate_
      realization) — realization 1 is the reference, realization 2
      gives the ALEATORIC FLOOR at this length;
    * free-run the model (fused serving path, one (T, U) compile for
      the whole grid via padding + early exit);
    * from the per-step attention phi: completion (did the window reach
      the end of the text before max_steps), coverage (fraction of the
      text the window visited), monotonicity regressions, stalls;
    * DTW-MCD vs the reference realization, reported against the
      same-length floor and the same-length shuffled-pair baseline.

Prints one JSON line per length plus a summary table.

  python scripts/robustness_eval.py --model_name rich10k_reader \
      --save_dir runs/rich --lengths 20,40,60,80,120,160
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def attention_stats(phi, n_frames, U):
    """phi: (T, Umax) per-step window weights for one utterance
    (already truncated to generated length). Returns dict of
    alignment-trajectory statistics over the valid U columns."""
    phi = np.asarray(phi[:n_frames, :U], np.float64)
    T = phi.shape[0]
    if T == 0:
        # zero generated frames: stall length and monotonicity are
        # undefined (no trajectory exists — a stop failure must not be
        # misreported as attention breakage; completion/natural_stop
        # record it). -1 keeps the row's max()/json serializable.
        return dict(coverage=0.0, mono_violations=0.0, max_stall=-1,
                    end_reached=False)
    tot = phi.sum(axis=1, keepdims=True)
    ok = tot[:, 0] > 1e-6
    pos = np.where(
        ok, (phi * np.arange(U)[None, :]).sum(axis=1) / np.maximum(
            tot[:, 0], 1e-9), 0.0)
    # coverage: furthest expected window position (fraction of text)
    coverage = float((pos.max() + 1.0) / U)
    # monotonicity: window position regressions beyond 2 tokens
    dpos = np.diff(pos)
    mono_violations = float((dpos < -2.0).mean()) if len(dpos) else 0.0
    # stall: longest run of steps with the window advancing < 0.01 tok
    stalled = dpos < 0.01
    max_stall, run = 0, 0
    for s in stalled:
        run = run + 1 if s else 0
        max_stall = max(max_stall, run)
    return dict(coverage=coverage, mono_violations=mono_violations,
                max_stall=int(max_stall),
                end_reached=bool(pos.max() >= U - 2))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_name", required=True)
    p.add_argument("--save_dir", default="runs/rich")
    p.add_argument("--checkpoint", default="best")
    p.add_argument("--lengths", default="20,40,60,80,120,160")
    p.add_argument("--per_length", type=int, default=8)
    p.add_argument("--text_mode", default="random",
                   choices=["random", "repeat_runs"],
                   help="random: uniform token draws (the corpus's own "
                        "text distribution); repeat_runs: each drawn "
                        "token repeated 2-8 times — long same-token "
                        "runs give the windowed attention no content "
                        "cue to advance on, the classic failure probe "
                        "for location-based attention")
    p.add_argument("--sampling_bias", type=float, default=1.0)
    p.add_argument("--frames_per_token_cap", type=int, default=28,
                   help="max_steps = cap * longest length (rich corpus "
                        "averages ~20 frames/token at char_ms=100)")
    # rich10k generator identity (docs/PERFORMANCE.md regeneration line)
    p.add_argument("--corpus_seed", type=int, default=5)
    p.add_argument("--vocab_size", type=int, default=12)
    p.add_argument("--num_speakers", type=int, default=10)
    p.add_argument("--char_ms", type=float, default=100.0)
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--out", default=None,
                   help="also append JSON lines to this file")
    a = p.parse_args()

    import jax
    import jax.numpy as jnp

    from parrot_tpu.config import SampleConfig
    from parrot_tpu.data.fixture import rich_alternate_realization
    from parrot_tpu.sample import Sampler
    from parrot_tpu.train.checkpoint import load_for_inference
    from parrot_tpu.vocoder import analyze, code_frames
    from parrot_tpu.vocoder.mcd import mcd

    model, params, norm, cfg, step = load_for_inference(
        a.save_dir, a.model_name, a.checkpoint)
    D = cfg.model.frame_size
    n_sp = max(1, D - 6)
    lengths = [int(x) for x in a.lengths.split(",")]
    U_max = max(lengths)
    max_steps = a.frames_per_token_cap * U_max
    scfg = SampleConfig(max_steps=max_steps, batch_size=a.per_length,
                        sampling_bias=a.sampling_bias)
    sampler = Sampler(model, params, norm, scfg)
    rng = np.random.default_rng(a.seed)
    fs = 16000

    def render_feats(ids, spk, realization_seed):
        x = rich_alternate_realization(
            ids, spk, vocab_size=a.vocab_size,
            num_speakers=a.num_speakers, corpus_seed=a.corpus_seed,
            fs=fs, char_ms=a.char_ms, realization_seed=realization_seed)
        f0, sp_env, ap = analyze(x, fs)
        return code_frames(f0, sp_env, ap)

    rows = []
    for U in lengths:
        texts, spks, refs, floors = [], [], [], []
        for i in range(a.per_length):
            if a.text_mode == "repeat_runs":
                toks = []
                while len(toks) < U:
                    toks += [int(rng.integers(1, a.vocab_size))] * int(
                        rng.integers(2, 9))
                ids = np.asarray(toks[:U], np.int32)
            else:
                ids = rng.integers(1, a.vocab_size, size=U).astype(
                    np.int32)
            spk = int(rng.integers(0, a.num_speakers))
            texts.append(ids)
            spks.append(spk)
            rseed = int(rng.integers(1 << 30))
            refs.append(render_feats(ids, spk, rseed))
            floors.append(render_feats(ids, spk, rseed + 1))
        print(f"[U={U}] ground truth rendered "
              f"({refs[0].shape[0]}-{max(r.shape[0] for r in refs)} "
              f"frames)", flush=True)

        # one padded batch -> one serving-kernel compile for the grid
        text = np.zeros((a.per_length, U_max), np.int32)
        mask = np.zeros((a.per_length, U_max), np.float32)
        for i, ids in enumerate(texts):
            text[i, :U] = ids
            mask[i, :U] = 1.0
        frames, gen_len, phis = sampler.generate(
            jnp.asarray(text), jnp.asarray(mask),
            jnp.asarray(spks, jnp.int32),
            key=jax.random.PRNGKey(a.seed + U), return_phis=True)
        frames = np.asarray(frames)
        gen_len = np.asarray(gen_len)
        phis = np.asarray(phis)

        stats, mcds, floor_d, shuf_d = [], [], [], []
        for i in range(a.per_length):
            L = int(gen_len[i])
            st = attention_stats(phis[i], L, U)
            st["natural_stop"] = bool(L < max_steps)
            st["gen_frames"] = L
            st["ref_frames"] = int(refs[i].shape[0])
            stats.append(st)
            if L >= 2:
                mcds.append(mcd(refs[i][:, :n_sp], frames[i, :L, :n_sp],
                                use_dtw=True))
            floor_d.append(mcd(refs[i][:, :n_sp], floors[i][:, :n_sp],
                               use_dtw=True))
            if a.per_length > 1:  # self-pairing would report 0
                j = (i + 1) % a.per_length
                shuf_d.append(mcd(refs[i][:, :n_sp], refs[j][:, :n_sp],
                                  use_dtw=True))
        row = {
            "U": U,
            "completion_rate": float(np.mean(
                [s["end_reached"] and s["natural_stop"] for s in stats])),
            "end_reached_rate": float(np.mean(
                [s["end_reached"] for s in stats])),
            "natural_stop_rate": float(np.mean(
                [s["natural_stop"] for s in stats])),
            "coverage_mean": float(np.mean(
                [s["coverage"] for s in stats])),
            "mono_violation_rate": float(np.mean(
                [s["mono_violations"] for s in stats])),
            "max_stall_frames": int(np.max(
                [s["max_stall"] for s in stats])),
            "gen_to_ref_len_ratio": float(np.mean(
                [s["gen_frames"] / max(s["ref_frames"], 1)
                 for s in stats])),
            "dtw_mcd": float(np.mean(mcds)) if mcds else float("nan"),
            "floor_mcd": float(np.mean(floor_d)),
            "shuffled_mcd": (float(np.mean(shuf_d)) if shuf_d
                             else float("nan")),
            "n": a.per_length,
        }
        rows.append(row)
        line = json.dumps(row)
        print(line, flush=True)
        if a.out:
            with open(a.out, "a") as f:
                f.write(line + "\n")

    print("\nU    complete  coverage  mono-viol  MCD     floor   shuffled")
    for r in rows:
        print(f"{r['U']:<4d} {r['completion_rate']:<9.2f} "
              f"{r['coverage_mean']:<9.3f} "
              f"{r['mono_violation_rate']:<10.4f} "
              f"{r['dtw_mcd']:<7.1f} {r['floor_mcd']:<7.1f} "
              f"{r['shuffled_mcd']:<7.1f}")


if __name__ == "__main__":
    main()
