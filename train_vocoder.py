#!/usr/bin/env python
"""Neural-vocoder (SampleRNN-style) training entry point.

Char2Wav's second half: the reference drives an EXTERNAL SampleRNN repo
with parrot's generated vocoder frames (SURVEY.md §2.3 N3,
BASELINE.json:11 "SampleRNN-vocoder hook"); this trains the native
TPU implementation (models/samplernn.py) on a corpus built with
`preprocess.py --store_audio` (or the audio fixture).

Examples:
  python scripts/make_fixture.py data/audio_fixture.h5 --audio
  python train_vocoder.py --dataset data/audio_fixture.h5 \
      --model_name srnn1 --num_steps 5000
  python train_vocoder.py --dataset ... --model_name srnn1 --resume

The trained model is consumed by `generate.py --neural_vocoder srnn1`
(neural synthesis of the attention RNN's frames instead of the WORLD
synthesis filter).
"""

import argparse
import dataclasses
import json
import os
import sys

import numpy as np


def parse(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", required=True,
                   help="HDF5 corpus WITH audio (preprocess --store_audio)")
    p.add_argument("--model_name", default="samplernn")
    p.add_argument("--save_dir", default="saved_models")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--seq_size", type=int, default=20,
                   help="TBPTT segment length in conditioning frames "
                        "(x hop samples of audio)")
    p.add_argument("--num_steps", type=int, default=20000)
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--grad_clip", type=float, default=10.0)
    p.add_argument("--save_every", type=int, default=1000)
    p.add_argument("--eval_every", type=int, default=500)
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--rnn_dim", type=int, default=512)
    p.add_argument("--mlp_dim", type=int, default=512)
    p.add_argument("--embed_dim", type=int, default=32)
    p.add_argument("--frame_size", type=int, default=16)
    p.add_argument("--rf_size", type=int, default=4)
    p.add_argument("--layer_norm", action="store_true")
    p.add_argument("--use_speaker", action="store_true",
                   help="speaker-conditioned vocoder (multi-speaker "
                        "corpora; Char2Wav trains these for VCTK)")
    p.add_argument("--speaker_dim", type=int, default=16)
    p.add_argument("--num_devices", type=int, default=0,
                   help="DP mesh size (0 = all visible devices)")
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--resume", action="store_true")
    return p.parse_args(argv)


def main(argv=None):
    a = parse(argv)
    # multi-host pod-slice training: same activation contract as train.py
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or \
            os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
        import jax
        kw = {}
        if os.environ.get("JAX_NUM_PROCESSES"):
            if "JAX_PROCESS_ID" not in os.environ:
                sys.exit("JAX_NUM_PROCESSES is set but JAX_PROCESS_ID is "
                         "not — every host needs both")
            kw["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
            kw["process_id"] = int(os.environ["JAX_PROCESS_ID"])
        jax.distributed.initialize(**kw)
    import jax
    import jax.numpy as jnp

    from parrot_tpu.config import SampleRNNConfig, TrainConfig
    from parrot_tpu.data import H5Corpus
    from parrot_tpu.data.audio_pipeline import vocoder_stream
    from parrot_tpu.data.prefetch import device_prefetch
    from parrot_tpu.models.samplernn import SampleRNN
    from parrot_tpu.parallel import (make_mesh, batch_sharding, replicated,
                                     state_sharding)
    from parrot_tpu.train.checkpoint import CheckpointManager
    from parrot_tpu.train.optim import adam_init, adam_update
    from parrot_tpu.utils.logging import MetricsLogger

    corpus = H5Corpus(a.dataset)
    if not corpus.has_audio:
        sys.exit(f"{a.dataset} has no /audio — rebuild the corpus with "
                 f"preprocess.py --store_audio")
    cfg = SampleRNNConfig(
        frame_size=a.frame_size, rf_size=a.rf_size, rnn_dim=a.rnn_dim,
        mlp_dim=a.mlp_dim, embed_dim=a.embed_dim,
        cond_dim=corpus.frame_size, sample_rate=corpus.sample_rate,
        frame_period_ms=corpus.audio_hop / corpus.sample_rate * 1000.0,
        layer_norm=a.layer_norm, use_speaker=a.use_speaker,
        num_speakers=max(corpus.num_speakers, 1),
        speaker_dim=a.speaker_dim)
    tcfg = TrainConfig(model_name=a.model_name, save_dir=a.save_dir,
                       learning_rate=a.learning_rate, grad_clip=a.grad_clip,
                       num_steps=a.num_steps, save_every=a.save_every,
                       eval_every=a.eval_every, log_every=a.log_every,
                       seed=a.seed, num_devices=a.num_devices)
    model = SampleRNN(cfg)
    # jit: one compiled program, not per-op eager tunnel round trips
    params = jax.jit(model.init_params)(jax.random.PRNGKey(a.seed))
    opt_state = jax.jit(adam_init)(params)
    norm = {"mean": jnp.asarray(corpus.mean), "std": jnp.asarray(corpus.std)}

    mesh = make_mesh(a.num_devices)
    n_dev = mesh.devices.size
    if a.batch_size % n_dev:
        sys.exit(f"batch_size {a.batch_size} not divisible by "
                 f"{n_dev} devices")
    repl = replicated(mesh)
    repl_tree = lambda t: jax.tree.map(lambda _: repl, t)
    dstate = model.init_state(a.batch_size)
    st_sh = state_sharding(mesh, dstate)

    def train_step(params, opt_state, dstate, batch):
        def loss_fn(p):
            loss, new_state, metrics = model.compute_cost(
                p, norm, batch, dstate)
            return loss, (new_state, metrics)
        (loss, (new_state, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        params, opt_state, info = adam_update(params, grads, opt_state, tcfg)
        return params, opt_state, new_state, dict(metrics, **info)

    step_fn = jax.jit(train_step, donate_argnums=(0, 1, 2),
                      out_shardings=(repl_tree(params), repl_tree(opt_state),
                                     st_sh, None))

    def eval_step(params, dstate, batch):
        loss, new_state, metrics = model.compute_cost(
            params, norm, batch, dstate)
        return new_state, (metrics["loss"] * metrics["samples"],
                           metrics["samples"])

    eval_fn = jax.jit(eval_step)

    pc, pi = jax.process_count(), jax.process_index()
    ckpt = CheckpointManager(a.save_dir, a.model_name)
    log = MetricsLogger(a.save_dir, a.model_name, write_file=(pi == 0))
    meta_cfg = {"samplernn": dataclasses.asdict(cfg)}
    if pi == 0:
        with open(os.path.join(a.save_dir, a.model_name, "config.json"),
                  "w") as f:
            json.dump(meta_cfg, f, indent=2)

    def save(step, seen_segments, best_valid, is_best=False):
        dstate_h = dstate
        if pc > 1:
            # dstate rows are sharded across hosts; gather the global
            # layout so the resume template matches (tiled=True)
            from jax.experimental import multihost_utils
            dstate_h = multihost_utils.process_allgather(dstate, tiled=True)
        if pi != 0:
            return  # every process joins the gather; one writes
        ckpt.save(step, {"params": params, "opt_state": opt_state,
                         "dstate": dstate_h, "norm": norm},
                  meta={"best_valid": best_valid,
                        "seen_segments": seen_segments,
                        "config": meta_cfg}, is_best=is_best)

    step, best_valid, seen_segments = 0, float("inf"), 0
    if a.resume:
        r = ckpt.restore({"params": params, "opt_state": opt_state,
                          "dstate": dstate, "norm": norm})
        if r is None:
            sys.exit(f"--resume: no checkpoint under "
                     f"{a.save_dir}/{a.model_name}")
        step, trees, meta = r
        params = jax.tree.map(jnp.asarray, trees["params"])
        opt_state = jax.tree.map(jnp.asarray, trees["opt_state"])
        dstate = jax.tree.map(jnp.asarray, trees["dstate"])
        # rebind the saved conditioning stats BEFORE the jitted step fns
        # trace (they close over `norm`): resuming against a rebuilt or
        # different --dataset must not silently shift normalization
        # mid-training (train_joint.py has the same contract)
        norm = {k: jnp.asarray(v) for k, v in trees["norm"].items()}
        best_valid = meta.get("best_valid", float("inf"))
        seen_segments = meta.get("seen_segments", step)

    # stage_global degrades to device_put on one process; on a pod slice
    # it assembles sharded/replicated global arrays from per-host copies
    from parrot_tpu.parallel.staging import stage_global
    params = stage_global(params, repl_tree(params))
    opt_state = stage_global(opt_state, repl_tree(opt_state))
    dstate = stage_global(dstate, st_sh)

    def run_eval(params):
        # start_flag resets carried state inside compute_cost, so one
        # state threads through the whole deterministic stream
        st, tot, n = model.init_state(a.batch_size // pc), 0.0, 0.0
        for vb in vocoder_stream(corpus, a.batch_size, a.seq_size,
                                 split="valid", training=False, epochs=1,
                                 process_index=pi, process_count=pc):
            st, (l, s) = eval_fn(params, st, vb)
            tot += float(l)
            n += float(s)
        if pc > 1:
            # per-host partial sums over the sharded valid stream
            from jax.experimental import multihost_utils
            sums = multihost_utils.process_allgather(
                np.asarray([tot, n], np.float64))
            tot, n = float(sums[:, 0].sum()), float(sums[:, 1].sum())
        return tot / max(n, 1.0)

    # preemption safety: SIGTERM/SIGINT flush a checkpoint; --resume
    # picks it up (same contract as the parrot Trainer)
    import signal
    interrupted = []

    def _on_signal(sig, frame):
        interrupted.append(sig)

    old_handlers = {}
    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            old_handlers[sig] = signal.signal(sig, _on_signal)
        except ValueError:
            pass  # not the main thread

    stream = vocoder_stream(corpus, a.batch_size, a.seq_size,
                            split="train", training=True,
                            shuffle_seed=a.seed,
                            skip_segments=seen_segments,
                            process_index=pi, process_count=pc)
    # stage batches ahead of the step (double-buffered device prefetch,
    # multi-host-correct via stage_local under the hood)
    probe = vocoder_stream(corpus, a.batch_size, a.seq_size,
                           split="train", training=True,
                           shuffle_seed=a.seed, epochs=1,
                           process_index=pi, process_count=pc)
    b_sh = batch_sharding(mesh, next(iter(probe)))
    it = device_prefetch(iter(stream), depth=2, sharding=b_sh)
    try:
        for batch_d in it:
            if step >= a.num_steps or interrupted:
                break
            params, opt_state, dstate, metrics = step_fn(
                params, opt_state, dstate, batch_d)
            step += 1
            seen_segments += 1
            if step == 1 or (a.log_every and step % a.log_every == 0):
                log.log("train", step, loss=metrics["loss"],
                        bits_per_sample=metrics["bits_per_sample"],
                        grad_norm=metrics.get("grad_norm", 0.0))
            if a.eval_every and step % a.eval_every == 0:
                v = run_eval(params)
                is_best = v < best_valid
                best_valid = min(best_valid, v)
                log.log("valid", step, loss=v, best=best_valid)
                if is_best:
                    save(step, seen_segments, best_valid, is_best=True)
            if a.save_every and step % a.save_every == 0:
                save(step, seen_segments, best_valid)
    finally:
        for sig, h in old_handlers.items():
            signal.signal(sig, h)
    save(step, seen_segments, best_valid)
    log.log("done", step, best_valid=best_valid,
            interrupted=bool(interrupted))
    print(f"done: step={step} best_valid={best_valid:.5g}"
          + (" (interrupted, checkpoint flushed)" if interrupted else ""))


if __name__ == "__main__":
    main()
