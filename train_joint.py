#!/usr/bin/env python
"""Char2Wav joint end-to-end fine-tuning entry point.

The Char2Wav recipe (Sotelo et al. 2017): pretrain the reader
(train.py) and the neural vocoder (train_vocoder.py) separately, then
fine-tune them END-TO-END — the vocoder consumes the reader's predicted
vocoder frames and its waveform NLL back-propagates into the reader.
The reference repo stops at the conditioning-feature hook to an
external Theano SampleRNN (SURVEY.md §2.3 N3, BASELINE.json:11); here
both halves are native JAX (models/char2wav.py) and the joint objective
is one jitted, DP-sharded `value_and_grad`.

Examples:
  python scripts/make_fixture.py data/audio_fixture.h5 --audio
  python train.py --dataset data/audio_fixture.h5 --model_name reader1
  python train_vocoder.py --dataset data/audio_fixture.h5 --model_name voc1
  python train_joint.py --dataset data/audio_fixture.h5 \
      --model_name c2w1 --parrot_init reader1 --vocoder_init voc1 \
      --num_steps 2000

Every best/final save also exports standard-format half checkpoints to
`<model_name>_parrot` / `<model_name>_vocoder`, so generation is:
  python generate.py --model_name c2w1_parrot --dataset ... \
      --neural_vocoder c2w1_vocoder --text "..."
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
    p.add_argument("--model_name", default="char2wav")
    p.add_argument("--save_dir", default="saved_models")
    p.add_argument("--parrot_init", default=None,
                   help="pretrained reader checkpoint name (train.py) to "
                        "fine-tune from; fresh init when omitted")
    p.add_argument("--vocoder_init", default=None,
                   help="pretrained vocoder checkpoint name "
                        "(train_vocoder.py); fresh init when omitted")
    p.add_argument("--init_checkpoint", default="best",
                   choices=["best", "latest"],
                   help="which checkpoint of the init models to load")
    p.add_argument("--frame_loss_weight", type=float, default=1.0)
    p.add_argument("--audio_loss_weight", type=float, default=1.0)
    p.add_argument("--detach_frames", action="store_true",
                   help="stop gradients at the conditioning boundary "
                        "(vocoder-only adaptation to predicted frames)")
    # fresh-init architecture (ignored when the matching --*_init is given)
    p.add_argument("--which_cost", choices=["GMM", "MSE"], default="GMM")
    p.add_argument("--rnn_h_dim", type=int, default=512)
    p.add_argument("--readouts_dim", type=int, default=512)
    p.add_argument("--encoder_dim", type=int, default=128)
    p.add_argument("--embed_dim", type=int, default=256)
    p.add_argument("--decoder_layers", type=int, default=3)
    p.add_argument("--attention_mixtures", type=int, default=10)
    p.add_argument("--num_mixtures", type=int, default=20)
    p.add_argument("--vocoder_rnn_dim", type=int, default=512)
    p.add_argument("--vocoder_mlp_dim", type=int, default=512)
    p.add_argument("--vocoder_embed_dim", type=int, default=32)
    p.add_argument("--vocoder_frame_size", type=int, default=16)
    p.add_argument("--vocoder_rf_size", type=int, default=4)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--seq_size", type=int, default=20,
                   help="TBPTT segment length in frames (x hop samples)")
    p.add_argument("--max_text_len", type=int, default=256)
    p.add_argument("--num_steps", type=int, default=5000)
    p.add_argument("--learning_rate", type=float, default=1e-4,
                   help="fine-tuning default; lower than from-scratch")
    p.add_argument("--reader_lr_scale", type=float, default=1.0,
                   help="reader (parrot) LR = learning_rate * this. A "
                        "converged reader sits at a much sharper optimum "
                        "than the vocoder (its fine-tune ladder ended at "
                        "1e-4 after 1e-3->3e-4->1e-4 decay); updating "
                        "both halves at the vocoder's LR degrades it "
                        "(round-4 rich10k joint divergence)")
    p.add_argument("--warmup_steps", type=int, default=0,
                   help="linear LR warmup; bounds the oversized early "
                        "Adam steps taken while fresh second moments "
                        "are still built from a handful of samples")
    p.add_argument("--grad_clip", type=float, default=10.0)
    # Scheduled sampling for the reader's joint gradient (same
    # TPU-parallel two-pass design as the Trainer's, train/loop.py):
    # a reader fine-tuned with SS must keep seeing its own frames
    # during joint training, or the joint frame gradient drags it
    # back toward the pure teacher-forced optimum.
    p.add_argument("--scheduled_sampling_rate", type=float, default=0.0)
    p.add_argument("--scheduled_sampling_mode", default="sample",
                   choices=["sample", "mean"])
    p.add_argument("--scheduled_sampling_bias", type=float, default=1.0)
    p.add_argument("--save_every", type=int, default=1000)
    p.add_argument("--eval_every", type=int, default=500)
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--num_devices", type=int, default=0,
                   help="DP mesh size (0 = all visible devices)")
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--resume", action="store_true")
    return p.parse_args(argv)


def main(argv=None):
    a = parse(argv)
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

    from parrot_tpu.config import (DataConfig, ModelConfig, ParrotConfig,
                                   SampleRNNConfig, TrainConfig)
    from parrot_tpu.data import H5Corpus
    from parrot_tpu.data.pipeline import parrot_stream
    from parrot_tpu.data.prefetch import device_prefetch
    from parrot_tpu.models.char2wav import Char2Wav
    from parrot_tpu.parallel import (make_mesh, batch_sharding, replicated,
                                     state_sharding)
    from parrot_tpu.parallel.staging import stage_global
    from parrot_tpu.train.checkpoint import (CheckpointManager,
                                             load_for_inference,
                                             load_vocoder_for_inference)
    from parrot_tpu.train.optim import adam_init, adam_update
    from parrot_tpu.utils.logging import MetricsLogger

    corpus = H5Corpus(a.dataset)
    if not corpus.has_audio:
        sys.exit(f"{a.dataset} has no /audio — rebuild the corpus with "
                 f"preprocess.py --store_audio")
    norm = {"mean": jnp.asarray(corpus.mean), "std": jnp.asarray(corpus.std)}
    key = jax.random.PRNGKey(a.seed)

    # --- resume: the architecture comes from the checkpoint, not from
    # flags or the --*_init checkpoints (params are restored below) ---
    resume_cfg = None
    if a.resume:
        d = CheckpointManager(a.save_dir, a.model_name)._resolve("latest")
        if d is None:
            sys.exit(f"--resume: no checkpoint under "
                     f"{a.save_dir}/{a.model_name}")
        resume_cfg = json.load(
            open(os.path.join(d, "meta.json")))["config"]

    # --- halves: pretrained checkpoints or fresh ---------------------
    if resume_cfg is not None:
        pcfg = ModelConfig(**resume_cfg["parrot"]["model"])
        vcfg = SampleRNNConfig(**resume_cfg["samplernn"])
        p_params = v_params = None
    elif a.parrot_init:
        _, p_params, p_norm, p_cfg, p_step = load_for_inference(
            a.save_dir, a.parrot_init, a.init_checkpoint)
        pcfg = p_cfg.model
        if pcfg.frame_size != corpus.frame_size:
            sys.exit(f"--parrot_init frame_size {pcfg.frame_size} != corpus "
                     f"frame_size {corpus.frame_size}")
        # fine-tune with the stats the reader was trained under
        norm = p_norm
        print(f"reader '{a.parrot_init}' loaded (step {p_step})")
    else:
        pcfg = ModelConfig(frame_size=corpus.frame_size,
                           vocab_size=corpus.vocab_size,
                           num_speakers=max(corpus.num_speakers, 1),
                           which_cost=a.which_cost, rnn_h_dim=a.rnn_h_dim,
                           readouts_dim=a.readouts_dim,
                           encoder_dim=a.encoder_dim, embed_dim=a.embed_dim,
                           decoder_layers=a.decoder_layers,
                           attention_mixtures=a.attention_mixtures,
                           num_mixtures=a.num_mixtures)
        p_params = None
    if resume_cfg is not None:
        pass  # vcfg set above; params come from the joint checkpoint
    elif a.vocoder_init:
        _, v_params, v_norm, vcfg, v_step = load_vocoder_for_inference(
            a.save_dir, a.vocoder_init, a.init_checkpoint)
        if vcfg.cond_dim != corpus.frame_size:
            sys.exit(f"--vocoder_init cond_dim {vcfg.cond_dim} != corpus "
                     f"frame_size {corpus.frame_size}")
        # the joint run conditions the vocoder with `norm`; a vocoder
        # pretrained under different stats would start silently degraded
        # (and the step-0 baseline would be meaningless)
        for k in ("mean", "std"):
            if not np.allclose(np.asarray(v_norm[k]), np.asarray(norm[k]),
                               rtol=1e-5, atol=1e-6):
                sys.exit(f"--vocoder_init '{a.vocoder_init}' was trained "
                         f"under different conditioning {k} stats than "
                         f"this run uses (corpus/--parrot_init stats) — "
                         f"retrain the vocoder on matching stats")
        print(f"vocoder '{a.vocoder_init}' loaded (step {v_step})")
    else:
        vcfg = SampleRNNConfig(
            cond_dim=corpus.frame_size, sample_rate=corpus.sample_rate,
            frame_period_ms=corpus.audio_hop / corpus.sample_rate * 1000.0,
            rnn_dim=a.vocoder_rnn_dim, mlp_dim=a.vocoder_mlp_dim,
            embed_dim=a.vocoder_embed_dim, frame_size=a.vocoder_frame_size,
            rf_size=a.vocoder_rf_size)
        v_params = None
    if vcfg.hop != corpus.audio_hop:
        sys.exit(f"vocoder hop {vcfg.hop} != corpus audio hop "
                 f"{corpus.audio_hop}")

    mesh = make_mesh(a.num_devices)
    n_dev = mesh.devices.size
    # This entry's train step is a plain GSPMD jit, where a pallas_call
    # is only safe single-device (multi-device GSPMD would replicate its
    # operands instead of partitioning them — models.parrot
    # resolve_pallas_scan). Resolve AUTO here; a checkpointed
    # pallas_scan=True is demoted on multi-device meshes for the same
    # reason.
    from parrot_tpu.models.parrot import resolve_pallas_scan
    if n_dev == 1:
        ps_run = resolve_pallas_scan(pcfg, a.batch_size)
    else:
        ps_run = False
        if pcfg.pallas_scan:
            print(f"[joint] pallas_scan disabled: this entry's GSPMD step "
                  f"cannot host single-device kernels on {n_dev} devices")
    model = Char2Wav(dataclasses.replace(pcfg, pallas_scan=ps_run), vcfg)
    if p_params is None or v_params is None:
        # jit: one compiled program, not per-op eager tunnel round trips
        params = jax.jit(model.init_params)(key)
        if p_params is not None:
            params["parrot"] = p_params
        if v_params is not None:
            params["vocoder"] = v_params
    else:
        params = {"parrot": p_params, "vocoder": v_params}
    # Per-half optimizer states: the reader and the vocoder step at
    # different LRs (--reader_lr_scale) with per-half global-norm
    # clipping — the reader's GMM-NLL gradients run in the thousands
    # while the vocoder's mu-law NLL gradients sit near 0.3, so a
    # shared clip/moment buffer couples two regimes three orders of
    # magnitude apart. (Round-5 layout change: round-4 joint
    # checkpoints with one fused state don't resume into this entry.)
    opt_state = {"parrot": jax.jit(adam_init)(params["parrot"]),
                 "vocoder": jax.jit(adam_init)(params["vocoder"])}

    dcfg = DataConfig(dataset=a.dataset, batch_size=a.batch_size,
                      seq_size=a.seq_size, max_text_len=a.max_text_len,
                      shuffle_seed=a.seed)
    tcfg = TrainConfig(model_name=a.model_name, save_dir=a.save_dir,
                       learning_rate=a.learning_rate, grad_clip=a.grad_clip,
                       num_steps=a.num_steps, save_every=a.save_every,
                       eval_every=a.eval_every, log_every=a.log_every,
                       seed=a.seed, num_devices=a.num_devices,
                       warmup_steps=a.warmup_steps)
    tcfg_reader = dataclasses.replace(
        tcfg, learning_rate=a.learning_rate * a.reader_lr_scale)

    if a.batch_size % n_dev:
        sys.exit(f"batch_size {a.batch_size} not divisible by "
                 f"{n_dev} devices")
    repl = replicated(mesh)
    repl_tree = lambda t: jax.tree.map(lambda _: repl, t)  # noqa: E731
    dstate = model.init_state(a.batch_size, a.max_text_len)
    st_sh = state_sharding(mesh, dstate)

    # Scheduled-sampling pass 1: the SAME implementation the Trainer
    # uses (train/loop.scheduled_sampling_inputs — one shared contract
    # so the joint regime cannot drift from the reader's own; the
    # round-4 divergence was exactly such a regime mismatch). Joint
    # fine-tuning of an SS-trained reader must keep this conditioning.
    ss_rate = a.scheduled_sampling_rate

    def ss_inputs(params, dstate, fbatch, key):
        from parrot_tpu.train.loop import scheduled_sampling_inputs
        return scheduled_sampling_inputs(
            model.parrot, params["parrot"], norm, fbatch, dstate.parrot,
            key, rate=ss_rate, mode=a.scheduled_sampling_mode,
            bias=a.scheduled_sampling_bias)

    def train_step(params, opt_state, dstate, batch, step):
        rng = jax.random.fold_in(jax.random.PRNGKey(a.seed + 1), step)
        input_frames = None
        if ss_rate > 0:
            rng, k_ss = jax.random.split(rng)
            input_frames = ss_inputs(params, dstate, batch.frames, k_ss)

        def loss_fn(p):
            loss, new_state, metrics = model.compute_cost(
                p, norm, batch, dstate, rng=rng,
                frame_loss_weight=a.frame_loss_weight,
                audio_loss_weight=a.audio_loss_weight,
                detach_frames=a.detach_frames,
                input_frames=input_frames)
            return loss, (new_state, metrics)

        (loss, (new_state, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        new_pp, os_p, info_p = adam_update(
            params["parrot"], grads["parrot"], opt_state["parrot"],
            tcfg_reader)
        new_pv, os_v, info_v = adam_update(
            params["vocoder"], grads["vocoder"], opt_state["vocoder"], tcfg)
        params = {"parrot": new_pp, "vocoder": new_pv}
        opt_state = {"parrot": os_p, "vocoder": os_v}
        info = {"grad_norm": info_p["grad_norm"],
                "vocoder_grad_norm": info_v["grad_norm"],
                "lr": info_p["lr"]}
        return params, opt_state, new_state, dict(metrics, **info)

    step_fn = jax.jit(train_step, donate_argnums=(0, 1, 2),
                      out_shardings=(repl_tree(params), repl_tree(opt_state),
                                     st_sh, None))

    def eval_step(params, dstate, batch):
        _, new_state, metrics = model.compute_cost(
            params, norm, batch, dstate,
            frame_loss_weight=a.frame_loss_weight,
            audio_loss_weight=a.audio_loss_weight)
        return new_state, (metrics["frame_loss"] * metrics["frames"],
                           metrics["frames"],
                           metrics["audio_loss"] * metrics["samples"],
                           metrics["samples"])

    eval_fn = jax.jit(eval_step)

    pc, pi = jax.process_count(), jax.process_index()
    ckpt = CheckpointManager(a.save_dir, a.model_name)
    log = MetricsLogger(a.save_dir, a.model_name, write_file=(pi == 0))
    parrot_full_cfg = ParrotConfig(model=pcfg, data=dcfg, train=tcfg)
    # record EVERY joint-entry hyperparameter (loss weights, SS knobs,
    # per-half LR scale, init checkpoint names) — the round-4 run's
    # artifacts recorded only the reused config sections, which made
    # the diverged run hard to reproduce from disk (ADVICE r4)
    meta_cfg = {"parrot": json.loads(parrot_full_cfg.to_json()),
                "samplernn": dataclasses.asdict(vcfg),
                "joint": vars(a)}
    if pi == 0:
        os.makedirs(os.path.join(a.save_dir, a.model_name), exist_ok=True)
        with open(os.path.join(a.save_dir, a.model_name, "config.json"),
                  "w") as f:
            json.dump(meta_cfg, f, indent=2)

    exported_best = []

    def export_halves(step, is_best):
        """Write standard-format half checkpoints for generate.py.

        is_best=True only when the joint valid loss improved — the
        final-step export must NOT re-point the halves' 'best' away
        from the eval-best params (generate.py defaults to 'best').
        """
        if pi != 0:
            return
        pm = CheckpointManager(a.save_dir, a.model_name + "_parrot")
        pm.save(step, {"params": params["parrot"], "norm": norm},
                meta={"config": parrot_full_cfg.to_json()}, is_best=is_best)
        vm = CheckpointManager(a.save_dir, a.model_name + "_vocoder")
        vm.save(step, {"params": params["vocoder"], "norm": norm},
                meta={"config": {"samplernn": dataclasses.asdict(vcfg)}},
                is_best=is_best)
        if is_best:
            exported_best.append(step)

    def save(step, seen_segments, best_valid, is_best=False):
        dstate_h = dstate
        if pc > 1:
            from jax.experimental import multihost_utils
            dstate_h = multihost_utils.process_allgather(dstate, tiled=True)
        if pi != 0:
            return
        ckpt.save(step, {"params": params, "opt_state": opt_state,
                         "dstate": dstate_h, "norm": norm},
                  meta={"best_valid": best_valid,
                        "seen_segments": seen_segments,
                        "config": meta_cfg}, is_best=is_best)
        if is_best:
            export_halves(step, is_best=True)

    step, best_valid, seen_segments = 0, float("inf"), 0
    if a.resume:
        try:
            r = ckpt.restore({"params": params, "opt_state": opt_state,
                              "dstate": dstate, "norm": norm})
        except KeyError as e:
            if "opt_state/" in str(e):
                # pre-round-5 joint checkpoints stored ONE fused
                # opt_state for both halves; the per-half layout
                # cannot resume it
                sys.exit(f"--resume: checkpoint layout mismatch ({e})."
                         f" Joint checkpoints written before the "
                         f"per-half optimizer split (round 5) cannot "
                         f"be resumed; re-run the fine-tune from its "
                         f"--parrot_init/--vocoder_init halves "
                         f"instead.")
            sys.exit(f"--resume: checkpoint does not match this run's "
                     f"configuration ({e}) — check the model flags "
                     f"against the saved config.json")
        if r is None:
            sys.exit(f"--resume: no checkpoint under "
                     f"{a.save_dir}/{a.model_name}")
        step, trees, meta = r
        params = jax.tree.map(jnp.asarray, trees["params"])
        opt_state = jax.tree.map(jnp.asarray, trees["opt_state"])
        # unflatten_like rebuilds the JointState template's exact nested
        # NamedTuple structure, so a plain tree.map suffices
        dstate = jax.tree.map(jnp.asarray, trees["dstate"])
        # the step fns close over `norm` and trace only after this
        # rebinding, so the restored stats (e.g. from --parrot_init with
        # --norm_stats) survive a resume without the init flags
        norm = {k: jnp.asarray(v) for k, v in trees["norm"].items()}
        best_valid = meta.get("best_valid", float("inf"))
        seen_segments = meta.get("seen_segments", step)
        if best_valid < float("inf"):
            # the prior run exported eval-best halves; the final export
            # of THIS run must not re-point their 'best'
            exported_best.append(step)

    params = stage_global(params, repl_tree(params))
    opt_state = stage_global(opt_state, repl_tree(opt_state))
    dstate = stage_global(dstate, st_sh)

    def run_eval(params):
        st = model.init_state(a.batch_size // pc, a.max_text_len)
        fl, ff, al, ss = 0.0, 0.0, 0.0, 0.0
        for vb in parrot_stream(corpus, dcfg, split="valid",
                                training=False, epochs=1,
                                process_index=pi, process_count=pc,
                                with_audio=True):
            st, (l1, n1, l2, n2) = eval_fn(params, st, vb)
            fl += float(l1); ff += float(n1)
            al += float(l2); ss += float(n2)
        if pc > 1:
            from jax.experimental import multihost_utils
            sums = multihost_utils.process_allgather(
                np.asarray([fl, ff, al, ss], np.float64))
            fl, ff, al, ss = (float(sums[:, i].sum()) for i in range(4))
        frame = fl / max(ff, 1.0)
        audio = al / max(ss, 1.0)
        return (a.frame_loss_weight * frame + a.audio_loss_weight * audio,
                frame, audio)

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

    stream = parrot_stream(corpus, dcfg, split="train", training=True,
                           skip_segments=seen_segments,
                           process_index=pi, process_count=pc,
                           with_audio=True)
    probe = parrot_stream(corpus, dcfg, split="train", training=True,
                          epochs=1, process_index=pi, process_count=pc,
                          with_audio=True)
    b_sh = batch_sharding(mesh, next(iter(probe)))
    it = device_prefetch(iter(stream), depth=2, sharding=b_sh)
    if step == 0 and a.eval_every:
        # pre-fine-tune baseline: how well the pretrained (or fresh)
        # vocoder models real audio given the reader's PREDICTED frames —
        # the number joint fine-tuning exists to improve
        v, vf, va = run_eval(params)
        log.log("valid", 0, loss=v, frame_loss=vf, audio_loss=va, best=v)
        best_valid = min(best_valid, v)
    try:
        for batch_d in it:
            if step >= a.num_steps or interrupted:
                break
            params, opt_state, dstate, metrics = step_fn(
                params, opt_state, dstate, batch_d, jnp.int32(step))
            step += 1
            seen_segments += 1
            if step == 1 or (a.log_every and step % a.log_every == 0):
                log.log("train", step, loss=metrics["loss"],
                        frame_loss=metrics["frame_loss"],
                        audio_loss=metrics["audio_loss"],
                        bits_per_sample=metrics["bits_per_sample"],
                        grad_norm=metrics.get("grad_norm", 0.0),
                        vocoder_grad_norm=metrics.get(
                            "vocoder_grad_norm", 0.0),
                        lr=metrics.get("lr", 0.0))
            if a.eval_every and step % a.eval_every == 0:
                v, vf, va = run_eval(params)
                is_best = v < best_valid
                best_valid = min(best_valid, v)
                log.log("valid", step, loss=v, frame_loss=vf,
                        audio_loss=va, best=best_valid)
                if is_best:
                    save(step, seen_segments, best_valid, is_best=True)
            if a.save_every and step % a.save_every == 0:
                save(step, seen_segments, best_valid)
    finally:
        for sig, h in old_handlers.items():
            signal.signal(sig, h)
    save(step, seen_segments, best_valid)
    # final-step halves: 'best' only when no eval-best export exists yet
    # (e.g. --eval_every 0), else latest-only alongside the eval best
    export_halves(step, is_best=not exported_best)
    log.log("done", step, best_valid=best_valid,
            interrupted=bool(interrupted))
    print(f"done: step={step} best_valid={best_valid:.5g}"
          + (" (interrupted, checkpoint flushed)" if interrupted else ""))


if __name__ == "__main__":
    main()
