"""Training loop: jitted DP train step, eval, checkpointing, metrics.

Rebuilds the reference's Blocks MainLoop + GradientDescent + extension
stack (reference train.py — mount empty, per SURVEY.md §3.1): per-segment
teacher-forced TBPTT steps, TrainingDataMonitoring (train metrics),
DataStreamMonitoring (valid cost), Checkpoint/TrackTheBest, FinishAfter,
early stopping, wall-clock timing — rebuilt natively over a jitted,
donated, mesh-sharded step function.

Parallelism: batches are sharded along the 1-D `data` mesh axis; params
replicated. XLA inserts the gradient allreduce (psum over ICI on real
hardware) from the sharded-mean loss — no explicit collectives needed
(SURVEY.md §2.4).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from parrot_tpu.config import ParrotConfig
from parrot_tpu.data import H5Corpus, parrot_stream, device_prefetch
from parrot_tpu.models import Parrot
from parrot_tpu.parallel import (make_mesh, batch_sharding, replicated,
                                 state_sharding)
from parrot_tpu.parallel.staging import stage_global, stage_local
from parrot_tpu.train.checkpoint import CheckpointManager
from parrot_tpu.train.optim import adam_init, adam_update
from parrot_tpu.utils.logging import MetricsLogger


def scheduled_sampling_inputs(model, params, norm, batch, dstate, key,
                              *, rate, mode, bias):
    """Pass 1 of the TPU-parallel scheduled-sampling design
    (config.TrainConfig docstring): an undifferentiated forward — its
    pallas custom_vjp primal is the residual-free fused kernel — draws
    the model's own per-step frames; the caller's differentiated pass
    then consumes the returned (B, S, D) RAW inputs, where each
    ground-truth input frame is replaced by the model's with
    probability `rate` (targets stay ground truth).

    ONE shared implementation for the Trainer and train_joint.py: the
    round-4 joint divergence was precisely a training-regime mismatch
    between the two entries, so the SS contract (key split order,
    GMM-only sampled draws, stop_gradient, coin mix) must not be able
    to drift between them."""
    k_pred, k_coin = jax.random.split(key)
    draw = (mode == "sample" and model.cfg.which_cost == "GMM")
    _, _, m1 = model.compute_cost(
        params, norm, batch, dstate, with_predictions=True,
        prediction_key=(k_pred if draw else None),
        prediction_bias=bias)
    pred = jax.lax.stop_gradient(m1["pred_frames"])      # RAW (B, S, D)
    coin = jax.random.bernoulli(k_coin, rate,
                                (pred.shape[0], pred.shape[1], 1))
    return jnp.where(coin, pred, batch.features)


class Trainer:
    def __init__(self, cfg: ParrotConfig, corpus: H5Corpus,
                 mesh=None, quiet: bool = False):
        self.cfg = cfg
        self.corpus = corpus
        self.mesh = mesh if mesh is not None else make_mesh(
            cfg.train.num_devices)
        ndev = self.mesh.devices.size
        if cfg.data.batch_size % ndev:
            raise ValueError(
                f"batch_size {cfg.data.batch_size} not divisible by "
                f"{ndev} devices")
        if self._pallas_resolved() and ndev > 1:
            # the fused train-scan kernel is a single-device program;
            # under the plain GSPMD jit a multi-device mesh would
            # replicate its operands (full global batch per chip)
            # instead of partitioning them. The step is therefore built
            # as a shard_map over the 'data' axis: each device runs the
            # kernel on its local batch rows and gradients are psum'd
            # explicitly (same math as the GSPMD step — the per-shard
            # loss sums and frame counts are allreduced before the
            # global-mean division).
            if not quiet:
                print(f"[trainer] pallas_scan on a {ndev}-device mesh: "
                      f"using the shard_map per-device step")
        n_train = len(corpus.split("train"))
        if n_train < cfg.data.batch_size:
            raise ValueError(
                f"train split has {n_train} utterances < batch_size "
                f"{cfg.data.batch_size}: the training stream would drop "
                f"every batch and hang")
        # The Trainer — which knows the mesh — resolves pallas_scan AUTO
        # to a concrete bool and the model obeys (resolve_pallas_scan is
        # the single source of truth; VERDICT r3 #1). self.cfg keeps the
        # user's tri-state value so checkpoints re-resolve on resume
        # under whatever mesh they restart with.
        import dataclasses
        self.model = Parrot(dataclasses.replace(
            cfg.model, pallas_scan=self._pallas_resolved()))
        if cfg.data.normalize:
            if cfg.data.norm_stats:
                # reference-style standalone stats file (Fuel's
                # ScaleAndShift read mean/std from an .npz)
                with np.load(cfg.data.norm_stats) as z:
                    mean, std = z["mean"], z["std"]
                if mean.shape != (cfg.model.frame_size,):
                    raise ValueError(
                        f"norm_stats mean shape {mean.shape} != "
                        f"frame_size ({cfg.model.frame_size},)")
                self.norm = {"mean": jnp.asarray(mean, jnp.float32),
                             "std": jnp.asarray(std, jnp.float32)}
            else:
                self.norm = {"mean": jnp.asarray(corpus.mean),
                             "std": jnp.asarray(corpus.std)}
        else:
            D = cfg.model.frame_size
            self.norm = {"mean": jnp.zeros((D,)), "std": jnp.ones((D,))}

        key = jax.random.PRNGKey(cfg.train.seed)
        # jit: one compiled program instead of per-op eager dispatches
        # (eager init over the axon tunnel costs minutes at startup)
        self.params = jax.jit(self.model.init_params)(key)
        self.opt_state = jax.jit(adam_init)(self.params)
        self.step = 0
        self.best_valid = float("inf")
        self._segments_done = 0  # stream position (TBPTT segments emitted)
        self._dstate = None      # carried decoder state (checkpointed)

        if cfg.train.debug_nans:
            jax.config.update("jax_debug_nans", True)
        self.ckpt = CheckpointManager(cfg.train.save_dir,
                                      cfg.train.model_name,
                                      keep=cfg.train.keep_checkpoints)
        self.log = MetricsLogger(cfg.train.save_dir, cfg.train.model_name,
                                 quiet=quiet,
                                 write_file=(jax.process_index() == 0))
        self._tb = None
        if cfg.train.tensorboard:
            try:
                from tensorboardX import SummaryWriter
                self._tb = SummaryWriter(
                    f"{cfg.train.save_dir}/{cfg.train.model_name}/tb")
            except Exception:
                pass  # optional dependency; JSONL remains authoritative

        # shardings
        self._repl = replicated(self.mesh)
        st_tpl = self.model.init_state(cfg.data.batch_size,
                                       cfg.data.max_text_len)
        self._state_sh = state_sharding(self.mesh, st_tpl)
        self._repl_tree = lambda t: jax.tree.map(lambda _: self._repl, t)
        # stage params/opt state as global replicated arrays up front —
        # on multi-host, jit inputs must be global jax.Arrays (stage_local
        # converts to host arrays only on the multi-process branch; the
        # single-host path is a plain device_put with no host round trip)
        self.params = stage_local(self.params, self._repl_tree(self.params))
        self.opt_state = stage_local(self.opt_state,
                                     self._repl_tree(self.opt_state))

        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()

    # ------------------------------------------------------------------
    def _pallas_resolved(self) -> bool:
        """pallas_scan AUTO resolved against the PER-DEVICE batch
        (models.parrot.resolve_pallas_scan — the one source of truth).
        The result is baked into self.model's config at construction,
        so the traced model can never disagree with the step type the
        Trainer builds around it: True + ndev>1 -> shard_map step
        (model sees the local batch), False -> plain GSPMD step with
        no pallas anywhere in the trace."""
        from parrot_tpu.models.parrot import resolve_pallas_scan
        per_dev = self.cfg.data.batch_size // max(self.mesh.devices.size, 1)
        return resolve_pallas_scan(self.cfg.model, per_dev)

    def _use_shard_map(self) -> bool:
        """Per-device shard_map step instead of GSPMD: required for the
        fused Pallas train scan (a pallas_call is a single-device
        program — GSPMD would replicate its operands over the mesh
        rather than partition them)."""
        return self._pallas_resolved() and self.mesh.devices.size > 1

    def _shard_map_specs(self):
        from jax.sharding import PartitionSpec as P
        state_spec = jax.tree.map(lambda s: s.spec, self._state_sh)
        batch_spec = jax.tree.map(lambda s: s.spec, self._batch_sh())
        return P, state_spec, batch_spec

    def _build_train_step(self):
        model, norm, tcfg = self.model, self.norm, self.cfg.train

        # Parallel scheduled sampling (exposure-bias fine-tune;
        # config.TrainConfig docstring): pass 1 is a residual-free
        # stop-gradient forward producing the model's own per-step
        # frames; the differentiated pass then trains with each input
        # frame replaced by the model's with probability `rate`. Inputs
        # stay fixed within the differentiated pass, so the fused
        # Pallas kernels / hoisted GEMMs still apply — the TPU-shaped
        # alternative to a sequential sample-dependent training scan.
        # Pass 1 traces the TRAIN model, not the inference view: the
        # pallas custom_vjp PRIMAL is the residual-free fused forward
        # kernel (ops/fused_train_scan.py, VERDICT r4 weak #3), so the
        # undifferentiated pass gets the fused-kernel speed without the
        # residual HBM streams the old inference_view detour avoided.
        ss_rate = tcfg.scheduled_sampling_rate

        def ss_inputs(params, dstate, batch, key):
            return scheduled_sampling_inputs(
                model, params, norm, batch, dstate, key,
                rate=ss_rate, mode=tcfg.scheduled_sampling_mode,
                bias=tcfg.scheduled_sampling_bias)

        if self._use_shard_map():
            from jax import shard_map
            P, state_spec, batch_spec = self._shard_map_specs()

            def grads_body(params, dstate, batch, step):
                rng = jax.random.fold_in(
                    jax.random.PRNGKey(tcfg.seed + 1), step)
                # decorrelate feedback noise across batch shards (each
                # shard draws its own (T, B/ndev, D) noise stream)
                rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
                input_frames = None
                if ss_rate > 0:
                    rng, k_ss = jax.random.split(rng)
                    input_frames = ss_inputs(params, dstate, batch, k_ss)

                def loss_fn(p):
                    loss, new_state, metrics = model.compute_cost(
                        p, norm, batch, dstate, rng=rng,
                        input_frames=input_frames)
                    # local SUM (compute_cost returns the local
                    # frame-mean) so the global mean divides once, after
                    # the allreduce — gradient-identical to the GSPMD
                    # step's global frame-mean loss
                    return loss * metrics["frames"], new_state

                (lsum, new_state), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                frames = jnp.maximum(
                    jax.lax.psum(
                        jnp.sum(batch.features_mask), "data"), 1.0)
                lsum = jax.lax.psum(lsum, "data")
                grads = jax.tree.map(
                    lambda g: jax.lax.psum(g, "data") / frames, grads)
                metrics = {"loss": lsum / frames, "frames": frames}
                return grads, new_state, metrics

            grads_sm = shard_map(
                grads_body, mesh=self.mesh,
                in_specs=(P(), state_spec, batch_spec, P()),
                out_specs=(P(), state_spec, P()),
                check_vma=False)

            def train_step(params, opt_state, dstate, batch, step):
                # grads are pre-divided by the global frame count inside
                # the shard_map (== gradient of the global-mean loss)
                grads, new_state, metrics = grads_sm(
                    params, dstate, batch, step)
                params, opt_state, info = adam_update(
                    params, grads, opt_state, tcfg)
                return params, opt_state, new_state, dict(metrics, **info)
        else:
            def train_step(params, opt_state, dstate, batch, step):
                rng = jax.random.fold_in(
                    jax.random.PRNGKey(tcfg.seed + 1), step)
                input_frames = None
                if ss_rate > 0:
                    rng, k_ss = jax.random.split(rng)
                    input_frames = ss_inputs(params, dstate, batch, k_ss)

                def loss_fn(p):
                    loss, new_state, metrics = model.compute_cost(
                        p, norm, batch, dstate, rng=rng,
                        input_frames=input_frames)
                    return loss, (new_state, metrics)

                (loss, (new_state, metrics)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                params, opt_state, info = adam_update(params, grads,
                                                      opt_state, tcfg)
                metrics = dict(metrics, **info)
                return params, opt_state, new_state, metrics

        return jax.jit(
            train_step,
            donate_argnums=(0, 1, 2),
            out_shardings=(self._repl_tree(self.params),
                           self._repl_tree(self.opt_state),
                           self._state_sh, None),
        )

    def _build_eval_step(self):
        model, norm = self.model, self.norm

        if self._use_shard_map():
            from jax import shard_map
            P, state_spec, batch_spec = self._shard_map_specs()

            def eval_body(params, dstate, batch):
                loss, new_state, metrics = model.compute_cost(
                    params, norm, batch, dstate)
                s = jax.lax.psum(loss * metrics["frames"], "data")
                f = jax.lax.psum(metrics["frames"], "data")
                return new_state, s, f

            fn = shard_map(eval_body, mesh=self.mesh,
                           in_specs=(P(), state_spec, batch_spec),
                           out_specs=(state_spec, P(), P()),
                           check_vma=False)
            return jax.jit(fn, donate_argnums=(1,))

        def eval_step(params, dstate, batch):
            loss, new_state, metrics = model.compute_cost(
                params, norm, batch, dstate)
            return new_state, loss * metrics["frames"], metrics["frames"]

        return jax.jit(eval_step, donate_argnums=(1,))

    # ------------------------------------------------------------------
    def _fresh_state(self):
        st = self.model.init_state(self.cfg.data.batch_size,
                                   self.cfg.data.max_text_len)
        return stage_global(st, self._state_sh)

    def resume(self) -> bool:
        """Pick up the latest checkpoint if one exists. Restores params,
        optimizer state, normalization stats, the carried TBPTT decoder
        state, and the data-stream position, so training continues
        exactly where it stopped."""
        templates = {"params": self.params, "opt_state": self.opt_state,
                     "norm": self.norm}
        st_tpl = self.model.init_state(self.cfg.data.batch_size,
                                       self.cfg.data.max_text_len)
        try:
            got = self.ckpt.restore(dict(templates, dstate=st_tpl))
        except KeyError:
            # checkpoint without a dstate (e.g. written by the importer)
            got = self.ckpt.restore(templates)
        if got is None:
            return False
        self.step, trees, meta = got
        # every process restores the same full host trees; staging makes
        # them global arrays (replicated params, data-sharded dstate)
        self.params = stage_local(trees["params"],
                                  self._repl_tree(trees["params"]))
        self.opt_state = stage_local(trees["opt_state"],
                                     self._repl_tree(trees["opt_state"]))
        self.norm = {k: jnp.asarray(v) for k, v in trees["norm"].items()}
        if "dstate" in trees:
            from parrot_tpu.models import DecoderState
            d = trees["dstate"]
            self._dstate = stage_global(
                DecoderState(hs=tuple((h, c) for h, c in d.hs),
                             kappa=d.kappa, w=d.w, enc=d.enc,
                             x_last=d.x_last), self._state_sh)
        self._segments_done = int(meta.get("segments_done", 0))
        self.best_valid = meta.get("best_valid", float("inf"))
        # step fns close over norm — rebuild with restored stats
        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()
        self.log.log("resume", self.step)
        return True

    def init_from(self, model_name: str, which: str = "best",
                  save_dir: Optional[str] = None) -> int:
        """Warm-start params + norm from ANOTHER model's checkpoint,
        keeping fresh optimizer state, stream position, and step
        counter — the corpus-transfer fine-tune entry (--resume cannot
        serve it: it restores the stream position and TBPTT carry of
        the ORIGINAL dataset). The checkpoint's normalization stats
        REPLACE the new corpus's: the loaded params are calibrated to
        the stats they were trained under, and feeding them features
        standardized by different moments silently shifts every input.
        Architectures must match (same param tree); returns the source
        checkpoint's step for logging."""
        # host-only restore against this Trainer's own param template —
        # no device traffic until the single stage_local below (the
        # load_for_inference path would device_put the whole tree and
        # pull it back leaf-by-leaf over the tunnel)
        import os
        from parrot_tpu.train.checkpoint import CheckpointManager
        root = save_dir or self.cfg.train.save_dir
        if not os.path.isdir(os.path.join(root, model_name)):
            # check BEFORE constructing the manager: its __init__
            # makedirs the model dir, and a typo'd --init_from must
            # not leave a junk empty directory under save_dir
            raise FileNotFoundError(
                f"--init_from: no model directory "
                f"{os.path.join(root, model_name)}")
        mgr = CheckpointManager(root, model_name)
        if not os.path.exists(os.path.join(root, model_name, which)):
            # _resolve falls back to the newest step dir; that silent
            # substitution (possibly-overfit latest params under a
            # 'best' request, or an arbitrary step under a lost
            # 'latest' pointer) must be visible to the operator
            print(f"[init_from] warning: '{model_name}' has no "
                  f"'{which}' pointer — loading the newest step "
                  f"checkpoint instead")
        tpl = {"params": jax.tree.map(
                   lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                   self.params),
               "norm": self.norm}
        try:
            got = mgr.restore(tpl, which=which)
        except (KeyError, ValueError) as e:
            raise ValueError(
                f"--init_from '{model_name}': param tree mismatch — "
                f"the checkpoint's architecture differs from this "
                f"run's model config ({e})")
        if got is None:
            raise FileNotFoundError(
                f"--init_from: no checkpoint under "
                f"{save_dir or self.cfg.train.save_dir}/{model_name}")
        src_step, trees, _meta = got
        self.params = stage_local(trees["params"],
                                  self._repl_tree(self.params))
        self.norm = {k: jnp.asarray(v) for k, v in trees["norm"].items()}
        # step fns close over norm — rebuild with the loaded stats
        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()
        self.log.log("init_from", 0, source=model_name,
                     source_step=src_step)
        return src_step

    # ------------------------------------------------------------------
    def evaluate(self, max_batches: Optional[int] = None) -> float:
        stream = parrot_stream(self.corpus, self.cfg.data, "valid",
                               training=False, epochs=1,
                               process_index=jax.process_index(),
                               process_count=jax.process_count())
        dstate = self._fresh_state()
        tot, frames = 0.0, 0.0
        for i, batch in enumerate(device_prefetch(
                iter(stream), depth=self.cfg.data.prefetch,
                sharding=self._batch_sh())):
            if max_batches is not None and i >= max_batches:
                break
            dstate, s, f = self._eval_step(self.params, dstate, batch)
            tot += float(s)
            frames += float(f)
        return tot / max(frames, 1.0)

    def _batch_sh(self):
        if not hasattr(self, "_cached_batch_sh"):
            # build once from a probe batch (local rows; only ndim matters)
            probe = next(iter(parrot_stream(
                self.corpus, self.cfg.data, "train", epochs=1,
                process_index=jax.process_index(),
                process_count=jax.process_count())))
            self._cached_batch_sh = batch_sharding(self.mesh, probe)
        return self._cached_batch_sh

    # ------------------------------------------------------------------
    def train(self, num_steps: Optional[int] = None) -> Dict:
        tcfg = self.cfg.train
        target = num_steps if num_steps is not None else tcfg.num_steps
        # preemption safety (SURVEY.md §5 "Failure detection"): SIGTERM /
        # SIGINT flush a checkpoint and exit cleanly; --resume picks it up
        import signal

        self._interrupted = False

        def _on_signal(sig, frame):
            self._interrupted = True

        old_handlers = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                old_handlers[sig] = signal.signal(sig, _on_signal)
            except ValueError:
                pass  # not the main thread (e.g. under a test runner)
        if self._dstate is None:
            self._dstate = self._fresh_state()
        dstate = self._dstate
        # fast-forward the deterministic shuffle to the checkpointed
        # position (Blocks pickled the whole main loop; we replay the
        # cheap bookkeeping and skip materializing the batches)
        stream = parrot_stream(self.corpus, self.cfg.data, "train",
                               training=True, epochs=None,
                               skip_segments=self._segments_done,
                               process_index=jax.process_index(),
                               process_count=jax.process_count())
        it = device_prefetch(iter(stream), depth=self.cfg.data.prefetch,
                             sharding=self._batch_sh())
        t_last = time.time()
        frames_acc = 0.0
        evals_since_best = 0
        prof_on = False
        try:

            for batch in it:
                if self.step >= target:
                    break
                if self._check_interrupted():
                    self.log.log("preempted", self.step)
                    break
                if tcfg.profile_steps != (0, 0):
                    if self.step == tcfg.profile_steps[0] and not prof_on:
                        jax.profiler.start_trace(
                            f"{tcfg.save_dir}/{tcfg.model_name}/profile")
                        prof_on = True
                    if self.step == tcfg.profile_steps[1] and prof_on:
                        jax.profiler.stop_trace()
                        prof_on = False
                with jax.profiler.StepTraceAnnotation("train",
                                                       step_num=self.step):
                    self.params, self.opt_state, dstate, metrics = \
                        self._train_step(self.params, self.opt_state, dstate,
                                         batch, jnp.int32(self.step))
                self._dstate = dstate
                self.step += 1
                self._segments_done += 1
                frames_acc += float(metrics["frames"])

                if self.step % tcfg.log_every == 0:
                    dt = time.time() - t_last
                    fps = frames_acc / max(dt, 1e-9)
                    self.log.log("train", self.step,
                                 loss=metrics["loss"],
                                 grad_norm=metrics["grad_norm"],
                                 lr=metrics["lr"],
                                 frames_per_sec=fps)
                    if self._tb is not None:
                        self._tb.add_scalar("train/loss", float(metrics["loss"]),
                                            self.step)
                        self._tb.add_scalar("train/frames_per_sec", fps,
                                            self.step)
                    t_last = time.time()
                    frames_acc = 0.0

                if tcfg.eval_every and self.step % tcfg.eval_every == 0:
                    valid = self.evaluate()
                    is_best = valid < self.best_valid
                    if is_best:
                        self.best_valid = valid
                        evals_since_best = 0
                    else:
                        evals_since_best += 1
                    self.log.log("valid", self.step, valid_loss=valid,
                                 best=self.best_valid)
                    if self._tb is not None:
                        self._tb.add_scalar("valid/loss", valid, self.step)
                    if tcfg.plot_alignments:
                        self._dump_alignment()
                    if tcfg.track_best and is_best:
                        self._save(is_best=True)
                    if (tcfg.early_stop_patience
                            and evals_since_best >= tcfg.early_stop_patience):
                        self.log.log("early_stop", self.step)
                        break

                if tcfg.save_every and self.step % tcfg.save_every == 0:
                    self._save()

        finally:
            # restore handlers / close the trace even when the loop
            # raises (NaN debug, OOM, data errors) — otherwise the
            # surviving process swallows Ctrl-C / SIGTERM forever
            if prof_on:
                jax.profiler.stop_trace()
            for sig, h in old_handlers.items():
                signal.signal(sig, h)
        self._save()
        return {"step": self.step, "best_valid": self.best_valid,
                "interrupted": self._interrupted}

    # multi-host preemption-poll cadence (steps). The collective check
    # blocks the host, so running it every step would re-serialize the
    # pipeline device_prefetch exists to overlap; every 8 steps bounds
    # the preemption latency to well under any SIGTERM grace period.
    INTERRUPT_CHECK_EVERY = 8

    def _check_interrupted(self) -> bool:
        """Collective preemption decision. A SIGTERM usually reaches only
        one host; if that host broke out of the loop alone, its
        checkpoint allgather would pair with the peers' ongoing
        train-step collectives (mismatched SPMD programs — a hang or a
        mixed-step checkpoint). All processes therefore agree on the
        flag with a tiny allgather at a fixed step cadence (step count
        is identical on every process, so they all enter the collective
        together), and everyone leaves the loop at the same boundary."""
        if jax.process_count() == 1:
            return self._interrupted
        if self.step % self.INTERRUPT_CHECK_EVERY:
            return False  # off-cadence: no process may exit alone
        from jax.experimental import multihost_utils
        flags = multihost_utils.process_allgather(
            np.int32(1 if self._interrupted else 0))
        return bool(np.max(flags) > 0)

    def _dump_alignment(self):
        """Save an attention-alignment plot from one teacher-forced valid
        batch (Blocks-era monitoring; SURVEY.md §5 observability)."""
        if jax.process_count() > 1:
            return  # host-local probe path; not worth a collective program
        import os

        import numpy as np

        from parrot_tpu.evaluate import teacher_forced_predictions
        from parrot_tpu.utils.plotting import save_attention_plot

        batch = next(iter(parrot_stream(self.corpus, self.cfg.data, "valid",
                                        training=False, epochs=1)))
        _, _, phis, _, _ = teacher_forced_predictions(
            self.model, self.params, self.norm, batch)
        out_dir = os.path.join(self.cfg.train.save_dir,
                               self.cfg.train.model_name, "alignments")
        os.makedirs(out_dir, exist_ok=True)
        length = int(np.asarray(batch.features_mask)[0].sum())
        tlen = int(np.asarray(batch.text_mask)[0].sum())
        save_attention_plot(
            os.path.join(out_dir, f"step_{self.step:08d}.png"),
            np.asarray(phis)[:, 0, :], length, tlen)

    def _save(self, is_best: bool = False):
        trees = {"params": self.params, "opt_state": self.opt_state,
                 "norm": self.norm}
        if self._dstate is not None:
            dstate = self._dstate
            if jax.process_count() > 1:
                # dstate is sharded along the data axis across hosts;
                # device_get on non-addressable shards would raise.
                # tiled=True concatenates the per-process row blocks back
                # into the global (B, ...) layout the resume template
                # expects (a tiled=False gather would prepend a process
                # axis and break restore).
                from jax.experimental import multihost_utils
                dstate = multihost_utils.process_allgather(dstate,
                                                           tiled=True)
            trees["dstate"] = dstate
        if jax.process_index() != 0:
            return  # every process joins the gather; one writes the file
        self.ckpt.save(self.step, trees,
                       meta={"config": self.cfg.to_json(),
                             "best_valid": self.best_valid,
                             "segments_done": self._segments_done},
                       is_best=is_best)
