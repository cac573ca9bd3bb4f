"""Batched autoregressive sampler with length bucketing.

Rebuilds the reference's generate.py sampling loop (reference
generate.py — mount empty, per SURVEY.md §3.2), TPU-first: instead of a
Python loop calling a compiled step per frame (the reference's
bottleneck), the whole generation runs on device as one
`lax.while_loop` writing into a preallocated (max_steps, B, D) buffer,
with per-example stop flags from the attention window passing the last
character, and early exit when every sequence is done. Biased GMM
sampling per BASELINE.json:9; inference batches are length-bucketed
(BASELINE.json:10) so examples in a batch finish together.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from parrot_tpu.config import SampleConfig
from parrot_tpu.models import Parrot
from parrot_tpu.nn.attention import GravesWindow


class Sampler:
    def __init__(self, model: Parrot, params, norm, cfg: SampleConfig,
                 mesh=None):
        """mesh: optional jax.sharding.Mesh with a 'data' axis. When
        given, the fused serving path runs ONE Pallas kernel PER SHARD
        under shard_map (batch rows split along 'data', weights
        replicated) — generation throughput scales with chips, since
        autoregressive decode needs no cross-chip communication at all.
        The plain while_loop path handles sharded inputs through jit's
        normal SPMD partitioning either way."""
        # inference traces the residual-free view: the training kernels'
        # forward streams gate/cell residuals to HBM that no backward
        # ever reads and pays serving warm-up extra Mosaic compiles
        # (VERDICT r3 #2) — encode() here must run the plain forward
        self.model = model.inference_view()
        self.params = params
        self.norm = norm
        self.cfg = cfg
        self.mesh = mesh
        self._gen = jax.jit(self._generate_impl,
                            static_argnames=("max_steps",))

    # ------------------------------------------------------------------
    def _generate_impl(self, params, text, text_mask, speaker, key,
                       max_steps: int):
        model, cfg = self.model, self.cfg
        B, U = text.shape
        D = model.D
        text_lengths = text_mask.sum(-1)

        state = model.init_state(B, U)
        state = state._replace(enc=model.encode(params, text, text_mask))

        frames0 = jnp.zeros((max_steps, B, D), jnp.float32)
        phis0 = jnp.zeros((max_steps, B, U), jnp.float32)
        done0 = jnp.zeros((B,), bool)
        lengths0 = jnp.zeros((B,), jnp.int32)

        def cond(carry):
            t, _, _, done, _, _, _ = carry
            return jnp.logical_and(t < max_steps, ~jnp.all(done))

        def body(carry):
            t, state, k, done, lengths, frames, phis = carry
            k, sub = jax.random.split(k)
            new_state, x, phi, _ = model.sample_step(
                params, state, text_mask, speaker, sub,
                bias=cfg.sampling_bias)
            # freeze finished examples
            keep = done[:, None]
            x = jnp.where(keep, state.x_last, x)
            new_state = jax.tree.map(
                lambda n, o: jnp.where(
                    done.reshape((B,) + (1,) * (n.ndim - 1)), o, n),
                new_state, state)
            frames = frames.at[t].set(x)
            phis = phis.at[t].set(jnp.where(keep, 0.0, phi))
            stop = GravesWindow.stop_mass(new_state.kappa, text_lengths)
            newly_done = jnp.logical_and(~done,
                                         stop > cfg.stop_threshold)
            lengths = jnp.where(newly_done, t + 1, lengths)
            done = jnp.logical_or(done, newly_done)
            return t + 1, new_state, k, done, lengths, frames, phis

        t, state, _, done, lengths, frames, phis = jax.lax.while_loop(
            cond, body, (jnp.int32(0), state, key, done0, lengths0,
                         frames0, phis0))
        lengths = jnp.where(done, lengths, t)  # hit max_steps
        # denormalize to raw WORLD-feature domain
        raw = frames * self.norm["std"] + self.norm["mean"]
        return raw.transpose(1, 0, 2), lengths, phis.transpose(1, 0, 2)

    # ------------------------------------------------------------------
    def generate(self, text, text_mask, speaker=None, key=None,
                 max_steps: Optional[int] = None, return_phis: bool = True,
                 use_fused: Optional[bool] = None):
        """text: (B, U) int32; returns (frames (B, T, D) raw, lengths (B,),
        phis (B, T, U) or None). `use_fused` overrides
        cfg.use_fused_kernel (False forces the reference while_loop
        path, e.g. for parity checks).

        With `cfg.use_fused_kernel` on a TPU backend, generation runs
        through the Pallas fused decode kernel
        (parrot_tpu.ops.fused_decode) — the fast serving path. With
        `return_phis=True` the kernel additionally emits per-step
        (alpha, beta) (2K floats/step) and phi is reconstructed outside
        the kernel, so attention plots no longer force the slow path.
        The plain lax.while_loop path remains the reference
        implementation.
        """
        if key is None:
            key = jax.random.PRNGKey(self.cfg.seed)
        if speaker is None:
            speaker = jnp.zeros((text.shape[0],), jnp.int32)
        ms = int(max_steps if max_steps is not None else self.cfg.max_steps)
        want_fused = (self.cfg.use_fused_kernel if use_fused is None
                      else use_fused)
        use_fused = (want_fused
                     and not getattr(self, "_fused_broken", False)
                     and (jax.default_backend() != "cpu"
                          or getattr(self, "_force_interpret", False)))
        if use_fused:
            try:
                out = self._generate_fused(text, text_mask, speaker, key,
                                           ms, return_phis=return_phis)
                self._fused_fail_streak = 0
                return out
            except Exception as e:
                # VMEM overflow / Mosaic rejection / shape errors are
                # deterministic: remember and fall back permanently. A
                # transient runtime error (device tunnel hiccup) falls
                # back for THIS call only — the next call retries the
                # kernel — with a consecutive-failure cap so a
                # misclassified persistent error can't recompile-storm.
                # Keep the message: a VMEM overflow is benign, a shape
                # error is a regression — the operator must see which.
                from parrot_tpu.utils.errors import (
                    fused_error_is_permanent, MAX_TRANSIENT_FAILURES)
                streak = getattr(self, "_fused_fail_streak", 0) + 1
                self._fused_fail_streak = streak
                permanent = (fused_error_is_permanent(e)
                             or streak >= MAX_TRANSIENT_FAILURES)
                if permanent:
                    self._fused_broken = True
                msg = str(e).replace("\n", " ")[:300]
                print(f"fused decode unavailable ({type(e).__name__}: "
                      f"{msg}); falling back to the reference sampler"
                      + ("" if permanent
                         else " (transient: will retry next call)"))
        return self._gen(self.params, jnp.asarray(text),
                         jnp.asarray(text_mask, jnp.float32),
                         jnp.asarray(speaker), key, max_steps=ms)

    # ------------------------------------------------------------------
    def _generate_fused(self, text, text_mask, speaker, key, max_steps,
                        return_phis=False):
        """Pallas fused-kernel generation (fixed step count, host-side
        stop detection from the kappa trajectory). return_phis=True adds
        the (alpha, beta) kernel output and reconstructs phi outside.

        With a multi-device `self.mesh`, the whole pipeline (encoder +
        weight slicing + kernel) runs per shard under shard_map: batch
        rows split along the 'data' axis, weights replicated, one
        independent Pallas kernel per chip — decode needs no cross-chip
        communication, so throughput scales linearly with devices."""
        model, cfg = self.model, self.cfg
        text = jnp.asarray(text)
        text_mask = jnp.asarray(text_mask, jnp.float32)
        speaker = jnp.asarray(speaker)
        B, U = text.shape
        # sharded serving needs rows divisible by the mesh size; pad the
        # final ragged bucket with empty rows (mask 0 -> immediate stop)
        # and slice them back off below
        n_dev = (self.mesh.devices.size if self.mesh is not None else 1)
        pad = (-B) % n_dev
        if pad:
            text = jnp.pad(text, ((0, pad), (0, 0)))
            text_mask = jnp.pad(text_mask, ((0, pad), (0, 0)))
            speaker = jnp.pad(speaker, ((0, pad),))
        # large chunks amortize per-grid-step pipeline overhead; small
        # chunks avoid wasted compute when generations are short (and the
        # early-exit zero-fills any overshoot cheaply)
        CHUNK = (128 if max_steps >= 512 else
                 64 if max_steps >= 256 else 16)
        T = -(-max_steps // CHUNK) * CHUNK

        run = self._fused_run(T, CHUNK, return_phis)
        outs = run(self.params, text, text_mask, speaker, key)
        frames, kappas = outs[0], outs[1]
        ab = outs[2] if return_phis else None

        frames, lengths, phis = self._finalize_fused(
            frames, kappas, text_mask, max_steps, ab)
        if pad:
            frames, lengths = frames[:B], lengths[:B]
            phis = phis[:B] if phis is not None else None
        return frames, lengths, phis

    def _fused_run(self, T, CHUNK, return_phis):
        """Build (and cache) the jitted end-to-end fused pipeline for a
        (T, CHUNK, return_phis) signature, shard_map-wrapped when a
        multi-device mesh is set. One jitted program covers encoder +
        weight slicing + kernel: eager op-by-op dispatch is
        pathologically slow over the TPU tunnel."""
        cache_key = (T, CHUNK, return_phis)
        if not hasattr(self, "_fused_cache"):
            self._fused_cache = {}
        if cache_key in self._fused_cache:
            return self._fused_cache[cache_key]

        from parrot_tpu.ops.fused_decode import (fused_decode,
                                                  prepare_params,
                                                  flatten_state)
        model, cfg = self.model, self.cfg
        wdt = (jnp.bfloat16 if cfg.fused_weight_dtype == "bfloat16"
               else jnp.float32)
        interpret = getattr(self, "_force_interpret", False)
        mesh = self.mesh
        sharded = mesh is not None and mesh.devices.size > 1

        def run(params, text, text_mask, speaker, key):
            if sharded:
                # decorrelate each shard's sampling noise
                key = jax.random.fold_in(
                    key, jax.lax.axis_index("data"))
            enc = model.encode(params, text, text_mask)
            kp = prepare_params(model, params, speaker,
                                speaker.shape[0], weight_dtype=wdt)
            seed = jax.random.randint(key, (1,), 0, 2**31 - 1,
                                      dtype=jnp.int32)
            init = flatten_state(
                model.init_state(text.shape[0], text.shape[1]))
            return fused_decode(
                kp, enc, text_mask, init, seed,
                T=T, D=model.D, E=model.E, H=model.H, K=model.K,
                M=model.cfg.num_mixtures, L=model.L,
                alignment=model.cfg.attention_alignment,
                bias=cfg.sampling_bias,
                min_log_sigma=model.cfg.min_log_sigma,
                is_gmm=(model.cfg.which_cost == "GMM"),
                layer_norm=model.cfg.layer_norm, chunk_steps=CHUNK,
                stop_threshold=cfg.stop_threshold,
                emit_attention=return_phis, interpret=interpret)

        if sharded:
            from jax.sharding import PartitionSpec as P
            from jax import shard_map
            out_spec = P(None, "data")  # outputs are (T, B, ...)
            n_out = 3 if return_phis else 2
            run = shard_map(
                run, mesh=mesh,
                in_specs=(P(), P("data"), P("data"), P("data"), P()),
                out_specs=(out_spec,) * n_out,
                check_vma=False)
        fn = jax.jit(run)
        self._fused_cache[cache_key] = fn
        return fn

    def _finalize_fused(self, frames, kappas, text_mask, max_steps,
                        alphas_betas=None):
        if not hasattr(self, "_fused_post"):
            norm, thr = self.norm, self.cfg.stop_threshold

            @functools.partial(jax.jit, static_argnames=("with_phi",))
            def post(frames, kappas, text_mask, alphas_betas,
                     with_phi: bool):
                T = frames.shape[0]
                text_lengths = text_mask.sum(-1)             # (B,)
                # one stop criterion for both serving paths
                mass = jax.vmap(GravesWindow.stop_mass,
                                in_axes=(0, None))(kappas, text_lengths)
                done = mass > thr
                any_done = jnp.any(done, axis=0)
                first = jnp.argmax(done, axis=0) + 1         # (B,)
                lengths = jnp.where(any_done, first, T).astype(jnp.int32)
                t_idx = jnp.arange(T)[:, None]
                live = (t_idx < lengths[None, :]).astype(
                    frames.dtype)[:, :, None]
                raw = (frames * live) * norm["std"] + norm["mean"]
                phis = None
                if with_phi:
                    from parrot_tpu.ops.fused_decode import reconstruct_phi
                    phis = reconstruct_phi(kappas, alphas_betas, text_mask)
                    phis = (phis * live).transpose(1, 0, 2)  # (B, T, U)
                return raw.transpose(1, 0, 2), lengths, phis

            self._fused_post = post
        with_phi = alphas_betas is not None
        if not with_phi:  # jit needs a concrete placeholder argument
            alphas_betas = jnp.zeros((frames.shape[0], frames.shape[1], 2),
                                     jnp.float32)
        raw, lengths, phis = self._fused_post(frames, kappas, text_mask,
                                              alphas_betas, with_phi)
        if phis is not None:
            phis = phis[:, :max_steps]
        return raw[:, :max_steps], jnp.minimum(lengths, max_steps), phis


def bucket_by_length(texts: Sequence[np.ndarray],
                     batch_size: int,
                     pad_to_multiple: int = 16
                     ) -> List[Tuple[List[int], np.ndarray, np.ndarray]]:
    """Group variable-length token sequences into length-bucketed batches.

    Returns a list of (original_indices, text (b, U), text_mask (b, U)).
    Sorting by length keeps per-batch padding low and lets batches finish
    generation together (BASELINE.json:10).
    """
    order = sorted(range(len(texts)), key=lambda i: len(texts[i]))
    out = []
    for lo in range(0, len(order), batch_size):
        idx = order[lo:lo + batch_size]
        u_max = max(len(texts[i]) for i in idx)
        u_pad = -(-u_max // pad_to_multiple) * pad_to_multiple
        text = np.zeros((len(idx), u_pad), np.int32)
        mask = np.zeros((len(idx), u_pad), np.float32)
        for r, i in enumerate(idx):
            t = np.asarray(texts[i], np.int32)
            text[r, :len(t)] = t
            mask[r, :len(t)] = 1.0
        out.append((idx, text, mask))
    return out
