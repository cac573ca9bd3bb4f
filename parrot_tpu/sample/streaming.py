"""Streaming Char2Wav synthesis: text -> audio in fixed-size chunks.

The batch serving paths optimize throughput (whole utterances in one
kernel call, docs/PERFORMANCE.md); this module optimizes LATENCY:
time-to-first-audio. Both fused kernels support carried state across
calls (`emit_state=True` returns the final decoder / vocoder state,
split back into the next call's init), so the pipeline runs

    per chunk of F frames (F * hop samples = F * 5 ms of audio):
      fused reader decode  (F steps,  state in -> state out)
      fused SampleRNN vocoder (F frames, state in -> state out)

as ONE jitted program per chunk, and a host generator yields the audio
as it is produced. With F=32 the first 160 ms of audio exist after a
single chunk instead of after the whole utterance.

The reference's generation is a per-frame Python loop followed by an
offline vocoder pass — no streaming equivalent exists there.

Single-device by default (streaming is a latency path). Pass a
multi-device `mesh` to serve many concurrent streams: batch rows split
along the 'data' axis under shard_map, weights replicated, one
independent kernel per chip with per-shard carried state — no
cross-chip communication, so stream capacity scales linearly with
devices while per-chunk latency stays single-chip (BASELINE.json:11).
Greedy/f32 chunked output is bit-identical to the one-shot kernels
(tested) — chunking changes the schedule, not the math.
"""

from __future__ import annotations

import functools
from typing import Iterator, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from parrot_tpu.config import SampleConfig
from parrot_tpu.nn.attention import GravesWindow
from parrot_tpu.vocoder.mulaw import mulaw_decode_jax


class StreamChunk(NamedTuple):
    """One yielded chunk of synthesis output (host-side arrays)."""

    audio: np.ndarray      # (B, F * hop) float32 in [-1, 1]
    frames: np.ndarray     # (B, F, D) RAW vocoder frames
    live: np.ndarray       # (B, F) 1.0 where the row was still generating
    done: np.ndarray       # (B,) True once a row's window passed its text
    ttfa_ms: float         # wall-clock ms from stream() start to this yield


class StreamingSynthesizer:
    """Chunked text->audio with carried kernel state.

    model/params/norm: the reader (Parrot) triple; vmodel/vparams/vnorm:
    the SampleRNN vocoder and ITS conditioning stats (renormalization
    reader-space -> vocoder-space happens in the chunk program; when
    the pair was trained together the two stats coincide and the
    renormalization is an exact no-op).
    """

    def __init__(self, model, params, norm, vmodel, vparams,
                 cfg: Optional[SampleConfig] = None,
                 vocoder_temperature: float = 1.0,
                 interpret: Optional[bool] = None, vnorm=None,
                 mesh=None):
        self.mesh = mesh
        # residual-free inference view (same contract as Sampler): the
        # encoder prep must not trace the training Pallas kernels
        self.model = model.inference_view()
        self.params = params
        self.norm = {k: jnp.asarray(v) for k, v in norm.items()}
        # the vocoder's own conditioning stats (load_vocoder_for_inference
        # returns them); defaults to the reader's when trained together
        self.vnorm = ({k: jnp.asarray(v) for k, v in vnorm.items()}
                      if vnorm is not None else self.norm)
        self.vmodel = vmodel
        self.vparams = vparams
        self.cfg = cfg if cfg is not None else SampleConfig()
        self.vocoder_temperature = float(vocoder_temperature)
        if interpret is None:
            # on CPU the kernels run in interpret mode (note: the GMM
            # head's in-kernel PRNG does not lower on CPU — streaming a
            # GMM model off-TPU requires an MSE head or hardware). Same
            # backend condition as Sampler.
            interpret = jax.default_backend() == "cpu"
        self.interpret = interpret
        self._cache = {}

    # ------------------------------------------------------------------
    def _chunk_fn(self, B, U, F):
        """One jitted program: F reader steps + F vocoder frames, state
        threaded in and out of both kernels."""
        key = (B, U, F)
        if key in self._cache:
            return self._cache[key]

        from parrot_tpu.ops.fused_decode import (fused_decode,
                                                 prepare_params,
                                                 split_state)
        from parrot_tpu.ops.fused_vocoder import (fused_vocoder_decode,
                                                  prepare_vocoder_params,
                                                  split_vocoder_state)
        model, vmodel, cfg = self.model, self.vmodel, self.cfg
        vcfg = vmodel.cfg
        norm, vnorm = self.norm, self.vnorm
        wdt = (jnp.bfloat16 if cfg.fused_weight_dtype == "bfloat16"
               else jnp.float32)
        # one reader grid step per call; vocoder chunks of 8 frames
        if F % 8 or F <= 0:
            raise ValueError(f"frame_chunk must be a positive multiple "
                             f"of 8 (got {F})")
        VC = 8 if F % 16 else 16
        mesh = self.mesh
        sharded = mesh is not None and mesh.devices.size > 1

        def run(params, vparams, enc, text_mask, speaker, dstate_flat,
                vstate, prev_done, seed):
            if sharded:
                # decorrelate each shard's PRNG streams; the stride
                # clears the per-call grid-step offsets (reader: 1,
                # vocoder: F // VC) with huge margin
                seed = seed + (jax.lax.axis_index("data")
                               * jnp.int32(1 << 16))
            # two decorrelated streams: both kernels seed their PRNG with
            # seed[0] + chunk, so sharing one seed would correlate the
            # reader's frame-sampling noise with the vocoder's
            # audio-sampling noise (seed is (2,): reader=0, vocoder=1)
            rseed, vseed = seed[0:1], seed[1:2]
            kp = prepare_params(model, params, speaker, speaker.shape[0],
                                weight_dtype=wdt)
            frames_n, kappas, dflat = fused_decode(
                kp, enc, text_mask, dstate_flat, rseed,
                T=F, D=model.D, E=model.E, H=model.H, K=model.K,
                M=model.cfg.num_mixtures, L=model.L,
                alignment=model.cfg.attention_alignment,
                bias=cfg.sampling_bias,
                min_log_sigma=model.cfg.min_log_sigma,
                is_gmm=(model.cfg.which_cost == "GMM"),
                layer_norm=model.cfg.layer_norm, chunk_steps=F,
                stop_threshold=cfg.stop_threshold,
                interpret=self.interpret, emit_state=True)
            # stop bookkeeping, same criterion AND boundary as the
            # batch path (sampler._finalize_fused): the frame that
            # crosses the threshold is the last LIVE frame. mass is
            # monotone (kappa only grows), so live_t = "not done before
            # step t" = [~prev_done, mass[:-1] <= thr].
            text_lengths = text_mask.sum(-1)
            mass = jax.vmap(GravesWindow.stop_mass,
                            in_axes=(0, None))(kappas, text_lengths)
            not_done_before = jnp.concatenate(
                [jnp.logical_not(prev_done)[None, :],
                 mass[:-1] <= cfg.stop_threshold], axis=0)   # (F, B)
            live = not_done_before.astype(jnp.float32).T     # (B, F)
            done = mass[-1] > cfg.stop_threshold             # (B,)

            # renormalize reader-space -> vocoder-space (an exact no-op
            # when the pair shares stats, i.e. trained together)
            vkp = prepare_vocoder_params(
                vmodel, vparams, wdt,
                speaker=speaker if vcfg.use_speaker else None)
            raw_f = frames_n * norm["std"] + norm["mean"]    # (F, B, D)
            cond_n = ((raw_f - vnorm["mean"])
                      / vnorm["std"]).astype(jnp.float32)
            ids, vflat = fused_vocoder_decode(
                vkp, cond_n, live.T, (vstate[0], vstate[1], vstate[2],
                                      vstate[3]), vseed,
                T_c=F, D=vcfg.cond_dim, FS=vcfg.frame_size,
                RF=vcfg.rf_size, E=vcfg.embed_dim, H=vcfg.rnn_dim,
                M=vcfg.mlp_dim, Q=vcfg.quantization,
                SPC=vcfg.steps_per_cond,
                temperature=self.vocoder_temperature, chunk_frames=VC,
                interpret=self.interpret, layer_norm=vcfg.layer_norm,
                emit_state=True)
            audio = mulaw_decode_jax(ids.T, vcfg.quantization)  # (B, F*hop)
            raw = raw_f.transpose(1, 0, 2)
            return (audio, raw, live, done,
                    split_state(dflat, L=model.L, H=model.H, K=model.K,
                                E=model.E, D=model.D),
                    split_vocoder_state(vflat, H=vcfg.rnn_dim,
                                        FS=vcfg.frame_size,
                                        RF=vcfg.rf_size,
                                        E=vcfg.embed_dim))

        if sharded:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P
            d = P("data")
            n_ds = 2 * model.L + 3  # (h, c) x L + kappa + w + x_last
            run = shard_map(
                run, mesh=mesh,
                in_specs=(P(), P(), d, d, d, (d,) * n_ds, (d,) * 4, d,
                          P()),
                out_specs=(d, d, d, d, (d,) * n_ds, (d,) * 4),
                check_vma=False)
        fn = jax.jit(run)
        self._cache[key] = fn
        return fn

    # ------------------------------------------------------------------
    def stream(self, text, text_mask, speaker=None, key=None,
               frame_chunk: int = 32,
               max_steps: Optional[int] = None) -> Iterator[StreamChunk]:
        """Yield StreamChunks until every row's window passes its text
        end (or max_steps frames). text (B, U) int32; text_mask (B, U).
        """
        import time

        from parrot_tpu.ops.fused_decode import flatten_state
        from parrot_tpu.ops.fused_vocoder import make_vocoder_init

        t0 = time.time()
        text = jnp.asarray(text)
        text_mask = jnp.asarray(text_mask, jnp.float32)
        B, U = text.shape
        if self.mesh is not None and B % self.mesh.devices.size:
            # streams are long-lived; silently padding rows would burn a
            # chip slot for the whole stream — make the caller batch
            raise ValueError(
                f"sharded streaming needs batch {B} divisible by the "
                f"mesh size {self.mesh.devices.size}")
        F = int(frame_chunk)
        if speaker is None:
            speaker = jnp.zeros((B,), jnp.int32)
        else:
            speaker = jnp.asarray(speaker, jnp.int32)
        if key is None:
            key = jax.random.PRNGKey(self.cfg.seed)
        cap = max_steps if max_steps is not None else self.cfg.max_steps

        # cached like _chunk_fn: a fresh jit wrapper per call would
        # re-trace the encoder inside the timed first chunk
        if not hasattr(self, "_prep"):
            self._prep = jax.jit(
                lambda params, text, text_mask: self.model.encode(
                    params, text, text_mask))
        enc = self._prep(self.params, text, text_mask)
        dstate = flatten_state(self.model.init_state(B, U))
        vstate = make_vocoder_init(self.vparams,
                                   self.vmodel.init_state(B),
                                   self.vmodel.RF, self.vmodel.E)
        fn = self._chunk_fn(B, U, F)

        steps = 0
        hop = self.vmodel.cfg.hop
        prev_done = jnp.zeros((B,), bool)
        while steps < cap:
            key, sub = jax.random.split(key)
            # (2,): independent reader / vocoder seeds (see _chunk_fn)
            seed = jax.random.randint(sub, (2,), 0, 2**31 - 1,
                                      dtype=jnp.int32)
            audio, raw, live, done, dstate, vstate = fn(
                self.params, self.vparams, enc, text_mask, speaker,
                dstate, vstate, prev_done, seed)
            prev_done = done
            audio = np.asarray(audio)  # host sync: the chunk is ready
            raw, live = np.asarray(raw), np.asarray(live)
            keep = min(F, cap - steps)  # honor max_steps exactly
            yield StreamChunk(audio=audio[:, :keep * hop],
                              frames=raw[:, :keep], live=live[:, :keep],
                              done=np.asarray(done),
                              ttfa_ms=(time.time() - t0) * 1e3)
            steps += keep
            if bool(np.all(np.asarray(done))):
                return
