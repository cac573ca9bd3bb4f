"""SampleRNN-style neural vocoder: conditioning frames -> mu-law audio.

Char2Wav = the attention RNN (models/parrot.py) + a SampleRNN neural
vocoder driven by its vocoder-feature frames. The reference treats the
vocoder as an external Theano/CUDA repo reached through the
conditioning-feature hook (SURVEY.md §2.3 N3, BASELINE.json:11
"SampleRNN-vocoder hook"); this module implements the vocoder itself,
TPU-first:

  frame tier (lax.scan, one fused-gate LSTM step per `frame_size`
  samples): input = previous frame's samples + the conditioning
  feature frame (normalized on device), so the scan runs at 1/16th of
  sample rate and every gate projection is one hoisted GEMM;

  upsampler: one (T_f*B, H) x (H, frame_size*mlp_dim) GEMM emits a
  distinct conditioning vector for every sample position in the frame
  (the per-position linear projections of hierarchical sample models,
  fused into a single MXU-shaped matmul);

  sample MLP: embeddings of the `rf_size` previous mu-law samples
  (teacher-forced: built by shifting the embedded segment, no gathers)
  + the per-sample upsampled vector -> 2-layer ReLU MLP -> Q-way
  softmax. Training therefore contains NO per-sample recurrence: the
  only scan is at frame rate, everything else is (B*T)-row GEMMs.

TBPTT state (frame-tier LSTM state + previous frame + previous rf
samples) is carried across segments exactly, mirroring the Parrot
model's segment semantics so the same stream machinery drives both.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from parrot_tpu.config import SampleRNNConfig
from parrot_tpu.nn.core import Linear, Embedding, _cast
from parrot_tpu.nn.recurrent import LSTMCell, lstm_scan
from parrot_tpu.vocoder.mulaw import mulaw_decode_jax


class SampleRNNState(NamedTuple):
    """Carried TBPTT state for one utterance batch."""

    h: jnp.ndarray        # (B, H) frame-tier LSTM hidden
    c: jnp.ndarray        # (B, H) frame-tier LSTM cell
    prev: jnp.ndarray     # (B, frame_size) previous frame's float samples
    prev_q: jnp.ndarray   # (B, rf_size) previous mu-law ids, OLDEST first


class VocoderBatch(NamedTuple):
    """One training segment (audio aligned to conditioning frames)."""

    audio: jnp.ndarray      # (B, T) int32 mu-law ids, T = Sc * hop
    cond: jnp.ndarray       # (B, Sc, D) RAW conditioning feature frames
    cond_mask: jnp.ndarray  # (B, Sc) 1.0 for valid conditioning frames
    start_flag: jnp.ndarray  # scalar: 1.0 at the start of an utterance batch
    speaker: Optional[jnp.ndarray] = None  # (B,) int32 (use_speaker models)


class SampleRNN:
    """Static structure; parameters and state are explicit pytrees."""

    def __init__(self, cfg: SampleRNNConfig):
        self.cfg = cfg
        self.FS = cfg.frame_size
        self.RF = cfg.rf_size
        self.Q = cfg.quantization
        self.H = cfg.rnn_dim
        self.E = cfg.embed_dim
        self.M = cfg.mlp_dim
        self.D = cfg.cond_dim

    @property
    def zero_id(self) -> int:
        """mu-law id of silence (enc(0))."""
        return self.Q // 2

    def init_params(self, key) -> Dict[str, Any]:
        cfg = self.cfg
        keys = jax.random.split(key, 7)
        sd = cfg.speaker_dim if cfg.use_speaker else 0
        p = {
            "tier": LSTMCell.init(keys[0], self.FS + self.D + sd, self.H,
                                  layer_norm=cfg.layer_norm),
            "up": Linear.init(keys[1], self.H, self.FS * self.M),
            "embed": Embedding.init(keys[2], self.Q, self.E),
            "mlp1": Linear.init(keys[3], self.RF * self.E, self.M),
            "mlp2": Linear.init(keys[4], self.M, self.M),
            "head": Linear.init(keys[5], self.M, self.Q),
        }
        if cfg.use_speaker:
            p["spk"] = Embedding.init(keys[6], cfg.num_speakers, sd)
        return p

    def init_state(self, batch_size: int) -> SampleRNNState:
        return SampleRNNState(
            h=jnp.zeros((batch_size, self.H), jnp.float32),
            c=jnp.zeros((batch_size, self.H), jnp.float32),
            prev=jnp.zeros((batch_size, self.FS), jnp.float32),
            prev_q=jnp.full((batch_size, self.RF), self.zero_id, jnp.int32),
        )

    # ------------------------------------------------------------------
    def _window_embed(self, params, q, prev_q):
        """Teacher-forced previous-sample windows, built by shifting.

        q: (B, T) ids; prev_q: (B, RF) ids OLDEST first. Returns
        (B, T, RF*E) where slot k (E wide) holds emb(q_{t-1-k}) — most
        recent first.
        """
        B, T = q.shape
        emb_prev = Embedding.apply(params["embed"], prev_q)   # (B, RF, E)
        emb_q = Embedding.apply(params["embed"], q)           # (B, T, E)
        full = jnp.concatenate([emb_prev, emb_q], axis=1)     # (B, RF+T, E)
        slots = [full[:, self.RF - k:self.RF - k + T] for k in
                 range(1, self.RF + 1)]
        return jnp.concatenate(slots, axis=-1)                # (B, T, RF*E)

    def _speaker_vec(self, params, speaker, batch_size):
        """(B, speaker_dim) embedding, or None when unconditioned."""
        if not self.cfg.use_speaker:
            return None
        if speaker is None:
            speaker = jnp.zeros((batch_size,), jnp.int32)
        return Embedding.apply(params["spk"], speaker)        # (B, sd)

    def _frame_tier(self, params, norm, x_frames_prev, cond, cond_mask,
                    state: SampleRNNState, spk=None):
        """Run the frame-tier LSTM. x_frames_prev: (B, T_f, FS) previous
        frame per step; cond: (B, Sc, D) raw; spk: (B, sd) or None.
        Returns (up (B, T, M), (h, c) final, mask_f (B, T_f))."""
        cfg = self.cfg
        dt = cfg.compute_dtype
        spc = cfg.steps_per_cond
        B, T_f, _ = x_frames_prev.shape
        cond_n = (cond - norm["mean"]) / norm["std"]          # (B, Sc, D)
        cond_up = jnp.repeat(cond_n, spc, axis=1)             # (B, T_f, D)
        mask_f = jnp.repeat(cond_mask, spc, axis=1)           # (B, T_f)
        parts = [x_frames_prev, cond_up.astype(jnp.float32)]
        if spk is not None:
            parts.append(jnp.broadcast_to(spk[:, None, :],
                                          (B, T_f, spk.shape[-1])))
        tier_in = jnp.concatenate(parts, axis=-1)
        hs, (h, c) = lstm_scan(params["tier"], tier_in.transpose(1, 0, 2),
                               (state.h, state.c), mask_f.T,
                               compute_dtype=dt)              # (T_f, B, H)
        up = Linear.apply(params["up"], hs, dt)               # (T_f,B,FS*M)
        up = up.reshape(T_f, B, self.FS, self.M)
        up = up.transpose(1, 0, 2, 3).reshape(B, T_f * self.FS, self.M)
        return up, (h, c), mask_f

    def _sample_logits(self, params, win_emb, up):
        """win_emb: (..., RF*E), up: (..., M) -> logits (..., Q)."""
        dt = self.cfg.compute_dtype
        a = jax.nn.relu(Linear.apply(params["mlp1"], win_emb, dt) + up)
        a = jax.nn.relu(Linear.apply(params["mlp2"], a, dt))
        return Linear.apply(params["head"], a, dt)

    # ------------------------------------------------------------------
    def compute_cost(self, params, norm, batch: VocoderBatch,
                     state: Optional[SampleRNNState]
                     ) -> Tuple[jnp.ndarray, SampleRNNState, Dict]:
        """Teacher-forced segment NLL (nats per sample).

        norm: dict(mean (D,), std (D,)) for the conditioning features.
        Returns (scalar loss, new_state, metrics).
        """
        cfg = self.cfg
        B, T = batch.audio.shape
        Sc = batch.cond.shape[1]
        assert T == Sc * cfg.hop, (T, Sc, cfg.hop)
        T_f = T // self.FS
        if state is None:
            state = self.init_state(B)
        start = batch.start_flag
        state = SampleRNNState(
            h=(1.0 - start) * state.h,
            c=(1.0 - start) * state.c,
            prev=(1.0 - start) * state.prev,
            prev_q=jnp.where(start > 0,
                             jnp.full_like(state.prev_q, self.zero_id),
                             state.prev_q),
        )

        q = batch.audio
        x = mulaw_decode_jax(q, self.Q)                       # (B, T)
        frames = x.reshape(B, T_f, self.FS)
        frames_prev = jnp.concatenate(
            [state.prev[:, None, :], frames[:, :-1]], axis=1)
        spk = self._speaker_vec(params, batch.speaker, B)
        up, (h, c), mask_f = self._frame_tier(
            params, norm, frames_prev, batch.cond, batch.cond_mask, state,
            spk=spk)

        win = self._window_embed(params, q, state.prev_q)     # (B, T, RF*E)
        logits = self._sample_logits(params, win, up)         # (B, T, Q)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, q[..., None], axis=-1)[..., 0]
        mask_s = jnp.repeat(batch.cond_mask, cfg.hop, axis=1)  # (B, T)
        denom = jnp.maximum(mask_s.sum(), 1.0)
        loss = (nll * mask_s).sum() / denom

        # exact carry: last VALID frame / samples per row (padded tails
        # must not poison the next segment's context)
        n_valid_f = mask_f.sum(axis=1).astype(jnp.int32)      # (B,)
        idx_f = jnp.maximum(n_valid_f - 1, 0)
        last_frame = jnp.take_along_axis(
            frames, idx_f[:, None, None], axis=1)[:, 0]       # (B, FS)
        prev = jnp.where((n_valid_f > 0)[:, None], last_frame, state.prev)
        n_valid_s = n_valid_f * self.FS
        idx_s = jnp.maximum(
            n_valid_s[:, None] - self.RF + jnp.arange(self.RF)[None, :], 0)
        last_q = jnp.take_along_axis(q, idx_s, axis=1)        # (B, RF)
        prev_q = jnp.where((n_valid_s > 0)[:, None], last_q, state.prev_q)

        new_state = SampleRNNState(h=h, c=c, prev=prev, prev_q=prev_q)
        bits = loss / jnp.log(2.0)
        return loss, new_state, {"loss": loss, "bits_per_sample": bits,
                                 "samples": mask_s.sum()}

    # ------------------------------------------------------------------
    def generate(self, params, norm, cond, cond_mask, key,
                 temperature: float = 1.0,
                 state: Optional[SampleRNNState] = None, speaker=None):
        """Autoregressive sampling. cond: (B, Sc, D) RAW frames;
        speaker: (B,) int32 ids for use_speaker models.

        temperature <= 0 means greedy argmax. Returns (q (B, T) int32,
        audio (B, T) float32 in [-1, 1], final state). Masked frames
        emit silence.
        """
        cfg = self.cfg
        dt = cfg.compute_dtype
        spc = cfg.steps_per_cond
        B, Sc, _ = cond.shape
        T_f = Sc * spc
        if state is None:
            state = self.init_state(B)

        cond_n = (cond - norm["mean"]) / norm["std"]
        cond_up = jnp.repeat(cond_n.astype(jnp.float32), spc, axis=1)
        spk = self._speaker_vec(params, speaker, B)
        if spk is not None:
            # fold the per-row speaker vector into the conditioning the
            # frame tier sees (same concat order as training)
            cond_up = jnp.concatenate(
                [cond_up, jnp.broadcast_to(spk[:, None, :],
                                           (B, T_f, spk.shape[-1]))], -1)
        mask_f = jnp.repeat(cond_mask, spc, axis=1)           # (B, T_f)
        greedy = temperature <= 0.0
        inv_temp = 0.0 if greedy else 1.0 / float(temperature)

        def sample_one(carry, up_j_pos):
            prev_q, k = carry
            k, sub = jax.random.split(k)
            emb = Embedding.apply(params["embed"], prev_q)    # (B, RF, E)
            win = emb[:, ::-1].reshape(B, self.RF * self.E)
            logits = self._sample_logits(params, win, up_j_pos)
            if greedy:
                s = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            else:
                s = jax.random.categorical(
                    sub, logits * inv_temp, axis=-1).astype(jnp.int32)
            prev_q = jnp.concatenate([prev_q[:, 1:], s[:, None]], axis=1)
            return (prev_q, k), s

        def frame_step(carry, t_in):
            h, c, prev, prev_q, k = carry
            cond_j, m = t_in                                  # (B, D), (B,)
            tier_in = jnp.concatenate([prev, cond_j], axis=-1)
            h2, c2 = LSTMCell.step(params["tier"], (h, c), x=tier_in,
                                   compute_dtype=dt)
            m1 = m[:, None]
            h2 = m1 * h2 + (1 - m1) * h
            c2 = m1 * c2 + (1 - m1) * c
            up_j = Linear.apply(params["up"], h2, dt)
            up_j = up_j.reshape(B, self.FS, self.M).transpose(1, 0, 2)
            (prev_q2, k), s_frame = jax.lax.scan(
                sample_one, (prev_q, k), up_j)                # (FS, B)
            s_frame = s_frame.T                               # (B, FS)
            s_frame = jnp.where(
                (m > 0)[:, None], s_frame,
                jnp.full_like(s_frame, self.zero_id))
            prev_q2 = jnp.where((m > 0)[:, None], prev_q2, prev_q)
            x_frame = mulaw_decode_jax(s_frame, self.Q)
            prev2 = jnp.where((m > 0)[:, None], x_frame, prev)
            return (h2, c2, prev2, prev_q2, k), s_frame

        init = (state.h, state.c, state.prev, state.prev_q, key)
        (h, c, prev, prev_q, _), qs = jax.lax.scan(
            frame_step, init,
            (cond_up.transpose(1, 0, 2), mask_f.T))           # (T_f, B, FS)
        q = qs.transpose(1, 0, 2).reshape(B, T_f * self.FS)
        audio = mulaw_decode_jax(q, self.Q)
        return q, audio, SampleRNNState(h=h, c=c, prev=prev, prev_q=prev_q)

    # ------------------------------------------------------------------
    def generate_fused(self, params, norm, cond, cond_mask, seed,
                       temperature: float = 1.0, chunk_frames: int = 16,
                       weight_dtype=None, interpret: bool = False,
                       state: Optional[SampleRNNState] = None, mesh=None,
                       speaker=None):
        """Fused-kernel generation (ops/fused_vocoder.py): the whole
        waveform in one pallas_call, weights VMEM-resident, in-kernel
        PRNG sampling. ~6x the plain path's throughput on a v5e
        (~995x vs ~156x realtime at B=256; docs/PERFORMANCE.md).

        Greedy (temperature <= 0) is bit-identical to `generate` with
        float32 weights — the parity test mode. Returns (q (B, T) int32,
        audio (B, T) float32). seed: int (per-shard offset applied when
        sharded, so rows sample independently).

        mesh: optional Mesh with a 'data' axis — batch rows split over
        chips, weights replicated, one independent kernel per chip
        (same multi-chip serving design as the parrot fused sampler:
        decode needs no cross-chip communication).
        """
        import jax.numpy as jnp  # noqa: F811 (kept local for clarity)
        from parrot_tpu.ops.fused_vocoder import (
            prepare_vocoder_params, make_vocoder_init, fused_vocoder_decode)

        cfg = self.cfg
        if weight_dtype is None:
            weight_dtype = jnp.bfloat16 if temperature > 0 else jnp.float32
        B, Sc, _ = cond.shape
        # Mosaic blocks need the chunk dim divisible by 8; pad the
        # conditioning up to a multiple of the chunk (masked frames emit
        # silence and are cropped below)
        C = max(8, (chunk_frames // 8) * 8)
        pad = (-Sc) % C
        n_dev = mesh.devices.size if mesh is not None else 1
        pad_b = (-B) % n_dev
        cond_n = (cond - norm["mean"]) / norm["std"]
        cond_n = jnp.pad(cond_n.astype(jnp.float32),
                         ((0, pad_b), (0, pad), (0, 0)))
        mask_p = jnp.pad(cond_mask.astype(jnp.float32),
                         ((0, pad_b), (0, pad)))
        if state is None:
            state = self.init_state(B)
        if pad_b:
            state = jax.tree.map(
                lambda z: jnp.concatenate(
                    [z, jnp.zeros((pad_b,) + z.shape[1:], z.dtype)]), state)
        if self.cfg.use_speaker and speaker is None:
            speaker = jnp.zeros((B,), jnp.int32)
        if speaker is not None:
            speaker = jnp.pad(jnp.asarray(speaker, jnp.int32), (0, pad_b))
        else:
            speaker = jnp.zeros((B + pad_b,), jnp.int32)  # placeholder arg

        sharded = mesh is not None and n_dev > 1

        num_chunks = (Sc + pad) // C

        def run(params, cond_t, mask_t, h, c, prev, prev_q, seed_arr, spk):
            if sharded:
                # stride by the chunk count: the kernel seeds its PRNG
                # with seed + chunk, so a per-shard offset of +1 would
                # make shard s chunk c and shard s+1 chunk c-1 draw
                # identical noise
                seed_arr = (seed_arr
                            + jax.lax.axis_index("data") * num_chunks)
            kp = prepare_vocoder_params(
                self, params, weight_dtype,
                speaker=spk if self.cfg.use_speaker else None)
            st = SampleRNNState(h=h, c=c, prev=prev, prev_q=prev_q)
            init = make_vocoder_init(params, st, self.RF, self.E)
            return fused_vocoder_decode(
                kp, cond_t, mask_t, init, seed_arr,
                T_c=Sc + pad, D=self.D, FS=self.FS, RF=self.RF, E=self.E,
                H=self.H, M=self.M, Q=self.Q, SPC=cfg.steps_per_cond,
                temperature=temperature, chunk_frames=C,
                interpret=interpret, layer_norm=cfg.layer_norm)

        if sharded:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P
            run = shard_map(
                run, mesh=mesh,
                in_specs=(P(), P(None, "data"), P(None, "data"),
                          P("data"), P("data"), P("data"), P("data"), P(),
                          P("data")),
                out_specs=P(None, "data"), check_vma=False)
        key = (Sc + pad, B + pad_b, temperature, C, interpret,
               str(weight_dtype), id(mesh))
        cache = getattr(self, "_fused_gen_cache", None)
        if cache is None:
            cache = self._fused_gen_cache = {}
        fn = cache.get(key)
        if fn is None:
            fn = cache[key] = jax.jit(run)
        ids = fn(params, cond_n.transpose(1, 0, 2), mask_p.T,
                 state.h, state.c, state.prev, state.prev_q,
                 jnp.full((1,), seed, jnp.int32), speaker)
        q = ids.T[:B, :Sc * cfg.hop]                           # (B, T)
        return q, mulaw_decode_jax(q, self.Q)

    # ------------------------------------------------------------------
    def generate_robust(self, params, norm, cond, cond_mask, seed,
                        temperature: float = 1.0, speaker=None, **fused_kw):
        """generate_fused with the serving fallback contract of
        sample.Sampler: permanent failures (VMEM overflow, Mosaic
        rejection, shape errors) disable the kernel for this model
        instance; transient runtime errors fall back for one call and
        retry next time (capped — utils/errors.py). Returns (q, audio).
        """
        import jax as _jax

        if not getattr(self, "_fused_broken", False):
            try:
                out = self.generate_fused(
                    params, norm, cond, cond_mask, seed,
                    temperature=temperature, speaker=speaker, **fused_kw)
                self._fused_fail_streak = 0
                return out
            except Exception as e:
                from parrot_tpu.utils.errors import (
                    fused_error_is_permanent, MAX_TRANSIENT_FAILURES)
                streak = getattr(self, "_fused_fail_streak", 0) + 1
                self._fused_fail_streak = streak
                permanent = (fused_error_is_permanent(e)
                             or streak >= MAX_TRANSIENT_FAILURES)
                if permanent:
                    self._fused_broken = True
                msg = str(e).replace("\n", " ")[:300]
                print(f"fused vocoder unavailable ({type(e).__name__}: "
                      f"{msg}); falling back to the plain sampler"
                      + ("" if permanent
                         else " (transient: will retry next call)"))
        fn = getattr(self, "_plain_gen", None)
        if fn is None:
            fn = self._plain_gen = _jax.jit(functools.partial(
                self.generate), static_argnames=("temperature",))
        q, audio, _ = fn(params, norm, cond, cond_mask,
                         _jax.random.PRNGKey(int(seed)),
                         temperature=temperature, speaker=speaker)
        return q, audio
