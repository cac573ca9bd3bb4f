"""The Parrot model: char/phoneme encoder -> Graves window attention ->
stacked frame-level LSTM decoder -> MSE/GMM emitter.

Functional rebuild of the reference's `Parrot` brick (reference model.py
`class Parrot`, `compute_cost`, sampling step — mount empty, per
SURVEY.md §0/§2.1/§3.3). Architecture per Graves 2013 §5 / Char2Wav:

  enc = BiLSTM(embed(text))                                  (B, U, E)
  per decoder step t (teacher forced x_{t-1}):
    h1 = LSTM_1([x_{t-1}, w_{t-1}, spk])
    w_t, kappa_t = GravesWindow(h1, kappa_{t-1}, enc)
    h_l = LSTM_l([x_{t-1}, w_t, h_{l-1}, spk])   l = 2..L
    readout_t = tanh(Linear([h_1..h_L, w_t]))
    emitter: GMM NLL / MSE on x_t

TPU-first structure (not a Theano translation):
  - the scan body contains ONLY recurrent math; the x/speaker slices of
    every layer's input projection are hoisted to big pre-scan GEMMs,
    and the readout + output head run as one (T*B) GEMM after the scan;
  - the encoder is recomputed in-graph every segment (gradients must
    reach it from every segment); its output also rides in the carry for
    the sampler's step-by-step use;
  - normalization of raw WORLD frames happens here, on device
    (BASELINE.json:5 "on-TPU normalization").
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from parrot_tpu.config import ModelConfig
from parrot_tpu.nn.core import Linear, Embedding, _cast, bf16_matmul
from parrot_tpu.nn.recurrent import LSTMCell, bidirectional_lstm
from parrot_tpu.nn.attention import GravesWindow
from parrot_tpu.nn.mdn import gmm_nll, gmm_sample, split_gmm_params, mse_cost


def _default_backend() -> str:
    """Indirection for resolve_pallas_scan's backend probe (tests pin
    the 'tpu' decision table without a chip by monkeypatching this)."""
    return jax.default_backend()


def resolve_pallas_scan(cfg: ModelConfig, per_device_batch: int,
                        backend: Optional[str] = None) -> bool:
    """ONE source of truth for "may this trace use the Pallas training
    kernels" (VERDICT r3 #1). The model itself never auto-decides: the
    entry points that know the mesh (Trainer, train_joint, perf scripts)
    resolve `pallas_scan=None` (AUTO) to a concrete bool with this
    function and construct the model with it, so a multi-device GSPMD
    jit can never trace a single-device pallas_call at the global batch
    (operand replication — the failure the shard_map step exists to
    avoid, train/loop.py).

    AUTO engages only on TPU backends when the PER-DEVICE batch is
    >= 64: below that the kernels' win is marginal while their Mosaic
    compiles add minutes to small jobs. Shape feasibility (VMEM fit,
    alignment) stays a per-call guard inside the model.
    """
    if cfg.pallas_scan is not None:
        return bool(cfg.pallas_scan)
    if backend is None:
        backend = _default_backend()
    return backend == "tpu" and per_device_batch >= 64


class DecoderState(NamedTuple):
    """Carried TBPTT state (one utterance batch)."""

    hs: Any            # tuple of (h, c) per decoder layer, each (B, H)
    kappa: jnp.ndarray  # (B, K) window positions
    w: jnp.ndarray      # (B, E) last attention context
    enc: jnp.ndarray    # (B, U, E) cached encoder states
    x_last: jnp.ndarray  # (B, D) last NORMALIZED frame (sampler feedback)


class Parrot:
    """Static model structure; all state lives in explicit pytrees."""

    def __init__(self, cfg: ModelConfig):
        self.cfg = cfg
        self.E = cfg.encoder_out_dim
        self.D = cfg.frame_size
        self.H = cfg.rnn_h_dim
        self.K = cfg.attention_mixtures
        self.L = cfg.decoder_layers
        self.S = cfg.speaker_dim if cfg.use_speaker else 0
        if cfg.which_cost == "GMM":
            self.head_dim = 2 * cfg.num_mixtures * self.D + cfg.num_mixtures
        elif cfg.which_cost == "MSE":
            self.head_dim = self.D
        else:
            raise ValueError(f"unknown which_cost: {cfg.which_cost}")

    # ---- layer input layouts (row slices of each cell's wx) ----
    # layer 1:   [x (D), w_prev (E), spk (S)]
    # layer l>1: [x (D), w_t (E), h_{l-1} (H), spk (S)]
    def _in_dim(self, layer: int) -> int:
        return self.D + self.E + (0 if layer == 0 else self.H) + self.S

    def init_params(self, key) -> Dict:
        cfg = self.cfg
        keys = jax.random.split(key, 8 + self.L)
        p: Dict[str, Any] = {
            "embed": Embedding.init(keys[0], cfg.vocab_size, cfg.embed_dim),
            "enc_fwd": [LSTMCell.init(
                jax.random.fold_in(keys[1], l),
                cfg.embed_dim if l == 0 else 2 * cfg.encoder_dim,
                cfg.encoder_dim, layer_norm=cfg.layer_norm)
                for l in range(cfg.encoder_layers)],
            "enc_bwd": [LSTMCell.init(
                jax.random.fold_in(keys[2], l),
                cfg.embed_dim if l == 0 else 2 * cfg.encoder_dim,
                cfg.encoder_dim, layer_norm=cfg.layer_norm)
                for l in range(cfg.encoder_layers)],
            "attn": GravesWindow.init(keys[3], self.H, self.K),
            "readout": Linear.init(
                keys[4], self.L * self.H + self.E, cfg.readouts_dim),
            "head": Linear.init(keys[5], cfg.readouts_dim, self.head_dim),
            "dec": [LSTMCell.init(keys[8 + l], self._in_dim(l), self.H,
                                  layer_norm=cfg.layer_norm)
                    for l in range(self.L)],
        }
        if cfg.use_speaker:
            p["speaker"] = Embedding.init(keys[6], cfg.num_speakers,
                                          cfg.speaker_dim)
        return p

    def inference_view(self) -> "Parrot":
        """The same model with the TRAINING Pallas kernels disabled —
        the view the inference entry points (Sampler, streaming) trace
        (VERDICT r3 #2). Since round 5 the fused train-scan's
        UNdifferentiated primal is already residual-free (the fwd-only
        kernel variant, ops/fused_train_scan.py), so this view is no
        longer about residual traffic — it remains for serving because
        (a) the Sampler's hot path is its own fused decode kernel and
        the lax.scan encode avoids a pair of extra Mosaic warm-up
        compiles, and (b) it is the reference path the fused kernels
        are parity-tested against.
        """
        if self.cfg.pallas_scan is False:
            return self
        import dataclasses
        return Parrot(dataclasses.replace(self.cfg, pallas_scan=False))

    # ------------------------------------------------------------------
    def encode(self, params, text, text_mask):
        """text: (B, U) int32 -> (B, U, E). Stacked BiLSTM encoder
        (cfg.encoder_layers levels; each level consumes the previous
        level's concatenated fwd/bwd states)."""
        cfg = self.cfg
        dt = cfg.compute_dtype
        x = Embedding.apply(params["embed"], text).transpose(1, 0, 2)
        mask_t = text_mask.T
        split = cfg.split_backward and not cfg.layer_norm
        use_pallas = False
        if split and cfg.pallas_scan is True:
            # run the encoder's per-direction LSTM passes as fused
            # Pallas kernels too (wh VMEM-resident; same alignment
            # guard shape as the decoder kernel). The model never
            # auto-decides — pallas_scan must be an explicit True,
            # resolved by the caller (resolve_pallas_scan); None is OFF
            # here so an unresolved config can never trace a
            # pallas_call into a multi-device GSPMD jit
            if jax.default_backend() == "tpu":
                use_pallas = (x.shape[1] % 8 == 0
                              and cfg.encoder_dim % 128 == 0)
            else:
                use_pallas = True  # interpreter (tests pin exactness)
        if split:
            from parrot_tpu.nn.recurrent import bidirectional_lstm_split
        for pf, pb in zip(params["enc_fwd"], params["enc_bwd"]):
            if split:
                x = bidirectional_lstm_split(
                    pf, pb, x, mask_t, compute_dtype=dt,
                    pallas=use_pallas,
                    residual_dtype=cfg.scan_residual_dtype,
                    interpret=jax.default_backend() != "tpu")
            else:
                x = bidirectional_lstm(pf, pb, x, mask_t,
                                       compute_dtype=dt)
        return x.transpose(1, 0, 2)                           # (B, U, E)

    def init_state(self, batch_size: int, text_len: int) -> DecoderState:
        z = lambda *s: jnp.zeros(s, jnp.float32)
        return DecoderState(
            hs=tuple((z(batch_size, self.H), z(batch_size, self.H))
                     for _ in range(self.L)),
            kappa=z(batch_size, self.K),
            w=z(batch_size, self.E),
            enc=z(batch_size, text_len, self.E),
            x_last=z(batch_size, self.D),
        )

    def _speaker_vec(self, params, speaker):
        if not self.cfg.use_speaker:
            return None
        return Embedding.apply(params["speaker"], speaker)     # (B, S)

    # ---- hoisted input projections -----------------------------------
    def _wx_slices(self, cell, layer: int):
        """Row blocks of wx for layer `layer`: (x, w, h_below, spk)."""
        D, E, H, S = self.D, self.E, self.H, self.S
        wx = cell["wx"]
        o = 0
        x_w = wx[o:o + D]; o += D
        w_w = wx[o:o + E]; o += E
        hb_w = None
        if layer > 0:
            hb_w = wx[o:o + H]; o += H
        s_w = wx[o:o + S] if S else None
        return x_w, w_w, hb_w, s_w

    def _hoist(self, params, x_in, spk):
        """Precompute x- and speaker- gate contributions for all layers.

        x_in: (T, B, D). Returns list per layer of (T, B, 4H) plus the
        per-layer (w_w, hb_w) matrices needed inside the scan.
        """
        dt = self.cfg.compute_dtype
        hoisted, scan_mats = [], []
        for l in range(self.L):
            cell = params["dec"][l]
            x_w, w_w, hb_w, s_w = self._wx_slices(cell, l)
            g = jnp.dot(_cast(x_in, dt), _cast(x_w, dt),
                        preferred_element_type=jnp.float32) + cell["b"]
            if spk is not None:
                g = g + jnp.dot(_cast(spk, dt), _cast(s_w, dt),
                                preferred_element_type=jnp.float32)
            hoisted.append(g)
            scan_mats.append((w_w, hb_w))
        return hoisted, scan_mats

    def _cell_step(self, cell, state, gates_pre):
        """LSTM step from pre-activation gates missing only h @ wh."""
        h, c = state
        dt = self.cfg.compute_dtype
        gates = gates_pre + jnp.dot(_cast(h, dt), _cast(cell["wh"], dt),
                                    preferred_element_type=jnp.float32)
        return self._cell_activations(cell, state, gates)

    def _cell_activations(self, cell, state, gates):
        """LSTM nonlinearity from FULLY-assembled gates (wh included)."""
        h, c = state
        if "ln_g" in cell:
            from parrot_tpu.nn.core import LayerNorm
            gates = LayerNorm.apply(cell["ln_g"], gates)
        H = self.H
        i = jax.nn.sigmoid(gates[..., :H])
        f = jax.nn.sigmoid(gates[..., H:2 * H])
        g = jnp.tanh(gates[..., 2 * H:3 * H])
        o = jax.nn.sigmoid(gates[..., 3 * H:])
        c_new = f * c + i * g
        if "ln_c" in cell:
            from parrot_tpu.nn.core import LayerNorm
            h_new = o * jnp.tanh(LayerNorm.apply(cell["ln_c"], c_new))
        else:
            h_new = o * jnp.tanh(c_new)
        return h_new, c_new

    # ------------------------------------------------------------------
    # ------------------------------------------------------------------
    def compute_cost(self, params, norm, batch, state: Optional[DecoderState],
                     rng=None, with_predictions: bool = False,
                     input_frames=None, prediction_key=None,
                     prediction_bias: float = 0.0
                     ) -> Tuple[jnp.ndarray, DecoderState, Dict]:
        """Teacher-forced segment cost.

        norm: dict(mean (D,), std (D,)) — applied on device here.
        batch: a data.Batch (features (B,S,D) RAW, masks, text, speaker,
        prev_frame RAW, start_flag scalar). state: carried DecoderState
        or None (fresh). Returns (scalar loss, new_state, metrics).

        with_predictions=True adds metrics["pred_frames"]: the model's
        differentiable per-step frame prediction in RAW feature space,
        (B, S, D) — the MSE head output, or the GMM mixture expectation
        sum_m softmax(pi)_m mu_m. This is the conditioning signal for
        Char2Wav joint fine-tuning (models/char2wav.py): gradients of a
        downstream neural-vocoder loss flow through it into every parrot
        parameter. With prediction_key set (GMM only), pred_frames is
        instead a biased DRAW from the per-step mixture
        (prediction_bias, the eval-time transform) — the scheduled-
        sampling pass-1 signal, matching free-running generation.

        input_frames (B, S, D) RAW: alternative frames to build the
        shifted teacher-forcing INPUT from; the cost target stays
        batch.features. This is how the Trainer's parallel scheduled
        sampling feeds the model its own pass-1 frames while the loss
        still scores ground truth (train/loop.py).
        """
        cfg = self.cfg
        B, S, D = batch.features.shape
        U = batch.text.shape[1]
        if state is None:
            state = self.init_state(B, U)

        # reset carried state where a new utterance batch starts
        start = batch.start_flag
        state = jax.tree.map(lambda z: (1.0 - start) * z, state)

        # encoder recomputed in-graph every segment (as the reference's
        # per-batch Theano graph does): gradients must flow into the
        # embedding/encoder from EVERY segment, not just utterance starts.
        # (A carried-state cache would make enc a constant w.r.t. params
        # on non-start segments and zero those gradients.)
        enc = self.encode(params, batch.text, batch.text_mask)
        state = state._replace(enc=enc)

        # on-device normalization
        xn = (batch.features - norm["mean"]) / norm["std"]    # (B, S, D)
        prev = (batch.prev_frame - norm["mean"]) / norm["std"]
        prev = (1.0 - start) * prev  # raw zeros at start != normalized zeros
        x_tgt = xn.transpose(1, 0, 2)                          # (T, B, D)
        if input_frames is not None:
            fin = (input_frames - norm["mean"]) / norm["std"]
            f_in = fin.transpose(1, 0, 2)                      # (T, B, D)
        else:
            f_in = x_tgt
        x_in = jnp.concatenate([prev[None], f_in[:-1]], axis=0)
        if cfg.feedback_noise_level > 0 and rng is not None:
            x_in = x_in + cfg.feedback_noise_level * jax.random.normal(
                rng, x_in.shape, x_in.dtype)
        mask = batch.features_mask.T                           # (T, B)

        # speaker folded into hoisted gates
        spk = self._speaker_vec(params, batch.speaker)
        raw, new_state, phis = self.scan_decoder(
            params, state, x_in, mask, batch.text_mask, spk)

        pred_n = None
        if cfg.which_cost == "GMM":
            def nll_fn(raw_, x_):
                mu_, ls_, pi_ = split_gmm_params(
                    raw_, D, cfg.num_mixtures, cfg.min_log_sigma)
                return gmm_nll(x_, mu_, ls_, pi_)              # (T, B)
            if cfg.remat_head:
                # recompute the (T, B, M, D) NLL intermediates in the
                # backward instead of saving them (perf knob,
                # docs/PERFORMANCE.md round 3)
                cost = jax.checkpoint(nll_fn)(raw, x_tgt)
            else:
                cost = nll_fn(raw, x_tgt)
            if with_predictions:
                mu, ls, pi = split_gmm_params(raw, D, cfg.num_mixtures,
                                              cfg.min_log_sigma)
                if prediction_key is not None:
                    # biased draw per (t, b) — gmm_sample operates on a
                    # flat batch of (M, D) mixtures
                    T_, B_ = mu.shape[0], mu.shape[1]
                    M_ = cfg.num_mixtures
                    flat = gmm_sample(
                        prediction_key,
                        mu.reshape(T_ * B_, M_, D),
                        ls.reshape(T_ * B_, M_, D),
                        pi.reshape(T_ * B_, M_),
                        bias=prediction_bias)
                    pred_n = flat.reshape(T_, B_, D)
                else:
                    w_m = jax.nn.softmax(pi, axis=-1)          # (T, B, M)
                    pred_n = jnp.einsum("tbm,tbmd->tbd", w_m, mu)
        else:
            cost = mse_cost(x_tgt, raw)
            if with_predictions:
                pred_n = raw
        denom = jnp.maximum(mask.sum(), 1.0)
        loss = (cost * mask).sum() / denom
        # carry the last VALID frame per row (segment tails can be padding;
        # rows with no valid frame keep their previous x_last)
        n_valid = mask.sum(axis=0)                             # (B,)
        last_idx = jnp.maximum(n_valid - 1, 0).astype(jnp.int32)
        last_valid = jnp.take_along_axis(
            x_tgt, last_idx[None, :, None], axis=0)[0]         # (B, D)
        x_last = jnp.where((n_valid > 0)[:, None], last_valid, state.x_last)
        new_state = new_state._replace(x_last=x_last)
        metrics = {"loss": loss, "frames": mask.sum()}
        if with_predictions:
            pred_raw = pred_n * norm["std"] + norm["mean"]     # (T, B, D)
            metrics["pred_frames"] = pred_raw.transpose(1, 0, 2)
        return loss, new_state, metrics

    def scan_plan(self, B: int, U: int):
        """Which implementation the decoder scan selects at data shapes
        (B, U): returns (use_pallas, n_split, label). Exactly the logic
        scan_decoder applies at trace time, exposed so perf tooling can
        report the selected path per shape (docs/PERFORMANCE.md round-4
        shape table). Labels: 'pallas' / 'pallas-splitN' (batch slabs) /
        'lax-split' (hand-VJP lax.scan) / 'autodiff-scan'.

        Feasibility: the pallas kernel holds the (B, U, E) encoder
        block plus ~26 MB of weights VMEM-resident — whether it fits
        depends on the data shapes (pallas_scan_fits estimates both
        passes; past B=256 or very long text it cannot). Batch-split:
        when the full B overflows the plan (e.g. B=512 flagship), the
        SAME kernel runs over n_split independent batch slabs — rows
        are independent through the whole scan, so results/gradients
        concatenate exactly; one compile (identical slab shapes)."""
        cfg = self.cfg
        if (not cfg.split_backward or cfg.layer_norm or cfg.stacked_scan
                or cfg.remat_scan):
            return False, 0, "autodiff-scan"
        res_dtype = (jnp.bfloat16 if cfg.scan_residual_dtype == "bfloat16"
                     else jnp.float32)
        from parrot_tpu.ops.fused_train_scan import pallas_scan_fits

        def fits(b):
            return (b % 8 == 0 and pallas_scan_fits(
                b, U, L=self.L, H=self.H, K=self.K, E=self.E,
                res_bytes=jnp.dtype(res_dtype).itemsize))

        n_split = 0
        if self.H % 128 == 0 and self.E % 128 == 0:
            for s in (1, 2, 4):
                if B % s == 0 and fits(B // s):
                    n_split = s
                    break
        # the model never auto-decides pallas (resolve_pallas_scan is
        # the single source of truth, applied by the caller); None is
        # OFF so an unresolved config cannot put a pallas_call inside a
        # multi-device GSPMD jit
        if jax.default_backend() == "tpu":
            use_pallas = cfg.pallas_scan is True and n_split > 0
        else:
            # non-TPU backends run the interpreter — only when
            # explicitly requested (tests pin exactness there)
            use_pallas = cfg.pallas_scan is True
            n_split = n_split or 1
        if not use_pallas:
            return False, 1, "lax-split"
        label = "pallas" if n_split == 1 else f"pallas-split{n_split}"
        return True, n_split, label

    def scan_decoder(self, params, state: DecoderState, x_in, mask,
                     text_mask, spk=None, with_intermediates: bool = False):
        """Run the decoder over a teacher-forced segment.

        x_in: (T, B, D) normalized teacher-forced inputs (frame t-1 at
        position t); mask: (T, B); spk: (B, S) speaker vectors or None
        (folded into the hoisted gate projections). Returns
        (raw head outputs (T, B, head_dim), new_state, phis (T, B, U)).
        with_intermediates=True appends a dict of named per-step
        activations (feats = [h_1..h_L, w_t] concat, readouts) for the
        checkpoint-parity diff harness (train/parity.py).
        """
        cfg = self.cfg
        dt = cfg.compute_dtype
        hoisted, scan_mats = self._hoist(params, x_in, spk)
        enc = state.enc
        if cfg.scan_enc_dtype == "bfloat16":
            # Stream the encoder block at bf16 through the scan: the
            # attention context re-reads all (B, U, E) of it every step
            # (and its cotangent accumulates per step in the backward) —
            # the barrier forces a materialized copy so the halved
            # traffic is real, not a fused cast of the f32 original.
            # state.enc itself stays f32 (sampler carry, readout w_t is
            # an f32 einsum output via preferred_element_type).
            enc = jax.lax.optimization_barrier(enc.astype(jnp.bfloat16))
        stacked = cfg.stacked_scan
        if (cfg.split_backward and not with_intermediates
                and not (cfg.layer_norm or stacked or cfg.remat_scan)):
            # hand-written VJP: reverse scan carries only the recurrent
            # cotangents; weight grads become post-hoc GEMMs
            # (models/scan_vjp.py; docs/PERFORMANCE.md round 3)
            res_dtype = (jnp.bfloat16
                         if cfg.scan_residual_dtype == "bfloat16"
                         else jnp.float32)
            B = x_in.shape[1]
            U = text_mask.shape[1]
            use_pallas, n_split, _ = self.scan_plan(B, U)
            from parrot_tpu.ops.fused_train_scan import (
                make_pallas_decoder_scan)
            if use_pallas:
                # fused Pallas fwd/bwd scan kernels: weights + enc block
                # VMEM-resident across all T steps
                # (ops/fused_train_scan.py)
                fn = make_pallas_decoder_scan(
                    self.L, self.H, self.K, self.E,
                    cfg.attention_alignment, residual_dtype=res_dtype,
                    interpret=jax.default_backend() != "tpu")
            else:
                from parrot_tpu.models.scan_vjp import make_decoder_scan
                fn = make_decoder_scan(
                    self.L, self.H, self.K, self.E,
                    cfg.attention_alignment, residual_dtype=res_dtype)
                n_split = 1
            layers_t = []
            for l in range(self.L):
                w_w, hb_w = scan_mats[l]
                layers_t.append((w_w, hb_w, params["dec"][l]["wh"]))
            params_t = (params["attn"]["proj"]["w"],
                        params["attn"]["proj"]["b"], tuple(layers_t))
            init = (state.hs, state.kappa, state.w)
            if n_split == 1:
                feats, phis, (hs, kappa, w) = fn(
                    params_t, tuple(hoisted), mask, enc, text_mask, init)
            else:
                outs = []
                bs = B // n_split
                for i in range(n_split):
                    sl = slice(i * bs, (i + 1) * bs)
                    outs.append(fn(
                        params_t,
                        tuple(g[:, sl] for g in hoisted),
                        mask[:, sl], enc[sl], text_mask[sl],
                        jax.tree.map(lambda z: z[sl], init)))
                feats = jnp.concatenate([o[0] for o in outs], axis=1)
                phis = jnp.concatenate([o[1] for o in outs], axis=1)
                hs, kappa, w = jax.tree.map(
                    lambda *xs: jnp.concatenate(xs, axis=0),
                    *[o[2] for o in outs])
            if cfg.head_dtype == "bfloat16":
                # epilogue GEMMs are MXU-compute-bound at f32; run all
                # six (readout/head x fwd/dX/dW) at bf16 operands with
                # f32 accumulation (nn.core.bf16_matmul custom_vjp —
                # plain autodiff would promote the transpose GEMMs
                # back to f32). Bias adds + tanh + NLL stay f32.
                readouts = jnp.tanh(
                    bf16_matmul(feats, params["readout"]["w"])
                    + params["readout"]["b"])
                raw = (bf16_matmul(readouts, params["head"]["w"])
                       + params["head"]["b"])
            else:
                readouts = jnp.tanh(Linear.apply(params["readout"],
                                                 feats, dt))
                raw = Linear.apply(params["head"], readouts, dt)
            new_state = DecoderState(hs=hs, kappa=kappa, w=w,
                                     enc=state.enc, x_last=state.x_last)
            return raw, new_state, phis
        if cfg.scan_weight_dtype == "bfloat16":
            # Materialize bf16 copies of every scan-resident weight
            # matrix OUTSIDE the scan. The optimization_barrier stops
            # XLA from re-fusing the cast into the per-step matmuls
            # (which would stream the f32 originals each timestep —
            # exactly what made compute_dtype=bfloat16 traffic-neutral,
            # docs/PERFORMANCE.md). The scan then reads 2 bytes/elem of
            # weights per step; matmul outputs stay f32
            # (preferred_element_type). Note the flip side: the
            # cotangent of a bf16 loop invariant accumulates in bf16
            # across the scan's backward, so dec-weight grads round to
            # bf16 per-step sums under this mode.
            prep = lambda a: jax.lax.optimization_barrier(
                a.astype(jnp.bfloat16))
        else:
            prep = lambda a: _cast(a, dt)
        if stacked:
            # one (B, E[+H]+H) x (E[+H]+H, 4H) GEMM per layer instead of
            # 2-3 separate dots: stack [w_w; (hb_w;) wh] row blocks once
            # outside the scan and concat the activations inside
            stack_mats = []
            for l in range(self.L):
                w_w, hb_w = scan_mats[l]
                blocks = [w_w] + ([hb_w] if hb_w is not None else [])
                stack_mats.append(prep(jnp.concatenate(
                    blocks + [params["dec"][l]["wh"]], axis=0)))
        else:
            prep_mats = [(prep(w_w),
                          prep(hb_w) if hb_w is not None else None)
                         for w_w, hb_w in scan_mats]
            prep_wh = [prep(params["dec"][l]["wh"])
                       for l in range(self.L)]

        def body(carry, t_in):
            hs, kappa, w = carry
            gates_x, m = t_in[:-1], t_in[-1]
            m = m[:, None]
            new_hs = []
            if stacked:
                in0 = jnp.concatenate([_cast(w, dt), _cast(hs[0][0], dt)], -1)
                g0 = gates_x[0] + jnp.dot(
                    in0, stack_mats[0], preferred_element_type=jnp.float32)
                h1, c1 = self._cell_activations(params["dec"][0], hs[0], g0)
            else:
                w_w0, _ = prep_mats[0]
                g0 = (gates_x[0]
                      + jnp.dot(_cast(w, dt), w_w0,
                                preferred_element_type=jnp.float32)
                      + jnp.dot(_cast(hs[0][0], dt), prep_wh[0],
                                preferred_element_type=jnp.float32))
                h1, c1 = self._cell_activations(params["dec"][0], hs[0],
                                                g0)
            h1 = m * h1 + (1 - m) * hs[0][0]
            c1 = m * c1 + (1 - m) * hs[0][1]
            new_hs.append((h1, c1))
            w_t, kappa_new, phi = GravesWindow.step(
                params["attn"], h1, kappa, enc, text_mask,
                alignment=cfg.attention_alignment, compute_dtype=dt)
            kappa_new = m * kappa_new + (1 - m) * kappa
            w_t = m * w_t + (1 - m) * w
            h_below = h1
            for l in range(1, self.L):
                if stacked:
                    inl = jnp.concatenate([_cast(w_t, dt),
                                           _cast(h_below, dt),
                                           _cast(hs[l][0], dt)], -1)
                    gl = gates_x[l] + jnp.dot(
                        inl, stack_mats[l],
                        preferred_element_type=jnp.float32)
                    hl, cl = self._cell_activations(params["dec"][l],
                                                    hs[l], gl)
                else:
                    w_wl, hb_wl = prep_mats[l]
                    gl = (gates_x[l]
                          + jnp.dot(_cast(w_t, dt), w_wl,
                                    preferred_element_type=jnp.float32)
                          + jnp.dot(_cast(h_below, dt), hb_wl,
                                    preferred_element_type=jnp.float32)
                          + jnp.dot(_cast(hs[l][0], dt), prep_wh[l],
                                    preferred_element_type=jnp.float32))
                    hl, cl = self._cell_activations(params["dec"][l],
                                                    hs[l], gl)
                hl = m * hl + (1 - m) * hs[l][0]
                cl = m * cl + (1 - m) * hs[l][1]
                new_hs.append((hl, cl))
                h_below = hl
            out = (jnp.concatenate([h for h, _ in new_hs] + [w_t], -1), phi)
            return (tuple(new_hs), kappa_new, w_t), out

        init = (state.hs, state.kappa, state.w)
        xs = tuple(hoisted) + (mask,)
        scan_body = jax.checkpoint(body) if cfg.remat_scan else body
        (hs, kappa, w), (feats, phis) = jax.lax.scan(
            scan_body, init, xs, unroll=cfg.scan_unroll)
        readouts = jnp.tanh(Linear.apply(params["readout"], feats, dt))
        raw = Linear.apply(params["head"], readouts, dt)
        new_state = DecoderState(hs=hs, kappa=kappa, w=w, enc=state.enc,
                                 x_last=state.x_last)
        if with_intermediates:
            return raw, new_state, phis, {"feats": feats,
                                          "readouts": readouts}
        return raw, new_state, phis

    # ------------------------------------------------------------------
    def sample_step(self, params, state: DecoderState, text_mask, speaker,
                    key, bias=0.0):
        """One autoregressive generation step (normalized domain).

        Uses state.x_last as the fed-back frame. Returns (new_state,
        x (B, D) normalized sample, phi (B, U), raw head output).
        """
        cfg = self.cfg
        dt = cfg.compute_dtype
        x_prev = state.x_last
        spk = self._speaker_vec(params, speaker)

        def cat(parts):
            return jnp.concatenate([p for p in parts if p is not None], -1)

        # layer 1
        in1 = cat([x_prev, state.w, spk])
        h1, c1 = LSTMCell.step(params["dec"][0], state.hs[0], x=in1,
                               compute_dtype=dt)
        w_t, kappa, phi = GravesWindow.step(
            params["attn"], h1, state.kappa, state.enc, text_mask,
            alignment=cfg.attention_alignment, compute_dtype=dt)
        new_hs = [(h1, c1)]
        h_below = h1
        for l in range(1, self.L):
            inl = cat([x_prev, w_t, h_below, spk])
            hl, cl = LSTMCell.step(params["dec"][l], state.hs[l], x=inl,
                                   compute_dtype=dt)
            new_hs.append((hl, cl))
            h_below = hl
        feats = jnp.concatenate([h for h, _ in new_hs] + [w_t], -1)
        readouts = jnp.tanh(Linear.apply(params["readout"], feats, dt))
        raw = Linear.apply(params["head"], readouts, dt)
        if cfg.which_cost == "GMM":
            mu, ls, pi = split_gmm_params(raw, self.D, cfg.num_mixtures,
                                          cfg.min_log_sigma)
            x = gmm_sample(key, mu, ls, pi, bias=bias)
        else:
            x = raw
        new_state = DecoderState(hs=tuple(new_hs), kappa=kappa, w=w_t,
                                 enc=state.enc, x_last=x)
        return new_state, x, phi, raw
