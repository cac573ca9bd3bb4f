"""Frozen configuration dataclasses for parrot-tpu.

The reference (sotelo/parrot) configures everything through argparse flags
passed as constructor kwargs (SURVEY.md §5 "Config / flag system";
reference train.py/utils.py — mount empty, reconstructed). Here the same
surface is a single frozen dataclass tree with model / data / train /
sample sections; the CLIs in train.py / generate.py expose flags mirroring
the reference names (--model_name, --dataset, --which_cost, --use_speaker,
--sampling_bias, ...) and build one of these.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Parrot model hyperparameters.

    Mirrors the reference constructor kwargs (reference model.py
    `Parrot(...)` — reconstructed per SURVEY.md §2.1): `rnn_h_dim`,
    `readouts_dim`, `which_cost`, attention mixture count, MDN mixture
    count, speaker conditioning.
    """

    # --- io dims ---
    frame_size: int = 63          # WORLD feature vector dim per frame
    vocab_size: int = 55          # character/phoneme inventory (incl. pad=0)
    # --- encoder ---
    embed_dim: int = 256          # char/phoneme embedding size
    encoder_dim: int = 128        # per-direction BiLSTM hidden size
    encoder_layers: int = 1
    # --- decoder ---
    rnn_h_dim: int = 512          # decoder LSTM hidden size (reference rnn_h_dim)
    decoder_layers: int = 3       # stacked LSTMs (Graves-style)
    readouts_dim: int = 512       # readout projection size (reference readouts_dim)
    # --- attention (Graves GMM window; SURVEY.md §3.3) ---
    attention_mixtures: int = 10  # K Gaussians in the window
    attention_alignment: float = 1.0  # scale on the kappa increment (chars/step speed)
    # --- output head ---
    which_cost: str = "GMM"       # 'GMM' (mixture density) | 'MSE'
    num_mixtures: int = 20        # M mixture components of the MDN head
    min_log_sigma: float = -7.0   # lower clamp on MDN log-stddev (stability)
    # --- conditioning ---
    use_speaker: bool = False
    num_speakers: int = 1
    speaker_dim: int = 128
    # --- regularization / stability ---
    feedback_noise_level: float = 0.0  # gaussian noise on teacher-forced frames
    layer_norm: bool = False           # layer norm inside LSTM cells
    # --- numerics ---
    compute_dtype: str = "float32"     # 'float32' | 'bfloat16' matmul compute
    scan_unroll: int = 1               # lax.scan unroll factor for the
                                       # decoder scan (measured neutral-to-
                                       # slightly-negative on v5e at
                                       # flagship dims; exposed for other
                                       # topologies)
    stacked_scan: bool = False         # one stacked GEMM per decoder layer
                                       # in the scan body instead of 2-3
                                       # separate dots (measured perf knob)
    scan_weight_dtype: str = "float32"  # "bfloat16": materialized bf16
                                       # copies of the scan-resident
                                       # weight matrices (w_w/hb_w/wh),
                                       # streamed from HBM every step —
                                       # halves the dominant train-step
                                       # weight traffic; params stay f32
                                       # master. Grad accumulation for
                                       # these matrices then also runs
                                       # in bf16 (see PERFORMANCE.md)
    scan_enc_dtype: str = "float32"    # "bfloat16": stream the (B,U,E)
                                       # encoder block at bf16 through
                                       # the decoder scan (the attention
                                       # context re-reads it every step,
                                       # and its cotangent accumulates
                                       # per step) — halves that traffic
                                       # both ways; see PERFORMANCE.md
    scan_residual_dtype: str = "bfloat16"  # store the split-backward
                                       # scan's gate residuals at bf16
                                       # (halves the largest residual
                                       # stream; ~1e-3 relative grad
                                       # rounding; +16% measured step
                                       # throughput with split_backward
                                       # — docs/PERFORMANCE.md).
                                       # "float32" for bit-strict grads
    head_dtype: str = "float32"        # "bfloat16": run the post-scan
                                       # readout/head GEMMs (fwd AND the
                                       # two transpose GEMMs each in the
                                       # backward) with bf16 operands /
                                       # f32 accumulation. The epilogue
                                       # is MXU-COMPUTE-bound at f32
                                       # (~170 GFLOP per step at B=256:
                                       # (T*B,1792)@(1792,512) +
                                       # (T*B,512)@(512,2540) x3 for
                                       # fwd/dX/dW) — bf16 runs them at
                                       # ~4x the f32 MXU rate on v5e.
                                       # ~1e-2 relative grad rounding,
                                       # same envelope as
                                       # scan_weight_dtype (measured:
                                       # docs/PERFORMANCE.md round 4).
                                       # Applies to the split-backward
                                       # hoisted epilogue only (the
                                       # per-step paths follow
                                       # compute_dtype)
    remat_head: bool = False           # recompute the GMM NLL (and its
                                       # (T,B,M,D) intermediates) in the
                                       # backward instead of saving them
                                       # (jax.checkpoint on the head
                                       # cost; trades elementwise
                                       # recompute for residual traffic)
    split_backward: bool = True        # hand-written decoder-scan +
                                       # encoder VJPs: the reverse scan
                                       # carries only the recurrent
                                       # cotangents; all weight grads +
                                       # the encoder cotangent become
                                       # post-hoc (T*B)-row GEMMs
                                       # (scan_vjp.py; +11.5% measured
                                       # step time). Auto-falls back for
                                       # layer_norm / stacked_scan /
                                       # remat_scan / parity probes
    pallas_scan: Optional[bool] = None  # run the split-backward decoder
                                       # scan AND the encoder BiLSTM
                                       # passes as fused Pallas fwd/bwd
                                       # kernels (ops/fused_train_scan):
                                       # weights + encoder block stay
                                       # VMEM-resident across all T
                                       # steps instead of re-read from
                                       # HBM per step (+62% measured
                                       # step throughput at B=256).
                                       # None = AUTO: on for TPU when
                                       # batch >= 64 and the shapes fit
                                       # VMEM (below that the Mosaic
                                       # compile cost outweighs the
                                       # win), off on other backends.
                                       # True forces it (interpreter on
                                       # non-TPU — tests only); False
                                       # disables.
                                       # Requires split_backward and
                                       # the same guards
    remat_scan: bool = False           # rematerialize the decoder scan body
                                       # (O(1) activation memory per step,
                                       # recompute in backward; for long
                                       # TBPTT segments)

    @property
    def encoder_out_dim(self) -> int:
        return 2 * self.encoder_dim


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Data pipeline configuration (reference datasets.py semantics)."""

    dataset: str = "blizzard"     # corpus name: 'blizzard' | 'vctk' | path to hdf5
    data_dir: str = "data"
    batch_size: int = 32
    seq_size: int = 50            # TBPTT segment length in frames (reference seq_size)
    sort_pool_size: int = 20      # batches per sort-by-length pool (bucketing)
    max_text_len: int = 256       # pad/truncate text ids to this length
    normalize: bool = True        # apply global mean/std (on device)
    norm_stats: str = ""          # optional .npz with mean/std overriding
                                  # the corpus-embedded stats (the
                                  # reference's Fuel streams took stats
                                  # from standalone .npz files)
    prefetch: int = 2             # device prefetch depth (double buffering)
    cache_mb: int = 512           # preload features into RAM if they fit
    shuffle_seed: int = 0


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training loop configuration (reference train.py GradientDescent setup)."""

    model_name: str = "baseline"
    save_dir: str = "saved_models"
    learning_rate: float = 1e-3   # Adam
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    grad_clip: float = 10.0       # global-norm step clipping (Blocks StepClipping)
    lr_schedule: str = "constant" # 'constant' | 'exponential'
    lr_decay_rate: float = 0.98
    lr_decay_steps: int = 10000
    warmup_steps: int = 0         # linear LR warmup from 0 over this many
                                  # steps (0 = off). Fine-tuning from a
                                  # converged checkpoint with FRESH Adam
                                  # moments takes oversized early steps
                                  # (vhat is built from a handful of
                                  # samples); warmup bounds them.
    num_steps: int = 100000       # FinishAfter
    save_every: int = 1000        # Checkpoint cadence (steps)
    eval_every: int = 500         # DataStreamMonitoring cadence (steps)
    log_every: int = 50           # Printing cadence (steps)
    keep_checkpoints: int = 3
    track_best: bool = True       # TrackTheBest on valid cost
    early_stop_patience: int = 0  # 0 = disabled; else evals without improvement
    seed: int = 1234
    num_devices: int = 0          # 0 = all visible devices (DP mesh size)
    profile_steps: Tuple[int, int] = (0, 0)  # (start, stop) jax.profiler window; (0,0)=off
    debug_nans: bool = False      # jax_debug_nans: fail fast on NaN (slow)
    plot_alignments: bool = False  # dump attention-alignment pngs at eval
    tensorboard: bool = False     # mirror metrics to TensorBoard
    # Scheduled sampling (exposure-bias fine-tuning; absent in the
    # reference, whose only mitigation is feedback noise). Implemented
    # the TPU-parallel way (two-pass "parallel scheduled sampling"
    # rather than a sequential sample-dependent scan): pass 1 runs the
    # teacher-forced forward and emits the model's own per-step frames
    # (stop-gradient), pass 2 trains with each input frame replaced by
    # the model's frame with probability `rate`. Inputs stay fixed
    # within the differentiated pass, so the fused Pallas train kernels
    # and hoisted GEMMs still apply.
    scheduled_sampling_rate: float = 0.0   # p(input <- model's own frame)
    scheduled_sampling_mode: str = "sample"  # 'sample' (draw from the GMM)
                                             # | 'mean' (mixture expectation)
    scheduled_sampling_bias: float = 1.0   # GMM bias for 'sample' mode
                                           # (match the eval-time bias)


@dataclasses.dataclass(frozen=True)
class SampleConfig:
    """Generation configuration (reference generate.py semantics)."""

    sampling_bias: float = 0.0    # MDN bias b: sigma*=exp(-b), pi logits *=(1+b)
    max_steps: int = 2048         # hard cap on generated frames
    stop_threshold: float = 0.5   # attention-mass-past-end threshold for stopping
    batch_size: int = 16
    use_fused_kernel: bool = True # Pallas fused decode step when on TPU
    fused_weight_dtype: str = "bfloat16"  # serving precision for the fused
                                          # kernel ('float32' disables the
                                          # bf16 weight quantization)
    seed: int = 0


@dataclasses.dataclass(frozen=True)
class SampleRNNConfig:
    """SampleRNN-style neural vocoder (Char2Wav's second half).

    The reference consumes an external SampleRNN repo through the
    conditioning-feature hook (SURVEY.md §2.3 N3, BASELINE.json:11);
    here the vocoder itself is native: a frame-tier LSTM over
    `frame_size`-sample frames conditioned on the attention RNN's
    vocoder-feature frames, driving a per-sample MLP with a
    `quantization`-way softmax over mu-law audio.
    """

    frame_size: int = 16          # audio samples per frame-tier step
    rf_size: int = 4              # sample-MLP receptive field (prev samples)
    quantization: int = 256       # mu-law levels (8-bit)
    rnn_dim: int = 512            # frame-tier LSTM hidden size
    embed_dim: int = 32           # per-sample embedding for the MLP
    mlp_dim: int = 512            # sample-MLP hidden size
    cond_dim: int = 63            # conditioning feature dim (vocoder frames)
    sample_rate: int = 16000
    frame_period_ms: float = 5.0  # conditioning frame hop (WORLD default)
    layer_norm: bool = False
    compute_dtype: str = "float32"
    # --- speaker conditioning (Char2Wav trains speaker-conditioned
    # vocoders for multi-speaker corpora; embedding feeds the frame
    # tier, so every sample is conditioned through the upsampler) ---
    use_speaker: bool = False
    num_speakers: int = 1
    speaker_dim: int = 16

    @property
    def hop(self) -> int:
        """Audio samples per conditioning frame."""
        return int(self.sample_rate * self.frame_period_ms / 1000.0 + 0.5)

    @property
    def steps_per_cond(self) -> int:
        """Frame-tier steps per conditioning frame (hop / frame_size)."""
        assert self.hop % self.frame_size == 0, \
            f"hop {self.hop} not divisible by frame_size {self.frame_size}"
        return self.hop // self.frame_size


@dataclasses.dataclass(frozen=True)
class ParrotConfig:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    sample: SampleConfig = dataclasses.field(default_factory=SampleConfig)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "ParrotConfig":
        raw = json.loads(s)
        return cls(
            model=ModelConfig(**raw.get("model", {})),
            data=DataConfig(**raw.get("data", {})),
            train=TrainConfig(**{
                k: tuple(v) if k == "profile_steps" else v
                for k, v in raw.get("train", {}).items()
            }),
            sample=SampleConfig(**raw.get("sample", {})),
        )

    def replace(self, **sections) -> "ParrotConfig":
        return dataclasses.replace(self, **sections)


def replace(cfg, **kwargs):
    """dataclasses.replace that works on any section config."""
    return dataclasses.replace(cfg, **kwargs)
