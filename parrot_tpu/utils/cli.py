"""CLI argument parsing for train.py / generate.py.

Mirrors the reference's argparse surface (reference utils.py
train_parse/generate_parse — mount empty, reconstructed per SURVEY.md §5:
`--model_name`, `--dataset`, `--use_speaker`, `--which_cost`,
`--sampling_bias`, ...). Flags override the ParrotConfig defaults.
"""

from __future__ import annotations

import argparse
import dataclasses
import os

from parrot_tpu.config import (DataConfig, ModelConfig, ParrotConfig,
                               SampleConfig, TrainConfig)


def _add_common(p: argparse.ArgumentParser):
    # defaults live in the Config dataclasses; argparse uses None so an
    # unset flag never clobbers a --config value
    p.add_argument("--model_name", type=str, default=None)
    p.add_argument("--dataset", type=str, default=None,
                   help="corpus name or path to an .h5 corpus file")
    p.add_argument("--data_dir", type=str, default=None)
    p.add_argument("--save_dir", type=str, default=None)
    p.add_argument("--config", type=str, default=None,
                   help="path to a ParrotConfig json (flags still override)")
    # model hyperparameters (reference names)
    p.add_argument("--which_cost", type=str, choices=["GMM", "MSE"],
                   default=None)
    p.add_argument("--rnn_h_dim", type=int, default=None)
    p.add_argument("--readouts_dim", type=int, default=None)
    p.add_argument("--encoder_dim", type=int, default=None)
    p.add_argument("--embed_dim", type=int, default=None)
    p.add_argument("--decoder_layers", type=int, default=None)
    p.add_argument("--attention_mixtures", type=int, default=None)
    p.add_argument("--attention_alignment", type=float, default=None)
    p.add_argument("--num_mixtures", type=int, default=None)
    p.add_argument("--use_speaker", action="store_true", default=None)
    p.add_argument("--num_speakers", type=int, default=None)
    p.add_argument("--speaker_dim", type=int, default=None)
    p.add_argument("--layer_norm", action="store_true", default=None)
    p.add_argument("--feedback_noise_level", type=float, default=None)
    p.add_argument("--compute_dtype", type=str, default=None,
                   choices=["float32", "bfloat16"])
    p.add_argument("--remat_scan", action="store_true", default=None)
    p.add_argument("--scan_weight_dtype", type=str, default=None,
                   choices=["float32", "bfloat16"],
                   help="bfloat16: stream bf16 copies of the scan-"
                        "resident decoder weights (train-step traffic "
                        "lever, docs/PERFORMANCE.md)")
    p.add_argument("--scan_enc_dtype", type=str, default=None,
                   choices=["float32", "bfloat16"],
                   help="bfloat16: stream the encoder block at bf16 "
                        "through the decoder scan")
    p.add_argument("--head_dtype", type=str, default=None,
                   choices=["float32", "bfloat16"],
                   help="bfloat16: run the post-scan readout/head "
                        "GEMMs (fwd + both transpose GEMMs) with bf16 "
                        "operands / f32 accumulation (the epilogue is "
                        "MXU-compute-bound at f32; docs/PERFORMANCE.md)")
    p.add_argument("--remat_head", action="store_true", default=None,
                   help="recompute the GMM NLL intermediates in the "
                        "backward instead of saving them")
    p.add_argument("--pallas_scan", dest="pallas_scan",
                   action="store_true", default=None,
                   help="force the fused Pallas fwd/bwd training "
                        "kernels for the decoder scan + encoder passes "
                        "(default AUTO: on for TPU when the shapes fit "
                        "VMEM, off elsewhere — docs/PERFORMANCE.md)")
    p.add_argument("--no_pallas_scan", dest="pallas_scan",
                   action="store_false",
                   help="disable the fused Pallas training kernels "
                        "(lax.scan split path)")


def train_parse(argv=None) -> ParrotConfig:
    p = argparse.ArgumentParser("parrot-tpu train")
    _add_common(p)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--seq_size", type=int, default=None)
    p.add_argument("--max_text_len", type=int, default=None)
    p.add_argument("--norm_stats", type=str, default=None,
                   help=".npz with mean/std arrays overriding the "
                        "corpus-embedded normalization stats (reference "
                        "Fuel-style stats file)")
    p.add_argument("--learning_rate", type=float, default=None)
    p.add_argument("--warmup_steps", type=int, default=None,
                   help="linear LR warmup; bounds the oversized early "
                        "Adam steps of a warm-started fine-tune while "
                        "fresh second moments build")
    p.add_argument("--grad_clip", type=float, default=None)
    p.add_argument("--num_steps", type=int, default=None)
    p.add_argument("--save_every", type=int, default=None)
    p.add_argument("--eval_every", type=int, default=None)
    p.add_argument("--log_every", type=int, default=None)
    p.add_argument("--early_stop_patience", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--num_devices", type=int, default=None)
    p.add_argument("--debug_nans", action="store_true", default=None)
    p.add_argument("--scheduled_sampling_rate", type=float, default=None,
                   help="p(input frame <- the model's own pass-1 frame): "
                        "two-pass parallel scheduled sampling for "
                        "exposure-bias fine-tuning (0 = off, the "
                        "reference-faithful teacher-forced default)")
    p.add_argument("--scheduled_sampling_mode", type=str, default=None,
                   choices=["sample", "mean"],
                   help="pass-1 frames: biased GMM draw ('sample', "
                        "matches free-running generation) or mixture "
                        "expectation ('mean')")
    p.add_argument("--scheduled_sampling_bias", type=float, default=None,
                   help="GMM bias for scheduled-sampling draws "
                        "(match the eval-time --sampling_bias)")
    p.add_argument("--plot_alignments", action="store_true", default=None)
    p.add_argument("--tensorboard", action="store_true", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--init_from", type=str, default=None,
                   help="warm-start params+norm from another trained "
                        "model under the same save_dir (fresh optimizer "
                        "/stream/step) — the corpus-transfer fine-tune "
                        "entry (e.g. the long-text robustness leg)")
    p.add_argument("--init_checkpoint", default="best",
                   choices=["best", "latest"],
                   help="which checkpoint of --init_from to load")
    args = p.parse_args(argv)
    cfg = _build_config(args, train_keys=[
        "learning_rate", "warmup_steps", "grad_clip", "num_steps",
        "save_every",
        "eval_every", "log_every", "early_stop_patience", "seed",
        "num_devices", "model_name", "save_dir", "debug_nans",
        "plot_alignments", "tensorboard", "scheduled_sampling_rate",
        "scheduled_sampling_mode", "scheduled_sampling_bias"])
    return cfg, args


def generate_parse(argv=None):
    p = argparse.ArgumentParser("parrot-tpu generate")
    _add_common(p)
    p.add_argument("--text", type=str, default=None,
                   help="text to synthesize (else valid-split utterances)")
    p.add_argument("--speaker_id", type=int, default=0)
    p.add_argument("--sampling_bias", type=float, default=None)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--max_steps_per_token", type=float, default=None,
                   help="scale the generation budget with the longest "
                        "input: max_steps = ceil(this * max text len). "
                        "The robustness study (docs/PERFORMANCE.md round "
                        "5) measured ~20 frames/token corpora paced at "
                        "up to 1.5x under biased sampling — a fixed "
                        "max_steps silently truncates long OOD text; "
                        "30 is a safe value there. Overrides "
                        "--max_steps when both are given")
    p.add_argument("--num_samples", type=int, default=1)
    p.add_argument("--samples_name", type=str, default="samples")
    p.add_argument("--checkpoint", type=str, default="best",
                   choices=["best", "latest"])
    p.add_argument("--no_fused_kernel", action="store_true")
    p.add_argument("--split", default="valid", choices=["valid", "train"],
                   help="which corpus split to draw utterances from")
    p.add_argument("--no_plots", action="store_true",
                   help="skip attention/feature plots (plots no longer "
                        "disable the fused serving path: the kernel emits "
                        "(alpha, beta) and phi is reconstructed outside)")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--neural_vocoder", type=str, default=None,
                   help="model_name of a trained SampleRNN vocoder "
                        "(train_vocoder.py): neural-synthesize "
                        "*_neural.wav from the generated frames, in "
                        "addition to the WORLD synthesis filter "
                        "(Char2Wav's SampleRNN half)")
    p.add_argument("--vocoder_temperature", type=float, default=1.0,
                   help="neural-vocoder softmax temperature "
                        "(<= 0 = greedy)")
    p.add_argument("--stream", action="store_true",
                   help="streaming synthesis (requires --neural_vocoder): "
                        "chunked text->audio with carried kernel state; "
                        "prints time-to-first-audio and per-chunk cadence, "
                        "writes sample_*_stream.wav")
    p.add_argument("--frame_chunk", type=int, default=32,
                   help="--stream chunk size in frames (x 5 ms of audio)")
    args = p.parse_args(argv)
    cfg = _build_config(args, train_keys=["model_name", "save_dir"])
    sample_over = {}
    if args.sampling_bias is not None:
        sample_over["sampling_bias"] = args.sampling_bias
    if args.max_steps is not None:
        sample_over["max_steps"] = args.max_steps
    if args.no_fused_kernel:
        sample_over["use_fused_kernel"] = False
    if args.seed is not None:
        sample_over["seed"] = args.seed
    if sample_over:
        cfg = cfg.replace(sample=dataclasses.replace(cfg.sample,
                                                     **sample_over))
    return cfg, args


def _build_config(args, train_keys) -> ParrotConfig:
    if args.config:
        if not os.path.exists(args.config):
            import sys
            sys.exit(f"--config file not found: {args.config}")
        cfg = ParrotConfig.from_json(open(args.config).read())
    else:
        cfg = ParrotConfig()

    def overrides(section, names):
        out = {}
        for n in names:
            v = getattr(args, n, None)
            if v is not None:
                out[n] = v
        return dataclasses.replace(section, **out) if out else section

    model = overrides(cfg.model, [
        "which_cost", "rnn_h_dim", "readouts_dim", "encoder_dim",
        "embed_dim", "decoder_layers", "attention_mixtures",
        "attention_alignment", "num_mixtures", "use_speaker",
        "num_speakers", "speaker_dim", "layer_norm",
        "feedback_noise_level", "compute_dtype", "remat_scan",
        "scan_weight_dtype", "scan_enc_dtype", "head_dtype",
        "remat_head", "pallas_scan"])
    data = overrides(cfg.data, ["dataset", "data_dir", "batch_size",
                                "seq_size", "max_text_len", "norm_stats"])
    train = overrides(cfg.train, train_keys)
    return ParrotConfig(model=model, data=data, train=train,
                        sample=cfg.sample)


def resolve_corpus_path(cfg: ParrotConfig) -> str:
    d = cfg.data.dataset
    if d.endswith(".h5") or d.endswith(".hdf5"):
        return d
    return os.path.join(cfg.data.data_dir, f"{d}.h5")
