#!/usr/bin/env python
"""Generation entry point; mirrors the reference generate.py semantics
(BASELINE.json:5): load a checkpoint, run batched autoregressive
sampling with biased GMM sampling and attention-based stopping, then
WORLD-synthesize waveforms and save plots.

Examples:
  python generate.py --model_name m1 --dataset corpus.h5 --num_samples 4
  python generate.py --model_name m1 --dataset corpus.h5 \
      --text "hello world" --sampling_bias 1.0
"""

import dataclasses
import json
import os
import sys

import numpy as np


def main(argv=None):
    from parrot_tpu.utils.cli import generate_parse, resolve_corpus_path
    from parrot_tpu.data import H5Corpus
    from parrot_tpu.sample import Sampler, bucket_by_length
    from parrot_tpu.utils.plotting import save_attention_plot, save_feature_plot

    cfg, args = generate_parse(argv)
    corpus = H5Corpus(resolve_corpus_path(cfg))

    from parrot_tpu.train.checkpoint import load_for_inference
    try:
        model, params, norm, saved_cfg, step = load_for_inference(
            cfg.train.save_dir, cfg.train.model_name, args.checkpoint)
    except (FileNotFoundError, ValueError) as e:
        sys.exit(str(e))
    cfg = cfg.replace(model=saved_cfg.model)
    print(f"loaded checkpoint step={step}")

    # inputs: explicit text (needs corpus charset) or valid-split texts
    if args.text is not None:
        charset = corpus_charset(corpus)
        if charset is None:
            sys.exit("--text requires a corpus with a charset attribute")
        if isinstance(charset, list):  # phoneme inventory
            toks = [t for t in args.text.split() if t in charset]
        else:                          # character set
            toks = [c for c in args.text.lower() if c in charset]
        ids = [np.asarray([charset.index(t) + 1 for t in toks], np.int32)]
        if len(ids[0]) == 0:
            sys.exit("--text contains no tokens present in the corpus "
                     "charset/phoneme inventory")
        speakers = [args.speaker_id]
    else:
        chosen = corpus.split(args.split)[:args.num_samples]
        ids = [corpus.text(int(i)) for i in chosen]
        speakers = [corpus.speaker(int(i)) for i in chosen]

    # multi-chip serving: with several devices visible, the fused kernel
    # runs one instance per chip (batch rows sharded, weights replicated;
    # see Sampler.mesh) — throughput scales linearly with chips
    import jax
    mesh = None
    if len(jax.devices()) > 1:
        from parrot_tpu.parallel import make_mesh
        mesh = make_mesh()
    if args.max_steps_per_token is not None:
        # scale the budget with the longest input instead of a fixed
        # cap — biased sampling paces up to ~1.5x slower than ground
        # truth (docs/PERFORMANCE.md round-5 robustness), so fixed
        # max_steps silently truncates long OOD text
        import math
        longest = max(len(t) for t in ids)
        ms = int(math.ceil(args.max_steps_per_token * longest))
        cfg = cfg.replace(sample=dataclasses.replace(cfg.sample,
                                                     max_steps=ms))
        print(f"max_steps scaled to {ms} "
              f"({args.max_steps_per_token:g}/token x {longest} tokens)")
    sampler = Sampler(model, params, norm, cfg.sample, mesh=mesh)
    out_dir = os.path.join(cfg.train.save_dir, cfg.train.model_name,
                           args.samples_name)
    os.makedirs(out_dir, exist_ok=True)

    if args.stream:
        if not args.neural_vocoder:
            sys.exit("--stream requires --neural_vocoder (streaming is the "
                     "reader + neural vocoder pipeline)")
        stream_generate(model, params, norm, cfg, args, ids, speakers,
                        corpus, out_dir)
        return

    results = [None] * len(ids)
    for idx, text, mask in bucket_by_length(ids, cfg.sample.batch_size):
        spk = np.asarray([speakers[i] for i in idx], np.int32)
        frames, lengths, phis = sampler.generate(
            text, mask, spk, return_phis=not args.no_plots)
        for r, i in enumerate(idx):
            phi = None if phis is None else np.asarray(phis[r])
            results[i] = (np.asarray(frames[r]), int(lengths[r]),
                          phi, int(mask[r].sum()))

    neural = None
    if args.neural_vocoder:
        from parrot_tpu.train.checkpoint import load_vocoder_for_inference
        try:
            neural = load_vocoder_for_inference(
                cfg.train.save_dir, args.neural_vocoder, args.checkpoint)
            print(f"neural vocoder '{args.neural_vocoder}' loaded "
                  f"(step={neural[4]})")
        except (FileNotFoundError, ValueError) as e:
            sys.exit(str(e))

    for i, (frames, length, phi, tlen) in enumerate(results):
        base = os.path.join(out_dir, f"sample_{i}")
        np.save(base + "_frames.npy", frames[:length])
        if phi is not None:
            save_attention_plot(base + "_attention.png", phi, length, tlen)
            save_feature_plot(base + "_features.png", frames, length)
        wav_path = try_synthesize(base, frames[:length], corpus)
        print(f"sample {i}: {length} frames -> {base}_frames.npy"
              + (f", {wav_path}" if wav_path else ""))

    if neural is not None:
        neural_synthesize(neural, results, out_dir, corpus,
                          temperature=args.vocoder_temperature,
                          seed=cfg.sample.seed, speakers=speakers)


def stream_generate(model, params, norm, cfg, args, ids, speakers, corpus,
                    out_dir):
    """Streaming path: chunked text->audio with carried kernel state
    (sample/streaming.py). Writes sample_*_stream.wav and prints
    time-to-first-audio + per-chunk cadence — the latency-serving mode
    the reference (per-frame Python loop + offline vocoder) has no
    equivalent of."""
    import jax

    from parrot_tpu.sample.streaming import StreamingSynthesizer
    from parrot_tpu.train.checkpoint import load_vocoder_for_inference
    from parrot_tpu.vocoder import write_wav

    if args.frame_chunk <= 0 or args.frame_chunk % 8:
        sys.exit(f"--frame_chunk must be a positive multiple of 8 "
                 f"(got {args.frame_chunk})")
    try:
        vmodel, vparams, vnorm, vcfg, vstep = load_vocoder_for_inference(
            cfg.train.save_dir, args.neural_vocoder, args.checkpoint)
    except (FileNotFoundError, ValueError) as e:
        sys.exit(str(e))
    print(f"neural vocoder '{args.neural_vocoder}' loaded (step={vstep})")
    fs = int(corpus._f.attrs.get("sample_rate", vcfg.sample_rate))

    B, U = len(ids), max(len(t) for t in ids)
    text = np.zeros((B, U), np.int32)
    mask = np.zeros((B, U), np.float32)
    for r, t in enumerate(ids):
        text[r, :len(t)] = t
        mask[r, :len(t)] = 1.0
    spk = np.asarray(speakers, np.int32)

    syn = StreamingSynthesizer(
        model, params, norm, vmodel, vparams, cfg.sample,
        vocoder_temperature=args.vocoder_temperature, vnorm=vnorm)
    hop = vcfg.hop
    audio_parts, live_parts = [], []
    for k, ch in enumerate(syn.stream(text, mask, spk,
                                      key=jax.random.PRNGKey(
                                          cfg.sample.seed),
                                      frame_chunk=args.frame_chunk,
                                      max_steps=cfg.sample.max_steps)):
        audio_parts.append(ch.audio)
        live_parts.append(ch.live)
        # the first chunk's wall time includes the one-time jit compile;
        # warm-cache TTFA is what scripts/bench_stream.py measures
        label = "first chunk (incl. compile)" if k == 0 else f"chunk {k}"
        chunk_ms = ch.audio.shape[1] / vcfg.sample_rate * 1e3
        print(f"{label}: +{chunk_ms:.0f} ms of audio at "
              f"t={ch.ttfa_ms:.0f} ms ({int(ch.done.sum())}/{B} rows done)")
    audio = np.concatenate(audio_parts, axis=1)
    live = np.concatenate(live_parts, axis=1)          # (B, total frames)
    for r in range(B):
        n_frames = int(live[r].sum())
        path = os.path.join(out_dir, f"sample_{r}_stream.wav")
        write_wav(path, audio[r, :max(n_frames, 1) * hop], fs)
        print(f"sample {r}: {n_frames} frames streamed -> {path}")


def neural_synthesize(neural, results, out_dir, corpus, temperature=1.0,
                      seed=0, speakers=None):
    """SampleRNN synthesis of generated frames -> *_neural.wav.

    One batched call over all samples (frames padded to the longest,
    masked), so the generation compiles once. On TPU the fused Pallas
    kernel serves (weights VMEM-resident, in-kernel PRNG sampling,
    ~2.5-3x the plain path); otherwise the plain lax.scan path runs.
    """
    import jax
    import jax.numpy as jnp

    from parrot_tpu.vocoder import write_wav

    model, params, vnorm, vcfg, _ = neural
    fs = int(corpus._f.attrs.get("sample_rate", vcfg.sample_rate))
    n = len(results)
    t_max = max(length for _, length, _, _ in results)
    D = results[0][0].shape[-1]
    cond = np.zeros((n, t_max, D), np.float32)
    mask = np.zeros((n, t_max), np.float32)
    for i, (frames, length, _, _) in enumerate(results):
        cond[i, :length] = frames[:length]
        mask[i, :length] = 1.0
    spk = (jnp.asarray(np.asarray(speakers, np.int32))
           if speakers is not None else None)
    use_fused = (jax.default_backend() == "tpu"
                 and vcfg.mlp_dim % 128 == 0)
    if use_fused:
        # generate_robust: permanent kernel failures fall back to the
        # plain path for good, transient ones retry next call
        _, audio = model.generate_robust(
            params, vnorm, jnp.asarray(cond), jnp.asarray(mask),
            seed=seed, temperature=temperature, speaker=spk)
    else:
        _, audio, _ = jax.jit(
            lambda c, m, k: model.generate(params, vnorm, c, m, k,
                                           temperature=temperature,
                                           speaker=spk)
        )(jnp.asarray(cond), jnp.asarray(mask), jax.random.PRNGKey(seed))
    audio = np.asarray(audio)
    for i, (_, length, _, _) in enumerate(results):
        path = os.path.join(out_dir, f"sample_{i}_neural.wav")
        write_wav(path, audio[i, :length * vcfg.hop], fs)
        print(f"sample {i}: neural synthesis -> {path}")


def corpus_charset(corpus):
    attrs = corpus._f.attrs
    if "charset" in attrs:
        return json.loads(attrs["charset"])
    return None


def try_synthesize(base, frames, corpus):
    """WORLD-synthesize to wav when the vocoder module is available."""
    try:
        from parrot_tpu.vocoder import decode_frames, synthesize, write_wav
    except ImportError:
        return None
    try:
        fs = int(corpus._f.attrs.get("sample_rate", 16000))
        f0, sp, ap = decode_frames(frames, fs=fs)
        wav = synthesize(f0, sp, ap, fs=fs)
        path = base + ".wav"
        write_wav(path, wav, fs)
        return path
    except Exception as e:  # vocoder built but synthesis failed: report
        print(f"  (synthesis failed: {e})")
        return None


if __name__ == "__main__":
    main()
