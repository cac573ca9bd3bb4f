"""Synthetic fixture corpus for tests and CI (SURVEY.md §4 "golden small
HDF5 fixture").

Features are a deterministic function of the text: token id k has a
fixed D-dim template vector; an utterance's frames are each token's
template repeated `frames_per_char` times plus small noise. A correct
model + attention can drive the loss near zero and must learn a
monotonic alignment — which is exactly what the end-to-end overfit test
asserts. No real corpus is ever required.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from parrot_tpu.data.hdf5_dataset import write_corpus


def make_fixture_corpus(
    path: str,
    num_utterances: int = 32,
    vocab_size: int = 12,
    frame_size: int = 15,
    frames_per_char: int = 4,
    min_chars: int = 4,
    max_chars: int = 12,
    num_speakers: int = 1,
    noise: float = 0.01,
    seed: int = 0,
) -> str:
    rng = np.random.default_rng(seed)
    templates = rng.normal(size=(vocab_size, frame_size)).astype(np.float32)
    # per-speaker additive offset so multi-speaker conditioning is learnable
    spk_offsets = rng.normal(size=(num_speakers, frame_size)).astype(np.float32)

    features, texts, speakers = [], [], []
    for i in range(num_utterances):
        u = int(rng.integers(min_chars, max_chars + 1))
        ids = rng.integers(1, vocab_size, size=u).astype(np.int32)
        spk = int(rng.integers(0, num_speakers))
        f = np.repeat(templates[ids], frames_per_char, axis=0)
        f = f + spk_offsets[spk] + noise * rng.normal(size=f.shape)
        features.append(f.astype(np.float32))
        texts.append(ids)
        speakers.append(spk)

    n_valid = max(2, num_utterances // 8)
    splits = {
        "train": list(range(num_utterances - n_valid)),
        "valid": list(range(num_utterances - n_valid, num_utterances)),
    }
    write_corpus(path, features, texts, speakers, vocab_size=vocab_size,
                 splits=splits, num_speakers=num_speakers)
    return path


def make_audio_fixture_corpus(
    path: str,
    num_utterances: int = 16,
    vocab_size: int = 8,
    min_chars: int = 2,
    max_chars: int = 6,
    fs: int = 16000,
    char_ms: float = 120.0,
    seed: int = 0,
    num_speakers: int = 1,
) -> str:
    """End-to-end fixture with REAL vocoder features: each token id is a
    synthetic 'phoneme' (an f0 + resonant-filter pair); utterance audio is
    the concatenation of its tokens' vowel segments; features come from
    actual WORLD analysis. Trains the full text -> frames -> waveform
    pipeline without any real corpus. num_speakers > 1 gives each
    speaker a distinct voice (per-speaker pitch/formant scale), so
    speaker-conditioned models have signal to learn."""
    import h5py
    from scipy.signal import lfilter

    from parrot_tpu.vocoder import analyze, code_frames, hop_samples
    from parrot_tpu.vocoder.mulaw import mulaw_encode

    rng = np.random.default_rng(seed)
    hop = hop_samples(fs)
    # per-token (f0, resonance) "phoneme inventory"
    f0s = rng.uniform(100.0, 260.0, size=vocab_size)
    res = rng.uniform(300.0, 2500.0, size=vocab_size)
    # per-speaker voice: pitch scale + formant scale
    f0_scale = rng.uniform(0.75, 1.35, size=num_speakers)
    res_scale = rng.uniform(0.8, 1.25, size=num_speakers)
    seg_len = int(fs * char_ms / 1000.0)

    features, texts, speakers, audio_q = [], [], [], []
    for j in range(num_utterances):
        spk = j % num_speakers  # every speaker lands in both splits
        u = int(rng.integers(min_chars, max_chars + 1))
        ids = rng.integers(1, vocab_size, size=u).astype(np.int32)
        audio = []
        for k in ids:
            phase = np.cumsum(np.full(seg_len, f0_scale[spk] * f0s[k] / fs))
            pulses = np.diff(np.floor(phase), prepend=0.0)
            r = min(res_scale[spk] * res[k], 0.45 * fs)
            seg = lfilter([1.0], [1.0, -1.8 * np.cos(2 * np.pi * r / fs),
                                  0.9], pulses)
            audio.append(seg)
        x = np.concatenate(audio)
        x = x / (np.abs(x).max() + 1e-9)
        x = x + 0.001 * rng.normal(size=len(x))
        f0, sp, ap = analyze(x, fs)
        feat = code_frames(f0, sp, ap)
        features.append(feat)
        # frame-aligned mu-law audio for neural-vocoder training
        audio_q.append(mulaw_encode(0.95 * x[:feat.shape[0] * hop]))
        texts.append(ids)
        speakers.append(spk)

    n_valid = max(2, num_utterances // 8)
    splits = {"train": list(range(num_utterances - n_valid)),
              "valid": list(range(num_utterances - n_valid, num_utterances))}
    write_corpus(path, features, texts, speakers, vocab_size=vocab_size,
                 splits=splits, num_speakers=num_speakers,
                 audio=audio_q, sample_rate=fs, audio_hop=hop)
    with h5py.File(path, "a") as f:
        f.attrs["sample_rate"] = fs
    return path


def _rich_inventory(rng, vocab_size: int, num_speakers: int) -> dict:
    """Phone inventory + speaker voices of a rich corpus. Consumes the
    SAME draws in the SAME order as the original inline code, so a
    given corpus seed reproduces the committed data/rich2500.h5
    system exactly."""
    n_tok = vocab_size
    # ---- phone inventory (ids 1..vocab_size-1; 0 = pad) ----
    voiced = rng.uniform(size=n_tok) > 0.25
    voiced[0] = True
    f0s = rng.uniform(95.0, 240.0, size=n_tok)
    form1 = rng.uniform(280.0, 1100.0, size=n_tok)
    form2 = form1 * rng.uniform(1.8, 3.2, size=n_tok)
    # unvoiced phones: noise centered at a "frication" frequency
    fric = rng.uniform(1500.0, 5000.0, size=n_tok)
    # ---- speaker voices ----
    return dict(
        voiced=voiced, f0s=f0s, form1=form1, form2=form2, fric=fric,
        spk_f0=rng.uniform(0.72, 1.38, size=num_speakers),
        spk_form=rng.uniform(0.82, 1.22, size=num_speakers),
        spk_bw=rng.uniform(0.86, 0.94, size=num_speakers),  # pole radius
        spk_breath=rng.uniform(0.02, 0.18, size=num_speakers),
        spk_rate=rng.uniform(0.8, 1.25, size=num_speakers))


def _render_rich_utterance(rng, inv: dict, fs: int, char_ms: float,
                           spk: int, ids) -> np.ndarray:
    """One rich-corpus utterance realization: all the per-utterance
    prosody/duration/excitation entropy is drawn from `rng`, the
    deterministic system (phones + voices) from `inv`. Draw order is
    byte-identical to the original inline code (see _rich_inventory)."""
    from scipy.signal import lfilter, lfiltic

    voiced, f0s = inv["voiced"], inv["f0s"]
    form1, form2, fric = inv["form1"], inv["form2"], inv["fric"]
    spk_f0, spk_form, spk_bw = inv["spk_f0"], inv["spk_form"], inv["spk_bw"]
    spk_breath, spk_rate = inv["spk_breath"], inv["spk_rate"]
    u = len(ids)

    def resonator(x, freq, r, zi_state):
        freq = min(freq, 0.45 * fs)
        a = [1.0, -2.0 * r * np.cos(2 * np.pi * freq / fs), r * r]
        if zi_state is None:
            y, zf = lfilter([1.0], a, x, zi=lfiltic([1.0], a, [0.0]))
        else:
            y, zf = lfilter([1.0], a, x, zi=zi_state)
        return y, zf

    # utterance prosody
    decl = rng.uniform(-0.25, 0.0)                  # log-f0 slope
    vib_rate = rng.uniform(4.0, 7.0)
    vib_depth = rng.uniform(0.0, 0.035)
    vib_ph = rng.uniform(0, 2 * np.pi)
    contour = np.exp(np.cumsum(rng.normal(0, 0.05, size=u)))

    segs, z1, z2 = [], None, None
    xfade = int(0.010 * fs)
    tail = np.zeros(0)
    t_off = 0
    total = sum(int(fs * char_ms / 1000.0 * spk_rate[spk]
                    * rng.lognormal(0, 0.22)) for _ in range(u))
    rng_dur = np.random.default_rng(rng.integers(1 << 31))
    for ci, k in enumerate(ids):
        seg_len = max(int(fs * char_ms / 1000.0 * spk_rate[spk]
                          * rng_dur.lognormal(0, 0.22)), xfade + 8)
        t = (t_off + np.arange(seg_len)) / fs
        if voiced[k]:
            f0_t = (f0s[k] * spk_f0[spk] * contour[ci]
                    * np.exp(decl * t / max(total / fs, 0.3))
                    * (1 + vib_depth * np.sin(2 * np.pi * vib_rate * t
                                              + vib_ph)))
            phase = np.cumsum(f0_t / fs)
            pulses = np.diff(np.floor(phase), prepend=0.0)
            b = spk_breath[spk]
            exc = pulses * (1 - b) + b * rng.normal(size=seg_len) * 0.3
        else:
            exc = rng.normal(size=seg_len) * 0.25
        c1 = (form1[k] if voiced[k] else fric[k]) * spk_form[spk]
        c2 = form2[k] * spk_form[spk]
        y, z1 = resonator(exc, c1, spk_bw[spk], z1)
        y, z2 = resonator(y, c2, min(spk_bw[spk] + 0.03, 0.97), z2)
        if tail.size:  # excitation crossfade with the previous phone
            n = min(xfade, len(y), len(tail))
            ramp = np.linspace(0.0, 1.0, n)
            y[:n] = y[:n] * ramp + tail[:n] * (1 - ramp)
        tail = y[-xfade:].copy()
        segs.append(y)
        t_off += seg_len
    x = np.concatenate(segs)
    # amplitude envelope walk (slow, per ~100 ms)
    n_env = max(len(x) // (fs // 10), 2)
    env = np.interp(np.arange(len(x)),
                    np.linspace(0, len(x) - 1, n_env),
                    np.exp(rng.normal(0, 0.15, size=n_env)))
    x = x * env
    x = x / (np.abs(x).max() + 1e-9)
    x = x + 0.002 * rng.normal(size=len(x))
    return x


def rich_alternate_realization(ids, spk: int, vocab_size: int = 30,
                               num_speakers: int = 10,
                               corpus_seed: int = 0, fs: int = 16000,
                               char_ms: float = 100.0,
                               realization_seed: int = 1) -> np.ndarray:
    """Re-render the SAME text with the SAME speaker voice but FRESH
    per-utterance entropy (prosody contour, vibrato, durations,
    breath/noise excitation, envelope walk).

    The rich corpus is built so those draws are genuinely unpredictable
    from the text (fixture.py docstring) — so the DTW-MCD between a
    ground-truth utterance and its alternate realization measures the
    corpus's ALEATORIC FLOOR: the score an oracle sampling from the
    true conditional distribution would get on free-running evaluation.
    Model free-running MCD is only meaningful relative to this floor
    (VERDICT r3 weak #6)."""
    inv = _rich_inventory(np.random.default_rng(corpus_seed),
                          vocab_size, num_speakers)
    rng = np.random.default_rng(realization_seed)
    return _render_rich_utterance(rng, inv, fs, char_ms, spk,
                                  np.asarray(ids, np.int32))


def make_rich_corpus(
    path: str,
    num_utterances: int = 2500,
    vocab_size: int = 30,
    num_speakers: int = 10,
    min_chars: int = 6,
    max_chars: int = 16,
    fs: int = 16000,
    char_ms: float = 100.0,
    seed: int = 0,
    progress: bool = False,
) -> str:
    """Non-memorizable synthetic speech corpus (VERDICT r2 next-step #4).

    Same text -> audio SYSTEM as make_audio_fixture_corpus (tokens are
    synthetic phones, features from real WORLD analysis) but with enough
    per-utterance entropy that a ~10M-param model cannot memorize it and
    held-out quality has to come from generalization:

      * phone inventory: voiced tokens carry (f0 base, two formants);
        ~1/4 of tokens are UNVOICED noise phones (V/UV is learnable);
      * per-speaker voice: pitch scale, formant scale, filter bandwidth,
        breathiness, speaking rate — drawn once per speaker;
      * per-utterance prosody: F0 declination, random-walk contour,
        vibrato (random rate/depth/phase), amplitude envelope walk;
      * per-PHONE-INSTANCE duration jitter (lognormal around the
        speaker's rate) — alignment varies realization to realization;
      * coarticulation: each phone's filter starts from the previous
        phone's filter state, plus a short excitation crossfade.

    Every utterance is a unique realization; the token->acoustics
    mapping stays systematic, so teacher-forced AND free-running
    held-out metrics can improve only by learning the system.
    """
    import h5py

    from parrot_tpu.vocoder import analyze, code_frames, hop_samples
    from parrot_tpu.vocoder.mulaw import mulaw_encode

    rng = np.random.default_rng(seed)
    hop = hop_samples(fs)
    inv = _rich_inventory(rng, vocab_size, num_speakers)
    n_tok = vocab_size

    features, texts, speakers, audio_q = [], [], [], []
    for j in range(num_utterances):
        spk = j % num_speakers
        u = int(rng.integers(min_chars, max_chars + 1))
        ids = rng.integers(1, n_tok, size=u).astype(np.int32)
        x = _render_rich_utterance(rng, inv, fs, char_ms, spk, ids)

        f0, sp, ap = analyze(x, fs)
        feat = code_frames(f0, sp, ap)
        features.append(feat)
        audio_q.append(mulaw_encode(0.95 * x[:feat.shape[0] * hop]))
        texts.append(ids)
        speakers.append(spk)
        if progress and (j + 1) % 200 == 0:
            print(f"  rich corpus: {j + 1}/{num_utterances}", flush=True)

    n_valid = max(8, num_utterances // 12)
    splits = {"train": list(range(num_utterances - n_valid)),
              "valid": list(range(num_utterances - n_valid,
                                  num_utterances))}
    write_corpus(path, features, texts, speakers, vocab_size=vocab_size,
                 splits=splits, num_speakers=num_speakers,
                 audio=audio_q, sample_rate=fs, audio_hop=hop)
    with h5py.File(path, "a") as f:
        f.attrs["sample_rate"] = fs
    return path
