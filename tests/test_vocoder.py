"""Vocoder tests: C++ build, F0 accuracy, C++/JAX synthesis parity,
coding roundtrip, MCD formula, wav io (SURVEY.md §4 "Vocoder")."""

import os
import wave

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.signal import lfilter

from parrot_tpu.vocoder import (analyze, synthesize, synthesize_jax,
                                lcg_noise, pulse_excitation, write_wav,
                                get_fft_size, hop_samples, code_frames,
                                decode_frames, code_sp, decode_sp, mcd)

FS = 16000


def synth_vowel(f0=120.0, seconds=0.6, resonance=500.0, seed=0):
    T = int(FS * seconds)
    phase = np.cumsum(np.full(T, f0 / FS))
    pulses = np.diff(np.floor(phase), prepend=0.0)
    x = lfilter([1.0], [1.0, -1.8 * np.cos(2 * np.pi * resonance / FS), 0.9],
                pulses)
    x = x + 0.001 * np.random.default_rng(seed).normal(size=T)
    return x / np.abs(x).max()


@pytest.fixture(scope="module")
def vowel_analysis():
    x = synth_vowel()
    return x, analyze(x, FS)


def test_f0_estimation_accuracy(vowel_analysis):
    _, (f0, sp, ap) = vowel_analysis
    inner = f0[10:-10]
    voiced = inner[inner > 0]
    assert (inner > 0).mean() > 0.9
    assert abs(np.median(voiced) - 120.0) < 3.0


def test_f0_tracks_different_pitch():
    x = synth_vowel(f0=220.0)
    f0, _, _ = analyze(x, FS)
    voiced = f0[10:-10]
    voiced = voiced[voiced > 0]
    assert abs(np.median(voiced) - 220.0) < 5.0


def test_unvoiced_noise_is_unvoiced():
    x = np.random.default_rng(1).normal(size=FS // 2)
    f0, _, ap = analyze(x, FS)
    assert (f0 == 0).mean() > 0.8
    assert ap[f0 == 0].mean() > 0.9


def test_envelope_peaks_at_resonance(vowel_analysis):
    _, (f0, sp, ap) = vowel_analysis
    F = sp.shape[1]
    freqs = np.arange(F) * FS / ((F - 1) * 2)
    mean_sp = sp[20:-20].mean(0)
    peak_hz = freqs[np.argmax(mean_sp)]
    # true peak of the synthesis filter 1/(1 - 1.8 cos(2pi 500/fs) z^-1 + 0.9 z^-2)
    w = 2 * np.pi * freqs / FS
    H = 1.0 / np.abs(1 - 1.8 * np.cos(2 * np.pi * 500 / FS) * np.exp(-1j * w)
                     + 0.9 * np.exp(-2j * w)) ** 2
    true_peak = freqs[np.argmax(H)]
    assert abs(peak_hz - true_peak) < 120.0


def test_cpp_jax_synthesis_parity(vowel_analysis):
    """The north-star fidelity check: both synthesis paths implement one
    spec and must agree to float32 roundoff."""
    _, (f0, sp, ap) = vowel_analysis
    y_cpp = synthesize(f0, sp, ap, FS, noise_seed=7)
    hop = hop_samples(FS)
    noise = lcg_noise(len(f0) * hop, seed=7)
    y_jax = np.asarray(synthesize_jax(
        jnp.asarray(f0), jnp.asarray(sp), jnp.asarray(ap),
        jnp.asarray(noise), FS, hop, get_fft_size(FS)))
    scale = np.abs(y_cpp).max()
    assert np.abs(y_cpp - y_jax).max() / scale < 1e-4


def test_synthesis_roundtrip_preserves_f0(vowel_analysis):
    _, (f0, sp, ap) = vowel_analysis
    y = synthesize(f0, sp, ap, FS)
    f0_2, _, _ = analyze(y, FS)
    a = f0[10:-10]
    b = f0_2[10:-10]
    both = (a > 0) & (b > 0)
    assert both.mean() > 0.8
    assert np.median(np.abs(a[both] - b[both])) < 5.0


def test_coding_roundtrip(vowel_analysis):
    _, (f0, sp, ap) = vowel_analysis
    frames = code_frames(f0, sp, ap)
    assert frames.shape == (len(f0), 63)
    f0d, spd, apd = decode_frames(frames, FS)
    np.testing.assert_allclose(f0d, f0, rtol=1e-4)
    assert np.abs(apd - ap).max() < 0.01
    # envelope coding: low reconstruction MCD on smooth envelopes
    d = mcd(code_sp(sp), code_sp(spd))
    assert d < 1.0, f"sp coding self-MCD too high: {d}"


def test_mcd_formula():
    c1 = np.zeros((4, 5))
    c2 = np.zeros((4, 5))
    c2[:, 1] = 1.0  # unit offset in one coefficient
    want = 10.0 / np.log(10.0) * np.sqrt(2.0)
    np.testing.assert_allclose(mcd(c1, c2), want, rtol=1e-9)
    assert mcd(c1, c1) == 0.0
    # dtw handles unequal lengths
    assert mcd(c1, np.vstack([c2, c2[:1]]), use_dtw=True) > 0


def _dtw_path_scalar(a, b):
    """Scalar-oracle DTW (the original O(Ta*Tb) Python fill) used to pin
    the vectorized anti-diagonal implementation in vocoder/mcd.py."""
    Ta, Tb = len(a), len(b)
    dist = np.sqrt(((a[:, None, :] - b[None, :, :]) ** 2).sum(-1))
    acc = np.full((Ta + 1, Tb + 1), np.inf)
    acc[0, 0] = 0.0
    for i in range(1, Ta + 1):
        for j in range(1, Tb + 1):
            acc[i, j] = dist[i - 1, j - 1] + min(acc[i - 1, j],
                                                 acc[i, j - 1],
                                                 acc[i - 1, j - 1])
    path = []
    i, j = Ta, Tb
    while i > 0 and j > 0:
        path.append((i - 1, j - 1))
        k = int(np.argmin([acc[i - 1, j - 1], acc[i - 1, j], acc[i, j - 1]]))
        if k == 0:
            i, j = i - 1, j - 1
        elif k == 1:
            i -= 1
        else:
            j -= 1
    return np.asarray(path[::-1], np.int64)


def test_dtw_vectorized_matches_scalar_oracle():
    from parrot_tpu.vocoder.mcd import _dtw_path
    rng = np.random.default_rng(7)
    for Ta, Tb in [(1, 1), (5, 5), (13, 7), (7, 13), (40, 40), (60, 31)]:
        a = rng.normal(size=(Ta, 6))
        b = rng.normal(size=(Tb, 6))
        np.testing.assert_array_equal(_dtw_path(a, b),
                                      _dtw_path_scalar(a, b))


def test_lcg_noise_vectorized_matches_scalar_spec():
    """The block-jump vectorization must stay bit-identical to the C++
    LCG spec (s <- s*1664525 + 1013904223 mod 2^32), including across
    the 4096-sample block boundary."""
    from parrot_tpu.vocoder.world import lcg_noise

    def scalar(T, seed=1):
        out = np.empty(T, np.float64)
        s = int(seed) & 0xFFFFFFFF
        for t in range(T):
            s = (s * 1664525 + 1013904223) & 0xFFFFFFFF
            out[t] = s / 4294967296.0 * 2.0 - 1.0
        return out * np.sqrt(3.0)

    for T in [0, 1, 4095, 4096, 4097, 9001]:
        for seed in [1, 0, 0xFFFFFFFF]:
            np.testing.assert_array_equal(lcg_noise(T, seed),
                                          scalar(T, seed))


def test_dtw_mcd_scales_to_real_utterances():
    """VERDICT r2 #3 done-criterion: MCD of a 2,000-frame pair (10 s of
    5 ms frames) with DTW in well under a second."""
    import time
    rng = np.random.default_rng(3)
    a = rng.normal(size=(2000, 60))
    b = a + 0.1 * rng.normal(size=(2000, 60))
    dt = float("inf")
    for _ in range(3):  # best-of-3: robust to background load on the host
        t0 = time.perf_counter()
        d = mcd(a, b, use_dtw=True)
        dt = min(dt, time.perf_counter() - t0)
    assert np.isfinite(d) and d > 0
    # 2.0 s budget: ~0.5 s on an idle host; the pre-vectorization
    # implementation took tens of seconds, so this still catches the
    # regression while tolerating a loaded CI host (a concurrent
    # training run's host pipeline can double wall time here)
    assert dt < 2.0, f"2000-frame DTW MCD took {dt:.2f}s (best of 3)"


def test_write_wav(tmp_path, vowel_analysis):
    x, _ = vowel_analysis
    p = str(tmp_path / "a.wav")
    write_wav(p, x, FS)
    with wave.open(p) as w:
        assert w.getframerate() == FS
        assert w.getnchannels() == 1
        assert w.getnframes() == len(x)


def test_lcg_noise_matches_spec():
    n = lcg_noise(4, seed=1)
    s = np.uint32(1)
    exp = []
    with np.errstate(over="ignore"):
        for _ in range(4):
            s = np.uint32(s * np.uint32(1664525) + np.uint32(1013904223))
            exp.append((float(s) / 2**32 * 2 - 1) * np.sqrt(3))
    np.testing.assert_allclose(n, exp, rtol=1e-12)
    big = lcg_noise(10000, seed=3)
    assert abs(big.std() - 1.0) < 0.05


def test_synthesis_matches_golden_file():
    """Spec-stability guard: the synthesis algorithm (shared by C++ and
    JAX) must not drift across rounds. Regenerate tests/golden/* ONLY on
    a deliberate spec change (and bump both implementations together)."""
    import os
    g = np.load(os.path.join(os.path.dirname(__file__), "golden",
                             "synthesis_golden.npz"))
    y = synthesize(g["f0"], g["sp"], g["ap"], FS, noise_seed=123)
    np.testing.assert_allclose(y, g["y"], rtol=1e-10, atol=1e-12)
    # and the JAX path agrees with the same golden
    hop = hop_samples(FS)
    noise = lcg_noise(len(g["f0"]) * hop, seed=123)
    yj = np.asarray(synthesize_jax(
        jnp.asarray(g["f0"]), jnp.asarray(g["sp"]), jnp.asarray(g["ap"]),
        jnp.asarray(noise), FS, hop, (g["sp"].shape[1] - 1) * 2,
        pulses=jnp.asarray(pulse_excitation(g["f0"], FS))))
    assert np.abs(yj - g["y"]).max() / np.abs(g["y"]).max() < 1e-4


def test_hop_rounding_matches_cpp_at_44100():
    """fs=44100 -> 220.5 samples: Python banker's round() gives 220 but
    the C++ uses lround (221). A mismatch means world_synthesize writes
    past the output buffer (code-review regression)."""
    assert hop_samples(44100) == 221
    # synthesis at 44.1k must complete without corruption
    N = 6
    F = get_fft_size(44100) // 2 + 1
    f0 = np.full(N, 150.0)
    sp = np.ones((N, F))
    ap = np.full((N, F), 0.3)
    y = synthesize(f0, sp, ap, 44100)
    assert y.shape == (N * 221,)
    assert np.isfinite(y).all()


def test_band_ap_roundtrip_lossless(vowel_analysis):
    """code_ap/decode_ap band ownership must match the C++ writer exactly
    (code-review regression: the shared boundary bin was double-counted)."""
    from parrot_tpu.vocoder import code_ap, decode_ap
    _, (f0, sp, ap) = vowel_analysis
    F = ap.shape[1]
    coded = code_ap(ap)
    back = decode_ap(coded, F)
    np.testing.assert_allclose(back, ap, atol=1e-12)


def test_pulse_excitation_vectorized_matches_loop():
    """The vectorized pulse train must reproduce the sequential C++-style
    accumulator bit for bit, incl. voiced/unvoiced toggles."""
    rng = np.random.default_rng(0)
    f0 = np.where(rng.uniform(size=50) < 0.7,
                  rng.uniform(90, 400, 50), 0.0)
    ev = pulse_excitation(f0, FS)
    hop = hop_samples(FS)
    ref = np.zeros(len(f0) * hop)
    phase, prev_floor = 0.0, 0.0
    for t in range(len(ref)):
        f = f0[t // hop]
        if f > 0:
            phase += f / FS
            fl = np.floor(phase)
            if fl > prev_floor:
                ref[t] = np.sqrt(FS / f)
            prev_floor = fl
    np.testing.assert_array_equal(ev, ref)


@pytest.mark.parametrize("name,make,fs", [
    ("silence", lambda: np.zeros(8000), 16000),
    ("very_short", lambda: np.random.default_rng(0).normal(size=480), 16000),
    ("one_hop", lambda: np.random.default_rng(0).normal(size=80), 16000),
    ("fs8000", lambda: np.sin(2 * np.pi * 150 * np.arange(4000) / 8000), 8000),
    ("fs22050", lambda: np.sin(2 * np.pi * 150 * np.arange(11025) / 22050),
     22050),
    ("fs44100", lambda: np.sin(2 * np.pi * 150 * np.arange(22050) / 44100),
     44100),
    ("huge_amp", lambda: 1e6 * np.sin(2 * np.pi * 150 * np.arange(8000)
                                      / 16000), 16000),
])
def test_analysis_synthesis_robust_to_hostile_input(name, make, fs):
    """Arbitrary user wavs must not crash or emit non-finite output:
    silence, sub-window signals, non-16k rates, extreme amplitude."""
    x = make()
    f0, sp, ap = analyze(x, fs)
    assert np.isfinite(sp).all() and np.isfinite(ap).all()
    assert len(f0) == len(x) // hop_samples(fs)
    y = synthesize(f0, sp, ap, fs)
    assert np.isfinite(y).all()
    if name == "silence":
        assert (f0 == 0).all()
    if name.startswith("fs"):
        v = f0[5:-5]
        assert abs(np.median(v[v > 0]) - 150.0) < 6.0


# ---------------------------------------------------------------------------
# Known-truth ACCURACY bounds (SURVEY.md §7 hard-part #3; VERDICT r1 #7).
# Unlike the property/roundtrip tests above, these assert numeric error
# bounds against exactly-known ground truth. Measured on this
# implementation: F0 RMSE ~3.4 cents, V/UV error ~3.2%, envelope LSD
# ~0.14 dB — bounds below carry ~3x headroom, so they catch real
# regressions (a broken DIO candidate picker or CheapTrick smoother
# blows through them) without being flaky.

@pytest.mark.parametrize("f0_method", ["dio", "harvest"])
def test_f0_rmse_cents_on_pitch_glide(f0_method):
    """Gliding pitch 100->200 Hz with exact instantaneous F0: both
    estimators must track within 10 cents RMSE (25 cents worst frame).
    Measured: dio 3.4 / harvest 3.7 cents RMSE."""
    T = int(FS * 0.8)
    f0_true_t = np.linspace(100, 200, T)
    phase = np.cumsum(f0_true_t / FS)
    pulses = np.diff(np.floor(phase), prepend=0.0)
    x = lfilter([1.0], [1.0, -1.8 * np.cos(2 * np.pi * 500 / FS), 0.9],
                pulses)
    x = x / np.abs(x).max()
    f0, _, _ = analyze(x, FS, f0_method=f0_method)
    hop = hop_samples(FS)
    truth = np.interp(np.arange(len(f0)) * hop, np.arange(T), f0_true_t)
    est, tr = f0[10:-10], truth[10:-10]
    voiced = est > 0
    assert voiced.mean() > 0.95  # a glide is fully voiced
    cents = 1200 * np.log2(est[voiced] / tr[voiced])
    rmse = np.sqrt((cents ** 2).mean())
    assert rmse < 10.0, f"F0 RMSE {rmse:.1f} cents"
    assert np.abs(cents).max() < 25.0, \
        f"worst frame {np.abs(cents).max():.1f} cents"


@pytest.mark.parametrize("f0_method,bound", [("dio", 0.10),
                                             ("harvest", 0.05)])
def test_vuv_error_rate_on_alternating_segments(f0_method, bound):
    """voiced | noise | voiced with exact per-frame truth: V/UV decision
    error rate bound (boundary frames +-5 hops excluded). The harvest
    contour DP carries a tighter bound — its whole point is fewer V/UV
    errors (measured: dio 3.2%, harvest 1.9%)."""
    x = synth_vowel(f0=130.0, seconds=0.3)
    noise = 0.05 * np.random.default_rng(0).normal(size=len(x))
    sig = np.concatenate([x, noise, x])
    sig = sig / np.abs(sig).max()
    f0, _, _ = analyze(sig, FS, f0_method=f0_method)
    hop = hop_samples(FS)
    centers = np.arange(len(f0)) * hop
    b1, b2 = len(x), 2 * len(x)
    truth_voiced = (centers < b1) | (centers >= b2)
    keep = (np.abs(centers - b1) > 5 * hop) & \
           (np.abs(centers - b2) > 5 * hop)
    err = (((f0 > 0) != truth_voiced) & keep).sum() / keep.sum()
    assert err < bound, f"V/UV error rate {err:.3f} ({f0_method})"


def test_harvest_no_octave_flips_with_strong_second_harmonic():
    """A dominant 2nd harmonic is the classic octave-flip trap; the
    contour DP must hold the true fundamental (no frame > 600 cents
    off), and stay within 15 cents RMSE elsewhere."""
    T = int(FS * 0.6)
    f0c = 120.0
    ph = np.cumsum(np.full(T, f0c / FS))
    sig = (0.3 * np.sin(2 * np.pi * ph) + 1.0 * np.sin(4 * np.pi * ph)
           + 0.02 * np.random.default_rng(1).normal(size=T))
    sig = sig / np.abs(sig).max()
    f0, _, _ = analyze(sig, FS, f0_method="harvest")
    est = f0[10:-10]
    voiced = est > 0
    assert voiced.mean() > 0.9
    cents = 1200 * np.log2(est[voiced] / f0c)
    assert np.abs(cents).max() < 600.0, "octave flip"
    assert np.sqrt((cents ** 2).mean()) < 15.0


def test_harvest_fills_short_gaps_keeps_long_ones():
    """Harvest gap-filling: a <=3-frame dropout inside a voiced stretch
    is bridged; a long unvoiced stretch is NOT painted voiced."""
    hop = hop_samples(FS)
    x = synth_vowel(f0=140.0, seconds=0.5)
    # punch a 2-hop hole of silence in the middle
    mid = len(x) // 2
    x2 = x.copy()
    x2[mid:mid + 2 * hop] = 0.0
    f0, _, _ = analyze(x2, FS, f0_method="harvest")
    inner = f0[10:-10]
    assert (inner > 0).mean() > 0.97, "short gap not bridged"
    # long noise tail must stay unvoiced
    noise = 0.05 * np.random.default_rng(2).normal(size=len(x))
    f0n, _, _ = analyze(np.concatenate([x, noise]) / np.abs(x).max(),
                        FS, f0_method="harvest")
    tail = f0n[len(f0n) // 2 + 10:-5]
    assert (tail == 0).mean() > 0.9, "long unvoiced stretch painted voiced"


def test_envelope_log_spectral_distortion_bound(vowel_analysis):
    """CheapTrick envelope vs the EXACT all-pole synthesis-filter
    response (gain-normalized log-spectral distortion per voiced frame):
    mean < 0.5 dB, p90 < 1.0 dB."""
    _, (f0, sp, ap) = vowel_analysis
    F = sp.shape[1]
    freqs = np.arange(F) * FS / ((F - 1) * 2)
    w = 2 * np.pi * freqs / FS
    H = 1.0 / np.abs(1 - 1.8 * np.cos(2 * np.pi * 500 / FS)
                     * np.exp(-1j * w) + 0.9 * np.exp(-2j * w)) ** 2
    logH = 10 * np.log10(H + 1e-12)
    voiced = np.where(f0 > 0)[0][10:-10]
    lsd = []
    for i in voiced:
        d = 10 * np.log10(sp[i] + 1e-12) - logH
        d = d - d.mean()  # envelope shape, not gain
        lsd.append(np.sqrt((d ** 2).mean()))
    assert np.mean(lsd) < 0.5, f"mean LSD {np.mean(lsd):.3f} dB"
    assert np.percentile(lsd, 90) < 1.0, \
        f"p90 LSD {np.percentile(lsd, 90):.3f} dB"


def test_analyze_audio_shorter_than_one_hop():
    """n_frames == 0 (audio < one hop) must return empty features, not
    corrupt the heap (ADVICE r2: harvest's Viterbi backtrack wrote
    path[-1] on an empty vector)."""
    x = np.random.default_rng(0).normal(size=40)  # hop = 80 @ 16 kHz/5 ms
    for method in ("dio", "harvest"):
        f0, sp, ap = analyze(x, 16000, f0_method=method)
        assert f0.shape == (0,)
        assert sp.shape[0] == 0 and ap.shape[0] == 0


# ---------------------------------------------------------------------------
# Quantified analysis bounds on RICH signals (VERDICT r2 next-step #3a):
# vibrato, jitter/shimmer, plosive transients, band-limited noise. Each
# pins an error METRIC (F0 RMSE in cents, V/UV error rate, envelope
# recovery) rather than a smoke assertion, for both F0 methods.

def _pulse_train(f0_t):
    phase = np.cumsum(f0_t / FS)
    return np.diff(np.floor(phase), prepend=0.0)


def _rms_cents(f0_est, f0_true):
    m = (f0_est > 0) & (f0_true > 0)
    assert m.mean() > 0.5
    return np.sqrt(np.mean(
        (1200.0 * np.log2(f0_est[m] / f0_true[m])) ** 2))


def _frame_f0(f0_t, n):
    hop = FS * 5 // 1000
    return np.array([f0_t[i * hop] for i in range(n)])


@pytest.mark.parametrize("method", ["dio", "harvest"])
def test_f0_bound_under_vibrato(method):
    """6 Hz, 3% vibrato around 150 Hz: frame-rate F0 must track the
    modulation with RMSE < 50 cents and >85% voiced."""
    T = int(FS * 0.8)
    t = np.arange(T) / FS
    f0_t = 150.0 * (1 + 0.03 * np.sin(2 * np.pi * 6.0 * t))
    x = lfilter([1.0], [1.0, -1.6, 0.81], _pulse_train(f0_t))
    x = x / np.abs(x).max()
    f0, _, _ = analyze(x, FS, f0_method=method)
    inner = slice(10, len(f0) - 10)
    assert (f0[inner] > 0).mean() > 0.85, method
    rmse = _rms_cents(f0[inner], _frame_f0(f0_t, len(f0))[inner])
    assert rmse < 50.0, (method, rmse)


@pytest.mark.parametrize("method", ["dio", "harvest"])
def test_f0_bound_under_jitter_and_shimmer(method):
    """1% per-period frequency jitter + 10% amplitude shimmer (rough
    voice): F0 RMSE < 60 cents, voiced rate > 80%."""
    rng = np.random.default_rng(4)
    T = int(FS * 0.8)
    # piecewise-constant per ~10 ms jitter around 130 Hz
    n_seg = T // (FS // 100) + 1
    jit = np.repeat(1 + 0.01 * rng.normal(size=n_seg), FS // 100)[:T]
    f0_t = 130.0 * jit
    x = lfilter([1.0], [1.0, -1.7, 0.85], _pulse_train(f0_t))
    shim = np.repeat(1 + 0.1 * rng.normal(size=n_seg), FS // 100)[:T]
    x = x * np.abs(shim)
    x = x / np.abs(x).max()
    f0, _, _ = analyze(x, FS, f0_method=method)
    inner = slice(10, len(f0) - 10)
    assert (f0[inner] > 0).mean() > 0.8, method
    rmse = _rms_cents(f0[inner], _frame_f0(f0_t, len(f0))[inner])
    assert rmse < 60.0, (method, rmse)


@pytest.mark.parametrize("method", ["dio", "harvest"])
def test_vuv_bound_across_plosive_transient(method):
    """silence | noise burst (plosive) | vowel: the voiced region must
    be detected voiced (>85%), the burst+silence unvoiced (>90%), i.e.
    a bounded V/UV error rate across a hard transient."""
    rng = np.random.default_rng(5)
    sil = np.zeros(int(FS * 0.15))
    burst = rng.normal(size=int(FS * 0.03)) * np.hanning(int(FS * 0.03))
    vowel = synth_vowel(f0=140.0, seconds=0.5)
    x = np.concatenate([sil, burst, vowel])
    x = x / np.abs(x).max()
    f0, _, _ = analyze(x, FS, f0_method=method)
    hop = FS * 5 // 1000
    n_pre = (len(sil) + len(burst)) // hop
    pre, post = f0[:n_pre - 2], f0[n_pre + 10:-10]
    assert (pre == 0).mean() > 0.9, (method, (pre == 0).mean())
    assert (post > 0).mean() > 0.85, (method, (post > 0).mean())


@pytest.mark.parametrize("method", ["dio", "harvest"])
def test_band_limited_noise_is_unvoiced(method):
    """Band-limited noise (fricative-like) must be >90% unvoiced —
    resonant noise is the classic false-voicing trap."""
    rng = np.random.default_rng(6)
    x = lfilter([1.0], [1.0, -2 * 0.9 * np.cos(2 * np.pi * 2500 / FS),
                        0.81], rng.normal(size=int(FS * 0.6)))
    x = x / np.abs(x).max()
    f0, _, ap = analyze(x, FS, f0_method=method)
    assert (f0 == 0).mean() > 0.9, (method, (f0 == 0).mean())
    # aperiodicity must also say "noise" in the band
    assert np.median(ap) > 0.5


def test_envelope_recovery_under_moving_formant():
    """Formant glide 400->900 Hz over 0.6 s: per-frame envelope peak
    must track the true resonance within 20% through the glide (a
    dynamic-envelope bound, complementing the static-vowel LSD test)."""
    T = int(FS * 0.6)
    f0_t = np.full(T, 120.0)
    exc = _pulse_train(f0_t)
    res_t = np.linspace(400.0, 900.0, T)
    # block-constant filter over 10 ms hops with carried state
    y = np.zeros(T)
    zi = None
    blk = FS // 100
    for i in range(0, T, blk):
        r = res_t[min(i + blk // 2, T - 1)]
        a = [1.0, -2 * 0.92 * np.cos(2 * np.pi * r / FS), 0.92 ** 2]
        seg = exc[i:i + blk]
        if zi is None:
            from scipy.signal import lfiltic
            zi = lfiltic([1.0], a, [0.0])
        seg_y, zi = lfilter([1.0], a, seg, zi=zi)
        y[i:i + len(seg_y)] = seg_y
    y = y / np.abs(y).max()
    f0, sp, ap = analyze(y, FS)
    hop = FS * 5 // 1000
    fft_size = (sp.shape[1] - 1) * 2
    freqs = np.arange(sp.shape[1]) * FS / fft_size
    ok = 0
    checked = 0
    for fr in range(12, sp.shape[0] - 12, 4):
        true_r = res_t[min(fr * hop, T - 1)]
        # peak of the envelope within the speech band
        band = (freqs > 150) & (freqs < 2000)
        peak = freqs[band][np.argmax(sp[fr][band])]
        checked += 1
        ok += abs(peak - true_r) / true_r < 0.2
    assert checked >= 20
    assert ok / checked > 0.8, ok / checked
