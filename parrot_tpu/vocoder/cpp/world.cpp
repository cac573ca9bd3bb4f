// world.cpp — self-contained WORLD-style vocoder: analysis (DIO-style F0,
// CheapTrick-style spectral envelope, band aperiodicity) and synthesis.
//
// TPU-native equivalent of the reference's external C++ WORLD dependency
// (SURVEY.md §2.3 N1; reference uses the Morise WORLD library behind a thin
// Python wrapper — mount empty at build time). This is an independent
// implementation of the published algorithms (Morise et al. 2016), written
// fresh for this framework:
//   * F0: DIO-style multi-band zero-crossing/extrema interval estimator
//     with agreement-based reliability scoring and median smoothing.
//   * Spectral envelope: CheapTrick-style pitch-adaptive windowing,
//     frequency-domain smoothing and cepstral liftering.
//   * Aperiodicity: band autocorrelation estimator (D4C-lite: same
//     interface and output range as D4C's band aperiodicity).
//   * Synthesis: zero-phase minimum-artifact OLA with pulse-train +
//     LCG-noise excitation, split by per-bin aperiodicity. The algorithm
//     is specified exactly so the JAX path (jax_synthesis.py) matches it
//     to float32 roundoff (bitwise for the pulse/noise excitations);
//     keep both in sync.
//
// Exposed via a C ABI for ctypes (no pybind11 in this image).

#include <cmath>
#include <complex>
#include <cstdint>
#include <cstring>
#include <vector>

using std::vector;
using cplx = std::complex<double>;

static const double kPi = 3.141592653589793238462643383279502884;

// ---------------------------------------------------------------------------
// FFT: iterative radix-2 complex, power-of-two sizes.
// ---------------------------------------------------------------------------
static void fft_inplace(vector<cplx> &a, bool inverse) {
  const size_t n = a.size();
  if (n <= 1) return;
  // bit reversal
  for (size_t i = 1, j = 0; i < n; ++i) {
    size_t bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) std::swap(a[i], a[j]);
  }
  for (size_t len = 2; len <= n; len <<= 1) {
    double ang = 2.0 * kPi / (double)len * (inverse ? 1.0 : -1.0);
    cplx wl(std::cos(ang), std::sin(ang));
    for (size_t i = 0; i < n; i += len) {
      cplx w(1.0, 0.0);
      for (size_t k = 0; k < len / 2; ++k) {
        cplx u = a[i + k];
        cplx v = a[i + k + len / 2] * w;
        a[i + k] = u + v;
        a[i + k + len / 2] = u - v;
        w *= wl;
      }
    }
  }
  if (inverse) {
    for (auto &x : a) x /= (double)n;
  }
}

static size_t next_pow2(size_t n) {
  size_t p = 1;
  while (p < n) p <<= 1;
  return p;
}

// real FFT: x (n real, n pow2) -> n/2+1 complex bins
static void rfft(const vector<double> &x, vector<cplx> &out) {
  vector<cplx> a(x.size());
  for (size_t i = 0; i < x.size(); ++i) a[i] = cplx(x[i], 0.0);
  fft_inplace(a, false);
  out.assign(a.begin(), a.begin() + x.size() / 2 + 1);
}

// inverse real FFT: F = n/2+1 bins -> n real samples
static void irfft(const vector<cplx> &spec, size_t n, vector<double> &out) {
  vector<cplx> a(n);
  for (size_t i = 0; i < spec.size(); ++i) a[i] = spec[i];
  for (size_t i = spec.size(); i < n; ++i) a[i] = std::conj(a[n - i]);
  fft_inplace(a, true);
  out.resize(n);
  for (size_t i = 0; i < n; ++i) out[i] = a[i].real();
}

// ---------------------------------------------------------------------------
// FIR low-pass via FFT convolution (windowed sinc, Hann), same length output.
// ---------------------------------------------------------------------------
static void lowpass(const vector<double> &x, double cutoff_hz, int fs,
                    vector<double> &y) {
  int half = (int)(3.0 * fs / cutoff_hz);
  if (half < 2) half = 2;
  int taps = 2 * half + 1;
  vector<double> h(taps);
  double fc = cutoff_hz / fs;  // normalized
  double sum = 0.0;
  for (int i = 0; i < taps; ++i) {
    int m = i - half;
    double s = (m == 0) ? 2.0 * fc
                        : std::sin(2.0 * kPi * fc * m) / (kPi * m);
    double w = 0.5 - 0.5 * std::cos(2.0 * kPi * i / (taps - 1));
    h[i] = s * w;
    sum += h[i];
  }
  for (auto &v : h) v /= sum;  // unity DC gain

  size_t n = next_pow2(x.size() + taps);
  vector<cplx> X(n), H(n);
  for (size_t i = 0; i < x.size(); ++i) X[i] = cplx(x[i], 0.0);
  for (int i = 0; i < taps; ++i) H[i] = cplx(h[i], 0.0);
  fft_inplace(X, false);
  fft_inplace(H, false);
  for (size_t i = 0; i < n; ++i) X[i] *= H[i];
  fft_inplace(X, true);
  y.resize(x.size());
  for (size_t i = 0; i < x.size(); ++i) y[i] = X[i + half].real();
}

// ---------------------------------------------------------------------------
// DIO-style F0 estimation.
// ---------------------------------------------------------------------------
struct EventIntervals {
  vector<double> t;   // midpoint times (s)
  vector<double> f0;  // instantaneous f0 (Hz)
};

static void intervals_from_events(const vector<double> &ev, int fs,
                                  EventIntervals &out) {
  out.t.clear();
  out.f0.clear();
  for (size_t i = 1; i < ev.size(); ++i) {
    double dt = (ev[i] - ev[i - 1]) / fs;
    if (dt <= 0) continue;
    out.t.push_back(0.5 * (ev[i] + ev[i - 1]) / fs);
    out.f0.push_back(1.0 / dt);
  }
}

// linear interpolation of (t, v) at time q; clamped at ends
static double interp_at(const vector<double> &t, const vector<double> &v,
                        double q) {
  if (t.empty()) return 0.0;
  if (q <= t.front()) return v.front();
  if (q >= t.back()) return v.back();
  size_t lo = 0, hi = t.size() - 1;
  while (hi - lo > 1) {
    size_t mid = (lo + hi) / 2;
    if (t[mid] <= q) lo = mid; else hi = mid;
  }
  double a = (q - t[lo]) / (t[hi] - t[lo]);
  return v[lo] * (1 - a) + v[hi] * a;
}

static void zero_crossings(const vector<double> &x, bool positive,
                           vector<double> &ev) {
  ev.clear();
  for (size_t i = 1; i < x.size(); ++i) {
    bool cross = positive ? (x[i - 1] < 0 && x[i] >= 0)
                          : (x[i - 1] > 0 && x[i] <= 0);
    if (cross) {
      double frac = x[i - 1] / (x[i - 1] - x[i]);  // linear refine
      ev.push_back((double)(i - 1) + frac);
    }
  }
}

static void extrema(const vector<double> &x, bool peaks, vector<double> &ev) {
  ev.clear();
  for (size_t i = 1; i + 1 < x.size(); ++i) {
    bool hit = peaks ? (x[i] > x[i - 1] && x[i] >= x[i + 1] && x[i] > 0)
                     : (x[i] < x[i - 1] && x[i] <= x[i + 1] && x[i] < 0);
    if (hit) ev.push_back((double)i);
  }
}

// Per-band interval-agreement candidates shared by world_dio and
// world_harvest. For each low-pass band: estimate instantaneous f0 from
// four event streams (both zero-crossing directions + both extrema) and
// score each frame by the streams' coefficient of variation. Invalid
// candidates keep cand=0 / score=1e9.
static void band_candidates(const vector<double> &x, int fs, int hop,
                            int n_frames, double f0_floor, double f0_ceil,
                            const vector<double> &bounds,
                            vector<vector<double>> &cand,
                            vector<vector<double>> &score) {
  int NB = (int)bounds.size();
  cand.assign(NB, vector<double>(n_frames, 0.0));
  score.assign(NB, vector<double>(n_frames, 1e9));

  vector<double> filt, ev;
  EventIntervals streams[4];
  for (int b = 0; b < NB; ++b) {
    lowpass(x, bounds[b] * 1.1, fs, filt);
    zero_crossings(filt, true, ev);
    intervals_from_events(ev, fs, streams[0]);
    zero_crossings(filt, false, ev);
    intervals_from_events(ev, fs, streams[1]);
    extrema(filt, true, ev);
    intervals_from_events(ev, fs, streams[2]);
    extrema(filt, false, ev);
    intervals_from_events(ev, fs, streams[3]);

    for (int i = 0; i < n_frames; ++i) {
      double tq = (double)i * hop / fs;
      double est[4], mean = 0.0;
      int ok = 0;
      for (int s = 0; s < 4; ++s) {
        est[s] = interp_at(streams[s].t, streams[s].f0, tq);
        if (est[s] > 0) { mean += est[s]; ok++; }
      }
      if (ok < 4) continue;
      mean /= 4.0;
      if (mean < f0_floor || mean > f0_ceil) continue;
      // fundamental must be within this band's passband
      if (mean > bounds[b] * 1.05 || mean < bounds[b] * 0.45) continue;
      double var = 0.0;
      for (int s = 0; s < 4; ++s) var += (est[s] - mean) * (est[s] - mean);
      double cv = std::sqrt(var / 4.0) / mean;  // coeff of variation
      cand[b][i] = mean;
      score[b][i] = cv;
    }
  }
}

// normalized autocorrelation of xlp at `lag` samples around `center`
// (window = +-lag, clipped to the signal)
static double norm_autocorr(const vector<double> &xlp, int T, int center,
                            int lag) {
  double r01 = 0.0, r00 = 1e-12, r11 = 1e-12;
  for (int m = -lag; m <= lag; ++m) {
    int a0 = center + m, a1 = center + m + lag;
    if (a0 < 0 || a1 < 0 || a0 >= T || a1 >= T) continue;
    r01 += xlp[a0] * xlp[a1];
    r00 += xlp[a0] * xlp[a0];
    r11 += xlp[a1] * xlp[a1];
  }
  return r01 / std::sqrt(r00 * r11);
}

extern "C" int world_dio(const double *x_in, int T, int fs,
                         double frame_period_ms, double f0_floor,
                         double f0_ceil, double *f0_out, int n_frames) {
  if (n_frames <= 0) return 0;  // audio shorter than one hop: nothing to do
  vector<double> x(x_in, x_in + T);
  int hop = (int)std::lround(fs * frame_period_ms / 1000.0);
  if (hop <= 0) return -1;

  // candidate bands: half-octave-spaced low-pass cutoffs; finer spacing
  // keeps some cutoff just above any true f0 so the 2nd harmonic is
  // attenuated before interval estimation.
  vector<double> bounds;
  for (double b = f0_floor * 1.0; b < f0_ceil * 1.5; b *= 1.41421356237)
    bounds.push_back(b);

  int NB = (int)bounds.size();
  vector<vector<double>> cand, score;
  band_candidates(x, fs, hop, n_frames, f0_floor, f0_ceil, bounds,
                  cand, score);

  // add temporal-jitter penalty: narrowband noise matches across event
  // types instantaneously but wanders over time; a true fundamental is
  // stable across neighbouring frames as well.
  for (int b = 0; b < NB; ++b) {
    vector<double> base = cand[b];
    for (int i = 0; i < n_frames; ++i) {
      if (base[i] <= 0) continue;
      double vals[5];
      int cnt = 0;
      for (int k = -2; k <= 2; ++k) {
        int j = i + k;
        if (j < 0 || j >= n_frames || base[j] <= 0) continue;
        vals[cnt++] = base[j];
      }
      if (cnt < 3) { score[b][i] = 1e9; continue; }
      double mean = 0.0, var = 0.0;
      for (int k = 0; k < cnt; ++k) mean += vals[k];
      mean /= cnt;
      for (int k = 0; k < cnt; ++k) {
        double d = vals[k] - mean;
        var += d * d;
      }
      score[b][i] += std::sqrt(var / cnt) / mean;
    }
  }

  // select best candidate per frame; voiced iff agreement is tight AND the
  // signal is actually periodic at that lag (normalized autocorrelation on
  // a low-passed copy — rejects narrowband noise whose interval estimates
  // agree by construction).
  const double kVoicedCv = 0.12;
  const double kMinPeriodicity = 0.45;
  vector<double> xlp;
  lowpass(x, 1200.0, fs, xlp);
  vector<double> f0(n_frames, 0.0);
  for (int i = 0; i < n_frames; ++i) {
    double best = 1e9, bf = 0.0;
    for (int b = 0; b < NB; ++b) {
      if (score[b][i] < best) { best = score[b][i]; bf = cand[b][i]; }
    }
    if (best >= kVoicedCv || bf <= 0) continue;
    int lag0 = (int)std::lround((double)fs / bf);
    int center = i * hop;
    double rbest = -1.0;
    for (int dl = -1; dl <= 1; ++dl) {
      int lag = lag0 + dl;
      if (lag < 2) continue;
      double r = norm_autocorr(xlp, T, center, lag);
      if (r > rbest) rbest = r;
    }
    f0[i] = (rbest > kMinPeriodicity) ? bf : 0.0;
  }
  // median-of-5 smoothing to remove single-frame flips
  vector<double> sm(f0);
  for (int i = 0; i < n_frames; ++i) {
    double w[5];
    int c = 0;
    for (int k = -2; k <= 2; ++k) {
      int j = i + k;
      if (j < 0) j = 0;
      if (j >= n_frames) j = n_frames - 1;
      w[c++] = f0[j];
    }
    for (int a = 0; a < 5; ++a)
      for (int bq = a + 1; bq < 5; ++bq)
        if (w[bq] < w[a]) std::swap(w[a], w[bq]);
    sm[i] = w[2];
  }
  std::memcpy(f0_out, sm.data(), sizeof(double) * n_frames);
  return 0;
}

// ---------------------------------------------------------------------------
// Harvest-style F0 estimation: multi-candidate + contour Viterbi.
//
// Same role as WORLD's Harvest (Morise 2017): fewer V/UV errors and more
// stable contours than DIO. Independent implementation, different
// mechanics from world_dio above:
//   1. finer band grid (1/3-octave) -> several f0 candidates per frame;
//   2. each candidate scored by stream agreement (cv) AND signal
//      periodicity at its lag (normalized autocorrelation);
//   3. a Viterbi DP over frames selects one contour: states are the
//      per-frame candidates plus an explicit UNVOICED state; transitions
//      penalize log-frequency jumps and voicing flips, so isolated
//      octave errors and one-frame V/UV flips are priced out instead of
//      median-filtered out;
//   4. voiced frames are refined to sub-sample lag precision by a
//      parabolic fit on the autocorrelation peak;
//   5. short interior unvoiced gaps between compatible voiced stretches
//      are filled by interpolation (Harvest's gap filling).
// ---------------------------------------------------------------------------
extern "C" int world_harvest(const double *x_in, int T, int fs,
                             double frame_period_ms, double f0_floor,
                             double f0_ceil, double *f0_out, int n_frames) {
  // n_frames == 0 would make the Viterbi backtrack below write
  // path[-1] on an empty vector (heap corruption); bail out first
  if (n_frames <= 0) return 0;
  vector<double> x(x_in, x_in + T);
  int hop = (int)std::lround(fs * frame_period_ms / 1000.0);
  if (hop <= 0) return -1;

  // 1/3-octave band grid (denser than DIO's half-octave grid)
  vector<double> bounds;
  for (double b = f0_floor; b < f0_ceil * 1.5; b *= 1.25992104989)
    bounds.push_back(b);
  int NB = (int)bounds.size();

  vector<vector<double>> cand, cv;
  band_candidates(x, fs, hop, n_frames, f0_floor, f0_ceil, bounds, cand, cv);

  // periodicity per candidate (best normalized autocorrelation over
  // lag0 +- 1); also remember the best integer lag for refinement
  vector<double> xlp;
  lowpass(x, 1200.0, fs, xlp);
  vector<vector<double>> pr(NB, vector<double>(n_frames, -1.0));
  vector<vector<int>> prlag(NB, vector<int>(n_frames, 0));
  for (int b = 0; b < NB; ++b) {
    for (int i = 0; i < n_frames; ++i) {
      if (cand[b][i] <= 0) continue;
      int lag0 = (int)std::lround((double)fs / cand[b][i]);
      int center = i * hop;
      double rbest = -1.0;
      int lbest = lag0;
      for (int dl = -1; dl <= 1; ++dl) {
        int lag = lag0 + dl;
        if (lag < 3) continue;
        double r = norm_autocorr(xlp, T, center, lag);
        if (r > rbest) { rbest = r; lbest = lag; }
      }
      pr[b][i] = rbest;
      prlag[b][i] = lbest;
    }
  }

  // Viterbi over (candidate | unvoiced) states.
  // emission(voiced cand)  = w_cv*cv + w_ap*(1 - r)
  // emission(unvoiced)     = kUv
  // transition v->v        = kJump * |log2(f_t / f_{t-1})| (soft-capped)
  // transition v<->uv      = kSwitch
  const double kWcv = 1.0, kWap = 0.6;
  const double kUv = 0.42;          // cost of calling a frame unvoiced
  const double kJump = 1.8;         // per-octave continuity penalty
  const double kJumpCap = 2.5;      // cap: allow genuine contour restarts
  const double kSwitch = 0.35;      // voicing flip penalty
  const double kBig = 1e18;
  int NS = NB + 1;                  // state NB = unvoiced
  vector<double> prev_cost(NS, kBig), cur_cost(NS, kBig);
  vector<vector<int>> back(n_frames, vector<int>(NS, NB));

  auto emission = [&](int i, int s) -> double {
    if (s == NB) return kUv;
    if (cand[s][i] <= 0 || cv[s][i] >= 1e9) return kBig;
    return kWcv * cv[s][i] + kWap * (1.0 - pr[s][i]);
  };
  for (int s = 0; s < NS; ++s) prev_cost[s] = emission(0, s);
  for (int i = 1; i < n_frames; ++i) {
    for (int s = 0; s < NS; ++s) {
      double em = emission(i, s);
      if (em >= kBig) { cur_cost[s] = kBig; back[i][s] = NB; continue; }
      double best = kBig;
      int bs = NB;
      for (int sp = 0; sp < NS; ++sp) {
        if (prev_cost[sp] >= kBig) continue;
        double tr;
        if (s == NB && sp == NB) tr = 0.0;
        else if (s == NB || sp == NB) tr = kSwitch;
        else {
          double j = std::fabs(std::log2(cand[s][i] / cand[sp][i - 1]));
          tr = kJump * j;
          if (tr > kJumpCap) tr = kJumpCap;
        }
        double c = prev_cost[sp] + tr;
        if (c < best) { best = c; bs = sp; }
      }
      cur_cost[s] = best + em;
      back[i][s] = bs;
    }
    std::swap(prev_cost, cur_cost);
  }
  // backtrack
  vector<int> path(n_frames, NB);
  {
    double best = kBig;
    int bs = NB;
    for (int s = 0; s < NS; ++s)
      if (prev_cost[s] < best) { best = prev_cost[s]; bs = s; }
    path[n_frames - 1] = bs;
    for (int i = n_frames - 1; i > 0; --i)
      path[i - 1] = back[i][path[i]];
  }

  // voiced frames take the 4-stream interval mean (already sub-sample
  // precise via the linear zero-crossing refinement in zero_crossings);
  // the integer-lag autocorrelation only gates voicing — a parabolic
  // autocorrelation refinement measured WORSE on pitch glides (the
  // +-lag window smears a moving period), so the DP picks the contour
  // and the interval estimate supplies the value.
  vector<double> f0(n_frames, 0.0);
  for (int i = 0; i < n_frames; ++i) {
    int s = path[i];
    if (s == NB) continue;
    double f = cand[s][i];
    if (f >= f0_floor && f <= f0_ceil) f0[i] = f;
  }

  // fill short interior unvoiced gaps (<= 3 frames) between compatible
  // voiced neighbours (within 1/4 octave)
  const int kMaxGap = 3;
  for (int i = 1; i < n_frames; ++i) {
    if (f0[i] > 0 || f0[i - 1] <= 0) continue;
    int j = i;
    while (j < n_frames && f0[j] <= 0) ++j;
    if (j >= n_frames) break;
    int gap = j - i;
    if (gap <= kMaxGap &&
        std::fabs(std::log2(f0[j] / f0[i - 1])) < 0.25) {
      for (int k = i; k < j; ++k) {
        double a = (double)(k - (i - 1)) / (double)(j - (i - 1));
        f0[k] = f0[i - 1] * std::pow(f0[j] / f0[i - 1], a);
      }
    }
    i = j;
  }
  std::memcpy(f0_out, f0.data(), sizeof(double) * n_frames);
  return 0;
}

// ---------------------------------------------------------------------------
// CheapTrick-style spectral envelope.
// ---------------------------------------------------------------------------
extern "C" int world_cheaptrick(const double *x_in, int T, int fs,
                                const double *f0, int n_frames,
                                double frame_period_ms, int fft_size,
                                double *sp_out /* n_frames * (fft/2+1) */) {
  vector<double> x(x_in, x_in + T);
  int hop = (int)std::lround(fs * frame_period_ms / 1000.0);
  int F = fft_size / 2 + 1;
  const double kDefaultF0 = 500.0;  // unvoiced analysis f0

  vector<double> seg(fft_size), power(F), smoothed(F);
  vector<cplx> spec;
  for (int i = 0; i < n_frames; ++i) {
    double cf0 = f0[i] > 0 ? f0[i] : kDefaultF0;
    int half = (int)(1.5 * fs / cf0);  // window = 3 * T0
    if (2 * half + 1 > fft_size) half = (fft_size - 1) / 2;
    int center = i * hop;
    std::fill(seg.begin(), seg.end(), 0.0);
    double wsum = 0.0;
    for (int m = -half; m <= half; ++m) {
      int idx = center + m;
      double w = 0.5 + 0.5 * std::cos(kPi * m / (half + 1.0));  // Hann
      wsum += w * w;
      if (idx < 0 || idx >= T) continue;
      seg[(m + fft_size) % fft_size] = x[idx] * w;  // zero-phase packing
    }
    rfft(seg, spec);
    double norm = 1.0 / (wsum > 0 ? wsum : 1.0);
    for (int f = 0; f < F; ++f)
      power[f] = std::norm(spec[f]) * norm + 1e-12;

    // frequency-domain rectangular smoothing, width 2/3 * f0
    double width_hz = cf0 * 2.0 / 3.0;
    int width_bins = (int)std::lround(width_hz * fft_size / fs);
    if (width_bins < 1) width_bins = 1;
    for (int f = 0; f < F; ++f) {
      double acc = 0.0;
      int cnt = 0;
      for (int k = -width_bins; k <= width_bins; ++k) {
        int j = f + k;
        if (j < 0) j = -j;               // mirror at DC
        if (j >= F) j = 2 * (F - 1) - j; // mirror at Nyquist
        acc += power[j];
        cnt++;
      }
      smoothed[f] = acc / cnt;
    }

    // cepstral liftering (CheapTrick: smoothing + compensation lifter)
    vector<double> logspec_full(fft_size);
    for (int f = 0; f < F; ++f) logspec_full[f] = std::log(smoothed[f]);
    for (int f = F; f < fft_size; ++f)
      logspec_full[f] = logspec_full[fft_size - f];
    vector<cplx> cep(fft_size);
    for (int f = 0; f < fft_size; ++f) cep[f] = cplx(logspec_full[f], 0.0);
    fft_inplace(cep, false);
    const double q1 = -0.15, q0 = 1.0 - 2.0 * q1;
    for (int qi = 0; qi < fft_size; ++qi) {
      int qq = qi <= fft_size / 2 ? qi : fft_size - qi;
      double tau = (double)qq / fs;
      double arg = kPi * cf0 * tau;
      double smooth_l = (qq == 0) ? 1.0 : std::sin(arg) / arg;
      double comp_l = q0 + 2.0 * q1 * std::cos(2.0 * kPi * tau * cf0);
      cep[qi] *= smooth_l * comp_l / fft_size;  // fold inverse-FFT scale in
    }
    fft_inplace(cep, true);
    for (int f = 0; f < F; ++f)
      sp_out[(size_t)i * F + f] = std::exp(cep[f].real() * fft_size);
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Band aperiodicity (D4C-lite): frequency-domain harmonic/valley power
// ratio. A long (6*T0) window resolves individual harmonics; within each
// band the mean power at inter-harmonic valleys (k+1/2)*f0 over the mean
// power at harmonics k*f0 estimates the noise-to-periodic ratio (the same
// quantity D4C's band aperiodicity expresses). Unvoiced frames are fully
// aperiodic.
// ---------------------------------------------------------------------------
extern "C" int world_aperiodicity(const double *x_in, int T, int fs,
                                  const double *f0, int n_frames,
                                  double frame_period_ms, int fft_size,
                                  int n_bands,
                                  double *ap_out /* n_frames * (fft/2+1) */) {
  vector<double> x(x_in, x_in + T);
  int hop = (int)std::lround(fs * frame_period_ms / 1000.0);
  int F = fft_size / 2 + 1;
  // internal FFT long enough for a 6*T0 window at the lowest f0 we accept
  size_t fft_ap = next_pow2((size_t)(6.0 * fs / 60.0) + 1);
  int Fa = (int)fft_ap / 2 + 1;
  double bin_hz = (double)fs / (double)fft_ap;

  vector<double> seg(fft_ap), P(Fa);
  vector<cplx> spec;
  for (int i = 0; i < n_frames; ++i) {
    double cf0 = f0[i];
    double band_ap[64];
    if (cf0 <= 0) {
      for (int b = 0; b < n_bands; ++b) band_ap[b] = 0.999;
    } else {
      int half = (int)(3.0 * fs / cf0);  // window = 6 * T0
      if (2 * half + 1 > (int)fft_ap) half = ((int)fft_ap - 1) / 2;
      int center = i * hop;
      std::fill(seg.begin(), seg.end(), 0.0);
      for (int m = -half; m <= half; ++m) {
        int idx = center + m;
        if (idx < 0 || idx >= T) continue;
        double w = 0.5 + 0.5 * std::cos(kPi * m / (half + 1.0));
        seg[(m + (int)fft_ap) % (int)fft_ap] = x[idx] * w;
      }
      rfft(seg, spec);
      for (int f = 0; f < Fa; ++f) P[f] = std::norm(spec[f]) + 1e-30;

      double nyq = fs / 2.0;
      for (int b = 0; b < n_bands; ++b) {
        double lo_hz = nyq * b / n_bands, hi_hz = nyq * (b + 1) / n_bands;
        double peak = 0.0, valley = 0.0;
        int np = 0, nv = 0;
        for (int k = 1; k * cf0 < nyq; ++k) {
          double fh = k * cf0, fv = (k + 0.5) * cf0;
          if (fh >= lo_hz && fh < hi_hz) {
            int bin = (int)std::lround(fh / bin_hz);
            // harmonic may sit between bins: take local max over +-1
            double p = P[bin];
            if (bin > 0 && P[bin - 1] > p) p = P[bin - 1];
            if (bin + 1 < Fa && P[bin + 1] > p) p = P[bin + 1];
            peak += p;
            np++;
          }
          if (fv >= lo_hz && fv < hi_hz && fv < nyq) {
            int bin = (int)std::lround(fv / bin_hz);
            // valley: local min over +-1 (avoid harmonic skirts)
            double p = P[bin];
            if (bin > 0 && P[bin - 1] < p) p = P[bin - 1];
            if (bin + 1 < Fa && P[bin + 1] < p) p = P[bin + 1];
            valley += p;
            nv++;
          }
        }
        double ap;
        if (np == 0 || nv == 0) {
          ap = (b > 0) ? band_ap[b - 1] : 0.5;  // no harmonics in band
        } else {
          double ratio = (valley / nv) / (peak / np);
          if (ratio < 0.0) ratio = 0.0;
          if (ratio > 1.0) ratio = 1.0;
          ap = std::sqrt(ratio);
        }
        if (ap < 0.001) ap = 0.001;
        if (ap > 0.999) ap = 0.999;
        band_ap[b] = ap;
      }
    }
    for (int b = 0; b < n_bands; ++b) {
      int lo = (int)std::floor((double)b / n_bands * (F - 1));
      int hi = (int)std::floor((double)(b + 1) / n_bands * (F - 1));
      if (b == n_bands - 1) hi = F - 1;
      for (int f = lo; f <= hi; ++f)
        ap_out[(size_t)i * F + f] = band_ap[b];
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Synthesis. EXACT spec shared with parrot_tpu/vocoder/jax_synthesis.py —
// change both together.
//   hop = round(fs * frame_period_ms / 1000)
//   T = n_frames * hop
//   phase[t] = phase[t-1] + f0[frame(t)] / fs        (frame(t) = t // hop)
//   pulse at t iff floor(phase[t]) > floor(phase[t-1]); amp = sqrt(fs/f0)
//   noise: LCG u32 s <- s*1664525 + 1013904223, one step per sample t;
//          n[t] = (s / 2^32 * 2 - 1) * sqrt(3)      (unit variance)
//   per frame i: hv = irfft(sqrt(sp_i * (1-ap_i)));  hn = irfft(sqrt(sp_i * ap_i))
//                (zero-phase IRs, centered by rotating fft/2)
//   y += conv(excitation_segment_i, h_i) placed at i*hop - fft/2 (centered)
// ---------------------------------------------------------------------------
extern "C" int world_synthesize(const double *f0, const double *sp,
                                const double *ap, int n_frames, int F,
                                int fs, double frame_period_ms, int fft_size,
                                uint32_t noise_seed, double *y_out /* T */) {
  if (F != fft_size / 2 + 1) return -1;
  int hop = (int)std::lround(fs * frame_period_ms / 1000.0);
  int T = n_frames * hop;

  // excitations
  vector<double> ev(T, 0.0), en(T, 0.0);
  double phase = 0.0;
  double prev_floor = 0.0;
  uint32_t s = noise_seed;
  const double inv32 = 1.0 / 4294967296.0;
  const double sqrt3 = std::sqrt(3.0);
  for (int t = 0; t < T; ++t) {
    int fr = t / hop;
    double f = f0[fr];
    if (f > 0) {
      phase += f / fs;
      double fl = std::floor(phase);
      if (fl > prev_floor) ev[t] = std::sqrt((double)fs / f);
      prev_floor = fl;
    }
    s = s * 1664525u + 1013904223u;
    en[t] = ((double)s * inv32 * 2.0 - 1.0) * sqrt3;
  }

  // per-frame OLA
  vector<double> y(T + fft_size, 0.0);  // padded; centered offset below
  vector<cplx> spec_v(F), spec_n(F);
  vector<double> hv, hn;
  size_t cn = next_pow2((size_t)(hop + 2 * fft_size));  // conv FFT size
  vector<cplx> A(cn), B(cn);

  for (int i = 0; i < n_frames; ++i) {
    const double *spi = sp + (size_t)i * F;
    const double *api = ap + (size_t)i * F;
    for (int f = 0; f < F; ++f) {
      double p = spi[f] < 0 ? 0.0 : spi[f];
      double a = api[f];
      if (a < 0) a = 0;
      if (a > 1) a = 1;
      spec_v[f] = cplx(std::sqrt(p * (1.0 - a)), 0.0);
      spec_n[f] = cplx(std::sqrt(p * a), 0.0);
    }
    irfft(spec_v, fft_size, hv);
    irfft(spec_n, fft_size, hn);
    // zero-phase -> centered: rotate by fft_size/2
    // (irfft of a real spectrum is symmetric around 0; center at fft/2)
    vector<double> hvc(fft_size), hnc(fft_size);
    for (int k = 0; k < fft_size; ++k) {
      int src = (k + fft_size / 2) % fft_size;
      hvc[k] = hv[src];
      hnc[k] = hn[src];
    }

    // segment excitation for this frame
    int lo = i * hop;
    std::fill(A.begin(), A.end(), cplx(0, 0));
    std::fill(B.begin(), B.end(), cplx(0, 0));
    for (int t = 0; t < hop; ++t) {
      if (lo + t < T) {
        A[t] = cplx(ev[lo + t], 0.0);
        B[t] = cplx(en[lo + t], 0.0);
      }
    }
    vector<cplx> HV(cn, cplx(0, 0)), HN(cn, cplx(0, 0));
    for (int k = 0; k < fft_size; ++k) {
      HV[k] = cplx(hvc[k], 0.0);
      HN[k] = cplx(hnc[k], 0.0);
    }
    fft_inplace(A, false);
    fft_inplace(B, false);
    fft_inplace(HV, false);
    fft_inplace(HN, false);
    for (size_t k = 0; k < cn; ++k) A[k] = A[k] * HV[k] + B[k] * HN[k];
    fft_inplace(A, true);

    // add at lo - fft/2 (IR centered at fft/2)
    int base = lo - fft_size / 2;
    int conv_len = hop + fft_size;
    for (int t = 0; t < conv_len; ++t) {
      int idx = base + t;
      if (idx >= 0 && idx < T) y[idx] += A[t].real();
    }
  }
  std::memcpy(y_out, y.data(), sizeof(double) * T);
  return 0;
}

extern "C" int world_get_fft_size(int fs, double f0_floor) {
  int need = (int)(3.0 * fs / f0_floor) + 1;
  int p = 1;
  while (p < need) p <<= 1;
  return p;
}
