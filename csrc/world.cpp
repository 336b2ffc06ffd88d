// Native F0 extractor: DIO-style multi-band interval candidates + local
// autocorrelation refinement (StoneMask-style), replacing the reference's
// pyworld C++ dependency (reference call site: preprocessor.py:215-220).
//
// Algorithm sketch (WORLD DIO, Morise 2009):
//   1. low-pass the signal at several log-spaced cutoffs;
//   2. in each band, measure four event-interval series (zero-crossing up /
//      down, peak / dip intervals) -> per-frame F0 candidate + reliability
//      (stddev of the four estimates);
//   3. pick the most reliable candidate per frame within [floor, ceil];
//   4. refine each voiced frame by parabolic-interpolated normalized
//      autocorrelation around the candidate lag (StoneMask role);
//   5. median-smooth and kill isolated voiced frames.
//
// Exported C ABI: dio_stonemask(...) -> 0 on success.
//
// Measured accuracy envelope (tests/test_f0_envelope.py, synthetic
// additive-harmonic voices at 22.05 kHz, hop 256; this is a DIO-*style*
// original, not a pyworld port — real-corpus divergence from pyworld is
// unestablished until a golden fixture drops, see the test file's hook):
//   vibrato 180 Hz +-3% @6 Hz . median < 35 cents, voiced recall > 0.9
//   2% jitter + 10% shimmer .. median < 60 cents, octave jumps < 5%
//   white noise 20/10/5 dB ... median < 30/40/60 cents,
//                              recall > 0.9/0.8/0.6
//   75 Hz, dominant 2nd harm . >70% of frames within 100 cents of the
//                              true fundamental (octave-doubling guard in
//                              refine_f0; 70 Hz itself is below the
//                              pyworld-matching 71 Hz default floor)
//   voicing boundaries ....... localized within ~4 frames; >85% voicing
//                              agreement with the numpy YIN cross-check

#include <cmath>
#include <cstring>
#include <vector>
#include <algorithm>

namespace {

struct Events {
  std::vector<double> times;  // event times in seconds
};

// windowed-sinc low-pass FIR
static std::vector<double> lowpass(const double* x, int n, double fs,
                                   double cutoff) {
  int half = (int)std::ceil(fs / cutoff);  // ~1 period worth of taps
  if (half < 8) half = 8;
  if (half > 256) half = 256;
  int taps = 2 * half + 1;
  std::vector<double> h(taps);
  double sum = 0.0;
  for (int i = 0; i < taps; ++i) {
    int m = i - half;
    double sinc = (m == 0) ? 2.0 * cutoff / fs
                           : std::sin(2.0 * M_PI * cutoff * m / fs) /
                                 (M_PI * m);
    double win = 0.54 - 0.46 * std::cos(2.0 * M_PI * i / (taps - 1));
    h[i] = sinc * win;
    sum += h[i];
  }
  for (auto& v : h) v /= sum;
  std::vector<double> y(n, 0.0);
  for (int i = 0; i < n; ++i) {
    double acc = 0.0;
    int lo = std::max(0, i - half), hi = std::min(n - 1, i + half);
    for (int j = lo; j <= hi; ++j) acc += x[j] * h[i - j + half];
    y[i] = acc;
  }
  return y;
}

// negative->positive zero crossings (event_sign=+1) or pos->neg (-1)
static Events zero_crossings(const std::vector<double>& x, double fs,
                             int sign) {
  Events ev;
  for (size_t i = 1; i < x.size(); ++i) {
    double a = sign * x[i - 1], b = sign * x[i];
    if (a < 0.0 && b >= 0.0) {
      double frac = (b - a) > 1e-12 ? -a / (b - a) : 0.0;
      ev.times.push_back((i - 1 + frac) / fs);
    }
  }
  return ev;
}

// local maxima (sign=+1) or minima (-1), parabolic-refined
static Events extrema(const std::vector<double>& x, double fs, int sign) {
  Events ev;
  for (size_t i = 1; i + 1 < x.size(); ++i) {
    double a = sign * x[i - 1], b = sign * x[i], c = sign * x[i + 1];
    if (b > a && b >= c) {
      double denom = a - 2 * b + c;
      double off = std::abs(denom) > 1e-12 ? 0.5 * (a - c) / denom : 0.0;
      if (off > 1 || off < -1) off = 0.0;
      ev.times.push_back((i + off) / fs);
    }
  }
  return ev;
}

// per-frame interval-based F0 from an event series: the interval that
// brackets the frame center, averaged with its neighbors.
static void interval_f0(const Events& ev, const std::vector<double>& centers,
                        double f0_floor, double f0_ceil,
                        std::vector<double>* f0,
                        std::vector<double>* dev) {
  size_t nf = centers.size();
  f0->assign(nf, 0.0);
  dev->assign(nf, 1e9);
  const auto& t = ev.times;
  if (t.size() < 3) return;
  size_t j = 1;
  for (size_t i = 0; i < nf; ++i) {
    double c = centers[i];
    while (j + 1 < t.size() && t[j] < c) ++j;
    // intervals around the bracketing event
    double iv[3];
    int cnt = 0;
    for (int k = -1; k <= 1; ++k) {
      long a = (long)j + k - 1, b = (long)j + k;
      if (a >= 0 && b < (long)t.size()) {
        double d = t[b] - t[a];
        if (d > 0) iv[cnt++] = d;
      }
    }
    if (cnt == 0) continue;
    double mean = 0;
    for (int k = 0; k < cnt; ++k) mean += iv[k];
    mean /= cnt;
    double var = 0;
    for (int k = 0; k < cnt; ++k) var += (iv[k] - mean) * (iv[k] - mean);
    var = cnt > 1 ? std::sqrt(var / cnt) / mean : 0.3;
    double f = 1.0 / mean;
    if (f >= f0_floor && f <= f0_ceil) {
      (*f0)[i] = f;
      (*dev)[i] = var;
    }
  }
}

// scan 5 lags around lag0 with a +-2-period window; returns true and fills
// (best normalized correlation, parabolic-refined lag) when in bounds
static bool corr_scan(const double* x, int n, double fs, double center_s,
                      int lag0, double* best_r_out, double* lag_ref_out) {
  int win = 2 * lag0;  // two periods each side
  int c = (int)std::lround(center_s * fs);
  int lo = c - win, hi = c + win;
  if (lo < 0 || hi + lag0 + 4 >= n || lag0 < 4) return false;
  double best_r = -2.0;
  int best_lag = lag0;
  double rs[5];
  for (int dl = -2; dl <= 2; ++dl) {
    int lag = lag0 + dl;
    double num = 0, e1 = 0, e2 = 0;
    for (int i = lo; i <= hi; ++i) {
      num += x[i] * x[i + lag];
      e1 += x[i] * x[i];
      e2 += x[i + lag] * x[i + lag];
    }
    double r = num / (std::sqrt(e1 * e2) + 1e-12);
    rs[dl + 2] = r;
    if (r > best_r) { best_r = r; best_lag = lag; }
  }
  int bi = best_lag - lag0 + 2;
  double lag_ref = best_lag;
  if (bi >= 1 && bi <= 3) {
    double a = rs[bi - 1], b = rs[bi], cc = rs[bi + 1];
    double denom = a - 2 * b + cc;
    if (std::abs(denom) > 1e-12) {
      double off = 0.5 * (a - cc) / denom;
      if (off > -1 && off < 1) lag_ref = best_lag + off;
    }
  }
  *best_r_out = best_r;
  *lag_ref_out = lag_ref;
  return true;
}

// normalized autocorrelation refinement around lag fs/f0, with an
// octave-doubling guard: when a dominant 2nd harmonic drags the interval
// candidates to 2*f0_true, the true period 2*lag scores ~1.0 while the
// halved period scores the harmonic mixture (<1); a genuinely correct lag
// scores ~equally at lag and 2*lag, so a margin keeps it.  (StoneMask-role
// octave correction.)
static double refine_f0(const double* x, int n, double fs, double center_s,
                        double f0, double f0_floor) {
  int lag0 = (int)std::lround(fs / f0);
  double best_r, lag_ref;
  if (!corr_scan(x, n, fs, center_s, lag0, &best_r, &lag_ref)) return f0;
  int lag2 = 2 * lag0;
  if (fs / lag2 >= f0_floor) {
    double r2, l2;
    if (corr_scan(x, n, fs, center_s, lag2, &r2, &l2) &&
        r2 > best_r + 0.08) {
      best_r = r2;
      lag_ref = l2;
    }
  }
  if (best_r < 0.35) return 0.0;  // unvoiced
  return fs / lag_ref;
}

}  // namespace

extern "C" int dio_stonemask(const double* x, int n, int fs,
                             double frame_period_ms, double f0_floor,
                             double f0_ceil, double* out, int n_frames) {
  if (n <= 0 || n_frames <= 0) return 1;
  double hop_s = frame_period_ms / 1000.0;
  std::vector<double> centers(n_frames);
  for (int i = 0; i < n_frames; ++i) centers[i] = i * hop_s;

  // candidate bands: log-spaced boundaries from f0_floor to f0_ceil
  const int kBands = 6;
  std::vector<double> boundaries(kBands);
  for (int b = 0; b < kBands; ++b)
    boundaries[b] = f0_floor *
        std::pow(f0_ceil / f0_floor, (b + 1.0) / kBands);

  std::vector<double> best_f0(n_frames, 0.0), best_dev(n_frames, 1e9);

  for (int b = 0; b < kBands; ++b) {
    auto y = lowpass(x, n, (double)fs, boundaries[b] * 2.0);
    Events evs[4] = {
        zero_crossings(y, fs, +1), zero_crossings(y, fs, -1),
        extrema(y, fs, +1), extrema(y, fs, -1)};
    std::vector<double> f0s[4], devs[4];
    for (int e = 0; e < 4; ++e)
      interval_f0(evs[e], centers, f0_floor, f0_ceil, &f0s[e], &devs[e]);
    for (int i = 0; i < n_frames; ++i) {
      // combine the four estimators: mean of those present, spread as dev
      double vals[4];
      int cnt = 0;
      for (int e = 0; e < 4; ++e)
        if (f0s[e][i] > 0) vals[cnt++] = f0s[e][i];
      if (cnt < 2) continue;
      double mean = 0;
      for (int k = 0; k < cnt; ++k) mean += vals[k];
      mean /= cnt;
      double var = 0;
      for (int k = 0; k < cnt; ++k) var += (vals[k] - mean) * (vals[k] - mean);
      double spread = std::sqrt(var / cnt) / mean + (4 - cnt) * 0.05;
      if (mean < boundaries[b] / 4.0 || mean > boundaries[b] * 1.1) continue;
      if (spread < best_dev[i]) {
        best_dev[i] = spread;
        best_f0[i] = mean;
      }
    }
  }

  // voicing gate + refinement on the raw signal
  for (int i = 0; i < n_frames; ++i) {
    double f = best_f0[i];
    if (f <= 0 || best_dev[i] > 0.2) { out[i] = 0.0; continue; }
    out[i] = refine_f0(x, n, (double)fs, centers[i], f, f0_floor);
    if (out[i] < f0_floor || out[i] > f0_ceil) out[i] = 0.0;
  }

  // median-of-3 smoothing on voiced runs; drop isolated voiced frames
  std::vector<double> sm(out, out + n_frames);
  for (int i = 1; i + 1 < n_frames; ++i) {
    double a = sm[i - 1], m = sm[i], c = sm[i + 1];
    if (m > 0 && a > 0 && c > 0) {
      double lo = std::min({a, m, c}), hi = std::max({a, m, c});
      out[i] = a + m + c - lo - hi;
    } else if (m > 0 && a == 0 && c == 0) {
      out[i] = 0.0;
    }
  }
  return 0;
}
