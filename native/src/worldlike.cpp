// WORLD-style F0 estimation: DIO (interval-based candidates over a
// low-pass filter bank) + StoneMask (instantaneous-frequency refinement).
//
// The reference toolkit ships a prebuilt WORLD binary inside a torch
// pickle and calls harvest/dio/stonemask through ctypes
// (reference: main/library/predictors/WORLD_WRAPPER.py:16-89).  This is
// a from-scratch implementation of the same algorithms (Morise's DIO /
// StoneMask method family) with the same C ABI shape: plain C functions
// over double buffers, loaded via ctypes (rvc_maker_tpu/native).
//
// Build: make -C native   (produces libworldlike.so)

#include <cmath>
#include <cstdlib>
#include <cstring>
#include <vector>
#include <complex>
#include <algorithm>

namespace {

constexpr double kPi = 3.14159265358979323846;

// ---------------------------------------------------------------------------
// 2nd-order butterworth low-pass biquad cascade (4th order total),
// applied forward only (phase is irrelevant for interval statistics).
// ---------------------------------------------------------------------------
struct Biquad {
  double b0, b1, b2, a1, a2;
  double z1 = 0.0, z2 = 0.0;
  double step(double x) {
    double y = b0 * x + z1;
    z1 = b1 * x - a1 * y + z2;
    z2 = b2 * x - a2 * y;
    return y;
  }
};

Biquad butter_lowpass(double cutoff, double fs) {
  double w0 = 2.0 * kPi * cutoff / fs;
  double cosw = std::cos(w0), sinw = std::sin(w0);
  double q = 0.70710678118654752440;  // butterworth
  double alpha = sinw / (2.0 * q);
  double a0 = 1.0 + alpha;
  Biquad f;
  f.b0 = (1.0 - cosw) / 2.0 / a0;
  f.b1 = (1.0 - cosw) / a0;
  f.b2 = f.b0;
  f.a1 = (-2.0 * cosw) / a0;
  f.a2 = (1.0 - alpha) / a0;
  return f;
}

void lowpass4(const double* x, int n, double cutoff, double fs, double* y) {
  Biquad f1 = butter_lowpass(cutoff, fs);
  Biquad f2 = butter_lowpass(cutoff, fs);
  for (int i = 0; i < n; ++i) y[i] = f2.step(f1.step(x[i]));
}

// event times (sample units, subsample interpolated) of four period cues
struct Events {
  std::vector<double> up, down, peak, dip;
};

Events detect_events(const double* y, int n) {
  Events e;
  for (int i = 1; i < n; ++i) {
    if (y[i - 1] < 0.0 && y[i] >= 0.0)
      e.up.push_back(i - 1 + (-y[i - 1]) / (y[i] - y[i - 1]));
    if (y[i - 1] >= 0.0 && y[i] < 0.0)
      e.down.push_back(i - 1 + y[i - 1] / (y[i - 1] - y[i]));
  }
  for (int i = 1; i + 1 < n; ++i) {
    if (y[i] > y[i - 1] && y[i] >= y[i + 1]) e.peak.push_back(double(i));
    if (y[i] < y[i - 1] && y[i] <= y[i + 1]) e.dip.push_back(double(i));
  }
  return e;
}

// per-frame f0 estimate from one event train: the interval spanning t
double interval_f0_at(const std::vector<double>& ev, double t, double fs,
                      double floor_hz, double ceil_hz) {
  if (ev.size() < 2) return 0.0;
  // binary search for the interval containing t
  auto it = std::lower_bound(ev.begin(), ev.end(), t);
  if (it == ev.begin() || it == ev.end()) return 0.0;
  double interval = *it - *(it - 1);
  if (interval <= 0.0) return 0.0;
  double f0 = fs / interval;
  if (f0 < floor_hz || f0 > ceil_hz) return 0.0;
  return f0;
}

}  // namespace

extern "C" {

// DIO-style F0 estimation.
//   x: n samples; fs: sample rate; frame_period in ms.
//   f0_out/time_out must hold dio_num_frames(n, fs, frame_period) values.
int worldlike_num_frames(int n, double fs, double frame_period) {
  return int(1000.0 * n / fs / frame_period) + 1;
}

void worldlike_dio(const double* x, int n, double fs, double f0_floor,
                   double f0_ceil, double frame_period, double* time_out,
                   double* f0_out) {
  int n_frames = worldlike_num_frames(n, fs, frame_period);
  int n_bands = 0;
  // half-octave spaced filter-bank boundaries
  std::vector<double> bands;
  for (double b = f0_floor; b < f0_ceil * 1.0001; b *= std::sqrt(2.0))
    bands.push_back(b);
  n_bands = int(bands.size());

  std::vector<double> best_f0(n_frames, 0.0);
  std::vector<double> best_score(n_frames, 1e30);
  std::vector<double> filtered(n);

  for (int bi = 0; bi < n_bands; ++bi) {
    double boundary = bands[bi];
    // low-pass keeping the fundamental of this band
    lowpass4(x, n, boundary * 1.8, fs, filtered.data());
    Events ev = detect_events(filtered.data(), n);

    for (int fi = 0; fi < n_frames; ++fi) {
      double t = fi * frame_period / 1000.0 * fs;
      double c1 = interval_f0_at(ev.up, t, fs, f0_floor, f0_ceil);
      double c2 = interval_f0_at(ev.down, t, fs, f0_floor, f0_ceil);
      double c3 = interval_f0_at(ev.peak, t, fs, f0_floor, f0_ceil);
      double c4 = interval_f0_at(ev.dip, t, fs, f0_floor, f0_ceil);
      double cs[4] = {c1, c2, c3, c4};
      double sum = 0.0;
      int cnt = 0;
      for (double c : cs)
        if (c > 0.0) { sum += c; ++cnt; }
      if (cnt < 4) continue;  // all four cues must agree for a candidate
      double mean = sum / cnt;
      // candidate must sit inside this band (half octave each way)
      if (mean < boundary * 0.6 || mean > boundary * 2.2) continue;
      double var = 0.0;
      for (double c : cs) var += (c - mean) * (c - mean);
      double stddev = std::sqrt(var / cnt);
      double score = stddev / (mean + 1e-9);  // relative dispersion
      if (score < best_score[fi]) {
        best_score[fi] = score;
        best_f0[fi] = mean;
      }
    }
  }

  for (int fi = 0; fi < n_frames; ++fi) {
    time_out[fi] = fi * frame_period / 1000.0;
    // unvoiced when the best candidate's cues disagree
    f0_out[fi] = (best_score[fi] < 0.2) ? best_f0[fi] : 0.0;
  }
}

// StoneMask-style refinement: weighted instantaneous frequency over the
// first harmonics, two refinement passes.
void worldlike_stonemask(const double* x, int n, double fs,
                         const double* time_axis, const double* f0_in,
                         int n_frames, double* f0_out) {
  for (int fi = 0; fi < n_frames; ++fi) {
    double f0 = f0_in[fi];
    if (f0 <= 0.0) {
      f0_out[fi] = 0.0;
      continue;
    }
    double center = time_axis[fi] * fs;
    for (int pass = 0; pass < 2; ++pass) {
      // analysis window: 3 fundamental periods, blackman
      int half = int(1.5 * fs / f0);
      int lo = int(center) - half;
      int len = 2 * half + 1;
      if (lo < 0 || lo + len + 1 >= n || len < 8) break;

      const int n_harm = 4;
      double num = 0.0, den = 0.0;
      for (int k = 1; k <= n_harm; ++k) {
        double w = 2.0 * kPi * k * f0 / fs;
        std::complex<double> x1(0.0, 0.0), x2(0.0, 0.0);
        for (int i = 0; i < len; ++i) {
          double win = 0.42 - 0.5 * std::cos(2.0 * kPi * i / (len - 1))
                       + 0.08 * std::cos(4.0 * kPi * i / (len - 1));
          std::complex<double> e = std::polar(win, -w * i);
          x1 += e * x[lo + i];
          x2 += e * x[lo + i + 1];  // one-sample shift
        }
        // instantaneous frequency at harmonic k
        std::complex<double> cross = x2 * std::conj(x1);
        double inst = std::arg(cross) * fs / (2.0 * kPi);
        if (inst <= 0.0) continue;
        double mag = std::abs(x1);
        num += mag * inst / k;
        den += mag;
      }
      if (den <= 0.0) break;
      double refined = num / den;
      if (refined > f0 * 0.5 && refined < f0 * 2.0) f0 = refined;
    }
    f0_out[fi] = f0;
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Harvest (Morise, INTERSPEECH 2017): dense band-passed candidate contours
// + per-frame selection + fixed-point contour correction + smoothing.
// Replaces the prebuilt WORLD Harvest the reference ships
// (WORLD_WRAPPER.py:32-54).  Structure follows the paper: many band-pass
// channels (1/12 octave here), four event trains per channel, candidates
// where all four agree, 1 ms internal frame period, then a multi-step
// fix pass that removes octave jumps / short voiced islands and extends
// voiced regions through the candidate pool, then zero-phase smoothing.
// ---------------------------------------------------------------------------

namespace {

// iterative radix-2 complex FFT (in-place), sign=-1 forward / +1 inverse
void fft_radix2(std::vector<std::complex<double>>& a, int sign) {
  int n = int(a.size());
  for (int i = 1, j = 0; i < n; ++i) {
    int bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) std::swap(a[i], a[j]);
  }
  for (int len = 2; len <= n; len <<= 1) {
    double ang = sign * 2.0 * kPi / len;
    std::complex<double> wl(std::cos(ang), std::sin(ang));
    for (int i = 0; i < n; i += len) {
      std::complex<double> w(1.0, 0.0);
      for (int j = 0; j < len / 2; ++j) {
        std::complex<double> u = a[i + j], v = a[i + j + len / 2] * w;
        a[i + j] = u + v;
        a[i + j + len / 2] = u - v;
        w *= wl;
      }
    }
  }
  if (sign > 0)
    for (auto& v : a) v /= n;
}

double nuttall(double x) {  // x in [0,1]
  double w = 2.0 * kPi * x;
  return 0.355768 - 0.487396 * std::cos(w) + 0.144232 * std::cos(2 * w)
         - 0.012604 * std::cos(3 * w);
}

// zero-phase band-pass around center_hz: Nuttall-windowed cosine FIR of
// length 4 periods, applied in the frequency domain with delay removed
void bandpass_nuttall(const std::vector<std::complex<double>>& spec_x,
                      int fft_n, int n, double fs, double center_hz,
                      std::vector<double>& out) {
  int half = std::max(2, int(2.0 * fs / center_hz));
  int flen = 2 * half + 1;
  std::vector<std::complex<double>> f(fft_n, {0.0, 0.0});
  for (int i = 0; i < flen; ++i) {
    double w = nuttall(double(i) / (flen - 1));
    double c = std::cos(2.0 * kPi * center_hz * (i - half) / fs);
    // circular placement centred at 0 removes the group delay
    int idx = (i - half + fft_n) % fft_n;
    f[idx] = {w * c, 0.0};
  }
  fft_radix2(f, -1);
  std::vector<std::complex<double>> y(fft_n);
  for (int i = 0; i < fft_n; ++i) y[i] = spec_x[i] * f[i];
  fft_radix2(y, +1);
  out.resize(n);
  double norm = 2.0 / flen;  // filter gain compensation
  for (int i = 0; i < n; ++i) out[i] = y[i].real() * norm;
}

struct Candidate {
  double f0 = 0.0;
  double score = 0.0;  // 1 - relative dispersion of the four cues
};

// instantaneous-frequency refinement (StoneMask core) for one frame
double refine_if(const double* x, int n, double fs, double center_sample,
                 double f0) {
  for (int pass = 0; pass < 2; ++pass) {
    int half = int(1.5 * fs / f0);
    int lo = int(center_sample) - half;
    int len = 2 * half + 1;
    if (lo < 0 || lo + len + 1 >= n || len < 8) break;
    const int n_harm = 4;
    double num = 0.0, den = 0.0;
    for (int k = 1; k <= n_harm; ++k) {
      double w = 2.0 * kPi * k * f0 / fs;
      std::complex<double> x1(0.0, 0.0), x2(0.0, 0.0);
      for (int i = 0; i < len; ++i) {
        double win = 0.42 - 0.5 * std::cos(2.0 * kPi * i / (len - 1))
                     + 0.08 * std::cos(4.0 * kPi * i / (len - 1));
        std::complex<double> e = std::polar(win, -w * i);
        x1 += e * x[lo + i];
        x2 += e * x[lo + i + 1];
      }
      double inst = std::arg(x2 * std::conj(x1)) * fs / (2.0 * kPi);
      if (inst <= 0.0) continue;
      double mag = std::abs(x1);
      num += mag * inst / k;
      den += mag;
    }
    if (den <= 0.0) break;
    double refined = num / den;
    if (refined > f0 * 0.5 && refined < f0 * 2.0) f0 = refined;
  }
  return f0;
}

}  // namespace

extern "C" {

void worldlike_harvest(const double* x, int n, double fs, double f0_floor,
                       double f0_ceil, double frame_period, double* time_out,
                       double* f0_out) {
  const double kInternalPeriodMs = 1.0;
  int nf = int(1000.0 * n / fs / kInternalPeriodMs) + 1;  // internal frames

  // one forward FFT of the input, shared by all channels
  int fft_n = 1;
  while (fft_n < n + int(4.0 * fs / f0_floor) + 2) fft_n <<= 1;
  std::vector<std::complex<double>> spec_x(fft_n, {0.0, 0.0});
  for (int i = 0; i < n; ++i) spec_x[i] = {x[i], 0.0};
  fft_radix2(spec_x, -1);

  // 1/12-octave channel centers
  std::vector<double> centers;
  for (double b = f0_floor * std::pow(2.0, 1.0 / 12.0); b < f0_ceil * 1.0001;
       b *= std::pow(2.0, 1.0 / 12.0))
    centers.push_back(b);

  // candidate pool per internal frame
  std::vector<std::vector<Candidate>> pool(nf);
  std::vector<double> filtered;
  for (double center : centers) {
    bandpass_nuttall(spec_x, fft_n, n, fs, center, filtered);
    Events ev = detect_events(filtered.data(), n);
    for (int fi = 0; fi < nf; ++fi) {
      double t = fi * kInternalPeriodMs / 1000.0 * fs;
      double cs[4] = {
          interval_f0_at(ev.up, t, fs, f0_floor, f0_ceil),
          interval_f0_at(ev.down, t, fs, f0_floor, f0_ceil),
          interval_f0_at(ev.peak, t, fs, f0_floor, f0_ceil),
          interval_f0_at(ev.dip, t, fs, f0_floor, f0_ceil)};
      double sum = 0.0;
      for (double c : cs) {
        if (c <= 0.0) { sum = -1.0; break; }
        sum += c;
      }
      if (sum < 0.0) continue;
      double mean = sum / 4.0;
      // the fundamental this channel passes must sit near its center
      if (mean < center / std::sqrt(2.0) || mean > center * std::sqrt(2.0))
        continue;
      double var = 0.0;
      for (double c : cs) var += (c - mean) * (c - mean);
      double disp = std::sqrt(var / 4.0) / (mean + 1e-9);
      if (disp > 0.25) continue;
      pool[fi].push_back({mean, 1.0 - disp});
    }
  }

  // initial contour: best-scoring candidate per frame
  std::vector<double> f0c(nf, 0.0);
  for (int fi = 0; fi < nf; ++fi) {
    double best = 0.0, bf = 0.0;
    for (const Candidate& c : pool[fi])
      if (c.score > best) { best = c.score; bf = c.f0; }
    if (best > 0.85) f0c[fi] = bf;
  }

  // refine by instantaneous frequency
  for (int fi = 0; fi < nf; ++fi)
    if (f0c[fi] > 0.0)
      f0c[fi] = refine_if(x, n, fs, fi * kInternalPeriodMs / 1000.0 * fs,
                          f0c[fi]);

  // octave-error correction: if the odd multiples of f/2 carry real
  // energy, the true fundamental is f/2 (handles missing-fundamental
  // voices the event trains lock an octave high on).  Windowed DFT
  // magnitudes at m*f/2, m=1..6, Blackman window of 3 periods of f/2.
  auto harm_mag = [&](double center_sample, double freq, int half) {
    int lo = int(center_sample) - half;
    int len = 2 * half + 1;
    if (lo < 0 || lo + len >= n || len < 8) return -1.0;
    double w = 2.0 * kPi * freq / fs;
    std::complex<double> acc(0.0, 0.0);
    for (int i = 0; i < len; ++i) {
      double win = 0.42 - 0.5 * std::cos(2.0 * kPi * i / (len - 1))
                   + 0.08 * std::cos(4.0 * kPi * i / (len - 1));
      acc += std::polar(win, -w * i) * x[lo + i];
    }
    return std::abs(acc);
  };
  for (int fi = 0; fi < nf; ++fi) {
    double f = f0c[fi];
    if (f <= 0.0 || f * 0.5 < f0_floor) continue;
    double half_f = f * 0.5;
    double center = fi * kInternalPeriodMs / 1000.0 * fs;
    int half = int(1.5 * fs / half_f);
    double odd = 0.0, even = 0.0, odd_peak = 0.0, even_peak = 0.0;
    bool ok = true;
    for (int m = 1; m <= 6; ++m) {
      double mag = harm_mag(center, m * half_f, half);
      if (mag < 0.0) { ok = false; break; }
      if (m % 2 == 1) { odd += mag; odd_peak = std::max(odd_peak, mag); }
      else { even += mag; even_peak = std::max(even_peak, mag); }
    }
    if (ok && even > 0.0 && odd > 0.4 * even &&
        odd_peak > 0.3 * even_peak) {
      double r = refine_if(x, n, fs, center, half_f);
      // accept only when IF refinement confirms a fundamental there
      if (std::fabs(r - half_f) / half_f < 0.2) f0c[fi] = r;
    }
  }

  const double kAllowed = 0.18;  // max relative step between 1 ms frames

  // fix step 1: break octave jumps (voiced->voiced steps too large)
  for (int fi = 1; fi < nf; ++fi)
    if (f0c[fi] > 0.0 && f0c[fi - 1] > 0.0 &&
        std::fabs(f0c[fi] - f0c[fi - 1]) / f0c[fi - 1] > kAllowed)
      f0c[fi] = 0.0;

  // fix step 2: drop voiced islands shorter than 9 ms
  const int kMinRun = 9;
  for (int fi = 0; fi < nf;) {
    if (f0c[fi] == 0.0) { ++fi; continue; }
    int j = fi;
    while (j < nf && f0c[j] > 0.0) ++j;
    if (j - fi < kMinRun)
      for (int k = fi; k < j; ++k) f0c[k] = 0.0;
    fi = j;
  }

  // fix steps 3/4: extend each voiced run through the candidate pool,
  // forward then backward, accepting the nearest candidate within range
  auto nearest = [&](int fi, double target) -> double {
    double best = 0.0, bestd = 1e30;
    for (const Candidate& c : pool[fi]) {
      double d = std::fabs(c.f0 - target) / target;
      if (d < bestd) { bestd = d; best = c.f0; }
    }
    return (bestd <= kAllowed) ? best : 0.0;
  };
  for (int fi = 1; fi < nf; ++fi)
    if (f0c[fi] == 0.0 && f0c[fi - 1] > 0.0) {
      double cand = nearest(fi, f0c[fi - 1]);
      if (cand > 0.0) f0c[fi] = cand;
    }
  for (int fi = nf - 2; fi >= 0; --fi)
    if (f0c[fi] == 0.0 && f0c[fi + 1] > 0.0) {
      double cand = nearest(fi, f0c[fi + 1]);
      if (cand > 0.0) f0c[fi] = cand;
    }
  // re-drop any still-short runs created by extension
  for (int fi = 0; fi < nf;) {
    if (f0c[fi] == 0.0) { ++fi; continue; }
    int j = fi;
    while (j < nf && f0c[j] > 0.0) ++j;
    if (j - fi < kMinRun)
      for (int k = fi; k < j; ++k) f0c[k] = 0.0;
    fi = j;
  }

  // zero-phase smoothing per voiced run (fwd+bwd 1-pole low-pass)
  const double kAlpha = 0.35;
  for (int fi = 0; fi < nf;) {
    if (f0c[fi] == 0.0) { ++fi; continue; }
    int j = fi;
    while (j < nf && f0c[j] > 0.0) ++j;
    for (int k = fi + 1; k < j; ++k)
      f0c[k] = kAlpha * f0c[k] + (1.0 - kAlpha) * f0c[k - 1];
    for (int k = j - 2; k >= fi; --k)
      f0c[k] = kAlpha * f0c[k] + (1.0 - kAlpha) * f0c[k + 1];
    fi = j;
  }

  // sample the 1 ms contour at the requested frame period
  int out_frames = worldlike_num_frames(n, fs, frame_period);
  for (int fi = 0; fi < out_frames; ++fi) {
    time_out[fi] = fi * frame_period / 1000.0;
    int src = std::min(nf - 1, int(fi * frame_period / kInternalPeriodMs + 0.5));
    f0_out[fi] = f0c[src];
  }
}

}  // extern "C"
