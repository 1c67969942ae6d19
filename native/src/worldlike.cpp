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
