// Polyphase windowed-sinc resampler (C ABI, ctypes-loaded).
//
// The reference leans on soxr (via librosa res_type="soxr_vhq") for all
// load-bearing resampling (reference library/utils.py:102,
// preprocess.py:153, convert.py:511); neither librosa nor soxr are in
// this image, so this is the native high-quality path: kaiser-windowed
// sinc polyphase interpolation at rational ratios, with the scipy
// resample_poly host path as the pure-python fallback.

#include <cmath>
#include <cstring>
#include <vector>
#include <algorithm>

namespace {

constexpr double kPi = 3.14159265358979323846;

double bessel_i0(double x) {
  // series expansion, converges fast for the beta range we use
  double sum = 1.0, term = 1.0;
  double x2 = x * x / 4.0;
  for (int k = 1; k < 64; ++k) {
    term *= x2 / (double(k) * k);
    sum += term;
    if (term < 1e-16 * sum) break;
  }
  return sum;
}

long long gcd_ll(long long a, long long b) {
  while (b) { long long t = a % b; a = b; b = t; }
  return a;
}

}  // namespace

extern "C" {

// out must hold resample_out_len(n, sr_in, sr_out) samples.
long long resample_out_len(long long n, long long sr_in, long long sr_out) {
  long long g = gcd_ll(sr_in, sr_out);
  long long up = sr_out / g, down = sr_in / g;
  return (n * up + down - 1) / down;
}

// Kaiser-windowed sinc polyphase resampling, float32 in/out.
//   half_width: filter half width in *input* samples at the lower rate
//   beta: kaiser beta (12.0 ~ soxr-vhq-like stopband)
void resample_sinc(const float* x, long long n, long long sr_in,
                   long long sr_out, int half_width, double beta,
                   float* out) {
  long long g = gcd_ll(sr_in, sr_out);
  long long up = sr_out / g, down = sr_in / g;
  long long m = (n * up + down - 1) / down;

  // anti-alias cutoff at the minimum of the two Nyquists
  double cutoff = std::min(1.0, double(up) / double(down));
  double i0b = bessel_i0(beta);

  // phase tables: for each output phase p in [0, up), taps over input
  int taps = 2 * half_width + 1;
  std::vector<double> table(size_t(up) * taps);
  for (long long p = 0; p < up; ++p) {
    // output sample j = (i_base * up + p)/up; fractional input offset
    double frac = double(p) / double(up);
    double norm = 0.0;
    for (int t = 0; t < taps; ++t) {
      double k = t - half_width - frac;  // input-sample offset
      double s = (std::abs(k) < 1e-12)
                     ? cutoff
                     : std::sin(kPi * cutoff * k) / (kPi * k);
      double r = k / (half_width + 1.0);
      double w = 0.0;
      if (std::abs(r) <= 1.0)
        w = bessel_i0(beta * std::sqrt(std::max(0.0, 1.0 - r * r))) / i0b;
      table[size_t(p) * taps + t] = s * w;
      norm += s * w;
    }
    // normalize DC gain per phase
    for (int t = 0; t < taps; ++t) table[size_t(p) * taps + t] /= norm;
  }

  for (long long j = 0; j < m; ++j) {
    long long num = j * down;
    long long i0 = num / up;        // base input index
    long long p = num % up;         // phase
    const double* h = &table[size_t(p) * taps];
    double acc = 0.0;
    long long start = i0 - half_width;
    for (int t = 0; t < taps; ++t) {
      long long idx = start + t;
      if (idx < 0 || idx >= n) continue;
      acc += h[t] * x[idx];
    }
    out[j] = float(acc);
  }
}

}  // extern "C"
