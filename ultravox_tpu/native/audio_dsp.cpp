// Host-side audio DSP for the data pipeline.
//
// Native replacement for the reference's compiled audio dependencies
// (librosa/soxr resampling, scipy Butterworth filters, audioop companding —
// SURVEY.md §2.9). The TPU owns the model math; this library keeps the
// host-side data path off slow Python loops when feeding many streams.
//
// Exposed C ABI (see audio_dsp.py for the ctypes bindings):
//   ud_resample_poly   — windowed-sinc polyphase resampling
//   ud_biquad_lowpass  — 2nd-order Butterworth low-pass (cascadable)
//   ud_biquad_bandpass — band-pass via cascaded low/high-pass biquads
//   ud_mulaw_roundtrip — 8-bit mu-law companding round trip
//   ud_alaw_roundtrip  — 8-bit a-law companding round trip
//
// Build: cc -O3 -march=native -shared -fPIC audio_dsp.cpp -o libaudio_dsp.so

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;

double sinc(double x) {
  if (std::fabs(x) < 1e-12) return 1.0;
  return std::sin(kPi * x) / (kPi * x);
}

// Kaiser-windowed sinc low-pass prototype for the polyphase resampler.
std::vector<double> design_lowpass(int taps_per_phase, int num_phases,
                                   double cutoff) {
  const int n = taps_per_phase * num_phases;
  std::vector<double> h(n);
  const double beta = 8.6;  // Kaiser beta ~ 90 dB stopband
  // zeroth-order modified Bessel
  auto i0 = [](double x) {
    double sum = 1.0, term = 1.0;
    for (int k = 1; k < 32; ++k) {
      term *= (x / (2.0 * k)) * (x / (2.0 * k));
      sum += term;
    }
    return sum;
  };
  const double denom = i0(beta);
  const double centre = (n - 1) / 2.0;
  for (int i = 0; i < n; ++i) {
    const double t = (i - centre) / num_phases;
    const double w_arg = 2.0 * (i - centre) / (n - 1);
    const double window = i0(beta * std::sqrt(1.0 - w_arg * w_arg)) / denom;
    h[i] = cutoff * sinc(cutoff * t) * window;
  }
  return h;
}

struct Biquad {
  double b0, b1, b2, a1, a2;
  double z1 = 0.0, z2 = 0.0;
  inline float process(float x) {
    const double y = b0 * x + z1;
    z1 = b1 * x - a1 * y + z2;
    z2 = b2 * x - a2 * y;
    return static_cast<float>(y);
  }
};

Biquad make_lowpass(double fc, double fs, double q) {
  const double w0 = 2.0 * kPi * fc / fs;
  const double alpha = std::sin(w0) / (2.0 * q);
  const double c = std::cos(w0);
  const double a0 = 1.0 + alpha;
  Biquad bq;
  bq.b0 = (1.0 - c) / 2.0 / a0;
  bq.b1 = (1.0 - c) / a0;
  bq.b2 = (1.0 - c) / 2.0 / a0;
  bq.a1 = -2.0 * c / a0;
  bq.a2 = (1.0 - alpha) / a0;
  return bq;
}

Biquad make_highpass(double fc, double fs, double q) {
  const double w0 = 2.0 * kPi * fc / fs;
  const double alpha = std::sin(w0) / (2.0 * q);
  const double c = std::cos(w0);
  const double a0 = 1.0 + alpha;
  Biquad bq;
  bq.b0 = (1.0 + c) / 2.0 / a0;
  bq.b1 = -(1.0 + c) / a0;
  bq.b2 = (1.0 + c) / 2.0 / a0;
  bq.a1 = -2.0 * c / a0;
  bq.a2 = (1.0 - alpha) / a0;
  return bq;
}

}  // namespace

extern "C" {

// Polyphase resampling in -> out at rate (up / down). Returns the number of
// output samples written (caller allocates ceil(n * up / down) floats).
int64_t ud_resample_poly(const float* in, int64_t n, int up, int down,
                         float* out, int64_t out_capacity) {
  if (up <= 0 || down <= 0 || n <= 0) return 0;
  const int taps_per_phase = 24;
  const double cutoff = 1.0 / std::max(up, down);
  const auto h = design_lowpass(taps_per_phase, up, cutoff);
  const int64_t n_out_total = (n * up + down - 1) / down;
  const int64_t n_out = std::min(n_out_total, out_capacity);
  const double centre = (static_cast<double>(h.size()) - 1) / 2.0;

  for (int64_t m = 0; m < n_out; ++m) {
    // output sample m taps input around position m*down/up
    const int64_t in_phase = m * down;            // in units of 1/up input
    double acc = 0.0;
    // h index j pairs with input sample floor((in_phase + centre - j)/up)
    const int64_t j0 = in_phase % up;             // first phase offset
    for (int64_t j = j0; j < static_cast<int64_t>(h.size()); j += up) {
      const int64_t i = (in_phase + static_cast<int64_t>(centre) - j) / up;
      if (i >= 0 && i < n) acc += h[j] * in[i];
    }
    out[m] = static_cast<float>(acc * up);
  }
  return n_out;
}

void ud_biquad_lowpass(const float* in, int64_t n, float cutoff_hz,
                       float sample_rate, int order, float* out) {
  std::memcpy(out, in, n * sizeof(float));
  const int stages = std::max(order / 2, 1);
  for (int s = 0; s < stages; ++s) {
    // Butterworth pole Q values for cascaded biquads
    const double q =
        1.0 / (2.0 * std::cos(kPi * (2.0 * s + 1.0) / (4.0 * stages)));
    Biquad bq = make_lowpass(cutoff_hz, sample_rate, q);
    for (int64_t i = 0; i < n; ++i) out[i] = bq.process(out[i]);
  }
}

void ud_biquad_bandpass(const float* in, int64_t n, float low_hz,
                        float high_hz, float sample_rate, int order,
                        float* out) {
  std::memcpy(out, in, n * sizeof(float));
  const int stages = std::max(order / 2, 1);
  for (int s = 0; s < stages; ++s) {
    const double q =
        1.0 / (2.0 * std::cos(kPi * (2.0 * s + 1.0) / (4.0 * stages)));
    Biquad lp = make_lowpass(high_hz, sample_rate, q);
    Biquad hp = make_highpass(low_hz, sample_rate, q);
    for (int64_t i = 0; i < n; ++i) out[i] = hp.process(lp.process(out[i]));
  }
}

void ud_mulaw_roundtrip(const float* in, int64_t n, float* out) {
  const double mu = 255.0;
  for (int64_t i = 0; i < n; ++i) {
    double x = in[i];
    x = x < -1.0 ? -1.0 : (x > 1.0 ? 1.0 : x);
    const double comp =
        std::copysign(std::log1p(mu * std::fabs(x)) / std::log1p(mu), x);
    const double q = std::round((comp + 1.0) / 2.0 * mu) / mu * 2.0 - 1.0;
    out[i] = static_cast<float>(
        std::copysign((std::pow(1.0 + mu, std::fabs(q)) - 1.0) / mu, q));
  }
}

void ud_alaw_roundtrip(const float* in, int64_t n, float* out) {
  const double A = 87.6;
  const double lnA = 1.0 + std::log(A);
  for (int64_t i = 0; i < n; ++i) {
    double x = in[i];
    x = x < -1.0 ? -1.0 : (x > 1.0 ? 1.0 : x);
    const double ax = std::fabs(x);
    const double comp =
        std::copysign(ax < 1.0 / A ? A * ax / lnA : (1.0 + std::log(A * ax)) / lnA, x);
    const double q = std::round((comp + 1.0) / 2.0 * 255.0) / 255.0 * 2.0 - 1.0;
    const double aq = std::fabs(q);
    out[i] = static_cast<float>(std::copysign(
        aq < 1.0 / lnA ? aq * lnA / A : std::exp(aq * lnA - 1.0) / A, q));
  }
}

}  // extern "C"
