// sdft_native: C++ oracle engine for the TPU SDFT framework.
//
// Role: the "native component" tier mirroring the reference's C/C++ header
// cores (reference: c/src/sdft/sdft.h, cpp/src/sdft/sdft.h) — a golden
// CPU implementation used for differential testing and as the host-side
// fallback engine.  Written from the algorithm spec (SURVEY.md §0, Duda
// 2010), not translated from the reference: phases are tracked as integer
// exponents of the primitive 2m-th root of unity and looked up in a
// precomputed root table, which is exact for endless streams — unlike the
// reference's multiply-and-reset phasor (c/src/sdft/sdft.h:566-576) this
// engine has zero phase drift *within* each 2m period as well.
//
// Exposed as a plain C ABI for ctypes binding (no pybind11 dependency).
//
// Build: see Makefile (g++ -O3 -shared -fPIC).

#include <cmath>
#include <complex>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

using cplx = std::complex<double>;

enum WindowKind : int32_t { kBoxcar = 0, kHann = 1, kHamming = 2, kBlackman = 3 };

struct Taps {
  double c0, c1, c2;
  int halo;
};

Taps taps_for(int32_t window) {
  switch (window) {
    case kHann:     return {0.50, -0.25, 0.00, 1};
    case kHamming:  return {0.54, -0.23, 0.00, 1};
    case kBlackman: return {0.42, -0.25, 0.04, 2};
    default:        return {1.00, 0.00, 0.00, 0};
  }
}

class Engine {
 public:
  Engine(int64_t dftsize, int32_t window, double latency, int td_bits)
      : m_(dftsize),
        n2_(2 * dftsize),
        window_(window),
        latency_(latency),
        td_single_(td_bits == 32),
        roots_(n2_),
        synth_(dftsize),
        ring_(n2_, 0.0),
        acc_(dftsize, cplx(0.0, 0.0)),
        expo_(dftsize, 0),
        aux_(dftsize + 4, cplx(0.0, 0.0)) {
    const double omega = -M_PI / static_cast<double>(m_);
    for (int64_t r = 0; r < n2_; ++r) {
      roots_[r] = std::polar(1.0, omega * static_cast<double>(r));
    }
    // Synthesis phasors with amplitude demodulation
    // (spec: c/src/sdft/sdft.h:440,445,639-653).
    if (latency_ == 1.0) {
      for (int64_t i = 0; i < m_; ++i) synth_[i] = cplx((i % 2) ? -1.0 : 1.0, 0.0);
    } else {
      const double w = 2.0 / (1.0 - std::cos(M_PI * latency_));
      for (int64_t i = 0; i < m_; ++i) {
        synth_[i] = std::polar(w, -M_PI * latency_ * static_cast<double>(i));
      }
    }
    reset();
  }

  void reset() {
    pos_ = 0;
    std::fill(ring_.begin(), ring_.end(), 0.0);
    std::fill(acc_.begin(), acc_.end(), cplx(0.0, 0.0));
    for (int64_t i = 0; i < m_; ++i) expo_[i] = 0;
  }

  // Forward analysis for n samples; out is row-major (n, m) complex128.
  void forward(int64_t n, const double* x, cplx* out) {
    const Taps t = taps_for(window_);
    const double weight = 1.0 / static_cast<double>(n2_);
    for (int64_t s = 0; s < n; ++s) {
      // Comb stage in TD precision, then FD (spec: c/src/sdft/sdft.h:564).
      double sample = td_single_ ? static_cast<double>(static_cast<float>(x[s])) : x[s];
      double delta = sample - ring_[pos_];
      if (td_single_) delta = static_cast<double>(static_cast<float>(delta));
      ring_[pos_] = sample;
      pos_ = (pos_ + 1 == n2_) ? 0 : pos_ + 1;

      // Modulated accumulation with exact table phases.  expo_[i] holds
      // (t * i) mod 2m; advancing by one sample adds i.
      for (int64_t i = 0; i < m_; ++i) {
        int64_t r = expo_[i];
        acc_[i] += roots_[r] * delta;
        r += i;
        if (r >= n2_) r -= n2_;
        expo_[i] = r;
        aux_[i + 2] = acc_[i] * std::conj(roots_[r]);
      }

      // Hermitian guards around DC and Nyquist (spec: c/src/sdft/sdft.h:589-595).
      aux_[1] = std::conj(aux_[3]);
      aux_[0] = std::conj(aux_[4]);
      aux_[m_ + 2] = std::conj(aux_[m_]);
      aux_[m_ + 3] = std::conj(aux_[m_ - 1]);

      // Frequency-domain window convolution (spec: c/src/sdft/sdft.h:350-402).
      cplx* row = out + s * m_;
      for (int64_t i = 0; i < m_; ++i) {
        const cplx mid = aux_[i + 2];
        cplx v = t.c0 * mid;
        if (t.halo >= 1) v += t.c1 * (aux_[i + 1] + aux_[i + 3]);
        if (t.halo >= 2) v += t.c2 * (aux_[i] + aux_[i + 4]);
        row[i] = v * weight;
      }
    }
  }

  // Inverse synthesis for n spectra (spec: c/src/sdft/sdft.h:635-657).
  void inverse(int64_t n, const cplx* dfts, double* y) {
    for (int64_t s = 0; s < n; ++s) {
      const cplx* row = dfts + s * m_;
      double acc = 0.0;
      if (latency_ == 1.0) {
        for (int64_t i = 0; i < m_; ++i) {
          acc += row[i].real() * ((i % 2) ? -1.0 : 1.0);
        }
      } else {
        for (int64_t i = 0; i < m_; ++i) {
          acc += (row[i] * synth_[i]).real();
        }
      }
      double out = 2.0 * acc;
      y[s] = td_single_ ? static_cast<double>(static_cast<float>(out)) : out;
    }
  }

 private:
  int64_t m_, n2_;
  int32_t window_;
  double latency_;
  bool td_single_;
  std::vector<cplx> roots_, synth_;
  std::vector<double> ring_;
  std::vector<cplx> acc_;
  std::vector<int64_t> expo_;
  std::vector<cplx> aux_;
  int64_t pos_ = 0;
};

}  // namespace

extern "C" {

void* sdft_oracle_create(int64_t dftsize, int32_t window, double latency, int32_t td_bits) {
  if (dftsize < 4) return nullptr;
  return new Engine(dftsize, window, latency, td_bits);
}

void sdft_oracle_destroy(void* h) { delete static_cast<Engine*>(h); }

void sdft_oracle_reset(void* h) { static_cast<Engine*>(h)->reset(); }

void sdft_oracle_sdft(void* h, int64_t n, const double* x, double* out) {
  static_cast<Engine*>(h)->forward(n, x, reinterpret_cast<cplx*>(out));
}

void sdft_oracle_isdft(void* h, int64_t n, const double* dfts, double* y) {
  static_cast<Engine*>(h)->inverse(n, reinterpret_cast<const cplx*>(dfts), y);
}

}  // extern "C"
