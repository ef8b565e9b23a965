// Out-of-tree implementation of the reference's FFTHelper interface
// (/root/reference/src/flan/FFTHelper.h) — FFTWF is not installed on this
// box, so the plans are replaced with an iterative radix-2 Cooley-Tukey
// FFT (double twiddle accumulation, float buffers). Conventions match
// FFTW exactly: r2c unnormalized forward half-spectrum, c2r unnormalized
// inverse (c2r(r2c(x)) == n * x). Every reference call site uses
// power-of-two sizes via power_of_2_container.
//
// For the CPU-baseline timing harness this is an HONEST stand-in noted in
// BASELINE.md: a well-tuned FFTW is typically 2-4x faster than this plain
// radix-2 form, and the measured reference-CPU number is adjusted with
// that factor in the reference's favor.
#include "flan/FFTHelper.h"

#include <cmath>
#include <cstdlib>
#include <vector>

namespace flan {

std::recursive_mutex FFTHelper::mutex;

size_t power_of_2_container(size_t window_size) {
    size_t p = 1;
    while (p < window_size) p <<= 1;
    return p;
}

namespace {

// In-place iterative radix-2 DIT complex FFT. sign=-1 forward, +1 inverse
// (unnormalized, FFTW convention).
void fft_inplace(std::complex<float>* a, size_t n, int sign) {
    for (size_t i = 1, j = 0; i < n; ++i) {
        size_t bit = n >> 1;
        for (; j & bit; bit >>= 1) j ^= bit;
        j ^= bit;
        if (i < j) std::swap(a[i], a[j]);
    }
    for (size_t len = 2; len <= n; len <<= 1) {
        const double ang = sign * 2.0 * M_PI / (double)len;
        const std::complex<double> wl(std::cos(ang), std::sin(ang));
        for (size_t i = 0; i < n; i += len) {
            std::complex<double> w(1.0, 0.0);
            for (size_t k = 0; k < len / 2; ++k) {
                const std::complex<double> u(a[i + k]);
                const std::complex<double> v =
                    std::complex<double>(a[i + k + len / 2]) * w;
                a[i + k] = std::complex<float>(u + v);
                a[i + k + len / 2] = std::complex<float>(u - v);
                w *= wl;
            }
        }
    }
}

// O(n^2) DFT for non-power-of-two sizes (double accumulation, same
// FFTW-unnormalized conventions). Wavetable::resample_waveforms
// (Wavetable.cpp:67-132) transforms ARBITRARY per-cycle lengths — the
// only reference call site not routed through power_of_2_container.
void naive_dft(std::complex<float>* a, size_t n, int sign) {
    std::vector<std::complex<double>> in(n), out(n);
    for (size_t i = 0; i < n; ++i) in[i] = std::complex<double>(a[i]);
    for (size_t k = 0; k < n; ++k) {
        std::complex<double> acc(0.0, 0.0);
        for (size_t j = 0; j < n; ++j) {
            const double ang = sign * 2.0 * M_PI * (double)(k * j % n)
                / (double)n;
            acc += in[j] * std::complex<double>(std::cos(ang),
                                                std::sin(ang));
        }
        out[k] = acc;
    }
    for (size_t k = 0; k < n; ++k) a[k] = std::complex<float>(out[k]);
}

void transform(std::complex<float>* a, size_t n, int sign) {
    if (n & (n - 1))
        naive_dft(a, n, sign);
    else
        fft_inplace(a, n, sign);
}

}  // namespace

struct OraclePlan {
    std::vector<std::complex<float>> work;
};

FFTHelper::FFTHelper(uint32_t window_size, bool useR2C, bool useC2R,
                     bool /*measure*/) {
    std::lock_guard<std::recursive_mutex> lock(mutex);
    _real_buffer_size = window_size;
    real_buffer = (float*)std::malloc(sizeof(float) * _real_buffer_size);
    complex_buffer = (std::complex<float>*)std::malloc(
        sizeof(std::complex<float>) * complex_buffer_size());
    auto* plan = new OraclePlan;
    plan->work.resize(_real_buffer_size);
    r2c_plan = useR2C ? (fftwf_plan_s*)plan : nullptr;
    c2r_plan = useC2R ? (fftwf_plan_s*)plan : nullptr;
    if (!useR2C && !useC2R) delete plan;
}

FFTHelper::~FFTHelper() {
    std::lock_guard<std::recursive_mutex> lock(mutex);
    delete (OraclePlan*)(r2c_plan ? r2c_plan : c2r_plan);
    std::free(real_buffer);
    std::free(complex_buffer);
}

void FFTHelper::r2c_execute() {
    auto& w = ((OraclePlan*)r2c_plan)->work;
    const size_t n = _real_buffer_size;
    for (size_t i = 0; i < n; ++i) w[i] = real_buffer[i];
    transform(w.data(), n, -1);
    for (size_t k = 0; k < complex_buffer_size(); ++k) complex_buffer[k] = w[k];
}

void FFTHelper::c2r_execute() {
    auto& w = ((OraclePlan*)c2r_plan)->work;
    const size_t n = _real_buffer_size;
    const size_t bins = complex_buffer_size();
    for (size_t k = 0; k < bins; ++k) w[k] = complex_buffer[k];
    for (size_t k = bins; k < n; ++k) w[k] = std::conj(complex_buffer[n - k]);
    transform(w.data(), n, +1);
    for (size_t i = 0; i < n; ++i) real_buffer[i] = w[i].real();
}

}  // namespace flan
