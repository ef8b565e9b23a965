// Golden-fixture generator: drives the ACTUAL reference implementation.
//
// This file compiles the reference's self-contained units out-of-tree
// (never copying them into this repo):
//   /root/reference/src/flan/phase_vocoder.cpp      (forward/inverse PV math)
//   /root/reference/src/flan/WindowFunctions.cpp    (hann)
//   /root/reference/src/flan/PV/PVBuffer.cpp        (.flan RIFF save/load)
//   /root/reference/src/flan/Utility/Bytes.cpp      (writeRIFF)
//   /root/reference/src/flan/defines.cpp            (pi constants)
// and replays the driver loops of the reference conversions
// (Conversions/AudioPV.cpp:12-78 forward, :86-139 inverse) around them,
// substituting a naive double-precision DFT for FFTWF (which is not
// installed). Exactness to FFTW is irrelevant: this harness IS the oracle
// the Python tests compare against, and every behavioral quirk (phase
// wrapping, 2.67 OLA gain, num_hops integer-division floor, 24-bit
// truncating quantization) comes from the reference's own compiled code or
// is replicated here with a citation.
//
// Usage: gen_fixtures <outdir>
// Outputs (all raw little-endian, metadata in fixtures.json written here):
//   sig1.f32 / sig2.f32          input audio (channel-major)
//   fwd_sig{1,2}_mag.f32 / _freq.f32   reference forward PV planes [C,F,B]
//   fwd_sig1.flan                reference PVBuffer::save of fwd PV
//   inv_sig1.f32                 reference inverse PV audio of fwd PV
//   codec_mag.f32 / codec_freq.f32     synthetic exact-f32 MF tensor
//   codec.flan                   reference PVBuffer::save of that tensor
//   codec_loaded_mag.f32 / _freq.f32   reference PVBuffer::load round trip

#include <algorithm>
#include <cmath>
#include <complex>
#include <cstdint>
#include <cstdio>
#include <fstream>
#include <string>
#include <vector>

#include "flan/phase_vocoder.h"
#include "flan/WindowFunctions.h"
#include "flan/PV/PVBuffer.h"
#include "flan/DSPUtility.h"

using namespace flan;

static void dump_f32(const std::string& path, const float* p, size_t n) {
    std::ofstream f(path, std::ios::binary);
    f.write(reinterpret_cast<const char*>(p), n * sizeof(float));
}

// Unnormalized r2c DFT, double accumulation, float output — stands in for
// FFTWF's fftwf_plan_dft_r2c_1d (reference FFTHelper.cpp r2c_execute).
static std::vector<std::complex<float>> r2c(const std::vector<float>& x) {
    const int n = (int)x.size();
    const int bins = n / 2 + 1;
    std::vector<std::complex<float>> out(bins);
    for (int k = 0; k < bins; ++k) {
        double re = 0.0, im = 0.0;
        for (int i = 0; i < n; ++i) {
            const double w = -2.0 * M_PI * k * i / n;
            re += (double)x[i] * std::cos(w);
            im += (double)x[i] * std::sin(w);
        }
        out[k] = std::complex<float>((float)re, (float)im);
    }
    return out;
}

// Unnormalized c2r inverse DFT (hermitian half-spectrum -> n real samples),
// matching FFTW's c2r convention: ifft(fft(x)) == n * x.
static std::vector<float> c2r(const std::vector<std::complex<float>>& X,
                              int n) {
    std::vector<float> out(n);
    const int bins = n / 2 + 1;
    for (int i = 0; i < n; ++i) {
        double acc = (double)X[0].real();
        for (int k = 1; k < bins - 1; ++k) {
            const double w = 2.0 * M_PI * k * i / n;
            acc += 2.0 * ((double)X[k].real() * std::cos(w) -
                          (double)X[k].imag() * std::sin(w));
        }
        // Nyquist term appears once (its conjugate image is itself).
        const double wn = 2.0 * M_PI * (bins - 1) * i / n;
        if (n % 2 == 0)
            acc += (double)X[bins - 1].real() * std::cos(wn) -
                   (double)X[bins - 1].imag() * std::sin(wn);
        else {
            acc += 2.0 * ((double)X[bins - 1].real() * std::cos(wn) -
                          (double)X[bins - 1].imag() * std::sin(wn));
        }
        out[i] = (float)acc;
    }
    return out;
}

// Forward conversion driver replaying Conversions/AudioPV.cpp:12-78 around
// the reference's compiled phase_vocoder().
static PVBuffer forward_pv(const std::vector<float>& audio, int channels,
                           int num_frames, float sample_rate, int window_size,
                           int hop_size, int dft_size) {
    const int num_bins = dft_size / 2 + 1;
    // AudioPV.cpp:17 — integer division inside std::ceil (the floor quirk).
    const int num_hops = num_frames / hop_size + 1;

    PVBuffer::Format fmt;
    fmt.num_channels = channels;
    fmt.num_frames = num_hops;
    fmt.num_bins = num_bins;
    fmt.sample_rate = sample_rate;
    fmt.analysis_rate = sample_rate / hop_size;  // AudioPV.cpp:25 (float div)
    fmt.window_size = window_size;
    PVBuffer out(fmt);

    // AudioPV.cpp:30-34 — hann sampled at i / (window_size - 1).
    std::vector<float> hann(window_size);
    for (int i = 0; i < window_size; ++i)
        hann[i] = Windows::hann((float)i / (float)(window_size - 1));

    std::vector<double> phase_buffer(num_bins);
    std::vector<float> fft_in(dft_size);
    for (int ch = 0; ch < channels; ++ch) {
        std::fill(phase_buffer.begin(), phase_buffer.end(), 0.0);
        for (int pv_frame = 0; pv_frame < num_hops; ++pv_frame) {
            const int start = hop_size * pv_frame - window_size / 2;
            for (int i = 0; i < dft_size; ++i) fft_in[i] = 0.0f;
            for (int i = 0; i < window_size; ++i) {
                const int f = start + i;
                const float s = (f < 0 || f >= num_frames)
                                    ? 0.0f
                                    : audio[(size_t)ch * num_frames + f];
                fft_in[i] = s * hann[i];
            }
            const auto spec = r2c(fft_in);
            for (int bin = 0; bin < num_bins; ++bin)
                out.set_MF(ch, pv_frame, bin,
                           phase_vocoder(phase_buffer[bin], spec[bin],
                                         out.bin_to_frequency(bin),
                                         out.get_analysis_rate(),
                                         out.get_sample_rate()));
        }
    }
    return out;
}

// Inverse conversion driver replaying Conversions/AudioPV.cpp:86-139 around
// the reference's compiled inverse_phase_vocoder().
static std::vector<float> inverse_pv(const PVBuffer& pv) {
    const int channels = pv.get_num_channels();
    const int pv_frames = pv.get_num_frames();
    const int num_bins = pv.get_num_bins();
    const int window_size = pv.get_window_size();
    const int hop_size = pv.get_hop_size();
    const int dft_size = pv.get_dft_size();
    const int out_frames = pv_frames * hop_size;

    // AudioPV.cpp:99-103 — the empirical 2.67 gain; integer expression
    // dft_size * window_size / hop_size evaluated in int, then float div.
    const float window_scale =
        2.67f / (float)(dft_size * window_size / hop_size);
    std::vector<float> hann(window_size);
    for (int i = 0; i < window_size; ++i)
        hann[i] = Windows::hann((float)i / (float)(window_size - 1)) *
                  window_scale;

    std::vector<float> out((size_t)channels * out_frames, 0.0f);
    std::vector<double> phase_buffer(num_bins);
    std::vector<std::complex<float>> spec(num_bins);
    for (int ch = 0; ch < channels; ++ch) {
        std::fill(phase_buffer.begin(), phase_buffer.end(), 0.0);
        for (int pv_frame = 0; pv_frame < pv_frames; ++pv_frame) {
            for (int bin = 0; bin < num_bins; ++bin)
                spec[bin] = inverse_phase_vocoder(
                    phase_buffer[bin], pv.get_MF(ch, pv_frame, bin),
                    pv.get_analysis_rate());
            const auto ifft = c2r(spec, dft_size);
            const int start = hop_size * pv_frame - window_size / 2;
            const int lo = std::max(start, 0);
            const int hi = std::min(start + window_size, out_frames);
            for (int f = lo; f < hi; ++f)
                out[(size_t)ch * out_frames + f] +=
                    ifft[f - start] * hann[f - start];
        }
    }
    return out;
}

static void dump_pv_planes(const PVBuffer& pv, const std::string& mag_path,
                           const std::string& freq_path) {
    const int C = pv.get_num_channels(), F = pv.get_num_frames(),
              B = pv.get_num_bins();
    std::vector<float> mag((size_t)C * F * B), freq((size_t)C * F * B);
    size_t i = 0;
    for (int c = 0; c < C; ++c)
        for (int f = 0; f < F; ++f)
            for (int b = 0; b < B; ++b, ++i) {
                const MF mf = pv.get_MF(c, f, b);
                mag[i] = mf.m;
                freq[i] = mf.f;
            }
    dump_f32(mag_path, mag.data(), mag.size());
    dump_f32(freq_path, freq.data(), freq.size());
}

int main(int argc, char** argv) {
    if (argc != 2) {
        std::fprintf(stderr, "usage: gen_fixtures <outdir>\n");
        return 1;
    }
    const std::string dir = std::string(argv[1]) + "/";

    // --- sig1: mono two-tone, sr=8000, N=1600 ---------------------------
    const float sr1 = 8000.0f;
    const int n1 = 1600;
    std::vector<float> sig1(n1);
    for (int i = 0; i < n1; ++i) {
        const double t = (double)i / 8000.0;
        sig1[i] = (float)(0.5 * std::sin(2.0 * M_PI * 440.5 * t) +
                          0.25 * std::sin(2.0 * M_PI * 1234.0 * t + 0.3));
    }
    dump_f32(dir + "sig1.f32", sig1.data(), sig1.size());

    PVBuffer pv1 = forward_pv(sig1, 1, n1, sr1, 256, 64, 512);
    dump_pv_planes(pv1, dir + "fwd_sig1_mag.f32", dir + "fwd_sig1_freq.f32");
    pv1.save(dir + "fwd_sig1.flan");

    const auto inv1 = inverse_pv(pv1);
    dump_f32(dir + "inv_sig1.f32", inv1.data(), inv1.size());

    // --- sig2: stereo chirp + tones, sr=8000, awkward N=1037 -------------
    const float sr2 = 8000.0f;
    const int n2 = 1037;
    std::vector<float> sig2(2 * n2);
    for (int i = 0; i < n2; ++i) {
        const double t = (double)i / 8000.0;
        sig2[i] = (float)(0.6 * std::sin(2.0 * M_PI * (200.0 * t + 1500.0 * t * t)));
        sig2[n2 + i] =
            (float)(0.3 * std::sin(2.0 * M_PI * 523.25 * t) +
                    0.1 * std::sin(2.0 * M_PI * 3000.0 * t) *
                        std::sin(2.0 * M_PI * 7.0 * t));
    }
    dump_f32(dir + "sig2.f32", sig2.data(), sig2.size());

    PVBuffer pv2 = forward_pv(sig2, 2, n2, sr2, 128, 48, 256);
    dump_pv_planes(pv2, dir + "fwd_sig2_mag.f32", dir + "fwd_sig2_freq.f32");

    // --- codec tensor: exact-float32 values reproducible in numpy --------
    // m = f32(h % 200001) / 100.0f - 1000.0f   (covers clamp both sides:
    //     |m|/dft up to 1000/512 ≈ 1.95 -> exercises the ±1.0 clamp and the
    //     +1.0 -> 0x800000 sign-wrap quirk of the 24-bit pack)
    // f = f32(h2 % 1800001) / 100.0f - 9000.0f (covers ±sample_rate clamp)
    {
        const int C = 2, F = 7, B = 33;  // dft = 64
        PVBuffer::Format fmt;
        fmt.num_channels = C;
        fmt.num_frames = F;
        fmt.num_bins = B;
        fmt.sample_rate = 8000.0f;
        fmt.analysis_rate = 8000.0f / 16.0f;
        fmt.window_size = 48;
        PVBuffer cod(fmt);
        std::vector<float> mag((size_t)C * F * B), freq((size_t)C * F * B);
        size_t i = 0;
        for (int c = 0; c < C; ++c)
            for (int f = 0; f < F; ++f)
                for (int b = 0; b < B; ++b, ++i) {
                    const uint32_t h = (uint32_t)(i * 2654435761u);
                    const uint32_t h2 = (uint32_t)((i + 77) * 2246822519u);
                    const float m =
                        (float)(h % 200001u) / 100.0f - 1000.0f;
                    const float fr =
                        (float)(h2 % 1800001u) / 100.0f - 9000.0f;
                    mag[i] = m;
                    freq[i] = fr;
                    cod.set_MF(c, f, b, MF{m, fr});
                }
        dump_f32(dir + "codec_mag.f32", mag.data(), mag.size());
        dump_f32(dir + "codec_freq.f32", freq.data(), freq.size());
        cod.save(dir + "codec.flan");

        // Reference load round trip (exercises PVBuffer.cpp:216 load path).
        PVBuffer loaded(dir + "codec.flan");
        dump_pv_planes(loaded, dir + "codec_loaded_mag.f32",
                       dir + "codec_loaded_freq.f32");
    }

    // --- DSPUtility + defines goldens (DSPUtility.cpp:37-53,115-190,
    //     defines.cpp:5-6) -------------------------------------------------
    {
        // parabolic interpolation on awkward triples including a nearly
        // flat one (y0 - 2 y1 + y2 ~ 0) and asymmetric slopes
        const float quads[][4] = {
            {0.5f, 1.0f, 0.25f, 7},  {1.0f, 1.0f, 0.999999f, 3},
            {-2.0f, 0.5f, -1.0f, 0}, {0.1f, 0.9f, 0.85f, 100},
            {3.0f, 3.5f, 3.25f, 55},
        };
        std::vector<float> par;
        for (const auto& q : quads) {
            const auto xy =
                parabolic_interpolation(q[0], q[1], q[2], (int)q[3]);
            par.push_back(xy.first);
            par.push_back(xy.second);
        }
        dump_f32(dir + "dsp_parabolic.f32", par.data(), par.size());

        // dB <-> amplitude over a grid (pure float math, defines.cpp:5-6)
        std::vector<float> db_amp;
        for (int i = -120; i <= 40; i += 7)
            db_amp.push_back(decibel_to_amplitude((float)i));
        for (float a : {1e-6f, 0.001f, 0.5f, 1.0f, 2.0f, 31.623f})
            db_amp.push_back(amplitude_to_decibel(a));
        dump_f32(dir + "dsp_db_amp.f32", db_amp.data(), db_amp.size());

        // find_peaks / find_valleys on a deterministic bumpy signal:
        // reference walker with plateau handling + parabolic refinement
        const int np = 96;
        std::vector<float> bumpy(np);
        for (int i = 0; i < np; ++i)
            bumpy[i] = (float)(std::sin(2.0 * M_PI * i / 19.0) +
                               0.4 * std::sin(2.0 * M_PI * i / 7.3 + 1.0));
        // plateau cases: a shoulder on a rising slope (not a peak) and a
        // genuine plateau peak (one entry at the center)
        bumpy[40] = bumpy[41] = bumpy[39];
        const float pk = std::max({bumpy[58], bumpy[62]}) + 0.25f;
        bumpy[59] = bumpy[60] = bumpy[61] = pk;
        dump_f32(dir + "dsp_bumpy.f32", bumpy.data(), bumpy.size());
        for (const bool interp : {false, true}) {
            const auto peaks = find_peaks(bumpy, -1, false, interp);
            const auto valleys = find_valleys(bumpy, -1, false, interp);
            std::vector<float> pk;
            for (const auto& p : peaks) {
                pk.push_back(p.x());
                pk.push_back(p.y());
            }
            std::vector<float> vl;
            for (const auto& v : valleys) {
                vl.push_back(v.x());
                vl.push_back(v.y());
            }
            const std::string sfx = interp ? "_interp" : "_raw";
            dump_f32(dir + "dsp_peaks" + sfx + ".f32", pk.data(), pk.size());
            dump_f32(dir + "dsp_valleys" + sfx + ".f32", vl.data(),
                     vl.size());
        }

        // mean_and_sd (population sd, DSPUtility.cpp tail)
        const vec2 ms = mean_and_sd(bumpy);
        const float msv[2] = {ms.x(), ms.y()};
        dump_f32(dir + "dsp_mean_sd.f32", msv, 2);
    }

    std::printf("fixtures written to %s\n", dir.c_str());
    return 0;
}
