// Native DSP hot loops for the data pipeline (loaded via ctypes).
//
// The reference accelerates its data-pipeline inner loops with numba JIT
// (reference: src/data/components/perturb.py:125-142 EQ_process_band,
// 1593-1611 set_holes) and pedalboard's C++ Compressor (perturb.py:578-633).
// numba is not available here; these are the equivalent native kernels,
// compiled once with g++ -O3 and called from use_tpu/data/native.py.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libusedsp.so dsp.cpp

#include <cstdint>
#include <cmath>
#include <algorithm>

extern "C" {

// State-dependent one-pole envelope follower (dynamic range compression).
// level[i] smoothed with attack_coef when rising, release_coef when falling.
void envelope_follow(const float* level, float* out, int64_t n,
                     float attack_coef, float release_coef) {
    if (n <= 0) return;
    float state = level[0];
    for (int64_t i = 0; i < n; ++i) {
        float x = level[i];
        float coef = (x > state) ? attack_coef : release_coef;
        state = coef * state + (1.0f - coef) * x;
        out[i] = state;
    }
}

// Punch rectangular zero holes into a complex spectrogram stored as
// interleaved float32 re/im, shape [F, T]. Hole centers/widths are
// precomputed by the caller (keeps RNG in python, matching the reference's
// np.random stream discipline).
void set_holes(float* spec_ri, int64_t freqs, int64_t times,
               const int64_t* holes, int64_t n_holes) {
    // holes: n_holes x 4 ints: f_idx, t_idx, w_freq, w_time
    for (int64_t h = 0; h < n_holes; ++h) {
        int64_t f0 = std::max<int64_t>(0, holes[4 * h] - holes[4 * h + 2]);
        int64_t f1 = std::min<int64_t>(freqs, holes[4 * h] + holes[4 * h + 2]);
        int64_t t0 = std::max<int64_t>(0, holes[4 * h + 1] - holes[4 * h + 3]);
        int64_t t1 = std::min<int64_t>(times, holes[4 * h + 1] + holes[4 * h + 3]);
        for (int64_t f = f0; f < f1; ++f) {
            float* row = spec_ri + (f * times + t0) * 2;
            std::fill(row, row + (t1 - t0) * 2, 0.0f);
        }
    }
}

// Cascaded biquad (sos) filtering, float64, matching scipy.signal.sosfilt
// semantics with zero initial state. sos: n_sections x 6 (b0 b1 b2 a0 a1 a2).
void sosfilt(const double* sos, int64_t n_sections, double* x, int64_t n) {
    for (int64_t s = 0; s < n_sections; ++s) {
        const double b0 = sos[6 * s], b1 = sos[6 * s + 1], b2 = sos[6 * s + 2];
        const double a1 = sos[6 * s + 4], a2 = sos[6 * s + 5];
        double z1 = 0.0, z2 = 0.0;
        for (int64_t i = 0; i < n; ++i) {
            double in = x[i];
            double out = b0 * in + z1;
            z1 = b1 * in - a1 * out + z2;
            z2 = b2 * in - a2 * out;
            x[i] = out;
        }
    }
}

}  // extern "C"
