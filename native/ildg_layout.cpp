// Native gauge-ingest kernel: one-pass ILDG -> packed device layout.
//
// The runtime-side native component of the framework (the reference's
// gauge load path is C++ too: c-lime + reorder + compress in
// lib/cuda_gauge_field.cu [U]; SURVEY.md C28/C3).  Converts an ILDG
// binary payload (big-endian f64, site order x-fastest..t-slowest, per
// site mu = x,y,z,t row-major 3x3 complex) directly into the packed
// device layout
//
//     out[4(mu), 2(parity), 3(row), 3(col), 2(re/im), T, Z, S]  float32
//
// with S = Y * X/2 (even-odd x-packing, parity = (t+z+y+x) & 1) and the
// antiperiodic-T boundary phase folded into the t-links — replacing a
// chain of numpy byteswap/transpose/gather passes with a single sweep.
//
// Build: g++ -O3 -shared -fPIC -o libildg_layout.so ildg_layout.cpp
// (driven by tpuqcd/io/native.py; ctypes interface, no pybind11).

#include <cstdint>
#include <cstring>

namespace {

inline double bswap_f64(const unsigned char* p) {
    uint64_t v;
    std::memcpy(&v, p, 8);
#if defined(__GNUC__)
    v = __builtin_bswap64(v);
#else
    v = ((v & 0xffULL) << 56) | ((v & 0xff00ULL) << 40) |
        ((v & 0xff0000ULL) << 24) | ((v & 0xff000000ULL) << 8) |
        ((v >> 8) & 0xff000000ULL) | ((v >> 24) & 0xff0000ULL) |
        ((v >> 40) & 0xff00ULL) | (v >> 56);
#endif
    double d;
    std::memcpy(&d, &v, 8);
    return d;
}

}  // namespace

extern "C" {

// src: raw ildg-binary-data payload (big-endian f64)
// dst: float32 buffer of size 4*2*3*3*2*T*Z*S
// antiperiodic_t: fold -1 into U_t(t = T-1)
int ildg_to_device_f32(const unsigned char* src, float* dst,
                       int64_t T, int64_t Z, int64_t Y, int64_t X,
                       int antiperiodic_t) {
    if (X % 2 != 0) return 1;
    const int64_t Xh = X / 2;
    const int64_t S = Y * Xh;
    const int64_t TZS = T * Z * S;
    // dst strides for [mu, par, row, col, ri, T, Z, S] (C order)
    const int64_t s_ri = TZS;
    const int64_t s_col = 2 * s_ri;
    const int64_t s_row = 3 * s_col;
    const int64_t s_par = 3 * s_row;
    const int64_t s_mu = 2 * s_par;

    const unsigned char* p = src;
    for (int64_t t = 0; t < T; ++t) {
        for (int64_t z = 0; z < Z; ++z) {
            for (int64_t y = 0; y < Y; ++y) {
                for (int64_t x = 0; x < X; ++x) {
                    const int64_t par = (t + z + y + x) & 1;
                    const int64_t xh = x >> 1;
                    const int64_t site = (t * Z + z) * S + y * Xh + xh;
                    for (int64_t mu = 0; mu < 4; ++mu) {
                        const float sign =
                            (antiperiodic_t && mu == 3 && t == T - 1)
                                ? -1.0f : 1.0f;
                        float* base = dst + mu * s_mu + par * s_par + site;
                        for (int64_t r = 0; r < 3; ++r) {
                            for (int64_t c = 0; c < 3; ++c) {
                                const double re = bswap_f64(p);
                                const double im = bswap_f64(p + 8);
                                p += 16;
                                base[r * s_row + c * s_col + 0 * s_ri] =
                                    sign * static_cast<float>(re);
                                base[r * s_row + c * s_col + 1 * s_ri] =
                                    sign * static_cast<float>(im);
                            }
                        }
                    }
                }
            }
        }
    }
    return 0;
}

}  // extern "C"
