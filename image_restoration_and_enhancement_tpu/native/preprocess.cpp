// Native host-side image preprocessing for the data loader hot path.
//
// The reference leans on OpenCV's C++ kernels through cv2 for all host image
// work (scripts/make_synthetic_pairs.py, per-script Dataset classes). This
// library is the framework's own native layer for the same work: bicubic
// resampling, normalization to [-1,1], Gaussian-noise degradation and LAB-L
// grayscale, operating on raw interleaved RGB buffers so the Python side is
// just ctypes + numpy views. Compiled with -O3 -march=native; exact math is
// kept simple and deterministic (xorshift PRNG) so host and device
// degradation paths can be cross-checked in tests.
//
// All images are HWC, C=3 unless noted. Coordinates follow the usual
// half-pixel-center convention used by PIL/cv2 bicubic.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// Catmull-Rom-style cubic with a = -0.5 (cv2/PIL default).
static inline float cubic_w(float x) {
    const float a = -0.5f;
    x = std::fabs(x);
    if (x < 1.0f) return ((a + 2.0f) * x - (a + 3.0f)) * x * x + 1.0f;
    if (x < 2.0f) return (((x - 5.0f) * x + 8.0f) * x - 4.0f) * a;
    return 0.0f;
}

// Bicubic resize float32 HWC -> HWC.
void resize_bicubic_f32(const float* src, int sh, int sw, int c,
                        float* dst, int dh, int dw) {
    const float sy = (float)sh / dh;
    const float sx = (float)sw / dw;
    for (int oy = 0; oy < dh; ++oy) {
        const float fy = (oy + 0.5f) * sy - 0.5f;
        const int iy = (int)std::floor(fy);
        const float ty = fy - iy;
        float wy[4];
        for (int k = 0; k < 4; ++k) wy[k] = cubic_w(ty - (k - 1));
        for (int ox = 0; ox < dw; ++ox) {
            const float fx = (ox + 0.5f) * sx - 0.5f;
            const int ix = (int)std::floor(fx);
            const float tx = fx - ix;
            float wx[4];
            for (int k = 0; k < 4; ++k) wx[k] = cubic_w(tx - (k - 1));
            for (int ch = 0; ch < c; ++ch) {
                float acc = 0.0f, wsum = 0.0f;
                for (int ky = 0; ky < 4; ++ky) {
                    int yy = std::min(std::max(iy + ky - 1, 0), sh - 1);
                    for (int kx = 0; kx < 4; ++kx) {
                        int xx = std::min(std::max(ix + kx - 1, 0), sw - 1);
                        const float w = wy[ky] * wx[kx];
                        acc += w * src[(yy * sw + xx) * c + ch];
                        wsum += w;
                    }
                }
                dst[(oy * dw + ox) * c + ch] = acc / wsum;
            }
        }
    }
}

// uint8 HWC -> float32 HWC in [-1, 1] (the trainers' normalization).
void u8_to_pm1(const uint8_t* src, int n, float* dst) {
    const float k = 1.0f / 127.5f;
    for (int i = 0; i < n; ++i) dst[i] = src[i] * k - 1.0f;
}

// float32 [-1,1] -> uint8 with round + clamp.
void pm1_to_u8(const float* src, int n, uint8_t* dst) {
    for (int i = 0; i < n; ++i) {
        float v = (src[i] + 1.0f) * 127.5f + 0.5f;
        dst[i] = (uint8_t)std::min(std::max(v, 0.0f), 255.0f);
    }
}

static inline uint64_t xorshift64(uint64_t* s) {
    uint64_t x = *s;
    x ^= x << 13; x ^= x >> 7; x ^= x << 17;
    *s = x;
    return x;
}

// Box-Muller Gaussian noise added in [0,255] units onto uint8, clamped.
void add_gaussian_noise_u8(uint8_t* img, int n, float sigma, uint64_t seed) {
    uint64_t s = seed ? seed : 0x9E3779B97F4A7C15ull;
    const float two_pi = 6.28318530718f;
    for (int i = 0; i < n; i += 2) {
        const float u1 = ((xorshift64(&s) >> 11) + 1.0f) * (1.0f / 9007199254740993.0f);
        const float u2 = (xorshift64(&s) >> 11) * (1.0f / 9007199254740992.0f);
        const float r = std::sqrt(-2.0f * std::log(u1)) * sigma;
        const float z0 = r * std::cos(two_pi * u2);
        const float z1 = r * std::sin(two_pi * u2);
        float v0 = img[i] + z0;
        img[i] = (uint8_t)std::min(std::max(v0, 0.0f), 255.0f);
        if (i + 1 < n) {
            float v1 = img[i + 1] + z1;
            img[i + 1] = (uint8_t)std::min(std::max(v1, 0.0f), 255.0f);
        }
    }
}

// sRGB u8 -> LAB L channel in [0,255] u8 (cv2 LAB-L convention),
// used for the colorization input (make_synthetic_pairs.py:84-90).
void rgb_to_lab_l_u8(const uint8_t* rgb, int npix, uint8_t* out) {
    for (int i = 0; i < npix; ++i) {
        float r = rgb[i * 3 + 0] / 255.0f;
        float g = rgb[i * 3 + 1] / 255.0f;
        float b = rgb[i * 3 + 2] / 255.0f;
        auto lin = [](float c) {
            return c <= 0.04045f ? c / 12.92f : std::pow((c + 0.055f) / 1.055f, 2.4f);
        };
        r = lin(r); g = lin(g); b = lin(b);
        float y = 0.212671f * r + 0.715160f * g + 0.072169f * b;  // D65 Y
        const float eps = 0.008856f;
        float fy = y > eps ? std::cbrt(y) : (7.787f * y + 16.0f / 116.0f);
        float L = 116.0f * fy - 16.0f;
        out[i] = (uint8_t)std::min(std::max(L * 255.0f / 100.0f, 0.0f), 255.0f);
    }
}

}  // extern "C"
