// Native host-side batch ops for the data path.
//
// Counterpart of the reference's C++-backed host loaders (its data workers
// lean on torch's pinned-memory C++ tensor ops; `image_lidar_datamanager.py`
// 232-307). The TPU feed path is host-numpy; these kernels remove the two
// numpy hot spots in per-step batch assembly:
//   - extract_patches: gather B RGB patches from the [N,H,W,3] image stack
//     (uint8 -> float normalize fused into the copy)
//   - bin_points: bucket lidar points into a (channel, azimuth) occupancy
//     grid (missing-point synthesis / raster_pts preprocessing)
//
// Built with `gcc -O3 -shared -fPIC` on first use (see native/__init__.py);
// every entry point has a numpy fallback so the library works without a
// toolchain.

#include <cstdint>
#include <cmath>
#include <cstring>

extern "C" {

// images: [n, h, w, 3] uint8 or float32 (is_u8)
// out:    [b, gt, gt, 3] float32, normalized to [0,1] when is_u8
void extract_patches_u8(const uint8_t* images, int64_t n, int64_t h, int64_t w,
                        const int64_t* cam_idx, const int64_t* r0, const int64_t* c0,
                        int64_t b, int64_t gt, float* out) {
    const float scale = 1.0f / 255.0f;
    for (int64_t i = 0; i < b; ++i) {
        const uint8_t* img = images + cam_idx[i] * h * w * 3;
        float* dst = out + i * gt * gt * 3;
        for (int64_t r = 0; r < gt; ++r) {
            const uint8_t* src = img + ((r0[i] + r) * w + c0[i]) * 3;
            for (int64_t k = 0; k < gt * 3; ++k) dst[k] = src[k] * scale;
            dst += gt * 3;
        }
    }
}

void extract_patches_f32(const float* images, int64_t n, int64_t h, int64_t w,
                         const int64_t* cam_idx, const int64_t* r0, const int64_t* c0,
                         int64_t b, int64_t gt, float* out) {
    for (int64_t i = 0; i < b; ++i) {
        const float* img = images + cam_idx[i] * h * w * 3;
        float* dst = out + i * gt * gt * 3;
        for (int64_t r = 0; r < gt; ++r) {
            const float* src = img + ((r0[i] + r) * w + c0[i]) * 3;
            std::memcpy(dst, src, sizeof(float) * gt * 3);
            dst += gt * 3;
        }
    }
}

// points: [n, 3] sensor-frame xyz. Marks occupied[channel, azim_bin] and
// writes each point's (channel, azim_bin) pair.
void bin_points(const float* points, int64_t n,
                const float* elevations, int64_t n_chan,
                float azim_res_deg, int64_t n_azim,
                uint8_t* occupied, int32_t* out_chan, int32_t* out_azim) {
    const float rad2deg = 57.29577951308232f;
    for (int64_t i = 0; i < n; ++i) {
        const float x = points[i * 3], y = points[i * 3 + 1], z = points[i * 3 + 2];
        const float r2d = std::sqrt(x * x + y * y);
        const float elev = rad2deg * std::atan2(z, r2d > 1e-9f ? r2d : 1e-9f);
        // nearest-elevation channel
        int64_t best = 0;
        float bestd = 1e30f;
        for (int64_t c = 0; c < n_chan; ++c) {
            const float d = std::fabs(elev - elevations[c]);
            if (d < bestd) { bestd = d; best = c; }
        }
        float azim = rad2deg * std::atan2(y, x);  // [-180, 180)
        int64_t ab = (int64_t)((azim + 180.0f) / azim_res_deg);
        if (ab < 0) ab = 0;
        if (ab >= n_azim) ab = n_azim - 1;
        occupied[best * n_azim + ab] = 1;
        out_chan[i] = (int32_t)best;
        out_azim[i] = (int32_t)ab;
    }
}

}  // extern "C"
