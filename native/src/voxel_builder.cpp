// Native fast path for voxel-map construction.
//
// Equivalent of the reference's CPU map build (reference:
// src/app/localization/pcm_matching/src/voxel_hash_map.cpp:270-285 AddPoints
// with min-spacing), re-implemented standalone: the insertion is sequential
// and hash-heavy, the one part of the TPU-native pipeline that belongs on the
// host in C++. Exposed as a C ABI consumed via ctypes
// (elimaloc_tpu/map/native_builder.py); semantics are bit-identical to the
// NumPy fallback in elimaloc_tpu/map/builder.py (floor bucketing, first-come
// insertion order, spacing sqrt(voxel^2 / max_points)).
//
// Build: make -C native   ->  native/build/libelimaloc_native.so

#include <cmath>
#include <cstdint>
#include <unordered_map>
#include <vector>

namespace {

inline int64_t floor_div(double v, double s) {
    return static_cast<int64_t>(std::floor(v / s));
}

struct KeyHash {
    size_t operator()(uint64_t k) const {
        // splitmix64 finalizer: good avalanche for packed voxel keys.
        uint64_t z = k + 0x9e3779b97f4a7c15ull;
        z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ull;
        z = (z ^ (z >> 27)) * 0x94d049bb133111ebull;
        return static_cast<size_t>(z ^ (z >> 31));
    }
};

inline uint64_t pack_key(int64_t x, int64_t y, int64_t z) {
    // 21 bits per axis, offset-shifted: covers +-1M voxels per axis.
    const uint64_t b = 1ull << 20;
    return ((static_cast<uint64_t>(x + b) & 0x1fffffull) << 42) |
           ((static_cast<uint64_t>(y + b) & 0x1fffffull) << 21) |
           (static_cast<uint64_t>(z + b) & 0x1fffffull);
}

}  // namespace

extern "C" {

// Returns the number of voxels written, or -1 on capacity overflow.
int64_t elm_insert_points(const double* points, int64_t n, double voxel_size,
                          int64_t max_pts, int64_t* out_coords,
                          double* out_block, int64_t* out_counts,
                          int64_t cap) {
    const double res2 = voxel_size * voxel_size / static_cast<double>(max_pts);

    std::unordered_map<uint64_t, int64_t, KeyHash> rows;
    rows.reserve(static_cast<size_t>(n));
    int64_t v = 0;

    for (int64_t i = 0; i < n; ++i) {
        const double* p = points + 3 * i;
        const int64_t kx = floor_div(p[0], voxel_size);
        const int64_t ky = floor_div(p[1], voxel_size);
        const int64_t kz = floor_div(p[2], voxel_size);
        const uint64_t key = pack_key(kx, ky, kz);

        auto it = rows.find(key);
        int64_t row;
        if (it == rows.end()) {
            if (v >= cap) return -1;
            row = v++;
            rows.emplace(key, row);
            out_coords[3 * row + 0] = kx;
            out_coords[3 * row + 1] = ky;
            out_coords[3 * row + 2] = kz;
            out_counts[row] = 0;
        } else {
            row = it->second;
        }

        int64_t cnt = out_counts[row];
        if (cnt >= max_pts) continue;

        // Min-spacing rule (voxel_hash_map.hpp:106-113): reject the point if
        // any stored point in this voxel is within sqrt(res2).
        double* block = out_block + (row * max_pts) * 3;
        bool too_close = false;
        for (int64_t j = 0; j < cnt; ++j) {
            const double dx = block[3 * j + 0] - p[0];
            const double dy = block[3 * j + 1] - p[1];
            const double dz = block[3 * j + 2] - p[2];
            if (dx * dx + dy * dy + dz * dz < res2) {
                too_close = true;
                break;
            }
        }
        if (too_close) continue;
        block[3 * cnt + 0] = p[0];
        block[3 * cnt + 1] = p[1];
        block[3 * cnt + 2] = p[2];
        out_counts[row] = cnt + 1;
    }
    return v;
}

// LZF decompression (Marc Lehmann's liblzf stream format, as produced by
// PCL's binary_compressed PCD writer). Returns output length or -1.
int64_t elm_lzf_decompress(const unsigned char* in, int64_t in_len,
                           unsigned char* out, int64_t out_cap) {
    int64_t i = 0, o = 0;
    while (i < in_len) {
        unsigned int ctrl = in[i++];
        if (ctrl < 32) {  // literal run
            int64_t cnt = static_cast<int64_t>(ctrl) + 1;
            if (i + cnt > in_len || o + cnt > out_cap) return -1;
            for (int64_t k = 0; k < cnt; ++k) out[o++] = in[i++];
        } else {  // back reference
            int64_t len = ctrl >> 5;
            if (len == 7) {
                if (i >= in_len) return -1;
                len += in[i++];
            }
            if (i >= in_len) return -1;
            int64_t ref = o - ((ctrl & 0x1f) << 8) - in[i++] - 1;
            if (ref < 0 || o + len + 2 > out_cap) return -1;
            for (int64_t k = 0; k < len + 2; ++k) {
                out[o] = out[ref];
                ++o;
                ++ref;
            }
        }
    }
    return o;
}

}  // extern "C"
