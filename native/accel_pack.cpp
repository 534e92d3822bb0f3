// Native host-side acceleration-structure packer.
//
// The reference's BVH build is C++ (BVH::build, reference src/bvh.h:262-394);
// this is the TPU framework's native equivalent for the host tier: Morton
// ordering, per-triangle Woop inverse transforms and leaf AABBs in one
// multi-pass over the triangle soup.  The Python/numpy implementation in
// scene/accel.py + ops/intersect.py remains the reference implementation and
// the fallback; this module exists so Sponza-class (and much larger) scenes
// pack at native speed.  Exposed through ctypes (no pybind11 in this image).
//
// Build: scripts/build_native.sh  ->  native/libaccel_pack.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <numeric>
#include <vector>

namespace {

inline std::uint64_t spread_bits(std::uint64_t x) {
    x = (x | (x << 16)) & 0x030000FFull;
    x = (x | (x << 8)) & 0x0300F00Full;
    x = (x | (x << 4)) & 0x030C30C3ull;
    x = (x | (x << 2)) & 0x09249249ull;
    return x;
}

}  // namespace

// Each entry point is templated on the vertex element type and exported for
// float32 and float64: the scene pipeline keeps verts in f32, and the former
// f32 -> f64 conversion the fixed-f64 ABI forced cost more host time than
// the packing itself at Sponza-class counts.  All internal math stays f64.

// Morton-order permutation of valid triangles (invalid rows last, stable).
// verts: [n, 3, 3]; valid: [n] uint8; perm_out: [n] int64.
template <typename V>
static void morton_argsort_t(const V* verts, const std::uint8_t* valid,
                             std::int64_t n, std::int64_t* perm_out) {
    std::vector<double> cx(n), cy(n), cz(n);
    double lo[3] = {std::numeric_limits<double>::infinity(),
                    std::numeric_limits<double>::infinity(),
                    std::numeric_limits<double>::infinity()};
    double hi[3] = {-lo[0], -lo[1], -lo[2]};
    for (std::int64_t i = 0; i < n; ++i) {
        const V* v = verts + i * 9;
        // Promote per element: the f32 entry point must agree bit-for-bit
        // with "convert to f64, then pack" (the old ABI and the numpy twin).
        cx[i] = ((double)v[0] + (double)v[3] + (double)v[6]) / 3.0;
        cy[i] = ((double)v[1] + (double)v[4] + (double)v[7]) / 3.0;
        cz[i] = ((double)v[2] + (double)v[5] + (double)v[8]) / 3.0;
        if (valid[i]) {
            lo[0] = std::min(lo[0], cx[i]); hi[0] = std::max(hi[0], cx[i]);
            lo[1] = std::min(lo[1], cy[i]); hi[1] = std::max(hi[1], cy[i]);
            lo[2] = std::min(lo[2], cz[i]); hi[2] = std::max(hi[2], cz[i]);
        }
    }
    double ext[3];
    for (int a = 0; a < 3; ++a)
        ext[a] = std::max(hi[a] - lo[a], 1e-30);

    std::vector<std::uint64_t> code(n);
    for (std::int64_t i = 0; i < n; ++i) {
        if (!valid[i]) {
            code[i] = ~0ull;  // invalid rows sort last
            continue;
        }
        auto q = [&](double c, int a) -> std::uint64_t {
            double t = (c - lo[a]) / ext[a] * 1023.0;
            std::int64_t qi = static_cast<std::int64_t>(t);
            return static_cast<std::uint64_t>(std::clamp<std::int64_t>(qi, 0, 1023));
        };
        code[i] = (spread_bits(q(cx[i], 0)) << 2) |
                  (spread_bits(q(cy[i], 1)) << 1) |
                  spread_bits(q(cz[i], 2));
    }
    std::iota(perm_out, perm_out + n, 0);
    std::stable_sort(perm_out, perm_out + n, [&](std::int64_t a, std::int64_t b) {
        return code[a] < code[b];
    });
}

// Per-triangle Woop inverse transforms, [4, 3n] float32 column-grouped
// layout (see ops/intersect.py:build_woop).  NaN rows for degenerate or
// invalid triangles.
template <typename V>
static void build_woop_t(const V* verts, const std::uint8_t* valid,
                         std::int64_t n, float* out /* [4 * 3n] */) {
    const double nan = std::numeric_limits<double>::quiet_NaN();
    for (std::int64_t i = 0; i < n; ++i) {
        const V* v = verts + i * 9;
        double a[3] = {(double)v[0], (double)v[1], (double)v[2]};
        double e1[3] = {(double)v[3] - a[0], (double)v[4] - a[1],
                        (double)v[5] - a[2]};
        double e2[3] = {(double)v[6] - a[0], (double)v[7] - a[1],
                        (double)v[8] - a[2]};
        double n0[3] = {e1[1] * e2[2] - e1[2] * e2[1],
                        e1[2] * e2[0] - e1[0] * e2[2],
                        e1[0] * e2[1] - e1[1] * e2[0]};
        // Column matrix M = [e1 e2 n0]; det and inverse (adjugate / det).
        double m[3][3] = {{e1[0], e2[0], n0[0]},
                          {e1[1], e2[1], n0[1]},
                          {e1[2], e2[2], n0[2]}};
        double det = m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1]) -
                     m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0]) +
                     m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0]);
        bool ok = valid[i] && std::isfinite(det) && det != 0.0;
        double inv[3][3];
        if (ok) {
            double id = 1.0 / det;
            inv[0][0] = (m[1][1] * m[2][2] - m[1][2] * m[2][1]) * id;
            inv[0][1] = (m[0][2] * m[2][1] - m[0][1] * m[2][2]) * id;
            inv[0][2] = (m[0][1] * m[1][2] - m[0][2] * m[1][1]) * id;
            inv[1][0] = (m[1][2] * m[2][0] - m[1][0] * m[2][2]) * id;
            inv[1][1] = (m[0][0] * m[2][2] - m[0][2] * m[2][0]) * id;
            inv[1][2] = (m[0][2] * m[1][0] - m[0][0] * m[1][2]) * id;
            inv[2][0] = (m[1][0] * m[2][1] - m[1][1] * m[2][0]) * id;
            inv[2][1] = (m[0][1] * m[2][0] - m[0][0] * m[2][1]) * id;
            inv[2][2] = (m[0][0] * m[1][1] - m[0][1] * m[1][0]) * id;
        }
        // Rows k = 0..2: inv; row 3: -inv @ a.  Column layout: col = 3i + c.
        for (int c = 0; c < 3; ++c) {
            double trans = 0.0;
            for (int k = 0; k < 3; ++k) {
                double val = ok ? inv[c][k] : nan;
                out[(std::size_t)k * 3 * n + 3 * i + c] = (float)val;
                if (ok) trans -= inv[c][k] * a[k];
            }
            out[(std::size_t)3 * 3 * n + 3 * i + c] = (float)(ok ? trans : nan);
        }
    }
}

// Leaf AABBs over consecutive runs of leaf_size triangles.
// verts: [n, 3, 3] (spatially ordered), valid: [n] u8;
// out_min/out_max: [n/leaf_size, 3] float32.
template <typename V>
static void build_leaf_aabbs_t(const V* verts, const std::uint8_t* valid,
                               std::int64_t n, std::int64_t leaf_size,
                               float* out_min, float* out_max) {
    const double inf = std::numeric_limits<double>::infinity();
    std::int64_t l = n / leaf_size;
    for (std::int64_t leaf = 0; leaf < l; ++leaf) {
        double mn[3] = {inf, inf, inf}, mx[3] = {-inf, -inf, -inf};
        for (std::int64_t t = leaf * leaf_size; t < (leaf + 1) * leaf_size; ++t) {
            if (!valid[t]) continue;
            const V* v = verts + t * 9;
            for (int vert = 0; vert < 3; ++vert)
                for (int a = 0; a < 3; ++a) {
                    mn[a] = std::min(mn[a], (double)v[vert * 3 + a]);
                    mx[a] = std::max(mx[a], (double)v[vert * 3 + a]);
                }
        }
        for (int a = 0; a < 3; ++a) {
            out_min[leaf * 3 + a] = (float)mn[a];
            out_max[leaf * 3 + a] = (float)mx[a];
        }
    }
}

extern "C" {

void morton_argsort(const double* verts, const std::uint8_t* valid,
                    std::int64_t n, std::int64_t* perm_out) {
    morton_argsort_t(verts, valid, n, perm_out);
}
void morton_argsort_f32(const float* verts, const std::uint8_t* valid,
                        std::int64_t n, std::int64_t* perm_out) {
    morton_argsort_t(verts, valid, n, perm_out);
}
void build_woop(const double* verts, const std::uint8_t* valid,
                std::int64_t n, float* out) {
    build_woop_t(verts, valid, n, out);
}
void build_woop_f32(const float* verts, const std::uint8_t* valid,
                    std::int64_t n, float* out) {
    build_woop_t(verts, valid, n, out);
}
void build_leaf_aabbs(const double* verts, const std::uint8_t* valid,
                      std::int64_t n, std::int64_t leaf_size,
                      float* out_min, float* out_max) {
    build_leaf_aabbs_t(verts, valid, n, leaf_size, out_min, out_max);
}
void build_leaf_aabbs_f32(const float* verts, const std::uint8_t* valid,
                          std::int64_t n, std::int64_t leaf_size,
                          float* out_min, float* out_max) {
    build_leaf_aabbs_t(verts, valid, n, leaf_size, out_min, out_max);
}

}  // extern "C"
