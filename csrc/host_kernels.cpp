// Host-side native kernels for xugrid_tpu.
//
// The device tier (JAX/XLA/Pallas) owns all batched compute; these are
// the setup-time builders where single-thread numpy costs dominate at
// the 10M-primitive scale:
//
//  * kd_order: recursive alternating-axis capacity splits (the BVH
//    primitive ordering). numpy needs one full lexsort per tree level
//    (O(L * n log n)); here each level is an O(n) nth_element partition
//    over ranges, parallelized across subtrees.
//  * hilbert_distance: Hilbert curve indices for partitioning/sharding.
//
// Built as a plain shared library; Python binds via ctypes
// (xugrid_tpu/utils/native.py) with numpy fallbacks when the library is
// unavailable.

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <limits>
#include <thread>
#include <vector>

// --- shared chunked thread fan-out ----------------------------------
// Runs process(lo, hi) over [0, n) on up to 16 threads when n exceeds
// threshold.  Thread-construction failure must not escape through the
// extern "C" boundary (std::terminate): started threads are joined and
// the unstarted tail runs serially.
template <typename Fn>
static void parallel_for(int64_t n, int64_t threshold, Fn&& process) {
    const unsigned hw = std::max(1u, std::thread::hardware_concurrency());
    if (n > threshold && hw > 1) {
        const int64_t n_threads = std::min<int64_t>(hw, 16);
        const int64_t per = (n + n_threads - 1) / n_threads;
        std::vector<std::thread> threads;
        threads.reserve(static_cast<size_t>(n_threads));
        int64_t serial_from = n;
        for (int64_t t = 0; t < n_threads; ++t) {
            const int64_t lo = t * per;
            const int64_t hi = std::min(n, lo + per);
            if (lo >= hi) break;
            try {
                threads.emplace_back(process, lo, hi);
            } catch (...) {
                serial_from = lo;
                break;
            }
        }
        for (auto& th : threads) th.join();
        if (serial_from < n) process(serial_from, n);
        return;
    }
    process(0, n);
}


extern "C" {

// Order `n` 2D points by recursive alternating-axis splits. The split
// position of each range is the left subtree's slot capacity, so the
// resulting order aligns exactly with complete-tree leaf blocks.
// xy: (n, 2) row-major doubles. out: n int64 indices.
void kd_order(const double* xy, int64_t n, int32_t n_levels,
              int64_t capacity, int64_t* out) {
    for (int64_t i = 0; i < n; ++i) out[i] = i;

    struct Range {
        int64_t begin, end, cap;
    };
    std::vector<Range> current{{0, n, capacity}};
    std::vector<Range> next;

    const unsigned hw = std::max(1u, std::thread::hardware_concurrency());

    for (int32_t level = 0; level < n_levels; ++level) {
        const int axis = level % 2;
        next.clear();
        next.reserve(current.size() * 2);

        auto process = [&](size_t lo, size_t hi) {
            for (size_t r = lo; r < hi; ++r) {
                const Range rg = current[r];
                const int64_t count = rg.end - rg.begin;
                if (count <= 0) continue;
                const int64_t left_cap = rg.cap / 2;
                const int64_t split = std::min(count, left_cap);
                auto cmp = [&](int64_t a, int64_t b) {
                    return xy[2 * a + axis] < xy[2 * b + axis];
                };
                if (split > 0 && split < count) {
                    std::nth_element(out + rg.begin, out + rg.begin + split,
                                     out + rg.end, cmp);
                }
            }
        };

        // Parallelize across ranges once there are enough of them.
        if (current.size() >= 4 && hw > 1) {
            const size_t n_ranges = current.size();
            const size_t n_threads = std::min<size_t>(hw, n_ranges);
            std::vector<std::thread> threads;
            const size_t per = (n_ranges + n_threads - 1) / n_threads;
            for (size_t t = 0; t < n_threads; ++t) {
                const size_t lo = t * per;
                const size_t hi = std::min(n_ranges, lo + per);
                if (lo < hi) threads.emplace_back(process, lo, hi);
            }
            for (auto& th : threads) th.join();
        } else {
            process(0, current.size());
        }

        for (const Range& rg : current) {
            const int64_t count = rg.end - rg.begin;
            const int64_t left_cap = rg.cap / 2;
            const int64_t split = std::min(count, left_cap);
            next.push_back({rg.begin, rg.begin + split, left_cap});
            next.push_back({rg.begin + split, rg.end, rg.cap - left_cap});
        }
        current.swap(next);
    }
}

// Hilbert curve distance for n 2D points quantized to 2^order cells.
void hilbert_distance(const double* xy, int64_t n, int32_t order,
                      double xmin, double ymin, double xextent,
                      double yextent, uint64_t* out) {
    const uint64_t side = (1ull << order) - 1ull;
    for (int64_t i = 0; i < n; ++i) {
        uint64_t x = (uint64_t)((xy[2 * i] - xmin) / xextent * (double)side);
        uint64_t y =
            (uint64_t)((xy[2 * i + 1] - ymin) / yextent * (double)side);
        uint64_t rx, ry, d = 0;
        for (uint64_t s = 1ull << (order - 1); s > 0; s >>= 1) {
            rx = (x & s) > 0 ? 1 : 0;
            ry = (y & s) > 0 ? 1 : 0;
            d += s * s * ((3 * rx) ^ ry);
            // rotate
            if (ry == 0) {
                if (rx == 1) {
                    x = s - 1 - x;
                    y = s - 1 - y;
                }
                uint64_t t = x;
                x = y;
                y = t;
            }
        }
        out[i] = d;
    }
}

// Per-face axis-aligned bounding boxes, honoring -1 fill values.
// faces: (n, nv) int64 row-major; out: (n, 4) doubles (xmin,ymin,xmax,ymax).
void face_bbox(const int64_t* faces, int64_t n, int64_t nv, const double* x,
               const double* y, double* out) {
    auto process = [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ++i) {
            double x0 = 1e300, y0 = 1e300, x1 = -1e300, y1 = -1e300;
            bool any = false;
            for (int64_t j = 0; j < nv; ++j) {
                const int64_t node = faces[i * nv + j];
                if (node < 0) continue;
                any = true;
                const double px = x[node], py = y[node];
                x0 = std::min(x0, px);
                y0 = std::min(y0, py);
                x1 = std::max(x1, px);
                y1 = std::max(y1, py);
            }
            if (!any) x0 = y0 = x1 = y1 = std::nan("");
            out[4 * i + 0] = x0;
            out[4 * i + 1] = y0;
            out[4 * i + 2] = x1;
            out[4 * i + 3] = y1;
        }
    };
    parallel_for(n, 100000, process);
}

// --- uniform grid-hash binning (counting sort over covered cells) -----
static inline int64_t gh_clamp(int64_t v, int64_t hi) {
    return v < 0 ? 0 : (v > hi ? hi : v);
}

// Pass 1: count (cell, prim) pairs into bin_start[cell + 1] (caller
// zeroes it, length nx*ny + 1), prefix-sum in place.  Returns the total.
int64_t grid_hash_count(const double* boxes, int64_t k, double xmin,
                        double ymin, double dx, double dy, int64_t nx,
                        int64_t ny, int64_t* bin_start) {
    const double inv_dx = 1.0 / dx, inv_dy = 1.0 / dy;
    for (int64_t i = 0; i < k; ++i) {
        const double* b = boxes + 4 * i;
        const int64_t ix0 = gh_clamp((int64_t)((b[0] - xmin) * inv_dx), nx - 1);
        const int64_t iy0 = gh_clamp((int64_t)((b[1] - ymin) * inv_dy), ny - 1);
        const int64_t ix1 = gh_clamp((int64_t)((b[2] - xmin) * inv_dx), nx - 1);
        const int64_t iy1 = gh_clamp((int64_t)((b[3] - ymin) * inv_dy), ny - 1);
        for (int64_t cy = iy0; cy <= iy1; ++cy)
            for (int64_t cx = ix0; cx <= ix1; ++cx)
                ++bin_start[cy * nx + cx + 1];
    }
    const int64_t n_cells = nx * ny;
    for (int64_t c = 0; c < n_cells; ++c) bin_start[c + 1] += bin_start[c];
    return bin_start[n_cells];
}

// Pass 2: scatter primitive ids into bin_prims (CSR contents), sorted by
// cell and stable in primitive order.  cursor: scratch copy of
// bin_start[0..nx*ny), mutated.  ids == nullptr means identity (prim i
// has id i) — skips one indirection on the common no-oversize path.
void grid_hash_fill(const double* boxes, const int64_t* ids, int64_t k,
                    double xmin, double ymin, double dx, double dy,
                    int64_t nx, int64_t ny, int64_t* cursor,
                    int64_t* bin_prims) {
    const double inv_dx = 1.0 / dx, inv_dy = 1.0 / dy;
    for (int64_t i = 0; i < k; ++i) {
        const double* b = boxes + 4 * i;
        const int64_t ix0 = gh_clamp((int64_t)((b[0] - xmin) * inv_dx), nx - 1);
        const int64_t iy0 = gh_clamp((int64_t)((b[1] - ymin) * inv_dy), ny - 1);
        const int64_t ix1 = gh_clamp((int64_t)((b[2] - xmin) * inv_dx), nx - 1);
        const int64_t iy1 = gh_clamp((int64_t)((b[3] - ymin) * inv_dy), ny - 1);
        const int64_t id = ids ? ids[i] : i;
        for (int64_t cy = iy0; cy <= iy1; ++cy)
            for (int64_t cx = ix0; cx <= ix1; ++cx)
                bin_prims[cursor[cy * nx + cx]++] = id;
    }
}

}  // extern "C"

// --- point candidate queries against the grid hash ---------------------
// A (tolerance-expanded) point covers at most a few cells; candidates
// are scanned per cell with inline dedup (candidate lists are tiny), so
// no span expansion or sort-based unique is needed.
template <bool kEmit>
static void gh_points_pass(const double* pts, int64_t nq, double tol,
                           double xmin, double ymin, double dx, double dy,
                           int64_t nx, int64_t ny, const int64_t* bin_start,
                           const int64_t* bin_prims, const double* boxes,
                           int64_t* counts, const int64_t* offsets,
                           int64_t* pair_q, int64_t* pair_p) {
    // Cell arithmetic MUST match the binning passes above ((b - min) *
    // inv_d, not (b - min) / d): a 1-ulp difference can name a cell the
    // primitive was never binned in and silently drop a candidate.
    const double inv_dx = 1.0 / dx, inv_dy = 1.0 / dy;
    auto process = [&](int64_t lo, int64_t hi) {
        std::vector<int64_t> seen;
        for (int64_t i = lo; i < hi; ++i) {
            const double px = pts[2 * i], py = pts[2 * i + 1];
            const int64_t ix0 =
                gh_clamp((int64_t)((px - tol - xmin) * inv_dx), nx - 1);
            const int64_t iy0 =
                gh_clamp((int64_t)((py - tol - ymin) * inv_dy), ny - 1);
            const int64_t ix1 =
                gh_clamp((int64_t)((px + tol - xmin) * inv_dx), nx - 1);
            const int64_t iy1 =
                gh_clamp((int64_t)((py + tol - ymin) * inv_dy), ny - 1);
            const bool multi = (ix0 != ix1) | (iy0 != iy1);
            if (multi) seen.clear();
            int64_t n = 0;
            int64_t o = kEmit ? offsets[i] : 0;
            for (int64_t cy = iy0; cy <= iy1; ++cy) {
                for (int64_t cx = ix0; cx <= ix1; ++cx) {
                    const int64_t cell = cy * nx + cx;
                    for (int64_t s = bin_start[cell]; s < bin_start[cell + 1];
                         ++s) {
                        const int64_t prim = bin_prims[s];
                        const double* b = boxes + 4 * prim;
                        if (b[0] <= px + tol && b[2] >= px - tol &&
                            b[1] <= py + tol && b[3] >= py - tol) {
                            if (multi) {
                                bool dup = false;
                                for (int64_t p : seen) {
                                    if (p == prim) { dup = true; break; }
                                }
                                if (dup) continue;
                                seen.push_back(prim);
                            }
                            if (kEmit) {
                                pair_q[o] = i;
                                pair_p[o] = prim;
                                ++o;
                            }
                            ++n;
                        }
                    }
                }
            }
            if (!kEmit) counts[i] = n;
        }
    };
    parallel_for(nq, 100000, process);
}

extern "C" {

// Pass 1: per-point candidate counts.
void grid_hash_points_count(const double* pts, int64_t nq, double tol,
                            double xmin, double ymin, double dx, double dy,
                            int64_t nx, int64_t ny, const int64_t* bin_start,
                            const int64_t* bin_prims, const double* boxes,
                            int64_t* counts) {
    gh_points_pass<false>(pts, nq, tol, xmin, ymin, dx, dy, nx, ny, bin_start,
                          bin_prims, boxes, counts, nullptr, nullptr, nullptr);
}

// Pass 2: emit pairs at offsets (exclusive prefix sum of counts).
void grid_hash_points_fill(const double* pts, int64_t nq, double tol,
                           double xmin, double ymin, double dx, double dy,
                           int64_t nx, int64_t ny, const int64_t* bin_start,
                           const int64_t* bin_prims, const double* boxes,
                           const int64_t* offsets, int64_t* pair_q,
                           int64_t* pair_p) {
    gh_points_pass<true>(pts, nq, tol, xmin, ymin, dx, dy, nx, ny, bin_start,
                         bin_prims, boxes, nullptr, offsets, pair_q, pair_p);
}

}  // extern "C"

// --- box candidate queries against the grid hash ------------------------
// Candidate join of query bounding boxes against the binned primitives.
// Dedup is O(1) per pair: a (query, prim) pair is counted/emitted only in
// the canonical cell — the min corner of the intersection of the query's
// and the primitive's covered cell ranges — so no sort-based unique pass
// is needed.
template <bool kEmit>
static void gh_boxes_pass(const double* qb, int64_t nq, double xmin,
                          double ymin, double dx, double dy, int64_t nx,
                          int64_t ny, const int64_t* bin_start,
                          const int64_t* bin_prims, const double* boxes,
                          int64_t* counts, const int64_t* offsets,
                          int64_t* pair_q, int64_t* pair_p) {
    // Same requirement as gh_points_pass: the canonical-cell dedup below
    // recomputes each primitive's min cell, and that recompute must be
    // bit-identical to the arithmetic grid_hash_count/fill binned it with
    // ((b - min) * inv_d). A 1-ulp divergence names a cell the primitive
    // is absent from and the pair is silently never emitted.
    const double inv_dx = 1.0 / dx, inv_dy = 1.0 / dy;
    auto process = [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ++i) {
            const double qx0 = qb[4 * i], qy0 = qb[4 * i + 1];
            const double qx1 = qb[4 * i + 2], qy1 = qb[4 * i + 3];
            const int64_t ix0 =
                gh_clamp((int64_t)((qx0 - xmin) * inv_dx), nx - 1);
            const int64_t iy0 =
                gh_clamp((int64_t)((qy0 - ymin) * inv_dy), ny - 1);
            const int64_t ix1 =
                gh_clamp((int64_t)((qx1 - xmin) * inv_dx), nx - 1);
            const int64_t iy1 =
                gh_clamp((int64_t)((qy1 - ymin) * inv_dy), ny - 1);
            int64_t n = 0;
            int64_t o = kEmit ? offsets[i] : 0;
            for (int64_t cy = iy0; cy <= iy1; ++cy) {
                for (int64_t cx = ix0; cx <= ix1; ++cx) {
                    const int64_t cell = cy * nx + cx;
                    for (int64_t s = bin_start[cell]; s < bin_start[cell + 1];
                         ++s) {
                        const int64_t prim = bin_prims[s];
                        const double* b = boxes + 4 * prim;
                        if (b[0] > qx1 || b[2] < qx0 || b[1] > qy1 ||
                            b[3] < qy0)
                            continue;
                        // Canonical cell: min corner of the overlap of the
                        // two cell ranges.
                        const int64_t px0 =
                            gh_clamp((int64_t)((b[0] - xmin) * inv_dx), nx - 1);
                        const int64_t py0 =
                            gh_clamp((int64_t)((b[1] - ymin) * inv_dy), ny - 1);
                        if (cx != (px0 > ix0 ? px0 : ix0)) continue;
                        if (cy != (py0 > iy0 ? py0 : iy0)) continue;
                        if (kEmit) {
                            pair_q[o] = i;
                            pair_p[o] = prim;
                            ++o;
                        }
                        ++n;
                    }
                }
            }
            if (!kEmit) counts[i] = n;
        }
    };
    parallel_for(nq, 20000, process);
}

extern "C" {

// Pass 1: per-query candidate counts.
void grid_hash_boxes_count(const double* qb, int64_t nq, double xmin,
                           double ymin, double dx, double dy, int64_t nx,
                           int64_t ny, const int64_t* bin_start,
                           const int64_t* bin_prims, const double* boxes,
                           int64_t* counts) {
    gh_boxes_pass<false>(qb, nq, xmin, ymin, dx, dy, nx, ny, bin_start,
                         bin_prims, boxes, counts, nullptr, nullptr, nullptr);
}

// Pass 2: emit pairs at offsets (exclusive prefix sum of counts).
void grid_hash_boxes_fill(const double* qb, int64_t nq, double xmin,
                          double ymin, double dx, double dy, int64_t nx,
                          int64_t ny, const int64_t* bin_start,
                          const int64_t* bin_prims, const double* boxes,
                          const int64_t* offsets, int64_t* pair_q,
                          int64_t* pair_p) {
    gh_boxes_pass<true>(qb, nq, xmin, ymin, dx, dy, nx, ny, bin_start,
                        bin_prims, boxes, nullptr, offsets, pair_q, pair_p);
}

}  // extern "C"

// --- fused polygon padding + bounding boxes ------------------------------
// One cache-friendly pass over the connectivity: emit the padded
// per-face vertex buffer (fill slots repeat the first vertex, giving
// zero-length edges) and the per-face AABB.
extern "C" {

void pad_and_bbox(const int64_t* faces, int64_t n, int64_t nv,
                  const double* x, const double* y, double* poly_xy,
                  double* bbox) {
    auto process = [&](int64_t i_lo, int64_t i_hi) {
    for (int64_t i = i_lo; i < i_hi; ++i) {
        const int64_t* f = faces + nv * i;
        double* poly = poly_xy + 2 * nv * i;
        // First VALID node: UGRID puts fill trailing, but malformed or
        // reordered connectivity may lead with -1; deciding from f[0]
        // alone silently dropped such faces (NaN bbox) while face_bbox
        // kept them.
        int64_t first = -1;
        for (int64_t v = 0; v < nv; ++v) {
            if (f[v] >= 0) { first = f[v]; break; }
        }
        if (first < 0) {
            // Degenerate face (all-fill row): NaN bbox, zero polygon —
            // matches the pure-numpy face_bbox path this replaced.
            for (int64_t v = 0; v < nv; ++v) {
                poly[2 * v] = 0.0;
                poly[2 * v + 1] = 0.0;
            }
            double* b = bbox + 4 * i;
            const double nan = std::numeric_limits<double>::quiet_NaN();
            b[0] = nan;
            b[1] = nan;
            b[2] = nan;
            b[3] = nan;
            continue;
        }
        const double fx = x[first], fy = y[first];
        double x0 = fx, x1 = fx, y0 = fy, y1 = fy;
        poly[0] = fx;
        poly[1] = fy;
        for (int64_t v = 1; v < nv; ++v) {
            const int64_t node = f[v];
            double px, py;
            if (node < 0) {
                px = fx;
                py = fy;
            } else {
                px = x[node];
                py = y[node];
                x0 = px < x0 ? px : x0;
                x1 = px > x1 ? px : x1;
                y0 = py < y0 ? py : y0;
                y1 = py > y1 ? py : y1;
            }
            poly[2 * v] = px;
            poly[2 * v + 1] = py;
        }
        double* b = bbox + 4 * i;
        b[0] = x0;
        b[1] = y0;
        b[2] = x1;
        b[3] = y1;
    }
    };
    parallel_for(n, 100000, process);
}

}  // extern "C"

// --- convex polygon clip areas (Sutherland-Hodgman) ----------------------
// Host-side counterpart of the device convex_overlap_area kernel
// (xugrid_tpu/spatial/geometry.py): area of intersection per candidate
// (query, tree) polygon pair.  Padded vertices repeat the first vertex;
// the resulting zero-length edges are skipped.  Same convexity
// assumption as the device kernel and numba_celltree.
static double sh_clip_area(const double* subj, int64_t m, const double* clip,
                           int64_t k) {
    // Working buffers sized for convex-convex output (<= m + k vertices).
    constexpr int kCap = 96;
    double ax[kCap], ay[kCap], bx[kCap], by[kCap];
    int n = 0;
    for (int64_t v = 0; v < m && n < kCap; ++v) {
        const double x = subj[2 * v], y = subj[2 * v + 1];
        if (n > 0 && ax[n - 1] == x && ay[n - 1] == y) continue;  // padding
        ax[n] = x;
        ay[n] = y;
        ++n;
    }
    if (n > 1 && ax[n - 1] == ax[0] && ay[n - 1] == ay[0]) --n;
    if (n < 3) return 0.0;

    // Clip polygon orientation: iterate its edges counter-clockwise.
    double clip_signed = 0.0;
    for (int64_t v = 0; v < k; ++v) {
        const int64_t w = (v + 1) % k;
        clip_signed += clip[2 * v] * clip[2 * w + 1] -
                       clip[2 * w] * clip[2 * v + 1];
    }
    const bool ccw = clip_signed >= 0.0;

    double* curx = ax;
    double* cury = ay;
    double* nxtx = bx;
    double* nxty = by;
    for (int64_t e = 0; e < k && n >= 3; ++e) {
        const int64_t v = ccw ? e : (k - 1 - e);
        const int64_t w = ccw ? (v + 1) % k : (v + k - 1) % k;
        const double ex0 = clip[2 * v], ey0 = clip[2 * v + 1];
        const double ex1 = clip[2 * w], ey1 = clip[2 * w + 1];
        if (ex0 == ex1 && ey0 == ey1) continue;  // degenerate (padding)
        const double dx = ex1 - ex0, dy = ey1 - ey0;
        int nn = 0;
        for (int i = 0; i < n; ++i) {
            const int j = (i + 1) % n;
            const double d_i = dx * (cury[i] - ey0) - dy * (curx[i] - ex0);
            const double d_j = dx * (cury[j] - ey0) - dy * (curx[j] - ex0);
            if (d_i >= 0.0) {
                if (nn < kCap) {
                    nxtx[nn] = curx[i];
                    nxty[nn] = cury[i];
                    ++nn;
                }
            }
            if ((d_i > 0.0 && d_j < 0.0) || (d_i < 0.0 && d_j > 0.0)) {
                const double t = d_i / (d_i - d_j);
                if (nn < kCap) {
                    nxtx[nn] = curx[i] + t * (curx[j] - curx[i]);
                    nxty[nn] = cury[i] + t * (cury[j] - cury[i]);
                    ++nn;
                }
            }
        }
        std::swap(curx, nxtx);
        std::swap(cury, nxty);
        n = nn;
    }
    if (n < 3) return 0.0;
    double area2 = 0.0;
    for (int i = 0; i < n; ++i) {
        const int j = (i + 1) % n;
        area2 += curx[i] * cury[j] - curx[j] * cury[i];
    }
    return 0.5 * std::abs(area2);
}

extern "C" {

void polygon_clip_areas(const int64_t* pair_q, const int64_t* pair_p,
                        int64_t n_pairs, const double* query_xy, int64_t mq,
                        const double* tree_xy, int64_t mt, double* areas) {
    auto process = [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ++i) {
            areas[i] = sh_clip_area(query_xy + 2 * mq * pair_q[i], mq,
                                    tree_xy + 2 * mt * pair_p[i], mt);
        }
    };
    parallel_for(n_pairs, 100000, process);
}

}  // extern "C"

// --- exact point-in-polygon and segment-clip tests -----------------------
// Host counterparts of the device kernels in spatial/geometry.py, with
// identical formulas so results match bit-for-bit in f64.  Padded
// vertices repeat the first vertex (zero-length edges).

static inline double pt_seg_d2(double px, double py, double ax, double ay,
                               double bx, double by) {
    const double dx = bx - ax, dy = by - ay;
    const double len2 = dx * dx + dy * dy;
    double t = len2 == 0.0 ? 0.0 : ((px - ax) * dx + (py - ay) * dy) / len2;
    t = t < 0.0 ? 0.0 : (t > 1.0 ? 1.0 : t);
    const double cx = ax + t * dx, cy = ay + t * dy;
    return (px - cx) * (px - cx) + (py - cy) * (py - cy);
}

extern "C" {

// Pairwise: is pts[i] inside poly_xy[prims[i]] (crossing number with an
// on-edge tolerance)?  prims[i] < 0 -> 0.
void points_in_polygons(const double* pts, const int64_t* prims, int64_t n,
                        const double* poly_xy, int64_t nv, double tol,
                        uint8_t* out) {
    const double tol2 = tol * tol;
    for (int64_t i = 0; i < n; ++i) {
        const int64_t f = prims[i];
        if (f < 0) {
            out[i] = 0;
            continue;
        }
        const double px = pts[2 * i], py = pts[2 * i + 1];
        const double* poly = poly_xy + 2 * nv * f;
        int crossings = 0;
        double min_d2 = 1e300;
        for (int64_t v = 0; v < nv; ++v) {
            const int64_t w = (v + 1) % nv;
            const double ax = poly[2 * v], ay = poly[2 * v + 1];
            const double bx = poly[2 * w], by = poly[2 * w + 1];
            const bool straddle = (ay > py) != (by > py);
            if (straddle) {
                const double x_at = ax + (py - ay) * (bx - ax) / (by - ay);
                if (px < x_at) ++crossings;
            }
            const double d2 = pt_seg_d2(px, py, ax, ay, bx, by);
            if (d2 < min_d2) min_d2 = d2;
        }
        out[i] = ((crossings & 1) || min_d2 <= tol2) ? 1 : 0;
    }
}

// Pairwise Liang-Barsky clip of segment i against convex CCW polygon
// prims[i]: (valid, t0, t1) parameter interval inside the polygon.
void clip_segments_by_faces(const double* p0, const double* p1,
                            const int64_t* prims, int64_t n,
                            const double* poly_xy, int64_t nv, uint8_t* valid,
                            double* t0_out, double* t1_out) {
    for (int64_t i = 0; i < n; ++i) {
        const int64_t f = prims[i];
        if (f < 0) {
            valid[i] = 0;
            t0_out[i] = 0.0;
            t1_out[i] = 1.0;
            continue;
        }
        const double x0 = p0[2 * i], y0 = p0[2 * i + 1];
        const double dx = p1[2 * i] - x0, dy = p1[2 * i + 1] - y0;
        const double* poly = poly_xy + 2 * nv * f;
        double t0 = 0.0, t1 = 1.0;
        bool parallel_outside = false;
        for (int64_t v = 0; v < nv; ++v) {
            const int64_t w = (v + 1) % nv;
            const double ax = poly[2 * v], ay = poly[2 * v + 1];
            const double ex = poly[2 * w] - ax, ey = poly[2 * w + 1] - ay;
            if (ex == 0.0 && ey == 0.0) continue;  // padding edge
            const double nx = -ey, ny = ex;        // CCW inward normal
            const double denom = nx * dx + ny * dy;
            const double num = nx * (ax - x0) + ny * (ay - y0);
            if (denom == 0.0) {
                if (num > 0.0) parallel_outside = true;
            } else {
                const double t = num / denom;
                if (denom > 0.0) {
                    if (t > t0) t0 = t;
                } else {
                    if (t < t1) t1 = t;
                }
            }
        }
        valid[i] = (t0 < t1 && !parallel_outside) ? 1 : 0;
        t0_out[i] = t0;
        t1_out[i] = t1;
    }
}

}  // extern "C"

// --- mean value coordinates (generalized barycentric weights) ------------
// Host counterpart of geometry.mean_value_weights: identical formulas in
// f64.  prims[i] < 0 -> zero row.  Padding vertices (repeats of the
// first) receive zero weight; points within tol of a vertex snap to it.
extern "C" {

void mean_value_weights(const double* pts, const int64_t* prims, int64_t n,
                        const double* poly_xy, int64_t nv, double tol,
                        double* out) {
    constexpr int kCap = 64;
    double dx[kCap], dy[kCap], r[kCap], tan_half[kCap];
    for (int64_t i = 0; i < n; ++i) {
        double* w = out + nv * i;
        for (int64_t v = 0; v < nv; ++v) w[v] = 0.0;
        const int64_t f = prims[i];
        if (f < 0 || nv > kCap) continue;
        const double px = pts[2 * i], py = pts[2 * i + 1];
        const double* poly = poly_xy + 2 * nv * f;
        // Number of real vertices: first padding slot repeating vertex 0
        // ends the polygon (minimum 3).
        int64_t n_vert = nv;
        for (int64_t v = 1; v < nv; ++v) {
            if (poly[2 * v] == poly[0] && poly[2 * v + 1] == poly[1]) {
                n_vert = v;
                break;
            }
        }
        if (n_vert < 3) n_vert = 3;
        for (int64_t v = 0; v < n_vert; ++v) {
            dx[v] = poly[2 * v] - px;
            dy[v] = poly[2 * v + 1] - py;
            r[v] = std::sqrt(dx[v] * dx[v] + dy[v] * dy[v]);
        }
        // Point ON an edge: alpha -> pi there (tan(alpha/2) -> inf);
        // the mean-value limit is linear interpolation between the two
        // edge endpoints (matches geometry.mean_value_weights).
        int64_t edge_v = -1;
        for (int64_t v = 0; v < n_vert; ++v) {
            const int64_t nxt = (v + 1 < n_vert) ? v + 1 : 0;
            const double cross = dx[v] * dy[nxt] - dy[v] * dx[nxt];
            const double dot = dx[v] * dx[nxt] + dy[v] * dy[nxt];
            tan_half[v] =
                cross == 0.0 ? 0.0 : (r[v] * r[nxt] - dot) / cross;
            if (std::abs(cross) <= 1e-12 * r[v] * r[nxt] && dot < 0.0 &&
                edge_v < 0) {
                edge_v = v;
            }
        }
        bool any_vertex = false;
        for (int64_t v = 0; v < n_vert; ++v) {
            if (r[v] <= tol) any_vertex = true;
        }
        double total = 0.0;
        if (any_vertex) {
            for (int64_t v = 0; v < n_vert; ++v) {
                w[v] = r[v] <= tol ? 1.0 : 0.0;
                total += w[v];
            }
        } else if (edge_v >= 0) {
            const int64_t nxt = (edge_v + 1 < n_vert) ? edge_v + 1 : 0;
            double r_sum = r[edge_v] + r[nxt];
            if (r_sum == 0.0) r_sum = 1.0;
            w[edge_v] = r[nxt] / r_sum;
            w[nxt] += r[edge_v] / r_sum;
            total = w[edge_v] + w[nxt];
        } else {
            for (int64_t v = 0; v < n_vert; ++v) {
                const int64_t prev = (v == 0) ? n_vert - 1 : v - 1;
                const double safe_r = r[v] == 0.0 ? 1.0 : r[v];
                w[v] = (tan_half[prev] + tan_half[v]) / safe_r;
                total += w[v];
            }
        }
        if (total != 0.0) {
            for (int64_t v = 0; v < n_vert; ++v) w[v] /= total;
        }
    }
}

}  // extern "C"

// --- hash-based row deduplication (merge_partitions host kernel) -------
// Replaces sort-based unique for stacked node coordinates and
// connectivity rows: one open-addressing pass in first-seen order.
// rows: n contiguous rows of row_bytes bytes (bytewise equality, like
// a void-view np.unique).  out_inverse[i] = group id of row i (groups
// numbered in first-seen order); out_rep[g] = first row index of group
// g.  Returns the group count.
extern "C" {

int64_t unique_rows_hash(const char* rows, int64_t n, int64_t row_bytes,
                         int64_t* out_rep, int64_t* out_inverse) {
    if (n == 0) return 0;
    int64_t cap = 1;
    while (cap < 2 * n) cap <<= 1;
    const int64_t mask = cap - 1;
    std::vector<int64_t> table((size_t)cap, -1);  // group id or -1

    const int64_t words = row_bytes / 8;
    const int64_t tail = row_bytes % 8;
    int64_t count = 0;
    for (int64_t i = 0; i < n; ++i) {
        const char* row = rows + i * row_bytes;
        // FNV-1a over 8-byte words + byte tail.
        uint64_t h = 1469598103934665603ull;
        for (int64_t wd = 0; wd < words; ++wd) {
            uint64_t v;
            std::memcpy(&v, row + 8 * wd, 8);
            h = (h ^ v) * 1099511628211ull;
            h ^= h >> 29;
        }
        for (int64_t b = 8 * words; b < 8 * words + tail; ++b) {
            h = (h ^ (uint64_t)(unsigned char)row[b]) * 1099511628211ull;
        }
        h ^= h >> 32;
        int64_t slot = (int64_t)(h & (uint64_t)mask);
        for (;;) {
            const int64_t g = table[slot];
            if (g == -1) {
                table[slot] = count;
                out_rep[count] = i;
                out_inverse[i] = count;
                ++count;
                break;
            }
            if (std::memcmp(rows + out_rep[g] * row_bytes, row,
                            (size_t)row_bytes) == 0) {
                out_inverse[i] = g;
                break;
            }
            slot = (slot + 1) & mask;
        }
    }
    return count;
}

// Orientation-insensitive connectivity dedup (merge_partitions): rows
// of ``width`` int64 node ids canonicalize by an in-register insertion
// sort (width <= ~8: faces/edges), then dedupe bytewise in first-seen
// order — one pass replaces the numpy np.sort(axis=1) + hash-join
// two-pass (the sort alone copied + wrote the whole table).
// out_rep[g] = first ORIGINAL row index of group g.
int64_t unique_sorted_rows_hash(const int64_t* rows, int64_t n,
                                int64_t width, int64_t* out_rep,
                                int64_t* out_inverse) {
    if (n == 0) return 0;
    if (width < 1 || width > 64) return -1;
    int64_t cap = 1;
    while (cap < 2 * n) cap <<= 1;
    const int64_t mask = cap - 1;
    std::vector<int64_t> table((size_t)cap, -1);  // group id or -1
    // Canonical (sorted) forms of the group representatives: compares
    // must not re-sort the rep row per probe.
    std::vector<int64_t> canon;
    canon.reserve((size_t)std::min<int64_t>(n, 1 << 20) * (size_t)width);

    int64_t buf[64];
    int64_t count = 0;
    for (int64_t i = 0; i < n; ++i) {
        const int64_t* row = rows + i * width;
        for (int64_t k = 0; k < width; ++k) buf[k] = row[k];
        for (int64_t k = 1; k < width; ++k) {  // insertion sort
            const int64_t v = buf[k];
            int64_t j = k - 1;
            for (; j >= 0 && buf[j] > v; --j) buf[j + 1] = buf[j];
            buf[j + 1] = v;
        }
        uint64_t h = 1469598103934665603ull;
        for (int64_t k = 0; k < width; ++k) {
            h = (h ^ (uint64_t)buf[k]) * 1099511628211ull;
            h ^= h >> 29;
        }
        h ^= h >> 32;
        int64_t slot = (int64_t)(h & (uint64_t)mask);
        for (;;) {
            const int64_t g = table[slot];
            if (g == -1) {
                table[slot] = count;
                out_rep[count] = i;
                out_inverse[i] = count;
                canon.insert(canon.end(), buf, buf + width);
                ++count;
                break;
            }
            if (std::memcmp(canon.data() + g * width, buf,
                            (size_t)width * 8) == 0) {
                out_inverse[i] = g;
                break;
            }
            slot = (slot + 1) & mask;
        }
    }
    return count;
}

}  // extern "C"

// --- sequential graph kernels (network/DAG ops) ------------------------
// Exact ports of the Python reference loops in ugrid/connectivity.py and
// ugrid/snapping.py (which pin the reference package's numba kernels):
// same visit order, same emitted order, interpreter overhead removed.
extern "C" {

// DFS-postorder-reversed topological sort over a CSR adjacency.
// Returns 0, or -1 when the graph contains a cycle.  out: m vertices in
// topological order.
int64_t topo_sort_dfs(const int64_t* indptr, const int64_t* indices,
                      int64_t m, int64_t* out) {
    std::vector<uint8_t> color((size_t)m, 0);  // 0 white 1 gray 2 black
    std::vector<int64_t> stack;
    std::vector<int64_t> cursor((size_t)m, 0);
    stack.reserve(64);
    int64_t n_out = 0;
    for (int64_t start = 0; start < m; ++start) {
        if (color[start] != 0) continue;
        stack.clear();
        stack.push_back(start);
        color[start] = 1;
        cursor[start] = indptr[start];
        while (!stack.empty()) {
            const int64_t u = stack.back();
            bool advanced = false;
            int64_t k = cursor[u];
            const int64_t end = indptr[u + 1];
            for (; k < end; ++k) {
                const int64_t nb = indices[k];
                if (color[nb] == 1) return -1;  // cycle
                if (color[nb] == 0) {
                    color[nb] = 1;
                    cursor[nb] = indptr[nb];
                    cursor[u] = k + 1;
                    stack.push_back(nb);
                    advanced = true;
                    break;
                }
            }
            if (!advanced) {
                cursor[u] = end;
                color[u] = 2;
                out[n_out++] = u;
                stack.pop_back();
            }
        }
    }
    // reverse postorder in place
    for (int64_t i = 0, j = n_out - 1; i < j; ++i, --j) {
        const int64_t t = out[i];
        out[i] = out[j];
        out[j] = t;
    }
    return 0;
}

// Contract a directed graph onto kept vertices: walk downstream from
// each kept vertex to the next kept vertices, emitting (v, u) pairs in
// encounter order.  Returns the edge count, -1 on a cycle through v,
// or -2 when out_edges (capacity cap PAIRS) is too small.
int64_t contract_vertices_walk(const int64_t* indptr, const int64_t* indices,
                               int64_t m, const int64_t* keep_idx,
                               int64_t nk, int64_t* out_edges, int64_t cap) {
    std::vector<uint8_t> keep((size_t)m, 0);
    for (int64_t i = 0; i < nk; ++i) keep[keep_idx[i]] = 1;
    std::vector<int64_t> visited_epoch((size_t)m, -1);
    std::vector<int64_t> stack;
    int64_t n_edges = 0;
    for (int64_t vi = 0; vi < nk; ++vi) {
        const int64_t v = keep_idx[vi];
        stack.clear();
        for (int64_t k = indptr[v]; k < indptr[v + 1]; ++k)
            stack.push_back(indices[k]);
        while (!stack.empty()) {
            const int64_t u = stack.back();
            stack.pop_back();
            if (u == v) return -1;  // cycle
            if (keep[u]) {
                if (n_edges >= cap) return -2;
                out_edges[2 * n_edges] = v;
                out_edges[2 * n_edges + 1] = u;
                ++n_edges;
                continue;
            }
            if (visited_epoch[u] == vi) continue;
            visited_epoch[u] = vi;
            for (int64_t k = indptr[u]; k < indptr[u + 1]; ++k)
                stack.push_back(indices[k]);
        }
    }
    return n_edges;
}

// Greedy snap assignment over a CSR distance matrix: candidates in
// order become targets; non-target neighbors attach to their nearest
// target.  visited: n int64, UNVISITED=-1 / TARGET=-2 / target id.
void snap_to_nearest_greedy(const int64_t* indptr, const int64_t* indices,
                            const double* data, int64_t n,
                            const int64_t* cand, int64_t nc,
                            double max_distance, int64_t* visited) {
    std::vector<double> nearest((size_t)n, max_distance + 1.0);
    for (int64_t i = 0; i < n; ++i) visited[i] = -1;
    for (int64_t ci = 0; ci < nc; ++ci) {
        const int64_t i = cand[ci];
        if (visited[i] != -1) continue;
        visited[i] = -2;
        for (int64_t k = indptr[i]; k < indptr[i + 1]; ++k) {
            const int64_t j = indices[k];
            const double dist = data[k];
            if (i == j || visited[j] == -2) continue;
            if (visited[j] == -1 || dist < nearest[j]) {
                visited[j] = i;
                nearest[j] = dist;
            }
        }
    }
}

}  // extern "C"

// --- fused point location (grid-hash candidates + exact test) ----------
// One pass over queries in home-cell order (counting sort): sequential
// bin/box/polygon access replaces the candidate-pair materialization
// (query join + pair buffers + separate point-in-polygon pass).
// Returns the LOWEST containing face index per point, -1 for misses —
// the same deterministic tie-break as the pairwise path.
extern "C" {

void locate_points_hash(const double* pts, int64_t nq, double tol,
                        double xmin, double ymin, double dx, double dy,
                        int64_t nx, int64_t ny, const int64_t* bin_start,
                        const int64_t* bin_prims, const double* boxes,
                        const double* poly_xy, int64_t nv, int64_t* out) {
    const bool prof = std::getenv("XUGRID_NATIVE_PROF") != nullptr;
    auto t0 = std::chrono::steady_clock::now();
    auto lap = [&](const char* name) {
        if (!prof) return;
        auto t1 = std::chrono::steady_clock::now();
        std::fprintf(
            stderr, "[locate_prof] %s: %.3f s\n", name,
            std::chrono::duration<double>(t1 - t0).count());
        t0 = t1;
    };
    const double inv_dx = 1.0 / dx, inv_dy = 1.0 / dy;
    const double tol2 = tol * tol;
    std::vector<int64_t> cell((size_t)nq);
    const int64_t n_cells = nx * ny;
    // Approximate cell order suffices for scan locality (out[] is
    // indexed by query, not rank): sorting by 64-cell buckets keeps
    // the histogram/cursor arrays 64x smaller — cache-resident even
    // at 10M faces (5M cells would mean 40 MB of counters for 1M
    // queries; the buckets are row-major strips, so candidate prim
    // and box reads stay nearly sequential).
    constexpr int BUCKET_SHIFT = 6;
    const int64_t n_buckets = (n_cells >> BUCKET_SHIFT) + 1;
    std::vector<int64_t> cnt((size_t)n_buckets + 1, 0);
    for (int64_t i = 0; i < nq; ++i) {
        const double px = pts[2 * i], py = pts[2 * i + 1];
        out[i] = -1;
        if (!std::isfinite(px) || !std::isfinite(py)) {
            cell[i] = -1;
            continue;
        }
        const int64_t cx = gh_clamp((int64_t)((px - xmin) * inv_dx), nx - 1);
        const int64_t cy = gh_clamp((int64_t)((py - ymin) * inv_dy), ny - 1);
        cell[i] = cy * nx + cx;
        ++cnt[(cell[i] >> BUCKET_SHIFT) + 1];
    }
    lap("bin_pass");
    for (int64_t c = 0; c < n_buckets; ++c) cnt[c + 1] += cnt[c];
    std::vector<int64_t> order((size_t)nq);
    int64_t n_valid = 0;
    {
        std::vector<int64_t> cursor(cnt.begin(), cnt.end() - 1);
        for (int64_t i = 0; i < nq; ++i) {
            if (cell[i] >= 0) {
                order[cursor[cell[i] >> BUCKET_SHIFT]++] = i;
                ++n_valid;
            }
        }
    }
    lap("counting_sort");
    // Batched staged scan: the naive per-query loop chases a 4-deep
    // dependent miss chain (bin_start -> bin_prims -> boxes ->
    // poly_xy), leaving one outstanding miss at a time.  Sweeping a
    // batch per stage with explicit prefetch of the NEXT stage's
    // random lines overlaps up to a batch of misses (memory-level
    // parallelism) — measured ~2.4x on the 10M-face / 1M-query
    // workload (217 -> ~90 ns/query).
    constexpr int64_t BQ = 48;
    struct Range {
        int32_t q;
        int64_t s0, s1;
    };
    std::vector<Range> ranges;
    ranges.reserve(BQ * 4);
    std::vector<int32_t> cand_q;
    std::vector<int64_t> cand_f;
    std::vector<int32_t> surv_q;
    std::vector<int64_t> surv_f;
    cand_q.reserve(BQ * 16);
    cand_f.reserve(BQ * 16);
    surv_q.reserve(BQ * 8);
    surv_f.reserve(BQ * 8);
    double qx[BQ], qy[BQ];
    int64_t best[BQ];
    for (int64_t k0 = 0; k0 < n_valid; k0 += BQ) {
        const int64_t kb = std::min(BQ, n_valid - k0);
        // Sweep A: prefetch the query points and home-cell bin lines.
        for (int64_t j = 0; j < kb; ++j) {
            const int64_t i = order[k0 + j];
            __builtin_prefetch(pts + 2 * i);
            __builtin_prefetch(bin_start + cell[i]);
        }
        // Sweep B: resolve cell windows to prim ranges; prefetch the
        // prim-id lines.
        ranges.clear();
        for (int64_t j = 0; j < kb; ++j) {
            const int64_t i = order[k0 + j];
            const double px = pts[2 * i], py = pts[2 * i + 1];
            qx[j] = px;
            qy[j] = py;
            best[j] = INT64_MAX;
            const int64_t ix0 =
                gh_clamp((int64_t)((px - tol - xmin) * inv_dx), nx - 1);
            const int64_t iy0 =
                gh_clamp((int64_t)((py - tol - ymin) * inv_dy), ny - 1);
            const int64_t ix1 =
                gh_clamp((int64_t)((px + tol - xmin) * inv_dx), nx - 1);
            const int64_t iy1 =
                gh_clamp((int64_t)((py + tol - ymin) * inv_dy), ny - 1);
            for (int64_t cy = iy0; cy <= iy1; ++cy) {
                for (int64_t cx = ix0; cx <= ix1; ++cx) {
                    const int64_t c = cy * nx + cx;
                    const int64_t s0 = bin_start[c], s1 = bin_start[c + 1];
                    if (s0 == s1) continue;
                    ranges.push_back({(int32_t)j, s0, s1});
                    __builtin_prefetch(bin_prims + s0);
                }
            }
        }
        // Sweep C: expand ranges to candidates; prefetch the boxes.
        cand_q.clear();
        cand_f.clear();
        for (const Range& r : ranges) {
            for (int64_t s = r.s0; s < r.s1; ++s) {
                const int64_t f = bin_prims[s];
                cand_q.push_back(r.q);
                cand_f.push_back(f);
                __builtin_prefetch(boxes + 4 * f);
            }
        }
        // Sweep D: box filter; prefetch the survivor polygons.
        surv_q.clear();
        surv_f.clear();
        for (size_t t = 0; t < cand_f.size(); ++t) {
            const int64_t f = cand_f[t];
            const int32_t j = cand_q[t];
            const double px = qx[j], py = qy[j];
            const double* b = boxes + 4 * f;
            if (px < b[0] - tol || px > b[2] + tol || py < b[1] - tol ||
                py > b[3] + tol)
                continue;
            surv_q.push_back(j);
            surv_f.push_back(f);
            const double* poly = poly_xy + 2 * nv * f;
            __builtin_prefetch(poly);
            __builtin_prefetch(poly + 8);
        }
        // Sweep E: exact test — crossing parity or within tol of an
        // edge, identical formulas to points_in_polygons; lowest
        // containing face wins (same tie-break as a tree traversal).
        for (size_t t = 0; t < surv_f.size(); ++t) {
            const int64_t f = surv_f[t];
            const int32_t j = surv_q[t];
            if (f >= best[j]) continue;
            const double px = qx[j], py = qy[j];
            const double* poly = poly_xy + 2 * nv * f;
            int crossings = 0;
            double ax = poly[2 * (nv - 1)], ay = poly[2 * nv - 1];
            for (int64_t v = 0; v < nv; ++v) {
                const double bx = poly[2 * v], by = poly[2 * v + 1];
                if ((ay > py) != (by > py)) {
                    const double x_at =
                        ax + (py - ay) * (bx - ax) / (by - ay);
                    if (px < x_at) ++crossings;
                }
                ax = bx;
                ay = by;
            }
            bool inside = (crossings & 1) != 0;
            if (!inside) {
                // boundary tolerance: only parity misses pay for the
                // edge-distance scan
                double min_d2 = 1e300;
                ax = poly[2 * (nv - 1)];
                ay = poly[2 * nv - 1];
                for (int64_t v = 0; v < nv; ++v) {
                    const double bx = poly[2 * v];
                    const double by = poly[2 * v + 1];
                    const double d2 = pt_seg_d2(px, py, ax, ay, bx, by);
                    if (d2 < min_d2) min_d2 = d2;
                    ax = bx;
                    ay = by;
                }
                inside = min_d2 <= tol2;
            }
            if (inside) best[j] = f;
        }
        for (int64_t j = 0; j < kb; ++j) {
            const int64_t i = order[k0 + j];
            out[i] = best[j] == INT64_MAX ? -1 : best[j];
        }
    }
    lap("query_scan");
}

}  // extern "C"

// --- clip areas gathering tree polygons from connectivity --------------
// Variant of polygon_clip_areas that reads the tree side straight from
// (face_node_connectivity, x, y): the 10M-face padded vertex buffer
// (~640 MB of writes + page faults) has no place in the weight build.
// Padding (-1) repeats the first vertex, matching pad_polygons.
extern "C" {

void polygon_clip_areas_conn(const int64_t* pair_q, const int64_t* pair_p,
                             int64_t n_pairs, const double* query_xy,
                             int64_t mq, const int64_t* tree_faces,
                             int64_t mt, const double* x, const double* y,
                             double* areas) {
    auto process = [&](int64_t lo, int64_t hi) {
        double poly[64];
        for (int64_t i = lo; i < hi; ++i) {
            const int64_t* f = tree_faces + mt * pair_p[i];
            const int64_t first = f[0] < 0 ? 0 : f[0];
            const double fx = x[first], fy = y[first];
            for (int64_t v = 0; v < mt; ++v) {
                const int64_t node = f[v];
                poly[2 * v] = node < 0 ? fx : x[node];
                poly[2 * v + 1] = node < 0 ? fy : y[node];
            }
            areas[i] = sh_clip_area(query_xy + 2 * mq * pair_q[i], mq,
                                    poly, mt);
        }
    };
    parallel_for(n_pairs, 100000, process);
}

}  // extern "C"

extern "C" {

// Area-weighted polygon centroids, one pass, no padded temporaries.
// Matches ugrid/connectivity.py::centroids (reference formula at
// xugrid/ugrid/connectivity.py:636-664): fan triangulation from vertex
// 0 of the closed polygon; fill nodes (< 0) collapse onto vertex 0 and
// contribute zero area.  Triangles (m == 3) take the vertex mean.  The
// numpy path materializes (n, m+1, 2) closed coordinates plus four
// temporaries of that size (~5 GB of traffic at 10M quads, ~60 s on the
// 1-vCPU bench host); this kernel reads each face once (~1 s).
void face_centroids(const int64_t* faces, int64_t n, int64_t m,
                    const double* x, const double* y, double* out_xy) {
    auto process = [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ++i) {
            const int64_t* f = faces + i * m;
            if (m == 3) {
                const int64_t a = f[0], b = f[1], c = f[2];
                out_xy[2 * i] = (x[a] + x[b] + x[c]) / 3.0;
                out_xy[2 * i + 1] = (y[a] + y[b] + y[c]) / 3.0;
                continue;
            }
            const int64_t n0 = f[0] < 0 ? 0 : f[0];
            const double x0 = x[n0], y0 = y[n0];
            double total = 0.0, cx = 0.0, cy = 0.0;
            double ax = 0.0, ay = 0.0;  // vertex v relative to vertex 0
            for (int64_t v = 1; v <= m; ++v) {
                // Closed polygon: vertex m wraps to vertex 0 (relative
                // coords (0,0)); fill nodes also collapse to vertex 0.
                double bx = 0.0, by = 0.0;
                if (v < m && f[v] >= 0) {
                    bx = x[f[v]] - x0;
                    by = y[f[v]] - y0;
                }
                const double det = ax * by - ay * bx;
                total += det;
                cx += (ax + bx) * det;
                cy += (ay + by) * det;
                ax = bx;
                ay = by;
            }
            const double w = 1.0 / (3.0 * total);
            out_xy[2 * i] = w * cx + x0;
            out_xy[2 * i + 1] = w * cy + y0;
        }
    };
    parallel_for(n, 200000, process);
}

// Stable counting-sort CSR build from COO triplets: exact parity with
// np.argsort(row, kind="stable") + gathers (stable counting sort IS the
// stable sort by row), but O(nnz) instead of comparison sort — the
// random-key argsort costs ~10 s at 18M triplets on the bench host.
// indptr has n+1 slots; out_col/out_data have nnz slots.  On return
// indptr is the final CSR row pointer.
void csr_from_triplet(const int64_t* row, const int64_t* col,
                      const double* data, int64_t nnz, int64_t n,
                      int64_t* indptr, int64_t* out_col,
                      double* out_data) {
    std::memset(indptr, 0, sizeof(int64_t) * static_cast<size_t>(n + 1));
    for (int64_t k = 0; k < nnz; ++k) ++indptr[row[k] + 1];
    for (int64_t r = 0; r < n; ++r) indptr[r + 1] += indptr[r];
    std::vector<int64_t> cursor(indptr, indptr + n);
    for (int64_t k = 0; k < nnz; ++k) {
        const int64_t dst = cursor[row[k]]++;
        out_col[dst] = col[k];
        out_data[dst] = data[k];
    }
}

}  // extern "C"

extern "C" {

// Fused sharding-layout builder: triplets (grouped by target, the
// natural overlap-build output order) -> PaddedCSR rows emitted
// directly in the Hilbert target order, source columns renumbered by
// the Hilbert source order.  Replaces remap-gather + stable sort +
// ragged->padded scatter (three latency-bound 18M-element numpy passes,
// ~12 s at the 10M-face scale) with two sequential passes.  Returns
// w_max, or -1 when target_index is not non-decreasing (caller falls
// back to the general sort path).  out_idx/out_w are (n, w_max_cap);
// call first with starts only (pass out_idx == nullptr) to learn w_max.
int64_t padded_layout(const int64_t* tindex, const int64_t* sindex,
                      const double* w, int64_t nnz, int64_t n,
                      const int64_t* torder, const int64_t* sremap,
                      int64_t* starts /* n+1 scratch/out */,
                      int64_t w_max_cap, int32_t* out_idx,
                      float* out_w) {
    if (out_idx == nullptr) {
        std::memset(starts, 0,
                    sizeof(int64_t) * static_cast<size_t>(n + 1));
        for (int64_t k = 0; k < nnz; ++k) {
            if (k > 0 && tindex[k] < tindex[k - 1]) return -1;
            ++starts[tindex[k] + 1];
        }
        int64_t w_max = 0;
        for (int64_t r = 0; r < n; ++r) {
            w_max = std::max(w_max, starts[r + 1]);
            starts[r + 1] += starts[r];
        }
        return w_max;
    }
    auto process = [&](int64_t lo, int64_t hi) {
        for (int64_t r = lo; r < hi; ++r) {
            const int64_t t = torder[r];
            const int64_t j0 = starts[t], j1 = starts[t + 1];
            // Hide the sremap[sindex[j]] dependent-load latency: the
            // row's entries are contiguous, prefetch the remap slots.
            for (int64_t j = j0; j < j1; ++j)
                __builtin_prefetch(sremap + sindex[j]);
            int32_t* oi = out_idx + r * w_max_cap;
            float* ow = out_w + r * w_max_cap;
            int64_t c = 0;
            for (int64_t j = j0; j < j1; ++j, ++c) {
                oi[c] = static_cast<int32_t>(sremap[sindex[j]]);
                ow[c] = static_cast<float>(w[j]);
            }
            for (; c < w_max_cap; ++c) {
                oi[c] = -1;
                ow[c] = 0.0f;
            }
        }
    };
    parallel_for(n, 200000, process);
    return w_max_cap;
}

}  // extern "C"
