// Host-side native ops for spectavi_tpu.
//
// Primary role: a faithful CPU *baseline* for the benchmark harness.
// The upstream reference (vvhitedog/spectavi) cannot be built in this
// image (its vlfeat/hnswlib/ctypes_ndarray submodules are not checked
// out), so the measured pairs/s denominator comes from this
// re-implementation of its performance kernel: brute-force L1
// nearest-neighbour with K=2 over uint8 descriptors using SSE2
// _mm_sad_epu8, running best/second tracking with partial-sum pruning,
// and OpenMP over query rows — the same algorithmic design as the
// reference's src/BruteForceNnL1K2.h:55-146 (independently written).
//
// Secondary role: a fast CPU fallback for environments without an
// accelerator.
//
// Build: make -C native   (produces libspectavi_hostops.so)

#include <cstdint>
#include <cstring>
#include <limits>

#include <emmintrin.h>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

inline uint32_t sad16(const uint8_t *a, const uint8_t *b) {
  __m128i va = _mm_loadu_si128(reinterpret_cast<const __m128i *>(a));
  __m128i vb = _mm_loadu_si128(reinterpret_cast<const __m128i *>(b));
  __m128i s = _mm_sad_epu8(va, vb);
  return static_cast<uint32_t>(_mm_cvtsi128_si32(s)) +
         static_cast<uint32_t>(_mm_extract_epi16(s, 4));
}

} // namespace

extern "C" {

// Exact top-2 L1 nearest neighbours: for each row of y (yrows x dim),
// find the two closest rows of x (xrows x dim) under the L1 norm.
// dim must be a multiple of 16. out_idx: (yrows, 2) int64,
// out_dist: (yrows, 2) int32.
void hostops_l1k2_nn(const uint8_t *x, const uint8_t *y, int xrows, int yrows,
                     int dim, int nthreads, int64_t *out_idx,
                     int32_t *out_dist) {
  const int groups = dim / 16;
#ifdef _OPENMP
#pragma omp parallel for num_threads(nthreads) schedule(static)
#endif
  for (int iy = 0; iy < yrows; ++iy) {
    const uint8_t *yrow = y + static_cast<size_t>(iy) * dim;
    int32_t d1 = std::numeric_limits<int32_t>::max();
    int32_t d2 = std::numeric_limits<int32_t>::max();
    int64_t i1 = -1, i2 = -1;
    int32_t worst = -1;
    for (int ix = 0; ix < xrows; ++ix) {
      const uint8_t *xrow = x + static_cast<size_t>(ix) * dim;
      int32_t acc = 0;
      bool pruned = false;
      for (int g = 0; g < groups; ++g) {
        acc += static_cast<int32_t>(sad16(xrow + 16 * g, yrow + 16 * g));
        if (worst >= 0 && acc > worst) {
          pruned = true;
          break;
        }
      }
      if (pruned)
        continue;
      if (acc < d1) {
        d2 = d1;
        i2 = i1;
        d1 = acc;
        i1 = ix;
      } else if (acc < d2) {
        d2 = acc;
        i2 = ix;
      }
      if (i2 >= 0)
        worst = d2;
    }
    out_idx[2 * iy] = i1;
    out_idx[2 * iy + 1] = i2;
    out_dist[2 * iy] = d1;
    out_dist[2 * iy + 1] = d2;
  }
}

// Generic scalar L1 top-2 (no SIMD) — the "10x slower" comparison
// point the reference's tests mention (test/test_feature.py:104-107).
void hostops_l1k2_nn_scalar(const float *x, const float *y, int xrows,
                            int yrows, int dim, int nthreads, int64_t *out_idx,
                            float *out_dist) {
#ifdef _OPENMP
#pragma omp parallel for num_threads(nthreads) schedule(static)
#endif
  for (int iy = 0; iy < yrows; ++iy) {
    const float *yrow = y + static_cast<size_t>(iy) * dim;
    float d1 = std::numeric_limits<float>::max();
    float d2 = std::numeric_limits<float>::max();
    int64_t i1 = -1, i2 = -1;
    for (int ix = 0; ix < xrows; ++ix) {
      const float *xrow = x + static_cast<size_t>(ix) * dim;
      float acc = 0.f;
      for (int d = 0; d < dim; ++d) {
        float diff = xrow[d] - yrow[d];
        acc += diff < 0 ? -diff : diff;
      }
      if (acc < d1) {
        d2 = d1;
        i2 = i1;
        d1 = acc;
        i1 = ix;
      } else if (acc < d2) {
        d2 = acc;
        i2 = ix;
      }
    }
    out_idx[2 * iy] = i1;
    out_idx[2 * iy + 1] = i2;
    out_dist[2 * iy] = d1;
    out_dist[2 * iy + 1] = d2;
  }
}

} // extern "C"
