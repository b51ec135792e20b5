// Native CPU kernel library for multigridanisotropicdiffusion_tpu.
//
// Provides the *sequential* reference semantics that cannot be expressed on
// TPU — lexicographic Gauss-Seidel, the smoother of the reference module
// (/root/reference/include/mad/itkMultigridGaussSeidelSmoother.hxx:33-111
// describes the behavior being reproduced: offsets lexicographically before
// the center read the freshly-updated output, offsets after read the input)
// — plus residual and weighted-Jacobi sweeps.  Used from Python via ctypes
// as (a) an independent golden oracle for the colored TPU smoothers and
// (b) a fast CPU execution path for environments without accelerators.
//
// Conventions: grids are C-order (last axis fastest); "lexicographic" order
// is plain C-order buffer order.  Coefficients are K separate planes
// (coeffs[k] multiplies x[p + offsets[k]]; out-of-range neighbors are zero,
// matching the boundary-folded operators).  Double precision throughout,
// like the reference.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Grid {
  int ndim;
  const int64_t* shape;
  int64_t n;          // total voxels
  int64_t strides[4]; // C-order strides (supports ndim <= 4)
};

Grid make_grid(int ndim, const int64_t* shape) {
  Grid g;
  g.ndim = ndim;
  g.shape = shape;
  g.n = 1;
  for (int d = 0; d < ndim; ++d) g.n *= shape[d];
  int64_t s = 1;
  for (int d = ndim - 1; d >= 0; --d) {
    g.strides[d] = s;
    s *= shape[d];
  }
  return g;
}

// Decompose flat index -> per-dim coordinates.
inline void coords_of(const Grid& g, int64_t p, int64_t* c) {
  for (int d = 0; d < g.ndim; ++d) {
    c[d] = p / g.strides[d];
    p -= c[d] * g.strides[d];
  }
}

// Precomputed per-offset data.
struct OffsetInfo {
  int64_t flat;            // flat stride of the offset
  std::vector<int64_t> off; // per-dim components
  bool before_center;      // lexicographically before (0,...,0) in C-order
};

std::vector<OffsetInfo> prepare_offsets(const Grid& g, int K,
                                        const int64_t* offsets) {
  std::vector<OffsetInfo> out(K);
  for (int k = 0; k < K; ++k) {
    OffsetInfo& oi = out[k];
    oi.off.assign(offsets + k * g.ndim, offsets + (k + 1) * g.ndim);
    oi.flat = 0;
    for (int d = 0; d < g.ndim; ++d) oi.flat += oi.off[d] * g.strides[d];
    oi.before_center = oi.flat < 0;  // C-order lexicographic comparison
  }
  return out;
}

inline bool in_range(const Grid& g, const int64_t* c, const OffsetInfo& oi) {
  for (int d = 0; d < g.ndim; ++d) {
    int64_t q = c[d] + oi.off[d];
    if (q < 0 || q >= g.shape[d]) return false;
  }
  return true;
}

}  // namespace

extern "C" {

// Lexicographic Gauss-Seidel sweep: out receives the updated field; entries
// at offsets before the center read `out` (already updated this sweep),
// after the center read `x`.
void mad_gs_sweep(int ndim, const int64_t* shape, int K,
                  const int64_t* offsets, const double* const* coeffs,
                  const double* x, const double* b, double* out) {
  Grid g = make_grid(ndim, shape);
  auto offs = prepare_offsets(g, K, offsets);
  int center = -1;
  for (int k = 0; k < K; ++k)
    if (offs[k].flat == 0) center = k;

  int64_t c[4];
  for (int64_t p = 0; p < g.n; ++p) {
    coords_of(g, p, c);
    double v = b[p];
    for (int k = 0; k < K; ++k) {
      if (k == center) continue;
      const OffsetInfo& oi = offs[k];
      if (!in_range(g, c, oi)) continue;
      const double* src = oi.before_center ? out : x;
      v -= coeffs[k][p] * src[p + oi.flat];
    }
    out[p] = v / coeffs[center][p];
  }
}

// Damped Jacobi sweep: x' = (1-w) x + (w/diag) (b - offdiag x).
void mad_wj_sweep(int ndim, const int64_t* shape, int K,
                  const int64_t* offsets, const double* const* coeffs,
                  const double* x, const double* b, double omega,
                  double* out) {
  Grid g = make_grid(ndim, shape);
  auto offs = prepare_offsets(g, K, offsets);
  int center = -1;
  for (int k = 0; k < K; ++k)
    if (offs[k].flat == 0) center = k;

  int64_t c[4];
  for (int64_t p = 0; p < g.n; ++p) {
    coords_of(g, p, c);
    double v = b[p];
    for (int k = 0; k < K; ++k) {
      if (k == center) continue;
      const OffsetInfo& oi = offs[k];
      if (!in_range(g, c, oi)) continue;
      v -= coeffs[k][p] * x[p + oi.flat];
    }
    out[p] = (1.0 - omega) * x[p] + omega * v / coeffs[center][p];
  }
}

// Residual r = b - A x.
void mad_residual(int ndim, const int64_t* shape, int K,
                  const int64_t* offsets, const double* const* coeffs,
                  const double* x, const double* b, double* out) {
  Grid g = make_grid(ndim, shape);
  auto offs = prepare_offsets(g, K, offsets);

  int64_t c[4];
  for (int64_t p = 0; p < g.n; ++p) {
    coords_of(g, p, c);
    double v = b[p];
    for (int k = 0; k < K; ++k) {
      const OffsetInfo& oi = offs[k];
      if (!in_range(g, c, oi)) continue;
      v -= coeffs[k][p] * x[p + oi.flat];
    }
    out[p] = v;
  }
}

// A x (stencil application).
void mad_apply(int ndim, const int64_t* shape, int K, const int64_t* offsets,
               const double* const* coeffs, const double* x, double* out) {
  Grid g = make_grid(ndim, shape);
  auto offs = prepare_offsets(g, K, offsets);

  int64_t c[4];
  for (int64_t p = 0; p < g.n; ++p) {
    coords_of(g, p, c);
    double v = 0.0;
    for (int k = 0; k < K; ++k) {
      const OffsetInfo& oi = offs[k];
      if (!in_range(g, c, oi)) continue;
      v += coeffs[k][p] * x[p + oi.flat];
    }
    out[p] = v;
  }
}

}  // extern "C"
