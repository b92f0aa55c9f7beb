// Native block-Jacobi preconditioner assembly.
//
// Same math as dcora_tpu/core/problem.py::build_preconditioner (which
// replaces the reference's CHOLMOD Cholesky preconditioner,
// Graph.cpp:1888-1960): per-pose (d+1)x(d+1) diagonal blocks of Q in the
// SE-interleaved basis [rot | trans], scalar diagonals for unit spheres and
// landmarks, `reg` added to every diagonal, pose blocks inverted in place
// via Cholesky so the device-side apply is one batched einsum.
#include <cmath>
#include <cstring>
#include <vector>

#include "../include/dcora_native.h"

namespace {

// in-place Cholesky inverse of a small SPD matrix (dim <= 4 in practice)
bool spd_inverse(double *A, int n) {
  // Cholesky factor L (lower), in place
  for (int j = 0; j < n; ++j) {
    double diag = A[j * n + j];
    for (int k = 0; k < j; ++k) diag -= A[j * n + k] * A[j * n + k];
    if (diag <= 0) return false;
    diag = std::sqrt(diag);
    A[j * n + j] = diag;
    for (int i = j + 1; i < n; ++i) {
      double v = A[i * n + j];
      for (int k = 0; k < j; ++k) v -= A[i * n + k] * A[j * n + k];
      A[i * n + j] = v / diag;
    }
  }
  // invert L in place (lower triangular)
  for (int j = 0; j < n; ++j) {
    A[j * n + j] = 1.0 / A[j * n + j];
    for (int i = j + 1; i < n; ++i) {
      double v = 0;
      for (int k = j; k < i; ++k) v -= A[i * n + k] * A[k * n + j];
      A[i * n + j] = v / A[i * n + i];
    }
  }
  // A_inv = L^-T L^-1 (symmetric)
  double tmp[16];
  for (int i = 0; i < n; ++i)
    for (int j = 0; j <= i; ++j) {
      double v = 0;
      for (int k = i; k < n; ++k) v += A[k * n + i] * A[k * n + j];
      tmp[i * n + j] = v;
      tmp[j * n + i] = v;
    }
  std::memcpy(A, tmp, n * n * sizeof(double));
  return true;
}

}  // namespace

extern "C" int dcora_jacobi_precond(
    int64_t n, int64_t nsph, int64_t nlmk, int d, double reg, int64_t mpp,
    const int64_t *pp_ri, const int64_t *pp_rj, const double *pp_t,
    const double *pp_kappa, const double *pp_tau, const double *pp_w,
    int64_t mpl, const int64_t *pl_ri, const int64_t *pl_tj,
    const double *pl_t, const double *pl_tau, const double *pl_w,
    int64_t mrg, const int64_t *rg_ti, const int64_t *rg_tj,
    const int64_t *rg_q, const double *rg_rho, const double *rg_prec,
    const double *rg_w, double *pose_inv, double *sph_diag,
    double *lmk_diag) {
  const int dh = d + 1;
  const int bs = dh * dh;
  std::memset(pose_inv, 0, n * bs * sizeof(double));
  for (int64_t i = 0; i < nsph; ++i) sph_diag[i] = reg;
  for (int64_t i = 0; i < nlmk; ++i) lmk_diag[i] = reg;

  // pose-pose: tail [[kw I + tw t t^T, tw t],[tw t^T, tw]]; head
  // [[kw I, 0],[0, tw]]
  for (int64_t m = 0; m < mpp; ++m) {
    const double kw = pp_kappa[m] * pp_w[m];
    const double tw = pp_tau[m] * pp_w[m];
    const double *t = pp_t + m * d;
    const int64_t i = pp_ri[m], j = pp_rj[m];
    if (i < n) {
      double *B = pose_inv + i * bs;
      for (int a = 0; a < d; ++a) {
        B[a * dh + a] += kw;
        for (int b = 0; b < d; ++b) B[a * dh + b] += tw * t[a] * t[b];
        B[a * dh + d] += tw * t[a];
        B[d * dh + a] += tw * t[a];
      }
      B[d * dh + d] += tw;
    }
    if (j < n) {
      double *B = pose_inv + j * bs;
      for (int a = 0; a < d; ++a) B[a * dh + a] += kw;
      B[d * dh + d] += tw;
    }
  }

  // pose-landmark: tail pose gets the tau block; head landmark diagonal
  for (int64_t m = 0; m < mpl; ++m) {
    const double tw = pl_tau[m] * pl_w[m];
    const double *t = pl_t + m * d;
    const int64_t i = pl_ri[m];
    if (i < n) {
      double *B = pose_inv + i * bs;
      for (int a = 0; a < d; ++a) {
        for (int b = 0; b < d; ++b) B[a * dh + b] += tw * t[a] * t[b];
        B[a * dh + d] += tw * t[a];
        B[d * dh + a] += tw * t[a];
      }
      B[d * dh + d] += tw;
    }
    const int64_t jl = pl_tj[m] - n;
    if (jl >= 0 && jl < nlmk) lmk_diag[jl] += tw;
  }

  // ranges: sphere diagonal om*rho^2; translation Laplacian +om at both ends
  for (int64_t m = 0; m < mrg; ++m) {
    const double om = rg_prec[m] * rg_w[m];
    if (rg_q[m] < nsph) sph_diag[rg_q[m]] += om * rg_rho[m] * rg_rho[m];
    for (const int64_t tidx : {rg_ti[m], rg_tj[m]}) {
      if (tidx < n)
        pose_inv[tidx * bs + d * dh + d] += om;
      else if (tidx - n < nlmk)
        lmk_diag[tidx - n] += om;
    }
  }

  // regularize and invert pose blocks
  int rc = 0;
  for (int64_t i = 0; i < n; ++i) {
    double *B = pose_inv + i * bs;
    for (int a = 0; a < dh; ++a) B[a * dh + a] += reg;
    if (!spd_inverse(B, dh)) rc = 1;
  }
  return rc;
}
