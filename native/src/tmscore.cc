// TM-score / RMSD engine (C API).
//
// Native replacement for the reference's bin/TMscore binary (Zhang-lab C++,
// invoked as a subprocess and regex-parsed: utils_trX2dy/utils.py:514-523,
// evaluate_utils.py:56-66). Re-implemented from the published algorithm
// (Zhang & Skolnick, Proteins 2004):
//   * Kabsch superposition via the 3x3 covariance SVD (closed-form Jacobi
//     eigen-solve of H^T H),
//   * fragment seeds of length L, L/2, L/4, ... >= 4 at stride len/2,
//   * iterative refinement: superimpose on the selected subset, re-select
//     residues under the distance cutoff, until the subset fixes,
//   * d0 = 1.24 (L-15)^(1/3) - 1.8 (clamped at 0.5).
//
// Exposed as a flat C ABI for ctypes (no pybind11 in the image). The host
// uses it for large all-vs-all matrices (clustering/evaluation) where
// per-pair dispatch to the TPU would be latency-bound; the JAX engine
// (trx2dy/analysis/tmscore.py) remains the vmapped device path.

#include <algorithm>
#include <cmath>
#include <cstring>
#include <vector>

namespace {

struct Mat3 {
  double m[3][3];
};

// Jacobi eigen-decomposition of a symmetric 3x3 matrix.
static void jacobi_eig(double a[3][3], double v[3][3], double w[3]) {
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) v[i][j] = (i == j) ? 1.0 : 0.0;
  for (int iter = 0; iter < 64; ++iter) {
    double off = std::abs(a[0][1]) + std::abs(a[0][2]) + std::abs(a[1][2]);
    if (off < 1e-15) break;
    for (int p = 0; p < 2; ++p) {
      for (int q = p + 1; q < 3; ++q) {
        if (std::abs(a[p][q]) < 1e-18) continue;
        double theta = (a[q][q] - a[p][p]) / (2.0 * a[p][q]);
        double t = (theta >= 0 ? 1.0 : -1.0) /
                   (std::abs(theta) + std::sqrt(theta * theta + 1.0));
        double c = 1.0 / std::sqrt(t * t + 1.0), s = t * c;
        for (int k = 0; k < 3; ++k) {
          double akp = a[k][p], akq = a[k][q];
          a[k][p] = c * akp - s * akq;
          a[k][q] = s * akp + c * akq;
        }
        for (int k = 0; k < 3; ++k) {
          double apk = a[p][k], aqk = a[q][k];
          a[p][k] = c * apk - s * aqk;
          a[q][k] = s * apk + c * aqk;
        }
        for (int k = 0; k < 3; ++k) {
          double vkp = v[k][p], vkq = v[k][q];
          v[k][p] = c * vkp - s * vkq;
          v[k][q] = s * vkp + c * vkq;
        }
      }
    }
  }
  for (int i = 0; i < 3; ++i) w[i] = a[i][i];
}

// Optimal rotation R and translation t superposing weighted P onto Q.
static void kabsch(const double* P, const double* Q, const double* wts, int n,
                   double R[3][3], double t[3]) {
  double wsum = 0, pc[3] = {0, 0, 0}, qc[3] = {0, 0, 0};
  for (int i = 0; i < n; ++i) wsum += wts[i];
  if (wsum <= 0) wsum = 1;
  for (int i = 0; i < n; ++i)
    for (int d = 0; d < 3; ++d) {
      pc[d] += wts[i] * P[3 * i + d];
      qc[d] += wts[i] * Q[3 * i + d];
    }
  for (int d = 0; d < 3; ++d) {
    pc[d] /= wsum;
    qc[d] /= wsum;
  }
  double H[3][3] = {};
  for (int i = 0; i < n; ++i)
    for (int a = 0; a < 3; ++a)
      for (int b = 0; b < 3; ++b)
        H[a][b] += wts[i] * (P[3 * i + a] - pc[a]) * (Q[3 * i + b] - qc[b]);

  // SVD of H via eigen-decomposition of H^T H = V S^2 V^T; U = H V S^-1
  double HtH[3][3] = {};
  for (int a = 0; a < 3; ++a)
    for (int b = 0; b < 3; ++b)
      for (int k = 0; k < 3; ++k) HtH[a][b] += H[k][a] * H[k][b];
  double V[3][3], w[3];
  double HtH_copy[3][3];
  std::memcpy(HtH_copy, HtH, sizeof(HtH));
  jacobi_eig(HtH_copy, V, w);
  // sort eigenpairs descending
  int order[3] = {0, 1, 2};
  std::sort(order, order + 3, [&](int a, int b) { return w[a] > w[b]; });
  double Vs[3][3], ws[3];
  for (int c = 0; c < 3; ++c) {
    ws[c] = std::max(w[order[c]], 0.0);
    for (int r = 0; r < 3; ++r) Vs[r][c] = V[r][order[c]];
  }
  double U[3][3] = {};
  for (int c = 0; c < 3; ++c) {
    double s = std::sqrt(std::max(ws[c], 1e-20));
    for (int r = 0; r < 3; ++r) {
      double acc = 0;
      for (int k = 0; k < 3; ++k) acc += H[r][k] * Vs[k][c];
      U[r][c] = acc / s;
    }
  }
  // re-orthogonalize U's third column as cross product (rank safety)
  U[0][2] = U[1][0] * U[2][1] - U[2][0] * U[1][1];
  U[1][2] = U[2][0] * U[0][1] - U[0][0] * U[2][1];
  U[2][2] = U[0][0] * U[1][1] - U[1][0] * U[0][1];

  // R = V * diag(1,1,det) * U^T maps P-frame -> Q-frame... careful:
  // H = sum w (p-pc)(q-qc)^T ; we need R with R p ~ q: R = M U V^T? Use
  // standard: with H = P^T Q (rows centered), R = V U^T where H = U S V^T.
  // Here H's SVD: H = U S Vs^T, so R = Vs * D * U^T with D fixing det.
  double Rtmp[3][3] = {};
  for (int r = 0; r < 3; ++r)
    for (int c = 0; c < 3; ++c) {
      double acc = 0;
      for (int k = 0; k < 3; ++k) acc += Vs[r][k] * U[c][k];
      Rtmp[r][c] = acc;
    }
  double det = Rtmp[0][0] * (Rtmp[1][1] * Rtmp[2][2] - Rtmp[1][2] * Rtmp[2][1]) -
               Rtmp[0][1] * (Rtmp[1][0] * Rtmp[2][2] - Rtmp[1][2] * Rtmp[2][0]) +
               Rtmp[0][2] * (Rtmp[1][0] * Rtmp[2][1] - Rtmp[1][1] * Rtmp[2][0]);
  if (det < 0) {
    for (int r = 0; r < 3; ++r) Vs[r][2] = -Vs[r][2];
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 3; ++c) {
        double acc = 0;
        for (int k = 0; k < 3; ++k) acc += Vs[r][k] * U[c][k];
        Rtmp[r][c] = acc;
      }
  }
  std::memcpy(R, Rtmp, sizeof(Rtmp));
  for (int d = 0; d < 3; ++d) {
    double acc = 0;
    for (int k = 0; k < 3; ++k) acc += R[d][k] * pc[k];
    t[d] = qc[d] - acc;
  }
}

static double score_all(const double* P, const double* Q, int n, double d0,
                        const double R[3][3], const double t[3],
                        std::vector<double>* dists) {
  double total = 0;
  for (int i = 0; i < n; ++i) {
    double d2 = 0;
    for (int d = 0; d < 3; ++d) {
      double acc = t[d];
      for (int k = 0; k < 3; ++k) acc += R[d][k] * P[3 * i + k];
      double diff = acc - Q[3 * i + d];
      d2 += diff * diff;
    }
    double dist = std::sqrt(d2);
    if (dists) (*dists)[i] = dist;
    total += 1.0 / (1.0 + d2 / (d0 * d0));
  }
  return total / n;
}

}  // namespace

extern "C" {

// TM-score + RMSD of index-aligned CA traces pred/native, both (n, 3)
// row-major doubles. Returns 0 on success.
int trx2dy_tmscore(const double* pred, const double* native_, int n,
                   double* tm_out, double* rmsd_out) {
  if (n < 4) return 1;
  double d0 = n > 15 ? std::max(1.24 * std::cbrt(n - 15.0) - 1.8, 0.5) : 0.5;

  // global Kabsch RMSD
  std::vector<double> ones(n, 1.0);
  double R[3][3], t[3];
  kabsch(pred, native_, ones.data(), n, R, t);
  std::vector<double> dists(n);
  score_all(pred, native_, n, d0, R, t, &dists);
  double ss = 0;
  for (int i = 0; i < n; ++i) ss += dists[i] * dists[i];
  *rmsd_out = std::sqrt(ss / n);

  double best = 0;
  std::vector<double> sel(n), new_sel(n);
  for (int frag = n; frag >= 4; frag /= 2) {
    int stride = std::max(1, frag / 2);
    for (int off = 0; off + frag <= n; off += stride) {
      std::fill(sel.begin(), sel.end(), 0.0);
      std::fill(sel.begin() + off, sel.begin() + off + frag, 1.0);
      for (int iter = 0; iter < 20; ++iter) {
        kabsch(pred, native_, sel.data(), n, R, t);
        double sc = score_all(pred, native_, n, d0, R, t, &dists);
        best = std::max(best, sc);
        double cutoff = d0 + (iter < 10 ? 1.0 : 2.5);
        int kept = 0;
        for (int i = 0; i < n; ++i) {
          new_sel[i] = dists[i] < cutoff ? 1.0 : 0.0;
          kept += new_sel[i] > 0;
        }
        if (kept < 4) break;
        if (new_sel == sel) break;
        sel = new_sel;
      }
    }
  }
  *tm_out = best;
  return 0;
}

// All-vs-all TM/RMSD matrices for m structures sharing length n.
// coords: (m, n, 3) row-major. tm/rmsd: (m, m) outputs.
int trx2dy_tmscore_matrix(const double* coords, int m, int n, double* tm,
                          double* rmsd) {
  for (int i = 0; i < m; ++i) {
    tm[i * m + i] = 1.0;
    rmsd[i * m + i] = 0.0;
    for (int j = i + 1; j < m; ++j) {
      double tv, rv;
      if (trx2dy_tmscore(coords + (size_t)i * n * 3,
                         coords + (size_t)j * n * 3, n, &tv, &rv))
        return 1;
      tm[i * m + j] = tm[j * m + i] = tv;
      rmsd[i * m + j] = rmsd[j * m + i] = rv;
    }
  }
  return 0;
}

}  // extern "C"
