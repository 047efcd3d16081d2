// Serial single-threaded plane-phantom US-calibration RANSAC baseline (k=31).
//
// Stand-in for the reference's RANSAC over
// PlanePhantomUSCalibrationParametersEstimator (RANSAC.hxx:49-117 driving
// PlanePhantomUSCalibrationParametersEstimator.cxx:119-355): per hypothesis,
// draw 31 random distinct elements, find the null direction of the
// homogeneous 31x31 system whose rows are
// [u vec(R2), v vec(R2), vec(R2), t2, 1], rescale so the R1-row-3 block is
// unit, and vote the scalar plane-distance expression (cxx:73-117) over all
// n elements with the reference's early-exit optimization.
//
// Deliberately favored vs the reference: the null direction comes from a
// normal-matrix (A^T A) partial-pivot LU + inverse iteration (~45k flops)
// instead of the reference's full 31x31 SVD, the vote reads precomputed
// per-element feature rows (the rescaled null vector IS the 31-entry vote
// row [m1, m2, m3, R1_row3, t1_z]), and no Euler/orthonormalization
// reconstruction is performed (votes never need it) — so the reported
// baseline hyp/s is an upper bound on what the reference engine would do.
// Original code (the reference needs VNL and cannot be compiled here);
// exists to give bench.py --metric phantom a compiled-C++ denominator.
//
// Usage: phantom_baseline [n_elements] [hypotheses]; prints {"hyp_per_s": ...}.

#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>

static const int K = 31;

static void euler_zyx(double wz, double wy, double wx, double r[3][3]) {
  double cz = std::cos(wz), sz = std::sin(wz);
  double cy = std::cos(wy), sy = std::sin(wy);
  double cx = std::cos(wx), sx = std::sin(wx);
  r[0][0] = cz * cy; r[0][1] = cz * sy * sx - sz * cx; r[0][2] = cz * sy * cx + sz * sx;
  r[1][0] = sz * cy; r[1][1] = sz * sy * sx + cz * cx; r[1][2] = sz * sy * cx - cz * sx;
  r[2][0] = -sy;     r[2][1] = cy * sx;                r[2][2] = cy * cx;
}

// Partial-pivot LU factorization of g (K x K, in place) with row permutation
// piv; near-zero pivots are clamped (the inverse-iteration driver WANTS the
// huge amplification of the near-null direction).
static void lu_factor(double *g, int *piv) {
  for (int i = 0; i < K; i++) piv[i] = i;
  for (int c = 0; c < K; c++) {
    int p = c;
    for (int r = c + 1; r < K; r++)
      if (std::fabs(g[r * K + c]) > std::fabs(g[p * K + c])) p = r;
    if (p != c) {
      for (int j = 0; j < K; j++) std::swap(g[c * K + j], g[p * K + j]);
      std::swap(piv[c], piv[p]);
    }
    double d = g[c * K + c];
    if (std::fabs(d) < 1e-30) d = (d < 0 ? -1e-30 : 1e-30);
    g[c * K + c] = d;
    for (int r = c + 1; r < K; r++) {
      double m = g[r * K + c] / d;
      g[r * K + c] = m;
      for (int j = c + 1; j < K; j++) g[r * K + j] -= m * g[c * K + j];
    }
  }
}

static void lu_solve(const double *lu, const int *piv, const double *b,
                     double *x) {
  double y[K];
  for (int i = 0; i < K; i++) {
    double t = b[piv[i]];
    for (int j = 0; j < i; j++) t -= lu[i * K + j] * y[j];
    y[i] = t;
  }
  for (int i = K - 1; i >= 0; i--) {
    double t = y[i];
    for (int j = i + 1; j < K; j++) t -= lu[i * K + j] * x[j];
    x[i] = t / lu[i * K + i];
  }
}

int main(int argc, char **argv) {
  int n = argc > 1 ? std::atoi(argv[1]) : 64;
  long hypotheses = argc > 2 ? std::atol(argv[2]) : 20000;
  double delta = 1.0, delta_sq = delta * delta;

  std::mt19937_64 rng(42);
  std::uniform_real_distribution<double> uni(0.0, 1.0);
  std::normal_distribution<double> gauss(0.0, 1.0);

  // Ground truth calibration (same model as the TPU bench workload).
  double r3[3][3];
  euler_zyx(1.1, 0.4, -0.7, r3);
  const double mx = 0.143, my = 0.139;
  double t3[3] = {20.0, -15.0, 40.0};
  const double wy1 = 0.35, wx1 = -0.55, t1z = -40.0;
  double r1row3[3] = {-std::sin(wy1), std::cos(wy1) * std::sin(wx1),
                      std::cos(wy1) * std::cos(wx1)};

  // Per-element homogeneous feature rows f = [u vecR2, v vecR2, vecR2, t2, 1]
  // (also the minimal-system rows; the rescaled null vector is the vote row).
  std::vector<double> feat(n * K);
  for (int i = 0; i < n; i++) {
    double r2[3][3];
    euler_zyx(uni(rng) * M_PI, uni(rng) * M_PI, uni(rng) * M_PI, r2);
    double u = uni(rng) * 640.0, v = uni(rng) * 480.0;
    double img[3], t2[3];
    for (int j = 0; j < 3; j++)
      img[j] = u * mx * r3[j][0] + v * my * r3[j][1] + t3[j];
    double res = t1z;
    for (int j = 0; j < 3; j++) {
      t2[j] = uni(rng) * 200.0 - 100.0;
      double m = 0.0;
      for (int k = 0; k < 3; k++) m += r2[j][k] * img[k];
      res += r1row3[j] * (m + t2[j]);
    }
    for (int j = 0; j < 3; j++) t2[j] -= res * r1row3[j];  // onto the plane
    if (i % 10 == 9) {  // 10% outliers: poses shoved off the phantom plane
      double s = (20.0 + 40.0 * uni(rng)) * (uni(rng) < 0.5 ? -1.0 : 1.0);
      for (int j = 0; j < 3; j++) t2[j] += s * r1row3[j];
    } else {           // inliers: 0.5 px image noise
      u += 0.5 * gauss(rng);
      v += 0.5 * gauss(rng);
    }
    double *f = &feat[i * K];
    for (int j = 0; j < 3; j++)
      for (int k = 0; k < 3; k++) {
        f[3 * j + k] = u * r2[j][k];
        f[9 + 3 * j + k] = v * r2[j][k];
        f[18 + 3 * j + k] = r2[j][k];
      }
    for (int j = 0; j < 3; j++) f[27 + j] = t2[j];
    f[30] = 1.0;
  }

  std::uniform_int_distribution<int> pick(0, n - 1);
  int idx[K];
  double g[K * K], lu[K * K], x[K], z[K];
  int piv[K];
  int best = -1;
  auto t0 = std::chrono::steady_clock::now();
  for (long h = 0; h < hypotheses; h++) {
    for (int a = 0; a < K; a++) {  // 31 distinct random elements
      bool dup;
      do {
        idx[a] = pick(rng);
        dup = false;
        for (int b2 = 0; b2 < a; b2++) dup |= (idx[b2] == idx[a]);
      } while (dup);
    }
    // Normal matrix G = A^T A (upper triangle, mirrored).
    for (int i = 0; i < K; i++)
      for (int j = i; j < K; j++) {
        double s = 0.0;
        for (int a = 0; a < K; a++) {
          const double *f = &feat[idx[a] * K];
          s += f[i] * f[j];
        }
        g[i * K + j] = s;
        g[j * K + i] = s;
      }
    for (int i = 0; i < K * K; i++) lu[i] = g[i];
    lu_factor(lu, piv);
    // Inverse iteration from a fixed start: the spectral gap
    // (sigma_30/sigma_31)^2 is ~1e4+ per step, 3 steps converge.
    for (int i = 0; i < K; i++) x[i] = 1.0 / std::sqrt((double)K);
    for (int it = 0; it < 3; it++) {
      lu_solve(lu, piv, x, z);
      double nn = 0.0;
      for (int i = 0; i < K; i++) nn += z[i] * z[i];
      nn = 1.0 / std::sqrt(nn);
      for (int i = 0; i < K; i++) x[i] = z[i] * nn;
    }
    // Rescale so ||x[27:30]|| = 1 (the reference's R1-row-3 normalization).
    double dn = std::sqrt(x[27] * x[27] + x[28] * x[28] + x[29] * x[29]);
    if (dn < 1e-12 || !std::isfinite(dn)) continue;
    for (int i = 0; i < K; i++) x[i] /= dn;
    // Early-exit plane-distance vote (PlanePhantom...cxx:73-117).
    int count = 0;
    for (int i = 0; i < n; i++) {
      if (count + (n - i) <= best) break;  // reference early exit
      const double *f = &feat[i * K];
      double e = 0.0;
      for (int j = 0; j < K; j++) e += f[j] * x[j];
      if (e * e < delta_sq) count++;
    }
    if (count > best) best = count;
  }
  auto t1c = std::chrono::steady_clock::now();
  double secs = std::chrono::duration<double>(t1c - t0).count();
  std::printf("{\"hyp_per_s\": %.1f, \"best\": %d, \"n\": %d}\n",
              hypotheses / secs, best, n);
  return 0;
}
