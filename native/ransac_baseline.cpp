// Serial single-threaded RANSAC baseline for benchmarking.
//
// The reference library (LSQRRecipes) cannot be compiled here (its VNL
// dependency is not in the image), so this program re-creates the exact
// algorithmic structure of its probabilistic RANSAC engine (RANSAC.hxx:49-117)
// for the 3D sphere estimator on the same workload the TPU benchmark uses:
// per hypothesis, draw a random minimal subset of 4 points, closed-form
// Cramer circumsphere fit (SphereParametersEstimator.hxx:115-163), then the
// vote loop over all n points with the reference's early-exit optimization
// (RANSAC.hxx:94-99).  Compiled -O3 -march=native; reports hypotheses/second.
//
// This is original code (not copied from the reference); it exists to give
// bench.py's "vs_baseline" a compiled-C++ denominator.

#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>

struct P3 {
  double x, y, z;
};

static inline bool circumsphere(const P3 *p[4], double out[4]) {
  const double kSphereEps = 1e-9;  // SphereParametersEstimator.hxx:11
  double a00 = p[0]->x - p[1]->x, a01 = p[0]->y - p[1]->y, a02 = p[0]->z - p[1]->z;
  double a10 = p[0]->x - p[2]->x, a11 = p[0]->y - p[2]->y, a12 = p[0]->z - p[2]->z;
  double a20 = p[0]->x - p[3]->x, a21 = p[0]->y - p[3]->y, a22 = p[0]->z - p[3]->z;

  double c00 = a11 * a22 - a12 * a21;
  double c10 = a12 * a20 - a10 * a22;
  double c20 = a10 * a21 - a11 * a20;
  double det = a00 * c00 + a01 * c10 + a02 * c20;
  if (std::fabs(det) < kSphereEps) return false;
  det *= 2.0;

  double c01 = a02 * a21 - a01 * a22;
  double c11 = a00 * a22 - a02 * a20;
  double c21 = a01 * a20 - a00 * a21;
  double c02 = a01 * a12 - a02 * a11;
  double c12 = a02 * a10 - a00 * a12;
  double c22 = a00 * a11 - a01 * a10;

  double b0 = a00 * (p[0]->x + p[1]->x) + a01 * (p[0]->y + p[1]->y) + a02 * (p[0]->z + p[1]->z);
  double b1 = a10 * (p[0]->x + p[2]->x) + a11 * (p[0]->y + p[2]->y) + a12 * (p[0]->z + p[2]->z);
  double b2 = a20 * (p[0]->x + p[3]->x) + a21 * (p[0]->y + p[3]->y) + a22 * (p[0]->z + p[3]->z);

  out[0] = (c00 * b0 + c01 * b1 + c02 * b2) / det;
  out[1] = (c10 * b0 + c11 * b1 + c12 * b2) / det;
  out[2] = (c20 * b0 + c21 * b1 + c22 * b2) / det;
  double dx = p[0]->x - out[0], dy = p[0]->y - out[1], dz = p[0]->z - out[2];
  out[3] = std::sqrt(dx * dx + dy * dy + dz * dz);
  return true;
}

int main(int argc, char **argv) {
  int n = argc > 1 ? std::atoi(argv[1]) : 1024;
  long hypotheses = argc > 2 ? std::atol(argv[2]) : 200000;
  double delta = 1.0;

  std::mt19937_64 rng(42);
  std::normal_distribution<double> gauss(0.0, 1.0);
  std::uniform_real_distribution<double> uni(0.0, 1.0);

  // 80% inliers on a sphere (center 5,-2,11 r=25, sigma 0.3), 20% outliers.
  std::vector<P3> pts(n);
  for (int i = 0; i < n; i++) {
    if (i % 5 != 4) {
      double gx = gauss(rng), gy = gauss(rng), gz = gauss(rng);
      double norm = std::sqrt(gx * gx + gy * gy + gz * gz);
      pts[i] = {5.0 + 25.0 * gx / norm + 0.3 * gauss(rng),
                -2.0 + 25.0 * gy / norm + 0.3 * gauss(rng),
                11.0 + 25.0 * gz / norm + 0.3 * gauss(rng)};
    } else {
      pts[i] = {80.0 * (uni(rng) - 0.5), 80.0 * (uni(rng) - 0.5),
                80.0 * (uni(rng) - 0.5)};
    }
  }

  auto start = std::chrono::steady_clock::now();
  long best = -1;
  double best_params[4] = {0, 0, 0, 0};
  for (long h = 0; h < hypotheses; h++) {
    // Random minimal subset (with-replacement retry, negligible cost).
    int idx[4];
    for (int j = 0; j < 4;) {
      int cand = (int)(uni(rng) * n);
      if (cand >= n) cand = n - 1;
      bool dup = false;
      for (int k = 0; k < j; k++) dup |= (idx[k] == cand);
      if (!dup) idx[j++] = cand;
    }
    const P3 *sample[4] = {&pts[idx[0]], &pts[idx[1]], &pts[idx[2]], &pts[idx[3]]};
    double params[4];
    if (!circumsphere(sample, params)) continue;
    // Vote with the reference's early-exit (RANSAC.hxx:94).
    long votes = 0;
    for (int m = 0; m < n && (long)(best - votes) < (long)(n - m + 1); m++) {
      double dx = pts[m].x - params[0], dy = pts[m].y - params[1],
             dz = pts[m].z - params[2];
      double d = std::fabs(std::sqrt(dx * dx + dy * dy + dz * dz) - params[3]);
      votes += (d < delta);
    }
    if (votes > best) {
      best = votes;
      for (int k = 0; k < 4; k++) best_params[k] = params[k];
    }
  }
  auto end = std::chrono::steady_clock::now();
  double secs = std::chrono::duration<double>(end - start).count();

  std::printf("{\"hypotheses\": %ld, \"seconds\": %.6f, \"hyp_per_s\": %.1f, "
              "\"best_votes\": %ld, \"center\": [%.3f, %.3f, %.3f], \"r\": %.3f}\n",
              hypotheses, secs, hypotheses / secs, best, best_params[0],
              best_params[1], best_params[2], best_params[3]);
  return 0;
}
