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
  // Equal-radius linear system: row_i = p0 - p_i, rhs_i = row_i . (p0 + p_i);
  // center = adj(M) rhs / (2 det M) via cofactor expansion over index loops.
  const double kSphereEps = 1e-9;  // SphereParametersEstimator.hxx:11
  double q[4][3] = {{p[0]->x, p[0]->y, p[0]->z},
                    {p[1]->x, p[1]->y, p[1]->z},
                    {p[2]->x, p[2]->y, p[2]->z},
                    {p[3]->x, p[3]->y, p[3]->z}};
  double m[3][3], rhs[3];
  for (int i = 0; i < 3; i++) {
    rhs[i] = 0.0;
    for (int c = 0; c < 3; c++) {
      m[i][c] = q[0][c] - q[i + 1][c];
      rhs[i] += m[i][c] * (q[0][c] + q[i + 1][c]);
    }
  }
  double adj[3][3];  // adj[i][j] = cofactor(j, i)
  for (int i = 0; i < 3; i++) {
    for (int j = 0; j < 3; j++) {
      int r1 = (j + 1) % 3, r2 = (j + 2) % 3;
      int c1 = (i + 1) % 3, c2 = (i + 2) % 3;
      adj[i][j] = m[r1][c1] * m[r2][c2] - m[r1][c2] * m[r2][c1];
    }
  }
  double det = m[0][0] * adj[0][0] + m[0][1] * adj[1][0] + m[0][2] * adj[2][0];
  if (std::fabs(det) < kSphereEps) return false;
  det *= 2.0;

  double rr = 0.0;
  for (int i = 0; i < 3; i++) {
    out[i] = (adj[i][0] * rhs[0] + adj[i][1] * rhs[1] + adj[i][2] * rhs[2]) / det;
    double d = q[0][i] - out[i];
    rr += d * d;
  }
  out[3] = std::sqrt(rr);
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
