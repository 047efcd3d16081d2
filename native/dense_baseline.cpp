// Serial single-threaded dense-linear-system RANSAC baseline (6 unknowns).
//
// Mirrors the reference's probabilistic RANSAC engine (RANSAC.hxx:49-117)
// driving the dense estimator on augmented rows [a | b]
// (DenseLinearEquationSystemParametersEstimator.hxx:16-49,111-119): per
// hypothesis, draw 6 random distinct rows, solve the square system via the
// normal equations with a 6x6 Cholesky (the reference's SVD would only be
// slower — the baseline is favored), then the vote loop |a.x - b| < delta
// with the reference's early-exit optimization.
//
// Original code (not copied from the reference); gives bench.py a
// compiled-C++ denominator for the dense workload.

#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>

static const int kU = 6;  // unknowns

// Cholesky solve of the 6x6 SPD system M x = v; false on tiny pivots.
static inline bool chol_solve(double m[kU][kU], const double v[kU],
                              double x[kU]) {
  double l[kU][kU];
  for (int i = 0; i < kU; ++i) {
    double s = m[i][i];
    for (int k = 0; k < i; ++k) s -= l[i][k] * l[i][k];
    if (s < 1e-12) return false;
    l[i][i] = std::sqrt(s);
    for (int j = i + 1; j < kU; ++j) {
      double t = m[i][j];
      for (int k = 0; k < i; ++k) t -= l[j][k] * l[i][k];
      l[j][i] = t / l[i][i];
    }
  }
  double y[kU];
  for (int i = 0; i < kU; ++i) {
    double t = v[i];
    for (int k = 0; k < i; ++k) t -= l[i][k] * y[k];
    y[i] = t / l[i][i];
  }
  for (int i = kU - 1; i >= 0; --i) {
    double t = y[i];
    for (int k = i + 1; k < kU; ++k) t -= l[k][i] * x[k];
    x[i] = t / l[i][i];
  }
  return true;
}

int main(int argc, char **argv) {
  int n = argc > 1 ? std::atoi(argv[1]) : 1024;
  long hypotheses = argc > 2 ? std::atol(argv[2]) : 100000;
  double delta = 1.0;

  // Same data model as bench.py / the tests: planted solution, 20% of the
  // rows get a positive b offset (outliers).
  std::mt19937_64 rng(42);
  std::uniform_real_distribution<double> ua(-10.0, 10.0);
  std::normal_distribution<double> noise(0.0, 0.05);
  std::uniform_real_distribution<double> uout(5.0, 50.0);
  const double x_true[kU] = {1.5, -2.0, 0.5, 3.0, -1.0, 2.5};
  std::vector<double> rows(n * (kU + 1));
  int n_in = n * 4 / 5;
  for (int i = 0; i < n; ++i) {
    double b = 0.0;
    for (int c = 0; c < kU; ++c) {
      double a = ua(rng);
      rows[i * (kU + 1) + c] = a;
      b += a * x_true[c];
    }
    b += noise(rng);
    if (i >= n_in) b += uout(rng);
    rows[i * (kU + 1) + kU] = b;
  }

  std::uniform_int_distribution<int> pick(0, n - 1);
  int best = -1;
  double best_x[kU] = {};
  auto t0 = std::chrono::steady_clock::now();
  for (long h = 0; h < hypotheses; ++h) {
    int idx[kU];
    for (int s = 0; s < kU; ++s) {
      bool dup;
      do {
        idx[s] = pick(rng);
        dup = false;
        for (int t = 0; t < s; ++t) dup |= idx[t] == idx[s];
      } while (dup);
    }
    double m[kU][kU] = {}, v[kU] = {};
    for (int s = 0; s < kU; ++s) {
      const double *r = &rows[idx[s] * (kU + 1)];
      for (int i = 0; i < kU; ++i) {
        for (int j = i; j < kU; ++j) m[i][j] += r[i] * r[j];
        v[i] += r[i] * r[kU];
      }
    }
    double x[kU];
    if (!chol_solve(m, v, x)) continue;
    int votes = 0;
    for (int r0 = 0; r0 < n; ++r0) {
      const double *r = &rows[r0 * (kU + 1)];
      double e = -r[kU];
      for (int c = 0; c < kU; ++c) e += r[c] * x[c];
      votes += std::fabs(e) < delta;
      if (votes + (n - r0 - 1) <= best) break;  // RANSAC.hxx:94 early exit
    }
    if (votes > best) {
      best = votes;
      for (int c = 0; c < kU; ++c) best_x[c] = x[c];
    }
  }
  auto t1 = std::chrono::steady_clock::now();
  double secs = std::chrono::duration<double>(t1 - t0).count();
  std::printf(
      "{\"hyp_per_s\": %.1f, \"best\": %d, \"x\": [%.3f, %.3f, %.3f, %.3f, "
      "%.3f, %.3f]}\n",
      hypotheses / secs, best, best_x[0], best_x[1], best_x[2], best_x[3],
      best_x[4], best_x[5]);
  return 0;
}
