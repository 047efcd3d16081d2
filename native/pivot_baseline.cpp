// Serial single-threaded pivot-calibration RANSAC baseline.
//
// Mirrors the reference's probabilistic RANSAC engine (RANSAC.hxx:49-117)
// driving the pivot-calibration estimator
// (PivotCalibrationParametersEstimator.cxx:9-51,108-123): per hypothesis,
// draw 3 random distinct tracked frames, solve [R_i -I][t_D; t_W] = -t_i,
// then the vote loop ||R_i t_D + t_i - t_W|| < delta with the reference's
// early-exit optimization.  The reference solves the 9x6 system by SVD
// pseudo-inverse; hand-rolling an SVD here would be unfairly slow, so this
// baseline uses the same closed-form 3x3 Schur reduction the TPU kernel
// uses ((9I - S S^T) t_W = 3 sum t - S sum R^T t) — i.e. the baseline is
// FAVORED and the reported vs_baseline ratio is conservative.
//
// Original code (not copied from the reference); exists to give
// bench.py --metric pivot a compiled-C++ denominator.

#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>

struct Frame {
  double r[3][3];
  double t[3];
};

// Solve the 3-frame minimal system via the Schur reduction; false if the
// rotation set is degenerate (all rotations ~equal -> singular Schur).
static inline bool pivot_fit(const Frame *f[3], double td[3], double tw[3]) {
  double s[3][3] = {};  // sum R
  double u[3] = {};     // sum R^T t
  double v[3] = {};     // sum t
  for (int i = 0; i < 3; ++i) {
    for (int a = 0; a < 3; ++a) {
      v[a] += f[i]->t[a];
      for (int b = 0; b < 3; ++b) {
        s[a][b] += f[i]->r[a][b];
        u[b] += f[i]->r[a][b] * f[i]->t[a];
      }
    }
  }
  double n[3][3], rhs[3];
  for (int a = 0; a < 3; ++a) {
    for (int b = 0; b < 3; ++b) {
      double dot = s[a][0] * s[b][0] + s[a][1] * s[b][1] + s[a][2] * s[b][2];
      n[a][b] = (a == b ? 9.0 : 0.0) - dot;
    }
    rhs[a] = 3.0 * v[a] - (s[a][0] * u[0] + s[a][1] * u[1] + s[a][2] * u[2]);
  }
  double c00 = n[1][1] * n[2][2] - n[1][2] * n[2][1];
  double c01 = n[0][2] * n[2][1] - n[0][1] * n[2][2];
  double c02 = n[0][1] * n[1][2] - n[0][2] * n[1][1];
  double det = n[0][0] * c00 + n[1][0] * c01 + n[2][0] * c02;
  if (std::fabs(det) < 1e-6) return false;
  double c10 = n[1][2] * n[2][0] - n[1][0] * n[2][2];
  double c11 = n[0][0] * n[2][2] - n[0][2] * n[2][0];
  double c12 = n[0][2] * n[1][0] - n[0][0] * n[1][2];
  double c20 = n[1][0] * n[2][1] - n[1][1] * n[2][0];
  double c21 = n[0][1] * n[2][0] - n[0][0] * n[2][1];
  double c22 = n[0][0] * n[1][1] - n[0][1] * n[1][0];
  tw[0] = (c00 * rhs[0] + c01 * rhs[1] + c02 * rhs[2]) / det;
  tw[1] = (c10 * rhs[0] + c11 * rhs[1] + c12 * rhs[2]) / det;
  tw[2] = (c20 * rhs[0] + c21 * rhs[1] + c22 * rhs[2]) / det;
  for (int k = 0; k < 3; ++k)
    td[k] = (s[0][k] * tw[0] + s[1][k] * tw[1] + s[2][k] * tw[2] - u[k]) / 3.0;
  return true;
}

static void random_rotation(std::mt19937_64 &rng, double r[3][3]) {
  std::normal_distribution<double> nd(0.0, 1.0);
  double q[4];
  double norm = 0.0;
  for (double &c : q) {
    c = nd(rng);
    norm += c * c;
  }
  norm = std::sqrt(norm);
  for (double &c : q) c /= norm;
  double s = q[0], x = q[1], y = q[2], z = q[3];
  r[0][0] = 1 - 2 * (y * y + z * z);
  r[0][1] = 2 * (x * y - s * z);
  r[0][2] = 2 * (x * z + s * y);
  r[1][0] = 2 * (x * y + s * z);
  r[1][1] = 1 - 2 * (x * x + z * z);
  r[1][2] = 2 * (y * z - s * x);
  r[2][0] = 2 * (x * z - s * y);
  r[2][1] = 2 * (y * z + s * x);
  r[2][2] = 1 - 2 * (x * x + y * y);
}

int main(int argc, char **argv) {
  int n = argc > 1 ? std::atoi(argv[1]) : 1024;
  long hypotheses = argc > 2 ? std::atol(argv[2]) : 100000;
  double delta = 1.0, delta_sq = delta * delta;

  // Same data model as bench.py: tool pivoting about a fixed point, 20%
  // outlier poses.
  std::mt19937_64 rng(42);
  std::normal_distribution<double> noise(0.0, 0.05);
  std::uniform_real_distribution<double> uni(-200.0, 200.0);
  const double td_true[3] = {10.0, -5.0, 2.0};
  const double tw_true[3] = {100.0, 50.0, -30.0};
  std::vector<Frame> frames(n);
  int n_in = n * 4 / 5;
  for (int i = 0; i < n; ++i) {
    random_rotation(rng, frames[i].r);
    if (i < n_in) {
      for (int a = 0; a < 3; ++a) {
        double rt = frames[i].r[a][0] * td_true[0] +
                    frames[i].r[a][1] * td_true[1] +
                    frames[i].r[a][2] * td_true[2];
        frames[i].t[a] = tw_true[a] - rt + noise(rng);
      }
    } else {
      for (int a = 0; a < 3; ++a) frames[i].t[a] = uni(rng);
    }
  }

  std::uniform_int_distribution<int> pick(0, n - 1);
  int best = -1;
  double best_td[3] = {0, 0, 0}, best_tw[3] = {0, 0, 0};
  auto t0 = std::chrono::steady_clock::now();
  for (long h = 0; h < hypotheses; ++h) {
    int i0 = pick(rng), i1, i2;
    do { i1 = pick(rng); } while (i1 == i0);
    do { i2 = pick(rng); } while (i2 == i0 || i2 == i1);
    const Frame *sel[3] = {&frames[i0], &frames[i1], &frames[i2]};
    double td[3], tw[3];
    if (!pivot_fit(sel, td, tw)) continue;
    int votes = 0;
    for (int m = 0; m < n; ++m) {
      double d2 = 0.0;
      for (int a = 0; a < 3; ++a) {
        double e = frames[m].r[a][0] * td[0] + frames[m].r[a][1] * td[1] +
                   frames[m].r[a][2] * td[2] + frames[m].t[a] - tw[a];
        d2 += e * e;
      }
      votes += d2 < delta_sq;
      if (votes + (n - m - 1) <= best) break;  // RANSAC.hxx:94 early exit
    }
    if (votes > best) {
      best = votes;
      for (int a = 0; a < 3; ++a) { best_td[a] = td[a]; best_tw[a] = tw[a]; }
    }
  }
  auto t1 = std::chrono::steady_clock::now();
  double secs = std::chrono::duration<double>(t1 - t0).count();
  std::printf(
      "{\"hyp_per_s\": %.1f, \"best\": %d, \"td\": [%.3f, %.3f, %.3f], "
      "\"tw\": [%.3f, %.3f, %.3f]}\n",
      hypotheses / secs, best, best_td[0], best_td[1], best_td[2], best_tw[0],
      best_tw[1], best_tw[2]);
  return 0;
}
