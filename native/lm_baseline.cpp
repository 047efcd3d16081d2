// Serial single-threaded Levenberg-Marquardt baseline for benchmarking.
//
// The reference library's geometric sphere fit delegates to
// vnl_levenberg_marquardt (MINPACK lmder) with the analytic residual
// f_i = ||p_i - c|| - r and Jacobian row [-(p_i-c)/||p_i-c||, -1]
// (SphereParametersEstimator.hxx:310-338, :392-431).  VNL is not in this
// image, so this program re-creates the same damped-normal-equation LM the
// TPU side runs (linalg/lm.py: Marquardt diagonal scaling, Nielsen lambda
// schedule, gtol inf-norm stop) as a tight serial loop: per iteration one
// pass over the n points accumulates J^T J (4x4) and J^T r, then a 4x4
// Cholesky solve and the accept/reject update.  Same workload as bench.py
// --metric lm: b independent sphere problems, n points each, radius 25,
// sigma 0.3 noise, start at center+1 / r=23.  Compiled -O3 -march=native;
// reports LM iterations/second (accepted + rejected, summed over problems).
//
// This is original code (not copied from the reference); it exists to give
// bench.py --metric lm a compiled-C++ denominator.

#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>

static bool chol_solve4(const double a_in[4][4], const double b_in[4],
                        double x[4]) {
  double l[4][4] = {};
  for (int i = 0; i < 4; i++) {
    for (int j = 0; j <= i; j++) {
      double s = a_in[i][j];
      for (int k = 0; k < j; k++) s -= l[i][k] * l[j][k];
      if (i == j) {
        if (s <= 0.0) return false;
        l[i][i] = std::sqrt(s);
      } else {
        l[i][j] = s / l[j][j];
      }
    }
  }
  double y[4];
  for (int i = 0; i < 4; i++) {
    double s = b_in[i];
    for (int k = 0; k < i; k++) s -= l[i][k] * y[k];
    y[i] = s / l[i][i];
  }
  for (int i = 3; i >= 0; i--) {
    double s = y[i];
    for (int k = i + 1; k < 4; k++) s -= l[k][i] * x[k];
    x[i] = s / l[i][i];
  }
  return true;
}

// One LM solve; returns iterations taken (accepted + rejected).
static int lm_sphere(const std::vector<double> &pts, int n, double x[4],
                     int max_iters, double gtol) {
  double lam = 1e-3, nu = 2.0;
  const double max_lambda = 1e12;

  auto cost_of = [&](const double c[4]) {
    double s = 0.0;
    for (int i = 0; i < n; i++) {
      double dx = pts[3 * i] - c[0], dy = pts[3 * i + 1] - c[1],
             dz = pts[3 * i + 2] - c[2];
      double r = std::sqrt(dx * dx + dy * dy + dz * dz) - c[3];
      s += r * r;
    }
    return 0.5 * s;
  };

  double cost = cost_of(x);
  int it = 0;
  while (it < max_iters) {
    // Accumulate J^T J and g = J^T r in one pass (the hot loop).
    double jtj[4][4] = {}, g[4] = {};
    for (int i = 0; i < n; i++) {
      double dx = pts[3 * i] - x[0], dy = pts[3 * i + 1] - x[1],
             dz = pts[3 * i + 2] - x[2];
      double d = std::sqrt(dx * dx + dy * dy + dz * dz);
      double inv = 1.0 / d;
      double j0 = -dx * inv, j1 = -dy * inv, j2 = -dz * inv, j3 = -1.0;
      double r = d - x[3];
      double jr[4] = {j0, j1, j2, j3};
      for (int a = 0; a < 4; a++) {
        g[a] += jr[a] * r;
        for (int b = a; b < 4; b++) jtj[a][b] += jr[a] * jr[b];
      }
    }
    for (int a = 0; a < 4; a++)
      for (int b = 0; b < a; b++) jtj[a][b] = jtj[b][a];

    double gnorm = 0.0;
    for (int a = 0; a < 4; a++) gnorm = std::max(gnorm, std::fabs(g[a]));

    double a_m[4][4], rhs[4], step[4];
    for (int a = 0; a < 4; a++) {
      for (int b = 0; b < 4; b++) a_m[a][b] = jtj[a][b];
      double diag = std::max(jtj[a][a], 2.2250738585072014e-308);
      a_m[a][a] += lam * diag;
      rhs[a] = -g[a];
    }
    if (!chol_solve4(a_m, rhs, step)) {
      lam = std::min(lam * nu, max_lambda);
      nu *= 2.0;
      it++;
      if (lam >= max_lambda) break;
      continue;
    }

    double xn[4] = {x[0] + step[0], x[1] + step[1], x[2] + step[2],
                    x[3] + step[3]};
    double cost_new = cost_of(xn);

    double predicted = 0.0;
    for (int a = 0; a < 4; a++) {
      double js = 0.0;
      for (int b = 0; b < 4; b++) js += jtj[a][b] * step[b];
      predicted += -step[a] * g[a] - 0.5 * step[a] * js;
    }
    predicted = std::max(predicted, 2.2250738585072014e-308);
    double rho = (cost - cost_new) / predicted;

    bool accept = std::isfinite(cost_new) && cost_new < cost;
    if (accept) {
      double shrink = 1.0 - std::pow(2.0 * rho - 1.0, 3.0);
      lam = std::max(lam * std::max(1.0 / 3.0, shrink), 1e-18);
      nu = 2.0;
      for (int a = 0; a < 4; a++) x[a] = xn[a];
      cost = cost_new;
    } else {
      lam = std::min(lam * nu, max_lambda);
      nu *= 2.0;
    }
    it++;
    if (gnorm < gtol || lam >= max_lambda) break;
  }
  return it;
}

int main(int argc, char **argv) {
  int b = argc > 1 ? std::atoi(argv[1]) : 4096;
  int n = argc > 2 ? std::atoi(argv[2]) : 256;

  std::mt19937_64 rng(12345);
  std::uniform_real_distribution<double> uni(-50.0, 50.0);
  std::normal_distribution<double> gauss(0.0, 1.0);

  std::vector<std::vector<double>> problems(b);
  std::vector<double> centers(3 * b);
  for (int p = 0; p < b; p++) {
    double c[3] = {uni(rng), uni(rng), uni(rng)};
    for (int k = 0; k < 3; k++) centers[3 * p + k] = c[k];
    problems[p].resize(3 * n);
    for (int i = 0; i < n; i++) {
      double d[3] = {gauss(rng), gauss(rng), gauss(rng)};
      double norm = std::sqrt(d[0] * d[0] + d[1] * d[1] + d[2] * d[2]);
      for (int k = 0; k < 3; k++)
        problems[p][3 * i + k] = c[k] + 25.0 * d[k] / norm + 0.3 * gauss(rng);
    }
  }

  long long total_iters = 0;
  double best_elapsed = 1e300;
  double check = 0.0;
  for (int trial = 0; trial < 3; trial++) {
    total_iters = 0;
    check = 0.0;
    auto t0 = std::chrono::steady_clock::now();
    for (int p = 0; p < b; p++) {
      double x[4] = {centers[3 * p] + 1.0, centers[3 * p + 1] + 1.0,
                     centers[3 * p + 2] + 1.0, 23.0};
      total_iters += lm_sphere(problems[p], n, x, 30, 1e-6);
      check += x[3];
    }
    std::chrono::duration<double> dt = std::chrono::steady_clock::now() - t0;
    best_elapsed = std::min(best_elapsed, dt.count());
  }

  double mean_r = check / b;
  if (std::fabs(mean_r - 25.0) > 0.5) {
    std::fprintf(stderr, "LM did not converge: mean radius %f\n", mean_r);
    return 1;
  }
  std::printf("{\"iters_per_s\": %.1f, \"total_iters\": %lld, \"mean_r\": %.4f}\n",
              total_iters / best_elapsed, total_iters, mean_r);
  return 0;
}
