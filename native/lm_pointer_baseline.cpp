// Serial single-threaded pointer-US-calibration LM baseline.
//
// The reference's iterative pointer calibration minimizes
// ||R2_i (u m_x r1 + v m_y r2 + t3) + t2_i - p_i||^2 over 8 parameters
// [t3(3), w_z, w_y, w_x, m_x, m_y] with vnl_levenberg_marquardt and an
// analytic Jacobian re-evaluated over ALL n observations every iteration
// (SinglePointTargetUSCalibrationParametersEstimator.cxx:916-973,
// residuals :1059-1149).  This baseline mirrors that per-iteration O(n)
// structure with favored micro-optimizations: residuals are pre-rotated
// (rho_i = A(x) z_i - y_i with y_i = R2^T (p - t2) precomputed once — a
// pure data transform), the analytic Jacobian is accumulated straight into
// the 8x8 normal equations, and the damped solve is an 8x8 Cholesky rather
// than vnl's QR.  Same damping schedule (Nielsen) and gtol stop as the TPU
// side (linalg/lm.py), so iteration counts are comparable.
//
// Workload: b independent problems, n observations each, known ground
// truth, 0.5 px image noise, start at truth + (1mm, 0.02 rad, 0.005 scale)
// perturbation.  Reports LM iterations/second (total over problems).
//
// This is original code (not copied from the reference); it exists to give
// bench.py --metric lm_pointer a compiled-C++ denominator.

#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>

struct Obs {
  double u, v;     // image point
  double y[3];     // R2^T (p - t2), precomputed
};

static void r12_and_derivs(const double w[3], double r1[3], double r2[3],
                           double d1[3][3], double d2[3][3]) {
  // w = [wz, wy, wx]; R = Rz Ry Rx.  d1[k] = dr1/dw_k, d2[k] = dr2/dw_k.
  double cz = std::cos(w[0]), sz = std::sin(w[0]);
  double cy = std::cos(w[1]), sy = std::sin(w[1]);
  double cx = std::cos(w[2]), sx = std::sin(w[2]);
  r1[0] = cz * cy; r1[1] = sz * cy; r1[2] = -sy;
  r2[0] = cz * sy * sx - sz * cx;
  r2[1] = sz * sy * sx + cz * cx;
  r2[2] = cy * sx;
  d1[0][0] = -sz * cy; d1[0][1] = cz * cy; d1[0][2] = 0.0;          // d/dwz
  d1[1][0] = -cz * sy; d1[1][1] = -sz * sy; d1[1][2] = -cy;         // d/dwy
  d1[2][0] = 0.0; d1[2][1] = 0.0; d1[2][2] = 0.0;                   // d/dwx
  d2[0][0] = -sz * sy * sx - cz * cx;
  d2[0][1] = cz * sy * sx - sz * cx;
  d2[0][2] = 0.0;
  d2[1][0] = cz * cy * sx; d2[1][1] = sz * cy * sx; d2[1][2] = -sy * sx;
  d2[2][0] = cz * sy * cx + sz * sx;
  d2[2][1] = sz * sy * cx - cz * sx;
  d2[2][2] = cy * cx;
}

static bool chol_solve8(const double a_in[8][8], const double b_in[8],
                        double x[8]) {
  double l[8][8] = {};
  for (int i = 0; i < 8; i++) {
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
  double y[8];
  for (int i = 0; i < 8; i++) {
    double s = b_in[i];
    for (int k = 0; k < i; k++) s -= l[i][k] * y[k];
    y[i] = s / l[i][i];
  }
  for (int i = 7; i >= 0; i--) {
    double s = y[i];
    for (int k = i + 1; k < 8; k++) s -= l[k][i] * x[k];
    x[i] = s / l[i][i];
  }
  return true;
}

static double cost_of(const std::vector<Obs> &obs, const double x[8]) {
  double r1[3], r2[3], d1[3][3], d2[3][3];
  r12_and_derivs(x + 3, r1, r2, d1, d2);
  double c = 0.0;
  for (const Obs &o : obs) {
    for (int a = 0; a < 3; a++) {
      double rho = o.u * x[6] * r1[a] + o.v * x[7] * r2[a] + x[a] - o.y[a];
      c += rho * rho;
    }
  }
  return 0.5 * c;
}

static int lm_pointer(const std::vector<Obs> &obs, double x[8],
                      int max_iters, double gtol) {
  double lam = 1e-3, nu = 2.0;
  const double max_lambda = 1e12;
  double cost = cost_of(obs, x);
  int it = 0;
  while (it < max_iters) {
    double r1[3], r2[3], d1[3][3], d2[3][3];
    r12_and_derivs(x + 3, r1, r2, d1, d2);
    double jtj[8][8] = {}, g[8] = {};
    for (const Obs &o : obs) {
      // Per observation: 3-component rotated residual + 8 Jacobian columns
      // (cols 0..2 are the identity; accumulated via closed form below).
      double col[8][3];
      for (int a = 0; a < 3; a++) {
        for (int k = 0; k < 3; k++)
          col[3 + k][a] = o.u * x[6] * d1[k][a] + o.v * x[7] * d2[k][a];
        col[6][a] = o.u * r1[a];
        col[7][a] = o.v * r2[a];
      }
      double rho[3];
      for (int a = 0; a < 3; a++)
        rho[a] = o.u * x[6] * r1[a] + o.v * x[7] * r2[a] + x[a] - o.y[a];
      // g and JtJ: identity columns contribute directly.
      for (int a = 0; a < 3; a++) g[a] += rho[a];
      for (int p = 3; p < 8; p++) {
        double gp = 0.0;
        for (int a = 0; a < 3; a++) gp += col[p][a] * rho[a];
        g[p] += gp;
        for (int a = 0; a < 3; a++) jtj[a][p] += col[p][a];  // I^T col
        for (int q = p; q < 8; q++) {
          double s = 0.0;
          for (int a = 0; a < 3; a++) s += col[p][a] * col[q][a];
          jtj[p][q] += s;
        }
      }
    }
    double m = (double)obs.size();
    for (int a = 0; a < 3; a++) jtj[a][a] += m;  // I^T I block
    for (int p = 0; p < 8; p++)
      for (int q = 0; q < p; q++) jtj[p][q] = jtj[q][p];

    double gnorm = 0.0;
    for (int p = 0; p < 8; p++) gnorm = std::max(gnorm, std::fabs(g[p]));

    double a_m[8][8], rhs[8], step[8];
    for (int p = 0; p < 8; p++) {
      for (int q = 0; q < 8; q++) a_m[p][q] = jtj[p][q];
      a_m[p][p] += lam * std::max(jtj[p][p], 2.2250738585072014e-308);
      rhs[p] = -g[p];
    }
    if (!chol_solve8(a_m, rhs, step)) {
      lam = std::min(lam * nu, max_lambda);
      nu *= 2.0;
      it++;
      if (lam >= max_lambda) break;
      continue;
    }

    double xn[8];
    for (int p = 0; p < 8; p++) xn[p] = x[p] + step[p];
    double cost_new = cost_of(obs, xn);

    double predicted = 0.0;
    for (int p = 0; p < 8; p++) {
      double js = 0.0;
      for (int q = 0; q < 8; q++) js += jtj[p][q] * step[q];
      predicted += -step[p] * g[p] - 0.5 * step[p] * js;
    }
    predicted = std::max(predicted, 2.2250738585072014e-308);
    double rho_gain = (cost - cost_new) / predicted;

    bool accept = std::isfinite(cost_new) && cost_new < cost;
    if (accept) {
      double shrink = 1.0 - std::pow(2.0 * rho_gain - 1.0, 3.0);
      lam = std::max(lam * std::max(1.0 / 3.0, shrink), 1e-18);
      nu = 2.0;
      for (int p = 0; p < 8; p++) x[p] = xn[p];
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

  std::mt19937_64 rng(777);
  std::uniform_real_distribution<double> uni01(0.0, 1.0);
  std::normal_distribution<double> gauss(0.0, 1.0);

  // Ground truth (matches the TPU bench data model).
  const double mx = 0.143, my = 0.139;
  const double w3[3] = {1.1, 0.4, -0.7};  // wz, wy, wx
  const double t3[3] = {20.0, -15.0, 40.0};
  double tr1[3], tr2[3], du[3][3], dv[3][3];
  r12_and_derivs(w3, tr1, tr2, du, dv);

  std::vector<std::vector<Obs>> problems(b);
  for (int p = 0; p < b; p++) {
    problems[p].resize(n);
    for (int i = 0; i < n; i++) {
      double u = 640.0 * uni01(rng), v = 480.0 * uni01(rng);
      // rho truth: y = A z exactly; add image noise to (u, v) afterwards so
      // residuals at the truth are ~0.5 px * scale.
      Obs &o = problems[p][i];
      for (int a = 0; a < 3; a++)
        o.y[a] = u * mx * tr1[a] + v * my * tr2[a] + t3[a];
      o.u = u + 0.5 * gauss(rng);
      o.v = v + 0.5 * gauss(rng);
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
      double x[8] = {t3[0] + 1.0, t3[1] + 1.0, t3[2] + 1.0,
                     w3[0] + 0.02, w3[1] + 0.02, w3[2] + 0.02,
                     mx + 0.005, my + 0.005};
      total_iters += lm_pointer(problems[p], x, 50, 1e-6);
      check += x[0];
    }
    std::chrono::duration<double> dt = std::chrono::steady_clock::now() - t0;
    best_elapsed = std::min(best_elapsed, dt.count());
  }

  double mean_t3x = check / b;
  if (std::fabs(mean_t3x - t3[0]) > 0.5) {
    std::fprintf(stderr, "LM did not converge: mean t3_x %f\n", mean_t3x);
    return 1;
  }
  std::printf(
      "{\"iters_per_s\": %.1f, \"total_iters\": %lld, \"mean_t3x\": %.4f}\n",
      total_iters / best_elapsed, total_iters, mean_t3x);
  return 0;
}
