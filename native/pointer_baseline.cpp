// Serial single-threaded calibrated-pointer-US-calibration RANSAC baseline.
//
// Stand-in for the reference's RANSAC over
// CalibratedPointerTargetUSCalibrationParametersEstimator
// (RANSAC.hxx:49-117 driving SinglePointTarget...cxx:763-914 /
// :1059-1149): per hypothesis, draw 3 random elements, solve the minimal
// square 9x9 system [u R2 | v R2 | R2] x = p - t2, orthonormalize the two
// scaled rotation columns, and vote
// ||R2 (u c1 + v c2 + t3) + t2 - p||^2 < delta^2 over all n elements with
// the reference's early-exit optimization.
//
// Deliberately favored vs the reference: the 9x9 solve uses
// normal-equation Cholesky (not the reference's SVD pseudo-inverse) and
// the orthonormalization a Newton polar iteration (not SVD), so the
// reported baseline hyp/s is an upper bound on what the reference engine
// would do.  Original code (the reference needs VNL and cannot be
// compiled here); exists to give bench.py --metric pointer a compiled-C++
// denominator.
//
// Usage: pointer_baseline [n_elements] [hypotheses]; prints
// {"hyp_per_s": ...}.

#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>

struct Elem {
  double r[3][3];   // R2 (probe pose rotation)
  double t[3];      // t2 (probe pose translation)
  double u, v;      // image point of the pointer tip
  double p[3];      // tracked pointer-tip position (tracker frame)
};

static void euler_zyx(double wz, double wy, double wx, double r[3][3]) {
  double cz = std::cos(wz), sz = std::sin(wz);
  double cy = std::cos(wy), sy = std::sin(wy);
  double cx = std::cos(wx), sx = std::sin(wx);
  r[0][0] = cz * cy; r[0][1] = cz * sy * sx - sz * cx; r[0][2] = cz * sy * cx + sz * sx;
  r[1][0] = sz * cy; r[1][1] = sz * sy * sx + cz * cx; r[1][2] = sz * sy * cx - cz * sx;
  r[2][0] = -sy;     r[2][1] = cy * sx;                r[2][2] = cy * cx;
}

// Cholesky solve of SPD m x = b (n x n, in place on copies).
static bool chol_solve(int n, double *m, double *b, double *x) {
  std::vector<double> l(n * n, 0.0);
  for (int j = 0; j < n; j++) {
    double s = m[j * n + j];
    for (int k = 0; k < j; k++) s -= l[j * n + k] * l[j * n + k];
    if (s < 1e-12) return false;
    double ljj = std::sqrt(s);
    l[j * n + j] = ljj;
    for (int i = j + 1; i < n; i++) {
      double t = m[i * n + j];
      for (int k = 0; k < j; k++) t -= l[i * n + k] * l[j * n + k];
      l[i * n + j] = t / ljj;
    }
  }
  std::vector<double> y(n);
  for (int i = 0; i < n; i++) {
    double t = b[i];
    for (int k = 0; k < i; k++) t -= l[i * n + k] * y[k];
    y[i] = t / l[i * n + i];
  }
  for (int i = n - 1; i >= 0; i--) {
    double t = y[i];
    for (int k = i + 1; k < n; k++) t -= l[k * n + i] * x[k];
    x[i] = t / l[i * n + i];
  }
  return true;
}

static void mat3_cof(const double x[3][3], double c[3][3]) {
  for (int i = 0; i < 3; i++) {
    int i1 = (i + 1) % 3, i2 = (i + 2) % 3;
    for (int j = 0; j < 3; j++) {
      int j1 = (j + 1) % 3, j2 = (j + 2) % 3;
      c[i][j] = x[i1][j1] * x[i2][j2] - x[i1][j2] * x[i2][j1];
    }
  }
}

// Closest rotation via Newton polar iteration X <- (X + X^-T)/2.
static bool polar3(double x[3][3]) {
  for (int it = 0; it < 5; it++) {
    double c[3][3];
    mat3_cof(x, c);
    double det = x[0][0] * c[0][0] + x[0][1] * c[0][1] + x[0][2] * c[0][2];
    if (std::fabs(det) < 1e-12) return false;
    for (int i = 0; i < 3; i++)
      for (int j = 0; j < 3; j++) x[i][j] = 0.5 * (x[i][j] + c[i][j] / det);
  }
  return true;
}

// Minimal pointer fit from 3 elements -> vote params c1, c2, t3.
static bool minimal_fit(const Elem *e[3], double c1[3], double c2[3],
                        double t3[3]) {
  // Rows: for element a, component j: [u R2[j,:], v R2[j,:], R2[j,:]],
  // rhs p[j] - t2[j].
  double A[9][9], b[9];
  for (int a = 0; a < 3; a++) {
    for (int j = 0; j < 3; j++) {
      int row = 3 * a + j;
      for (int k = 0; k < 3; k++) {
        A[row][k] = e[a]->u * e[a]->r[j][k];
        A[row][3 + k] = e[a]->v * e[a]->r[j][k];
        A[row][6 + k] = e[a]->r[j][k];
      }
      b[row] = e[a]->p[j] - e[a]->t[j];
    }
  }
  double ata[81], atb[9], x[9];
  for (int i = 0; i < 9; i++) {
    atb[i] = 0.0;
    for (int j = 0; j < 9; j++) {
      double s = 0.0;
      for (int r = 0; r < 9; r++) s += A[r][i] * A[r][j];
      ata[i * 9 + j] = s;
    }
    for (int r = 0; r < 9; r++) atb[i] += A[r][i] * b[r];
  }
  if (!chol_solve(9, ata, atb, x)) return false;

  double mx = std::sqrt(x[0] * x[0] + x[1] * x[1] + x[2] * x[2]);
  double my = std::sqrt(x[3] * x[3] + x[4] * x[4] + x[5] * x[5]);
  if (mx < 1e-12 || my < 1e-12) return false;
  double raw[3][3];
  for (int i = 0; i < 3; i++) {
    raw[i][0] = x[i] / mx;
    raw[i][1] = x[3 + i] / my;
  }
  raw[0][2] = raw[1][0] * raw[2][1] - raw[2][0] * raw[1][1];
  raw[1][2] = raw[2][0] * raw[0][1] - raw[0][0] * raw[2][1];
  raw[2][2] = raw[0][0] * raw[1][1] - raw[1][0] * raw[0][1];
  if (!polar3(raw)) return false;
  for (int i = 0; i < 3; i++) {
    c1[i] = mx * raw[i][0];
    c2[i] = my * raw[i][1];
    t3[i] = x[6 + i];
  }
  return true;
}

int main(int argc, char **argv) {
  int n = argc > 1 ? std::atoi(argv[1]) : 1024;
  long hypotheses = argc > 2 ? std::atol(argv[2]) : 100000;
  double delta = 3.0, delta_sq = delta * delta;

  std::mt19937_64 rng(42);
  std::uniform_real_distribution<double> uni(0.0, 1.0);
  std::normal_distribution<double> gauss(0.0, 1.0);

  // Ground truth calibration (same model as the TPU bench workload).
  double r3[3][3];
  euler_zyx(1.1, 0.4, -0.7, r3);
  const double mx = 0.143, my = 0.139;
  double t3[3] = {20.0, -15.0, 40.0};

  std::vector<Elem> data(n);
  for (int i = 0; i < n; i++) {
    Elem &e = data[i];
    euler_zyx(uni(rng) * M_PI, uni(rng) * M_PI, uni(rng) * M_PI, e.r);
    e.u = uni(rng) * 640.0;
    e.v = uni(rng) * 480.0;
    for (int j = 0; j < 3; j++) e.t[j] = 200.0 * (uni(rng) - 0.5);
    double img[3];
    for (int j = 0; j < 3; j++)
      img[j] = e.u * mx * r3[j][0] + e.v * my * r3[j][1] + t3[j];
    for (int j = 0; j < 3; j++) {
      double m = 0.0;
      for (int k = 0; k < 3; k++) m += e.r[j][k] * img[k];
      e.p[j] = e.t[j] + m;
    }
    if (i % 5 == 4) {  // 20% outliers: corrupted tip positions
      for (int j = 0; j < 3; j++)
        e.p[j] += (30.0 + 50.0 * uni(rng)) * (uni(rng) < 0.5 ? -1.0 : 1.0);
    } else {           // inliers: 0.5 px image noise
      e.u += 0.5 * gauss(rng);
      e.v += 0.5 * gauss(rng);
    }
  }

  std::uniform_int_distribution<int> pick(0, n - 1);
  int best = -1;
  auto t0 = std::chrono::steady_clock::now();
  for (long h = 0; h < hypotheses; h++) {
    const Elem *s[3];
    int idx[3];
    for (int a = 0; a < 3; a++) {
      bool dup;
      do {
        idx[a] = pick(rng);
        dup = false;
        for (int b2 = 0; b2 < a; b2++) dup |= (idx[b2] == idx[a]);
      } while (dup);
      s[a] = &data[idx[a]];
    }
    double c1[3], c2[3], tt3[3];
    if (!minimal_fit(s, c1, c2, tt3)) continue;
    int count = 0;
    for (int i = 0; i < n; i++) {
      if (count + (n - i) <= best) break;  // reference early exit
      const Elem &e = data[i];
      double d2 = 0.0;
      for (int j = 0; j < 3; j++) {
        double img = 0.0;
        for (int k = 0; k < 3; k++)
          img += e.r[j][k] * (e.u * c1[k] + e.v * c2[k] + tt3[k]);
        double err = img + e.t[j] - e.p[j];
        d2 += err * err;
      }
      if (d2 < delta_sq) count++;
    }
    if (count > best) best = count;
  }
  auto t1c = std::chrono::steady_clock::now();
  double secs = std::chrono::duration<double>(t1c - t0).count();
  std::printf("{\"hyp_per_s\": %.1f, \"best\": %d, \"n\": %d}\n",
              hypotheses / secs, best, n);
  return 0;
}
