// qpref — double-precision OSQP-style ADMM QP reference oracle.
//
// The reference validates its SQP numerics against multiple native QP
// backends (trajopt_sco/test/small-problems-unit.cpp parameterized over
// availableSolvers()).  This library plays that role for the TPU build: an
// independent, host-side, double-precision implementation of the same ADMM
// algorithm (Stellato et al.) used to cross-check the on-device solvers.
//
//   minimize   0.5 x'Px + q'x   subject to  l <= Ax <= u
//
// Dense, dependency-free (own Cholesky), C ABI for ctypes.
//
// Build: g++ -O2 -shared -fPIC -o libqpref.so qpref.cpp

#include <cmath>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

constexpr double kInf = 1e20;

// Cholesky factorization (lower) of SPD matrix in place; returns 0 on success.
int cholesky(std::vector<double>& M, int n) {
  for (int j = 0; j < n; ++j) {
    double d = M[j * n + j];
    for (int k = 0; k < j; ++k) d -= M[j * n + k] * M[j * n + k];
    if (d <= 0.0) return 1;
    const double s = std::sqrt(d);
    M[j * n + j] = s;
    for (int i = j + 1; i < n; ++i) {
      double v = M[i * n + j];
      for (int k = 0; k < j; ++k) v -= M[i * n + k] * M[j * n + k];
      M[i * n + j] = v / s;
    }
  }
  return 0;
}

void cho_solve(const std::vector<double>& L, int n, double* b) {
  for (int i = 0; i < n; ++i) {
    double v = b[i];
    for (int k = 0; k < i; ++k) v -= L[i * n + k] * b[k];
    b[i] = v / L[i * n + i];
  }
  for (int i = n - 1; i >= 0; --i) {
    double v = b[i];
    for (int k = i + 1; k < n; ++k) v -= L[k * n + i] * b[k];
    b[i] = v / L[i * n + i];
  }
}

double inf_norm(const double* v, int n) {
  double m = 0.0;
  for (int i = 0; i < n; ++i) m = std::max(m, std::fabs(v[i]));
  return m;
}

}  // namespace

extern "C" {

// Returns: 1 solved, 2 solved-inaccurate, 3 max-iter, -1 factorization error.
// Internally Ruiz-equilibrates (10 iterations) like OSQP; residual tests are
// on unscaled quantities via the stored diagonal scalings.
int qpref_solve(int n, int m, const double* P_in, const double* q_in,
                const double* A_in, const double* l_in, const double* u_in,
                double eps_abs, double eps_rel, int max_iter, double* x_out,
                double* y_out, int* iters_out) {
  // ---- Ruiz equilibration ----
  std::vector<double> Ps(P_in, P_in + static_cast<size_t>(n) * n);
  std::vector<double> qs(q_in, q_in + n);
  std::vector<double> As(A_in, A_in + static_cast<size_t>(m) * n);
  std::vector<double> ls(l_in, l_in + m), us(u_in, u_in + m);
  std::vector<double> D(n, 1.0), E(m, 1.0);
  double c = 1.0;
  for (int pass = 0; pass < 10; ++pass) {
    for (int j = 0; j < n; ++j) {
      double nx = 0.0;
      for (int i = 0; i < n; ++i) nx = std::max(nx, std::fabs(Ps[i * n + j]));
      for (int r = 0; r < m; ++r) nx = std::max(nx, std::fabs(As[r * n + j]));
      const double g = nx > 1e-12 ? 1.0 / std::sqrt(nx) : 1.0;
      for (int i = 0; i < n; ++i) {
        Ps[i * n + j] *= g;
        Ps[j * n + i] *= g;
      }
      for (int r = 0; r < m; ++r) As[r * n + j] *= g;
      qs[j] *= g;
      D[j] *= g;
    }
    for (int r = 0; r < m; ++r) {
      double nz = 0.0;
      for (int j = 0; j < n; ++j) nz = std::max(nz, std::fabs(As[r * n + j]));
      const double g = nz > 1e-12 ? 1.0 / std::sqrt(nz) : 1.0;
      for (int j = 0; j < n; ++j) As[r * n + j] *= g;
      ls[r] *= g;
      us[r] *= g;
      E[r] *= g;
    }
    double pc = 0.0, qn = 0.0;
    for (int j = 0; j < n; ++j) {
      double colmax = 0.0;
      for (int i = 0; i < n; ++i)
        colmax = std::max(colmax, std::fabs(Ps[i * n + j]));
      pc += colmax;
      qn = std::max(qn, std::fabs(qs[j]));
    }
    pc /= n;
    const double denom = std::max(pc, qn);
    const double gamma = denom > 1e-12 ? 1.0 / denom : 1.0;
    for (auto& v : Ps) v *= gamma;
    for (auto& v : qs) v *= gamma;
    c *= gamma;
  }
  for (int r = 0; r < m; ++r) {
    ls[r] = std::min(std::max(ls[r], -kInf), kInf);
    us[r] = std::min(std::max(us[r], -kInf), kInf);
  }
  const double* P = Ps.data();
  const double* q = qs.data();
  const double* A = As.data();
  const double* l = ls.data();
  const double* u = us.data();
  const double sigma = 1e-6, alpha = 1.6;
  double rho = 0.1;
  std::vector<double> rho_vec(m);
  auto set_rho = [&](double r) {
    for (int i = 0; i < m; ++i) {
      const bool eq = (u[i] - l[i]) < 1e-9;
      const bool loose = l[i] <= -0.9 * kInf && u[i] >= 0.9 * kInf;
      rho_vec[i] = eq ? r * 1e3 : (loose ? r * 0.1 : r);
      rho_vec[i] = std::min(std::max(rho_vec[i], 1e-6), 1e6);
    }
  };

  std::vector<double> K(static_cast<size_t>(n) * n);
  auto factorize = [&]() -> int {
    for (int i = 0; i < n; ++i)
      for (int j = 0; j < n; ++j)
        K[i * n + j] = P[i * n + j] + (i == j ? sigma : 0.0);
    for (int r = 0; r < m; ++r)
      for (int i = 0; i < n; ++i) {
        const double ari = A[r * n + i] * rho_vec[r];
        if (ari == 0.0) continue;
        for (int j = 0; j < n; ++j) K[i * n + j] += ari * A[r * n + j];
      }
    return cholesky(K, n);
  };

  set_rho(rho);
  if (factorize()) return -1;

  std::vector<double> x(n, 0.0), z(m, 0.0), y(m, 0.0);
  std::vector<double> rhs(n), Ax(m), zc(m), xt(n), zt(m), Aty(n), Px(n);

  auto a_mul = [&](const std::vector<double>& v, std::vector<double>& out) {
    for (int r = 0; r < m; ++r) {
      double s = 0.0;
      for (int j = 0; j < n; ++j) s += A[r * n + j] * v[j];
      out[r] = s;
    }
  };

  a_mul(x, Ax);
  for (int r = 0; r < m; ++r) z[r] = std::min(std::max(Ax[r], l[r]), u[r]);

  int it = 0;
  int status = 3;
  for (; it < max_iter; ++it) {
    // x-update
    for (int j = 0; j < n; ++j) rhs[j] = sigma * x[j] - q[j];
    for (int r = 0; r < m; ++r) {
      const double t = rho_vec[r] * z[r] - y[r];
      for (int j = 0; j < n; ++j) rhs[j] += A[r * n + j] * t;
    }
    xt = rhs;
    cho_solve(K, n, xt.data());
    a_mul(xt, zt);
    for (int j = 0; j < n; ++j) x[j] = alpha * xt[j] + (1 - alpha) * x[j];
    for (int r = 0; r < m; ++r) {
      const double cand = alpha * zt[r] + (1 - alpha) * z[r];
      const double znew = std::min(std::max(cand + y[r] / rho_vec[r], l[r]), u[r]);
      y[r] += rho_vec[r] * (cand - znew);
      z[r] = znew;
    }

    if ((it + 1) % 25 == 0) {
      a_mul(x, Ax);
      double rp = 0.0;
      for (int r = 0; r < m; ++r) rp = std::max(rp, std::fabs(Ax[r] - z[r]));
      for (int j = 0; j < n; ++j) {
        double s = q[j];
        for (int k = 0; k < n; ++k) s += P[j * n + k] * x[k];
        Px[j] = s - q[j];
        Aty[j] = s;  // temporarily Px + q
      }
      for (int r = 0; r < m; ++r)
        for (int j = 0; j < n; ++j) Aty[j] += A[r * n + j] * y[r];
      const double rd = inf_norm(Aty.data(), n);
      const double ep = eps_abs + eps_rel * std::max(inf_norm(Ax.data(), m),
                                                     inf_norm(z.data(), m));
      std::vector<double> aty_only(n, 0.0);
      for (int r = 0; r < m; ++r)
        for (int j = 0; j < n; ++j) aty_only[j] += A[r * n + j] * y[r];
      double scale = std::max(inf_norm(Px.data(), n),
                              std::max(inf_norm(q, n),
                                       inf_norm(aty_only.data(), n)));
      const double ed = eps_abs + eps_rel * scale;
      if (rp <= ep && rd <= ed) {
        status = 1;
        ++it;
        break;
      }
      // adaptive rho every 100 iterations
      if ((it + 1) % 100 == 0) {
        const double nrp =
            rp / std::max(std::max(inf_norm(Ax.data(), m),
                                   inf_norm(z.data(), m)), 1e-12);
        const double nrd = rd / std::max(scale, 1e-12);
        const double rho_new = std::min(
            std::max(rho * std::sqrt(nrp / std::max(nrd, 1e-12)), 1e-6), 1e6);
        if (rho_new > 5 * rho || rho_new < rho / 5) {
          rho = rho_new;
          set_rho(rho);
          if (factorize()) return -1;
        }
      }
    }
  }
  // unscale: x = D x^, y = E y^ / c   (scaled termination, OSQP-style)
  for (int j = 0; j < n; ++j) x_out[j] = D[j] * x[j];
  for (int r = 0; r < m; ++r) y_out[r] = E[r] * y[r] / c;
  *iters_out = it;
  return status;
}
}
