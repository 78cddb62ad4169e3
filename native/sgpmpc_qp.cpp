// Native dense QP solver with soft-constraint slack elimination.
//
// C++ twin of sampling_gpmpc_tpu/ocp/qp.py::solve_qp_soft — the same
// structured primal-dual interior-point method (Mehrotra predictor-
// corrector, HPIPM-style analytic slack elimination, row equilibration,
// Jacobi-preconditioned Schur solves).  Serves as the host-side runtime
// executor / cross-validation oracle for the XLA solver, playing the role
// HPIPM's C kernels play for the reference (ref: src/utils/ocp.py:302).
//
// Build:  g++ -O3 -march=native -shared -fPIC -o libsgpmpc_qp.so sgpmpc_qp.cpp
//
// Exported C API (all row-major double arrays):
//   int sgpmpc_solve_qp_soft(
//       int nU, int mh, int ms,
//       const double* H, const double* g,
//       const double* Gh, const double* dh,
//       const double* Gs, const double* lo, const double* hi,
//       const double* zl, const double* zu,
//       const double* Zl, const double* Zu,
//       double tol, int max_iter,
//       double* u_out, double* gap_out, int* iters_out);
//   returns 0 on convergence, 4 otherwise.

#include <cmath>
#include <cstring>
#include <vector>

namespace {

using std::vector;

// dense Cholesky factorization (in place, lower), returns false on failure
bool cholesky(vector<double>& A, int n) {
  for (int j = 0; j < n; ++j) {
    double d = A[j * n + j];
    for (int k = 0; k < j; ++k) d -= A[j * n + k] * A[j * n + k];
    if (d <= 0.0 || !std::isfinite(d)) return false;
    const double lj = std::sqrt(d);
    A[j * n + j] = lj;
    for (int i = j + 1; i < n; ++i) {
      double s = A[i * n + j];
      for (int k = 0; k < j; ++k) s -= A[i * n + k] * A[j * n + k];
      A[i * n + j] = s / lj;
    }
  }
  return true;
}

void cho_solve(const vector<double>& L, int n, vector<double>& x) {
  for (int i = 0; i < n; ++i) {
    double s = x[i];
    for (int k = 0; k < i; ++k) s -= L[i * n + k] * x[k];
    x[i] = s / L[i * n + i];
  }
  for (int i = n - 1; i >= 0; --i) {
    double s = x[i];
    for (int k = i + 1; k < n; ++k) s -= L[k * n + i] * x[k];
    x[i] = s / L[i * n + i];
  }
}

struct Rows {
  int m = 0, n = 0;
  const double* G = nullptr;  // (m, n) row-major

  void matvec(const double* x, double* y) const {        // y = G x
    for (int i = 0; i < m; ++i) {
      double s = 0;
      const double* gi = G + (size_t)i * n;
      for (int j = 0; j < n; ++j) s += gi[j] * x[j];
      y[i] = s;
    }
  }
  void tmatvec(const double* w, double* y) const {       // y += G' w
    for (int i = 0; i < m; ++i) {
      const double* gi = G + (size_t)i * n;
      const double wi = w[i];
      for (int j = 0; j < n; ++j) y[j] += gi[j] * wi;
    }
  }
  // M += G' diag(w) G  (lower triangle enough, but fill full)
  void add_weighted_gram(const double* w, double* M) const {
    for (int i = 0; i < m; ++i) {
      const double* gi = G + (size_t)i * n;
      const double wi = w[i];
      for (int a = 0; a < n; ++a) {
        const double wa = wi * gi[a];
        double* Ma = M + (size_t)a * n;
        for (int b = 0; b < n; ++b) Ma[b] += wa * gi[b];
      }
    }
  }
};

double max_step(const vector<double>& v, const vector<double>& dv) {
  double a = 1.0;
  for (size_t i = 0; i < v.size(); ++i)
    if (dv[i] < 0) a = std::min(a, -v[i] / dv[i]);
  return 0.99 * a;
}

}  // namespace

extern "C" int sgpmpc_solve_qp_soft(
    int nU, int mh, int ms, const double* H_in, const double* g_in,
    const double* Gh_in, const double* dh_in, const double* Gs_in,
    const double* lo_in, const double* hi_in, const double* zl_in,
    const double* zu_in, const double* Zl_in, const double* Zu_in,
    double tol, int max_iter, double* u_out, double* gap_out,
    int* iters_out) {
  // --- equilibrate rows ---
  vector<double> Gh((size_t)mh * nU), dh(mh);
  for (int i = 0; i < mh; ++i) {
    double s = 1e-10;
    for (int j = 0; j < nU; ++j)
      s = std::max(s, std::fabs(Gh_in[(size_t)i * nU + j]));
    for (int j = 0; j < nU; ++j)
      Gh[(size_t)i * nU + j] = Gh_in[(size_t)i * nU + j] / s;
    dh[i] = dh_in[i] / s;
  }
  vector<double> Gs((size_t)ms * nU), lo(ms), hi(ms), zl(ms), zu(ms), Zl(ms),
      Zu(ms);
  for (int i = 0; i < ms; ++i) {
    double s = 1e-10;
    for (int j = 0; j < nU; ++j)
      s = std::max(s, std::fabs(Gs_in[(size_t)i * nU + j]));
    for (int j = 0; j < nU; ++j)
      Gs[(size_t)i * nU + j] = Gs_in[(size_t)i * nU + j] / s;
    lo[i] = lo_in[i] / s;
    hi[i] = hi_in[i] / s;
    zl[i] = zl_in[i] * s;
    zu[i] = zu_in[i] * s;
    Zl[i] = Zl_in[i] * s * s;
    Zu[i] = Zu_in[i] * s * s;
  }
  Rows Rh{mh, nU, Gh.data()}, Rs{ms, nU, Gs.data()};

  double qscale = 1.0;
  for (int j = 0; j < nU; ++j) qscale = std::max(qscale, std::fabs(g_in[j]));
  for (int i = 0; i < ms; ++i) qscale = std::max(qscale, zl[i]);
  qscale += 1.0;
  const double mu0 = qscale;
  const int m_total = mh + 4 * ms;

  // state
  vector<double> u(nU, 0.0), sl(ms, 1.0), su(ms, 1.0);
  vector<double> th(mh), lh(mh), tU(ms), lU(ms), tL(ms), lL(ms), nl(ms),
      nu(ms);
  for (int i = 0; i < mh; ++i) {
    th[i] = std::max(dh[i], 1.0);
    lh[i] = mu0 / th[i];
  }
  for (int i = 0; i < ms; ++i) {
    tU[i] = std::max(hi[i] + 1.0, 1.0);
    lU[i] = mu0 / tU[i];
    tL[i] = std::max(-lo[i] + 1.0, 1.0);
    lL[i] = mu0 / tL[i];
    nl[i] = mu0;
    nu[i] = mu0;
  }

  vector<double> best_u(u);
  double best_res = 1e300;

  vector<double> Ghu(mh), Gsu(ms), Gdu_h(mh), Gdu_s(ms);
  vector<double> M((size_t)nU * nU), rhs(nU), r1(nU), du(nU);
  vector<double> w_h(mh), b_h(mh), rp_h(mh);
  vector<double> w_U(ms), w_L(ms), w_Pl(ms), w_Pu(ms), b_U(ms), b_L(ms),
      b_Pl(ms), b_Pu(ms), rp_U(ms), rp_L(ms), Dl(ms), Du(ms), cl(ms), cu(ms),
      w_eff(ms), const_s(ms);
  vector<double> dth(mh), dlh(mh), dsl(ms), dsu(ms), dtU(ms), dlU(ms),
      dtL(ms), dlL(ms), dnl(ms), dnu(ms);
  vector<double> inv_s(nU);

  auto residual = [&]() -> double {
    Rh.matvec(u.data(), Ghu.data());
    Rs.matvec(u.data(), Gsu.data());
    for (int j = 0; j < nU; ++j) {
      double s = g_in[j];
      for (int k = 0; k < nU; ++k) s += H_in[(size_t)j * nU + k] * u[k];
      r1[j] = s;
    }
    vector<double> lam_comb(ms);
    for (int i = 0; i < ms; ++i) lam_comb[i] = lU[i] - lL[i];
    Rh.tmatvec(lh.data(), r1.data());
    Rs.tmatvec(lam_comb.data(), r1.data());
    double r_stat = 0;
    for (int j = 0; j < nU; ++j) r_stat = std::max(r_stat, std::fabs(r1[j]));
    r_stat /= qscale;
    // primal rows measured RELATIVE to bound magnitude, matching
    // ocp/qp.py::kkt_residual: far-inactive rows (|bound| ~ 1e8-1e12
    // after equilibration) have an eps*|bound| cancellation floor in
    // their slack identity that an absolute residual mistakes for
    // non-convergence
    double r_prim = 0;
    for (int i = 0; i < mh; ++i)
      r_prim = std::max(
          r_prim, std::fabs(Ghu[i] + th[i] - dh[i]) / (1.0 + std::fabs(dh[i])));
    for (int i = 0; i < ms; ++i) {
      r_prim = std::max(r_prim, std::fabs(Gsu[i] - su[i] + tU[i] - hi[i]) /
                                    (1.0 + std::fabs(hi[i])));
      r_prim = std::max(r_prim, std::fabs(-Gsu[i] - sl[i] + tL[i] + lo[i]) /
                                    (1.0 + std::fabs(lo[i])));
    }
    double compl_ = 0;
    for (int i = 0; i < mh; ++i) compl_ += th[i] * lh[i];
    for (int i = 0; i < ms; ++i)
      compl_ += tU[i] * lU[i] + tL[i] * lL[i] + sl[i] * nl[i] + su[i] * nu[i];
    return std::max(std::max(r_stat, r_prim), compl_ / (m_total * qscale));
  };

  auto newton = [&](double sig_mu, bool corr) {
    Rh.matvec(u.data(), Ghu.data());
    Rs.matvec(u.data(), Gsu.data());
    for (int i = 0; i < mh; ++i) {
      w_h[i] = lh[i] / th[i];
      const double c = corr ? dlh[i] * dth[i] : 0.0;
      b_h[i] = (lh[i] * th[i] - sig_mu + c) / th[i];
      rp_h[i] = Ghu[i] + th[i] - dh[i];
    }
    for (int j = 0; j < nU; ++j) {
      double s = g_in[j];
      for (int k = 0; k < nU; ++k) s += H_in[(size_t)j * nU + k] * u[k];
      r1[j] = s;
    }
    {
      vector<double> lam_comb(ms);
      for (int i = 0; i < ms; ++i) lam_comb[i] = lU[i] - lL[i];
      Rh.tmatvec(lh.data(), r1.data());
      Rs.tmatvec(lam_comb.data(), r1.data());
    }
    for (int i = 0; i < ms; ++i) {
      w_U[i] = lU[i] / tU[i];
      w_L[i] = lL[i] / tL[i];
      w_Pl[i] = nl[i] / sl[i];
      w_Pu[i] = nu[i] / su[i];
      const double cU = corr ? dlU[i] * dtU[i] : 0.0;
      const double cL = corr ? dlL[i] * dtL[i] : 0.0;
      const double cPl = corr ? dnl[i] * dsl[i] : 0.0;
      const double cPu = corr ? dnu[i] * dsu[i] : 0.0;
      b_U[i] = (lU[i] * tU[i] - sig_mu + cU) / tU[i];
      b_L[i] = (lL[i] * tL[i] - sig_mu + cL) / tL[i];
      b_Pl[i] = (nl[i] * sl[i] - sig_mu + cPl) / sl[i];
      b_Pu[i] = (nu[i] * su[i] - sig_mu + cPu) / su[i];
      rp_U[i] = Gsu[i] - su[i] + tU[i] - hi[i];
      rp_L[i] = -Gsu[i] - sl[i] + tL[i] + lo[i];
      const double r2 = Zl[i] * sl[i] + zl[i] - lL[i] - nl[i];
      const double r3 = Zu[i] * su[i] + zu[i] - lU[i] - nu[i];
      Dl[i] = Zl[i] + w_L[i] + w_Pl[i];
      Du[i] = Zu[i] + w_U[i] + w_Pu[i];
      cl[i] = -r2 - b_L[i] - b_Pl[i] + w_L[i] * rp_L[i];
      cu[i] = -r3 - b_U[i] - b_Pu[i] + w_U[i] * rp_U[i];
      // stable form: w_eff = w_U (Zu + w_Pu)/Du + w_L (Zl + w_Pl)/Dl
      w_eff[i] = w_U[i] * ((Zu[i] + w_Pu[i]) / Du[i]) +
                 w_L[i] * ((Zl[i] + w_Pl[i]) / Dl[i]);
      const_s[i] = -b_U[i] + b_L[i] + w_U[i] * rp_U[i] - w_L[i] * rp_L[i] -
                   (w_U[i] / Du[i]) * cu[i] + (w_L[i] / Dl[i]) * cl[i];
    }
    std::memcpy(M.data(), H_in, sizeof(double) * nU * nU);
    Rh.add_weighted_gram(w_h.data(), M.data());
    Rs.add_weighted_gram(w_eff.data(), M.data());
    for (int j = 0; j < nU; ++j) rhs[j] = -r1[j];
    {
      vector<double> tmp(mh);
      for (int i = 0; i < mh; ++i) tmp[i] = b_h[i] - w_h[i] * rp_h[i];
      Rh.tmatvec(tmp.data(), rhs.data());
      vector<double> tmp2(ms);
      for (int i = 0; i < ms; ++i) tmp2[i] = -const_s[i];
      Rs.tmatvec(tmp2.data(), rhs.data());
    }
    // Jacobi-preconditioned Cholesky solve
    for (int j = 0; j < nU; ++j)
      inv_s[j] = 1.0 / std::sqrt(std::max(M[(size_t)j * nU + j], 1e-300));
    vector<double> Ms((size_t)nU * nU);
    for (int a = 0; a < nU; ++a)
      for (int b = 0; b < nU; ++b)
        Ms[(size_t)a * nU + b] =
            M[(size_t)a * nU + b] * inv_s[a] * inv_s[b] +
            (a == b ? 1e-13 : 0.0);
    if (!cholesky(Ms, nU)) return false;
    for (int j = 0; j < nU; ++j) du[j] = rhs[j] * inv_s[j];
    cho_solve(Ms, nU, du);
    for (int j = 0; j < nU; ++j) du[j] *= inv_s[j];

    Rh.matvec(du.data(), Gdu_h.data());
    Rs.matvec(du.data(), Gdu_s.data());
    for (int i = 0; i < mh; ++i) {
      dth[i] = -Gdu_h[i] - rp_h[i];
      dlh[i] = -b_h[i] - w_h[i] * dth[i];
    }
    for (int i = 0; i < ms; ++i) {
      dsl[i] = (cl[i] - w_L[i] * Gdu_s[i]) / Dl[i];
      dsu[i] = (cu[i] + w_U[i] * Gdu_s[i]) / Du[i];
      dtU[i] = -Gdu_s[i] + dsu[i] - rp_U[i];
      dtL[i] = Gdu_s[i] + dsl[i] - rp_L[i];
      dlU[i] = -b_U[i] - w_U[i] * dtU[i];
      dlL[i] = -b_L[i] - w_L[i] * dtL[i];
      dnl[i] = -b_Pl[i] - w_Pl[i] * dsl[i];
      dnu[i] = -b_Pu[i] - w_Pu[i] * dsu[i];
    }
    return true;
  };

  auto alpha_max = [&]() {
    double a = 1.0;
    auto upd = [&](const vector<double>& v, const vector<double>& dv) {
      for (size_t i = 0; i < v.size(); ++i)
        if (dv[i] < 0) a = std::min(a, -v[i] / dv[i]);
    };
    upd(sl, dsl); upd(su, dsu); upd(th, dth); upd(lh, dlh);
    upd(tU, dtU); upd(lU, dlU); upd(tL, dtL); upd(lL, dlL);
    upd(nl, dnl); upd(nu, dnu);
    return 0.99 * a;
  };

  int it = 0;
  for (; it < max_iter; ++it) {
    double compl_ = 0;
    for (int i = 0; i < mh; ++i) compl_ += th[i] * lh[i];
    for (int i = 0; i < ms; ++i)
      compl_ += tU[i] * lU[i] + tL[i] * lL[i] + sl[i] * nl[i] + su[i] * nu[i];
    const double mu = compl_ / m_total;
    if (mu < 1e-14 * mu0) break;

    if (!newton(0.0, false)) break;
    const double a_aff = alpha_max();
    // mu after affine step
    double compl_aff = 0;
    for (int i = 0; i < mh; ++i)
      compl_aff += (th[i] + a_aff * dth[i]) * (lh[i] + a_aff * dlh[i]);
    for (int i = 0; i < ms; ++i)
      compl_aff += (tU[i] + a_aff * dtU[i]) * (lU[i] + a_aff * dlU[i]) +
                   (tL[i] + a_aff * dtL[i]) * (lL[i] + a_aff * dlL[i]) +
                   (sl[i] + a_aff * dsl[i]) * (nl[i] + a_aff * dnl[i]) +
                   (su[i] + a_aff * dsu[i]) * (nu[i] + a_aff * dnu[i]);
    const double mu_aff = compl_aff / m_total;
    double sigma = std::pow(mu_aff / mu, 3);
    sigma = std::min(1.0, std::max(0.0, sigma));

    if (!newton(sigma * mu, true)) break;
    const double a = alpha_max();
    for (int j = 0; j < nU; ++j) u[j] += a * du[j];
    for (int i = 0; i < mh; ++i) {
      th[i] += a * dth[i];
      lh[i] += a * dlh[i];
    }
    for (int i = 0; i < ms; ++i) {
      sl[i] += a * dsl[i]; su[i] += a * dsu[i];
      tU[i] += a * dtU[i]; lU[i] += a * dlU[i];
      tL[i] += a * dtL[i]; lL[i] += a * dlL[i];
      nl[i] += a * dnl[i]; nu[i] += a * dnu[i];
    }
    const double res = residual();
    if (std::isfinite(res) && res < best_res) {
      best_res = res;
      best_u = u;
    }
    if (best_res <= tol) break;
  }

  std::memcpy(u_out, best_u.data(), sizeof(double) * nU);
  *gap_out = best_res;
  *iters_out = it;
  return best_res <= tol * 1e3 ? 0 : 4;
}
