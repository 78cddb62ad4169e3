"""Independent closed-loop parity oracle (VERDICT r2 item #2).

A reference-shaped re-implementation of the full sampling-GP-MPC closed
loop (ref: src/DEMPC.py:39-80, src/solver.py:39-156) built from
INDEPENDENT numerical components, so end-to-end trajectory agreement with
the JAX stack answers the BASELINE "match the reference closed loop to
1e-3" target in-image (acados itself is absent from the environment):

    JAX stack                         this oracle
    ---------                         -----------
    closed-form RBF-grad kernel       torch autograd (jacrev/jacfwd) blocks
    NaN-mask-trick conditioning       explicit NaN-row REMOVAL + chol
    blockwise/incremental factors     one dense factorization per use
    condensed structured PDIP QP      SPARSE-form QP (dX, dU, slacks as
                                      variables, dynamics as equality
                                      rows) solved by scipy SLSQP
    lax.while_loop SQP driver         plain-python SQP loop

Shared inputs (like the reference's loadable epistemic vectors,
ref: benchmarking/simulate_forward_sampling_car.py:78-80): the YAML
config, and the pre-drawn truncated-normal epistemic base samples.
Everything else — GP posterior, function samples, linearization, QP
solution, plant stepping, solution shifting — is computed twice through
disjoint code paths; f64 end-to-end.

Supported modes (the two VERDICT-requested workloads):
  * pendulum1D sampling MPC, ns>1, SQP-RTI (max_sqp_iter=1) — the full
    GP-sampling pipeline;
  * car-residual ns=1 true-dynamics debug mode, multi-iteration SQP —
    the nominal-MPC pipeline (ref: params/params_car_residual.yaml:47-50).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla
import torch
from scipy.optimize import LinearConstraint, minimize

from sampling_gpmpc_tpu.ocp import sqp as sqp_mod

torch.set_default_dtype(torch.float64)


# ---------------------------------------------------------------------------
# GP: torch-autograd derivative kernel + drop-NaN conditioning
# ---------------------------------------------------------------------------

def _k_pair(x, z, ls, os_):
    d = (x - z) / ls
    return os_ * torch.exp(-0.5 * torch.sum(d * d))


def rbf_grad_kernel(X, Z, ls, os_):
    """(N*(1+D), M*(1+D)) derivative-kernel matrix via autograd.

    Independent of the JAX closed forms (sampling_gpmpc_tpu/gp/kernel.py):
    every block is a jacrev/jacfwd of the scalar RBF.  Layout matches
    GPyTorch's RBFKernelGrad: point-major, tasks [value, d/dx_1..d/dx_D].
    """
    X = torch.as_tensor(np.asarray(X))
    Z = torch.as_tensor(np.asarray(Z))
    ls = torch.as_tensor(np.asarray(ls))
    os_ = torch.as_tensor(float(os_))
    N, D = X.shape
    M = Z.shape[0]

    k = lambda x, z: _k_pair(x, z, ls, os_)
    dkdz = torch.func.jacrev(k, argnums=1)           # (D,)
    dkdx = torch.func.jacrev(k, argnums=0)           # (D,)
    d2k = torch.func.jacfwd(dkdz, argnums=0)         # (D_z, D_x)

    def block(x, z):
        top = torch.cat([k(x, z)[None], dkdz(x, z)])          # (1+D,)
        bot = torch.cat([dkdx(x, z)[:, None], d2k(x, z).T], dim=1)  # (D,1+D)
        return torch.cat([top[None], bot])                     # (1+D,1+D)

    blk = torch.func.vmap(torch.func.vmap(block, (None, 0)), (0, None))(X, Z)
    return blk.permute(0, 2, 1, 3).reshape(N * (1 + D), M * (1 + D)).numpy()


def rbf_kernel(X, Z, ls, os_):
    X, Z, ls = (np.asarray(a, np.float64) for a in (X, Z, ls))
    d = (X[:, None, :] - Z[None, :, :]) / ls
    return float(os_) * np.exp(-0.5 * np.sum(d * d, axis=-1))


class OracleGP:
    """Exact GP for one output: explicit NaN-row removal, dense Cholesky.

    The JAX stack keeps static shapes and masks NaN observations via the
    identity-row trick (gp/exact.py); here missing rows are simply REMOVED
    — an independent path to the identical posterior.
    """

    def __init__(self, Z, Y, ls, os_, noise_diag, jitter, with_grad):
        self.Z = np.asarray(Z, np.float64)          # (M, D)
        Y = np.asarray(Y, np.float64)               # (M, Ty)
        self.ls, self.os_ = np.asarray(ls, np.float64), float(os_)
        self.with_grad = with_grad
        M, Ty = Y.shape
        y = Y.reshape(-1)
        self.keep = ~np.isnan(y)                    # (M*Ty,)
        K = (rbf_grad_kernel(self.Z, self.Z, ls, os_) if with_grad
             else rbf_kernel(self.Z, self.Z, ls, os_))
        K = K + np.diag(np.tile(np.asarray(noise_diag, np.float64), M))
        # the JAX safe_cholesky applies max(jitter, 1e-14) in f64
        j0 = max(float(jitter), 1e-14)
        Kk = K[np.ix_(self.keep, self.keep)] + j0 * np.eye(self.keep.sum())
        self.L = np.linalg.cholesky(Kk)
        self.alpha = np.linalg.solve(
            self.L.T, np.linalg.solve(self.L, y[self.keep]))

    def joint_posterior(self, Xt):
        """Joint posterior over len(Xt) points x (1+D or 1) tasks."""
        Kx = (rbf_grad_kernel(Xt, self.Z, self.ls, self.os_) if self.with_grad
              else rbf_kernel(Xt, self.Z, self.ls, self.os_))[:, self.keep]
        Ktt = (rbf_grad_kernel(Xt, Xt, self.ls, self.os_) if self.with_grad
               else rbf_kernel(Xt, Xt, self.ls, self.os_))
        mean = Kx @ self.alpha
        V = np.linalg.solve(self.L, Kx.T)
        cov = Ktt - V.T @ V
        return mean, cov


def sample_posterior(mean, cov, eps, jitter, beta, prior_var, Ty):
    """Pathwise sample + the reference's override pipeline
    (ref: src/agent.py:629-730; zero-variance / min-dist overrides are
    config-disabled in the supported workloads)."""
    j0 = max(float(jitter), 1e-14)
    L = np.linalg.cholesky(cov + j0 * np.eye(cov.shape[0]))
    y = mean + L @ eps
    H = mean.shape[0] // Ty
    y = y.reshape(H, Ty)
    mu = mean.reshape(H, Ty)
    var = np.clip(np.diagonal(cov), 0.0, None).reshape(H, Ty)
    var = np.where(var < 1e-12 * prior_var[None, :], 0.0, var)
    sd = np.sqrt(var)
    return np.clip(y, mu - beta * sd, mu + beta * sd)


# ---------------------------------------------------------------------------
# Sparse-form QP via SLSQP
# ---------------------------------------------------------------------------

def build_sparse_qp(ns, H, nx, nu, A, B, r, dx0, Hx, gx, Hu, gu,
                    ineq_rows, soft_rows):
    """Assemble one SQP subproblem in SPARSE (non-condensed) form.

    Variables zv = [dU (H*nu); dX (ns*(H+1)*nx); sl; su].  The JAX stack
    condenses dX out analytically (ocp/condense.py) and solves a
    structured PDIP; equality of the two solutions cross-validates both.

    Args:
        A, B, r: (ns, H, nx, nx/nu), (ns, H, nx) per-sample linear dynamics
            dx+ = A dx + B du + r;   dx0: (ns, nx).
        Hx, gx: (ns, H+1, nx, nx), (ns, H+1, nx) state-cost blocks;
        Hu, gu: (H, nu, nu), (H, nu) input-cost blocks.
        ineq_rows: list of (Gx (m, ns*(H+1)*nx), Gu (m, H*nu), lo, hi).
        soft_rows: list of (Gx, Gu, lo, hi, zl, zu, Zl, Zu) soft rows with
            acados z/Z penalties (one slack PAIR per row).
    Returns (P, q, Aeq, beq, G, d) dense, plus the variable index map.
    """
    nU = H * nu
    nX = ns * (H + 1) * nx
    m_s = sum(rs[2].shape[0] for rs in soft_rows) if soft_rows else 0
    n = nU + nX + 2 * m_s
    iU, iX, iL, iS = 0, nU, nU + nX, nU + nX + m_s

    # quadratic objective
    P = np.zeros((n, n))
    q = np.zeros(n)
    for k in range(H):
        s = iU + k * nu
        P[s:s + nu, s:s + nu] = Hu[k]
        q[s:s + nu] = gu[k]
    Hxf = Hx.reshape(ns * (H + 1), nx, nx)
    gxf = gx.reshape(ns * (H + 1), nx)
    for j in range(ns * (H + 1)):
        s = iX + j * nx
        P[s:s + nx, s:s + nx] = Hxf[j]
        q[s:s + nx] = gxf[j]
    if m_s:
        Zl = np.concatenate([rs[6] for rs in soft_rows])
        Zu = np.concatenate([rs[7] for rs in soft_rows])
        zl = np.concatenate([rs[4] for rs in soft_rows])
        zu = np.concatenate([rs[5] for rs in soft_rows])
        P[range(iL, iS), range(iL, iS)] = Zl
        P[range(iS, n), range(iS, n)] = Zu
        q[iL:iS] = zl
        q[iS:n] = zu

    # equality rows: dx_{i,0} = dx0_i ; dx+ = A dx + B du + r
    Aeq = np.zeros((ns * (H + 1) * nx, n))
    beq = np.zeros(ns * (H + 1) * nx)
    row = 0
    for i in range(ns):
        s0 = iX + i * (H + 1) * nx
        Aeq[row:row + nx, s0:s0 + nx] = np.eye(nx)
        beq[row:row + nx] = dx0[i]
        row += nx
        for k in range(H):
            sk = s0 + k * nx
            Aeq[row:row + nx, sk + nx:sk + 2 * nx] = np.eye(nx)
            Aeq[row:row + nx, sk:sk + nx] = -A[i, k]
            Aeq[row:row + nx, iU + k * nu:iU + (k + 1) * nu] = -B[i, k]
            beq[row:row + nx] = r[i, k]
            row += nx

    # inequality rows, canonical G zv <= d
    G_list, d_list = [], []
    for Gx, Gu, lo, hi in ineq_rows:
        Grow = np.zeros((Gx.shape[0], n))
        Grow[:, iX:iX + nX] = Gx
        Grow[:, :nU] = Gu
        G_list += [Grow, -Grow]
        d_list += [hi, -lo]
    off = 0
    for Gx, Gu, lo, hi, *_ in soft_rows:
        m = lo.shape[0]
        Grow = np.zeros((m, n))
        Grow[:, iX:iX + nX] = Gx
        Grow[:, :nU] = Gu
        up = Grow.copy()
        up[:, iS + off:iS + off + m] = -np.eye(m)       # G zv - su <= hi
        dn = -Grow.copy()
        dn[:, iL + off:iL + off + m] = -np.eye(m)       # -G zv - sl <= -lo
        G_list += [up, dn]
        d_list += [hi, -lo]
        off += m
    G = np.vstack(G_list) if G_list else np.zeros((0, n))
    d = np.concatenate(d_list) if d_list else np.zeros(0)

    if m_s:
        # slack nonnegativity as rows (trust-constr treats separate bounds
        # less accurately than linear constraints on this problem class)
        Sl = np.zeros((2 * m_s, n))
        Sl[:, iL:n] = -np.eye(2 * m_s)
        G = np.vstack([G, Sl])
        d = np.concatenate([d, np.zeros(2 * m_s)])

    return P, q, Aeq, beq, G, d, (nU, nX, iU, iX, iL, iS, n)


def solve_qp_ipm_sparse(P, q, Aeq, beq, G, d, tol=1e-15, maxiter=100,
                        stall=4):
    """Textbook sparse Mehrotra predictor-corrector PDIP in scipy f64.

    Solves  min 1/2 z'Pz + q'z  s.t.  Aeq z = beq,  G z <= d  on the
    NON-condensed sparse form, factoring the reduced KKT system
    [[P + G' (Lam/S) G, Aeq'], [Aeq, 0]] with SuperLU each iteration
    (plus two iterative-refinement passes — the 1e7 acados-penalty
    curvature needs them) after Ruiz-style row equilibration.

    Returns ``(z, n_iters, res)`` where ``res`` is the RELATIVE KKT
    residual — max(|r_dual|, |r_eq|, |r_in|, mu) divided by the
    problem scale max(1, |q|, |beq|, |d|) — the same quantity the
    convergence exit tests against ``tol``, so callers check one
    criterion (ADVICE r4: an absolute caller-side check could flag a
    converged solve as stalled on badly scaled instances).

    tol=1e-15 + stall-based stopping (was tol=1e-10): the flagship
    instances mix 1e7 slack-penalty curvature with ~1e-4 state-cost
    curvature (condition ~1e11 in P), so the relative KKT residual
    wildly understates distance to the minimizer along the flat
    directions — measured on the flagship pendulum1D step-2 QP: at
    rel res 7e-14 the solution is still 1.3e-1 away (objective gap
    0.24); three more iterations reach rel res 1e-16 and the true
    optimum.  The only safe exit on such instances is the numerical
    FLOOR: iterate until ``stall`` consecutive iterations make no new
    best residual (or res < tol), and return the best iterate.

    Exists because scipy trust-constr goes dense on these instances:
    at the flagship pendulum1D shape (ns=70 -> n=2677, me=2520,
    mi=7454, 99.9 % structural zeros) it costs >500 s per QP, making
    the 20-step golden a multi-hour run; this routine solves the same
    instance to ~1e-9 KKT residual in seconds.  It stays numerically
    disjoint from the JAX stack's QP path (ocp/qp.py): sparse-form
    variables vs analytic condensing, SuperLU vs blocked
    Cholesky/Schur, numpy f64 vs jitted f32/f64.  Agreement with
    trust-constr on identical instances is pinned by
    tests/test_oracle_parity.py::test_oracle_qp_solvers_agree.
    """
    n = len(q); mi = len(d)
    P = sp.csc_matrix(P); Aeq = sp.csc_matrix(Aeq); G = sp.csc_matrix(G)

    # row equilibration + cost scaling (same minimizer, scaled duals)
    gn = np.sqrt(np.asarray(abs(G).multiply(abs(G)).sum(axis=1)).ravel())
    gn = np.where(gn > 0, gn, 1.0)
    G = sp.diags(1.0 / gn) @ G
    d = d / gn
    an = np.sqrt(np.asarray(abs(Aeq).multiply(abs(Aeq)).sum(axis=1)).ravel())
    an = np.where(an > 0, an, 1.0)
    Aeq = sp.diags(1.0 / an) @ Aeq
    beq = beq / an
    cs = max(1.0, np.abs(P.diagonal()).max(), np.abs(q).max())
    P = P / cs
    q = q / cs

    GT = G.T.tocsc(); AeqT = Aeq.T.tocsc()
    me = len(beq)
    z = np.zeros(n); nu = np.zeros(me)
    s = np.maximum(1.0, np.abs(d)); lam = np.ones(mi)
    bscale = max(1.0, np.abs(q).max(), np.abs(beq).max(initial=0.0),
                 np.abs(d).max(initial=0.0))
    reg = 1e-11
    Ieq = sp.identity(me, format="csc")

    def kkt_solve(lu, K, rhs, passes=2):
        x = lu.solve(rhs)
        for _ in range(passes):
            x += lu.solve(rhs - K @ x)
        return x

    res = np.inf
    best_res, best_z = np.inf, z.copy()
    n_stalled = 0
    for it in range(maxiter):
        r_dual = P @ z + q + AeqT @ nu + GT @ lam
        r_eq = Aeq @ z - beq
        r_in = G @ z + s - d
        mu = lam @ s / mi if mi else 0.0
        res = max(np.abs(r_dual).max(), np.abs(r_eq).max(initial=0.0),
                  np.abs(r_in).max(initial=0.0), mu) / bscale
        if res < best_res:
            best_res, best_z, n_stalled = res, z.copy(), 0
        else:
            n_stalled += 1
            if n_stalled >= stall:          # numerical floor reached
                return best_z, it, best_res
        if res < tol:
            return z, it, res
        if mi == 0:
            # equality-constrained QP: the KKT system is linear; one
            # regularized Newton solve (below, with W empty) finishes it
            K = sp.bmat([[P + reg * sp.identity(n), AeqT],
                         [Aeq, -reg * Ieq]], format="csc")
            lu = spla.splu(K)
            sol = kkt_solve(lu, K, np.concatenate([-r_dual, -r_eq]))
            z += sol[:n]; nu += sol[n:]
            continue
        W = lam / s
        K = sp.bmat([[P + GT @ sp.diags(W) @ G + reg * sp.identity(n),
                      AeqT], [Aeq, -reg * Ieq]], format="csc")
        lu = spla.splu(K)
        # affine predictor (r_c = Lam S e)
        rhs_z = -(r_dual + GT @ (W * r_in - lam))
        sol = kkt_solve(lu, K, np.concatenate([rhs_z, -r_eq]))
        dz_a = sol[:n]
        ds_a = -(r_in + G @ dz_a)
        dlam_a = -lam - W * ds_a
        ap = min(1.0, 0.99995 * min(
            (-s[ds_a < 0] / ds_a[ds_a < 0]).min(initial=np.inf),
            (-lam[dlam_a < 0] / dlam_a[dlam_a < 0]).min(initial=np.inf)))
        mu_aff = (lam + ap * dlam_a) @ (s + ap * ds_a) / mi
        sigma = (mu_aff / mu) ** 3 if mu > 0 else 0.0
        # corrector (r_c = Lam S e + dLam_a dS_a e - sigma mu e)
        rc = (sigma * mu - dlam_a * ds_a) / s
        rhs_z = -(r_dual + GT @ (W * r_in - lam + rc))
        sol = kkt_solve(lu, K, np.concatenate([rhs_z, -r_eq]))
        dz = sol[:n]; dnu = sol[n:]
        ds = -(r_in + G @ dz)
        dlam = -lam - W * ds + rc
        a = min(1.0, 0.99995 * min(
            (-s[ds < 0] / ds[ds < 0]).min(initial=np.inf),
            (-lam[dlam < 0] / dlam[dlam < 0]).min(initial=np.inf)))
        z += a * dz; nu += a * dnu; s += a * ds; lam += a * dlam
    # hit maxiter: return the best-KKT iterate seen (the last Mehrotra
    # step can overshoot once the floor is reached)
    return best_z, maxiter, best_res


def solve_sparse_qp(ns, H, nx, nu, A, B, r, dx0, Hx, gx, Hu, gu,
                    ineq_rows, soft_rows):
    """Solve one SQP subproblem in SPARSE form (scipy trust-constr, or
    the sparse PDIP above once trust-constr's dense algebra would make
    the instance intractable)."""
    P, q, Aeq, beq, G, d, idx = build_sparse_qp(
        ns, H, nx, nu, A, B, r, dx0, Hx, gx, Hu, gu, ineq_rows, soft_rows)
    nU, nX, iU, iX, iL, iS, n = idx

    if n > 1500:
        zv, n_it, res = solve_qp_ipm_sparse(P, q, Aeq, beq, G, d)
        # res is RELATIVE (same criterion as the solver's own exit)
        if res > 1e-7:
            raise RuntimeError(f"oracle sparse IPM stalled: rel res={res}")
        return zv[:nU].reshape(H, nu), zv[iX:iX + nX].reshape(ns, H + 1, nx)

    # scipy trust-constr with the exact Hessian: SLSQP's quasi-Newton
    # model stalls on the 1e7-penalty curvature (measured: 5e-2 accuracy,
    # status 8); trust-constr solves the same instance to ~5e-9
    cons = [LinearConstraint(Aeq, beq, beq),
            LinearConstraint(G, -np.inf, d)]
    res = minimize(
        lambda z: 0.5 * z @ P @ z + q @ z, np.zeros(n),
        jac=lambda z: P @ z + q, hess=lambda z: P, constraints=cons,
        method="trust-constr",
        options={"gtol": 1e-12, "xtol": 1e-14, "maxiter": 500})
    viol = max(np.abs(Aeq @ res.x - beq).max(initial=0.0),
               np.maximum(G @ res.x - d, 0.0).max(initial=0.0))
    if res.status not in (1, 2) and viol > 1e-8:
        raise RuntimeError(f"trust-constr failed: {res.message} viol={viol}")
    z = res.x
    dU = z[:nU].reshape(H, nu)
    dX = z[iX:iX + nX].reshape(ns, H + 1, nx)
    return dU, dX


# ---------------------------------------------------------------------------
# OCP row/cost assembly (sparse form) — independent re-derivation
# ---------------------------------------------------------------------------

def _state_sel(ns, H, nx, i, k):
    """Selector matrix extracting dx_{i,k} from the flat dX vector."""
    S = np.zeros((nx, ns * (H + 1) * nx))
    s = (i * (H + 1) + k) * nx
    S[:, s:s + nx] = np.eye(nx)
    return S


class OracleOCP:
    """Host-side OCP data mirroring ocp/spec.py::make_ocp_data, rebuilt
    from the raw config (independent assembly of the same experiment)."""

    def __init__(self, params, spec, data):
        H, nx, nu, ns = spec.H, spec.nx, spec.nu, spec.ns
        self.spec, self.data = spec, data
        Qx = np.asarray(data.Qx)
        if spec.input_generation:
            Qs = np.zeros((nx, nx))
            Qs[1, 1] = Qx[1, 1]
            Qs[3, 3] = Qx[3, 3]
            Qe = np.zeros((nx, nx))
            Qe[1, 1] = Qx[1, 1]
            xref = np.zeros((H + 1, nx))
            xref[:, 1] = data.w_profile
            xref[:, 3] = data.x_max[3]
            xref[H] = 0.0
            xref[H, 1] = 1.95
            w = np.zeros(ns)
            w[0] = 1.0 / ns
        else:
            Qs, Qe = Qx, Qx
            xref = np.tile(data.goal, (H + 1, 1))
            w = np.full(ns, 1.0 / ns)
            if spec.cost_mean_only:
                w = np.zeros(ns)
                w[0] = 1.0
        self.Qs, self.Qe, self.xref, self.w = Qs, Qe, xref, w
        self.Qu = np.asarray(data.Qu)
        self.lm = spec.levenberg_marquardt
        self.x_lo = np.tile(data.x_min, (H + 1, 1))
        self.x_hi = np.tile(data.x_max, (H + 1, 1))
        self.fb_lo = np.tile(data.u_min, (H, 1))
        self.fb_hi = np.tile(data.u_max, (H, 1))
        if spec.use_tightening:
            self.x_lo += data.tilde_eps[:, :nx]
            self.x_hi -= data.tilde_eps[:, :nx]
            if spec.env_name == "Pendulum1D":
                self.fb_lo += data.tilde_eps[:H, nx:nx + nu]
                self.fb_hi -= data.tilde_eps[:H, nx:nx + nu]
        if spec.use_feedback:
            self.u_lo, self.u_hi = data.v_min, data.v_max
            self.K = np.asarray(data.K_fb)
        else:
            self.u_lo, self.u_hi = data.u_min, data.u_max
            self.K = np.zeros((nu, nx))

    def subproblem(self, X, U, A, B, val):
        """Assemble one SQP subproblem around iterate (X, U).

        X: (H+1, ns, nx); U: (H, nu); A/B/val per (ns, H).
        Returns everything solve_sparse_qp needs.
        """
        spec, data = self.spec, self.data
        H, nx, nu, ns = spec.H, spec.nx, spec.nu, spec.ns
        Xs = np.swapaxes(X, 0, 1)                         # (ns, H+1, nx)
        r = val - Xs[:, 1:]

        Qk = np.concatenate([np.tile(self.Qs[None], (H, 1, 1)),
                             self.Qe[None]])              # (H+1, nx, nx)
        Hx = (2.0 * self.w[:, None, None, None] * Qk[None]
              + self.lm * np.eye(nx)[None, None])
        gx = 2.0 * self.w[:, None, None] * np.einsum(
            "kab,ikb->ika", Qk, Xs - self.xref[None])
        Hu = np.tile((2.0 * self.Qu + self.lm * np.eye(nu))[None], (H, 1, 1))
        gu = 2.0 * U @ self.Qu                            # (H, nu)

        nX = ns * (H + 1) * nx
        nU = H * nu
        ineq = []
        # input box on the OCP variable
        Gu_box = np.eye(nU)
        ineq.append((np.zeros((nU, nX)), Gu_box,
                     np.tile(self.u_lo, H) - U.reshape(-1),
                     np.tile(self.u_hi, H) - U.reshape(-1)))
        # per-sample state box, stages 1..H
        rows = ns * H * nx
        Gx_box = np.zeros((rows, nX))
        lo = np.zeros(rows)
        hi = np.zeros(rows)
        j = 0
        for i in range(ns):
            for k in range(1, H + 1):
                Gx_box[j:j + nx] = _state_sel(ns, H, nx, i, k)
                lo[j:j + nx] = self.x_lo[k] - Xs[i, k]
                hi[j:j + nx] = self.x_hi[k] - Xs[i, k]
                j += nx
        ineq.append((Gx_box, np.zeros((rows, nU)), lo, hi))
        # realized feedback input rows
        if spec.use_feedback:
            rows = ns * H * nu
            Gx_fb = np.zeros((rows, nX))
            Gu_fb = np.zeros((rows, nU))
            lo = np.zeros(rows)
            hi = np.zeros(rows)
            j = 0
            for i in range(ns):
                for k in range(H):
                    Gx_fb[j:j + nu] = self.K @ _state_sel(ns, H, nx, i, k)
                    Gu_fb[j:j + nu, k * nu:(k + 1) * nu] = np.eye(nu)
                    h_bar = U[k] - self.K @ (data.goal - Xs[i, k])
                    lo[j:j + nu] = self.fb_lo[k] - h_bar
                    hi[j:j + nu] = self.fb_hi[k] - h_bar
                    j += nu
            ineq.append((Gx_fb, Gu_fb, lo, hi))
        # terminal ellipse (soft, acados z/Z penalties)
        soft = []
        if spec.has_terminal_ellipse:
            P_t = np.asarray(data.P_term)
            Gx_t = np.zeros((ns, nX))
            lo = np.zeros(ns)
            hi = np.zeros(ns)
            for i in range(ns):
                xe = Xs[i, H] - data.goal
                q0 = xe @ P_t @ xe
                J = 2.0 * P_t @ xe
                Gx_t[i] = J @ _state_sel(ns, H, nx, i, H)
                lo[i] = 0.0 - q0
                hi[i] = data.delta_term ** 2 - q0
            soft.append((Gx_t, np.zeros((ns, nU)), lo, hi,
                         np.full(ns, 1e7), np.full(ns, 1e6),
                         np.full(ns, 1e7), np.full(ns, 1e6)))
        dx0 = np.zeros((ns, nx))   # filled by caller (current state)
        return dict(A=A, B=B, r=r, dx0=dx0, Hx=Hx, gx=gx, Hu=Hu, gu=gu,
                    ineq_rows=ineq, soft_rows=soft)


# ---------------------------------------------------------------------------
# Environment re-implementations (numpy, independent of envs/*.py)
# ---------------------------------------------------------------------------

class Pendulum1DOracle:
    """ref: src/environments/pendulum1D.py — known kinematics + scalar GP."""

    def __init__(self, params):
        ep = params["env"]["params"]
        self.l, self.g = float(ep["l"]), float(ep["g"])
        self.dt = float(params["optimizer"]["dt"])

    def true_step(self, x, u):
        th, om = x
        dom = -self.g * np.sin(th) * self.dt / self.l + u[0] * self.dt
        return np.array([th + om * self.dt, om + dom])

    def lin(self, x, u, dg):
        """(val, A, B) from the known part + one sampled GP row
        dg = [g, dg/dth, dg/du]."""
        th, om = x
        dt = self.dt
        val = np.array([th + om * dt, om + dg[0]])
        A = np.array([[1.0, dt], [dg[1], 1.0]])
        B = np.array([[0.0], [dg[2]]])
        return val, A, B

    def gp_input(self, x, u):
        return np.array([x[0], u[0]])


class CarResidualOracle:
    """ref: src/environments/car_model_residual.py — v-factored residual,
    true-dynamics g with analytic gradients (true_dyn_as_sample mode)."""

    def __init__(self, params):
        ep = params["env"]["params"]
        self.lf, self.lr = float(ep["lf"]), float(ep["lr"])
        self.dt = float(params["optimizer"]["dt"])

    def _g_true(self, phi, delta):
        """g(phi, delta) = dt * [cos(phi+beta)/? ...] — the residual rows
        (value + d/dphi + d/ddelta), matching the reference's analytic
        prior (ref: car_model_residual.py:62-123)."""
        dt = self.dt
        beta = np.arctan(self.lr * np.tan(delta) / (self.lf + self.lr))
        dbeta_ddelta = (self.lr / (self.lf + self.lr)
                        / np.cos(delta) ** 2
                        / (1 + (self.lr * np.tan(delta)
                                / (self.lf + self.lr)) ** 2))
        sb = np.sin(beta) / self.lr
        g = np.array([np.cos(phi + beta) * dt,
                      np.sin(phi + beta) * dt,
                      sb * dt])
        dphi = np.array([-np.sin(phi + beta) * dt,
                         np.cos(phi + beta) * dt,
                         0.0])
        ddelta = np.array([-np.sin(phi + beta) * dt * dbeta_ddelta,
                           np.cos(phi + beta) * dt * dbeta_ddelta,
                           np.cos(beta) / self.lr * dt * dbeta_ddelta])
        return g, dphi, ddelta

    def true_step(self, x, u):
        X, Y, phi, v = x
        a, delta = u[1], u[0]
        g, _, _ = self._g_true(phi, delta)
        return np.array([X + v * g[0], Y + v * g[1], phi + v * g[2],
                         v + a * self.dt])

    def lin(self, x, u, dg=None):
        """True-dynamics linearization (B_d(x) = v I, transform injects the
        d/dv column; ref: car_model_residual.py:184-224)."""
        X, Y, phi, v = x
        delta = u[0]
        dt = self.dt
        g, dphi, ddelta = self._g_true(phi, delta)
        val = np.array([X + v * g[0], Y + v * g[1], phi + v * g[2],
                        v + u[1] * dt])
        A = np.zeros((4, 4))
        A[0] = [1.0, 0.0, v * dphi[0], g[0]]
        A[1] = [0.0, 1.0, v * dphi[1], g[1]]
        A[2] = [0.0, 0.0, 1.0 + v * dphi[2], g[2]]
        A[3] = [0.0, 0.0, 0.0, 1.0]
        B = np.zeros((4, 2))
        B[0, 0] = v * ddelta[0]
        B[1, 0] = v * ddelta[1]
        B[2, 0] = v * ddelta[2]
        B[3, 1] = dt
        return val, A, B


# ---------------------------------------------------------------------------
# Closed loops
# ---------------------------------------------------------------------------

def run_pendulum1d(params, spec, data, eps, n_steps):
    """Reference-shaped pendulum1D sampling closed loop (SQP-RTI, ns>1).

    Args:
        eps: (num_mpc, max_sqp, ns, g_ny, H, Ty) shared epistemic draws.
    Returns dict with physical/input/plan trajectories.
    """
    assert spec.max_sqp_iter == 1, "oracle implements the RTI configuration"
    env = Pendulum1DOracle(params)
    ocp = OracleOCP(params, spec, data)
    H, nx, nu, ns, Ty = spec.H, spec.nx, spec.nu, spec.ns, spec.Ty
    gp_hyp = spec.gp

    # training grid identical to envs/pendulum1d.py::training_grid
    opt = params["optimizer"]
    x1 = np.linspace(opt["x_min"][0], opt["x_max"][0],
                     params["env"]["n_data_x"])
    ug = np.linspace(opt["u_min"][0], opt["u_max"][0],
                     params["env"]["n_data_u"])
    mesh = np.meshgrid(x1, ug, indexing="ij")
    Zg = np.stack([m.reshape(-1) for m in mesh], axis=1)
    dt, l, g = env.dt, env.l, env.g
    Yg = np.stack([
        -g * np.sin(Zg[:, 0]) * dt / l + Zg[:, 1] * dt,
        -g * np.cos(Zg[:, 0]) * dt / l,
        np.full(len(Zg), dt),
    ], axis=1)                                           # (N, 3)
    if not spec.train_data_has_derivatives:
        Yg[:, 1:] = np.nan

    noise_diag = np.asarray(gp_hyp.task_noises) + gp_hyp.noise
    ls = np.asarray(gp_hyp.lengthscale)[0]
    os_ = np.asarray(gp_hyp.outputscale)[0]
    gp = OracleGP(Zg, Yg, ls, os_, noise_diag, gp_hyp.jitter,
                  spec.use_derivatives)
    prior_var = np.concatenate([[os_], os_ / ls ** 2])[:Ty]

    x_curr = np.asarray(data.start, np.float64)
    X = np.tile(data.start, (H + 1, ns, 1))
    U = np.zeros((H, nu))
    K = ocp.K
    phys, inputs, plans = [], [], []

    for m in range(n_steps):
        # --- one SQP-RTI iteration ---
        Xs = np.swapaxes(X, 0, 1)                        # (ns, H+1, nx)
        val = np.zeros((ns, H, nx))
        A = np.zeros((ns, H, nx, nx))
        B = np.zeros((ns, H, nx, nu))
        for i in range(ns):
            # sample this realization's dynamics along its trajectory
            Ueff = U - (data.goal[None] - Xs[i, :H]) @ K.T \
                if spec.use_feedback else U
            Xt = np.stack([Xs[i, :H, 0], Ueff[:, 0]], axis=1)   # (H, 2)
            mean, cov = gp.joint_posterior(Xt)
            dg = sample_posterior(mean, cov, eps[m, 0, i, 0].reshape(-1),
                                  gp_hyp.jitter, gp_hyp.beta, prior_var, Ty)
            for k in range(H):
                val[i, k], A[i, k], B[i, k] = env.lin(
                    Xs[i, k], Ueff[k], dg[k])
            if spec.use_feedback:
                A[i] = A[i] + B[i] @ K
        sub = ocp.subproblem(X, U, A, B, val)
        sub["dx0"] = np.tile(x_curr[None], (ns, 1)) - Xs[:, 0]
        dU, dX = solve_sparse_qp(ns, H, nx, nu, **sub)
        X = X + np.swapaxes(dX, 0, 1)
        U = U + dU

        # --- plant step + shift (ref: src/DEMPC.py:39-80) ---
        u0 = U[0].copy()
        if spec.use_feedback:
            u0 = u0 - K @ (data.goal - X[0, 0])
        phys.append(x_curr.copy())
        inputs.append(U.copy())
        plans.append(X.copy())
        x_curr = env.true_step(X[0, 0], u0)
        if spec.shift_soln:
            X = np.concatenate([X[1:], X[-1:]], axis=0)
            U = np.concatenate([U[1:], U[-1:]], axis=0)

    return {"physical_state_traj": np.stack(phys),
            "u0_traj": np.stack([u[0] for u in inputs]),
            "final_state": x_curr, "last_plan_X": plans[-1],
            "last_plan_U": inputs[-1],
            # full post-solve (pre-shift) plans, enabling teacher-forced
            # per-step solve parity (no chaotic closed-loop amplification)
            "plan_X_traj": np.stack(plans),      # (n_steps, H+1, ns, nx)
            "plan_U_traj": np.stack(inputs)}     # (n_steps, H, nu)


def run_car_residual_true_dyn(params, spec, data, n_sqp_iter):
    """Car-residual ns=1 true-dynamics SQP (one MPC step, many SQP
    iterations — the flagship debug configuration,
    ref: params/params_car_residual.yaml:47-50,88)."""
    assert spec.ns == 1 and spec.true_dyn_as_sample
    env = CarResidualOracle(params)
    ocp = OracleOCP(params, spec, data)
    H, nx, nu = spec.H, spec.nx, spec.nu
    K = ocp.K

    x_curr = np.asarray(data.start, np.float64)
    X = np.tile(data.start, (H + 1, 1, 1))
    U = np.zeros((H, nu))
    iters = []
    best_step = np.inf
    stall_count = 0
    mono_count = 0
    alpha = 1.0
    for it in range(n_sqp_iter):
        Xs = X[:, 0]
        Ueff = U - (data.goal[None] - Xs[:H]) @ K.T \
            if spec.use_feedback else U
        val = np.zeros((1, H, nx))
        A = np.zeros((1, H, nx, nx))
        B = np.zeros((1, H, nx, nu))
        for k in range(H):
            val[0, k], A[0, k], B[0, k] = env.lin(Xs[k], Ueff[k])
        if spec.use_feedback:
            A[0] = A[0] + B[0] @ K
        sub = ocp.subproblem(X, U, A, B, val)
        sub["dx0"] = (x_curr - Xs[0])[None]
        dU, dX = solve_sparse_qp(1, H, nx, nu, **sub)
        # the same stall-gated under-relaxation as ocp/sqp.py's
        # consume_step (part of the solver spec; alpha=1 = pure RTI):
        # damping halves the applied step after STALL_WINDOW consecutive
        # iterations without a meaningful new raw-step-norm minimum (a
        # limit cycle of any period), and doubles back toward 1 after
        # RECOVER_WINDOW consecutive strict minima (the post-cycle creep)
        x_diff = np.linalg.norm(dX[0, :H]) / (np.linalg.norm(X[:H]) + 1e-6)
        u_diff = np.linalg.norm(dU) / (np.linalg.norm(U) + 1e-6)
        sn = x_diff + u_diff
        improved = sn < sqp_mod.STALL_SHRINK * best_step
        stall_count = 0 if improved else stall_count + 1
        mono_count = mono_count + 1 if sn < best_step else 0
        if stall_count >= sqp_mod.STALL_WINDOW and sn >= best_step:
            alpha = max(alpha * 0.5, sqp_mod.MIN_ALPHA)
            stall_count = 0
            mono_count = 0
        elif mono_count >= sqp_mod.RECOVER_WINDOW and alpha < 1.0:
            alpha = min(alpha * 2.0, 1.0)
            mono_count = 0
        best_step = min(best_step, sn)
        X = X + alpha * np.swapaxes(dX, 0, 1)
        U = U + alpha * dU
        iters.append((x_diff, u_diff))
        if x_diff < spec.tol_nlp and u_diff < spec.tol_nlp:
            break
    u0 = U[0].copy()
    if spec.use_feedback:
        u0 = u0 - K @ (data.goal - X[0, 0])
    return {"X": X, "U": U, "iters": iters,
            "x_next": env.true_step(X[0, 0], u0)}
