"""Assembly of the condensed QP from the linearized augmented OCP.

Everything here is linear algebra over the condensing maps
``dx_{i,k} = T[i,k] + Gamma[i,k] @ dU`` (see condense.py): the quadratic
cost, the hard two-sided rows (input box, per-sample state box, realized
feedback-input rows) and the soft rows (terminal ellipse, obstacle
ellipses), which get explicit slack variables with acados' z/Z penalty
convention.  Replaces acados' OCP-QP interface + HPIPM condensing
(ref: src/utils/ocp.py, src/utils/model.py).

Shapes:  T (ns, H+1, nx),  Gamma (ns, H+1, nx, nU),  Xbar (H+1, ns, nx),
         Ubar (H, nu),  nU = H*nu.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from sampling_gpmpc_tpu.config import ProblemSpec
from sampling_gpmpc_tpu.ocp.spec import OCPData
from sampling_gpmpc_tpu.parallel.collectives import make_reducers


class Rows(NamedTuple):
    G: jnp.ndarray    # (m, nU)
    lo: jnp.ndarray   # (m,)
    hi: jnp.ndarray   # (m,)


def row_counts(spec: ProblemSpec):
    """Static (canonical-hard, soft) row counts of the condensed QP.

    Must mirror build_hard_rows/build_soft_rows exactly; used to size the
    warm-start state carried across SQP/MPC iterations.  Under sharding the
    counts are per-shard (callers pass the local spec).
    """
    nU = spec.H * spec.nu
    n_hard = nU
    if spec.n_ellipses == 0:
        n_hard += spec.ns * spec.H * spec.nx
    if spec.use_feedback:
        n_hard += spec.ns * spec.H * spec.nu
    m_s = 0
    if spec.has_terminal_ellipse:
        m_s += spec.ns
    if spec.n_ellipses > 0:
        m_s += spec.ns * (spec.H + 1) * spec.n_ellipses
        m_s += spec.ns * spec.H * spec.nx
    return 2 * n_hard, m_s


def build_cost(spec: ProblemSpec, ocp: OCPData, T, Gamma, Xbar, Ubar,
               axis_name=None, ordered: bool = False):
    """Condensed Hessian/gradient of the (expected) tracking cost + LM.

    Per stage k and sample i the x-block Hessian is 2 w_i Q_k + lm I and the
    gradient 2 w_i Q_k (x̄+T-xref); both are pulled through Gamma.  The
    Levenberg-Marquardt term regularizes the QP *variable* dx = T + Gamma dU
    toward zero, exactly like acados adds lm*I to every stage Hessian
    (ref: src/utils/ocp.py:303-306).

    With ``axis_name`` (inside shard_map over the sample axis) the per-sample
    x-contributions are psum-reduced — this (nU², nU) reduction is the only
    cross-chip traffic of the cost assembly — and the replicated input blocks
    are added once afterwards.
    """
    H, nx, nu, ns = spec.H, spec.nx, spec.nu, spec.ns
    nU = H * nu
    Qk = jnp.concatenate([jnp.tile(ocp.Qs[None], (H, 1, 1)), ocp.Qe[None]])  # (H+1,nx,nx)

    # Hx[i,k] = 2 w_i Q_k + lm I
    Hx = 2.0 * ocp.w_cost[:, None, None, None] * Qk[None] \
        + ocp.lm * jnp.eye(nx, dtype=Qk.dtype)[None, None]

    xerr = jnp.swapaxes(Xbar, 0, 1) + T - ocp.xref[None]         # (ns, H+1, nx)
    grad_x = 2.0 * ocp.w_cost[:, None, None] * jnp.einsum(
        "kab,ikb->ika", Qk, xerr) + ocp.lm * T

    H_U = jnp.einsum("ikau,ikab,ikbv->uv", Gamma, Hx, Gamma)
    g_U = jnp.einsum("ikau,ika->u", Gamma, grad_x)
    if axis_name is not None:
        psum, _, _ = make_reducers(axis_name, ordered)
        H_U = psum(H_U)
        g_U = psum(g_U)

    # input blocks: Hu = 2 Qu + lm I, grad_u = 2 Qu ū (replicated, added once)
    Hu = 2.0 * ocp.Qu + ocp.lm * jnp.eye(nu, dtype=Qk.dtype)
    H_U = H_U + jnp.kron(jnp.eye(H, dtype=Qk.dtype), Hu)
    g_U = g_U + (2.0 * Ubar @ ocp.Qu).reshape(nU)
    return H_U, g_U


def build_hard_rows(spec: ProblemSpec, ocp: OCPData, T, Gamma, Xbar, Ubar) -> Rows:
    H, nx, nu, ns = spec.H, spec.nx, spec.nu, spec.ns
    nU = H * nu
    dtype = T.dtype
    xpred = jnp.swapaxes(Xbar, 0, 1) + T        # (ns, H+1, nx) iterate + free response

    rows_G, rows_lo, rows_hi = [], [], []

    # input box on the OCP variable u (v in feedback mode): du_k selector rows
    sel = jnp.eye(nU, dtype=dtype)   # du_k selector rows
    rows_G.append(sel)
    rows_lo.append((ocp.u_lo[None] - Ubar).reshape(nU))
    rows_hi.append((ocp.u_hi[None] - Ubar).reshape(nU))

    # per-sample state box, stages 1..H (acados lbx/ubx + tightened h-rows);
    # with ellipse obstacles present the box is soft (idxsbx) and emitted by
    # build_soft_rows instead (ref: src/utils/ocp.py:270-287)
    if spec.n_ellipses == 0:
        Gx = Gamma[:, 1:].reshape(ns * H * nx, nU)
        rows_G.append(Gx)
        rows_lo.append((ocp.x_lo[None, 1:] - xpred[:, 1:]).reshape(-1))
        rows_hi.append((ocp.x_hi[None, 1:] - xpred[:, 1:]).reshape(-1))

    if spec.use_feedback:
        # realized input u_fb = -K(x_eq - x_i,k) + u_k, stages 0..H-1
        # (ref: src/utils/ocp.py:63-91); rows: K Gamma + selector
        KG = jnp.einsum("ua,ikab->ikub", ocp.K_fb, Gamma[:, :H])   # (ns,H,nu,nU)
        sel_k = sel.reshape(H, nu, nU)
        G_fb = (KG + sel_k[None]).reshape(ns * H * nu, nU)
        h_bar = Ubar[None] - (ocp.x_eq[None, None] - xpred[:, :H]) @ ocp.K_fb.T
        rows_G.append(G_fb)
        rows_lo.append((ocp.fb_lo[None] - h_bar).reshape(-1))
        rows_hi.append((ocp.fb_hi[None] - h_bar).reshape(-1))

    return Rows(jnp.concatenate(rows_G), jnp.concatenate(rows_lo),
                jnp.concatenate(rows_hi))


def build_soft_rows(spec: ProblemSpec, ocp: OCPData, T, Gamma, Xbar):
    """Soft rows + their (zl, zu, Zl, Zu) penalty vectors."""
    H, nx, ns = spec.H, spec.nx, spec.ns
    nU = H * spec.nu
    dtype = T.dtype
    xpred = jnp.swapaxes(Xbar, 0, 1) + T
    BIG = jnp.asarray(1e8, dtype)

    G_list, lo_list, hi_list, pen = [], [], [], []

    if spec.has_terminal_ellipse:
        # (x_H - xf)' P (x_H - xf) in [0, delta^2], linearized at the iterate
        # (ref: src/utils/ocp.py:94-104,201-215)
        xe = jnp.swapaxes(Xbar, 0, 1)[:, H] - ocp.x_eq[None]       # (ns, nx)
        q0 = jnp.einsum("ia,ab,ib->i", xe, ocp.P_term, xe)
        J = 2.0 * xe @ ocp.P_term                                   # (ns, nx)
        G = jnp.einsum("ia,iau->iu", J, Gamma[:, H])
        const = q0 + jnp.einsum("ia,ia->i", J, T[:, H])
        G_list.append(G)
        lo_list.append(0.0 - const)
        hi_list.append(ocp.delta_sq - const)
        pen.append((ocp.zl_term, ocp.zu_term, ocp.Zl_term, ocp.Zu_term, ns))

    if spec.n_ellipses > 0:
        # obstacle ellipses (X-x0)^2/a + (Y-y0)^2/b >= f per sample+stage
        # (ref: src/utils/ocp.py:43-58,223-229), soft with path penalties
        e = ocp.ellipses                                            # (ne, 5)
        X0, Y0, a, b, fval = e[:, 0], e[:, 1], e[:, 2], e[:, 3], e[:, 4]
        px = xpred[:, :, 0][:, :, None] - X0[None, None]            # (ns,H+1,ne)
        py = xpred[:, :, 1][:, :, None] - Y0[None, None]
        q0 = px * px / a + py * py / b
        # gradient wrt (x, y) only
        Jx, Jy = 2 * px / a, 2 * py / b
        G = (Jx[..., None] * Gamma[:, :, 0][:, :, None, :]
             + Jy[..., None] * Gamma[:, :, 1][:, :, None, :])       # (ns,H+1,ne,nU)
        ne = spec.n_ellipses
        nrow = ns * (H + 1) * ne
        G_list.append(G.reshape(nrow, nU))
        lo_list.append((fval[None, None] - q0).reshape(nrow))
        hi_list.append(jnp.full((nrow,), BIG, dtype))
        pen.append((ocp.zl_path, ocp.zu_path, ocp.Zl_path, ocp.Zu_path, nrow))

        # with ellipses present the state box turns soft (idxsbx,
        # ref: src/utils/ocp.py:270-287) — emitted here instead of hard rows
        Gx = Gamma[:, 1:].reshape(ns * H * nx, nU)
        G_list.append(Gx)
        lo_list.append((ocp.x_lo[None, 1:] - xpred[:, 1:]).reshape(-1))
        hi_list.append((ocp.x_hi[None, 1:] - xpred[:, 1:]).reshape(-1))
        pen.append((ocp.zl_path, ocp.zu_path, ocp.Zl_path, ocp.Zu_path,
                    ns * H * nx))

    if not G_list:
        z = jnp.zeros((0,), dtype)
        return Rows(jnp.zeros((0, nU), dtype), z, z), (z, z, z, z)

    zl = jnp.concatenate([jnp.full((n,), zl_, dtype) for zl_, _, _, _, n in pen])
    zu = jnp.concatenate([jnp.full((n,), zu_, dtype) for _, zu_, _, _, n in pen])
    Zl = jnp.concatenate([jnp.full((n,), Zl_, dtype) for _, _, Zl_, _, n in pen])
    Zu = jnp.concatenate([jnp.full((n,), Zu_, dtype) for _, _, _, Zu_, n in pen])
    return Rows(jnp.concatenate(G_list), jnp.concatenate(lo_list),
                jnp.concatenate(hi_list)), (zl, zu, Zl, Zu)


def assemble_canonical(H_U, g_U, hard: Rows, soft: Rows, penalties):
    """Canonical QP over z = [dU; s_l; s_u]:  min 0.5 z'Pz + q'z, Cz <= d.

    Soft row j relaxes to  lo_j - s_l <= G_j dU <= hi_j + s_u,  s >= 0, with
    cost z's + 0.5 s'Z s (acados convention, ref: ocp.py:205-215).
    """
    zl, zu, Zl, Zu = penalties
    nU = g_U.shape[0]
    m_s = soft.G.shape[0]
    dtype = g_U.dtype

    nz = nU + 2 * m_s
    P = jnp.zeros((nz, nz), dtype)
    P = P.at[:nU, :nU].set(H_U)
    if m_s:
        P = P.at[jnp.arange(nU, nU + m_s), jnp.arange(nU, nU + m_s)].set(Zl)
        P = P.at[jnp.arange(nU + m_s, nz), jnp.arange(nU + m_s, nz)].set(Zu)
    q = jnp.concatenate([g_U, zl, zu])

    Zb = jnp.zeros((hard.G.shape[0], m_s), dtype)
    I = jnp.eye(m_s, dtype=dtype)
    Z0 = jnp.zeros((m_s, m_s), dtype)
    C = jnp.concatenate([
        jnp.concatenate([hard.G, Zb, Zb], axis=1),
        jnp.concatenate([-hard.G, Zb, Zb], axis=1),
        jnp.concatenate([soft.G, Z0, -I], axis=1),
        jnp.concatenate([-soft.G, -I, Z0], axis=1),
        jnp.concatenate([jnp.zeros((2 * m_s, nU), dtype),
                         -jnp.eye(2 * m_s, dtype=dtype)], axis=1),
    ])
    d = jnp.concatenate([hard.hi, -hard.lo, soft.hi, -soft.lo,
                         jnp.zeros(2 * m_s, dtype)])
    return P, q, C, d
