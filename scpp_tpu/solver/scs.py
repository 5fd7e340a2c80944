"""Batched first-order conic solver (homogeneous self-dual ADMM).

TPU-native replacement for the ECOS sparse interior-point solver behind the
reference's Epigraph layer (SURVEY §2 V3; used at SCAlgorithm.cpp:63,78).
Interior-point is branchy and factorization-heavy; instead we run the
SCS-style Douglas-Rachford splitting on the homogeneous self-dual
embedding (O'Donoghue et al., "Conic Optimization via Operator Splitting
and Homogeneous Self-Dual Embedding"):

    u = (x, y, tau),  v = (0, s, kappa)
    u~    <- (I + Q)^-1 (u + v)          Q = [[0, A', c], [-A, 0, b], [-c', -b', 0]]
    u     <- Pi_C(alpha u~ + (1-alpha) u - v),   C = R^n x K* x R+
    v     <- v - (alpha u~ + (1-alpha) u) + u

Everything is dense linear algebra + elementwise cone projections with a
*fixed* iteration count: a pure jnp function of (A, b, c) that jits,
vmaps over scenario batches, and runs entirely on-chip — re-solves with
updated parameters are just calls of the compiled function. The linear
system reduces to one SPD solve with (I + A'A), whose inverse is formed
once per problem instance so each iteration is two A-matvecs and one
(n, n) matvec — batched MXU matmuls under vmap.

Ruiz equilibration preconditions A (rows within one SOC block share a
scale so cone membership is preserved), which together with the models'
nondimensionalization gives fp32-viable conditioning on TPU.

STATUS (r04): experimental / test-oracle, NOT the production conic
backend. The north star names "batched first-order conic solver
(PDHG/ADMM)" as the ECOS replacement, but measured head-to-head the
interior-point backends (solver/ipm.py dense, solver/ipm_staged.py
staged) dominate on every production path: SC/SCvx subproblems need
~1e-5 feasibility that fixed-budget fp32 ADMM cannot reach, and warm MPC
re-solves stall at ~5e-4 residuals (above the 1e-4 solved threshold)
with accuracy DEGRADING as iterations increase — an fp32 first-order
floor plus warm-chain drift, reproduced on CPU and TPU at stock shapes
(see bench.py mpc_resolve lines and VERDICT r03 #5). Kept as an
independent algorithm family for cross-checking the IPMs and for the
Pallas SOC-projection kernel it hosts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from scpp_tpu.solver.builder import ConicProgram

__all__ = ["SolverSettings", "SolverResult", "solve_conic", "project_dual_cone"]

_P = jax.lax.Precision.HIGHEST


@struct.dataclass
class SolverSettings:
    iters: int = struct.field(pytree_node=False, default=400)
    ruiz_iters: int = struct.field(pytree_node=False, default=10)
    alpha: float = struct.field(pytree_node=False, default=1.5)   # over-relaxation
    eps: float = struct.field(pytree_node=False, default=1e-6)    # residual target
    warm_start: bool = struct.field(pytree_node=False, default=False)
    # Anderson acceleration (type-II with growth-reset safeguard, as in
    # SCS 2.x): memory 0 disables
    aa_memory: int = struct.field(pytree_node=False, default=10)
    aa_reg: float = struct.field(pytree_node=False, default=1e-8)
    aa_safeguard: float = struct.field(pytree_node=False, default=2.0)
    # route the per-iteration SOC projections through the Pallas TPU
    # kernel (ops/soc_pallas.py) — one fused VMEM pass per size group
    # instead of gather/norm/where/scatter HLOs; TPU targets only
    use_pallas: bool = struct.field(pytree_node=False, default=False)


@struct.dataclass
class SolverResult:
    x: jnp.ndarray
    y: jnp.ndarray
    s: jnp.ndarray
    obj: jnp.ndarray
    res_pri: jnp.ndarray
    res_dua: jnp.ndarray
    res_gap: jnp.ndarray
    tau: jnp.ndarray
    kappa: jnp.ndarray
    # internal scaled iterates for warm starting the next solve
    u: jnp.ndarray
    v: jnp.ndarray

    @property
    def solved(self):
        return (self.res_pri < 1e-4) & (self.res_dua < 1e-4) & (self.res_gap < 1e-4)


def _soc_groups(prog: ConicProgram):
    """Static row-index groups of equal-size SOC blocks."""
    off = prog.n_eq + prog.n_ineq
    groups = {}
    for size in prog.soc_sizes:
        groups.setdefault(size, []).append(off)
        off += size
    return {size: np.asarray(heads) for size, heads in groups.items()}


def _project_soc_blocks(w, idx, use_pallas=False):
    """Project stacked SOC blocks. w: (m,), idx: (G, size) static."""
    blk = w[idx]                       # (G, size)
    if use_pallas:
        from scpp_tpu.ops.soc_pallas import soc_project_blocks
        return w.at[idx].set(soc_project_blocks(blk))
    t = blk[:, 0]
    z = blk[:, 1:]
    zn = jnp.linalg.norm(z, axis=1)
    safe = jnp.maximum(zn, 1e-30)
    inside = zn <= t
    below = zn <= -t
    a = 0.5 * (t + zn)
    t_new = jnp.where(inside, t, jnp.where(below, 0.0, a))
    z_scale = jnp.where(inside, 1.0, jnp.where(below, 0.0, a / safe))
    z_new = z * z_scale[:, None]
    proj = jnp.concatenate([t_new[:, None], z_new], axis=1)
    return w.at[idx].set(proj)


def project_dual_cone(w, prog: ConicProgram, groups=None, use_pallas=False):
    """Project onto K* = R^n_eq x R+^n_ineq x prod SOC (SOC self-dual)."""
    if groups is None:
        groups = _soc_groups(prog)
    ne, ni = prog.n_eq, prog.n_ineq
    out = w
    if ni:
        out = out.at[ne:ne + ni].set(jnp.maximum(out[ne:ne + ni], 0.0))
    for size, heads in groups.items():
        idx = heads[:, None] + np.arange(size)[None, :]
        out = _project_soc_blocks(out, idx, use_pallas)
    return out


def project_primal_cone(w, prog: ConicProgram, groups=None, use_pallas=False):
    """Project onto K = {0}^n_eq x R+^n_ineq x prod SOC (for s)."""
    if groups is None:
        groups = _soc_groups(prog)
    ne, ni = prog.n_eq, prog.n_ineq
    out = w
    if ne:
        out = out.at[:ne].set(0.0)
    if ni:
        out = out.at[ne:ne + ni].set(jnp.maximum(out[ne:ne + ni], 0.0))
    for size, heads in groups.items():
        idx = heads[:, None] + np.arange(size)[None, :]
        out = _project_soc_blocks(out, idx, use_pallas)
    return out


def _ruiz(A, prog: ConicProgram, groups, iters: int):
    """Ruiz equilibration with cone-block-uniform row scaling."""
    m, n = A.shape
    D = jnp.ones(m, A.dtype)
    E = jnp.ones(n, A.dtype)
    if m == 0 or n == 0:
        return A, D, E

    # map each row to its cone group (SOC rows share) for uniform scaling
    ne, ni = prog.n_eq, prog.n_ineq
    group_id = np.arange(m)
    gid = ne + ni
    off = ne + ni
    for size in prog.soc_sizes:
        group_id[off:off + size] = gid
        gid += 1
        off += size
    group_id = jnp.asarray(group_id)
    num_groups = int(gid)

    def body(carry, _):
        A_s, D_s, E_s = carry
        row_norm = jnp.max(jnp.abs(A_s), axis=1)
        # uniform within SOC blocks: take the max over each group
        gmax = jax.ops.segment_max(row_norm, group_id, num_segments=num_groups)
        row_norm = gmax[group_id]
        d = 1.0 / jnp.sqrt(jnp.maximum(row_norm, 1e-12))
        d = jnp.where(row_norm < 1e-12, 1.0, d)
        col_norm = jnp.max(jnp.abs(A_s) * d[:, None], axis=0)
        e = 1.0 / jnp.sqrt(jnp.maximum(col_norm, 1e-12))
        e = jnp.where(col_norm < 1e-12, 1.0, e)
        A_new = d[:, None] * A_s * e[None, :]
        return (A_new, D_s * d, E_s * e), None

    (A_s, D, E), _ = jax.lax.scan(body, (A, D, E), None, length=iters)
    return A_s, D, E


def solve_conic(prog: ConicProgram, settings: SolverSettings = SolverSettings(),
                warm: "SolverResult" = None) -> SolverResult:
    """Solve min c'x s.t. Ax + s = b, s in K. Pure jnp; jit/vmap friendly."""
    # full-precision matmuls: fp32-on-TPU otherwise runs bf16 MXU passes
    with jax.default_matmul_precision("highest"):
        return _solve_conic_impl(prog, settings, warm)


def _solve_conic_impl(prog: ConicProgram, settings: SolverSettings,
                      warm: "SolverResult") -> SolverResult:
    A0, b0, c0 = prog.A, prog.b, prog.c
    m, n = A0.shape
    dtype = A0.dtype
    groups = _soc_groups(prog)

    # ---- preconditioning ----
    A, D, E = _ruiz(A0, prog, groups, settings.ruiz_iters)
    b = D * b0
    c = E * c0
    # scalar normalization: bring ||b||, ||c|| to O(1) so the HSD
    # denominator 1 + (c,b)' M^-1 (c,b) stays O(1) and tau moves at a
    # healthy rate (large ||c|| otherwise crushes tau toward 0)
    scale_b = 1.0 / (1.0 + jnp.linalg.norm(b))
    scale_c = 1.0 / (1.0 + jnp.linalg.norm(c))
    b = b * scale_b
    c = c * scale_c

    # ---- cached linear algebra ----
    AtA = A.T @ A
    F = jnp.linalg.inv(jnp.eye(n, dtype=dtype) + AtA)

    def lin_solve(wx, wy):
        x = F @ (wx - A.T @ wy)
        y = wy + A @ x
        return x, y

    z1x, z1y = lin_solve(c, b)
    denom = 1.0 + c @ z1x + b @ z1y

    def proj_C(u):
        """C = R^n x K* x R+ (free x, dual-cone y, nonneg tau)."""
        y = project_dual_cone(u[n:n + m], prog, groups,
                              use_pallas=settings.use_pallas)
        tau = jnp.maximum(u[-1], 0.0)
        return jnp.concatenate([u[:n], y, tau[None]])

    alpha = settings.alpha

    L = n + m + 1

    def T(wvec):
        """One Douglas-Rachford application on the stacked (u, v) state."""
        u, v = wvec[:L], wvec[L:]
        w = u + v
        z2x, z2y = lin_solve(w[:n], w[n:n + m])
        tau_t = (w[-1] + c @ z2x + b @ z2y) / denom
        ux = z2x - tau_t * z1x
        uy = z2y - tau_t * z1y
        u_t = jnp.concatenate([ux, uy, tau_t[None]])
        u_r = alpha * u_t + (1.0 - alpha) * u
        u_new = proj_C(u_r - v)
        v_new = v - u_r + u_new
        return jnp.concatenate([u_new, v_new])

    if settings.warm_start and warm is not None:
        u0, v0 = warm.u, warm.v
    else:
        u0 = jnp.zeros(L, dtype).at[-1].set(1.0)
        v0 = jnp.zeros(L, dtype).at[-1].set(1.0)
    w0 = jnp.concatenate([u0, v0])

    M = settings.aa_memory
    if M == 0:
        def iteration(wc, _):
            return T(wc), None

        w_final, _ = jax.lax.scan(iteration, w0, None, length=settings.iters)
    else:
        # Anderson acceleration (type II) on the DR fixed-point map with a
        # growth-reset safeguard (SCS 2.x style): when the residual grows
        # by more than `aa_safeguard`x, take a plain step and clear history.
        N2 = 2 * L

        def iteration(carry, _):
            wc, w_prev, g_prev, gnorm_prev, S, Y, cnt = carry
            Tw = T(wc)
            g = Tw - wc
            gnorm = jnp.linalg.norm(g)

            grew = gnorm > settings.aa_safeguard * gnorm_prev
            do_reset = jnp.logical_and(cnt > 0, grew)
            cnt_eff = jnp.where(do_reset, 0, cnt)

            row = jnp.maximum(cnt_eff - 1, 0) % M
            dw = wc - w_prev
            dg = g - g_prev
            update_hist = cnt_eff > 0
            S2 = jnp.where(update_hist, S.at[row].set(dw), S)
            Y2 = jnp.where(update_hist, Y.at[row].set(dg), Y)

            m_eff = jnp.minimum(cnt_eff, M)
            valid = (jnp.arange(M) < m_eff).astype(dtype)
            Yv = Y2 * valid[:, None]
            G = Yv @ Yv.T + settings.aa_reg * (1.0 + gnorm * gnorm) * \
                jnp.eye(M, dtype=dtype)
            gamma = jnp.linalg.solve(G, Yv @ g) * valid
            w_aa = wc + g - (S2 + Y2).T @ gamma

            use_aa = jnp.logical_and(cnt_eff > 0,
                                     jnp.all(jnp.isfinite(w_aa)))
            w_next = jnp.where(use_aa, w_aa, Tw)
            return (w_next, wc, g, gnorm, S2, Y2, cnt_eff + 1), None

        carry0 = (w0, w0, jnp.zeros(N2, dtype),
                  jnp.asarray(jnp.inf, dtype),
                  jnp.zeros((M, N2), dtype), jnp.zeros((M, N2), dtype),
                  jnp.asarray(0, jnp.int32))
        (w_final, *_), _ = jax.lax.scan(iteration, carry0, None,
                                        length=settings.iters)
        # one final plain DR application guarantees the iterate is a
        # proper projection output (AA steps may leave the cone slightly)
        w_final = T(w_final)

    u, v = w_final[:L], w_final[L:]

    # ---- recover unscaled solution ----
    tau = u[-1]
    kappa = v[-1]
    safe_tau = jnp.maximum(tau, 1e-12)
    x_hat = u[:n] / safe_tau
    y_hat = u[n:n + m] / safe_tau
    s_hat = v[n:n + m] / safe_tau

    # scaled problem: min (scale_c E c)'x^ s.t. (DAE) x^ + s^ = scale_b D b.
    # rhs scaling multiplies primal solutions, cost scaling multiplies
    # duals: x = E x^ / scale_b, s = D^-1 s^ / scale_b, y = D y^ / scale_c.
    x = E * x_hat / scale_b
    y = D * y_hat / scale_c
    s = s_hat / D / scale_b

    obj = c0 @ x
    res_pri = jnp.linalg.norm(A0 @ x + s - b0) / (1.0 + jnp.linalg.norm(b0))
    res_dua = jnp.linalg.norm(A0.T @ y + c0) / (1.0 + jnp.linalg.norm(c0))
    by = b0 @ y
    cx = obj
    res_gap = jnp.abs(cx + by) / (1.0 + jnp.abs(cx) + jnp.abs(by))

    return SolverResult(
        x=x, y=y, s=s, obj=obj,
        res_pri=res_pri, res_dua=res_dua, res_gap=res_gap,
        tau=tau, kappa=kappa, u=u, v=v,
    )
