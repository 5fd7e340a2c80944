"""Stage-structured conic programs: vectorized emission + banded layout.

The trajectory subproblems (SCProblem.cpp / SCvxProblem.cpp + model
application constraints) are *stagewise*: every constraint row touches the
variables of one node k, of two adjacent nodes (the linearized dynamics
chain, SCProblem.cpp:37-59), or a handful of global scalars (sigma and its
trust region).  This module represents that structure explicitly:

  - variables are per-node blocks (stacked over K) plus a small global
    block; the stage vector x_k has static width w,
  - constraints are *families*: one symbolic expression emitted for a
    static set of nodes at once, with coefficients that are either shared
    (static) or batched ``(n_nodes, ...)`` arrays (the traced A_k, B_k...),
  - emission is one scatter per (family, term) instead of one per row —
    the dense builder's per-row emission is what made XLA chew minutes of
    compile time on K=30 problems,
  - the result keeps rows grouped by stage, which is exactly what the
    block-tridiagonal KKT factorization (solver/staged_kkt.py) consumes.

Standard form per stage (same cone convention as ConicProgram):
rows of stage k act on [x_k | x_{k+1} | x_glob] and read
``A x + s = b, s in {0}^me x R+^l x SOC(q_1) x ...``; padded rows (a
family masked off at some node) are 0 = 0 equalities / 0 <= 1 slacks /
(1, 0...) SOC blocks, all strictly interior and inert.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

from scpp_tpu.solver.affine import Aff, Var, concat

__all__ = ["StagedBuilder", "StagedProgram", "NodeVar", "NodeExpr"]


def _is_static(x) -> bool:
    return isinstance(x, (np.ndarray, float, int, np.floating, np.integer))


class NodeExpr:
    """Affine expression over per-node variables at a generic node k.

    ``terms[(name, shift)]`` maps a stage variable (shift 0 = node k,
    shift 1 = node k+1) or a global variable (shift None) to a coefficient
    of shape (dim, var_width) — shared across nodes — or
    (n_nodes, dim, var_width) — batched per node.  ``const`` is (dim,) or
    (n_nodes, dim).
    """

    __slots__ = ("dim", "terms", "const")
    __array_priority__ = 1000

    def __init__(self, dim: int, terms: Dict, const):
        self.dim = int(dim)
        self.terms = terms
        self.const = const

    # ---- arithmetic ----

    @staticmethod
    def _const(value, dim) -> "NodeExpr":
        v = value if _is_static(value) else jnp.asarray(value)
        if _is_static(v):
            v = np.asarray(v, dtype=np.float64)
        if v.ndim == 0:
            v = (np.broadcast_to(v, (dim,)) if _is_static(v)
                 else jnp.broadcast_to(v, (dim,)))
        return NodeExpr(dim, {}, v)

    def __add__(self, other) -> "NodeExpr":
        if not isinstance(other, NodeExpr):
            other = NodeExpr._const(other, self.dim)
        if other.dim != self.dim:
            raise ValueError(f"dim mismatch {self.dim} vs {other.dim}")
        terms = dict(self.terms)
        for k, M in other.terms.items():
            terms[k] = terms[k] + M if k in terms else M
        return NodeExpr(self.dim, terms, self.const + other.const)

    __radd__ = __add__

    def __neg__(self) -> "NodeExpr":
        return NodeExpr(self.dim, {k: -M for k, M in self.terms.items()},
                        -self.const)

    def __sub__(self, other) -> "NodeExpr":
        if not isinstance(other, NodeExpr):
            other = NodeExpr._const(other, self.dim)
        return self + (-other)

    def __rsub__(self, other) -> "NodeExpr":
        return (-self) + NodeExpr._const(other, self.dim)

    def __mul__(self, s) -> "NodeExpr":
        """Scale by a scalar (static or traced)."""
        if isinstance(s, NodeExpr):
            raise TypeError("NodeExpr*NodeExpr is not affine")
        sn = np.asarray(s, np.float64) if _is_static(s) else jnp.asarray(s)
        if sn.ndim != 0:
            raise ValueError("only scalar scaling on NodeExpr")
        return NodeExpr(self.dim,
                        {k: sn * M for k, M in self.terms.items()},
                        sn * self.const)

    __rmul__ = __mul__

    def __truediv__(self, s) -> "NodeExpr":
        return self * (1.0 / s)

    def sum(self) -> "NodeExpr":
        ones = np.ones((1, self.dim))
        terms = {}
        for k, M in self.terms.items():
            terms[k] = (ones @ M if M.ndim == 2
                        else jnp.einsum("od,bdw->bow", ones, M)
                        if not _is_static(M)
                        else np.einsum("od,bdw->bow", ones, M))
        c = self.const
        const = (c.sum(-1, keepdims=True) if not np.isscalar(c) else c)
        return NodeExpr(1, terms, const)


def node_concat(exprs) -> NodeExpr:
    """Stack NodeExprs along the row dimension."""
    exprs = [e if isinstance(e, NodeExpr) else NodeExpr._const(e, 1)
             for e in exprs]
    dim = sum(e.dim for e in exprs)
    keys = {}
    for e in exprs:
        for k, M in e.terms.items():
            keys[k] = M.shape[-1]
    terms = {}
    for key, w in keys.items():
        blocks, batched = [], None
        for e in exprs:
            M = e.terms.get(key)
            if M is not None and M.ndim == 3:
                batched = M.shape[0]
        for e in exprs:
            M = e.terms.get(key)
            if M is None:
                M = np.zeros((e.dim, w))
            if batched is not None and M.ndim == 2:
                M = (np.broadcast_to(M, (batched,) + M.shape)
                     if _is_static(M)
                     else jnp.broadcast_to(M, (batched,) + M.shape))
            blocks.append(M)
        traced = any(not _is_static(b) for b in blocks)
        terms[key] = (jnp.concatenate if traced else np.concatenate)(
            blocks, axis=-2)
    consts = []
    batched = None
    for e in exprs:
        c = e.const
        if not np.isscalar(c) and getattr(c, "ndim", 0) == 2:
            batched = c.shape[0]
    for e in exprs:
        c = e.const
        c = np.atleast_1d(c) if _is_static(c) else jnp.atleast_1d(c)
        if batched is not None and c.ndim == 1:
            c = (np.broadcast_to(c, (batched,) + c.shape) if _is_static(c)
                 else jnp.broadcast_to(c, (batched,) + c.shape))
        consts.append(c)
    traced_c = any(not _is_static(c) for c in consts)
    const = (jnp.concatenate if traced_c else np.concatenate)(consts, axis=-1)
    return NodeExpr(dim, terms, const)


class NodeVar:
    """A per-node variable block of width d (one copy at every stage)."""

    __slots__ = ("name", "d", "n_nodes", "shift")

    def __init__(self, name: str, d: int, n_nodes: int, shift: int = 0):
        self.name = name
        self.d = int(d)
        self.n_nodes = n_nodes
        self.shift = shift

    @property
    def next(self) -> "NodeVar":
        """This variable at node k+1 (for link constraints)."""
        return NodeVar(self.name, self.d, self.n_nodes, self.shift + 1)

    def sel(self, idx=...) -> NodeExpr:
        """Select components: x_k[idx] as a NodeExpr."""
        sel = np.atleast_1d(np.arange(self.d)[idx]).ravel()
        M = np.zeros((sel.size, self.d))
        M[np.arange(sel.size), sel] = 1.0
        return NodeExpr(sel.size, {(self.name, self.shift): M},
                        np.zeros(sel.size))

    def lin(self, M, idx=None) -> NodeExpr:
        """M @ x_k[idx]; M: (r, dsub) shared or (n_nodes, r, dsub) batched."""
        M = M if _is_static(M) else jnp.asarray(M)
        if M.ndim == 1:
            M = M[None, :] if _is_static(M) else M[None, :]
        if idx is None and M.shape[-1] != self.d:
            raise ValueError(f"lin coeff width {M.shape[-1]} != {self.d}")
        if idx is not None:
            sel = np.atleast_1d(np.arange(self.d)[idx]).ravel()
            if M.shape[-1] != sel.size:
                raise ValueError("lin idx width mismatch")
            if M.ndim == 2:
                full = np.zeros(M.shape[:-1] + (self.d,)) if _is_static(M) \
                    else jnp.zeros(M.shape[:-1] + (self.d,), M.dtype)
                M = full.at[..., sel].set(M) if not _is_static(M) else \
                    _np_embed(full, sel, M)
            else:
                full = (np.zeros(M.shape[:-1] + (self.d,)) if _is_static(M)
                        else jnp.zeros(M.shape[:-1] + (self.d,), M.dtype))
                M = full.at[..., sel].set(M) if not _is_static(M) else \
                    _np_embed(full, sel, M)
        r = M.shape[-2]
        const = np.zeros(r) if M.ndim == 2 else (
            np.zeros((M.shape[0], r)) if _is_static(M)
            else np.zeros((M.shape[0], r)))
        return NodeExpr(r, {(self.name, self.shift): M}, const)


def _np_embed(full, sel, M):
    full = np.array(full)
    full[..., sel] = M
    return full


class GlobalRef:
    """Wrapper giving a global variable a NodeExpr interface for use in
    *node* rows (e.g. sigma's s_k column in the dynamics)."""

    __slots__ = ("var",)

    def __init__(self, var: Var):
        self.var = var

    def node_lin(self, M) -> NodeExpr:
        """M @ g; M: (r, gd) shared or (n_nodes, r, gd) batched."""
        M = M if _is_static(M) else jnp.asarray(M)
        r = M.shape[-2]
        const = np.zeros(r) if M.ndim == 2 else np.zeros((M.shape[0], r))
        return NodeExpr(r, {(self.var.name, None): M}, const)


@struct.dataclass
class StagedProgram:
    """Stage-banded standard-form conic program.

    Row groups (cone order per stage: zero/eq, nonneg, SOCs):
      - stage rows act on columns [x_k (w) | x_{k+1} (w) | x_glob (g)]
      - global rows act on x_glob only.
    """

    A_eq: jnp.ndarray            # (K, me, 2w+g)
    b_eq: jnp.ndarray            # (K, me)
    G: jnp.ndarray               # (K, mc, 2w+g)
    h: jnp.ndarray               # (K, mc)
    A_geq: jnp.ndarray           # (meg, g)
    b_geq: jnp.ndarray           # (meg,)
    G_g: jnp.ndarray             # (mcg, g)
    h_g: jnp.ndarray             # (mcg,)
    c_stage: jnp.ndarray         # (K, w)
    c_glob: jnp.ndarray          # (g,)
    K: int = struct.field(pytree_node=False)
    w: int = struct.field(pytree_node=False)
    g: int = struct.field(pytree_node=False)
    l: int = struct.field(pytree_node=False)               # nonneg per stage
    soc_sizes: Tuple[int, ...] = struct.field(pytree_node=False)
    l_g: int = struct.field(pytree_node=False)
    soc_sizes_g: Tuple[int, ...] = struct.field(pytree_node=False)
    # (name, offset, d, n_nodes) per stage var; (name, offset, size) global
    stage_layout: Tuple[Tuple[str, int, int, int], ...] = \
        struct.field(pytree_node=False)
    glob_layout: Tuple[Tuple[str, int, int], ...] = \
        struct.field(pytree_node=False)

    @property
    def me(self) -> int:
        return self.A_eq.shape[-2]

    @property
    def mc(self) -> int:
        return self.G.shape[-2]

    def to_dense(self):
        """Lower to a flat :class:`ConicProgram` (oracle/debug path).

        Column order: [x_0 | x_1 | ... | x_{K-1} | x_glob]; rows reordered
        into the dense cone convention [all eq | all nonneg | SOC blocks].
        """
        from scpp_tpu.solver.builder import ConicProgram
        K, w, g = self.K, self.w, self.g
        n = K * w + g
        dtype = self.A_eq.dtype

        def expand(rows_staged):
            """(K, m, 2w+g) -> (K*m, n)."""
            m = rows_staged.shape[1]
            out = jnp.zeros((K, m, n), dtype)
            for k in range(K):
                out = out.at[k, :, k * w:(k + 1) * w].set(
                    rows_staged[k, :, :w])
                if k + 1 < K:
                    out = out.at[k, :, (k + 1) * w:(k + 2) * w].set(
                        rows_staged[k, :, w:2 * w])
                if g:
                    out = out.at[k, :, K * w:].set(rows_staged[k, :, 2 * w:])
            return out.reshape(K * m, n)

        def expand_g(rows_g):
            m = rows_g.shape[0]
            out = jnp.zeros((m, n), dtype)
            if g:
                out = out.at[:, K * w:].set(rows_g)
            return out

        A_rows = [expand(self.A_eq), expand_g(self.A_geq)]
        b_rows = [self.b_eq.reshape(-1), self.b_geq]
        n_eq = K * self.me + self.A_geq.shape[0]

        G_full = expand(self.G).reshape(K, self.mc, n)
        A_rows.append(G_full[:, :self.l].reshape(-1, n))
        b_rows.append(self.h[:, :self.l].reshape(-1))
        if self.l_g:
            A_rows.append(expand_g(self.G_g[:self.l_g]))
            b_rows.append(self.h_g[:self.l_g])
        n_ineq = K * self.l + self.l_g

        soc_sizes = []
        off = self.l
        for q in self.soc_sizes:
            for k in range(K):
                A_rows.append(G_full[k, off:off + q])
                b_rows.append(self.h[k, off:off + q])
                soc_sizes.append(q)
            off += q
        off = self.l_g
        for q in self.soc_sizes_g:
            A_rows.append(expand_g(self.G_g[off:off + q]))
            b_rows.append(self.h_g[off:off + q])
            soc_sizes.append(q)
            off += q

        c = jnp.concatenate([self.c_stage.reshape(-1), self.c_glob])
        var_layout = tuple(
            (nm, 0, (0,)) for nm in ())  # dense extract unsupported
        return ConicProgram(
            A=jnp.concatenate(A_rows, axis=0),
            b=jnp.concatenate(b_rows),
            c=c, n_eq=n_eq, n_ineq=n_ineq,
            soc_sizes=tuple(soc_sizes), var_layout=var_layout)

    def extract(self, sol, name: str) -> jnp.ndarray:
        """Pull a named variable out of a (x_stage: (..., K, w),
        x_glob: (..., g)) solution pair."""
        x_stage, x_glob = sol
        for nm, off, d, n_nodes in self.stage_layout:
            if nm == name:
                v = x_stage[..., :n_nodes, off:off + d]
                return v
        for nm, off, size in self.glob_layout:
            if nm == name:
                v = x_glob[..., off:off + size]
                return v[..., 0] if size == 1 else v
        raise KeyError(name)


class StagedBuilder:
    """Collects per-node constraint families + global rows, emits a
    :class:`StagedProgram` with one scatter per (family, term)."""

    def __init__(self, K: int):
        self.K = int(K)
        self._svars: List[Tuple[str, int, int]] = []   # (name, d, n_nodes)
        self._soff: Dict[str, int] = {}
        self._gvars: Dict[str, Var] = {}
        self._goff: Dict[str, int] = {}
        self._gwidth = 0
        # families: (expr, node_idx np.ndarray)
        self._eq: List[Tuple[NodeExpr, np.ndarray]] = []
        self._nonneg: List[Tuple[NodeExpr, np.ndarray]] = []
        self._socs: List[Tuple[NodeExpr, np.ndarray]] = []
        self._soc_sizes: List[int] = []
        self._cost: List[Tuple[NodeExpr, np.ndarray]] = []
        # global rows as plain Affs over the global vars
        self._geq: List[Aff] = []
        self._gnonneg: List[Aff] = []
        self._gsocs: List[Aff] = []
        self._gsoc_sizes: List[int] = []
        self._gcost: Aff = Aff.constant(0.0)

    # ---- variables ----

    def stage_var(self, name: str, d: int, n_nodes: Optional[int] = None
                  ) -> NodeVar:
        """Per-node variable of width d.  ``n_nodes`` < K (e.g. K-1 for the
        virtual control) only affects extract(); a padded, inert copy still
        exists at the remaining stages."""
        if name in self._soff or name in self._goff:
            raise ValueError(f"duplicate variable {name!r}")
        n_nodes = self.K if n_nodes is None else int(n_nodes)
        self._soff[name] = sum(v[1] for v in self._svars)
        self._svars.append((name, int(d), n_nodes))
        return NodeVar(name, d, n_nodes)

    def global_var(self, name: str, size: int = 1) -> Tuple[Var, GlobalRef]:
        if name in self._soff or name in self._goff:
            raise ValueError(f"duplicate variable {name!r}")
        v = Var(name, (size,) if size > 1 else ())
        self._gvars[name] = v
        self._goff[name] = self._gwidth
        self._gwidth += v.size
        return v, GlobalRef(v)

    # ---- node constraint families ----

    def _nodes(self, expr: NodeExpr, nodes) -> np.ndarray:
        if nodes is None:
            linked = any(sh == 1 for (_, sh) in expr.terms.keys())
            idx = np.arange(self.K - 1 if linked else self.K)
        else:
            idx = np.atleast_1d(np.arange(self.K)[nodes]).ravel()
        # batched coefficients must match the node count
        for key, M in expr.terms.items():
            if M.ndim == 3 and M.shape[0] != idx.size:
                raise ValueError(
                    f"batched coeff for {key} has {M.shape[0]} slices for "
                    f"{idx.size} nodes")
        c = expr.const
        if not np.isscalar(c) and getattr(c, "ndim", 0) == 2 \
                and c.shape[0] != idx.size:
            raise ValueError("batched const node-count mismatch")
        return idx

    def eq(self, expr: NodeExpr, nodes=None):
        """expr == 0 at each selected node (default: all valid nodes)."""
        self._eq.append((expr, self._nodes(expr, nodes)))

    def nonneg(self, expr: NodeExpr, nodes=None):
        """expr >= 0 elementwise at each selected node."""
        self._nonneg.append((expr, self._nodes(expr, nodes)))

    def soc(self, t: NodeExpr, z: NodeExpr, nodes=None):
        """||z||_2 <= t at each selected node; t may be a plain scalar."""
        if not isinstance(t, NodeExpr):
            t = NodeExpr._const(t, 1)
        if t.dim != 1:
            raise ValueError("SOC t must be scalar")
        stacked = node_concat([t, z])
        self._socs.append((stacked, self._nodes(stacked, nodes)))
        self._soc_sizes.append(stacked.dim)

    def cost(self, expr: NodeExpr, nodes=None):
        """Add sum_k expr_k (scalar per node) to the objective."""
        if expr.dim != 1:
            raise ValueError("cost must be scalar per node")
        self._cost.append((expr, self._nodes(expr, nodes)))

    # ---- global rows ----

    def g_eq(self, aff: Aff):
        self._geq.append(aff)

    def g_nonneg(self, aff: Aff):
        self._gnonneg.append(aff)

    def g_soc(self, t: Aff, z: Aff):
        stacked = concat([t, z])
        self._gsocs.append(stacked)
        self._gsoc_sizes.append(stacked.dim)

    def g_cost(self, aff: Aff):
        self._gcost = self._gcost + aff

    # ---- emission ----

    def build(self, dtype=None) -> StagedProgram:
        dtype = dtype or jnp.zeros(0).dtype
        K = self.K
        w = sum(v[1] for v in self._svars)
        g = self._gwidth
        C = 2 * w + g

        def emit(families, negate, pack=False):
            """families: list of (expr, node_idx); returns (K, M, C), (K, M).

            negate=True for cone rows (s = expr => A = -M, b = const);
            negate=False for equalities (A = M, b = -const).

            ``pack=True`` (equalities only — cone rows have a fixed layout
            contract) shares row slots between families whose node sets are
            disjoint: boundary pins live only at node 0 / K-1 but would
            otherwise widen EVERY stage's equality block, and the KKT
            factor cost grows with (w + me)^3.  First-fit over a per-row
            stage-occupancy mask; padded (row, stage) slots stay inert
            0 = 0 rows.
            """
            if pack:
                occupancy: List[np.ndarray] = []
                row_assign: List[np.ndarray] = []
                for expr, idx in families:
                    rows = []
                    for _ in range(expr.dim):
                        for rI, occ in enumerate(occupancy):
                            if not occ[idx].any():
                                rows.append(rI)
                                occ[idx] = True
                                break
                        else:
                            occ = np.zeros(K, bool)
                            occ[idx] = True
                            occupancy.append(occ)
                            rows.append(len(occupancy) - 1)
                    row_assign.append(np.asarray(rows))
                m_total = len(occupancy)
            else:
                row_assign = []
                roff = 0
                for expr, _ in families:
                    row_assign.append(np.arange(roff, roff + expr.dim))
                    roff += expr.dim
                m_total = roff
            A = np.zeros((K, m_total, C))
            b = np.zeros((K, m_total))
            traced_A: List = []
            traced_b: List = []
            for (expr, idx), rows in zip(families, row_assign):
                d = expr.dim
                sgn = -1.0 if negate else 1.0
                for (name, shift), M in expr.terms.items():
                    if shift is None:
                        col0 = 2 * w + self._goff[name]
                    else:
                        col0 = shift * w + self._soff[name]
                    cols = np.arange(col0, col0 + M.shape[-1])
                    if _is_static(M):
                        if M.ndim == 2:
                            A[np.ix_(idx, rows, cols)] += sgn * M[None]
                        else:
                            A[np.ix_(idx, rows, cols)] += sgn * M
                    else:
                        traced_A.append((idx, rows, cols, sgn, M))
                c = expr.const
                csgn = 1.0 if negate else -1.0
                if _is_static(c):
                    cc = np.asarray(c, np.float64)
                    if cc.ndim == 1:
                        b[np.ix_(idx, rows)] = csgn * cc[None]
                    else:
                        b[np.ix_(idx, rows)] = csgn * cc
                else:
                    traced_b.append((idx, rows, d, csgn, c))
            A_j = jnp.asarray(A, dtype)
            b_j = jnp.asarray(b, dtype)
            for idx, rows, cols, sgn, M in traced_A:
                Mj = jnp.asarray(M, dtype)
                if Mj.ndim == 2:
                    Mj = jnp.broadcast_to(Mj, (idx.size,) + Mj.shape)
                A_j = A_j.at[idx[:, None, None],
                             rows[None, :, None],
                             cols[None, None, :]].add(sgn * Mj)
            for idx, rows, d, csgn, c in traced_b:
                cj = jnp.asarray(c, dtype)
                if cj.ndim == 1:
                    cj = jnp.broadcast_to(cj, (idx.size, d))
                b_j = b_j.at[idx[:, None], rows[None, :]].add(csgn * cj)
            return A_j, b_j

        # equalities: padded rows are 0 = 0; slot-packed (see emit)
        A_eq, b_eq = emit(self._eq, negate=False, pack=True)

        # conic rows: nonneg families first, then SOC families.
        # padded nonneg rows: 0 x + s = 1; padded SOC rows: s = (1, 0...).
        G_non, h_non = emit(self._nonneg, negate=True)
        l = G_non.shape[1]
        # set padded nonneg rhs to 1 where the family is absent
        pad_non = np.ones((K, l))
        roff = 0
        for expr, idx in self._nonneg:
            pad_non[idx, roff:roff + expr.dim] = 0.0
            roff += expr.dim
        h_non = h_non + jnp.asarray(pad_non, h_non.dtype)

        G_soc, h_soc = emit(self._socs, negate=True)
        pad_soc = np.zeros((K, G_soc.shape[1]))
        roff = 0
        for (expr, idx), q in zip(self._socs, self._soc_sizes):
            present = np.zeros(K, bool)
            present[idx] = True
            pad_soc[~present, roff] = 1.0
            roff += q
        h_soc = h_soc + jnp.asarray(pad_soc, h_soc.dtype)

        G = jnp.concatenate([G_non, G_soc], axis=1)
        h = jnp.concatenate([h_non, h_soc], axis=1)

        # per-node cost -> c_stage (K, w) (+ possible global columns)
        c_stage = np.zeros((K, w))
        c_glob_from_nodes = np.zeros((g,))
        traced_cost: List = []
        for expr, idx in self._cost:
            for (name, shift), M in expr.terms.items():
                if shift is None:
                    col0 = self._goff[name]
                    if _is_static(M):
                        contrib = M[0] * idx.size if M.ndim == 2 \
                            else M.sum(0)[0]
                        c_glob_from_nodes[col0:col0 + M.shape[-1]] += contrib
                    else:
                        traced_cost.append(("g", col0, idx, M))
                    continue
                if shift != 0:
                    raise ValueError("cost on shifted variables unsupported")
                col0 = self._soff[name]
                cols = np.arange(col0, col0 + M.shape[-1])
                if _is_static(M):
                    if M.ndim == 2:
                        c_stage[np.ix_(idx, cols)] += M[0][None]
                    else:
                        c_stage[np.ix_(idx, cols)] += M[:, 0, :]
                else:
                    traced_cost.append(("s", col0, idx, M))
        c_stage_j = jnp.asarray(c_stage, dtype)
        c_glob_nodes_j = jnp.asarray(c_glob_from_nodes, dtype)
        for kind, col0, idx, M in traced_cost:
            Mj = jnp.asarray(M, dtype)
            if kind == "s":
                cols = np.arange(col0, col0 + Mj.shape[-1])
                if Mj.ndim == 2:
                    Mj = jnp.broadcast_to(Mj, (idx.size,) + Mj.shape)
                c_stage_j = c_stage_j.at[idx[:, None],
                                         cols[None, :]].add(Mj[:, 0, :])
            else:
                contrib = (Mj[0] * idx.size if Mj.ndim == 2
                           else jnp.sum(Mj[:, 0, :], axis=0))
                c_glob_nodes_j = c_glob_nodes_j.at[
                    col0:col0 + Mj.shape[-1]].add(contrib)

        # ---- global rows (dense, tiny) ----
        gnames = list(self._gvars)

        def grows(affs, negate):
            rows, rhs = [], []
            for aff in affs:
                blocks = []
                for nm in gnames:
                    size = self._gvars[nm].size
                    blk = aff.terms.get(nm)
                    blocks.append(np.zeros((aff.dim, size)) if blk is None
                                  else blk)
                traced = any(not _is_static(bk) for bk in blocks)
                row = (jnp.concatenate if traced else np.concatenate)(
                    blocks, axis=1)
                cst = aff.const
                if negate:
                    rows.append(-row)
                    rhs.append(np.atleast_1d(cst) if _is_static(cst)
                               else jnp.atleast_1d(cst))
                else:
                    rows.append(row)
                    rhs.append(-np.atleast_1d(cst) if _is_static(cst)
                               else -jnp.atleast_1d(cst))
            if not rows:
                return jnp.zeros((0, g), dtype), jnp.zeros((0,), dtype)
            A = jnp.concatenate([jnp.asarray(r, dtype) for r in rows], 0)
            b = jnp.concatenate([jnp.asarray(r, dtype) for r in rhs])
            return A, b

        A_geq, b_geq = grows(self._geq, negate=False)
        Gg_non, hg_non = grows(self._gnonneg, negate=True)
        Gg_soc, hg_soc = grows(self._gsocs, negate=True)
        G_g = jnp.concatenate([Gg_non, Gg_soc], axis=0)
        h_g = jnp.concatenate([hg_non, hg_soc])

        c_glob = np.zeros(g)
        traced_gc = None
        for nm in gnames:
            blk = self._gcost.terms.get(nm)
            if blk is None:
                continue
            col0 = self._goff[nm]
            if _is_static(blk):
                c_glob[col0:col0 + self._gvars[nm].size] += np.ravel(blk)
            else:
                if traced_gc is None:
                    traced_gc = []
                traced_gc.append((col0, self._gvars[nm].size, blk))
        c_glob_j = jnp.asarray(c_glob, dtype) + c_glob_nodes_j
        if traced_gc:
            for col0, size, blk in traced_gc:
                c_glob_j = c_glob_j.at[col0:col0 + size].add(
                    jnp.ravel(jnp.asarray(blk, dtype)))

        stage_layout = tuple(
            (nm, self._soff[nm], d, n_nodes)
            for nm, d, n_nodes in self._svars)
        glob_layout = tuple(
            (nm, self._goff[nm], self._gvars[nm].size) for nm in gnames)

        return StagedProgram(
            A_eq=A_eq, b_eq=b_eq, G=G, h=h,
            A_geq=A_geq, b_geq=b_geq, G_g=G_g, h_g=h_g,
            c_stage=c_stage_j, c_glob=c_glob_j,
            K=K, w=w, g=g,
            l=l, soc_sizes=tuple(self._soc_sizes),
            l_g=int(Gg_non.shape[0]), soc_sizes_g=tuple(self._gsoc_sizes),
            stage_layout=stage_layout, glob_layout=glob_layout,
        )
