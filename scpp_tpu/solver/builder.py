"""Conic problem builder: affine constraints -> standard-form SOCP.

Canonical form (the SCS/ECOS standard the reference solves through
Epigraph -> ECOS, SURVEY §2 V2/V3):

    minimize    c' x
    subject to  A x + s = b,   s in K = {0}^z x R+^l x SOC(q_1) x ... x SOC(q_N)

The builder collects equality / nonnegativity / second-order-cone
constraints as :class:`Aff` expressions and emits a dense, jit-traceable
(A, b, c) whose numeric entries may be traced JAX arrays — the per-solve
"dynamic parameters" of the reference (cvx::dynpar) are simply function
inputs here. Cone structure (row counts, SOC sizes) is static Python data
fixed at trace time, as required for lockstep batched solves.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

from scpp_tpu.solver.affine import Aff, Var, concat

__all__ = ["ConeProblemBuilder", "ConicProgram"]


@struct.dataclass
class ConicProgram:
    """Standard-form conic program; cone layout is static metadata."""

    A: jnp.ndarray           # (m, n)
    b: jnp.ndarray           # (m,)
    c: jnp.ndarray           # (n,)
    n_eq: int = struct.field(pytree_node=False)
    n_ineq: int = struct.field(pytree_node=False)
    soc_sizes: Tuple[int, ...] = struct.field(pytree_node=False)
    # (name, offset, shape) per variable; tuple-of-tuples so it hashes as a
    # static jit argument
    var_layout: Tuple[Tuple[str, int, Tuple[int, ...]], ...] = struct.field(pytree_node=False)

    @property
    def n(self) -> int:
        return self.A.shape[-1]

    @property
    def m(self) -> int:
        return self.A.shape[-2]

    def extract(self, x: jnp.ndarray, name: str) -> jnp.ndarray:
        """Slice a named variable out of a stacked solution vector."""
        for nm, off, shape in self.var_layout:
            if nm == name:
                size = int(np.prod(shape)) if shape else 1
                v = x[..., off:off + size]
                return v.reshape(x.shape[:-1] + shape) if shape else v[..., 0]
        raise KeyError(name)


class ConeProblemBuilder:
    """Accumulates variables, constraints and a linear cost."""

    def __init__(self):
        self._vars: Dict[str, Var] = {}
        self._eq: List[Aff] = []
        self._nonneg: List[Aff] = []
        self._socs: List[Aff] = []       # stacked (t, z) expressions
        self._soc_sizes: List[int] = []
        self._cost: Aff = Aff.constant(0.0)

    # ---- variables ----

    def add_variable(self, name: str, *shape: int) -> Var:
        if name in self._vars:
            raise ValueError(f"duplicate variable {name!r}")
        v = Var(name, shape)
        self._vars[name] = v
        return v

    def var(self, name: str) -> Var:
        return self._vars[name]

    # ---- constraints ----

    def add_eq(self, aff):
        """aff == 0 (elementwise)."""
        self._eq.append(aff if isinstance(aff, Aff) else Aff.constant(aff))

    def add_nonneg(self, aff):
        """aff >= 0 (elementwise)."""
        self._nonneg.append(aff if isinstance(aff, Aff) else Aff.constant(aff))

    def add_box(self, lo, aff, hi):
        """lo <= aff <= hi (cvx::box equivalent)."""
        self.add_nonneg(aff - lo)
        self.add_nonneg(hi - aff)

    def add_soc(self, t, z):
        """||z||_2 <= t; t scalar Aff, z vector Aff."""
        t = t if isinstance(t, Aff) else Aff.constant(t)
        z = z if isinstance(z, Aff) else Aff.constant(z)
        if t.dim != 1:
            raise ValueError("SOC t must be scalar")
        stacked = concat([t, z])
        self._socs.append(stacked)
        self._soc_sizes.append(stacked.dim)

    def add_cost(self, aff):
        """Add a linear cost term (scalar Aff)."""
        aff = aff if isinstance(aff, Aff) else Aff.constant(aff)
        if aff.dim != 1:
            raise ValueError("cost must be scalar")
        self._cost = self._cost + aff

    # ---- canonicalization ----

    def build(self, dtype=None) -> ConicProgram:
        names = list(self._vars)
        off = 0
        var_layout = []
        for nm in names:
            var_layout.append((nm, off, self._vars[nm].shape))
            off += self._vars[nm].size
        n = off

        def rows_of(aff: Aff, negate: bool):
            """(d, n) coefficient rows and (d,) rhs for one constraint."""
            blocks = []
            for nm in names:
                size = self._vars[nm].size
                blk = aff.terms.get(nm)
                blocks.append(np.zeros((aff.dim, size)) if blk is None else blk)
            traced = any(not isinstance(b, np.ndarray) for b in blocks)
            row = (jnp.concatenate if traced else np.concatenate)(blocks, axis=1)
            if negate:
                # s = aff(x) in K:  b - Ax = Mx + h  =>  A = -M, b = h
                return -row, aff.const
            # aff(x) = 0:  Ax = b  =>  A = M, b = -h
            return row, -aff.const

        A_rows, b_rows = [], []
        for aff in self._eq:
            r, bb = rows_of(aff, negate=False)
            A_rows.append(r)
            b_rows.append(np.atleast_1d(bb) if isinstance(bb, np.ndarray) else jnp.atleast_1d(bb))
        n_eq = sum(a.dim for a in self._eq)
        for aff in self._nonneg:
            r, bb = rows_of(aff, negate=True)
            A_rows.append(r)
            b_rows.append(np.atleast_1d(bb) if isinstance(bb, np.ndarray) else jnp.atleast_1d(bb))
        n_ineq = sum(a.dim for a in self._nonneg)
        for aff in self._socs:
            r, bb = rows_of(aff, negate=True)
            A_rows.append(r)
            b_rows.append(np.atleast_1d(bb) if isinstance(bb, np.ndarray) else jnp.atleast_1d(bb))

        dtype = dtype or jnp.zeros(0).dtype
        A = jnp.concatenate([jnp.asarray(r, dtype=dtype) for r in A_rows], axis=0) \
            if A_rows else jnp.zeros((0, n), dtype)
        b = jnp.concatenate([jnp.asarray(r, dtype=dtype) for r in b_rows]) \
            if b_rows else jnp.zeros((0,), dtype)

        c_blocks = []
        for nm in names:
            blk = self._cost.terms.get(nm)
            c_blocks.append(np.zeros(self._vars[nm].size) if blk is None
                            else jnp.ravel(blk))
        c = jnp.concatenate([jnp.asarray(cb, dtype=dtype) for cb in c_blocks]) \
            if c_blocks else jnp.zeros((0,), dtype)

        return ConicProgram(
            A=A, b=b, c=c,
            n_eq=n_eq, n_ineq=n_ineq,
            soc_sizes=tuple(self._soc_sizes),
            var_layout=tuple(var_layout),
        )
