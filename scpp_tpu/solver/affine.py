"""Affine expressions over named optimization variables.

TPU-native replacement for the Epigraph ``cvx::`` modeling DSL the
reference uses to build its SOCPs (SURVEY §2 V2; problem builders at
scpp_core/src/{SC,SCvx,MPC}Problem.cpp). The key re-design: Epigraph's
``dynpar`` live-pointer parameters become *traced JAX arrays* — the problem
is built symbolically once per (model, K, flags) at trace time, and every
numeric coefficient (A_k, B_k, weights, trust radius, ...) is an input of
the jitted solve, so "updating a parameter and re-solving" is just calling
the compiled function again. No rebuild, no pointer aliasing.

An :class:`Aff` is a vector-valued affine function of the stacked variable
vector:  e(x) = sum_v M_v x_v + h, stored as per-variable coefficient
blocks (mixed numpy constants / traced jnp arrays — XLA constant-folds the
static parts).
"""

from __future__ import annotations

from typing import Dict, Tuple, Union

import jax.numpy as jnp
import numpy as np

__all__ = ["Aff", "Var", "concat"]

ArrayLike = Union[np.ndarray, jnp.ndarray, float, int]


def _is_static(x) -> bool:
    return isinstance(x, (np.ndarray, float, int, np.floating, np.integer))


class Aff:
    """Vector affine expression: terms[name] @ x[name] summed, plus const.

    ``terms[name]`` has shape (dim, var.size); ``const`` has shape (dim,).
    """

    __slots__ = ("dim", "terms", "const")
    __array_priority__ = 1000  # beat numpy broadcasting in mixed ops

    def __init__(self, dim: int, terms: Dict[str, ArrayLike], const: ArrayLike):
        self.dim = int(dim)
        self.terms = terms
        self.const = const

    # ---- constructors ----

    @staticmethod
    def constant(value) -> "Aff":
        v = value if _is_static(value) else jnp.asarray(value)
        v = np.atleast_1d(v) if _is_static(v) else jnp.atleast_1d(v)
        return Aff(v.shape[0], {}, v)

    @staticmethod
    def _coerce(other, dim) -> "Aff":
        if isinstance(other, Aff):
            return other
        a = Aff.constant(other)
        if a.dim == 1 and dim != 1:
            const = (np.broadcast_to(a.const, (dim,)) if _is_static(a.const)
                     else jnp.broadcast_to(a.const, (dim,)))
            return Aff(dim, {}, const)
        return a

    # ---- arithmetic ----

    def __add__(self, other) -> "Aff":
        other = Aff._coerce(other, self.dim)
        if other.dim != self.dim:
            if self.dim == 1:
                return other + self
            raise ValueError(f"dim mismatch {self.dim} vs {other.dim}")
        terms = dict(self.terms)
        for k, M in other.terms.items():
            terms[k] = terms[k] + M if k in terms else M
        return Aff(self.dim, terms, self.const + other.const)

    __radd__ = __add__

    def __neg__(self) -> "Aff":
        return Aff(self.dim, {k: -M for k, M in self.terms.items()}, -self.const)

    def __sub__(self, other) -> "Aff":
        return self + (-Aff._coerce(other, self.dim))

    def __rsub__(self, other) -> "Aff":
        return (-self) + Aff._coerce(other, self.dim)

    def __mul__(self, w) -> "Aff":
        """Scale by a scalar or elementwise by a (dim,) vector."""
        if isinstance(w, Aff):
            raise TypeError("Aff*Aff is not convex-affine")
        wn = np.asarray(w, dtype=np.float64) if _is_static(w) else jnp.asarray(w)
        if wn.ndim == 0:
            return Aff(self.dim, {k: wn * M for k, M in self.terms.items()},
                       wn * self.const)
        if wn.shape != (self.dim,):
            raise ValueError(f"scale shape {wn.shape} vs dim {self.dim}")
        return Aff(self.dim, {k: wn[:, None] * M for k, M in self.terms.items()},
                   wn * self.const)

    __rmul__ = __mul__

    def __truediv__(self, w) -> "Aff":
        return self * (1.0 / w)

    def __rmatmul__(self, M) -> "Aff":
        """Constant matrix (p, dim) @ aff -> Aff of dim p."""
        M = M if _is_static(M) else jnp.asarray(M)
        if M.ndim == 1:
            M = M[None, :]
        p = M.shape[0]
        terms = {k: M @ blk for k, blk in self.terms.items()}
        return Aff(p, terms, M @ self.const)

    def sum(self) -> "Aff":
        ones = np.ones((1, self.dim))
        return ones @ self

    def __getitem__(self, key) -> "Aff":
        sel = np.arange(self.dim)[key]
        sel = np.atleast_1d(sel)
        terms = {k: M[sel] for k, M in self.terms.items()}
        const = self.const[sel] if not _is_static(self.const) else np.asarray(self.const)[sel]
        return Aff(sel.size, terms, const)

    def __repr__(self):
        return f"Aff(dim={self.dim}, vars={sorted(self.terms)})"


class Var:
    """A named optimization variable with an index grid of a given shape.

    Indexing yields :class:`Aff` selections, e.g. ``X[k]`` (one node, dim n)
    or ``X[:, 4]`` (one state across nodes, dim K) — the layout counterpart
    of Epigraph's ``v_X.col(k)`` / ``v_X.row(i)``.
    """

    __slots__ = ("name", "shape", "size", "_grid")

    def __init__(self, name: str, shape: Tuple[int, ...]):
        self.name = name
        self.shape = tuple(shape)
        self.size = int(np.prod(self.shape)) if self.shape else 1
        self._grid = np.arange(self.size).reshape(self.shape)

    def __getitem__(self, key) -> Aff:
        sel = np.atleast_1d(self._grid[key]).ravel()
        coeff = np.zeros((sel.size, self.size))
        coeff[np.arange(sel.size), sel] = 1.0
        return Aff(sel.size, {self.name: coeff}, np.zeros(sel.size))

    def aff(self) -> Aff:
        """The whole variable, flattened."""
        return self[...]

    def place(self, M, key=...) -> Aff:
        """M @ x[key] as an Aff without materializing a selection product:
        directly scatter M into this variable's coefficient block."""
        sel = np.atleast_1d(self._grid[key]).ravel()
        M = M if _is_static(M) else jnp.asarray(M)
        if M.ndim == 1:
            M = M[None, :]
        d = M.shape[0]
        if _is_static(M):
            coeff = np.zeros((d, self.size))
            coeff[:, sel] = M
        else:
            coeff = jnp.zeros((d, self.size), dtype=M.dtype).at[:, sel].set(M)
        return Aff(d, {self.name: coeff}, np.zeros(d))

    def __repr__(self):
        return f"Var({self.name}, shape={self.shape})"


def concat(affs) -> Aff:
    """Stack affine expressions into one vector expression."""
    affs = [a if isinstance(a, Aff) else Aff.constant(a) for a in affs]
    dim = sum(a.dim for a in affs)
    sizes = {}
    for a in affs:
        for k, M in a.terms.items():
            sizes[k] = M.shape[1]
    const_blocks = [np.atleast_1d(a.const) if _is_static(a.const)
                    else jnp.atleast_1d(a.const) for a in affs]
    traced_const = any(not _is_static(c) for c in const_blocks)
    const = (jnp.concatenate if traced_const else np.concatenate)(const_blocks)
    terms = {}
    for name, size in sizes.items():
        blocks = [a.terms.get(name, np.zeros((a.dim, size))) for a in affs]
        traced = any(not _is_static(b) for b in blocks)
        terms[name] = (jnp.concatenate if traced else np.concatenate)(blocks, axis=0)
    return Aff(dim, terms, const)
