"""'Large Steps in Inverse Rendering' mesh preconditioner.

Reference: src/python/python/ad/largesteps.py (161 LoC) — optimize mesh
vertices in a differential parameterization u = (I + lambda*L) v (uniform
Laplacian L), so gradient steps propagate smoothly across the surface.
The reference solves the sparse system with an external Cholesky package
(cholespy, largesteps.py:90-119) wrapped in a dr.CustomOp; here the solve
is conjugate gradients on a matrix-free Laplacian matvec (segment-sum
over edges) — differentiable through jax.scipy.sparse.linalg.cg, no
custom op needed.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


class LargeSteps:
    """Differential mesh parameterization (largesteps.py:6 LargeSteps)."""

    def __init__(self, vertices, faces, lambda_: float = 19.0):
        faces = np.asarray(faces, np.int64)
        n = int(np.asarray(vertices).shape[0])
        # unique undirected edges
        e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]],
                            faces[:, [2, 0]]])
        e = np.sort(e, axis=1)
        e = np.unique(e, axis=0)
        self.n_verts = n
        self.lambda_ = float(lambda_)
        self.edges_a = jnp.asarray(e[:, 0], jnp.int32)
        self.edges_b = jnp.asarray(e[:, 1], jnp.int32)
        deg = np.zeros(n, np.float32)
        np.add.at(deg, e[:, 0], 1.0)
        np.add.at(deg, e[:, 1], 1.0)
        self.degree = jnp.asarray(deg)

    def _laplacian_matvec(self, x):
        """(I + lambda * L) x with the uniform (graph) Laplacian
        L = D - A."""
        ax = jnp.zeros_like(x)
        xa = x[self.edges_a]
        xb = x[self.edges_b]
        ax = ax.at[self.edges_a].add(xb)
        ax = ax.at[self.edges_b].add(xa)
        lx = self.degree[:, None] * x - ax
        return x + self.lambda_ * lx

    def to_differential(self, verts):
        """v -> u = (I + lambda L) v (largesteps.py to_differential)."""
        return self._laplacian_matvec(jnp.asarray(verts, jnp.float32))

    def from_differential(self, u, tol: float = 1e-6, maxiter: int = 200):
        """u -> v: CG solve of (I + lambda L) v = u
        (largesteps.py from_differential; SPD system)."""
        v, _ = jax.scipy.sparse.linalg.cg(
            self._laplacian_matvec, jnp.asarray(u, jnp.float32),
            tol=tol, maxiter=maxiter,
        )
        return v
