"""Resolved compact-scheme operators as MXU matmuls.

A compact scheme is an implicit banded system ``A f' = B f`` (schemes.py).
Instead of per-line forward/backward elimination (the reference's
Thomas/DistD2 kernels), we resolve the operator once at setup:

    M = diag(stretch) @ A^{-1} @ B        (float64 numpy, exact)

and apply a derivative/interpolation along any axis of a Cartesian field as
one batched matmul, which XLA tiles onto the TPU MXU. This is
mathematically an *exact* solve of the same system (no iteration, no
truncation) and folds BC rows, LHS factorisation and mesh-stretching scale
factors into a single constant matrix.

``M`` inherits an exponential off-diagonal decay from the diagonal dominance
of ``A`` (the property the reference's DistD2 algorithm relies on,
tdsops.f90:196-201). ``banded()`` exposes a band-truncated view used by the
sharded halo-exchange path and the Pallas block-banded kernel.

Functional parity: backend tds_solve (reference src/backend/backend.f90,
omp/backend.f90:340-391) for every tdsops operator.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..common import BC
from . import schemes

# Einsum subscripts for contraction along each axis of a 3-D field
# (and of a stacked (batch, x, y, z) field).
_EINSUM = (
    "ai,iyz->ayz",
    "ai,xiz->xaz",
    "ai,xyi->xya",
)
_EINSUM4 = (
    "ai,siyz->sayz",
    "ai,sxiz->sxaz",
    "ai,sxyi->sxya",
)

# MXU precision for f32 operator applications. HIGH (bf16x3 passes) gives
# ~1e-7 relative error per apply -- well inside the KE-parity budget -- at
# ~2x the throughput of HIGHEST (bf16x6). Ignored for f64 (CPU tests).
import os as _os

_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}
PRECISION = _PRECISIONS[_os.environ.get("X3D2_MATMUL_PRECISION", "high")]


def apply_matrix(M: jax.Array, f: jax.Array, axis: int,
                 precision=None) -> jax.Array:
    """Contract operator matrix M (n_out, n_in) with `f` along `axis`.

    `f` may be (nx, ny, nz) or batched (s, nx, ny, nz); `axis` always
    refers to the spatial axes.
    """
    precision = precision or PRECISION
    sub = _EINSUM4[axis] if f.ndim == 4 else _EINSUM[axis]
    return jnp.einsum(sub, M, f, precision=precision)


@dataclass(frozen=True)
class CompactOp:
    """A resolved compact-scheme operator along one grid axis.

    Attributes:
      M: (n_out, n_in) operator matrix in compute dtype (device constant).
      M64: float64 numpy master copy (used for shard slicing and tests).
      move: +1 v2p, -1 p2v, 0 colocated (data_loc shift, common.f90:84-88).
      stretch_correct: per-point first-derivative correction factors for
        second derivatives on stretched meshes (tdsops ``stretch_correct``),
        or None. Applied by the caller (see solver.transeq), matching
        der_univ_fused_subs (omp/kernels/distributed.f90:316-330).
    """

    M: jax.Array
    M64: np.ndarray
    move: int
    periodic: bool
    stretch_correct: np.ndarray | None = None
    # scheme scalars needed by the spectral Poisson solver (waves_set)
    alpha: float = 0.0
    a: float = 0.0
    b: float = 0.0
    c: float = 0.0
    d: float = 0.0

    @property
    def n_out(self) -> int:
        return self.M64.shape[0]

    @property
    def n_in(self) -> int:
        return self.M64.shape[1]

    def __call__(self, f: jax.Array, axis: int) -> jax.Array:
        return apply_matrix(self.M, f, axis)

    def bandwidth(self, tol: float = 1e-14) -> int:
        """Smallest half-bandwidth w such that dropped |entries| < tol*max."""
        A = np.abs(self.M64)
        scale = A.max()
        n_out, n_in = A.shape
        w = 0
        for i in range(n_out):
            row = A[i]
            nz = np.nonzero(row >= tol * scale)[0]
            if nz.size:
                w = max(w, int(max(abs(nz[0] - i), abs(nz[-1] - i))))
        return w


def resolve(system: schemes.SchemeSystem, stretch: np.ndarray | None = None,
            stretch_correct: np.ndarray | None = None,
            dtype=jnp.float32) -> CompactOp:
    """Build the resolved operator M = diag(stretch) @ A^-1 @ B."""
    A = system.lhs_dense()
    Bm = system.rhs_dense()
    M = np.linalg.solve(A, Bm)
    if stretch is not None:
        M = np.asarray(stretch)[:, None] * M
    return CompactOp(
        M=jnp.asarray(M, dtype=dtype),
        M64=M,
        move=system.move,
        periodic=system.periodic,
        stretch_correct=(np.asarray(stretch_correct)
                         if stretch_correct is not None else None),
        alpha=system.alpha, a=system.a, b=system.bb, c=system.c, d=system.d,
    )


def build_op(operation: str, n: int, delta: float, scheme: str,
             bc_start: int, bc_end: int, *, from_to: str = None,
             sym: bool = False, stretch: np.ndarray | None = None,
             stretch_correct: np.ndarray | None = None,
             c_nu: float = None, nu0_nu: float = None,
             dtype=jnp.float32) -> CompactOp:
    """One-call equivalent of backend%alloc_tdsops (backend.f90:332-368)."""
    sys_ = schemes.build_system(operation, n, delta, scheme, bc_start, bc_end,
                                from_to=from_to, sym=sym, c_nu=c_nu,
                                nu0_nu=nu0_nu)
    return resolve(sys_, stretch=stretch, stretch_correct=stretch_correct,
                   dtype=dtype)
