"""Manual-DMA x-apply kernels vs the grid-pipelined originals.

ops/pallas_manual.py reimplements make_x_apply's data movement as a
hand-scheduled S-slot DMA pipeline; the arithmetic (bf16 hi/lo split
dots, parity-split transforms) is shared, so interpret mode must agree
to float32 roundoff with the grid kernels for every variant.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from x3d2_tpu.ops.matmul_poisson import real_dft_matrix
from x3d2_tpu.ops.pallas_poisson import make_x_apply
from x3d2_tpu.ops.pallas_manual import make_x_apply_manual

N = 32
NY, NZ = 16, 256


def _mats(seed=0):
    """Forward- and inverse-folded circulant operators (the parity
    column symmetry of the production transform-folded matrices)."""
    rng = np.random.default_rng(seed)
    sten = rng.standard_normal(5)
    Op = np.zeros((N, N))
    for k, c in zip(range(-2, 3), sten):
        Op += c * np.roll(np.eye(N), k, axis=1)
    T = real_dft_matrix(N)
    return T @ Op, Op @ np.linalg.inv(T)


def _field(seed, n0=N):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((n0, NY, NZ)), jnp.float32)


def _check(ref, got, tol=1e-5):
    scale = float(jnp.max(jnp.abs(ref))) + 1e-30
    err = float(jnp.max(jnp.abs(ref - got))) / scale
    assert err < tol, f"rel err {err:.2e}"


@pytest.mark.parametrize("sub", [False, True])
def test_dense(sub):
    Mf, _ = _mats()
    f, s = _field(1), _field(2)
    grid = make_x_apply(Mf, terms=2, sub=sub, interpret=True)
    man = make_x_apply_manual(Mf, terms=2, sub=sub, interpret=True)
    args = (f, s) if sub else (f,)
    _check(grid(*args), man(*args))


def test_parity_fwd():
    Mf, _ = _mats()
    f = _field(3)
    grid = make_x_apply(Mf, terms=2, parity="fwd", interpret=True)
    man = make_x_apply_manual(Mf, terms=2, parity="fwd", interpret=True)
    _check(grid(f), man(f))


@pytest.mark.parametrize("sub", [False, True])
def test_parity_inv(sub):
    _, Mi = _mats()
    f, s = _field(4), _field(5)
    grid = make_x_apply(Mi, terms=2, sub=sub, parity="inv", interpret=True)
    man = make_x_apply_manual(Mi, terms=2, sub=sub, parity="inv",
                              interpret=True)
    args = (f, s) if sub else (f,)
    _check(grid(*args), man(*args))


def test_matches_f64_reference():
    """Not just self-consistent: the manual dense apply matches the f64
    matrix product."""
    Mf, _ = _mats()
    f = _field(6)
    man = make_x_apply_manual(Mf, terms=3, interpret=True)
    ref = np.einsum("ij,jkl->ikl", Mf,
                    np.asarray(f, np.float64))
    _check(jnp.asarray(ref, jnp.float32), man(f), tol=1e-5)


def test_small_tile_counts():
    """ntiles < slots exercises the warmup/drain boundary logic."""
    Mf, _ = _mats()
    rng = np.random.default_rng(7)
    f = jnp.asarray(rng.standard_normal((N, 8, 128)), jnp.float32)
    grid = make_x_apply(Mf, terms=2, interpret=True)
    man = make_x_apply_manual(Mf, terms=2, slots=4, interpret=True)
    _check(grid(f), man(f))
