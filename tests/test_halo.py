"""Explicit halo-exchange operator application (DistD2 analogue):
shard_map + ppermute path must match the unsharded dense apply."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from x3d2_tpu.common import BC
from x3d2_tpu.ops import build_op
from x3d2_tpu.parallel.halo import make_halo_apply, shard_operator_blocks
from x3d2_tpu.parallel import make_device_mesh


def cpu_devices():
    return jax.devices("cpu")


@pytest.mark.parametrize("bc", [BC.PERIODIC, BC.DIRICHLET])
@pytest.mark.parametrize("operation,kw", [
    ("first-deriv", {}),
    ("second-deriv", {}),
])
def test_halo_apply_matches_dense(bc, operation, kw):
    devices = cpu_devices()
    if len(devices) < 4:
        pytest.skip("needs 4 devices")
    n = 128
    dx = 2 * np.pi / (n if bc == BC.PERIODIC else n - 1)
    op = build_op(operation, n, dx, "compact6", bc, bc, dtype=jnp.float64,
                  **kw)
    dmesh = make_device_mesh(4, 1, devices[:4])
    rng = np.random.default_rng(0)
    f = rng.normal(size=(8, n, 16))

    from jax.sharding import NamedSharding, PartitionSpec as P
    fs = jax.device_put(jnp.asarray(f),
                        NamedSharding(dmesh, P(None, "y", None)))
    apply_fn = jax.jit(make_halo_apply(op, dmesh, "y", 1, w=32))
    got = np.asarray(apply_fn(fs))
    ref = np.asarray(op(jnp.asarray(f), 1))
    assert np.max(np.abs(got - ref)) < 1e-11, np.max(np.abs(got - ref))


def test_halo_width_guard():
    n = 128
    op = build_op("interpolate", n, 1.0, "classic", BC.PERIODIC, BC.PERIODIC,
                  from_to="v2p", dtype=jnp.float64)
    # interp alpha=0.3 decays ~0.33^d: w=4 truncates at ~1e-2 -> reject
    with pytest.raises(ValueError):
        shard_operator_blocks(op, 4, w=4)
    blocks, trunc = shard_operator_blocks(op, 4, w=32)
    assert trunc < 1e-12
