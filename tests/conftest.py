import os

# Tests run on a virtual 8-device CPU mesh with float64 enabled so that the
# reference verification tolerances (1e-8 on derivative L2 norms,
# tests/verification/test_omp_tridiag.f90:40) are meaningful. TPU runs use
# float32/bfloat16 compute; the numerics are dtype-parametric.
#
# Note: this environment's axon sitecustomize force-registers the TPU
# backend regardless of JAX_PLATFORMS, so we select the (8-device virtual)
# CPU backend via jax_default_device instead.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_device", jax.devices("cpu")[0])


def cpu_devices():
    return jax.devices("cpu")
