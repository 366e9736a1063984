import os

# Tests run on a virtual 8-device CPU mesh with x64 enabled: this gives full
# float64 pair arithmetic (complex128-equivalent) so the reference's residual
# tolerances (1e-12 .. 1e-14) are checked exactly, and multi-chip sharding is
# validated without TPU hardware.
#
# NOTE the harness boots every python process through an axon sitecustomize
# that imports jax and registers the remote-TPU backend before conftest runs,
# and pre-sets JAX_PLATFORMS=axon — so env vars alone cannot select CPU here.
# `jax.config.update("jax_platforms", ...)` after import does work (backends
# initialize lazily on first use).
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """The suite compiles hundreds of executables; without trimming the
    compilation caches between modules the process eventually aborts inside
    XLA's compiler (memory exhaustion)."""
    yield
    jax.clear_caches()
