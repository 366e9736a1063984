import os

# Tests run on a virtual 8-device CPU mesh with x64 enabled: this gives full
# float64 pair arithmetic (complex128-equivalent) so the reference's residual
# tolerances (1e-12 .. 1e-14) are checked exactly, and multi-chip sharding is
# validated without TPU hardware.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
