import os

# Tests run on a virtual 8-device CPU mesh; Pallas kernels run in interpret
# mode (the analog of the reference's csim software simulation,
# spmv_csim/csim.cpp).  Real-chip runs live in scripts/.
# The environment may pin JAX to a TPU platform plugin; jax.config wins over
# the env var, so force CPU through the config API before any backend init.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms",
                  os.environ.get("HISPARSE_TEST_PLATFORM", "cpu"))
