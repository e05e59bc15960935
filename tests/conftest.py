import os

# Tests run on a virtual 8-device CPU mesh; Pallas kernels run in interpret
# mode (the analog of the reference's csim software simulation,
# spmv_csim/csim.cpp).  Real-chip runs live in scripts/.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
