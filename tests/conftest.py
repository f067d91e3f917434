import os

# Multi-chip logic is tested on a virtual CPU mesh; the real-TPU bench path sets
# CURDLEPROOFS_TPU_REAL=1 to opt out (bench.py / __graft_entry__.py run outside
# pytest anyway).
if not os.environ.get("CURDLEPROOFS_TPU_REAL"):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running end-to-end tests")
    config.addinivalue_line("markers", "tpu: requires a real TPU device")
