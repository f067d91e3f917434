import os

# Multi-chip logic is tested on a virtual CPU mesh. The axon sitecustomize in
# this image force-registers the remote-TPU backend via JAX_PLATFORMS=axon, so
# the env var alone is not enough — override the config after import.
# Real-TPU runs (bench.py) set CURDLEPROOFS_TPU_REAL=1.
if not os.environ.get("CURDLEPROOFS_TPU_REAL"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running end-to-end tests")
    config.addinivalue_line("markers", "tpu: requires a real TPU device")
