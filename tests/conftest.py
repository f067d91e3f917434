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

# Persistent compilation cache: the limb kernels are compile-heavy; reruns hit
# the cache instead of recompiling (~30 s per MSM shape on CPU XLA).
import jax as _jax  # noqa: E402

_jax.config.update("jax_compilation_cache_dir", "/tmp/curdleproofs_jax_cache")
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running end-to-end tests")
    config.addinivalue_line("markers", "tpu: requires a real TPU device")
