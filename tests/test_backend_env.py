"""Pins the CURDLEPROOFS_BACKEND env mapping (VERDICT r2 weak item 1: the
`hybrid` value silently constructed TpuBackend; caught by no test).

Also pins that no env value can dispatch an MSM to the retired v1 bit-serial
ladder: TpuBackend.msm must route through the Pippenger pipeline
(ops/msm_device.py) and ops.msm must not export an MSM kernel at all.
"""

import os
from unittest import mock

from curdleproofs_tpu import backend as backend_mod
from curdleproofs_tpu.backend import (
    HostBackend, PurePythonBackend, _backend_from_env,
)
from curdleproofs_tpu.ops.backend import HybridBackend, TpuBackend


def _resolve(value: str | None):
    env = {} if value is None else {"CURDLEPROOFS_BACKEND": value}
    with mock.patch.dict(os.environ, env, clear=False):
        if value is None:
            os.environ.pop("CURDLEPROOFS_BACKEND", None)
        return _backend_from_env()


def test_env_hybrid_builds_hybrid_backend():
    assert type(_resolve("hybrid")) is HybridBackend


def test_env_tpu_builds_tpu_backend():
    assert type(_resolve("tpu")) is TpuBackend


def test_env_host_and_pure():
    assert type(_resolve("host")) is HostBackend
    assert type(_resolve("pure")) is PurePythonBackend


def test_env_auto_is_host_on_cpu():
    # tests run under JAX_PLATFORMS=cpu: auto -> host even once initialized
    import jax

    jax.devices()  # force backend init
    assert type(_resolve("auto")) is HostBackend
    assert type(_resolve(None)) is HostBackend


def test_env_auto_is_hybrid_on_tpu():
    import jax

    jax.devices()  # force backend init so the initialized-probe fires
    with mock.patch.object(jax, "default_backend", return_value="tpu"):
        assert type(_resolve("auto")) is HybridBackend


def test_env_auto_stays_host_when_uninitialized():
    """auto must not trigger device init: with the initialized-probe forced
    False the resolution is host even if default_backend would say tpu."""
    import jax

    with mock.patch.object(backend_mod, "_jax_backend_initialized",
                           return_value=False), \
         mock.patch.object(jax, "default_backend", return_value="tpu"):
        assert type(_resolve("auto")) is HostBackend


def test_get_backend_resolves_lazily_and_caches():
    old = backend_mod._active
    try:
        backend_mod._active = None
        got = backend_mod.get_backend()
        assert got is backend_mod.get_backend()
    finally:
        backend_mod._active = old


def test_no_v1_msm_kernel_reachable():
    """The bit-serial v1 MSM is gone: ops.msm has no msm kernel, and
    TpuBackend.msm produces the same result as the Pippenger device path."""
    from curdleproofs_tpu.host.rng import StdRng
    from curdleproofs_tpu.ops import msm as msm_mod
    from curdleproofs_tpu.ops.msm_device import msm_device

    assert not hasattr(msm_mod, "msm_kernel")
    assert not hasattr(msm_mod, "msm_jit")

    rng = StdRng.seed_from_u64(7)
    pts = [rng.rand_g1() for _ in range(9)]
    ss = [rng.rand_fr() for _ in range(9)]
    want = HostBackend().msm(pts, ss)
    assert TpuBackend().msm(pts, ss) == want
    assert msm_device(pts, ss) == want
