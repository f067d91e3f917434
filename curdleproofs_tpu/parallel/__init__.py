"""Multi-chip scaling: sharded MSM over a device mesh, batched verification.

The reference has no distributed layer (SURVEY.md §2c — its only parallelism is
rayon threads inside arkworks); this package adds the TPU-native equivalents:
MSM point-sharding with ICI collectives and data-parallel proof verification.

Exports resolve lazily: `batch_verify` is pure-host unless given a mesh, and
importing the sharded/distributed modules pulls in the jax device stack —
which must not happen as an import side effect (a degraded remote-TPU tunnel
blocks backend init for minutes).
"""

__all__ = ["sharded_msm_kernel", "make_msm_mesh"]


def __getattr__(name):
    if name in ("sharded_msm_kernel", "make_msm_mesh", "sharded_msm"):
        from . import sharded_msm as _m

        return getattr(_m, name)
    raise AttributeError(name)
