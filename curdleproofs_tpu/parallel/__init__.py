"""Multi-chip scaling: sharded MSM over a device mesh, batched verification.

The reference has no distributed layer (SURVEY.md §2c — its only parallelism is
rayon threads inside arkworks); this package adds the TPU-native equivalents:
MSM point-sharding with ICI collectives and data-parallel proof verification.
"""

from .sharded_msm import sharded_msm_kernel, make_msm_mesh  # noqa: F401
