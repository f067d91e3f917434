"""MSM sharded across a TPU mesh (points data-parallel, ICI reduction).

Each device computes the 255 per-bit partial sums over its shard of points
(the same masked tree reduction as the single-chip kernel), the [255] partial
sums are all-gathered over the mesh axis (EC addition is not an arithmetic
`psum`, so the reduction is an explicit log-depth tree of complete adds), and
the Horner ladder runs replicated. Per-device work is 255*(N/D) adds + O(log D).

This is the TPU equivalent of rayon-parallel `VariableBaseMSM` in the
reference (SURVEY.md §2c) and the unit that scales the verifier's single
deduped MSM (`msm_accumulator.rs:55-68`) across chips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..host.g1 import G1
from ..ops.g1_ops import PointsXYZ, g1_add, points_from_device, points_to_device
from ..ops.limbs import ints_to_bits
from ..ops.msm import NBITS, _horner, _masked_bit_sums

__all__ = ["make_msm_mesh", "sharded_msm_kernel", "sharded_msm"]


def make_msm_mesh(n_devices: int | None = None, axis: str = "points") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


@functools.partial(jax.jit, static_argnames=("mesh_axis",))
def _noop(x, mesh_axis):
    return x


def sharded_msm_kernel(mesh: Mesh, axis: str = "points"):
    """Build a jitted sharded-MSM callable for `mesh`.

    Returned fn: (points [N], bits [N, NBITS]) -> PointsXYZ scalar point,
    with N divisible by mesh size (pad with infinity).
    """
    n_dev = mesh.devices.size

    def _local(pts: PointsXYZ, bits: jnp.ndarray) -> PointsXYZ:
        local_sums = _masked_bit_sums(pts, bits)        # [24, NBITS] partials
        gathered = lax.all_gather(local_sums, axis)     # [D, 24, NBITS]
        # limb axis back in front: [24, D, NBITS], then tree-reduce over D
        cur = PointsXYZ(jnp.moveaxis(gathered.x, 0, 1),
                        jnp.moveaxis(gathered.y, 0, 1),
                        jnp.moveaxis(gathered.z, 0, 1))
        d = n_dev
        while d > 1:
            half = d // 2
            cur = g1_add(
                PointsXYZ(cur.x[:, :half], cur.y[:, :half], cur.z[:, :half]),
                PointsXYZ(cur.x[:, half:d], cur.y[:, half:d], cur.z[:, half:d]))
            d = half
        sums = PointsXYZ(cur.x[:, 0], cur.y[:, 0], cur.z[:, 0])  # [24, NBITS]
        return _horner(sums)                            # replicated

    mapped = jax.shard_map(
        _local, mesh=mesh,
        in_specs=(PointsXYZ(P(None, axis), P(None, axis), P(None, axis)),
                  P(axis)),
        out_specs=PointsXYZ(P(), P(), P()),
        # the all_gather + replicated tree reduction makes every device hold
        # the same value, but the static vma check can't see that
        check_vma=False,
    )
    return jax.jit(mapped)


def sharded_msm(points: list[G1], scalars: list[int],
                mesh: Mesh | None = None) -> G1:
    """Host-facing sharded MSM: pads, uploads, runs, downloads."""
    if mesh is None:
        mesh = make_msm_mesh()
    n_dev = mesh.devices.size
    n = len(points)
    m = max(n_dev, 1)
    while m < n or (m % n_dev):
        m *= 2
    pts = points_to_device(list(points) + [G1.infinity()] * (m - n))
    bits = jnp.asarray(ints_to_bits(list(scalars) + [0] * (m - n), NBITS))
    out = sharded_msm_kernel(mesh)(pts, bits)
    return points_from_device(
        PointsXYZ(out.x[:, None], out.y[:, None], out.z[:, None]))[0]
