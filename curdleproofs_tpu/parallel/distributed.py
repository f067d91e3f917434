"""Multi-host process groups and DCN-aware work placement.

The reference has no distributed runtime at all (SURVEY.md §2c row 5 /
§5 "distributed communication backend": no NCCL/MPI/Gloo anywhere); this
module is the framework's communication layer, built entirely on JAX's
native stack — `jax.distributed.initialize` for the process group, a global
device mesh for collectives (which XLA lowers to ICI within a slice and DCN
across hosts), and `shard_map` programs from sharded_msm for the compute.

Placement policy (BASELINE config 5, "1024 proofs across N>=2 hosts"):
- WITHIN one MSM, shard points/windows over the chips of ONE host (ICI
  bandwidth; see sharded_msm).
- ACROSS proofs, shard the batch over HOSTS: each process verifies its own
  slice with its own accumulator and final MSM — the random-linear-
  combination accumulator makes slices independently sound, so the only
  cross-host traffic is the verdict reduction (one all_gather of a few
  bytes over DCN).  Scaling across hosts is therefore trivially linear in
  the absence of stragglers.
"""

from __future__ import annotations

import os

import jax
import numpy as np

__all__ = ["init_multihost", "process_slice", "global_mesh",
           "all_hosts_agree", "distributed_batch_verify"]


def init_multihost(coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> tuple[int, int]:
    """Join (or create) the multi-host process group.

    No-op in a single-process run.  In managed environments (GKE/TPU VM
    metadata) `jax.distributed.initialize()` auto-detects everything;
    explicit args override (coordinator "host:port", world size, rank, e.g.
    from CURDLEPROOFS_COORDINATOR / _NPROCS / _PROCID).  Returns
    (process_index, process_count).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "CURDLEPROOFS_COORDINATOR")
    if num_processes is None and os.environ.get("CURDLEPROOFS_NPROCS"):
        num_processes = int(os.environ["CURDLEPROOFS_NPROCS"])
    if process_id is None and os.environ.get("CURDLEPROOFS_PROCID"):
        process_id = int(os.environ["CURDLEPROOFS_PROCID"])
    if coordinator_address or (num_processes or 0) > 1:
        from jax._src import distributed as _dist

        if getattr(_dist.global_state, "client", None) is None:  # idempotent
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes, process_id=process_id)
    return jax.process_index(), jax.process_count()


def process_slice(n_items: int) -> slice:
    """This process's contiguous shard of an n_items batch."""
    rank, world = jax.process_index(), jax.process_count()
    per = -(-n_items // world)
    return slice(rank * per, min(n_items, (rank + 1) * per))


def global_mesh(n_window_shards: int = 1,
                axes: tuple[str, str] = ("points", "windows")):
    """Mesh over ALL devices of the process group (local ones in a
    single-process run); collectives ride ICI within a host's slice and DCN
    across hosts automatically."""
    from .sharded_msm import make_msm_mesh

    devs = jax.devices()  # global list after init_multihost
    dp = len(devs) // n_window_shards
    grid = np.array(devs[: dp * n_window_shards]).reshape(dp, n_window_shards)
    from jax.sharding import Mesh

    return Mesh(grid, axes)


def all_hosts_agree(local_ok: bool) -> bool:
    """AND-reduce a local verdict across the process group (one tiny DCN
    collective; trivially True single-process)."""
    if jax.process_count() == 1:
        return bool(local_ok)
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    flags = multihost_utils.process_allgather(
        jnp.asarray([1 if local_ok else 0], jnp.int32))
    return bool(np.asarray(flags).min() == 1)


def distributed_batch_verify(crs, instances, proofs, rng,
                             local_mesh=None) -> bool:
    """Verify a proof batch sharded across hosts (DCN) with per-host
    accumulators (ICI-sharded final MSM when `local_mesh` is given).

    Every process must call this with the SAME full batch; each verifies
    only `process_slice(len(proofs))` and the verdicts AND-reduce.
    """
    from .batch_verify import batch_verify

    sl = process_slice(len(proofs))
    ok = batch_verify(crs, instances[sl], proofs[sl], rng, mesh=local_mesh)
    return all_hosts_agree(bool(ok))
