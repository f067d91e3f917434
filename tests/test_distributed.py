"""Multi-host plumbing (parallel/distributed.py) in its single-process form.

A real multi-host pod is unavailable in CI; these tests pin the process-group
helpers' single-process semantics and run distributed_batch_verify end-to-end
(one process, virtual 8-device mesh for the sharded final MSM).
"""

import jax

from curdleproofs_tpu.curdleproofs import CurdleproofsProof, generate_crs
from curdleproofs_tpu.host.rng import StdRng
from curdleproofs_tpu.parallel.batch_verify import ShuffleInstance
from curdleproofs_tpu.parallel.distributed import (
    all_hosts_agree, distributed_batch_verify, global_mesh, init_multihost,
    process_slice,
)
from curdleproofs_tpu.util import (
    shuffle_permute_and_commit_input,
)


def test_single_process_group():
    rank, world = init_multihost()
    assert (rank, world) == (0, 1)
    assert process_slice(10) == slice(0, 10)
    assert all_hosts_agree(True) is True
    assert all_hosts_agree(False) is False


def test_global_mesh_axes():
    mesh = global_mesh(n_window_shards=2)
    assert mesh.axis_names == ("points", "windows")
    assert mesh.devices.shape == (len(jax.devices()) // 2, 2)


def test_distributed_batch_verify_single_process():
    ell = 28
    rng = StdRng.seed_from_u64(5)
    crs = generate_crs(ell)
    insts, proofs = [], []
    for _ in range(3):
        perm = list(range(ell))
        rng.shuffle(perm)
        k = rng.rand_fr()
        R = [rng.rand_g1() for _ in range(ell)]
        S = [rng.rand_g1() for _ in range(ell)]
        T, U, M, mb = shuffle_permute_and_commit_input(crs, R, S, perm, k, rng)
        proofs.append(
            CurdleproofsProof.new(crs, R, S, T, U, M, perm, k, mb, rng))
        insts.append(ShuffleInstance(R, S, T, U, M))
    assert distributed_batch_verify(crs, insts, proofs, rng)
    # tamper: swap one instance's T/U
    insts[1] = ShuffleInstance(insts[1].vec_R, insts[1].vec_S,
                               insts[1].vec_U, insts[1].vec_T, insts[1].M)
    assert not distributed_batch_verify(crs, insts, proofs, rng)
