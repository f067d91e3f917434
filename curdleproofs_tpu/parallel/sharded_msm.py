"""Pippenger MSM sharded across a TPU mesh: points x windows.

Two mesh axes over the SAME on-device pipeline as the single-chip flagship
kernel (ops/msm_device.py):

- `points` (data parallel): each device runs digit-recode -> sort -> slot
  plan -> Pallas bucket fold -> merge -> bucket reduction on its shard of
  (point, scalar) pairs.  Window sums are additive across shards, so the
  only communication is the final [3, 24, W] window-sum tensor.
- `windows` ("tensor parallel", SURVEY.md §2c row 3): Pippenger windows are
  statically partitioned across the axis; each device sorts/folds/reduces
  only its window range, cutting both the per-device fold entries and the
  fixed W*B bucket-reduction term by the axis size.

EC addition is not an arithmetic `psum`, so the cross-device combine over
the points axis is a recursive-doubling ppermute butterfly of complete G1
adds on device (log2(Dp) exchange+add steps over the tiny [3, 24, Wl]
window-sum tensor); the host only runs the final W-window Horner ladder.
Non-power-of-2 point axes fall back to stacking the per-shard sums and
adding them on host.

This scales the verifier's one giant deduped MSM (the reference's rayon
`VariableBaseMSM`, util.rs:19-22 / msm_accumulator.rs:55-68) across chips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..host.g1 import G1
from ..ops.g1_ops import PointsXYZ, g1_infinity, points_to_device, use_pallas
from ..ops.msm_device import (
    _pipeline_core, _scalars_to_limbs, _signed_digits, _window_sums_to_host,
    fold_rows_for, slot_bound,
)

__all__ = ["make_msm_mesh", "sharded_msm_kernel", "sharded_msm"]


def make_msm_mesh(n_devices: int | None = None, n_window_shards: int = 1,
                  axes: tuple[str, str] = ("points", "windows")) -> Mesh:
    """Mesh of shape (n_devices / n_window_shards, n_window_shards)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    dp = len(devs) // n_window_shards
    grid = np.array(devs[: dp * n_window_shards]).reshape(dp, n_window_shards)
    return Mesh(grid, axes)


def _pick_c(n_total: int) -> int:
    return 8 if n_total < (1 << 18) else 16


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "n_local", "c", "w_local", "t_rows", "s_pad",
                     "pallas", "device_reduce"))
def _sharded_step(pts, limbs, *, mesh, n_local, c, w_local, t_rows, s_pad,
                  pallas, device_reduce=False):
    """pts: [24, n] x3 plain points; limbs [16, n].

    Returns per-device window sums (canonical projective):
    [Dp, Dw, 3, 24, w_local] in the default mode, or [1, Dw, 3, 24, w_local]
    with `device_reduce` — the points axis is then collapsed ON DEVICE by a
    log2(Dp)-step ppermute butterfly of complete G1 adds (the EC analogue of
    an ICI all-reduce: group addition has no `psum`, so the collective is a
    recursive-doubling exchange + on-device adds), and the host combine
    drops from Dp*Dw*Wl point additions to none at all."""
    dp = mesh.devices.shape[0]

    def local(px, py, pz, lb):
        # extend the local shard to packed [P | -P | inf] + z liveness bits
        from ..ops.field import FQ
        from ..ops.g1_ops import _g1_add_jnp
        from ..ops.msm_device import _leave_montgomery, _pack_rows, use_madd

        inf = g1_infinity((1,))
        ppx = _pack_rows(px)
        ext_px = jnp.concatenate([ppx, ppx, _pack_rows(inf.x)], axis=1)
        ext_py = jnp.concatenate([_pack_rows(py), _pack_rows(FQ.neg(py)),
                                  _pack_rows(inf.y)], axis=1)
        zb = jnp.any(pz != 0, axis=0).astype(jnp.uint32)
        ext_zb = jnp.concatenate([zb, zb, jnp.zeros((1,), jnp.uint32)])
        digits = _signed_digits(lb, n_local, c)           # all windows
        j = lax.axis_index("windows")
        mine = lax.dynamic_slice_in_dim(digits, j * w_local, w_local, axis=0)

        out = _pipeline_core(ext_px, ext_py, ext_zb, mine, n=n_local, c=c,
                             w_cnt=w_local, t_rows=t_rows, s_pad=s_pad,
                             pallas=pallas, madd=use_madd(),
                             to_canonical=not device_reduce)
        if device_reduce:
            # butterfly all-reduce over the points axis in Montgomery form;
            # the [24, Wl] shapes are tiny, so the jnp complete add is used
            # (no extra pallas kernel instance to lower/compile)
            acc = PointsXYZ(out[0], out[1], out[2])
            step = 1
            while step < dp:
                perm = [(i, i ^ step) for i in range(dp)]
                q = PointsXYZ(
                    lax.ppermute(acc.x, "points", perm),
                    lax.ppermute(acc.y, "points", perm),
                    lax.ppermute(acc.z, "points", perm))
                acc = _g1_add_jnp(acc, q)
                step *= 2
            out = _leave_montgomery(acc)
        return out[None, None]                            # [1, 1, 3, 24, Wl]

    if device_reduce:
        assert dp & (dp - 1) == 0, "device_reduce needs a power-of-2 axis"
        # every device holds the reduced sums; emit rank 0's copy only
        # (check_vma can't see through the ppermute butterfly, hence False)
        return jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(None, "points"), P(None, "points"), P(None, "points"),
                      P(None, "points")),
            out_specs=P(None, "windows", None, None, None),
            check_vma=False,
        )(pts.x, pts.y, pts.z, limbs)
    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, "points"), P(None, "points"), P(None, "points"),
                  P(None, "points")),
        out_specs=P("points", "windows", None, None, None),
    )(pts.x, pts.y, pts.z, limbs)


def sharded_msm_kernel(mesh: Mesh, n_total: int, c: int | None = None):
    """Build a host-facing callable (points, scalars) -> G1 for fixed sizes.

    `n_total` is padded so every `points`-shard gets the same local size.
    """
    dp, dw = mesh.devices.shape
    c = c if c is not None else _pick_c(n_total)
    w_total = -(-255 // c)
    if w_total % dw:
        raise ValueError(f"windows axis {dw} must divide W={w_total}")
    w_local = w_total // dw
    n_local = -(-n_total // dp)
    n_local = max(64, -(-n_local // 64) * 64)
    n_pad = n_local * dp
    t_rows = fold_rows_for(n_local, c)
    s_pad = slot_bound(n_local, w_local, c, t_rows)
    pallas = use_pallas()

    # the points axis reduces on device (ppermute butterfly) whenever it is
    # a power of 2 — the host then sees exactly W window sums regardless of
    # Dp, so the combine cost no longer grows with the mesh
    device_reduce = dp > 1 and (dp & (dp - 1)) == 0

    def run(points: list[G1], scalars: list[int]) -> G1:
        assert len(points) <= n_pad
        pts = points_to_device(
            list(points) + [G1.infinity()] * (n_pad - len(points)))
        limbs = jnp.asarray(_scalars_to_limbs(list(scalars), n_pad))
        out = np.asarray(_sharded_step(
            pts, limbs, mesh=mesh, n_local=n_local, c=c, w_local=w_local,
            t_rows=t_rows, s_pad=s_pad, pallas=pallas,
            device_reduce=device_reduce))
        # host combine: [Rp, Dw, 3, 24, Wl] window sums -> W windows -> Horner
        # (Rp = 1 when the points axis was reduced on device)
        shard_pts = _window_sums_to_host(
            out.transpose(2, 3, 0, 1, 4).reshape(3, 24, -1))
        rp = out.shape[0]
        win = [G1.infinity() for _ in range(w_total)]
        k = 0
        for i in range(rp):
            for j in range(dw):
                for l in range(w_local):
                    win[j * w_local + l] = win[j * w_local + l].add(
                        shard_pts[k])
                    k += 1
        acc = G1.infinity()
        for w in range(w_total - 1, -1, -1):
            for _ in range(c):
                acc = acc.double()
            acc = acc.add(win[w])
        return acc

    return run


def sharded_msm(points: list[G1], scalars: list[int],
                mesh: Mesh | None = None, c: int | None = None) -> G1:
    """Host-facing sharded MSM: pads, uploads, runs, combines."""
    if mesh is None:
        mesh = make_msm_mesh()
    return sharded_msm_kernel(mesh, len(points), c)(points, scalars)
