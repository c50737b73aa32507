"""Fused farthest-point-sampling Pallas kernel.

The portable XLA FPS (text2loc_tpu.ops.fps) runs S sequential rounds, each a
separate [N, P] distance pass with HBM traffic between rounds. This kernel
keeps one tile of point clouds resident in VMEM and runs the entire selection
loop on-chip: per grid step, load [TILE_N, P] coordinate planes once, then S
rounds of VPU work (distance update, running min, argmax) with no HBM
round-trips. Replaces torch-cluster's `gnn.fps` CUDA kernel
(/root/reference/models/pointcloud/pointnet2.py:26) on the TPU backend.

Design notes:
* coordinates are carried as three separate [TILE_N, P] planes (lane dim = P),
  the natural VPU layout;
* the "gather the just-selected point's coords" step avoids a lane gather:
  with `sel` the [TILE_N] selected column, coords are extracted as
  max(where(lane_iota == sel, plane, -inf)) — three masked reductions;
* argmax tie-breaking matches jnp.argmax (first max), so results are bit-equal
  to the XLA oracle and torch-parity tests can share golden values.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30  # python scalar: jnp constants would be captured tracers


def _fps_kernel(x_ref, y_ref, z_ref, out_ref, cx_ref, cy_ref, cz_ref, *,
                num_samples: int):
    x = x_ref[:].astype(jnp.float32)   # [T, P]
    y = y_ref[:].astype(jnp.float32)
    z = z_ref[:].astype(jnp.float32)
    t, p = x.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (t, p), 1)

    slot = jax.lax.broadcasted_iota(jnp.int32, (t, num_samples), 1)

    def select_coords(sel):
        """Coords of column `sel` per row, via masked max (no lane gather)."""
        m = lane == sel[:, None]
        gx = jnp.max(jnp.where(m, x, NEG), axis=1)
        gy = jnp.max(jnp.where(m, y, NEG), axis=1)
        gz = jnp.max(jnp.where(m, z, NEG), axis=1)
        return gx, gy, gz

    first = jnp.zeros((t,), jnp.int32)
    lx, ly, lz = select_coords(first)
    min_d = jnp.full((t, p), jnp.float32(3.4e38))
    # Selected indices accumulate in a carried [T, S] tile (a dynamic
    # single-lane store would need lane alignment Mosaic can't prove).
    acc = jnp.zeros((t, num_samples), jnp.int32)
    # Selected coordinates accumulate alongside: the round's (lx, ly, lz) ARE
    # the coords of the selection, so emitting them here makes the external
    # center gather (an HBM one-hot matmul) unnecessary.
    cx = jnp.where(slot == 0, lx[:, None], 0.0)
    cy = jnp.where(slot == 0, ly[:, None], 0.0)
    cz = jnp.where(slot == 0, lz[:, None], 0.0)

    def body(i, carry):
        min_d, acc, cx, cy, cz, lx, ly, lz = carry
        d = (x - lx[:, None]) ** 2 + (y - ly[:, None]) ** 2 + (z - lz[:, None]) ** 2
        min_d = jnp.minimum(min_d, d)
        nxt = jnp.argmax(min_d, axis=1).astype(jnp.int32)
        acc = jnp.where(slot == i, nxt[:, None], acc)
        lx, ly, lz = select_coords(nxt)
        cx = jnp.where(slot == i, lx[:, None], cx)
        cy = jnp.where(slot == i, ly[:, None], cy)
        cz = jnp.where(slot == i, lz[:, None], cz)
        return min_d, acc, cx, cy, cz, lx, ly, lz

    _, acc, cx, cy, cz, _, _, _ = jax.lax.fori_loop(
        1, num_samples, body, (min_d, acc, cx, cy, cz, lx, ly, lz)
    )
    out_ref[:] = acc
    cx_ref[:] = cx
    cy_ref[:] = cy
    cz_ref[:] = cz


@functools.partial(
    jax.jit, static_argnames=("num_samples", "tile_n", "interpret",
                              "with_coords")
)
def farthest_point_sampling_pallas(
    points: jax.Array,
    num_samples: int,
    tile_n: int = 64,
    interpret: bool = False,
    with_coords: bool = False,
):
    """[N, P, 3] -> [N, S] int32 FPS indices (first index always 0).

    With ``with_coords``, also returns the selected coordinates [N, S, 3]
    (f32) extracted inside the kernel — bit-identical to gathering
    `points[idx]`, without the external one-hot gather pass.

    N must be a multiple of `tile_n` (callers pad; batch sizes in this
    framework are B*O with O a fixed slot count, so tiles line up).
    """
    n, p, _ = points.shape
    tile_n = min(tile_n, n)
    assert n % tile_n == 0, (n, tile_n)
    # Three coordinate planes: [N, P] each.
    x = points[..., 0]
    y = points[..., 1]
    z = points[..., 2]

    grid = (n // tile_n,)
    plane_spec = pl.BlockSpec(
        (tile_n, p), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (tile_n, num_samples), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(_fps_kernel, num_samples=num_samples)
    idx, cx, cy, cz = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((n, num_samples), jnp.int32),
            jax.ShapeDtypeStruct((n, num_samples), jnp.float32),
            jax.ShapeDtypeStruct((n, num_samples), jnp.float32),
            jax.ShapeDtypeStruct((n, num_samples), jnp.float32),
        ],
        grid=grid,
        in_specs=[plane_spec, plane_spec, plane_spec],
        out_specs=[out_spec, out_spec, out_spec, out_spec],
        interpret=interpret,
    )(x, y, z)
    if with_coords:
        return idx, jnp.stack([cx, cy, cz], axis=-1)
    return idx
