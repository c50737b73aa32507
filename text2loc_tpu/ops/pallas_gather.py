"""VMEM one-hot gather kernel.

The XLA one-hot gather (ops.ballquery.onehot_gather) materializes the
[N, Q, P] selection tensor in HBM — at PointNet SA1 serving sizes that's
~4 GB of traffic per level. This kernel builds the one-hot on-chip: per cloud,
the selection matrix lives only in VMEM (a [Q, P] iota==idx compare), feeds
one MXU matmul against the cloud's [P, C] rows, and only the [Q, C] result
returns to HBM. Results are bit-identical to take_along_axis (exact one-unit
selection rows).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(x_ref, idx_ref, out_ref):
    x = x_ref[0]                                   # [P, C]
    idx = idx_ref[0, 0]                            # [Q] int32
    q = idx.shape[0]
    p = x.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (q, p), 1)
    oh = (lane == idx[:, None]).astype(x.dtype)    # [Q, P], VMEM-only
    out_ref[0] = jnp.dot(
        oh, x, preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rows_pallas(values: jax.Array, idx: jax.Array,
                       interpret: bool = False) -> jax.Array:
    """[N, P, C] gathered by [N, Q] int32 -> [N, Q, C]."""
    n, p, c = values.shape
    q = idx.shape[1]
    # idx carries a unit middle axis: Mosaic requires the last-two block dims
    # to be (8k, 128k) or equal to the array dims; (1, 1, Q) satisfies that.
    idx3 = idx.astype(jnp.int32).reshape(n, 1, q)
    return pl.pallas_call(
        _gather_kernel,
        out_shape=jax.ShapeDtypeStruct((n, q, c), values.dtype),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, p, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, q), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(values, idx3)


def fits_vmem(p: int, q: int, c: int, itemsize: int = 2,
              budget: int = 12 * 1024 * 1024) -> bool:
    """Conservative VMEM check for one grid step (one-hot + in + out)."""
    return (q * p + p * c + q * c) * itemsize < budget


def tiled_fits_vmem(p: int, q: int, c: int, itemsize: int = 4,
                    budget: int = 12 * 1024 * 1024) -> bool:
    """VMEM check for one q-tiled grid step at the SMALLEST tile (_q_tile
    floors at 128): one-hot+iota [QT, P], the [P, C] cloud block and the
    [QT, C] out block, double-buffered."""
    qt = _q_tile(q, p, 2048)
    return (qt * p * 2 + 2 * (p * c + qt * c)) * max(itemsize, 4) < budget


def _gather_q_kernel(x_ref, idx_ref, out_ref):
    x = x_ref[0]                                   # [P, C]
    idx = idx_ref[0, 0]                            # [QT]
    p = x.shape[0]
    qt = idx.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (qt, p), 1)
    oh = (lane == idx[:, None]).astype(x.dtype)    # [QT, P], VMEM-only
    out_ref[0] = jnp.dot(
        oh, x, preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


def _scatter_q_kernel(g_ref, idx_ref, out_ref):
    g = g_ref[0]                                   # [QT, C]
    idx = idx_ref[0, 0]                            # [QT]
    p = out_ref.shape[1]
    qt = idx.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (p, qt), 0)
    # Transposed one-hot: row p sums every gathered slot that read point p
    # (duplicate indices accumulate — exact scatter-add semantics).
    oht = (rows == idx[None, :]).astype(g.dtype)
    part = jnp.dot(
        oht, g, preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)
    # Q-tiles revisit the same [P, C] out block (index map drops the q grid
    # axis); TPU grids iterate sequentially, so init-then-accumulate is safe.
    @pl.when(pl.program_id(1) == 0)
    def _init():
        out_ref[0] = part

    @pl.when(pl.program_id(1) > 0)
    def _acc():
        out_ref[0] = out_ref[0] + part


def _q_tile(q: int, p: int, tile_q: int) -> int:
    """Largest power-of-two Q chunk <= tile_q whose [QT, P] one-hot (plus
    iota) stays well under the scoped-VMEM limit."""
    qt = min(q, tile_q)
    while qt > 128 and qt * p * 8 > 6 * 1024 * 1024:
        qt //= 2
    return qt


@functools.partial(jax.jit, static_argnames=("tile_q", "interpret"))
def _gather_tiled(values, idx, tile_q: int = 2048, interpret: bool = False):
    n, p, c = values.shape
    q = idx.shape[1]
    qt = _q_tile(q, p, tile_q)
    q_pad = -(-q // qt) * qt
    idx3 = idx.astype(jnp.int32).reshape(n, 1, q)
    if q_pad != q:
        idx3 = jnp.pad(idx3, [(0, 0), (0, 0), (0, q_pad - q)])
    out = pl.pallas_call(
        _gather_q_kernel,
        out_shape=jax.ShapeDtypeStruct((n, q_pad, c), values.dtype),
        grid=(n, q_pad // qt),
        in_specs=[
            pl.BlockSpec((1, p, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, qt), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, qt, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(values, idx3)
    return out[:, :q]


@functools.partial(jax.jit, static_argnames=("p", "tile_q", "interpret"))
def _scatter_tiled(g, idx, p: int, tile_q: int = 2048, interpret: bool = False):
    n, q, c = g.shape
    qt = _q_tile(q, p, tile_q)
    q_pad = -(-q // qt) * qt
    idx3 = idx.astype(jnp.int32).reshape(n, 1, q)
    if q_pad != q:
        # Padded slots carry zero cotangent rows, so their target is moot.
        idx3 = jnp.pad(idx3, [(0, 0), (0, 0), (0, q_pad - q)])
        g = jnp.pad(g, [(0, 0), (0, q_pad - q), (0, 0)])
    out = pl.pallas_call(
        _scatter_q_kernel,
        out_shape=jax.ShapeDtypeStruct((n, p, c), g.dtype),
        grid=(n, q_pad // qt),
        in_specs=[
            pl.BlockSpec((1, qt, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, qt), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, p, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(g, idx3)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _gather_rows_vjp(values, idx, p: int, tile_q: int, interpret: bool):
    return _gather_tiled(values, idx, tile_q=tile_q, interpret=interpret)


def _gather_rows_fwd(values, idx, p, tile_q, interpret):
    return _gather_tiled(values, idx, tile_q=tile_q, interpret=interpret), idx


def _gather_rows_bwd(p, tile_q, interpret, idx, g):
    import numpy as np

    dvalues = _scatter_tiled(g, idx, p=p, tile_q=tile_q, interpret=interpret)
    return dvalues, np.zeros(idx.shape, dtype=jax.dtypes.float0)


_gather_rows_vjp.defvjp(_gather_rows_fwd, _gather_rows_bwd)


def gather_rows_grad(values: jax.Array, idx: jax.Array, tile_q: int = 2048,
                     interpret: bool = False) -> jax.Array:
    """Differentiable VMEM one-hot gather: [N, P, C] by [N, Q] -> [N, Q, C].

    The TRAINING-path gather: forward builds each (cloud, Q-tile)'s [QT, P]
    one-hot in VMEM (never HBM — the XLA formulation's dominant traffic at
    SA shapes, ~3.8 GB at SA1 batch-32), and the custom VJP computes dvalues
    as the TRANSPOSED VMEM one-hot matmul, accumulated across Q-tiles in the
    revisited [P, C] out block (exact scatter-add over duplicate indices; no
    XLA scatter HLO). Bit-identical to take_along_axis in forward; backward
    exact (one-unit rows).
    """
    return _gather_rows_vjp(values, idx, values.shape[1], tile_q, interpret)
