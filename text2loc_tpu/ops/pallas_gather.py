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
