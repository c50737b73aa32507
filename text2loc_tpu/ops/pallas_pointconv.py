"""Fused PointConv set-abstraction kernel (inference path).

One SA level of the PointNet++ backbone is: ball-query K nearest in-radius
neighbors per FPS center, per-edge MLP over concat(x_j, pos_j - c_i), max over
neighbors (reference models/pointcloud/pointnet2.py:18-38 via PyG kernels).
The XLA path realizes this as one-hot gather matmuls + HBM-resident edge
tensors (GBs of traffic at serving batch sizes). This kernel keeps one cloud's
entire level in VMEM:

* the first Dense layer is decomposed through the concat:
  Dense([x_j, pos_j - c_i]) = x_j@Wx + pos_j@Wp - c_i@Wp + b — two small
  matmuls u[j], s[i] and a broadcast add, so NO neighbor gather exists at all;
* neighbor selection becomes a [S, P] mask built by K rounds of masked argmin
  (identical K-nearest-within-radius semantics as ops.ballquery, same
  first-index tie-breaking);
* BatchNorm is pre-folded into per-channel affines (inference uses running
  statistics, so BN is affine); both layers + ReLU + the masked neighbor max
  run on the tile before anything returns to HBM.

Training keeps the XLA path (batch-global BN statistics need cross-tile
reductions).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = 3.0e38
NEG = -1.0e30


def _sa_kernel(x_ref, pos_ref, ctr_ref, wx_ref, wp_ref, ab1_ref, w2_ref,
               ab2_ref, out_ref, *, radius: float, k: int, select_k: bool):
    x = x_ref[0]                                   # [P, C]  (compute dtype)
    pos = pos_ref[0].astype(jnp.float32)           # [P, 3]
    ctr = ctr_ref[0].astype(jnp.float32)           # [S, 3]
    p = x.shape[0]
    s = ctr.shape[0]

    # First layer decomposed through the concat (f32 accumulation).
    u = jnp.dot(x.astype(jnp.float32), wx_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32)
    u = u + jnp.dot(pos, wp_ref[:].astype(jnp.float32),
                    preferred_element_type=jnp.float32)   # [P, H1]
    sv = -jnp.dot(ctr, wp_ref[:].astype(jnp.float32),
                  preferred_element_type=jnp.float32)     # [S, H1]

    # Squared distances [S, P] on the MXU.
    cross = jnp.dot(ctr, pos.T, preferred_element_type=jnp.float32)
    d2 = (
        jnp.sum(ctr * ctr, axis=1)[:, None]
        - 2.0 * cross
        + jnp.sum(pos * pos, axis=1)[None, :]
    )
    d2 = jnp.maximum(d2, 0.0)

    if not select_k:
        # All-in-radius aggregation: a deterministic superset of the
        # reference's ARBITRARY <=K in-radius subset (torch-cluster insertion
        # order) — no sequential selection at all.
        sel32 = jnp.where(d2 <= radius * radius, 1.0, 0.0)
    else:
        # K-nearest-within-radius selection mask via K masked-argmin rounds
        # (same set and tie-breaking as lax.top_k over -d2).
        lane = jax.lax.broadcasted_iota(jnp.int32, (s, p), 1)
        d2m = jnp.where(d2 <= radius * radius, d2, INF)

        # Selection mask carried as f32 throughout: Mosaic neither loops over
        # bool carries nor inserts minor dims on sub-32-bit types.
        def sel_round(_, carry):
            d2m, sel32 = carry
            jmin = jnp.argmin(d2m, axis=1)             # [S]
            rowvalid = (jnp.min(d2m, axis=1, keepdims=True) < INF)  # [S, 1]
            hit = (lane == jmin[:, None]) & rowvalid
            return jnp.where(hit, INF, d2m), jnp.maximum(
                sel32, jnp.where(hit, 1.0, 0.0)
            )

        _, sel32 = jax.lax.fori_loop(
            0, k, sel_round, (d2m, jnp.zeros((s, p), jnp.float32))
        )

    a1 = ab1_ref[0]                                # [H1] folded scale
    b1 = ab1_ref[1]                                # [H1] folded shift
    a2 = ab2_ref[0]
    b2 = ab2_ref[1]

    # Edge hidden: h1[i, j] = relu((u[j] + s[i]) * a1 + b1)  -> [S, P, H1].
    h1 = u[None, :, :] + sv[:, None, :]
    h1 = jnp.maximum(h1 * a1[None, None, :] + b1[None, None, :], 0.0)
    h1 = h1.astype(x.dtype)

    # Second layer + folded BN + ReLU.
    h1f = h1.reshape(s * p, -1)
    h2 = jnp.dot(h1f, w2_ref[:], preferred_element_type=jnp.float32)
    h2 = jnp.maximum(h2 * a2[None, :] + b2[None, :], 0.0)
    h2 = h2.reshape(s, p, -1)

    # Masked max over neighbors; empty selection -> 0 (PyG scatter-max fill).
    filled = jnp.where(sel32[:, :, None] > 0.0, h2, NEG)
    pooled = jnp.max(filled, axis=1)               # [S, H2]
    any_sel = jnp.max(sel32, axis=1, keepdims=True)  # [S, 1] f32
    out_ref[0] = jnp.where(any_sel > 0.0, pooled, 0.0).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("radius", "k", "interpret", "select_k"),
)
def fused_set_abstraction(
    x: jax.Array,            # [N, P, C] compute dtype (bf16/f32)
    pos: jax.Array,          # [N, P, 3]
    centers: jax.Array,      # [N, S, 3]
    wx: jax.Array,           # [C, H1]   dense_0 kernel rows for x channels
    wp: jax.Array,           # [3, H1]   dense_0 kernel rows for rel channels
    ab1: jax.Array,          # [2, H1]   folded (scale, shift); shift includes dense bias
    w2: jax.Array,           # [H1, H2]
    ab2: jax.Array,          # [2, H2]
    radius: float,
    k: int,
    interpret: bool = False,
    select_k: bool = True,
) -> jax.Array:
    """Returns [N, S, H2] pooled features. Inference only (BN pre-folded)."""
    n, p, c = x.shape
    s = centers.shape[1]
    h1 = wx.shape[1]
    h2 = w2.shape[1]

    def im_x(i):
        return (i, 0, 0)

    def im_w(i):
        return (0, 0)

    kernel = functools.partial(_sa_kernel, radius=radius, k=k, select_k=select_k)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, s, h2), x.dtype),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, p, c), im_x, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, 3), im_x, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, 3), im_x, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, h1), im_w, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, h1), im_w, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, h1), im_w, memory_space=pltpu.VMEM),
            pl.BlockSpec((h1, h2), im_w, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, h2), im_w, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s, h2), im_x, memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, pos, centers, wx, wp, ab1, w2, ab2)


def fold_bn_affine(dense_bias, bn_scale, bn_bias, bn_mean, bn_var,
                   eps: float = 1e-5) -> jax.Array:
    """(Dense bias, BN params/stats) -> [2, C] folded (scale, shift).

    y = ((z + b) - mean) / sqrt(var + eps) * scale + bias
      = z * a + (b * a + (bias - mean * a))   with a = scale / sqrt(var+eps).
    """
    a = bn_scale * jax.lax.rsqrt(bn_var + eps)
    shift = dense_bias * a + (bn_bias - bn_mean * a)
    return jnp.stack([a, shift]).astype(jnp.float32)
