"""Fused TRAINING-mode PointConv set-abstraction level (custom VJP).

The XLA training path materializes [N, S*K, H] edge activations in HBM and
streams them through dense -> masked-BatchNorm -> relu twice, forward and
backward (~1 GB per level per pass at batch-32 shapes; measured to dominate
the coarse train step — BENCHMARKS.md optimization log #9). This module runs
one SA level's training forward AND hand-derived backward as Pallas kernels
that recompute the edge pipeline per (cloud, S-tile) in VMEM — edge tensors
NEVER exist in HBM, in either direction. Like the inference kernels
(ops/pallas_pointconv.py), G clouds are processed per grid program behind an
in-kernel fori_loop so launch overhead amortizes over the thousands-of-clouds
grid.

Math (reference models/pointcloud/pointnet2.py:18-38 + get_mlp BatchNorm
training semantics, identical to models.pointnet2.SetAbstraction's XLA path):

    e[n,s,k]  = u[n, idx[n,s,k]] - sv[n,s]          (first layer, hoisted:
                u = concat(x, pos) @ W1 + b1,        W1([x_j, pos_j - c_i])
                sv = centers @ W1[pos rows])          decomposes exactly)
    BN1 over maskf edges (batch statistics) -> a1, c1 affine
    h1 = relu(e * a1 + c1)
    z  = h1 @ W2 + b2
    BN2 over maskf edges -> a2, c2
    h2 = relu(z * a2 + c2)
    out[n,s] = max over maskm k of h2  (empty row -> 0)

maskf masks BN statistics (valid edges of real objects); maskm masks the
neighbor max (valid edges, incl. padding objects' — they are excluded
downstream, mirroring the XLA path's bn_mask vs nbr_mask distinction).

Backward (given dout; batch statistics make BN backward nonlocal):

    dh2 = dout * winner        winner = maskm*eq/cnt (JAX reduce_max tie
    dy2 = dh2 * r2                       semantics: even split among ties)
    dz  = a2*dy2 - maskf*a2*(A2/n + yhat2*B2/n)     A = sum_ALL dy,
    dh1 = dz @ W2^T ; dy1 = dh1 * r1                 B = sum_ALL dy*yhat
    (every edge is normalized with the masked stats, so the correction sums
    run over ALL edges; only masked edges receive the correction)
    de  = a1*dy1 - maskf*a1*(A1/n + yhat1*B1/n)
    du  = oh^T @ de ; dsv = -sum_k de
    dW2 = sum_edges h1^T dz ; db2 = sum_all dz
    dgamma = sum_all dy*yhat ; dbeta = sum_all dy

Three forward kernels (BN1 stats -> BN2 stats -> output) and three backward
kernels (BN2 reduction -> BN1 reduction + dW2 -> input grads), each
recomputing e/h1/z on the tile. In-kernel matmul inputs run in
``compute_dtype`` (bf16 default — the one-hot gather then rounds u to bf16,
which is the only deviation from the XLA path's f32 math; f32 available for
exact-equality tests), accumulation always f32.
"""

from __future__ import annotations

import functools


import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1.0e30


def sa_train_reference(u, sv, w2, b2, g1, be1, g2, be2, idx, maskm, maskf,
                       eps: float = 1e-5):
    """Pure-jnp restatement of the kernel's math (the autodiff oracle).

    Used by tests/test_pallas_sa_train.py (jax.grad of this provides the
    reference gradients) and scripts/probe_sa_train.py (on-chip check with
    identical neighbor indices). Semantics identical to the XLA training
    branch of models.pointnet2.SetAbstraction on pre-hoisted (u, sv)."""
    e = jnp.take_along_axis(
        u[:, None, :, :],
        idx[:, :, :, None].astype(jnp.int32),
        axis=2,
    ).reshape(u.shape[0], idx.shape[1], idx.shape[2], u.shape[-1])
    e = e - sv[:, :, None, :]

    mf = maskf.astype(jnp.float32)[..., None]
    n = jnp.maximum(jnp.sum(mf), 1.0)

    def bn(z, gamma, beta):
        m = jnp.sum(z * mf, axis=(0, 1, 2)) / n
        v = jnp.maximum(jnp.sum(z * z * mf, axis=(0, 1, 2)) / n - m * m, 0.0)
        inv = jax.lax.rsqrt(v + eps)
        return (z - m) * inv * gamma + beta, m, v

    y1, m1, v1 = bn(e, g1, be1)
    h1 = jnp.maximum(y1, 0.0)
    z = jnp.einsum("nskh,hc->nskc", h1, w2) + b2
    y2, m2, v2 = bn(z, g2, be2)
    h2 = jnp.maximum(y2, 0.0)

    mm = maskm[..., None]
    filled = jnp.where(mm, h2, NEG)
    pooled = jnp.max(filled, axis=2)
    any_m = jnp.any(mm, axis=2)
    out = jnp.where(any_m, pooled, 0.0)
    return out, (m1, v1, m2, v2, n)


def _edge_pipe(u, sv, idx, aux1, w2_ref, aux2, cdt, lanes, *, upto: str):
    """Recompute one cloud's edge pipeline for an S-tile. Returns
    (oh, e, h1, z) with later entries None when not requested
    (upto in {"e", "h1", "z"}).

    u: [P, H1]; sv: [s_t, H1] f32; idx: [s_t, K] int32; lanes: loop-invariant
    [s_t, K, P] iota. oh: [T, P] compute-dtype one-hot (T = s_t*K);
    e/h1/z: [T, H] f32.
    """
    s_t, k = idx.shape

    oh = (lanes == idx[:, :, None]).astype(cdt).reshape(s_t * k, -1)
    g = jnp.dot(oh, u.astype(cdt), preferred_element_type=jnp.float32)
    e = (
        g.reshape(s_t, k, -1) - sv[:, None, :].astype(jnp.float32)
    ).reshape(s_t * k, -1)                          # [T, H1] f32
    if upto == "e":
        return oh, e, None, None
    a1 = aux1[0]
    c1 = aux1[1]
    h1 = jnp.maximum(e * a1[None, :] + c1[None, :], 0.0)
    if upto == "h1":
        return oh, e, h1, None
    z = jnp.dot(h1.astype(cdt), w2_ref[:].astype(cdt),
                preferred_element_type=jnp.float32)
    z = z + aux2[6][None, :]                        # + b2
    return oh, e, h1, z


def _lanes(idx_ref, p: int):
    """Loop-invariant [s_t, K, P] lane iota, built once per program."""
    s_t, k = idx_ref.shape[1:]
    return jax.lax.broadcasted_iota(jnp.int32, (s_t, k, p), 2)


def _mask_wide(m, h: int):
    """[s_t, K] mask -> [s_t*K, h] f32. Mosaic rejects the
    [s_t, K] -> [s_t*K, 1] reshape (minor dim moved into sublanes), so
    broadcast to full width in 3-D and collapse the major dims instead."""
    s_t, k = m.shape
    return jnp.broadcast_to(m[:, :, None], (s_t, k, h)).reshape(s_t * k, h)


def _acc_rows(acc_ref, rows):
    """Accumulate `rows` (list of [H] f32) into acc_ref rows 0..len-1; rows
    beyond are zero-initialized. First grid program initializes."""
    h = acc_ref.shape[1]
    stacked = jnp.stack(rows + [jnp.zeros((h,), jnp.float32)] *
                        (acc_ref.shape[0] - len(rows)))

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _init():
        acc_ref[:, :] = stacked

    @pl.when((pl.program_id(0) > 0) | (pl.program_id(1) > 0))
    def _acc():
        acc_ref[:, :] = acc_ref[:, :] + stacked


def _k_stats1(u_ref, sv_ref, idx_ref, mf_ref, acc_ref, *, cdt, g_t):
    h1 = u_ref.shape[-1]
    lanes = _lanes(idx_ref, u_ref.shape[1])

    def body(gi, carry):
        s1, q1, cnt = carry
        _, e, _, _ = _edge_pipe(u_ref[gi], sv_ref[gi], idx_ref[gi], None,
                                None, None, cdt, lanes, upto="e")
        mf = _mask_wide(mf_ref[gi], h1)             # [T, H1] f32
        return (s1 + jnp.sum(e * mf, axis=0),
                q1 + jnp.sum(e * e * mf, axis=0),
                cnt + jnp.sum(mf_ref[gi]))

    zero = jnp.zeros((h1,), jnp.float32)
    s1, q1, cnt = jax.lax.fori_loop(
        0, g_t, body, (zero, zero, jnp.float32(0.0)))
    _acc_rows(acc_ref, [s1, q1, cnt * jnp.ones((h1,), jnp.float32)])


def _k_stats2(u_ref, sv_ref, idx_ref, mf_ref, aux1_ref, w2_ref, aux2_ref,
              acc_ref, *, cdt, g_t):
    h2 = w2_ref.shape[1]
    lanes = _lanes(idx_ref, u_ref.shape[1])

    def body(gi, carry):
        s2, q2 = carry
        _, _, _, z = _edge_pipe(u_ref[gi], sv_ref[gi], idx_ref[gi], aux1_ref,
                                w2_ref, aux2_ref, cdt, lanes, upto="z")
        mf = _mask_wide(mf_ref[gi], h2)
        return (s2 + jnp.sum(z * mf, axis=0),
                q2 + jnp.sum(z * z * mf, axis=0))

    zero = jnp.zeros((h2,), jnp.float32)
    s2, q2 = jax.lax.fori_loop(0, g_t, body, (zero, zero))
    _acc_rows(acc_ref, [s2, q2])


def _k_out(u_ref, sv_ref, idx_ref, mm_ref, aux1_ref, w2_ref, aux2_ref,
           out_ref, *, cdt, g_t):
    lanes = _lanes(idx_ref, u_ref.shape[1])
    s_t, k = idx_ref.shape[1:]

    def body(gi, _):
        _, _, _, z = _edge_pipe(u_ref[gi], sv_ref[gi], idx_ref[gi], aux1_ref,
                                w2_ref, aux2_ref, cdt, lanes, upto="z")
        a2 = aux2_ref[0]
        c2 = aux2_ref[1]
        h2 = jnp.maximum(z * a2[None, :] + c2[None, :], 0.0)
        h23 = h2.reshape(s_t, k, -1)
        mm = mm_ref[gi][:, :, None]                 # [s_t, K, 1] f32
        filled = jnp.where(mm > 0.0, h23, NEG)
        pooled = jnp.max(filled, axis=1)
        any_m = jnp.max(mm[:, :, 0], axis=1, keepdims=True)
        out_ref[gi] = jnp.where(any_m > 0.0, pooled, 0.0).astype(
            out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, g_t, body, 0)


def _dy2_cloud(gi, u_ref, sv_ref, idx_ref, mm_ref, aux1_ref, w2_ref,
               aux2_ref, do_ref, cdt, lanes):
    """Recompute cloud gi through h2; return (oh, e, h1, z, dy2)."""
    oh, e, h1, z = _edge_pipe(u_ref[gi], sv_ref[gi], idx_ref[gi], aux1_ref,
                              w2_ref, aux2_ref, cdt, lanes, upto="z")
    a2 = aux2_ref[0]
    c2 = aux2_ref[1]
    y2 = z * a2[None, :] + c2[None, :]
    h2 = jnp.maximum(y2, 0.0)
    s_t, k = idx_ref.shape[1:]
    h23 = h2.reshape(s_t, k, -1)
    mm = mm_ref[gi][:, :, None]
    filled = jnp.where(mm > 0.0, h23, NEG)
    mx = jnp.max(filled, axis=1, keepdims=True)     # [s_t, 1, H2]
    eq = jnp.where((filled >= mx) & (mm > 0.0), 1.0, 0.0)
    cnt = jnp.maximum(jnp.sum(eq, axis=1, keepdims=True), 1.0)
    dh2 = (do_ref[gi].astype(jnp.float32)[:, None, :] * eq / cnt).reshape(
        s_t * k, -1
    )
    r2 = jnp.where(y2 > 0.0, 1.0, 0.0)
    return oh, e, h1, z, dh2 * r2


def _k_bwd_stats(u_ref, sv_ref, idx_ref, mm_ref, mf_ref, aux1_ref, w2_ref,
                 aux2_ref, do_ref, acc_ref, *, cdt, g_t):
    h2 = w2_ref.shape[1]
    lanes = _lanes(idx_ref, u_ref.shape[1])

    def body(gi, carry):
        sA, sB = carry
        _, _, _, z, dy2 = _dy2_cloud(gi, u_ref, sv_ref, idx_ref, mm_ref,
                                     aux1_ref, w2_ref, aux2_ref, do_ref,
                                     cdt, lanes)
        yhat2 = (z - aux2_ref[2][None, :]) * aux2_ref[3][None, :]
        return (sA + jnp.sum(dy2, axis=0),
                sB + jnp.sum(dy2 * yhat2, axis=0))

    zero = jnp.zeros((h2,), jnp.float32)
    sA, sB = jax.lax.fori_loop(0, g_t, body, (zero, zero))
    _acc_rows(acc_ref, [sA, sB])


def _dz_cloud(z, dy2, mf, aux2_ref):
    a2 = aux2_ref[0]
    yhat2 = (z - aux2_ref[2][None, :]) * aux2_ref[3][None, :]
    corr = aux2_ref[4][None, :] + yhat2 * aux2_ref[5][None, :]
    return a2[None, :] * (dy2 - mf * corr)


def _k_bwd_mid(u_ref, sv_ref, idx_ref, mm_ref, mf_ref, aux1_ref, w2_ref,
               aux2_ref, do_ref, acc1_ref, dw2_ref, db2_ref, *, cdt, g_t):
    h1 = u_ref.shape[-1]
    h2 = w2_ref.shape[1]
    lanes = _lanes(idx_ref, u_ref.shape[1])

    def body(gi, carry):
        sA, sB, dw2, db2 = carry
        _, e, h1v, z, dy2 = _dy2_cloud(gi, u_ref, sv_ref, idx_ref, mm_ref,
                                       aux1_ref, w2_ref, aux2_ref, do_ref,
                                       cdt, lanes)
        dz = _dz_cloud(z, dy2, _mask_wide(mf_ref[gi], h2), aux2_ref)
        # dz @ W2^T as dot_general contracting on H2 (no in-kernel transpose).
        dh1 = jax.lax.dot_general(
            dz.astype(cdt), w2_ref[:].astype(cdt), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        a1 = aux1_ref[0]
        c1 = aux1_ref[1]
        r1 = jnp.where(e * a1[None, :] + c1[None, :] > 0.0, 1.0, 0.0)
        dy1 = dh1 * r1
        yhat1 = (e - aux1_ref[2][None, :]) * aux1_ref[3][None, :]
        dw2_part = jax.lax.dot_general(
            h1v.astype(cdt), dz.astype(cdt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                           # [H1, H2]
        return (sA + jnp.sum(dy1, axis=0),
                sB + jnp.sum(dy1 * yhat1, axis=0),
                dw2 + dw2_part,
                db2 + jnp.sum(dz, axis=0))

    sA, sB, dw2_part, db2_row = jax.lax.fori_loop(
        0, g_t, body,
        (jnp.zeros((h1,), jnp.float32), jnp.zeros((h1,), jnp.float32),
         jnp.zeros((h1, h2), jnp.float32), jnp.zeros((h2,), jnp.float32)))
    _acc_rows(acc1_ref, [sA, sB])
    db2_part = jnp.stack(
        [db2_row]
        + [jnp.zeros((h2,), jnp.float32)] * (db2_ref.shape[0] - 1)
    )

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _init():
        dw2_ref[:, :] = dw2_part
        db2_ref[:, :] = db2_part

    @pl.when((pl.program_id(0) > 0) | (pl.program_id(1) > 0))
    def _acc():
        dw2_ref[:, :] = dw2_ref[:, :] + dw2_part
        db2_ref[:, :] = db2_ref[:, :] + db2_part


def _k_bwd_in(u_ref, sv_ref, idx_ref, mm_ref, mf_ref, aux1_ref, w2_ref,
              aux2_ref, do_ref, du_ref, dsv_ref, *, cdt, g_t):
    h1 = u_ref.shape[-1]
    h2 = w2_ref.shape[1]
    lanes = _lanes(idx_ref, u_ref.shape[1])
    s_t, k = idx_ref.shape[1:]
    # program_id must be read at kernel top level (inside the fori_loop body
    # it escapes into a closed_call where interpret mode cannot lower it).
    first_j = pl.program_id(1) == 0

    def body(gi, _):
        oh, e, _, z, dy2 = _dy2_cloud(gi, u_ref, sv_ref, idx_ref, mm_ref,
                                      aux1_ref, w2_ref, aux2_ref, do_ref,
                                      cdt, lanes)
        dz = _dz_cloud(z, dy2, _mask_wide(mf_ref[gi], h2), aux2_ref)
        dh1 = jax.lax.dot_general(
            dz.astype(cdt), w2_ref[:].astype(cdt), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        a1 = aux1_ref[0]
        c1 = aux1_ref[1]
        r1 = jnp.where(e * a1[None, :] + c1[None, :] > 0.0, 1.0, 0.0)
        dy1 = dh1 * r1
        yhat1 = (e - aux1_ref[2][None, :]) * aux1_ref[3][None, :]
        corr = aux1_ref[4][None, :] + yhat1 * aux1_ref[5][None, :]
        mf1 = _mask_wide(mf_ref[gi], h1)
        de = a1[None, :] * (dy1 - mf1 * corr)       # [T, H1]

        du_part = jax.lax.dot_general(
            oh, de.astype(cdt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(du_ref.dtype)                      # [P, H1]

        # Accumulate over the S-tile grid axis. On the first j-program the
        # previous block content is uninitialized; the select discards it.
        prev = jnp.where(first_j, jnp.zeros_like(du_part), du_ref[gi])
        du_ref[gi] = prev + du_part

        dsv_ref[gi] = (-jnp.sum(de.reshape(s_t, k, -1), axis=1)).astype(
            dsv_ref.dtype
        )
        return 0

    jax.lax.fori_loop(0, g_t, body, 0)


def _h1_from_e(e, aux1_ref):
    a1 = aux1_ref[0]
    c1 = aux1_ref[1]
    return jnp.maximum(e * a1[None, :] + c1[None, :], 0.0)


def _z_from_e(e, aux1_ref, w2_ref, aux2_ref, cdt):
    h1v = _h1_from_e(e, aux1_ref)
    z = jnp.dot(h1v.astype(cdt), w2_ref[:].astype(cdt),
                preferred_element_type=jnp.float32)
    return h1v, z + aux2_ref[6][None, :]


def _k_stats1e(u_ref, sv_ref, idx_ref, mf_ref, e_ref, acc_ref, *, cdt, g_t):
    """Cached-e stats1: compute e once (gather), ROUND to the cache dtype,
    write it out, and take BN1 statistics of the ROUNDED values — the whole
    level then consistently sees the cached e (cache dtype f32 == the
    recompute path bit-for-bit)."""
    h1 = u_ref.shape[-1]
    lanes = _lanes(idx_ref, u_ref.shape[1])

    def body(gi, carry):
        s1, q1, cnt = carry
        _, e, _, _ = _edge_pipe(u_ref[gi], sv_ref[gi], idx_ref[gi], None,
                                None, None, cdt, lanes, upto="e")
        ec = e.astype(e_ref.dtype)
        e_ref[gi] = ec
        ef = ec.astype(jnp.float32)
        mf = _mask_wide(mf_ref[gi], h1)
        return (s1 + jnp.sum(ef * mf, axis=0),
                q1 + jnp.sum(ef * ef * mf, axis=0),
                cnt + jnp.sum(mf_ref[gi]))

    zero = jnp.zeros((h1,), jnp.float32)
    s1, q1, cnt = jax.lax.fori_loop(
        0, g_t, body, (zero, zero, jnp.float32(0.0)))
    _acc_rows(acc_ref, [s1, q1, cnt * jnp.ones((h1,), jnp.float32)])


def _k_stats2e(e_ref, mf_ref, aux1_ref, w2_ref, aux2_ref, acc_ref, *,
               cdt, g_t):
    h2 = w2_ref.shape[1]

    def body(gi, carry):
        s2, q2 = carry
        e = e_ref[gi].astype(jnp.float32)
        _, z = _z_from_e(e, aux1_ref, w2_ref, aux2_ref, cdt)
        mf = _mask_wide(mf_ref[gi], h2)
        return (s2 + jnp.sum(z * mf, axis=0),
                q2 + jnp.sum(z * z * mf, axis=0))

    zero = jnp.zeros((h2,), jnp.float32)
    s2, q2 = jax.lax.fori_loop(0, g_t, body, (zero, zero))
    _acc_rows(acc_ref, [s2, q2])


def _k_oute(e_ref, mm_ref, aux1_ref, w2_ref, aux2_ref, out_ref, *,
            cdt, g_t, k):
    def body(gi, _):
        e = e_ref[gi].astype(jnp.float32)
        _, z = _z_from_e(e, aux1_ref, w2_ref, aux2_ref, cdt)
        a2 = aux2_ref[0]
        c2 = aux2_ref[1]
        h2 = jnp.maximum(z * a2[None, :] + c2[None, :], 0.0)
        s_t = mm_ref.shape[1]
        h23 = h2.reshape(s_t, k, -1)
        mm = mm_ref[gi][:, :, None]
        filled = jnp.where(mm > 0.0, h23, NEG)
        pooled = jnp.max(filled, axis=1)
        any_m = jnp.max(mm[:, :, 0], axis=1, keepdims=True)
        out_ref[gi] = jnp.where(any_m > 0.0, pooled, 0.0).astype(
            out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, g_t, body, 0)


def _dy2_from_e(gi, e_ref, mm_ref, aux1_ref, w2_ref, aux2_ref, do_ref,
                cdt, k):
    e = e_ref[gi].astype(jnp.float32)
    h1v, z = _z_from_e(e, aux1_ref, w2_ref, aux2_ref, cdt)
    a2 = aux2_ref[0]
    c2 = aux2_ref[1]
    y2 = z * a2[None, :] + c2[None, :]
    h2 = jnp.maximum(y2, 0.0)
    s_t = mm_ref.shape[1]
    h23 = h2.reshape(s_t, k, -1)
    mm = mm_ref[gi][:, :, None]
    filled = jnp.where(mm > 0.0, h23, NEG)
    mx = jnp.max(filled, axis=1, keepdims=True)
    eq = jnp.where((filled >= mx) & (mm > 0.0), 1.0, 0.0)
    cnt = jnp.maximum(jnp.sum(eq, axis=1, keepdims=True), 1.0)
    dh2 = (do_ref[gi].astype(jnp.float32)[:, None, :] * eq / cnt).reshape(
        s_t * k, -1
    )
    r2 = jnp.where(y2 > 0.0, 1.0, 0.0)
    return e, h1v, z, dh2 * r2


def _k_bwd_statse(e_ref, mm_ref, aux1_ref, w2_ref, aux2_ref, do_ref,
                  acc_ref, *, cdt, g_t, k):
    h2 = w2_ref.shape[1]

    def body(gi, carry):
        sA, sB = carry
        _, _, z, dy2 = _dy2_from_e(gi, e_ref, mm_ref, aux1_ref, w2_ref,
                                   aux2_ref, do_ref, cdt, k)
        yhat2 = (z - aux2_ref[2][None, :]) * aux2_ref[3][None, :]
        return (sA + jnp.sum(dy2, axis=0),
                sB + jnp.sum(dy2 * yhat2, axis=0))

    zero = jnp.zeros((h2,), jnp.float32)
    sA, sB = jax.lax.fori_loop(0, g_t, body, (zero, zero))
    _acc_rows(acc_ref, [sA, sB])


def _dy1_from_e(gi, e_ref, mm_ref, mf_ref, aux1_ref, w2_ref, aux2_ref,
                do_ref, cdt, k):
    """(e, h1, dz, dy1, yhat1) for cloud gi of a cached-e backward tile."""
    e, h1v, z, dy2 = _dy2_from_e(gi, e_ref, mm_ref, aux1_ref, w2_ref,
                                 aux2_ref, do_ref, cdt, k)
    dz = _dz_cloud(z, dy2, _mask_wide(mf_ref[gi], z.shape[1]), aux2_ref)
    dh1 = jax.lax.dot_general(
        dz.astype(cdt), w2_ref[:].astype(cdt), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    a1 = aux1_ref[0]
    c1 = aux1_ref[1]
    r1 = jnp.where(e * a1[None, :] + c1[None, :] > 0.0, 1.0, 0.0)
    dy1 = dh1 * r1
    yhat1 = (e - aux1_ref[2][None, :]) * aux1_ref[3][None, :]
    return e, h1v, dz, dy1, yhat1


def _k_bwd_mide(e_ref, mm_ref, mf_ref, aux1_ref, w2_ref, aux2_ref, do_ref,
                acc1_ref, dw2_ref, db2_ref, *, cdt, g_t, k):
    h1 = aux1_ref.shape[1]
    h2 = w2_ref.shape[1]

    def body(gi, carry):
        sA, sB, dw2, db2 = carry
        _, h1v, dz, dy1, yhat1 = _dy1_from_e(
            gi, e_ref, mm_ref, mf_ref, aux1_ref, w2_ref, aux2_ref, do_ref,
            cdt, k)
        dw2_part = jax.lax.dot_general(
            h1v.astype(cdt), dz.astype(cdt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return (sA + jnp.sum(dy1, axis=0),
                sB + jnp.sum(dy1 * yhat1, axis=0),
                dw2 + dw2_part,
                db2 + jnp.sum(dz, axis=0))

    sA, sB, dw2_part, db2_row = jax.lax.fori_loop(
        0, g_t, body,
        (jnp.zeros((h1,), jnp.float32), jnp.zeros((h1,), jnp.float32),
         jnp.zeros((h1, h2), jnp.float32), jnp.zeros((h2,), jnp.float32)))
    _acc_rows(acc1_ref, [sA, sB])
    db2_part = jnp.stack(
        [db2_row]
        + [jnp.zeros((h2,), jnp.float32)] * (db2_ref.shape[0] - 1)
    )

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _init():
        dw2_ref[:, :] = dw2_part
        db2_ref[:, :] = db2_part

    @pl.when((pl.program_id(0) > 0) | (pl.program_id(1) > 0))
    def _acc():
        dw2_ref[:, :] = dw2_ref[:, :] + dw2_part
        db2_ref[:, :] = db2_ref[:, :] + db2_part


def _k_bwd_ine(e_ref, idx_ref, mm_ref, mf_ref, aux1_ref, w2_ref, aux2_ref,
               do_ref, du_ref, dsv_ref, *, cdt, g_t, k):
    p = du_ref.shape[1]
    lanes = _lanes(idx_ref, p)
    first_j = pl.program_id(1) == 0

    def body(gi, _):
        e, _, _, dy1, yhat1 = _dy1_from_e(
            gi, e_ref, mm_ref, mf_ref, aux1_ref, w2_ref, aux2_ref, do_ref,
            cdt, k)
        a1 = aux1_ref[0]
        corr = aux1_ref[4][None, :] + yhat1 * aux1_ref[5][None, :]
        mf1 = _mask_wide(mf_ref[gi], e.shape[1])
        de = a1[None, :] * (dy1 - mf1 * corr)       # [T, H1]

        s_t = idx_ref.shape[1]
        oh = (lanes == idx_ref[gi][:, :, None]).astype(cdt).reshape(
            s_t * k, p)
        du_part = jax.lax.dot_general(
            oh, de.astype(cdt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(du_ref.dtype)

        prev = jnp.where(first_j, jnp.zeros_like(du_part), du_ref[gi])
        du_ref[gi] = prev + du_part
        dsv_ref[gi] = (-jnp.sum(de.reshape(s_t, k, -1), axis=1)).astype(
            dsv_ref.dtype
        )
        return 0

    jax.lax.fori_loop(0, g_t, body, 0)


def _s_tile(s: int, k: int) -> int:
    """S-tile size: keep the [s_t*K, P] one-hot and the f32 edge tensors
    within the VMEM budget; S must be divisible (S and K are powers of two
    at every reference level)."""
    s_t = max(1, min(s, 2048 // max(k, 1)))
    while s % s_t:
        s_t -= 1
    return s_t


def _g_tile(n: int) -> int:
    """Clouds per grid program (fori_loop in-kernel): amortizes program
    launch overhead over the thousands-of-clouds grids, mirroring the
    inference kernels' tile_g=8 (ops/pallas_pointconv.py)."""
    return max(1, min(8, n))


def _pad_n(arrs, n: int, n_pad: int):
    if n_pad == n:
        return arrs
    return [jnp.pad(a, [(0, n_pad - n)] + [(0, 0)] * (a.ndim - 1))
            for a in arrs]


def _specs(p, k, h1, h2, s_t, g_t):
    """Common BlockSpecs: u, sv, idx, masks..., aux1, w2, aux2 [, dout]."""
    im_cloud = lambda i, j: (i, 0, 0)
    im_tile = lambda i, j: (i, j, 0)
    im_w = lambda i, j: (0, 0)
    return {
        "u": pl.BlockSpec((g_t, p, h1), im_cloud, memory_space=pltpu.VMEM),
        "sv": pl.BlockSpec((g_t, s_t, h1), im_tile, memory_space=pltpu.VMEM),
        "idx": pl.BlockSpec((g_t, s_t, k), im_tile, memory_space=pltpu.VMEM),
        "mask": pl.BlockSpec((g_t, s_t, k), im_tile, memory_space=pltpu.VMEM),
        "aux1": pl.BlockSpec((8, h1), im_w, memory_space=pltpu.VMEM),
        "w2": pl.BlockSpec((h1, h2), im_w, memory_space=pltpu.VMEM),
        "aux2": pl.BlockSpec((8, h2), im_w, memory_space=pltpu.VMEM),
        "dout": pl.BlockSpec((g_t, s_t, h2), im_tile, memory_space=pltpu.VMEM),
    }


def _psum(x, axis_name):
    return jax.lax.psum(x, axis_name) if axis_name is not None else x


@functools.partial(
    jax.jit, static_argnames=("compute_dtype", "interpret", "axis_name")
)
def _forward(u, sv, w2, b2, g1, be1, g2, be2, idx, maskm, maskf, eps,
             compute_dtype, interpret, axis_name=None):
    n, p, h1 = u.shape
    s, k = idx.shape[1:]
    h2 = w2.shape[1]
    s_t = _s_tile(s, k)
    g_t = _g_tile(n)
    n_pad = -(-n // g_t) * g_t
    cdt = jnp.dtype(compute_dtype)
    grid = (n_pad // g_t, s // s_t)
    sp = _specs(p, k, h1, h2, s_t, g_t)
    mf = maskf.astype(jnp.float32)
    mm = maskm.astype(jnp.float32)
    u, sv, idx, mm, mf = _pad_n([u, sv, idx, mm, mf], n, n_pad)
    zero1 = jnp.zeros((8, h1), jnp.float32)
    zero2 = jnp.zeros((8, h2), jnp.float32)

    acc1 = pl.pallas_call(
        functools.partial(_k_stats1, cdt=cdt, g_t=g_t),
        out_shape=jax.ShapeDtypeStruct((8, h1), jnp.float32),
        grid=grid,
        in_specs=[sp["u"], sp["sv"], sp["idx"], sp["mask"]],
        out_specs=pl.BlockSpec((8, h1), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(u, sv, idx, mf)

    # Under shard_map (axis_name set) the BN statistics are global: each
    # shard reduces its local clouds in-kernel and the tiny [8, H]
    # accumulators are psum'd over ICI — same statistics as the single-chip
    # (and GSPMD-XLA) path at any mesh size.
    acc1 = _psum(acc1, axis_name)
    n1 = jnp.maximum(acc1[2, 0], 1.0)
    m1 = acc1[0] / n1
    v1 = jnp.maximum(acc1[1] / n1 - m1 * m1, 0.0)
    inv1 = jax.lax.rsqrt(v1 + eps)
    a1 = g1 * inv1
    c1 = be1 - m1 * a1
    aux1 = zero1.at[0].set(a1).at[1].set(c1).at[2].set(m1).at[3].set(inv1)
    aux2 = zero2.at[6].set(b2)

    acc2 = pl.pallas_call(
        functools.partial(_k_stats2, cdt=cdt, g_t=g_t),
        out_shape=jax.ShapeDtypeStruct((8, h2), jnp.float32),
        grid=grid,
        in_specs=[sp["u"], sp["sv"], sp["idx"], sp["mask"], sp["aux1"],
                  sp["w2"], sp["aux2"]],
        out_specs=pl.BlockSpec((8, h2), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(u, sv, idx, mf, aux1, w2, aux2)

    acc2 = _psum(acc2, axis_name)
    m2 = acc2[0] / n1
    v2 = jnp.maximum(acc2[1] / n1 - m2 * m2, 0.0)
    inv2 = jax.lax.rsqrt(v2 + eps)
    a2 = g2 * inv2
    c2 = be2 - m2 * a2
    aux2 = aux2.at[0].set(a2).at[1].set(c2).at[2].set(m2).at[3].set(inv2)

    out = pl.pallas_call(
        functools.partial(_k_out, cdt=cdt, g_t=g_t),
        out_shape=jax.ShapeDtypeStruct((n_pad, s, h2), u.dtype),
        grid=grid,
        in_specs=[sp["u"], sp["sv"], sp["idx"], sp["mask"], sp["aux1"],
                  sp["w2"], sp["aux2"]],
        out_specs=pl.BlockSpec((g_t, s_t, h2), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(u, sv, idx, mm, aux1, w2, aux2)[:n]
    stats = (m1, v1, m2, v2, n1)
    return out, stats, (aux1, aux2)


def _tiles_e(n, s, k, h1, esize):
    """(g_t, s_t) for the cached-e kernels: cap the per-program e block at
    ~1 MB of VMEM. The bwd-in kernel's loop scratch (one-hot [T, P] +
    half a dozen [T, H1] f32 intermediates) scales with the same tile and
    measured 17 MB scoped stack at a 2 MB e budget on sa1 shapes — 1 MB
    keeps every level under the 16 MB limit."""
    g_t = _g_tile(n)
    s_t = _s_tile(s, k)
    budget = 1024 * 1024
    # Mosaic requires the sublane (second-minor) block dim divisible by 8
    # unless it equals the full array dim, and the sv/dout blocks are
    # (g_t, s_t, H) — so once s_t leaves s, every shrunk value must itself
    # be a multiple of 8 (s=24 halving to 12 would be rejected at compile
    # time). Shed grid width via s_t down to that floor, then via g_t.
    while (g_t * s_t * k * h1 * esize > budget
           and s_t % 2 == 0 and (s_t // 2) % 8 == 0):
        s_t //= 2
    while g_t * s_t * k * h1 * esize > budget and g_t > 1:
        g_t //= 2
    return g_t, s_t


def _especs(k, h1, h2, s_t, g_t, edt):
    im_tile = lambda i, j: (i, j, 0)
    im_w = lambda i, j: (0, 0)
    return {
        "e": pl.BlockSpec((g_t, s_t * k, h1), im_tile,
                          memory_space=pltpu.VMEM),
        "idx": pl.BlockSpec((g_t, s_t, k), im_tile, memory_space=pltpu.VMEM),
        "mask": pl.BlockSpec((g_t, s_t, k), im_tile, memory_space=pltpu.VMEM),
        "aux1": pl.BlockSpec((8, h1), im_w, memory_space=pltpu.VMEM),
        "w2": pl.BlockSpec((h1, h2), im_w, memory_space=pltpu.VMEM),
        "aux2": pl.BlockSpec((8, h2), im_w, memory_space=pltpu.VMEM),
        "dout": pl.BlockSpec((g_t, s_t, h2), im_tile, memory_space=pltpu.VMEM),
    }


@functools.partial(
    jax.jit,
    static_argnames=("compute_dtype", "interpret", "axis_name", "cache_dtype"),
)
def _forward_e(u, sv, w2, b2, g1, be1, g2, be2, idx, maskm, maskf, eps,
               compute_dtype, interpret, axis_name, cache_dtype):
    """Cached-e forward: the [N, S*K, H1] edge tensor is written ONCE (in
    `cache_dtype`) by the stats1 kernel and re-read by every later pass —
    trading the recompute variant's per-pass one-hot gather matmuls for
    cheap HBM streams of a (usually bf16) tensor. cache_dtype f32 is
    bit-identical to the recompute path (stats are taken of the rounded e,
    so the level is self-consistent at any cache dtype)."""
    n, p, h1 = u.shape
    s, k = idx.shape[1:]
    h2 = w2.shape[1]
    edt = jnp.dtype(cache_dtype)
    g_t, s_t = _tiles_e(n, s, k, h1, edt.itemsize)
    n_pad = -(-n // g_t) * g_t
    cdt = jnp.dtype(compute_dtype)
    grid = (n_pad // g_t, s // s_t)
    sp = _specs(p, k, h1, h2, s_t, g_t)
    se = _especs(k, h1, h2, s_t, g_t, edt)
    mf = maskf.astype(jnp.float32)
    mm = maskm.astype(jnp.float32)
    u, sv, idx, mm, mf = _pad_n([u, sv, idx, mm, mf], n, n_pad)
    zero1 = jnp.zeros((8, h1), jnp.float32)
    zero2 = jnp.zeros((8, h2), jnp.float32)

    e, acc1 = pl.pallas_call(
        functools.partial(_k_stats1e, cdt=cdt, g_t=g_t),
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, s * k, h1), edt),
            jax.ShapeDtypeStruct((8, h1), jnp.float32),
        ],
        grid=grid,
        in_specs=[sp["u"], sp["sv"], sp["idx"], sp["mask"]],
        out_specs=[
            se["e"],
            pl.BlockSpec((8, h1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        interpret=interpret,
    )(u, sv, idx, mf)

    acc1 = _psum(acc1, axis_name)
    n1 = jnp.maximum(acc1[2, 0], 1.0)
    m1 = acc1[0] / n1
    v1 = jnp.maximum(acc1[1] / n1 - m1 * m1, 0.0)
    inv1 = jax.lax.rsqrt(v1 + eps)
    a1 = g1 * inv1
    c1 = be1 - m1 * a1
    aux1 = zero1.at[0].set(a1).at[1].set(c1).at[2].set(m1).at[3].set(inv1)
    aux2 = zero2.at[6].set(b2)

    acc2 = pl.pallas_call(
        functools.partial(_k_stats2e, cdt=cdt, g_t=g_t),
        out_shape=jax.ShapeDtypeStruct((8, h2), jnp.float32),
        grid=grid,
        in_specs=[se["e"], sp["mask"], sp["aux1"], sp["w2"], sp["aux2"]],
        out_specs=pl.BlockSpec((8, h2), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(e, mf, aux1, w2, aux2)

    acc2 = _psum(acc2, axis_name)
    m2 = acc2[0] / n1
    v2 = jnp.maximum(acc2[1] / n1 - m2 * m2, 0.0)
    inv2 = jax.lax.rsqrt(v2 + eps)
    a2 = g2 * inv2
    c2 = be2 - m2 * a2
    aux2 = aux2.at[0].set(a2).at[1].set(c2).at[2].set(m2).at[3].set(inv2)

    out = pl.pallas_call(
        functools.partial(_k_oute, cdt=cdt, g_t=g_t, k=k),
        out_shape=jax.ShapeDtypeStruct((n_pad, s, h2), u.dtype),
        grid=grid,
        in_specs=[se["e"], sp["mask"], sp["aux1"], sp["w2"], sp["aux2"]],
        out_specs=pl.BlockSpec((g_t, s_t, h2), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(e, mm, aux1, w2, aux2)[:n]
    stats = (m1, v1, m2, v2, n1)
    return out, stats, (aux1, aux2), e[:n]


@functools.partial(
    jax.jit,
    static_argnames=("compute_dtype", "interpret", "axis_name"),
)
def _backward_e(e, u, sv, w2, idx, maskm, maskf, aux1, aux2, n1, dout,
                compute_dtype, interpret, axis_name=None):
    """Cached-e backward: three kernels re-reading the stored e. `u`/`sv`
    are residual-carried only for their shapes/dtypes (du/dsv avals); the
    one-hot gather transpose in the final kernel rebuilds oh from idx."""
    n, p, h1 = u.shape
    s, k = idx.shape[1:]
    h2 = w2.shape[1]
    edt = e.dtype
    g_t, s_t = _tiles_e(n, s, k, h1, jnp.dtype(edt).itemsize)
    n_pad = -(-n // g_t) * g_t
    cdt = jnp.dtype(compute_dtype)
    grid = (n_pad // g_t, s // s_t)
    sp = _specs(p, k, h1, h2, s_t, g_t)
    se = _especs(k, h1, h2, s_t, g_t, edt)
    mf = maskf.astype(jnp.float32)
    mm = maskm.astype(jnp.float32)
    e, idx, mm, mf, dout = _pad_n([e, idx, mm, mf, dout], n, n_pad)

    accA2 = pl.pallas_call(
        functools.partial(_k_bwd_statse, cdt=cdt, g_t=g_t, k=k),
        out_shape=jax.ShapeDtypeStruct((8, h2), jnp.float32),
        grid=grid,
        in_specs=[se["e"], sp["mask"], sp["aux1"], sp["w2"], sp["aux2"],
                  sp["dout"]],
        out_specs=pl.BlockSpec((8, h2), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(e, mm, aux1, w2, aux2, dout)

    dbe2 = accA2[0]
    dg2 = accA2[1]
    accA2 = _psum(accA2, axis_name)
    aux2b = aux2.at[4].set(accA2[0] / n1).at[5].set(accA2[1] / n1)

    accA1, dw2, db2row = pl.pallas_call(
        functools.partial(_k_bwd_mide, cdt=cdt, g_t=g_t, k=k),
        out_shape=[
            jax.ShapeDtypeStruct((8, h1), jnp.float32),
            jax.ShapeDtypeStruct((h1, h2), jnp.float32),
            jax.ShapeDtypeStruct((8, h2), jnp.float32),
        ],
        grid=grid,
        in_specs=[se["e"], sp["mask"], sp["mask"], sp["aux1"], sp["w2"],
                  sp["aux2"], sp["dout"]],
        out_specs=[
            pl.BlockSpec((8, h1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h1, h2), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, h2), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        interpret=interpret,
    )(e, mm, mf, aux1, w2, aux2b, dout)

    dbe1 = accA1[0]
    dg1 = accA1[1]
    db2 = db2row[0]
    accA1 = _psum(accA1, axis_name)
    aux1b = aux1.at[4].set(accA1[0] / n1).at[5].set(accA1[1] / n1)

    # The input-grads kernel rebuilds the [s_t*K, P] one-hot transpose plus
    # ~10 [s_t*K, H] f32 loop temps per cloud — at sa1-like shapes (P=256,
    # s_t=64) that stack measured 16.6 MB scoped VMEM, 612 KB over the
    # limit. Shrink ITS s-tile until the one-hot stays under 1 MB; the
    # other kernels keep the wider tile (their scratch is e-sized only).
    s_t3 = s_t
    while (s_t3 * k * p * 4 > 1024 * 1024
           and s_t3 % 2 == 0 and (s_t3 // 2) % 8 == 0):
        s_t3 //= 2
    sp3 = _specs(p, k, h1, h2, s_t3, g_t)
    se3 = _especs(k, h1, h2, s_t3, g_t, edt)
    du, dsv = pl.pallas_call(
        functools.partial(_k_bwd_ine, cdt=cdt, g_t=g_t, k=k),
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, p, h1), u.dtype),
            jax.ShapeDtypeStruct((n_pad, s, h1), sv.dtype),
        ],
        grid=(n_pad // g_t, s // s_t3),
        in_specs=[se3["e"], sp3["idx"], sp3["mask"], sp3["mask"],
                  sp3["aux1"], sp3["w2"], sp3["aux2"], sp3["dout"]],
        out_specs=[
            pl.BlockSpec((g_t, p, h1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g_t, s_t3, h1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        interpret=interpret,
    )(e, idx, mm, mf, aux1b, w2, aux2b, dout)
    return du[:n], dsv[:n], dw2, db2, dg1, dbe1, dg2, dbe2


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13, 14, 15))
def sa_train_fused(u, sv, w2, b2, g1, be1, g2, be2, idx, maskm, maskf,
                   eps: float = 1e-5, compute_dtype=jnp.bfloat16,
                   interpret: bool = False, axis_name=None,
                   cache_dtype=None):
    """One SA level's TRAINING forward with batch-statistic BatchNorm.

    Args:
        u: [N, P, H1] hoisted first layer (concat(x, pos) @ W1 + b1).
        sv: [N, S, H1] center term (centers @ W1[pos rows]).
        w2, b2: second edge layer.
        g1, be1, g2, be2: BatchNorm scale/bias for both layers.
        idx: [N, S, K] int32 neighbor indices (non-differentiable).
        maskm: [N, S, K] neighbor-max validity (nbr_mask).
        maskf: [N, S, K] statistics validity (nbr_mask & obj_mask).
        eps/compute_dtype/interpret: static.
        axis_name: when called inside shard_map with N sharded over this
            axis, BN statistics (and the backward's correction sums) are
            psum'd so they span the GLOBAL batch — matching the single-chip
            semantics. Parameter gradients are returned as LOCAL partial
            sums: shard_map's transpose of the replicated param inputs
            psums them.
        cache_dtype: None (default) recomputes the edge pipeline per pass;
            a dtype (bf16/f32) instead CACHES the [N, S*K, H1] edge tensor
            in HBM once and re-reads it — fewer gather matmuls per level at
            the cost of one (usually bf16) HBM tensor. f32 cache is
            bit-identical to the recompute path.

    Returns:
        (out [N, S, H2], (mean1, var1_biased, mean2, var2_biased, count))
        — stats for the running-average update (not differentiated).
    """
    if cache_dtype is None:
        out, stats, _ = _forward(
            u, sv, w2, b2, g1, be1, g2, be2, idx, maskm, maskf, eps,
            compute_dtype, interpret, axis_name)
    else:
        out, stats, _, _ = _forward_e(
            u, sv, w2, b2, g1, be1, g2, be2, idx, maskm, maskf, eps,
            compute_dtype, interpret, axis_name, cache_dtype)
    return out, stats


def _sa_fwd(u, sv, w2, b2, g1, be1, g2, be2, idx, maskm, maskf, eps,
            compute_dtype, interpret, axis_name, cache_dtype):
    if cache_dtype is None:
        out, stats, (aux1, aux2) = _forward(
            u, sv, w2, b2, g1, be1, g2, be2, idx, maskm, maskf, eps,
            compute_dtype, interpret, axis_name,
        )
        res = (u, sv, w2, idx, maskm, maskf, aux1, aux2, stats[4], None)
    else:
        out, stats, (aux1, aux2), e = _forward_e(
            u, sv, w2, b2, g1, be1, g2, be2, idx, maskm, maskf, eps,
            compute_dtype, interpret, axis_name, cache_dtype,
        )
        res = (u, sv, w2, idx, maskm, maskf, aux1, aux2, stats[4], e)
    return (out, stats), res


@functools.partial(
    jax.jit, static_argnames=("compute_dtype", "interpret", "axis_name")
)
def _backward(u, sv, w2, idx, maskm, maskf, aux1, aux2, n1, dout,
              compute_dtype, interpret, axis_name=None):
    n, p, h1 = u.shape
    s, k = idx.shape[1:]
    h2 = w2.shape[1]
    s_t = _s_tile(s, k)
    g_t = _g_tile(n)
    n_pad = -(-n // g_t) * g_t
    cdt = jnp.dtype(compute_dtype)
    grid = (n_pad // g_t, s // s_t)
    sp = _specs(p, k, h1, h2, s_t, g_t)
    mf = maskf.astype(jnp.float32)
    mm = maskm.astype(jnp.float32)
    u, sv, idx, mm, mf, dout = _pad_n([u, sv, idx, mm, mf, dout], n, n_pad)

    accA2 = pl.pallas_call(
        functools.partial(_k_bwd_stats, cdt=cdt, g_t=g_t),
        out_shape=jax.ShapeDtypeStruct((8, h2), jnp.float32),
        grid=grid,
        in_specs=[sp["u"], sp["sv"], sp["idx"], sp["mask"], sp["mask"],
                  sp["aux1"], sp["w2"], sp["aux2"], sp["dout"]],
        out_specs=pl.BlockSpec((8, h2), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(u, sv, idx, mm, mf, aux1, w2, aux2, dout)

    # BN backward correction sums run over ALL edges (every edge is
    # normalized with the masked statistics; only masked edges RECEIVE the
    # correction, via the maskf factor in _dz_cloud) — verified against
    # jax.grad of the oracle in tests/test_pallas_sa_train.py. The same two
    # unmasked sums are dbeta/dgamma — taken LOCAL (pre-psum): shard_map's
    # transpose psums replicated-parameter cotangents on the way out, while
    # the corrections need the GLOBAL sums (n1 is the global count).
    dbe2 = accA2[0]
    dg2 = accA2[1]
    accA2 = _psum(accA2, axis_name)
    aux2b = aux2.at[4].set(accA2[0] / n1).at[5].set(accA2[1] / n1)

    accA1, dw2, db2row = pl.pallas_call(
        functools.partial(_k_bwd_mid, cdt=cdt, g_t=g_t),
        out_shape=[
            jax.ShapeDtypeStruct((8, h1), jnp.float32),
            jax.ShapeDtypeStruct((h1, h2), jnp.float32),
            jax.ShapeDtypeStruct((8, h2), jnp.float32),
        ],
        grid=grid,
        in_specs=[sp["u"], sp["sv"], sp["idx"], sp["mask"], sp["mask"],
                  sp["aux1"], sp["w2"], sp["aux2"], sp["dout"]],
        out_specs=[
            pl.BlockSpec((8, h1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h1, h2), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, h2), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        interpret=interpret,
    )(u, sv, idx, mm, mf, aux1, w2, aux2b, dout)

    dbe1 = accA1[0]
    dg1 = accA1[1]
    db2 = db2row[0]
    accA1 = _psum(accA1, axis_name)
    aux1b = aux1.at[4].set(accA1[0] / n1).at[5].set(accA1[1] / n1)

    du, dsv = pl.pallas_call(
        functools.partial(_k_bwd_in, cdt=cdt, g_t=g_t),
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, p, h1), u.dtype),
            jax.ShapeDtypeStruct((n_pad, s, h1), sv.dtype),
        ],
        grid=grid,
        in_specs=[sp["u"], sp["sv"], sp["idx"], sp["mask"], sp["mask"],
                  sp["aux1"], sp["w2"], sp["aux2"], sp["dout"]],
        out_specs=[
            pl.BlockSpec((g_t, p, h1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g_t, s_t, h1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        interpret=interpret,
    )(u, sv, idx, mm, mf, aux1b, w2, aux2b, dout)
    return du[:n], dsv[:n], dw2, db2, dg1, dbe1, dg2, dbe2


def _sa_bwd(eps, compute_dtype, interpret, axis_name, cache_dtype, res, cts):
    u, sv, w2, idx, maskm, maskf, aux1, aux2, n1, e = res
    dout, _ = cts                                   # stats are buffers
    if cache_dtype is None:
        du, dsv, dw2, db2, dg1, dbe1, dg2, dbe2 = _backward(
            u, sv, w2, idx, maskm, maskf, aux1, aux2, n1, dout,
            compute_dtype, interpret, axis_name,
        )
    else:
        du, dsv, dw2, db2, dg1, dbe1, dg2, dbe2 = _backward_e(
            e, u, sv, w2, idx, maskm, maskf, aux1, aux2, n1, dout,
            compute_dtype, interpret, axis_name,
        )
    zero_i = np.zeros(idx.shape, dtype=jax.dtypes.float0)
    return (du, dsv, dw2, db2, dg1, dbe1, dg2, dbe2,
            zero_i,
            np.zeros(maskm.shape, dtype=jax.dtypes.float0)
            if maskm.dtype == jnp.bool_ else jnp.zeros_like(maskm),
            np.zeros(maskf.shape, dtype=jax.dtypes.float0)
            if maskf.dtype == jnp.bool_ else jnp.zeros_like(maskf))


sa_train_fused.defvjp(_sa_fwd, _sa_bwd)
