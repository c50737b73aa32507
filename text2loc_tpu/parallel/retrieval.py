"""Full-city gallery retrieval sharded over the device mesh.

The reference scores each query against the full gallery with a host-side
numpy matmul per query (/root/reference/training/coarse.py:119-125). The
single-chip TPU path is one [Q, D] @ [D, C] matmul + `lax.top_k`
(text2loc_tpu.evaluation.retrieval). This module scales that along the
reference's real scaling axis — gallery size (SURVEY.md section 5.7):

* the cell-embedding gallery [C, D] is sharded over the `dp` axis;
* each chip computes scores only against its C/n shard and takes a local
  top-k (scores + *global* gallery ids via the shard offset);
* an `all_gather` of the per-shard [Q, k] candidates (tiny: n*k per query,
  not C) rides ICI, followed by a static merge top-k.

ICI traffic is O(Q * n * k) instead of the O(Q * C) an all-gathered score
matrix would cost; HBM holds only C/n gallery vectors per chip.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from text2loc_tpu.ops.ballquery import onehot_gather
from text2loc_tpu.ops.masked import NEG_INF


def pad_gallery(cell_enc: np.ndarray, num_shards: int) -> Tuple[np.ndarray, int]:
    """Pad the gallery row count to a multiple of the mesh size.

    Padding rows are zero vectors; with L2-normalized queries their inner
    product is 0, but to be safe against empty shards the sharded kernel also
    masks padded ids explicitly.
    """
    c = cell_enc.shape[0]
    c_pad = ((c + num_shards - 1) // num_shards) * num_shards
    if c_pad == c:
        return cell_enc, c
    out = np.zeros((c_pad,) + cell_enc.shape[1:], cell_enc.dtype)
    out[:c] = cell_enc
    return out, c


def shard_local_topk(cells, texts, k: int, num_cells: int, axis_name: str):
    """Per-shard gallery scoring + local top-k (call inside shard_map).

    cells: [Cp/n, D] local shard; texts: [Q, D] replicated. Padded rows
    (global id >= num_cells) are masked to -inf so they can never surface.
    Returns (scores [Q, kl], local indices [Q, kl], global ids [Q, kl])
    with kl = min(k, local shard size).
    """
    shard = jax.lax.axis_index(axis_name)
    c_local = cells.shape[0]
    offset = shard * c_local
    scores = jnp.einsum(
        "qd,cd->qc",
        texts.astype(jnp.float32),
        cells.astype(jnp.float32),
    )
    gids = offset + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(gids < num_cells, scores, NEG_INF)
    k_local = min(k, c_local)
    s_loc, i_loc = jax.lax.top_k(scores, k_local)                # [Q, kl]
    return s_loc, i_loc, i_loc + offset


def merge_shard_topk(s_loc, payloads, k: int, n: int, axis_name: str):
    """all_gather per-shard candidates and keep the global top-k by score
    (call inside shard_map).

    s_loc: [Q, kl] per-shard candidate scores; payloads: per-candidate
    arrays [Q, kl, ...] carried along (ids, positions, ...). ICI traffic is
    O(Q * n * kl) per array. Shards concatenate in ascending global-index
    order, so `lax.top_k`'s first-occurrence tie-breaking matches the dense
    single-device path. Returns (scores [Q, k], tuple of gathered payloads).
    """
    q, kl = s_loc.shape

    def flat(a):
        g = jax.lax.all_gather(a, axis_name, axis=0)             # [n, Q, kl, ...]
        perm = (1, 0, 2) + tuple(range(3, g.ndim))
        return jnp.transpose(g, perm).reshape((q, n * kl) + a.shape[2:])

    s_top, sel = jax.lax.top_k(flat(s_loc), k)                   # [Q, k]
    outs = []
    for a in payloads:
        af = flat(a)
        if af.ndim == 2:
            outs.append(jnp.take_along_axis(af, sel, axis=1))
        else:
            # Trailing feature dims: gather along the non-minor candidate
            # axis via the one-hot MXU formulation (take_along_axis on
            # non-minor axes is pathologically slow on TPU).
            outs.append(onehot_gather(af, sel))
    return s_top, tuple(outs)


def make_sharded_topk(mesh: Mesh, k: int, num_cells: int, axis_name: str = "dp"):
    """Build a jitted sharded-top-k: (cell_enc [Cp, D], text_enc [Q, D]) ->
    (scores [Q, k], global indices [Q, k]).

    `num_cells` is the real (unpadded) gallery size; padded rows are masked to
    -inf so they can never enter the top-k.
    """
    n = mesh.devices.size

    def local_topk(cells, texts):
        s_loc, _, g_loc = shard_local_topk(cells, texts, k, num_cells,
                                           axis_name)
        s_top, (g_top,) = merge_shard_topk(s_loc, (g_loc,), k, n, axis_name)
        return s_top, g_top

    fn = shard_map(
        local_topk,
        mesh=mesh,
        in_specs=(P(axis_name), P()),
        out_specs=(P(), P()),
        # The merge top-k over all-gathered candidates is replicated by
        # construction; VMA inference can't prove it through axis_index math.
        check_vma=False,
    )
    return jax.jit(fn)


def sharded_topk_retrieval(cell_enc: np.ndarray, text_enc: np.ndarray, k: int,
                           mesh: Mesh, axis_name: str = "dp"):
    """Convenience end-to-end: pad + device_put sharded + merge top-k.

    Equivalent results to evaluation.retrieval.topk_retrieval (single-chip
    dense path) — asserted by tests/test_parallel.py on an 8-device CPU mesh.
    """
    n = mesh.devices.size
    padded, c = pad_gallery(np.asarray(cell_enc), n)
    fn = make_sharded_topk(mesh, k, c, axis_name)
    cells = jax.device_put(padded, NamedSharding(mesh, P(axis_name)))
    texts = jax.device_put(np.asarray(text_enc), NamedSharding(mesh, P()))
    return fn(cells, texts)
