"""Masked reductions for fixed-shape padded arrays.

The reference operates on ragged Python lists and uses scatter-max over PyG
batch vectors (e.g. gnn.global_max_pool, /root/reference/models/pointcloud/
pointnet2.py:48) and unmasked `tensor.max(dim=...)` pooling over zero-padded
slots (cell_retrieval.py:107, language_encoder.py:135). On TPU everything is a
dense array plus a mask; these helpers are the building blocks.
"""

from __future__ import annotations

import jax.numpy as jnp

NEG_INF = -1e30


def _expand_mask(mask, x, axis):
    """Broadcast `mask` (shape = x.shape up to `axis`) against `x`."""
    mask = jnp.asarray(mask, dtype=bool)
    while mask.ndim < x.ndim:
        mask = mask[..., None]
    return mask


def masked_max(x, mask, axis, keepdims=False, fallback=0.0):
    """Max over `axis`, ignoring entries where mask is False.

    Positions with no valid entry at all return `fallback` (matching PyG
    scatter-max's zero fill for empty segments).
    """
    m = _expand_mask(mask, x, axis)
    filled = jnp.where(m, x, NEG_INF)
    out = jnp.max(filled, axis=axis, keepdims=keepdims)
    any_valid = jnp.any(m, axis=axis, keepdims=keepdims)
    return jnp.where(any_valid, out, fallback)


def masked_mean(x, mask, axis, keepdims=False, eps=1e-9):
    """Mean over `axis` counting only valid entries."""
    m = _expand_mask(mask, x, axis)
    total = jnp.sum(jnp.where(m, x, 0.0), axis=axis, keepdims=keepdims)
    count = jnp.sum(m.astype(x.dtype), axis=axis, keepdims=keepdims)
    return total / jnp.maximum(count, eps)


def masked_softmax(logits, mask, axis=-1):
    """Softmax over `axis` with invalid entries excluded.

    If a row has no valid entries the result is all zeros (not NaN).
    """
    m = _expand_mask(mask, logits, axis)
    filled = jnp.where(m, logits, NEG_INF)
    filled = filled - jnp.max(filled, axis=axis, keepdims=True)
    exp = jnp.where(m, jnp.exp(filled), 0.0)
    denom = jnp.sum(exp, axis=axis, keepdims=True)
    return exp / jnp.maximum(denom, 1e-30)


def l2_normalize(x, axis=-1, eps=1e-12):
    """L2-normalize along `axis` (torch F.normalize semantics: eps-clamped)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)
