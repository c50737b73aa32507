"""Device-batch schemas: fixed-shape padded arrays + masks.

The reference ships Python lists of `Object3d` plus per-cell PyG graph batches
into the models (/root/reference/dataloading/kitti360pose/base.py:83-87,
models/object_encoder.py:66-153). The TPU-native contract is instead a small
set of NamedTuples of dense arrays — every field has a static shape, so the
whole train/eval step jits once.

Shapes use B=batch, O=objects/cell (object_size=28 coarse, pad_size=16 fine),
P=points/object (256), S=hints/pose (6), T=tokens/hint.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


class ObjectSet(NamedTuple):
    """All objects of a batch of cells, padded to O slots per cell.

    Padding slots replicate the reference's padding objects
    (datapreparation/kitti360pose/imports.py:74-83): tiny random clouds,
    zero rgb, class "pad".
    """

    xyz: jnp.ndarray          # [B, O, P, 3] per-object point coords
    rgb: jnp.ndarray          # [B, O, P, 3] per-point colors in [0, 1]
    center: jnp.ndarray       # [B, O, 3]   object center in normalized cell coords
    color: jnp.ndarray        # [B, O, 3]   mean rgb of the full original cloud
    num_points: jnp.ndarray   # [B, O]      original (pre-sampling) point count
    class_idx: jnp.ndarray    # [B, O] int32 class vocabulary index
    color_idx: jnp.ndarray    # [B, O] int32 nearest color-centroid index
    mask: jnp.ndarray         # [B, O] bool  True = real object

    @property
    def batch_shape(self):
        return self.xyz.shape[:2]


class TextSet(NamedTuple):
    """A batch of hint sets, already embedded by the frozen text encoder.

    The reference runs frozen T5-large online per batch
    (models/language_encoder.py:116-128); here the frozen embedding is a
    precomputed lookup (see text2loc_tpu.models.text_embedding), so the batch
    carries token-level embeddings directly.
    """

    token_embeds: jnp.ndarray  # [B, S, T, E] frozen token embeddings
    token_mask: jnp.ndarray    # [B, S, T] bool
    sentence_mask: jnp.ndarray  # [B, S] bool (True = hint present)


class CoarseBatch(NamedTuple):
    """One training batch for the coarse retrieval model."""

    objects: ObjectSet         # O = object_size
    text: TextSet
    cell_index: jnp.ndarray    # [B] int32 gallery index of the positive cell


class FineBatch(NamedTuple):
    """One training batch for the fine regressor.

    `target` is the regression target; under the published config
    (regressor_cell="all") it is the absolute normalized pose in the candidate
    cell (reference dataloading/kitti360pose/poses.py:74-75).
    """

    objects: ObjectSet         # O = pad_size
    text: TextSet
    target: jnp.ndarray        # [B, 2]
    pose_in_cell: jnp.ndarray  # [B, 2] gt normalized pose (for error metrics)
