"""Object encoder: fuse per-object features into one embedding per object.

Rebuild of /root/reference/models/object_encoder.py:15-153 on dense arrays.
Per object, up to four L2-normalized feature embeddings are concatenated and
merged by `mlp_merge` (get_mlp [n_feats*D -> D], :64,148-151):

* "class"    — PointNet++ features2 -> mlp_pointnet (get_mlp [256, D]) when
               class_embed is off (the published path, :86-113); otherwise a
               fixed nn.Embed table over ground-truth class ids (:31-37).
* "color"    — mean-RGB -> get_mlp([3, 64, D]) (:40,122-128), or a fixed color
               embedding table when color_embed is on.
* "position" — object center -> get_mlp([3, 64, D]) (:39,130-136).
* "num"      — standardized point count -> get_mlp([1, 64, D]) with the
               reference's hard-coded mean/std (:41-44,138-145).

The reference's per-cell PyG loop becomes one batched PointNet2 call over all
B*O objects. The color ablation (zeroing point rgb when "color" is not used,
:86-90) is preserved.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from text2loc_tpu import constants as C
from text2loc_tpu.config import ModelConfig
from text2loc_tpu.data.batch import ObjectSet
from text2loc_tpu.models.mlp import get_mlp
from text2loc_tpu.models.pointnet2 import PointNet2
from text2loc_tpu.ops.masked import l2_normalize


class ObjectEncoder(nn.Module):
    embed_dim: int
    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, objects: ObjectSet, train: bool = False) -> jnp.ndarray:
        """Returns [B, O, embed_dim] object embeddings (not normalized)."""
        cfg = self.cfg
        b, o = objects.batch_shape
        flat_mask = objects.mask.reshape(b * o)
        use = cfg.use_features
        embeddings = []

        if "class" in use and not cfg.class_embed:
            rgb = objects.rgb
            if "color" not in use:
                rgb = jnp.zeros_like(rgb)  # ablation parity (:86-90)
            xyz = objects.xyz.reshape(b * o, *objects.xyz.shape[2:])
            rgbf = rgb.reshape(b * o, *rgb.shape[2:])
            pn = PointNet2(
                cfg.pointnet,
                num_classes=C.NUM_CLASSES,
                num_colors=C.NUM_COLORS,
                dtype=self.dtype,
                name="pointnet",
            )
            feats = pn(xyz, rgbf, obj_mask=flat_mask, train=train)
            pn_feat = pn.features_at_level(feats)      # [B*O, 256]
            if cfg.pointnet.freeze:
                pn_feat = jax.lax.stop_gradient(pn_feat)
            pn_emb = get_mlp(
                [pn_feat.shape[-1], self.embed_dim], dtype=self.dtype,
                name="mlp_pointnet",
            )(pn_feat, mask=flat_mask, train=train)
            embeddings.append(l2_normalize(pn_emb))
        elif "class" in use:
            # Fixed ground-truth class embedding, padding_idx=0 semantics:
            # index 0 is the <unk>/pad row kept at zero via masking.
            tbl = nn.Embed(C.NUM_CLASSES + 1, self.embed_dim, dtype=self.dtype, name="class_embedding")
            idx = objects.class_idx.reshape(b * o) + 1
            idx = jnp.where(flat_mask, idx, 0)
            emb = tbl(idx)
            emb = jnp.where((idx > 0)[:, None], emb, 0.0)
            embeddings.append(l2_normalize(emb))

        if "color" in use:
            if cfg.color_embed:
                tbl = nn.Embed(C.NUM_COLORS + 1, self.embed_dim, dtype=self.dtype, name="color_embedding")
                idx = objects.color_idx.reshape(b * o) + 1
                idx = jnp.where(flat_mask, idx, 0)
                emb = tbl(idx)
                emb = jnp.where((idx > 0)[:, None], emb, 0.0)
            else:
                colors = objects.color.reshape(b * o, 3).astype(self.dtype)
                emb = get_mlp(
                    [3, 64, self.embed_dim], dtype=self.dtype, name="color_encoder"
                )(colors, mask=flat_mask, train=train)
            embeddings.append(l2_normalize(emb))

        if "position" in use:
            centers = objects.center.reshape(b * o, 3).astype(self.dtype)
            emb = get_mlp(
                [3, 64, self.embed_dim], dtype=self.dtype, name="pos_encoder"
            )(centers, mask=flat_mask, train=train)
            embeddings.append(l2_normalize(emb))

        if "num" in use:
            num = objects.num_points.reshape(b * o, 1).astype(self.dtype)
            num = (num - C.NUM_POINTS_MEAN) / C.NUM_POINTS_STD
            emb = get_mlp(
                [1, 64, self.embed_dim], dtype=self.dtype, name="num_encoder"
            )(num, mask=flat_mask, train=train)
            embeddings.append(l2_normalize(emb))

        if len(embeddings) > 1:
            merged = get_mlp(
                [len(embeddings) * self.embed_dim, self.embed_dim],
                dtype=self.dtype, name="mlp_merge",
            )(jnp.concatenate(embeddings, axis=-1), mask=flat_mask, train=train)
        else:
            merged = embeddings[0]

        return merged.reshape(b, o, self.embed_dim)
