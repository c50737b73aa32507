"""PointNet++ object backbone, fixed-shape and batched for TPU.

TPU-native rebuild of the reference's PyG PointNet++
(/root/reference/models/pointcloud/pointnet2.py:18-104): three set-abstraction
(SA) levels (FPS ratio 0.5 -> static 256/128/64/32 point ladder; ball-query
radii 0.2/0.3/0.4; PointConv MLPs 6->32->64, 67->128->128, 131->256->256), a
global abstraction (259->512->1024) and two ReLU linear heads to 512/256 plus
class/color classifiers.

Where the reference loops torch-cluster CUDA kernels over one ragged PyG batch
per cell (object_encoder.py:92-95), this module takes ALL objects of a batch as
one dense [N, P, 6] array: FPS is a batched lax loop (Pallas fast path on TPU),
ball-query is one batched MXU matmul + top-k, and PointConv is a masked
edge-MLP + masked max — everything static-shape so XLA tiles it onto the MXU.

PointConv parity notes: PyG PointNetConv computes message
local_nn(concat(x_j, pos_j - pos_i)) with max aggregation; `get_mlp` local nets
carry trailing BatchNorm+ReLU. BatchNorm statistics here are computed over
valid edges of *real* (non-padding) objects only.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax.numpy as jnp

from text2loc_tpu.config import PointNetConfig
from text2loc_tpu.models.mlp import get_mlp
from text2loc_tpu.ops.ballquery import ball_query_knn, gather_neighbors
from text2loc_tpu.ops.fps import fps_gather
from text2loc_tpu.ops.masked import masked_max


class PointNetFeatures(NamedTuple):
    """Mirrors the reference's EasyDict return (pointnet2.py:94-100)."""

    features0: jnp.ndarray  # [N, 1024]
    features1: jnp.ndarray  # [N, 512]
    features2: jnp.ndarray  # [N, 256]
    class_pred: jnp.ndarray
    color_pred: jnp.ndarray


class SetAbstraction(nn.Module):
    """One SA level: FPS downsample + ball-query + PointConv (max aggr)."""

    num_samples: int
    radius: float
    mlp_channels: tuple
    max_neighbors: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos, obj_mask=None, train: bool = False):
        """x: [N, P, C]; pos: [N, P, 3]; obj_mask: [N] real-object flags."""
        centers, _, _ = fps_gather(pos, None, self.num_samples)
        nbr_idx, nbr_mask = ball_query_knn(pos, centers, self.radius, self.max_neighbors)
        # One fused gather for features + coordinates: the one-hot selection
        # matmul is built once per level instead of twice.
        both = jnp.concatenate([x, pos.astype(x.dtype)], axis=-1)
        nbr = gather_neighbors(both, nbr_idx)           # [N, S, K, C+3]
        nbr_x, nbr_pos = nbr[..., : x.shape[-1]], nbr[..., x.shape[-1] :]
        rel = nbr_pos - centers[:, :, None, :].astype(x.dtype)
        edge_feat = jnp.concatenate([nbr_x, rel], axis=-1)

        bn_mask = nbr_mask
        if obj_mask is not None:
            bn_mask = nbr_mask & jnp.asarray(obj_mask, bool)[:, None, None]
        h = get_mlp(self.mlp_channels, dtype=self.dtype)(
            edge_feat, mask=bn_mask, train=train
        )
        out = masked_max(h, nbr_mask, axis=2)           # [N, S, C_out]
        return out, centers


class GlobalAbstraction(nn.Module):
    """concat(x, pos) -> MLP -> max over points (pointnet2.py:40-49)."""

    mlp_channels: tuple
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos, obj_mask=None, train: bool = False):
        feat = jnp.concatenate([x, pos.astype(x.dtype)], axis=-1)
        bn_mask = None
        if obj_mask is not None:
            bn_mask = jnp.broadcast_to(
                jnp.asarray(obj_mask, bool)[:, None], feat.shape[:2]
            )
        h = get_mlp(self.mlp_channels, dtype=self.dtype)(feat, mask=bn_mask, train=train)
        return jnp.max(h, axis=1)                       # [N, C_out]


class PointNet2(nn.Module):
    """Batched PointNet++ over [N, P, 3] xyz + [N, P, 3] rgb object clouds."""

    cfg: PointNetConfig
    num_classes: int
    num_colors: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz, rgb, obj_mask=None, train: bool = False) -> PointNetFeatures:
        c = self.cfg
        x, pos = rgb.astype(self.dtype), xyz
        for i in range(len(c.sa_num_points)):
            x, pos = SetAbstraction(
                num_samples=c.sa_num_points[i],
                radius=c.sa_radii[i],
                mlp_channels=c.sa_mlps[i],
                max_neighbors=c.sa_max_neighbors,
                dtype=self.dtype,
                name=f"sa{i + 1}",
            )(x, pos, obj_mask=obj_mask, train=train)

        features0 = GlobalAbstraction(
            mlp_channels=c.global_mlp, dtype=self.dtype, name="ga"
        )(x, pos, obj_mask=obj_mask, train=train)

        features1 = nn.relu(nn.Dense(c.head_dims[0], dtype=self.dtype, name="lin1")(features0))
        features2 = nn.relu(nn.Dense(c.head_dims[1], dtype=self.dtype, name="lin2")(features1))
        class_pred = nn.Dense(self.num_classes, dtype=self.dtype, name="class_classifier")(features2)
        color_pred = nn.Dense(self.num_colors, dtype=self.dtype, name="color_classifier")(features2)
        return PointNetFeatures(features0, features1, features2, class_pred, color_pred)

    def features_at_level(self, feats: PointNetFeatures):
        return (feats.features0, feats.features1, feats.features2)[self.cfg.features_level]
