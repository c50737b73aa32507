"""On-device augmentations.

The reference augments on the host inside Dataset.__getitem__: PyG
T.FixedPoints / T.RandomRotate / T.NormalizeScale per object
(/root/reference/training/coarse.py:183-193), random horizontal/vertical cell
flips with direction-word swaps (dataloading/kitti360pose/utils.py:15-88) and
hint shuffling (cells.py:79-80). Here every augmentation is a jittable array
transform that runs inside the compiled train step — the host pipeline only
gathers integers and floats.

Direction words are integer indices, so the flip's east<->west / north<->south
text rewrite becomes a table lookup (constants.DIRECTION_H_FLIP / _V_FLIP).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from text2loc_tpu import constants as C


def resample_points(xyz, rgb, key, num_points: int):
    """Random point resampling with replacement (FixedPoints semantics).

    xyz/rgb: [..., P, 3] -> [..., num_points, 3]. Implemented as a one-hot
    selection matmul: TPU take_along_axis on a non-minor axis lowers to a
    degenerate gather (see ops.ballquery.onehot_gather).
    """
    from text2loc_tpu.ops.ballquery import onehot_gather

    p = xyz.shape[-2]
    lead = xyz.shape[:-2]
    idx = jax.random.randint(key, lead + (num_points,), 0, p)
    n = int(np.prod(lead)) if lead else 1
    both = jnp.concatenate([xyz, rgb], axis=-1).reshape(n, p, 6)
    out = onehot_gather(both, idx.reshape(n, num_points))
    out = out.reshape(lead + (num_points, 6))
    return out[..., :3], out[..., 3:]


def random_rotate_z(xyz, key, max_degrees: float = 120.0):
    """Per-object random rotation about the z axis (PyG RandomRotate(., axis=2))."""
    lead = xyz.shape[:-2]
    ang = jax.random.uniform(
        key, lead, minval=-max_degrees, maxval=max_degrees
    ) * (jnp.pi / 180.0)
    cos, sin = jnp.cos(ang)[..., None], jnp.sin(ang)[..., None]
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    return jnp.stack([cos * x - sin * y, sin * x + cos * y, z], axis=-1)


def normalize_scale(xyz):
    """PyG NormalizeScale: center to the mean, scale max |coord| to ~1."""
    centered = xyz - jnp.mean(xyz, axis=-2, keepdims=True)
    scale = (1.0 / jnp.maximum(jnp.max(jnp.abs(centered), axis=(-2, -1), keepdims=True), 1e-12)) * 0.999999
    return centered * scale


def point_cloud_transform(xyz, rgb, key, num_points: int, augment: bool):
    """The composed per-object transform of the reference train/val pipelines:

    train: FixedPoints -> RandomRotate(120, z) -> NormalizeScale
    eval:  FixedPoints -> NormalizeScale        (coarse.py:183-193)

    Eval-mode point selection is DETERMINISTIC here (all stored points when
    counts match — the standard ingest config — else an even stride): the
    reference's eval FixedPoints draws randomly with replacement, so no
    canonical subset exists, and a deterministic choice makes evaluation
    reproducible and independent of batch composition (which also lets the
    fine stage cache per-cell encodings, evaluation/pipeline.run_fine).
    """
    if augment:
        k1, k2 = jax.random.split(key)
        xyz, rgb = resample_points(xyz, rgb, k1, num_points)
        xyz = random_rotate_z(xyz, k2)
    else:
        p = xyz.shape[-2]
        if p != num_points:
            idx = (np.arange(num_points) * p // max(num_points, 1)).astype(np.int32)
            xyz = jnp.take(xyz, idx, axis=-2)
            rgb = jnp.take(rgb, idx, axis=-2)
    return normalize_scale(xyz), rgb


def flip_coarse(batch: Dict[str, jnp.ndarray], key) -> Dict[str, jnp.ndarray]:
    """Random horizontal/vertical flip of cell + pose + hint directions.

    Mirrors flip_pose_in_cell (dataloading/kitti360pose/utils.py:15-88):
    coordinates x -> 1-x (and/or y -> 1-y) in normalized cell space; direction
    vocabulary remapped east<->west (horizontal) and north<->south (vertical).
    Each of the two flips fires independently with p=0.5 per sample.
    """
    kh, kv = jax.random.split(key)
    b = batch["mask"].shape[0]
    do_h = jax.random.bernoulli(kh, 0.5, (b,))
    do_v = jax.random.bernoulli(kv, 0.5, (b,))

    def flip_axis(coords, do, axis):
        flipped = coords.at[..., axis].set(1.0 - coords[..., axis])
        cond = do.reshape((b,) + (1,) * (coords.ndim - 1))
        return jnp.where(cond, flipped, coords)

    out = dict(batch)
    for name in ("xyz", "center"):
        out[name] = flip_axis(flip_axis(batch[name], do_h, 0), do_v, 1)
    # 2-D pose fields: the coarse gt pose and the fine regression target
    # (reference fine path flips the offset target the same way,
    # dataloading/kitti360pose/poses.py via flip_pose_in_cell).
    for name in ("pose_in_cell", "target"):
        if name in batch:
            out[name] = flip_axis(flip_axis(batch[name], do_h, 0), do_v, 1)

    h_map = jnp.asarray(C.DIRECTION_H_FLIP)
    v_map = jnp.asarray(C.DIRECTION_V_FLIP)
    d = batch["hint_dir"]
    d = jnp.where(do_h[:, None], h_map[d], d)
    d = jnp.where(do_v[:, None], v_map[d], d)
    out["hint_dir"] = d
    return out


def shuffle_hints(batch: Dict[str, jnp.ndarray], key) -> Dict[str, jnp.ndarray]:
    """Per-sample random permutation of the hint axis (cells.py:79-80)."""
    b, s = batch["hint_dir"].shape
    noise = jax.random.uniform(key, (b, s))
    perm = jnp.argsort(noise, axis=1)
    out = dict(batch)
    for name in ("hint_dir", "hint_color", "hint_label", "sentence_mask"):
        if name in batch:
            out[name] = jnp.take_along_axis(batch[name], perm, axis=1)
    return out
