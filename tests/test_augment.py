"""On-device augmentations: flip semantics, hint shuffles, point transforms
(reference dataloading/kitti360pose/utils.py:15-88, cells.py:79-89,
training/coarse.py:183-193)."""

import jax
import jax.numpy as jnp
import numpy as np

from text2loc_tpu import constants as C
from text2loc_tpu.data import augment


def _batch(b=4, o=3, p=8, s=2, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "xyz": jnp.asarray(rng.random((b, o, p, 3)), jnp.float32),
        "rgb": jnp.asarray(rng.random((b, o, p, 3)), jnp.float32),
        "center": jnp.asarray(rng.random((b, o, 3)), jnp.float32),
        "mask": jnp.ones((b, o), bool),
        "pose_in_cell": jnp.asarray(rng.random((b, 2)), jnp.float32),
        "target": jnp.asarray(rng.random((b, 2)), jnp.float32),
        "hint_dir": jnp.asarray(
            rng.integers(0, C.NUM_DIRECTIONS, (b, s)), jnp.int32
        ),
        "hint_color": jnp.asarray(rng.integers(0, C.NUM_COLORS, (b, s)), jnp.int32),
        "hint_label": jnp.asarray(rng.integers(0, 5, (b, s)), jnp.int32),
    }


def test_flip_geometry_and_directions():
    batch = _batch()
    # Find a key where sample 0 h-flips but not v-flips (or vice versa);
    # easier: flip twice with the same key restores the original.
    key = jax.random.PRNGKey(5)
    once = augment.flip_coarse(batch, key)
    twice = augment.flip_coarse(once, key)
    np.testing.assert_allclose(
        np.asarray(twice["xyz"]), np.asarray(batch["xyz"]), atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(twice["hint_dir"]), np.asarray(batch["hint_dir"])
    )
    np.testing.assert_allclose(
        np.asarray(twice["target"]), np.asarray(batch["target"]), atol=1e-6
    )

    # Geometry and direction words flip together: where x changed to 1-x,
    # east<->west must have swapped.
    flipped_x = ~np.isclose(
        np.asarray(once["xyz"])[:, 0, 0, 0], np.asarray(batch["xyz"])[:, 0, 0, 0]
    )
    e, w = C.DIRECTION_TO_INDEX["east"], C.DIRECTION_TO_INDEX["west"]
    for b in np.nonzero(flipped_x)[0]:
        orig = np.asarray(batch["hint_dir"])[b]
        new = np.asarray(once["hint_dir"])[b]
        for o_, n_ in zip(orig, new):
            if o_ == e:
                assert n_ == w
            if o_ == w:
                assert n_ == e


def test_shuffle_hints_is_consistent_permutation():
    batch = _batch()
    out = augment.shuffle_hints(batch, jax.random.PRNGKey(1))
    for b in range(4):
        trip_in = set(
            zip(*(np.asarray(batch[k])[b] for k in ("hint_dir", "hint_color", "hint_label")))
        )
        trip_out = set(
            zip(*(np.asarray(out[k])[b] for k in ("hint_dir", "hint_color", "hint_label")))
        )
        assert trip_in == trip_out


def test_point_transform_shapes_and_normalization():
    batch = _batch(p=16)
    xyz, rgb = augment.point_cloud_transform(
        batch["xyz"], batch["rgb"], jax.random.PRNGKey(2), num_points=8,
        augment=True,
    )
    assert xyz.shape == (4, 3, 8, 3) and rgb.shape == (4, 3, 8, 3)
    x = np.asarray(xyz)
    # NormalizeScale: centered and max |coord| <= 1.
    np.testing.assert_allclose(x.mean(axis=2), 0.0, atol=1e-5)
    assert np.abs(x).max() <= 1.0 + 1e-5

    # Rotation preserves z and per-point radius in the xy plane.
    xyz_nr, _ = augment.point_cloud_transform(
        batch["xyz"], batch["rgb"], jax.random.PRNGKey(2), num_points=8,
        augment=False,
    )
