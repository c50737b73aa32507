"""Pallas kernels vs their XLA oracles (interpret mode on CPU).

The fused kernels must be bit-equal to the portable XLA implementations —
both use first-max argmax tie-breaking — so the torch-parity golden values
hold for either backend path.
"""

import jax.numpy as jnp
import numpy as np

from text2loc_tpu.ops.fps import _farthest_point_sampling_xla
from text2loc_tpu.ops.pallas_fps import farthest_point_sampling_pallas


def test_pallas_fps_bit_equal_to_xla():
    rng = np.random.default_rng(7)
    pts = rng.random((32, 64, 3)).astype(np.float32)
    want = np.asarray(_farthest_point_sampling_xla(jnp.asarray(pts), 16))
    got = np.asarray(
        farthest_point_sampling_pallas(jnp.asarray(pts), 16, tile_n=8, interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_pallas_fps_multi_tile_grid():
    rng = np.random.default_rng(8)
    pts = rng.random((24, 32, 3)).astype(np.float32)
    want = np.asarray(_farthest_point_sampling_xla(jnp.asarray(pts), 8))
    got = np.asarray(
        farthest_point_sampling_pallas(jnp.asarray(pts), 8, tile_n=8, interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_pallas_fps_extremes():
    pts = np.zeros((8, 16, 3), np.float32)
    pts[:, 10:] += 5.0
    idx = np.asarray(
        farthest_point_sampling_pallas(jnp.asarray(pts), 2, tile_n=8, interpret=True)
    )
    assert (idx[:, 0] == 0).all()
    assert (idx[:, 1] >= 10).all()
