"""Unit tests for the point-cloud kernels against tiny numpy oracles.

Oracle semantics mirror the reference's torch-cluster ops
(/root/reference/models/pointcloud/pointnet2.py:26-48): sequential FPS and
radius-limited nearest neighbors.
"""

import jax
import jax.numpy as jnp
import numpy as np

from text2loc_tpu.ops import ball_query_knn, farthest_point_sampling, masked_max
from text2loc_tpu.ops.ballquery import gather_neighbors
from text2loc_tpu.ops.masked import masked_mean, masked_softmax


def fps_oracle(points: np.ndarray, num_samples: int) -> np.ndarray:
    """Sequential FPS starting at index 0."""
    p = points.shape[0]
    selected = [0]
    min_dist = np.full(p, np.inf)
    for _ in range(1, num_samples):
        d = np.sum((points - points[selected[-1]]) ** 2, axis=-1)
        min_dist = np.minimum(min_dist, d)
        selected.append(int(np.argmax(min_dist)))
    return np.array(selected)


def test_fps_matches_oracle():
    rng = np.random.default_rng(0)
    pts = rng.random((3, 20, 3)).astype(np.float32)
    got = np.asarray(farthest_point_sampling(jnp.asarray(pts), 8))
    for i in range(3):
        np.testing.assert_array_equal(got[i], fps_oracle(pts[i], 8))


def test_fps_covers_extremes():
    # Two far clusters: FPS must pick from both immediately.
    pts = np.zeros((1, 10, 3), np.float32)
    pts[0, 5:] += 10.0
    idx = np.asarray(farthest_point_sampling(jnp.asarray(pts), 2))[0]
    assert idx[0] == 0 and idx[1] >= 5


def test_ball_query_knn():
    rng = np.random.default_rng(1)
    src = rng.random((2, 30, 3)).astype(np.float32)
    query = src[:, :5]
    radius, k = 0.3, 6
    idx, mask = map(np.asarray, ball_query_knn(jnp.asarray(src), jnp.asarray(query), radius, k))
    assert idx.shape == (2, 5, k) and mask.shape == (2, 5, k)
    for n in range(2):
        for q in range(5):
            d_all = np.linalg.norm(src[n] - query[n, q], axis=-1)
            within = np.sort(np.where(d_all <= radius)[0])
            got_valid = np.sort(idx[n, q][mask[n, q]])
            expect = within[np.argsort(d_all[within])][:k]
            assert set(got_valid) == set(np.sort(expect))
            # Self (distance 0) always included.
            assert q in idx[n, q][mask[n, q]]
            # Invalid slots clamped to valid indices.
            assert (d_all[idx[n, q]] <= radius + 1e-6).all()


def test_gather_neighbors():
    vals = jnp.arange(24, dtype=jnp.float32).reshape(1, 6, 4)
    idx = jnp.array([[[0, 5], [2, 2]]], dtype=jnp.int32)
    out = np.asarray(gather_neighbors(vals, idx))
    np.testing.assert_array_equal(out[0, 0, 0], np.arange(4))
    np.testing.assert_array_equal(out[0, 0, 1], np.arange(20, 24))
    np.testing.assert_array_equal(out[0, 1, 0], np.arange(8, 12))


def test_masked_reductions():
    x = jnp.array([[1.0, 5.0, -2.0], [3.0, 4.0, 10.0]])
    mask = jnp.array([[True, False, True], [False, False, False]])
    mx = np.asarray(masked_max(x, mask, axis=1))
    np.testing.assert_allclose(mx, [1.0, 0.0])  # empty row -> fallback 0
    mn = np.asarray(masked_mean(x, mask, axis=1))
    np.testing.assert_allclose(mn[0], -0.5)
    sm = np.asarray(masked_softmax(x, mask, axis=1))
    np.testing.assert_allclose(sm.sum(axis=1), [1.0, 0.0], atol=1e-6)
    assert sm[0, 1] == 0.0


def test_fps_ladder_prefix_property():
    """fps(fps(pts, S1), S2) == fps(pts, S1)[:S2] bit-exactly — the property
    PointNet2 relies on to run ONE FPS pass per object instead of one per SA
    level (farthest-first traversal is greedy and prefix-stable; tie-breaks
    follow stored order, which is traversal order in both)."""
    import numpy as np

    from text2loc_tpu.ops.fps import fps_gather

    rng = np.random.default_rng(11)
    pos = jnp.asarray(rng.random((8, 128, 3)) * 2 - 1, jnp.float32)
    c1, _, _ = fps_gather(pos, None, 64)
    c2, _, _ = fps_gather(c1, None, 32)
    c3, _, _ = fps_gather(c2, None, 16)
    np.testing.assert_array_equal(np.asarray(c2), np.asarray(c1[:, :32]))
    np.testing.assert_array_equal(np.asarray(c3), np.asarray(c1[:, :16]))
    # Duplicate points stress the tie-breaking half of the argument.
    pos2 = jnp.concatenate([pos[:, :64], pos[:, :64]], axis=1)
    d1, _, _ = fps_gather(pos2, None, 64)
    d2, _, _ = fps_gather(d1, None, 32)
    np.testing.assert_array_equal(np.asarray(d2), np.asarray(d1[:, :32]))


def test_ball_query_first_in_radius_order():
    """first=True keeps the FIRST <=K in-radius points in source index order
    (torch-cluster radius() insertion semantics, reference pointnet2.py:28-34)."""
    rng = np.random.default_rng(3)
    src = rng.random((2, 40, 3)).astype(np.float32)
    query = src[:, :6]
    radius, k = 0.35, 5
    idx, mask = map(
        np.asarray,
        ball_query_knn(jnp.asarray(src), jnp.asarray(query), radius, k,
                       first=True),
    )
    for n in range(2):
        for q in range(6):
            d_all = np.linalg.norm(src[n] - query[n, q], axis=-1)
            within = np.where(d_all <= radius)[0]       # already index-sorted
            expect = within[:k]
            got = idx[n, q][mask[n, q]]
            np.testing.assert_array_equal(got, expect)
            assert mask[n, q].sum() == len(expect)
            # Invalid slots clamp to a valid neighbor.
            assert np.isin(idx[n, q], within).all()
