"""Loss functions vs tiny numpy oracles (reference training/losses.py
formulas: ContrastiveLoss :255-283, PairwiseRankingLoss :179-217,
HardestRankingLoss :286-355, NT-Xent :358-402)."""

import numpy as np
import jax.numpy as jnp

from text2loc_tpu.training import losses


def _norm(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def _data(b=5, d=8, seed=0):
    rng = np.random.default_rng(seed)
    return (
        rng.standard_normal((b, d)).astype(np.float32),
        rng.standard_normal((b, d)).astype(np.float32),
    )


def test_contrastive_oracle():
    a, p = _data()
    tau = 0.1
    an, pn = _norm(a), _norm(p)
    sim = an @ pn.T / tau
    exp = np.exp(sim)
    col = -np.log(np.diag(exp) / exp.sum(axis=0))
    row = -np.log(np.diag(exp) / exp.sum(axis=1))
    want = float(np.mean(col + row))
    got = float(losses.contrastive_loss(jnp.asarray(a), jnp.asarray(p), tau))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_pairwise_oracle():
    a, p = _data(seed=1)
    m = 0.35
    s = _norm(a) @ _norm(p).T
    d = np.diag(s)
    b = s.shape[0]
    off = 1.0 - np.eye(b)
    cost_s = np.maximum(0.0, m - d[None, :] + s) * off
    cost_im = np.maximum(0.0, m - d[:, None] + s) * off
    want = float((cost_s.sum() + cost_im.sum()) / b)
    got = float(losses.pairwise_ranking_loss(jnp.asarray(a), jnp.asarray(p), m))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_hardest_oracle():
    a, p = _data(seed=2)
    m, scale = 0.35, 64.0
    s = _norm(a) @ _norm(p).T
    d = np.diag(s)
    b = s.shape[0]
    off = 1.0 - np.eye(b)
    cost_s = np.maximum(0.0, m - d[None, :] + s) * off
    cost_im = np.maximum(0.0, m - d[:, None] + s) * off
    want = float((cost_s.max(axis=1).mean() + cost_im.max(axis=1).mean()) * scale)
    got = float(losses.hardest_ranking_loss(jnp.asarray(a), jnp.asarray(p), m, scale))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_nt_xent_oracle():
    zi, zj = _data(b=4, seed=3)
    tau = 0.1
    z = _norm(np.concatenate([zi, zj]))
    sim = z @ z.T / tau
    np.fill_diagonal(sim, -np.inf)
    b = 4
    pos_idx = np.r_[np.arange(b) + b, np.arange(b)]
    pos = sim[np.arange(2 * b), pos_idx]
    lse = np.log(np.exp(sim).sum(axis=1))
    want = float(np.mean(lse - pos))
    got = float(losses.nt_xent(jnp.asarray(zi), jnp.asarray(zj), tau))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_triplet_and_pose_error():
    a, p = _data(seed=4)
    n = -p
    got = float(losses.triplet_margin_loss(jnp.asarray(a), jnp.asarray(p), jnp.asarray(n), 0.35))
    d_pos = np.linalg.norm(a - p, axis=-1)
    d_neg = np.linalg.norm(a - n, axis=-1)
    want = float(np.mean(np.maximum(0, d_pos - d_neg + 0.35)))
    np.testing.assert_allclose(got, want, rtol=1e-5)

    pred = np.array([[0.2, 0.3], [0.5, 0.5]], np.float32)
    gt = np.array([[0.2, 0.4], [0.0, 0.5]], np.float32)
    err = float(losses.pose_error(jnp.asarray(pred), jnp.asarray(gt)))
    np.testing.assert_allclose(err, (0.1 + 0.5) / 2, rtol=1e-5)


def test_recall_precision():
    gt = np.array([[0, 1], [2, 0], [3, -1]])  # third is a bin entry
    pred0 = np.array([-1, -1, 0, 9])          # object 2 -> hint 0 correct
    pred0[2] = 0
    recall, precision = losses.calc_recall_precision(gt, pred0, None)
    assert recall == 0.5
    assert precision == 0.5  # 1 of 2 predicted pairs correct ((2,0) yes, (3,9) no)


def test_get_pos_in_cell_helpers():
    """Legacy geometric estimators (reference cross_matcher.py:138-185)."""
    from text2loc_tpu.models.cross_matcher import (
        get_pos_in_cell,
        get_pos_in_cell_intersect,
    )

    centers = np.array([[0.2, 0.2], [0.8, 0.2], [0.5, 0.9]])
    matches0 = np.array([0, 1, -1])        # obj0->hint0, obj1->hint1
    offsets = np.array([[0.1, 0.1], [-0.1, 0.1], [0.0, 0.0]])
    pos = get_pos_in_cell(centers, matches0, offsets)
    want = np.mean([[0.3, 0.3], [0.7, 0.3]], axis=0)
    np.testing.assert_allclose(pos, want, atol=1e-9)

    # Nothing matched -> cell center.
    np.testing.assert_allclose(
        get_pos_in_cell(centers, np.array([-1, -1, -1]), offsets), [0.5, 0.5]
    )

    # Ray intersection: two orthogonal rays meeting at (0.5, 0.5).
    centers2 = np.array([[0.0, 0.5], [0.5, 0.0]])
    dirs = np.array([[1.0, 0.0], [0.0, 1.0]])
    got = get_pos_in_cell_intersect(centers2, np.array([0, 1]), dirs)
    np.testing.assert_allclose(got, [0.5, 0.5], atol=1e-9)
