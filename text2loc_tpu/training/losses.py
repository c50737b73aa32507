"""Retrieval losses and pose-error metrics.

JAX rebuilds of /root/reference/training/losses.py. The published coarse
configuration trains with `ContrastiveLoss` (symmetric InfoNCE, temperature
0.1, positive included in the denominator, :255-283); pairwise (:179-217) and
hardest (:286-355, the second, shadowing definition) are selectable via
`make_retrieval_loss`; triplet (reference coarse.py:268) is wired through the
coarse step's negative-cell branch (training/steps.py) — the reference's own
triplet path is dead code (its dataset never produces `negative_cells`).

The reference's NT_Xent cross-GPU gather is dead code (`GatherLayer` is never
defined, :358-402); the working multi-chip equivalent here is `axis_name`:
when a loss is called under shard_map/pjit with a data-parallel axis, both
embedding sides are all-gathered over ICI so every chip sees the global batch
of negatives — the TPU-native version of that intent.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from text2loc_tpu.ops.masked import l2_normalize


def _maybe_global(anchor, positive, axis_name: Optional[str]):
    """All-gather both towers over the data-parallel axis if one is given."""
    if axis_name is None:
        return anchor, positive, 0
    ga = jax.lax.all_gather(anchor, axis_name)     # [n_dev, B_local, D]
    gp = jax.lax.all_gather(positive, axis_name)
    n_dev, b_local, d = ga.shape
    offset = jax.lax.axis_index(axis_name) * b_local
    return ga.reshape(n_dev * b_local, d), gp.reshape(n_dev * b_local, d), offset


def contrastive_loss(anchor, positive, temperature: float = 0.1,
                     axis_name: Optional[str] = None):
    """Symmetric InfoNCE (reference ContrastiveLoss, losses.py:269-283).

    anchor: [B, D] text embeddings; positive: [B, D] cell embeddings.
    Positive pair sits on the diagonal and is included in the denominator.
    """
    anchor, positive, _ = _maybe_global(anchor, positive, axis_name)
    a = l2_normalize(anchor.astype(jnp.float32))
    p = l2_normalize(positive.astype(jnp.float32))
    sim = (a @ p.T) / temperature                     # [B, B]
    pos = jnp.diag(sim)
    # -log(exp(pos) / col_sum) - log(exp(pos) / row_sum), in log-space.
    lse_cols = jax.nn.logsumexp(sim, axis=0)
    lse_rows = jax.nn.logsumexp(sim, axis=1)
    losses = (lse_cols - pos) + (lse_rows - pos)
    return jnp.mean(losses)


def pairwise_ranking_loss(anchor, positive, margin: float = 0.35,
                          axis_name: Optional[str] = None):
    """Kiros et al. margin ranking (reference losses.py:192-217)."""
    anchor, positive, _ = _maybe_global(anchor, positive, axis_name)
    a = l2_normalize(anchor.astype(jnp.float32))
    p = l2_normalize(positive.astype(jnp.float32))
    scores = a @ p.T
    diag = jnp.diag(scores)
    b = scores.shape[0]
    off_diag = 1.0 - jnp.eye(b, dtype=scores.dtype)
    cost_s = jnp.maximum(0.0, margin - diag[None, :] + scores) * off_diag
    cost_im = jnp.maximum(0.0, margin - diag[:, None] + scores) * off_diag
    return (jnp.sum(cost_s) + jnp.sum(cost_im)) / b


def hardest_ranking_loss(anchor, positive, margin: float = 0.35,
                         scale: float = 64.0, axis_name: Optional[str] = None):
    """Hardest-negative margin ranking x scale (reference losses.py:321-355)."""
    anchor, positive, _ = _maybe_global(anchor, positive, axis_name)
    a = l2_normalize(anchor.astype(jnp.float32))
    p = l2_normalize(positive.astype(jnp.float32))
    scores = a @ p.T
    diag = jnp.diag(scores)
    b = scores.shape[0]
    off_diag = 1.0 - jnp.eye(b, dtype=scores.dtype)
    cost_s = jnp.maximum(0.0, margin - diag[None, :] + scores) * off_diag
    cost_im = jnp.maximum(0.0, margin - diag[:, None] + scores) * off_diag
    return (jnp.mean(jnp.max(cost_s, axis=1)) + jnp.mean(jnp.max(cost_im, axis=1))) * scale


def triplet_margin_loss(anchor, positive, negative, margin: float = 0.35):
    """torch.nn.TripletMarginLoss semantics (L2 distances, mean reduction)."""
    d_pos = jnp.linalg.norm(anchor - positive, axis=-1)
    d_neg = jnp.linalg.norm(anchor - negative, axis=-1)
    return jnp.mean(jnp.maximum(0.0, d_pos - d_neg + margin))


def matching_loss(log_p, all_matches, match_mask):
    """SuperGlue NLL over a log-assignment matrix (reference losses.py:14-31).

    log_p: [B, O+1, S+1] log assignment probabilities (with dustbins).
    all_matches: [B, M, 2] (obj_idx, hint_idx) pairs, padded.
    match_mask: [B, M] validity of each pair.
    """
    b = log_p.shape[0]
    bidx = jnp.arange(b)[:, None]
    vals = -log_p[bidx, all_matches[..., 0], all_matches[..., 1]]
    per_sample = jnp.sum(jnp.where(match_mask, vals, 0.0), axis=1) / jnp.maximum(
        jnp.sum(match_mask, axis=1), 1
    )
    return jnp.mean(per_sample)


def make_retrieval_loss(cfg):
    """Loss selected by config (reference training/coarse.py:262-270)."""
    name = cfg.ranking_loss
    if name == "contrastive":
        return lambda a, p, axis_name=None: contrastive_loss(
            a, p, cfg.temperature, axis_name
        )
    if name == "pairwise":
        return lambda a, p, axis_name=None: pairwise_ranking_loss(
            a, p, cfg.margin, axis_name
        )
    if name == "hardest":
        return lambda a, p, axis_name=None: hardest_ranking_loss(
            a, p, cfg.margin, cfg.hardest_scale, axis_name
        )
    raise ValueError(f"unsupported ranking_loss {name!r} for pair losses")


def nt_xent(z_i, z_j, temperature: float = 0.1,
            axis_name: Optional[str] = None):
    """SimCLR NT-Xent over 2B augmented views (reference losses.py:358-402).

    The reference version is dead code — its cross-GPU `GatherLayer` is never
    defined, so world_size > 1 would NameError (SURVEY.md section 2.6). This
    is the working TPU-native version: with `axis_name`, both views are
    all-gathered over ICI so every chip contrasts against the global 2B set.
    """
    if axis_name is not None:
        z_i = jax.lax.all_gather(z_i, axis_name).reshape(-1, z_i.shape[-1])
        z_j = jax.lax.all_gather(z_j, axis_name).reshape(-1, z_j.shape[-1])
    b = z_i.shape[0]
    z = l2_normalize(jnp.concatenate([z_i, z_j], axis=0).astype(jnp.float32))
    sim = (z @ z.T) / temperature                     # [2B, 2B]
    mask = jnp.eye(2 * b, dtype=bool)
    sim = jnp.where(mask, -jnp.inf, sim)
    # Positive of row r is r+B (mod 2B).
    pos_idx = jnp.concatenate([jnp.arange(b) + b, jnp.arange(b)])
    pos = sim[jnp.arange(2 * b), pos_idx]
    return jnp.mean(jax.nn.logsumexp(sim, axis=1) - pos)


def calc_recall_precision(gt_matches, pred_matches0, pred_matches1):
    """Matching recall/precision (reference losses.py:34-63).

    gt_matches: [M, 2] (obj_idx, hint_idx) gt pairs; bins use -1 on either
    side. pred_matches0: [O] per-object predicted hint (-1 none);
    pred_matches1: [S] per-hint predicted object (-1 none).
    """
    import numpy as np

    gt = [tuple(m) for m in np.asarray(gt_matches)]
    true_pairs = {m for m in gt if m[0] >= 0 and m[1] >= 0}
    pred_pairs = {
        (o, int(h)) for o, h in enumerate(np.asarray(pred_matches0)) if h >= 0
    }
    recall = len(true_pairs & pred_pairs) / max(len(true_pairs), 1)
    precision = len(true_pairs & pred_pairs) / max(len(pred_pairs), 1)
    return recall, precision


# ---------------------------------------------------------------------------
# Pose-error metrics
# ---------------------------------------------------------------------------


def pose_error(pred_pos, gt_pose_in_cell):
    """Mean L2 error in normalized cell units (reference calc_pose_error2,
    losses.py:126-176): prediction vs gt normalized pose, x-y plane."""
    return jnp.mean(
        jnp.linalg.norm(pred_pos - gt_pose_in_cell[..., :2], axis=-1)
    )
