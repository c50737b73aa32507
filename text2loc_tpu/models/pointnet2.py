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

import os
from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from text2loc_tpu.config import PointNetConfig
from text2loc_tpu.models.mlp import get_mlp
from text2loc_tpu.ops.ballquery import ball_query_knn, gather_neighbors
from text2loc_tpu.ops.fps import fps_gather
from text2loc_tpu.ops.masked import masked_max
from text2loc_tpu.ops.pallas_pointconv import (
    fold_bn_affine,
    fused_sa_gather,
    fused_sa_select,
    fused_set_abstraction,
)
from text2loc_tpu.ops.pallas_sa_train import sa_train_fused


def _fused_mode() -> str:
    """"off"|"exact"|"all"|"gather"|"full"|"first" (env TEXT2LOC_FUSED_SA).

    "first" (the TPU inference default): the ENTIRE level — distances,
    selection, compaction gather and edge MLP — runs on the tile, selecting
    the FIRST <=K in-radius points in lane order: the reference's own
    torch-cluster insertion-order semantics (pointnet2.py:28-34), with no
    selection loop at all (the in-radius mask feeds rank compaction
    directly). "full": same fully-fused kernel but K-nearest-in-radius
    (bisection on the distance threshold). "gather": neighbor selection runs
    OUTSIDE on the MXU (ball_query_knn — identical neighborhoods to the XLA
    path) and the fused kernel gathers the K selected neighbors via a
    one-hot matmul that never leaves VMEM. "exact" replicates K-nearest
    selection in-kernel via argmin rounds (measured slower). "all"
    aggregates over ALL in-radius neighbors — a deterministic superset of
    the reference's arbitrary <=K subset. Accuracy deltas for all modes
    measured in BENCHMARKS.md (scripts/validate_kernels.py)."""
    if jax.default_backend() in ("cpu", "gpu") or os.environ.get(
        "TEXT2LOC_DISABLE_PALLAS"
    ):
        return "off"
    v = os.environ.get("TEXT2LOC_FUSED_SA", "first")
    if v in ("1", "exact"):
        return "exact"
    if v in ("all", "gather", "full", "first", "off", ""):
        return v or "off"
    # Same validation as the comma-list path: a typo ('frst') must not
    # silently benchmark the XLA path as if it were a fused kernel.
    raise ValueError(
        f"TEXT2LOC_FUSED_SA={v!r}: expected off|first|full|gather|all|"
        "exact|1 or a comma list"
    )


def _fused_mode_list(n_levels: int) -> list:
    """Per-SA-level fused modes. TEXT2LOC_FUSED_SA also accepts a comma list
    — per-level strategy selection (probe_levels.py measured per-level
    winners under bisection selection; with "first" selection one mode wins
    everywhere: 19.6 vs 25.9 ms PointNet fwd for the old "full,full,all",
    and "first,first,all" is no faster). The TPU default is "first" at every
    level (validated accuracy-neutral on trained weights,
    kernel_validation.json `fused_first`: 100% top-1 agreement, 4.8 cm mean
    |dpos|, identical recall tables)."""
    v = os.environ.get("TEXT2LOC_FUSED_SA", "first")
    if "," in v:
        if jax.default_backend() in ("cpu", "gpu") or os.environ.get(
            "TEXT2LOC_DISABLE_PALLAS"
        ):
            return ["off"] * n_levels
        modes = ["exact" if s.strip() == "1" else s.strip()
                 for s in v.split(",")]
        if len(modes) != n_levels:
            raise ValueError(
                f"TEXT2LOC_FUSED_SA={v!r}: expected {n_levels} comma-separated "
                f"modes (one per SA level), got {len(modes)}"
            )
        bad = [s for s in modes
               if s not in ("all", "gather", "full", "first", "off", "exact")]
        if bad:
            raise ValueError(f"TEXT2LOC_FUSED_SA={v!r}: unknown mode(s) {bad}")
        return modes
    return [_fused_mode()] * n_levels


import contextlib
import functools

_FUSED_TRAIN_SUPPRESSED = [False]
_FUSED_TRAIN_MESH = [None]
_FUSED_TRAIN_AUTO = [None]


@contextlib.contextmanager
def fused_train_auto(tokens):
    """Override what TEXT2LOC_FUSED_SA_TRAIN "auto" resolves to within this
    context (a per-level token tuple, e.g. ("e32", "e32", "1")).

    The coarse and fine stages have DIFFERENT measured per-level winners
    (the fine stage's 4x smaller cloud batch moves the cached-e/recompute
    crossover — BENCHMARKS.md log #11), so each train-step factory wraps
    its model.apply in its stage's winner. Executes at trace time only; an
    explicit env value (anything but unset/"auto") still wins, as do the
    DP suppression and backend gates."""
    prev = _FUSED_TRAIN_AUTO[0]
    _FUSED_TRAIN_AUTO[0] = tokens
    try:
        yield
    finally:
        _FUSED_TRAIN_AUTO[0] = prev


@contextlib.contextmanager
def suppress_fused_train():
    """Force the env-default fused TRAINING kernel off within this context.

    Used by parallel/train._bind around the DP step trace: a Mosaic
    pallas_call is a custom call GSPMD cannot auto-partition over the mesh,
    so by default multi-chip DP steps keep the XLA edge-tensor path (see
    fused_train_mesh for the shard_map alternative). Explicit
    fused_train=True on the module still wins (tests)."""
    prev = _FUSED_TRAIN_SUPPRESSED[0]
    _FUSED_TRAIN_SUPPRESSED[0] = True
    try:
        yield
    finally:
        # Restore, don't reset: a nested context (or one entered inside a
        # wider suppression) must not re-enable the kernel on exit.
        _FUSED_TRAIN_SUPPRESSED[0] = prev


@contextlib.contextmanager
def fused_train_mesh(mesh, axis_name: str):
    """Run fused TRAINING SA kernels inside this context as shard_map
    regions over `mesh`/`axis_name` (object batch sharded, params
    replicated, BN statistics psum'd over ICI — global-batch semantics
    identical to the GSPMD-XLA path). This is how the fused kernel
    coexists with a GSPMD DP train step: GSPMD cannot partition a Mosaic
    custom call, but a manual shard_map island inside the jitted program
    can. Set by parallel/train._bind — the DEFAULT DP mode since the
    1-device-mesh A/B measured the island -29% vs the XLA DP path on both
    stages (BENCHMARKS.md log #15); TEXT2LOC_FUSED_SA_TRAIN_DP=0 opts out."""
    prev = _FUSED_TRAIN_MESH[0]
    _FUSED_TRAIN_MESH[0] = (mesh, axis_name)
    try:
        yield
    finally:
        _FUSED_TRAIN_MESH[0] = prev


def _fused_train_default() -> bool:
    """TEXT2LOC_FUSED_SA_TRAIN: run TRAINING-mode SA levels through the
    fused custom-VJP Pallas kernel (ops/pallas_sa_train.py) instead of the
    XLA edge-tensor path. TPU-only (CPU/GPU always use XLA), except the
    special value "interpret" which forces the kernel in interpret mode on
    any backend (CPU-mesh integration tests of the DP shard_map island).
    Grad-equality tested (tests/test_pallas_sa_train.py,
    scripts/probe_sa_train.py on-chip); step-time A/B in BENCHMARKS.md
    log #10."""
    if _FUSED_TRAIN_SUPPRESSED[0]:
        return False
    if os.environ.get("TEXT2LOC_FUSED_SA_TRAIN") == "interpret":
        return True
    if jax.default_backend() in ("cpu", "gpu") or os.environ.get(
        "TEXT2LOC_DISABLE_PALLAS"
    ):
        return False
    return os.environ.get("TEXT2LOC_FUSED_SA_TRAIN", "1") not in ("", "0")


def _fused_train_list(n_levels: int):
    """Per-SA-level fused_train booleans for the PointNet2 ladder.

    TEXT2LOC_FUSED_SA_TRAIN values:
    * unset / "auto" — the measured winner: fused kernel on the LAST level
      only, any body dtype (per-level on-chip A/B, BENCHMARKS.md log #10:
      sa3's H=256 tiles win big while sa1/sa2's fused passes lose to XLA in
      context; coarse bf16 97.2 -> 83.4 ms, coarse f32 113.1 -> 90.1, fine
      68.2 -> 58.0).
    * "1" — all levels fused; "0"/"" — all XLA.
    * "interpret" — all levels, interpret-mode kernels on any backend
      (CPU-mesh tests of the DP shard_map island).
    * comma list ("0,0,1") — explicit per-level selection.
    TPU-only except "interpret"; DP suppression and TEXT2LOC_DISABLE_PALLAS
    force XLA everywhere."""
    v = os.environ.get("TEXT2LOC_FUSED_SA_TRAIN")
    if v == "interpret":
        if _FUSED_TRAIN_SUPPRESSED[0]:
            return [False] * n_levels
        return [True] * n_levels
    if _FUSED_TRAIN_SUPPRESSED[0] or jax.default_backend() in (
        "cpu", "gpu"
    ) or os.environ.get("TEXT2LOC_DISABLE_PALLAS"):
        return [False] * n_levels
    def tok(m):
        # "e"/"e32": cached-edge kernel variant (bf16 / f32 HBM cache);
        # "1": recompute variant; "0"/"": XLA path.
        if m in ("e", "e32"):
            return m
        if m in ("", "0"):
            return False
        if m == "1":
            return True
        raise ValueError(
            f"TEXT2LOC_FUSED_SA_TRAIN token {m!r}: expected 0|1|e|e32"
        )

    if v is None or v == "auto":
        if _FUSED_TRAIN_AUTO[0] is not None:
            auto = _FUSED_TRAIN_AUTO[0]
            if len(auto) != n_levels:
                raise ValueError(
                    f"fused_train_auto{tuple(auto)}: expected {n_levels} "
                    f"per-level tokens"
                )
            return [tok(m) for m in auto]
        return [False] * (n_levels - 1) + [True]
    if "," not in v:
        return [tok(v)] * n_levels
    modes = [s.strip() for s in v.split(",")]
    if len(modes) != n_levels:
        raise ValueError(
            f"TEXT2LOC_FUSED_SA_TRAIN={v!r}: expected {n_levels} "
            f"comma-separated values, got {len(modes)}"
        )
    return [tok(m) for m in modes]


def _approx_neighbors(default: bool) -> bool:
    """TEXT2LOC_APPROX_NEIGHBORS parsing: "0"/"" = exact top_k, "1" = approx.

    The gather inference path defaults to approx (validated accuracy-neutral,
    scripts/validate_kernels.py); training and the XLA exact path default to
    exact. The same value convention applies to both (bool("0") pitfalls
    avoided).
    """
    v = os.environ.get("TEXT2LOC_APPROX_NEIGHBORS", "")
    if v == "":
        return default
    return v != "0"


class PointNetFeatures(NamedTuple):
    """Mirrors the reference's EasyDict return (pointnet2.py:94-100)."""

    features0: jnp.ndarray  # [N, 1024]
    features1: jnp.ndarray  # [N, 512]
    features2: jnp.ndarray  # [N, 256]
    class_pred: jnp.ndarray
    color_pred: jnp.ndarray


class SetAbstraction(nn.Module):
    """One SA level: FPS downsample + ball-query + PointConv (max aggr).

    Two execution paths over ONE parameter set:
    * training / non-TPU: one-hot MXU gathers + masked edge MLP + masked max
      (batch-global BatchNorm statistics, reference get_mlp semantics);
    * TPU inference: the fused Pallas kernel (ops/pallas_pointconv.py) with
      BatchNorm pre-folded from the running statistics — no HBM edge tensors.

    Parameters are declared explicitly (dense_l_kernel/bias, bn_l_scale/bias +
    bn_l_mean/var stats) so the fused path can fold affines directly; the
    naming is what models/torch_convert.convert_pointnet_checkpoint targets.
    """

    num_samples: int
    radius: float
    mlp_channels: tuple
    max_neighbors: int
    dtype: jnp.dtype = jnp.float32
    # None = env-controlled (TEXT2LOC_FUSED_SA); or "off"/"exact"/"all"
    # (bool accepted: True == "exact"). See _fused_mode.
    fused: Optional[object] = None
    # None = env-controlled (TEXT2LOC_FUSED_SA_TRAIN): fused custom-VJP
    # training kernel (ops/pallas_sa_train.py) for the train=True path.
    fused_train: Optional[bool] = None
    fused_interpret: bool = False     # interpret-mode kernel (tests)
    bn_eps: float = 1e-5
    bn_momentum: float = 0.1

    @nn.compact
    def __call__(self, x, pos, obj_mask=None, train: bool = False,
                 centers=None):
        """x: [N, P, C]; pos: [N, P, 3]; obj_mask: [N] real-object flags.

        `centers`: optional precomputed [N, num_samples, 3] FPS centers
        (PointNet2 passes ladder prefixes — see its docstring)."""
        ch = tuple(self.mlp_channels)
        assert len(ch) == 3, "SA levels are two-layer MLPs (reference ladder)"
        cin, h1, h2 = ch
        c = x.shape[-1]
        assert cin == c + 3, (cin, c)

        kernels, biases, scales, shifts, means, variances = [], [], [], [], [], []
        for l, (ci, co) in enumerate(((cin, h1), (h1, h2))):
            kernels.append(self.param(
                f"dense_{l}_kernel", nn.initializers.lecun_normal(), (ci, co),
                jnp.float32,
            ))
            biases.append(self.param(
                f"dense_{l}_bias", nn.initializers.zeros, (co,), jnp.float32
            ))
            scales.append(self.param(
                f"bn_{l}_scale", nn.initializers.ones, (co,), jnp.float32
            ))
            shifts.append(self.param(
                f"bn_{l}_bias", nn.initializers.zeros, (co,), jnp.float32
            ))
            means.append(self.variable(
                "batch_stats", f"bn_{l}_mean", lambda co=co: jnp.zeros((co,), jnp.float32)
            ))
            variances.append(self.variable(
                "batch_stats", f"bn_{l}_var", lambda co=co: jnp.ones((co,), jnp.float32)
            ))

        if centers is None:
            centers, _, _ = fps_gather(pos, None, self.num_samples)
        else:
            assert centers.shape[1] == self.num_samples, (
                centers.shape, self.num_samples)

        mode = self.fused if self.fused is not None else _fused_mode()
        if isinstance(mode, bool):  # convenience: True == "exact"
            mode = "exact" if mode else "off"
        if not train and mode != "off" and not self.is_initializing():
            ab = [
                fold_bn_affine(
                    biases[l], scales[l], shifts[l],
                    means[l].value, variances[l].value, self.bn_eps,
                )
                for l in range(2)
            ]
            w0 = kernels[0].astype(self.dtype)
            if mode in ("full", "first"):
                feat = jnp.concatenate(
                    [x.astype(self.dtype), pos.astype(self.dtype)], axis=-1
                )
                out = fused_sa_select(
                    feat, pos, centers,
                    w0, w0[c:], ab[0],
                    kernels[1].astype(self.dtype), ab[1],
                    radius=self.radius, k=self.max_neighbors,
                    interpret=self.fused_interpret,
                    bisect_iters=int(
                        os.environ.get("TEXT2LOC_BISECT_ITERS", "12")
                    ),
                    selection="first" if mode == "first" else "bisect",
                )
                return out, centers
            if mode == "gather":
                # approx_max_k selection by default: measured identical
                # retrieval/localization tables on trained weights
                # (scripts/validate_kernels.py, BENCHMARKS.md) at ~35% lower
                # selection cost. Set TEXT2LOC_APPROX_NEIGHBORS=0 for exact
                # top_k.
                approx = _approx_neighbors(default=True)
                nbr_idx, nbr_mask = ball_query_knn(
                    pos, centers, self.radius, self.max_neighbors, approx=approx
                )
                feat = jnp.concatenate(
                    [x.astype(self.dtype), pos.astype(self.dtype)], axis=-1
                )
                out = fused_sa_gather(
                    feat, centers, nbr_idx, nbr_mask,
                    w0, w0[c:], ab[0],
                    kernels[1].astype(self.dtype), ab[1],
                    interpret=self.fused_interpret,
                )
                return out, centers
            out = fused_set_abstraction(
                x.astype(self.dtype), pos, centers,
                w0[:c], w0[c:], ab[0],
                kernels[1].astype(self.dtype), ab[1],
                radius=self.radius, k=self.max_neighbors,
                interpret=self.fused_interpret,
                select_k=(mode == "exact"),
            )
            return out, centers

        approx = _approx_neighbors(default=False)
        nbr_idx, nbr_mask = ball_query_knn(
            pos, centers, self.radius, self.max_neighbors, approx=approx
        )
        # Inside the PointNet2 ladder this attr always arrives as an
        # explicit per-level boolean (_fused_train_list — the "auto"
        # default fuses only the last level, the measured winner at any
        # body dtype; BENCHMARKS.md log #10). The attr-None fallback below
        # covers STANDALONE SetAbstraction use and stays conservative:
        # env-default gated to f32 bodies (all-level fusing measured slower
        # at bf16).
        fused_train = (
            self.fused_train if self.fused_train is not None
            else (_fused_train_default() and self.dtype == jnp.float32)
        )
        if fused_train is True and self.fused_train is None:
            # Standalone fallback must propagate the cached-edge TOKEN, not
            # collapse it to a bool: env "e"/"e32" selects the cached-edge
            # kernel here exactly as it does inside the ladder's per-level
            # list (True alone would silently run the recompute variant).
            env_tok = os.environ.get("TEXT2LOC_FUSED_SA_TRAIN", "")
            if env_tok in ("e", "e32"):
                fused_train = env_tok
        if train and fused_train and not self.is_initializing():
            # Hoisted first layer: concat(x_j, pos_j - c_i) @ W1 + b1
            # == (concat(x_j, pos_j) @ W1 + b1) - c_i @ W1[pos rows], so the
            # per-point term u and the per-center term sv are computed ONCE
            # on the MXU and the kernel recombines them per edge in VMEM —
            # the [N, S*K, H] edge tensors never exist in HBM, forward or
            # backward (hand-derived custom VJP, grad-equality tested).
            bn_mask = nbr_mask
            if obj_mask is not None:
                bn_mask = nbr_mask & jnp.asarray(obj_mask, bool)[:, None, None]
            w1 = kernels[0]
            both = jnp.concatenate(
                [x, pos.astype(x.dtype)], axis=-1
            ).astype(jnp.float32)
            u = jnp.dot(both, w1) + biases[0]
            sv = jnp.dot(centers.astype(jnp.float32), w1[c:])
            # fused_train token "e"/"e32": cache the edge tensor in HBM
            # (bf16 / f32) instead of recomputing it per kernel pass — see
            # sa_train_fused's cache_dtype doc. True = recompute variant.
            cache_dtype = {"e": jnp.bfloat16, "e32": jnp.float32}.get(
                fused_train
            )
            call = functools.partial(
                sa_train_fused,
                eps=self.bn_eps,
                compute_dtype=self.dtype,
                interpret=self.fused_interpret or (
                    os.environ.get("TEXT2LOC_FUSED_SA_TRAIN") == "interpret"
                ),
                cache_dtype=cache_dtype,
            )
            if _FUSED_TRAIN_MESH[0] is not None:
                from jax.sharding import PartitionSpec as P

                mesh, axis = _FUSED_TRAIN_MESH[0]
                sharded = P(axis)
                call = jax.shard_map(
                    functools.partial(call, axis_name=axis),
                    mesh=mesh,
                    in_specs=(sharded,) * 2 + (P(),) * 6 + (sharded,) * 3,
                    out_specs=(sharded, (P(),) * 5),
                    check_vma=False,
                )
            out, stats = call(
                u, sv, kernels[1], biases[1], scales[0], shifts[0],
                scales[1], shifts[1], nbr_idx, nbr_mask, bn_mask,
            )
            m1, v1, m2, v2, n1 = stats
            mom = self.bn_momentum
            denom = jnp.maximum(n1 - 1.0, 1.0)
            for l, (m, v) in enumerate(((m1, v1), (m2, v2))):
                means[l].value = (1 - mom) * means[l].value + mom * m
                variances[l].value = (
                    (1 - mom) * variances[l].value + mom * v * n1 / denom
                )
            return out.astype(self.dtype), centers
        # One fused gather for features + coordinates: the one-hot selection
        # matmul is built once per level instead of twice.
        both = jnp.concatenate([x, pos.astype(x.dtype)], axis=-1)
        nbr = gather_neighbors(both, nbr_idx)           # [N, S, K, C+3]
        nbr_x, nbr_pos = nbr[..., : x.shape[-1]], nbr[..., x.shape[-1] :]
        rel = nbr_pos - centers[:, :, None, :].astype(x.dtype)
        h = jnp.concatenate([nbr_x, rel], axis=-1)

        bn_mask = nbr_mask
        if obj_mask is not None:
            bn_mask = nbr_mask & jnp.asarray(obj_mask, bool)[:, None, None]
        for l in range(2):
            h = jnp.dot(h, kernels[l].astype(self.dtype)) + biases[l].astype(self.dtype)
            h = self._masked_bn(h, bn_mask, l, scales[l], shifts[l],
                                means[l], variances[l], train)
            h = nn.relu(h)
        out = masked_max(h, nbr_mask, axis=2)           # [N, S, C_out]
        return out, centers

    def _masked_bn(self, z, mask, l, scale, bias, ra_mean, ra_var, train):
        """BatchNorm1d over valid edges (MaskedBatchNorm semantics inlined on
        the raw variables so both execution paths share one parameter set)."""
        if train:
            z32 = z.astype(jnp.float32)
            m = jnp.asarray(mask, bool)
            while m.ndim < z32.ndim:
                m = m[..., None]
            mf = m.astype(jnp.float32)
            count = jnp.maximum(jnp.sum(mf), 1.0)
            mean = jnp.sum(z32 * mf, axis=tuple(range(z.ndim - 1))) / count
            var = jnp.sum(((z32 - mean) ** 2) * mf, axis=tuple(range(z.ndim - 1))) / count
            if not self.is_initializing():
                unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
                ra_mean.value = (1 - self.bn_momentum) * ra_mean.value + self.bn_momentum * mean
                ra_var.value = (1 - self.bn_momentum) * ra_var.value + self.bn_momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
        inv = jnp.reciprocal(jnp.sqrt(var + self.bn_eps))
        a = (scale * inv).astype(z.dtype)
        b = (bias - mean * scale * inv).astype(z.dtype)
        return z * a + b


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
    fused: Optional[object] = None
    fused_train: Optional[bool] = None
    fused_interpret: bool = False

    @nn.compact
    def __call__(self, xyz, rgb, obj_mask=None, train: bool = False) -> PointNetFeatures:
        c = self.cfg
        x, pos = rgb.astype(self.dtype), xyz

        # FPS ladder prefix property: farthest-first traversal is greedy and
        # prefix-stable, so fps(fps(pts, S1), S2) == fps(pts, S1)[:S2]
        # BIT-EXACTLY when S2 <= S1 and the start point is shared (round i's
        # winner maximizes min-dist over the FULL candidate set, hence also
        # over any later-level subset; tie-breaks follow stored order, which
        # is traversal order in both). One FPS pass per object replaces one
        # per SA level (the reference re-runs gnn.fps per level,
        # models/pointcloud/pointnet2.py:26).
        ladder = list(c.sa_num_points)
        prefix_ok = all(
            ladder[i + 1] <= ladder[i] for i in range(len(ladder) - 1)
        )
        centers_all = None
        if prefix_ok and ladder:
            centers_all, _, _ = fps_gather(pos, None, ladder[0])

        modes = (
            _fused_mode_list(len(c.sa_num_points))
            if self.fused is None
            else [self.fused] * len(c.sa_num_points)
        )
        train_modes = (
            _fused_train_list(len(c.sa_num_points))
            if self.fused_train is None
            else [self.fused_train] * len(c.sa_num_points)
        )
        for i in range(len(c.sa_num_points)):
            centers_i = (
                centers_all[:, : ladder[i]] if centers_all is not None else None
            )
            x, pos = SetAbstraction(
                num_samples=c.sa_num_points[i],
                radius=c.sa_radii[i],
                mlp_channels=c.sa_mlps[i],
                max_neighbors=c.sa_max_neighbors,
                dtype=self.dtype,
                fused=modes[i],
                fused_train=train_modes[i],
                fused_interpret=self.fused_interpret,
                name=f"sa{i + 1}",
            )(x, pos, obj_mask=obj_mask, train=train, centers=centers_i)

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
