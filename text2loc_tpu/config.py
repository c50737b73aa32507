"""Unified typed configuration.

The reference splits its configuration across three argparse modules with
duplicated hyper-parameter definitions (/root/reference/training/args.py,
/root/reference/evaluation/args.py, /root/reference/datapreparation/args.py).
Here one dataclass tree is the single source of truth; train / eval / prep
entry points consume views of it. Defaults replicate the published training
configuration (training/args.py:11-90).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple


@dataclass(frozen=True)
class PointNetConfig:
    """PointNet++ backbone (reference models/pointcloud/pointnet2.py:52-78).

    Set-abstraction levels use static sampling sizes instead of the reference's
    ratio-driven dynamic sizes: ratio 0.5 on 256 input points gives the fixed
    ladder 256 -> 128 -> 64 -> 32.
    """

    num_points: int = 256                 # points sampled per object (pointnet_numpoints)
    sa_num_points: Tuple[int, ...] = (128, 64, 32)
    sa_radii: Tuple[float, ...] = (0.2, 0.3, 0.4)
    sa_max_neighbors: int = 32            # torch-cluster radius() caps at 32 by default
    sa_mlps: Tuple[Tuple[int, ...], ...] = ((6, 32, 64), (67, 128, 128), (131, 256, 256))
    global_mlp: Tuple[int, ...] = (259, 512, 1024)
    head_dims: Tuple[int, int] = (512, 256)  # lin1/lin2 -> features1/features2
    features_level: int = 2               # which features level feeds the object encoder
    freeze: bool = False


@dataclass(frozen=True)
class ModelConfig:
    """Shared encoder / tower hyper-parameters (training/args.py:17-79)."""

    coarse_embed_dim: int = 256
    fine_embed_dim: int = 128
    use_features: Tuple[str, ...] = ("class", "color", "position", "num")
    class_embed: bool = False
    color_embed: bool = False
    object_size: int = 28                 # coarse per-cell object cap
    pad_size: int = 16                    # fine per-cell object cap
    num_mentioned: int = 6                # hints per pose

    # Text tower. The reference uses frozen T5-large token embeddings
    # (language_encoder.py:87-94); text_embed_dim is T5-large's d_model.
    text_embed_dim: int = 1024
    max_hint_tokens: int = 16             # static token budget per hint sentence
    intra_num_layers: int = 1
    intra_num_heads: int = 4
    inter_num_layers: int = 1
    inter_num_heads: int = 4
    fine_intra_num_layers: int = 1
    fine_intra_num_heads: int = 4

    # Coarse object-set transformer (cell_retrieval.py:31-35).
    object_inter_num_layers: int = 2
    object_inter_num_heads: int = 4

    # Fine cascaded cross-attention transformer (cross_matcher.py:67-79).
    fine_num_decoder_layers: int = 2
    fine_num_decoder_heads: int = 4

    # TPU-native extension: attend/pool only over real (non-padding) objects
    # and tokens. The reference attends to zero-padded slots
    # (cell_retrieval.py:85-108); set False to reproduce that behavior.
    mask_padded: bool = True

    dropout_rate: float = 0.1             # torch TransformerEncoderLayer default
    dtype: str = "bfloat16"               # INFERENCE compute dtype
    # Training compute dtype. float32 and not negotiable lightly: on the
    # current remote-TPU stack, the bf16 backward of the coarse tower's
    # layer -> masked_max -> l2_normalize tail miscompiles to EXACTLY ZERO
    # gradients (forward fine, CPU fine, f32 fine) — measured in
    # BENCHMARKS.md "bf16 training" note. Parameters are f32 either way, so
    # checkpoints interoperate between train (f32) and serving (bf16) models.
    train_dtype: str = "float32"
    # Optional compute dtype for the OBJECT BODY (ObjectEncoder + PointNet)
    # only; None = use `dtype`. The bf16 miscompile above lives in the
    # transformer tail, so `body_dtype="bfloat16"` + `dtype="float32"` gives
    # mixed-precision TRAINING: the FLOP-heavy point backbone runs bf16 while
    # the tail (and its backward) stays f32. Activations are cast to `dtype`
    # at the body/tail boundary. Validated on-chip in
    # scripts/probe_mixed_train.py (see BENCHMARKS.md).
    body_dtype: Optional[str] = None

    pointnet: PointNetConfig = field(default_factory=PointNetConfig)


@dataclass(frozen=True)
class LossConfig:
    """Retrieval loss selection (training/args.py:41-44, losses.py)."""

    ranking_loss: str = "contrastive"     # contrastive|pairwise|hardest|triplet
    temperature: float = 0.1
    margin: float = 0.35
    hardest_scale: float = 64.0
    global_batch: bool = True             # all-gather embeddings across the dp axis


@dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 32
    epochs: int = 16
    learning_rate: float = 1e-3
    lr_scheduler: str = "exponential"     # exponential|step
    lr_gamma: float = 1.0
    lr_step: int = 10
    optimizer: str = "adam"
    seed: int = 0

    # Fine-stage specifics (training/fine.py:220-235, args.py:29-31).
    offset_lambda: float = 5.0
    warmup_epochs: int = 3
    warmup_lr: float = 1e-5
    pmc_prob: float = 0.0
    pmc_threshold: float = 0.4
    pmc_count_threshold: int = 1

    # Augmentation (training/coarse.py:186-201).
    shuffle_hints: bool = True
    flip_poses: bool = True               # coarse stage
    # The reference FINE recipe trains WITHOUT flips (training/fine.py:168
    # constructs its dataset with flip_pose=False). A 400-step full-size
    # on-chip A/B (scripts/probe_fine_flip.py, BENCHMARKS.md) measured
    # BETTER held-out pose error WITH flips (0.2227 vs 0.2419; worse train
    # fit 0.214 vs 0.165 — classic augmentation), so the default keeps them;
    # set False (CLI --fine_flip_poses off) for the exact reference recipe.
    fine_flip_poses: bool = True
    pc_augment: bool = True               # random z-rotation + normalize-scale
    sample_close_cell: bool = False       # positive = any cell within
                                          # cell_size/2 (cells.py:69-74)

    top_k: Tuple[int, ...] = (1, 3, 5)
    loss: LossConfig = field(default_factory=LossConfig)


@dataclass(frozen=True)
class EvalConfig:
    """End-to-end evaluation protocol (evaluation/args.py:20-23)."""

    top_k: Tuple[int, ...] = (1, 3, 5, 10)
    threshs: Tuple[float, ...] = (5.0, 10.0, 15.0)
    batch_size: int = 32
    use_test_set: bool = False
    # Opt-in: encode eval queries via the precomputed [V, D] sentence table
    # (float-tolerance equal to the full text trunk; wins when Q*S >> V).
    sentence_table: bool = False


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for pjit/shard_map parallelism.

    The reference has no distributed capability (SURVEY.md section 2.6); this
    is the TPU-native layer. `dp` shards the global batch, `gallery` shards the
    cell-embedding database for retrieval.
    """

    dp: int = -1                          # -1: all available devices
    axis_name: str = "dp"


@dataclass(frozen=True)
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    base_path: str = ""                   # KITTI360Pose root (pickles) or array dir
    checkpoint_dir: str = "./checkpoints"

    def validate(self) -> "Config":
        assert self.train.loss.ranking_loss in (
            "contrastive",
            "pairwise",
            "hardest",
            "triplet",
        )
        for feat in self.model.use_features:
            assert feat in ("class", "color", "position", "num"), feat
        assert self.train.lr_scheduler in ("exponential", "step")
        assert self.model.pointnet.features_level in (0, 1, 2)
        return self

    def replace(self, **kwargs) -> "Config":
        return dataclasses.replace(self, **kwargs)


def small_test_config() -> Config:
    """A tiny configuration for unit tests and CPU smoke runs."""
    pn = PointNetConfig(
        num_points=16,
        sa_num_points=(8, 4, 2),
        sa_mlps=((6, 8, 16), (19, 16, 32), (35, 32, 32)),
        sa_max_neighbors=4,
        global_mlp=(35, 32, 64),
        head_dims=(48, 32),
    )
    model = ModelConfig(
        coarse_embed_dim=32,
        fine_embed_dim=16,
        object_size=8,
        pad_size=6,
        num_mentioned=3,
        text_embed_dim=64,
        max_hint_tokens=8,
        object_inter_num_layers=1,
        fine_num_decoder_layers=2,
        dtype="float32",
        pointnet=pn,
    )
    train = TrainConfig(batch_size=4, epochs=1, top_k=(1, 2))
    return Config(model=model, train=train).validate()
