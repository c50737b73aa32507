"""Pretrained-PointNet checkpoint conversion.

torch_geometric isn't available (and isn't wanted), so this builds a torch
state dict with the reference PointNet2's exact key layout
(/root/reference/models/pointcloud/pointnet2.py:52-78: sa{i}.point_conv.
local_nn get_mlp stacks, ga.nn, lin1/lin2, classifiers) and checks that the
converted trees load into our PointNet2 and run.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from text2loc_tpu import constants as C  # noqa: E402
from text2loc_tpu.config import PointNetConfig  # noqa: E402
from text2loc_tpu.models import torch_convert as tc  # noqa: E402
from text2loc_tpu.models.pointnet2 import PointNet2  # noqa: E402


def _mlp_state(prefix, channels, sd):
    for i in range(len(channels) - 1):
        lin = torch.nn.Linear(channels[i], channels[i + 1])
        bn = torch.nn.BatchNorm1d(channels[i + 1])
        with torch.no_grad():
            bn.running_mean.uniform_(-0.1, 0.1)
            bn.running_var.uniform_(0.9, 1.1)
        for k, v in lin.state_dict().items():
            sd[f"{prefix}.{3 * i}.{k}"] = v
        for k, v in bn.state_dict().items():
            sd[f"{prefix}.{3 * i + 1}.{k}"] = v


def test_pointnet_checkpoint_round_trip():
    cfg = PointNetConfig(
        num_points=16,
        sa_num_points=(8, 4, 2),
        sa_mlps=((6, 8, 16), (19, 16, 32), (35, 32, 32)),
        sa_max_neighbors=4,
        global_mlp=(35, 32, 64),
        head_dims=(48, 32),
    )
    torch.manual_seed(0)
    sd = {}
    for i, ch in enumerate(cfg.sa_mlps, start=1):
        _mlp_state(f"sa{i}.point_conv.local_nn", ch, sd)
    _mlp_state("ga.nn", cfg.global_mlp, sd)
    for name, (i, o) in {
        "lin1": (cfg.global_mlp[-1], cfg.head_dims[0]),
        "lin2": (cfg.head_dims[0], cfg.head_dims[1]),
        "class_classifier": (cfg.head_dims[1], C.NUM_CLASSES),
        "color_classifier": (cfg.head_dims[1], C.NUM_COLORS),
    }.items():
        for k, v in torch.nn.Linear(i, o).state_dict().items():
            sd[f"{name}.{k}"] = v

    params, stats = tc.convert_pointnet_checkpoint(tc.to_numpy(sd))

    model = PointNet2(cfg, num_classes=C.NUM_CLASSES, num_colors=C.NUM_COLORS)
    xyz = jnp.asarray(np.random.default_rng(0).random((4, 16, 3)), jnp.float32)
    rgb = jnp.asarray(np.random.default_rng(1).random((4, 16, 3)), jnp.float32)
    # Structural check: converted trees must match the model's own init and
    # produce a working forward.
    ref = model.init(jax.random.PRNGKey(0), xyz, rgb, train=False)
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref["params"])
    got_shapes = jax.tree_util.tree_map(lambda a: np.asarray(a).shape, params)
    assert ref_shapes == got_shapes

    out = model.apply(
        {"params": params, "batch_stats": stats}, xyz, rgb, train=False
    )
    assert out.features2.shape == (4, cfg.head_dims[1])
    assert np.isfinite(np.asarray(out.features2)).all()
