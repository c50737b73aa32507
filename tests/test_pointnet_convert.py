"""Pretrained-PointNet checkpoint conversion.

torch_geometric isn't available (and isn't wanted), so this builds a torch
state dict with the reference PointNet2's exact key layout
(/root/reference/models/pointcloud/pointnet2.py:52-78: sa{i}.point_conv.
local_nn get_mlp stacks, ga.mlp, lin1/lin2, classifiers) and checks that the
converted trees load into our PointNet2 and run.

The reference's get_mlp builds a Sequential of per-layer
Sequential(Linear, BN, ReLU) (language_encoder.py:16-41), so the published
checkpoint's keys are NESTED (`...local_nn.0.0.weight`). Both that layout and
a flat Sequential are covered.
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


def _mlp_state(prefix, channels, sd, nested):
    for i in range(len(channels) - 1):
        lin = torch.nn.Linear(channels[i], channels[i + 1])
        bn = torch.nn.BatchNorm1d(channels[i + 1])
        with torch.no_grad():
            bn.running_mean.uniform_(-0.1, 0.1)
            bn.running_var.uniform_(0.9, 1.1)
        lin_key = f"{prefix}.{i}.0" if nested else f"{prefix}.{3 * i}"
        bn_key = f"{prefix}.{i}.1" if nested else f"{prefix}.{3 * i + 1}"
        for k, v in lin.state_dict().items():
            sd[f"{lin_key}.{k}"] = v
        for k, v in bn.state_dict().items():
            sd[f"{bn_key}.{k}"] = v


def _pointnet_cfg():
    return PointNetConfig(
        num_points=16,
        sa_num_points=(8, 4, 2),
        sa_mlps=((6, 8, 16), (19, 16, 32), (35, 32, 32)),
        sa_max_neighbors=4,
        global_mlp=(35, 32, 64),
        head_dims=(48, 32),
    )


def make_pointnet_state_dict(cfg, nested=True, ga_attr="mlp", seed=0):
    """A state dict mirroring the published pointnet_acc0.86 checkpoint's
    key layout (reference pointnet2.py attribute names)."""
    torch.manual_seed(seed)
    sd = {}
    for i, ch in enumerate(cfg.sa_mlps, start=1):
        _mlp_state(f"sa{i}.point_conv.local_nn", ch, sd, nested)
    _mlp_state(f"ga.{ga_attr}", cfg.global_mlp, sd, nested)
    for name, (i, o) in {
        "lin1": (cfg.global_mlp[-1], cfg.head_dims[0]),
        "lin2": (cfg.head_dims[0], cfg.head_dims[1]),
        "class_classifier": (cfg.head_dims[1], C.NUM_CLASSES),
        "color_classifier": (cfg.head_dims[1], C.NUM_COLORS),
    }.items():
        for k, v in torch.nn.Linear(i, o).state_dict().items():
            sd[f"{name}.{k}"] = v
    return sd


@pytest.mark.parametrize(
    "nested,ga_attr",
    [(True, "mlp"), (False, "nn")],
    ids=["nested-reference-layout", "flat-legacy-layout"],
)
def test_pointnet_checkpoint_round_trip(nested, ga_attr):
    cfg = _pointnet_cfg()
    sd = make_pointnet_state_dict(cfg, nested=nested, ga_attr=ga_attr)

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


def test_nested_and_flat_layouts_convert_identically():
    """Same weights in both layouts must produce identical trees."""
    cfg = _pointnet_cfg()
    nested = make_pointnet_state_dict(cfg, nested=True, ga_attr="mlp", seed=3)
    flat = {}
    for k, v in nested.items():
        if k.startswith(("sa", "ga")):
            # nested `...{i}.{0|1}.param` -> flat `...{3i+j}.param`
            parts = k.split(".")
            i, j = int(parts[-3]), int(parts[-2])
            flat[".".join(parts[:-3] + [str(3 * i + j), parts[-1]])] = v
        else:
            flat[k] = v  # linear heads have no layout difference

    p1, s1 = tc.convert_pointnet_checkpoint(tc.to_numpy(nested))
    p2, s2 = tc.convert_pointnet_checkpoint(tc.to_numpy(flat))
    jax.tree_util.tree_map(np.testing.assert_array_equal, p1, p2)
    jax.tree_util.tree_map(np.testing.assert_array_equal, s1, s2)


def test_load_pretrained_pointnet_grafts_into_tower(tmp_path):
    """Trainer flow: --pointnet_ckpt grafts the published PointNet weights
    into the object tower's param tree (reference object_encoder.py:47-50),
    leaving every other parameter untouched."""
    import functools

    from text2loc_tpu.config import small_test_config
    from text2loc_tpu.data.arrays import MultiSceneArrays
    from text2loc_tpu.data.synthetic import make_scene
    from text2loc_tpu.models.cell_retrieval import CellRetrievalNetwork
    from text2loc_tpu.models.text_embedding import HintTextEmbedder
    from text2loc_tpu.training import steps as steps_lib

    cfg = small_test_config()
    sd = make_pointnet_state_dict(cfg.model.pointnet, nested=True)
    path = tmp_path / "pointnet.pth"
    torch.save(sd, path)

    data = MultiSceneArrays([
        make_scene("0000", num_cells=4, num_poses=8,
                   object_slots=cfg.model.object_size,
                   num_points=cfg.model.pointnet.num_points,
                   num_mentioned=cfg.model.num_mentioned, seed=0)
    ])
    model = CellRetrievalNetwork(cfg.model)
    emb = HintTextEmbedder.compositional(
        cfg.model.text_embed_dim, cfg.model.max_hint_tokens
    )
    rng = jax.random.PRNGKey(0)
    opt = steps_lib.make_optimizer(cfg, steps_per_epoch=1)
    b = data.gather_coarse(np.arange(cfg.train.batch_size),
                           cfg.model.object_size)
    objects, text = steps_lib.prepare_coarse_batch(b, emb, cfg, rng,
                                                   train=False)
    state = steps_lib.init_train_state(model, opt, rng, objects, text)

    p, s = tc.load_pretrained_pointnet(state.params, state.batch_stats,
                                       str(path))
    want_p, want_s = tc.convert_pointnet_checkpoint(tc.to_numpy(sd))
    got = p["object_encoder"]["pointnet"]
    flat_w = jax.tree_util.tree_leaves(want_p)
    flat_g = jax.tree_util.tree_leaves(got)
    assert len(flat_w) == len(flat_g)
    for a, c in zip(flat_w, flat_g):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    # Every non-pointnet parameter is untouched.
    def drop_pn(t):
        t = dict(t)
        oe = dict(t["object_encoder"])
        oe.pop("pointnet")
        t["object_encoder"] = oe
        return t
    for a, c in zip(jax.tree_util.tree_leaves(drop_pn(state.params)),
                    jax.tree_util.tree_leaves(drop_pn(p))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))

    # CLI surface: both trainers expose --pointnet_ckpt.
    from text2loc_tpu.training.coarse import build_argparser

    args = build_argparser().parse_args(
        ["--synthetic", "--pointnet_ckpt", str(path)]
    )
    assert args.pointnet_ckpt == str(path)
