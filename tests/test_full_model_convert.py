"""Full-model checkpoint conversion: published-.pth-shaped towers -> ours.

The reference's eval entry points load whole-model torch checkpoints
(/root/reference/evaluation/pipeline.py:245-267). torch_geometric and T5 are
not available here, so these tests rebuild reference-SHAPED torch towers
(same attribute names -> same state_dict keys, same forward semantics) on the
class-embedding path (`class_embed=True`, reference object_encoder.py:31-37,
which sidesteps the PyG PointNet; PointNet conversion itself is covered by
test_pointnet_convert.py), convert their state_dicts with
models/torch_convert.convert_{cell_retrieval,cross_matcher}_checkpoint, and
assert forward equality of the full towers.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from text2loc_tpu import constants as C  # noqa: E402
from text2loc_tpu.config import ModelConfig, PointNetConfig  # noqa: E402
from text2loc_tpu.data.batch import ObjectSet, TextSet  # noqa: E402
from text2loc_tpu.models import torch_convert as tc  # noqa: E402
from text2loc_tpu.models.cell_retrieval import CellRetrievalNetwork  # noqa: E402
from text2loc_tpu.models.cross_matcher import CrossMatch  # noqa: E402

B, O, S, T, E = 3, 5, 2, 4, 32        # batch, objects, hints, tokens, T5 dim
DC, DF = 32, 16                        # coarse / fine embed dims


# --- the reference's MLP factories (language_encoder.py:16-74,
# cross_matcher.py:17-36), verbatim semantics -----------------------------


def ref_get_mlp(channels):
    return tnn.Sequential(*[
        tnn.Sequential(
            tnn.Linear(channels[i - 1], channels[i]),
            tnn.BatchNorm1d(channels[i]),
            tnn.ReLU(),
        )
        for i in range(1, len(channels))
    ])


def ref_get_mlp2(channels):
    mods = []
    for i in range(1, len(channels)):
        if i < len(channels) - 1:
            mods.append(tnn.Sequential(
                tnn.Linear(channels[i - 1], channels[i]),
                tnn.BatchNorm1d(channels[i]), tnn.ReLU(),
            ))
        else:
            mods.append(tnn.Sequential(
                tnn.Linear(channels[i - 1], channels[i]),
                tnn.BatchNorm1d(channels[i]),
            ))
    return tnn.Sequential(*mods)


def ref_get_mlp_offset(dims):
    mlp = []
    for i in range(len(dims) - 1):
        mlp.append(tnn.Linear(dims[i], dims[i + 1]))
        if i < len(dims) - 2:
            mlp.append(tnn.ReLU())
    return tnn.Sequential(*mlp)


# --- reference-shaped towers (attribute names define state_dict keys) ----


class RefObjectEncoder(tnn.Module):
    """object_encoder.py:26-64 on the class-embedding path."""

    def __init__(self, embed_dim):
        super().__init__()
        self.class_embedding = tnn.Embedding(C.NUM_CLASSES + 1, embed_dim, padding_idx=0)
        self.color_encoder = ref_get_mlp([3, 64, embed_dim])
        self.pos_encoder = ref_get_mlp([3, 64, embed_dim])
        self.num_encoder = ref_get_mlp([1, 64, embed_dim])
        self.mlp_merge = ref_get_mlp([4 * embed_dim, embed_dim])
        # The reference looks classes up BY LABEL through known_classes =
        # {c: i+1 for c in np.unique(labels)} (object_encoder.py:31-33,81)
        # — i.e. rows are ordered alphabetically, NOT in CLASS_TO_INDEX
        # order. This LUT translates our class_idx input into the
        # reference's row index so the fixture exercises the real layout
        # (a fixture that indexed class_idx+1 directly would 'pass' even
        # with a row-shuffling conversion bug).
        self._class_lut = torch.tensor(
            [C.KNOWN_CLASSES.index(C.INDEX_TO_CLASS[j]) + 1
             for j in range(C.NUM_CLASSES)]
        )

    def forward(self, class_idx, colors, centers, nums):
        e = [
            tF.normalize(self.class_embedding(self._class_lut[class_idx]), dim=-1),
            tF.normalize(self.color_encoder(colors), dim=-1),
            tF.normalize(self.pos_encoder(centers), dim=-1),
            tF.normalize(
                self.num_encoder((nums - C.NUM_POINTS_MEAN) / C.NUM_POINTS_STD),
                dim=-1,
            ),
        ]
        return self.mlp_merge(torch.cat(e, dim=-1))


class RefLanguageEncoder(tnn.Module):
    """language_encoder.py:76-148 minus the frozen T5 (token embeds given)."""

    def __init__(self, input_dim, embed_dim, intra_layers, intra_heads,
                 is_fine, inter_layers=0, inter_heads=4):
        super().__init__()
        self.is_fine = is_fine
        self.intra_module = tnn.ModuleList([
            tnn.TransformerEncoderLayer(input_dim, intra_heads,
                                        dim_feedforward=input_dim * 4)
            for _ in range(intra_layers)
        ])
        self.inter_mlp = ref_get_mlp2([input_dim, embed_dim])
        if not is_fine:
            self.inter_module = tnn.ModuleList([
                tnn.TransformerEncoderLayer(embed_dim, inter_heads,
                                            dim_feedforward=embed_dim * 4)
                for _ in range(inter_layers)
            ])

    def forward(self, token_embeds):                 # [B, S, T, E]
        b, s, t, e = token_embeds.shape
        x = token_embeds.reshape(b * s, t, e).permute(1, 0, 2)  # seq-first
        for layer in self.intra_module:
            x = layer(x)
        x = x.permute(1, 0, 2).max(dim=1)[0]
        x = self.inter_mlp(x)
        x = x.view(b, s, -1)
        if self.is_fine:
            return x
        x = x.permute(1, 0, 2)
        for layer in self.inter_module:
            x = x + layer(x)                          # the += quirk (:145)
        return x.max(dim=0)[0]


class RefCellRetrieval(tnn.Module):
    """cell_retrieval.py:13-108 (dense full-mask inputs)."""

    def __init__(self):
        super().__init__()
        self.object_encoder = RefObjectEncoder(DC)
        self.obj_inter_module = tnn.ModuleList([
            tnn.TransformerEncoderLayer(DC, 4, dim_feedforward=2 * DC)
            for _ in range(2)
        ])
        self.language_encoder = RefLanguageEncoder(
            E, DC, intra_layers=1, intra_heads=4, is_fine=False,
            inter_layers=1, inter_heads=4,
        )

    def encode_text(self, token_embeds):
        return tF.normalize(self.language_encoder(token_embeds))

    def encode_objects(self, class_idx, colors, centers, nums):
        b, o = class_idx.shape
        emb = self.object_encoder(
            class_idx.reshape(-1), colors.reshape(-1, 3),
            centers.reshape(-1, 3), nums.reshape(-1, 1),
        )
        emb = tF.normalize(emb, dim=-1)
        x = emb.view(b, o, DC).permute(1, 0, 2)       # seq-first
        for layer in self.obj_inter_module:
            x = layer(x)
        return tF.normalize(x.max(dim=0)[0])


class RefCrossMatch(tnn.Module):
    """cross_matcher.py:39-129."""

    def __init__(self):
        super().__init__()
        self.object_encoder = RefObjectEncoder(DF)
        self.language_encoder = RefLanguageEncoder(
            E, DF, intra_layers=1, intra_heads=4, is_fine=True,
        )
        self.mlp_offsets = ref_get_mlp_offset([DF, DF // 2, 2])
        self.cross_hints = tnn.ModuleList([
            tnn.TransformerDecoderLayer(d_model=DF, nhead=4,
                                        dim_feedforward=DF * 4)
            for _ in range(2)
        ])
        self.cross_objects = tnn.ModuleList([
            tnn.TransformerDecoderLayer(d_model=DF, nhead=4,
                                        dim_feedforward=DF * 4)
            for _ in range(2)
        ])

    def forward(self, class_idx, colors, centers, nums, token_embeds):
        b, o = class_idx.shape
        hints = self.language_encoder(token_embeds)   # [B, S, D]
        obj = self.object_encoder(
            class_idx.reshape(-1), colors.reshape(-1, 3),
            centers.reshape(-1, 3), nums.reshape(-1, 1),
        ).reshape(b, o, DF)
        obj = tF.normalize(obj, dim=-1)
        desc0 = obj.transpose(0, 1)
        desc1 = hints.transpose(0, 1)
        for i in range(len(self.cross_hints)):
            desc0 = self.cross_objects[i](desc0, desc1)
            desc1 = self.cross_hints[i](desc1, desc0)
        return self.mlp_offsets(desc1.max(dim=0)[0])


# --- shared fixtures ------------------------------------------------------


def _randomize_bn(module):
    with torch.no_grad():
        for m in module.modules():
            if isinstance(m, tnn.BatchNorm1d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.7, 1.3)


def _model_cfg():
    return ModelConfig(
        coarse_embed_dim=DC, fine_embed_dim=DF, class_embed=True,
        object_size=O, pad_size=O, num_mentioned=S,
        text_embed_dim=E, max_hint_tokens=T,
        intra_num_layers=1, inter_num_layers=1, fine_intra_num_layers=1,
        object_inter_num_layers=2, fine_num_decoder_layers=2,
        dtype="float32", pointnet=PointNetConfig(),
    )


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    class_idx = rng.integers(0, C.NUM_CLASSES, (B, O)).astype(np.int32)
    colors = rng.random((B, O, 3)).astype(np.float32)
    centers = rng.random((B, O, 3)).astype(np.float32)
    nums = rng.integers(10, 5000, (B, O)).astype(np.float32)
    tokens = rng.normal(size=(B, S, T, E)).astype(np.float32)
    objects = ObjectSet(
        xyz=jnp.zeros((B, O, 4, 3), jnp.float32),
        rgb=jnp.zeros((B, O, 4, 3), jnp.float32),
        center=jnp.asarray(centers),
        color=jnp.asarray(colors),
        num_points=jnp.asarray(nums),
        class_idx=jnp.asarray(class_idx),
        color_idx=jnp.zeros((B, O), jnp.int32),
        mask=jnp.ones((B, O), bool),
    )
    text = TextSet(
        token_embeds=jnp.asarray(tokens),
        token_mask=jnp.ones((B, S, T), bool),
        sentence_mask=jnp.ones((B, S), bool),
    )
    return class_idx, colors, centers, nums, tokens, objects, text


def _assert_tree_match(converted, init_tree, what):
    got = jax.tree_util.tree_map(lambda a: np.asarray(a).shape, converted)
    want = jax.tree_util.tree_map(lambda a: np.asarray(a).shape, init_tree)
    assert got == want, f"{what} tree mismatch"


@pytest.mark.slow
def test_cell_retrieval_checkpoint_round_trip():
    torch.manual_seed(0)
    ref = RefCellRetrieval().eval()
    _randomize_bn(ref)
    class_idx, colors, centers, nums, tokens, objects, text = _inputs()
    with torch.no_grad():
        want_cell = ref.encode_objects(
            torch.as_tensor(class_idx, dtype=torch.long),
            torch.as_tensor(colors), torch.as_tensor(centers),
            torch.as_tensor(nums),
        ).numpy()
        want_text = ref.encode_text(torch.as_tensor(tokens)).numpy()

    cfg = _model_cfg()
    params, stats = tc.convert_cell_retrieval_checkpoint(
        tc.to_numpy(ref.state_dict()), cfg
    )

    model = CellRetrievalNetwork(cfg)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, objects, text, train=False)
    _assert_tree_match(params, variables["params"], "params")
    _assert_tree_match(stats, variables.get("batch_stats", {}), "batch_stats")

    got_cell, got_text = model.apply(
        {"params": params, "batch_stats": stats}, objects, text, train=False
    )
    np.testing.assert_allclose(np.asarray(got_cell), want_cell, atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_text), want_text, atol=1e-4, rtol=1e-3)


@pytest.mark.slow
def test_cross_matcher_checkpoint_round_trip():
    torch.manual_seed(1)
    ref = RefCrossMatch().eval()
    _randomize_bn(ref)
    class_idx, colors, centers, nums, tokens, objects, text = _inputs(seed=1)
    with torch.no_grad():
        want = ref(
            torch.as_tensor(class_idx, dtype=torch.long),
            torch.as_tensor(colors), torch.as_tensor(centers),
            torch.as_tensor(nums), torch.as_tensor(tokens),
        ).numpy()

    cfg = _model_cfg()
    params, stats = tc.convert_cross_matcher_checkpoint(
        tc.to_numpy(ref.state_dict()), cfg
    )

    model = CrossMatch(cfg)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, objects, text, train=False)
    _assert_tree_match(params, variables["params"], "params")
    _assert_tree_match(stats, variables.get("batch_stats", {}), "batch_stats")

    got = model.apply(
        {"params": params, "batch_stats": stats}, objects, text, train=False
    )
    assert got.shape == (B, 2)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-3)


def test_graft_preserves_uncovered_subtrees():
    """strict=False semantics: grafting keeps initialized values for anything
    the checkpoint lacks and overwrites everything it has."""
    base = {"a": {"x": np.zeros(2), "y": np.ones(3)}, "b": np.zeros(4)}
    new = {"a": {"x": np.full(2, 7.0)}}
    out = tc._graft(base, new)
    np.testing.assert_array_equal(out["a"]["x"], np.full(2, 7.0))
    np.testing.assert_array_equal(out["a"]["y"], np.ones(3))
    np.testing.assert_array_equal(out["b"], np.zeros(4))


def make_reference_coarse_state_dict(mcfg):
    """A reference-shaped coarse tower's state_dict at arbitrary ModelConfig
    dims (class_embed path — mcfg.class_embed must be True)."""
    assert mcfg.class_embed

    class Tower(tnn.Module):
        def __init__(self):
            super().__init__()
            self.object_encoder = RefObjectEncoder(mcfg.coarse_embed_dim)
            self.obj_inter_module = tnn.ModuleList([
                tnn.TransformerEncoderLayer(
                    mcfg.coarse_embed_dim, mcfg.object_inter_num_heads,
                    dim_feedforward=2 * mcfg.coarse_embed_dim)
                for _ in range(mcfg.object_inter_num_layers)
            ])
            self.language_encoder = RefLanguageEncoder(
                mcfg.text_embed_dim, mcfg.coarse_embed_dim,
                intra_layers=mcfg.intra_num_layers,
                intra_heads=mcfg.intra_num_heads, is_fine=False,
                inter_layers=mcfg.inter_num_layers,
                inter_heads=mcfg.inter_num_heads,
            )

    tower = Tower()
    _randomize_bn(tower)
    return tower.state_dict()


@pytest.mark.slow
def test_convert_checkpoint_cli_round_trip(tmp_path):
    """scripts/convert_checkpoint.py: published .pth -> Orbax checkpoint that
    restores into a fresh state with the converted weights."""
    import importlib.util
    import os

    from text2loc_tpu.config import Config
    from text2loc_tpu.data.arrays import MultiSceneArrays
    from text2loc_tpu.data.synthetic import make_scene
    from text2loc_tpu.evaluation.cli import _init_coarse_state, _restore_torch
    from text2loc_tpu.models.text_embedding import make_embedder
    from text2loc_tpu.utils.checkpoint import CheckpointManager

    mcfg = _model_cfg()
    sd = make_reference_coarse_state_dict(mcfg)
    pth = tmp_path / "coarse.pth"
    torch.save(sd, pth)

    # Run the script's main() directly (scripts/ is not a package).
    spec = importlib.util.spec_from_file_location(
        "convert_checkpoint",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "convert_checkpoint.py"),
    )
    script = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(script)
    base = ModelConfig()
    overrides = [
        f"{f}={getattr(mcfg, f)}"
        for f in ("coarse_embed_dim", "fine_embed_dim", "class_embed",
                  "object_size", "pad_size", "num_mentioned",
                  "text_embed_dim", "max_hint_tokens",
                  "object_inter_num_layers", "fine_num_decoder_layers",
                  "dtype")
        if getattr(mcfg, f) != getattr(base, f)
    ]
    out = tmp_path / "ckpt"
    argv = ["--kind", "coarse", "--torch_ckpt", str(pth), "--out", str(out)]
    for o in overrides:
        argv += ["--override", o]
    script.main(argv)

    cfg = Config().validate()
    cfg = cfg.replace(model=script.apply_model_overrides(cfg.model, overrides))
    cfg, embedder = make_embedder(cfg, None)
    data = MultiSceneArrays([
        make_scene("0000", num_cells=4, num_poses=4,
                   object_slots=max(cfg.model.object_size, cfg.model.pad_size),
                   num_points=cfg.model.pointnet.num_points,
                   num_mentioned=cfg.model.num_mentioned, seed=0)
    ])
    model = CellRetrievalNetwork(cfg.model)
    fresh = _init_coarse_state(cfg, model, embedder, data)
    mgr = CheckpointManager(str(out))
    restored = mgr.restore(fresh)
    mgr.close()
    want = _restore_torch(str(pth), fresh, cfg, "coarse")
    for a, b in zip(jax.tree_util.tree_leaves(want.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_color_embedding_conversion_reproduces_reference_name_mapping():
    """convert_object_encoder's color_embed table must reproduce the
    reference's NAME-keyed lookup: known_colors = {c: i for i, c in
    enumerate(COLOR_NAMES)} (+ <unk>: 0), used WITHOUT +1
    (object_encoder.py:35-37,83). The duplicate "gray" makes centroid 1
    resolve to row 4 (row 1 is unreachable/untrained), and "dark-green"
    shares the frozen padding row 0 with <unk>."""
    import dataclasses

    from text2loc_tpu.models.torch_convert import convert_object_encoder

    d = 16
    rng = np.random.default_rng(0)
    # Reference table: one row per unique name + <unk> (7 + 1 = 8 rows).
    ref_w = rng.standard_normal((8, d)).astype(np.float32)
    sd = {"color_embedding.weight": ref_w}
    mcfg = dataclasses.replace(
        ModelConfig(), use_features=("color",), color_embed=True
    )
    params, _ = convert_object_encoder(sd, "", mcfg)
    tbl = params["color_embedding"]["embedding"]
    assert tbl.shape == (C.NUM_COLORS + 1, d)
    ref_idx = {}
    for i, name in enumerate(C.COLOR_NAMES):
        ref_idx[name] = i                       # later duplicate wins
    for j, name in enumerate(C.COLOR_NAMES):
        np.testing.assert_array_equal(tbl[j + 1], ref_w[ref_idx[name]],
                                      err_msg=f"centroid {j} ({name})")
    # The collision cases specifically:
    np.testing.assert_array_equal(tbl[2], ref_w[4])   # centroid 1 "gray"
    np.testing.assert_array_equal(tbl[1], ref_w[0])   # "dark-green" == <unk> row
