"""Serving API: gallery held on device, batched text->position queries."""

import jax
import pytest

import numpy as np

from text2loc_tpu.models.cell_retrieval import CellRetrievalNetwork
from text2loc_tpu.models.cross_matcher import CrossMatch
from text2loc_tpu.parallel import make_mesh
from text2loc_tpu.serving import Localizer
from text2loc_tpu.training import steps


def _states(cfg, embedder, data):
    rng = jax.random.PRNGKey(0)
    opt = steps.make_optimizer(cfg, 1)
    coarse_model = CellRetrievalNetwork(cfg.model)
    cb = data.gather_coarse(np.arange(4), cfg.model.object_size)
    cobj, ctext = steps.prepare_coarse_batch(cb, embedder, cfg, rng, train=False)
    coarse_state = steps.init_train_state(coarse_model, opt, rng, cobj, ctext)

    fine_model = CrossMatch(cfg.model)
    fb = data.gather_fine(np.arange(4), cfg.model.pad_size)
    pfb = steps.prepare_fine_batch(fb, embedder, cfg, rng, train=False)
    fine_state = steps.init_train_state(fine_model, opt, rng, pfb.objects, pfb.text)
    return coarse_state, coarse_model, fine_state, fine_model


def test_localizer_roundtrip(small_cfg, small_embedder, small_data):
    cfg, data, embedder = small_cfg, small_data, small_embedder
    cs, cm, fs, fm = _states(cfg, embedder, data)
    loc = Localizer(data, cs, cm, fs, fm, embedder, cfg, top_k=3)

    q = np.arange(5)
    res = loc.localize(data.hint_dir[q], data.hint_color[q], data.hint_label[q])
    assert res.position_w.shape == (5, 2)
    assert res.candidates_w.shape == (5, 3, 2)
    assert res.cell_indices.shape == (5, 3)
    # Candidate positions land inside (or near) their cells' bboxes.
    bbox = data.cell_bbox[res.cell_indices]
    margin = 15.0
    assert (res.candidates_w[..., 0] >= bbox[..., 0] - margin).all()
    assert (res.candidates_w[..., 0] <= bbox[..., 3] + margin).all()
    # Scores sorted descending per query.
    assert (np.diff(res.scores, axis=1) <= 1e-6).all()

    # States are frozen: reassignment would desync the precomputed caches,
    # so it must fail loudly (ADVICE r2).
    import pytest

    with pytest.raises(AttributeError):
        loc.coarse_state = cs
    with pytest.raises(AttributeError):
        loc.fine_state = fs


def test_localizer_batch_bucketing(small_cfg, small_embedder, small_data):
    """Odd batch sizes pad to power-of-two buckets (one compile per bucket)
    and slice back; results equal the bucket-sized call's prefix."""
    cfg, data, embedder = small_cfg, small_data, small_embedder
    cs, cm, fs, fm = _states(cfg, embedder, data)
    loc = Localizer(data, cs, cm, fs, fm, embedder, cfg, top_k=3)

    full = loc.localize(data.hint_dir[:8], data.hint_color[:8], data.hint_label[:8])
    odd = loc.localize(data.hint_dir[:5], data.hint_color[:5], data.hint_label[:5])
    assert odd.position_w.shape == (5, 2)
    np.testing.assert_allclose(odd.position_w, full.position_w[:5], atol=1e-5)
    np.testing.assert_array_equal(odd.cell_indices, full.cell_indices[:5])
    one = loc.localize(data.hint_dir[:1], data.hint_color[:1], data.hint_label[:1])
    assert one.position_w.shape == (1, 2)


def test_localizer_precomputed_fine_gallery_equals_recompute(
    small_cfg, small_embedder, small_data
):
    """The cached per-cell fine embeddings must reproduce the recompute path
    exactly (query-independent object tower, eval-mode BN)."""
    cfg, data, embedder = small_cfg, small_data, small_embedder
    cs, cm, fs, fm = _states(cfg, embedder, data)
    cached = Localizer(data, cs, cm, fs, fm, embedder, cfg, top_k=3)
    raw = Localizer(data, cs, cm, fs, fm, embedder, cfg, top_k=3,
                    precompute_fine=False)

    q = np.arange(5)
    a = cached.localize(data.hint_dir[q], data.hint_color[q], data.hint_label[q])
    b = raw.localize(data.hint_dir[q], data.hint_color[q], data.hint_label[q])
    np.testing.assert_array_equal(a.cell_indices, b.cell_indices)
    np.testing.assert_allclose(a.candidates_w, b.candidates_w, atol=1e-4)


def test_localizer_sharded_gallery(small_cfg, small_embedder, small_data):
    """Sharded one-program serve (per-shard top-k + per-shard CCT on the
    local fine cache + ICI candidate merge) equals the dense fused path."""
    cfg, data, embedder = small_cfg, small_data, small_embedder
    cs, cm, fs, fm = _states(cfg, embedder, data)
    dense = Localizer(data, cs, cm, fs, fm, embedder, cfg, top_k=3)
    mesh = make_mesh(8)
    sharded = Localizer(data, cs, cm, fs, fm, embedder, cfg, top_k=3, mesh=mesh)
    assert sharded._serve is not None  # the fused sharded program built

    q = np.arange(4)
    a = dense.localize(data.hint_dir[q], data.hint_color[q], data.hint_label[q])
    b = sharded.localize(data.hint_dir[q], data.hint_color[q], data.hint_label[q])
    np.testing.assert_array_equal(a.cell_indices, b.cell_indices)
    np.testing.assert_allclose(a.position_w, b.position_w, atol=1e-5)
    np.testing.assert_allclose(a.candidates_w, b.candidates_w, atol=1e-5)
    np.testing.assert_allclose(a.scores, b.scores, atol=1e-5)


@pytest.mark.slow
def test_localizer_sharded_gallery_cityscale(small_cfg, small_embedder):
    """Sharded == dense at a CITY-SCALE gallery (VERDICT r4 #2): 4,096 cells
    over the 8-device virtual mesh — 512 gallery rows + fine-cache rows per
    shard, top-10 merged over the mesh. The small-C equality above can hide
    padding/merge bugs that only appear when every shard holds many cells
    and the candidate set spans shards."""
    from text2loc_tpu.data.arrays import MultiSceneArrays
    from text2loc_tpu.data.synthetic import make_scene

    cfg, embedder = small_cfg, small_embedder
    data = MultiSceneArrays([make_scene(
        "0000", num_cells=4096, num_poses=8,
        object_slots=cfg.model.object_size,
        num_points=cfg.model.pointnet.num_points,
        num_mentioned=cfg.model.num_mentioned, seed=3,
    )])
    cs, cm, fs, fm = _states(cfg, embedder, data)
    dense = Localizer(data, cs, cm, fs, fm, embedder, cfg, top_k=10)
    sharded = Localizer(data, cs, cm, fs, fm, embedder, cfg, top_k=10,
                        mesh=make_mesh(8))
    assert sharded._serve is not None
    assert dense._gallery.shape[0] == 4096

    q = np.arange(8)
    a = dense.localize(data.hint_dir[q], data.hint_color[q], data.hint_label[q])
    b = sharded.localize(data.hint_dir[q], data.hint_color[q],
                         data.hint_label[q])
    np.testing.assert_array_equal(a.cell_indices, b.cell_indices)
    np.testing.assert_allclose(a.position_w, b.position_w, atol=1e-4)
    np.testing.assert_allclose(a.candidates_w, b.candidates_w, atol=1e-4)
    np.testing.assert_allclose(a.scores, b.scores, atol=1e-5)
    # Candidates genuinely span shards (512 cells/shard -> shard id = idx//512).
    assert len(np.unique(a.cell_indices // 512)) > 1


def test_localizer_sharded_custom_axis_name(small_cfg, small_embedder,
                                            small_data):
    """A mesh with a non-default axis name must work on BOTH sharded paths
    (the fused serve and the no-fine-cache stepwise top-k, which once
    hardcoded 'dp')."""
    cfg, data, embedder = small_cfg, small_data, small_embedder
    cs, cm, fs, fm = _states(cfg, embedder, data)
    dense = Localizer(data, cs, cm, fs, fm, embedder, cfg, top_k=3)
    mesh = make_mesh(8, axis_name="gallery")
    q = np.arange(3)
    a = dense.localize(data.hint_dir[q], data.hint_color[q], data.hint_label[q])
    for precompute in (True, False):
        sharded = Localizer(data, cs, cm, fs, fm, embedder, cfg, top_k=3,
                            mesh=mesh, precompute_fine=precompute)
        b = sharded.localize(data.hint_dir[q], data.hint_color[q],
                             data.hint_label[q])
        np.testing.assert_array_equal(a.cell_indices, b.cell_indices)
        np.testing.assert_allclose(a.candidates_w, b.candidates_w, atol=1e-5)


def test_localizer_cache_upgrade_keeps_fine_cache(small_cfg, small_embedder,
                                                  small_data, tmp_path,
                                                  monkeypatch):
    """A precompute_fine=False construction that re-saves the cache (e.g. a
    missing-field upgrade) must carry the existing fine encodings through,
    not destroy them."""
    import os

    import text2loc_tpu.serving as serving_mod

    cfg, data, embedder = small_cfg, small_data, small_embedder
    cs, cm, fs, fm = _states(cfg, embedder, data)
    path = str(tmp_path / "gallery.npz")
    Localizer(data, cs, cm, fs, fm, embedder, cfg, top_k=3, cache_path=path)
    with np.load(path, allow_pickle=False) as f:
        assert "fine_emb1" in f.files

    # Strip the sentence tables to simulate an older cache; the next
    # construction must re-save (tables missing) WITHOUT losing fine_emb.
    with np.load(path, allow_pickle=False) as f:
        stripped = {k: f[k] for k in f.files
                    if not k.startswith(("coarse_sent", "fine_sent"))}
    with open(path, "wb") as fh:
        np.savez(fh, **stripped)
    Localizer(data, cs, cm, fs, fm, embedder, cfg, top_k=3,
              precompute_fine=False, cache_path=path)
    with np.load(path, allow_pickle=False) as f:
        assert "fine_emb1" in f.files and "coarse_sent_table" in f.files

    # And the carried encodings still serve: a warm full construction loads
    # everything with both encoders poisoned.
    def boom(*a, **k):
        raise AssertionError("cache miss: re-encoded")

    monkeypatch.setattr(serving_mod, "encode_gallery", boom)
    monkeypatch.setattr(serving_mod.steps_lib, "encode_fine_gallery", boom)
    monkeypatch.setattr(serving_mod.Localizer, "_build_sentence_tables", boom)
    warm = Localizer(data, cs, cm, fs, fm, embedder, cfg, top_k=3,
                     cache_path=path)
    q = np.arange(3)
    warm.localize(data.hint_dir[q], data.hint_color[q], data.hint_label[q])


def test_localizer_sharded_oov_equals_dense(small_cfg, small_embedder,
                                            small_data):
    """Out-of-vocabulary (embedded) batches through the SHARDED serve: the
    full-trunk branch inside the one-program serve must agree with dense."""
    from text2loc_tpu.models.t5_encoder import CompositionalOnlineEncoder
    from text2loc_tpu.text import render_description

    cfg, data, embedder = small_cfg, small_data, small_embedder
    cs, cm, fs, fm = _states(cfg, embedder, data)
    online = CompositionalOnlineEncoder(
        embed_dim=cfg.model.text_embed_dim,
        max_tokens=cfg.model.max_hint_tokens,
    )
    dense = Localizer(data, cs, cm, fs, fm, embedder, cfg, top_k=3,
                      online_encoder=online)
    sharded = Localizer(data, cs, cm, fs, fm, embedder, cfg, top_k=3,
                        mesh=make_mesh(8), online_encoder=online)

    oov = render_description(
        data.hint_dir[0][:2], data.hint_color[0][:2], data.hint_label[0][:2]
    ) + " Take me to the big glowing obelisk."
    a = dense.localize_text([oov])
    b = sharded.localize_text([oov])
    np.testing.assert_array_equal(a.cell_indices, b.cell_indices)
    np.testing.assert_allclose(a.position_w, b.position_w, atol=1e-4)


@pytest.mark.slow
def test_localizer_gallery_cache_roundtrip(small_cfg, small_embedder,
                                           small_data, tmp_path, monkeypatch):
    """cache_path persists the coarse gallery + fine cell cache; a restart
    loads them without re-encoding and serves identical results. A stale
    cache (different weights) fails loudly."""
    import pytest

    import text2loc_tpu.serving as serving_mod

    cfg, data, embedder = small_cfg, small_data, small_embedder
    cs, cm, fs, fm = _states(cfg, embedder, data)
    # Deliberately NOT .npz: np.savez on a bare path appends the extension,
    # which would save to one name and load from another.
    path = str(tmp_path / "gallery.cache")
    first = Localizer(data, cs, cm, fs, fm, embedder, cfg, top_k=3,
                      cache_path=path)
    import os

    assert os.path.exists(path)

    # Second construction must take the load path: poison both encoders.
    def boom(*a, **k):
        raise AssertionError("cache miss: gallery re-encoded")

    monkeypatch.setattr(serving_mod, "encode_gallery", boom)
    monkeypatch.setattr(serving_mod.steps_lib, "encode_fine_gallery", boom)
    monkeypatch.setattr(serving_mod.Localizer, "_build_sentence_tables", boom)
    warm = Localizer(data, cs, cm, fs, fm, embedder, cfg, top_k=3,
                     cache_path=path)

    q = np.arange(4)
    a = first.localize(data.hint_dir[q], data.hint_color[q], data.hint_label[q])
    b = warm.localize(data.hint_dir[q], data.hint_color[q], data.hint_label[q])
    np.testing.assert_array_equal(a.cell_indices, b.cell_indices)
    np.testing.assert_allclose(a.candidates_w, b.candidates_w, atol=1e-6)

    # Different weights -> fingerprint guard refuses the stale cache.
    monkeypatch.undo()
    cs2, cm2, fs2, fm2 = _states(
        cfg, embedder, data
    )
    import jax

    bad = jax.tree_util.tree_map(lambda x: x * 1.5, cs2.params)
    cs2 = cs2._replace(params=bad)
    with pytest.raises(ValueError, match="does not match"):
        Localizer(data, cs2, cm2, fs2, fm2, embedder, cfg, top_k=3,
                  cache_path=path)

    # Gallery-only cache (precompute_fine=False) upgrades in place: a later
    # fine-serving construction reuses the cached coarse gallery, encodes
    # only the fine cache, and re-saves.
    path2 = str(tmp_path / "gallery_only.npz")
    Localizer(data, cs, cm, fs, fm, embedder, cfg, top_k=3,
              precompute_fine=False, cache_path=path2)
    monkeypatch.setattr(serving_mod, "encode_gallery", boom)  # coarse cached
    up = Localizer(data, cs, cm, fs, fm, embedder, cfg, top_k=3,
                   cache_path=path2)
    monkeypatch.setattr(serving_mod.steps_lib, "encode_fine_gallery", boom)
    warm2 = Localizer(data, cs, cm, fs, fm, embedder, cfg, top_k=3,
                      cache_path=path2)
    c = up.localize(data.hint_dir[q], data.hint_color[q], data.hint_label[q])
    d = warm2.localize(data.hint_dir[q], data.hint_color[q], data.hint_label[q])
    np.testing.assert_allclose(c.candidates_w, d.candidates_w, atol=1e-6)
    np.testing.assert_allclose(a.candidates_w, c.candidates_w, atol=1e-6)


@pytest.mark.slow
def test_localizer_gallery_cache_roundtrip_bf16(small_cfg, small_embedder,
                                                small_data, tmp_path,
                                                monkeypatch):
    """bfloat16 serving dtype (the DEFAULT ModelConfig.dtype) must survive
    the npz cache: ml_dtypes bf16 serializes as raw void ('|V2') that
    np.load cannot hand back to jnp, so _npz_pack stores float32 + a dtype
    sidecar and _npz_unpack casts back on load."""
    import dataclasses
    import os

    import text2loc_tpu.serving as serving_mod

    cfg = small_cfg.replace(
        model=dataclasses.replace(small_cfg.model, dtype="bfloat16")
    )
    data, embedder = small_data, small_embedder
    cs, cm, fs, fm = _states(cfg, embedder, data)
    path = str(tmp_path / "gallery_bf16.npz")
    first = Localizer(data, cs, cm, fs, fm, embedder, cfg, top_k=3,
                      cache_path=path)
    assert os.path.exists(path)
    # The saved file must contain no raw-void arrays (unreadable on load).
    with np.load(path, allow_pickle=False) as f:
        assert all(f[k].dtype.kind != "V" for k in f.files), (
            {k: str(f[k].dtype) for k in f.files}
        )

    def boom(*a, **k):
        raise AssertionError("cache miss: gallery re-encoded")

    monkeypatch.setattr(serving_mod, "encode_gallery", boom)
    monkeypatch.setattr(serving_mod.steps_lib, "encode_fine_gallery", boom)
    monkeypatch.setattr(serving_mod.Localizer, "_build_sentence_tables", boom)
    warm = Localizer(data, cs, cm, fs, fm, embedder, cfg, top_k=3,
                     cache_path=path)

    q = np.arange(4)
    a = first.localize(data.hint_dir[q], data.hint_color[q], data.hint_label[q])
    b = warm.localize(data.hint_dir[q], data.hint_color[q], data.hint_label[q])
    np.testing.assert_array_equal(a.cell_indices, b.cell_indices)
    np.testing.assert_allclose(np.asarray(a.candidates_w, np.float32),
                               np.asarray(b.candidates_w, np.float32),
                               atol=1e-6)


def test_localizer_sharded_stepwise_gallery(small_cfg, small_embedder,
                                            small_data):
    """The stepwise sharded path (no fine cache -> per-candidate recompute on
    host-gathered cells) still works and agrees on retrieval."""
    cfg, data, embedder = small_cfg, small_data, small_embedder
    cs, cm, fs, fm = _states(cfg, embedder, data)
    dense = Localizer(data, cs, cm, fs, fm, embedder, cfg, top_k=3,
                      precompute_fine=False)
    mesh = make_mesh(8)
    sharded = Localizer(data, cs, cm, fs, fm, embedder, cfg, top_k=3,
                        mesh=mesh, precompute_fine=False)
    assert sharded._serve is None

    q = np.arange(4)
    a = dense.localize(data.hint_dir[q], data.hint_color[q], data.hint_label[q])
    b = sharded.localize(data.hint_dir[q], data.hint_color[q], data.hint_label[q])
    np.testing.assert_array_equal(a.cell_indices, b.cell_indices)
    np.testing.assert_allclose(a.candidates_w, b.candidates_w, atol=1e-4)
