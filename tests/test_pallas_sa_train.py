"""Fused TRAINING-mode SA kernel (custom VJP) vs a JAX-autodiff oracle.

The oracle re-states the XLA training path's math (models/pointnet2.py
SetAbstraction train branch: edge MLP -> masked-statistics BatchNorm -> relu
twice -> masked neighbor max) on pre-hoisted (u, sv) inputs, and jax.grad
provides the reference gradients — including the nonlocal batch-statistics
BN backward the kernel hand-derives. Interpret mode on CPU.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from text2loc_tpu.ops.pallas_sa_train import sa_train_fused, sa_train_reference

oracle = sa_train_reference


def _rand_case(seed, n=4, p=16, s=8, k=4, h1=8, h2=16, short_rows=True):
    rng = np.random.default_rng(seed)
    u = rng.standard_normal((n, p, h1)).astype(np.float32)
    sv = rng.standard_normal((n, s, h1)).astype(np.float32)
    w2 = (rng.standard_normal((h1, h2)) * 0.3).astype(np.float32)
    b2 = rng.standard_normal((h2,)).astype(np.float32)
    g1 = (1.0 + 0.1 * rng.standard_normal((h1,))).astype(np.float32)
    be1 = (0.1 * rng.standard_normal((h1,))).astype(np.float32)
    g2 = (1.0 + 0.1 * rng.standard_normal((h2,))).astype(np.float32)
    be2 = (0.1 * rng.standard_normal((h2,))).astype(np.float32)
    idx = rng.integers(0, p, size=(n, s, k)).astype(np.int32)
    # Ragged neighbor validity; one row fully empty to hit the fallback.
    maskm = rng.random((n, s, k)) < 0.8
    if short_rows:
        maskm[0, 0, :] = False
    # maskf = valid edges of real objects: drop one whole object from stats.
    obj = np.ones((n,), bool)
    obj[-1] = False
    maskf = maskm & obj[:, None, None]
    return tuple(
        jnp.asarray(a)
        for a in (u, sv, w2, b2, g1, be1, g2, be2, idx, maskm, maskf)
    )


FUSED_F32 = functools.partial(
    sa_train_fused, compute_dtype=jnp.float32, interpret=True
)


def test_forward_and_stats_match_oracle():
    args = _rand_case(0)
    out, stats = FUSED_F32(*args)
    want_out, want_stats = oracle(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want_out),
                               rtol=1e-5, atol=1e-5)
    for got, want in zip(stats, want_stats):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)


def test_backward_matches_autodiff_oracle():
    args = _rand_case(1)
    diff = args[:8]
    rest = args[8:]
    rng = np.random.default_rng(99)
    # Random (not sum) cotangent so tie-splitting and per-feature scaling of
    # the BN backward are actually exercised.
    cot = jnp.asarray(
        rng.standard_normal((4, 8, 16)).astype(np.float32)
    )

    def loss_fused(*d):
        out, _ = FUSED_F32(*d, *rest)
        return jnp.sum(out * cot)

    def loss_oracle(*d):
        out, _ = oracle(*d, *rest)
        return jnp.sum(out * cot)

    got = jax.grad(loss_fused, argnums=tuple(range(8)))(*diff)
    want = jax.grad(loss_oracle, argnums=tuple(range(8)))(*diff)
    names = ["u", "sv", "w2", "b2", "g1", "be1", "g2", "be2"]
    for name, g, w in zip(names, got, want):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-4, atol=2e-5,
            err_msg=f"grad mismatch for {name}",
        )


def test_backward_multi_tile_grid():
    # S large enough that the S-grid has >1 tile even at small K, so the
    # cross-tile accumulators in every backward kernel are exercised.
    args = _rand_case(2, n=3, p=64, s=32, k=2, h1=8, h2=8)
    diff = args[:8]
    rest = args[8:]

    def loss_fused(*d):
        out, _ = FUSED_F32(*d, *rest)
        return jnp.sum(out ** 2)

    def loss_oracle(*d):
        out, _ = oracle(*d, *rest)
        return jnp.sum(out ** 2)

    got = jax.grad(loss_fused, argnums=tuple(range(8)))(*diff)
    want = jax.grad(loss_oracle, argnums=tuple(range(8)))(*diff)
    # atol covers catastrophic cancellation: db2 = sum_all dz is near-zero by
    # BN shift-invariance (exactly zero when maskf covers all edges), so f32
    # accumulation-order noise from the large intermediate sums dominates it.
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=5e-4, atol=2.5e-3)


def test_cached_e_f32_bit_equal_and_grads():
    """cache_dtype=f32: the cached-e variant must match the jnp oracle the
    same way the recompute variant does (stats are taken of the rounded e,
    and f32 rounding is the identity), forward AND backward — including the
    final kernel's rebuilt one-hot transpose for du."""
    args = _rand_case(4)
    fwd_cached = functools.partial(
        sa_train_fused, compute_dtype=jnp.float32, interpret=True,
        cache_dtype=jnp.float32,
    )
    out, stats = fwd_cached(*args)
    want_out, want_stats = oracle(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want_out),
                               rtol=1e-5, atol=1e-5)
    for got, want in zip(stats, want_stats):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    diff, rest = args[:8], args[8:]
    rng = np.random.default_rng(44)
    cot = jnp.asarray(rng.standard_normal((4, 8, 16)).astype(np.float32))

    def loss_c(*d):
        o, _ = fwd_cached(*d, *rest)
        return jnp.sum(o * cot)

    def loss_o(*d):
        o, _ = oracle(*d, *rest)
        return jnp.sum(o * cot)

    got = jax.grad(loss_c, argnums=tuple(range(8)))(*diff)
    want = jax.grad(loss_o, argnums=tuple(range(8)))(*diff)
    for name, g, w in zip(
        ["u", "sv", "w2", "b2", "g1", "be1", "g2", "be2"], got, want
    ):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=5e-4, atol=2.5e-3,
            err_msg=f"cached-e grad mismatch for {name}",
        )


def test_cached_e_multi_tile():
    """Cached-e path with a multi-tile S grid (cross-tile accumulators +
    the du accumulation over the j axis)."""
    args = _rand_case(5, n=3, p=64, s=32, k=2, h1=8, h2=8)
    diff, rest = args[:8], args[8:]
    fwd_cached = functools.partial(
        sa_train_fused, compute_dtype=jnp.float32, interpret=True,
        cache_dtype=jnp.float32,
    )

    def loss_c(*d):
        o, _ = fwd_cached(*d, *rest)
        return jnp.sum(o ** 2)

    def loss_o(*d):
        o, _ = oracle(*d, *rest)
        return jnp.sum(o ** 2)

    got = jax.grad(loss_c, argnums=tuple(range(8)))(*diff)
    want = jax.grad(loss_o, argnums=tuple(range(8)))(*diff)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=5e-4, atol=2.5e-3)


def test_cached_e_bf16_close():
    args = _rand_case(6)
    out32, _ = FUSED_F32(*args)
    out16, _ = sa_train_fused(
        *args, compute_dtype=jnp.float32, interpret=True,
        cache_dtype=jnp.bfloat16,
    )
    np.testing.assert_allclose(np.asarray(out16), np.asarray(out32),
                               rtol=0.05, atol=0.05)


def test_bf16_compute_close_to_f32():
    args = _rand_case(3)
    out32, _ = FUSED_F32(*args)
    out16, _ = sa_train_fused(
        *args, compute_dtype=jnp.bfloat16, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out16), np.asarray(out32),
                               rtol=0.05, atol=0.05)


@pytest.mark.parametrize("variant", [True, "e32"])
def test_fused_train_shard_map_equals_dense(variant):
    """SetAbstraction's fused training path inside fused_train_mesh (the
    shard_map island with psum'd BN statistics) must reproduce the dense
    single-device fused path: forward, updated batch_stats, AND gradients
    — including replicated-parameter grads, which shard_map's transpose
    must psum across the 8 virtual devices. Covers both the recompute
    variant and the cached-e variant (whose _forward_e/_backward_e have
    their own axis_name psum points)."""
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from text2loc_tpu.models import pointnet2
    from text2loc_tpu.models.pointnet2 import SetAbstraction

    rng = np.random.default_rng(7)
    n, p, c = 16, 32, 5        # n divisible by the 8-device mesh
    x = jnp.asarray(rng.random((n, p, c)), jnp.float32)
    pos = jnp.asarray(rng.random((n, p, 3)), jnp.float32)
    obj_mask = jnp.asarray([True] * (n - 2) + [False] * 2)

    mod = SetAbstraction(
        num_samples=16, radius=0.4, mlp_channels=(c + 3, 8, 16),
        max_neighbors=8, fused="off", fused_train=variant,
        fused_interpret=True,
    )
    params = mod.init(jax.random.PRNGKey(0), x, pos, obj_mask, train=True)

    def loss(pp, xx):
        out, vars_ = mod.apply(
            pp, xx, pos, obj_mask, train=True, mutable=["batch_stats"]
        )
        return jnp.sum(out[0] ** 2), (out[0], vars_["batch_stats"])

    vg = jax.value_and_grad(loss, has_aux=True)
    (l_d, (o_d, bs_d)), g_d = vg(params, x)

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("dp",))
    with pointnet2.fused_train_mesh(mesh, "dp"):
        (l_s, (o_s, bs_s)), g_s = vg(params, x)

    np.testing.assert_allclose(float(l_s), float(l_d), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(o_s), np.asarray(o_d),
                               rtol=1e-5, atol=1e-6)
    for (kd, vd), (ks, vs) in zip(
        jax.tree_util.tree_leaves_with_path(bs_d),
        jax.tree_util.tree_leaves_with_path(bs_s),
    ):
        assert kd == ks
        np.testing.assert_allclose(np.asarray(vs), np.asarray(vd),
                                   rtol=1e-5, atol=1e-6, err_msg=str(kd))
    for (kd, vd), (ks, vs) in zip(
        jax.tree_util.tree_leaves_with_path(g_d),
        jax.tree_util.tree_leaves_with_path(g_s),
    ):
        assert kd == ks
        # atol covers the BN shift-invariance cancellation leaves (see
        # test_backward_multi_tile_grid): per-shard psum reassociation
        # perturbs near-zero bias grads at the 1e-4 level.
        np.testing.assert_allclose(np.asarray(vs), np.asarray(vd),
                                   rtol=1e-4, atol=1e-3, err_msg=str(kd))


def test_fused_train_list_parsing(monkeypatch):
    """Per-level TEXT2LOC_FUSED_SA_TRAIN comma lists parse to explicit
    booleans (bypassing the dtype gate); wrong arity raises; single values
    defer to the gate (None)."""
    from text2loc_tpu.models import pointnet2

    monkeypatch.setattr(pointnet2.jax, "default_backend", lambda: "tpu")
    monkeypatch.delenv("TEXT2LOC_DISABLE_PALLAS", raising=False)
    monkeypatch.setenv("TEXT2LOC_FUSED_SA_TRAIN", "1,0,1")
    assert pointnet2._fused_train_list(3) == [True, False, True]
    with pytest.raises(ValueError):
        pointnet2._fused_train_list(2)
    # Default (unset / "auto"): last level only — the measured winner.
    monkeypatch.delenv("TEXT2LOC_FUSED_SA_TRAIN", raising=False)
    assert pointnet2._fused_train_list(3) == [False, False, True]
    monkeypatch.setenv("TEXT2LOC_FUSED_SA_TRAIN", "auto")
    assert pointnet2._fused_train_list(3) == [False, False, True]
    # Stage-winner override: rebinds what "auto"/unset resolve to; an
    # explicit env value still wins; arity mismatch raises.
    with pointnet2.fused_train_auto(("e32", "e32", "1")):
        assert pointnet2._fused_train_list(3) == ["e32", "e32", True]
        monkeypatch.delenv("TEXT2LOC_FUSED_SA_TRAIN", raising=False)
        assert pointnet2._fused_train_list(3) == ["e32", "e32", True]
        monkeypatch.setenv("TEXT2LOC_FUSED_SA_TRAIN", "0,0,1")
        assert pointnet2._fused_train_list(3) == [False, False, True]
        monkeypatch.setenv("TEXT2LOC_FUSED_SA_TRAIN", "auto")
        with pytest.raises(ValueError):
            pointnet2._fused_train_list(2)
    assert pointnet2._fused_train_list(3) == [False, False, True]
    monkeypatch.setenv("TEXT2LOC_FUSED_SA_TRAIN", "1")
    assert pointnet2._fused_train_list(3) == [True, True, True]
    monkeypatch.setenv("TEXT2LOC_FUSED_SA_TRAIN", "0")
    assert pointnet2._fused_train_list(3) == [False, False, False]
    # CPU backend: everything off except "interpret" (mesh tests).
    monkeypatch.setattr(pointnet2.jax, "default_backend", lambda: "cpu")
    monkeypatch.setenv("TEXT2LOC_FUSED_SA_TRAIN", "1,1,1")
    assert pointnet2._fused_train_list(3) == [False, False, False]
    monkeypatch.setenv("TEXT2LOC_FUSED_SA_TRAIN", "interpret")
    assert pointnet2._fused_train_list(3) == [True, True, True]
    with pointnet2.suppress_fused_train():
        assert pointnet2._fused_train_list(3) == [False, False, False]


def test_suppress_fused_train_context(monkeypatch):
    """parallel/train._bind relies on suppress_fused_train to keep Mosaic
    custom calls out of GSPMD-partitioned DP traces; verify the gate flips
    the env default off (and restores it) even when the backend looks like
    a TPU with the env knob set."""
    from text2loc_tpu.models import pointnet2

    monkeypatch.setenv("TEXT2LOC_FUSED_SA_TRAIN", "1")
    monkeypatch.delenv("TEXT2LOC_DISABLE_PALLAS", raising=False)
    monkeypatch.setattr(pointnet2.jax, "default_backend", lambda: "tpu")
    assert pointnet2._fused_train_default() is True
    with pointnet2.suppress_fused_train():
        assert pointnet2._fused_train_default() is False
    assert pointnet2._fused_train_default() is True


@pytest.mark.parametrize("variant", [True, "e32"])
def test_module_fused_train_matches_xla_path(variant):
    """SetAbstraction(train=True) with the fused training kernel (recompute
    variant and cached-e f32 variant): forward, gradients, and updated
    batch_stats all match the XLA path on the same parameters (identical
    exact neighbor selection)."""
    from text2loc_tpu.models.pointnet2 import SetAbstraction

    rng = np.random.default_rng(5)
    n, p, c = 6, 32, 5
    x = jnp.asarray(rng.random((n, p, c)), jnp.float32)
    pos = jnp.asarray(rng.random((n, p, 3)), jnp.float32)
    obj_mask = jnp.asarray([True] * (n - 1) + [False])

    def build(fused_train):
        if fused_train is True:
            fused_train = variant
        return SetAbstraction(
            num_samples=16, radius=0.4, mlp_channels=(c + 3, 8, 16),
            max_neighbors=8, fused="off", fused_train=fused_train,
            fused_interpret=True,
        )

    ref = build(False)
    params = ref.init(jax.random.PRNGKey(0), x, pos, obj_mask, train=True)

    def run(mod, xx):
        out, vars_ = mod.apply(
            params, xx, pos, obj_mask, train=True, mutable=["batch_stats"]
        )
        return out[0], vars_["batch_stats"]

    out_ref, bs_ref = run(ref, x)
    out_fused, bs_fused = run(build(True), x)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               rtol=2e-4, atol=2e-5)
    flat_r = jax.tree_util.tree_leaves_with_path(bs_ref)
    flat_f = jax.tree_util.tree_leaves_with_path(bs_fused)
    for (kr, vr), (kf, vf) in zip(flat_r, flat_f):
        assert kr == kf
        np.testing.assert_allclose(np.asarray(vf), np.asarray(vr),
                                   rtol=2e-4, atol=2e-5, err_msg=str(kr))

    def loss(mod, pp, xx):
        out, _ = mod.apply(
            pp, xx, pos, obj_mask, train=True, mutable=["batch_stats"]
        )
        return jnp.sum(out[0] ** 2)

    g_ref = jax.grad(functools.partial(loss, ref))(params, x)
    g_fused = jax.grad(functools.partial(loss, build(True)))(params, x)
    for (kr, vr), (kf, vf) in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves_with_path(g_fused),
    ):
        assert kr == kf
        # atol again covers shift-invariance cancellation (near-zero bias
        # grads are f32 noise-dominated; see test_backward_multi_tile_grid).
        np.testing.assert_allclose(
            np.asarray(vf), np.asarray(vr), rtol=5e-4, atol=1e-3,
            err_msg=str(kr),
        )


def test_tiles_e_respects_sublane_rule():
    """The cached-e tile shrink loop must only produce s-tiles Mosaic
    accepts: a multiple of 8, or the full S (non-power-of-two S like 24
    once halved to 12 and failed at compile time)."""
    from text2loc_tpu.ops.pallas_sa_train import _tiles_e

    for (n, s, k, h1, esize) in [
        (512, 24, 32, 64, 4),      # non-power-of-two S: must stay at 24
        (512, 40, 32, 64, 4),
        (2048, 64, 16, 128, 4),    # default-ladder shapes still shrink
        (1024, 256, 16, 32, 2),
        (896, 16, 32, 64, 4),
    ]:
        g_t, s_t = _tiles_e(n, s, k, h1, esize)
        assert s % s_t == 0, (s, s_t)
        assert s_t == s or s_t % 8 == 0, (s, s_t)
        assert n % g_t == 0 or g_t <= n, (n, g_t)
