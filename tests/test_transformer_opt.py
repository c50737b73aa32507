"""TPU serving specializations of the transformer layers are EXACT:
grouped (sample-folded) attention == stock per-sample attention, and the
fused add+LayerNorm kernel == the composable ops."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from text2loc_tpu.models.transformer import (
    TorchDecoderLayer,
    grouped_dot_product_attention,
)
from text2loc_tpu.ops.pallas_ln import (
    add_layernorm_reference,
    fused_add_layernorm,
)


@pytest.mark.parametrize("b,lq,lk", [(37, 16, 16), (40, 16, 6), (8, 6, 16),
                                     (3, 6, 6)])
def test_grouped_attention_matches_stock(b, lq, lk):
    rng = np.random.default_rng(0)
    h, dh = 4, 32
    q = jnp.asarray(rng.standard_normal((b, lq, h, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, lk, h, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, lk, h, dh)), jnp.float32)
    key_valid = rng.random((b, lk)) > 0.2
    key_valid[:, 0] = True                     # never a fully-masked row
    mask = jnp.asarray(key_valid)[:, None, None, :].repeat(lq, axis=2)

    from flax import linen as nn

    ref = nn.dot_product_attention(q, k, v, mask=mask, deterministic=True)
    got = grouped_dot_product_attention(q, k, v, mask=mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    # Unmasked variant too.
    ref = nn.dot_product_attention(q, k, v, deterministic=True)
    got = grouped_dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_decoder_layer_grouped_equals_stock(monkeypatch):
    """The whole decoder layer at eval: grouped path == env-disabled path."""
    rng = np.random.default_rng(1)
    b, lt, lm, d = 19, 16, 6, 128
    layer = TorchDecoderLayer(d_model=d, num_heads=4, dim_feedforward=4 * d)
    tgt = jnp.asarray(rng.standard_normal((b, lt, d)), jnp.float32)
    mem = jnp.asarray(rng.standard_normal((b, lm, d)), jnp.float32)
    mmask = jnp.asarray(rng.random((b, lm)) > 0.3)
    variables = layer.init(jax.random.PRNGKey(0), tgt, mem)

    def run():
        return np.asarray(layer.apply(variables, tgt, mem, memory_mask=mmask))

    monkeypatch.setenv("TEXT2LOC_GROUPED_ATTN", "1")
    a = run()
    monkeypatch.setenv("TEXT2LOC_GROUPED_ATTN", "0")
    b_ = run()
    np.testing.assert_allclose(a, b_, rtol=1e-5, atol=1e-5)


def test_fused_add_layernorm_matches_reference():
    rng = np.random.default_rng(2)
    for shape, dt in (((531, 128), jnp.float32), ((7, 16, 128), jnp.bfloat16),
                      ((64, 1024), jnp.float32)):
        x = jnp.asarray(rng.standard_normal(shape), dt)
        r = jnp.asarray(rng.standard_normal(shape), dt)
        g = jnp.asarray(rng.standard_normal(shape[-1]), jnp.float32)
        b = jnp.asarray(rng.standard_normal(shape[-1]), jnp.float32)
        ref = add_layernorm_reference(x, r, g, b)
        got = fused_add_layernorm(x, r, g, b, interpret=True)
        # bf16 outputs can differ by one ulp (~0.8%) from rounding order.
        tol = 1e-2 if dt == jnp.bfloat16 else 2e-5
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            rtol=tol, atol=tol,
        )


def test_fused_ffn_addlayernorm_matches_reference():
    from text2loc_tpu.ops.pallas_ffn import (
        ffn_addlayernorm_reference,
        fused_ffn_addlayernorm,
    )

    rng = np.random.default_rng(3)
    for shape, f, dt in (((531, 128), 512, jnp.float32),
                         ((5, 16, 128), 512, jnp.bfloat16),
                         ((40, 256), 1024, jnp.float32)):
        d = shape[-1]
        x = jnp.asarray(rng.standard_normal(shape), dt)
        w1 = jnp.asarray(rng.standard_normal((d, f)) * 0.1, jnp.float32)
        b1 = jnp.asarray(rng.standard_normal(f) * 0.1, jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((f, d)) * 0.1, jnp.float32)
        b2 = jnp.asarray(rng.standard_normal(d) * 0.1, jnp.float32)
        g = jnp.asarray(rng.standard_normal(d), jnp.float32)
        be = jnp.asarray(rng.standard_normal(d), jnp.float32)
        ref = ffn_addlayernorm_reference(x, w1, b1, w2, b2, g, be)
        got = fused_ffn_addlayernorm(x, w1, b1, w2, b2, g, be, interpret=True)
        tol = 2e-2 if dt == jnp.bfloat16 else 5e-5
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            rtol=tol, atol=tol,
        )


@pytest.mark.parametrize("b,lq,lk,d,h", [(37, 16, 16, 128, 4),
                                         (40, 16, 6, 128, 4),
                                         (9, 6, 16, 128, 4),
                                         (3, 6, 6, 128, 4),
                                         (5, 28, 28, 256, 4),
                                         (3, 16, 16, 1024, 4)])
def test_fused_mha_addlayernorm_matches_reference(b, lq, lk, d, h):
    from text2loc_tpu.ops.pallas_mha import (
        fused_mha_addlayernorm,
        mha_addlayernorm_ref,
    )

    rng = np.random.default_rng(6)
    dh = d // h
    for dt in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(rng.standard_normal((b, lq, d)), dt)
        kv = jnp.asarray(rng.standard_normal((b, lk, d)), dt)
        wq, wk, wv = (jnp.asarray(rng.standard_normal((d, h, dh)) * 0.1,
                                  jnp.float32) for _ in range(3))
        bq, bk, bv = (jnp.asarray(rng.standard_normal((h, dh)) * 0.1,
                                  jnp.float32) for _ in range(3))
        wo = jnp.asarray(rng.standard_normal((h, dh, d)) * 0.1, jnp.float32)
        bo = jnp.asarray(rng.standard_normal(d) * 0.1, jnp.float32)
        g = jnp.asarray(rng.standard_normal(d), jnp.float32)
        be = jnp.asarray(rng.standard_normal(d), jnp.float32)
        key_valid = rng.random((b, lk)) > 0.2
        key_valid[:, 0] = True                  # never a fully-masked row
        for mask in (None, jnp.asarray(key_valid)):
            ref = mha_addlayernorm_ref(x, kv, wq, bq, wk, bk, wv, bv, wo,
                                       bo, g, be, key_mask=mask, num_heads=h)
            got = fused_mha_addlayernorm(x, kv, wq, bq, wk, bk, wv, bv, wo,
                                         bo, g, be, key_mask=mask,
                                         num_heads=h, interpret=True)
            assert got.shape == (b, lq, d) and got.dtype == dt
            if dt == jnp.float32:
                np.testing.assert_allclose(
                    np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4,
                )
            else:
                # bf16 deviation from the stock twin grows with the
                # contraction depth (lane-masked full-width dots round in a
                # different order), so gate COMPARATIVELY against an f32
                # oracle: fused-bf16 must sit no farther from it than
                # stock-bf16 does (3x slack) — the on-chip probe's standard.
                oracle = np.asarray(mha_addlayernorm_ref(
                    jnp.asarray(x, jnp.float32), jnp.asarray(kv, jnp.float32),
                    wq, bq, wk, bk, wv, bv, wo, bo, g, be,
                    key_mask=mask, num_heads=h,
                ))
                dev_stock = np.abs(np.asarray(ref, np.float32) - oracle).max()
                dev_fused = np.abs(np.asarray(got, np.float32) - oracle).max()
                assert dev_fused < max(3.0 * dev_stock, 1e-3), (
                    dt, dev_fused, dev_stock,
                )


def test_decoder_layer_fused_attn_equals_stock(monkeypatch):
    """Whole decoder layer at eval: interpret-mode fused attention block ==
    stock ops (both attention blocks, masked)."""
    import text2loc_tpu.models.transformer as tr
    from text2loc_tpu.ops import pallas_mha

    rng = np.random.default_rng(7)
    b, lt, lm, d = 9, 16, 6, 128
    layer = TorchDecoderLayer(d_model=d, num_heads=4, dim_feedforward=4 * d)
    tgt = jnp.asarray(rng.standard_normal((b, lt, d)), jnp.float32)
    mem = jnp.asarray(rng.standard_normal((b, lm, d)), jnp.float32)
    tmask = jnp.asarray(rng.random((b, lt)) > 0.2).at[:, 0].set(True)
    mmask = jnp.asarray(rng.random((b, lm)) > 0.2).at[:, 0].set(True)
    variables = layer.init(jax.random.PRNGKey(0), tgt, mem)

    base = np.asarray(layer.apply(variables, tgt, mem, tgt_mask=tmask,
                                  memory_mask=mmask))

    monkeypatch.setattr(tr, "_fused_attn_enabled", lambda d, dtype=None: True)
    orig = pallas_mha.fused_mha_addlayernorm
    monkeypatch.setattr(
        pallas_mha, "fused_mha_addlayernorm",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}),
    )
    fused = np.asarray(layer.apply(variables, tgt, mem, tgt_mask=tmask,
                                   memory_mask=mmask))
    np.testing.assert_allclose(fused, base, rtol=2e-4, atol=2e-4)


def test_decoder_layer_fused_ffn_equals_stock(monkeypatch):
    """Whole decoder layer at eval: interpret-mode fused FFN == stock ops.
    (On CPU the fused path is normally gated off; force it through the
    interpret kernel by patching the gate + kernel entry.)"""
    import text2loc_tpu.models.transformer as tr
    from text2loc_tpu.ops import pallas_ffn

    rng = np.random.default_rng(4)
    b, lt, lm, d = 9, 16, 6, 128
    layer = TorchDecoderLayer(d_model=d, num_heads=4, dim_feedforward=4 * d)
    tgt = jnp.asarray(rng.standard_normal((b, lt, d)), jnp.float32)
    mem = jnp.asarray(rng.standard_normal((b, lm, d)), jnp.float32)
    variables = layer.init(jax.random.PRNGKey(0), tgt, mem)

    base = np.asarray(layer.apply(variables, tgt, mem))

    monkeypatch.setattr(tr, "_fused_ffn_enabled", lambda d: True)
    orig = pallas_ffn.fused_ffn_addlayernorm
    monkeypatch.setattr(
        pallas_ffn, "fused_ffn_addlayernorm",
        lambda *a, **k: orig(*a, interpret=True, **k),
    )
    fused = np.asarray(layer.apply(variables, tgt, mem))
    np.testing.assert_allclose(fused, base, rtol=1e-5, atol=1e-5)


def test_fused_kernels_inside_shard_map():
    """On real multi-chip TPU the fused LN/FFN kernels run INSIDE the
    sharded serve's shard_map; single-chip hardware can't exercise that
    composition, so run the interpret-mode kernels under shard_map on the
    CPU mesh and assert equality with the references."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from text2loc_tpu.ops.pallas_ffn import (
        ffn_addlayernorm_reference,
        fused_ffn_addlayernorm,
    )
    from text2loc_tpu.parallel import make_mesh

    mesh = make_mesh(8)
    rng = np.random.default_rng(5)
    d, f = 128, 512
    x = jnp.asarray(rng.standard_normal((64, d)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((d, f)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(f) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((f, d)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(d) * 0.1, jnp.float32)
    g = jnp.asarray(rng.standard_normal(d), jnp.float32)
    be = jnp.asarray(rng.standard_normal(d), jnp.float32)

    ax = mesh.axis_names[0]
    fn = shard_map(
        lambda *a: fused_ffn_addlayernorm(*a, interpret=True),
        mesh=mesh,
        in_specs=(P(ax), P(), P(), P(), P(), P(), P()),
        out_specs=P(ax),
        check_vma=False,    # pallas out_shape carries no VMA (the sharded
    )                       # serve sets the same flag)
    got = np.asarray(jax.jit(fn)(x, w1, b1, w2, b2, g, be))
    ref = np.asarray(ffn_addlayernorm_reference(x, w1, b1, w2, b2, g, be))
    np.testing.assert_allclose(got, ref, rtol=5e-5, atol=5e-5)

    from text2loc_tpu.ops.pallas_ln import (
        add_layernorm_reference,
        fused_add_layernorm,
    )

    r = jnp.asarray(rng.standard_normal((64, d)), jnp.float32)
    fn2 = shard_map(
        lambda *a: fused_add_layernorm(*a, interpret=True),
        mesh=mesh,
        in_specs=(P(ax), P(ax), P(), P()),
        out_specs=P(ax),
        check_vma=False,
    )
    got2 = np.asarray(jax.jit(fn2)(x, r, g, be))
    ref2 = np.asarray(add_layernorm_reference(x, r, g, be))
    np.testing.assert_allclose(got2, ref2, rtol=2e-5, atol=2e-5)

    from text2loc_tpu.ops.pallas_mha import (
        fused_mha_addlayernorm,
        mha_addlayernorm_ref,
    )

    h, dh = 4, d // 4
    xa = jnp.asarray(rng.standard_normal((16, 16, d)), jnp.float32)
    kv = jnp.asarray(rng.standard_normal((16, 6, d)), jnp.float32)
    wq, wk, wv = (jnp.asarray(rng.standard_normal((d, h, dh)) * 0.1,
                              jnp.float32) for _ in range(3))
    bq, bk, bv = (jnp.asarray(rng.standard_normal((h, dh)) * 0.1,
                              jnp.float32) for _ in range(3))
    wo = jnp.asarray(rng.standard_normal((h, dh, d)) * 0.1, jnp.float32)
    bo = jnp.asarray(rng.standard_normal(d) * 0.1, jnp.float32)
    fn3 = shard_map(
        lambda xx, mm, *w: fused_mha_addlayernorm(
            xx, mm, *w, num_heads=h, interpret=True),
        mesh=mesh,
        in_specs=(P(ax), P(ax)) + (P(),) * 10,
        out_specs=P(ax),
        check_vma=False,
    )
    got3 = np.asarray(jax.jit(fn3)(xa, kv, wq, bq, wk, bk, wv, bv, wo, bo,
                                   g, be))
    ref3 = np.asarray(mha_addlayernorm_ref(xa, kv, wq, bq, wk, bk, wv, bv,
                                           wo, bo, g, be, num_heads=h))
    np.testing.assert_allclose(got3, ref3, rtol=1e-4, atol=1e-4)


def test_param_tree_unchanged():
    """The optimized modules keep the stock flax param layout — converted
    torch checkpoints and round-2 trained states load unchanged."""
    layer = TorchDecoderLayer(d_model=32, num_heads=4, dim_feedforward=64)
    v = layer.init(jax.random.PRNGKey(0), jnp.zeros((2, 5, 32)),
                   jnp.zeros((2, 3, 32)))
    p = v["params"]
    assert set(p) == {"self_attn", "cross_attn", "linear1", "linear2",
                      "norm1", "norm2", "norm3"}
    for attn in ("self_attn", "cross_attn"):
        assert set(p[attn]) == {"query", "key", "value", "out"}
        assert p[attn]["query"]["kernel"].shape == (32, 4, 8)
        assert p[attn]["out"]["kernel"].shape == (4, 8, 32)
    for norm in ("norm1", "norm2", "norm3"):
        assert set(p[norm]) == {"scale", "bias"}
        assert p[norm]["scale"].shape == (32,)


def test_fully_masked_sample_does_not_leak_across_fold():
    """A sample whose keys are ALL masked must produce output independent
    of the OTHER samples folded into the same group (off-block penalty
    strictly dominates the key-mask penalty in both folded paths)."""
    from text2loc_tpu.models.transformer import grouped_dot_product_attention
    from text2loc_tpu.ops.pallas_mha import fused_mha_addlayernorm

    rng = np.random.default_rng(11)
    b, lq, lk, d, h = 8, 6, 6, 128, 4
    dh = d // h

    def variant(seed):
        r = np.random.default_rng(seed)
        q = jnp.asarray(r.standard_normal((b, lq, h, dh)), jnp.float32)
        k = jnp.asarray(r.standard_normal((b, lk, h, dh)), jnp.float32)
        v = jnp.asarray(r.standard_normal((b, lk, h, dh)), jnp.float32)
        return q, k, v

    # Sample 0 fixed with an all-False key mask; samples 1.. differ.
    q0, k0, v0 = variant(100)
    outs = []
    for seed in (1, 2):
        qa, ka, va = variant(seed)
        q = qa.at[0].set(q0[0])
        k = ka.at[0].set(k0[0])
        v = va.at[0].set(v0[0])
        key_valid = np.ones((b, lk), bool)
        key_valid[0] = False                     # sample 0: fully masked
        mask = jnp.asarray(key_valid)[:, None, None, :] & jnp.ones(
            (b, 1, lq, lk), bool
        )
        out = grouped_dot_product_attention(q, k, v, mask=mask,
                                            group_rows=8 * lq)
        outs.append(np.asarray(out[0]))
    np.testing.assert_array_equal(outs[0], outs[1])

    # Same property through the fused whole-block kernel (interpret mode).
    wq, wk, wv = (jnp.asarray(rng.standard_normal((d, h, dh)) * 0.1,
                              jnp.float32) for _ in range(3))
    bq, bk, bv = (jnp.asarray(rng.standard_normal((h, dh)) * 0.1,
                              jnp.float32) for _ in range(3))
    wo = jnp.asarray(rng.standard_normal((h, dh, d)) * 0.1, jnp.float32)
    bo = jnp.asarray(rng.standard_normal(d) * 0.1, jnp.float32)
    g = jnp.asarray(rng.standard_normal(d), jnp.float32)
    be = jnp.asarray(rng.standard_normal(d), jnp.float32)
    x0 = jnp.asarray(np.random.default_rng(200).standard_normal((1, lq, d)),
                     jnp.float32)
    outs = []
    for seed in (3, 4):
        r = np.random.default_rng(seed)
        x = jnp.asarray(r.standard_normal((b, lq, d)), jnp.float32)
        kv = jnp.asarray(r.standard_normal((b, lk, d)), jnp.float32)
        x = x.at[0].set(x0[0])
        kv = kv.at[0].set(x0[0])
        key_valid = np.ones((b, lk), bool)
        key_valid[0] = False
        out = fused_mha_addlayernorm(
            x, kv, wq, bq, wk, bk, wv, bv, wo, bo, g, be,
            key_mask=jnp.asarray(key_valid), num_heads=h, group_rows=8 * lq,
            interpret=True,
        )
        outs.append(np.asarray(out[0]))
    np.testing.assert_array_equal(outs[0], outs[1])
