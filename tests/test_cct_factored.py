"""Exact factorization of the CCT at the layer-0 self/cross boundary.

The cascade's first self-attention blocks read only their own side
(reference cross_matcher.py:113-117: layer 0's `self_attn(objects)` sees no
hints yet, and `self_attn(hints)` sees the ORIGINAL hints) — so serving can
precompute the object-side block per gallery cell and the hint-side block
once per query. These tests pin cct == cct_tail(cct_obj_pre, cct_hints_pre)
for every config shape the factorization must cover.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from text2loc_tpu.models.cross_matcher import CrossMatch
from text2loc_tpu.training import steps


def _setup(cfg, embedder, data, rng):
    model = CrossMatch(cfg.model)
    fb = data.gather_fine(np.arange(6), cfg.model.pad_size)
    pfb = steps.prepare_fine_batch(fb, embedder, cfg, rng, train=False)
    variables = jax.jit(lambda r, o, t: model.init(r, o, t, train=False))(
        {"params": rng, "dropout": rng}, pfb.objects, pfb.text
    )
    fwd = steps.make_fine_split_forwards(model, embedder, cfg)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    obj = fwd.encode_objects(params, stats, fb, rng)
    hints = fwd.encode_text(params, stats, fb)
    obj_mask = jnp.asarray(fb["mask"], bool)
    sm = jnp.asarray(fb["sentence_mask"], bool)
    return fwd, params, stats, obj, obj_mask, hints, sm


def _assert_factored_equal(fwd, params, stats, obj, obj_mask, hints, sm):
    full = fwd.cct(params, stats, obj, obj_mask, hints, sm)
    obj1 = fwd.obj_pre(params, stats, obj, obj_mask)
    hints1 = fwd.hints_pre(params, stats, hints, sm)
    tail = fwd.cct_tail(params, stats, obj1, obj_mask, hints, hints1, sm)
    np.testing.assert_allclose(
        np.asarray(full, np.float32), np.asarray(tail, np.float32),
        atol=1e-5, rtol=1e-5,
    )


@pytest.mark.parametrize("n_layers", [2, 0])
@pytest.mark.parametrize("mask_padded", [True, False])
@pytest.mark.slow
def test_cct_tail_equals_cct(small_cfg, small_embedder, small_data,
                             n_layers, mask_padded):
    cfg = small_cfg.replace(model=dataclasses.replace(
        small_cfg.model, fine_num_decoder_layers=n_layers,
        mask_padded=mask_padded,
    ))
    rng = jax.random.PRNGKey(0)
    fwd, params, stats, obj, obj_mask, hints, sm = _setup(
        cfg, small_embedder, small_data, rng
    )
    _assert_factored_equal(fwd, params, stats, obj, obj_mask, hints, sm)


def test_cct_tail_equals_cct_short_hints(small_cfg, small_embedder,
                                         small_data):
    """Masked (short-hint) rows must factor identically — the hoisted hint
    self block sees the same sentence_mask the full path applies."""
    rng = jax.random.PRNGKey(1)
    fwd, params, stats, obj, obj_mask, hints, sm = _setup(
        small_cfg, small_embedder, small_data, rng
    )
    sm = np.array(sm)
    sm[0, 1:] = False          # one-hint pose
    sm[1, 2:] = False
    sm = jnp.asarray(sm)
    _assert_factored_equal(fwd, params, stats, obj, obj_mask, hints, sm)


def test_hints_pre_batch_invariant(small_cfg, small_embedder, small_data):
    """hints_pre computed per-pose then replicated across K candidates must
    equal hints_pre of the replicated batch (the serving amortization)."""
    rng = jax.random.PRNGKey(2)
    fwd, params, stats, obj, obj_mask, hints, sm = _setup(
        small_cfg, small_embedder, small_data, rng
    )
    k = 3
    rep = jnp.repeat(jnp.arange(hints.shape[0]), k)
    once = fwd.hints_pre(params, stats, hints, sm)
    pair = fwd.hints_pre(params, stats, hints[rep], sm[rep])
    np.testing.assert_allclose(
        np.asarray(once, np.float32)[np.asarray(rep)],
        np.asarray(pair, np.float32), atol=1e-5, rtol=1e-5,
    )
