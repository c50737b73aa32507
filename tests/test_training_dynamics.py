"""Training-DYNAMICS parity against reference-shaped torch training loops.

test_full_model_convert proves the towers are forward-equal after
conversion; these tests prove the TRAINING is equal: starting from
converted-identical parameters, on identical batches, a torch loop
reproducing the reference's recipe — ContrastiveLoss + Adam for the coarse
stage (/root/reference/training/coarse.py:32-60, losses.py:269-283),
offset_lambda * MSELoss + Adam for the fine stage
(/root/reference/training/fine.py:39-100, :220-223) with train-mode
BatchNorm running-stat updates — must match our jitted
make_coarse_train_step / make_fine_train_step step for step:

* the loss value at every step,
* every parameter leaf's GRADIENT at step 0 (torch grads pushed through the
  same structural converter as the weights — it is linear, so gradients map
  exactly like parameters),
* every parameter leaf after N Adam steps,
* every BatchNorm running mean/var after N steps.

Controlled deviations (see PARITY.md "Training dynamics"): dropout is
pinned to 0 on both sides (the RNG streams are framework-specific — at the
reference's p=0.1 the steps agree in distribution, not pointwise), batches
are fully valid (mask all-true) so the reference's attend/BN-over-padding
and our masked variants compute identical statistics, and augmentation
(flips / hint shuffling / point-cloud transforms) is disabled because the
draw order of the two frameworks' RNGs cannot be aligned. Everything else —
loss math, Adam (optax eps_root=0 == torch), BN momentum 0.1 with unbiased
running-var updates, LR — is exercised as the reference configures it.
"""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from test_full_model_convert import (  # noqa: E402
    E,
    RefCellRetrieval,
    RefCrossMatch,
    S,
    T,
    _model_cfg,
    _randomize_bn,
)

from text2loc_tpu.config import Config, TrainConfig  # noqa: E402
from text2loc_tpu.models import torch_convert as tc  # noqa: E402
from text2loc_tpu.models.cell_retrieval import CellRetrievalNetwork  # noqa: E402
from text2loc_tpu.models.cross_matcher import CrossMatch  # noqa: E402
from text2loc_tpu.models.text_embedding import HintTextEmbedder  # noqa: E402
from text2loc_tpu.training import steps as steps_lib  # noqa: E402

B = 8          # batch (contrastive needs in-batch negatives)
N_STEPS = 4
LR = 1e-3      # reference training/args.py:19


def _dynamics_config() -> Config:
    model = dataclasses.replace(_model_cfg(), dropout_rate=0.0)
    train = TrainConfig(
        batch_size=B, learning_rate=LR, lr_gamma=1.0,
        flip_poses=False, shuffle_hints=False, pc_augment=False,
        fine_flip_poses=False,
    )
    return Config(model=model, train=train).validate()


def _zero_dropout(module):
    for m in module.modules():
        if isinstance(m, tnn.Dropout):
            m.p = 0.0
        # MultiheadAttention keeps its attention-weight dropout as a FLOAT
        # attribute (used via F.dropout), not an nn.Dropout child.
        if isinstance(m, tnn.MultiheadAttention):
            m.dropout = 0.0


def _batch(seed: int, mcfg, fine: bool):
    rng = np.random.default_rng(seed)
    O = mcfg.object_size
    P = mcfg.pointnet.num_points
    b = dict(
        xyz=rng.random((B, O, P, 3)).astype(np.float32),
        rgb=rng.random((B, O, P, 3)).astype(np.float32),
        center=rng.random((B, O, 3)).astype(np.float32),
        color=rng.random((B, O, 3)).astype(np.float32),
        num_points=rng.integers(10, 5000, (B, O)).astype(np.float32),
        class_idx=rng.integers(0, 5, (B, O)).astype(np.int32),
        color_idx=np.zeros((B, O), np.int32),
        mask=np.ones((B, O), bool),
        token_embeds=rng.normal(size=(B, S, T, E)).astype(np.float32),
        token_mask=np.ones((B, S, T), bool),
        sentence_mask=np.ones((B, S), bool),
    )
    if fine:
        b["target"] = rng.random((B, 2)).astype(np.float32)
        b["pose_in_cell"] = b["target"].copy()
    return b


def _torch_inputs(b):
    return (
        torch.as_tensor(b["class_idx"], dtype=torch.long),
        torch.as_tensor(b["color"]),
        torch.as_tensor(b["center"]),
        torch.as_tensor(b["num_points"]).reshape(-1, b["num_points"].shape[1]),
        torch.as_tensor(b["token_embeds"]),
    )


def ref_contrastive(im, s, temperature):
    """Verbatim reference ContrastiveLoss semantics (losses.py:269-283)."""
    im = im / torch.norm(im, dim=1, keepdim=True)
    s = s / torch.norm(s, dim=1, keepdim=True)
    sim = torch.mm(im, s.transpose(1, 0).contiguous())
    pos = torch.diag(sim)
    num = torch.exp(pos / temperature)
    den = torch.exp(sim / temperature)
    all_losses = -torch.log(num / den.sum(dim=0)) - torch.log(num / den.sum(dim=1))
    return all_losses.mean()


def _torch_value_dict(model, grads: bool):
    """state_dict-shaped numpy dict of grads (params; zeros when untouched)
    or of current values. Non-parameter entries (BN running stats) always
    carry their VALUES so the converter's layout detection keeps working;
    the caller ignores the converted stats for gradient dicts."""
    named = dict(model.named_parameters())
    out = {}
    for k, v in model.state_dict().items():
        if grads and k in named:
            g = named[k].grad
            out[k] = (
                np.zeros(v.shape, np.float32)
                if g is None else g.detach().cpu().numpy().copy()
            )
        else:
            out[k] = v.detach().cpu().numpy().copy()
    return out


def _flatten(tree, prefix=""):
    if isinstance(tree, dict):
        out = {}
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}/{k}"))
        return out
    return {prefix: np.asarray(tree)}


def _grad_floor(grads_torch):
    """Noise floor separating REAL gradient leaves from structurally-null
    ones. Several parameters have mathematically-zero gradients that autograd
    realizes only as f32 cancellation noise on BOTH frameworks: a bias
    feeding a BatchNorm (BN subtracts the batch mean, so constant shifts
    cancel), attention key-projection biases (a constant added to every
    logit cancels in the softmax), and the bias feeding a post-LN residual
    norm. Their measured norms sit 6-9 orders below the global gradient
    norm; 1e-6 x global cleanly splits the populations (measured margins:
    >3x on both sides for both stages)."""
    fw = _flatten(grads_torch)
    gnorm = np.sqrt(sum(
        float(np.linalg.norm(v.astype(np.float64))) ** 2 for v in fw.values()
    ))
    return 1e-6 * gnorm


def _compare_grads(got, want, what, floor, rel_max=5e-3, cos_min=0.9999):
    """Per-leaf L2 + cosine gates (VERDICT round-3 next #1a); leaves under
    the null floor only need to be null on both sides."""
    fg, fw = _flatten(got), _flatten(want)
    assert set(fg) == set(fw), (what, set(fg) ^ set(fw))
    n_real = 0
    for k in sorted(fw):
        a, b = fg[k].astype(np.float64), fw[k].astype(np.float64)
        nb = np.linalg.norm(b)
        if nb < floor:
            assert np.linalg.norm(a) < 10 * floor, (what, k)
            continue
        n_real += 1
        rel = np.linalg.norm(a - b) / nb
        cos = float(np.dot(a.ravel(), b.ravel())
                    / (np.linalg.norm(a) * nb + 1e-30))
        assert rel < rel_max, (what, k, rel)
        assert cos > cos_min, (what, k, cos)
    assert n_real > 10, (what, "floor swallowed the tree", n_real)


def _compare_param_deltas(p0, ours, theirs, grads_torch, floor, what):
    """After N Adam steps: real leaves' update vectors must agree in
    direction (cosine; measured 0.99998+), and EVERY leaf must stay inside
    the Adam step-size envelope of its twin (|update| <= ~lr per component
    per step, so any two runs differ by < 2*N*lr per component; 4x slack).
    Null-gradient leaves get only the envelope gate: Adam normalizes their
    f32-noise gradients to full-size steps in framework-specific random
    directions on BOTH sides — the reference trains those dead directions
    the same way, equal in distribution, not pointwise."""
    f0, fj, ft = _flatten(p0), _flatten(ours), _flatten(theirs)
    fw = _flatten(grads_torch)
    envelope = 4 * N_STEPS * LR
    for k in sorted(f0):
        dj = (fj[k] - f0[k]).astype(np.float64)
        dt = (ft[k] - f0[k]).astype(np.float64)
        assert np.abs(dj - dt).max() <= envelope, (what, k)
        if np.linalg.norm(fw[k].astype(np.float64)) < floor:
            continue
        if np.linalg.norm(dt) == 0:       # leaf the optimizer never touched
            assert np.linalg.norm(dj) == 0, (what, k)
            continue
        cos = float(np.dot(dj.ravel(), dt.ravel())
                    / (np.linalg.norm(dj) * np.linalg.norm(dt) + 1e-30))
        assert cos > 0.999, (what, k, cos)


def _compare_stats(got, want, what, rel_max=2e-2):
    """BN running stats after N steps. Gate is looser than the grads': the
    running MEAN tracks pre-BN activations, which drift with the null-leaf
    biases Adam walks randomly on both sides (measured worst rel 4.6e-3 —
    the BN OUTPUT is invariant to that drift, the recorded mean is not)."""
    fg, fw = _flatten(got), _flatten(want)
    assert set(fg) == set(fw), (what, set(fg) ^ set(fw))
    for k in sorted(fw):
        a, b = fg[k].astype(np.float64), fw[k].astype(np.float64)
        rel = np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-30)
        assert rel < rel_max, (what, k, rel)


def _run_pair(kind):
    """Shared harness: returns per-step (torch_loss, jax_loss) plus the final
    converted-torch and ours (params, stats) trees and step-0 grad trees."""
    cfg = _dynamics_config()
    mcfg = cfg.model
    torch.manual_seed(3 if kind == "coarse" else 4)
    if kind == "coarse":
        ref = RefCellRetrieval()
        convert = tc.convert_cell_retrieval_checkpoint
        model = CellRetrievalNetwork(mcfg)
    else:
        ref = RefCrossMatch()
        convert = tc.convert_cross_matcher_checkpoint
        model = CrossMatch(mcfg)
    _randomize_bn(ref)
    _zero_dropout(ref)
    ref.train()

    params, stats = convert(tc.to_numpy(ref.state_dict()), mcfg)
    # to_numpy returns zero-copy VIEWS of the live torch tensors, and jax on
    # CPU can alias numpy buffers — without a deep copy, torch's in-place
    # opt.step() would silently mutate our converted state mid-run.
    params = jax.tree_util.tree_map(np.copy, params)
    stats = jax.tree_util.tree_map(np.copy, stats)
    embedder = HintTextEmbedder.compositional(
        mcfg.text_embed_dim, mcfg.max_hint_tokens
    )
    optimizer = steps_lib.make_optimizer(cfg, steps_per_epoch=1, lr=LR)
    state = steps_lib.TrainState(
        jax.tree_util.tree_map(jnp.asarray, params),
        jax.tree_util.tree_map(jnp.asarray, stats),
        optimizer.init(jax.tree_util.tree_map(jnp.asarray, params)),
        jnp.zeros((), jnp.int32),
    )
    make = (
        steps_lib.make_coarse_train_step
        if kind == "coarse" else steps_lib.make_fine_train_step
    )
    step = jax.jit(make(model, embedder, cfg, optimizer))

    opt = torch.optim.Adam(ref.parameters(), lr=LR)
    tloss_hist, jloss_hist = [], []
    grads_torch = grads_ours = None
    rng = jax.random.PRNGKey(0)
    temperature = cfg.train.loss.temperature
    lam = cfg.train.offset_lambda
    for i in range(N_STEPS):
        b = _batch(100 + i, mcfg, fine=kind == "fine")
        class_idx, colors, centers, nums, tokens = _torch_inputs(b)
        opt.zero_grad()
        if kind == "coarse":
            # anchor = text, positive = cell (reference coarse.py:44-52).
            anchor = ref.encode_text(tokens)
            positive = ref.encode_objects(class_idx, colors, centers, nums)
            tloss = ref_contrastive(anchor, positive, temperature)
        else:
            pred = ref(class_idx, colors, centers, nums, tokens)
            tloss = lam * tnn.functional.mse_loss(
                pred, torch.as_tensor(b["target"])
            )
        tloss.backward()
        if i == 0:
            grads_torch, _ = convert(_torch_value_dict(ref, grads=True), mcfg)
            grads_ours = _our_grads(model, cfg, state, b, kind)
        opt.step()
        tloss_hist.append(float(tloss.detach()))

        state, metrics = step(state, b, rng)
        jloss_hist.append(float(metrics["loss"]))

    fparams, fstats = convert(tc.to_numpy(ref.state_dict()), mcfg)
    return (
        tloss_hist, jloss_hist, grads_torch, grads_ours, params,
        (fparams, fstats),
        (jax.device_get(state.params), jax.device_get(state.batch_stats)),
    )


def _our_grads(model, cfg, state, b, kind):
    """Step-0 gradients through OUR training loss (mirrors the step body with
    augmentation disabled by config; dropout rate is 0 so the key is inert)."""
    from text2loc_tpu.training import losses

    embedder = HintTextEmbedder.compositional(
        cfg.model.text_embed_dim, cfg.model.max_hint_tokens
    )
    key = jax.random.PRNGKey(7)
    if kind == "coarse":
        objects, text = steps_lib.prepare_coarse_batch(
            b, embedder, cfg, key, train=True
        )

        def loss_of(p):
            (cell, text_emb), _ = model.apply(
                {"params": p, "batch_stats": state.batch_stats},
                objects, text, train=True, mutable=["batch_stats"],
                rngs={"dropout": key},
            )
            return losses.contrastive_loss(
                text_emb, cell, cfg.train.loss.temperature
            )
    else:
        fb = steps_lib.prepare_fine_batch(b, embedder, cfg, key, train=True)

        def loss_of(p):
            pred, _ = model.apply(
                {"params": p, "batch_stats": state.batch_stats},
                fb.objects, fb.text, train=True, mutable=["batch_stats"],
                rngs={"dropout": key},
            )
            return cfg.train.offset_lambda * jnp.mean((pred - fb.target) ** 2)

    return jax.device_get(jax.jit(jax.grad(loss_of))(state.params))


@pytest.mark.parametrize("kind", ["coarse", "fine"])
def test_training_dynamics_match_torch(kind):
    tl, jl, gt, go, p0, (tp, ts), (jp, js) = _run_pair(kind)
    # (1) loss trajectory over N steps — the end-to-end dynamics gate: any
    # divergence of the parameters along loss-relevant directions shows up
    # here (measured agreement ~1e-6 relative at step 3 on both stages).
    np.testing.assert_allclose(jl, tl, rtol=1e-4, atol=1e-6)
    floor = _grad_floor(gt)
    # (2) step-0 gradients, leaf by leaf (measured worst real-leaf rel:
    # 6.6e-6 coarse / 8.6e-4 fine; cosine 1.000000 on every real leaf).
    _compare_grads(go, gt, f"{kind} grads", floor)
    # (3) parameter updates after N Adam steps
    _compare_param_deltas(p0, jp, tp, gt, floor, f"{kind} params")
    # (4) BN running statistics after N steps
    _compare_stats(js, ts, f"{kind} batch_stats")
