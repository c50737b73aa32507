"""Torch state_dict -> Flax params converters.

Two jobs:
* load the published pretrained PointNet++ checkpoint
  (`pointnet_acc0.86_lr1_p256.pth`, referenced at
  /root/reference/models/object_encoder.py:50 and README.md:38-40) into the
  TPU PointNet2;
* back the torch-parity golden tests: convert randomly-initialized torch
  layers (nn.TransformerEncoderLayer / DecoderLayer / Linear / BatchNorm1d)
  into our Flax modules and assert forward equality.

All converters consume plain dicts of numpy arrays (call `to_numpy` on a torch
state_dict first), so torch is only needed by the caller.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def to_numpy(state_dict: Mapping) -> Dict[str, np.ndarray]:
    """Detach a torch state_dict into numpy (torch import stays caller-side)."""
    return {k: np.asarray(v.detach().cpu().numpy()) for k, v in state_dict.items()}


def convert_linear(sd: Mapping[str, np.ndarray], prefix: str) -> Dict:
    """torch nn.Linear -> flax nn.Dense {kernel, bias}."""
    out = {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T)}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def convert_layernorm(sd: Mapping[str, np.ndarray], prefix: str) -> Dict:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def convert_batchnorm(sd: Mapping[str, np.ndarray], prefix: str):
    """torch nn.BatchNorm1d -> (params, batch_stats) for MaskedBatchNorm."""
    params = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
    stats = {
        "mean": sd[f"{prefix}.running_mean"],
        "var": sd[f"{prefix}.running_var"],
    }
    return params, stats


def convert_mha(sd: Mapping[str, np.ndarray], prefix: str, num_heads: int) -> Dict:
    """torch nn.MultiheadAttention -> flax MultiHeadDotProductAttention.

    torch packs q/k/v into in_proj_weight [3D, D] (row-major out-features
    first); flax wants per-head kernels [D, H, Dh].
    """
    w = sd[f"{prefix}.in_proj_weight"]
    b = sd[f"{prefix}.in_proj_bias"]
    d = w.shape[1]
    dh = d // num_heads
    out = {}
    for i, name in enumerate(("query", "key", "value")):
        wi = w[i * d : (i + 1) * d]             # [D_out, D_in]
        bi = b[i * d : (i + 1) * d]
        out[name] = {
            "kernel": np.ascontiguousarray(wi.T).reshape(d, num_heads, dh),
            "bias": bi.reshape(num_heads, dh),
        }
    wo = sd[f"{prefix}.out_proj.weight"]        # [D, D]
    out["out"] = {
        "kernel": np.ascontiguousarray(wo.T).reshape(num_heads, dh, d),
        "bias": sd[f"{prefix}.out_proj.bias"],
    }
    return out


def convert_encoder_layer(sd: Mapping[str, np.ndarray], prefix: str,
                          num_heads: int) -> Dict:
    """torch nn.TransformerEncoderLayer -> params for TorchEncoderLayer."""
    p = f"{prefix}." if prefix else ""
    return {
        "self_attn": convert_mha(sd, f"{p}self_attn", num_heads),
        "linear1": convert_linear(sd, f"{p}linear1"),
        "linear2": convert_linear(sd, f"{p}linear2"),
        "norm1": convert_layernorm(sd, f"{p}norm1"),
        "norm2": convert_layernorm(sd, f"{p}norm2"),
    }


def convert_decoder_layer(sd: Mapping[str, np.ndarray], prefix: str,
                          num_heads: int) -> Dict:
    """torch nn.TransformerDecoderLayer -> params for TorchDecoderLayer."""
    p = f"{prefix}." if prefix else ""
    return {
        "self_attn": convert_mha(sd, f"{p}self_attn", num_heads),
        "cross_attn": convert_mha(sd, f"{p}multihead_attn", num_heads),
        "linear1": convert_linear(sd, f"{p}linear1"),
        "linear2": convert_linear(sd, f"{p}linear2"),
        "norm1": convert_layernorm(sd, f"{p}norm1"),
        "norm2": convert_layernorm(sd, f"{p}norm2"),
        "norm3": convert_layernorm(sd, f"{p}norm3"),
    }


def _mlp_layer_prefixes(sd: Mapping[str, np.ndarray], prefix: str,
                        batchnorm: bool = True):
    """Discover (linear_prefix, bn_prefix|None) per layer of a reference MLP.

    The reference's get_mlp/get_mlp2 build a Sequential of per-layer
    Sequential(Linear, BN[, ReLU]) (language_encoder.py:16-74), so the real
    published checkpoints carry NESTED keys `{p}{i}.0.weight` / `{p}{i}.1.*`.
    get_mlp_offset (cross_matcher.py:17-36) and some external assets use a
    FLAT Sequential (`{p}{3i}.weight` with BN, `{p}{2i}.weight` without).
    Both layouts are detected here.
    """
    p = f"{prefix}." if prefix else ""
    layers = []
    if f"{p}0.0.weight" in sd:                       # nested (reference get_mlp)
        i = 0
        while f"{p}{i}.0.weight" in sd:
            bn = f"{p}{i}.1" if f"{p}{i}.1.running_mean" in sd else None
            layers.append((f"{p}{i}.0", bn))
            i += 1
    else:                                            # flat Sequential
        stride = 3 if batchnorm else 2
        i = 0
        while f"{p}{stride * i}.weight" in sd:
            bn = (
                f"{p}{stride * i + 1}"
                if f"{p}{stride * i + 1}.running_mean" in sd
                else None
            )
            layers.append((f"{p}{stride * i}", bn))
            i += 1
    if not layers:
        raise KeyError(f"no MLP weights under {prefix!r}")
    return layers


def convert_mlp(sd: Mapping[str, np.ndarray], prefix: str,
                num_layers: int | None = None, batchnorm: bool = True):
    """Reference get_mlp/get_mlp2/get_mlp_offset torch Sequential -> our MLP.

    Handles both the nested layout the reference's get_mlp actually produces
    and the flat layout (see _mlp_layer_prefixes). Returns (params, stats).
    """
    layers = _mlp_layer_prefixes(sd, prefix, batchnorm=batchnorm)
    if num_layers is not None and len(layers) != num_layers:
        raise KeyError(
            f"expected {num_layers} layers under {prefix!r}, found {len(layers)}"
        )
    params: Dict = {}
    stats: Dict = {}
    for i, (lin, bn) in enumerate(layers):
        params[f"dense_{i}"] = convert_linear(sd, lin)
        if bn is not None:
            bn_p, bn_s = convert_batchnorm(sd, bn)
            params[f"bn_{i}"] = bn_p
            stats[f"bn_{i}"] = bn_s
    return params, stats


# ---------------------------------------------------------------------------
# Pretrained PointNet++ checkpoint (Text2Pos asset)
# ---------------------------------------------------------------------------


def convert_pointnet_checkpoint(sd: Mapping[str, np.ndarray], num_sa: int = 3):
    """Map the reference PointNet2 state_dict onto our PointNet2 params.

    Reference module layout (models/pointcloud/pointnet2.py:52-78): sa{i} are
    SetAbstractionLayer(point_conv=PointNetConv(local_nn=get_mlp(...))),
    global abstraction `ga.nn` = get_mlp(...), heads lin1/lin2, classifiers
    class_classifier/color_classifier. PyG PointNetConv stores the MLP under
    `point_conv.local_nn` (alias `point_conv.nn` in older PyG versions).

    Returns (params, batch_stats) trees matching text2loc_tpu PointNet2.
    """

    def has_mlp(prefix: str) -> bool:
        return f"{prefix}.0.weight" in sd or f"{prefix}.0.0.weight" in sd

    params: Dict = {}
    stats: Dict = {}
    for i in range(1, num_sa + 1):
        for cand in (f"sa{i}.point_conv.local_nn", f"sa{i}.point_conv.nn"):
            if has_mlp(cand):
                p, s = convert_mlp(sd, cand, batchnorm=True)
                break
        else:
            raise KeyError(f"sa{i} local_nn not found")
        # SetAbstraction declares flat raw params (dense_l_kernel/... ) so the
        # fused inference kernel can fold BN affines — flatten accordingly.
        flat_p, flat_s = {}, {}
        for l in range(len(p) // 2):
            flat_p[f"dense_{l}_kernel"] = p[f"dense_{l}"]["kernel"]
            flat_p[f"dense_{l}_bias"] = p[f"dense_{l}"]["bias"]
            flat_p[f"bn_{l}_scale"] = p[f"bn_{l}"]["scale"]
            flat_p[f"bn_{l}_bias"] = p[f"bn_{l}"]["bias"]
            flat_s[f"bn_{l}_mean"] = s[f"bn_{l}"]["mean"]
            flat_s[f"bn_{l}_var"] = s[f"bn_{l}"]["var"]
        params[f"sa{i}"] = flat_p
        stats[f"sa{i}"] = flat_s

    # Reference GlobalAbstractionLayer stores its MLP as `self.mlp`
    # (pointnet2.py:40-43); older assets used `nn`.
    for cand in ("ga.mlp", "ga.nn", "ga.local_nn"):
        if has_mlp(cand):
            p, s = convert_mlp(sd, cand, batchnorm=True)
            break
    else:
        raise KeyError("global abstraction MLP not found")
    params["ga"] = {"MLP_0": p}
    stats["ga"] = {"MLP_0": s}

    for ours, theirs in (
        ("lin1", "lin1"), ("lin2", "lin2"),
        ("class_classifier", "class_classifier"),
        ("color_classifier", "color_classifier"),
    ):
        params[ours] = convert_linear(sd, theirs)
    return params, stats


# ---------------------------------------------------------------------------
# Full-model checkpoints (published coarse.pth / fine.pth)
# ---------------------------------------------------------------------------
#
# The reference's eval story starts from torch.load(coarse.pth / fine.pth) +
# load_state_dict(strict=False) (/root/reference/evaluation/pipeline.py:245-267)
# where the checkpoints were saved with every `llm_model` (frozen T5) key
# stripped (training/coarse.py:327-332). The converters below map those whole
# state_dicts onto CellRetrievalNetwork / CrossMatch param trees; frozen-text
# and any other absent pieces keep their initialized values (the strict=False
# equivalent).


def _subdict(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    p = f"{prefix}."
    return {k[len(p):]: v for k, v in sd.items() if k.startswith(p)}


def convert_object_encoder(sd: Mapping[str, np.ndarray], prefix: str, cfg):
    """Reference ObjectEncoder state_dict -> our ObjectEncoder (params, stats).

    Module map (reference models/object_encoder.py:26-64 -> ours):
      pointnet.*        -> pointnet        (when the PointNet path is active)
      mlp_pointnet      -> mlp_pointnet
      class_embedding   -> class_embedding (class_embed path; direct row copy —
                           both sides use row 0 for <unk>/pad and row i+1 for
                           class i in KNOWN_CLASS order)
      color_embedding   -> color_embedding (color_embed path; the reference
                           indexes colors 0..7 with padding_idx=0 OVERLAPPING
                           color 0 (:35-37) — our row j+1 <- their row j,
                           row 0 stays zero)
      color_encoder / pos_encoder / num_encoder / mlp_merge -> same names
    """
    p = f"{prefix}." if prefix else ""
    params: Dict = {}
    stats: Dict = {}
    use = cfg.use_features

    def mlp(name):
        mp, ms = convert_mlp(sd, f"{p}{name}")
        params[name] = mp
        if ms:
            stats[name] = ms

    if "class" in use and not cfg.class_embed:
        pn_sd = _subdict(sd, f"{p}pointnet")
        if pn_sd:
            pn_p, pn_s = convert_pointnet_checkpoint(pn_sd)
            params["pointnet"] = pn_p
            stats["pointnet"] = pn_s
        mlp("mlp_pointnet")
    elif "class" in use:
        from text2loc_tpu import constants as C

        # The reference's rows are ordered ALPHABETICALLY: known_classes =
        # {c: i+1 for i, c in enumerate(list(np.unique(labels)))} with
        # "<unk>" at 0 (object_encoder.py:31-33, cells.py:180-184 via
        # np.unique). Our model indexes class_idx+1 with class_idx in
        # CLASS_TO_INDEX order — permute rows accordingly (a verbatim copy
        # binds every class to the wrong embedding).
        w = sd[f"{p}class_embedding.weight"]
        tbl = np.zeros_like(np.asarray(w))
        tbl[0] = w[0]
        for c, j in C.CLASS_TO_INDEX.items():
            tbl[j + 1] = w[C.KNOWN_CLASSES.index(c) + 1]
        params["class_embedding"] = {"embedding": tbl}

    if "color" in use:
        if cfg.color_embed:
            from text2loc_tpu import constants as C

            # The reference keys colors by NAME: known_colors = {c: i for
            # i, c in enumerate(COLOR_NAMES)} + {"<unk>": 0}
            # (object_encoder.py:35-37), looked up WITHOUT +1
            # (object_encoder.py:83). The duplicate "gray" makes row 1
            # unreachable ("gray" -> 4), and "dark-green" shares the frozen
            # padding row 0 with "<unk>" — reproduce exactly that mapping
            # for our centroid-indexed (+1) table.
            w = np.asarray(sd[f"{p}color_embedding.weight"])
            ref_idx = {name: i for i, name in enumerate(C.COLOR_NAMES)}
            tbl = np.zeros((C.NUM_COLORS + 1, w.shape[1]), w.dtype)
            for j, name in enumerate(C.COLOR_NAMES):
                tbl[j + 1] = w[ref_idx[name]]
            params["color_embedding"] = {"embedding": tbl}
        else:
            mlp("color_encoder")

    if "position" in use:
        mlp("pos_encoder")
    if "num" in use:
        mlp("num_encoder")
    if len(use) > 1:
        mlp("mlp_merge")
    return params, stats


def convert_language_encoder(
    sd: Mapping[str, np.ndarray], prefix: str, is_fine: bool,
    intra_num_heads: int, inter_num_heads: int = 4,
):
    """Reference LanguageEncoder (minus frozen T5) -> our LanguageEncoder.

    intra_module.{i} -> intra_{i}; inter_mlp -> inter_mlp; coarse-only
    inter_module.{i} -> inter_{i} (reference language_encoder.py:98-103).
    llm_model.* keys (stripped from published checkpoints anyway) are ignored:
    the frozen text embedding lives outside the model here.
    """
    p = f"{prefix}." if prefix else ""
    params: Dict = {}
    stats: Dict = {}
    i = 0
    while f"{p}intra_module.{i}.self_attn.in_proj_weight" in sd:
        params[f"intra_{i}"] = convert_encoder_layer(
            sd, f"{p}intra_module.{i}", intra_num_heads
        )
        i += 1
    if i == 0:
        raise KeyError(f"no intra_module layers under {prefix!r}")
    mp, ms = convert_mlp(sd, f"{p}inter_mlp")
    params["inter_mlp"] = mp
    if ms:
        stats["inter_mlp"] = ms
    if not is_fine:
        i = 0
        while f"{p}inter_module.{i}.self_attn.in_proj_weight" in sd:
            params[f"inter_{i}"] = convert_encoder_layer(
                sd, f"{p}inter_module.{i}", inter_num_heads
            )
            i += 1
        if i == 0:
            raise KeyError(f"no inter_module layers under {prefix!r}")
    return params, stats


def convert_cell_retrieval_checkpoint(sd: Mapping[str, np.ndarray], cfg):
    """Published coarse checkpoint -> CellRetrievalNetwork (params, stats).

    `cfg` is a ModelConfig; layer/head counts must match the checkpoint's
    training configuration. Reference module names: object_encoder,
    obj_inter_module.{i} (cell_retrieval.py:31-49), language_encoder.
    """
    params: Dict = {}
    stats: Dict = {}
    oe_p, oe_s = convert_object_encoder(sd, "object_encoder", cfg)
    params["object_encoder"] = oe_p
    if oe_s:
        stats["object_encoder"] = oe_s
    i = 0
    while f"obj_inter_module.{i}.self_attn.in_proj_weight" in sd:
        params[f"obj_inter_{i}"] = convert_encoder_layer(
            sd, f"obj_inter_module.{i}", cfg.object_inter_num_heads
        )
        i += 1
    if i != cfg.object_inter_num_layers:
        raise KeyError(
            f"checkpoint has {i} obj_inter layers, config expects "
            f"{cfg.object_inter_num_layers}"
        )
    le_p, le_s = convert_language_encoder(
        sd, "language_encoder", is_fine=False,
        intra_num_heads=cfg.intra_num_heads, inter_num_heads=cfg.inter_num_heads,
    )
    params["language_encoder"] = le_p
    if le_s:
        stats["language_encoder"] = le_s
    return params, stats


def convert_cross_matcher_checkpoint(sd: Mapping[str, np.ndarray], cfg):
    """Published fine checkpoint -> CrossMatch (params, stats).

    Reference module names: object_encoder, language_encoder, paired
    cross_objects.{i}/cross_hints.{i} decoder stacks — or a single bare
    `cross_hints` decoder layer when fine_num_decoder_layers == 0
    (cross_matcher.py:68-80) — and mlp_offsets (get_mlp_offset, flat
    Linear/ReLU Sequential).
    """
    params: Dict = {}
    stats: Dict = {}
    oe_p, oe_s = convert_object_encoder(sd, "object_encoder", cfg)
    params["object_encoder"] = oe_p
    if oe_s:
        stats["object_encoder"] = oe_s
    le_p, le_s = convert_language_encoder(
        sd, "language_encoder", is_fine=True,
        intra_num_heads=cfg.fine_intra_num_heads,
    )
    params["language_encoder"] = le_p
    if le_s:
        stats["language_encoder"] = le_s

    heads = cfg.fine_num_decoder_heads
    if "cross_hints.self_attn.in_proj_weight" in sd:   # single-layer fallback
        params["cross_hints_0"] = convert_decoder_layer(sd, "cross_hints", heads)
    else:
        i = 0
        while f"cross_hints.{i}.self_attn.in_proj_weight" in sd:
            params[f"cross_hints_{i}"] = convert_decoder_layer(
                sd, f"cross_hints.{i}", heads
            )
            params[f"cross_objects_{i}"] = convert_decoder_layer(
                sd, f"cross_objects.{i}", heads
            )
            i += 1
        if i != cfg.fine_num_decoder_layers:
            raise KeyError(
                f"checkpoint has {i} decoder layers, config expects "
                f"{cfg.fine_num_decoder_layers}"
            )
    mo_p, _ = convert_mlp(sd, "mlp_offsets", batchnorm=False)
    params["mlp_offsets"] = mo_p
    return params, stats


def _graft(base, new):
    """Recursively overlay `new` onto dict tree `base` (strict=False load:
    anything absent from the checkpoint keeps its initialized value)."""
    out = dict(base)
    for k, v in new.items():
        if isinstance(v, dict) and isinstance(out.get(k), Mapping):
            out[k] = _graft(out[k], v)
        else:
            out[k] = v
    return out


def load_torch_tower(path: str, cfg, kind: str, params=None, batch_stats=None):
    """Load a published .pth into (params, batch_stats) for one tower.

    kind: "coarse" (CellRetrievalNetwork) or "fine" (CrossMatch). When
    initialized trees are passed, converted values are grafted onto them
    (strict=False semantics); otherwise the converted trees are returned bare.
    Requires torch to deserialize the .pth.
    """
    import torch

    sd = to_numpy(torch.load(path, map_location="cpu", weights_only=False))
    if kind == "coarse":
        p, s = convert_cell_retrieval_checkpoint(sd, cfg)
    elif kind == "fine":
        p, s = convert_cross_matcher_checkpoint(sd, cfg)
    else:
        raise ValueError(kind)
    if params is not None:
        p = _graft(params, p)
    if batch_stats is not None:
        s = _graft(batch_stats, s)
    return p, s


def load_pretrained_pointnet(params, batch_stats, path: str):
    """Graft the published PointNet checkpoint into a model's param tree.

    The reference loads `pointnet_acc0.86_lr1_p256.pth` into its ObjectEncoder
    (object_encoder.py:47-50). Our towers nest PointNet2 at
    params["object_encoder"]["pointnet"]. Returns updated (params, stats);
    requires torch to deserialize the .pth.
    """
    import torch

    sd = to_numpy(torch.load(path, map_location="cpu"))
    pn_params, pn_stats = convert_pointnet_checkpoint(sd)
    params = dict(params)
    oe = dict(params["object_encoder"])
    oe["pointnet"] = pn_params
    params["object_encoder"] = oe
    batch_stats = dict(batch_stats)
    oe_s = dict(batch_stats.get("object_encoder", {}))
    oe_s["pointnet"] = pn_stats
    batch_stats["object_encoder"] = oe_s
    return params, batch_stats
