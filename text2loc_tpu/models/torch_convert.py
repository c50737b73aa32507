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


def convert_mlp(sd: Mapping[str, np.ndarray], prefix: str, num_layers: int,
                batchnorm: bool = True):
    """Reference get_mlp/get_mlp2-style torch Sequential -> our MLP module.

    The reference builds Sequential([Linear, BN, ReLU] * L) (get_mlp,
    language_encoder.py:16-41) so Linear sits at index 3k and BN at 3k+1;
    without batchnorm ([Linear, ReLU] * L) Linear sits at 2k.
    """
    p = f"{prefix}." if prefix else ""
    params: Dict = {}
    stats: Dict = {}
    stride = 3 if batchnorm else 2
    for i in range(num_layers):
        params[f"dense_{i}"] = convert_linear(sd, f"{p}{stride * i}")
        if batchnorm:
            bn_p, bn_s = convert_batchnorm(sd, f"{p}{stride * i + 1}")
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

    def mlp_at(prefix: str):
        n = 0
        while f"{prefix}.{3 * n}.weight" in sd:
            n += 1
        assert n > 0, f"no MLP weights under {prefix}"
        return convert_mlp(sd, prefix, n, batchnorm=True)

    params: Dict = {}
    stats: Dict = {}
    for i in range(1, num_sa + 1):
        for cand in (f"sa{i}.point_conv.local_nn", f"sa{i}.point_conv.nn"):
            if f"{cand}.0.weight" in sd:
                p, s = mlp_at(cand)
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

    for cand in ("ga.nn", "ga.mlp", "ga.local_nn"):
        if f"{cand}.0.weight" in sd:
            p, s = mlp_at(cand)
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
