"""Reference-layout torch state dicts for the SMALL test config.

Builds `coarse.pth`/`fine.pth`-shaped checkpoints (the published key layout:
nested get_mlp Sequentials, PointNet object path, intra/inter language stacks,
paired cross decoder stacks — /root/reference/models/*.py) at
small_test_config dimensions, for driving the converters and the parity
script end to end without the real assets.
"""

from __future__ import annotations


def make_coarse_state_dict(cfg):
    """cfg: small_test_config().model -> reference CellRetrievalNetwork sd."""
    import torch

    from test_full_model_convert import ref_get_mlp, ref_get_mlp2
    from test_pointnet_convert import make_pointnet_state_dict

    torch.manual_seed(7)
    sd = {}
    for k, v in make_pointnet_state_dict(cfg.pointnet, nested=True).items():
        sd[f"object_encoder.pointnet.{k}"] = v
    d = cfg.coarse_embed_dim
    pn_dim = cfg.pointnet.head_dims[1]
    for name, net in {
        "object_encoder.mlp_pointnet": ref_get_mlp([pn_dim, d]),
        "object_encoder.color_encoder": ref_get_mlp([3, 64, d]),
        "object_encoder.pos_encoder": ref_get_mlp([3, 64, d]),
        "object_encoder.num_encoder": ref_get_mlp([1, 64, d]),
        "object_encoder.mlp_merge": ref_get_mlp([4 * d, d]),
        "language_encoder.inter_mlp": ref_get_mlp2([cfg.text_embed_dim, d]),
    }.items():
        for k, v in net.state_dict().items():
            sd[f"{name}.{k}"] = v
    for i in range(cfg.object_inter_num_layers):
        layer = torch.nn.TransformerEncoderLayer(
            d, cfg.object_inter_num_heads, dim_feedforward=2 * d
        )
        for k, v in layer.state_dict().items():
            sd[f"obj_inter_module.{i}.{k}"] = v
    for i in range(cfg.intra_num_layers):
        layer = torch.nn.TransformerEncoderLayer(
            cfg.text_embed_dim, cfg.intra_num_heads,
            dim_feedforward=4 * cfg.text_embed_dim,
        )
        for k, v in layer.state_dict().items():
            sd[f"language_encoder.intra_module.{i}.{k}"] = v
    for i in range(cfg.inter_num_layers):
        layer = torch.nn.TransformerEncoderLayer(
            d, cfg.inter_num_heads, dim_feedforward=4 * d
        )
        for k, v in layer.state_dict().items():
            sd[f"language_encoder.inter_module.{i}.{k}"] = v
    return sd


def make_fine_state_dict(cfg):
    """cfg: small_test_config().model -> reference CrossMatch sd."""
    import torch

    from test_full_model_convert import (
        ref_get_mlp,
        ref_get_mlp2,
        ref_get_mlp_offset,
    )
    from test_pointnet_convert import make_pointnet_state_dict

    torch.manual_seed(11)
    sd = {}
    for k, v in make_pointnet_state_dict(cfg.pointnet, nested=True).items():
        sd[f"object_encoder.pointnet.{k}"] = v
    d = cfg.fine_embed_dim
    pn_dim = cfg.pointnet.head_dims[1]
    for name, net in {
        "object_encoder.mlp_pointnet": ref_get_mlp([pn_dim, d]),
        "object_encoder.color_encoder": ref_get_mlp([3, 64, d]),
        "object_encoder.pos_encoder": ref_get_mlp([3, 64, d]),
        "object_encoder.num_encoder": ref_get_mlp([1, 64, d]),
        "object_encoder.mlp_merge": ref_get_mlp([4 * d, d]),
        "language_encoder.inter_mlp": ref_get_mlp2([cfg.text_embed_dim, d]),
        "mlp_offsets": ref_get_mlp_offset([d, d // 2, 2]),
    }.items():
        for k, v in net.state_dict().items():
            sd[f"{name}.{k}"] = v
    for i in range(cfg.fine_intra_num_layers):
        layer = torch.nn.TransformerEncoderLayer(
            cfg.text_embed_dim, cfg.fine_intra_num_heads,
            dim_feedforward=4 * cfg.text_embed_dim,
        )
        for k, v in layer.state_dict().items():
            sd[f"language_encoder.intra_module.{i}.{k}"] = v
    for i in range(cfg.fine_num_decoder_layers):
        for stack in ("cross_hints", "cross_objects"):
            layer = torch.nn.TransformerDecoderLayer(
                d_model=d, nhead=cfg.fine_num_decoder_heads,
                dim_feedforward=4 * d,
            )
            for k, v in layer.state_dict().items():
                sd[f"{stack}.{i}.{k}"] = v
    return sd
