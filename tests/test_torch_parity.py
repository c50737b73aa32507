"""Torch-parity golden tests.

The reference composes stock torch modules (TransformerEncoderLayer /
DecoderLayer, get_mlp Sequential with BatchNorm1d). These tests convert
randomly-initialized torch layers into our Flax modules via
models/torch_convert.py and assert forward equality — the strongest available
evidence that the TPU rebuild computes the reference's functions.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from text2loc_tpu.models import torch_convert as tc  # noqa: E402
from text2loc_tpu.models.mlp import MLP  # noqa: E402
from text2loc_tpu.models.transformer import (  # noqa: E402
    TorchDecoderLayer,
    TorchEncoderLayer,
)

D, H, FF = 32, 4, 64


def test_encoder_layer_parity():
    torch.manual_seed(0)
    layer = torch.nn.TransformerEncoderLayer(
        D, H, dim_feedforward=FF, batch_first=True
    ).eval()
    x = torch.randn(3, 7, D)
    with torch.no_grad():
        want = layer(x).numpy()

    sd = tc.to_numpy(layer.state_dict())
    params = tc.convert_encoder_layer(sd, "", H)
    ours = TorchEncoderLayer(d_model=D, num_heads=H, dim_feedforward=FF)
    got = ours.apply({"params": params}, jnp.asarray(x.numpy()), train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


def test_decoder_layer_parity():
    torch.manual_seed(1)
    layer = torch.nn.TransformerDecoderLayer(
        D, H, dim_feedforward=FF, batch_first=True
    ).eval()
    tgt = torch.randn(2, 5, D)
    mem = torch.randn(2, 9, D)
    with torch.no_grad():
        want = layer(tgt, mem).numpy()

    sd = tc.to_numpy(layer.state_dict())
    params = tc.convert_decoder_layer(sd, "", H)
    ours = TorchDecoderLayer(d_model=D, num_heads=H, dim_feedforward=FF)
    got = ours.apply(
        {"params": params}, jnp.asarray(tgt.numpy()), jnp.asarray(mem.numpy()),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


def _torch_get_mlp(channels, tail="relu"):
    """The reference's MLP flavors (language_encoder.py:16-74) in torch."""
    mods = []
    for i in range(len(channels) - 1):
        last = i == len(channels) - 2
        mods.append(torch.nn.Linear(channels[i], channels[i + 1]))
        if tail == "relu" or not last:
            mods.append(torch.nn.BatchNorm1d(channels[i + 1]))
            mods.append(torch.nn.ReLU())
        elif tail == "bn":
            mods.append(torch.nn.BatchNorm1d(channels[i + 1]))
    return torch.nn.Sequential(*mods)


@pytest.mark.parametrize("tail", ["relu", "bn"])
def test_mlp_bn_parity_eval(tail):
    torch.manual_seed(2)
    channels = (6, 16, 8)
    net = _torch_get_mlp(channels, tail).eval()
    # Fill running stats with something non-trivial.
    with torch.no_grad():
        for m in net:
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    x = torch.randn(10, channels[0])
    with torch.no_grad():
        want = net(x).numpy()

    sd = tc.to_numpy(net.state_dict())
    params, stats = tc.convert_mlp(sd, "", len(channels) - 1, batchnorm=True)
    ours = MLP(channels=channels, tail=tail)
    got = ours.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x.numpy()), train=False
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


def test_mlp_bn_parity_train_stats():
    """Training mode: batch statistics + running-stat update match torch."""
    torch.manual_seed(3)
    channels = (4, 8)
    net = _torch_get_mlp(channels, "relu").train()
    x = torch.randn(16, 4)
    want = net(x).detach().numpy()
    torch_mean = net[1].running_mean.detach().numpy().copy()
    torch_var = net[1].running_var.detach().numpy().copy()

    # Rebuild from the PRE-update state dict: reset running stats.
    net2 = _torch_get_mlp(channels, "relu")
    net2.load_state_dict(net.state_dict())
    net2[1].running_mean.zero_()
    net2[1].running_var.fill_(1.0)
    sd = tc.to_numpy(net2.state_dict())
    params, stats = tc.convert_mlp(sd, "", 1, batchnorm=True)

    ours = MLP(channels=channels, tail="relu")
    got, updates = ours.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x.numpy()),
        train=True, mutable=["batch_stats"],
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(updates["batch_stats"]["bn_0"]["mean"]), torch_mean,
        atol=2e-5, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(updates["batch_stats"]["bn_0"]["var"]), torch_var,
        atol=2e-5, rtol=1e-4,
    )
