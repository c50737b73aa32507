"""MLP factories with torch-parity normalization semantics.

The reference builds three MLP flavors that differ only in their tails
(a quirk that matters for output parity — SURVEY.md section 7.1):

* `get_mlp`  — Linear + BatchNorm1d + ReLU after EVERY layer, including the
  last (/root/reference/models/language_encoder.py:16-41).
* `get_mlp2` — same, but the last layer is Linear + BatchNorm only
  (language_encoder.py:43-74).
* `get_mlp_offset` — plain Linear/ReLU, nothing after the last Linear
  (cross_matcher.py:17-36).

BatchNorm here is computed over the flattened element axis. Because our arrays
carry padding, statistics must be computed over *real* elements only —
`MaskedBatchNorm` does exactly that (and syncs across the data-parallel mesh
axis automatically when run under pjit, since jnp reductions become global
collectives under sharding).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over all leading axes, counting only masked-valid elements.

    Matches torch.nn.BatchNorm1d defaults: eps=1e-5, momentum=0.1 (i.e. the
    running stat keeps 0.9 of its value per step), affine, biased batch
    variance for normalization and unbiased for the running update.
    """

    features: int
    eps: float = 1e-5
    momentum: float = 0.1

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        orig_dtype = x.dtype
        reduce_axes = tuple(range(x.ndim - 1))

        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)

        if train:
            # Statistics in f32; XLA fuses the cast into the reductions (no
            # f32 copy of x materializes).
            x32 = x.astype(jnp.float32)
            if mask is None:
                count = jnp.array(
                    float(x32.size // self.features), dtype=jnp.float32
                )
                mean = jnp.mean(x32, axis=reduce_axes)
                var = jnp.mean((x32 - mean) ** 2, axis=reduce_axes)
            else:
                m = jnp.asarray(mask, bool)
                while m.ndim < x32.ndim:
                    m = m[..., None]
                m = m.astype(jnp.float32)
                count = jnp.maximum(jnp.sum(m), 1.0)
                mean = jnp.sum(x32 * m, axis=reduce_axes) / count
                var = jnp.sum(((x32 - mean) ** 2) * m, axis=reduce_axes) / count
            if not self.is_initializing():
                unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        # Apply as one folded affine in the input dtype: y = x*a + b with
        # f32-precomputed per-channel a/b. Avoids materializing a full-size
        # f32 copy of x (the SA edge tensors are GBs in the hot path) while
        # keeping f32 statistics precision.
        inv = jnp.reciprocal(jnp.sqrt(var + self.eps))
        a = (scale * inv).astype(orig_dtype)
        b = (bias - mean * scale * inv).astype(orig_dtype)
        return x * a + b


class MLP(nn.Module):
    """Stack of Linear[+BatchNorm][+ReLU] blocks.

    tail: 'relu'  — BN+ReLU after every layer incl. last (reference get_mlp)
          'bn'    — last layer Linear+BN only (reference get_mlp2)
          'none'  — last layer plain Linear, inner layers Linear+ReLU
                    (reference get_mlp_offset)
    """

    channels: Sequence[int]
    tail: str = "relu"
    add_batchnorm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        assert self.tail in ("relu", "bn", "none")
        dims = list(self.channels)
        n_layers = len(dims) - 1
        for i in range(n_layers):
            last = i == n_layers - 1
            x = nn.Dense(dims[i + 1], dtype=self.dtype, name=f"dense_{i}")(x)
            if self.tail == "none":
                if not last:
                    x = nn.relu(x)
                continue
            # tail "relu"/"bn": BN on every layer; ReLU on every layer
            # except a "bn"-tail's last.
            if self.add_batchnorm:
                x = MaskedBatchNorm(dims[i + 1], name=f"bn_{i}")(x, mask=mask, train=train)
            if not last or self.tail == "relu":
                x = nn.relu(x)
        return x


def get_mlp(channels, dtype=jnp.float32, name=None) -> MLP:
    """Trailing BN+ReLU on every layer (reference language_encoder.py:16)."""
    return MLP(channels=tuple(channels), tail="relu", dtype=dtype, name=name)


def get_mlp2(channels, dtype=jnp.float32, name=None) -> MLP:
    """No ReLU after the final layer (reference language_encoder.py:43)."""
    return MLP(channels=tuple(channels), tail="bn", dtype=dtype, name=name)


def get_mlp_offset(channels, dtype=jnp.float32, name=None) -> MLP:
    """Plain regressor MLP (reference cross_matcher.py:17)."""
    return MLP(
        channels=tuple(channels), tail="none", add_batchnorm=False, dtype=dtype,
        name=name,
    )
