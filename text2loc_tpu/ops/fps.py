"""Farthest-point sampling (FPS) on fixed-shape point batches.

TPU-native replacement for torch-cluster's `gnn.fps` CUDA kernel
(/root/reference/models/pointcloud/pointnet2.py:26). Differences by design:

* Static output size S (the reference's ratio 0.5 on 256 points is the fixed
  ladder 256 -> 128 -> 64 -> 32), so shapes stay compilation-friendly.
* Deterministic start at point 0 instead of torch-cluster's random start; FPS
  coverage is near-identical and determinism simplifies tests/golden values.
* Fully batched over N objects: one [N, P] distance field updated S times
  inside `lax.fori_loop` — XLA fuses each round into a single VPU pass.

A fused Pallas kernel (the whole selection loop in VMEM) lives in
`text2loc_tpu.ops.pallas_fps` and is used automatically on TPU backends for
large batches; this module is the portable XLA path and the numerical oracle.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp


def _pallas_tile(n: int) -> int:
    """Largest power-of-two tile <= cap dividing n (0 if below min sublane).

    Tile-size sweep on chip (scripts/probe_stages.py): 64 fastest at serving
    batch sizes (4.42 ms vs 4.78 at 128/256 for one 2048x256->128 pass);
    TEXT2LOC_FPS_TILE overrides."""
    cap = int(os.environ.get("TEXT2LOC_FPS_TILE", "64"))
    tile = math.gcd(n, cap)
    return tile if tile >= 8 else 0


def farthest_point_sampling(points: jax.Array, num_samples: int) -> jax.Array:
    """FPS dispatch: fused Pallas kernel on TPU backends, XLA loop elsewhere.

    Both paths implement the same algorithm (first-max argmax tie-breaking)
    and are bit-equal under one compiler (asserted in interpret-mode tests);
    across Mosaic vs XLA on real TPUs, float contraction (FMA) can perturb
    distance ties and legitimately select different far points — harmless, as
    the reference's torch-cluster FPS is random-start anyway
    (pointnet2.py:26). Set TEXT2LOC_DISABLE_PALLAS=1 to force XLA.
    """
    n = points.shape[0]
    tile = _pallas_tile(n)
    if (
        tile
        and jax.default_backend() not in ("cpu", "gpu")
        and not os.environ.get("TEXT2LOC_DISABLE_PALLAS")
    ):
        from text2loc_tpu.ops.pallas_fps import farthest_point_sampling_pallas

        # stop_gradient: selection indices are discrete (zero gradient a.e. —
        # the XLA path's argmax chain likewise carries none), and without it
        # jax.grad w.r.t. `points` dies inside the Pallas call ("Linearization
        # failed"): the kernel has no AD rule. Gradients flow through the
        # subsequent gather of `points`, identically to the XLA path.
        return farthest_point_sampling_pallas(
            jax.lax.stop_gradient(points), num_samples, tile_n=tile
        )
    return _farthest_point_sampling_xla(points, num_samples)


@functools.partial(jax.jit, static_argnames=("num_samples",))
def _farthest_point_sampling_xla(points: jax.Array, num_samples: int) -> jax.Array:
    """Select `num_samples` indices per object via farthest-point sampling.

    Args:
        points: [N, P, 3] float array (fully valid — objects are resampled to a
            fixed point count at ingest, so no point-level mask is needed).
        num_samples: static number of samples S to select, S <= P.

    Returns:
        [N, S] int32 indices into the P axis. The first index is always 0.
    """
    n, p, _ = points.shape
    assert num_samples <= p, (num_samples, p)
    pts = points.astype(jnp.float32)

    def body(i, state):
        min_dist, selected, last_idx = state
        # Gather the most recently selected point per object: [N, 3].
        last = jnp.take_along_axis(pts, last_idx[:, None, None], axis=1)[:, 0, :]
        d = jnp.sum((pts - last[:, None, :]) ** 2, axis=-1)  # [N, P]
        min_dist = jnp.minimum(min_dist, d)
        nxt = jnp.argmax(min_dist, axis=-1).astype(jnp.int32)  # [N]
        selected = selected.at[:, i].set(nxt)
        return min_dist, selected, nxt

    init_min = jnp.full((n, p), jnp.inf, dtype=jnp.float32)
    selected0 = jnp.zeros((n, num_samples), dtype=jnp.int32)
    first = jnp.zeros((n,), dtype=jnp.int32)
    # Iteration i fills slot i using the point chosen in slot i-1; slot 0 is
    # the fixed start point (index 0).
    _, selected, _ = jax.lax.fori_loop(
        1, num_samples, body, (init_min, selected0, first)
    )
    return selected


def fps_gather(points: jax.Array, features, num_samples: int):
    """FPS + gather of positions (and optionally features) in one call.

    On the Pallas path the selected coordinates come straight out of the FPS
    kernel (it touches them every round anyway), skipping the external
    one-hot gather matmul over [N, P, 3]. Bit-identical to gathering
    `points[idx]`. Position gradients are cut either way: FPS indices are
    discrete and `points` carries no parameter dependence (object geometry
    is data).

    Args:
        points: [N, P, 3].
        features: optional [N, P, C] or None.
        num_samples: static S.

    Returns:
        (sub_points [N, S, 3], sub_features [N, S, C] or None, indices [N, S])
    """
    from text2loc_tpu.ops.ballquery import onehot_gather

    n = points.shape[0]
    tile = _pallas_tile(n)
    if (
        tile
        and jax.default_backend() not in ("cpu", "gpu")
        and not os.environ.get("TEXT2LOC_DISABLE_PALLAS")
    ):
        from text2loc_tpu.ops.pallas_fps import farthest_point_sampling_pallas

        idx, sub_points = farthest_point_sampling_pallas(
            jax.lax.stop_gradient(points), num_samples, tile_n=tile,
            with_coords=True,
        )
        sub_points = sub_points.astype(points.dtype)
    else:
        idx = _farthest_point_sampling_xla(points, num_samples)
        sub_points = onehot_gather(points, idx)
    sub_features = None
    if features is not None:
        sub_features = onehot_gather(features, idx)
    return sub_points, sub_features, idx
