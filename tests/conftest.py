"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths (DP train step, all-gather InfoNCE, sharded-gallery
top-k) are validated on CPU via XLA's host-platform device-count flag, per
SURVEY.md section 4's test plan. Env vars must be set before jax imports.
"""

import os

# Force CPU even when a TPU platform (axon tunnel) is configured in the env:
# tests validate sharding semantics on 8 virtual devices, not TPU perf.
# The site hook imports jax before this conftest runs, so the env var alone is
# too late — set the config knob as well (backends are initialized lazily).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/tmp/text2loc_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def small_cfg():
    from text2loc_tpu.config import small_test_config

    return small_test_config()


@pytest.fixture(scope="session")
def small_embedder(small_cfg):
    from text2loc_tpu.models.text_embedding import HintTextEmbedder

    return HintTextEmbedder.compositional(
        embed_dim=small_cfg.model.text_embed_dim,
        max_tokens=small_cfg.model.max_hint_tokens,
    )


@pytest.fixture(scope="session")
def small_data(small_cfg):
    from text2loc_tpu.data.arrays import MultiSceneArrays
    from text2loc_tpu.data.synthetic import make_scene

    scenes = [
        make_scene(
            scene_name=f"000{i}",
            num_cells=6,
            num_poses=12,
            object_slots=small_cfg.model.object_size,
            num_points=small_cfg.model.pointnet.num_points,
            num_mentioned=small_cfg.model.num_mentioned,
            seed=i,
        )
        for i in range(2)
    ]
    return MultiSceneArrays(scenes)
