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


def run_cacheless_child(test_file: str, k: str, timeout: int = 1200) -> bool:
    """Poisoned-CPU-AOT-cache workaround (shared by any test it bites).

    On this stack CPU executables are AOT-compiled remotely for a different
    host (the cpu_aot_loader feature-mismatch warning at import), and
    RELOADING some cached serialized CPU programs aborts the interpreter
    outright ("Fatal Python error: Aborted"). Known offenders: the fused-SA
    DP-island program (round 3, 3/3 crash cached vs 3/3 pass fresh) and the
    plain GSPMD DP train-step program of the preemption drill (round 4, same
    deterministic signature) — so this is NOT island-specific; any donated
    GSPMD train program can join. Affected tests re-enter themselves in a
    subprocess with the persistent compilation cache disabled.

    Returns True in the child (caller proceeds to run the real test body);
    in the parent it spawns `pytest test_file -k k` with the cache off,
    asserts it passed, and returns False (caller just returns).
    """
    import subprocess
    import sys

    if os.environ.get("TEXT2LOC_CACHELESS_CHILD") == "1":
        return True
    env = dict(os.environ)
    env["TEXT2LOC_CACHELESS_CHILD"] = "1"
    env["JAX_ENABLE_COMPILATION_CACHE"] = "false"
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", test_file, "-q", "-k", k],
        env=env, capture_output=True, text=True, timeout=timeout,
    )
    assert proc.returncode == 0, (
        f"cacheless child failed:\n{proc.stdout[-3000:]}\n{proc.stderr[-2000:]}"
    )
    return False


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
