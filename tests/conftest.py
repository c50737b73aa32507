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


_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cacheless_env() -> dict:
    env = dict(os.environ)
    env["TEXT2LOC_CACHELESS_CHILD"] = "1"
    env["JAX_ENABLE_COMPILATION_CACHE"] = "false"
    # Children must import text2loc_tpu without a pip install and regardless
    # of the parent's cwd (pytest only puts the INVOCATION cwd on sys.path).
    env["PYTHONPATH"] = _REPO_ROOT + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
    )
    return env


def run_cacheless_child(test_file: str, k: str, timeout: int = 3600) -> bool:
    """Poisoned-CPU-AOT-cache workaround (shared by any test it bites).

    On this stack CPU executables are AOT-compiled remotely for a different
    host (the cpu_aot_loader feature-mismatch warning at import), and
    RELOADING some cached serialized CPU programs can abort the interpreter
    outright ("Fatal Python error: Aborted"). Known offenders: the fused-SA
    DP-island program (round 3) and the plain GSPMD DP train-step program of
    the preemption drill (round 4) — so this is NOT island-specific; any
    donated GSPMD train program can join. The crash is FLAKY, not
    deterministic: a round-4 warm-cache rerun experiment measured 3/5
    aborts / 2/5 passes for the identical program, so a green cached run
    proves nothing. Affected tests re-enter themselves in a subprocess with
    the persistent compilation cache disabled.

    Returns True in the child (caller proceeds to run the real test body);
    in the parent it collects the child spawned at collection time (see
    pytest_collection_finish — children run concurrently with the rest of
    the suite, since they spend most of their time waiting on the remote
    compile tunnel, not on this box's single CPU core), or spawns one
    synchronously if none was pre-launched, asserts it passed, and returns
    False (caller just returns).
    """
    import subprocess
    import sys

    if os.environ.get("TEXT2LOC_CACHELESS_CHILD") == "1":
        return True
    early = _EARLY_CHILDREN.pop((os.path.basename(test_file), k), None)
    if early is not None:
        proc, out = early
        try:
            rc = proc.wait(timeout=timeout)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.wait()
            raise
        out.seek(0)
        text = out.read()
        out.close()
        assert rc == 0, f"cacheless child failed (rc={rc}):\n{text[-5000:]}"
        return False
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", test_file, "-q", "-k", k],
        env=_cacheless_env(), capture_output=True, text=True, timeout=timeout,
    )
    assert proc.returncode == 0, (
        f"cacheless child failed:\n{proc.stdout[-3000:]}\n{proc.stderr[-2000:]}"
    )
    return False


# Tests that re-enter via run_cacheless_child, keyed by nodeid suffix →
# (file basename, -k expression). Their children are spawned as soon as
# collection finishes and the tests themselves are moved to the end of the
# run, so the children's cold compiles overlap the whole rest of the suite
# (526 s of serial subprocess time in the round-4 `--durations` profile).
_CACHELESS_TESTS = {
    "test_preemption.py::test_dp_preemption_resume_bitwise":
        ("test_preemption.py", "test_dp_preemption_resume_bitwise"),
    "test_preemption.py::test_elastic_resume_across_mesh_sizes":
        ("test_preemption.py", "elastic_resume"),
    "test_parallel.py::test_dp_coarse_step_with_fused_sa_island":
        ("test_parallel.py", "fused_sa_island"),
    "test_multiprocess.py::test_two_process_dp_matches_single_process":
        ("test_multiprocess.py", "two_process"),
}

_EARLY_CHILDREN: dict = {}


def _cacheless_spec(nodeid: str):
    for suffix, spec in _CACHELESS_TESTS.items():
        if nodeid.endswith(suffix):
            return spec
    return None


@pytest.hookimpl(trylast=True)
def pytest_collection_modifyitems(config, items):
    # Run the subprocess-collecting tests LAST (trylast: after pytest's own
    # -k/-m deselection) so their pre-launched children get maximal overlap.
    if os.environ.get("TEXT2LOC_CACHELESS_CHILD") == "1":
        return
    matched = [it for it in items if _cacheless_spec(it.nodeid)]
    for it in matched:
        items.remove(it)
    items.extend(matched)


def pytest_collection_finish(session):
    if os.environ.get("TEXT2LOC_CACHELESS_CHILD") == "1":
        return
    import subprocess
    import sys
    import tempfile

    for it in session.items:
        spec = _cacheless_spec(it.nodeid)
        if spec is None or spec in _EARLY_CHILDREN:
            continue
        out = tempfile.TemporaryFile(mode="w+")
        proc = subprocess.Popen(
            [sys.executable, "-m", "pytest",
             os.path.join(os.path.dirname(__file__), spec[0]),
             "-q", "-k", spec[1]],
            env=_cacheless_env(), stdout=out, stderr=subprocess.STDOUT,
            text=True,
        )
        _EARLY_CHILDREN[spec] = (proc, out)


def pytest_sessionfinish(session, exitstatus):
    # Don't leak children if their collecting tests never ran (e.g. the
    # session errored out or was interrupted first).
    for proc, out in _EARLY_CHILDREN.values():
        if proc.poll() is None:
            proc.kill()
            proc.wait()
        out.close()
    _EARLY_CHILDREN.clear()


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
