"""Frozen-T5 table harness: the one-command build path + CLI selection.

The real T5-large weights are not in this container (zero egress); the build
command is exercised with the injected toy encoder from test_text_embedding,
and a real-weights test runs whenever a local snapshot exists (point
TEXT2LOC_T5_PATH at it, or have a standard HF cache of t5-large).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from test_text_embedding import _StubModel, _StubTokenizer

from text2loc_tpu import constants as C
from text2loc_tpu.config import small_test_config
from text2loc_tpu.models.text_embedding import HintTextEmbedder, make_embedder


def _build_toy_table(path):
    emb = HintTextEmbedder.from_t5(
        max_tokens=12, model=_StubModel(), tokenizer=_StubTokenizer(),
        cache_path=str(path),
    )
    return emb


def test_from_npz_and_checksum_contract(tmp_path):
    path = tmp_path / "table.npz"
    emb = _build_toy_table(path)
    loaded = HintTextEmbedder.from_npz(str(path))
    np.testing.assert_array_equal(np.asarray(emb.table), np.asarray(loaded.table))
    # The checksum is a stable content hash: same build -> same hash.
    assert emb.checksum() == loaded.checksum()
    emb2 = _build_toy_table(tmp_path / "table2.npz")
    assert emb2.checksum() == emb.checksum()


def test_make_embedder_selects_table(tmp_path):
    path = tmp_path / "table.npz"
    _build_toy_table(path)
    cfg = small_test_config()
    cfg2, emb = make_embedder(cfg, str(path))
    # Model text dims follow the table's shape contract.
    assert cfg2.model.text_embed_dim == emb.embed_dim == 8
    assert cfg2.model.max_hint_tokens == emb.max_tokens == 12
    # Without a table: compositional stand-in at configured dims.
    cfg3, emb3 = make_embedder(cfg, None)
    assert emb3.embed_dim == cfg.model.text_embed_dim
    assert cfg3 is cfg


def test_eval_cli_accepts_text_table(tmp_path):
    """--text_table drives the synthetic coarse eval end to end."""
    from text2loc_tpu.evaluation.cli import main_coarse

    path = tmp_path / "table.npz"
    _build_toy_table(path)
    accs, retrievals = main_coarse(["--synthetic", "--text_table", str(path)])
    assert retrievals.ndim == 2


def _local_t5():
    p = os.environ.get("TEXT2LOC_T5_PATH")
    if p and os.path.exists(p):
        return p
    try:  # standard HF cache, offline only
        from huggingface_hub import snapshot_download

        return snapshot_download("t5-large", local_files_only=True)
    except Exception:
        return None


@pytest.mark.skipif(_local_t5() is None, reason="no local t5-large snapshot")
def test_build_t5_table_real_weights(tmp_path):
    """One-command build against real weights (runs only when present)."""
    script = os.path.join(os.path.dirname(__file__), "..", "scripts",
                          "build_t5_table.py")
    out = tmp_path / "t5_table.npz"
    env = dict(os.environ)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
    )
    proc = subprocess.run(
        [sys.executable, script, "--t5", _local_t5(), "--out", str(out)],
        capture_output=True, text=True, timeout=1800, env=env,
    )
    assert proc.returncode == 0, proc.stderr
    info = json.loads(proc.stdout.strip().splitlines()[-1])
    # The t5-large shape contract.
    assert info["vocab"] == C.hint_vocab_size() == 1584
    assert info["embed_dim"] == 1024
    emb = HintTextEmbedder.from_npz(str(out))
    assert emb.checksum() == info["sha256"]
