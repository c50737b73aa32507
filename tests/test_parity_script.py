"""scripts/parity.py fixture run: the one-command real-data parity report,
exercised end to end on synthetic scenes + reference-shaped torch towers."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def test_parity_synthetic_with_torch_ckpts(tmp_path):
    torch = pytest.importorskip("torch")
    from torch_fixtures import make_coarse_state_dict, make_fine_state_dict

    import parity

    from text2loc_tpu.config import small_test_config

    mcfg = small_test_config().model
    cpth = str(tmp_path / "coarse.pth")
    fpth = str(tmp_path / "fine.pth")
    torch.save(make_coarse_state_dict(mcfg), cpth)
    torch.save(make_fine_state_dict(mcfg), fpth)

    out = str(tmp_path / "report.json")
    report = parity.main([
        "--synthetic", "--splits", "val", "test",
        "--coarse_torch_ckpt", cpth, "--fine_torch_ckpt", fpth,
        "--out", out,
    ])
    assert report["pass"] is None           # fixture mode: plumbing only
    assert report["config"]["reference_attention"] is True
    for split in ("val", "test"):
        r = report[split]
        assert set(r["retrieval_recall"]) == {1, 3, 5}
        for v in r["retrieval_recall"].values():
            assert 0.0 <= v <= 1.0
        assert r["localization_top1"], r
        assert r["rows"]
        # val has paper targets -> rows carry verdicts; test loc rows don't.
        if split == "val":
            assert any(row["verdict"] in ("PASS", "FAIL") for row in r["rows"])
    with open(out) as f:
        assert json.load(f)["config"]["synthetic"] is True


def test_parity_compare_verdicts():
    import parity

    rows = parity._compare("R@", {1: 0.33, 3: 0.50, 5: 0.70},
                           {1: 0.32, 3: 0.56}, tol=0.02)
    by_label = {r[0]: r for r in rows}
    assert by_label["R@1"][4] == "PASS"          # above target
    assert by_label["R@3"][4] == "FAIL"          # below target - tol
    assert by_label["R@5"][4] is None            # no target
    # Within tolerance below the target still passes.
    rows = parity._compare("x", {1: 0.305}, {1: 0.32}, tol=0.02)
    assert rows[0][4] == "PASS"


def test_parity_kernel_sweep_fixture(tmp_path):
    """--validate_kernels sweeps fused-SA modes on the loaded weights; on CPU
    every mode falls back to the exact path, so agreement must be 1.0."""
    import parity

    report = parity.main([
        "--synthetic", "--splits", "val", "--validate_kernels",
        "--out", str(tmp_path / "r.json"),
    ])
    sweep = report["val"]["kernel_sweep"]
    assert set(sweep) == {"off", "first", "all"}
    for mode in ("first", "all"):
        assert sweep[mode]["top1_agreement_vs_exact"] == 1.0
        assert sweep[mode]["mean_abs_dpos_m_vs_exact"] == pytest.approx(0.0,
                                                                        abs=1e-6)
    assert os.environ.get("TEXT2LOC_FUSED_SA") is None
