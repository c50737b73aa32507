"""scripts/parity_drill.py: the reference-generated-dataset round trip.

The drill is the strongest in-container substitute for a real-data parity
run (VERDICT r4 #7): the REFERENCE'S own L0 pipeline generates the dataset
(published pickle layout), our ingest + converters + pipeline consume it,
and the output protocol is byte-checked against the reference's own
print_accuracies. The committed full-model golden lives at
examples/parity_drill_golden.json; this test runs the small-model tier.
"""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


@pytest.mark.slow
def test_parity_drill_small(tmp_path):
    pytest.importorskip("torch")
    import parity_drill

    golden = tmp_path / "golden.json"
    rc = parity_drill.main([
        "--root", str(tmp_path / "data"), "--runs", "2",
        "--golden", str(golden),
    ])
    assert rc == 0
    out = json.loads(golden.read_text())
    assert out["deterministic"] is True
    assert out["table_byte_parity_vs_reference"] == {
        "Coarse": True, "Fine": True,
    }
    assert out["dataset"]["n_cells"] >= 4
    assert out["dataset"]["n_poses"] == 24
    rep = out["report"]["val"]
    # Full k x thresh tables present, probabilities sane.
    for table in (rep["coarse_table"], rep["fine_table"]):
        assert set(table) == {"1", "3", "5"}
        for row in table.values():
            assert all(0.0 <= v <= 1.0 for v in row.values())


def test_reference_dataset_generation_deterministic(tmp_path):
    """Same seed -> byte-identical pickles/JSON (the golden's digests are
    meaningful); different seed -> different bytes."""
    import parity_drill

    a = parity_drill.build_reference_dataset(str(tmp_path / "a"), seed=11,
                                             n_poses=4)
    b = parity_drill.build_reference_dataset(str(tmp_path / "b"), seed=11,
                                             n_poses=4)
    c = parity_drill.build_reference_dataset(str(tmp_path / "c"), seed=12,
                                             n_poses=4)
    assert a["digests"] == b["digests"]
    assert a["digests"] != c["digests"]
