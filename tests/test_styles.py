"""Paraphrase sentence-style banks + styled-hint robustness eval.

Reference banks: /root/reference/datapreparation/kitti360pose/utils.py:237-453
(`sentence_style_{t,n,s,e,w}`) — dead imports there, a working eval mode here
(text2loc_tpu/text_styles.py + evaluation/styled.py + `--styled_hints`).
"""

import numpy as np
import pytest

from text2loc_tpu import constants as C
from text2loc_tpu import text_styles


def test_banks_cover_reference_directions_and_are_well_formed():
    assert set(text_styles.SENTENCE_STYLES) == {
        "on-top", "north", "south", "east", "west"
    }
    for direction, bank in text_styles.SENTENCE_STYLES.items():
        assert len(bank) >= 19, direction          # reference bank sizes
        assert len(set(bank)) == len(bank), f"{direction} has duplicates"
        for tpl in bank:
            # exactly one object slot, in exactly one casing
            n = tpl.count("{object}") + tpl.count("{Object}")
            assert n == 1, (direction, tpl)
            # formats cleanly (no stray braces / bad placeholders)
            s = tpl.format(object="a gray building", Object="A gray building")
            assert "{" not in s and "}" not in s, (direction, tpl)
            assert s.endswith("."), (direction, tpl)


def test_styled_hint_is_out_of_vocabulary():
    """Styled renders must leave the closed template vocabulary (that is the
    point: they exercise the online-encoder front door)."""
    from text2loc_tpu.text import HintParseError, parse_hint

    rng = np.random.default_rng(0)
    d = C.DIRECTION_TO_INDEX["north"]
    for i in range(text_styles.num_styles("north")):
        s = text_styles.render_styled_hint(d, 1, 2, rng, style_idx=i)
        with pytest.raises(HintParseError):
            parse_hint(s)


def test_unbanked_directions_fall_back_to_canonical():
    rng = np.random.default_rng(0)
    d = C.DIRECTION_TO_INDEX["north-east"]
    assert text_styles.render_styled_hint(d, 1, 2, rng) == C.render_hint(d, 1, 2)


def test_styled_description_respects_sentence_mask():
    rng = np.random.default_rng(3)
    desc = text_styles.render_styled_description(
        [1, 2, 3], [0, 1, 2], [0, 1, 2], sentence_mask=[True, False, True],
        rng=rng,
    )
    # two sentences, both ending in periods
    assert desc.count(".") == 2


def test_styled_eval_cli_end_to_end():
    """--styled_hints on the synthetic pipeline: paraphrased queries flow
    through the online-encoder OOV path and produce finite, sane recall
    (VERDICT r3 next #2's done-gate). The canonical pass through the same
    front door is the baseline."""
    from text2loc_tpu.evaluation.cli import main_pipeline

    result = main_pipeline(["--synthetic", "--styled_hints"])
    styled = result["styled"]
    assert set(styled) >= {"styled", "canonical", "recall_gap"}
    for name in ("styled", "canonical"):
        r = styled[name]
        for k, v in r["recall"].items():
            assert 0.0 <= v <= 1.0, (name, k, v)
        assert np.isfinite(r["mean_error_m"])
    # the paraphrases must actually have changed the queries: the two runs
    # are the same poses through the same weights, differing only in text.
    assert styled["recall_gap"] is not None
