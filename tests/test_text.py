"""Free-text front door: hint-string parsing (inverse of render_hint).

The reference ingests raw description strings (NLTK split + T5 tokenize,
/root/reference/models/language_encoder.py:106-121); our parser must round-trip
the entire closed 1,584-sentence template vocabulary.
"""

import numpy as np
import pytest

from text2loc_tpu import constants as C
from text2loc_tpu import text as T


def test_round_trip_whole_vocabulary():
    """All NUM_DIRECTIONS x NUM_COLORS x NUM_CLASSES rendered sentences parse
    back; string-level round trip is exact everywhere, triple-level wherever
    the color name is unambiguous ("gray" appears twice in COLOR_NAMES —
    reference quirk, utils.py:210-231)."""
    first_color_idx = {name: C.COLOR_NAMES.index(name) for name in C.COLOR_NAMES}
    n = 0
    for d in range(C.NUM_DIRECTIONS):
        for c in range(C.NUM_COLORS):
            for l in range(C.NUM_CLASSES):
                s = C.render_hint(d, c, l)
                pd, pc, pl = T.parse_hint(s)
                assert (pd, pl) == (d, l), s
                assert pc == first_color_idx[C.COLOR_NAMES[c]], s
                assert C.render_hint(pd, pc, pl) == s
                n += 1
    assert n == C.hint_vocab_size() == 1584


def test_split_description_template_boundaries():
    hints = [C.render_hint(1, 2, 3), C.render_hint(4, 5, 6), C.render_hint(0, 0, 0)]
    joined = " ".join(hints)
    assert T.split_description(joined) == hints
    # No trailing whitespace dependence.
    assert T.split_description("  " + joined + "  ") == hints


@pytest.mark.parametrize("bad", [
    "The pose is nowhere of a gray building.",       # unknown direction
    "The pose is east of a purple building.",        # unknown color
    "The pose is east of a gray spaceship.",         # unknown class
    "Meet me at the gray building.",                 # not the template
    "",                                              # empty
])
def test_parse_hint_rejects_oov(bad):
    with pytest.raises(T.HintParseError):
        T.parse_hint(bad)


def test_parse_hint_multiword_label():
    s = "The pose is north-east of a bright-gray traffic light."
    d, c, l = T.parse_hint(s)
    assert C.DIRECTIONS[d] == "north-east"
    assert C.COLOR_NAMES[c] == "bright-gray"
    assert C.INDEX_TO_CLASS[l] == "traffic light"


def test_parse_descriptions_pads_and_masks():
    d1 = " ".join(C.render_hint(1, 1, 1) for _ in range(2))
    d2 = " ".join(C.render_hint(2, 3, 4) for _ in range(4))
    out = T.parse_descriptions([d1, d2], num_mentioned=4)
    assert out["hint_dir"].shape == (2, 4)
    np.testing.assert_array_equal(out["sentence_mask"],
                                  [[1, 1, 0, 0], [1, 1, 1, 1]])
    # Padded slots are (0,0,0).
    assert out["hint_dir"][0, 2:].sum() == 0
    # Truncation beyond num_mentioned.
    out2 = T.parse_descriptions([d2], num_mentioned=3)
    assert out2["sentence_mask"].all()
    assert out2["hint_dir"].shape == (1, 3)


def test_render_description_masked_inverse():
    out = T.parse_descriptions(
        ["The pose is east of a gray building. The pose is west of a green terrain."],
        num_mentioned=4,
    )
    back = T.render_description(out["hint_dir"][0], out["hint_color"][0],
                                out["hint_label"][0], out["sentence_mask"][0])
    assert back == ("The pose is east of a gray building. "
                    "The pose is west of a green terrain.")


@pytest.mark.slow
def test_localize_text_end_to_end(small_cfg, small_embedder, small_data):
    """Serving from raw strings: parse -> embed -> retrieve -> refine."""
    from test_serving import _states

    from text2loc_tpu.serving import Localizer

    cfg, data, embedder = small_cfg, small_data, small_embedder
    cs, cm, fs, fm = _states(cfg, embedder, data)
    loc = Localizer(data, cs, cm, fs, fm, embedder, cfg, top_k=3)

    # Render real stored queries back to strings (num_mentioned=3 in the small
    # config), one full-length and one SHORT (exercises the sentence mask).
    q0 = T.render_description(data.hint_dir[0], data.hint_color[0], data.hint_label[0])
    q1 = T.render_description(data.hint_dir[1][:2], data.hint_color[1][:2],
                              data.hint_label[1][:2])
    res = loc.localize_text([q0, q1])
    assert res.position_w.shape == (2, 2)
    assert np.isfinite(res.position_w).all()

    # Full-length string queries must agree exactly with integer-triple
    # queries (the parser is the embedder's exact inverse).
    ints = loc.localize(data.hint_dir[:1], data.hint_color[:1], data.hint_label[:1],
                        sentence_mask=np.ones((1, cfg.model.num_mentioned), bool))
    np.testing.assert_allclose(res.position_w[0], ints.position_w[0], atol=1e-5)

    with pytest.raises(T.HintParseError):
        loc.localize_text(["Take me to the big glowing obelisk."])


def test_localize_text_online_fallback(small_cfg, small_embedder, small_data):
    """With an online encoder attached, out-of-vocabulary sentences no longer
    raise: the batch is embedded through the frozen LLM and served via
    `localize_embedded` (reference language_encoder.py:106-128 capability).
    In-vocabulary batches still take the table fast path and agree exactly."""
    from test_serving import _states

    from text2loc_tpu.models.t5_encoder import CompositionalOnlineEncoder
    from text2loc_tpu.serving import Localizer

    cfg, data, embedder = small_cfg, small_data, small_embedder
    cs, cm, fs, fm = _states(cfg, embedder, data)
    online = CompositionalOnlineEncoder(
        embed_dim=cfg.model.text_embed_dim,
        max_tokens=cfg.model.max_hint_tokens,
    )
    loc = Localizer(data, cs, cm, fs, fm, embedder, cfg, top_k=3,
                    online_encoder=online)
    plain = Localizer(data, cs, cm, fs, fm, embedder, cfg, top_k=3)

    q0 = T.render_description(data.hint_dir[0], data.hint_color[0],
                              data.hint_label[0])
    # 2 in-vocab sentences + 1 OOV fills num_mentioned=3 slots, so the OOV
    # sentence actually reaches the online encoder (not truncated away).
    oov = T.render_description(data.hint_dir[0][:2], data.hint_color[0][:2],
                               data.hint_label[0][:2]
                               ) + " Take me to the big glowing obelisk."

    # OOV round trip: finite positions, valid gallery cells.
    res = loc.localize_text([oov, q0])
    assert res.position_w.shape == (2, 2)
    assert np.isfinite(res.position_w).all()
    assert (res.cell_indices >= 0).all()
    assert (res.cell_indices < data.num_cells).all()

    # The in-vocab fast path is unchanged by attaching an online encoder.
    a = loc.localize_text([q0])
    b = plain.localize_text([q0])
    np.testing.assert_allclose(a.position_w, b.position_w, atol=1e-6)
    np.testing.assert_array_equal(a.cell_indices, b.cell_indices)

    # The stand-in embeds in-vocab sentences identically to the table, so the
    # ONLINE path on an in-vocab+OOV batch keeps q0's in-vocab result close:
    # its first num_mentioned sentences are the same embeddings.
    np.testing.assert_allclose(res.position_w[1], b.position_w[0], atol=1e-5)
    # Without an online encoder the same OOV batch still raises.
    with pytest.raises(T.HintParseError):
        plain.localize_text([oov])
    # Empty descriptions are rejected on both paths.
    with pytest.raises(T.HintParseError):
        loc.localize_text([""])
