"""Vendored tiny T5-style tokenizer asset (text2loc_tpu/assets).

A real HF-`tokenizers` Unigram model in the T5 wire format, committed so
the online-encoder front door runs with real tokenizer machinery in CI
(reference tokenize site: /root/reference/models/language_encoder.py:116).
Regenerate with scripts/build_tiny_tokenizer.py.
"""

import numpy as np
import pytest

pytest.importorskip("transformers")

from text2loc_tpu import constants as C  # noqa: E402
from text2loc_tpu import text_styles  # noqa: E402
from text2loc_tpu.assets import load_tiny_tokenizer  # noqa: E402


@pytest.fixture(scope="module")
def tok():
    return load_tiny_tokenizer()


def test_t5_conventions(tok):
    assert tok.pad_token_id == 0
    assert tok.eos_token_id == 1
    assert tok.unk_token_id == 2
    enc = tok(["The pose is north of a gray building."], return_tensors="np",
              padding="max_length", truncation=True, max_length=16)
    ids = enc["input_ids"][0]
    n = int(enc["attention_mask"][0].sum())
    assert ids[n - 1] == tok.eos_token_id          # </s> appended
    assert (ids[n:] == tok.pad_token_id).all()     # padded with <pad>


def test_full_hint_vocabulary_tokenizes_whole_word_no_unk(tok):
    """Every canonical hint sentence fits the serving token budget and maps
    to whole-word pieces (no <unk>, no character shrapnel)."""
    sentences = [
        C.render_hint(d, col, lab)
        for d in range(C.NUM_DIRECTIONS)
        for col in range(C.NUM_COLORS)
        for lab in range(C.NUM_CLASSES)
    ]
    enc = tok(sentences, return_tensors="np", padding="max_length",
              truncation=True, max_length=16)
    mask = enc["attention_mask"].astype(bool)
    assert mask.sum(1).max() <= 12                 # budget headroom
    assert not (enc["input_ids"][mask] == tok.unk_token_id).any()


def test_paraphrase_banks_tokenize_without_unk(tok):
    rng = np.random.default_rng(0)
    for direction in text_styles.SENTENCE_STYLES:
        d = C.DIRECTION_TO_INDEX[direction]
        for i in range(text_styles.num_styles(direction)):
            s = text_styles.render_styled_hint(d, 2, 3, rng, style_idx=i)
            ids = tok(s)["input_ids"]
            assert tok.unk_token_id not in ids, s


def test_novel_words_fall_back_to_characters_not_empty(tok):
    ids = tok("A zeppelin hovers nearby.")["input_ids"]
    toks = tok.convert_ids_to_tokens(ids)
    assert toks[-1] == "</s>"
    assert len(ids) > 6                            # char fallback expanded it
    # decodes back to something containing the novel word's letters
    assert "zeppelin" in tok.decode(ids, skip_special_tokens=True)


def test_determinism_same_input_same_ids(tok):
    a = tok("The pose is west of a beige pole.")["input_ids"]
    b = load_tiny_tokenizer()("The pose is west of a beige pole.")["input_ids"]
    assert a == b


def test_front_door_end_to_end_with_real_tokenizer(small_cfg, small_embedder,
                                                   small_data):
    """The whole OOV front door with REAL tokenizer machinery: styled
    (out-of-vocabulary) description -> Localizer.localize_text ->
    PreTrainedTokenizerFast over the vendored asset -> the from-scratch Flax
    T5 encoder -> serve. Previously this path only ever ran with whitespace
    stubs."""
    import torch
    from test_serving import _states
    from transformers import T5Config as HFT5Config
    from transformers import T5EncoderModel

    from text2loc_tpu.models.t5_encoder import (
        T5OnlineEncoder,
        convert_t5_encoder,
    )
    from text2loc_tpu.models.torch_convert import to_numpy
    from text2loc_tpu.serving import Localizer

    cfg, data, embedder = small_cfg, small_data, small_embedder
    torch.manual_seed(0)
    tmodel = T5EncoderModel(HFT5Config(
        vocab_size=256, d_model=cfg.model.text_embed_dim, d_kv=16,
        num_heads=4, d_ff=128, num_layers=2, num_decoder_layers=0,
        feed_forward_proj="relu", relative_attention_num_buckets=8,
        relative_attention_max_distance=20, dropout_rate=0.0,
    )).eval()
    params, t5cfg = convert_t5_encoder(to_numpy(tmodel.state_dict()),
                                       max_distance=20)
    online = T5OnlineEncoder(params, t5cfg, load_tiny_tokenizer(),
                             max_tokens=cfg.model.max_hint_tokens)

    cs, cm, fs, fm = _states(cfg, embedder, data)
    loc = Localizer(data, cs, cm, fs, fm, embedder, cfg, top_k=3,
                    online_encoder=online)
    rng = np.random.default_rng(5)
    styled = text_styles.render_styled_description(
        data.hint_dir[0], data.hint_color[0], data.hint_label[0],
        data.hint_mask[0], rng=rng,
    )
    res = loc.localize_text([styled])
    assert res.cell_indices.shape[0] == 1
    assert np.isfinite(np.asarray(res.position_w)).all()
    assert np.isfinite(np.asarray(res.scores)).all()
