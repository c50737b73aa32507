"""Frozen text-embedding table: vocabulary coverage, from_t5 build, caching."""

import numpy as np
import pytest

from text2loc_tpu import constants as C
from text2loc_tpu.models.text_embedding import HintTextEmbedder


def test_compositional_table_covers_vocab():
    emb = HintTextEmbedder.compositional(embed_dim=16, max_tokens=12)
    assert emb.table.shape == (C.hint_vocab_size(), 12, 16)
    # Every hint id has at least the 9 template tokens marked valid.
    assert np.asarray(emb.token_mask).sum(axis=1).min() >= 9
    # Distinct hints embed differently, shared template slots identically.
    a = int(C.hint_id(1, 0, 0))
    b = int(C.hint_id(2, 0, 0))
    ta, tb = np.asarray(emb.table[a]), np.asarray(emb.table[b])
    np.testing.assert_array_equal(ta[0], tb[0])          # "The"
    assert not np.array_equal(ta[3], tb[3])              # direction slot


class _StubTokenizer:
    """Whitespace tokenizer with the HF call signature from_t5 uses."""

    def __call__(self, texts, return_tensors, padding, truncation, max_length):
        import torch

        ids = torch.zeros((len(texts), max_length), dtype=torch.long)
        mask = torch.zeros((len(texts), max_length), dtype=torch.long)
        for i, t in enumerate(texts):
            toks = t.split()[:max_length]
            for j, w in enumerate(toks):
                ids[i, j] = (hash(w) % 1000) + 1
            mask[i, : len(toks)] = 1
        return {"input_ids": ids, "attention_mask": mask}


class _StubModel:
    """Deterministic frozen encoder: embedding lookup from token ids."""

    class _Cfg:
        d_model = 8

    config = _Cfg()

    def __call__(self, input_ids, attention_mask):
        import torch

        torch.manual_seed(0)
        table = torch.randn(1001, 8)

        class Out:
            last_hidden_state = table[input_ids]

        return Out()


def test_from_t5_with_injected_model(tmp_path):
    cache = str(tmp_path / "t5_table.npz")
    emb = HintTextEmbedder.from_t5(
        max_tokens=12, model=_StubModel(), tokenizer=_StubTokenizer(),
        cache_path=cache,
    )
    assert emb.table.shape == (C.hint_vocab_size(), 12, 8)
    assert np.asarray(emb.token_mask).any(axis=1).all()

    # Cache round trip (second call must not need the model).
    emb2 = HintTextEmbedder.from_t5(cache_path=cache)
    np.testing.assert_array_equal(np.asarray(emb.table), np.asarray(emb2.table))


def test_embed_shapes():
    emb = HintTextEmbedder.compositional(embed_dim=16, max_tokens=12)
    d = np.zeros((2, 3), np.int32)
    ts = emb.embed(d, d, d)
    assert ts.token_embeds.shape == (2, 3, 12, 16)
    assert ts.token_mask.shape == (2, 3, 12)
    assert bool(ts.sentence_mask.all())
