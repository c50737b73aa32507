"""Vendored data assets.

`tiny_t5_tokenizer/`: a small REAL HF-`tokenizers` Unigram tokenizer in the
T5 wire format (Metaspace pre-tokenization, `<pad>`=0 / `</s>`=1 /
`<unk>`=2, `</s>` appended by the post-processor), trained over the closed
hint vocabulary + paraphrase banks by scripts/build_tiny_tokenizer.py. It
stands in for the t5-large SentencePiece tokenizer (absent from offline
containers) so the online-encoder front door — tokenizer ->
models/t5_encoder.T5Encoder — runs end to end with real tokenizer machinery
instead of a whitespace stub (reference tokenize site:
/root/reference/models/language_encoder.py:116).
"""

from __future__ import annotations

import os


def tiny_t5_tokenizer_path() -> str:
    """Directory loadable by transformers.AutoTokenizer.from_pretrained."""
    return os.path.join(os.path.dirname(__file__), "tiny_t5_tokenizer")


def load_tiny_tokenizer():
    """The vendored tokenizer as a PreTrainedTokenizerFast (requires the
    `transformers` + `tokenizers` libs, like every online-T5 path)."""
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(tiny_t5_tokenizer_path())
