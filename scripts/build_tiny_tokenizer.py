#!/usr/bin/env python
"""Build the vendored tiny T5-style tokenizer asset.

The container has no t5-large snapshot and no `sentencepiece`, so the online
frozen-T5 front door (models/t5_encoder.T5OnlineEncoder) was only ever
CI-tested with a whitespace stub tokenizer. This script trains a small REAL
HF `tokenizers` Unigram model — the same algorithm family and wire format as
T5's SentencePiece — over the closed hint vocabulary plus the paraphrase
banks, and writes a loadable HF tokenizer directory
(`text2loc_tpu/assets/tiny_t5_tokenizer/`: tokenizer.json +
tokenizer_config.json + special_tokens_map.json). T5 conventions are kept:
Metaspace pre-tokenization, `<pad>`=0 / `</s>`=1 / `<unk>`=2, and a
post-processor appending `</s>` to every sequence — so
`AutoTokenizer.from_pretrained(path)` drops into `T5OnlineEncoder` /
`HintTextEmbedder.from_t5` exactly where the t5-large tokenizer would
(reference tokenize site: /root/reference/models/language_encoder.py:116).

Deterministic: retraining over the same corpus reproduces the asset.
Run from the repo root: python scripts/build_tiny_tokenizer.py
"""
from __future__ import annotations

import json
import os

def corpus():
    """Every canonical hint sentence + every paraphrase template variant."""
    from text2loc_tpu import constants as C
    from text2loc_tpu import text_styles

    out = []
    for d in range(C.NUM_DIRECTIONS):
        for col in range(C.NUM_COLORS):
            for lab in range(C.NUM_CLASSES):
                out.append(C.render_hint(d, col, lab))
    rng_obj = [
        f"a {col} {lab}" for col in C.COLOR_NAMES for lab in C.KNOWN_CLASSES
    ]
    for bank in text_styles.SENTENCE_STYLES.values():
        for tpl in bank:
            for obj in rng_obj[:: max(1, len(rng_obj) // 8)]:
                out.append(tpl.format(object=obj, Object=obj.capitalize()))
    return out


def _vocab(sentences):
    """Hand-built Unigram vocabulary: one piece per corpus word (scored by
    log frequency, so whole words always beat their own fragments), common
    punctuation, and a single-character fallback tier — a UnigramTrainer on
    this tiny, highly repetitive corpus over-prunes to sub-word shrapnel
    ('▁The' -> '▁ T he'), while explicit construction gives deterministic
    single-piece coverage of the domain."""
    import collections
    import math

    freq = collections.Counter()
    chars = set()
    for s in sentences:
        chars.update(s)
        for raw in s.split():
            word = raw.rstrip(".,;:!?")
            punct = raw[len(word):]
            if word:
                freq["▁" + word] += 1
            for p in punct:
                freq[p] += 1
    total = sum(freq.values())
    vocab = [("<pad>", 0.0), ("</s>", 0.0), ("<unk>", -20.0)]
    seen = {p for p, _ in vocab}
    for piece, n in freq.most_common():
        if piece not in seen:
            vocab.append((piece, math.log(n / total)))
            seen.add(piece)
    # Fallback tier: every character the corpus contains (plus ascii
    # letters/digits), far below any word score so it only fires on novel
    # words — which otherwise collapse to <unk>.
    import string

    for ch in sorted(chars | set(string.ascii_letters + string.digits) | {"▁"}):
        if ch not in seen and ch != " ":
            vocab.append((ch, -18.0))
            seen.add(ch)
    return vocab


def build(out_dir: str):
    from tokenizers import Tokenizer, decoders, pre_tokenizers, processors
    from tokenizers.models import Unigram

    vocab = _vocab(corpus())
    tok = Tokenizer(Unigram(vocab, unk_id=2, byte_fallback=False))
    tok.pre_tokenizer = pre_tokenizers.Metaspace(
        replacement="▁", prepend_scheme="always"
    )
    tok.decoder = decoders.Metaspace(
        replacement="▁", prepend_scheme="always"
    )
    tok.post_processor = processors.TemplateProcessing(
        single="$A </s>",
        pair="$A </s> $B </s>",
        special_tokens=[("</s>", tok.token_to_id("</s>"))],
    )
    tok.enable_truncation(512)

    os.makedirs(out_dir, exist_ok=True)
    tok.save(os.path.join(out_dir, "tokenizer.json"))
    with open(os.path.join(out_dir, "tokenizer_config.json"), "w") as f:
        json.dump(
            {
                "tokenizer_class": "PreTrainedTokenizerFast",
                "model_max_length": 512,
                "pad_token": "<pad>",
                "eos_token": "</s>",
                "unk_token": "<unk>",
            },
            f, indent=1,
        )
    with open(os.path.join(out_dir, "special_tokens_map.json"), "w") as f:
        json.dump(
            {"pad_token": "<pad>", "eos_token": "</s>", "unk_token": "<unk>"},
            f, indent=1,
        )
    return out_dir


def main():
    out = os.path.join(
        os.path.dirname(__file__), "..", "text2loc_tpu", "assets",
        "tiny_t5_tokenizer",
    )
    build(os.path.abspath(out))
    # Smoke: loads through AutoTokenizer and tokenizes with EOS.
    from transformers import AutoTokenizer

    tk = AutoTokenizer.from_pretrained(os.path.abspath(out))
    enc = tk(["The pose is north of a gray building."], return_tensors="np",
             padding="max_length", truncation=True, max_length=16)
    ids = enc["input_ids"][0]
    n = int(enc["attention_mask"][0].sum())
    assert ids[n - 1] == tk.eos_token_id, ids
    print("vocab", tk.vocab_size, "sample ids", ids[:n].tolist())
    print("wrote", os.path.abspath(out))


if __name__ == "__main__":
    main()
