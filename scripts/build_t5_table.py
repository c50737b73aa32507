#!/usr/bin/env python
"""Build the frozen T5 hint-embedding table — one command, offline.

The reference runs a frozen T5-large encoder per batch
(/root/reference/models/language_encoder.py:87-128). Here the frozen text
front end is one [V=1584, T, E] table computed offline over the closed hint
vocabulary (see text2loc_tpu/models/text_embedding.py). This script builds it
from locally available HuggingFace T5 weights and records the shape/checksum
contract so runs are reproducible:

    python scripts/build_t5_table.py --t5 /path/to/t5-large --out t5_table.npz

Then select the table everywhere via `--text_table t5_table.npz` (trainer and
evaluation CLIs) instead of the compositional stand-in.

Expected contract for t5-large: V=1584, E=1024 (model d_model); T is
--max_tokens (default 32 covers every template sentence; the longest hint
tokenizes to ~20 T5 sentence-piece tokens).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--t5", required=True,
                    help="HF model id or local path (e.g. a t5-large snapshot)")
    ap.add_argument("--out", required=True, help="output .npz path")
    ap.add_argument("--max_tokens", type=int, default=32)
    ap.add_argument("--batch_size", type=int, default=64)
    args = ap.parse_args(argv)

    from text2loc_tpu.models.text_embedding import HintTextEmbedder

    emb = HintTextEmbedder.from_t5(
        args.t5, max_tokens=args.max_tokens, batch_size=args.batch_size,
        cache_path=args.out,
    )
    info = {
        "out": args.out,
        "vocab": int(emb.table.shape[0]),
        "max_tokens": int(emb.max_tokens),
        "embed_dim": int(emb.embed_dim),
        "sha256": emb.checksum(),
    }
    print(json.dumps(info))
    return info


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
