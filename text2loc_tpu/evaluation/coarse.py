"""Coarse-only evaluation CLI (reference /root/reference/evaluation/coarse.py).

    python -m text2loc_tpu.evaluation.coarse --base_path DATA --coarse_ckpt C
"""

from text2loc_tpu.evaluation.cli import main_coarse

if __name__ == "__main__":
    main_coarse()
