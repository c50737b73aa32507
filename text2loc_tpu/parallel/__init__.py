"""Multi-chip parallelism layer: device meshes, DP training, sharded retrieval.

The reference implements no parallelism at all (SURVEY.md section 2.6 — its one
cross-GPU gather, training/losses.py:386-387, is dead code). This package is
the TPU-native capability layer built on `jax.sharding.Mesh`:

* `mesh`      — mesh construction + sharding helpers.
* `train`     — data-parallel train steps (GSPMD: batch sharded over `dp`,
                params replicated; global-batch InfoNCE negatives emerge from
                XLA's all-gather of the sharded similarity matrix).
* `retrieval` — gallery sharded over chips, per-shard top-k + ICI merge.
"""

from text2loc_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
