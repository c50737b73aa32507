#!/usr/bin/env python
"""Single-query serving latency through the full Localizer path.

Times `Localizer.localize_text([one description])` end-to-end on the real
chip: host parse -> coarse text tower -> gallery top-k -> per-candidate CCT
refinement -> world coords, including every host<->device round trip (the
number a serving deployment actually sees, unlike bench.py's pipelined
throughput). Weights are randomly initialized — latency is shape-, not
value-dependent.
"""
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/text2loc_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main():
    from text2loc_tpu import constants as C
    from text2loc_tpu.config import Config
    from text2loc_tpu.data.arrays import MultiSceneArrays
    from text2loc_tpu.data.synthetic import make_scene
    from text2loc_tpu.evaluation.cli import _init_coarse_state, _init_fine_state
    from text2loc_tpu.models.cell_retrieval import CellRetrievalNetwork
    from text2loc_tpu.models.cross_matcher import CrossMatch
    from text2loc_tpu.models.text_embedding import make_embedder
    from text2loc_tpu.serving import Localizer

    cfg, embedder = make_embedder(Config().validate(), None)
    data = MultiSceneArrays([
        make_scene("0000", num_cells=64, num_poses=16,
                   object_slots=max(cfg.model.object_size, cfg.model.pad_size),
                   num_points=cfg.model.pointnet.num_points,
                   num_mentioned=cfg.model.num_mentioned, seed=0)
    ])
    coarse_model = CellRetrievalNetwork(cfg.model)
    fine_model = CrossMatch(cfg.model)
    coarse_state = _init_coarse_state(cfg, coarse_model, embedder, data)
    fine_state = _init_fine_state(cfg, fine_model, embedder, data)

    t0 = time.perf_counter()
    loc = Localizer(data, coarse_state, coarse_model, fine_state, fine_model,
                    embedder, cfg, top_k=10)
    print(f"Localizer build (gallery + fine cache): "
          f"{time.perf_counter() - t0:.1f}s", flush=True)

    desc = " ".join(
        C.render_hint(i % C.NUM_DIRECTIONS, i % C.NUM_COLORS,
                      i % len(C.KNOWN_CLASSES))
        for i in range(cfg.model.num_mentioned)
    )

    # Warm-up compiles (bucket=1).
    loc.localize_text([desc])
    lat = []
    for _ in range(50):
        t0 = time.perf_counter()
        loc.localize_text([desc])
        lat.append((time.perf_counter() - t0) * 1e3)
    lat = np.sort(np.asarray(lat))
    print(f"single-query latency over {len(lat)} calls: "
          f"p50 {lat[len(lat) // 2]:.1f} ms  p95 {lat[int(len(lat) * 0.95)]:.1f} ms  "
          f"min {lat[0]:.1f} ms", flush=True)

    # Batched: 64 queries per call.
    batch = [desc] * 64
    loc.localize_text(batch)
    t0 = time.perf_counter()
    for _ in range(10):
        loc.localize_text(batch)
    per = (time.perf_counter() - t0) / 10
    print(f"64-query batch: {per * 1e3:.1f} ms/call "
          f"({64 / per:.0f} q/s interactive)", flush=True)


if __name__ == "__main__":
    main()
