#!/usr/bin/env python
"""Online-serving throughput through the micro-batching frontend, on-chip.

bench.py's production number is the *offline* ceiling: one thread feeding
pre-assembled 1024-pose batches into the fused serve. A real deployment sees
independent clients each holding ONE query; `serving_frontend.BatchingFrontend`
exists to rebuild the big device batches from that traffic (the reference has
no online path at all — its eval loop is offline and per-pose,
/root/reference/evaluation/pipeline.py:102-126). This probe measures what the
dispatcher actually delivers:

  1. direct-batched baseline: `Localizer.localize` on one [B] batch/call
     (the bench.py semantics at this probe's batch size);
  2. frontend under closed-loop load: T client threads, each submitting its
     next single query as soon as the previous Future resolves;
  3. the lone-client floor: one thread, max_wait_s of added latency.

The gap 1->2 is the full online tax: Python futures, queue hops, the GIL
under T client threads, and partially-filled groups. Run on the real chip
(no JAX_PLATFORMS override). Weights are random — throughput is shape-, not
value-dependent.
"""
import argparse
import threading
import time

import numpy as np

from text2loc_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=256)
    ap.add_argument("--queries_per_client", type=int, default=20)
    ap.add_argument("--max_batch", type=int, default=512)
    ap.add_argument("--max_wait_ms", type=float, default=2.0)
    ap.add_argument("--num_poses", type=int, default=1024)
    args = ap.parse_args()

    from text2loc_tpu.config import Config
    from text2loc_tpu.data.arrays import MultiSceneArrays
    from text2loc_tpu.data.synthetic import make_scene
    from text2loc_tpu.evaluation.cli import _init_coarse_state, _init_fine_state
    from text2loc_tpu.models.cell_retrieval import CellRetrievalNetwork
    from text2loc_tpu.models.cross_matcher import CrossMatch
    from text2loc_tpu.models.text_embedding import make_embedder
    from text2loc_tpu.serving import Localizer
    from text2loc_tpu.serving_frontend import BatchingFrontend

    cfg, embedder = make_embedder(Config().validate(), None)
    data = MultiSceneArrays([
        make_scene("0000", num_cells=64, num_poses=args.num_poses,
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
    print(f"Localizer build: {time.perf_counter() - t0:.1f}s", flush=True)

    # Warm every power-of-two bucket the dispatcher can produce (compiles
    # persist in the cache; a cold run pays them once, here, not mid-probe).
    b = 1
    while b <= args.max_batch:
        idx = np.arange(b) % data.num_poses
        print(f"warm bucket {b}", flush=True)
        loc.localize(data.hint_dir[idx], data.hint_color[idx],
                     data.hint_label[idx],
                     sentence_mask=data.hint_mask[idx])
        b *= 2

    # ---- 1. direct-batched baseline --------------------------------------
    n = args.clients * args.queries_per_client
    idx_all = np.arange(n) % data.num_poses
    per_call = args.max_batch
    calls = [idx_all[i:i + per_call] for i in range(0, n, per_call)]
    calls = [c if len(c) == per_call else
             np.resize(c, per_call) for c in calls]
    t0 = time.perf_counter()
    for c in calls:
        loc.localize(data.hint_dir[c], data.hint_color[c],
                     data.hint_label[c], sentence_mask=data.hint_mask[c])
    dt = time.perf_counter() - t0
    direct_qps = len(calls) * per_call / dt
    print(f"direct batched ({per_call}/call): {direct_qps:,.0f} q/s",
          flush=True)

    # ---- 2a. frontend, open-loop backlog ----------------------------------
    # Every query enqueued up front: the dispatcher drains max_batch groups
    # back to back. This is the dispatcher's pipelined ceiling — the gap to
    # the direct baseline is pure frontend overhead (queue hops, futures,
    # result slicing), with no closed-loop round-trip serialization.
    fe = BatchingFrontend(loc, max_batch=args.max_batch,
                          max_wait_s=args.max_wait_ms / 1000.0, start=False)
    futures = [
        fe.submit(data.hint_dir[i], data.hint_color[i], data.hint_label[i],
                  sentence_mask=data.hint_mask[i])
        for i in idx_all
    ]
    t0 = time.perf_counter()
    fe.start()
    for f in futures:
        f.result(timeout=600)
    dt = time.perf_counter() - t0
    s = fe.stats
    backlog_qps = len(futures) / dt
    print(
        f"frontend (open-loop backlog of {len(futures)}): "
        f"{backlog_qps:,.0f} q/s  "
        f"dispatches={s.dispatches} mean_group={s.mean_group_size:.1f} "
        f"(vs direct = {backlog_qps / direct_qps:.2f})",
        flush=True,
    )
    fe.close()

    # ---- 2b. frontend, closed-loop clients --------------------------------
    fe = BatchingFrontend(loc, max_batch=args.max_batch,
                          max_wait_s=args.max_wait_ms / 1000.0)
    errors = []

    def client(cid):
        try:
            for j in range(args.queries_per_client):
                i = (cid * args.queries_per_client + j) % data.num_poses
                fe.localize_one(data.hint_dir[i], data.hint_color[i],
                                data.hint_label[i],
                                sentence_mask=data.hint_mask[i],
                                timeout=600)
        except Exception as e:  # noqa: BLE001
            errors.append((cid, e))

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(args.clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    assert not errors, errors[:3]
    s = fe.stats
    online_qps = s.requests / dt
    print(
        f"frontend ({args.clients} closed-loop clients): "
        f"{online_qps:,.0f} q/s  "
        f"dispatches={s.dispatches} mean_group={s.mean_group_size:.1f} "
        f"(online/offline = {online_qps / direct_qps:.2f})",
        flush=True,
    )
    fe.close()

    # ---- 3. lone-client latency floor ------------------------------------
    fe = BatchingFrontend(loc, max_batch=args.max_batch,
                          max_wait_s=args.max_wait_ms / 1000.0)
    fe.localize_one(data.hint_dir[0], data.hint_color[0],
                    data.hint_label[0], sentence_mask=data.hint_mask[0],
                    timeout=600)
    lat = []
    for i in range(50):
        t0 = time.perf_counter()
        fe.localize_one(data.hint_dir[i % data.num_poses],
                        data.hint_color[i % data.num_poses],
                        data.hint_label[i % data.num_poses],
                        sentence_mask=data.hint_mask[i % data.num_poses],
                        timeout=600)
        lat.append((time.perf_counter() - t0) * 1e3)
    lat = np.sort(np.asarray(lat))
    print(f"lone client p50 {lat[len(lat) // 2]:.1f} ms  "
          f"p95 {lat[int(len(lat) * 0.95)]:.1f} ms "
          f"(includes the {args.max_wait_ms:.1f} ms coalescing wait)",
          flush=True)
    fe.close()


if __name__ == "__main__":
    main()
