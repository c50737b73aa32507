"""Benchmark: fine-stage localization throughput (queries/sec/chip).

This reproduces the reference's only in-repo throughput signal — the fine
matching timer "Ran matching for N queries in Xs"
(/root/reference/evaluation/pipeline.py:102-126). There, each pose is a
single-item Python loop: one batch of top-k=10 candidate cells through
CrossMatch, including a fresh frozen-T5-large forward per item. Here the whole
stage is one batched XLA program: frozen text embeddings are a table lookup
(the hint vocabulary is closed — see text2loc_tpu/models/text_embedding.py),
and all Q poses x K candidates run as flattened [Q*K] batches on the MXU.

BUDGET-PROOF SCOREBOARD (round 5): the round-4 driver run timed out before
the single trailing print and recorded nothing (BENCH_r04.json rc=124,
parsed null). This version cannot repeat that:

* the full JSON result line is RE-EMITTED after every section (the driver
  parses the tail — a partial scoreboard beats a null);
* a watchdog thread flushes the current result and exits 0 at BENCH_BUDGET_S
  (default 1650 s) even when the main thread is stuck inside a blocking
  remote compile (a Python SIGTERM handler would be deferred there);
* each section is skipped up front when the remaining budget cannot fit its
  worst-case cold compile, and recorded in `sections_skipped`;
* the relay-congestion gate (scripts/probe_drift.py) runs inline FIRST and
  its `drift_factor` lands in the JSON; the train-step scoreboard is skipped
  when drift >= 2x so a congested tunnel cannot mis-report a 3x training
  "regression" as round 4's partial artifact did.

Sections, headline-first:
  drift      cached-matmul relay probe vs the ~40 ms healthy floor.
  prod       THE headline metric: production serve (cached fine gallery +
             sentence tables), all Q*K pairs in one program.
  cityscale  end-to-end serve (coarse text head + [Q,D]@[D,C] top-k + fine
             CCT tail) at a city-scale gallery (BENCH_CITY_CELLS, default
             4096 cells — the reference's real scaling axis is gallery size,
             /root/reference/training/coarse.py:119-125).
  train      coarse/fine train-step ms + train MFU + eval-retrieval rate.
  raw        reference-loop-semantics recompute path + MFU.
  trunk      full-text-trunk serve (the OOV fallback path).

Baseline: the reference records no number. BASELINE.md's north star is >=5x
A100 throughput; we use an *estimated* reference A100 rate of 20 q/s
(T5-large encoder forward over 10 duplicated hint sets per pose ~0.8 TFLOP
plus the serial PyG point kernels and per-item loop overhead), so
vs_baseline = measured_qps / 20.0. Replace with a measured number when the
reference can be run.

Prints the JSON result line (driver contract: last parseable line wins):
{"metric", "value", "unit", "vs_baseline", ...extras}.
"""

from __future__ import annotations

import atexit
import contextlib
import dataclasses
import functools
import json
import os
import sys
import threading
import time
import traceback

import numpy as np

_T0 = time.perf_counter()


def _log(msg: str) -> None:
    if os.environ.get("BENCH_VERBOSE", "1") != "0":
        print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)

ESTIMATED_REFERENCE_QPS = 20.0  # see module docstring
V5E_PEAK_FLOPS = 197e12         # TPU v5e bf16 peak per chip
V5E_PEAK_BYTES = 819e9          # TPU v5e HBM bandwidth per chip (819 GB/s)
# Serving-batch poses. The production serve's per-dispatch overhead
# amortizes with batch: 256 -> 53.7k q/s, 512 -> 78.7k, 1024 -> 98.5k,
# 2048 -> 113.8k measured round 4 (BENCHMARKS log #16). Default is 1024
# (10 ms batch latency, plateau knee); BENCH_POSES overrides.
NUM_POSES = int(os.environ.get("BENCH_POSES", "1024"))
TOP_K = 10
ITERS = 3
GROUP = 10  # serve epochs per timed group (amortizes the ~30 ms drain)
# Flattened candidates per device batch on the raw (recompute) path — the
# XLA path's HBM edge tensors bound it (~2 GB fp32 at 128); BENCH_CHUNK
# overrides (the fully-fused kernel keeps edges in VMEM, so larger is safe).
CHUNK = int(os.environ.get("BENCH_CHUNK", "128"))
# City-scale gallery size for the end-to-end serve point (VERDICT r4 #2).
CITY_CELLS = int(os.environ.get("BENCH_CITY_CELLS", "4096"))
# Wall-clock budget: the driver kills bench at ~1800 s (BENCH_r04.json
# rc=124); the watchdog flushes the partial result before that. 1650 (not
# 1500): a freshly-started process's FIRST remote compile can stall 10-16
# min after heavy relay use (round-5 session: 976 s before the drift
# section completed, on a healthy-drift day) — the extra 150 s of budget
# is what lets the train section still run after such a stall, and the
# watchdog still fires >=2 min before the driver's kill.
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1650"))
DRIFT_FLOOR_MS = 40.0  # healthy relay reading (scripts/probe_drift.py)

# Worst-case COLD cost per section (compiles through the remote tunnel are
# minutes; these are deliberately pessimistic so a section never starts that
# cannot also finish). Warm-cache runs sail far under them.
NEEDS_S = {
    "prod": 420,
    "prod_bytes": 240,   # compiled exact-XLA twin for the byte roofline
    "cityscale": 330,
    # 480, not 600: the two train-step programs are in the persistent cache
    # for the default shapes (kept warm every round), and the watchdog +
    # incremental emits make an optimistic start safe — a mid-section stall
    # only costs the fields that didn't land, while a pessimistic gate
    # after a first-compile stall (see BUDGET_S) cost the whole section.
    "train": 480,
    "raw": 330,
    "raw_bytes": 240,
    "trunk": 120,
}

RESULT = {
    "metric": "fine_localization_throughput",
    "value": None,
    "unit": "queries/sec/chip",
    "vs_baseline": None,
}


_EMIT_LOCK = threading.Lock()


def emit() -> None:
    # Lock: the watchdog thread may flush concurrently with a section emit;
    # interleaved half-lines would corrupt BOTH JSON lines in the tail.
    with _EMIT_LOCK:
        print(json.dumps(RESULT), flush=True)


def _remaining() -> float:
    return BUDGET_S - (time.perf_counter() - _T0)


def _section(name: str) -> bool:
    """Deadline gate: start a section only if its worst-case cold cost fits."""
    need, rem = NEEDS_S[name], _remaining()
    if rem < need:
        RESULT.setdefault("sections_skipped", []).append(
            {"section": name, "reason": "budget", "remaining_s": round(rem)}
        )
        _log(f"SKIP {name}: needs ~{need:.0f}s cold, {rem:.0f}s left")
        emit()
        return False
    _log(f"section {name} (remaining {rem:.0f}s)")
    return True


def _guard(name: str, fn, *args):
    """Run a section; a failure is recorded and must not kill later sections
    (nor the already-emitted headline)."""
    try:
        return fn(*args)
    except Exception as e:  # noqa: BLE001 — scoreboard isolation by design
        _log(f"section {name} FAILED: {e}\n{traceback.format_exc()}")
        RESULT.setdefault("sections_failed", []).append(
            {"section": name, "error": f"{type(e).__name__}: {e}"}
        )
        emit()
        return None


def _watchdog() -> None:
    """Flush the partial result and exit 0 just before the driver's timeout.

    A thread, not a signal handler: SIGTERM's Python handler is deferred
    while the main thread sits in a blocking native call (exactly where a
    congested-day remote compile leaves it — round 4 died there)."""
    while True:
        rem = _remaining()
        if rem <= 0:
            break
        time.sleep(min(5.0, rem))
    RESULT["watchdog_fired"] = True
    _log(f"watchdog: budget {BUDGET_S:.0f}s exhausted; flushing partial result")
    emit()
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)


@contextlib.contextmanager
def _pallas_off():
    """Trace-time env forcing every kernel (SA, attention, LN, FFN — forward
    AND the fused-SA training VJP) onto its exact XLA path. XLA's cost model
    attributes ZERO flops to Pallas custom calls, so MFU numerators must come
    from an exact-XLA twin of the program."""
    keys = ("TEXT2LOC_FUSED_SA", "TEXT2LOC_FUSED_SA_TRAIN",
            "TEXT2LOC_DISABLE_PALLAS")
    saved = {k: os.environ.get(k) for k in keys}
    os.environ["TEXT2LOC_FUSED_SA"] = "off"
    os.environ["TEXT2LOC_FUSED_SA_TRAIN"] = "0"
    os.environ["TEXT2LOC_DISABLE_PALLAS"] = "1"
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def _cost_dict(analysis):
    if isinstance(analysis, (list, tuple)):
        analysis = analysis[0]
    return analysis


def _lowered_flops(lowered) -> float | None:
    """FLOPs from the UNOPTIMIZED lowered module — no backend compile, so it
    costs seconds of local tracing instead of minutes of remote compile.
    Slightly conservative vs the compiled count (pre-CSE/folding); fields
    derived this way carry a "*_flops_src": "lowered" marker."""
    try:
        cost = _cost_dict(lowered.cost_analysis())
        return float(cost.get("flops", 0.0)) or None
    except Exception as e:  # cost model unavailable on some backends
        _log(f"lowered cost_analysis unavailable: {e}")
        return None


def _twin_flops(make_fn, *args) -> float | None:
    """FLOPs of fn's exact-XLA twin via lowered analysis only (no remote
    compile). The axon/TPU client returns None for unoptimized-HLO cost
    analysis, so on failure the twin is re-LOWERED for the in-process CPU
    backend — a flop count is backend-independent (tracing is local either
    way; no CPU executable is ever built)."""
    import jax

    with _pallas_off():
        fn = make_fn()
        jfn = jax.jit(fn)
        flops = None
        try:
            flops = _lowered_flops(jfn.lower(*args))
        except Exception as e:
            _log(f"default-backend lowering failed: {e}")
        if flops:
            return flops
        try:
            with jax.default_device(jax.devices("cpu")[0]):
                lowered = jax.jit(fn).lower(*args)
            return _lowered_flops(lowered)
        except Exception as e:
            _log(f"cpu-lowered cost_analysis unavailable: {e}")
            return None


def _sds(tree):
    import jax

    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype)
        if not hasattr(x, "shape") else jax.ShapeDtypeStruct(x.shape, x.dtype),
        tree,
    )


# --------------------------------------------------------------------------
# Sections
# --------------------------------------------------------------------------


def _drift_section(ctx):
    """Inline scripts/probe_drift.py: time a tiny cached matmul chain; the
    ~30 ms relay round trip dominates a healthy reading (min < 2x the 40 ms
    floor). drift_factor annotates every number in this JSON."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(x):
        def body(_, a):
            return a @ a * (1.0 / 1024)

        return jax.lax.fori_loop(0, 50, body, x)

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(1024, 1024)), jnp.bfloat16
    )
    drain = ctx["drain"]
    drain(chain(x).astype(jnp.float32))  # compile + settle
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        drain(chain(x).astype(jnp.float32))
        times.append((time.perf_counter() - t0) * 1e3)
    ms = min(times)
    RESULT["drift_ms_min"] = round(ms, 1)
    RESULT["drift_factor"] = round(ms / DRIFT_FLOOR_MS, 2)
    _log(f"drift probe {ms:.1f} ms (factor {RESULT['drift_factor']})")


def _time_groups(fn, drain, group=GROUP, iters=ITERS):
    """min-of-groups wall time of `group` back-to-back fn() epochs."""
    out = fn()
    drain(out)
    groups = []
    for _ in range(iters):
        start = time.perf_counter()
        for _ in range(group):
            out = fn()
        drain(out)
        groups.append(time.perf_counter() - start)
    return min(groups), groups


def _prod_section(ctx):
    """THE headline: production fine-stage serve. Candidate-cell encodings
    and per-sentence text-trunk outputs are pure functions of (static map,
    weights) — cached offline exactly like serving.Localizer — so a query
    pays a table gather + layer-0 hint self block + CCT tail over its K
    candidates, all Q*K pairs in ONE program."""
    import jax
    import jax.numpy as jnp

    from text2loc_tpu import constants as Const
    from text2loc_tpu.evaluation.retrieval import build_vocab_sentence_table
    from text2loc_tpu.training import steps as steps_lib

    cfg, m, model, embedder, data, rng, drain = (
        ctx["cfg"], ctx["m"], ctx["model"], ctx["embedder"], ctx["data"],
        ctx["rng"], ctx["drain"],
    )

    # Each pose against TOP_K candidate cells, flattened (the batched
    # replacement for the reference's per-pose loop, pipeline.py:112-126).
    pose_idx = np.repeat(np.arange(NUM_POSES), TOP_K)
    cell_idx = np.asarray(
        (data.pose_cell_idx[pose_idx] + np.tile(np.arange(TOP_K), NUM_POSES))
        % data.num_cells,
        dtype=np.int64,
    )
    total = len(pose_idx)
    padded = -(-total // CHUNK) * CHUNK  # wrap-pad (BENCH_POSES knob safety)
    if padded != total:
        pose_idx = np.resize(pose_idx, padded)
        cell_idx = np.resize(cell_idx, padded)
    ctx["pose_idx"], ctx["cell_idx"] = pose_idx, cell_idx

    _log("initializing params")
    b0 = data.gather_fine(pose_idx[:CHUNK], m.pad_size,
                          cell_indices=cell_idx[:CHUNK])
    fb0 = steps_lib.prepare_fine_batch(b0, embedder, cfg, rng, train=False)
    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": rng, "dropout": rng}, fb0.objects, fb0.text
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    ctx["params"], ctx["batch_stats"] = params, batch_stats

    # Offline stage 1: per-cell fine encodings, cached POST the CCT's layer-0
    # object self-attention block (a pure function of the cell) — the
    # per-pair serve starts at cct_tail, exactly like serving.Localizer.
    fwd = steps_lib.make_fine_split_forwards(model, embedder, cfg)
    ctx["fwd"] = fwd
    _log("precomputing fine gallery (offline stage)")
    cell_emb, cell_mask = steps_lib.encode_fine_gallery(
        fwd, data, params, batch_stats, m.pad_size, rng, chunk=CHUNK,
        obj_pre=True,
    )
    ctx["cell_emb"], ctx["cell_mask"] = cell_emb, cell_mask

    # Offline stage 2: sentence table — the per-sentence text trunk is a
    # pure function of the sentence over the CLOSED hint vocabulary, so it
    # collapses to a [V, D] table (models/language_encoder.py).
    _log("precomputing sentence table (offline stage)")
    fine_sent_table = build_vocab_sentence_table(
        model, embedder, params, batch_stats, model.encode_hints,
    )
    ctx["fine_sent_table"] = fine_sent_table
    hint_ids_all = jax.device_put(jnp.asarray(Const.hint_id(
        data.hint_dir[:NUM_POSES], data.hint_color[:NUM_POSES],
        data.hint_label[:NUM_POSES],
    )))
    ctx["hint_ids_all"] = hint_ids_all

    text_all = jax.device_put({
        "hint_dir": data.hint_dir[:NUM_POSES],
        "hint_color": data.hint_color[:NUM_POSES],
        "hint_label": data.hint_label[:NUM_POSES],
        "sentence_mask": data.hint_mask[:NUM_POSES],
    })
    sent_all = jnp.asarray(data.hint_mask[:NUM_POSES])
    emb_all = jax.device_put(cell_emb[cell_idx])          # [Q*K, O, D]
    mask_all = jax.device_put(cell_mask[cell_idx])        # [Q*K, O]
    pid_all = jax.device_put(pose_idx.astype(np.int32))   # [Q*K]
    ctx.update(text_all=text_all, sent_all=sent_all, emb_all=emb_all,
               mask_all=mask_all, pid_all=pid_all)

    # One XLA program per epoch: per-query text = sentence-table gather +
    # layer-0 hint self block (shared by the K candidates); per-pair work =
    # cct_tail only. emb_all rows are post the layer-0 object self block.
    @jax.jit
    def serve_epoch_fn(params, batch_stats, ftbl, ids_all, emb_all, mask_all,
                       pid_all):
        hints_all = jnp.take(ftbl, ids_all, axis=0)        # [Q, S, D]
        hints1_all = fwd.hints_pre(params, batch_stats, hints_all, sent_all)
        return fwd.cct_tail(    # nested jit inlines
            params, batch_stats, emb_all, mask_all,
            jnp.take(hints_all, pid_all, axis=0),
            jnp.take(hints1_all, pid_all, axis=0),
            jnp.take(sent_all, pid_all, axis=0),
        )

    def serve_epoch():
        return serve_epoch_fn(params, batch_stats, fine_sent_table,
                              hint_ids_all, emb_all, mask_all, pid_all)

    _log("compiling production path")
    best, groups = _time_groups(serve_epoch, drain)
    _log(f"production groups ({GROUP} epochs each): "
         f"{[f'{t:.2f}' for t in groups]}s")
    qps = NUM_POSES * GROUP / best
    RESULT["value"] = round(qps, 2)
    RESULT["vs_baseline"] = round(qps / ESTIMATED_REFERENCE_QPS, 2)
    _log(f"production serve {qps:.0f} q/s")
    emit()

    # MFU / byte-roofline numerators from the exact-XLA twin (see
    # _pallas_off). FLOPs come from the cheap lowered analysis; "bytes
    # accessed" (the serve is bandwidth-bound — BENCHMARKS log #16) only
    # exists post-fusion, so it still needs the compiled twin, budget
    # permitting.
    def make_cost_serve():
        cost_split = steps_lib.make_fine_split_forwards(model, embedder, cfg)

        def cost_serve(params, batch_stats, ftbl, ids_all, emb_all,
                       mask_all, pid_all):
            hints_all = jnp.take(ftbl, ids_all, axis=0)
            hints1_all = cost_split.hints_pre(params, batch_stats,
                                              hints_all, sent_all)
            return cost_split.cct_tail(
                params, batch_stats, emb_all, mask_all,
                jnp.take(hints_all, pid_all, axis=0),
                jnp.take(hints1_all, pid_all, axis=0),
                jnp.take(sent_all, pid_all, axis=0),
            )

        return cost_serve

    serve_flops = _twin_flops(make_cost_serve, params, batch_stats,
                              fine_sent_table, hint_ids_all, emb_all,
                              mask_all, pid_all)
    if serve_flops:
        s_achieved = serve_flops * qps / NUM_POSES  # flops/epoch * epochs/s
        RESULT["prod_tflops"] = round(s_achieved / 1e12, 2)
        RESULT["prod_mfu"] = round(s_achieved / V5E_PEAK_FLOPS, 4)
        RESULT["prod_flops_src"] = "lowered"
        emit()
    if _section("prod_bytes"):
        try:
            with _pallas_off():
                lowered = jax.jit(make_cost_serve()).lower(
                    params, batch_stats, fine_sent_table, hint_ids_all,
                    emb_all, mask_all, pid_all,
                )
                cost = _cost_dict(lowered.compile().cost_analysis())
            serve_bytes = float(cost.get("bytes accessed", 0.0)) or None
            cflops = float(cost.get("flops", 0.0)) or None
        except Exception as e:
            _log(f"compiled twin cost_analysis unavailable: {e}")
            serve_bytes = cflops = None
        if cflops:
            # Post-optimization count — continuous with rounds 2-4.
            s_achieved = cflops * qps / NUM_POSES
            RESULT["prod_tflops"] = round(s_achieved / 1e12, 2)
            RESULT["prod_mfu"] = round(s_achieved / V5E_PEAK_FLOPS, 4)
            RESULT["prod_flops_src"] = "compiled"
        if serve_bytes:
            # LOGICAL bytes of the exact-XLA twin: an upper bound on physical
            # HBM traffic (fusion keeps re-read operands on-chip), so
            # prod_bw_frac > 1 means the true traffic beats the naive byte
            # model, NOT >100% of the hardware (BENCHMARKS log #16).
            b_achieved = serve_bytes * qps / NUM_POSES
            RESULT["prod_gbps"] = round(b_achieved / 1e9, 1)
            RESULT["prod_bw_frac"] = round(b_achieved / V5E_PEAK_BYTES, 4)
        emit()
    return True


def _cityscale_section(ctx):
    """End-to-end serve at a city-scale gallery (VERDICT r4 #2): coarse text
    head + full-gallery [Q, D] @ [D, C] top-k + fine CCT tail over the K
    winners, one program — serving.Localizer._build_serve's shape at
    C = BENCH_CITY_CELLS. The reference scales in GALLERY SIZE (its eval
    scores every cell per query, /root/reference/training/coarse.py:119-125);
    64-cell toy numbers hide the coarse stage's share, measured here.

    Gallery content: the fine cache tiles the 64 real encoded cells (+noise)
    and the coarse gallery is random unit rows — serve TIME depends only on
    shapes, and correctness of the fused serve is pinned by
    tests/test_serving.py + the dryrun's sharded==dense assert. Encoding a
    real 4096-cell map offline costs ~C/CHUNK reuses of the same compiled
    chunk program (amortized out of the per-query path by design)."""
    import jax
    import jax.numpy as jnp

    from text2loc_tpu.evaluation.retrieval import (
        build_vocab_sentence_table,
        topk_retrieval,
    )
    from text2loc_tpu.models.cell_retrieval import CellRetrievalNetwork
    from text2loc_tpu.training import steps as steps_lib

    cfg, m, embedder, data, rng, drain = (
        ctx["cfg"], ctx["m"], ctx["embedder"], ctx["data"], ctx["rng"],
        ctx["drain"],
    )
    fwd = ctx["fwd"]

    _log("cityscale: coarse tower init + sentence table")
    cmodel = CellRetrievalNetwork(m)
    cb = data.gather_coarse(np.arange(4), m.object_size)
    cobjects, ctext = steps_lib.prepare_coarse_batch(
        cb, embedder, cfg, rng, train=False
    )
    copt = steps_lib.make_optimizer(cfg, steps_per_epoch=1)
    cstate = steps_lib.init_train_state(cmodel, copt, rng, cobjects, ctext)
    ctx["cmodel"], ctx["cstate"] = cmodel, cstate
    ctbl = build_vocab_sentence_table(
        cmodel, embedder, cstate.params, cstate.batch_stats,
        cmodel.encode_text_sentences,
    )

    c = CITY_CELLS
    host_rng = np.random.default_rng(7)
    gal = host_rng.normal(size=(c, m.coarse_embed_dim)).astype(np.float32)
    gal /= np.linalg.norm(gal, axis=1, keepdims=True)
    gallery = jax.device_put(jnp.asarray(gal))
    reps = -(-c // len(ctx["cell_emb"]))
    emb_city = np.tile(ctx["cell_emb"], (reps, 1, 1))[:c]
    emb_city += host_rng.normal(scale=0.01, size=emb_city.shape).astype(
        emb_city.dtype
    )
    mask_city = np.tile(ctx["cell_mask"], (reps, 1))[:c]
    fine_emb = jax.device_put(jnp.asarray(emb_city))      # [C, O, D]
    fine_mask = jax.device_put(jnp.asarray(mask_city))    # [C, O]
    g = int(np.ceil(np.sqrt(c)))
    bbox_xy = jax.device_put(jnp.asarray(np.stack(
        [(np.arange(c) % g) * 30.0, (np.arange(c) // g) * 30.0], axis=1
    ).astype(np.float32)))                                # [C, 2]
    size_c = jax.device_put(jnp.full((c,), 30.0, jnp.float32))

    ids, sm = ctx["hint_ids_all"], ctx["sent_all"]
    cparams, cstats = cstate.params, cstate.batch_stats
    fparams, fstats = ctx["params"], ctx["batch_stats"]
    ftbl = ctx["fine_sent_table"]

    @jax.jit
    def serve_city(cparams, cstats, fparams, fstats, gallery, fine_emb,
                   fine_mask, bbox_xy, size_c, ctbl, ftbl, ids, sm):
        text_enc = cmodel.apply(
            {"params": cparams, "batch_stats": cstats},
            jnp.take(ctbl, ids, axis=0), sm, train=False,
            method=cmodel.encode_text_from_sentences,
        )
        scores, idx = topk_retrieval(gallery, text_enc, TOP_K)
        hints = jnp.take(ftbl, ids, axis=0)
        hints1 = fwd.hints_pre(fparams, fstats, hints, sm)
        b = text_enc.shape[0]
        rep = jnp.repeat(jnp.arange(b), TOP_K)
        flat = idx.reshape(-1)
        pred = fwd.cct_tail(
            fparams, fstats, fine_emb[flat], fine_mask[flat],
            hints[rep], hints1[rep], sm[rep],
        ).reshape(b, TOP_K, 2)
        cand_w = bbox_xy[idx] + pred * size_c[idx][..., None]
        return cand_w, idx, scores

    @jax.jit
    def coarse_city(cparams, cstats, gallery, ctbl, ids, sm):
        text_enc = cmodel.apply(
            {"params": cparams, "batch_stats": cstats},
            jnp.take(ctbl, ids, axis=0), sm, train=False,
            method=cmodel.encode_text_from_sentences,
        )
        return topk_retrieval(gallery, text_enc, TOP_K)

    def full_epoch():
        return serve_city(cparams, cstats, fparams, fstats, gallery,
                          fine_emb, fine_mask, bbox_xy, size_c, ctbl, ftbl,
                          ids, sm)[0]

    def coarse_epoch():
        return coarse_city(cparams, cstats, gallery, ctbl, ids, sm)[0]

    _log(f"cityscale: compiling end-to-end serve (C={c})")
    best_full, groups = _time_groups(full_epoch, drain)
    _log(f"cityscale full groups: {[f'{t:.2f}' for t in groups]}s")
    best_coarse, _ = _time_groups(coarse_epoch, drain)
    qps = NUM_POSES * GROUP / best_full
    coarse_ms = best_coarse / GROUP * 1e3
    full_ms = best_full / GROUP * 1e3
    RESULT["serve_qps_cityscale"] = round(qps, 2)
    RESULT["gallery_cells"] = c
    RESULT["cityscale_coarse_ms"] = round(coarse_ms, 2)      # per Q-batch
    RESULT["cityscale_fine_ms"] = round(full_ms - coarse_ms, 2)
    _log(f"cityscale serve {qps:.0f} q/s at C={c} "
         f"(coarse {coarse_ms:.1f} ms / fine {full_ms - coarse_ms:.1f} ms "
         f"per {NUM_POSES}-query batch)")
    emit()


def _train_section(ctx):
    """Train-step ms + MFU + eval-retrieval rate for the round-over-round
    JSON. Only entered when drift_factor < 2 (a congested relay inflated the
    round-4 partial numbers 3.2x) and the remaining budget fits the two
    train-step compiles. Device residency here is a few hundred MB of serve
    tensors (the 2 GB raw-path chunks stage AFTER this section — the round-4
    "host contention" 55% effect came from those)."""
    import jax
    import jax.numpy as jnp

    from text2loc_tpu.evaluation.retrieval import (
        encode_gallery,
        topk_retrieval,
    )
    from text2loc_tpu.models.cell_retrieval import CellRetrievalNetwork
    from text2loc_tpu.models.cross_matcher import CrossMatch
    from text2loc_tpu.training import steps as steps_lib
    from text2loc_tpu.training.steps import make_coarse_encoders

    cfg, m, embedder, data, rng, drain = (
        ctx["cfg"], ctx["m"], ctx["embedder"], ctx["data"], ctx["rng"],
        ctx["drain"],
    )
    cfg_train = cfg.replace(
        model=dataclasses.replace(m, dtype=m.train_dtype),
        train=dataclasses.replace(
            cfg.train, batch_size=min(cfg.train.batch_size, data.num_poses)
        ),
    )
    order = np.random.default_rng(1)
    train_ms = {}
    for stage in ("coarse", "fine"):
        _log(f"train-step bench: {stage}")
        t_rng = jax.random.PRNGKey(0)
        opt = steps_lib.make_optimizer(cfg_train, steps_per_epoch=100)
        if stage == "coarse":
            smodel = CellRetrievalNetwork(cfg_train.model)
            b0 = data.gather_coarse(
                np.arange(cfg_train.train.batch_size), m.object_size
            )
            objects, text = steps_lib.prepare_coarse_batch(
                b0, embedder, cfg_train, t_rng, train=False
            )
            st = steps_lib.init_train_state(smodel, opt, t_rng, objects, text)
            make_step = functools.partial(
                steps_lib.make_coarse_train_step, smodel, embedder, cfg_train,
                opt,
            )
            gather = lambda i: data.gather_coarse(i, m.object_size)
        else:
            smodel = CrossMatch(cfg_train.model)
            b0 = data.gather_fine(
                np.arange(cfg_train.train.batch_size), m.pad_size
            )
            fb = steps_lib.prepare_fine_batch(
                b0, embedder, cfg_train, t_rng, train=False
            )
            st = steps_lib.init_train_state(smodel, opt, t_rng, fb.objects,
                                            fb.text)
            make_step = functools.partial(
                steps_lib.make_fine_train_step, smodel, embedder, cfg_train,
                opt,
            )
            gather = lambda i: data.gather_fine(i, m.pad_size)
        tstep = jax.jit(make_step(), donate_argnums=(0,))
        bs = cfg_train.train.batch_size
        host_batches = [
            gather(order.choice(data.num_poses, bs, replace=False))
            for _ in range(12)
        ]
        # DEVICE-STAGE the batches before the timer: the tunnel's UPLOAD
        # bandwidth swings far wider than its round-trip latency (measured
        # 54 MB/s one session — the drift probe can't see this axis), and a
        # host-fed loop re-uploads ~6 MB/step, which mis-read as a 3.2x
        # training "regression" in round 4's partial artifact. The scoreboard
        # tracks the train-step PROGRAM; upload health is reported separately
        # below (scripts/probe_train_input.py splits all three).
        t0 = time.perf_counter()
        tbatches = [jax.device_put(b) for b in host_batches]
        jax.block_until_ready(tbatches)
        up_s = time.perf_counter() - t0
        up_bytes = sum(
            a.nbytes for a in jax.tree_util.tree_leaves(host_batches)
            if hasattr(a, "nbytes")
        )
        RESULT["train_input_gbps"] = round(up_bytes / up_s / 1e9, 3)
        sds_state = _sds(st)
        st, mt = tstep(st, tbatches[0], t_rng)      # compile
        float(jax.device_get(mt["loss"]))
        groups_ms = []
        for i in range(0, 12, 4):                   # min-of-groups (drift)
            t0 = time.perf_counter()
            for b in tbatches[i:i + 4]:
                t_rng, srng = jax.random.split(t_rng)
                st, mt = tstep(st, b, srng)
            float(jax.device_get(mt["loss"]))
            groups_ms.append((time.perf_counter() - t0) / 4 * 1e3)
        train_ms[stage] = round(min(groups_ms), 2)
        RESULT[f"{stage}_train_ms"] = train_ms[stage]
        _log(f"{stage} train {train_ms[stage]:.1f} ms/step")
        emit()

        # Train MFU (VERDICT r4 #5): FLOPs of the exact-XLA twin train step
        # from the LOWERED analysis (local tracing; no second remote
        # compile). f32 bodies vs the bf16 peak — a conservative MFU.
        flops = _twin_flops(make_step, sds_state, _sds(tbatches[0]),
                            _sds(t_rng))
        if flops:
            achieved = flops / (train_ms[stage] / 1e3)
            RESULT[f"train_{stage}_tflops"] = round(achieved / 1e12, 2)
            RESULT[f"train_{stage}_mfu"] = round(achieved / V5E_PEAK_FLOPS, 4)
            RESULT["train_flops_src"] = "lowered"
            _log(f"{stage} train MFU {RESULT[f'train_{stage}_mfu']:.3f}")
            emit()
        del st, tstep, tbatches, host_batches

    # Eval-retrieval query rate: the reference's own eval-side timer scope
    # ("Encoded N query texts in Xs", training/coarse.py:101) — query text
    # encode + top-k against an already-encoded gallery.
    _log("eval-retrieval bench")
    cmodel = ctx.get("cmodel")
    cstate = ctx.get("cstate")
    if cmodel is None:
        cmodel = CellRetrievalNetwork(m)
        cb = data.gather_coarse(np.arange(4), m.object_size)
        cobjects, ctext = steps_lib.prepare_coarse_batch(
            cb, embedder, cfg, rng, train=False
        )
        copt = steps_lib.make_optimizer(cfg, steps_per_epoch=1)
        cstate = steps_lib.init_train_state(cmodel, copt, rng, cobjects,
                                            ctext)
    encoders = make_coarse_encoders(cmodel, embedder, cfg)
    gal = jnp.asarray(
        encode_gallery(data, cstate, encoders[0], cfg, rng)
    )
    qb = jax.device_put({
        "hint_dir": data.hint_dir[:NUM_POSES],
        "hint_color": data.hint_color[:NUM_POSES],
        "hint_label": data.hint_label[:NUM_POSES],
        "sentence_mask": data.hint_mask[:NUM_POSES],
    })

    @jax.jit
    def eval_epoch(params, stats, gal, qb):
        enc = cmodel.apply(
            {"params": params, "batch_stats": stats},
            steps_lib.embed_text_batch(embedder, qb), train=False,
            method=cmodel.encode_text,
        )
        return topk_retrieval(gal, enc, TOP_K)[1]

    def one_epoch():
        return eval_epoch(cstate.params, cstate.batch_stats, gal, qb)

    best, _ = _time_groups(one_epoch, drain)
    eval_qps = NUM_POSES * GROUP / best
    RESULT["eval_retrieval_qps"] = round(eval_qps, 2)
    _log(f"eval retrieval {eval_qps:.0f} q/s")
    emit()


def _raw_section(ctx):
    """Reference-equivalent work: every candidate cell re-encoded per query
    (the reference's own loop semantics, pipeline.py:105-126), chunked
    through the full fine forward (PointNet + encoders + CCT)."""
    import jax

    from text2loc_tpu.training import steps as steps_lib
    from text2loc_tpu.utils.profiling import profile_trace

    cfg, m, model, embedder, data, rng, drain = (
        ctx["cfg"], ctx["m"], ctx["model"], ctx["embedder"], ctx["data"],
        ctx["rng"], ctx["drain"],
    )
    params, batch_stats = ctx["params"], ctx["batch_stats"]
    pose_idx, cell_idx = ctx["pose_idx"], ctx["cell_idx"]
    total = len(pose_idx)

    _log("gathering host batches")
    # Pre-stage chunks on device: the bench measures the fine-stage compute
    # (the reference timer's scope), not PCIe/relay transfer of synthetic
    # inputs. A production server keeps candidate cells device-resident.
    chunks = [
        jax.device_put(
            data.gather_fine(
                pose_idx[i : i + CHUNK], m.pad_size,
                cell_indices=cell_idx[i : i + CHUNK],
            )
        )
        for i in range(0, total, CHUNK)
    ]

    forward = steps_lib.make_fine_forward(model, embedder, cfg)
    _log("compiling fine forward")
    out = forward(params, batch_stats, chunks[0], rng)
    out.block_until_ready()
    _log("compiled; timing")

    profile_dir = os.environ.get("BENCH_PROFILE_DIR")
    raw_epochs = []
    with profile_trace(profile_dir):
        for _ in range(ITERS):
            start = time.perf_counter()
            for ch in chunks:
                out = forward(params, batch_stats, ch, rng)
            drain(out)
            raw_epochs.append(time.perf_counter() - start)
    raw_elapsed = min(raw_epochs)
    _log(f"raw epochs: {[f'{t:.2f}' for t in raw_epochs]}s")
    # Credit the work actually done: padding wraps extra pairs, so the
    # per-pose rate is (pairs / TOP_K), not NUM_POSES.
    raw_qps = (total / TOP_K) / raw_elapsed
    RESULT["raw_recompute_qps"] = round(raw_qps, 2)
    RESULT["raw_vs_baseline"] = round(raw_qps / ESTIMATED_REFERENCE_QPS, 2)
    _log(f"raw recompute {raw_qps:.0f} q/s")
    emit()

    flops = _twin_flops(
        lambda: steps_lib.make_fine_forward(model, embedder, cfg),
        params, batch_stats, chunks[0], rng,
    )
    src = "lowered"
    if _section("raw_bytes"):
        try:
            with _pallas_off():
                cost_fwd = steps_lib.make_fine_forward(model, embedder, cfg)
                lowered = cost_fwd.lower(params, batch_stats, chunks[0], rng)
                cost = _cost_dict(lowered.compile().cost_analysis())
            cflops = float(cost.get("flops", 0.0)) or None
            if cflops:
                flops, src = cflops, "compiled"  # continuous with rounds 2-4
        except Exception as e:
            _log(f"raw compiled twin cost_analysis unavailable: {e}")
    if flops:
        achieved = flops * len(chunks) / raw_elapsed
        RESULT["raw_tflops"] = round(achieved / 1e12, 2)
        RESULT["raw_mfu"] = round(achieved / V5E_PEAK_FLOPS, 4)
        RESULT["raw_flops_src"] = src
        emit()
    del chunks


def _trunk_section(ctx):
    """Full-trunk variant (intra stack per query — what serving runs for
    out-of-vocabulary/embedded batches): timed for the record."""
    import jax
    import jax.numpy as jnp

    drain, fwd = ctx["drain"], ctx["fwd"]
    params, batch_stats = ctx["params"], ctx["batch_stats"]
    text_all, sent_all = ctx["text_all"], ctx["sent_all"]
    emb_all, mask_all, pid_all = ctx["emb_all"], ctx["mask_all"], ctx["pid_all"]

    @jax.jit
    def serve_epoch_trunk_fn(params, batch_stats, text_all, emb_all, mask_all,
                             pid_all):
        hints_all = fwd.encode_text(params, batch_stats, text_all)
        hints1_all = fwd.hints_pre(params, batch_stats, hints_all, sent_all)
        return fwd.cct_tail(
            params, batch_stats, emb_all, mask_all,
            jnp.take(hints_all, pid_all, axis=0),
            jnp.take(hints1_all, pid_all, axis=0),
            jnp.take(sent_all, pid_all, axis=0),
        )

    def trunk_epoch():
        return serve_epoch_trunk_fn(params, batch_stats, text_all, emb_all,
                                    mask_all, pid_all)

    best, _ = _time_groups(trunk_epoch, drain)
    trunk_qps = NUM_POSES * GROUP / best
    RESULT["prod_trunk_qps"] = round(trunk_qps, 2)
    _log(f"full-trunk serve {trunk_qps:.0f} q/s")
    emit()


def main():
    from text2loc_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from text2loc_tpu.config import Config, ModelConfig, TrainConfig
    from text2loc_tpu.data.arrays import MultiSceneArrays
    from text2loc_tpu.data.synthetic import make_scene
    from text2loc_tpu.models.cross_matcher import CrossMatch
    from text2loc_tpu.models.text_embedding import HintTextEmbedder

    threading.Thread(target=_watchdog, daemon=True).start()
    atexit.register(emit)

    cfg = Config(model=ModelConfig(), train=TrainConfig()).validate()
    m = cfg.model
    RESULT["budget_s"] = BUDGET_S
    _log(f"backend={jax.default_backend()} devices={jax.devices()}")

    def _drain(x):
        np.asarray(jnp.sum(x))  # block_until_ready can return early (relay)

    # Synthetic scene with reference-scale shapes: pad_size objects/cell,
    # 256 points/object, 6 hints/pose.
    scene = make_scene(
        scene_name="0000",
        num_cells=64,
        num_poses=NUM_POSES,
        object_slots=max(m.object_size, m.pad_size),
        num_points=m.pointnet.num_points,
        num_mentioned=m.num_mentioned,
        seed=0,
    )
    ctx = {
        "cfg": cfg, "m": m,
        "model": CrossMatch(m),
        "embedder": HintTextEmbedder.compositional(
            embed_dim=m.text_embed_dim, max_tokens=m.max_hint_tokens
        ),
        "data": MultiSceneArrays([scene]),
        "rng": jax.random.PRNGKey(0),
        "drain": _drain,
    }

    _guard("drift", _drift_section, ctx)
    emit()

    prod_ok = None
    if _section("prod"):
        prod_ok = _guard("prod", _prod_section, ctx)
    if prod_ok and _section("cityscale"):
        _guard("cityscale", _cityscale_section, ctx)
    if os.environ.get("BENCH_TRAIN", "1") != "0":
        if RESULT.get("drift_factor", 1.0) >= 2.0:
            # Congested relay: train-step ms would be pure drift noise
            # (CLAUDE.md: identical cached programs measured 53 vs 165 ms).
            RESULT["train_skipped"] = "relay_drift"
            emit()
        elif _section("train"):
            _guard("train", _train_section, ctx)
    if prod_ok and _section("raw"):
        _guard("raw", _raw_section, ctx)
    if prod_ok and _section("trunk"):
        _guard("trunk", _trunk_section, ctx)
    emit()


if __name__ == "__main__":
    sys.exit(main())
