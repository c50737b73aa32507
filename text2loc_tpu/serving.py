"""End-to-end localization service: text hints -> world position.

The reference's only inference surface is the benchmark script
(/root/reference/evaluation/pipeline.py). This wraps the same coarse-to-fine
stack as a reusable serving object for production use:

* the cell gallery is encoded ONCE and held device-resident (optionally
  sharded over a mesh for city-scale galleries);
* a query (one hint set) runs: text tower -> top-k gallery retrieval ->
  batched CrossMatch refinement over the k candidates -> top-1 world position
  (plus the per-candidate positions/scores for downstream fusion).

Queries are fixed-shape, so the whole serve path compiles once.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from text2loc_tpu.config import Config
from text2loc_tpu.data.arrays import MultiSceneArrays
from text2loc_tpu.evaluation.retrieval import (
    encode_gallery,
    make_coarse_encoders,
    topk_retrieval,
)
from text2loc_tpu.models.text_embedding import HintTextEmbedder
from text2loc_tpu.training import steps as steps_lib
from text2loc_tpu.training.steps import TrainState


def _npz_pack(name: str, arr) -> dict:
    """np.savez-safe encoding for one array: ml_dtypes dtypes (bfloat16 —
    the default serving dtype — fp8, ...) serialize as raw void '|V2' which
    np.load returns unreadably, so they are stored as lossless float32 plus
    a `<name>__dtype` sidecar; `_npz_unpack` casts back."""
    a = np.asarray(arr)
    if a.dtype.kind == "V":
        return {name: a.astype(np.float32),
                name + "__dtype": np.asarray(a.dtype.name)}
    return {name: a}


def _npz_unpack(cache: dict) -> dict:
    """Inverse of `_npz_pack` over a loaded cache dict (pass-through for
    entries without a dtype sidecar, e.g. caches saved by float32 models)."""
    out = {}
    for k, v in cache.items():
        if k.endswith("__dtype"):
            continue
        dt = cache.get(k + "__dtype")
        out[k] = v.astype(np.dtype(getattr(jnp, str(dt)))) if dt is not None \
            else v
    return out


class LocalizationResult(NamedTuple):
    position_w: np.ndarray       # [B, 2] top-1 world position per query
    candidates_w: np.ndarray     # [B, K, 2] per-candidate world positions
    cell_indices: np.ndarray     # [B, K] retrieved gallery cells
    scores: np.ndarray           # [B, K] retrieval similarities


class Localizer:
    """Production query path over a fixed cell gallery.

    IMMUTABLE after construction: the coarse gallery, fine cell cache, and
    (in mesh mode) the mesh-replicated parameter copies are all derived
    from the states/map passed to ``__init__``. Reassigning the states
    later would desynchronize towers from their precomputed caches (and
    the sharded serve would keep the build-time weights entirely) — so
    ``coarse_state``/``fine_state`` are read-only properties; assignment
    raises. Construct a new Localizer for new weights; ``cache_path``
    makes that cheap for unchanged maps.
    """

    @property
    def coarse_state(self) -> TrainState:
        return self._coarse_state

    @property
    def fine_state(self) -> TrainState:
        return self._fine_state

    def __init__(
        self,
        data: MultiSceneArrays,
        coarse_state: TrainState,
        coarse_model,
        fine_state: TrainState,
        fine_model,
        embedder: HintTextEmbedder,
        cfg: Config,
        top_k: int = 10,
        mesh=None,
        precompute_fine: bool = True,
        chunk: int = 128,
        cache_path: Optional[str] = None,
        online_encoder=None,
    ):
        self.data = data
        self.cfg = cfg
        self.top_k = min(top_k, data.num_cells)
        self.embedder = embedder
        self._coarse_state = coarse_state
        self._fine_state = fine_state
        self._coarse_model = coarse_model
        self._fine_model = fine_model
        self.mesh = mesh
        self._chunk = chunk
        # Optional online sentence encoder (models/t5_encoder.T5OnlineEncoder
        # or compatible): enables localize_text on sentences OUTSIDE the
        # closed template vocabulary (reference language_encoder.py:106-128).
        self.online_encoder = online_encoder
        if online_encoder is not None:
            assert online_encoder.embed_dim == embedder.embed_dim, (
                "online encoder embed_dim must match the frozen table's "
                f"({online_encoder.embed_dim} != {embedder.embed_dim})"
            )

        encode_cells, encode_text = make_coarse_encoders(coarse_model, embedder, cfg)
        self._encode_text = encode_text

        # Gallery caches are pure functions of (static map data, weights) —
        # encoding them dominates serving start-up (one PointNet pass per
        # cell). `cache_path` persists them: first construction encodes and
        # saves, later restarts load and are query-ready immediately. The
        # cache is guarded by gallery size, pad size, and a byte-exact
        # digest of (params, batch_stats, frozen-embedder content, map
        # arrays) so a stale file fails loudly instead of serving wrong
        # positions.
        self._digest = self._cache_digest() if cache_path is not None else None
        cached = self._load_cache(cache_path)
        cache_dirty = cache_path is not None and cached is None
        gallery = (
            cached["gallery"]
            if cached is not None
            else encode_gallery(data, coarse_state, encode_cells, cfg,
                                jax.random.PRNGKey(0))
        )
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from text2loc_tpu.parallel.retrieval import make_sharded_topk, pad_gallery

            padded, c = pad_gallery(gallery, mesh.devices.size)
            self._gallery = jax.device_put(
                padded, NamedSharding(mesh, P(mesh.axis_names[0]))
            )
            self._topk = make_sharded_topk(
                mesh, self.top_k, c, axis_name=mesh.axis_names[0]
            )
            self._num_real_cells = c
        else:
            self._gallery = jnp.asarray(gallery)
            self._topk = None
        self._fine_forward = steps_lib.make_fine_forward(fine_model, embedder, cfg)
        self._rng = jax.random.PRNGKey(0)

        # Fine-stage gallery cache: per-cell object embeddings are a pure
        # function of static map data — encode every gallery cell ONCE, and
        # each query pays only for its text tower + CCT refinement. The
        # reference re-encodes candidate cells inside its per-pose loop
        # (evaluation/pipeline.py:105-126). The cache holds the cells POST
        # layer-0 self-attention (CrossMatch.cct_obj_pre — also a pure
        # function of the cell), so the per-pair serve starts at cct_tail;
        # the npz key is `fine_emb1` so pre-factorization caches (raw
        # encode_objects rows under `fine_emb`) degrade to gallery-only and
        # re-encode instead of feeding the wrong tensor into the tail.
        self._fine_emb = self._fine_mask = None
        # A precompute_fine=False construction must not DESTROY an existing
        # fine cache: if this run re-saves (e.g. to add missing sentence
        # tables), the cached encodings are carried through to the new file.
        self._carry_fine = (
            (cached["fine_emb1"], cached["fine_mask"])
            if not precompute_fine and cached is not None
            and "fine_emb1" in cached else None
        )
        if precompute_fine:
            fwd = steps_lib.make_fine_split_forwards(fine_model, embedder, cfg)
            self._fine_fwd = fwd
            if cached is not None and "fine_emb1" in cached:
                self._fine_emb = cached["fine_emb1"]
                self._fine_mask = cached["fine_mask"]
            else:
                # A gallery-only cache (saved by a precompute_fine=False
                # run) still spares the coarse pass: encode just the fine
                # cache and re-save the upgraded file.
                self._fine_emb, self._fine_mask = steps_lib.encode_fine_gallery(
                    fwd, data, fine_state.params, fine_state.batch_stats,
                    cfg.model.pad_size, self._rng, chunk=chunk, obj_pre=True,
                )
                cache_dirty = cache_path is not None

        # Sentence-embedding tables: at eval, the text towers' per-sentence
        # trunk (intra stack + token pool + inter_mlp) is a pure function of
        # one sentence's frozen token embeddings — so over the CLOSED hint
        # vocabulary it collapses to [V, D] tables computed once per weights
        # (LanguageEncoder.encode_sentences). In-vocabulary queries then cost
        # a gather (+ the tiny coarse inter head) instead of the full intra
        # stack at E=1024 — the dominant per-query text cost. OOV/embedded
        # batches keep the full trunk path. Cached alongside the gallery
        # (rebuilding is cheap compute but a fresh multi-minute XLA compile
        # over a remote-compile tunnel).
        if cached is not None and "coarse_sent_table" in cached:
            self._coarse_sent_table = jnp.asarray(cached["coarse_sent_table"])
            self._fine_sent_table = jnp.asarray(cached["fine_sent_table"])
        else:
            self._coarse_sent_table, self._fine_sent_table = (
                self._build_sentence_tables()
            )
            cache_dirty = cache_path is not None

        if cache_dirty:
            self._save_cache(cache_path, np.asarray(gallery))

        # One-program serve path (cached gallery): every query is a SINGLE
        # dispatch + one readback. The stepwise flow pays a ~30 ms tunnel
        # round trip per host sync (top-k indices, fine preds, ...);
        # measured single-query p50 dropped ~100 -> ~40 ms
        # (scripts/probe_latency.py). With a mesh, the sharded variant keeps
        # the gallery AND the fine cache sharded over the devices and fuses
        # per-shard retrieval + refinement + an ICI candidate merge into the
        # same single program.
        self._bbox_d = jnp.asarray(data.cell_bbox)
        self._size_d = jnp.asarray(data.cell_size)
        self._serve = None
        if self._fine_emb is not None:
            if mesh is None:
                # Device-resident ONCE: encode_fine_gallery and the cache
                # both hand back host numpy, and jit re-uploads numpy
                # arguments every call — per-query transfer of the whole
                # [C, pad, D] fine cache would defeat the single-dispatch
                # serve. (The sharded path device_puts _fine_emb_sh at
                # build time already.)
                self._fine_emb = jnp.asarray(self._fine_emb)
                self._fine_mask = jnp.asarray(self._fine_mask)
                self._serve = self._build_serve()
            else:
                self._serve = self._build_serve_sharded(mesh)

    def _build_sentence_tables(self):
        """([V, Dc], [V, Df]) per-sentence trunk outputs over the vocabulary
        (the shared retrieval.build_vocab_sentence_table construction)."""
        from text2loc_tpu.evaluation.retrieval import build_vocab_sentence_table

        coarse = build_vocab_sentence_table(
            self._coarse_model, self.embedder, self.coarse_state.params,
            self.coarse_state.batch_stats,
            self._coarse_model.encode_text_sentences,
        )
        fine = build_vocab_sentence_table(
            self._fine_model, self.embedder, self.fine_state.params,
            self.fine_state.batch_stats, self._fine_model.encode_hints,
        )
        return coarse, fine                                 # [V, D] each

    def _cache_digest(self) -> str:
        """SHA-256 over everything the cached encodings are a function of:
        both towers' params AND batch_stats (eval-mode BN uses running
        statistics), plus the map's geometry/feature arrays. A byte-exact
        hash — continued fine-tuning, a re-generated map with the same cell
        grid, or swapped running stats all change it."""
        import hashlib

        h = hashlib.sha256()

        def update_tree(tree):
            leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
            for path, leaf in leaves:
                a = np.asarray(leaf)
                h.update(str(path).encode())
                h.update(str((a.shape, str(a.dtype))).encode())
                h.update(np.ascontiguousarray(a).tobytes())

        for tree in (
            self.coarse_state.params, self.coarse_state.batch_stats,
            self.fine_state.params, self.fine_state.batch_stats,
        ):
            update_tree(tree)
        # The sentence tables are additionally a function of the frozen text
        # embedder (its content hash covers table + token mask).
        h.update(self.embedder.checksum().encode())
        # Config knobs the cached encodings depend on beyond the weights:
        # per-cell object caps and point budget change what the towers see;
        # the compute dtype changes the cached values themselves.
        m = self.cfg.model
        h.update(str((m.object_size, m.pad_size, m.pointnet.num_points,
                      m.dtype, m.mask_padded)).encode())
        d = self.data
        for a in (d.cell_bbox, d.cell_size, d.obj_xyz, d.obj_rgb,
                  d.obj_center, d.obj_color, d.obj_num_points, d.obj_class,
                  d.obj_color_idx, d.obj_mask):
            h.update(np.ascontiguousarray(a).tobytes())
        return h.hexdigest()

    def _load_cache(self, cache_path):
        """Validated cache npz, or None (absent / unreadable / gallery-only
        when the fine cache is also needed -> caller re-encodes). A readable
        cache whose digest does NOT match raises: silently serving stale
        encodings would produce wrong positions."""
        import os
        import warnings

        if cache_path is None or not os.path.exists(cache_path):
            return None
        try:
            # Materialize into a plain dict and close the NpzFile — a live
            # NpzFile would hold the zip handle open for the Localizer's
            # lifetime (and across the os.replace of a cache upgrade).
            with np.load(cache_path, allow_pickle=False) as f:
                cache = _npz_unpack({k: f[k] for k in f.files})
        except Exception as e:  # truncated/corrupt write, not an npz, ...
            warnings.warn(
                f"unreadable gallery cache {cache_path} ({e}); re-encoding"
            )
            return None
        if not {"gallery", "num_cells", "pad_size", "digest"} <= set(cache):
            warnings.warn(
                f"gallery cache {cache_path} has missing fields; re-encoding"
            )
            return None
        if (
            int(cache["num_cells"]) != self.data.num_cells
            or int(cache["pad_size"]) != self.cfg.model.pad_size
            or str(cache["digest"]) != self._digest
        ):
            raise ValueError(
                f"gallery cache {cache_path} does not match this map/model "
                "(cell count, pad size, or weight/map digest differ) — "
                "delete it to re-encode"
            )
        if "fine_emb" in cache:
            # Pre-factorization fine cache (raw encode_objects rows). Those
            # rows must not feed cct_tail (which expects post layer-0 self-
            # attention), so they are deliberately DISCARDED: any re-save of
            # this file drops them, and the fine cache re-encodes on the next
            # precompute_fine=True construction.
            warnings.warn(
                f"gallery cache {cache_path} holds a pre-factorization fine "
                "cache (key 'fine_emb'); it will be discarded and the fine "
                "encodings rebuilt under the factored layout ('fine_emb1')"
            )
        return cache

    def _save_cache(self, cache_path, gallery: np.ndarray):
        """Atomic write (unique tmp + rename) through a file handle — np.savez
        on a bare path appends '.npz', which would make a non-.npz cache_path
        save to one name and load from another (a silently useless cache).
        The tmp name is unique per writer so two processes sharing a
        cache_path can't interleave into one tmp file and publish a corrupt
        cache."""
        import os
        import tempfile

        payload = dict(
            num_cells=self.data.num_cells,
            pad_size=self.cfg.model.pad_size,
            digest=np.asarray(self._digest),
        )
        payload.update(_npz_pack("gallery", gallery))
        if self._fine_emb is not None:
            payload.update(_npz_pack("fine_emb1", self._fine_emb))
            payload["fine_mask"] = np.asarray(self._fine_mask)
        elif self._carry_fine is not None:
            payload.update(_npz_pack("fine_emb1", self._carry_fine[0]))
            payload["fine_mask"] = np.asarray(self._carry_fine[1])
        payload.update(_npz_pack("coarse_sent_table", self._coarse_sent_table))
        payload.update(_npz_pack("fine_sent_table", self._fine_sent_table))
        fd, tmp = tempfile.mkstemp(
            dir=os.path.dirname(os.path.abspath(cache_path)),
            prefix=os.path.basename(cache_path) + ".tmp.",
        )
        try:
            with os.fdopen(fd, "wb") as fh:
                np.savez(fh, **payload)
            os.replace(tmp, cache_path)
        except BaseException:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise

    def _encode_query_text(self, cparams, cstats, fparams, fstats, ctbl,
                           ftbl, batch):
        """(coarse query embedding [B, D], fine hint encodings [B, S, D]).

        Closed-vocabulary batches (hint triples) gather the precomputed
        sentence tables — no intra stack runs per query; embedded (OOV)
        batches take the full trunk."""
        from text2loc_tpu import constants as C

        if "token_embeds" in batch:
            text_enc = self._encode_text(cparams, cstats, batch)
            hints = self._fine_fwd.encode_text(fparams, fstats, batch)
            return text_enc, hints
        ids = C.hint_id(batch["hint_dir"], batch["hint_color"],
                        batch["hint_label"])
        sm = jnp.asarray(batch["sentence_mask"], bool)
        text_enc = self._coarse_model.apply(
            {"params": cparams, "batch_stats": cstats},
            jnp.take(ctbl, ids, axis=0), sm, train=False,
            method=self._coarse_model.encode_text_from_sentences,
        )
        return text_enc, jnp.take(ftbl, ids, axis=0)

    def _build_serve(self):
        fine_fwd = self._fine_fwd
        k = self.top_k
        encode_query_text = self._encode_query_text

        @jax.jit
        def serve(cparams, cstats, fparams, fstats, gallery, fine_emb,
                  fine_mask, bbox, size, ctbl, ftbl, batch):
            text_enc, hints = encode_query_text(
                cparams, cstats, fparams, fstats, ctbl, ftbl, batch
            )
            # Layer-0 hint self-attention once per QUERY (shared by its K
            # candidates); fine_emb rows are already post layer-0 object
            # self-attention (cached per cell) — only cct_tail is per-pair.
            hints1 = fine_fwd.hints_pre(
                fparams, fstats, hints, batch["sentence_mask"]
            )
            scores, idx = topk_retrieval(gallery, text_enc, k)
            b = text_enc.shape[0]
            rep = jnp.repeat(jnp.arange(b), k)
            flat = idx.reshape(-1)
            pred = fine_fwd.cct_tail(
                fparams, fstats, fine_emb[flat], fine_mask[flat],
                hints[rep], hints1[rep], batch["sentence_mask"][rep],
            ).reshape(b, k, 2)
            cand_w = bbox[idx][:, :, 0:2] + pred * size[idx][..., None]
            return cand_w, idx, scores

        return serve

    def _build_serve_sharded(self, mesh):
        """Fused serve over a mesh-sharded gallery (city-scale maps).

        Each shard holds C/n gallery vectors, fine-cache rows, and cell
        geometry. One program per query batch:

        * local retrieval: scores against the local shard only, local top-k;
        * local refinement: CCT over the local candidates using the LOCAL
          fine cache — no cross-shard row gathers ever happen;
        * merge: `all_gather` of the tiny per-shard (score, position, id)
          candidate sets over ICI (O(B * n * k), not O(B * C)) + a replicated
          top-k by coarse score.

        Tie-breaking matches the dense path: shards concatenate in ascending
        global-index order and `lax.top_k` keeps the first occurrence.
        The text towers are recomputed per shard (replicated compute) — they
        are a few percent of the refinement cost and keeping them inside the
        program saves a dispatch round trip.
        """
        from jax import shard_map
        from jax.sharding import NamedSharding, PartitionSpec as P

        from text2loc_tpu.parallel.retrieval import (
            merge_shard_topk,
            shard_local_topk,
        )

        ax = mesh.axis_names[0]
        n = mesh.devices.size
        c_pad = self._gallery.shape[0]
        num_cells = self._num_real_cells
        fine_fwd = self._fine_fwd
        k = self.top_k
        kl = min(k, c_pad // n)

        def _pad_rows(a):
            a = np.asarray(a)
            out = np.zeros((c_pad,) + a.shape[1:], a.dtype)
            out[: a.shape[0]] = a
            return out

        row_sharded = NamedSharding(mesh, P(ax))
        self._fine_emb_sh = jax.device_put(_pad_rows(self._fine_emb), row_sharded)
        self._fine_mask_sh = jax.device_put(
            _pad_rows(self._fine_mask), row_sharded
        )
        self._bbox_sh = jax.device_put(_pad_rows(self.data.cell_bbox), row_sharded)
        self._size_sh = jax.device_put(_pad_rows(self.data.cell_size), row_sharded)
        # Pre-replicate the (immutable) parameter trees across the mesh so a
        # query dispatch never re-broadcasts them from one device.
        rep = NamedSharding(mesh, P())
        self._params_rep = jax.device_put(
            (self.coarse_state.params, self.coarse_state.batch_stats,
             self.fine_state.params, self.fine_state.batch_stats), rep,
        )

        encode_query_text = self._encode_query_text

        def local_serve(cparams, cstats, fparams, fstats, gallery, fine_emb,
                        fine_mask, bbox, size, ctbl, ftbl, batch):
            # Sentence tables are replicated (they're tiny); the text head is
            # recomputed per shard like the rest of the text work.
            text_enc, hints = encode_query_text(
                cparams, cstats, fparams, fstats, ctbl, ftbl, batch
            )                                                    # [B, D]
            # Per-query layer-0 hint self block (replicated like the text
            # towers); fine_emb shards are post layer-0 object self block.
            hints1 = fine_fwd.hints_pre(
                fparams, fstats, hints, batch["sentence_mask"]
            )
            s_loc, i_loc, g_loc = shard_local_topk(
                gallery, text_enc, k, num_cells, ax
            )                                                    # [B, kl] x3

            b = s_loc.shape[0]
            rep = jnp.repeat(jnp.arange(b), kl)
            flat = i_loc.reshape(-1)                             # local rows
            pred = fine_fwd.cct_tail(
                fparams, fstats, fine_emb[flat], fine_mask[flat],
                hints[rep], hints1[rep], batch["sentence_mask"][rep],
            ).reshape(b, kl, 2)
            cand_w = bbox[i_loc][:, :, 0:2] + pred * size[i_loc][..., None]

            s_top, (g_top, w_top) = merge_shard_topk(
                s_loc, (g_loc, cand_w), k, n, ax
            )
            return w_top, g_top, s_top

        fn = shard_map(
            local_serve,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(ax), P(ax), P(ax), P(ax), P(ax),
                      P(), P(), P()),
            out_specs=(P(), P(), P()),
            # Replicated by construction (all_gather + merge); VMA inference
            # can't prove it through the axis_index offset math.
            check_vma=False,
        )
        jfn = jax.jit(fn)

        def serve(cparams, cstats, fparams, fstats, gallery, fine_emb,
                  fine_mask, bbox, size, ctbl, ftbl, batch):
            # Same signature as the dense serve; the mesh-resident operands
            # stored at build time replace the unsharded ones handed in by
            # localize().
            del cparams, cstats, fparams, fstats
            del fine_emb, fine_mask, bbox, size
            cp, cst, fp, fst = self._params_rep
            cand_w, idx, scores = jfn(
                cp, cst, fp, fst, gallery, self._fine_emb_sh,
                self._fine_mask_sh, self._bbox_sh, self._size_sh,
                ctbl, ftbl, batch,
            )
            return cand_w, idx, scores

        return serve

    @staticmethod
    def _bucket(b: int) -> int:
        """Next power-of-two batch bucket: every jitted program is shape-
        specialized, so unpadded ad-hoc batch sizes would each recompile
        (minutes over a remote-compile tunnel). Queries are padded up to the
        bucket and results sliced back."""
        n = 1
        while n < b:
            n *= 2
        return n

    def localize(self, hint_dir: np.ndarray, hint_color: np.ndarray,
                 hint_label: np.ndarray,
                 sentence_mask: Optional[np.ndarray] = None) -> LocalizationResult:
        """hint_*: [B, S] int32 hint triples -> positions.

        The fine stage refines all B*K candidates in one device batch (the
        reference loops poses one at a time, pipeline.py:105-126).
        `sentence_mask` ([B, S] bool) marks real hints when a query carries
        fewer than S; padded slots are kept out of attention and pooling.
        Batches are padded to power-of-two buckets so serving compiles once
        per bucket, not once per request size.
        """
        n_real = len(np.asarray(hint_dir))
        pad = self._padder(n_real)
        batch = {
            "hint_dir": pad(hint_dir),
            "hint_color": pad(hint_color),
            "hint_label": pad(hint_label),
        }
        if sentence_mask is not None:
            batch["sentence_mask"] = pad(np.asarray(sentence_mask, bool))
        return self._localize_batch(batch, n_real,
                                    has_mask=sentence_mask is not None)

    def localize_embedded(self, token_embeds: np.ndarray,
                          token_mask: np.ndarray,
                          sentence_mask: np.ndarray) -> LocalizationResult:
        """Localize from pre-embedded sentences (the online-encoder path).

        token_embeds: [B, S, T, E] frozen-LLM token embeddings per hint
        sentence (E must match the towers' text_embed_dim); token_mask:
        [B, S, T] real-token validity; sentence_mask: [B, S] real-sentence
        validity. Shares every downstream program with `localize` — the
        embedded batch passes straight through `steps.embed_text_batch`.
        """
        token_embeds = np.asarray(token_embeds, np.float32)
        assert token_embeds.ndim == 4, token_embeds.shape
        n_real = len(token_embeds)
        pad = self._padder(n_real)
        batch = {
            "token_embeds": pad(token_embeds),
            "token_mask": pad(np.asarray(token_mask, bool)),
            "sentence_mask": pad(np.asarray(sentence_mask, bool)),
        }
        return self._localize_batch(batch, n_real, has_mask=True)

    def _padder(self, n_real: int):
        bucket = self._bucket(n_real)

        def pad(a):
            a = np.asarray(a)
            return np.concatenate(
                [a, np.repeat(a[-1:], bucket - n_real, axis=0)], axis=0
            ) if len(a) < bucket else a

        return pad

    def _localize_batch(self, batch, n_real: int,
                        has_mask: bool) -> LocalizationResult:
        if self._serve is not None:
            # Single-dispatch path: top-k + fine refinement + world-coords in
            # one compiled program, one device->host transfer.
            sbatch = dict(batch)
            if "sentence_mask" not in sbatch:
                sbatch["sentence_mask"] = np.ones(sbatch["hint_dir"].shape,
                                                  bool)
            cand_w, idx, scores = jax.device_get(self._serve(
                self.coarse_state.params, self.coarse_state.batch_stats,
                self.fine_state.params, self.fine_state.batch_stats,
                self._gallery, self._fine_emb, self._fine_mask,
                self._bbox_d, self._size_d,
                self._coarse_sent_table, self._fine_sent_table, sbatch,
            ))
            return LocalizationResult(
                position_w=cand_w[:n_real, 0],
                candidates_w=cand_w[:n_real],
                cell_indices=idx[:n_real],
                scores=scores[:n_real],
            )

        text_enc = self._encode_text(
            self.coarse_state.params, self.coarse_state.batch_stats, batch
        )
        if self._topk is not None:
            scores, idx = self._topk(self._gallery, text_enc)
        else:
            scores, idx = topk_retrieval(self._gallery, text_enc, self.top_k)
        idx = np.asarray(idx)
        scores = np.asarray(scores)

        b, k = idx.shape
        rep = np.repeat(np.arange(b), k)  # hint rows replicate per candidate
        flat = idx.reshape(-1)
        # This stepwise path only runs WITHOUT a fine cache (a built cache
        # always routes through the single-dispatch serve above), so each
        # candidate cell's objects are re-encoded per query — the
        # reference's per-pose loop semantics (evaluation/pipeline.py:105-126).
        fine_batch = self.data.gather_cell_objects(
            flat, self.cfg.model.pad_size
        )
        if "token_embeds" in batch:
            fine_batch.update(
                token_embeds=batch["token_embeds"][rep],
                token_mask=batch["token_mask"][rep],
            )
        else:
            fine_batch.update(
                hint_dir=batch["hint_dir"][rep],
                hint_color=batch["hint_color"][rep],
                hint_label=batch["hint_label"][rep],
            )
        fine_batch.update(
            target=np.zeros((b * k, 2), np.float32),
            pose_in_cell=np.zeros((b * k, 2), np.float32),
        )
        if has_mask:
            fine_batch["sentence_mask"] = batch["sentence_mask"][rep]
        pred = np.asarray(
            self._fine_forward(
                self.fine_state.params, self.fine_state.batch_stats,
                fine_batch, self._rng,
            )
        ).reshape(b, k, 2)

        bbox = self.data.cell_bbox[idx]                  # [B, K, 6]
        size = self.data.cell_size[idx][..., None]
        cand_w = bbox[..., 0:2] + pred * size            # [B, K, 2]
        return LocalizationResult(
            position_w=cand_w[:n_real, 0],
            candidates_w=cand_w[:n_real],
            cell_indices=idx[:n_real],
            scores=scores[:n_real],
        )

    def localize_text(self, descriptions) -> LocalizationResult:
        """Localize from raw natural-language description strings.

        The string front door the reference exposes through NLTK + T5
        (language_encoder.py:106-128): each description is sentence-split and
        parsed against the closed hint-template vocabulary
        (text.parse_descriptions) — that fast path costs a table lookup.
        Sentences OUTSIDE the vocabulary fall back to the online frozen-LLM
        encoder (``online_encoder=``, models/t5_encoder.T5OnlineEncoder): the
        whole batch is sentence-split, encoded on TPU, and served through
        `localize_embedded`. Without an online encoder, out-of-vocabulary
        sentences raise `text.HintParseError` (documented rejection).
        Descriptions shorter than `num_mentioned` are padded and masked
        either way.
        """
        from text2loc_tpu.text import (
            HintParseError,
            parse_descriptions,
            split_description,
        )

        s_max = self.cfg.model.num_mentioned
        try:
            parsed = parse_descriptions(descriptions, num_mentioned=s_max)
        except HintParseError:
            if self.online_encoder is None:
                raise
        else:
            return self.localize(
                parsed["hint_dir"], parsed["hint_color"], parsed["hint_label"],
                sentence_mask=parsed["sentence_mask"],
            )

        # Online fallback: encode every sentence of the batch through the
        # frozen LLM (one device batch), scatter into the [B, S, T, E] layout.
        sent_lists = [split_description(d)[:s_max] for d in descriptions]
        if any(len(sl) == 0 for sl in sent_lists):
            raise HintParseError("empty description")
        flat = [s for sl in sent_lists for s in sl]
        emb, tmask = self.online_encoder.encode(flat)
        t, e = emb.shape[1:]
        b = len(sent_lists)
        token_embeds = np.zeros((b, s_max, t, e), np.float32)
        token_mask = np.zeros((b, s_max, t), bool)
        sentence_mask = np.zeros((b, s_max), bool)
        pos = 0
        for i, sl in enumerate(sent_lists):
            n = len(sl)
            token_embeds[i, :n] = emb[pos : pos + n]
            token_mask[i, :n] = tmask[pos : pos + n]
            sentence_mask[i, :n] = True
            pos += n
        return self.localize_embedded(token_embeds, token_mask, sentence_mask)
