"""RagEngine: the composition root.

Owns the TPU encoder + vector index + SQLite stores + LLM dispatcher and
implements the retrieval/compose flows the HTTP routes call.  This replaces
the reference's import-time module globals and circular router imports
(reference api/app.py:86-121 + SURVEY.md §1 "circular-import quirk") with an
explicit, injectable object — routes receive the engine, tests construct one
with fakes.
"""

from __future__ import annotations

import hashlib
import logging
import threading
import time
from collections import OrderedDict
from pathlib import Path

from tpu_rag.config import Config
from tpu_rag.compose.history import format_history_block, update_thread_summary
from tpu_rag.compose.language import norm_lang
from tpu_rag.compose.prompts import prepare_messages
from tpu_rag.compose.summarize import Summarizer
from tpu_rag.index import FlatIndex, IVFIndex, load_index, save_index
from tpu_rag.index.store import MANIFEST
from tpu_rag.ingest.indexer import DocIndexer
from tpu_rag.llm import LLMDispatcher
from tpu_rag.memory.db import ConversationDB
from tpu_rag.retrieval.hybrid import filter_meta_hits, mix_with_recency, vector_hits
from tpu_rag.retrieval.rerank import rerank_hits
from tpu_rag.utils.timing import StageTimings

logger = logging.getLogger(__name__)


class RagEngine:
    def __init__(self, config: Config | None = None, *,
                 encoder=None, cross_encoder=None, index=None,
                 dispatcher=None) -> None:
        self.config = config or Config()
        self.config.ensure_dirs()

        self._encoder = encoder
        self._fused_warned: set[str] = set()
        self._cross_encoder = cross_encoder
        self._ce_lock = threading.Lock()
        self._ce_failed = False
        self._rerank_gate: str | None = None  # lazy quality-gate verdict

        self.db = ConversationDB(self.config.db_path)
        self.dispatcher = dispatcher or LLMDispatcher(self.config)
        self.summarizer = Summarizer(
            self.generate,
            default_language=self.config.default_language,
            mode=self.config.summarize_mode,
        )

        self.index = index if index is not None else self._load_or_create_index()
        self._index_lock = threading.Lock()
        # query-embedding LRU (the reference re-embedded every repeat query)
        self._qvec_cache: "OrderedDict[str, object]" = OrderedDict()
        self._qvec_lock = threading.Lock()
        self._qvec_cache_size = 1024
        # cross-request micro-batching: concurrent query_vector calls fuse
        # into one encoder forward + one index scan (utils/microbatch.py)
        self._microbatcher = None
        if self.config.microbatch:
            from tpu_rag.utils.microbatch import MicroBatcher
            self._microbatcher = MicroBatcher(
                self._run_vector_batch, max_batch=self.config.microbatch_max,
                name="vector_microbatch",
                workers=self.config.microbatch_workers,
                hold_ms=self.config.microbatch_hold_ms)
        self.indexer = DocIndexer(
            self.config.kb_db_path,
            embed_fn=self.embed,
            index=self.index,
            persist_fn=self.persist_index,
        )

    # ------------------------------------------------------------ components

    def _mesh(self):
        """Device mesh from MESH_SHAPE config (None when unset/single-device)."""
        if not self.config.mesh_shape:
            return None
        if getattr(self, "_mesh_cache", None) is None:
            import jax

            from tpu_rag.parallel.mesh import mesh_from_spec
            if jax.device_count() < 2:
                self._mesh_cache = False  # nothing to shard over
            else:
                self._mesh_cache = mesh_from_spec(self.config.mesh_shape)
        return self._mesh_cache or None

    @property
    def encoder(self):
        if self._encoder is None:
            from tpu_rag.models import BiEncoder
            cfg = self.config
            mesh = self._mesh()
            self._encoder = BiEncoder(
                cfg.embedding_model,
                weights_path=cfg.embedding_weights,
                tokenizer_path=cfg.tokenizer_path,
                seq_len=cfg.embed_seq_len,
                batch=cfg.embed_batch,
                mesh=mesh if (mesh is not None and "data" in mesh.shape) else None,
            )
        return self._encoder

    def get_cross_encoder(self):
        """Lazy, lock-guarded, failure-tolerant (reference api/app.py:95-104
        minus the race: the reference's singleton had no lock)."""
        if self._ce_failed:
            return None
        if self._cross_encoder is None:
            with self._ce_lock:
                if self._cross_encoder is None and not self._ce_failed:
                    try:
                        from tpu_rag.models import CrossEncoder
                        cfg = self.config
                        self._cross_encoder = CrossEncoder(
                            cfg.rerank_model,
                            weights_path=cfg.rerank_weights,
                            tokenizer_path=cfg.tokenizer_path,
                        )
                    except Exception as e:
                        logger.warning("CrossEncoder init failed: %s", e)
                        self._ce_failed = True
        return self._cross_encoder

    def embed(self, texts: list[str]):
        return self.encoder.embed(texts)

    def generate(self, messages, *, stream: bool = False, engine: str | None = None, **kw):
        return self.dispatcher.generate(messages, stream=stream, engine=engine, **kw)

    # ------------------------------------------------------------ index io

    def _index_path(self) -> Path:
        return Path(self.config.persist_dir) / self.config.collection_name

    def _load_or_create_index(self):
        p = self._index_path()
        if (p / MANIFEST).is_file():
            import jax

            if jax.process_count() > 1:
                # multi-host slice: each process loads only its row shard
                # (read-only serving; re-shard by rebuilding the store)
                from tpu_rag.parallel.distributed import load_sharded_flat_distributed
                try:
                    return load_sharded_flat_distributed(
                        p, mesh=self._mesh(), dtype=self.config.index_dtype,
                        use_pallas=self.config.use_pallas,
                        block_n=self.config.block_n)
                except Exception as e:
                    logger.warning("distributed index load failed (%s); "
                                   "falling back to replicated load", e)
            try:
                loaded = load_index(p, use_pallas=self.config.use_pallas,
                                    block_n=self.config.block_n)
                mesh = self._mesh()
                if (isinstance(loaded, FlatIndex) and not isinstance(loaded, IVFIndex)
                        and mesh is not None and "data" in mesh.shape
                        and mesh.shape["data"] > 1):
                    from tpu_rag.parallel.sharded import ShardedFlatIndex
                    loaded = ShardedFlatIndex.from_state(
                        loaded.state(), mesh=mesh,
                        use_pallas=self.config.use_pallas, block_n=self.config.block_n)
                return loaded
            except Exception as e:
                logger.warning("index load failed (%s); creating empty", e)
        cfg = self.config
        kw = dict(dtype=cfg.index_dtype, use_pallas=cfg.use_pallas, block_n=cfg.block_n,
                  search_mode=cfg.index_search_mode)
        if cfg.index_kind == "ivf":
            return IVFIndex(self.encoder.dim, nlist=cfg.ivf_nlist, nprobe=cfg.ivf_nprobe, **kw)
        mesh = self._mesh()
        if mesh is not None and "data" in mesh.shape and mesh.shape["data"] > 1:
            from tpu_rag.parallel.sharded import ShardedFlatIndex
            # search_mode passes through: "auto" resolves per SHARD size
            return ShardedFlatIndex(self.encoder.dim, mesh=mesh, **kw)
        return FlatIndex(self.encoder.dim, **kw)

    def persist_index(self) -> None:
        with self._index_lock:
            save_index(self.index, self._index_path())

    # ------------------------------------------------------------ retrieval

    def _qvec_cached(self, key: str):
        with self._qvec_lock:
            qv = self._qvec_cache.get(key)
            if qv is not None:
                self._qvec_cache.move_to_end(key)
            return qv

    def _qvec_store(self, key: str, qv) -> None:
        with self._qvec_lock:
            self._qvec_cache[key] = qv
            while len(self._qvec_cache) > self._qvec_cache_size:
                self._qvec_cache.popitem(last=False)

    def _fused_vector_hits_batch(self, texts: list[str], k: int,
                                 namespace: str | None,
                                 canonicality: str | None,
                                 cache_qv: bool = True,
                                 k_cap: int = 20,
                                 ) -> list[list[dict]] | None:
        """One-dispatch embed+search (FlatIndex.search_fused): the encoder
        forward and the top-k scan compile into a single executable, halving
        per-request device round-trips.  Returns None to fall back to the
        two-step path (non-flat index, empty index, unseen filter tag, or
        any error).

        cache_qv=False (the microbatch window path) skips the query-embedding
        readback entirely — with the device-side residual refine the wire
        cost per query drops to ~k scores+ids, which is what sets the
        serving-throughput ceiling on bandwidth-limited links.  The price:
        repeats of those queries won't hit the embedding cache."""
        from tpu_rag.index.flat import FlatIndex

        if (type(self.index) is not FlatIndex
                or not hasattr(self.encoder, "fused_forward")):
            return None
        try:
            from tpu_rag.utils.metrics import GLOBAL_METRICS

            enc = self.encoder
            if len(texts) > enc.batch:
                return None  # window exceeds one encoder bucket
            # stage breakdown for the serving bench: host tokenize vs the
            # single fused device call (encode+scan+packed readback — one
            # dispatch, so encode/scan can't be split without a second sync)
            with GLOBAL_METRICS.timed("search_stage_tokenize"):
                if hasattr(enc, "fused_forward_ids"):
                    # mask derived on device; int16 ids; seq-bucketed
                    fwd, fkey = enc.fused_forward_ids()
                    ids = enc.tokenize_query_ids(
                        texts, batch=enc._bucket(len(texts)))
                    mask = None
                else:
                    fwd, fkey = enc.fused_forward()
                    ids, mask = enc.tokenize_batch(
                        texts, batch=enc._bucket(len(texts)))
            from tpu_rag.retrieval.hybrid import clamp_k

            kk = clamp_k(k, k_cap)
            with GLOBAL_METRICS.timed("search_stage_device"):
                out = self.index.search_fused(
                    fwd, fkey, enc.params, ids, mask, len(texts), kk,
                    namespace=namespace or None,
                    canonicality=canonicality or None,
                    return_qv=cache_qv)
            if out is None:
                return None
            res, qv = out
            if qv is not None:
                for qi, text in enumerate(texts):
                    self._qvec_store(
                        hashlib.md5(text.encode("utf-8")).hexdigest(),
                        qv[qi:qi + 1])
            from tpu_rag.retrieval.hybrid import result_hits

            return [result_hits(res, qi) for qi in range(len(texts))]
        except Exception as e:
            # log the first failure loudly, then once per distinct message —
            # a persistent failure here would otherwise warn on EVERY request
            msg = str(e)
            if msg not in self._fused_warned:
                self._fused_warned.add(msg)
                logger.warning("fused embed+search failed (%s); falling back", e)
            return None

    def _fused_vector_hits(self, query: str, k: int, namespace: str | None,
                           canonicality: str | None,
                           k_cap: int = 20) -> list[dict] | None:
        out = self._fused_vector_hits_batch([query], k, namespace, canonicality,
                                            k_cap=k_cap)
        return out[0] if out else None

    def query_vector(self, query: str, k: int, namespace: str | None,
                     canonicality: str | None, timings: StageTimings | None = None,
                     k_cap: int = 20) -> list[dict]:
        """Embed + index search shaped like the reference's _query_chroma
        (reference api/app.py:539-566); failures degrade to empty hits.
        With microbatching on, concurrent calls fuse into one device pass.
        k_cap > 20 lets the RERANK_CANDIDATES extension retrieve deeper than
        the parity clamp (see hybrid.clamp_k)."""
        t = timings or StageTimings()
        try:
            if self._microbatcher is not None:
                with t.stage("vector_search"):
                    return self._microbatcher.submit(
                        (query, k, namespace, canonicality, k_cap))
            key = hashlib.md5(query.encode("utf-8")).hexdigest()
            qv = self._qvec_cached(key)
            if qv is None:
                # cold query: one fused embed+search dispatch when possible.
                # Embed happens inside the fused executable, so emit a
                # zero-duration "embed" stage to keep the embed/search split
                # contract for timings consumers (the cost is in
                # vector_search by construction — it is one dispatch).
                with t.stage("vector_search"):
                    hits = self._fused_vector_hits(query, k, namespace,
                                                   canonicality, k_cap=k_cap)
                    if hits is not None:
                        t.stages.setdefault("embed", 0.0)
                        return hits
                with t.stage("embed"):
                    qv = self.embed([query])
                    self._qvec_store(key, qv)
            with t.stage("vector_search"):
                return vector_hits(self.index, qv, k, namespace, canonicality,
                                   cap=k_cap)
        except Exception as e:
            logger.warning("vector query failed: %s", e)
            return []

    def _run_vector_batch(self, items: list[tuple]) -> list[list[dict]]:
        """MicroBatcher callback: one encoder forward for all cache-miss
        queries, then one index scan per distinct (k, namespace,
        canonicality) group (usually a single group).  The common
        single-query window takes the one-dispatch fused embed+search path."""
        import numpy as np

        from tpu_rag.retrieval.hybrid import vector_hits_batch

        # items are (query, k, ns, canon[, k_cap]); tolerate 4-tuples from
        # direct callers that predate the RERANK_CANDIDATES cap
        items = [it if len(it) == 5 else (*it, 20) for it in items]

        # whole-window fused path: one shared (k, ns, canon, cap), all
        # distinct cache misses -> ONE device dispatch for the entire window
        if len({tuple(rest) for _, *rest in items}) == 1:
            keys0 = [hashlib.md5(q.encode("utf-8")).hexdigest() for q, *_ in items]
            if (len(set(keys0)) == len(keys0)
                    and all(self._qvec_cached(kk) is None for kk in keys0)):
                _, k1, ns1, canon1, cap1 = items[0]
                hits = self._fused_vector_hits_batch(
                    [q for q, *_ in items], k1, ns1, canon1, cache_qv=False,
                    k_cap=cap1)
                if hits is not None:
                    return hits

        keys = [hashlib.md5(q.encode("utf-8")).hexdigest() for q, *_ in items]
        vecs: dict[str, object] = {}
        for key in set(keys):
            qv = self._qvec_cached(key)
            if qv is not None:
                vecs[key] = qv
        missing_keys, missing_texts = [], []
        for (q, *_), key in zip(items, keys):
            if key not in vecs and key not in missing_keys:
                missing_keys.append(key)
                missing_texts.append(q)
        if missing_texts:
            emb = np.asarray(self.embed(missing_texts))
            for key, v in zip(missing_keys, emb):
                vecs[key] = v[None, :]
                self._qvec_store(key, v[None, :])

        groups: dict[tuple, list[int]] = {}
        for i, (_, k, ns, canon, cap) in enumerate(items):
            groups.setdefault((k, ns, canon, cap), []).append(i)
        results: list[list[dict]] = [[] for _ in items]
        for (k, ns, canon, cap), idxs in groups.items():
            qmat = np.concatenate([np.atleast_2d(vecs[keys[i]]) for i in idxs], axis=0)
            for i, hits in zip(idxs, vector_hits_batch(self.index, qmat, k, ns,
                                                       canon, cap=cap)):
                results[i] = hits
        return results

    def query_vector_batch(self, queries: list[str], k: int, namespace: str | None,
                           canonicality: str | None,
                           k_cap: int = 20) -> list[list[dict]]:
        """Batched embed + one kernel pass for all queries (extension: the
        reference had no batched retrieval). Returns per-query hit lists
        shaped like query_vector's.  Takes the fused single-dispatch path in
        encoder-batch chunks when available (cuts the wire cost per query to
        ~k scores+ids); falls back to embed-then-search otherwise."""
        try:
            enc = self.encoder
            fused_ok = hasattr(enc, "batch")
            out: list[list[dict]] = []
            if fused_ok:
                for i in range(0, len(queries), enc.batch):
                    chunk = queries[i:i + enc.batch]
                    hits = self._fused_vector_hits_batch(
                        chunk, k, namespace, canonicality, cache_qv=False,
                        k_cap=k_cap)
                    if hits is None:
                        fused_ok = False
                        break
                    out.extend(hits)
            if fused_ok:
                return out
            qv = self.embed(queries)
            from tpu_rag.retrieval.hybrid import vector_hits_batch

            return vector_hits_batch(self.index, qv, k, namespace, canonicality,
                                     cap=k_cap)
        except Exception as e:
            logger.warning("batched vector query failed: %s", e)
            return [[] for _ in queries]

    def search_internal(self, query: str, k: int, namespace: str | None,
                        canonicality: str | None, rerank: bool) -> list[dict]:
        """Hybrid merge, parity with reference api/app.py:585-598: vector
        top-k + FTS top-(k//2), meta-filter both (skipped when canonicality
        == 'meta'), vector hits first, truncate to k.  Note the reference
        ignores the `rerank` arg here — preserved."""
        doc_hits = self.query_vector(query, k, namespace, canonicality)
        try:
            db_hits = self.db.search_kb_fts(query, limit=max(1, (k or 6) // 2))
        except Exception as e:
            logger.warning("kb fts failed: %s", e)
            db_hits = []
        do_filter = self.config.filter_meta_default and not (
            (canonicality or "").strip().lower() == "meta"
        )
        doc_hits = filter_meta_hits(doc_hits or [], do_filter, self.config.meta_tags)
        db_hits = filter_meta_hits(db_hits or [], do_filter, self.config.meta_tags)
        return (doc_hits + db_hits)[: max(k, 1)]

    def rerank(self, query: str, hits: list[dict]) -> list[dict]:
        return rerank_hits(self.get_cross_encoder(), query, hits,
                           mode=self._gated_rerank_mode(),
                           alpha=self.config.rerank_ensemble_alpha)

    def _gated_rerank_mode(self) -> str:
        """Quality gate (VERDICT r4 weak #2): a reranker that LOWERS recall
        must not reorder results.  The trainer writes its held-out eval next
        to the checkpoint (scripts/train_reranker.py rerank.json); if that
        manifest shows ensemble recall@10 < biencoder recall@10, ensemble
        mode demotes to "annotate" (CE scores attached, retriever order
        kept) with a one-time warning.  No manifest -> trust the operator."""
        mode = self.config.rerank_mode
        if mode != "ensemble" or not self.config.rerank_weights:
            return mode
        gate = self._rerank_gate
        if gate is None:
            gate = "pass"
            try:
                import json as _json
                import os as _os

                mdir = _os.path.dirname(
                    _os.path.abspath(self.config.rerank_weights))
                mpath = _os.path.join(mdir, "rerank.json")
                if _os.path.exists(mpath):
                    with open(mpath) as f:
                        rep = _json.load(f)
                    by = {r.get("label"): r for r in rep.get("results", [])}
                    bi = (by.get("biencoder_top20_no_rerank")
                          or {}).get("recall@10")
                    ens = (by.get("ensemble_bi+trained_ce")
                           or {}).get("recall@10")
                    if bi is not None and ens is not None and ens < bi:
                        gate = "demote"
                        logger.warning(
                            "rerank quality gate: checkpoint manifest %s "
                            "shows ensemble recall@10 %.4f < biencoder "
                            "%.4f — demoting RERANK_MODE=ensemble to "
                            "annotate (scores attached, retriever order "
                            "kept)", mpath, ens, bi)
            except Exception as e:
                logger.warning("rerank quality gate check failed: %s", e)
            self._rerank_gate = gate
        return "annotate" if gate == "demote" else mode

    def recency_mix(self, hits: list[dict]) -> list[dict]:
        return mix_with_recency(hits, alpha=self.config.recency_alpha,
                                half_life_days=self.config.half_life_days)

    # ------------------------------------------------------------ compose

    def build_compose_context(self, hits: list[dict], thread_id: str,
                              lang: str | None) -> tuple[str, int]:
        """history block + summarized RAG context (reference
        api/routes/chat.py:135-141 combined_ctx assembly)."""
        history_block = format_history_block(self.db, self.summarizer, thread_id, lang)
        rag_context, used_hits = self.summarizer.build_context(
            hits, language=lang, max_chars=self.config.max_context_chars,
            max_chars_per_chunk=600,
        )
        combined = (
            f"<<<HISTORY_START>>>\n{history_block}\n<<<HISTORY_END>>>\n\n"
            if history_block else ""
        ) + rag_context
        return combined, used_hits

    def prepare_messages(self, query: str, context: str, mode: str,
                         language: str | None, target_length: str | None = None,
                         style: dict | None = None):
        return prepare_messages(query, context, mode, language,
                                target_length=target_length, style=style,
                                default_language=self.config.default_language)

    def norm_lang(self, lang: str | None) -> str:
        return norm_lang(lang, self.config.default_language)

    def update_summary(self, thread_id: str, query: str, draft: str, lang: str | None) -> None:
        update_thread_summary(self.db, self.summarizer, thread_id, query, draft, lang)

    def new_thread_id(self) -> str:
        return f"auto-{int(time.time() * 1000)}"

    def warmup(self, *, rerank: bool = False) -> float:
        """Compile the request-path jits before serving (first compiles can
        take 10s-60s; a verify finding: /health showed docs_count lag and
        first /search paid the full compile).  Returns seconds spent."""
        t0 = time.time()
        try:
            self.query_vector("warmup query", 5, None, None)
        except Exception as e:
            logger.warning("warmup query failed: %s", e)
        if rerank:
            try:
                self.rerank("warmup", [{"id": "w", "text": "warmup text"}])
            except Exception as e:
                logger.warning("warmup rerank failed: %s", e)
        dt = time.time() - t0
        logger.info("warmup done in %.1fs", dt)
        return dt

    def shutdown(self) -> None:
        """Stop the microbatcher worker threads so dropping the engine
        actually frees its device arrays (the workers hold a bound-method
        reference to the engine; without this, an embedding process — bench,
        tests — leaks the index HBM for the process lifetime)."""
        if self._microbatcher is not None:
            try:
                self._microbatcher.stop()
            except Exception as e:
                logger.warning("microbatcher stop failed: %s", e)
            self._microbatcher = None
