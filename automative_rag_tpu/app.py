"""Application assembly: the full RAG system wired together.

This is the working equivalent of the reference's broken DI layer
(``src/api/dependencies.py`` referenced controllers that don't exist —
SURVEY.md §0): one object owns the encoders, index, reranker, generator, and
the orchestration engine, registers every task executor, and exposes the
submit/ingest/query surface the API routes call.

Task executors mirror the reference's per-queue actors (SURVEY.md §2.4):
``download_video`` → ``transcribe_video`` → ``generate_embeddings`` on the
ingest side; ``retrieve_documents`` → ``llm_inference`` on the query side —
but retrieval actually includes the rerank stage (the reference never wired
it, §0) and all TPU work happens in-process on the engine.
"""

from __future__ import annotations

import threading
import time
from pathlib import Path
from typing import Any, Dict, List, Optional

from .config.mode_config import QueryMode
from .config.settings import Settings, settings as default_settings
from .documents.schema import Document
from .engine.retrieval import RetrievalEngine
from .generation.llm import AnswerGenerator, load_llm
from .index.flat import FlatIndex
from .ingestion.factory import ProcessorFactory
from .models.bge_m3 import DenseEmbedder
from .models.colbert import ColBERTEncoder
from .models.encoder import EncoderConfig
from .orchestration.job_chain import JobChain
from .orchestration.job_tracker import JobStatus, JobTracker
from .orchestration.queue_manager import QueueManager
from .orchestration.task_models import TaskModel
from .orchestration.task_router import JobType, TaskRouter
from .rerank.reranker import LateInteractionReranker
from .rerank.token_store import TokenStore
from .utils.unicode import clean_unicode_escapes
from .services.analytics import AnalyticsService
from .validation.engine import ValidationEngine


def serving_geometry(llm_serving_max_len: int = 0):
    """(max_len, prompt_buckets) for the LLM serving engine, auto-sized
    from the mode table so EVERY mode's full prompt (context budget +
    template header + question) fits a bucket — prompts beyond the
    largest bucket bypass continuous batching entirely (whole-loop
    fallback in ``generation/llm.py``), and the longest modes run 4000
    context tokens."""
    from .config.mode_config import mode_config as _mc

    max_prompt = max(
        _mc.get_context_params(m)["max_context_tokens"]
        for m in _mc.all_modes()
    ) + 512  # template header + question + estimator slack
    max_gen = max(_mc.get_llm_params(m)["max_tokens"]
                  for m in _mc.all_modes())
    max_len = llm_serving_max_len or (max_prompt + max_gen + 64)
    buckets = tuple(
        b for b in (64, 128, 256, 512, 1024, 2048, 4096) if b < max_prompt
    ) + (max_prompt,)
    return max_len, buckets


class RAGApplication:
    def __init__(
        self,
        settings: Optional[Settings] = None,
        tiny: bool = False,
        tiny_dim: int = 64,
        video_downloader=None,
        video_transcriber=None,
        start_workers: bool = True,
    ):
        self.settings = settings or default_settings
        self.started_at = time.time()

        if self.settings.jax_compile_cache_dir:
            # before any jit: executables compiled this process persist
            # for the next one (restart/resume path)
            import jax as _jax

            try:
                Path(self.settings.jax_compile_cache_dir).mkdir(
                    parents=True, exist_ok=True)
                _jax.config.update("jax_compilation_cache_dir",
                                   self.settings.jax_compile_cache_dir)
            except (RuntimeError, OSError):
                pass  # cache is an optimization, never a boot failure

        if tiny:
            encoder_config = EncoderConfig.tiny(hidden_size=tiny_dim)
            self.settings.embedding_dim = encoder_config.hidden_size
        else:
            encoder_config = EncoderConfig.bge_m3()

        # --- models & engine ---
        self.embedder = DenseEmbedder(
            config=encoder_config,
            weights_path=self.settings.embedding_model_path,
            tokenizer_path=self.settings.embedding_model_path,
            max_length=self.settings.embedding_max_length,
            batch_size=self.settings.embedding_batch_size,
        )
        self.colbert = ColBERTEncoder(
            config=encoder_config,
            weights_path=self.settings.colbert_model_path,
            tokenizer_path=self.settings.colbert_model_path,
            max_query_length=self.settings.colbert_max_query_length,
            max_doc_length=self.settings.colbert_max_doc_length,
            batch_size=self.settings.colbert_batch_size,
        )
        second_scorer = None
        if self.settings.use_bge_reranker and self.settings.reranker_model_path:
            from .models.cross_encoder import CrossEncoderScorer

            second_scorer = CrossEncoderScorer(
                weights_path=self.settings.reranker_model_path,
                tokenizer_path=self.settings.reranker_model_path,
            )
        self.reranker = LateInteractionReranker(
            self.colbert,
            colbert_weight=self.settings.colbert_weight,
            second_weight=self.settings.bge_weight,
            second_scorer=second_scorer,
        )
        self.index = self._make_index()
        if self.settings.encoder_data_parallel:
            mesh = getattr(self.index, "mesh", None)
            if mesh is not None:
                axis = self.settings.mesh_shard_axis_name
                self.embedder.data_parallel(mesh, axis)
                self.colbert.data_parallel(mesh, axis)
        self.token_store = (
            self._make_token_store() if self.settings.store_token_embeddings else None
        )
        self.sparse_encoder = None
        self.sparse_index = None
        if self.settings.sparse_enabled:
            from .index.sparse import SparseIndex
            from .models.sparse import SparseEncoder

            self.sparse_encoder = SparseEncoder(
                self.embedder,
                top_terms=self.settings.sparse_top_terms,
                query_terms=self.settings.sparse_query_terms,
            )
            self.sparse_index = self._make_sparse_index()
        self.engine = RetrievalEngine(
            self.embedder, self.index, self.reranker,
            token_store=self.token_store,
            sparse_index=self.sparse_index,
            sparse_encoder=self.sparse_encoder,
            sparse_k=self.settings.sparse_k,
            sparse_weight=self.settings.sparse_weight,
            sparse_rerank_weight=self.settings.sparse_rerank_weight,
            cache_size=self.settings.retrieval_cache_size,
        )
        from .generation.llm import JaxCausalLM

        llm = load_llm(self.settings.llm_model_path,
                       weight_bits=self.settings.llm_weight_bits,
                       kv_bits=self.settings.llm_kv_bits)
        if self.settings.llm_tensor_parallel > 1 and isinstance(llm, JaxCausalLM):
            import jax as _jax
            import numpy as _np

            from .parallel import shard_qwen2_model

            tp = self.settings.llm_tensor_parallel
            devices = _jax.devices()
            if len(devices) >= tp:
                shard_qwen2_model(
                    llm.model,
                    _jax.sharding.Mesh(_np.array(devices[:tp]), ("tp",)),
                )
        if self.settings.llm_concurrency > 1 and isinstance(llm, JaxCausalLM):
            # N llm-queue workers feed one continuous-batching engine:
            # concurrent queries share decode bursts (serving/engine.py)
            serving_len, buckets = serving_geometry(
                self.settings.llm_serving_max_len)
            llm.enable_serving(
                max_slots=max(self.settings.llm_concurrency, 2),
                max_len=serving_len,
                prompt_buckets=buckets,
                burst=self.settings.llm_serving_burst,
                spec=self.settings.llm_serving_spec,
                prefill_chunk=self.settings.llm_prefill_chunk,
                admit_pacing=self.settings.llm_admit_pacing,
                admit_pacing_group=self.settings.llm_admit_pacing_group,
            )
        self.generator = AnswerGenerator(llm)
        self.validation_engine = ValidationEngine()
        self.analytics = AnalyticsService()

        # --- ingestion ---
        self.video_downloader = video_downloader
        if video_transcriber is None and self.settings.whisper_model_path:
            from .ingestion.asr import WhisperTranscriber

            video_transcriber = WhisperTranscriber(
                model_path=self.settings.whisper_model_path,
                timestamps=self.settings.whisper_timestamps,
                beam_size=self.settings.whisper_beam_size,
            )
        self.video_transcriber = video_transcriber
        if video_downloader is None and self.settings.media_cache_dir:
            import shutil as _shutil

            if _shutil.which("yt-dlp"):
                from .ingestion.video_processor import make_ytdlp_downloader

                self.video_downloader = make_ytdlp_downloader(
                    self.settings.media_cache_dir
                )

        # --- orchestration ---
        self.tracker = JobTracker(
            persist_path=self.settings.tracker_persist_path or None)
        self.queue_manager = QueueManager(
            time_limit_s=self.settings.task_time_limit_s, start=start_workers,
            concurrency={"llm_tasks": self.settings.llm_concurrency},
        )
        self.task_router = TaskRouter(self.queue_manager)
        self.task_model = TaskModel()
        self.job_chain = JobChain(
            self.tracker,
            self.task_router,
            persist_path=self.settings.chain_persist_path or None,
            task_model=self.task_model,
        )
        self._register_tasks()
        self._lock = threading.RLock()

        # --- restart resume (compose restart path) ---
        if self.settings.index_autoload:
            import os as _os

            manifest = _os.path.join(self.settings.index_dir, "manifest.json")
            if _os.path.exists(manifest):
                try:
                    rows = self.load_index()
                    print(f"index autoload: {rows} rows from "
                          f"{self.settings.index_dir}", flush=True)
                except Exception as exc:  # noqa: BLE001 - boot must survive
                    print(f"index autoload failed: {exc}", flush=True)

    def _make_index(self):
        if self.settings.index_kind == "ivf":
            from .index.ivf import IVFIndex

            return IVFIndex(
                dim=self.embedder.dim,
                device_dtype=self.settings.index_dtype,
                n_lists=self.settings.ivf_n_lists,
                n_probe=self.settings.ivf_n_probe,
                refine_dims=self.settings.ivf_refine_dims,
                refine_shortlist=self.settings.ivf_refine_shortlist,
                probe_mode=self.settings.ivf_probe_mode,
            )
        if self.settings.index_kind == "sharded-ivf":
            from .parallel import ShardedIVFIndex, make_mesh

            return ShardedIVFIndex(
                dim=self.embedder.dim,
                mesh=make_mesh(axis_name=self.settings.mesh_shard_axis_name),
                axis_name=self.settings.mesh_shard_axis_name,
                device_dtype=self.settings.index_dtype,
                n_lists=self.settings.ivf_n_lists,
                n_probe=self.settings.ivf_n_probe,
                probe_mode=self.settings.ivf_probe_mode,
            )
        if self.settings.index_kind == "sharded" or (
            self.settings.index_kind == "auto" and self._n_devices() > 1
        ):
            from .parallel import ShardedFlatIndex, make_mesh

            return ShardedFlatIndex(
                dim=self.embedder.dim,
                mesh=make_mesh(axis_name=self.settings.mesh_shard_axis_name),
                axis_name=self.settings.mesh_shard_axis_name,
                device_dtype=self.settings.index_dtype,
            )
        return FlatIndex(dim=self.embedder.dim,
                         device_dtype=self.settings.index_dtype,
                         topk_approx=self.settings.index_topk_approx)

    def _make_token_store(self):
        common = dict(
            dim=self.colbert.dim,
            max_doc_length=self.colbert.max_doc_length,
            device_dtype=(
                "bfloat16" if self.settings.index_dtype in ("int8", "int4")
                else self.settings.index_dtype
            ),
            device_budget_bytes=self.settings.token_store_device_budget_mb * 1024**2,
            quantize=self.settings.token_store_quantize,
        )
        if self.settings.token_store_sharded:
            from .parallel import ShardedTokenStore, make_mesh

            # reuse the sharded index's mesh when there is one so the token
            # slabs and vectors ride the same device layout
            mesh = getattr(self.index, "mesh", None)
            if mesh is None:
                mesh = make_mesh(axis_name=self.settings.mesh_shard_axis_name)
            return ShardedTokenStore(
                mesh=mesh,
                axis_name=self.settings.mesh_shard_axis_name,
                **common,
            )
        return TokenStore(**common)

    def _make_sparse_index(self):
        # the lexical arm rides the main index's mesh when there is one, so
        # all three bge-m3 heads (dense / multi-vector / sparse) share the
        # same row-sharded device layout
        mesh = getattr(self.index, "mesh", None)
        if mesh is not None:
            from .parallel import ShardedSparseIndex

            return ShardedSparseIndex(
                top_terms=self.settings.sparse_top_terms,
                mesh=mesh,
                axis_name=self.settings.mesh_shard_axis_name,
            )
        from .index.sparse import SparseIndex

        return SparseIndex(top_terms=self.settings.sparse_top_terms)

    @staticmethod
    def _n_devices() -> int:
        import jax

        try:
            return len(jax.devices())
        except RuntimeError:
            return 1

    def rebuild_index(self) -> Dict[str, Any]:
        """(Re)build the ANN structure (IVF lists); no-op for flat. After
        the build, the index self-calibrates its probe width against an
        exact-scan sample (distribution-adaptive recall —
        ``IVF_CALIBRATE_RECALL``)."""
        if hasattr(self.index, "rebuild"):
            info = self.index.rebuild()
            target = float(self.settings.ivf_calibrate_recall or 0)
            if target > 0 and hasattr(self.index, "calibrate"):
                # prefer REAL query traffic as calibration probes:
                # corpus-sampled rows overestimate recall when queries sit
                # off the doc manifold (RECALL_CURVES_r04 encoder analysis)
                info["calibration"] = self.index.calibrate(
                    target_recall=target,
                    queries=self.engine.recent_queries())
            return info
        return {"kind": "flat", "note": "flat index needs no build"}

    def compact_index(self) -> Dict[str, Any]:
        """Reclaim tombstoned rows from the index AND the row-aligned token
        store in one atomic operation (the app lock blocks concurrent
        ingest appends, whose row alignment this rewrites)."""
        with self._lock:
            if (self.token_store is not None
                    and self.token_store.rows != self.index.total_rows):
                # should be impossible (appends are paired under this lock)
                # — refuse rather than mis-align every future rerank
                return {
                    "error": "token store rows != index rows; not compacting",
                    "token_rows": self.token_store.rows,
                    "index_rows": self.index.total_rows,
                }
            if (self.sparse_index is not None
                    and self.sparse_index.rows != self.index.total_rows):
                return {
                    "error": "sparse index rows != index rows; not compacting",
                    "sparse_rows": self.sparse_index.rows,
                    "index_rows": self.index.total_rows,
                }
            info = self.index.compact()
            live = info.pop("live_order", None)
            if live is not None:
                if self.token_store is not None:
                    self.token_store.select_rows(live)
                if self.sparse_index is not None:
                    self.sparse_index.select_rows(live)
            if info.pop("rebuild_required", False) and self.index.count:
                # sharded-ivf lists can't survive the row shift — rebuild
                info["rebuild"] = self.index.rebuild()
        return info

    def swap_encoder(self, path: str) -> Dict[str, Any]:
        """Hot-swap the dense encoder (a ``scripts/train_encoder.py`` export
        or an HF checkpoint dir) and RE-EMBED the corpus in place — the
        train→serve loop with no restart and no re-ingest. Dense vectors
        and the sparse term lists regenerate under the new encoder (their
        geometry/semantics changed); the ColBERT token store is untouched
        (its encoder did not change). The reference's POST /reload-model
        swaps weights but leaves the Qdrant collection embedded by the OLD
        model (``background/models.py:444-476``) — every later query
        compares apples to oranges; here the swap is consistent by
        construction."""
        import numpy as np

        from .models.bge_m3 import DenseEmbedder

        p = Path(path)
        if (p / "params.msgpack").exists():
            embedder = DenseEmbedder.from_export(str(p))
        elif p.is_dir() and list(p.glob("*.safetensors")):
            embedder = DenseEmbedder(
                weights_path=str(p), tokenizer_path=str(p),
                max_length=self.settings.embedding_max_length,
                batch_size=self.settings.embedding_batch_size)
        else:
            raise ValueError(f"no loadable encoder under {path!r}")

        with self._lock:
            self.compact_index()  # drop tombstones; sidecars realign
            docs = list(self.index._docs)
            texts = [d.page_content for d in docs]
            # build EVERYTHING first, then swap the engine references in
            # one burst: queries don't take the app lock, so a long-lived
            # new-embedder/old-index mismatch window (the re-embed takes
            # seconds at corpus scale) would feed wrong-dim queries into
            # the live index. self.embedder may flip early — the query
            # path reads engine.embedder, not app.embedder.
            self.embedder = embedder
            new_sparse_enc = None
            if self.sparse_encoder is not None:
                from .models.sparse import SparseEncoder

                new_sparse_enc = SparseEncoder(
                    embedder,
                    top_terms=self.settings.sparse_top_terms,
                    query_terms=self.settings.sparse_query_terms)
            # fresh index at the new dim; add() preserves doc order == rows,
            # so the (untouched) token store stays row-aligned
            fresh = self._make_index()
            if texts:
                fresh.add(np.asarray(embedder.embed_texts(texts)), docs)
            new_sparse_idx = None
            if self.sparse_index is not None:
                old_index, self.index = self.index, fresh
                try:
                    new_sparse_idx = self._make_sparse_index()  # reads mesh
                finally:
                    self.index = old_index
                if texts:
                    t_ids, t_w = new_sparse_enc.encode_documents(texts)
                    new_sparse_idx.append(t_ids, t_w)
            if hasattr(fresh, "rebuild") and fresh.count:
                fresh.rebuild()
            # the swap burst (attribute stores only; a query straddling it
            # fails one dim check and the chain retry policy re-runs it)
            self.index = fresh
            self.engine.index = fresh
            self.engine.embedder = embedder
            if new_sparse_enc is not None:
                self.sparse_encoder = new_sparse_enc
                self.engine.sparse_encoder = new_sparse_enc
                self.sparse_index = new_sparse_idx
                self.engine.sparse_index = new_sparse_idx
        # pre-compile the new-dimension executables now (admin call pays
        # the jit latency, not the first user query after the swap)
        try:
            self.warmup()
        except Exception:  # noqa: BLE001 — warmup is best-effort
            pass
        return {
            "swapped": True,
            "path": str(p),
            "dim": embedder.dim,
            "pretrained": embedder.pretrained,
            "reindexed_docs": len(texts),
            "sparse_mode": (None if self.sparse_encoder is None
                            else self.sparse_encoder.mode),
        }

    # ------------------------------------------------------------- tasks
    def _register_tasks(self) -> None:
        router = self.task_router

        @router.task("process_text")
        def process_text(job_id, payload):
            processor = ProcessorFactory.create_processor("text")
            docs = processor.process(
                {"content": payload["content"], **payload.get("metadata", {})}
            )
            self.tracker.update_job_progress(job_id, 40, f"chunked {len(docs)} docs")
            return {"documents": [d.to_dict() for d in docs]}

        @router.task("process_pdf")
        def process_pdf(job_id, payload):
            processor = ProcessorFactory.create_processor("pdf")
            docs = processor.process({"path": payload["path"], **payload.get("metadata", {})})
            self.tracker.update_job_progress(job_id, 40, f"parsed {len(docs)} chunks")
            return {"documents": [d.to_dict() for d in docs]}

        @router.task("download_video")
        def download_video(job_id, payload):
            if self.video_downloader is None:
                raise RuntimeError("no video downloader configured on this deployment")
            audio_path, video_metadata = self.video_downloader(payload["url"])
            self.tracker.update_job_progress(job_id, 25, "media downloaded")
            return {"audio_path": audio_path, "video_metadata": video_metadata}

        @router.task("transcribe_video")
        def transcribe_video(job_id, payload):
            if self.video_transcriber is None:
                raise RuntimeError("no transcriber configured on this deployment")
            from .ingestion.transcript import TranscriptProcessor
            from .ingestion.video_processor import to_simplified_chinese

            result = self.video_transcriber(payload["audio_path"])
            text = to_simplified_chinese(result.get("text", ""))
            metadata = dict(payload.get("video_metadata", {}))
            metadata["url"] = payload.get("url")
            metadata["language"] = result.get("language")
            docs = TranscriptProcessor().process(text, metadata, source="video")
            self.tracker.update_job_progress(job_id, 60, f"transcribed, {len(docs)} chunks")
            return {"documents": [d.to_dict() for d in docs]}

        @router.task("generate_embeddings")
        def generate_embeddings(job_id, payload):
            docs = [Document.from_dict(d) for d in payload.get("documents", [])]
            if not docs:
                return {"document_count": 0, "document_ids": []}
            for doc in docs:
                doc.metadata.setdefault("job_id", job_id)
            with self._lock:  # atomic vs save_index: index row + token
                # store row must land in the same checkpoint
                ids = self.engine.add_documents(docs)
            self.tracker.update_job_progress(job_id, 90, f"indexed {len(ids)} chunks")
            return {"document_count": len(ids), "document_ids": ids}

        @router.task("retrieve_documents")
        def retrieve_documents(job_id, payload):
            payload = clean_unicode_escapes(payload)
            ranked = self.engine.retrieve(
                payload["query"],
                mode=payload.get("mode", "facts"),
                metadata_filter=payload.get("metadata_filter"),
            )
            self.tracker.update_job_progress(job_id, 50, f"retrieved {len(ranked)} docs")
            result = {
                "documents": [
                    {**doc.to_dict(), "relevance_score": score} for doc, score in ranked
                ],
                "retrieval_timings": self.engine.last_timings,
            }
            if payload.get("validation"):
                result["validation"] = self.validation_engine.validate_documents(
                    payload["query"], ranked, payload.get("mode", "facts")
                )
                if payload.get("validation") == "guided":
                    # guided trust loop: a dedicated validation step follows,
                    # which can pause for user evidence (reference
                    # ValidationType.USER_GUIDED + dynamic step insertion,
                    # job_chain.py:349-433)
                    self.job_chain.insert_steps_after_current(
                        job_id, ["validate_documents"]
                    )
            return result

        @router.task("validate_documents")
        def validate_documents(job_id, payload):
            """Guided validation step: if the retrieved evidence fails
            validation, pause the chain and ask the user for input (resumed
            via /query/{id}/user-choice or /contribute)."""
            validation = payload.get("validation") or {}
            if validation.get("status") in ("failed", "warning"):
                self.job_chain.wait_for_user_input(
                    job_id,
                    {
                        "question": "检索证据未通过验证，请补充资料或选择继续",
                        "validation": validation,
                        "options": ["contribute", "proceed", "cancel"],
                    },
                )
            return {"validation_reviewed": True}

        @router.task("await_contribution")
        def await_contribution(job_id, payload):
            """Wait for a user-contributed ingest job to finish indexing so
            the follow-up re-retrieval sees the new evidence."""
            target = payload.get("contribution_job_id")
            if not target:
                return {}
            status = self.tracker.wait_for_terminal(target, timeout=120)
            return {"contribution_status": status or "timeout"}

        @router.task("llm_inference")
        def llm_inference(job_id, payload):
            docs = [
                (Document.from_dict(d), float(d.get("relevance_score", 0.0)))
                for d in payload.get("documents", [])
            ]
            result = self.generator.answer(
                payload["query"], docs, mode=payload.get("mode", "facts"),
                # streaming: partial answer text surfaces through the
                # polling API (/query/results/{id} .partial_answer) while
                # the serving engine decodes
                on_text=lambda text: self.tracker.set_partial_answer(
                    job_id, text),
            )
            # converge the stream onto the finalized answer so the last
            # partial a client saw never disagrees with the result
            self.tracker.set_partial_answer(job_id, result["answer"])
            if payload.get("validation"):
                result["answer_validation"] = self.validation_engine.validate_answer(
                    result["answer"],
                    [d for d, _ in docs],
                    payload.get("validation") if isinstance(payload.get("validation"), dict) else None,
                )
            self.tracker.update_job_progress(job_id, 95, "answer generated")
            self.analytics.record_query(
                payload["query"],
                payload.get("mode", "facts"),
                latency_s=result.get("generation_time_s", 0.0),
                confidence=result.get("confidence"),
                n_sources=len(result.get("sources", [])),
                job_id=job_id,
            )
            return result

    # ------------------------------------------------------------- query
    def submit_query(
        self,
        query: str,
        mode: str = "facts",
        metadata_filter: Optional[Dict[str, Any]] = None,
        validation: bool = False,
    ) -> str:
        job_id = self.tracker.create_job(
            JobType.LLM_INFERENCE.value,
            metadata={"query": query, "mode": mode, "metadata_filter": metadata_filter},
        )
        self.job_chain.start_job_chain(
            job_id,
            JobType.LLM_INFERENCE.value,
            {
                "query": query,
                "mode": mode,
                "metadata_filter": metadata_filter,
                "validation": validation,
            },
        )
        return job_id

    def query_sync(
        self,
        query: str,
        mode: str = "facts",
        metadata_filter: Optional[Dict[str, Any]] = None,
        timeout: float = 120.0,
        validation: bool = False,
    ) -> Dict[str, Any]:
        """Blocking convenience path (scripts, tests)."""
        job_id = self.submit_query(query, mode, metadata_filter, validation=validation)
        deadline = time.time() + timeout
        while time.time() < deadline:
            job = self.tracker.get_job(job_id)
            if job["status"] in (
                JobStatus.COMPLETED.value,
                JobStatus.FAILED.value,
                JobStatus.TIMEOUT.value,
            ):
                return job
            time.sleep(0.02)
        raise TimeoutError(f"query job {job_id} did not finish in {timeout}s")

    # ------------------------------------------------------------ ingest
    def ingest_text(self, content: str, metadata: Optional[Dict[str, Any]] = None) -> str:
        job_id = self.tracker.create_job(JobType.TEXT_PROCESSING.value, metadata={"kind": "text"})
        self.job_chain.start_job_chain(
            job_id, JobType.TEXT_PROCESSING.value,
            {"content": content, "metadata": metadata or {}},
        )
        return job_id

    def ingest_pdf(self, path: str, metadata: Optional[Dict[str, Any]] = None) -> str:
        job_id = self.tracker.create_job(JobType.PDF_PROCESSING.value, metadata={"path": path})
        self.job_chain.start_job_chain(
            job_id, JobType.PDF_PROCESSING.value, {"path": path, "metadata": metadata or {}}
        )
        return job_id

    def ingest_video(self, url: str, metadata: Optional[Dict[str, Any]] = None) -> str:
        job_id = self.tracker.create_job(JobType.VIDEO_PROCESSING.value, metadata={"url": url})
        self.job_chain.start_job_chain(
            job_id, JobType.VIDEO_PROCESSING.value, {"url": url, "metadata": metadata or {}}
        )
        return job_id

    def ingest_batch_videos(self, urls: List[str]) -> List[str]:
        """Per-video independent chains (reference ingest.py:88-162)."""
        return [self.ingest_video(url) for url in urls]

    # ------------------------------------------------------------- admin
    def reset_index(self) -> Dict[str, Any]:
        # the app lock keeps the swap atomic vs ingest workers' paired
        # index.add + token_store.append (same invariant as save_index) —
        # unlocked, a concurrent ingest could land its vector row in the old
        # index and its token rows in the new store
        with self._lock:
            before = self.index.count
            self.index = self._make_index()
            self.engine.index = self.index
            if self.token_store is not None:
                self.token_store = self._make_token_store()
                self.engine.token_store = self.token_store
            if self.sparse_index is not None:
                self.sparse_index = self._make_sparse_index()
                self.engine.sparse_index = self.sparse_index
        return {"deleted_documents": before}

    def save_index(self, directory: Optional[str] = None) -> str:
        directory = directory or self.settings.index_dir
        # the app lock serializes this against ingest workers' paired
        # index.add + token_store.append — otherwise a checkpoint can
        # capture the index one row ahead of the token store, and after
        # restore every tail-hitting query silently drops to the
        # per-candidate encode-and-rerank fallback
        with self._lock:
            self.index.save(directory)
            if self.token_store is not None:
                self.token_store.save(directory)
            if self.sparse_index is not None:
                self.sparse_index.save(directory)
        return directory

    def load_index(self, directory: Optional[str] = None) -> int:
        with self._lock:  # atomic swap vs concurrent ingest (see reset_index)
            return self._load_index_locked(directory)

    def _load_index_locked(self, directory: Optional[str] = None) -> int:
        directory = directory or self.settings.index_dir
        if self.settings.index_kind == "ivf":
            from .index.ivf import IVFIndex

            self.index = IVFIndex.load(directory)
            # load() restores data + build artifacts with constructor
            # defaults — re-apply the configured tunables or a restart
            # silently turns coarse-then-refine (and custom probe widths)
            # off until the next /model/update-config
            self.index.n_probe = self.settings.ivf_n_probe
            self.index.refine_dims = self.settings.ivf_refine_dims
            self.index.refine_shortlist = self.settings.ivf_refine_shortlist
            self.index._device = None  # head-slice copy keys off refine
        else:
            loaded = FlatIndex.load(directory)
            fresh = self._make_index()  # honors sharded/auto kinds
            for attr in ("_vectors", "_docs", "_ids", "_row_of_id", "_deleted", "columns"):
                setattr(fresh, attr, getattr(loaded, attr))
            fresh._device = None
            # sharded-ivf: re-attach the saved build artifacts (otherwise a
            # restored deployment silently degrades to exact search until a
            # manual rebuild — VERDICT r1 #5)
            if hasattr(fresh, "restore_build"):
                fresh.restore_build(directory)
            self.index = fresh
        self.engine.index = self.index
        if self.token_store is not None:
            dtype = (
                "bfloat16" if self.settings.index_dtype == "int8"
                else self.settings.index_dtype
            )
            restored = TokenStore.load(
                directory,
                dim=self.colbert.dim,
                max_doc_length=self.colbert.max_doc_length,
                device_dtype=dtype,
                # _make_token_store honors these; the restore path must
                # too, or a restart silently reverts to the 4 GiB default
                # budget (OOM on small chips, host-fallback on big ones)
                device_budget_bytes=(
                    self.settings.token_store_device_budget_mb * 1024**2),
            )
            if self.settings.token_store_sharded:
                sharded = self._make_token_store()
                sharded.quantize = restored.quantize
                for attr in ("_tokens", "_scales", "_masks", "_codes",
                             "_cids", "_res_scales", "_centroids", "_res_bits"):
                    setattr(sharded, attr, getattr(restored, attr))
                restored = sharded
            self.token_store = restored
            self.engine.token_store = self.token_store
        if self.sparse_index is not None:
            from .index.sparse import SparseIndex

            restored_sparse = SparseIndex.load(
                directory, top_terms=self.settings.sparse_top_terms)
            fresh_sparse = self._make_sparse_index()
            if type(fresh_sparse) is not SparseIndex:
                # sharded deployment: transplant the restored host arrays
                # into the mesh-backed index (same pattern as the sharded
                # token store above); placement happens lazily on first use
                fresh_sparse.top_terms = restored_sparse.top_terms
                fresh_sparse.device_dtype = restored_sparse.device_dtype
                fresh_sparse._ids = restored_sparse._ids
                fresh_sparse._weights = restored_sparse._weights
                fresh_sparse._recount_df_locked()
                restored_sparse = fresh_sparse
            self.sparse_index = restored_sparse
            self.engine.sparse_index = self.sparse_index
            # a checkpoint from a sparse-off deployment has no sparse rows;
            # the engine's alignment guard keeps the arm disengaged then.
            # A checkpoint saved at a different SPARSE_TOP_TERMS width wins:
            # the encoder follows it so post-restore appends stay row-shaped
            if (self.sparse_index.rows
                    and self.sparse_encoder is not None
                    and self.sparse_encoder.top_terms
                    != self.sparse_index.top_terms):
                self.sparse_encoder.top_terms = self.sparse_index.top_terms
        return self.index.count

    def warmup(self) -> Dict[str, Any]:
        """Pre-compile the hot executables (encode / search / rerank) so the
        first user query doesn't pay jit latency — material when compiles go
        through a remote compiler. Idempotent."""
        t0 = time.time()
        steps = []
        doc = Document(
            page_content="预热文档 warmup", metadata={"source": "text", "source_id": "warmup"}
        )
        if self.index.count == 0:
            with self._lock:
                ids = self.engine.add_documents([doc])
            steps.append("ingest")
            self.engine.retrieve("预热查询", mode="facts")
            steps.append("retrieve")
            self.index.delete_by_ids(ids)
        else:
            self.engine.retrieve("预热查询", mode="facts")
            steps.append("retrieve")
        if hasattr(self.index, "precompile_ladder"):
            # warm every retrieval depth live queries actually use: k is a
            # static jit key, so compiling only retriever_top_k (20) left
            # 5 of 6 modes (retrieval_k 25-40) to stall minutes on the
            # first filtered query's remote compile
            from .config.mode_config import mode_config as _mc

            ks = sorted({self.settings.retriever_top_k} | {
                _mc.get_retrieval_params(m)["retrieval_k"]
                for m in _mc.all_modes()
            })
            levels = []
            for k_mode in ks:
                levels = self.index.precompile_ladder(k=k_mode)
            if levels:
                steps.append(f"ivf-ladder{levels}x{len(ks)}k")
        serving = getattr(self.generator.llm, "_serving", None)
        if serving is not None:
            info = serving.warmup()
            steps.append(f"llm-serving:{info['compiled_buckets']}buckets")
        return {"warmed": steps, "seconds": round(time.time() - t0, 2)}

    def health(self) -> Dict[str, Any]:
        serving = getattr(self.generator.llm, "_serving", None)
        return {
            "status": "healthy",
            "uptime_s": round(time.time() - self.started_at, 1),
            "index": self.index.stats(),
            "queues": self.queue_manager.get_queue_status(),
            "workers": self.queue_manager.worker_health(),
            "jobs": self.tracker.get_job_counts(),
            "sparse": (None if self.sparse_index is None
                       else self.sparse_index.stats()),
            "llm": getattr(self.generator.llm, "name", "unknown"),
            "llm_serving": None if serving is None else {
                **serving.stats,
                "slots_busy": sum(r is not None for r in serving._slots),
                "pending": len(serving._pending),
            },
            "default_mode": QueryMode.FACTS.value,
        }

    def shutdown(self) -> None:
        self.queue_manager.shutdown()
