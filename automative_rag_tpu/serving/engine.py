"""Continuous-batching LLM serving engine.

The reference serves answer requests one at a time through a torch HF
``pipeline`` (``src/core/query/llm/local_llm.py:457-466``): each request
owns the GPU for its full prefill+decode, so concurrent queries queue
behind one another and decode runs at batch-1 arithmetic intensity. This
module is the TPU-native production path instead:

- a fixed pool of ``max_slots`` KV-cache rows lives in HBM with static
  shapes (XLA-friendly: one compiled program, no reallocation);
- a new request is admitted by running a batch-1 bucketed **prefill** and
  scattering its rope-applied k/v into a free slot row (prompt occupies
  cache columns ``[0, plen)`` — compact layout, so the cache frontier and
  the rotary position coincide);
- decoding advances for ALL occupied slots at once via the model's
  per-row-frontier ``verify`` path (``models/qwen2.py`` — S=1 makes it a
  decode step whose cache write lands at each row's own column), wrapped
  in a whole-jitted **burst** of N steps per dispatch. Requests join and
  leave the batch between bursts without stopping in-flight decodes.

Decode is weight-HBM-bound, so batching multiplies throughput nearly for
free (on-chip: 92.8 tok/s at b1 → 508.6 tok/s at b8 for the 7B int8
geometry) — continuous batching converts that into *latency under load*:
a request admitted mid-stream starts decoding within one burst instead of
waiting for the whole previous request to finish. Bursts (rather than a
host step loop, vLLM-style) amortize dispatch overhead: through the axon
relay one dispatch costs ~26 ms, so at burst=16 that is ~1.6 ms/token of
overhead instead of 26.

Per-row sampling state (temperature / top-p / repetition penalty / seen
sets / PRNG) is carried in the device-side state pytree, so mixed-mode
batches (a greedy facts query next to a sampled debate query,
``config/mode_config.py``) are exact: every row's token stream is
bit-identical to running that request alone through
``Qwen2Model.generate_tokens``.
"""

from __future__ import annotations

import dataclasses
import itertools
import threading
import time
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.qwen2 import (
    Qwen2Config,
    Qwen2Model,
    _pld_draft,
    _quant_kv,
)


def _penalize_rows(logits: jnp.ndarray, seen: jnp.ndarray,
                   penalty: jnp.ndarray) -> jnp.ndarray:
    """Per-row CTRL repetition penalty: logits [B, V], penalty [B]."""
    pen = penalty[:, None]
    penalized = jnp.where(logits > 0, logits / pen, logits * pen)
    return jnp.where(seen, penalized, logits)


def _sample_rows(logits: jnp.ndarray, key, temps: jnp.ndarray,
                 top_ps: jnp.ndarray) -> jnp.ndarray:
    """Per-row temperature + nucleus sampling; rows with temp<=0 are
    greedy. The sampling branch (an argsort over [B, V]) only runs when
    some row actually samples — facts-mode serving is all-greedy."""
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def do_sample(_):
        scaled = logits / jnp.maximum(temps[:, None], 1e-5)
        sort_idx = jnp.argsort(-scaled, axis=-1)
        sorted_logits = jnp.take_along_axis(scaled, sort_idx, axis=-1)
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        keep = (cum - probs) < top_ps[:, None]
        filtered = jnp.where(keep, sorted_logits, -1e30)
        choice = jax.random.categorical(key, filtered, axis=-1)
        return jnp.take_along_axis(
            sort_idx, choice[:, None], axis=-1
        )[:, 0].astype(jnp.int32)

    sampled = jax.lax.cond(jnp.any(temps > 0), do_sample,
                           lambda _: greedy, operand=None)
    return jnp.where(temps > 0, sampled, greedy)


@dataclasses.dataclass(eq=False)
class Request:
    """One generation request; ``tokens`` fills in as bursts complete.

    Identity equality (``eq=False``): the generated dataclass ``__eq__``
    would compare the ndarray field element-wise, which breaks membership
    ops (``list.remove``) the moment requests complete out of order."""

    prompt_ids: np.ndarray
    max_new_tokens: int
    temperature: float = 0.0
    top_p: float = 1.0
    repetition_penalty: float = 1.0
    on_token: Optional[Callable[[List[int]], None]] = None
    request_id: int = 0
    prefix_id: Optional[int] = None
    tokens: List[int] = dataclasses.field(default_factory=list)
    submitted_at: float = 0.0
    started_at: float = 0.0
    finished_at: float = 0.0
    _done: threading.Event = dataclasses.field(
        default_factory=threading.Event, repr=False)

    cancelled: bool = False

    def result(self, timeout: Optional[float] = None) -> List[int]:
        """Block until finished; returns generated ids (EOS stripped)."""
        if not self._done.wait(timeout):
            raise TimeoutError(f"request {self.request_id} not finished")
        return self.generated_ids()

    def generated_ids(self) -> List[int]:
        return list(self.tokens)

    @property
    def finished(self) -> bool:
        return self._done.is_set()


class ServingEngine:
    """Slot-pool continuous batching over a ``Qwen2Model``.

    Token-level: callers tokenize/detokenize (``generation/llm.py`` wires
    the tokenizer). Thread-safe ``submit``; drive with ``step()`` /
    ``run_until_idle()`` or a background ``start()`` thread.
    """

    def __init__(self, model: Qwen2Model, max_slots: int = 8,
                 max_len: int = 2048,
                 prompt_buckets: Sequence[int] = (64, 128, 256, 512, 1024),
                 burst: int = 16, seed: int = 0, spec: bool = False,
                 prefill_chunk: int = 0, chunk_burst: int = 0,
                 chunk_adaptive: bool = True, chunk_max_passes: int = 4,
                 admit_pacing: bool = True, admit_batch: int = 8,
                 admit_pacing_group: int = 2):
        self.model = model
        self.config: Qwen2Config = model.config
        self.max_slots = int(max_slots)
        self.max_len = int(max_len)
        self.prompt_buckets = tuple(
            sorted(b for b in prompt_buckets if b < max_len))
        if not self.prompt_buckets:
            raise ValueError("no prompt bucket fits under max_len")
        self.burst = int(burst)
        # speculative bursts: per-row prompt-lookup drafts, (K+1)-wide
        # verify steps — up to K+1 tokens/row per step for the cost of ~1
        # (decode is weight-HBM-bound). Greedy rows stay token-identical
        # to the plain burst; a miss costs nothing but the draft columns.
        self.spec = bool(spec)
        self.draft_k = int(model.DRAFT_K)
        # chunked prefill (Sarathi-style): admissions longer than
        # ``prefill_chunk`` tokens fill the slot's KV in chunk-sized
        # pieces, with a short decode burst between chunks — the stall a
        # long prompt imposes on in-flight streams drops from the whole
        # prefill (~137 ms at 7B/1024) to one chunk. 0 disables.
        self.prefill_chunk = int(prefill_chunk)
        self.chunk_burst = int(chunk_burst) or max(1, int(burst) // 4)
        # adaptive policy (r03 bench: fixed-size chunking cut stall_max
        # 1.95x but cost +19% wall and 7x the long request's own TTFT —
        # every chunk pass re-reads the full weights, so many small chunks
        # multiply the prefill's weight-HBM bill):
        # - admissions only chunk when live streams exist (idle engine →
        #   monolithic prefill; nothing can stall, chunking only costs),
        # - the chunk size scales up so one admission is at most
        #   ``chunk_max_passes`` passes (menu C/2C/4C — bounded compiles).
        self.chunk_adaptive = bool(chunk_adaptive)
        self.chunk_max_passes = max(2, int(chunk_max_passes))
        # admission pacing: when live streams exist, admit at most ONE
        # request per scheduler step. The dominant decode-stall source is
        # admission PILEUP — several arrivals admitting back-to-back in one
        # step stall in-flight streams for n_admissions × prefill
        # (BENCH_SERVING_TPU_r04 monolithic stall_max 954 ms ≈ 2-3 stacked
        # 512-token prefills) — and pacing bounds it at one prefill for
        # ZERO extra weight reads (the decode burst between paced
        # admissions is useful work chunking pays extra passes for). An
        # idle engine still admits a full batch: nothing can stall.
        self.admit_pacing = bool(admit_pacing)
        # paced admissions per step: with batched admission a small group
        # lands in ONE multi-row prefill dispatch, so a live stream's
        # stall stays ~one (batched) prefill while the backlog drains in
        # half the dispatches (G=1 measured 409.7 tok/s of static 596.7
        # at S8/16req — admission overhead, not decode, was the gap)
        self.admit_pacing_group = max(1, int(admit_pacing_group))
        # batched admission: up to this many same-bucket monolithic
        # admissions share ONE prefill forward/dispatch (sizes {8,4,2}
        # compile; 1 disables). Engages when several requests land on an
        # idle engine — pacing still trickles admissions one per step
        # while live streams exist.
        self.admit_batch = max(1, int(admit_batch))
        #: generated tokens live at buf[:, _gen_base:] — prompts (ragged,
        #: bucket-padded) at buf[:, :plen]; the fixed split lets the
        #: n-gram matcher mask the padding gap with per-row plen
        self._gen_base = self.prompt_buckets[-1]
        self._ids = itertools.count(1)
        self._pending: List[Request] = []
        self._slots: List[Optional[Request]] = [None] * self.max_slots
        self._taken = [0] * self.max_slots  # tokens already surfaced
        # reentrant: cancel() holds it while completing a pending request,
        # and _complete itself serializes against cancel's finished-check
        self._lock = threading.RLock()
        self._wake = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._stop = False
        self._prefill_cache: Dict[int, Any] = {}
        self._burst_cache: Dict[int, Any] = {}
        self._spec_burst_cache: Dict[int, Any] = {}
        # prefix KV cache: id → {tokens [1,Pb], plen, blobs (per-layer KV)}
        self._prefixes: Dict[int, Dict[str, Any]] = {}
        self._prefix_ids = itertools.count(1)
        self._prefix_encode_cache: Dict[int, Any] = {}
        self._prefix_admit_cache: Dict[int, Any] = {}
        self._chunk_fill_cache: Dict[Any, Any] = {}
        self._chunk_last_cache: Dict[int, Any] = {}
        self._warmed: Optional[Dict[str, Any]] = None
        self.stats = {"tokens_generated": 0, "bursts": 0, "prefills": 0,
                      "requests_completed": 0, "busy_s": 0.0,
                      "prefix_admits": 0, "prefix_misses": 0,
                      "chunked_admits": 0, "scheduler_errors": 0,
                      "engine_resets": 0, "truncated_prompts": 0,
                      "chunk_idle_monolithic": 0, "multi_admits": 0}
        self.last_error: Optional[str] = None
        self._seed = seed
        self._warm_lock = threading.Lock()
        self._state = self._init_state(seed)

    # ---------------------------------------------------------- state

    def _empty_caches(self):
        cfg = self.config
        b, n = self.max_slots, self.max_len
        caches = []
        for _ in range(cfg.num_layers):
            if cfg.kv_cache_bits == 8:
                entry = tuple(
                    (jnp.zeros((b, n, cfg.num_kv_heads, cfg.head_dim),
                               jnp.int8),
                     jnp.zeros((b, n), jnp.float32))
                    for _ in range(2))
                caches.append(entry)
            else:
                ck = jnp.zeros((b, n, cfg.num_kv_heads, cfg.head_dim),
                               cfg.dtype)
                caches.append((ck, jnp.zeros_like(ck)))
        return caches

    def _init_state(self, seed: int):
        b, v = self.max_slots, self.config.vocab_size
        return {
            "caches": self._empty_caches(),
            # token history for prompt-lookup drafting: prompt at
            # [0, plen), generated at [_gen_base, _gen_base + gen_count)
            "buf": jnp.full((b, self._gen_base + self.max_len),
                            self.config.eos_token, jnp.int32),
            "plen": jnp.zeros((b,), jnp.int32),
            "cur": jnp.full((b,), self.config.eos_token, jnp.int32),
            "frontier": jnp.zeros((b,), jnp.int32),
            "seen": jnp.zeros((b, v), bool),
            "finished": jnp.ones((b,), bool),
            "active": jnp.zeros((b,), bool),
            "gen_count": jnp.zeros((b,), jnp.int32),
            "max_new": jnp.zeros((b,), jnp.int32),
            "temp": jnp.zeros((b,), jnp.float32),
            "top_p": jnp.ones((b,), jnp.float32),
            "penalty": jnp.ones((b,), jnp.float32),
            "key": jax.random.PRNGKey(seed),
        }

    # ------------------------------------------------------- jitted fns

    def _activate_row(self, state, caches, buf, slot, logits0, seen_row,
                      total, temp, top_p, penalty, max_new):
        """Shared admission tail (traced; used by every admit variant):
        penalize + sample token 0 against the row's seen set, then write
        every per-row state field. Any new per-row field needs exactly
        this one site updated."""
        cfg = self.config
        logits0 = _penalize_rows(
            logits0[None], seen_row[None], penalty[None])[0]
        key, sub = jax.random.split(state["key"])
        tok0 = _sample_rows(logits0[None], sub, temp[None], top_p[None])[0]
        seen_row = seen_row.at[tok0].set(True)
        done0 = (tok0 == cfg.eos_token) | (max_new <= 1)
        buf = buf.at[slot, self._gen_base].set(tok0)
        state = {
            **state,
            "caches": caches,
            "buf": buf,
            "plen": state["plen"].at[slot].set(total),
            "cur": state["cur"].at[slot].set(tok0),
            "frontier": state["frontier"].at[slot].set(total),
            "seen": state["seen"].at[slot].set(seen_row),
            "finished": state["finished"].at[slot].set(done0),
            "active": state["active"].at[slot].set(True),
            "gen_count": state["gen_count"].at[slot].set(1),
            "max_new": state["max_new"].at[slot].set(max_new),
            "temp": state["temp"].at[slot].set(temp),
            "top_p": state["top_p"].at[slot].set(top_p),
            "penalty": state["penalty"].at[slot].set(penalty),
            "key": key,
        }
        return state, tok0

    def _activate_rows(self, state, caches, buf, slots, logits, seen_rows,
                       totals, temps, top_ps, penalties, max_news):
        """Batched admission tail: sample token 0 for R rows and write
        every per-row state field via slot scatters (the R-row analog of
        ``_activate_row``; slots are distinct by construction)."""
        cfg = self.config
        logits = _penalize_rows(logits, seen_rows, penalties)
        key, sub = jax.random.split(state["key"])
        toks = _sample_rows(logits, sub, temps, top_ps)  # [R]
        rr = jnp.arange(toks.shape[0])
        seen_rows = seen_rows.at[rr, toks].set(True)
        done0 = (toks == cfg.eos_token) | (max_news <= 1)
        buf = buf.at[slots, self._gen_base].set(toks)
        state = {
            **state,
            "caches": caches,
            "buf": buf,
            "plen": state["plen"].at[slots].set(totals),
            "cur": state["cur"].at[slots].set(toks),
            "frontier": state["frontier"].at[slots].set(totals),
            "seen": state["seen"].at[slots].set(seen_rows),
            "finished": state["finished"].at[slots].set(done0),
            "active": state["active"].at[slots].set(True),
            "gen_count": state["gen_count"].at[slots].set(
                jnp.ones_like(totals)),
            "max_new": state["max_new"].at[slots].set(max_news),
            "temp": state["temp"].at[slots].set(temps),
            "top_p": state["top_p"].at[slots].set(top_ps),
            "penalty": state["penalty"].at[slots].set(penalties),
            "key": key,
        }
        return state, toks

    def _prefill_multi_fn(self, p_bucket: int, rows: int):
        """Compile the R-row batched admission (r05 item 2): R same-bucket
        monolithic admissions share ONE prefill forward + ONE dispatch —
        the per-request path paid a full host→device round trip (~26 ms
        relay) and a separate weight read per admission, so a 16-request
        burst serialized ~16 × (dispatch + prefill) before decoding."""
        key = ("multi", p_bucket, rows)
        if key in self._prefill_cache:
            return self._prefill_cache[key]
        cfg = self.config
        decoder = self.model.decoder

        def _prefill(params, state, prompts, plens, slots, temps, top_ps,
                     penalties, max_news):
            """prompts [R, Pb] (eos-padded); plens/slots [R]."""
            dparams = {"params": params}
            hidden, kvs = decoder.apply(
                dparams, prompts, method="prefill_hidden")
            rr = jnp.arange(rows)
            caches = []
            for (k, v), entry in zip(kvs, state["caches"]):
                if cfg.kv_cache_bits == 8:
                    new_entry = []
                    for full, (cq, cs) in zip((k, v), entry):
                        quant, scales = _quant_kv(full)
                        new_entry.append((
                            cq.at[slots, :p_bucket].set(quant),
                            cs.at[slots, :p_bucket].set(
                                scales.astype(cs.dtype)),
                        ))
                    caches.append(tuple(new_entry))
                else:
                    ck, cv = entry
                    caches.append((
                        ck.at[slots, :p_bucket].set(k.astype(cfg.dtype)),
                        cv.at[slots, :p_bucket].set(v.astype(cfg.dtype)),
                    ))
            hidden_last = jnp.take_along_axis(
                hidden, (plens - 1)[:, None, None], axis=1)  # [R, 1, H]
            logits = decoder.apply(
                dparams, hidden_last, method="logits_at")[:, 0]  # [R, V]
            prompt_mask = jnp.arange(p_bucket)[None, :] < plens[:, None]
            seen_rows = jnp.zeros(
                (rows, cfg.vocab_size), bool
            ).at[rr[:, None], prompts].max(prompt_mask)
            buf = state["buf"].at[slots, :p_bucket].set(prompts)
            return self._activate_rows(
                state, caches, buf, slots, logits, seen_rows, plens,
                temps, top_ps, penalties, max_news)

        fn = jax.jit(_prefill, donate_argnums=(1,))
        self._prefill_cache[key] = fn
        return fn

    def _admit_multi(self, reqs, slots) -> None:
        """Admit R same-bucket monolithic requests in one dispatch."""
        rows = len(reqs)
        plens = np.array([r.prompt_ids.size for r in reqs], np.int32)
        p_bucket = next(b for b in self.prompt_buckets
                        if b >= int(plens.max()))
        prompts = np.full((rows, p_bucket), self.config.eos_token, np.int32)
        for i, req in enumerate(reqs):
            prompts[i, : plens[i]] = req.prompt_ids
        head = self.draft_k if self.spec else 0
        max_news = np.maximum(np.minimum(
            [r.max_new_tokens for r in reqs],
            self.max_len - plens - 1 - head), 1).astype(np.int32)
        fn = self._prefill_multi_fn(p_bucket, rows)
        self._state, toks = fn(
            self.model.params, self._state, jnp.asarray(prompts),
            jnp.asarray(plens), jnp.asarray(np.asarray(slots, np.int32)),
            jnp.asarray(np.array([r.temperature for r in reqs],
                                 np.float32)),
            jnp.asarray(np.array([r.top_p for r in reqs], np.float32)),
            jnp.asarray(np.array([r.repetition_penalty for r in reqs],
                                 np.float32)),
            jnp.asarray(max_news))
        toks = np.asarray(toks)
        for i, (req, slot) in enumerate(zip(reqs, slots)):
            self._post_admit(req, slot, int(toks[i]), int(max_news[i]))
        self.stats["multi_admits"] = (
            self.stats.get("multi_admits", 0) + rows)

    def _admission_groups(self, admit, free):
        """Partition this step's admissions into dispatch groups: runs of
        multi-eligible requests sharing a prompt bucket batch at sizes
        {8, 4, 2} (largest compiled size that fits, remainder re-grouped);
        everything else admits singly, in arrival order."""
        pairs = [(r, s) for r, s in zip(admit, free)]
        groups = []
        i = 0
        while i < len(pairs):
            req, slot = pairs[i]
            if (self.admit_batch <= 1 or req.cancelled
                    or not self._multi_eligible(req)):
                groups.append(([req], [slot]))
                i += 1
                continue
            bucket = next(b for b in self.prompt_buckets
                          if b >= req.prompt_ids.size)
            run = [pairs[i]]
            j = i + 1
            while j < len(pairs) and len(run) < self.admit_batch:
                r2, s2 = pairs[j]
                if (not r2.cancelled and self._multi_eligible(r2)
                        and next(b for b in self.prompt_buckets
                                 if b >= r2.prompt_ids.size) == bucket):
                    run.append(pairs.pop(j))
                else:
                    j += 1
            while run:
                size = next((s for s in (8, 4, 2)
                             if s <= min(len(run), self.admit_batch)), 1)
                chunk, run = run[:size], run[size:]
                groups.append(([r for r, _ in chunk],
                               [s for _, s in chunk]))
            i += 1
        return groups

    def _multi_eligible(self, req: Request) -> bool:
        """A request the plain monolithic path would take as-is: no prefix
        KV, no chunk plan in play (chunking and prefix seeding keep the
        single-dispatch path — their KV writes are offset-dependent)."""
        if req.prefix_id is not None or req.cancelled:
            return False
        plen = int(req.prompt_ids.size)
        c = self._chunk_size_for(plen)
        if c and plen > c:
            return False
        return any(b >= plen for b in self.prompt_buckets)

    def _prefill_fn(self, p_bucket: int):
        """Compile (per prompt bucket) the admit-into-slot program."""
        if p_bucket in self._prefill_cache:
            return self._prefill_cache[p_bucket]
        cfg = self.config
        decoder = self.model.decoder

        def _prefill(params, state, prompt, plen, slot, temp, top_p,
                     penalty, max_new):
            """prompt [1, Pb] (eos-padded), scalar plen/slot; writes row
            ``slot`` of every state array and samples the first token."""
            dparams = {"params": params}
            hidden, kvs = decoder.apply(
                dparams, prompt, method="prefill_hidden")
            caches = []
            for (k, v), entry in zip(kvs, state["caches"]):
                if cfg.kv_cache_bits == 8:
                    new_entry = []
                    for full, (cq, cs) in zip((k, v), entry):
                        quant, scales = _quant_kv(full)
                        new_entry.append((
                            jax.lax.dynamic_update_slice(
                                cq, quant, (slot, 0, 0, 0)),
                            jax.lax.dynamic_update_slice(
                                cs, scales, (slot, 0)),
                        ))
                    caches.append(tuple(new_entry))
                else:
                    ck, cv = entry
                    caches.append((
                        jax.lax.dynamic_update_slice(
                            ck, k.astype(cfg.dtype), (slot, 0, 0, 0)),
                        jax.lax.dynamic_update_slice(
                            cv, v.astype(cfg.dtype), (slot, 0, 0, 0)),
                    ))
            # logits only at the last real prompt token (materializing
            # [1, Pb, V] f32 is a multi-GB transient at 7B scale)
            hidden_last = jax.lax.dynamic_slice(
                hidden, (0, plen - 1, 0), (1, 1, hidden.shape[2]))
            logits0 = decoder.apply(
                dparams, hidden_last, method="logits_at")[0, 0]
            prompt_mask = jnp.arange(p_bucket) < plen
            seen_row = jnp.zeros(
                (cfg.vocab_size,), bool).at[prompt[0]].max(prompt_mask)
            buf = jax.lax.dynamic_update_slice(
                state["buf"], prompt, (slot, 0))
            return self._activate_row(
                state, caches, buf, slot, logits0, seen_row, plen,
                temp, top_p, penalty, max_new)

        fn = jax.jit(_prefill, donate_argnums=(1,))
        self._prefill_cache[p_bucket] = fn
        return fn

    # ------------------------------------------------- prefix KV caching

    def _prefix_encode_fn(self, p_bucket: int):
        """Compile the prefix → reusable KV-blob encoder (per bucket)."""
        if p_bucket in self._prefix_encode_cache:
            return self._prefix_encode_cache[p_bucket]
        cfg = self.config
        decoder = self.model.decoder

        def _encode(params, prompt):
            _, kvs = decoder.apply(
                {"params": params}, prompt, method="prefill_hidden")
            blobs = []
            for k, v in kvs:
                if cfg.kv_cache_bits == 8:
                    blobs.append(tuple(_quant_kv(f) for f in (k, v)))
                else:
                    blobs.append(
                        (k.astype(cfg.dtype), v.astype(cfg.dtype)))
            return blobs

        fn = jax.jit(_encode)
        self._prefix_encode_cache[p_bucket] = fn
        return fn

    def register_prefix(self, prefix_ids, warm: bool = False) -> int:
        """Prefill ``prefix_ids`` ONCE and keep the rope-applied KV
        resident in HBM; a request submitted with the returned id skips
        recomputing that prefix — admission copies the cached KV into the
        slot row and prefills only the suffix. In RAG serving every
        request shares the mode's system-prompt/template header
        (``generation/prompts.py``; reference builds the same fixed header
        per request, ``src/core/query/llm/local_llm.py:301-403``), so the
        header's prefill FLOPs are paid once per process instead of once
        per request. Token streams are unchanged: rope positions and
        attention masks are identical to a full prefill."""
        ids = np.asarray(prefix_ids, np.int32).reshape(-1)
        if ids.size == 0:
            raise ValueError("empty prefix")
        fitting = [b for b in self.prompt_buckets if b >= ids.size]
        if not fitting or ids.size >= self._gen_base:
            raise ValueError(
                f"prefix of {ids.size} tokens does not fit the prompt "
                f"buckets {self.prompt_buckets}")
        if ids.size + self.prompt_buckets[0] > self._gen_base:
            # no suffix could ever sit next to this prefix — registering
            # would leak a permanently-unusable KV blob in HBM
            raise ValueError(
                f"prefix of {ids.size} tokens leaves no room for any "
                f"suffix bucket under {self._gen_base}")
        p_bucket = fitting[0]
        padded = np.full((1, p_bucket), self.config.eos_token, np.int32)
        padded[0, : ids.size] = ids
        padded = jnp.asarray(padded)
        blobs = self._prefix_encode_fn(p_bucket)(self.model.params, padded)
        pid = next(self._prefix_ids)
        self._prefixes[pid] = {
            "tokens": ids, "padded": padded, "plen": int(ids.size),
            "blobs": blobs}
        if warm:
            # compile the prefixed-admission program for every suffix
            # bucket this prefix can use — otherwise each bucket's first
            # live request pays the (remotely, minutes-long) compile
            for b in self.prompt_buckets:
                if int(ids.size) + b <= self._gen_base:
                    suffix = [3 + i % 11 for i in range(b)]
                    self.submit(list(ids) + suffix, max_new_tokens=2,
                                prefix_id=pid)
            if self._thread is None:
                self.run_until_idle()
        return pid

    def _prefix_admit_fn(self, s_bucket: int):
        """Compile the prefixed admission: cached prefix KV → slot row,
        then ONE ``verify_hidden`` pass over the suffix (a multi-token
        decode step against the prefix KV — same math as prefill, but the
        prefix costs a copy instead of 28 layers of matmuls)."""
        if s_bucket in self._prefix_admit_cache:
            return self._prefix_admit_cache[s_bucket]
        cfg = self.config
        decoder = self.model.decoder
        max_len = self.max_len
        gen_base = self._gen_base
        kv8 = cfg.kv_cache_bits == 8

        def _admit(params, state, blobs, pre_tokens, p_len, suffix, slen,
                   slot, temp, top_p, penalty, max_new):
            """pre_tokens [1, Pb] (eos-padded registered prefix), suffix
            [1, Sb]; scalar p_len/slen/slot. Columns ≥ the frontier hold
            junk by engine invariant, so blob padding needs no masking."""
            dparams = {"params": params}
            # slot-row caches: prefix KV at columns [0, Pb), zeros beyond
            row_caches = []
            for blob in blobs:
                if kv8:
                    entry = []
                    for bq, bs in blob:
                        rq = jnp.zeros((1, max_len) + bq.shape[2:],
                                       bq.dtype)
                        rs = jnp.zeros((1, max_len), bs.dtype)
                        entry.append((
                            jax.lax.dynamic_update_slice(
                                rq, bq, (0, 0, 0, 0)),
                            jax.lax.dynamic_update_slice(rs, bs, (0, 0)),
                        ))
                    row_caches.append(tuple(entry))
                else:
                    bk, bv = blob
                    rk = jnp.zeros((1, max_len) + bk.shape[2:], bk.dtype)
                    row_caches.append((
                        jax.lax.dynamic_update_slice(rk, bk, (0, 0, 0, 0)),
                        jax.lax.dynamic_update_slice(
                            jnp.zeros_like(rk), bv, (0, 0, 0, 0)),
                    ))
            # suffix prefill: rope starts at p_len, attends to the prefix
            valid = (jnp.arange(max_len) < p_len)[None, :]
            hidden, row_caches = decoder.apply(
                dparams, suffix, p_len,
                jnp.full((1,), p_len, jnp.int32), valid, row_caches,
                method="verify_hidden")
            hidden_last = jax.lax.dynamic_slice(
                hidden, (0, slen - 1, 0), (1, 1, hidden.shape[2]))
            logits0 = decoder.apply(
                dparams, hidden_last, method="logits_at")[0, 0]
            pb = pre_tokens.shape[1]
            seen_row = jnp.zeros((cfg.vocab_size,), bool)
            seen_row = seen_row.at[pre_tokens[0]].max(
                jnp.arange(pb) < p_len)
            seen_row = seen_row.at[suffix[0]].max(
                jnp.arange(s_bucket) < slen)
            total = p_len + slen
            # scatter the finished row back into the pool caches
            caches = []
            for entry, row in zip(state["caches"], row_caches):
                if kv8:
                    caches.append(tuple(
                        (jax.lax.dynamic_update_slice(
                            cq, rq, (slot, 0, 0, 0)),
                         jax.lax.dynamic_update_slice(cs, rs, (slot, 0)))
                        for (cq, cs), (rq, rs) in zip(entry, row)))
                else:
                    (ck, cv), (rk, rv) = entry, row
                    caches.append((
                        jax.lax.dynamic_update_slice(
                            ck, rk, (slot, 0, 0, 0)),
                        jax.lax.dynamic_update_slice(
                            cv, rv, (slot, 0, 0, 0)),
                    ))
            buf = jax.lax.dynamic_update_slice(
                state["buf"], pre_tokens, (slot, 0))
            buf = jax.lax.dynamic_update_slice(buf, suffix, (slot, p_len))
            return self._activate_row(
                state, caches, buf, slot, logits0, seen_row, total,
                temp, top_p, penalty, max_new)

        fn = jax.jit(_admit, donate_argnums=(1,))
        self._prefix_admit_cache[s_bucket] = fn
        return fn

    def _prefix_seed_fn(self):
        """Compile the chunked-prefix seeder: cached prefix KV → slot row
        (copies only, no model forward), seen/buf/frontier initialized to
        the prefix so suffix CHUNKS can follow (``_fill_chunks`` with
        ``first=False``)."""
        if "seed" in self._prefix_admit_cache:
            return self._prefix_admit_cache["seed"]
        cfg = self.config
        max_len = self.max_len
        kv8 = cfg.kv_cache_bits == 8

        def _seed(state, blobs, pre_tokens, p_len, slot):
            caches = []
            for entry, blob in zip(state["caches"], blobs):
                if kv8:
                    new_entry = []
                    for (cq, cs), (bq, bs) in zip(entry, blob):
                        rq = jnp.zeros((1, max_len) + bq.shape[2:],
                                       bq.dtype)
                        rq = jax.lax.dynamic_update_slice(
                            rq, bq, (0, 0, 0, 0))
                        rs = jax.lax.dynamic_update_slice(
                            jnp.zeros((1, max_len), bs.dtype), bs, (0, 0))
                        new_entry.append((
                            jax.lax.dynamic_update_slice(
                                cq, rq, (slot, 0, 0, 0)),
                            jax.lax.dynamic_update_slice(
                                cs, rs, (slot, 0)),
                        ))
                    caches.append(tuple(new_entry))
                else:
                    (ck, cv), (bk, bv) = entry, blob
                    rk = jnp.zeros((1, max_len) + bk.shape[2:], bk.dtype)
                    caches.append((
                        jax.lax.dynamic_update_slice(
                            ck, jax.lax.dynamic_update_slice(
                                rk, bk, (0, 0, 0, 0)), (slot, 0, 0, 0)),
                        jax.lax.dynamic_update_slice(
                            cv, jax.lax.dynamic_update_slice(
                                jnp.zeros_like(rk), bv, (0, 0, 0, 0)),
                            (slot, 0, 0, 0)),
                    ))
            pb = pre_tokens.shape[1]
            seen_row = jnp.zeros((cfg.vocab_size,), bool)
            seen_row = seen_row.at[pre_tokens[0]].max(
                jnp.arange(pb) < p_len)
            buf = jax.lax.dynamic_update_slice(
                state["buf"], pre_tokens, (slot, 0))
            return {
                **state,
                "caches": caches,
                "buf": buf,
                "seen": state["seen"].at[slot].set(seen_row),
                "frontier": state["frontier"].at[slot].set(p_len),
            }

        fn = jax.jit(_seed, donate_argnums=(0,))
        self._prefix_admit_cache["seed"] = fn
        return fn

    # --------------------------------------------------- chunked prefill

    def _row_cache_ops(self):
        """(slice, scatter) for one slot row of the pool caches."""
        kv8 = self.config.kv_cache_bits == 8
        max_len = self.max_len

        def _slice_one(c, slot):
            if c.ndim == 2:  # int8 scale planes [B, max_len]
                return jax.lax.dynamic_slice(
                    c, (slot, 0), (1, max_len))
            return jax.lax.dynamic_slice(
                c, (slot, 0, 0, 0), (1, max_len) + c.shape[2:])

        def _scatter_one(c, r, slot):
            start = (slot, 0) if c.ndim == 2 else (slot, 0, 0, 0)
            return jax.lax.dynamic_update_slice(c, r, start)

        def row_slice(caches, slot):
            out = []
            for entry in caches:
                if kv8:
                    out.append(tuple(
                        (_slice_one(cq, slot), _slice_one(cs, slot))
                        for cq, cs in entry))
                else:
                    ck, cv = entry
                    out.append((_slice_one(ck, slot), _slice_one(cv, slot)))
            return out

        def row_scatter(caches, rows, slot):
            out = []
            for entry, row in zip(caches, rows):
                if kv8:
                    out.append(tuple(
                        (_scatter_one(cq, rq, slot),
                         _scatter_one(cs, rs, slot))
                        for (cq, cs), (rq, rs) in zip(entry, row)))
                else:
                    (ck, cv), (rk, rv) = entry, row
                    out.append((_scatter_one(ck, rk, slot),
                                _scatter_one(cv, rv, slot)))
            return out

        return row_slice, row_scatter

    def _chunk_fill_fn(self, c_bucket: int, first: bool):
        """Compile one NON-final prefill chunk: write the chunk's KV into
        the slot row at ``offset`` (a ``verify_hidden`` segment pass — the
        chunk attends to the already-filled columns) and extend the seen
        set / history buffer. The row stays inactive; ``frontier`` tracks
        the fill position so that decode-burst cache writes for this
        (masked-out) row land exactly where the NEXT chunk will overwrite
        them. ``first`` resets the seen row (slot reuse)."""
        key = (c_bucket, first)
        if key in self._chunk_fill_cache:
            return self._chunk_fill_cache[key]
        cfg = self.config
        decoder = self.model.decoder
        max_len = self.max_len
        row_slice, row_scatter = self._row_cache_ops()

        def _fill(params, state, chunk, clen, offset, slot):
            """chunk [1, Cb] (eos-padded), scalar clen/offset/slot."""
            row = row_slice(state["caches"], slot)
            valid = (jnp.arange(max_len) < offset)[None, :]
            _, row = decoder.apply(
                {"params": params}, chunk, offset,
                jnp.full((1,), offset, jnp.int32), valid, row,
                method="verify_hidden")
            caches = row_scatter(state["caches"], row, slot)
            base = (jnp.zeros((cfg.vocab_size,), bool) if first
                    else state["seen"][slot])
            row_seen = base.at[chunk[0]].max(jnp.arange(c_bucket) < clen)
            buf = jax.lax.dynamic_update_slice(
                state["buf"], chunk, (slot, offset))
            return {
                **state,
                "caches": caches,
                "buf": buf,
                "seen": state["seen"].at[slot].set(row_seen),
                "frontier": state["frontier"].at[slot].set(offset + clen),
            }

        fn = jax.jit(_fill, donate_argnums=(1,))
        self._chunk_fill_cache[key] = fn
        return fn

    def _chunk_last_fn(self, c_bucket: int):
        """Compile the FINAL prefill chunk: one more segment pass, then
        sample token 0 and activate the row (mirrors the tail of
        ``_prefill_fn``). Never the first chunk — monolithic admission
        handles prompts that fit one chunk."""
        if c_bucket in self._chunk_last_cache:
            return self._chunk_last_cache[c_bucket]
        cfg = self.config
        decoder = self.model.decoder
        max_len = self.max_len
        gen_base = self._gen_base
        row_slice, row_scatter = self._row_cache_ops()

        def _last(params, state, chunk, clen, offset, slot, temp, top_p,
                  penalty, max_new):
            dparams = {"params": params}
            row = row_slice(state["caches"], slot)
            valid = (jnp.arange(max_len) < offset)[None, :]
            hidden, row = decoder.apply(
                dparams, chunk, offset,
                jnp.full((1,), offset, jnp.int32), valid, row,
                method="verify_hidden")
            caches = row_scatter(state["caches"], row, slot)
            hidden_last = jax.lax.dynamic_slice(
                hidden, (0, clen - 1, 0), (1, 1, hidden.shape[2]))
            logits0 = decoder.apply(
                dparams, hidden_last, method="logits_at")[0, 0]
            seen_row = state["seen"][slot].at[chunk[0]].max(
                jnp.arange(c_bucket) < clen)
            buf = jax.lax.dynamic_update_slice(
                state["buf"], chunk, (slot, offset))
            return self._activate_row(
                state, caches, buf, slot, logits0, seen_row, offset + clen,
                temp, top_p, penalty, max_new)

        fn = jax.jit(_last, donate_argnums=(1,))
        self._chunk_last_cache[c_bucket] = fn
        return fn

    def _burst_fn(self, steps: int):
        """Compile the N-step decode burst (one dispatch, N tokens/slot)."""
        if steps in self._burst_cache:
            return self._burst_cache[steps]
        cfg = self.config
        decoder = self.model.decoder
        b = self.max_slots
        gen_base = self._gen_base
        iota = jnp.arange(self.max_len)
        rows = jnp.arange(b)

        def _burst(params, state):
            dparams = {"params": params}

            def body(carry):
                i, state, out = carry
                t = state["frontier"]
                valid = iota[None, :] < t[:, None]
                logits, caches = decoder.apply(
                    dparams, state["cur"][:, None], t, t, valid,
                    state["caches"], method="verify")
                logits = _penalize_rows(
                    logits[:, 0], state["seen"], state["penalty"])
                key, sub = jax.random.split(state["key"])
                picked = _sample_rows(
                    logits, sub, state["temp"], state["top_p"])
                alive = state["active"] & ~state["finished"]
                new = jnp.where(alive, picked, cfg.eos_token)
                seen = state["seen"].at[rows, new].max(alive)
                # mirror into the draft/history buffer (next position for
                # an alive row is gen_base + its current gen_count)
                col = gen_base + state["gen_count"]
                old = jnp.take_along_axis(
                    state["buf"], col[:, None], axis=1)[:, 0]
                buf = state["buf"].at[rows, col].set(
                    jnp.where(alive, new, old))
                gen_count = state["gen_count"] + alive
                finished = state["finished"] | (
                    alive & ((new == cfg.eos_token)
                             | (gen_count >= state["max_new"])))
                frontier = t + alive.astype(jnp.int32)
                out = out.at[:, i].set(jnp.where(alive, new, -1))
                state = {**state, "caches": caches, "cur": new, "buf": buf,
                         "seen": seen, "finished": finished,
                         "frontier": frontier, "gen_count": gen_count,
                         "key": key}
                return i + 1, state, out

            def cond(carry):
                i, state, _ = carry
                # early exit once no row is still decoding: a request
                # finishing at step 2 must not pay the other 14 steps,
                # and pending admissions get their slot a burst sooner
                alive = state["active"] & ~state["finished"]
                return (i < steps) & jnp.any(alive)

            out = jnp.full((b, steps), -1, jnp.int32)
            _, state, out = jax.lax.while_loop(
                cond, body, (jnp.int32(0), state, out))
            return state, out

        fn = jax.jit(_burst, donate_argnums=(1,))
        self._burst_cache[steps] = fn
        return fn

    def _spec_burst_fn(self, steps: int):
        """Compile the N-step SPECULATIVE decode burst: each step drafts
        ``draft_k`` tokens per row by prompt-lookup against that row's own
        prompt+generated history, then runs ONE (K+1)-wide ``verify``
        forward for the whole pool — a row whose drafts hit advances by up
        to K+1 tokens for the wall-time of ~1 (decode is weight-HBM-bound,
        so segment width is nearly free), a miss advances by the one
        correction token. Greedy rows remain token-identical to the plain
        burst: each position is sampled from its exact conditional and
        acceptance is equality with the draft.

        Returns ``(state, gen_tokens [B, max_len])`` — the generated
        region of the history buffer; the scheduler slices fresh tokens
        out of it (per-row counts vary, so there is no fixed [B, steps]
        output as in the plain burst)."""
        if steps in self._spec_burst_cache:
            return self._spec_burst_cache[steps]
        cfg = self.config
        decoder = self.model.decoder
        b = self.max_slots
        K = self.draft_k
        ngram = self.model.PLD_NGRAM
        gen_base = self._gen_base
        iota = jnp.arange(self.max_len)
        rows = jnp.arange(b)

        def _burst(params, state):
            dparams = {"params": params}

            def body(carry):
                i, state = carry
                t_cache = state["frontier"]
                t_buf = gen_base + state["gen_count"] - 1
                drafts, _ = _pld_draft(
                    state["buf"], t_buf, state["plen"], gen_base, K, ngram)
                valid = iota[None, :] < t_cache[:, None]
                seg = jnp.concatenate(
                    [state["cur"][:, None], drafts], axis=1)  # [B, K+1]
                logits, caches = decoder.apply(
                    dparams, seg, t_cache, t_cache, valid,
                    state["caches"], method="verify")  # [B, K+1, V]
                drafts_pad = jnp.concatenate(
                    [drafts, jnp.full((b, 1), -1, jnp.int32)], axis=1)
                key, step_key = jax.random.split(state["key"])
                alive0 = state["active"] & ~state["finished"]

                def acc(j, carry):
                    accepting, seen, buf, finished, count, cur = carry
                    lj = jax.lax.dynamic_index_in_dim(
                        logits, j, 1, keepdims=False)
                    lj = _penalize_rows(lj, seen, state["penalty"])
                    g = _sample_rows(
                        lj, jax.random.fold_in(step_key, j),
                        state["temp"], state["top_p"])
                    emit = accepting & alive0 & ~finished
                    col = t_buf + 1 + j
                    old = jnp.take_along_axis(
                        buf, col[:, None], axis=1)[:, 0]
                    buf = buf.at[rows, col].set(jnp.where(emit, g, old))
                    seen = seen.at[rows, g].max(emit)
                    count = count + emit.astype(jnp.int32)
                    cur = jnp.where(emit, g, cur)
                    finished = finished | (emit & (
                        (g == cfg.eos_token)
                        | (state["gen_count"] + count
                           >= state["max_new"])))
                    dj = jax.lax.dynamic_index_in_dim(
                        drafts_pad, j, 1, keepdims=False)
                    accepting = accepting & (g == dj)
                    return accepting, seen, buf, finished, count, cur

                _, seen, buf, finished, count, cur = jax.lax.fori_loop(
                    0, K + 1, acc,
                    (jnp.ones((b,), bool), state["seen"], state["buf"],
                     state["finished"], jnp.zeros((b,), jnp.int32),
                     state["cur"]))
                return i + 1, {**state, "caches": caches, "cur": cur,
                               "buf": buf, "seen": seen,
                               "finished": finished,
                               "frontier": t_cache + count,
                               "gen_count": state["gen_count"] + count,
                               "key": key}

            def cond(carry):
                i, state = carry
                alive = state["active"] & ~state["finished"]
                return (i < steps) & jnp.any(alive)

            _, state = jax.lax.while_loop(
                cond, body, (jnp.int32(0), state))
            return state, jax.lax.dynamic_slice_in_dim(
                state["buf"], gen_base, self.max_len, axis=1)

        fn = jax.jit(_burst, donate_argnums=(1,))
        self._spec_burst_cache[steps] = fn
        return fn

    # ------------------------------------------------------- scheduling

    def submit(self, prompt_ids, max_new_tokens: int = 256,
               temperature: float = 0.0, top_p: float = 1.0,
               repetition_penalty: float = 1.0,
               on_token: Optional[Callable] = None,
               prefix_id: Optional[int] = None) -> Request:
        prompt_ids = np.asarray(prompt_ids, np.int32).reshape(-1)
        if prompt_ids.size == 0:
            raise ValueError("empty prompt")
        if prompt_ids.size > self.prompt_buckets[-1]:
            # token-level contract for direct engine users; the app layer
            # (generation/llm.py) routes over-long prompts to the
            # whole-loop path instead of ever hitting this
            self.stats["truncated_prompts"] += 1
            prompt_ids = prompt_ids[-self.prompt_buckets[-1]:]
        if prefix_id is not None and not self._prefix_usable(
                prefix_id, prompt_ids):
            # the prefix is an optimization: a mismatch (wrong tokens,
            # truncated prompt, no suffix room) falls back to full prefill
            self.stats["prefix_misses"] += 1
            prefix_id = None
        req = Request(
            prompt_ids=prompt_ids, max_new_tokens=int(max_new_tokens),
            temperature=float(temperature), top_p=float(top_p),
            repetition_penalty=float(repetition_penalty),
            on_token=on_token, request_id=next(self._ids),
            prefix_id=prefix_id, submitted_at=time.time())
        restart = False
        with self._lock:
            if self._stop:
                # fail fast: after stop() nothing will ever serve this —
                # blocking the caller into its 600s timeout is worse
                raise RuntimeError("serving engine is stopped")
            self._pending.append(req)
            if self._thread is not None and not self._thread.is_alive():
                # scheduler thread died (should be impossible — loop() is
                # exception-isolated — but a hung caller is the worst
                # failure mode, so self-heal instead of trusting that).
                # Under the lock: concurrent submits must not each spawn
                # a loop (two loops = donated-state corruption).
                self._thread = None
                restart = True
        if restart:
            self.start()
        self._wake.set()
        return req

    def cancel(self, req: Request) -> bool:
        """Stop a request: pending requests never admit; an in-flight one
        is reaped at the next scheduler iteration (its slot frees and its
        row stops burning burst work). Tokens already surfaced stay in
        ``req.tokens``. Returns False if the request already finished.
        The caller's ``result()`` unblocks — check ``req.cancelled``.

        The flag travels WITH the request (not a side id-set), so a
        cancellation survives any scheduler state: pending, mid-swap
        overflow in ``step()``, or occupying a slot."""
        with self._lock:
            if req.finished:
                return False
            req.cancelled = True
            if req in self._pending:
                self._pending.remove(req)
                self._complete(req, slot=None)
        self._wake.set()
        return True

    def _reap_cancelled(self) -> None:
        """Free slots whose request was cancelled (scheduler thread only):
        mark the row finished on-device so bursts stop advancing it. Also
        sweeps ``_pending`` — a cancel() that lands in step()'s swap
        window re-queues the flagged request, and with zero free slots it
        would otherwise sit there (blocking its caller) until a slot
        opened."""
        with self._lock:
            requeued = [r for r in self._pending if r.cancelled]
            for r in requeued:
                self._pending.remove(r)
        for r in requeued:
            self._complete(r, slot=None)
        for slot, req in enumerate(self._slots):
            if req is not None and req.cancelled:
                self._state["finished"] = (
                    self._state["finished"].at[slot].set(True))
                self._complete(req, slot)

    def _free_slots(self) -> List[int]:
        return [i for i, r in enumerate(self._slots) if r is None]

    def _prefix_usable(self, prefix_id: int, prompt_ids: np.ndarray) -> bool:
        pre = self._prefixes.get(prefix_id)
        if pre is None:
            return False
        p_len = pre["plen"]
        slen = prompt_ids.size - p_len
        if slen < 1:
            return False
        if not np.array_equal(prompt_ids[:p_len], pre["tokens"]):
            return False
        head = self.draft_k if self.spec else 0
        if p_len + slen + 1 + head > self.max_len:
            return False
        # a suffix bucket must fit next to the prefix in the prompt
        # buffer — or the suffix must be chunkable
        if any(b >= slen and p_len + b <= self._gen_base
               for b in self.prompt_buckets):
            return True
        c = self._chunk_size_for(slen)
        return bool(c and slen > c
                    and self._chunk_plan(p_len, slen, c) is not None)

    def _admit(self, req: Request, slot: int) -> None:
        if req.prefix_id is not None:
            return self._admit_prefixed(req, slot)
        plen = int(req.prompt_ids.size)
        c = self._chunk_size_for(plen)
        if c and plen > c:
            plan = self._chunk_plan(0, plen, c)
            fits_bucket = any(b >= plen for b in self.prompt_buckets)
            if plan is not None and (not fits_bucket
                                     or not self.chunk_adaptive
                                     or self._live_rows()):
                return self._admit_chunked(req, slot, plan)
            if plan is not None and fits_bucket:
                # adaptive fast path: nothing in flight can stall — one
                # monolithic prefill costs one weight read instead of
                # n_chunks of them (r03: +19% wall, 7x TTFT)
                self.stats["chunk_idle_monolithic"] += 1
        p_bucket = next(b for b in self.prompt_buckets if b >= plen)
        prompt = np.full((1, p_bucket), self.config.eos_token, np.int32)
        prompt[0, :plen] = req.prompt_ids
        # spec bursts write a (K+1)-wide verify segment at the cache
        # frontier — reserve K columns of headroom
        head = self.draft_k if self.spec else 0
        max_new = min(req.max_new_tokens, self.max_len - plen - 1 - head)
        max_new = max(max_new, 1)
        fn = self._prefill_fn(p_bucket)
        self._state, tok0 = fn(
            self.model.params, self._state, jnp.asarray(prompt),
            jnp.int32(plen), jnp.int32(slot),
            jnp.float32(req.temperature), jnp.float32(req.top_p),
            jnp.float32(req.repetition_penalty), jnp.int32(max_new))
        self._post_admit(req, slot, int(tok0), max_new)

    def _admit_prefixed(self, req: Request, slot: int) -> None:
        pre = self._prefixes[req.prefix_id]
        p_len = pre["plen"]
        suffix_ids = req.prompt_ids[p_len:]
        slen = int(suffix_ids.size)
        c = self._chunk_size_for(slen)
        if c and slen > c:
            plan = self._chunk_plan(p_len, slen, c)
            fits_bucket = any(b >= slen and p_len + b <= self._gen_base
                              for b in self.prompt_buckets)
            if plan is not None and (not fits_bucket
                                     or not self.chunk_adaptive
                                     or self._live_rows()):
                # long suffix: seed the row with the cached prefix KV
                # (copies only), then chunk the suffix — otherwise a
                # prefixed admission would re-introduce the monolithic
                # stall chunked prefill exists to bound
                c, n_full, last_off, lsize, cb = plan
                self._state = self._prefix_seed_fn()(
                    self._state, pre["blobs"], pre["padded"],
                    jnp.int32(p_len), jnp.int32(slot))
                self._fill_chunks(
                    np.asarray(suffix_ids, np.int32), slot, p_len,
                    False, n_full, c)
                self.stats["prefix_admits"] += 1
                return self._finish_chunked(
                    req, slot, np.asarray(suffix_ids, np.int32),
                    p_len + slen, last_off, lsize, cb)
            if plan is not None and fits_bucket:
                self.stats["chunk_idle_monolithic"] += 1
        s_bucket = next(b for b in self.prompt_buckets
                        if b >= slen and p_len + b <= self._gen_base)
        suffix = np.full((1, s_bucket), self.config.eos_token, np.int32)
        suffix[0, :slen] = suffix_ids
        head = self.draft_k if self.spec else 0
        total = p_len + slen
        max_new = min(req.max_new_tokens, self.max_len - total - 1 - head)
        max_new = max(max_new, 1)
        fn = self._prefix_admit_fn(s_bucket)
        self._state, tok0 = fn(
            self.model.params, self._state, pre["blobs"], pre["padded"],
            jnp.int32(p_len), jnp.asarray(suffix), jnp.int32(slen),
            jnp.int32(slot), jnp.float32(req.temperature),
            jnp.float32(req.top_p), jnp.float32(req.repetition_penalty),
            jnp.int32(max_new))
        self.stats["prefix_admits"] += 1
        self._post_admit(req, slot, int(tok0), max_new)

    def _chunk_size_for(self, n: int) -> int:
        """Chunk width for an ``n``-token fill: the base ``prefill_chunk``
        when adaptivity is off; otherwise the smallest of {C, 2C, 4C} that
        bounds the admission to ``chunk_max_passes`` passes. Every pass
        re-reads the full weights (decode-grade HBM bill), so many small
        chunks multiply prefill cost — the stall bound degrades gracefully
        (one 2C/4C chunk) only for the longest prompts."""
        C = self.prefill_chunk
        if not C or not self.chunk_adaptive:
            return C
        for c in (C, 2 * C, 4 * C):
            if -(-n // c) <= self.chunk_max_passes:
                return c
        return 4 * C

    def _live_rows(self) -> bool:
        return any(r is not None for r in self._slots)

    def _chunk_plan(self, base: int, n: int, c: int = 0) -> Optional[tuple]:
        """Plan a chunked fill of ``n`` tokens starting at column ``base``
        with chunk width ``c`` (default: the base prefill_chunk):
        (c, n_full, last_off, lsize, last_bucket), or None when no bucket
        fits the final chunk — its padded segment write must stay inside
        ``max_len`` (dynamic_update_slice clamps out-of-range starts,
        which would silently shift the write)."""
        c = c or self.prefill_chunk
        n_full = (n - 1) // c  # final chunk is 1..c tokens
        last_off = base + n_full * c
        lsize = n - n_full * c
        fit = [b for b in (*self.prompt_buckets, c)
               if b >= lsize and last_off + b <= self.max_len]
        if not fit:
            return None
        return c, n_full, last_off, lsize, min(fit)

    def _fill_chunks(self, ids: np.ndarray, slot: int, base: int,
                     first: bool, n_full: int, c: int = 0) -> None:
        """Write ``n_full`` full ``c``-wide chunks of ``ids`` into row
        ``slot`` starting at column ``base``, a decode burst between chunks
        so in-flight streams keep moving. The caller runs the final
        (sampling) chunk."""
        c = c or self.prefill_chunk
        off = base
        for i in range(n_full):
            j = i * c
            chunk = np.asarray(ids[j:j + c], np.int32)[None, :]
            fn = self._chunk_fill_fn(c, first=(first and i == 0))
            self._state = fn(
                self.model.params, self._state, jnp.asarray(chunk),
                jnp.int32(c), jnp.int32(off), jnp.int32(slot))
            off += c
            self._run_burst(self.chunk_burst)

    def _finish_chunked(self, req: Request, slot: int, ids: np.ndarray,
                        total: int, last_off: int, lsize: int,
                        cb: int) -> None:
        chunk = np.full((1, cb), self.config.eos_token, np.int32)
        chunk[0, :lsize] = ids[len(ids) - lsize:]
        head = self.draft_k if self.spec else 0
        max_new = min(req.max_new_tokens, self.max_len - total - 1 - head)
        max_new = max(max_new, 1)
        fn = self._chunk_last_fn(cb)
        self._state, tok0 = fn(
            self.model.params, self._state, jnp.asarray(chunk),
            jnp.int32(lsize), jnp.int32(last_off), jnp.int32(slot),
            jnp.float32(req.temperature), jnp.float32(req.top_p),
            jnp.float32(req.repetition_penalty), jnp.int32(max_new))
        self.stats["chunked_admits"] += 1
        self._post_admit(req, slot, int(tok0), max_new)

    def _admit_chunked(self, req: Request, slot: int, plan: tuple) -> None:
        """Admission in chunk-sized pieces, with a short decode burst
        between pieces so in-flight streams keep moving — the classic
        chunked-prefill trade (Sarathi / vLLM): the arriving request's
        TTFT stretches a little, every running request's inter-token stall
        shrinks to one chunk (the adaptive size caps the total pass count
        so the weight-read bill stays bounded)."""
        ids = req.prompt_ids
        plen = int(ids.size)
        c, n_full, last_off, lsize, cb = plan
        self._fill_chunks(ids, slot, 0, True, n_full, c)
        self._finish_chunked(req, slot, ids, plen, last_off, lsize, cb)

    def _notify(self, req: Request, fresh: List[int]) -> None:
        """on_token is external code running on the scheduler thread — a
        raising callback must cost that request its stream, never the
        engine."""
        if not req.on_token:
            return
        try:
            req.on_token(fresh)
        except Exception:  # noqa: BLE001 — callback fault isolation
            req.on_token = None

    def _post_admit(self, req: Request, slot: int, tok0: int,
                    max_new: int) -> None:
        req.started_at = time.time()
        req.tokens.append(tok0)
        self.stats["prefills"] += 1
        self.stats["tokens_generated"] += 1
        self._notify(req, [tok0])
        if tok0 == self.config.eos_token or max_new <= 1:
            self._complete(req, slot=None)
        else:
            self._slots[slot] = req
            self._taken[slot] = 1

    def _complete(self, req: Request, slot: Optional[int]) -> None:
        # under the (reentrant) lock so cancel()'s finished-check can
        # never interleave with a completion in flight
        with self._lock:
            if req.finished:
                return
            if req.tokens and req.tokens[-1] == self.config.eos_token:
                req.tokens.pop()
            req.finished_at = time.time()
            self.stats["requests_completed"] += 1
            if slot is not None:
                self._slots[slot] = None
            req._done.set()

    def _run_burst(self, steps: Optional[int] = None) -> bool:
        """One decode burst for the occupied slots; surfaces fresh tokens
        and completions. Safe with partially-filled (inactive) rows: their
        masked-out cache writes land at the fill frontier, which the next
        chunk overwrites."""
        steps = steps or self.burst
        active = [i for i, r in enumerate(self._slots) if r is not None]
        if not active:
            return False
        if self.spec:
            fn = self._spec_burst_fn(steps)
            self._state, gen_buf = fn(self.model.params, self._state)
            gen_buf = np.asarray(gen_buf)
        else:
            fn = self._burst_fn(steps)
            self._state, out = fn(self.model.params, self._state)
            out = np.asarray(out)
        gen_count = np.asarray(self._state["gen_count"])
        finished = np.asarray(self._state["finished"])
        for slot in active:
            req = self._slots[slot]
            total = int(gen_count[slot])
            if self.spec:
                # every buffered token in [taken, total) is real
                fresh = [int(t) for t in gen_buf[slot,
                                                 self._taken[slot]:total]]
            else:
                fresh = out[slot, : total - self._taken[slot]]
                # rows emit -1 once dead; only real tokens surface
                fresh = [int(t) for t in fresh if t >= 0]
            if fresh:
                req.tokens.extend(fresh)
                self._taken[slot] = total
                self.stats["tokens_generated"] += len(fresh)
                self._notify(req, fresh)
            if bool(finished[slot]):
                self._complete(req, slot)
        self.stats["bursts"] += 1
        return True

    def _recover_state(self) -> None:
        """A jitted dispatch failed mid-flight: every state fn donates
        ``self._state``, so its buffers may already be invalidated — the
        next touch would raise 'Array has been deleted' forever. Fail the
        in-flight requests (their KV rows are gone), rebuild a clean
        state, and KEEP pending requests (they never touched device
        state). The engine serves again on the next step."""
        for slot, req in enumerate(self._slots):
            if req is not None:
                req.cancelled = True
                self._complete(req, slot)
        self._taken = [0] * self.max_slots
        self._state = self._init_state(self._seed)
        self.stats["engine_resets"] += 1

    def step(self) -> bool:
        """One scheduler iteration: admissions, then one decode burst.
        Returns True if any work was done. On a dispatch failure the
        engine state is rebuilt before the exception propagates, so the
        caller (the exception-isolated scheduler loop, or run_until_idle)
        resumes from a servable engine."""
        if self._state is None:
            # released: recovery must NOT reallocate the freed KV pool
            raise RuntimeError("serving engine is released")
        try:
            return self._step_inner()
        except Exception:
            self._recover_state()
            raise

    def _step_inner(self) -> bool:
        t0 = time.time()
        self._reap_cancelled()
        with self._lock:
            pending, self._pending = self._pending, []
        # re-queue what we cannot admit yet (preserve arrival order)
        free = self._free_slots()
        cap = len(free)
        paced = False
        if (self.admit_pacing and cap > self.admit_pacing_group
                and self._live_rows()):
            # live streams would observe every stacked prefill; admit a
            # small group (one batched-prefill dispatch), let the burst
            # below advance the streams, repeat next step
            cap = self.admit_pacing_group
            paced = True
        admit, overflow = pending[:cap], pending[cap:]
        if overflow:
            with self._lock:
                self._pending = overflow + self._pending
        groups = self._admission_groups(admit, free)
        for gidx, (reqs_g, slots_g) in enumerate(groups):
            live = [(r, s) for r, s in zip(reqs_g, slots_g)
                    if not r.cancelled]
            for req in reqs_g:  # cancelled while overflowed/mid-swap
                if req.cancelled:
                    self._complete(req, slot=None)
            if not live:
                continue
            try:
                if len(live) > 1:
                    self._admit_multi([r for r, _ in live],
                                      [s for _, s in live])
                else:
                    self._admit(*live[0])
            except Exception:
                # the raising group fails fast (a multi dispatch is
                # atomic — its rows can't be told apart); later groups go
                # back to pending instead of vanishing un-admitted
                with self._lock:
                    self._pending = [
                        r for rs, _ in groups[gidx + 1:] for r in rs
                    ] + self._pending
                for req, _ in live:
                    req.cancelled = True
                    self._complete(req, slot=None)
                raise
        # while a paced backlog drains, interleave SHORT bursts (the
        # chunk-interleave length): streams get MORE frequent deliveries
        # (the observed stall is burst-delivery-dominated on hardware —
        # a full 16-step burst gaps streams ~1 s while a prefill is only
        # ~90 ms) and the next admission happens sooner, so pacing stops
        # costing wall. Full bursts resume the step the backlog clears.
        steps = self.chunk_burst if (paced and overflow) else None
        ran = self._run_burst(steps)
        if ran or admit:
            self.stats["busy_s"] += time.time() - t0
        return ran or bool(admit)

    def run_until_idle(self, max_steps: int = 10_000) -> None:
        for _ in range(max_steps):
            with self._lock:
                has_pending = bool(self._pending)
            if not has_pending and not any(self._slots):
                return
            self.step()
        raise RuntimeError("serving engine did not drain")

    def warmup(self) -> Dict[str, Any]:
        """Compile every admission/burst program at boot instead of on the
        first live request — through a remote compiler each new executable
        costs minutes, so a cold serving engine would stall its first
        requests once per prompt bucket. Drives one throwaway request per
        bucket (plus a live streamer so the chunked-prefill interleave
        burst compiles) and cancels the leftovers. Prefix-admission
        programs compile on ``register_prefix``'s first use instead (they
        need a registered prefix to be meaningful)."""
        with self._warm_lock:
            return self._warmup_locked()

    def _warmup_locked(self) -> Dict[str, Any]:
        if self._warmed is not None:
            return self._warmed  # idempotent: repeat /system/warmup calls
            # must not burn accelerator time on throwaway generations

        t0 = time.time()
        vocab = self.config.vocab_size
        small = self.prompt_buckets[0]
        # one prompt per bucket, plus the chunk-policy coverage set (every
        # fill/last executable the adaptive policy can reach — a miss at
        # runtime stalls an admission on a live compile)
        plans = list(self.prompt_buckets) + self._warmup_chunk_plans()
        # submit-and-wait (never step() directly): the background
        # scheduler thread may already be driving the engine. The streamer
        # keeps a row live for the whole pass, so every plan admission
        # takes the CHUNKED path (the adaptive policy chunks exactly when
        # streams are in flight).
        streamer = self.submit(
            [3 + i % 7 for i in range(min(small, 4))],
            max_new_tokens=self.burst * (len(plans) + 6))  # +3 extra
        # bursts of headroom so the paced-drain coverage pass below still
        # has a live stream to pace against
        reqs = []
        for plen in plans:
            ids = [3 + (7 * i) % (vocab - 10) for i in range(plen)]
            reqs.append(self.submit(ids, max_new_tokens=2))
        if self._thread is None:
            self.run_until_idle()
        for r in reqs:
            r.result(timeout=600)
        # paced-drain coverage: the SHORT drain burst (steps=chunk_burst)
        # is its own executable that only runs on a step with
        # (paced AND overflow) — the passes above may never produce one
        # (single-bucket geometries with few plans), and the cold compile
        # read as a 26-37 s stall inside r05's measured stall sections.
        # Force it: a dedicated live pacer stream + pacing-group+1 queued
        # requests make one step admit a paced group and leave overflow.
        if self.admit_pacing and self.max_slots >= self.admit_pacing_group + 2:
            pacer = self.submit([5 + (3 * i) % (vocab - 10)
                                 for i in range(small)],
                                max_new_tokens=self.burst * 6)
            if self._thread is None:
                self.step()  # admit the pacer so the drains see it live
            drains = [
                self.submit([5 + (3 * i) % (vocab - 10)
                             for i in range(small)], max_new_tokens=2)
                for _ in range(self.admit_pacing_group + 1)]
            if self._thread is None:
                self.run_until_idle()
            for r in drains:
                r.result(timeout=600)
            self.cancel(pacer)
            if self._thread is None:
                self.run_until_idle()
        self.cancel(streamer)
        if self._thread is None:
            self.run_until_idle()
        streamer._done.wait(timeout=60)
        # second pass, engine idle, STRICTLY sequential: the adaptive
        # fast path admits monolithically when nothing is live, so every
        # bucket's SINGLE monolithic prefill must be compiled too (with
        # batched admission the first pass may have grouped them away)
        for plen in self.prompt_buckets:
            ids = [3 + (7 * i) % (vocab - 10) for i in range(plen)]
            req = self.submit(ids, max_new_tokens=2)
            if self._thread is None:
                self.run_until_idle()
            req.result(timeout=600)
        # batched-admission executables (smallest bucket; other buckets
        # compile on first use): N same-bucket requests landing on an
        # idle engine admit in one dispatch at sizes {2, 4, 8}
        if self.admit_batch > 1:
            for size in (2, 4, 8):
                if size > min(self.admit_batch, self.max_slots):
                    continue
                batch = [
                    self.submit([3 + (11 * i) % (vocab - 10)
                                 for i in range(small)], max_new_tokens=2)
                    for _ in range(size)]
                if self._thread is None:
                    self.run_until_idle()
                for r in batch:
                    r.result(timeout=600)
        self._warmed = {
            "compiled_buckets": len(self.prompt_buckets),
            "prompt_lengths": plans,
            "chunked": bool(self.prefill_chunk),
            "chunk_adaptive": self.chunk_adaptive,
            "seconds": round(time.time() - t0, 2),
        }
        return self._warmed

    def _warmup_chunk_plans(self) -> List[int]:
        """Prompt lengths that compile every (fill-width, first) and
        final-chunk-bucket executable the chunk policy can reach, derived
        by simulating the policy over representative lengths — so warmup
        coverage can never drift from the policy (a cold executable at
        admission time is a multi-second on-chip stall)."""
        if not self.prefill_chunk:
            return []
        C = self.prefill_chunk
        largest = self.prompt_buckets[-1]
        candidates = sorted({
            min(largest, x)
            for x in (
                [C + cb for cb in (*self.prompt_buckets, C) if cb <= C]
                + [k * C for k in range(2, largest // C + 1)]
                + [k * C + 1 for k in range(1, largest // C + 1)]
                + [k * C + b for b in self.prompt_buckets
                   for k in range(1, 9)]
                + [largest]
            ) if x > C
        })
        seen, plans = set(), []
        for plen in candidates:
            c = self._chunk_size_for(plen)
            if not c or plen <= c:
                continue
            plan = self._chunk_plan(0, plen, c)
            if plan is None:
                continue
            c, n_full, _, _, cb = plan
            keys = {("fill", c, True), ("last", cb)}
            if n_full > 1:
                keys.add(("fill", c, False))
            if not keys <= seen:
                plans.append(plen)
                seen |= keys
        return plans

    # --------------------------------------------------- background mode

    def start(self) -> None:
        with self._lock:
            if self._thread is not None:
                return
            self._stop = False
            self._thread = thread = threading.Thread(
                target=self._loop_holder, name="serving-engine",
                daemon=True)
        thread.start()

    def _loop_holder(self) -> None:
        while not self._stop:
            try:
                with self._lock:
                    has_pending = bool(self._pending)
                if has_pending or any(self._slots):
                    self.step()
                else:
                    self._wake.wait(timeout=0.05)
                    self._wake.clear()
            except Exception as exc:  # noqa: BLE001 — keep serving
                # a dying scheduler thread would strand every slot and
                # hang all future requests; record, back off, continue
                self.last_error = f"{type(exc).__name__}: {exc}"
                self.stats["scheduler_errors"] = (
                    self.stats.get("scheduler_errors", 0) + 1)
                time.sleep(0.1)

    def stop(self) -> None:
        with self._lock:
            self._stop = True
            thread = self._thread
        self._wake.set()
        if thread is not None:
            thread.join(timeout=10)
            if thread.is_alive():
                # still inside a (potentially minutes-long remote-compile)
                # dispatch; it exits when the dispatch returns because
                # _stop is set. Leave _thread in place so start() refuses
                # to spawn a second loop alongside it.
                return
            with self._lock:
                self._thread = None

    def release(self) -> None:
        """Free this engine's device memory (KV state, prefix blobs) NOW
        instead of waiting for Python GC. The engine is permanently
        unusable afterwards — any further submit()/step() raises.

        Exists because the per-engine KV pool is large (slots x max_len x
        layers; ~235 MB at 7B/8 slots, ~1 GB at 32) and a process that
        builds several engines against one chip (benches, A/B drivers,
        engine swap on reconfigure) exhausts HBM long before GC notices:
        the r04 on-chip serving sweep OOMed at 16/32 slots and stalled
        19 min at 8 because seven dead engines still pinned their pools."""
        self.stop()
        with self._lock:
            state, self._state = self._state, None
            prefixes, self._prefixes = self._prefixes, {}
            pending, self._pending = self._pending, []
            slots, self._slots = (list(self._slots),
                                  [None] * self.max_slots)
        for req in pending + [r for r in slots if r is not None]:
            req.cancelled = True
            self._complete(req, slot=None)
        for leaf in jax.tree_util.tree_leaves(
                (state, [p.get("blobs") for p in prefixes.values()])):
            try:
                leaf.delete()
            except Exception:
                pass  # already deleted / non-donatable host constant
