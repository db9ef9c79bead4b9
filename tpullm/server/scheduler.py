"""Continuous-batching scheduler (≡ reference server-context.cpp update_slots
+ server-queue.cpp task queue).

One background thread owns the BatchEngine; each iteration admits at most one
queued request into a free slot (chunked prefill) and then decodes one token
for every generating slot in a single batched step. Results stream to
per-request queues consumed by the HTTP layer.
"""

from __future__ import annotations

import itertools
import queue
import threading
import time
from dataclasses import dataclass, field
from enum import Enum

import numpy as np

from ..runtime.batch_engine import BatchEngine
from ..runtime.sampling import Sampler, SamplerParams


class SlotState(Enum):
    IDLE = "idle"
    GENERATING = "generating"


@dataclass
class GenRequest:
    prompt_ids: list[int]
    max_tokens: int = 128
    sampling: SamplerParams = field(default_factory=SamplerParams)
    stop: list[str] = field(default_factory=list)
    grammar: str | None = None  # GBNF text (set from grammar/json_schema params)
    n_probs: int = 0  # top-N logprobs per token (OpenAI logprobs)
    # multimodal: precomputed input embeddings [n, E]; replaces prompt_ids
    # for the prefill (ids still carry the text part for bookkeeping)
    prompt_embds: object = None
    id: int = field(default_factory=itertools.count().__next__)
    # events: ("token", token_id, text) | ("done", finish_reason, stats)
    out: queue.Queue = field(default_factory=queue.Queue)


@dataclass
class _Slot:
    index: int
    state: SlotState = SlotState.IDLE
    request: GenRequest | None = None
    sampler: Sampler | None = None
    n_generated: int = 0
    text: str = ""
    tokens: list = field(default_factory=list)  # prompt + generated ids
    pending_token: int | None = None
    t_start: float = 0.0
    t_first_token: float = 0.0


class Scheduler:
    def __init__(self, engine: BatchEngine):
        self.engine = engine
        self.slots = [_Slot(i) for i in range(engine.n_slots)]
        self.pending: queue.Queue[GenRequest] = queue.Queue()
        self._embed_jobs: queue.Queue = queue.Queue()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._wake = threading.Event()
        # metrics (≡ server_metrics)
        self.n_requests = 0
        self.n_tokens_generated = 0
        self.n_prompt_tokens = 0
        self.n_reused_tokens = 0
        self.n_context_shifts = 0
        self.n_keep = 4  # prompt tokens pinned across context shifts

    # -- public API ---------------------------------------------------------------

    def submit(self, req: GenRequest) -> GenRequest:
        self.n_requests += 1
        self.pending.put(req)
        self._wake.set()
        return req

    def embed(self, tokens: list[int], pooling: str | None = None,
              timeout: float = 300.0) -> np.ndarray:
        """Blocking pooled-embedding call, executed on the scheduler thread
        in a free slot (≡ server embeddings endpoint over a borrowed slot)."""
        job = {"tokens": tokens, "pooling": pooling, "out": queue.Queue()}
        self._embed_jobs.put(job)
        self._wake.set()
        res = job["out"].get(timeout=timeout)
        if isinstance(res, Exception):
            raise res
        return res

    def start(self):
        self._thread = threading.Thread(target=self._run, daemon=True, name="tpullm-sched")
        self._thread.start()

    def stop(self):
        self._stop.set()
        self._wake.set()
        if self._thread:
            self._thread.join(timeout=10)

    def slot_save(self, slot_id: int, path) -> dict:
        """≡ SERVER_TASK_TYPE_SLOT_SAVE (server-task.h:24)."""
        from ..runtime.state import save_slot_state

        s = self.slots[slot_id]
        save_slot_state(self.engine, slot_id, path, tokens=s.tokens)
        return {"id_slot": slot_id, "n_saved": int(self.engine.n_past[slot_id])}

    def slot_restore(self, slot_id: int, path) -> dict:
        from ..runtime.state import load_slot_state

        s = self.slots[slot_id]
        if s.state != SlotState.IDLE:
            raise ValueError(f"slot {slot_id} busy")
        s.tokens = load_slot_state(self.engine, slot_id, path)
        return {"id_slot": slot_id, "n_restored": int(self.engine.n_past[slot_id])}

    def slot_erase(self, slot_id: int) -> dict:
        s = self.slots[slot_id]
        if s.state != SlotState.IDLE:
            raise ValueError(f"slot {slot_id} busy")
        self.engine.free_slot(slot_id)
        s.tokens = []
        return {"id_slot": slot_id, "n_erased": 1}

    def slots_info(self) -> list[dict]:
        return [
            {
                "id": s.index,
                "state": s.state.value,
                "n_past": int(self.engine.n_past[s.index]),
                "n_generated": s.n_generated,
                "request_id": s.request.id if s.request else None,
            }
            for s in self.slots
        ]

    # -- loop -----------------------------------------------------------------------

    def _run(self):
        while not self._stop.is_set():
            did_work = self._iteration()
            if not did_work:
                self._wake.wait(timeout=0.05)
                self._wake.clear()

    def _free_slots(self):
        return [s for s in self.slots if s.state == SlotState.IDLE]

    @staticmethod
    def _common_prefix(a: list, b: list) -> int:
        n = 0
        for x, y in zip(a, b):
            if x != y:
                break
            n += 1
        return n

    def _iteration(self) -> bool:
        did = False
        # embedding jobs run in any idle slot, one per iteration
        if not self._embed_jobs.empty():
            free_e = self._free_slots()
            if free_e:
                try:
                    job = self._embed_jobs.get_nowait()
                except queue.Empty:
                    job = None
                if job is not None:
                    try:
                        v = self.engine.embed_tokens(
                            free_e[0].index, job["tokens"], job["pooling"]
                        )
                        job["out"].put(v)
                    except Exception as e:  # surface to the caller
                        job["out"].put(e)
                    did = True
        # admit one pending request into a free slot (prompt phase)
        free = self._free_slots()
        if free and not self.pending.empty():
            try:
                req = self.pending.get_nowait()
            except queue.Empty:
                req = None
            if req is not None:
                # best-match slot by common prompt prefix (≡ server's
                # launch_slot_with_task similarity selection)
                slot = max(
                    free,
                    key=lambda s: self._common_prefix(s.tokens, req.prompt_ids),
                )
                self._admit(slot, req)
                did = True

        # one batched decode step over generating slots
        gen = {
            s.index: s.pending_token
            for s in self.slots
            if s.state == SlotState.GENERATING and s.pending_token is not None
        }
        if gen:
            logits = self.engine.decode_batch(gen)
            for idx, lg in logits.items():
                self._advance(self.slots[idx], lg)
            did = True
        return did

    def _admit(self, slot: _Slot, req: GenRequest):
        eng = self.engine
        n = len(req.prompt_ids) if req.prompt_embds is None else len(req.prompt_embds)
        if n >= eng.max_seq:
            req.out.put(("done", "context_overflow", {}))
            return
        slot.request = req
        if req.grammar:
            from ..grammar import GrammarConstraint

            constraint = GrammarConstraint.from_tokenizer(
                req.grammar, eng.tokenizer
            )
            slot.sampler = Sampler(
                req.sampling,
                constraint_fn=constraint,
                constraint_accept=constraint.accept,
            )
        else:
            slot.sampler = Sampler(req.sampling)
        slot.n_generated = 0
        slot.text = ""
        slot.t_start = time.perf_counter()
        # prompt-cache reuse (≡ server cache_prompt / n_past common-prefix
        # reuse, server-context.cpp:2206): keep the matching cache prefix and
        # prefill only the new tail. At least one token must be re-fed so the
        # last-position logits exist.
        # cache holds KV only up to n_past (the final sampled token of a
        # finished request was never decoded back in)
        n_common = min(self._common_prefix(slot.tokens, req.prompt_ids), n - 1,
                       int(eng.n_past[slot.index]))
        if n_common > 0:
            eng.n_past[slot.index] = n_common
            tail = req.prompt_ids[n_common:]
            self.n_reused_tokens += n_common
        else:
            eng.free_slot(slot.index)
            tail = req.prompt_ids
        slot.tokens = list(req.prompt_ids)
        self.n_prompt_tokens += n
        if req.prompt_embds is not None:
            eng.free_slot(slot.index)
            slot.tokens = []  # mixed-media prefix is not reusable by ids
            logits = eng.prefill_slot_embeddings(slot.index, req.prompt_embds)
        else:
            logits = eng.prefill_slot(slot.index, tail)
        slot.state = SlotState.GENERATING
        self._advance(slot, logits, first=True)

    def _advance(self, slot: _Slot, logits: np.ndarray, first: bool = False):
        req = slot.request
        sampler = slot.sampler
        token = sampler.sample(logits)
        sampler.accept(token)
        vocab = self.engine.tokenizer.vocab
        if first:
            slot.t_first_token = time.perf_counter()

        if vocab.is_eog(token):
            self._finish(slot, "stop")
            return
        piece = self.engine.tokenizer.detokenize([token])
        slot.text += piece
        slot.tokens.append(token)
        slot.n_generated += 1
        self.n_tokens_generated += 1
        if req.n_probs > 0:
            lp = logits - np.log(np.exp(logits - logits.max()).sum()) - logits.max()
            top = np.argsort(-lp)[: req.n_probs]
            probs = [
                {"id": int(t), "logprob": float(lp[t]),
                 "token": self.engine.tokenizer.detokenize([int(t)])}
                for t in top
            ]
            req.out.put(("token", token, piece,
                         {"logprob": float(lp[token]), "top": probs}))
        else:
            req.out.put(("token", token, piece))

        for stop in req.stop:
            if stop and stop in slot.text:
                self._finish(slot, "stop")
                return
        if slot.n_generated >= req.max_tokens:
            self._finish(slot, "length")
            return
        if int(self.engine.n_past[slot.index]) + 1 >= self.engine.max_seq:
            self._context_shift(slot)
        slot.pending_token = token

    def _context_shift(self, slot: _Slot):
        """StreamingLLM-style shift (≡ server context-shift,
        server-context.cpp:1963): keep n_keep head tokens + the recent half
        of the window, re-prefill the compressed history. The reference
        rotates cached RoPE phases in place; with absolute-slot caches the
        equivalent is recomputing the kept suffix — one prefill per
        half-window of generation."""
        eng = self.engine
        keep = self.n_keep
        half = (eng.max_seq - keep) // 2
        kept = slot.tokens[:keep] + slot.tokens[-half:]
        eng.free_slot(slot.index)
        # the just-sampled token (last of `kept`) is delivered through
        # pending_token on the next decode step — prefilling it here too
        # would write it into the KV cache twice and drift slot.tokens vs
        # cache content by one position per shift
        eng.prefill_slot(slot.index, kept[:-1])
        slot.tokens = list(kept)
        self.n_context_shifts += 1
        self._wake.set()

    def _finish(self, slot: _Slot, reason: str):
        req = slot.request
        now = time.perf_counter()
        stats = {
            "prompt_n": len(req.prompt_ids),
            "predicted_n": slot.n_generated,
            "ttft_ms": round((slot.t_first_token - slot.t_start) * 1e3, 2),
            "total_ms": round((now - slot.t_start) * 1e3, 2),
        }
        req.out.put(("done", reason, stats))
        slot.state = SlotState.IDLE
        slot.request = None
        slot.sampler = None
        slot.pending_token = None
        # slot.tokens and the KV prefix stay for prompt-cache reuse
        self._wake.set()
