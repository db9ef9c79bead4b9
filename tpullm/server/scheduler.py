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
    PREFILLING = "prefilling"  # prompt streaming in, one chunk per iteration
    GENERATING = "generating"


@dataclass
class GenRequest:
    prompt_ids: list[int]
    max_tokens: int = 128
    sampling: SamplerParams = field(default_factory=SamplerParams)
    stop: list[str] = field(default_factory=list)
    grammar: str | None = None  # GBNF text (set from grammar/json_schema params)
    # lazy-grammar triggers (≡ grammar_lazy + grammar_triggers in the
    # reference server): [{"type": "word"|"pattern"|"token", "value": ...}].
    # Non-empty → the grammar activates only once a trigger fires.
    grammar_triggers: list = field(default_factory=list)
    n_probs: int = 0  # top-N logprobs per token (OpenAI logprobs)
    # multimodal: precomputed input embeddings [n, E]; replaces prompt_ids
    # for the prefill (ids still carry the text part for bookkeeping)
    prompt_embds: object = None
    # M-RoPE position streams [4, n] + qwen3vl deepstack residuals [k, n, E]
    # accompanying prompt_embds (≡ mtmd helper 4-D positions)
    prompt_positions: object = None
    prompt_deepstack: object = None
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
    prefill_tail: list | None = None  # prompt tokens not yet fed
    speculator: object = None  # per-slot draft proposer (ngram family)
    t_start: float = 0.0
    t_first_token: float = 0.0


class Scheduler:
    def __init__(self, engine: BatchEngine, *, spec_type: str | None = None,
                 draft_engine: BatchEngine | None = None, n_draft: int = 8,
                 cache_reuse: int = 0):
        self.engine = engine
        self.slots = [_Slot(i) for i in range(engine.n_slots)]
        self.pending: queue.Queue[GenRequest] = queue.Queue()
        self._embed_jobs: queue.Queue = queue.Queue()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._wake = threading.Event()
        # in-scheduler speculative decoding (≡ server-context.cpp
        # can_speculate: every slot keeps decoding while drafted tokens are
        # verified in one batched fixed-shape forward)
        self.spec_type = spec_type
        self.draft_engine = draft_engine
        if spec_type == "draft" and draft_engine is None:
            raise ValueError("spec_type=draft requires a draft_engine")
        if draft_engine is not None and spec_type is None:
            self.spec_type = "draft"
        if engine.arch.recurrent and self.spec_type is not None:
            # recurrent/hybrid state absorbs every verified token and cannot
            # roll back a rejected draft (≡ the reference disabling
            # speculation when !llama_kv_cache_can_shift-style rewind holds)
            self.spec_type = None
            self.draft_engine = None
        if self.draft_engine is not None and self.draft_engine.arch.recurrent:
            raise ValueError("recurrent draft models cannot rewind; "
                             "use a KV-cache draft model")
        self.n_draft = max(1, n_draft)
        # --cache-reuse: min chunk length for mid-prompt KV reuse via
        # position shifting (0 = common-prefix reuse only)
        self.cache_reuse = cache_reuse if engine.can_shift else 0
        # metrics (≡ server_metrics)
        self.n_requests = 0
        self.n_tokens_generated = 0
        self.n_prompt_tokens = 0
        self.n_reused_tokens = 0
        self.n_context_shifts = 0
        self.n_spec_drafted = 0
        self.n_spec_accepted = 0
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

    def precompile(self, background: bool = True):
        """Warm every jitted shape the loop can hit (decode, prefill
        buckets, the speculative verify width) so first-request TTFT pays
        tracing only — ≡ the reference server's warmup decode pass."""
        widths = (self.n_draft + 1,) if self.spec_type else ()
        th = self.engine.precompile(widths=widths, background=background)
        if self.draft_engine is not None:
            self.draft_engine.precompile(background=background)
        return th

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
        if self.draft_engine is not None:
            self.draft_engine.free_slot(slot_id)
        s.tokens = []
        s.speculator = None
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
        # admit pending requests into free slots and run their prompt
        # phases JOINTLY — one batched step per chunk round with per-slot
        # offsets (≡ the reference packing several slots' prompt chunks
        # into one llama_batch under the n_batch budget)
        free = self._free_slots()
        while free and not self.pending.empty():
            try:
                req = self.pending.get_nowait()
            except queue.Empty:
                break
            # best-match slot by common prompt prefix (≡ server's
            # launch_slot_with_task similarity selection)
            slot = max(
                free,
                key=lambda s: self._common_prefix(s.tokens, req.prompt_ids),
            )
            free.remove(slot)
            did = True
            tail = self._prepare_admit(slot, req)
            if tail is None and slot.state == SlotState.IDLE:
                # rejected without touching the slot (context overflow):
                # give it back so later queue entries can admit this pass
                free.append(slot)
            if tail is not None:
                if self.engine.arch.recurrent:
                    # recurrent prefills are exact-length/sequential
                    logits = self.engine.prefill_slot(slot.index, tail)
                    slot.state = SlotState.GENERATING
                    self._advance(slot, logits, first=True)
                else:
                    slot.prefill_tail = tail
                    slot.state = SlotState.PREFILLING

        # ONE joint prefill round for slots with prompt still streaming in —
        # interleaved with the decode step below so generating slots keep
        # producing tokens during long admissions (≡ the reference feeding
        # one llama_batch of mixed prompt chunks per update_slots pass)
        pre = {s.index: s for s in self.slots
               if s.state == SlotState.PREFILLING}
        if pre:
            chunk = {idx: s.prefill_tail[: self.engine.prefill_chunk]
                     for idx, s in pre.items()}
            rows = self.engine.prefill_slots_round(chunk)
            for idx, s in pre.items():
                s.prefill_tail = s.prefill_tail[len(chunk[idx]):]
                if not s.prefill_tail:
                    s.prefill_tail = None
                    s.state = SlotState.GENERATING
                    self._advance(s, rows[idx], first=True)
            did = True

        # one batched decode step over generating slots
        gen = {
            s.index: s.pending_token
            for s in self.slots
            if s.state == SlotState.GENERATING and s.pending_token is not None
        }
        if gen:
            if self.spec_type:
                self._speculative_step(gen)
            elif all(self._device_greedy_ok(self.slots[i]) for i in gen):
                # ids-only readback: argmax on device, ~V·4 bytes saved per
                # slot per step (the batched analog of the single-stream
                # engine's on-device sampling)
                ids = self.engine.decode_batch_greedy(gen)
                for idx, tok in ids.items():
                    self._advance_token(self.slots[idx], tok)
            else:
                logits = self.engine.decode_batch(gen)
                for idx, lg in logits.items():
                    self._advance(self.slots[idx], lg)
            did = True
        return did

    @staticmethod
    def _device_greedy_ok(slot: _Slot) -> bool:
        """Argmax-on-device is exact iff no host-side logits transform can
        change the argmax: greedy temp, no penalties/DRY/bias, no grammar
        constraint, and the request doesn't want logprobs."""
        s = slot.sampler
        p = s.params
        return (
            p.greedy
            and p.mirostat == 0
            and not p.logit_bias
            and p.penalty_repeat == 1.0
            and p.penalty_freq == 0.0
            and p.penalty_present == 0.0
            and p.dry_multiplier == 0.0
            and s.constraint_fn is None
            and slot.request.n_probs == 0
        )

    # -- speculative decoding ---------------------------------------------------

    def _speculative_step(self, gen: dict[int, int]):
        """Draft + batched verify for every generating slot (≡ the
        reference's update_slots speculative branch). Slots with no draft
        this round ride the same verify batch with a single token."""
        eng = self.engine
        width = self.n_draft + 1
        # stay clear of the context end: the verify write needs width cache
        # slots and the post-accept step needs one more
        can = {
            idx: pend for idx, pend in gen.items()
            if int(eng.n_past[idx]) + width + 1 < eng.max_seq
        }
        no_room = {idx: pend for idx, pend in gen.items() if idx not in can}
        drafts = self._propose(can) if can else {}
        if not any(drafts.values()):
            logits = eng.decode_batch(gen)
            for idx, lg in logits.items():
                self._advance(self.slots[idx], lg)
            return
        # draft-less slots with room ride the same verify batch (fixed-shape
        # forward: a one-token row costs nothing extra)
        seqs = {idx: [gen[idx]] + drafts.get(idx, [])[: width - 1] for idx in can}
        logits = eng.verify_batch(seqs, width)
        for idx, rows in logits.items():
            self._accept(self.slots[idx], seqs[idx], rows)
        if no_room:  # rare: the last `width` tokens before a context shift
            logits = eng.decode_batch(no_room)
            for idx, lg in logits.items():
                self._advance(self.slots[idx], lg)

    def _propose(self, gen: dict[int, int]) -> dict[int, list[int]]:
        if self.spec_type == "draft":
            return self._propose_draft(gen)
        out = {}
        for idx, pend in gen.items():
            slot = self.slots[idx]
            spec = slot.speculator
            if spec is None:
                from ..runtime.speculative import make_speculator

                spec = slot.speculator = make_speculator(
                    self.spec_type, n_draft=self.n_draft
                )
            # slot.tokens ends with the pending token = the spec contract's
            # "ctx ending in the next token to feed"
            spec.resync(slot.tokens)
            out[idx] = spec.propose(pend, self.n_draft)
        return out

    def _propose_draft(self, gen: dict[int, int]) -> dict[int, list[int]]:
        """Batched greedy draft continuation on the (smaller) draft model:
        k batched draft steps serve every speculating slot at once."""
        d = self.draft_engine
        for idx in gen:
            want = len(self.slots[idx].tokens) - 1  # cache holds ctx[:-1]
            have = int(d.n_past[idx])
            if have > want:
                d.rewind(idx, want)
            elif have < want:
                d.prefill_slot(idx, self.slots[idx].tokens[have:want])
        drafts = {idx: [] for idx in gen}
        cur = dict(gen)
        for _ in range(self.n_draft):
            if any(int(d.n_past[i]) + 1 >= d.max_seq for i in cur):
                break
            logits = d.decode_batch(cur)
            for idx, lg in logits.items():
                t = int(np.argmax(lg))
                drafts[idx].append(t)
                cur[idx] = t
        return drafts

    def _accept(self, slot: _Slot, fed: list[int], logits_rows):
        """Longest-matching-prefix acceptance over one slot's verify rows.
        fed[0] is the committed pending token; fed[1:] are drafts. Row j
        holds the distribution after fed[:j+1]."""
        eng, idx = self.engine, slot.index
        old = int(eng.n_past[idx])
        n_drafted = len(fed) - 1
        n_accepted = 0
        n_valid = 0
        for j in range(len(fed)):
            n_valid = j + 1
            self._advance(slot, logits_rows[j], spec=True)
            if slot.state != SlotState.GENERATING:
                break
            if j + 1 < len(fed) and slot.pending_token == fed[j + 1]:
                n_accepted += 1
                continue
            break
        eng.n_past[idx] = old + n_valid
        self.n_spec_drafted += n_drafted
        self.n_spec_accepted += n_accepted
        if slot.speculator is not None and hasattr(slot.speculator, "accept"):
            slot.speculator.accept(n_accepted)
        # deferred context-shift check (suppressed inside the accept loop
        # where n_past is not yet committed)
        if (slot.state == SlotState.GENERATING
                and int(eng.n_past[idx]) + 1 >= eng.max_seq):
            self._context_shift(slot)

    def _admit(self, slot: _Slot, req: GenRequest):
        """Admit + prefill one request (single-slot path; _iteration batches
        several via _prepare_admit + engine.prefill_slots)."""
        tail = self._prepare_admit(slot, req)
        if tail is None:
            return
        logits = self.engine.prefill_slot(slot.index, tail)
        slot.state = SlotState.GENERATING
        self._advance(slot, logits, first=True)

    def _prepare_admit(self, slot: _Slot, req: GenRequest) -> list[int] | None:
        """Slot bookkeeping for a new request up to (not including) the
        prompt prefill. Returns the token tail still to prefill, or None
        when the request was fully handled here (overflow error, or the
        embeddings-prompt path which prefills inline)."""
        eng = self.engine
        n = len(req.prompt_ids) if req.prompt_embds is None else len(req.prompt_embds)
        if n >= eng.max_seq:
            req.out.put(("done", "context_overflow", {}))
            return None
        slot.request = req
        if req.grammar:
            if req.grammar_triggers:
                import re as _re

                from ..grammar import LazyGrammarConstraint

                patterns, tok_ids = [], []
                for trig in req.grammar_triggers:
                    kind = trig.get("type", "word")
                    val = trig.get("value", "")
                    if kind == "token":
                        tok_ids.append(int(val))
                    elif kind == "word":
                        # ≡ the reference turning WORD triggers into
                        # start-anchored floating patterns with the word
                        # as the capture group
                        patterns.append(r"[\s\S]*?(" + _re.escape(val) + ")")
                    else:  # "pattern" / "pattern_full"
                        patterns.append(str(val))
                constraint = LazyGrammarConstraint.from_tokenizer(
                    req.grammar, eng.tokenizer,
                    trigger_patterns=patterns, trigger_tokens=tok_ids,
                )
            else:
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
        if eng.arch.recurrent and n_common != int(eng.n_past[slot.index]):
            # recurrent state is cumulative at n_past; it can be reused only
            # when the new prompt extends every absorbed token (multi-turn
            # continuation), never truncated to a shorter prefix
            n_common = 0
        n_valid = n_common
        if n_common > 0 and self.cache_reuse > 0 and req.prompt_embds is None:
            n_valid = self._cache_reuse_shift(slot, req.prompt_ids, n_common)
        if n_valid > 0:
            eng.n_past[slot.index] = n_valid
            tail = req.prompt_ids[n_valid:]
            self.n_reused_tokens += n_valid
        else:
            eng.free_slot(slot.index)
            tail = req.prompt_ids
        # speculative state belongs to the previous request; the draft cache
        # keeps only the prefix that still matches the new prompt
        slot.speculator = None
        if self.draft_engine is not None:
            d = self.draft_engine
            d.rewind(slot.index, min(int(d.n_past[slot.index]), n_common))
        slot.tokens = list(req.prompt_ids)
        self.n_prompt_tokens += n
        if req.prompt_embds is not None:
            eng.free_slot(slot.index)
            slot.tokens = []  # mixed-media prefix is not reusable by ids
            logits = eng.prefill_slot_embeddings(
                slot.index, req.prompt_embds,
                positions=req.prompt_positions,
                deepstack=req.prompt_deepstack)
            slot.state = SlotState.GENERATING
            self._advance(slot, logits, first=True)
            return None
        return tail

    def _cache_reuse_shift(self, slot: _Slot, prompt: list[int],
                           n_common: int) -> int:
        """Mid-prompt KV reuse by hole punching (≡ server --cache-reuse,
        server-context.cpp:2228-2271): past the common prefix, cached chunks
        of ≥ cache_reuse tokens that reappear later in the new prompt are
        compacted leftward (K re-rotated by the position delta) instead of
        recomputed. Returns the new count of valid cache rows."""
        eng, idx_slot = self.engine, slot.index
        old = slot.tokens
        n_cache = min(len(old), int(eng.n_past[idx_slot]))
        n = len(prompt)
        S = eng.max_seq
        idx = np.arange(S, dtype=np.int32)
        delta = np.zeros(S, dtype=np.int32)
        head_c = head_p = n_common
        moved = False
        while head_c < n_cache and head_p < n - 1:
            n_match = 0
            while (head_c + n_match < n_cache and head_p + n_match < n
                   and old[head_c + n_match] == prompt[head_p + n_match]):
                n_match += 1
            if n_match >= self.cache_reuse:
                # at least the final prompt token must be re-fed for logits
                used = min(n_match, n - 1 - head_p)
                idx[head_p:head_p + used] = np.arange(head_c, head_c + used)
                delta[head_p:head_p + used] = head_p - head_c
                moved = moved or head_p != head_c
                head_c += used
                head_p += used
            else:
                head_c += 1
        if moved:
            eng.shift_slot(idx_slot, idx, delta)
        return head_p

    def _advance(self, slot: _Slot, logits: np.ndarray, first: bool = False,
                 spec: bool = False):
        token = slot.sampler.sample(logits)
        self._advance_token(slot, token, logits=logits, first=first,
                            spec=spec)

    def _advance_token(self, slot: _Slot, token: int,
                       logits: np.ndarray | None = None,
                       first: bool = False, spec: bool = False):
        """Post-sample bookkeeping for one generated token; `logits` is None
        on the device-greedy path (only eligible when n_probs == 0)."""
        req = slot.request
        sampler = slot.sampler
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
        # inside a speculative accept run n_past is not yet committed;
        # _accept re-checks the shift once the commit lands
        if (not spec
                and int(self.engine.n_past[slot.index]) + 1 >= self.engine.max_seq):
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
        # the draft cache no longer matches the compressed history; ngram
        # speculators re-align via prefix-safe resync on the next propose
        if self.draft_engine is not None:
            self.draft_engine.free_slot(slot.index)
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
