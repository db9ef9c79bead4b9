"""Speculative decoding: draft-model and n-gram speculators + verify loop.

Reference: common/speculative.cpp (strategies draft-model, ngram_simple,
ngram_map — speculative.cpp:21-39) and the server's speculative branch
(server-context.cpp update_slots can_speculate path).

XLA-native twist: verification of k draft tokens is ONE fixed-shape forward
(a small prefill bucket), so a round costs one draft-chain + one target pass
regardless of how many tokens are accepted. Cache rollback is free: the KV
cache is a ring of absolute slots, so rejecting tokens just rewinds n_past —
the next forward overwrites the stale slots before any query can attend them.

Speculator contract:
  resync(ctx)       — bring internal state to "has processed ctx[:-1]";
                      ctx is the authoritative token list ending in the next
                      token to feed (cur)
  propose(cur, max) — return up to `max` draft tokens continuing ctx
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .engine import Engine
from .sampling import Sampler, SamplerParams


class DraftModelSpeculator:
    """Greedy draft continuation from a (smaller) second model."""

    def __init__(self, engine: Engine, n_draft: int = 5):
        self.engine = engine
        self.n_draft = n_draft

    def resync(self, ctx: list[int]):
        """Cache must hold exactly ctx[:-1]. Rolling n_past back is safe (the
        accepted prefix in the cache matches ctx); missing tokens are fed."""
        want = len(ctx) - 1
        if self.engine.n_past > want:
            self.engine.n_past = want
        elif self.engine.n_past < want:
            self.engine.prefill(list(ctx[self.engine.n_past : want]))

    def propose(self, cur: int, max_tokens: int) -> list[int]:
        k = min(self.n_draft, max_tokens)
        if k <= 0:
            return []
        logits = self.engine.prefill([cur])
        out = []
        for _ in range(k):
            t = int(np.argmax(logits))
            out.append(t)
            if len(out) < k:
                logits = self.engine.decode_step(t)
        return out


class NgramSpeculator:
    """Prompt/self n-gram lookup (≡ ngram_simple/ngram_map): propose the
    continuation that followed the most recent occurrence of the current
    n-gram suffix in the context. Draft-model-free speculation for
    self-repetitive text (code, structured output)."""

    def __init__(self, n: int = 3, n_draft: int = 5, n_min: int = 1):
        self.n = n
        self.n_min = n_min
        self.n_draft = n_draft
        self.history: list[int] = []
        self.maps: dict[int, dict[tuple, int]] = {k: {} for k in range(n_min, n + 1)}

    def _observe(self, tokens: list[int]):
        for t in tokens:
            h = self.history
            for k in range(self.n_min, self.n + 1):
                if len(h) >= k:
                    self.maps[k][tuple(h[-k:])] = t
            h.append(t)

    def resync(self, ctx: list[int]):
        want = list(ctx[:-1])
        if len(self.history) > len(want):
            # rejected drafts were never observed, so this only trims cur
            del self.history[len(want):]
        missing = want[len(self.history):]
        self._observe(missing)

    def propose(self, cur: int, max_tokens: int) -> list[int]:
        sim = self.history + [cur]
        out: list[int] = []
        for _ in range(min(self.n_draft, max_tokens)):
            nxt = None
            for k in range(self.n, self.n_min - 1, -1):  # longest match first
                if len(sim) >= k:
                    nxt = self.maps[k].get(tuple(sim[-k:]))
                    if nxt is not None:
                        break
            if nxt is None:
                break
            out.append(nxt)
            sim.append(nxt)
        return out


@dataclass
class SpecStats:
    n_rounds: int = 0
    n_drafted: int = 0
    n_accepted: int = 0
    n_generated: int = 0

    @property
    def accept_rate(self) -> float:
        return self.n_accepted / self.n_drafted if self.n_drafted else 0.0


def generate_speculative(
    target: Engine,
    speculator,
    prompt_tokens: list[int],
    max_new_tokens: int = 128,
    sampler: Sampler | None = None,
    stop_on_eog: bool = True,
) -> tuple[list[int], SpecStats]:
    """Verify-accept loop (≡ the reference's draft+decode+accept cycle).

    Works with any sampler; a drafted token is accepted iff the sampler,
    applied to the target logits at that position, yields the same id
    (exact-match acceptance, the reference's default)."""
    sampler = sampler or Sampler(SamplerParams(temp=0.0))
    stats = SpecStats()
    vocab = target.tokenizer.vocab
    out: list[int] = []
    prompt_tokens = list(prompt_tokens)

    logits = target.prefill(prompt_tokens)
    cur = sampler.sample(logits)
    sampler.accept(cur)
    if stop_on_eog and vocab.is_eog(cur):
        return out, stats
    out.append(cur)

    def ctx():
        return prompt_tokens + out

    while len(out) < max_new_tokens:
        budget = max_new_tokens - len(out)
        speculator.resync(ctx())
        drafts = speculator.propose(cur, budget - 1) if budget > 1 else []
        stats.n_rounds += 1
        stats.n_drafted += len(drafts)

        seq = [cur] + drafts
        if target.n_past + len(seq) >= target.max_seq:
            break
        all_logits = target.prefill_all_logits(seq)

        n_accept = 0
        done = False
        mismatch_tok = None  # the corrective token on draft rejection
        for i, d in enumerate(drafts):
            t = sampler.sample(all_logits[i])
            if t != d:
                mismatch_tok = t
                break
            sampler.accept(t)
            n_accept += 1
            if stop_on_eog and vocab.is_eog(t):
                done = True
                break
            out.append(t)
            if len(out) >= max_new_tokens:
                done = True
                break
        stats.n_accepted += n_accept
        # rewind the target cache past the rejected tail
        target.n_past -= len(drafts) - n_accept
        if done:
            break

        # corrective (mismatch) or bonus (all accepted) token
        nxt = mismatch_tok if mismatch_tok is not None else sampler.sample(
            all_logits[n_accept]
        )
        sampler.accept(nxt)
        if stop_on_eog and vocab.is_eog(nxt):
            break
        out.append(nxt)
        cur = nxt
    stats.n_generated = len(out)
    return out, stats
