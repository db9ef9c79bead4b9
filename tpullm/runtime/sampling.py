"""Sampler chain (reference: src/llama-sampler.cpp).

Round-1 subset: greedy, temperature, top-k, top-p, min-p, repetition/presence/
frequency penalties, seeded RNG. Operates on host numpy logits (decode-step
logits are [n_vocab] — tiny); the in-graph GPU sampler analog (backend
samplers) comes with the serving layer.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class SamplerParams:
    temp: float = 0.8
    top_k: int = 40
    top_p: float = 0.95
    min_p: float = 0.05
    seed: int = 0xFFFFFFFF  # LLAMA_DEFAULT_SEED semantics: random
    penalty_last_n: int = 64
    penalty_repeat: float = 1.0
    penalty_freq: float = 0.0
    penalty_present: float = 0.0

    @property
    def greedy(self) -> bool:
        return self.temp <= 0


@dataclass
class Sampler:
    params: SamplerParams = field(default_factory=SamplerParams)

    def __post_init__(self):
        seed = self.params.seed
        if seed == 0xFFFFFFFF:
            seed = np.random.SeedSequence().entropy & 0xFFFFFFFF
        self.rng = np.random.default_rng(seed)
        self.prev: list[int] = []

    def accept(self, token: int):
        self.prev.append(token)

    def reset(self):
        self.prev.clear()

    def sample(self, logits: np.ndarray) -> int:
        p = self.params
        logits = np.asarray(logits, dtype=np.float32).copy()

        if p.penalty_last_n and (
            p.penalty_repeat != 1.0 or p.penalty_freq or p.penalty_present
        ):
            recent = self.prev[-p.penalty_last_n :]
            if recent:
                ids, counts = np.unique(np.asarray(recent), return_counts=True)
                vals = logits[ids]
                if p.penalty_repeat != 1.0:
                    vals = np.where(vals <= 0, vals * p.penalty_repeat, vals / p.penalty_repeat)
                vals -= p.penalty_freq * counts + p.penalty_present * (counts > 0)
                logits[ids] = vals

        if p.greedy:
            return int(np.argmax(logits))

        if p.top_k > 0 and p.top_k < logits.size:
            kth = np.partition(logits, -p.top_k)[-p.top_k]
            logits[logits < kth] = -np.inf

        logits = logits / max(p.temp, 1e-6)
        logits -= logits.max()
        probs = np.exp(logits)
        probs /= probs.sum()

        if p.min_p > 0:
            probs[probs < p.min_p * probs.max()] = 0.0
            probs /= probs.sum()

        if 0 < p.top_p < 1.0:
            order = np.argsort(-probs)
            csum = np.cumsum(probs[order])
            cutoff = int(np.searchsorted(csum, p.top_p)) + 1
            keep = order[:cutoff]
            mask = np.zeros_like(probs)
            mask[keep] = probs[keep]
            probs = mask / mask.sum()

        return int(self.rng.choice(probs.size, p=probs))
