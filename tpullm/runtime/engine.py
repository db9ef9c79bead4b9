"""Single-context inference engine: model load, bucketed prefill, decode loop.

Role of the reference's llama_context decode path (src/llama-context.cpp:1469)
re-thought for XLA: instead of building a ggml graph per ubatch, we jit two
fixed-shape programs — a prefill per (batch, seq-bucket) and a T=1 decode
step — and reuse them for the whole session. The KV cache is a donated
fixed-shape array, so decode steps run without host↔device traffic beyond
one token in / one row of logits out.
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFReader
from ..models.registry import get_arch, load_hparams
from ..runtime.kvcache import KVCache
from ..runtime.sampling import Sampler, SamplerParams
from .. import tokenizer as tokenizer_mod

PREFILL_BUCKETS = (32, 64, 128, 256, 512, 1024, 2048, 4096, 8192)

# jitted step functions shared across Engine instances of the same model
# config, so a second context over the same weights reuses compiled programs
_STEP_CACHE: dict = {}


def _get_step(fwd, hp):
    key = (fwd, repr(hp))
    step = _STEP_CACHE.get(key)
    if step is None:
        @functools.partial(jax.jit, donate_argnames=("cache",))
        def step(params, tokens, positions, cache, offset):
            return fwd(hp, params, tokens, positions, cache, offset)

        _STEP_CACHE[key] = step
    return step


@dataclass
class PerfCounters:
    """≡ llama_perf_context (llama.h:1519)."""

    t_load_s: float = 0.0
    t_prefill_s: float = 0.0
    n_prefill: int = 0
    t_decode_s: float = 0.0
    n_decode: int = 0

    def report(self) -> str:
        pp = self.n_prefill / self.t_prefill_s if self.t_prefill_s else 0.0
        tg = self.n_decode / self.t_decode_s if self.t_decode_s else 0.0
        return (
            f"load {self.t_load_s:.2f}s | prompt {self.n_prefill} tok "
            f"{pp:.1f} t/s | gen {self.n_decode} tok {tg:.1f} t/s"
        )


class Engine:
    def __init__(
        self,
        model_path,
        *,
        mode: str = "auto",
        dtype=jnp.bfloat16,
        max_seq: int = 2048,
        batch: int = 1,
        kv_dtype=jnp.bfloat16,
    ):
        t0 = time.perf_counter()
        self.reader = GGUFReader(model_path)
        self.hp = load_hparams(self.reader)
        self.arch = get_arch(self.hp.arch)
        self.tokenizer = tokenizer_mod.from_gguf(self.reader)
        self.params = self.arch.build_params(self.reader, self.hp, mode=mode, dtype=dtype)
        self.max_seq = max_seq
        self.batch = batch
        self.kv_dtype = kv_dtype
        self.cache = KVCache.new(self.hp, batch, max_seq, kv_dtype)
        self.n_past = 0
        self.perf = PerfCounters(t_load_s=time.perf_counter() - t0)

        self._step = _get_step(self.arch.forward, self.hp)

    # -- core ops ---------------------------------------------------------------

    def reset(self):
        self.n_past = 0

    def _bucket(self, n: int) -> int:
        for b in PREFILL_BUCKETS:
            if n <= b:
                return min(b, self.max_seq)
        raise ValueError(f"prompt of {n} tokens exceeds max bucket")

    def prefill(self, tokens: list[int]) -> np.ndarray:
        """Feed prompt tokens; returns logits of the last token [n_vocab]."""
        t0 = time.perf_counter()
        n = len(tokens)
        if self.n_past + n > self.max_seq:
            raise ValueError(f"context overflow: {self.n_past}+{n} > {self.max_seq}")
        bucket = self._bucket(n)
        toks = np.zeros((self.batch, bucket), dtype=np.int32)
        toks[0, :n] = tokens
        pos = np.arange(self.n_past, self.n_past + bucket, dtype=np.int32)
        pos = np.broadcast_to(pos, (self.batch, bucket))
        logits, self.cache = self._step(
            self.params, jnp.asarray(toks), jnp.asarray(pos), self.cache,
            jnp.int32(self.n_past),
        )
        out = np.asarray(logits[0, n - 1])
        self.n_past += n
        self.perf.t_prefill_s += time.perf_counter() - t0
        self.perf.n_prefill += n
        return out

    def decode_step(self, token: int) -> np.ndarray:
        """Feed one token; returns next-token logits [n_vocab]."""
        t0 = time.perf_counter()
        toks = jnp.full((self.batch, 1), token, dtype=jnp.int32)
        pos = jnp.full((self.batch, 1), self.n_past, dtype=jnp.int32)
        logits, self.cache = self._step(
            self.params, toks, pos, self.cache, jnp.int32(self.n_past)
        )
        out = np.asarray(logits[0, 0])
        self.n_past += 1
        self.perf.t_decode_s += time.perf_counter() - t0
        self.perf.n_decode += 1
        return out

    # -- generation --------------------------------------------------------------

    def generate_tokens(
        self,
        prompt_tokens: list[int],
        max_new_tokens: int = 128,
        sampler: Sampler | None = None,
        stop_on_eog: bool = True,
    ):
        """Yields generated token ids."""
        sampler = sampler or Sampler(SamplerParams(temp=0.0))
        logits = self.prefill(prompt_tokens)
        vocab = self.tokenizer.vocab
        for _ in range(max_new_tokens):
            token = sampler.sample(logits)
            sampler.accept(token)
            if stop_on_eog and vocab.is_eog(token):
                return
            yield token
            if self.n_past >= self.max_seq:
                return
            logits = self.decode_step(token)

    def generate(
        self,
        prompt: str,
        max_new_tokens: int = 128,
        sampler: Sampler | None = None,
        add_special: bool = True,
        parse_special: bool = True,
    ) -> str:
        ids = self.tokenizer.tokenize(prompt, add_special=add_special, parse_special=parse_special)
        out = list(self.generate_tokens(ids, max_new_tokens, sampler))
        return self.tokenizer.detokenize(out)
