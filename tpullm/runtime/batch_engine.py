"""Multi-slot batched engine: the compute substrate for continuous batching.

Role of the reference server's slot engine (tools/server/server-context.cpp
update_slots + llama_batch across slots): N sequences share one KV cache
([L, n_slots, S, H, D]); each scheduler iteration either prefills one slot's
prompt chunk or decodes one token for every generating slot in a single
batched forward. Idle slots carry offset −1 (cache write masked out).
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFReader
from ..models.registry import get_arch, load_hparams
from .. import tokenizer as tokenizer_mod
from .engine import PREFILL_BUCKETS, PerfCounters
from .kvcache import KVCache, make_cache


class BatchEngine:
    def __init__(
        self,
        model_path,
        *,
        n_slots: int = 4,
        max_seq: int = 2048,
        mode: str = "auto",
        dtype=jnp.bfloat16,
        kv_dtype=jnp.bfloat16,
        prefill_chunk: int = 512,
        mesh=None,  # jax.sharding.Mesh: TP (+ slot-DP) sharded serving
    ):
        from ..utils.compile_cache import enable_persistent_cache

        enable_persistent_cache()
        t0 = time.perf_counter()
        self.reader = GGUFReader(model_path)
        self.hp = load_hparams(self.reader)
        self.arch = get_arch(self.hp.arch)
        self.tokenizer = tokenizer_mod.from_gguf(self.reader)
        self.params = self.arch.build_params(self.reader, self.hp, mode=mode, dtype=dtype)
        self.n_slots = n_slots
        self.max_seq = max_seq
        self.prefill_chunk = min(prefill_chunk, max_seq)
        self.kv_dtype = kv_dtype
        if self.arch.recurrent:
            raise NotImplementedError(
                "recurrent archs are single-stream for now (use Engine)"
            )
        self.cache = make_cache(self.hp, n_slots, max_seq, kv_dtype)
        self.mesh = mesh
        if mesh is not None:
            # mesh-sharded serving (the reference's split-mode row served
            # through server-context has no analogue beyond one node;
            # here GSPMD shards weights over "model" and the slot dim over
            # "data", and the same jitted step runs on N chips)
            from ..parallel import shard_cache, shard_params

            self.params = shard_params(self.params, mesh)
            self.cache = shard_cache(self.cache, mesh, data_batch=True)
        self.n_past = np.zeros(n_slots, dtype=np.int32)
        self.perf = PerfCounters(t_load_s=time.perf_counter() - t0)

        fwd = self.arch.forward
        hp = self.hp

        @functools.partial(jax.jit, donate_argnames=("cache",))
        def _step(params, tokens, positions, cache, offsets):
            return fwd(hp, params, tokens, positions, cache, offsets)

        self._step = _step

    # -- slot lifecycle ----------------------------------------------------------

    def free_slot(self, slot: int):
        self.n_past[slot] = 0

    def prefill_slot(self, slot: int, tokens: list[int]) -> np.ndarray:
        """Feed `tokens` into one slot (chunked to prefill_chunk); returns
        last-token logits [n_vocab]."""
        t0 = time.perf_counter()
        logits_last = None
        idx = 0
        while idx < len(tokens):
            chunk = tokens[idx : idx + self.prefill_chunk]
            logits_last = self._prefill_chunk(slot, chunk)
            idx += len(chunk)
        self.perf.t_prefill_s += time.perf_counter() - t0
        self.perf.n_prefill += len(tokens)
        return logits_last

    def _bucket(self, n: int) -> int:
        for b in PREFILL_BUCKETS:
            if n <= b:
                return min(b, self.max_seq)
        raise ValueError(n)

    def prefill_slot_embeddings(self, slot: int, embds: np.ndarray) -> np.ndarray:
        """Feed precomputed input embeddings [n, E] into one slot
        (multimodal chunks, ≡ llama_batch.embd); returns last logits."""
        t0 = time.perf_counter()
        n = embds.shape[0]
        start = int(self.n_past[slot])
        if start + n > self.max_seq:
            raise ValueError(f"slot {slot} context overflow: {start}+{n}")
        bucket = self._bucket(n)
        E = embds.shape[1]
        buf = np.zeros((self.n_slots, bucket, E), dtype=np.float32)
        buf[slot, :n] = embds
        pos = np.zeros((self.n_slots, bucket), dtype=np.int32)
        pos[slot] = np.arange(start, start + bucket)
        offsets = np.full(self.n_slots, -1, dtype=np.int32)
        offsets[slot] = start
        logits, self.cache = self._step(
            self.params, jnp.asarray(buf), jnp.asarray(pos), self.cache,
            jnp.asarray(offsets),
        )
        self.n_past[slot] = start + n
        self.perf.t_prefill_s += time.perf_counter() - t0
        self.perf.n_prefill += n
        return np.asarray(logits[slot, n - 1])

    def _prefill_chunk(self, slot: int, chunk: list[int]) -> np.ndarray:
        n = len(chunk)
        start = int(self.n_past[slot])
        if start + n > self.max_seq:
            raise ValueError(f"slot {slot} context overflow: {start}+{n}")
        bucket = self._bucket(n)
        toks = np.zeros((self.n_slots, bucket), dtype=np.int32)
        toks[slot, :n] = chunk
        pos = np.zeros((self.n_slots, bucket), dtype=np.int32)
        pos[slot] = np.arange(start, start + bucket)
        offsets = np.full(self.n_slots, -1, dtype=np.int32)
        offsets[slot] = start
        logits, self.cache = self._step(
            self.params, jnp.asarray(toks), jnp.asarray(pos), self.cache,
            jnp.asarray(offsets),
        )
        self.n_past[slot] = start + n
        return np.asarray(logits[slot, n - 1])

    def embed_tokens(self, slot: int, tokens: list[int],
                     pooling: str | None = None,
                     normalize: bool = True) -> np.ndarray:
        """Pooled embedding computed in an idle slot (slot state is consumed
        and freed). ≡ server embeddings endpoint over a borrowed slot."""
        pooling = pooling or (
            self.hp.pooling if self.hp.pooling != "none" else "mean"
        )
        fwd, hp = self.arch.forward, self.hp
        if not hasattr(self, "_hidden_step"):
            @functools.partial(jax.jit, donate_argnames=("cache",))
            def _hidden(params, toks, positions, cache, offsets):
                return fwd(hp, params, toks, positions, cache, offsets,
                           return_hidden=True)

            self._hidden_step = _hidden

        n = len(tokens)
        bucket = self._bucket(n)
        toks = np.zeros((self.n_slots, bucket), dtype=np.int32)
        toks[slot, :n] = tokens
        pos = np.broadcast_to(np.arange(bucket, dtype=np.int32),
                              (self.n_slots, bucket)).copy()
        offsets = np.full(self.n_slots, -1, dtype=np.int32)
        # causal models need a real cache write (throwaway, slot freed after);
        # encoders carry the valid-token count in the offset slot instead
        offsets[slot] = 0 if hp.causal else n
        hidden, self.cache = self._hidden_step(
            self.params, jnp.asarray(toks), jnp.asarray(pos), self.cache,
            jnp.asarray(offsets),
        )
        self.n_past[slot] = 0
        h = np.asarray(hidden[slot, :n])
        if pooling == "mean":
            v = h.mean(axis=0)
        elif pooling == "cls":
            v = h[0]
        elif pooling == "last":
            v = h[-1]
        else:
            raise ValueError(f"unsupported pooling {pooling!r}")
        if normalize:
            v = v / max(np.linalg.norm(v), 1e-12)
        return v

    def decode_batch(self, tokens: dict[int, int]) -> dict[int, np.ndarray]:
        """One decode step for the given {slot: token}; returns {slot: logits}."""
        t0 = time.perf_counter()
        toks = np.zeros((self.n_slots, 1), dtype=np.int32)
        pos = np.zeros((self.n_slots, 1), dtype=np.int32)
        offsets = np.full(self.n_slots, -1, dtype=np.int32)
        for slot, tok in tokens.items():
            toks[slot, 0] = tok
            pos[slot, 0] = self.n_past[slot]
            offsets[slot] = self.n_past[slot]
        logits, self.cache = self._step(
            self.params, jnp.asarray(toks), jnp.asarray(pos), self.cache,
            jnp.asarray(offsets),
        )
        logits = np.asarray(logits[:, 0])
        out = {}
        for slot in tokens:
            self.n_past[slot] += 1
            out[slot] = logits[slot]
        self.perf.t_decode_s += time.perf_counter() - t0
        self.perf.n_decode += len(tokens)
        return out
