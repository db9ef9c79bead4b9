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
        from ..utils.platform import honor_jax_platforms

        honor_jax_platforms()
        enable_persistent_cache()
        t0 = time.perf_counter()
        from .model import Model

        self._shared_model = isinstance(model_path, Model)
        if self._shared_model:
            # shared llama_model (runtime/model.py): reuse the
            # device-resident params; this engine is one llama_context
            mdl = model_path
            if mode != "auto":
                mdl.check_compatible(mode, dtype)
            self.reader = mdl.reader
            self.hp = mdl.hp
            self.arch = mdl.arch
            self.tokenizer = mdl.tokenizer
        else:
            self.reader = GGUFReader(model_path)
            self.hp = load_hparams(self.reader)
            self.arch = get_arch(self.hp.arch)
            self.tokenizer = tokenizer_mod.from_gguf(self.reader)
        self.n_slots = n_slots
        self.max_seq = max_seq
        self.prefill_chunk = min(prefill_chunk, max_seq)
        self.kv_dtype = kv_dtype
        self._pipe = mesh is not None and "pipe" in getattr(
            mesh, "axis_names", ())
        if self._pipe:
            # layer-split serving: the same scheduler contract
            # (tokens/positions/cache/offsets step) backed by the pipeline
            # SPMD program — ≡ the reference server over a --split-mode
            # layer model (src/llama-model.cpp:2616 + update_slots)
            self.mesh = mesh
            self._init_pipeline(mesh, dtype, mode)
            self.n_past = np.zeros(n_slots, dtype=np.int32)
            self.rope_delta = np.zeros(n_slots, dtype=np.int32)
            self.perf = PerfCounters(t_load_s=time.perf_counter() - t0)
            return
        if self._shared_model:
            # fuse on the Model (once) for single-chip contexts; mesh
            # engines take the unfused names (fusing would donate the
            # Model's arrays)
            self.params = (model_path.fused() if mesh is None
                           else model_path.params)
            if mesh is not None and model_path._fused:
                raise ValueError(
                    "Model already fused by a plain engine; load a "
                    "separate Model for mesh use")
        else:
            from ..models.weights import (drop_unconsumed_planes,
                                          prewarm_quant_planes)

            prewarm_quant_planes(self.reader, mode)
            self.params = self.arch.build_params(
                self.reader, self.hp, mode=mode, dtype=dtype)
            drop_unconsumed_planes(self.reader)
            from ..models.weights import maybe_fuse_llama

            self.params = maybe_fuse_llama(self.arch, self.params, mesh)
        if self.arch.make_cache is not None:
            self.cache = self.arch.make_cache(self.hp, n_slots, max_seq, kv_dtype)
        elif (
            self.arch.iswa
            and self.hp.sliding_window > 0
            and not isinstance(kv_dtype, str)
            and max_seq > self.hp.sliding_window
        ):
            # iSWA dual cache in the serving engine (≡ the reference server
            # running llama_kv_cache_unified_iswa models,
            # src/llama-kv-cache-iswa.h:14-79): SWA layers share a ring
            from .kvcache import SWACache

            self.cache = SWACache.new(
                self.hp, n_slots, max_seq, kv_dtype,
                max_chunk=self.prefill_chunk,
            )
        else:
            self.cache = make_cache(self.hp, n_slots, max_seq, kv_dtype)
        if not hasattr(self.cache, "batch") or self.cache.batch != n_slots:
            # non-incremental archs (diffusion canvases) have no slot axis
            raise NotImplementedError(
                f"{self.hp.arch} has no per-slot cache; use the "
                "single-stream Engine"
            )
        if self.arch.recurrent and mesh is not None:
            from ..parallel.mesh import MODEL_AXIS as _TP_AXIS

            tp_ways = (mesh.shape[_TP_AXIS]
                       if _TP_AXIS in mesh.axis_names else 1)
            if tp_ways > 1:
                raise NotImplementedError(
                    "recurrent archs serve with --dp (state shards over "
                    "slots); tp>1 needs arch-specific inner-state sharding"
                )
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
        # per-slot rope-position offset relative to the cache slot count:
        # nonzero after M-RoPE image grids compress the position counter
        # (≡ llama.cpp mrope_position_delta per sequence)
        self.rope_delta = np.zeros(n_slots, dtype=np.int32)
        self.perf = PerfCounters(t_load_s=time.perf_counter() - t0)

        fwd = self.arch.forward
        hp = self.hp

        if self.arch.recurrent:
            # recurrent forwards carry whole-batch state and ignore the
            # offsets mask; restore idle slots' rows after each step so a
            # prefill for one slot can't clobber the others' conv/ssm/wkv
            # state (every recurrent-family cache leaf is [L, B, ...])
            @functools.partial(jax.jit, donate_argnames=("cache",))
            def _step(params, tokens, positions, cache, offsets):
                logits, new = fwd(hp, params, tokens, positions, cache, offsets)
                act = offsets >= 0  # [B]

                def keep_idle(n, o):
                    m = act.reshape((1, -1) + (1,) * (n.ndim - 2))
                    return jnp.where(m, n, o)

                return logits, jax.tree.map(keep_idle, new, cache)
        else:
            @functools.partial(jax.jit, donate_argnames=("cache",))
            def _step(params, tokens, positions, cache, offsets):
                return fwd(hp, params, tokens, positions, cache, offsets)

        self._step = _step

        from .engine import _get_prefill_step

        # last-row-only lm_head for prefill chunks (≡ llama_batch.logits
        # flagging just the final prompt token); recurrent forwards ignore
        # offsets per-row so they keep the plain step
        self._prefill_step = (
            None if self.arch.recurrent else _get_prefill_step(fwd, hp)
        )

    def _init_pipeline(self, mesh, dtype, mode):
        from ..parallel.pipeline import MODEL_AXIS, PIPE_AXIS
        from ..parallel.pipeline_infer import (
            load_stacked_serving,
            make_pipeline_step,
            make_stacked_cache,
        )

        hp = self.hp
        pp = mesh.shape[PIPE_AXIS]
        tp = mesh.shape[MODEL_AXIS]
        from ..models import deepseek2 as _ds2

        from ..models import jamba as _jamba

        mla = (self.arch.forward is _ds2.forward
               and _ds2.mla_absorbed(hp))
        hybrid = self.arch.forward in (_jamba.forward,
                                       _jamba.forward_falcon_h1)
        if not mla and not hybrid and (self.arch.recurrent
                                       or self.arch.make_cache is not None):
            raise NotImplementedError(
                f"{hp.arch}: pipeline serving needs a plain positional KV "
                "cache"
            )
        if isinstance(self.kv_dtype, str):
            # float-name strings from --kv-type normalize to dtypes here
            # (make_cache does this on the non-pipe path); only q8_0 stays
            # a string = quantized stage cache
            named = {"f16": jnp.float16, "bf16": jnp.bfloat16,
                     "f32": jnp.float32, "q8": "q8_0"}
            self.kv_dtype = named.get(self.kv_dtype, self.kv_dtype)
            if isinstance(self.kv_dtype, str) and self.kv_dtype != "q8_0":
                raise NotImplementedError(
                    f"pipe KV dtype {self.kv_dtype!r} (q8_0 or a float "
                    "dtype)"
                )
        if self.n_slots % pp:
            raise ValueError(
                f"n_slots {self.n_slots} must be divisible by pp {pp} "
                "(slots are the microbatch dimension)"
            )
        if hp.n_head % tp or (tp > 1 and hp.n_head_kv % tp):
            raise ValueError(
                f"heads ({hp.n_head}/{hp.n_head_kv}) must divide tp {tp}"
            )
        if mla:
            from ..parallel.pipeline_infer import (
                load_mla_stacked_serving,
                make_mla_pipeline_step,
                make_mla_stacked_cache,
            )

            self.params, self._qmeta, _ = load_mla_stacked_serving(
                self.reader, hp, mesh, dtype=dtype, mode=mode)
            self.cache = make_mla_stacked_cache(
                hp, self.n_slots, self.max_seq, mesh, dtype=self.kv_dtype)
            self._step = make_mla_pipeline_step(hp, mesh, self.params,
                                                qmeta=self._qmeta)
            self._prefill_step = make_mla_pipeline_step(
                hp, mesh, self.params, qmeta=self._qmeta, last_only=True)
            return
        if hybrid:
            # nemotron-h / granite-hybrid: union-stacked layers with
            # per-layer kind dispatch, stage-resident KV + conv/ssm state
            from ..parallel.pipeline_hybrid import (
                load_hybrid_stacked_serving,
                make_hybrid_pipeline_step,
                make_hybrid_stacked_cache,
            )

            self.params, _ = load_hybrid_stacked_serving(
                self.reader, hp, mesh, dtype=dtype, mode=mode)
            self._qmeta = {}
            self.cache = make_hybrid_stacked_cache(
                hp, self.n_slots, self.max_seq, mesh, dtype=self.kv_dtype)
            self._step = make_hybrid_pipeline_step(hp, mesh, self.params)
            self._prefill_step = make_hybrid_pipeline_step(
                hp, mesh, self.params, last_only=True)
            return
        try:
            self.params, self._qmeta, _ = load_stacked_serving(
                self.reader, hp, mesh, dtype=dtype, mode=mode)
        except KeyError as e:
            raise NotImplementedError(
                f"{hp.arch}: pipeline serving covers the plain llama "
                f"family (missing weight {e})"
            ) from None
        self.cache = make_stacked_cache(hp, self.n_slots, self.max_seq,
                                        mesh, dtype=self.kv_dtype)
        quant_kv = isinstance(self.kv_dtype, str)
        from ..parallel.pipeline_infer import step_flags

        flags = step_flags(self.params["stack"], hp)
        qmeta = self._qmeta
        self._step = make_pipeline_step(hp, mesh, qmeta, quant_kv=quant_kv,
                                        **flags)
        self._prefill_step = make_pipeline_step(
            hp, mesh, qmeta, last_only=True, quant_kv=quant_kv, **flags)

    def precompile(self, widths: tuple = (), background: bool = False):
        """Compile the batched step for every token-shape the scheduler can
        issue — decode [B,1], each prefill bucket up to prefill_chunk, and
        any speculative-verify widths — so the first request's TTFT pays
        tracing only (the persistent XLA cache then serves the binaries).
        ≡ the reference server's startup warmup decode. Returns the worker
        thread when background=True."""

        def _widths():
            # (width, use_prefill_variant): decode + speculative-verify
            # widths run the full step, prefill buckets the last-row-head one
            yield 1, False
            for w in widths:
                yield w, False
            if not self.arch.recurrent:  # recurrent prefills are exact-length
                for b in PREFILL_BUCKETS:
                    if b > min(self.prefill_chunk, self.max_seq):
                        break
                    yield b, self._prefill_step is not None

        def _sds(t):
            return jax.tree.map(
                lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype,
                                               sharding=a.sharding), t
            )

        def _run():
            p, c = _sds(self.params), _sds(self.cache)
            offs = jax.ShapeDtypeStruct((self.n_slots,), jnp.int32)
            n_last = jax.ShapeDtypeStruct((self.n_slots,), jnp.int32)
            for t, use_prefill in _widths():
                toks = jax.ShapeDtypeStruct((self.n_slots, t), jnp.int32)
                pos = jax.ShapeDtypeStruct((self.n_slots, t), jnp.int32)
                try:
                    if use_prefill:
                        self._prefill_step.lower(
                            p, toks, pos, c, offs, n_last).compile()
                    else:
                        self._step.lower(p, toks, pos, c, offs).compile()
                        if t == 1:  # greedy ids-only decode (the scheduler's
                            # default path for temp=0 traffic)
                            self._ensure_greedy_step().lower(
                                p, toks, pos, c, offs).compile()
                except Exception:  # never take the server down from warmup
                    import logging

                    logging.getLogger(__name__).exception(
                        "precompile failed for token width %d", t
                    )

        if background:
            import threading

            th = threading.Thread(target=_run, daemon=True,
                                  name="tpullm-precompile")
            th.start()
            return th
        _run()
        return None

    # -- slot lifecycle ----------------------------------------------------------

    def free_slot(self, slot: int):
        self.n_past[slot] = 0
        self.rope_delta[slot] = 0
        from .kvcache import SWACache

        if isinstance(self.cache, SWACache):
            # positional KV rows are invalidated by offsets alone, but ring
            # slot positions must be marked empty or a new request would
            # attend the previous tenant's window
            self.cache = self._reset_fn(self.cache, jnp.int32(slot))
        elif self.arch.recurrent:
            # recurrent state is cumulative — a freed slot starts from zero
            self.cache = self._reset_fn(self.cache, jnp.int32(slot))

    @functools.cached_property
    def _reset_fn(self):
        from .kvcache import SWACache

        @functools.partial(jax.jit, donate_argnames=("cache",))
        def _reset(cache, slot):
            if isinstance(cache, SWACache):
                return SWACache(
                    cache.full_k, cache.full_v, cache.swa_k, cache.swa_v,
                    cache.slot_pos.at[slot].set(-1),
                    cache.layer_map, cache.window,
                )
            return jax.tree.map(
                lambda a: a.at[:, slot].set(0) if a.ndim >= 2 else a, cache
            )

        return _reset

    def prefill_slot(self, slot: int, tokens: list[int]) -> np.ndarray:
        """Feed `tokens` into one slot (chunked to prefill_chunk); returns
        last-token logits [n_vocab]. Perf counters accumulate per chunk
        round (prefill_slots_round)."""
        logits_last = None
        idx = 0
        while idx < len(tokens):
            chunk = tokens[idx : idx + self.prefill_chunk]
            logits_last = self._prefill_chunk(slot, chunk)
            idx += len(chunk)
        return logits_last

    def prefill_slots(self, tokens: dict[int, list[int]]
                      ) -> dict[int, np.ndarray]:
        """Feed several slots' prompts in JOINT batched steps (≡ the
        reference server packing multiple slots' prompt chunks into one
        llama_batch under the n_batch budget): each step prefills one chunk
        per slot with per-row offsets and per-row flagged head rows. Returns
        {slot: last-token logits}. Recurrent archs fall back to sequential
        exact-length prefills (row padding would pollute their state)."""
        if self.arch.recurrent or len(tokens) == 1:
            return {s: self.prefill_slot(s, toks)
                    for s, toks in tokens.items()}
        remaining = {s: list(toks) for s, toks in tokens.items()}
        for s, toks in remaining.items():
            if int(self.n_past[s]) + len(toks) > self.max_seq:
                raise ValueError(
                    f"slot {s} context overflow: {self.n_past[s]}+{len(toks)}"
                )
        out: dict[int, np.ndarray] = {}
        while remaining:
            chunk = {s: toks[: self.prefill_chunk]
                     for s, toks in remaining.items()}
            rows = self.prefill_slots_round(chunk)
            done = []
            for s, c in chunk.items():
                rest = remaining[s][len(c):]
                if rest:
                    remaining[s] = rest
                else:
                    out[s] = rows[s]
                    done.append(s)
            for s in done:
                del remaining[s]
        return out

    def prefill_slots_round(self, chunk: dict[int, list[int]]
                            ) -> dict[int, np.ndarray]:
        """ONE joint batched prefill round: feed at most prefill_chunk
        tokens per slot and return each fed slot's last-row logits. The
        scheduler interleaves these rounds with decode steps so generating
        slots keep producing tokens while long prompts stream in (≡ the
        reference's one-llama_batch-per-update_slots-pass cadence)."""
        t0 = time.perf_counter()
        bucket = self._bucket(max(len(c) for c in chunk.values()))
        toks_b = np.zeros((self.n_slots, bucket), dtype=np.int32)
        pos = np.zeros((self.n_slots, bucket), dtype=np.int32)
        offsets = np.full(self.n_slots, -1, dtype=np.int32)
        n_last = np.zeros(self.n_slots, dtype=np.int32)
        for s, c in chunk.items():
            start = int(self.n_past[s])
            if start + len(c) > self.max_seq:
                raise ValueError(
                    f"slot {s} context overflow: {start}+{len(c)}")
            toks_b[s, : len(c)] = c
            rs = start + int(self.rope_delta[s])
            pos[s] = np.arange(rs, rs + bucket)
            offsets[s] = start
            n_last[s] = len(c) - 1
        if self._prefill_step is not None:
            logits, self.cache = self._prefill_step(
                self.params, jnp.asarray(toks_b), jnp.asarray(pos),
                self.cache, jnp.asarray(offsets), jnp.asarray(n_last),
            )
            logits = np.asarray(logits)
            rows = {s: logits[s, 0] for s in chunk}
        else:
            logits, self.cache = self._step(
                self.params, jnp.asarray(toks_b), jnp.asarray(pos),
                self.cache, jnp.asarray(offsets),
            )
            logits = np.asarray(logits)
            rows = {s: logits[s, len(c) - 1] for s, c in chunk.items()}
        for s, c in chunk.items():
            self.n_past[s] += len(c)
            self.perf.n_prefill += len(c)
        self.perf.t_prefill_s += time.perf_counter() - t0
        return rows

    def _bucket(self, n: int) -> int:
        # recurrent state would absorb pad tokens, so those prompts run at
        # exact length (one compile per length, as in the single-stream path)
        if self.arch.recurrent:
            return n
        for b in PREFILL_BUCKETS:
            if n <= b:
                return min(b, self.max_seq)
        raise ValueError(n)

    def prefill_slot_embeddings(self, slot: int, embds: np.ndarray,
                                positions=None, deepstack=None) -> np.ndarray:
        """Feed precomputed input embeddings [n, E] into one slot
        (multimodal chunks, ≡ llama_batch.embd); returns last logits.

        `positions` [4, n]: M-RoPE streams for qwen-VL image grids — the
        slot's rope counter then trails its cache slots (rope_delta).
        `deepstack` [k, n, E]: qwen3vl per-layer visual residuals."""
        if self._pipe and (positions is not None or deepstack is not None):
            # the uniform stacked-layer scan has no entry point for M-RoPE
            # 4-stream positions or per-layer deepstack residuals; plain
            # embedding prompts ride the pipe step's [B, T, E] input path
            raise NotImplementedError(
                "M-RoPE/deepstack multimodal prompts are not supported "
                "under --pp layer-split serving (plain embedding prompts "
                "are)"
            )
        t0 = time.perf_counter()
        n = embds.shape[0]
        start = int(self.n_past[slot])
        if start + n > self.max_seq:
            raise ValueError(f"slot {slot} context overflow: {start}+{n}")
        bucket = self._bucket(n)
        E = embds.shape[1]
        buf = np.zeros((self.n_slots, bucket, E), dtype=np.float32)
        buf[slot, :n] = embds
        if positions is not None or deepstack is not None:
            return self._prefill_slot_mm(slot, buf, n, start, positions,
                                         deepstack, t0)
        pos = np.zeros((self.n_slots, bucket), dtype=np.int32)
        rs = start + int(self.rope_delta[slot])
        pos[slot] = np.arange(rs, rs + bucket)
        offsets = np.full(self.n_slots, -1, dtype=np.int32)
        offsets[slot] = start
        if self._prefill_step is not None:
            n_last = np.zeros(self.n_slots, dtype=np.int32)
            n_last[slot] = n - 1
            logits, self.cache = self._prefill_step(
                self.params, jnp.asarray(buf), jnp.asarray(pos), self.cache,
                jnp.asarray(offsets), jnp.asarray(n_last),
            )
            out = np.asarray(logits[slot, 0])
        else:
            logits, self.cache = self._step(
                self.params, jnp.asarray(buf), jnp.asarray(pos), self.cache,
                jnp.asarray(offsets),
            )
            out = np.asarray(logits[slot, n - 1])
        self.n_past[slot] = start + n
        self.perf.t_prefill_s += time.perf_counter() - t0
        self.perf.n_prefill += n
        return out

    def _prefill_slot_mm(self, slot, buf, n, start, positions, deepstack,
                         t0) -> np.ndarray:
        """Batched M-RoPE/deepstack prefill for one slot (other slots idle,
        offsets −1). Sets the slot's rope_delta from the final stream max."""
        from .engine import _get_mm_prefill_step

        n_slots, bucket, E = buf.shape
        base = start + int(self.rope_delta[slot])
        pos4 = np.broadcast_to(
            np.arange(bucket, dtype=np.int32), (4, n_slots, bucket)).copy()
        if positions is not None:
            pos4[:, slot, :n] = positions + base
            if n < bucket:
                pos4[:, slot, n:] = (int(positions[:, -1].max()) + base + 1
                                     + np.arange(bucket - n, dtype=np.int32))
            end = int(positions[:, -1].max()) + base + 1
        else:
            pos4[:, slot] = base + np.arange(bucket, dtype=np.int32)
            end = base + n
        offsets = np.full(n_slots, -1, dtype=np.int32)
        offsets[slot] = start
        n_last = np.zeros(n_slots, dtype=np.int32)
        n_last[slot] = n - 1
        ds = None
        if deepstack is not None:
            k = deepstack.shape[0]
            dbuf = np.zeros((k, n_slots, bucket, E), np.float32)
            dbuf[:, slot, :n] = deepstack
            ds = jnp.asarray(dbuf)
        step = _get_mm_prefill_step(self.arch.forward, self.hp,
                                    deepstack is not None)
        args = [self.params, jnp.asarray(buf), jnp.asarray(pos4), self.cache,
                jnp.asarray(offsets), jnp.asarray(n_last)]
        if ds is not None:
            args.append(ds)
        logits, self.cache = step(*args)
        out = np.asarray(logits[slot])
        self.n_past[slot] = start + n
        self.rope_delta[slot] = end - int(self.n_past[slot])
        self.perf.t_prefill_s += time.perf_counter() - t0
        self.perf.n_prefill += n
        return out

    def _prefill_chunk(self, slot: int, chunk: list[int]) -> np.ndarray:
        return self.prefill_slots_round({slot: chunk})[slot]

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
            if self._pipe:
                from ..parallel.pipeline_infer import (
                    make_mla_pipeline_step,
                    make_pipeline_step,
                    step_flags,
                )

                if "wkv_a" in self.params["stack"]:  # deepseek2 MLA stack
                    self._hidden_step = make_mla_pipeline_step(
                        hp, self.mesh, self.params, qmeta=self._qmeta,
                        return_hidden=True)
                else:
                    self._hidden_step = make_pipeline_step(
                        hp, self.mesh, self._qmeta, return_hidden=True,
                        quant_kv=isinstance(self.kv_dtype, str),
                        **step_flags(self.params["stack"], self.hp))
            else:
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

    def verify_batch(self, tokens: dict[int, list[int]], width: int,
                     ) -> dict[int, np.ndarray]:
        """Speculative verification step (≡ the reference server's
        can_speculate batch: server-context.cpp builds one llama_batch of
        token+draft per slot). Feeds up to `width` tokens per slot in ONE
        batched fixed-shape forward and returns {slot: logits [width, V]}.

        Does NOT advance n_past — the scheduler commits only the accepted
        prefix (cache slots past the commit point hold stale K/V, which the
        position-based causal mask keeps invisible until overwritten).
        """
        t0 = time.perf_counter()
        toks = np.zeros((self.n_slots, width), dtype=np.int32)
        pos = np.zeros((self.n_slots, width), dtype=np.int32)
        offsets = np.full(self.n_slots, -1, dtype=np.int32)
        for slot, seq in tokens.items():
            n = len(seq)
            start = int(self.n_past[slot])
            if start + width > self.max_seq:
                raise ValueError(f"slot {slot} verify overflow: {start}+{width}")
            toks[slot, :n] = seq
            rs = start + int(self.rope_delta[slot])
            pos[slot] = np.arange(rs, rs + width)
            offsets[slot] = start
        logits, self.cache = self._step(
            self.params, jnp.asarray(toks), jnp.asarray(pos), self.cache,
            jnp.asarray(offsets),
        )
        logits = np.asarray(logits)
        out = {slot: logits[slot] for slot in tokens}
        self.perf.t_decode_s += time.perf_counter() - t0
        self.perf.n_decode += sum(len(s) for s in tokens.values())
        return out

    def rewind(self, slot: int, n_past: int):
        """Roll a slot's valid-cache length back (speculative rejection)."""
        self.n_past[slot] = n_past

    @property
    def can_shift(self) -> bool:
        """Whether cached K rows can be re-positioned by rope re-rotation
        (≡ llama_kv_cache_can_shift). Excludes MLA/latent caches, NoPE
        interleave, and position-dependent (longrope) scaling."""
        from .kvcache import KVCache, QuantKVCache

        return (
            isinstance(self.cache, (KVCache, QuantKVCache))
            and not self.arch.recurrent
            and self.hp.head_dim_k_mla == 0
            and self.hp.arch not in ("deepseek2", "kimi-linear")
            and self.hp.no_rope_step == 0
            and self.hp.rope.scaling_type != "longrope"
            and self.hp.rope.dims > 0
        )

    def shift_slot(self, slot: int, idx: np.ndarray, delta: np.ndarray):
        """Permute one slot's cache rows: destination row i takes source row
        idx[i], with K re-rotated by delta[i] positions (V and alibi-style K
        are position-free, so they just move). One fixed-shape jitted gather
        per call — the compiled program is reused for every reuse pattern.
        ≡ the reference server's --cache-reuse chunk shifting
        (tools/server/server-context.cpp:2228-2271)."""
        from ..ops.rope import rotate_cached_keys
        from .kvcache import KVCache, QuantKVCache

        if not hasattr(self, "_shift_fn"):
            hp = self.hp
            rotate = hp.max_alibi_bias <= 0.0  # alibi keys carry no rope

            @functools.partial(jax.jit, donate_argnames=("cache",))
            def _shift(cache, slot, idx, delta):
                if isinstance(cache, QuantKVCache):
                    kq = jnp.take(cache.k_q[:, slot], idx, axis=2)
                    ks = jnp.take(cache.k_s[:, slot], idx, axis=2)
                    vq = jnp.take(cache.v_q[:, slot], idx, axis=2)
                    vs = jnp.take(cache.v_s[:, slot], idx, axis=2)
                    if rotate:
                        kf = kq.astype(jnp.float32) * ks[..., None]
                        kf = rotate_cached_keys(kf, delta, hp.rope)
                        kq, ks = QuantKVCache._quantize(kf)
                    return QuantKVCache(
                        cache.k_q.at[:, slot].set(kq),
                        cache.v_q.at[:, slot].set(vq),
                        cache.k_s.at[:, slot].set(ks),
                        cache.v_s.at[:, slot].set(vs),
                    )
                k = jnp.take(cache.k[:, slot], idx, axis=2)
                v = jnp.take(cache.v[:, slot], idx, axis=2)
                if rotate:
                    k = rotate_cached_keys(k, delta, hp.rope).astype(k.dtype)
                return KVCache(cache.k.at[:, slot].set(k),
                               cache.v.at[:, slot].set(v))

            self._shift_fn = _shift
        self.cache = self._shift_fn(
            self.cache, jnp.int32(slot),
            jnp.asarray(idx, jnp.int32), jnp.asarray(delta, jnp.int32),
        )

    def _ensure_greedy_step(self):
        if not hasattr(self, "_greedy_step"):
            base = self._step

            @functools.partial(jax.jit, donate_argnames=("cache",))
            def _greedy(params, toks, pos, cache, offsets):
                logits, cache = base(params, toks, pos, cache, offsets)
                return jnp.argmax(logits[:, -1, :], axis=-1).astype(
                    jnp.int32), cache

            self._greedy_step = _greedy
        return self._greedy_step

    def decode_batch_greedy(self, tokens: dict[int, int]) -> dict[int, int]:
        """One decode step returning argmax token ids only (computed on
        device): readback shrinks from [B, V] f32 logits to [B] int32 — the
        batched analog of the single-stream engine's on-device sampling.
        Only exact for pure-greedy slots (no penalties/bias/grammar — the
        scheduler gates on Scheduler._device_greedy_ok)."""
        self._ensure_greedy_step()
        t0 = time.perf_counter()
        toks = np.zeros((self.n_slots, 1), dtype=np.int32)
        pos = np.zeros((self.n_slots, 1), dtype=np.int32)
        offsets = np.full(self.n_slots, -1, dtype=np.int32)
        for slot, tok in tokens.items():
            toks[slot, 0] = tok
            pos[slot, 0] = self.n_past[slot] + self.rope_delta[slot]
            offsets[slot] = self.n_past[slot]
        ids, self.cache = self._greedy_step(
            self.params, jnp.asarray(toks), jnp.asarray(pos), self.cache,
            jnp.asarray(offsets),
        )
        ids = np.asarray(ids)
        out = {}
        for slot in tokens:
            self.n_past[slot] += 1
            out[slot] = int(ids[slot])
        self.perf.t_decode_s += time.perf_counter() - t0
        self.perf.n_decode += len(tokens)
        return out

    def decode_batch(self, tokens: dict[int, int]) -> dict[int, np.ndarray]:
        """One decode step for the given {slot: token}; returns {slot: logits}."""
        t0 = time.perf_counter()
        toks = np.zeros((self.n_slots, 1), dtype=np.int32)
        pos = np.zeros((self.n_slots, 1), dtype=np.int32)
        offsets = np.full(self.n_slots, -1, dtype=np.int32)
        for slot, tok in tokens.items():
            toks[slot, 0] = tok
            pos[slot, 0] = self.n_past[slot] + self.rope_delta[slot]
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
