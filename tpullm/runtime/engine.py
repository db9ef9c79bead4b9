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
from ..runtime.kvcache import KVCache, SWACache, make_cache
from ..runtime.sampling import Sampler, SamplerParams
from .. import tokenizer as tokenizer_mod

PREFILL_BUCKETS = (8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192)

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


def _supports_last_index(fwd) -> bool:
    import inspect

    try:
        return "last_index" in inspect.signature(fwd).parameters
    except (TypeError, ValueError):
        return False


def _get_prefill_step(fwd, hp):
    """Prefill variant computing the lm_head for one flagged row only
    (≡ llama_batch.logits marking just the last prompt token); returns
    logits [B, 1, V]. None when the arch's forward has no last_index."""
    if not _supports_last_index(fwd):
        return None
    key = (fwd, repr(hp), "last")
    step = _STEP_CACHE.get(key)
    if step is None:
        @functools.partial(jax.jit, donate_argnames=("cache",))
        def step(params, tokens, positions, cache, offset, n_last):
            return fwd(hp, params, tokens, positions, cache, offset,
                       last_index=n_last)

        _STEP_CACHE[key] = step
    return step


def _get_mm_prefill_step(fwd, hp, with_ds: bool):
    """Multimodal prefill step with explicit rope positions (classic [B, T]
    or M-RoPE streams [S, B, T]) and optional qwen3vl deepstack residuals
    (≡ mtmd helper feeding llama_batch.embd with 4-D mrope positions)."""
    import inspect

    key = (fwd, repr(hp), "mm", with_ds)
    step = _STEP_CACHE.get(key)
    if step is not None:
        return step
    params_ = inspect.signature(fwd).parameters
    last_ok = "last_index" in params_
    if with_ds and "deepstack" not in params_:
        raise ValueError(f"{hp.arch}: forward has no deepstack support")

    @functools.partial(jax.jit, donate_argnames=("cache",))
    def step(params, embds, positions, cache, offset, n_last, deepstack=None):
        kw = {"deepstack": deepstack} if with_ds else {}
        if last_ok:
            logits, cache = fwd(hp, params, embds, positions, cache, offset,
                                last_index=n_last, **kw)
            return logits[:, 0], cache
        logits, cache = fwd(hp, params, embds, positions, cache, offset, **kw)
        row = jax.lax.dynamic_slice_in_dim(logits, n_last, 1, axis=1)
        return row[:, 0], cache

    _STEP_CACHE[key] = step
    return step


def _get_device_gen(fwd, hp, chunk: int):
    """Device-resident generation: prefill-and-sample plus a lax.scan decode
    chunk. Only sampled token ids cross back to the host (the ≡ of the
    reference's backend samplers — and essential here, where the host link
    is orders of magnitude slower than HBM)."""
    key = (fwd, repr(hp), chunk, "gen")
    fns = _STEP_CACHE.get(key)
    if fns is not None:
        return fns

    from ..ops.sampling_ops import sample_token

    last_ok = _supports_last_index(fwd)

    @functools.partial(jax.jit, donate_argnames=("cache",))
    def prefill_sample(params, tokens, positions, cache, offset, n_last, rng, sp):
        if last_ok:  # skip the lm_head for all but the flagged row
            logits, cache = fwd(hp, params, tokens, positions, cache, offset,
                                last_index=n_last)
            row = logits[0, 0]
        else:
            logits, cache = fwd(hp, params, tokens, positions, cache, offset)
            row = logits[0, n_last]
        tok = sample_token(row.astype(jnp.float32), rng, sp)
        return tok, cache

    @functools.partial(jax.jit, donate_argnames=("cache",))
    def decode_chunk(params, cache, token, n_past, rng, sp):
        def body(carry, _):
            token, n_past, cache, rng = carry
            toks = token.reshape(1, 1)
            pos = n_past.reshape(1, 1).astype(jnp.int32)
            logits, cache = fwd(hp, params, toks, pos, cache, n_past)
            rng, sub = jax.random.split(rng)
            nxt = sample_token(logits[0, 0].astype(jnp.float32), sub, sp)
            return (nxt, n_past + 1, cache, rng), nxt

        (token, n_past, cache, rng), toks = jax.lax.scan(
            body, (token, n_past, cache, rng), None, length=chunk
        )
        return toks, cache, n_past, rng

    fns = (prefill_sample, decode_chunk)
    _STEP_CACHE[key] = fns
    return fns


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
        lora: list | None = None,  # [(path, scale), ...]
        mesh=None,  # jax.sharding.Mesh: tensor-parallel inference over ICI
        override_kv: dict | None = None,  # metadata overrides (≡ --override-kv)
        control_vectors: list | None = None,  # [(path, strength), ...]
        swa_full: bool = False,  # force full-size SWA-layer cache (≡ --swa-full)
        grp_attn_n: int = 1,  # self-extend group size (≡ passkey --grp-attn-n)
    ):
        from ..utils.compile_cache import enable_persistent_cache
        from ..utils.platform import honor_jax_platforms

        honor_jax_platforms()
        enable_persistent_cache()
        t0 = time.perf_counter()
        from .model import Model

        if isinstance(model_path, Model):
            # shared llama_model: weights already device-resident; this
            # context holds only its own cache/steps (llama_init_from_model)
            mdl = model_path
            self._shared_model = mdl
            if mode != "auto":
                mdl.check_compatible(mode, dtype)
            if override_kv:
                raise ValueError(
                    "override_kv must be applied when loading the Model")
            self.reader = mdl.reader
            self.hp = mdl.hp
            self.arch = mdl.arch
            self.tokenizer = mdl.tokenizer
            self.params = mdl.params
            if lora or control_vectors:
                if mdl._fused:
                    raise ValueError(
                        "Model already fused by a plain engine; load a "
                        "separate Model for LoRA/cvec use")
                # unshare the tree STRUCTURE (arrays stay shared) so the
                # in-place LoRA wrap / cvec key don't touch the Model
                self.params = {**self.params,
                               "layers": [dict(l)
                                          for l in self.params["layers"]]}
        else:
            self._shared_model = None
            self.reader = GGUFReader(model_path)
            if override_kv:
                self.reader.metadata.update(override_kv)
            self.hp = load_hparams(self.reader)
            self.arch = get_arch(self.hp.arch)
            self.tokenizer = tokenizer_mod.from_gguf(self.reader)
            from ..models.weights import (drop_unconsumed_planes,
                                          prewarm_quant_planes)

            prewarm_quant_planes(self.reader, mode)
            self.params = self.arch.build_params(self.reader, self.hp, mode=mode, dtype=dtype)
            drop_unconsumed_planes(self.reader)
        self.lora_info = list(lora or [])  # [(path, scale)] for /lora-adapters
        for lora_path, lora_scale in lora or []:
            from ..models.lora import apply_lora, load_lora_gguf

            self.params = apply_lora(
                self.params, load_lora_gguf(lora_path), lora_scale, dtype=dtype
            )
        if control_vectors:
            import numpy as _np

            from ..tools.cvector import load_control_vector

            total = None
            for cv_path, strength in control_vectors:
                v = load_control_vector(cv_path, self.hp.n_layer, strength)
                total = v if total is None else total + v
            self.params["cvec"] = jnp.asarray(_np.asarray(total))
        self._maybe_fuse(mesh)
        self.max_seq = max_seq
        self.batch = batch
        self.kv_dtype = kv_dtype
        # long prompts prefill in chunks (≡ n_ubatch / the fork's -ub 2048):
        # a single-bucket 8k+ prefill of an 8B model overflows a 16 GB chip
        # on [T, n_ff] activation temps; chunking bounds them
        import os as _os

        self.prefill_cap = min(
            max_seq, int(_os.environ.get("TPULLM_PREFILL_CHUNK", "4096")))
        if self.arch.make_cache is not None:
            self.cache = self.arch.make_cache(self.hp, batch, max_seq, kv_dtype)
        elif (
            self.arch.iswa
            and not swa_full
            and self.hp.sliding_window > 0
            and not isinstance(kv_dtype, str)
            and max_seq > self.hp.sliding_window
        ):
            # iSWA dual cache: SWA layers get a ring of window+chunk slots
            # (≡ llama_kv_cache_unified_iswa; --swa-full disables)
            self.prefill_cap = min(1024, max_seq)
            self.cache = SWACache.new(
                self.hp, batch, max_seq, kv_dtype, max_chunk=self.prefill_cap
            )
        else:
            self.cache = make_cache(self.hp, batch, max_seq, kv_dtype)
        self.mesh = mesh
        if mesh is not None:
            # tensor-parallel placement (≡ LLAMA_SPLIT_MODE_ROW over ICI):
            # GSPMD inserts the collectives; the jitted step is unchanged
            from ..parallel import shard_cache, shard_params

            self.params = shard_params(self.params, mesh)
            self.cache = shard_cache(self.cache, mesh)
        self.n_past = 0
        # self-extend / group attention (SURVEY §5.7): rope positions are
        # compressed to slot//G so a context G× the trained window stays
        # within trained rope range; cache slots (and the causal mask)
        # remain dense. Reference: examples/passkey --grp-attn-n via
        # llama_memory_seq_div.
        self.grp_attn_n = max(1, int(grp_attn_n))
        self.rope_pos_delta = 0  # mrope: rope position − cache slot
        self.perf = PerfCounters(t_load_s=time.perf_counter() - t0)

        self._step = _get_step(self.arch.forward, self.hp)
        self._prefill_step = _get_prefill_step(self.arch.forward, self.hp)
        if self.arch.enc_dec:  # T5: jitted encoder filling the cross cache
            enc = self.arch.encode
            hp = self.hp

            @functools.partial(jax.jit, donate_argnames=("cache",))
            def _encode(params, toks, enc_len, cache):
                return enc(hp, params, toks, enc_len, cache)

            self._encode = _encode

    def _maybe_fuse(self, mesh):
        """Fuse per-layer QKV / gate+up weight streams (decode is
        weight-bandwidth bound; one long contiguous read beats three).
        Policy lives in models.weights.maybe_fuse_llama. Shared-Model
        engines fuse ON the Model (once, donated) so contexts share the
        fused planes too."""
        from ..models.weights import maybe_fuse_llama

        if self._shared_model is not None:
            if (mesh is None and not self.lora_info
                    and "cvec" not in self.params):
                self.params = self._shared_model.fused()
            elif self._shared_model._fused:
                raise ValueError(
                    "Model already fused by a plain engine; load a separate "
                    "Model for mesh/LoRA/cvec use")
            # else: mesh/LoRA/cvec engines run the shared params unfused —
            # fusing here would donate (free) the Model's arrays
            return
        self.params = maybe_fuse_llama(self.arch, self.params, mesh,
                                       lora=bool(self.lora_info))

    # -- core ops ---------------------------------------------------------------

    def reset(self):
        self.n_past = 0
        if isinstance(self.cache, SWACache):
            # stale ring entries from the previous conversation carry positions
            # a fresh query would wrongly attend to; mark every slot empty
            self.cache = SWACache(
                self.cache.full_k, self.cache.full_v,
                self.cache.swa_k, self.cache.swa_v,
                jnp.full_like(self.cache.slot_pos, -1),
                self.cache.layer_map, self.cache.window,
            )

    # recurrent-prefill chunk ladder: state carries across calls, so a prompt
    # decomposes into a few fixed-size chunks instead of compiling one
    # program per exact length (≤5 compiled programs ever, vs the old
    # per-prompt-length TTFT land mine)
    _RECURRENT_CHUNKS = (512, 128, 32, 8, 1)

    def _bucket(self, n: int) -> int:
        # recurrent models carry state: pad tokens would pollute it, so
        # chunks run at exact (ladder) length
        if self.arch.recurrent:
            return n
        for b in PREFILL_BUCKETS:
            if n <= b:
                return min(b, self.max_seq)
        raise ValueError(f"prompt of {n} tokens exceeds max bucket")

    def prefill(self, tokens: list[int]) -> np.ndarray:
        """Feed prompt tokens; returns logits of the last token [n_vocab]."""
        if self.arch.enc_dec:
            return self._prefill_enc_dec(tokens)
        t0 = time.perf_counter()
        n = len(tokens)
        if self.n_past + n > self.max_seq:
            raise ValueError(f"context overflow: {self.n_past}+{n} > {self.max_seq}")
        while n > self.prefill_cap:  # ring-cache models chunk long prompts
            self.prefill(tokens[: self.prefill_cap])
            tokens = tokens[self.prefill_cap :]
            n = len(tokens)
        if self.arch.recurrent and n not in self._RECURRENT_CHUNKS:
            c = next(c for c in self._RECURRENT_CHUNKS if c <= n)
            self.prefill(tokens[:c])
            return self.prefill(tokens[c:])
        bucket = self._bucket(n)
        toks = np.zeros((self.batch, bucket), dtype=np.int32)
        toks[0, :n] = tokens
        pos = self._positions(bucket)
        if self._prefill_step is not None:
            logits, self.cache = self._prefill_step(
                self.params, jnp.asarray(toks), jnp.asarray(pos), self.cache,
                jnp.int32(self.n_past), jnp.int32(n - 1),
            )
            out = np.asarray(logits[0, 0])
        else:
            logits, self.cache = self._step(
                self.params, jnp.asarray(toks), jnp.asarray(pos), self.cache,
                jnp.int32(self.n_past),
            )
            out = np.asarray(logits[0, n - 1])
        self.n_past += n
        self.perf.t_prefill_s += time.perf_counter() - t0
        self.perf.n_prefill += n
        return out

    def _positions(self, count: int) -> np.ndarray:
        """[batch, count] rope positions for the next `count` slots; with
        self-extend active they compress to slot//G. `rope_pos_delta`
        shifts rope positions relative to cache slots — set by the mtmd
        pipeline when M-RoPE image grids compress the position counter
        (≡ llama.cpp n_past vs mrope st divergence)."""
        start = self.n_past + self.rope_pos_delta
        pos = np.arange(start, start + count, dtype=np.int32)
        if self.grp_attn_n > 1:
            pos = pos // self.grp_attn_n
        return np.broadcast_to(pos, (self.batch, count))

    def _prefill_enc_dec(self, tokens: list[int]) -> np.ndarray:
        """T5 path: run the encoder over the prompt (filling cross K/V),
        then one decoder step on the decoder-start token (≡ llama_encode
        followed by llama_decode of decoder_start_token_id)."""
        t0 = time.perf_counter()
        n = len(tokens)
        bucket = self._bucket(n)
        toks = np.zeros((self.batch, bucket), dtype=np.int32)
        toks[0, :n] = tokens
        enc_len = np.zeros((self.batch,), dtype=np.int32)
        enc_len[0] = n
        self.cache = self._encode(
            self.params, jnp.asarray(toks), jnp.asarray(enc_len), self.cache
        )
        self.n_past = 0
        start = self.hp.dec_start_token
        if start < 0:
            start = getattr(self.tokenizer.vocab, "pad_id", -1)
            if start is None or start < 0:
                start = 0
        self.perf.t_prefill_s += time.perf_counter() - t0
        self.perf.n_prefill += n
        return self.decode_step(start)

    def prefill_all_logits(self, tokens: list[int]) -> np.ndarray:
        """Like prefill, but returns logits for every position [T, n_vocab]
        (perplexity / imatrix path)."""
        n = len(tokens)
        if n > self.prefill_cap:
            parts = [
                self.prefill_all_logits(tokens[i : i + self.prefill_cap])
                for i in range(0, n, self.prefill_cap)
            ]
            return np.concatenate(parts, axis=0)
        bucket = self._bucket(n)
        toks = np.zeros((self.batch, bucket), dtype=np.int32)
        toks[0, :n] = tokens
        pos = self._positions(bucket)
        logits, self.cache = self._step(
            self.params, jnp.asarray(toks), jnp.asarray(pos), self.cache,
            jnp.int32(self.n_past),
        )
        out = np.asarray(logits[0, :n])
        self.n_past += n
        return out

    def prefill_embeddings(self, embds: np.ndarray, positions=None,
                           deepstack=None) -> np.ndarray:
        """Feed precomputed input embeddings [n, E] (multimodal path,
        ≡ llama_batch.embd); returns last-position logits [n_vocab].

        `positions` [S, n]: per-section M-RoPE rope-position streams
        (qwen2vl/qwen3vl/glm4v image grids — ≡ the mtmd helper's 4-D
        positions). `deepstack` [n_ds, n, E]: qwen3vl per-layer visual
        residuals, zero at text positions."""
        t0 = time.perf_counter()
        n = embds.shape[0]
        if self.n_past + n > self.max_seq:
            raise ValueError(f"context overflow: {self.n_past}+{n}")
        while n > self.prefill_cap:
            c = self.prefill_cap
            self.prefill_embeddings(
                embds[:c],
                None if positions is None else positions[:, :c],
                None if deepstack is None else deepstack[:, :c],
            )
            embds = embds[c:]
            positions = None if positions is None else positions[:, c:]
            deepstack = None if deepstack is None else deepstack[:, c:]
            n = embds.shape[0]
        bucket = self._bucket(n)
        E = embds.shape[1]
        buf = np.zeros((self.batch, bucket, E), dtype=np.float32)
        buf[0, :n] = embds
        if positions is None and deepstack is None:
            rs = self.n_past + self.rope_pos_delta
            pos = np.arange(rs, rs + bucket, dtype=np.int32)
            pos = np.broadcast_to(pos, (self.batch, bucket))
            if self._prefill_step is not None:
                logits, self.cache = self._prefill_step(
                    self.params, jnp.asarray(buf), jnp.asarray(pos), self.cache,
                    jnp.int32(self.n_past), jnp.int32(n - 1),
                )
                out = np.asarray(logits[0, 0])
            else:
                logits, self.cache = self._step(
                    self.params, jnp.asarray(buf), jnp.asarray(pos), self.cache,
                    jnp.int32(self.n_past),
                )
                out = np.asarray(logits[0, n - 1])
        else:
            if positions is None:
                rs = self.n_past + self.rope_pos_delta
                pos = np.broadcast_to(
                    np.arange(rs, rs + bucket,
                              dtype=np.int32), (self.batch, bucket))
            else:
                S = positions.shape[0]
                pbuf = np.zeros((S, bucket), np.int32)
                pbuf[:, :n] = positions
                if n < bucket:  # pad rows continue past the last position
                    tail = positions[:, -1:] + np.arange(1, bucket - n + 1,
                                                         dtype=np.int32)
                    pbuf[:, n:] = tail
                pos = np.broadcast_to(pbuf[:, None, :], (S, self.batch, bucket))
            ds = None
            if deepstack is not None:
                k = deepstack.shape[0]
                dbuf = np.zeros((k, self.batch, bucket, E), np.float32)
                dbuf[:, 0, :n] = deepstack
                ds = jnp.asarray(dbuf)
            step = _get_mm_prefill_step(self.arch.forward, self.hp,
                                        deepstack is not None)
            args = [self.params, jnp.asarray(buf), jnp.asarray(pos),
                    self.cache, jnp.int32(self.n_past), jnp.int32(n - 1)]
            if ds is not None:
                args.append(ds)
            logits, self.cache = step(*args)
            out = np.asarray(logits[0])
        self.n_past += n
        self.perf.t_prefill_s += time.perf_counter() - t0
        self.perf.n_prefill += n
        return out

    def decode_step(self, token: int) -> np.ndarray:
        """Feed one token; returns next-token logits [n_vocab]."""
        if self.n_past >= self.max_seq:
            # guards the kvcache masked=False single-token write precondition
            # (0 <= off <= S-1): an out-of-range write would silently clamp
            # into slot S-1 instead of erroring
            raise ValueError(
                f"context overflow: decode at n_past={self.n_past} >= "
                f"max_seq={self.max_seq}")
        t0 = time.perf_counter()
        toks = jnp.full((self.batch, 1), token, dtype=jnp.int32)
        pos = jnp.asarray(self._positions(1))
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

    def generate_tokens_device(
        self,
        prompt_tokens: list[int],
        max_new_tokens: int = 128,
        temp: float = 0.0,
        top_k: int = 40,
        top_p: float = 0.95,
        min_p: float = 0.05,
        seed: int = 0,
        stop_on_eog: bool = True,
        chunk: int = 32,
    ) -> list[int]:
        """Device-resident generation: sampling happens on-chip; only token
        ids are read back, in chunks. The fast path for simple sampler
        configs (greedy/temp/top-k/top-p/min-p)."""
        if self.batch != 1:
            raise ValueError("device generation path is single-stream")
        from ..ops.sampling_ops import DeviceSamplingParams

        prefill_sample, decode_chunk = _get_device_gen(
            self.arch.forward, self.hp, chunk
        )
        sp = DeviceSamplingParams.make(temp, top_k, top_p, min_p)
        rng = jax.random.PRNGKey(seed)
        vocab = self.tokenizer.vocab

        while len(prompt_tokens) > self.prefill_cap:  # ring-cache chunking
            self.prefill(prompt_tokens[: self.prefill_cap])
            prompt_tokens = prompt_tokens[self.prefill_cap :]
        n = len(prompt_tokens)
        bucket = self._bucket(n)
        toks = np.zeros((self.batch, bucket), dtype=np.int32)
        toks[0, :n] = prompt_tokens
        pos = np.broadcast_to(
            np.arange(self.n_past, self.n_past + bucket, dtype=np.int32),
            (self.batch, bucket),
        )
        t0 = time.perf_counter()
        rng, sub = jax.random.split(rng)
        tok_dev, self.cache = prefill_sample(
            self.params, jnp.asarray(toks), jnp.asarray(pos), self.cache,
            jnp.int32(self.n_past), jnp.int32(n - 1), sub, sp,
        )
        self.n_past += n
        out: list[int] = []
        first = int(tok_dev)  # sync point: the prefill has actually run
        self.perf.t_prefill_s += time.perf_counter() - t0
        self.perf.n_prefill += n
        if stop_on_eog and vocab.is_eog(first):
            return out
        out.append(first)
        n_past_dev = jnp.int32(self.n_past)
        t0 = time.perf_counter()
        while len(out) < max_new_tokens and self.n_past + chunk < self.max_seq:
            tok_chunk, self.cache, n_past_dev, rng = decode_chunk(
                self.params, self.cache, tok_dev, n_past_dev, rng, sp
            )
            ids = np.asarray(tok_chunk).tolist()
            self.n_past += chunk
            self.perf.n_decode += chunk
            done = False
            for t in ids:
                if stop_on_eog and vocab.is_eog(t):
                    done = True
                    break
                out.append(t)
                if len(out) >= max_new_tokens:
                    done = True
                    break
            if done:
                break
            tok_dev = tok_chunk[-1]
        self.perf.t_decode_s += time.perf_counter() - t0
        return out

    # -- embeddings --------------------------------------------------------------

    def embed_tokens(self, tokens: list[int], pooling: str | None = None,
                     normalize: bool = True) -> np.ndarray:
        """Pooled embedding vector [n_embd] (≡ llama_get_embeddings_seq with
        cparams.pooling_type). pooling: mean | cls | last (default from the
        model's pooling_type metadata, mean if unset)."""
        pooling = pooling or (
            self.hp.pooling if self.hp.pooling != "none" else "mean"
        )
        key = (self.arch.forward, repr(self.hp), "hidden")
        step = _STEP_CACHE.get(key)
        if step is None:
            fwd, hp = self.arch.forward, self.hp

            @functools.partial(jax.jit, donate_argnames=("cache",))
            def step(params, toks, positions, cache, offset):
                return fwd(hp, params, toks, positions, cache, offset,
                           return_hidden=True)

            _STEP_CACHE[key] = step

        n = len(tokens)
        bucket = self._bucket(n)
        toks = np.zeros((self.batch, bucket), dtype=np.int32)
        toks[0, :n] = tokens
        pos = np.broadcast_to(np.arange(bucket, dtype=np.int32), (self.batch, bucket))
        # non-causal encoders take the valid-token count through the offset
        # slot (they have no cache); causal models run a throwaway prefill at 0
        offset = jnp.int32(n) if not self.hp.causal else jnp.int32(0)
        hidden, self.cache = step(
            self.params, jnp.asarray(toks), jnp.asarray(pos), self.cache,
            offset,
        )
        self.n_past = 0  # embedding pass does not advance generation state
        h = np.asarray(hidden[0, :n])  # [n, E]
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

    def embed(self, text: str, pooling: str | None = None,
              normalize: bool = True) -> np.ndarray:
        ids = self.tokenizer.tokenize(text, add_special=True, parse_special=True)
        return self.embed_tokens(ids, pooling=pooling, normalize=normalize)

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
