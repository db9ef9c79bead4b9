"""KV cache as fixed-shape donated JAX arrays.

Role of the reference's llama_kv_cache (src/llama-kv-cache.cpp): per-layer K/V
storage that decode steps append into. XLA's static shapes replace the
reference's cell allocator for the single-context case; the paged multi-slot
variant (server continuous batching) builds on the same arrays with per-slot
offsets. Quantized (Q8) KV storage follows with the Pallas attention kernel.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..models.hparams import HParams


def _seq_write(cache_arr: jax.Array, new_arr: jax.Array, off,
               seq_axis: int, masked: bool = True,
               layer: int | None = None) -> jax.Array:
    """Write `new_arr` (T wide on seq_axis) at sequence position `off` of
    `cache_arr` (S wide); on the masked path (the default), off < 0 skips
    the write entirely.

    With `layer` given, `cache_arr` is the FULL [L, ...] cache, `new_arr`
    has the per-layer shape (no leading L), and `seq_axis` is relative to
    the per-layer shape. Every read/write then addresses the
    (layer, ..., start, ...) window of the full array directly — one
    dynamic-update-slice XLA keeps in place on the donated buffer. The
    earlier slice-the-layer-out / .at[layer].set(...) spelling forced a
    whole-layer copy per (layer, step) inside the decode scan: measured
    −13% single-stream decode tok/s (87.9 → 76.5, BENCH r1 vs r2).

    Prefill buckets can overshoot the context end (off + bucket > S even
    though every REAL token fits — the engines only guarantee
    off + n_tokens <= S). A raw dynamic_update_slice would clamp its start
    to S - T and silently clobber positions before `off` with pad-token
    rows; instead the window clamps left, the payload rolls right by the
    clamp distance so every real token still lands at its absolute
    position, and the wrapped-in columns keep the existing cache content.

    masked=False asserts the caller guarantees 0 <= off <= S - T (scalar
    decode-step writes, where engines bound the position before invoking
    the program — Engine.decode_step raises on overflow and the draft
    speculator caps its proposals at the cache end): skips both the
    negative-offset skip guard and the read-modify-write clamp handling so
    XLA lowers a plain in-place dynamic-update-slice inside the decode
    scan. An out-of-range offset on this path clamps instead of skipping.
    """
    if layer is not None:
        new_arr = new_arr[None]
        seq_axis = seq_axis + 1
    S = cache_arr.shape[seq_axis]
    T = new_arr.shape[seq_axis]
    off = jnp.asarray(off, jnp.int32)
    start = jnp.clip(off, 0, max(S - T, 0))
    starts = [0] * cache_arr.ndim
    starts[seq_axis] = start
    if layer is not None:
        starts[0] = layer
    if not masked and T == 1:
        return jax.lax.dynamic_update_slice(
            cache_arr, new_arr.astype(cache_arr.dtype), starts)
    shifted = jnp.roll(new_arr, off - start, axis=seq_axis)
    cur = jax.lax.dynamic_slice(cache_arr, starts, new_arr.shape)
    colpos = start + jnp.arange(T, dtype=jnp.int32)
    keep_new = (off >= 0) & (colpos >= off)
    shape = [1] * cache_arr.ndim
    shape[seq_axis] = T
    src = jnp.where(keep_new.reshape(shape),
                    shifted.astype(cache_arr.dtype), cur)
    return jax.lax.dynamic_update_slice(cache_arr, src, starts)


@jax.tree_util.register_pytree_node_class
@dataclass
class KVCache:
    # head-major layout: sequence and feature are the minor (tiled) dims,
    # so Pallas attention blocks slice (S, D) tiles directly
    k: jax.Array  # [n_layer, B, Hkv, S, Dk]
    v: jax.Array  # [n_layer, B, Hkv, S, Dv]

    def tree_flatten(self):
        return (self.k, self.v), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def max_len(self) -> int:
        return self.k.shape[3]

    @property
    def batch(self) -> int:
        return self.k.shape[1]

    @classmethod
    def new(cls, hp: HParams, batch: int, max_len: int, dtype=jnp.bfloat16) -> "KVCache":
        shape_k = (hp.n_layer, batch, hp.n_head_kv, max_len, hp.head_dim)
        shape_v = (hp.n_layer, batch, hp.n_head_kv, max_len, hp.head_dim_v)
        return cls(jnp.zeros(shape_k, dtype), jnp.zeros(shape_v, dtype))

    def kv(self, layer: int) -> tuple[jax.Array, jax.Array]:
        """Attention-ready (k, v) views for a layer: [B, Hkv, S, D]."""
        return self.k[layer], self.v[layer]

    def update(self, layer: int, k_new: jax.Array, v_new: jax.Array, offset) -> "KVCache":
        """Write k/v [B, Hkv, T, D] at sequence position `offset` of `layer`.

        `offset` is either a scalar (all rows write at the same position —
        single-stream engine) or an int32 [B] vector of per-slot positions
        (continuous batching); a negative per-slot offset skips the write
        (that slot is idle this step).
        """
        offset = jnp.asarray(offset)
        if offset.ndim == 0:
            k = _seq_write(self.k, k_new, offset, seq_axis=2,
                           masked=k_new.shape[2] > 1, layer=layer)
            v = _seq_write(self.v, v_new, offset, seq_axis=2,
                           masked=v_new.shape[2] > 1, layer=layer)
            return KVCache(k, v)

        def row(cache_row, new_row, off):
            # cache_row [Hkv, S, D], new_row [Hkv, T, D]; off < 0 = no-op
            return _seq_write(cache_row, new_row, off, seq_axis=1)

        k_l = jax.vmap(row)(self.k[layer], k_new, offset)
        v_l = jax.vmap(row)(self.v[layer], v_new, offset)
        return KVCache(self.k.at[layer].set(k_l), self.v.at[layer].set(v_l))


@jax.tree_util.register_pytree_node_class
@dataclass
class QuantKVCache:
    """Q8-quantized KV storage (≡ cparams.type_k/type_v = q8_0 + the fork's
    Q8 flash-attention pipeline, SURVEY.md §2.4).

    int8 codes with one f32 scale per (layer, batch, head, position) vector —
    per-row rather than ggml's per-32-block scale, which keeps the layout a
    clean [..., S, D] int8 plane the MXU path can consume; HBM traffic per
    cached value drops bf16→int8+scale (≈0.53×). Dequantization is an
    elementwise multiply XLA fuses into the attention matmul's operand read.
    """

    k_q: jax.Array  # [L, B, Hkv, S, Dk] int8
    v_q: jax.Array  # [L, B, Hkv, S, Dv] int8
    k_s: jax.Array  # [L, B, Hkv, S] f32
    v_s: jax.Array  # [L, B, Hkv, S] f32

    def tree_flatten(self):
        return (self.k_q, self.v_q, self.k_s, self.v_s), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def max_len(self) -> int:
        return self.k_q.shape[3]

    @property
    def batch(self) -> int:
        return self.k_q.shape[1]

    @classmethod
    def new(cls, hp: HParams, batch: int, max_len: int, dtype=None) -> "QuantKVCache":
        sk = (hp.n_layer, batch, hp.n_head_kv, max_len, hp.head_dim)
        sv = (hp.n_layer, batch, hp.n_head_kv, max_len, hp.head_dim_v)
        ss = (hp.n_layer, batch, hp.n_head_kv, max_len)
        return cls(
            jnp.zeros(sk, jnp.int8), jnp.zeros(sv, jnp.int8),
            jnp.zeros(ss, jnp.float32), jnp.zeros(ss, jnp.float32),
        )

    @staticmethod
    def _quantize(x: jax.Array) -> tuple[jax.Array, jax.Array]:
        """[..., D] → (int8 codes, f32 scale[...])."""
        xf = x.astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=-1)
        scale = amax / 127.0
        inv = jnp.where(scale > 0, 1.0 / jnp.where(scale > 0, scale, 1.0), 0.0)
        q = jnp.clip(jnp.round(xf * inv[..., None]), -127, 127).astype(jnp.int8)
        return q, scale

    def kv(self, layer: int) -> tuple[jax.Array, jax.Array]:
        k = self.k_q[layer].astype(jnp.bfloat16) * self.k_s[layer][..., None].astype(jnp.bfloat16)
        v = self.v_q[layer].astype(jnp.bfloat16) * self.v_s[layer][..., None].astype(jnp.bfloat16)
        return k, v

    def kv_packed(self, layer: int):
        """(k_q, k_s, v_q, v_s) planes for the q8 flash kernel — the cache
        streams as int8 + per-vector scales, never widening in HBM."""
        return (self.k_q[layer], self.k_s[layer],
                self.v_q[layer], self.v_s[layer])

    def update(self, layer: int, k_new: jax.Array, v_new: jax.Array, offset) -> "QuantKVCache":
        k_q, k_s = self._quantize(k_new)  # [B, Hkv, T, D], [B, Hkv, T]
        v_q, v_s = self._quantize(v_new)
        offset = jnp.asarray(offset)
        if offset.ndim == 0:
            masked = k_q.shape[2] > 1
            kq = _seq_write(self.k_q, k_q, offset, seq_axis=2,
                            masked=masked, layer=layer)
            vq = _seq_write(self.v_q, v_q, offset, seq_axis=2,
                            masked=masked, layer=layer)
            ks = _seq_write(self.k_s, k_s, offset, seq_axis=2,
                            masked=masked, layer=layer)
            vs = _seq_write(self.v_s, v_s, offset, seq_axis=2,
                            masked=masked, layer=layer)
            return QuantKVCache(kq, vq, ks, vs)

        def row4(cache_row, new_row, off):
            return _seq_write(cache_row, new_row, off, seq_axis=1)

        def row3(cache_row, new_row, off):
            return _seq_write(cache_row, new_row, off, seq_axis=1)

        kq = self.k_q.at[layer].set(jax.vmap(row4)(self.k_q[layer], k_q, offset))
        vq = self.v_q.at[layer].set(jax.vmap(row4)(self.v_q[layer], v_q, offset))
        ks = self.k_s.at[layer].set(jax.vmap(row3)(self.k_s[layer], k_s, offset))
        vs = self.v_s.at[layer].set(jax.vmap(row3)(self.v_s[layer], v_s, offset))
        return QuantKVCache(kq, vq, ks, vs)


@jax.tree_util.register_pytree_node_class
@dataclass
class MLACache:
    """Absorbed-MLA latent cache (≡ the reference's is_mla branch:
    llama-kv-cache.cpp:138 caches the kv_lora_rank+rope latent and
    llm_build_deepseek2 runs MQA at DKQ=kv_lora_rank+n_rot, DV=kv_lora_rank;
    fattn.cu dkq576/dv512 template instances).

    One plane per layer: c[..., :kvr] is the compressed KV latent (shared by
    K-nope scores AND values — V is a zero-copy view), c[..., kvr:] the
    decoupled rope key. Per cached token this stores kvr+n_rot floats
    instead of the decompressed n_head·(head_dim_k+head_dim_v) — ~71× less
    HBM for DeepSeek-V2 (576 vs 128·(192+128)).
    """

    c: jax.Array  # [n_layer, B, 1, S, kvr + n_rot]
    kvr: int  # static: latent width (value slice)

    def tree_flatten(self):
        return (self.c,), (self.kvr,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0])

    @property
    def max_len(self) -> int:
        return self.c.shape[3]

    @property
    def batch(self) -> int:
        return self.c.shape[1]

    @classmethod
    def new(cls, n_layer: int, batch: int, max_len: int, kvr: int,
            n_rot: int, dtype=jnp.bfloat16) -> "MLACache":
        return cls(
            jnp.zeros((n_layer, batch, 1, max_len, kvr + n_rot), dtype), kvr
        )

    def kv(self, layer: int) -> tuple[jax.Array, jax.Array]:
        """(k, v): k [B, 1, S, kvr+n_rot]; v is the latent slice of k."""
        k = self.c[layer]
        return k, k[..., : self.kvr]

    def update(self, layer: int, k_new: jax.Array, v_new=None, offset=0) -> "MLACache":
        """Write the combined latent row k_new [B, 1, T, kvr+n_rot] at
        `offset` (scalar or [B] per-slot vector; negative row skips)."""
        offset = jnp.asarray(offset)
        if offset.ndim == 0:
            c = _seq_write(self.c, k_new, offset, seq_axis=2,
                           masked=k_new.shape[2] > 1, layer=layer)
            return MLACache(c, self.kvr)

        def row(cache_row, new_row, off):
            return _seq_write(cache_row, new_row, off, seq_axis=1)

        c_l = jax.vmap(row)(self.c[layer], k_new, offset)
        return MLACache(self.c.at[layer].set(c_l), self.kvr)


@jax.tree_util.register_pytree_node_class
@dataclass
class SWACache:
    """Dual KV store for interleaved sliding-window attention
    (≡ llama_kv_cache_unified_iswa, src/llama-kv-cache-iswa.*).

    Full-attention layers keep the usual [n_full, B, Hkv, max_len, D] arrays;
    SWA layers share a ring of `ring_len` slots — enough for one prefill
    chunk plus the window — written at slot (pos % ring_len). `slot_pos`
    records the absolute position held by each ring slot (-1 = empty), so the
    SWA mask is computed from data rather than slot index:
    attend(q@p, slot s) ⇔ 0 ≤ pos_s ≤ p and p − pos_s < window.

    TPU notes: ring writes are one scatter per layer on static index vectors
    ((offset + iota) mod R); everything stays fixed-shape so the decode step
    jit-compiles once. Memory for a gemma3-style 5:1 swa:full pattern drops
    by ~ (1 − 1/6)·(1 − R/max_len) of the cache.
    """

    full_k: jax.Array  # [n_full, B, Hkv, Smax, Dk]
    full_v: jax.Array  # [n_full, B, Hkv, Smax, Dv]
    swa_k: jax.Array  # [n_swa, B, Hkv, R, Dk]
    swa_v: jax.Array  # [n_swa, B, Hkv, R, Dv]
    slot_pos: jax.Array  # [B, R] int32 absolute position per ring slot, -1 empty
    layer_map: tuple  # li -> (is_swa, local_idx); static
    window: int  # static

    def tree_flatten(self):
        return (
            (self.full_k, self.full_v, self.swa_k, self.swa_v, self.slot_pos),
            (self.layer_map, self.window),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def max_len(self) -> int:
        return self.full_k.shape[3]

    @property
    def ring_len(self) -> int:
        return self.swa_k.shape[3]

    @property
    def batch(self) -> int:
        return self.full_k.shape[1]

    @classmethod
    def new(cls, hp: HParams, batch: int, max_len: int, dtype=jnp.bfloat16,
            max_chunk: int = 1024) -> "SWACache":
        layer_map = []
        n_full = n_swa = 0
        for li in range(hp.n_layer):
            if hp.is_swa(li):
                layer_map.append((True, n_swa))
                n_swa += 1
            else:
                layer_map.append((False, n_full))
                n_full += 1
        # a prefill chunk of C tokens needs window-1 past keys + C new ones
        r = hp.sliding_window - 1 + min(max_chunk, max_len)
        ring = min(max_len, -(-r // 128) * 128)
        return cls(
            jnp.zeros((n_full, batch, hp.n_head_kv, max_len, hp.head_dim), dtype),
            jnp.zeros((n_full, batch, hp.n_head_kv, max_len, hp.head_dim_v), dtype),
            jnp.zeros((n_swa, batch, hp.n_head_kv, ring, hp.head_dim), dtype),
            jnp.zeros((n_swa, batch, hp.n_head_kv, ring, hp.head_dim_v), dtype),
            jnp.full((batch, ring), -1, jnp.int32),
            tuple(layer_map),
            hp.sliding_window,
        )

    # -- ring bookkeeping -------------------------------------------------------

    def _clip_to_ring(self, arrs, offset):
        """Oversized writes keep only the last ring_len entries (older ones
        would be overwritten within this same call anyway)."""
        t = arrs[0].shape[-2] if arrs[0].ndim >= 3 else arrs[0].shape[-1]
        r = self.ring_len
        if t <= r:
            return arrs, offset, t
        sl = [a[..., -r:, :] if a.ndim >= 3 else a[..., -r:] for a in arrs]
        return sl, offset + (t - r), r

    def slot_positions_after(self, positions: jax.Array, offset) -> jax.Array:
        """The slot_pos array as it will look after this step's writes.
        Models call this (via advance) before the layer loop so the SWA mask
        covers the tokens being written."""
        (pos,), off, t = self._clip_to_ring((positions,), jnp.asarray(offset))
        r = self.ring_len
        if off.ndim == 0:
            idx = (off + jnp.arange(t)) % r
            return self.slot_pos.at[:, idx].set(pos)

        def row(sp, p, o):
            idx = (jnp.maximum(o, 0) + jnp.arange(t)) % r
            src = jnp.where(o >= 0, p, sp[idx])
            return sp.at[idx].set(src)

        return jax.vmap(row)(self.slot_pos, pos, off)

    def advance(self, positions: jax.Array, offset) -> "SWACache":
        """Commit this step's slot positions (call once per forward)."""
        return SWACache(
            self.full_k, self.full_v, self.swa_k, self.swa_v,
            self.slot_positions_after(positions, offset),
            self.layer_map, self.window,
        )

    def ring_mask(self, positions: jax.Array) -> jax.Array:
        """[B, T, R] boolean SWA mask from post-advance slot positions."""
        sp = self.slot_pos[:, None, :]  # [B, 1, R]
        qp = positions[:, :, None]  # [B, T, 1]
        return (sp >= 0) & (sp <= qp) & (sp > qp - self.window)

    # -- KVCache interface ------------------------------------------------------

    def kv(self, layer: int) -> tuple[jax.Array, jax.Array]:
        swa, loc = self.layer_map[layer]
        if swa:
            return self.swa_k[loc], self.swa_v[loc]
        return self.full_k[loc], self.full_v[loc]

    def update(self, layer: int, k_new, v_new, offset) -> "SWACache":
        swa, loc = self.layer_map[layer]
        offset = jnp.asarray(offset)
        if not swa:
            proxy = KVCache(self.full_k, self.full_v).update(
                loc, k_new, v_new, offset
            )
            return SWACache(proxy.k, proxy.v, self.swa_k, self.swa_v,
                            self.slot_pos, self.layer_map, self.window)

        (k_new, v_new), off, t = self._clip_to_ring((k_new, v_new), offset)
        r = self.ring_len
        if off.ndim == 0:
            idx = (off + jnp.arange(t)) % r
            # an advanced index between slices moves its axis to the front:
            # value shape for at[loc, :, :, idx, :] is [T, B, Hkv, D]
            sk = self.swa_k.at[loc, :, :, idx, :].set(
                jnp.moveaxis(k_new, 2, 0).astype(self.swa_k.dtype)
            )
            sv = self.swa_v.at[loc, :, :, idx, :].set(
                jnp.moveaxis(v_new, 2, 0).astype(self.swa_v.dtype)
            )
        else:

            def row(ring, new, o):
                # single advanced index between slices stays in place:
                # ring[:, idx, :] is [Hkv, T, D], matching `new` directly
                idx = (jnp.maximum(o, 0) + jnp.arange(t)) % r
                src = jnp.where(o >= 0, new.astype(ring.dtype),
                                ring[:, idx, :])
                return ring.at[:, idx, :].set(src)

            sk = self.swa_k.at[loc].set(jax.vmap(row)(self.swa_k[loc], k_new, off))
            sv = self.swa_v.at[loc].set(jax.vmap(row)(self.swa_v[loc], v_new, off))
        return SWACache(self.full_k, self.full_v, sk, sv, self.slot_pos,
                        self.layer_map, self.window)


def make_cache(hp: HParams, batch: int, max_len: int, kv_dtype):
    """kv_dtype: jnp dtype for dense storage, or the string 'q8_0'
    (≡ --cache-type-k/v q8_0)."""
    if isinstance(kv_dtype, str):
        if kv_dtype in ("q8_0", "q8"):
            return QuantKVCache.new(hp, batch, max_len)
        kv_dtype = {"f16": jnp.float16, "bf16": jnp.bfloat16,
                    "f32": jnp.float32}[kv_dtype]
    return KVCache.new(hp, batch, max_len, kv_dtype)
