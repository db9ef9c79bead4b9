"""T5 encoder-decoder family (t5, t5encoder archs).

Reference graphs: llm_build_t5_enc (src/models/t5-enc.cpp) and
llm_build_t5_dec (src/models/t5-dec.cpp); relative-position buckets per
llama_relative_position_bucket (src/llama-graph.cpp:2601).

TPU-first shape: the encoder runs once as a bucketed bidirectional program;
its per-layer cross K/V projections are computed in the same jitted call and
live in the T5Cache alongside the decoder's self-attention ring — the
decoder step then has the standard (tokens, positions, cache, offset)
signature, so the existing engine decode loop drives it unchanged.
Attention uses kq_scale = 1.0 (T5 folds the scale into the weights) and an
additive per-head relative-position bias instead of rope.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..gguf.reader import GGUFReader
from ..ops.norms import rms_norm
from .hparams import HParams
from .llama import Params
from .weights import load_embedding, load_linear, load_vector

MAX_DISTANCE = 128  # llama_relative_position_bucket constant


def relative_buckets(rel_pos: jax.Array, n_buckets: int,
                     bidirectional: bool) -> jax.Array:
    """Vectorized llama_relative_position_bucket (llama-graph.cpp:2601).
    rel_pos = query_pos - key_pos (any shape, int32)."""
    nb = n_buckets // 2 if bidirectional else n_buckets
    if bidirectional:
        offset = jnp.where(rel_pos > 0, nb, 0)
        rel = jnp.abs(rel_pos)
    else:
        offset = jnp.zeros_like(rel_pos)
        rel = -jnp.minimum(rel_pos, 0)
    max_exact = nb // 2
    rel_f = jnp.maximum(rel.astype(jnp.float32), 1.0)
    large = (max_exact + jnp.floor(
        jnp.log(rel_f / max_exact)
        * (nb - max_exact) / math.log(MAX_DISTANCE / max_exact)
    )).astype(jnp.int32)
    large = jnp.minimum(large, nb - 1)
    return offset + jnp.where(rel < max_exact, rel, large)


@jax.tree_util.register_pytree_node_class
@dataclass
class T5Cache:
    """Decoder self-attention KV ring + encoder cross K/V + encoder length."""

    k: jax.Array  # [L, B, Hkv, S_dec, D] decoder self-attn
    v: jax.Array
    cross_k: jax.Array  # [L, B, Hkv, S_enc, D]
    cross_v: jax.Array
    enc_len: jax.Array  # [B] valid encoder positions

    def tree_flatten(self):
        return (self.k, self.v, self.cross_k, self.cross_v, self.enc_len), None

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
    def new(cls, hp: HParams, batch: int, max_len: int, dtype=jnp.bfloat16):
        if isinstance(dtype, str):  # kv_dtype="q8_0" etc: bf16 fallback
            dtype = jnp.bfloat16
        L = hp.dec_n_layer or hp.n_layer
        return cls(
            jnp.zeros((L, batch, hp.n_head_kv, max_len, hp.head_dim), dtype),
            jnp.zeros((L, batch, hp.n_head_kv, max_len, hp.head_dim_v), dtype),
            jnp.zeros((L, batch, hp.n_head_kv, max_len, hp.head_dim), dtype),
            jnp.zeros((L, batch, hp.n_head_kv, max_len, hp.head_dim_v), dtype),
            jnp.zeros((batch,), jnp.int32),
        )


def _layer_tensors(t, prefix, linear, maybe_vec):
    out = {
        "attn_norm": maybe_vec(prefix + "attn_norm.weight"),
        "wq": linear(prefix + "attn_q.weight"),
        "wk": linear(prefix + "attn_k.weight"),
        "wv": linear(prefix + "attn_v.weight"),
        "wo": linear(prefix + "attn_o.weight"),
        "rel_b": (jnp.asarray(t[prefix + "attn_rel_b.weight"].to_numpy(),
                              jnp.float32)
                  if prefix + "attn_rel_b.weight" in t else None),
        "ffn_norm": maybe_vec(prefix + "ffn_norm.weight"),
        "w_gate": (linear(prefix + "ffn_gate.weight")
                   if prefix + "ffn_gate.weight" in t else None),
        "w_up": linear(prefix + "ffn_up.weight"),
        "w_down": linear(prefix + "ffn_down.weight"),
    }
    return out


def build_params(r: GGUFReader, hp: HParams, mode: str = "auto",
                 dtype=jnp.bfloat16) -> Params:
    t = r.tensors

    def linear(name):
        return load_linear(t[name], mode=mode, dtype=dtype)

    def maybe_vec(name):
        return load_vector(t[name]) if name in t else None

    enc_layers = []
    for i in range(hp.n_layer):
        if f"enc.blk.{i}.attn_q.weight" not in t:
            break
        enc_layers.append(_layer_tensors(t, f"enc.blk.{i}.", linear, maybe_vec))

    dec_layers = []
    n_dec = hp.dec_n_layer or hp.n_layer
    for i in range(n_dec):
        p = f"dec.blk.{i}."
        if p + "attn_q.weight" not in t:
            break
        layer = _layer_tensors(t, p, linear, maybe_vec)
        layer.update({
            "cross_norm": maybe_vec(p + "cross_attn_norm.weight"),
            "wq_cross": linear(p + "cross_attn_q.weight"),
            "wk_cross": linear(p + "cross_attn_k.weight"),
            "wv_cross": linear(p + "cross_attn_v.weight"),
            "wo_cross": linear(p + "cross_attn_o.weight"),
        })
        dec_layers.append(layer)

    return {
        "tok_embd": load_embedding(t["token_embd.weight"], dtype=dtype),
        "enc_layers": enc_layers,
        "dec_layers": dec_layers,
        "enc_output_norm": maybe_vec("enc.output_norm.weight"),
        "output_norm": (maybe_vec("dec.output_norm.weight")
                        if "dec.output_norm.weight" in t
                        else maybe_vec("output_norm.weight")),
        "output": linear("output.weight") if "output.weight" in t else None,
    }


def _attn(q, k, v, bias, mask):
    """T5 attention: kq_scale=1.0, additive per-head bias, boolean mask.
    q [B,T,H,D]; k,v [B,Hkv,S,D]; bias [B,H,T,S] or None; mask [B,T,S]."""
    B, T, H, D = q.shape
    Hkv = k.shape[1]
    G = H // Hkv
    qf = q.reshape(B, T, Hkv, G, D).astype(jnp.float32)
    scores = jnp.einsum("bthgd,bhsd->bhgts", qf, k.astype(jnp.float32))
    if bias is not None:
        scores = scores + bias.reshape(B, Hkv, G, *bias.shape[2:])
    scores = jnp.where(mask[:, None, None, :, :], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    probs = jnp.where(
        jnp.any(mask[:, None, None, :, :], axis=-1, keepdims=True), probs, 0.0
    )
    out = jnp.einsum("bhgts,bhsd->bthgd", probs, v.astype(jnp.float32))
    return out.reshape(B, T, H, v.shape[-1]).astype(q.dtype)


def _ffn(hp, layer, x):
    h = rms_norm(x, layer["ffn_norm"], hp.rms_eps)
    up = layer["w_up"](h)
    if layer["w_gate"] is not None:  # t5 v1.1 gated-gelu
        gate = layer["w_gate"](h)
        act = jax.nn.gelu(gate.astype(jnp.float32), approximate=False).astype(up.dtype) * up
    else:
        act = jax.nn.relu(up.astype(jnp.float32)).astype(up.dtype)
    return x + layer["w_down"](act)


def _pos_bias(rel_b, qpos, kpos, n_buckets, bidirectional):
    """rel_b [n_buckets, n_head] -> [1, H, T, S]. The bucket argument is
    memory_pos − context_pos (key − query), matching HF T5 and the
    reference's kq-bias orientation."""
    buckets = relative_buckets(
        kpos[None, :].astype(jnp.int32) - qpos[:, None].astype(jnp.int32),
        n_buckets, bidirectional,
    )  # [T, S]
    return rel_b[buckets].transpose(2, 0, 1)[None]  # [1,H,T,S]


def encode(hp: HParams, params: Params, tokens: jax.Array,
           enc_len: jax.Array) -> jax.Array:
    """Bidirectional encoder over (padded) tokens [B,S]; enc_len [B] marks
    the valid prefix. Returns final-norm hidden states [B,S,E]."""
    B, S = tokens.shape
    x = params["tok_embd"][tokens]
    pos = jnp.arange(S)
    valid = pos[None, :] < enc_len[:, None]  # [B,S]
    mask = valid[:, None, :] & jnp.ones((B, S, 1), bool)  # keys masked to len
    rel0 = params["enc_layers"][0]["rel_b"]
    for layer in params["enc_layers"]:
        h = rms_norm(x, layer["attn_norm"], hp.rms_eps)
        q = layer["wq"](h).reshape(B, S, hp.n_head, hp.head_dim)
        k = layer["wk"](h).reshape(B, S, hp.n_head_kv, hp.head_dim)
        v = layer["wv"](h).reshape(B, S, hp.n_head_kv, hp.head_dim_v)
        rel_b = layer["rel_b"] if layer["rel_b"] is not None else rel0
        bias = _pos_bias(rel_b, pos, pos, hp.n_rel_buckets, True)
        attn = _attn(q, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
                     bias, mask)
        x = x + layer["wo"](attn.reshape(B, S, hp.n_head * hp.head_dim_v))
        x = _ffn(hp, layer, x)
    return rms_norm(x, params["enc_output_norm"], hp.rms_eps)


def encode_with_cross(hp: HParams, params: Params, tokens: jax.Array,
                      enc_len: jax.Array, cache: T5Cache) -> T5Cache:
    """Run the encoder and fill the cache's cross K/V (the per-layer
    wk_cross/wv_cross projections of the encoder output)."""
    enc = encode(hp, params, tokens, enc_len)
    B, S = tokens.shape
    cks, cvs = [], []
    for layer in params["dec_layers"]:
        ck = layer["wk_cross"](enc).reshape(B, S, hp.n_head_kv, hp.head_dim)
        cv = layer["wv_cross"](enc).reshape(B, S, hp.n_head_kv, hp.head_dim_v)
        cks.append(ck.transpose(0, 2, 1, 3))
        cvs.append(cv.transpose(0, 2, 1, 3))
    Sc = cache.cross_k.shape[3]
    cross_k = jnp.stack(cks).astype(cache.cross_k.dtype)
    cross_v = jnp.stack(cvs).astype(cache.cross_v.dtype)
    pad = ((0, 0), (0, 0), (0, 0), (0, Sc - S), (0, 0))
    return T5Cache(
        jnp.zeros_like(cache.k), jnp.zeros_like(cache.v),
        jnp.pad(cross_k, pad), jnp.pad(cross_v, pad),
        enc_len.astype(jnp.int32),
    )


def forward(
    hp: HParams,
    params: Params,
    tokens: jax.Array,  # decoder tokens [B, T]
    positions: jax.Array,  # decoder positions [B, T]
    cache: T5Cache,
    cache_offset,
    return_hidden: bool = False,
) -> tuple[jax.Array, T5Cache]:
    """Decoder step (llm_build_t5_dec): rel-bias self-attention over the
    decoder ring + cross-attention over the cached encoder projections."""
    B, T = tokens.shape
    x = params["tok_embd"][tokens]
    S = cache.max_len
    Se = cache.cross_k.shape[3]
    key_pos = jnp.arange(S)
    kv_len = jnp.asarray(cache_offset) + T
    self_mask = (key_pos[None, None, :] <= positions[:, :, None]) & (
        key_pos[None, None, :] < jnp.asarray(kv_len).reshape(-1, 1, 1)
    )
    cross_mask = (
        jnp.arange(Se)[None, None, :] < cache.enc_len[:, None, None]
    ) & jnp.ones((B, T, 1), bool)
    rel0 = params["dec_layers"][0]["rel_b"]
    k_cache, v_cache = cache.k, cache.v
    for li, layer in enumerate(params["dec_layers"]):
        h = rms_norm(x, layer["attn_norm"], hp.rms_eps)
        q = layer["wq"](h).reshape(B, T, hp.n_head, hp.head_dim)
        k = layer["wk"](h).reshape(B, T, hp.n_head_kv, hp.head_dim)
        v = layer["wv"](h).reshape(B, T, hp.n_head_kv, hp.head_dim_v)
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, k.transpose(0, 2, 1, 3)[None].astype(k_cache.dtype),
            (li, 0, 0, jnp.asarray(cache_offset), 0),
        )
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, v.transpose(0, 2, 1, 3)[None].astype(v_cache.dtype),
            (li, 0, 0, jnp.asarray(cache_offset), 0),
        )
        rel_b = layer["rel_b"] if layer["rel_b"] is not None else rel0
        bias = _pos_bias(rel_b, positions[0], key_pos, hp.n_rel_buckets, False)
        attn = _attn(q, k_cache[li], v_cache[li], bias, self_mask)
        x = x + layer["wo"](attn.reshape(B, T, hp.n_head * hp.head_dim_v))

        # cross attention (no positional bias)
        h = rms_norm(x, layer["cross_norm"], hp.rms_eps)
        qc = layer["wq_cross"](h).reshape(B, T, hp.n_head, hp.head_dim)
        attn = _attn(qc, cache.cross_k[li], cache.cross_v[li], None, cross_mask)
        x = x + layer["wo_cross"](attn.reshape(B, T, hp.n_head * hp.head_dim_v))

        x = _ffn(hp, layer, x)

    x = rms_norm(x, params["output_norm"], hp.rms_eps)
    new_cache = T5Cache(k_cache, v_cache, cache.cross_k, cache.cross_v,
                        cache.enc_len)
    if return_hidden:
        return x.astype(jnp.float32), new_cache
    if params["output"] is not None:
        logits = params["output"](x)
    else:
        logits = jnp.dot(x, params["tok_embd"].T.astype(x.dtype))
    return logits.astype(jnp.float32), new_cache


def encoder_forward(
    hp: HParams,
    params: Params,
    tokens: jax.Array,
    positions: jax.Array,
    cache,
    cache_offset,
    return_hidden: bool = False,
) -> tuple[jax.Array, object]:
    """t5encoder arch: encoder-only embedding model (llm_build_t5_enc as a
    standalone graph); conforms to the standard forward signature."""
    B, T = tokens.shape
    enc_len = jnp.full((B,), T, jnp.int32)
    hidden = encode(hp, params, tokens, enc_len)
    return hidden.astype(jnp.float32), cache
