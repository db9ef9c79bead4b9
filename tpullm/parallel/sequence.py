"""Sequence parallelism: ring attention over a device mesh axis.

Not present in the reference (its parallelism is row-split TP + layer
offload); this is the TPU-native long-context scaling axis. Activations are
sharded along the SEQUENCE dimension; each device holds a query chunk and
streams every KV chunk around the ring with `jax.lax.ppermute` while
accumulating attention with the online-softmax merge (the flash-attention
recurrence), so no device ever materializes the full [T, T] score matrix or
the full KV. Causality is enforced per (query-chunk, kv-chunk) pair from
the global chunk indices — ICI traffic is the KV stream only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SEQ_AXIS = "seq"

_NEG = -1e30


def _chunk_attn(q, k, v, scale, q_pos, k_pos):
    """Masked scores of one (q-chunk, kv-chunk) pair.

    q [B,Tq,H,D]; k,v [B,Tk,Hkv,D]; positions are GLOBAL token indices.
    Returns (m [B,H,Tq], l [B,H,Tq], o [B,Tq,H,Dv]) — the flash triple."""
    B, Tq, H, D = q.shape
    Hkv = k.shape[2]
    G = H // Hkv
    qf = q.astype(jnp.float32).reshape(B, Tq, Hkv, G, D)
    kf = k.astype(jnp.float32)
    s = jnp.einsum("bqhgd,bkhd->bhgqk", qf, kf) * scale
    mask = (k_pos[None, :] <= q_pos[:, None])[None, None, None]
    s = jnp.where(mask, s, _NEG)
    m = jnp.max(s, axis=-1)  # [B,Hkv,G,Tq]
    e = jnp.exp(s - m[..., None])
    e = jnp.where(mask, e, 0.0)
    l = e.sum(axis=-1)
    o = jnp.einsum("bhgqk,bkhd->bqhgd", e, v.astype(jnp.float32))
    return m, l, o.reshape(B, Tq, H, v.shape[-1])


def _merge(acc, nxt):
    """Online-softmax merge of two flash triples."""
    m1, l1, o1 = acc
    m2, l2, o2 = nxt
    m = jnp.maximum(m1, m2)
    a1 = jnp.exp(m1 - m)
    a2 = jnp.exp(m2 - m)
    l = l1 * a1 + l2 * a2
    B, Hkv, G, Tq = m.shape
    s1 = a1.reshape(B, Hkv * G, Tq).transpose(0, 2, 1)[..., None]
    s2 = a2.reshape(B, Hkv * G, Tq).transpose(0, 2, 1)[..., None]
    return m, l, o1 * s1 + o2 * s2


def ring_attention_local(q, k, v, scale, axis_name: str = SEQ_AXIS):
    """SPMD body (call under shard_map): q,k,v are the LOCAL sequence chunk
    [B, T/P, H(:kv), D]; returns the local attention output [B, T/P, H, Dv].

    KV chunks rotate the ring P−1 times; the online-softmax accumulator
    makes the result exact (≡ single-device causal attention)."""
    P_ = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    B, T, H, D = q.shape
    Hkv = k.shape[2]
    Dv = v.shape[-1]
    q_pos = idx * T + jnp.arange(T)

    def kv_pos(owner):
        return owner * T + jnp.arange(T)

    acc = _chunk_attn(q, k, v, scale, q_pos, kv_pos(idx))

    def step(i, carry):
        acc, k_c, v_c, owner = carry
        # rotate kv one hop around the ring (ICI neighbour exchange)
        perm = [(s, (s + 1) % P_) for s in range(P_)]
        k_c = jax.lax.ppermute(k_c, axis_name, perm)
        v_c = jax.lax.ppermute(v_c, axis_name, perm)
        owner = (owner - 1) % P_
        nxt = _chunk_attn(q, k_c, v_c, scale, q_pos, kv_pos(owner))
        return _merge(acc, nxt), k_c, v_c, owner

    (m, l, o), _, _, _ = jax.lax.fori_loop(
        0, P_ - 1, step, (acc, k, v, jnp.int32(idx))
    )
    B_, Hkv_, G, Tq = m.shape
    denom = l.reshape(B_, Hkv_ * G, Tq).transpose(0, 2, 1)[..., None]
    return (o / jnp.maximum(denom, 1e-30)).astype(q.dtype)


def ring_attention(q, k, v, mesh: Mesh, scale: float,
                   axis_name: str = SEQ_AXIS):
    """Driver: q,k,v [B, T, H(:kv), D] get sequence-sharded over
    `axis_name`, attention runs as a ring, output comes back sharded the
    same way. T must divide by the axis size."""
    from .pipeline import shard_map_compat

    spec = P(None, axis_name, None, None)
    fn = shard_map_compat(
        functools.partial(ring_attention_local, scale=scale,
                          axis_name=axis_name),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)


def make_seq_mesh(sp: int, devices=None) -> Mesh:
    import numpy as np

    devices = devices if devices is not None else jax.devices()[:sp]
    return Mesh(np.asarray(devices).reshape(sp), (SEQ_AXIS,))
