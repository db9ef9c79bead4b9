"""Context / sequence state serialization.

Reference: llama_state_* (llama.h:770-881, impl src/llama-context.cpp:
2311-2569) — three levels: whole-context blobs, session files with a token
prefix (magic GGSN), and per-sequence files (GGSQ) behind the server's
/slots/:id?action=save|restore. Here: npz files carrying the live KV-cache
prefix + token history; restore re-uploads into the fixed-shape cache (the
≡ of kv-cache state_read re-finding slots).
"""

from __future__ import annotations

import numpy as np

MAGIC = "tpullm-state-v1"


def _meta(hp) -> dict:
    return {
        "arch": hp.arch,
        "n_layer": hp.n_layer,
        "n_head_kv": hp.n_head_kv,
        "head_dim": hp.head_dim,
        "head_dim_v": hp.head_dim_v,
    }


def save_state(engine, path, tokens: list[int] | None = None):
    """Save the engine's sequence state (single-stream Engine, batch row 0).

    KV payload stored as f32 (lossless from bf16; npz has no bf16 dtype).
    iSWA engines additionally store the SWA ring + slot positions."""
    from .kvcache import SWACache

    n = int(engine.n_past)
    extra = {}
    cache = engine.cache
    if isinstance(cache, SWACache):
        k = np.asarray(cache.full_k[:, 0, :, :n], dtype=np.float32)
        v = np.asarray(cache.full_v[:, 0, :, :n], dtype=np.float32)
        extra = {
            "swa_k": np.asarray(cache.swa_k[:, 0], dtype=np.float32),
            "swa_v": np.asarray(cache.swa_v[:, 0], dtype=np.float32),
            "slot_pos": np.asarray(cache.slot_pos[0]),
            "swa_window": cache.window,
        }
    elif hasattr(cache, "c"):  # MLACache: the latent plane IS the state
        k = np.asarray(cache.c[:, 0, :, :n], dtype=np.float32)
        v = np.zeros((0,), dtype=np.float32)
        extra = {"mla_kvr": cache.kvr}
    else:
        k = np.asarray(cache.k[:, 0, :, :n], dtype=np.float32)  # [L, Hkv, n, Dk]
        v = np.asarray(cache.v[:, 0, :, :n], dtype=np.float32)
    np.savez_compressed(
        path, magic=MAGIC, n_past=n, k=k, v=v,
        tokens=np.asarray(tokens if tokens is not None else [], dtype=np.int64),
        **{f"meta_{key}": val for key, val in _meta(engine.hp).items()},
        **extra,
    )
    return path


def load_state(engine, path) -> list[int]:
    """Restore a saved sequence into the engine; returns the token prefix."""
    import jax.numpy as jnp

    from .kvcache import SWACache

    z = np.load(path, allow_pickle=False)
    _check(engine.hp, z)
    n = int(z["n_past"])
    if n > engine.max_seq:
        raise ValueError(f"saved state ({n} tokens) exceeds max_seq {engine.max_seq}")
    if "swa_k" in z.files:
        cache = engine.cache
        if not isinstance(cache, SWACache):
            raise ValueError("iSWA state file needs an iSWA engine")
        if int(z["swa_window"]) != cache.window or (
            z["swa_k"].shape[2] != cache.ring_len
        ):
            raise ValueError("iSWA state geometry mismatch (window/ring)")
        fk, fv = cache.full_k, cache.full_v
        if n:
            fk = fk.at[:, 0, :, :n].set(jnp.asarray(z["k"], fk.dtype))
            fv = fv.at[:, 0, :, :n].set(jnp.asarray(z["v"], fv.dtype))
        engine.cache = SWACache(
            fk, fv,
            cache.swa_k.at[:, 0].set(jnp.asarray(z["swa_k"], cache.swa_k.dtype)),
            cache.swa_v.at[:, 0].set(jnp.asarray(z["swa_v"], cache.swa_v.dtype)),
            cache.slot_pos.at[0].set(jnp.asarray(z["slot_pos"], jnp.int32)),
            cache.layer_map, cache.window,
        )
    elif "mla_kvr" in z.files:
        cache = engine.cache
        if not hasattr(cache, "c") or int(z["mla_kvr"]) != cache.kvr:
            raise ValueError("MLA state file needs a matching MLACache engine")
        if n:
            c = cache.c.at[:, 0, :, :n].set(
                jnp.asarray(z["k"], cache.c.dtype))
            engine.cache = type(cache)(c, cache.kvr)
    else:
        _write_rows(engine, 0, z["k"], z["v"], n)
    engine.n_past = n
    return [int(t) for t in z["tokens"]]


def save_slot_state(bengine, slot: int, path, tokens: list[int] | None = None):
    """Per-slot state save (≡ SERVER_TASK_TYPE_SLOT_SAVE / GGSQ)."""
    if not hasattr(bengine.cache, "k"):
        raise ValueError(
            "slot save/restore supports unified bf16 KV caches only "
            f"(cache is {type(bengine.cache).__name__})"
        )
    n = int(bengine.n_past[slot])
    k = np.asarray(bengine.cache.k[:, slot, :, :n], dtype=np.float32)
    v = np.asarray(bengine.cache.v[:, slot, :, :n], dtype=np.float32)
    np.savez_compressed(
        path, magic=MAGIC, n_past=n, k=k, v=v,
        tokens=np.asarray(tokens if tokens is not None else [], dtype=np.int64),
        **{f"meta_{key}": val for key, val in _meta(bengine.hp).items()},
    )
    return path


def load_slot_state(bengine, slot: int, path) -> list[int]:
    if not hasattr(bengine.cache, "k"):
        raise ValueError(
            "slot save/restore supports unified bf16 KV caches only "
            f"(cache is {type(bengine.cache).__name__})"
        )
    z = np.load(path, allow_pickle=False)
    _check(bengine.hp, z)
    n = int(z["n_past"])
    if n > bengine.max_seq:
        raise ValueError(f"saved state ({n} tokens) exceeds max_seq")
    _write_rows(bengine, slot, z["k"], z["v"], n)
    bengine.n_past[slot] = n
    return [int(t) for t in z["tokens"]]


def _check(hp, z):
    if str(z["magic"]) != MAGIC:
        raise ValueError("not a tpullm state file")
    meta = _meta(hp)
    for key, val in meta.items():
        got = z[f"meta_{key}"]
        got = str(got) if key == "arch" else int(got)
        if got != val:
            raise ValueError(f"state/model mismatch on {key}: {got} != {val}")


def _write_rows(engine, row: int, k: np.ndarray, v: np.ndarray, n: int):
    import jax.numpy as jnp

    cache = engine.cache
    if n:
        kk = cache.k.at[:, row, :, :n].set(jnp.asarray(k, dtype=cache.k.dtype))
        vv = cache.v.at[:, row, :, :n].set(jnp.asarray(v, dtype=cache.v.dtype))
        engine.cache = type(cache)(kk, vv)
