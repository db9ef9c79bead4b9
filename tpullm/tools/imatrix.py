"""tpullm-imatrix: importance-matrix collection for quantization.

Reference: tools/imatrix (imatrix.cpp collect_imatrix via cb_eval hooks +
GGUF output with <weight>.in_sum2 / <weight>.counts tensors and
imatrix.chunk_count/chunk_size metadata; consumed by llama-quant.cpp).

XLA-native collection: instead of per-node eval callbacks, a jitted
"instrumented forward" of the llama family returns, alongside the logits,
the per-channel sums of squared activations feeding every weight matrix —
one reduction per linear, fused into the forward program.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def _instrumented_llama_forward(hp, params, tokens, positions, cache, offset):
    """llama.forward with per-linear input power accumulation.

    Returns (stats dict name→[n_in] f32 sums of squares over all tokens,
    updated cache)."""
    import jax
    import jax.numpy as jnp

    from ..models.llama import attn_block, Params  # noqa: F401
    from ..ops.attention import causal_mask
    from ..ops.norms import rms_norm

    B, T = tokens.shape
    x = params["tok_embd"][tokens]
    offsets = jnp.broadcast_to(
        jnp.asarray(offset).reshape(-1), (B,)
    ).astype(jnp.int32)
    kv_len = jnp.asarray(offset) + T
    mask = causal_mask(positions, cache.max_len, kv_len, hp.sliding_window)

    def sq(h):  # [B,T,E] → [E] sum of squares
        hf = h.astype(jnp.float32)
        return jnp.sum(hf * hf, axis=(0, 1))

    stats = {}
    from ..ops.rope import apply_rope

    for li, layer in enumerate(params["layers"]):
        p = f"blk.{li}."
        h = rms_norm(x, layer["attn_norm"], hp.rms_eps)
        stats[p + "attn_q.weight"] = sq(h)
        stats[p + "attn_k.weight"] = stats[p + "attn_q.weight"]
        stats[p + "attn_v.weight"] = stats[p + "attn_q.weight"]
        q = layer["wq"](h).reshape(B, T, hp.n_head, hp.head_dim)
        k = layer["wk"](h).reshape(B, T, hp.n_head_kv, hp.head_dim)
        v = layer["wv"](h).reshape(B, T, hp.n_head_kv, hp.head_dim_v)
        if layer["q_norm"] is not None:
            q = rms_norm(q, layer["q_norm"], hp.rms_eps)
        if layer["k_norm"] is not None:
            k = rms_norm(k, layer["k_norm"], hp.rms_eps)
        q = apply_rope(q, positions, hp.rope)
        k = apply_rope(k, positions, hp.rope)
        cache = cache.update(
            li, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), offset
        )
        from ..ops.attention import attention

        scale = hp.attn_scale if hp.attn_scale is not None else hp.head_dim ** -0.5
        k_all, v_all = cache.kv(li)
        attn_out = attention(
            q, k_all, v_all, mask, scale,
            offsets=offsets, sliding_window=hp.sliding_window,
        ).reshape(B, T, hp.n_head * hp.head_dim_v)
        stats[p + "attn_output.weight"] = sq(attn_out)
        x = x + layer["wo"](attn_out)

        h = rms_norm(x, layer["ffn_norm"], hp.rms_eps)
        stats[p + "ffn_gate.weight"] = sq(h)
        stats[p + "ffn_up.weight"] = stats[p + "ffn_gate.weight"]
        gate = layer["w_gate"](h)
        up = layer["w_up"](h)
        act = jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
        stats[p + "ffn_down.weight"] = sq(act)
        x = x + layer["w_down"](act)

    x = rms_norm(x, params["output_norm"], hp.rms_eps)
    if params["output"] is not None:
        stats["output.weight"] = sq(x)
    return stats, cache


def collect_imatrix(model_path, tokens: list[int], chunk_size: int = 512,
                    verbose: bool = True) -> dict:
    """Accumulate activation statistics over `tokens` in chunk_size windows.

    Returns {"sums": {wname: np[n_in] f64}, "counts": {wname: int},
             "chunk_size", "chunk_count"}.
    """
    import functools

    import jax
    import jax.numpy as jnp

    from ..gguf.reader import GGUFReader
    from ..models.registry import get_arch, load_hparams
    from ..models import llama as llama_mod
    from ..runtime.kvcache import KVCache

    reader = GGUFReader(model_path)
    hp = load_hparams(reader)
    arch = get_arch(hp.arch)
    if arch.forward is not llama_mod.forward:
        raise NotImplementedError(
            f"imatrix collection currently supports the llama family, got {hp.arch}"
        )
    params = arch.build_params(reader, hp, mode="dense")

    @functools.partial(jax.jit, donate_argnames=("cache",))
    def step(params, toks, positions, cache):
        return _instrumented_llama_forward(
            hp, params, toks, positions, cache, jnp.int32(0)
        )

    sums: dict[str, np.ndarray] = {}
    counts: dict[str, int] = {}
    n_chunks = 0
    for start in range(0, len(tokens) - chunk_size + 1, chunk_size):
        window = tokens[start : start + chunk_size]
        cache = KVCache.new(hp, 1, chunk_size, jnp.bfloat16)
        toks = jnp.asarray(np.asarray(window, np.int32)[None])
        pos = jnp.asarray(np.arange(chunk_size, dtype=np.int32)[None])
        stats, _ = step(params, toks, pos, cache)
        for name, v in stats.items():
            arr = np.asarray(v, dtype=np.float64)
            if name in sums:
                sums[name] += arr
                counts[name] += chunk_size
            else:
                sums[name] = arr
                counts[name] = chunk_size
        n_chunks += 1
        if verbose:
            print(f"imatrix: chunk {n_chunks} done", file=sys.stderr)
    if n_chunks == 0:
        raise ValueError(f"need at least {chunk_size} tokens, got {len(tokens)}")
    return {"sums": sums, "counts": counts, "chunk_size": chunk_size,
            "chunk_count": n_chunks}


def save_imatrix(path, stats: dict, dataset: str = ""):
    """Write the reference-compatible imatrix GGUF (<w>.in_sum2/<w>.counts)."""
    from ..gguf.writer import GGUFWriter

    w = GGUFWriter(path, architecture="imatrix")
    w.add_kv("general.type", "imatrix")
    w.add_kv("imatrix.chunk_count", int(stats["chunk_count"]))
    w.add_kv("imatrix.chunk_size", int(stats["chunk_size"]))
    w.add_kv("imatrix.datasets", [dataset or "unknown"])
    for name, sums in stats["sums"].items():
        w.add_tensor(name + ".in_sum2", np.asarray(sums, dtype=np.float32))
        w.add_tensor(name + ".counts",
                     np.asarray([stats["counts"][name]], dtype=np.float32))
    w.write()
    return str(path)


def load_imatrix(path) -> dict[str, np.ndarray]:
    """Load {weight name: mean squared activation [n_in]} from imatrix GGUF."""
    from ..gguf.reader import GGUFReader

    r = GGUFReader(path)
    out: dict[str, np.ndarray] = {}
    for name, info in r.tensors.items():
        if not name.endswith(".in_sum2"):
            continue
        wname = name[: -len(".in_sum2")]
        sums = info.to_numpy().reshape(-1).astype(np.float64)
        cname = wname + ".counts"
        count = float(r.tensors[cname].to_numpy().reshape(-1)[0]) if cname in r.tensors else 1.0
        out[wname] = (sums / max(count, 1.0)).astype(np.float32)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(prog="tpullm-imatrix")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-f", "--file", required=True, help="calibration text file")
    ap.add_argument("-o", "--output", default="imatrix.gguf")
    ap.add_argument("--chunk-size", type=int, default=512)
    args = ap.parse_args(argv)

    from ..gguf.reader import GGUFReader
    from .. import tokenizer as tokenizer_mod

    text = open(args.file, encoding="utf-8", errors="replace").read()
    tok = tokenizer_mod.from_gguf(GGUFReader(args.model))
    tokens = tok.tokenize(text, add_special=True)
    print(f"tokenized {len(tokens)} tokens", file=sys.stderr)
    stats = collect_imatrix(args.model, tokens, chunk_size=args.chunk_size)
    save_imatrix(args.output, stats, dataset=args.file)
    print(f"wrote {args.output} ({stats['chunk_count']} chunks)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
