"""Control vectors: load/apply + generator.

Reference: llama_adapter_cvec (src/llama-adapter.cpp; GGUF tensors
"direction.<layer>" [n_embd] f32, 1-based layers, scaled by strength and
added to each layer's residual stream) and tools/cvector-generator
(cvector-generator.cpp: per-layer hidden states of positive vs negative
prompts → mean-diff or PCA direction).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def load_control_vector(path, n_layer: int, strength: float = 1.0) -> np.ndarray:
    """direction.N tensors → [n_layer, n_embd] f32 (missing layers zero)."""
    from ..gguf.reader import GGUFReader

    r = GGUFReader(path)
    dirs = {}
    n_embd = None
    for name, info in r.tensors.items():
        if not name.startswith("direction."):
            continue
        layer = int(name.split(".")[1])  # 1-based (layer 0 is the embedding)
        vec = info.to_numpy().reshape(-1).astype(np.float32)
        n_embd = len(vec) if n_embd is None else n_embd
        if len(vec) != n_embd:
            raise ValueError(f"{name}: inconsistent n_embd")
        dirs[layer] = dirs.get(layer, 0.0) + vec
    if not dirs:
        raise ValueError(f"no direction tensors in {path}")
    out = np.zeros((n_layer, n_embd), dtype=np.float32)
    for layer, vec in dirs.items():
        if 1 <= layer <= n_layer:
            out[layer - 1] = vec * strength
    r.close()
    return out


def save_control_vector(path, directions: np.ndarray, arch: str = "controlvector"):
    """directions: [n_layer, n_embd]; written as direction.1..direction.N."""
    from ..gguf.writer import GGUFWriter

    w = GGUFWriter(path, architecture=arch)
    w.add_kv("general.type", "controlvector")
    for i, vec in enumerate(directions):
        if np.any(vec):
            w.add_tensor(f"direction.{i + 1}", np.asarray(vec, dtype=np.float32))
    w.write()
    return str(path)


# ---------------------------------------------------------------------------
# generation: per-layer hidden-state capture over prompt pairs
# ---------------------------------------------------------------------------

def _capture_layer_states(engine, text: str) -> np.ndarray:
    """Mean hidden state after every llama layer for a prompt: [n_layer, E].

    The jit-instrumented analog of the reference's cb_eval l_out hook."""
    import functools

    import jax
    import jax.numpy as jnp

    from ..models import llama as llama_mod
    from ..models.llama import attn_block
    from ..ops.attention import causal_mask
    from ..ops.norms import rms_norm
    from ..runtime.kvcache import KVCache

    hp, params = engine.hp, engine.params
    if engine.arch.forward is not llama_mod.forward:
        raise NotImplementedError("cvector generation supports the llama family")

    ids = engine.tokenizer.tokenize(text, add_special=True)
    T = len(ids)

    @functools.partial(jax.jit, static_argnames=("t",))
    def run(params, toks, t):
        B = 1
        cache = KVCache.new(hp, B, t, jnp.bfloat16)
        pos = jnp.arange(t, dtype=jnp.int32)[None]
        x = params["tok_embd"][toks]
        offsets = jnp.zeros((B,), jnp.int32)
        mask = causal_mask(pos, t, t, hp.sliding_window)
        outs = []
        for li, layer in enumerate(params["layers"]):
            x, cache = attn_block(hp, layer, x, pos, cache, li, 0, mask, offsets)
            h = rms_norm(x, layer["ffn_norm"], hp.rms_eps)
            fgu = layer.get("wgu")  # engines fuse gate|up (FusedLinear)
            if fgu is not None:
                gate, up = fgu(h)
            else:
                gate = layer["w_gate"](h)
                up = layer["w_up"](h)
            x = x + layer["w_down"](
                jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
            )
            outs.append(x[0].astype(jnp.float32).mean(axis=0))  # [E]
        return jnp.stack(outs)

    toks = jnp.asarray(np.asarray(ids, np.int32)[None])
    return np.asarray(run(params, toks, T))


def generate_control_vector(
    model_path, positive: list[str], negative: list[str],
    method: str = "mean",  # mean | pca
) -> np.ndarray:
    """[n_layer, n_embd] steering directions from prompt pairs."""
    from ..runtime import Engine

    engine = Engine(model_path, mode="dense")
    pos = np.stack([_capture_layer_states(engine, p) for p in positive])  # [P,L,E]
    neg = np.stack([_capture_layer_states(engine, p) for p in negative])
    diffs = pos.mean(axis=0) - neg.mean(axis=0)  # [L, E]
    if method == "mean":
        dirs = diffs
    elif method == "pca":
        # first principal component of per-pair differences, per layer,
        # sign-aligned with the mean difference (≡ cvector-generator PCA)
        n = min(len(positive), len(negative))
        pair_diffs = pos[:n] - neg[:n]  # [n, L, E]
        L = pair_diffs.shape[1]
        dirs = np.zeros_like(diffs)
        for li in range(L):
            d = pair_diffs[:, li, :]  # [n, E]
            d = d - d.mean(axis=0)
            if n == 1 or not np.any(d):
                dirs[li] = diffs[li]
                continue
            _, _, vt = np.linalg.svd(d, full_matrices=False)
            v = vt[0]
            if np.dot(v, diffs[li]) < 0:
                v = -v
            dirs[li] = v * np.linalg.norm(diffs[li])
    else:
        raise ValueError(method)
    return dirs.astype(np.float32)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="tpullm-cvector-generator")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("--positive-file", required=True,
                    help="file of positive prompts, one per line")
    ap.add_argument("--negative-file", required=True)
    ap.add_argument("-o", "--output", default="control_vector.gguf")
    ap.add_argument("--method", choices=["mean", "pca"], default="pca")
    args = ap.parse_args(argv)
    positive = [l for l in open(args.positive_file).read().splitlines() if l.strip()]
    negative = [l for l in open(args.negative_file).read().splitlines() if l.strip()]
    dirs = generate_control_vector(args.model, positive, negative, args.method)
    save_control_vector(args.output, dirs)
    print(f"wrote {args.output} ({(np.any(dirs, axis=1)).sum()} layer directions)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
