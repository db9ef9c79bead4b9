"""Measure the north-star quality numbers and publish them to BASELINE.json.

The reference publishes wikitext-2 ΔPPL per quant level on Llama-3-8B
(tools/perplexity/README.md:38-70). This sandbox has zero egress — no real
8B checkpoint and no wikitext download — so the measured protocol is run on
a REAL (trained-here) byte-level model over a locally harvested English
corpus (installed-package docstrings + repo/reference markdown):

  1. harvest corpus, hold out the tail for evaluation
  2. train a small llama (your `training/train.py` AdamW loop) from scratch
  3. export f16 GGUF, requantize with tools/quantize at each ftype
  4. run tools/perplexity on the held-out split for every ftype
  5. write ΔPPL vs F16 (+ bench throughput, if provided) into
     BASELINE.json["published"], with an explicit note for the
     hardware/network-blocked 8B wikitext-2 row

The quant codecs are bit-exact against ggml-quants.c (tests/test_quant*),
so the per-ftype Δ ordering measured here exercises the identical
quantization arithmetic the reference's table does.

Run:  python -m tpullm.tools.publish_baselines [--steps N] [--out BASELINE.json]
"""

from __future__ import annotations

import argparse
import glob
import io
import json
import math
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# quant ftypes to measure, matching the reference's published table rows
FTYPES = ["Q8_0", "Q6_K", "Q5_K_M", "Q4_K_M", "Q4_0"]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# -- corpus -------------------------------------------------------------------


def _docstring_corpus(max_bytes: int) -> str:
    """English prose from installed packages' docstrings (deterministic
    module order), plus local markdown."""
    import importlib
    import inspect
    import pkgutil

    chunks: list[str] = []
    total = 0

    def add(text: str | None):
        nonlocal total
        if not text:
            return False
        text = text.strip()
        if len(text) < 200:
            return False
        chunks.append(text)
        total += len(text)
        return total >= max_bytes

    for pat in (os.path.join(REPO, "docs", "**", "*.md"),
                os.path.join(REPO, "*.md"),
                "/root/reference/docs/**/*.md",
                "/root/reference/*.md"):
        for p in sorted(glob.glob(pat, recursive=True)):
            try:
                if add(open(p, encoding="utf-8", errors="ignore").read()):
                    return "\n\n".join(chunks)
            except OSError:
                pass

    for pkg_name in ("numpy", "scipy", "torch", "jax", "pandas",
                     "sklearn", "matplotlib", "optax", "flax"):
        try:
            pkg = importlib.import_module(pkg_name)
        except Exception:
            continue
        mods = [pkg_name]
        if hasattr(pkg, "__path__"):
            mods += [m.name for m in pkgutil.iter_modules(pkg.__path__,
                                                          pkg_name + ".")]
        for mname in sorted(mods):
            try:
                mod = importlib.import_module(mname)
            except Exception:
                continue
            if add(inspect.getdoc(mod)):
                return "\n\n".join(chunks)
            for attr in sorted(dir(mod)):
                if attr.startswith("_"):
                    continue
                try:
                    doc = inspect.getdoc(getattr(mod, attr))
                except Exception:
                    continue
                if add(doc):
                    return "\n\n".join(chunks)
    return "\n\n".join(chunks)


def build_corpus(max_bytes: int = 4_000_000) -> tuple[str, str]:
    text = _docstring_corpus(max_bytes)
    split = int(len(text) * 0.9)
    return text[:split], text[split:]


# -- model --------------------------------------------------------------------


def make_init_gguf(path: str, *, n_layer=8, n_embd=512, n_head=8,
                   n_head_kv=4, n_ff=1536, n_ctx=512, seed=0) -> str:
    """Random-init llama GGUF with a true byte-level SPM vocab, so the
    trained model reads arbitrary text through byte fallback."""
    from ..gguf.constants import GGMLType  # noqa: F401
    from ..gguf.writer import GGUFWriter
    from ..tokenizer.vocab import TokenType

    rng = np.random.default_rng(seed)
    tokens = ["<unk>", "<s>", "</s>"] + [f"<0x{i:02X}>" for i in range(256)]
    types = [TokenType.UNKNOWN, TokenType.CONTROL, TokenType.CONTROL] + \
        [TokenType.BYTE] * 256
    scores = [0.0] * len(tokens)
    n_vocab = len(tokens)
    head_dim = n_embd // n_head

    w = GGUFWriter(path, architecture="llama")
    w.add_kv("general.name", "tpullm-baseline-bytelm")
    w.add_kv("llama.block_count", n_layer)
    w.add_kv("llama.context_length", n_ctx)
    w.add_kv("llama.embedding_length", n_embd)
    w.add_kv("llama.feed_forward_length", n_ff)
    w.add_kv("llama.attention.head_count", n_head)
    w.add_kv("llama.attention.head_count_kv", n_head_kv)
    w.add_kv("llama.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_kv("llama.rope.freq_base", 10000.0)
    w.add_kv("llama.rope.dimension_count", head_dim)
    w.add_kv("llama.vocab_size", n_vocab)
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", tokens)
    w.add_kv("tokenizer.ggml.scores", np.asarray(scores, dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.asarray(types, dtype=np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.unknown_token_id", 0)
    w.add_kv("tokenizer.ggml.add_bos_token", True)

    def rand(shape, scale):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    s = 0.02
    w.add_tensor("token_embd.weight", rand((n_vocab, n_embd), s))
    for i in range(n_layer):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", np.ones(n_embd, np.float32))
        w.add_tensor(p + "attn_q.weight", rand((n_embd, n_embd), s))
        w.add_tensor(p + "attn_k.weight", rand((n_head_kv * head_dim, n_embd), s))
        w.add_tensor(p + "attn_v.weight", rand((n_head_kv * head_dim, n_embd), s))
        w.add_tensor(p + "attn_output.weight", rand((n_embd, n_embd), s))
        w.add_tensor(p + "ffn_norm.weight", np.ones(n_embd, np.float32))
        w.add_tensor(p + "ffn_gate.weight", rand((n_ff, n_embd), s))
        w.add_tensor(p + "ffn_up.weight", rand((n_ff, n_embd), s))
        w.add_tensor(p + "ffn_down.weight", rand((n_embd, n_ff), s))
    w.add_tensor("output_norm.weight", np.ones(n_embd, np.float32))
    w.add_tensor("output.weight", rand((n_vocab, n_embd), s))
    w.write()
    return path


def export_trained_gguf(reader, params, dst: str):
    """Write trained llama params back out as an f16 GGUF (same vocab KVs)."""
    from ..gguf.constants import GGMLType
    from ..gguf.writer import GGUFWriter

    w = GGUFWriter(dst)
    for key, val in reader.metadata.items():
        if key == "general.architecture":
            continue
        w.add_kv(key, val)
    w.add_kv("general.architecture", "llama")

    def put(name, arr, transpose=False):
        a = np.asarray(arr, dtype=np.float32)
        if transpose:
            a = np.ascontiguousarray(a.T)  # DenseLinear w is [in, out]
        t = GGMLType.F16 if a.ndim >= 2 else GGMLType.F32
        w.add_tensor(name, a, t)

    put("token_embd.weight", params["tok_embd"])
    for i, layer in enumerate(params["layers"]):
        p = f"blk.{i}."
        put(p + "attn_norm.weight", layer["attn_norm"])
        put(p + "attn_q.weight", layer["wq"].w, transpose=True)
        put(p + "attn_k.weight", layer["wk"].w, transpose=True)
        put(p + "attn_v.weight", layer["wv"].w, transpose=True)
        put(p + "attn_output.weight", layer["wo"].w, transpose=True)
        put(p + "ffn_norm.weight", layer["ffn_norm"])
        put(p + "ffn_gate.weight", layer["w_gate"].w, transpose=True)
        put(p + "ffn_up.weight", layer["w_up"].w, transpose=True)
        put(p + "ffn_down.weight", layer["w_down"].w, transpose=True)
    put("output_norm.weight", params["output_norm"])
    put("output.weight", params["output"].w, transpose=True)
    w.write()
    return dst


def train_byte_lm(init_gguf: str, train_text: str, steps: int,
                  batch: int = 8, seq: int = 512, lr: float = 3e-4):
    """Train from the random init with the repo's AdamW loop; returns the
    engine (for its reader/tokenizer) and the trained params."""
    import jax.numpy as jnp

    from ..runtime import Engine
    from ..training.train import OptimConfig, train_epoch

    eng = Engine(init_gguf, mode="dense", dtype=jnp.float32, max_seq=seq,
                 kv_dtype=jnp.float32)
    ids = np.asarray(eng.tokenizer.tokenize(train_text, add_special=False),
                     dtype=np.int32)
    log(f"train corpus: {len(ids)} tokens")
    per = batch * seq
    rng = np.random.default_rng(0)

    def batches():
        for _ in range(steps):
            starts = rng.integers(0, len(ids) - seq - 1, size=batch)
            yield np.stack([ids[s:s + seq] for s in starts])

    t0 = time.time()
    params, losses = train_epoch(
        eng.arch.forward, eng.hp, eng.params, batches(),
        OptimConfig(lr=lr),
    )
    log(f"trained {steps} steps ({steps * per} tokens) in "
        f"{time.time() - t0:.0f}s; loss {losses[0]:.3f} -> {losses[-1]:.3f}")
    return eng, params


# -- measurement --------------------------------------------------------------


def measure_ppl(gguf_path: str, eval_text: str, n_ctx: int = 512,
                max_windows: int | None = 40, mode: str = "auto",
                kld_base: str | None = None, kld_windows: int = 12):
    """PPL over the eval split, plus (when kld_base is given) mean token
    KLD + top-1 agreement vs the recorded F16 logits (≡ perplexity
    --kl-divergence, tools/perplexity/README.md:60-70)."""
    import jax.numpy as jnp

    from ..runtime import Engine
    from .perplexity import kld_vs_base, perplexity

    eng = Engine(gguf_path, mode=mode, dtype=jnp.float32, max_seq=n_ctx,
                 kv_dtype=jnp.float32)
    ppl, n_tok = perplexity(eng, eval_text, n_ctx=n_ctx,
                            max_windows=max_windows)
    kld = None
    if kld_base is not None:
        kld = kld_vs_base(eng, eval_text, kld_base, max_windows=kld_windows)
    return ppl, n_tok, kld


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--corpus-bytes", type=int, default=8_000_000)
    ap.add_argument("--max-windows", type=int, default=64)
    ap.add_argument("--kld-windows", type=int, default=12)
    ap.add_argument("--workdir", default=os.path.join(REPO, ".cache", "baseline"))
    ap.add_argument("--out", default=os.path.join(REPO, "BASELINE.json"))
    ap.add_argument("--ftypes", default=",".join(FTYPES))
    args = ap.parse_args(argv)

    # train + export need the unfused per-projection params (the fused
    # QKV/gate-up decode layout has no wq/wk/wv to write back out)
    os.environ["TPULLM_FUSE_QKV"] = "0"
    os.makedirs(args.workdir, exist_ok=True)
    train_text, eval_text = build_corpus(args.corpus_bytes)
    log(f"corpus: {len(train_text)} train bytes, {len(eval_text)} eval bytes")

    init = os.path.join(args.workdir, "init.gguf")
    make_init_gguf(init)
    eng, params = train_byte_lm(init, train_text, args.steps)

    f16 = os.path.join(args.workdir, "bytelm-f16.gguf")
    export_trained_gguf(eng.reader, params, f16)
    log(f"exported {f16}")

    from .quantize import main as quantize_main

    results: dict[str, dict] = {}
    ppl_f16, n_tok, _ = measure_ppl(f16, eval_text,
                                    max_windows=args.max_windows,
                                    mode="dense")
    log(f"F16 ppl {ppl_f16:.4f} over {n_tok} tokens")
    results["F16"] = {"ppl": round(ppl_f16, 4), "tokens": n_tok}

    # record the F16 logits once for the per-ftype KLD column
    # (≡ perplexity --kl-divergence-base)
    import jax.numpy as jnp

    from ..runtime import Engine
    from .perplexity import save_logits_base

    base = os.path.join(args.workdir, "f16-logits.npz")
    eng_f16 = Engine(f16, mode="dense", dtype=jnp.float32, max_seq=512,
                     kv_dtype=jnp.float32)
    save_logits_base(eng_f16, eval_text, base, max_windows=args.kld_windows)
    del eng_f16

    for ftype in args.ftypes.split(","):
        q = os.path.join(args.workdir, f"bytelm-{ftype.lower()}.gguf")
        quantize_main([f16, q, ftype, "-q"])
        ppl, _, kld = measure_ppl(q, eval_text,
                                  max_windows=args.max_windows,
                                  kld_base=base,
                                  kld_windows=args.kld_windows)
        results[ftype] = {
            "ppl": round(ppl, 4),
            "delta_vs_f16": round(ppl - ppl_f16, 4),
            "kld": round(kld["kld"], 6),
            "same_top_p": round(kld["same_top_p"], 4),
            "size_bytes": os.path.getsize(q),
        }
        log(f"{ftype}: ppl {ppl:.4f} (Δ {ppl - ppl_f16:+.4f}) "
            f"kld {kld['kld']:.6f} top1 {kld['same_top_p']:.4f}")

    ladder = [f for f in args.ftypes.split(",") if f in results]
    deltas = [results[f]["delta_vs_f16"] for f in ladder]
    monotonic = all(a <= b for a, b in zip(deltas, deltas[1:]))
    log(f"ftype ladder {ladder}: deltas {deltas} "
        f"({'monotonic' if monotonic else 'NON-monotonic'})")

    published = {
        "quantization_ppl": {
            "protocol": "trained-here byte-level llama (8L/512d/1536ff) on "
                        "locally harvested English (docstrings+markdown); "
                        "tools/quantize + tools/perplexity, 512-token "
                        "windows; kld = mean token KL vs the F16 logits "
                        "(\u2261 perplexity --kl-divergence)",
            "ladder_monotonic": monotonic,
            "note": "wikitext-2 on Llama-3-8B is blocked in this sandbox "
                    "(zero egress: no checkpoint, no corpus download); the "
                    "quant codecs are bit-exact vs ggml-quants.c "
                    "(tests/test_quant*), so per-ftype deltas exercise the "
                    "identical arithmetic as the reference table",
            "results": results,
        },
    }

    doc = json.load(open(args.out)) if os.path.exists(args.out) else {}
    doc.setdefault("published", {}).update(published)
    json.dump(doc, open(args.out, "w"), indent=1)
    print(json.dumps({"f16_ppl": results["F16"]["ppl"],
                      "monotonic": monotonic,
                      "deltas": {k: v.get("delta_vs_f16") for k, v in
                                 results.items() if k != "F16"},
                      "kld": {k: v.get("kld") for k, v in results.items()
                              if k != "F16"}}))


if __name__ == "__main__":
    main()
