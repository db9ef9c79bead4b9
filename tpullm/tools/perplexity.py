"""tpullm-perplexity: PPL over a text corpus + KL-divergence vs base logits
(≡ reference tools/perplexity).

Computes windowed next-token perplexity exactly like the reference: the corpus
is tokenized, split into n_ctx windows, the first half of each window is
context-only, and NLL is accumulated over the second half.
"""

from __future__ import annotations

import argparse
import json
import math
import sys

import numpy as np


def perplexity(engine, text: str, n_ctx: int = 512, max_windows: int | None = None,
               progress=lambda *a: None):
    import jax.numpy as jnp

    from ..runtime.kvcache import KVCache

    tok = engine.tokenizer
    ids = tok.tokenize(text, add_special=True)
    n_win = len(ids) // n_ctx
    if max_windows:
        n_win = min(n_win, max_windows)
    if n_win == 0:
        raise ValueError(f"corpus too short: {len(ids)} tokens < n_ctx {n_ctx}")

    nll = 0.0
    count = 0
    first_eval = n_ctx // 2
    for wi in range(n_win):
        window = ids[wi * n_ctx : (wi + 1) * n_ctx]
        engine.reset()
        engine.cache = KVCache.new(engine.hp, engine.batch, engine.max_seq, engine.kv_dtype)
        logits = engine.prefill_all_logits(window)
        logp = logits - _logsumexp(logits)
        for t in range(first_eval, n_ctx - 1):
            nll -= float(logp[t, window[t + 1]])
            count += 1
        progress(wi + 1, n_win, math.exp(nll / max(count, 1)))
    return math.exp(nll / count), count


def _logsumexp(x: np.ndarray) -> np.ndarray:
    m = x.max(axis=-1, keepdims=True)
    return m + np.log(np.exp(x - m).sum(axis=-1, keepdims=True))


def kl_divergence(logits_a: np.ndarray, logits_b: np.ndarray) -> float:
    """Mean token KLD between two logit sets [T, V] (≡ --kl-divergence)."""
    la = logits_a - _logsumexp(logits_a)
    lb = logits_b - _logsumexp(logits_b)
    return float(np.mean(np.sum(np.exp(la) * (la - lb), axis=-1)))


def _window_logits(engine, text: str, n_ctx: int, max_windows: int | None):
    """All-position logits per perplexity window, as f16 [n_win, n_ctx, V]."""
    from ..runtime.kvcache import KVCache

    ids = engine.tokenizer.tokenize(text, add_special=True)
    n_win = len(ids) // n_ctx
    if max_windows:
        n_win = min(n_win, max_windows)
    out = []
    for wi in range(n_win):
        window = ids[wi * n_ctx : (wi + 1) * n_ctx]
        engine.reset()
        engine.cache = KVCache.new(engine.hp, engine.batch, engine.max_seq,
                                   engine.kv_dtype)
        out.append(engine.prefill_all_logits(window).astype(np.float16))
    return np.stack(out), ids[: n_win * n_ctx]


def save_logits_base(engine, text: str, path: str, n_ctx: int = 512,
                     max_windows: int | None = None):
    """Record a run's logits for later KLD comparison
    (≡ perplexity --kl-divergence-base output)."""
    logits, ids = _window_logits(engine, text, n_ctx, max_windows)
    np.savez_compressed(path, logits=logits, ids=np.asarray(ids, np.int64),
                        n_ctx=n_ctx)
    return path


def kld_vs_base(engine, text: str, base_path: str,
                max_windows: int | None = None) -> dict:
    """KL divergence of this model's token distributions against a recorded
    base run (≡ perplexity --kl-divergence): quantifies quantization loss
    without needing the base model loaded."""
    z = np.load(base_path)
    n_ctx = int(z["n_ctx"])
    logits, ids = _window_logits(engine, text, n_ctx,
                                 max_windows or z["logits"].shape[0])
    base = z["logits"][: logits.shape[0]]
    if list(z["ids"][: len(ids)]) != list(ids):
        raise ValueError("base run tokenization differs (different model vocab?)")
    base2 = base.reshape(-1, base.shape[-1]).astype(np.float32)
    ours2 = logits.reshape(-1, logits.shape[-1]).astype(np.float32)
    kld = kl_divergence(base2, ours2)
    same_top = float(np.mean(base2.argmax(-1) == ours2.argmax(-1)))
    return {"kld": kld, "same_top_p": same_top,
            "n_tokens": int(ours2.shape[0])}


def choice_logprob(engine, context_ids: list[int], ending_ids: list[int],
                   normalize: bool = True) -> float:
    """Sum (length-normalized) log P(ending | context) — the scoring unit of
    the reference's HellaSwag/Winogrande/MMLU evaluators (perplexity.cpp)."""
    from ..runtime.kvcache import KVCache

    ids = context_ids + ending_ids
    engine.reset()
    if hasattr(engine.cache, "k"):
        engine.cache = KVCache.new(engine.hp, engine.batch, engine.max_seq,
                                   engine.kv_dtype)
    logits = engine.prefill_all_logits(ids)
    logp = logits - _logsumexp(logits)
    total = 0.0
    start = len(context_ids)
    for t in range(start, len(ids)):
        total += float(logp[t - 1, ids[t]])
    return total / len(ending_ids) if normalize else total


def multiple_choice_accuracy(engine, tasks: list[dict],
                             progress=lambda *a: None) -> float:
    """tasks: [{"context": str, "endings": [str...], "label": int}] → accuracy
    (≡ perplexity.cpp hellaswag_score / multiple_choice_score)."""
    tok = engine.tokenizer
    correct = 0
    for i, task in enumerate(tasks):
        ctx_ids = tok.tokenize(task["context"], add_special=True)
        scores = []
        for ending in task["endings"]:
            full = tok.tokenize(task["context"] + ending, add_special=True)
            ending_ids = full[len(ctx_ids):]
            if not ending_ids:  # ending merged into context tokens entirely
                scores.append(float("-inf"))
                continue
            scores.append(choice_logprob(engine, full[: len(ctx_ids)], ending_ids))
        if int(np.argmax(scores)) == int(task["label"]):
            correct += 1
        progress(i + 1, len(tasks), correct / (i + 1))
    return correct / len(tasks)


def main(argv=None):
    ap = argparse.ArgumentParser(description="Perplexity over a text file")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-f", "--file", required=True)
    ap.add_argument("-c", "--ctx", type=int, default=512)
    ap.add_argument("--max-windows", type=int, default=None)
    ap.add_argument("--mode", default="auto")
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--multiple-choice", action="store_true",
                    help="treat FILE as jsonl tasks "
                         '{"context","endings","label"} (hellaswag-style)')
    ap.add_argument("--kl-divergence-base", metavar="NPZ",
                    help="record this run's logits to NPZ for later KLD runs")
    ap.add_argument("--kl-divergence", metavar="NPZ",
                    help="compare this run's logits against a recorded base")
    args = ap.parse_args(argv)

    from ..runtime import Engine

    engine = Engine(args.model, mode=args.mode, max_seq=max(args.ctx, 512))
    if args.kl_divergence_base:
        text = open(args.file, encoding="utf-8", errors="replace").read()
        save_logits_base(engine, text, args.kl_divergence_base,
                         n_ctx=args.ctx, max_windows=args.max_windows)
        print(f"logits base saved to {args.kl_divergence_base}")
        return 0
    if args.kl_divergence:
        text = open(args.file, encoding="utf-8", errors="replace").read()
        res = kld_vs_base(engine, text, args.kl_divergence,
                          max_windows=args.max_windows)
        print(json.dumps(res) if args.json else
              f"KLD = {res['kld']:.6f}  same-top = {res['same_top_p']:.4f} "
              f"over {res['n_tokens']} tokens")
        return 0
    if args.multiple_choice:
        tasks = [json.loads(l) for l in open(args.file) if l.strip()]
        acc = multiple_choice_accuracy(
            engine, tasks,
            progress=lambda i, n, a: print(f"[{i}/{n}] acc={a:.3f}",
                                           file=sys.stderr, flush=True),
        )
        print(json.dumps({"accuracy": acc, "n_tasks": len(tasks)})
              if args.json else f"accuracy = {acc:.4f} over {len(tasks)} tasks")
        return 0
    text = open(args.file, encoding="utf-8", errors="replace").read()

    def prog(i, n, ppl):
        print(f"[{i}/{n}] ppl={ppl:.4f}", file=sys.stderr, flush=True)

    ppl, n_tokens = perplexity(engine, text, n_ctx=args.ctx,
                               max_windows=args.max_windows, progress=prog)
    if args.json:
        print(json.dumps({"ppl": ppl, "n_tokens": n_tokens, "n_ctx": args.ctx}))
    else:
        print(f"PPL = {ppl:.4f} over {n_tokens} tokens (n_ctx={args.ctx})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
