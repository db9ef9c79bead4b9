"""tpullm-finetune: train a GGUF model on a text file, write an updated GGUF.

≡ the reference finetune example (examples/training/finetune.cpp:16-40:
common init → llama_opt_init → llama_opt_epoch per epoch → save
`-checkpoint.gguf`) plus LoRA-only training (the reference trains full
weights; -lora-rank trains zero-init adapter factors instead and writes an
adapter GGUF that tpullm --lora / tpullm-export-lora consume).

Weights load dense (training needs float gradients; ≡ finetune.cpp forcing
mmap off and f32 KV); for quantized outputs run tpullm-quantize on the
result.
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(
        "tpullm-finetune",
        description="finetune a GGUF on a text corpus (full or LoRA-only)")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-f", "--file", required=True, help="training text file")
    ap.add_argument("-o", "--outfile", required=True,
                    help="output GGUF (model, or LoRA adapter with "
                         "--lora-rank)")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--seq-len", type=int, default=128,
                    help="tokens per training window (≡ -c)")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--optimizer", choices=("adamw", "sgd"), default="adamw")
    ap.add_argument("--weight-decay", type=float, default=0.0)
    ap.add_argument("--val-split", type=float, default=0.05,
                    help="fraction of windows held out for eval (back of "
                         "the dataset, ≡ ggml_opt_fit val_split)")
    ap.add_argument("--lora-rank", type=int, default=0,
                    help=">0: train LoRA factors of this rank only")
    ap.add_argument("--lora-alpha", type=float, default=0.0,
                    help="adapter alpha metadata (default: rank)")
    ap.add_argument("--lora-targets", default="attn_q,attn_k,attn_v,attn_output",
                    help="comma-separated tensor stems to adapt")
    ap.add_argument("--outtype", choices=("f32", "f16", "bf16"),
                    default="f16")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    import numpy as np

    from ..gguf.reader import GGUFReader
    from ..models.registry import get_arch, load_hparams
    from .. import tokenizer as tokenizer_mod
    from .data import Dataset
    from .train import OptimConfig, fit

    t0 = time.time()
    reader = GGUFReader(args.model)
    hp = load_hparams(reader)
    arch = get_arch(hp.arch)
    tokenizer = tokenizer_mod.from_gguf(reader)
    params = arch.build_params(reader, hp, mode="dense", dtype=jnp.float32)
    print(f"loaded {hp.arch} ({hp.n_layer}L, {hp.n_embd}E) dense f32 "
          f"in {time.time()-t0:.1f}s", file=sys.stderr)

    text = open(args.file, encoding="utf-8").read()
    ds = Dataset.from_text(tokenizer, text, args.seq_len)
    print(f"dataset: {ds.ndata} windows x {ds.seq_len} tokens",
          file=sys.stderr)

    cfg = OptimConfig(optimizer=args.optimizer, lr=args.lr,
                      weight_decay=args.weight_decay)
    trainable = None
    if args.lora_rank > 0:
        from ..models.lora import LoraLinear

        stems = {s.strip() for s in args.lora_targets.split(",") if s.strip()}
        key_by_stem = {"attn_q": "wq", "attn_k": "wk", "attn_v": "wv",
                       "attn_output": "wo", "ffn_gate": "w_gate",
                       "ffn_up": "w_up", "ffn_down": "w_down"}
        rng = np.random.default_rng(args.seed)
        r = args.lora_rank
        alpha = args.lora_alpha or float(r)
        n_wrapped = 0
        for layer in params["layers"]:
            for stem in stems:
                key = key_by_stem.get(stem)
                if key is None or layer.get(key) is None:
                    continue
                base = layer[key]
                # standard LoRA init: A gaussian, B zero — the adapter
                # starts as an exact no-op on the base model
                a_t = jnp.asarray(
                    rng.standard_normal((base.n_in, r)) / np.sqrt(r),
                    jnp.float32)
                b_t = jnp.zeros((r, base.n_out), jnp.float32)
                layer[key] = LoraLinear(base, a_t, b_t, alpha / r)
                n_wrapped += 1
        if not n_wrapped:
            ap.error(f"no weights matched --lora-targets {args.lora_targets}")
        print(f"LoRA rank {r} on {n_wrapped} projections "
              f"(alpha {alpha})", file=sys.stderr)

        from jax.tree_util import FlattenedIndexKey

        def trainable(path, leaf):
            # LoraLinear flattens positionally as (base, a_t, b_t); the
            # adapter factors are exactly the leaves whose FINAL path step
            # is positional child 1 or 2 of a registered node. Dense bases
            # end at child 0, dict/list-held tensors end at a key/index —
            # so this freezes everything but the factors.
            k = path[-1]
            return (isinstance(k, FlattenedIndexKey)
                    and getattr(k, "key", None) in (1, 2))

    def cb(stats):
        line = (f"epoch {stats['epoch']}: train_loss "
                f"{stats['train_loss']:.4f}")
        if "eval_loss" in stats:
            line += (f"  eval_loss {stats['eval_loss']:.4f}  "
                     f"acc {stats['eval_accuracy']:.3f}")
        print(line, file=sys.stderr)

    params, history = fit(
        arch.forward, hp, params, ds, cfg=cfg, epochs=args.epochs,
        batch_size=args.batch, val_split=args.val_split, seed=args.seed,
        callback=cb, trainable=trainable)

    if args.lora_rank > 0:
        from ..models.lora import LoraLinear, save_lora_gguf

        tensors = {}
        for i, layer in enumerate(params["layers"]):
            for key, stem in (("wq", "attn_q"), ("wk", "attn_k"),
                              ("wv", "attn_v"), ("wo", "attn_output"),
                              ("w_gate", "ffn_gate"), ("w_up", "ffn_up"),
                              ("w_down", "ffn_down")):
                lin = layer.get(key)
                if isinstance(lin, LoraLinear):
                    a = np.asarray(lin.a_t, np.float32).T  # (r, n_in)
                    b = np.asarray(lin.b_t, np.float32).T  # (n_out, r)
                    tensors[f"blk.{i}.{stem}.weight"] = (a, b)
        save_lora_gguf(args.outfile, tensors,
                       alpha=args.lora_alpha or float(args.lora_rank),
                       arch=hp.arch)
        print(f"wrote LoRA adapter {args.outfile} "
              f"({len(tensors)} tensor pairs)", file=sys.stderr)
    else:
        from .save import save_dense_gguf

        save_dense_gguf(reader, hp, params, args.outfile,
                        outtype=args.outtype)
        print(f"wrote {args.outfile} ({args.outtype})", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
