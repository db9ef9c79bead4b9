"""PEFT LoRA adapter → GGUF adapter converter (tpullm-convert-lora).

Reference behavior: /root/reference/convert_lora_to_gguf.py — reads a PEFT
checkout (adapter_config.json + adapter_model.safetensors/.bin), pairs each
module's lora_A/lora_B factors, maps the HF module path to the GGUF tensor
name through the same name mapping the HF model converter uses, and writes a
GGUF with general.type="adapter", adapter.type="lora", adapter.lora.alpha,
and "<base>.lora_a"/"<base>.lora_b" tensor pairs that
tpullm.models.lora.load_lora_gguf (≡ llama_adapter_lora_init) consumes.

Differences from the reference, by design:
- zero-egress: the base model's config.json must be local (--base dir, or
  adapter_config.json's base_model_name_or_path when it is a local path);
  no HuggingFace download.
- aLoRA invocation strings are tokenized only when the base dir carries a
  local tokenizer (reference uses AutoTokenizer.from_pretrained); explicit
  alora_invocation_tokens in adapter_config.json always work.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

from ..gguf.constants import GGMLType
from ..gguf.writer import GGUFWriter
from .convert_hf import ARCH_MAP, PERMUTE_QK_ARCHS, _permute_qk, map_tensor_name


def _load_adapter_tensors(lora_dir: str) -> dict[str, np.ndarray]:
    """adapter_model.safetensors (preferred) or adapter_model.bin → numpy."""
    st = os.path.join(lora_dir, "adapter_model.safetensors")
    if os.path.exists(st):
        from safetensors import safe_open

        out = {}
        with safe_open(st, framework="np") as f:
            for name in f.keys():
                out[name] = f.get_tensor(name)
        return out
    bin_path = os.path.join(lora_dir, "adapter_model.bin")
    if os.path.exists(bin_path):
        import torch

        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
        return {k: v.float().numpy() for k, v in sd.items()}
    raise FileNotFoundError(
        f"no adapter_model.safetensors or adapter_model.bin in {lora_dir}")


# PEFT wrapper prefixes in state-dict keys (PeftModel nests the base model
# under base_model.model; some exports keep a bare "model." root)
_PEFT_PREFIXES = ("base_model.model.", "base_model.")


def _split_peft_name(name: str) -> tuple[str, str] | None:
    """PEFT tensor name → (base tensor name ending in .weight, kind).

    kind: 'a' | 'b' | 'norm' (mergekit-extract-lora layernorm passthrough)
    | None for silently-skipped entries. Raises on unrecognized names, the
    same strictness as the reference (convert_lora_to_gguf.py get_tensors).
    """
    for pfx in _PEFT_PREFIXES:
        if name.startswith(pfx):
            name = name[len(pfx):]
            break
    for suf, kind in ((".lora_A.weight", "a"), (".lora_B.weight", "b"),
                      (".lora_A.default.weight", "a"),
                      (".lora_B.default.weight", "b"),
                      (".lora_embedding_A", "a"), (".lora_embedding_B", "b"),
                      (".lora_embedding_A.default", "a"),
                      (".lora_embedding_B.default", "b")):
        if name.endswith(suf):
            return name[: -len(suf)] + ".weight", kind
    if ".base_layer.weight" in name:
        return None
    if "_layernorm" in name or ".norm" in name:
        return name, "norm"
    raise ValueError(
        f"unexpected adapter tensor {name!r}: not a lora_A/lora_B factor"
        + (" (token embeddings added during finetuning are not supported;"
           " merge them into the base model first)"
           if ".embed_tokens.weight" in name or ".lm_head.weight" in name
           else ""))


def _resolve_base_config(lora_dir: str, base: str | None) -> dict:
    if base is None:
        cfg_path = os.path.join(lora_dir, "adapter_config.json")
        with open(cfg_path) as f:
            base = json.load(f).get("base_model_name_or_path")
        if not (base and os.path.isdir(base)):
            raise FileNotFoundError(
                "base model config required: pass --base <dir> (the adapter's "
                f"base_model_name_or_path {base!r} is not a local directory "
                "and downloads are disabled)")
    with open(os.path.join(base, "config.json")) as f:
        return json.load(f)


def _maybe_invocation_tokens(lparams: dict, base: str | None) -> list[int] | None:
    toks = lparams.get("alora_invocation_tokens")
    if toks:
        return [int(t) for t in toks]
    inv = lparams.get("invocation_string")
    if not inv or base is None:
        return None
    try:  # local tokenizer only (zero-egress)
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(base, local_files_only=True)
        # reference drops the leading start-of-turn token: older aLoRAs
        # activate AFTER it (convert_lora_to_gguf.py set_gguf_parameters)
        return [int(t) for t in tok(inv)["input_ids"][1:]]
    except Exception as e:  # noqa: BLE001 — optional metadata, not fatal
        print(f"warning: could not tokenize invocation_string: {e}",
              file=sys.stderr)
        return None


def convert_lora_to_gguf(lora_dir: str, outfile: str, base: str | None = None,
                         outtype: str = "f16", verbose: bool = True) -> dict:
    with open(os.path.join(lora_dir, "adapter_config.json")) as f:
        lparams = json.load(f)
    cfg = _resolve_base_config(lora_dir, base)
    model_type = cfg.get("model_type")
    arch = ARCH_MAP.get(model_type)
    if arch is None:
        raise NotImplementedError(
            f"base model_type {model_type!r} not supported")

    n_head = int(cfg.get("num_attention_heads", cfg.get("n_head", 1)) or 1)
    n_kv = int(cfg.get("num_key_value_heads", n_head) or n_head)

    # pair up A/B factors per base tensor
    pairs: dict[str, dict[str, np.ndarray]] = {}
    norms: dict[str, np.ndarray] = {}
    for name, arr in _load_adapter_tensors(lora_dir).items():
        split = _split_peft_name(name)
        if split is None:
            continue
        base_name, kind = split
        arr = np.asarray(arr, dtype=np.float32)
        if kind == "norm":
            norms[base_name] = arr
        else:
            pairs.setdefault(base_name, {})[kind] = arr

    ggml_out = {"f32": GGMLType.F32, "f16": GGMLType.F16,
                "bf16": GGMLType.BF16}[outtype]
    w = GGUFWriter(outfile, architecture=arch)
    w.add_kv("general.type", "adapter")
    w.add_kv("adapter.type", "lora")
    w.add_kv("adapter.lora.alpha", float(lparams.get("lora_alpha", 1.0)))
    inv_tokens = _maybe_invocation_tokens(lparams, base)
    if inv_tokens:
        w.add_kv("adapter.alora.invocation_tokens",
                 np.asarray(inv_tokens, dtype=np.uint32))

    n_written = 0
    for base_name in sorted(norms):
        gname = map_tensor_name(base_name, arch)
        if gname is None:
            raise ValueError(f"cannot map adapter norm tensor {base_name!r}")
        w.add_tensor(gname, norms[base_name], GGMLType.F32)
        n_written += 1
    for base_name, ab in sorted(pairs.items()):
        if "a" not in ab or "b" not in ab:
            raise ValueError(f"adapter tensor {base_name} missing "
                             f"lora_{'A' if 'a' not in ab else 'B'}")
        gname = map_tensor_name(base_name, arch)
        if gname is None:
            raise ValueError(f"cannot map adapter tensor {base_name!r} "
                             f"for arch {arch}")
        if not gname.endswith(".weight"):
            raise ValueError(f"LoRA on non-weight tensor {gname!r}")
        a, b = ab["a"], ab["b"]  # A: (r, n_in), B: (n_out, r)
        # the HF→GGUF QK rope permutation reorders output rows, which for a
        # low-rank factorization lives entirely in B (reference: the permute
        # flows through LoraTorchTensor's reshape/swapaxes onto _lora_B)
        if arch in PERMUTE_QK_ARCHS and gname.endswith("attn_q.weight"):
            b = _permute_qk(b, n_head)
        elif arch in PERMUTE_QK_ARCHS and gname.endswith("attn_k.weight"):
            b = _permute_qk(b, n_kv)
        # token_embd: PEFT lora_embedding_A is (r, n_vocab); GGUF stores the
        # transpose so a row gather per token yields the rank-r coefficient
        # (reference: "we only need to transpose token_embd.lora_a")
        if gname == "token_embd.weight":
            a = a.T
        w.add_tensor(gname + ".lora_a", a, ggml_out)
        w.add_tensor(gname + ".lora_b", b, ggml_out)
        n_written += 2
        if verbose:
            print(f"{gname}: r={b.shape[-1]} A{a.shape} B{b.shape}")
    w.write()
    return {"out": outfile, "arch": arch, "n_tensors": n_written,
            "alpha": float(lparams.get("lora_alpha", 1.0))}


def main(argv=None):
    ap = argparse.ArgumentParser(prog="tpullm-convert-lora")
    ap.add_argument("lora_dir", help="PEFT adapter directory "
                                     "(adapter_config.json + weights)")
    ap.add_argument("--base", help="base HF model directory (config.json); "
                                   "defaults to the adapter's local "
                                   "base_model_name_or_path")
    ap.add_argument("-o", "--outfile", required=True)
    ap.add_argument("--outtype", default="f16", choices=["f32", "f16", "bf16"])
    ap.add_argument("-q", "--quiet", action="store_true")
    args = ap.parse_args(argv)
    stats = convert_lora_to_gguf(args.lora_dir, args.outfile, base=args.base,
                                 outtype=args.outtype, verbose=not args.quiet)
    print(f"wrote {stats['out']} ({stats['arch']} LoRA, "
          f"{stats['n_tensors']} tensors, alpha={stats['alpha']})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
