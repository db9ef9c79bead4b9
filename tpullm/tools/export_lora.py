"""tpullm-export-lora: merge LoRA adapters into a base GGUF.

Reference: tools/export-lora (export-lora.cpp) — W' = W + scale·(B A) per
adapted tensor; untouched tensors are copied packed. Quantized adapted
tensors are dequantized, merged, and re-encoded (F16 when the original quant
type has no encoder, same policy as the reference's f16 merge output).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from ..gguf.constants import GGMLType
from ..gguf.reader import GGUFReader
from ..gguf.writer import GGUFWriter
from ..models.lora import load_lora_gguf, merge_lora_dense
from ..quant import codecs


def export_lora(base_path, lora_paths, out_path, scale: float = 1.0,
                verbose: bool = True) -> dict:
    r = GGUFReader(base_path)
    adapters = [load_lora_gguf(p) for p in lora_paths]

    w = GGUFWriter(out_path, architecture=r.architecture)
    for key, val in r.metadata.items():
        if key == "general.architecture":
            continue
        w.add_kv(key, val)

    n_merged = 0
    for name, info in r.tensors.items():
        deltas = [
            (ad.tensors[name], ad.scale_for(name, scale))
            for ad in adapters if name in ad.tensors
        ]
        if not deltas:
            w.add_packed_tensor(name, info.shape, info.ggml_type,
                                info.data.tobytes())
            continue
        merged = info.to_numpy().astype(np.float32)
        for (a, b), s in deltas:
            merged = merge_lora_dense(merged, a, b, s)
        out_type = info.ggml_type
        if out_type not in (GGMLType.F32, GGMLType.F16, GGMLType.BF16):
            out_type = (
                out_type
                if out_type in codecs.supported_quant_types()
                else GGMLType.F16
            )
        w.add_tensor(name, merged, out_type)
        n_merged += 1
        if verbose:
            print(f"merged {name} -> {out_type.name}", file=sys.stderr)
    w.write()
    return {"n_merged": n_merged, "n_tensors": len(r.tensors)}


def main(argv=None):
    ap = argparse.ArgumentParser(prog="tpullm-export-lora")
    ap.add_argument("-m", "--model", required=True, help="base GGUF")
    ap.add_argument("--lora", action="append", default=[], required=True)
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument("--lora-scale", type=float, default=1.0)
    args = ap.parse_args(argv)
    stats = export_lora(args.model, args.lora, args.output, args.lora_scale)
    print(f"merged {stats['n_merged']}/{stats['n_tensors']} tensors -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
