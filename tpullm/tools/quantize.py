"""tpullm-quantize: requantize a GGUF model (≡ reference tools/quantize +
src/llama-quant.cpp).

Implements the per-tensor type policy of llama_tensor_get_type
(llama-quant.cpp:178-226): ftype recipes like Q4_K_M upgrade output/embd and
select layers; norms and small tensors stay f32.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from ..gguf import GGMLType, GGUFReader, GGUFWriter, TYPE_TRAITS
from ..gguf.constants import FileType
from ..quant import codecs

# ftype name -> (default type, ftype enum)
FTYPES = {
    "Q4_0": (GGMLType.Q4_0, FileType.MOSTLY_Q4_0),
    "Q4_1": (GGMLType.Q4_1, FileType.MOSTLY_Q4_1),
    "Q5_0": (GGMLType.Q5_0, FileType.MOSTLY_Q5_0),
    "Q5_1": (GGMLType.Q5_1, FileType.MOSTLY_Q5_1),
    "Q8_0": (GGMLType.Q8_0, FileType.MOSTLY_Q8_0),
    "Q2_K": (GGMLType.Q2_K, FileType.MOSTLY_Q2_K),
    "Q3_K": (GGMLType.Q3_K, FileType.MOSTLY_Q3_K_S),
    "Q3_K_S": (GGMLType.Q3_K, FileType.MOSTLY_Q3_K_S),
    "Q3_K_M": (GGMLType.Q3_K, FileType.MOSTLY_Q3_K_M),
    "Q4_K": (GGMLType.Q4_K, FileType.MOSTLY_Q4_K_S),
    "Q4_K_S": (GGMLType.Q4_K, FileType.MOSTLY_Q4_K_S),
    "Q4_K_M": (GGMLType.Q4_K, FileType.MOSTLY_Q4_K_M),
    "Q5_K": (GGMLType.Q5_K, FileType.MOSTLY_Q5_K_S),
    "Q5_K_S": (GGMLType.Q5_K, FileType.MOSTLY_Q5_K_S),
    "Q5_K_M": (GGMLType.Q5_K, FileType.MOSTLY_Q5_K_M),
    "Q6_K": (GGMLType.Q6_K, FileType.MOSTLY_Q6_K),
    "TQ1_0": (GGMLType.TQ1_0, FileType.MOSTLY_TQ1_0),
    "TQ2_0": (GGMLType.TQ2_0, FileType.MOSTLY_TQ2_0),
    "IQ4_NL": (GGMLType.IQ4_NL, FileType.MOSTLY_IQ4_NL),
    "IQ4_XS": (GGMLType.IQ4_XS, FileType.MOSTLY_IQ4_XS),
    "IQ1_S": (GGMLType.IQ1_S, FileType.MOSTLY_IQ1_S),
    "IQ1_M": (GGMLType.IQ1_M, FileType.MOSTLY_IQ1_M),
    "IQ2_XXS": (GGMLType.IQ2_XXS, FileType.MOSTLY_IQ2_XXS),
    "IQ2_XS": (GGMLType.IQ2_XS, FileType.MOSTLY_IQ2_XS),
    "IQ2_S": (GGMLType.IQ2_S, FileType.MOSTLY_IQ2_S),
    "IQ3_XXS": (GGMLType.IQ3_XXS, FileType.MOSTLY_IQ3_XXS),
    "IQ3_S": (GGMLType.IQ3_S, FileType.MOSTLY_IQ3_S),
    "F16": (GGMLType.F16, FileType.MOSTLY_F16),
    "BF16": (GGMLType.BF16, FileType.MOSTLY_BF16),
}


def use_more_bits(i_layer: int, n_layer: int) -> bool:
    """≡ llama-quant.cpp:185-187."""
    return (i_layer < n_layer // 8 or i_layer >= 7 * n_layer // 8
            or (i_layer - n_layer // 8) % 3 == 2)


def tensor_type_policy(name: str, default: GGMLType, ftype_name: str,
                       n_layer: int) -> GGMLType:
    """Per-tensor quant policy (behavior of llama_tensor_get_type)."""
    if name.endswith(("_norm.weight", "_norm.bias")) or ".bias" in name:
        return GGMLType.F32
    if name == "output.weight":
        # output head gets more bits (reference: Q6_K for most K-quant ftypes)
        if default in (GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q4_0, GGMLType.Q4_1,
                       GGMLType.Q5_0, GGMLType.Q5_1, GGMLType.Q2_K, GGMLType.Q3_K):
            return GGMLType.Q6_K
        return default
    if name == "token_embd.weight":
        if ftype_name in ("Q4_K_M", "Q5_K_M") or default == GGMLType.Q4_K:
            return default
        return default
    if ftype_name.endswith("_M") and (".attn_v.weight" in name
                                      or ".ffn_down.weight" in name):
        # _M recipes upgrade attn_v and ffn_down on the use_more_bits layer
        # pattern (llama-quant.cpp:185-187 — first/last n/8 layers plus
        # every third in between; applied at :303 for attn_v and :363 for
        # ffn_down under Q4_K_M/Q5_K_M)
        try:
            layer = int(name.split(".")[1])
        except (IndexError, ValueError):
            layer = n_layer
        if use_more_bits(layer, n_layer):
            return {GGMLType.Q4_K: GGMLType.Q6_K, GGMLType.Q5_K: GGMLType.Q6_K}.get(
                default, default
            )
    return default


def quantize_model(src: str, dst: str, ftype_name: str, verbose: bool = True,
                   imatrix: dict | None = None) -> dict:
    """imatrix: {weight name: [n_in] importance} (tools/imatrix.load_imatrix)
    — K-quant encoders weight their scale search by it (≡ llama-quant's
    imatrix-weighted quantization)."""
    default_type, ftype = FTYPES[ftype_name.upper()]
    r = GGUFReader(src)
    arch = r.architecture
    n_layer = int(r.metadata.get(f"{arch}.block_count", 0))

    w = GGUFWriter(dst)
    for k, v in r.metadata.items():
        if k == "general.file_type":
            continue
        w.add_kv(k, v)
    w.add_kv("general.file_type", int(ftype))
    w.add_kv("general.quantization_version", 2)

    stats = {"in_bytes": 0, "out_bytes": 0, "tensors": 0}
    for t in r.tensors.values():
        target = tensor_type_policy(t.name, default_type, ftype_name.upper(), n_layer)
        tt = TYPE_TRAITS[target]
        # fall back when row length doesn't divide the block size
        if t.shape[0] % tt.block_size != 0:
            target = GGMLType.F16 if TYPE_TRAITS[t.ggml_type].is_quantized else t.ggml_type
        if target == t.ggml_type:
            w.add_packed_tensor(t.name, t.shape, t.ggml_type, t.data.tobytes())
            out_bytes = t.n_bytes
        else:
            values = t.to_numpy().astype(np.float32)
            qw = None
            if imatrix and t.name in imatrix:
                row = np.asarray(imatrix[t.name], dtype=np.float32)
                if values.ndim >= 2 and row.size == values.shape[-1]:
                    qw = np.broadcast_to(row, values.shape).reshape(-1)
            payload = codecs.quantize(values.reshape(-1), target, qw=qw).tobytes()
            w.add_packed_tensor(t.name, t.shape, target, payload)
            out_bytes = len(payload)
        stats["in_bytes"] += t.n_bytes
        stats["out_bytes"] += out_bytes
        stats["tensors"] += 1
        if verbose:
            print(f"  {t.name:48s} {t.ggml_type.name:6s} -> {target.name:6s} "
                  f"{out_bytes/1e6:9.2f} MB", file=sys.stderr)
    w.write()
    return stats


def main(argv=None):
    ap = argparse.ArgumentParser(description="Requantize a GGUF model")
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("ftype", choices=sorted(FTYPES), help="target file type")
    ap.add_argument("--imatrix", default=None,
                    help="importance matrix GGUF from tpullm-imatrix")
    ap.add_argument("-q", "--quiet", action="store_true")
    args = ap.parse_args(argv)
    t0 = time.time()
    imatrix = None
    if args.imatrix:
        from .imatrix import load_imatrix

        imatrix = load_imatrix(args.imatrix)
        print(f"loaded imatrix for {len(imatrix)} tensors", file=sys.stderr)
    stats = quantize_model(args.src, args.dst, args.ftype,
                           verbose=not args.quiet, imatrix=imatrix)
    print(
        f"quantized {stats['tensors']} tensors: "
        f"{stats['in_bytes']/1e9:.3f} GB -> {stats['out_bytes']/1e9:.3f} GB "
        f"in {time.time()-t0:.1f}s"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
