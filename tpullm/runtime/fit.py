"""Auto-fit runtime parameters to device memory.

Reference: llama_params_fit (llama.h:493, src/llama.cpp:159) — fit
n_ctx/ngl/tensor_split to free VRAM — and tools/fit-params. The TPU version
sizes max_seq / n_slots against HBM from the GGUF tensor index without
loading the model.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..gguf.constants import GGMLType, TYPE_TRAITS
from ..gguf.reader import GGUFReader
from ..models.registry import load_hparams

# repack-time plane overhead per weight byte (scale/minus f32 planes,
# ops/qmatmul.py schema): measured ≈ +0.25 B per 4-bit weight
_PLANE_OVERHEAD = 1.45


@dataclass
class FitResult:
    weight_bytes: int
    kv_bytes_per_token: int
    max_seq: int
    n_slots: int
    fits: bool


def device_memory_bytes(default: int = 16 * 2 ** 30) -> int:
    """Best-effort HBM size of device 0 (v5e default 16 GiB)."""
    try:
        import jax

        stats = jax.devices()[0].memory_stats()
        if stats and "bytes_limit" in stats:
            return int(stats["bytes_limit"])
    except Exception:
        pass
    return default


def fit_params(
    model_path,
    *,
    want_seq: int = 4096,
    want_slots: int = 1,
    kv_bytes_per_elem: int = 2,  # bf16; 1 for q8_0
    hbm_bytes: int | None = None,
    reserve_frac: float = 0.15,  # activations/compiler scratch headroom
) -> FitResult:
    """≡ llama_params_fit: largest (max_seq, n_slots) that fits HBM."""
    r = GGUFReader(model_path)
    hp = load_hparams(r)
    weight_bytes = 0
    for t in r.tensors.values():
        tt = TYPE_TRAITS[t.ggml_type]
        over = _PLANE_OVERHEAD if tt.is_quantized else 1.0
        weight_bytes += int(t.n_bytes * over)
    r.close()

    kv_per_tok = (
        hp.n_layer * hp.n_head_kv * (hp.head_dim + hp.head_dim_v)
        * kv_bytes_per_elem
    )
    hbm = hbm_bytes if hbm_bytes is not None else device_memory_bytes()
    budget = int(hbm * (1.0 - reserve_frac)) - weight_bytes
    if budget <= 0:
        return FitResult(weight_bytes, kv_per_tok, 0, 0, False)

    max_total_tokens = budget // max(kv_per_tok, 1)
    n_slots = want_slots
    max_seq = min(want_seq, max_total_tokens // max(n_slots, 1))
    while max_seq < 256 and n_slots > 1:  # shed slots before context
        n_slots -= 1
        max_seq = min(want_seq, max_total_tokens // max(n_slots, 1))
    max_seq = max(0, (max_seq // 256) * 256 or min(max_seq, want_seq))
    return FitResult(weight_bytes, kv_per_tok, int(max_seq), n_slots,
                     max_seq >= 256)


def main(argv=None):
    import argparse
    import sys

    ap = argparse.ArgumentParser(prog="tpullm-fit-params")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-c", "--ctx-size", type=int, default=4096)
    ap.add_argument("-np", "--parallel", type=int, default=1)
    ap.add_argument("--kv-type", choices=["bf16", "f16", "q8_0"], default="bf16")
    ap.add_argument("--hbm-gb", type=float, default=None)
    args = ap.parse_args(argv)
    res = fit_params(
        args.model, want_seq=args.ctx_size, want_slots=args.parallel,
        kv_bytes_per_elem=1 if args.kv_type == "q8_0" else 2,
        hbm_bytes=int(args.hbm_gb * 2**30) if args.hbm_gb else None,
    )
    print(f"weights (repacked): {res.weight_bytes/2**30:.2f} GiB")
    print(f"kv bytes/token:     {res.kv_bytes_per_token}")
    print(f"fitted:             -c {res.max_seq} -np {res.n_slots}"
          + ("" if res.fits else "  (DOES NOT FIT)"))
    return 0 if res.fits else 1


if __name__ == "__main__":
    import sys

    sys.exit(main())
