"""On-chip kernel conformance sweep (≡ reference tests/test-backend-ops.cpp
`test` mode, :482-485): every quant schema type through the fused
dequant-GEMM kernel, plus flash attention (bf16 and q8 KV), validated
against a host numpy oracle with per-case NMSE bounds — ON THE REAL DEVICE.

The pytest kernel suite runs Pallas in interpret mode on CPU; Mosaic-on-TPU
behavior (tiling, DMA elision, bf16 MXU rounding) is otherwise only
exercised end-to-end. bench.py runs this sweep every round so each
BENCH_r{N}.json carries a hardware conformance record; it is also a CLI:

    python -m tpullm.tools.conformance [--json]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _nmse(got: np.ndarray, ref: np.ndarray) -> float:
    got = np.asarray(got, dtype=np.float64)
    ref = np.asarray(ref, dtype=np.float64)
    denom = float(np.mean(ref * ref)) or 1.0
    return float(np.mean((got - ref) ** 2)) / denom


# bf16 activations on the MXU: ~2^-8 relative rounding per product, mostly
# cancelling in the K-accumulation. LUT types keep f32 tables in-kernel.
QMM_NMSE_BOUND = 5e-4
FLASH_NMSE_BOUND = 2e-3  # softmax in f32, PV accumulation bf16-rounded
FLASH_Q8_NMSE_BOUND = 5e-3  # + q8 KV quantization of the oracle inputs


def sweep_qmm(m_sizes=(1, 128), n_in: int = 512, n_out: int = 256,
              log=None) -> list[dict]:
    import jax.numpy as jnp

    from ..gguf.constants import GGMLType
    from ..models.weights import QuantLinear
    from ..ops import qmatmul
    from ..ops.pallas import qmm
    from ..quant import codecs

    rng = np.random.default_rng(0)
    cases = []
    for gtype in sorted(qmatmul._SCHEMA, key=int):
        if not qmm.supports(gtype, n_in, n_out):
            cases.append({"kernel": "qmm", "type": gtype.name,
                          "status": "unsupported_shape"})
            continue
        w = rng.standard_normal((n_out, n_in)).astype(np.float32)
        packed = codecs.quantize(w.reshape(-1), gtype)
        # the oracle weight is the DEQUANTIZED packed data (the kernel is
        # judged on computing exactly what the codec stored, not on
        # quantization error)
        w_ref = codecs.dequantize(packed, gtype, n_out * n_in).reshape(
            n_out, n_in)
        planes = qmatmul.repack(packed.reshape(n_out, -1), gtype,
                                n_out, n_in)
        ql = QuantLinear(gtype, n_out, n_in, planes)
        for m in m_sizes:
            x = rng.standard_normal((m, n_in)).astype(np.float32)
            xb = jnp.asarray(x, jnp.bfloat16)
            t0 = time.perf_counter()
            y = np.asarray(qmm.qmatmul(xb, ql)).astype(np.float32)
            dt = time.perf_counter() - t0
            ref = np.asarray(xb, dtype=np.float32) @ w_ref.T
            e = _nmse(y, ref)
            ok = e <= QMM_NMSE_BOUND
            cases.append({"kernel": "qmm", "type": gtype.name, "m": m,
                          "nmse": round(e, 9), "ok": ok,
                          "t_s": round(dt, 3)})
            if log:
                log(f"qmm {gtype.name:8s} m={m:<4d} nmse={e:.2e} "
                    f"{'ok' if ok else 'FAIL'}")
    return cases


def _ref_attention(q, k, v, offsets, scale):
    """Host f32 causal attention oracle: q [B,T,H,D], k/v [B,Hkv,S,D]."""
    B, T, H, D = q.shape
    Hkv, S = k.shape[1], k.shape[2]
    g = H // Hkv
    out = np.zeros((B, T, H, v.shape[3]), np.float32)
    for b in range(B):
        for h in range(H):
            kk, vv = k[b, h // g], v[b, h // g]  # [S, D]
            logits = (q[b, :, h] @ kk.T) * scale  # [T, S]
            pos = offsets[b] + np.arange(T)[:, None]
            mask = np.arange(S)[None, :] > pos
            logits = np.where(mask, -np.inf, logits)
            w = np.exp(logits - logits.max(-1, keepdims=True))
            w = w / w.sum(-1, keepdims=True)
            out[b, :, h] = w @ vv
    return out


def sweep_flash(log=None) -> list[dict]:
    import jax.numpy as jnp

    from ..ops.pallas import flash

    rng = np.random.default_rng(1)
    B, H, Hkv, D, S = 1, 8, 2, 128, 512
    scale = 1.0 / np.sqrt(D)
    cases = []
    for T, label in ((1, "decode"), (128, "prefill")):
        q = rng.standard_normal((B, T, H, D)).astype(np.float32)
        k = rng.standard_normal((B, Hkv, S, D)).astype(np.float32)
        v = rng.standard_normal((B, Hkv, S, D)).astype(np.float32)
        offsets = np.array([S - T], np.int32)
        qb = jnp.asarray(q, jnp.bfloat16)
        kb = jnp.asarray(k, jnp.bfloat16)
        vb = jnp.asarray(v, jnp.bfloat16)
        t0 = time.perf_counter()
        y = np.asarray(flash.flash_attention(
            qb, kb, vb, jnp.asarray(offsets), scale)).astype(np.float32)
        dt = time.perf_counter() - t0
        ref = _ref_attention(np.asarray(qb, np.float32),
                             np.asarray(kb, np.float32),
                             np.asarray(vb, np.float32), offsets, scale)
        e = _nmse(y, ref)
        ok = e <= FLASH_NMSE_BOUND
        cases.append({"kernel": "flash", "case": label, "nmse": round(e, 9),
                      "ok": ok, "t_s": round(dt, 3)})
        if log:
            log(f"flash {label:8s} nmse={e:.2e} {'ok' if ok else 'FAIL'}")

        # q8 KV variant: per-row symmetric int8 (the QuantKVCache layout)
        k_s = np.abs(k).max(-1) / 127.0 + 1e-12  # [B,Hkv,S]
        v_s = np.abs(v).max(-1) / 127.0 + 1e-12
        k_q = np.clip(np.round(k / k_s[..., None]), -127, 127).astype(np.int8)
        v_q = np.clip(np.round(v / v_s[..., None]), -127, 127).astype(np.int8)
        t0 = time.perf_counter()
        y8 = np.asarray(flash.flash_attention_q8(
            qb, jnp.asarray(k_q), jnp.asarray(k_s, jnp.float32),
            jnp.asarray(v_q), jnp.asarray(v_s, jnp.float32),
            jnp.asarray(offsets), scale)).astype(np.float32)
        dt = time.perf_counter() - t0
        ref8 = _ref_attention(np.asarray(qb, np.float32),
                              k_q.astype(np.float32) * k_s[..., None],
                              v_q.astype(np.float32) * v_s[..., None],
                              offsets, scale)
        e8 = _nmse(y8, ref8)
        ok8 = e8 <= FLASH_Q8_NMSE_BOUND
        cases.append({"kernel": "flash_q8", "case": label,
                      "nmse": round(e8, 9), "ok": ok8, "t_s": round(dt, 3)})
        if log:
            log(f"flash_q8 {label:5s} nmse={e8:.2e} {'ok' if ok8 else 'FAIL'}")
    return cases


def run_sweep(log=None) -> dict:
    """Full sweep; returns a summary dict (embedded into bench extra)."""
    t0 = time.perf_counter()
    cases = sweep_qmm(log=log) + sweep_flash(log=log)
    ran = [c for c in cases if "ok" in c]
    failed = [c for c in ran if not c["ok"]]
    return {
        "cases": len(ran),
        "passed": len(ran) - len(failed),
        "failed": failed,
        "skipped": [c["type"] for c in cases if "ok" not in c],
        "max_nmse_qmm": max((c["nmse"] for c in ran
                             if c["kernel"] == "qmm"), default=None),
        "max_nmse_flash": max((c["nmse"] for c in ran
                               if c["kernel"].startswith("flash")),
                              default=None),
        "t_s": round(time.perf_counter() - t0, 1),
    }


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser(prog="tpullm-conformance")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args(argv)
    log = None if args.json else (
        lambda m: print(m, file=sys.stderr, flush=True))
    out = run_sweep(log=log)
    print(json.dumps(out))
    return 1 if out["failed"] else 0


if __name__ == "__main__":
    sys.exit(main())
