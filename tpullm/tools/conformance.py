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
        # ternary types pack a 256-wide superblock: their scale plane only
        # reaches Mosaic's 8-row tile floor at K >= 2048
        k_in = 2048 if gtype.name.startswith("TQ") else n_in
        if not qmm.supports(gtype, k_in, n_out):
            cases.append({"kernel": "qmm", "type": gtype.name,
                          "status": "unsupported_shape"})
            continue
        w = rng.standard_normal((n_out, k_in)).astype(np.float32)
        packed = codecs.quantize(w.reshape(-1), gtype)
        # the oracle weight is the DEQUANTIZED packed data (the kernel is
        # judged on computing exactly what the codec stored, not on
        # quantization error)
        w_ref = codecs.dequantize(packed, gtype, n_out * k_in).reshape(
            n_out, k_in)
        planes = qmatmul.repack(packed.reshape(n_out, -1), gtype,
                                n_out, k_in)
        ql = QuantLinear(gtype, n_out, k_in, planes)
        for m in m_sizes:
            x = rng.standard_normal((m, k_in)).astype(np.float32)
            xb = jnp.asarray(x, jnp.bfloat16)
            try:
                t0 = time.perf_counter()
                y = np.asarray(qmm.qmatmul(xb, ql)).astype(np.float32)
                dt = time.perf_counter() - t0
            except Exception as exc:  # noqa: BLE001 — record, keep sweeping
                cases.append({"kernel": "qmm", "type": gtype.name, "m": m,
                              "ok": False, "error": str(exc)[:300]})
                if log:
                    log(f"qmm {gtype.name:8s} m={m:<4d} ERROR {exc}")
                continue
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


def sweep_qmoe(types=None, e: int = 4, n_in: int = 512, n_out: int = 256,
               log=None) -> list[dict]:
    """Packed expert-stack kernels (≡ MUL_MAT_ID / mmid.cu conformance):
    the gather kernel (decode regime, scalar-prefetch expert routing) and
    the all-experts stack kernel (prefill regime) vs the host oracle."""
    import jax.numpy as jnp

    from ..gguf.constants import GGMLType
    from ..gguf.reader import GGUFTensorInfo
    from ..models.weights import quant_expert_stack
    from ..ops import qmatmul
    from ..ops.pallas import qmm
    from ..quant import codecs

    if types is None:  # the ftypes MoE models actually ship with
        types = (GGMLType.Q4_K, GGMLType.Q6_K, GGMLType.Q8_0,
                 GGMLType.Q5_K, GGMLType.Q4_0, GGMLType.MXFP4)
    rng = np.random.default_rng(2)
    cases = []
    for gtype in types:
        if not qmm.supports(gtype, n_in, n_out):
            cases.append({"kernel": "qmoe", "type": gtype.name,
                          "status": "unsupported_shape"})
            continue
        w = rng.standard_normal((e, n_out, n_in)).astype(np.float32) * 0.1
        packed = np.concatenate(
            [codecs.quantize(w[i].reshape(-1), gtype) for i in range(e)])
        w_ref = np.stack([
            codecs.dequantize(
                packed[i * len(packed) // e:(i + 1) * len(packed) // e],
                gtype, n_out * n_in).reshape(n_out, n_in).T
            for i in range(e)])  # [E, n_in, n_out]
        info = GGUFTensorInfo(name="exps", ggml_type=gtype,
                              shape=(n_in, n_out, e), offset=0, data=packed)
        stack = quant_expert_stack(info)

        t_rows = 8
        x = rng.standard_normal((t_rows, n_in)).astype(np.float32)
        ids = rng.integers(0, e, size=t_rows)
        xb = jnp.asarray(x, jnp.bfloat16)
        try:
            t0 = time.perf_counter()
            y = np.asarray(qmatmul.gather_matmul(
                xb, jnp.asarray(ids, jnp.int32), stack)).astype(np.float32)
            dt = time.perf_counter() - t0
            ref = np.einsum("tk,tkn->tn", np.asarray(xb, np.float32),
                            w_ref[ids])
            eg = _nmse(y, ref)
            okg = eg <= QMM_NMSE_BOUND
            cases.append({"kernel": "qmoe_gather", "type": gtype.name,
                          "nmse": round(eg, 9), "ok": okg,
                          "t_s": round(dt, 3)})
            if log:
                log(f"qmoe_gather {gtype.name:8s} nmse={eg:.2e} "
                    f"{'ok' if okg else 'FAIL'}")
        except Exception as exc:  # noqa: BLE001 — record, keep sweeping
            cases.append({"kernel": "qmoe_gather", "type": gtype.name,
                          "ok": False, "error": str(exc)[:300]})
            if log:
                log(f"qmoe_gather {gtype.name:8s} ERROR {exc}")

        m = 64
        xs = rng.standard_normal((m, n_in)).astype(np.float32)
        xsb = jnp.asarray(xs, jnp.bfloat16)
        try:
            t0 = time.perf_counter()
            ys = np.asarray(qmatmul.stack_matmul(xsb, stack)).astype(
                np.float32)
            dt = time.perf_counter() - t0
            refs = np.einsum("mk,ekn->emn", np.asarray(xsb, np.float32),
                             w_ref)
            es = _nmse(ys, refs)
            oks = es <= QMM_NMSE_BOUND
            cases.append({"kernel": "qmoe_stack", "type": gtype.name,
                          "nmse": round(es, 9), "ok": oks,
                          "t_s": round(dt, 3)})
            if log:
                log(f"qmoe_stack  {gtype.name:8s} nmse={es:.2e} "
                    f"{'ok' if oks else 'FAIL'}")
        except Exception as exc:  # noqa: BLE001
            cases.append({"kernel": "qmoe_stack", "type": gtype.name,
                          "ok": False, "error": str(exc)[:300]})
            if log:
                log(f"qmoe_stack  {gtype.name:8s} ERROR {exc}")
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

    # sink-logits (gpt-oss attn_sinks) and ALiBi paths: per-head scalars
    # ride SMEM — only these model families exercise those specs, so the
    # sweep covers them on hardware explicitly
    from ..ops.attention import _attention_with_sinks_dense

    T = 8
    q = rng.standard_normal((B, T, H, D)).astype(np.float32)
    k = rng.standard_normal((B, Hkv, S, D)).astype(np.float32)
    v = rng.standard_normal((B, Hkv, S, D)).astype(np.float32)
    offsets = np.array([S - T], np.int32)
    qb, kb, vb = (jnp.asarray(a, jnp.bfloat16) for a in (q, k, v))
    for case, kw in (("sinks", {"sinks": jnp.asarray(
            rng.standard_normal(H).astype(np.float32))}),
            ("alibi", {"alibi_slopes": jnp.asarray(
                (0.5 ** np.arange(1, H + 1)).astype(np.float32))})):
        try:
            t0 = time.perf_counter()
            y = np.asarray(flash.flash_attention(
                qb, kb, vb, jnp.asarray(offsets), scale, **kw)).astype(
                    np.float32)
            dt = time.perf_counter() - t0
            if case == "sinks":
                mask = (np.arange(S)[None, :]
                        <= (offsets[0] + np.arange(T))[:, None])
                ref = np.asarray(_attention_with_sinks_dense(
                    qb, kb, vb, jnp.asarray(mask[None]), scale,
                    kw["sinks"]), np.float32)
            else:
                kpos = np.arange(S)[None, :]
                qpos = (offsets[0] + np.arange(T))[:, None]
                bias = (kpos - qpos).astype(np.float32)
                g = H // Hkv
                ref = np.zeros((B, T, H, D), np.float32)
                slopes = np.asarray(kw["alibi_slopes"])
                for h in range(H):
                    kk, vv = np.asarray(kb, np.float32)[0, h // g], \
                        np.asarray(vb, np.float32)[0, h // g]
                    s = (np.asarray(qb, np.float32)[0, :, h] @ kk.T) * scale
                    s = s + slopes[h] * bias
                    s = np.where(kpos > qpos, -np.inf, s)
                    w = np.exp(s - s.max(-1, keepdims=True))
                    ref[0, :, h] = (w / w.sum(-1, keepdims=True)) @ vv
            e = _nmse(y, ref)
            ok = e <= FLASH_NMSE_BOUND
            cases.append({"kernel": "flash", "case": case,
                          "nmse": round(e, 9), "ok": ok,
                          "t_s": round(dt, 3)})
            if log:
                log(f"flash {case:8s} nmse={e:.2e} {'ok' if ok else 'FAIL'}")
        except Exception as exc:  # noqa: BLE001
            cases.append({"kernel": "flash", "case": case, "ok": False,
                          "error": str(exc)[:300]})
            if log:
                log(f"flash {case:8s} ERROR {exc}")
    return cases


def summarize(cases: list, t0: float | None = None) -> dict:
    """Summary dict over (possibly partial) sweep cases — embedded into
    bench `extra` after each stage so a budget-guard exit mid-sweep still
    carries the finished stages."""
    ran = [c for c in cases if "ok" in c]
    failed = [c for c in ran if not c["ok"]]
    return {
        "cases": len(ran),
        "passed": len(ran) - len(failed),
        "failed": failed,
        "skipped": [c["type"] for c in cases if "ok" not in c],
        "max_nmse_qmm": max((c["nmse"] for c in ran
                             if c["kernel"] == "qmm" and "nmse" in c),
                            default=None),
        "max_nmse_flash": max((c["nmse"] for c in ran
                               if c["kernel"].startswith("flash")
                               and "nmse" in c),
                              default=None),
        "t_s": round(time.perf_counter() - t0, 1) if t0 else None,
    }


def run_sweep(log=None) -> dict:
    """Full sweep; returns a summary dict (embedded into bench extra)."""
    t0 = time.perf_counter()
    cases = []
    for fn in (sweep_qmm, sweep_qmoe, sweep_flash):
        try:
            cases += fn(log=log)
        except Exception as exc:  # noqa: BLE001 — one sweep must not lose
            cases.append({"kernel": fn.__name__, "ok": False,  # the record
                          "error": str(exc)[:300]})
            if log:
                log(f"{fn.__name__} ERROR {exc}")
    return summarize(cases, t0)


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser(prog="tpullm-conformance")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args(argv)
    from ..utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()  # standalone runs warm the same cache bench uses
    log = None if args.json else (
        lambda m: print(m, file=sys.stderr, flush=True))
    out = run_sweep(log=log)
    print(json.dumps(out))
    return 1 if out["failed"] else 0


if __name__ == "__main__":
    sys.exit(main())
