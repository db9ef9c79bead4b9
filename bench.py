#!/usr/bin/env python
"""tpullm benchmark: single-chip decode throughput, Llama-3-8B-shaped Q4_K_M.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: 71.9 tok/s = reference llama.cpp Llama-3.1-8B Q4_K_M tg128 on its
published single-GPU table (BASELINE.md). Weights are synthesized packed
blocks (layout-identical to real Q4_K_M; decode speed is weight-bandwidth
bound, independent of values).
"""

from __future__ import annotations

import json
import os
import sys
import time

BASELINE_TG = 71.9  # tok/s, BASELINE.md "Q4_K_M tg128"
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache")
MODEL = os.path.join(CACHE, "bench-llama3-8b-q4km.gguf")

N_WARMUP = 5
N_STEPS = 512
CHUNK = 512  # decode steps per device program call (amortizes dispatch)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def ensure_model() -> str:
    os.makedirs(CACHE, exist_ok=True)
    if not os.path.exists(MODEL):
        log("synthesizing 8B Q4_K_M-shaped model (one-time)...")
        from tpullm.models.synth import make_synthetic_llama_gguf

        t0 = time.time()
        make_synthetic_llama_gguf(MODEL + ".tmp", shape="llama-3-8b")
        os.rename(MODEL + ".tmp", MODEL)
        log(f"synthesized in {time.time()-t0:.0f}s")
    return MODEL


def main():
    import jax

    log("devices:", jax.devices())
    from tpullm.runtime import Engine

    t0 = time.time()
    eng = Engine(ensure_model(), mode="quant", max_seq=2048)
    log(f"load+repack: {time.time()-t0:.1f}s")

    prompt = list(range(3, 19))  # 16 tokens
    t0 = time.time()
    out = eng.generate_tokens_device(prompt, max_new_tokens=CHUNK + 1,
                                     chunk=CHUNK, stop_on_eog=False)
    log(f"prefill+warmup incl. compile: {time.time()-t0:.1f}s "
        f"({len(out)} tokens)")

    # steady-state decode: device-resident scan chunks, ids-only readback
    eng.reset()
    eng.perf = type(eng.perf)()
    out = eng.generate_tokens_device(
        list(range(3, 19)), max_new_tokens=N_STEPS, chunk=CHUNK, stop_on_eog=False
    )
    dt = eng.perf.t_decode_s
    n = eng.perf.n_decode
    log(f"generated {len(out)} tokens; decode {n} steps in {dt:.2f}s")
    tps = n / dt

    print(json.dumps({
        "metric": "decode_tokens_per_sec_8B_Q4_K_M_single_chip",
        "value": round(tps, 2),
        "unit": "tok/s",
        "vs_baseline": round(tps / BASELINE_TG, 3),
    }))


if __name__ == "__main__":
    main()
