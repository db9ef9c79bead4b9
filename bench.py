#!/usr/bin/env python
"""tpullm benchmark: the north-star serving metrics on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
Primary metric: single-stream decode tok/s, Llama-3-8B-shaped Q4_K_M
(baseline 71.9 tok/s = reference llama.cpp tg128, BASELINE.md). "extra"
carries the other published targets: steady-state pp512 t/s, cold/warm TTFT,
32-stream continuous-batching tok/s, and achieved HBM GB/s.

Weights are synthesized packed blocks (layout-identical to real Q4_K_M;
decode speed is weight-bandwidth bound, independent of values).
"""

from __future__ import annotations

import json
import os
import sys
import time

BASELINE_TG = 71.9  # tok/s, BASELINE.md "Q4_K_M tg128"
BASELINE_PP = 821.8  # t/s, BASELINE.md "Q4_K_M pp512"
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache")
MODEL = os.path.join(CACHE, "bench-llama3-8b-q4km.gguf")

# repo-local caches: ~/.cache did not survive into the round-3 driver run
# (834 s cold load) while this repo's .cache/ did — so the repack and XLA
# compile caches live HERE unless the env overrides them. Must be set
# before jax/tpullm imports.
os.environ.setdefault("TPULLM_REPACK_CACHE_DIR",
                      os.path.join(CACHE, "repack"))
os.environ.setdefault("TPULLM_COMPILE_CACHE_DIR",
                      os.path.join(CACHE, "xla"))

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


HEALTHY_TFLOPS = 15.0  # healthy v5e reads ~40+; r04's poisoned relay read 3.0
MIN_FULL_S = 750.0  # worst-case cold post-canary full-run wall (load+compile)


def device_health() -> tuple[float, float]:
    """(chip f32 TFLOP/s, relay download MB/s) — a 2-second canary for the
    shared axon backend. The two MUST be probed separately: on 2026-08-21 a
    single-number canary that fetched its full 64 MB result read 1.4
    "TFLOP/s" while the chip was actually executing at ~100 — the relay
    *download link* was at ~10 MB/s, which is irrelevant to decode (ids-only
    readback, ~2 KB per 512-step chunk) but dominated the canary's wall
    time. Compute is timed against a 4-byte scalar fetch (one RTT); the
    link is timed against a 64 MB array fetch. Healthy v5e compute ≈ 40+;
    real chip degradation (r04: decode 0.2-0.4 tok/s on unchanged code)
    still shows up in the scalar-fetch timing because the matmul chain
    itself runs slow."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    h = np.random.default_rng(0).standard_normal((4096, 4096)) \
        .astype(np.float32)
    t0 = time.perf_counter()
    x = jax.device_put(h)
    x.block_until_ready()
    up_mbps = 64.0 / (time.perf_counter() - t0)

    @jax.jit
    def f(x):
        def body(i, a):
            return a @ x * 0.001 + a
        return jnp.sum(jax.lax.fori_loop(0, 64, body, x))

    np.asarray(f(x))  # compile + settle
    best = float("inf")
    for _ in range(2):  # best-of-2: absorb one-off relay RTT spikes
        t0 = time.perf_counter()
        np.asarray(f(x))
        best = min(best, time.perf_counter() - t0)
    tflops = 64 * 2 * 4096 ** 3 / best / 1e12
    t0 = time.perf_counter()
    np.asarray(x)  # 64 MB download
    link_mbps = 64.0 / (time.perf_counter() - t0)
    log(f"canary probes: upload {up_mbps:.0f} MB/s")
    return tflops, link_mbps


def canary_gate(remaining) -> tuple[float, list[float], float]:
    """Gate the run on device health instead of marching into a 13x-slow
    relay (r04 burned its whole 1546s budget that way: canary read 3.0,
    the run proceeded, and load+compile alone overran the budget).
    While the relay is degraded, sleep-and-remeasure — but only inside a
    CAPPED window (≤25% of budget, ≤600s): a 2026-08-20 session measured
    18 consecutive degraded readings over 17 minutes, so an uncapped loop
    starves the degraded-mode fallback of the budget it needs to at least
    compile+measure decode. Returns the final reading plus the whole
    history for `extra`."""
    history = []
    t0 = time.time()
    # 2026-08-20/21: the relay stayed degraded for two full days (decode
    # sank to 0.42 then ~0.2 tok/s; the 02:30 sim overran its budget
    # mid-decode), so retrying only starves the fallback phases — one
    # retry at most
    window = min(70.0, 0.25 * (remaining() + (time.time() - t0)))
    window = float(os.environ.get("TPULLM_BENCH_CANARY_WINDOW", window))
    tflops, link_mbps = device_health()
    history.append(round(tflops, 1))
    log(f"device health: {tflops:.1f} f32 TFLOP/s (healthy v5e ~40+), "
        f"relay download {link_mbps:.0f} MB/s")
    while (tflops < HEALTHY_TFLOPS and remaining() > MIN_FULL_S + 90
           and time.time() - t0 < window):
        log(f"canary {tflops:.1f} < {HEALTHY_TFLOPS} TFLOP/s — relay "
            f"degraded; sleeping 60s and remeasuring "
            f"({remaining():.0f}s budget left)")
        time.sleep(60)
        tflops, link_mbps = device_health()
        history.append(round(tflops, 1))
        log(f"device health: {tflops:.1f} f32 TFLOP/s, "
            f"link {link_mbps:.0f} MB/s")
    return tflops, history, link_mbps


def bench_decode(eng, chunk: int = CHUNK, n_steps: int = N_STEPS,
                 warmup: bool = True) -> tuple[float, dict]:
    """Single-stream tg: device-resident scan chunks, ids-only readback.
    Degraded-relay runs pass a smaller chunk/step count and skip the
    separate warmup pass: at the 2026-08-21 degradation (0.42 tok/s) the
    129-step warmup + 256-step measurement alone was ~920s — warmup-free
    single-pass measurement only pollutes the (environment_invalid anyway)
    number with the cache-deserialize seconds."""
    prompt = list(range(3, 19))  # 16 tokens
    t0 = time.time()
    if warmup:
        out = eng.generate_tokens_device(prompt, max_new_tokens=chunk + 1,
                                         chunk=chunk, stop_on_eog=False)
        cold_ttft = time.time() - t0  # includes compile of prefill+decode
        log(f"prefill+warmup incl. compile: {cold_ttft:.1f}s "
            f"({len(out)} tokens)")
        eng.reset()
        eng.perf = type(eng.perf)()
    out = eng.generate_tokens_device(
        prompt, max_new_tokens=n_steps, chunk=chunk, stop_on_eog=False
    )
    dt, n = eng.perf.t_decode_s, eng.perf.n_decode
    if not warmup:
        cold_ttft = time.time() - t0  # single pass: compile rides inside
        log(f"single-pass prefill+decode incl. compile: {cold_ttft:.1f}s")
    log(f"decode {n} steps in {dt:.2f}s")
    tps = n / dt

    # achieved weight bandwidth: every decode step streams the full
    # quantized weight set once (KV at 2k ctx is second-order)
    wbytes = os.path.getsize(MODEL)
    gbps = tps * wbytes / 1e9
    return tps, {"cold_ttft_s": round(cold_ttft, 2),
                 "weight_gb": round(wbytes / 2**30, 2),
                 "achieved_gbps": round(gbps, 1)}


def bench_pp512(eng) -> float:
    """Steady-state prefill throughput over a 512-token prompt."""
    import numpy as np

    prompt = (np.arange(512) % 900 + 3).tolist()
    eng.reset()
    eng.prefill(prompt)  # warm/compile this bucket
    best = float("inf")
    for _ in range(3):
        eng.reset()
        t0 = time.perf_counter()
        eng.prefill(prompt)
        best = min(best, time.perf_counter() - t0)
    return 512.0 / best


def bench_warm_ttft(eng, n_req: int = 8) -> float:
    """p50 warm TTFT: 256-token prompt → first sampled token."""
    import numpy as np

    times = []
    for i in range(n_req):
        prompt = ((np.arange(256) * (i + 3)) % 900 + 3).tolist()
        eng.reset()
        t0 = time.perf_counter()
        next(iter(eng.generate_tokens(prompt, max_new_tokens=1)))
        times.append(time.perf_counter() - t0)
    return float(sorted(times)[len(times) // 2])


def bench_streams(model, n_par: int = 32, ctx: int = 1024,
                  pp: int = 128, tg: int = 128) -> dict:
    """Continuous-batching aggregate decode throughput, 32 streams."""
    import numpy as np

    from tpullm.runtime.batch_engine import BatchEngine

    eng = BatchEngine(model, n_slots=n_par, max_seq=ctx,
                      prefill_chunk=pp)
    rng = np.random.default_rng(0)
    eng.prefill_slots({
        slot: rng.integers(3, 900, size=pp).tolist() for slot in range(n_par)
    })  # joint batched prompt phase
    cur = {s: 5 for s in range(n_par)}
    eng.decode_batch_greedy(cur)  # compile (ids-only readback: [B] int32,
    t0 = time.perf_counter()      # not [B, V] f32 logits over the host link)
    for _ in range(tg):
        cur = eng.decode_batch_greedy(cur)
    dt = time.perf_counter() - t0
    return {"streams": n_par, "tg_steps": tg,
            "agg_tok_s": round(n_par * tg / dt, 1),
            "per_stream_tok_s": round(tg / dt, 2)}


def bench_depth(model, depth: int = 4096, tg: int = 128,
                kv_dtype=None) -> dict:
    """tg at a deep prefix (≡ llama-bench -d rows, tools/llama-bench/
    README.md): decode throughput after a `depth`-token prompt, where KV
    reads are no longer second-order. kv_dtype="q8_0" is the fork's own
    headline recipe (-ctk q8_0: SCRIPT_llama_bench.sh in the gfx906 diff)
    — halves exactly the KV reads that grow with depth."""
    import numpy as np

    from tpullm.runtime import Engine

    # ×256 so the flash kernel keeps its full kv tile (smaller divisor
    # tiles work but pay grid overhead)
    max_seq = -(-(depth + tg + 64) // 256) * 256
    kw = {"kv_dtype": kv_dtype} if kv_dtype else {}
    eng = Engine(model, max_seq=max_seq, **kw)
    prompt = (np.arange(depth) % 900 + 3).tolist()
    t0 = time.time()
    out = eng.generate_tokens_device(prompt, max_new_tokens=tg, chunk=tg,
                                     stop_on_eog=False)
    t_first = time.time() - t0  # compile + prefill + tg decode
    eng.reset()
    eng.perf = type(eng.perf)()
    t0 = time.time()
    eng.generate_tokens_device(prompt, max_new_tokens=tg, chunk=tg,
                               stop_on_eog=False)
    log(f"depth compile+prefill+decode (cold): {t_first:.1f}s "
        f"({len(out)} tokens)")
    pp_s = eng.perf.t_prefill_s
    dt, n = eng.perf.t_decode_s, eng.perf.n_decode
    return {"depth": depth,
            "tg_tok_s": round(n / dt, 2),
            "pp_tok_s": round(depth / pp_s, 1)}


def emit(tps: float, extra: dict):
    """The ONE parsed line. Printed immediately after the primary phase and
    re-printed (enriched) after each optional phase, so a timeout at ANY
    later point still leaves a complete, parseable metric on stdout
    (BENCH_r02 lost its number by printing only at the very end)."""
    print(json.dumps({
        "metric": "decode_tokens_per_sec_8B_Q4_K_M_single_chip",
        "value": round(tps, 2),
        "unit": "tok/s",
        "vs_baseline": round(tps / BASELINE_TG, 3),
        "extra": extra,
    }), flush=True)


def main():
    # Device-acquisition watchdog: when the axon tunnel is down, jax device
    # init blocks forever retrying the relay. Bound it so the driver gets an
    # explanatory metric line instead of a hang. Covers ONLY device
    # acquisition — compiles may legitimately take longer.
    import threading

    acquired = threading.Event()

    def _watchdog():
        if not acquired.wait(timeout=900):
            print(json.dumps({
                "metric": "decode_tokens_per_sec_8B_Q4_K_M_single_chip",
                "value": 0.0,
                "unit": "tok/s",
                "vs_baseline": 0.0,
                "extra": {"error": "TPU unreachable: jax device init hung "
                                   ">900s (axon tunnel down)"},
            }), flush=True)
            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()

    # total wall budget: optional phases only START while enough remains for
    # their cold-compile worst case, so the process exits cleanly instead of
    # being killed mid-phase by the driver's own timeout
    budget = float(os.environ.get("TPULLM_BENCH_BUDGET", "1500"))
    t_start = time.time()

    def remaining() -> float:
        return budget - (time.time() - t_start)

    # budget guard: the axon relay's throughput varies wildly run to run
    # (85->550 MB/s upload within one morning; one measured period ran
    # device programs ~60x slow), so any phase can blow its worst-case
    # estimate. At budget-45s this thread ends the process CLEANLY:
    # everything measured so far has already been emitted (emit() re-prints
    # after every phase), so exiting 0 here turns an overrun into a partial
    #-but-parseable result instead of the driver's rc=124 hard kill
    # (BENCH_r02/r04 failure mode).
    phase = {"name": "device-init", "emitted": False}

    def _emergency():
        wait = max(budget - 45.0 - (time.time() - t_start), 1.0)
        time.sleep(wait)
        if not phase["emitted"]:
            print(json.dumps({
                "metric": "decode_tokens_per_sec_8B_Q4_K_M_single_chip",
                "value": 0.0,
                "unit": "tok/s",
                "vs_baseline": 0.0,
                "extra": {"error": f"budget exhausted during phase "
                                   f"{phase['name']!r} at "
                                   f"{time.time()-t_start:.0f}s — axon "
                                   "relay slow or stalled"},
            }), flush=True)
            os._exit(4)
        log(f"budget guard: stopping during phase {phase['name']!r} at "
            f"{time.time()-t_start:.0f}s; prior phases already emitted")
        os._exit(0)

    threading.Thread(target=_emergency, daemon=True).start()

    import jax

    # self-documenting cache behavior: misses of the big programs are the
    # difference between a 90s and a 700s decode phase on a degraded relay
    jax.config.update("jax_explain_cache_misses", True)
    if os.environ.get("TPULLM_BENCH_DEBUG_KEYS"):
        # per-component cache-key hashes (computation/devices/
        # accelerator_config/compile_options/platform/xla_flags) — run
        # twice and diff to find which component drifts between processes
        import logging

        logging.getLogger("jax._src.cache_key").setLevel(logging.DEBUG)
        logging.basicConfig(level=logging.DEBUG)
    log("devices:", jax.devices())
    acquired.set()
    phase["name"] = "health-canary"
    tflops, canary_hist, link_mbps = canary_gate(remaining)
    degraded = tflops < HEALTHY_TFLOPS

    base_extra: dict = {"device_tflops_f32": round(tflops, 1),
                        "relay_download_mbps": round(link_mbps, 1)}
    if len(canary_hist) > 1:
        base_extra["canary_history"] = canary_hist
    if degraded:
        # The environment is provably sick: a 2s canary predicts every
        # downstream number is meaningless and the full run won't fit the
        # budget. Emit a parseable environment-invalid line NOW (so even a
        # total stall yields rc=0 + marker instead of r04's 0.0/rc=4).
        base_extra["environment_invalid"] = True
        base_extra["note"] = (
            "axon relay degraded (healthy v5e ~40+ f32 TFLOP/s); "
            "decode-only fallback, numbers not comparable to baseline")
        phase["emitted"] = True
        emit(0.0, dict(base_extra,
                       error="degraded relay; conformance-first fallback"))
        if not os.environ.get("TPULLM_BENCH_FORCE_FULL"):
            # Conformance FIRST: the on-chip kernel-correctness record is
            # the one artifact a sick relay cannot invalidate (NMSE vs the
            # host oracle doesn't care how slow execution is) — and two
            # simulated driver runs in a row lost it by putting the 8B
            # load+decode ahead of it. Stage-wise, riskiest kernels first,
            # re-emitting after every stage.
            from tpullm.tools import conformance as conf_mod

            extra = dict(base_extra,
                         error="degraded relay; conformance-first fallback")
            cases: list = []
            for sweep in (conf_mod.sweep_qmoe, conf_mod.sweep_flash,
                          conf_mod.sweep_qmm):
                if remaining() < 180:
                    log(f"stopping conformance before {sweep.__name__}: "
                        f"{remaining():.0f}s left")
                    break
                phase["name"] = f"conformance:{sweep.__name__}"
                try:
                    cases += sweep()
                except Exception as e:  # noqa: BLE001
                    log(f"{sweep.__name__} failed:", e)
                conf = conf_mod.summarize(cases)
                extra["conformance"] = conf
                log(f"conformance so far: {conf['passed']}/{conf['cases']} "
                    "ok")
                emit(0.0, extra)
            if "conformance" in extra:
                base_extra["conformance"] = extra["conformance"]
            # only attempt the (meaningless-anyway) decode number if the
            # model phases can plausibly fit what remains
            if remaining() < 700:
                log(f"skipping degraded decode: {remaining():.0f}s left")
                return
        # skip QKV/gate-up fusion: 32 concat dispatches cost 200-250s of
        # relay RTT on a sick link, for a number that is marked
        # environment-invalid either way (unfused decode is only a few %
        # slower on a healthy chip)
        os.environ.setdefault("TPULLM_FUSE_QKV", "0")
        base_extra["fused_streams"] = False

    from tpullm.runtime import Engine, Model

    model_path = ensure_model()
    # one Model, many contexts (≡ llama_model / llama_context): the 4.6 GB
    # of packed weights cross the host→HBM link once; the 32-stream and
    # depth phases build their engines on the same device-resident planes.
    # Model() and Engine() are timed SEPARATELY: r04's "load 323.9s with
    # 48s accounted" hole was engine-build compiles over the sick relay,
    # and the instrumentation must be able to convict the environment.
    phase["name"] = "model-load"
    t0 = time.time()
    model = Model(model_path, mode="quant")
    t_model = time.time() - t0
    phase["name"] = "engine-build (fuse+jit)"
    t0 = time.time()
    eng = Engine(model, max_seq=2048)
    t_engine = time.time() - t0
    log(f"model load: {t_model:.1f}s [{model.load_breakdown}]")
    log(f"engine build (fuse + jit setup): {t_engine:.1f}s")
    # uploads/repacks/fuse dispatch ASYNC; the first compute sync pays for
    # whatever is still queued on the device. Attribute that stall here
    # instead of letting it masquerade as prefill time (the 02:30 sim lost
    # ~6 min of 'prefill' to it over the degraded relay).
    phase["name"] = "device-settle (queued repack exec)"
    t0 = time.time()
    jax.block_until_ready(eng.params)
    t_settle = time.time() - t0
    log(f"device settle (queued uploads+repacks): {t_settle:.1f}s")

    phase["name"] = "decode compile+measure"
    if degraded:
        # 10-800x-slow execution (the 03:07 sim measured >9 s/step): one
        # warmup-free 16-step chunk is the largest measurement that
        # reliably fits what's left of the budget after conformance (the
        # number carries environment_invalid anyway)
        tps, extra = bench_decode(eng, chunk=16, n_steps=16, warmup=False)
    else:
        tps, extra = bench_decode(eng)
    extra["load_model_s"] = round(t_model, 1)
    extra["engine_build_s"] = round(t_engine, 1)
    extra["device_settle_s"] = round(t_settle, 1)
    extra.update(base_extra)
    phase["emitted"] = True
    emit(tps, extra)  # primary metric is now un-losable

    if os.environ.get("TPULLM_BENCH_QUICK"):
        return  # explicit A/B run: decode only
    force_full = bool(os.environ.get("TPULLM_BENCH_FORCE_FULL"))
    if degraded and not force_full:
        # conformance already ran (before the model load); extra carries it
        # via base_extra. Fast compiles (cold_ttft seconds, not minutes)
        # mean the remaining phases are measure-bound, and a ~10x-slow chip
        # still finishes short runs: record 32-stream and depth too so the
        # artifact carries every phase (environment_invalid regardless).
        if extra.get("cold_ttft_s", 1e9) < 150:
            del eng
            if remaining() > 500:
                try:
                    phase["name"] = "32-stream"
                    extra["batch32"] = bench_streams(model, tg=48)
                    log(f"32-stream: {extra['batch32']['agg_tok_s']} tok/s")
                    emit(tps, extra)
                except Exception as e:  # noqa: BLE001
                    log("32-stream failed:", e)
            if remaining() > 500:
                try:
                    phase["name"] = "depth-4096"
                    extra["depth4096"] = bench_depth(model)
                    log(f"d4096: tg {extra['depth4096']['tg_tok_s']} tok/s")
                    emit(tps, extra)
                except Exception as e:  # noqa: BLE001
                    log("depth failed:", e)
        return

    # Optional-phase gates scale with the observed compile speed: cold_ttft
    # is the decode+prefill compile we just paid, ~85s at r03's healthy-ish
    # relay. Warm persistent-cache runs see ~10s (scale 0.15); a sick relay
    # sees minutes (scale up to 12) and correctly skips everything.
    scale = min(max(extra["cold_ttft_s"] / 85.0, 0.15), 12.0)

    def gate(base: float) -> float:
        return 40.0 + base * scale

    # optional phases, cheapest-compile first; each re-emits on success.
    # Worst-case estimates are COLD-compile times over the axon tunnel; with
    # the persistent XLA cache warm they run in seconds.
    # on-chip kernel conformance (≡ test-backend-ops on the real device):
    # every quant schema through the qmm kernel + flash/flash_q8 vs the
    # host numpy oracle. Compile-bound on first run, seconds when the
    # persistent XLA cache is warm.
    if remaining() > gate(200):
        try:
            phase["name"] = "conformance"
            from tpullm.tools.conformance import run_sweep

            conf = run_sweep()
            extra["conformance"] = conf
            log(f"conformance: {conf['passed']}/{conf['cases']} ok, "
                f"max qmm nmse {conf['max_nmse_qmm']}, {conf['t_s']}s")
            emit(tps, extra)
        except Exception as e:  # noqa: BLE001
            log("conformance failed:", e)
    else:
        log(f"skipping conformance: {remaining():.0f}s left < {gate(200):.0f}")

    if remaining() > gate(380):
        try:
            phase["name"] = "pp512"
            pp = bench_pp512(eng)
            extra["pp512_tok_s"] = round(pp, 1)
            extra["pp512_vs_baseline"] = round(pp / BASELINE_PP, 3)
            log(f"pp512 steady-state: {pp:.1f} t/s")
            emit(tps, extra)
        except Exception as e:  # noqa: BLE001 — primary metric already out
            log("pp512 failed:", e)
    else:
        log(f"skipping pp512: {remaining():.0f}s left < {gate(380):.0f}")

    if remaining() > gate(380):
        try:
            phase["name"] = "warm-ttft"
            ttft = bench_warm_ttft(eng)
            extra["warm_ttft_p50_s"] = round(ttft, 4)
            log(f"warm TTFT p50 (256-tok prompt): {ttft*1000:.1f} ms")
            emit(tps, extra)
        except Exception as e:  # noqa: BLE001
            log("warm TTFT failed:", e)
    else:
        log(f"skipping TTFT: {remaining():.0f}s left < {gate(380):.0f}")

    if remaining() > gate(660):
        del eng  # free HBM before the 32-stream engine loads its own copy
        eng = None
        try:
            phase["name"] = "32-stream"
            streams = bench_streams(model)
            extra["batch32"] = streams
            log(f"32-stream: {streams['agg_tok_s']} tok/s aggregate")
            emit(tps, extra)
        except Exception as e:  # noqa: BLE001
            log("32-stream failed:", e)
    else:
        log(f"skipping 32-stream: {remaining():.0f}s left < {gate(660):.0f}")

    if remaining() > gate(660):
        if eng is not None:
            del eng  # free HBM for the depth engine's own weight copy
            eng = None
        try:
            phase["name"] = "depth-4096"
            depth = bench_depth(model)
            extra["depth4096"] = depth
            log(f"d4096: tg {depth['tg_tok_s']} tok/s, "
                f"pp {depth['pp_tok_s']} tok/s")
            emit(tps, extra)
        except Exception as e:  # noqa: BLE001
            log("depth failed:", e)
    else:
        log(f"skipping depth: {remaining():.0f}s left < {gate(660):.0f}")

    if remaining() > gate(660):
        try:
            phase["name"] = "depth-4096-q8kv"
            depth = bench_depth(model, kv_dtype="q8_0")
            extra["depth4096_q8kv"] = depth
            log(f"d4096 q8 KV: tg {depth['tg_tok_s']} tok/s")
            emit(tps, extra)
        except Exception as e:  # noqa: BLE001
            log("depth q8kv failed:", e)
    else:
        log(f"skipping depth q8kv: {remaining():.0f}s < {gate(660):.0f}")


if __name__ == "__main__":
    main()
