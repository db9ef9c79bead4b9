"""tpullm-bench: throughput benchmark matrix (≡ reference tools/llama-bench).

Cartesian sweep of prompt sizes × generation lengths × weight modes with
repetitions; reports t/s ± stddev as markdown, csv, or json
(llama-bench.cpp cmd_params / output formats analog).
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time


def _parse_int_list(s: str) -> list[int]:
    return [int(x) for x in str(s).split(",") if x != ""]


def bench_case(eng, n_prompt: int, n_gen: int, reps: int) -> dict:
    import numpy as np

    pp_rates, tg_rates = [], []
    vocab_top = min(1000, eng.hp.n_vocab - 1)
    rng = np.random.default_rng(0)
    for _ in range(reps):
        eng.reset()
        toks = rng.integers(3, vocab_top, size=max(n_prompt, 1)).tolist()
        t0 = time.perf_counter()
        if n_prompt > 0:
            eng.prefill(toks)
            pp_rates.append(n_prompt / (time.perf_counter() - t0))
        else:
            eng.prefill(toks[:1])
        if n_gen > 0:
            # decode loop through the single-step path for exact counting
            t0 = time.perf_counter()
            tok = toks[0]
            for _ in range(n_gen):
                logits = eng.decode_step(tok)
                tok = int(np.argmax(logits[:32]))  # cheap argmax slice
            tg_rates.append(n_gen / (time.perf_counter() - t0))
    case = {"n_prompt": n_prompt, "n_gen": n_gen}
    if pp_rates:
        case["pp_ts"] = round(statistics.mean(pp_rates), 2)
        case["pp_stddev"] = round(statistics.stdev(pp_rates), 2) if len(pp_rates) > 1 else 0.0
    if tg_rates:
        case["tg_ts"] = round(statistics.mean(tg_rates), 2)
        case["tg_stddev"] = round(statistics.stdev(tg_rates), 2) if len(tg_rates) > 1 else 0.0
    return case


def run_matrix(model, n_prompt, n_gen, reps, mode, ctx) -> list[dict]:
    from ..runtime import Engine

    eng = Engine(model, mode=mode, max_seq=ctx)
    rows = []
    for p in n_prompt:
        for g in n_gen:
            if p == 0 and g == 0:
                continue
            row = {"model": str(model), "mode": mode, **bench_case(eng, p, g, reps)}
            rows.append(row)
            print(_fmt_md_row(row), file=sys.stderr)
    return rows


_MD_HEADER = "| model | mode | pp | tg | pp t/s | tg t/s |"


def _fmt_md_row(r: dict) -> str:
    pp = f"{r.get('pp_ts', '-')} ± {r.get('pp_stddev', 0)}" if "pp_ts" in r else "-"
    tg = f"{r.get('tg_ts', '-')} ± {r.get('tg_stddev', 0)}" if "tg_ts" in r else "-"
    import os

    return (f"| {os.path.basename(r['model'])} | {r['mode']} | "
            f"{r['n_prompt']} | {r['n_gen']} | {pp} | {tg} |")


def main(argv=None):
    ap = argparse.ArgumentParser(prog="tpullm-bench")
    ap.add_argument("-m", "--model", action="append", required=True)
    ap.add_argument("-p", "--n-prompt", default="512", type=_parse_int_list)
    ap.add_argument("-n", "--n-gen", default="128", type=_parse_int_list)
    ap.add_argument("-r", "--repetitions", type=int, default=3)
    ap.add_argument("-c", "--ctx-size", type=int, default=4096)
    ap.add_argument("--mode", default="auto", choices=["auto", "quant", "dense"])
    ap.add_argument("-o", "--output", default="md", choices=["md", "csv", "json"])
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a jax profiler trace of the sweep into DIR "
                         "(open with xprof/tensorboard; the per-op analog of "
                         "GGML_PERF instrumentation)")
    args = ap.parse_args(argv)

    import contextlib

    prof = contextlib.nullcontext()
    if args.profile:
        import jax

        prof = jax.profiler.trace(args.profile)

    rows = []
    with prof:
        for model in args.model:
            rows += run_matrix(model, args.n_prompt, args.n_gen,
                               args.repetitions, args.mode, args.ctx_size)

    if args.output == "json":
        print(json.dumps(rows, indent=2))
    elif args.output == "csv":
        keys = ["model", "mode", "n_prompt", "n_gen", "pp_ts", "pp_stddev",
                "tg_ts", "tg_stddev"]
        print(",".join(keys))
        for r in rows:
            print(",".join(str(r.get(k, "")) for k in keys))
    else:
        print(_MD_HEADER)
        print("|" + "---|" * 6)
        for r in rows:
            print(_fmt_md_row(r))
    return 0


if __name__ == "__main__":
    sys.exit(main())
