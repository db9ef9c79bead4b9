"""tpullm-batched-bench: parallel-decode throughput grid
(≡ reference tools/batched-bench): for each (PP, TG, B) combination, prefill
B slots with PP tokens each, then decode TG steps with all B slots batched;
reports per-phase and total t/s."""

from __future__ import annotations

import argparse
import json
import sys
import time


def _parse_int_list(s: str) -> list[int]:
    return [int(x) for x in str(s).split(",") if x != ""]


def run_case(eng, pp: int, tg: int, b: int) -> dict:
    import numpy as np

    rng = np.random.default_rng(0)
    vocab_top = min(1000, eng.hp.n_vocab - 1)
    for slot in range(b):
        eng.free_slot(slot)

    t0 = time.perf_counter()
    eng.prefill_slots({
        slot: rng.integers(3, vocab_top, size=pp).tolist()
        for slot in range(b)
    })  # joint batched prompt phase (the scheduler's admission path)
    t_pp = time.perf_counter() - t0

    t0 = time.perf_counter()
    cur = {slot: 5 for slot in range(b)}
    for _ in range(tg):
        cur = eng.decode_batch_greedy(cur)  # ids-only readback
    t_tg = time.perf_counter() - t0

    n_pp, n_tg = pp * b, tg * b
    return {
        "pp": pp, "tg": tg, "b": b,
        "t_pp_s": round(t_pp, 3), "pp_ts": round(n_pp / t_pp, 2),
        "t_tg_s": round(t_tg, 3), "tg_ts": round(n_tg / t_tg, 2),
        "t_total_s": round(t_pp + t_tg, 3),
        "total_ts": round((n_pp + n_tg) / (t_pp + t_tg), 2),
    }


def main(argv=None):
    ap = argparse.ArgumentParser(prog="tpullm-batched-bench")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-npp", default="128,256", type=_parse_int_list)
    ap.add_argument("-ntg", default="16,32", type=_parse_int_list)
    ap.add_argument("-npl", default="1,2,4", type=_parse_int_list,
                    help="parallel sequence counts")
    ap.add_argument("-c", "--ctx-size", type=int, default=2048)
    ap.add_argument("--mode", default="auto", choices=["auto", "quant", "dense"])
    ap.add_argument("-o", "--output", default="md", choices=["md", "json"])
    args = ap.parse_args(argv)

    from ..runtime.batch_engine import BatchEngine

    n_slots = max(args.npl)
    eng = BatchEngine(args.model, n_slots=n_slots, max_seq=args.ctx_size,
                      mode=args.mode)
    rows = []
    for pp in args.npp:
        for tg in args.ntg:
            for b in args.npl:
                if (pp + tg) >= args.ctx_size:
                    continue
                rows.append(run_case(eng, pp, tg, b))
                print(rows[-1], file=sys.stderr)

    if args.output == "json":
        print(json.dumps(rows, indent=2))
    else:
        print("| PP | TG | B | PP t/s | TG t/s | total t/s |")
        print("|---|---|---|---|---|---|")
        for r in rows:
            print(f"| {r['pp']} | {r['tg']} | {r['b']} | {r['pp_ts']} "
                  f"| {r['tg_ts']} | {r['total_ts']} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
