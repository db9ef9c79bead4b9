"""One-shot qmm tuning sweep for the real chip.

Run when TPU time is available:  python tools/tune_qmm.py [--fast]

For the decode-critical llama-8B weight shapes it sweeps, per quant type:
  * materializing vs group-factored kernel (TPULLM_QMM_GROUPED)
  * TILE_K / TILE_N combinations
and times a serialized fori_loop of fused dequant-matmuls (the decode
ground truth), reporting achieved GB/s vs the v5e HBM roof and the best
configuration as one JSON line (paste into ops/pallas/qmm.py defaults).

Sweep results drive VERDICT r1 item 2 (decode ≥70% of speed-of-light).
"""

from __future__ import annotations

import argparse
import itertools
import json
import sys
import time

import numpy as np

HBM_GBS = 819.0  # v5e

SHAPES = [  # (K, N, label) — llama-3-8B decode matmuls
    (4096, 4096, "wq/wo"),
    (4096, 1024, "wk/wv"),
    (4096, 14336, "gate/up"),
    (14336, 4096, "down"),
    # fused streams (models/weights.py FusedLinear: default decode path)
    (4096, 6144, "wqkv-fused"),
    (4096, 28672, "gate|up-fused"),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true", help="fewer configs")
    ap.add_argument("--types", default="Q4_K,Q6_K,Q8_0,Q4_0")
    ap.add_argument("--iters", type=int, default=48)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpullm.gguf.constants import GGMLType, TYPE_TRAITS
    from tpullm.ops import qmatmul
    from tpullm.ops.pallas import qmm as qmm_mod
    from tpullm.models.weights import QuantLinear

    print("devices:", jax.devices(), file=sys.stderr)

    def make_ql(K, N, gtype, seed=0):
        tt = TYPE_TRAITS[gtype]
        rng = np.random.default_rng(seed)
        nbytes = N * (K // tt.block_size) * tt.type_size
        raw = rng.integers(0, 255, size=nbytes, dtype=np.uint8).reshape(
            N * (K // tt.block_size), tt.type_size)
        d = rng.uniform(1e-3, 1e-2, size=raw.shape[0]).astype(np.float16)
        raw[:, 0:2] = d.view(np.uint8).reshape(-1, 2)
        if gtype in (GGMLType.Q4_K, GGMLType.Q5_K):
            raw[:, 2:4] = d.view(np.uint8).reshape(-1, 2)
        if gtype == GGMLType.Q6_K:
            raw[:, 208:210] = d.view(np.uint8).reshape(-1, 2)
        planes = qmatmul.repack(raw.reshape(-1), gtype, N, K)
        return QuantLinear(gtype, N, K, planes)

    def bench(ql, iters):
        K = ql.n_in
        x = jnp.asarray(np.random.default_rng(1).normal(size=(1, K)),
                        jnp.bfloat16)

        @jax.jit
        def loop(x, ql):
            def body(i, carry):
                y = qmatmul.qmatmul(carry, ql)
                # fold back to x-shape so iterations serialize
                return (y[:, :K] if y.shape[-1] >= K
                        else jnp.pad(y, ((0, 0), (0, K - y.shape[-1]))))
            return jax.lax.fori_loop(0, iters, body, x)

        out = jax.block_until_ready(loop(x, ql))
        t0 = time.perf_counter()
        out = jax.block_until_ready(loop(x, ql))
        dt = (time.perf_counter() - t0) / iters
        nbytes = sum(p.size * p.dtype.itemsize for p in ql.planes.values())
        return nbytes / dt / 1e9

    tile_ks = [1024, 2048, 4096] if not args.fast else [2048]
    tile_ns = [512, 1024, 2048] if not args.fast else [1024]
    best = {}
    for tname in args.types.split(","):
        gtype = GGMLType[tname.strip()]
        rows = []
        for grouped, tk, tn in itertools.product((False, True), tile_ks, tile_ns):
            qmm_mod.GROUPED_TYPES = {gtype} if grouped else set()
            qmm_mod.TILE_K, qmm_mod.TILE_N = tk, tn
            # tile sizes are read at trace time, not part of the jit key —
            # drop every cached executable between configs
            jax.clear_caches()
            per_shape = []
            try:
                for K, N, label in SHAPES:
                    ql = make_ql(K, N, gtype)
                    per_shape.append(bench(ql, args.iters))
            except Exception as e:  # unsupported combo
                print(f"{tname} grouped={grouped} tk={tk} tn={tn}: {e}",
                      file=sys.stderr)
                continue
            mean_gbps = float(np.mean(per_shape))
            rows.append((mean_gbps, grouped, tk, tn, per_shape))
            print(f"{tname} grouped={int(grouped)} tk={tk} tn={tn}: "
                  f"{mean_gbps:6.1f} GB/s ({100*mean_gbps/HBM_GBS:.0f}% SoL) "
                  f"per-shape {[f'{g:.0f}' for g in per_shape]}",
                  file=sys.stderr, flush=True)
        if rows:
            rows.sort(reverse=True)
            g, grouped, tk, tn, per = rows[0]
            best[tname] = {"gbps": round(g, 1), "pct_sol": round(100 * g / HBM_GBS, 1),
                           "grouped": grouped, "tile_k": tk, "tile_n": tn}
    print(json.dumps(best))


if __name__ == "__main__":
    main()
