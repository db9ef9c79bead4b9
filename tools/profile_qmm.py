"""Decode-path qmm micro-profiler: achieved HBM GB/s per weight shape/type.

Run on the real chip:  python tools/profile_qmm.py [M]

For each llama-8B weight shape it times a fori_loop of fused dequant
matmuls (output feeds a dummy accumulator so steps serialize) and reports
effective bytes/s versus the v5e HBM roof (~819 GB/s). The same harness
times a dense bf16 matmul of identical plane bytes as the Pallas-free
ceiling, and the full 32-layer equivalent stream.
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from tpullm.gguf.constants import GGMLType, TYPE_TRAITS
from tpullm.models.weights import QuantLinear
from tpullm.ops import qmatmul

M = int(sys.argv[1]) if len(sys.argv) > 1 else 1
# enough loop iterations that device time dwarfs the tunnel round-trip
# floor (~31 ms observed): 1024 x ~100-800us kernels = 0.1-0.8 s per call
ITERS = int(os.environ.get("QMM_PROF_ITERS", "1024"))
HBM_GBs = 819.0


def make_ql(K, N, gtype, seed=0):
    tt = TYPE_TRAITS[gtype]
    rng = np.random.default_rng(seed)
    nbytes = N * (K // tt.block_size) * tt.type_size
    raw = rng.integers(0, 255, size=nbytes, dtype=np.uint8)
    # keep f16 scale fields sane: rewrite d/dmin bytes with small halves
    blocks = raw.reshape(N * (K // tt.block_size), tt.type_size)
    d = rng.uniform(0.001, 0.01, size=blocks.shape[0]).astype(np.float16)
    blocks[:, 0:2] = d.view(np.uint8).reshape(-1, 2)
    if gtype in (GGMLType.Q4_K, GGMLType.Q5_K):
        blocks[:, 2:4] = d.view(np.uint8).reshape(-1, 2)
    if gtype == GGMLType.Q6_K:
        blocks[:, 208:210] = d.view(np.uint8).reshape(-1, 2)
    planes = qmatmul.repack(raw, gtype, N, K)
    return QuantLinear(gtype, N, K, planes)


def bench(fn, xs, *args):
    """Time fn over a list of DISTINCT first arguments, forcing completion
    with a value READBACK (np.asarray): under the axon tunnel
    block_until_ready returns before device work completes, and identical
    buffers can be served from a client result cache — both observed as
    'matmuls' finishing in 2µs. The per-sweep readback cost is one [M,1]
    f32 per call; subtract the measured no-op floor."""
    out = np.asarray(fn(xs[0], *args))  # compile + settle
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for x in xs:
            np.asarray(fn(x, *args))
        best = min(best, (time.perf_counter() - t0) / len(xs))
    return best, out


_FLOOR = None


def dispatch_floor() -> float:
    """Round-trip seconds for a trivial jitted op + readback (the tunnel's
    fixed cost, subtracted from per-call times)."""
    global _FLOOR
    if _FLOOR is None:
        tiny = jnp.zeros((M, 1), jnp.float32)
        f = jax.jit(lambda v: v + 1.0)
        np.asarray(f(tiny))
        t0 = time.perf_counter()
        n = 8
        for _ in range(n):
            tiny = f(tiny)
            np.asarray(tiny)
        _FLOOR = (time.perf_counter() - t0) / n
        print(f"dispatch+readback floor: {_FLOOR*1e6:.0f} us")
    return _FLOOR


def time_qmm(ql, label):
    K, N = ql.n_in, ql.n_out
    rng = np.random.default_rng(1)
    xs = [jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
          for _ in range(4)]
    nbytes = sum(p.size * p.dtype.itemsize for p in ql.planes.values())

    @jax.jit
    def loop(x, ql):
        def body(i, carry):
            x, acc = carry
            y = qmatmul.matmul(x, ql)
            s = jnp.sum(y.astype(jnp.float32), axis=-1, keepdims=True)
            return ((x + s * 1e-30).astype(x.dtype), acc + s)

        _, acc = jax.lax.fori_loop(0, ITERS, body, (x, jnp.zeros((M, 1), jnp.float32)))
        return acc

    dt, _ = bench(loop, xs, ql)
    per = max(dt - dispatch_floor(), 1e-9) / ITERS
    gbs = nbytes / per / 1e9
    print(f"{label:28s} K={K:6d} N={N:6d} {per*1e6:8.1f} us  "
          f"{gbs:7.1f} GB/s  ({100*gbs/HBM_GBs:5.1f}% roof)  "
          f"bytes={nbytes/1e6:.1f}MB")
    return per, nbytes


def time_dense(K, N, label):
    w = jnp.asarray(np.random.default_rng(2).normal(size=(K, N)), jnp.bfloat16)
    rng = np.random.default_rng(1)
    xs = [jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
          for _ in range(4)]

    @jax.jit
    def loop(x, w):
        def body(i, carry):
            x, acc = carry
            s = jnp.sum(jnp.dot(x, w, preferred_element_type=jnp.float32),
                        axis=-1, keepdims=True)
            return ((x + s * 1e-30).astype(x.dtype), acc + s)

        _, acc = jax.lax.fori_loop(0, ITERS, body, (x, jnp.zeros((M, 1), jnp.float32)))
        return acc

    dt, _ = bench(loop, xs, w)
    per = max(dt - dispatch_floor(), 1e-9) / ITERS
    nbytes = K * N * 2
    gbs = nbytes / per / 1e9
    print(f"{label:28s} K={K:6d} N={N:6d} {per*1e6:8.1f} us  "
          f"{gbs:7.1f} GB/s  ({100*gbs/HBM_GBs:5.1f}% roof)  "
          f"bytes={nbytes/1e6:.1f}MB")
    return per, nbytes


def main():
    print(f"devices: {jax.devices()}  M={M}")
    shapes = [
        ("attn qkv fused 4096->6144", 4096, 6144, GGMLType.Q4_K),
        ("attn out 4096->4096", 4096, 4096, GGMLType.Q4_K),
        ("ffn gate+up 4096->28672", 4096, 28672, GGMLType.Q4_K),
        ("ffn down 14336->4096", 14336, 4096, GGMLType.Q6_K),
        ("ffn down q4k 14336->4096", 14336, 4096, GGMLType.Q4_K),
        ("head q6k 4096->128256", 4096, 128256, GGMLType.Q6_K),
    ]
    total_t = total_b = 0.0
    for label, K, N, t in shapes:
        per, nbytes = time_qmm(make_ql(K, N, t), f"{label} [{t.name}]")
        if "head" not in label and "q4k 14336" not in label:
            total_t += per * 32
            total_b += nbytes * 32
        elif "head" in label:
            total_t += per
            total_b += nbytes
    print(f"\n32-layer weight stream: {total_t*1e3:.2f} ms/step "
          f"({total_b/1e9:.2f} GB -> {total_b/total_t/1e9:.1f} GB/s; "
          f"SoL would be {total_b/HBM_GBs/1e6:.2f} ms)")
    time_dense(4096, 28672, "dense bf16 gate+up")
    time_dense(4096, 6144, "dense bf16 qkv")


if __name__ == "__main__":
    main()
