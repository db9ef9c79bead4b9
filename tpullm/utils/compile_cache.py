"""Persistent XLA compilation cache.

The reference amortizes per-step launch overhead with CUDA graph capture
(ggml-cuda.cu graph record/replay); under XLA the analogous cold-start cost
is *compilation* of the jitted prefill/decode programs (tens of seconds for
an 8B model). Enabling JAX's persistent compilation cache makes every
process after the first deserialize the compiled executable instead —
cold TTFT drops from minutes to seconds.

Called from Engine/BatchEngine construction; idempotent. Opt out with
TPULLM_NO_COMPILE_CACHE=1, redirect with TPULLM_COMPILE_CACHE_DIR.
"""

from __future__ import annotations

import os

_done = False


def enable_persistent_cache() -> None:
    global _done
    if _done or os.environ.get("TPULLM_NO_COMPILE_CACHE"):
        return
    _done = True
    import jax

    # the cache exists to amortize TPU cold-start compiles; on the CPU
    # backend XLA's AOT entries re-load with noisy target-feature
    # mismatch warnings (prefer-no-scatter/gather) and save little —
    # skip unless explicitly forced
    try:
        if jax.default_backend() == "cpu" and not os.environ.get(
                "TPULLM_FORCE_COMPILE_CACHE"):
            return
    except Exception:
        pass

    # key the cache by platform AND host CPU: XLA:CPU AOT results embed
    # target-machine features, and reusing an entry compiled on a different
    # host (e.g. the TPU frontend vs this box) trips cpu_aot_loader
    # mismatch warnings / potential SIGILL
    plat = os.environ.get("JAX_PLATFORMS", "") or "default"
    host = (os.uname().machine if hasattr(os, "uname") else "unknown")
    try:
        import zlib

        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "flags")):
                    host += "-" + format(zlib.crc32(line.encode()), "08x")
                    break
    except OSError:
        pass
    cache_dir = os.environ.get(
        "TPULLM_COMPILE_CACHE_DIR",
        os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "tpullm", "xla_cache", f"{plat}-{host}".replace("/", "_"),
        ),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        # persist ONLY expensive compiles. With the 0.0 default-every-program
        # policy, serializing each of the hundreds of tiny load-time programs
        # (uploads, device repacks, concats) round-trips executable binaries
        # through the axon relay: measured 427s engine construction with the
        # cache on vs 2.8s off. The decode/prefill step programs (minutes to
        # compile over the relay) still get cached — they are the entire
        # point of the cache.
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(os.environ.get(
                              "TPULLM_COMPILE_CACHE_MIN_SECS", "5.0")))
        # the default 'all' also enables XLA-side caches (per-fusion
        # autotune cache etc.); on the axon TPU relay those made every
        # cache-enabled run stall minutes inside shard_args (measured:
        # fuse 2.8s cache-off vs 427.8s cache-on) — keep only JAX's
        # executable cache
        jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    except Exception:  # config knobs vary across jax versions — best effort
        pass
