"""Per-op tensor dump during a forward (≡ examples/eval-callback).

The reference registers a ggml eval callback that prints every graph
node's name, type, shape, and a values excerpt as the scheduler executes
it. The XLA analogue can't hook compiled HLO, so this tool runs ONE eager
(unjitted) forward with the shared op library temporarily instrumented:
rms_norm / layer_norm / attention dispatch / rope / moe_ffn / qmatmul
record their outputs as they execute, in graph order.

CLI:  tpullm-eval-callback -m model.gguf -p "text" [--limit N] [--stats]
"""

from __future__ import annotations

import argparse
import contextlib
import sys

import numpy as np


def _fmt_excerpt(a: np.ndarray, n: int = 8) -> str:
    flat = a.reshape(-1)
    vals = ", ".join(f"{v: .4f}" for v in flat[:n])
    return f"[{vals}{', …' if flat.size > n else ''}]"


def _fmt_stats(a: np.ndarray) -> str:
    return (f"mean {a.mean():+.5f} std {a.std():.5f} "
            f"min {a.min():+.5f} max {a.max():+.5f}")


class Recorder:
    def __init__(self, out=sys.stdout, stats=False, limit=0):
        self.out = out
        self.stats = stats
        self.limit = limit
        self.count = 0

    def emit(self, opname: str, value) -> None:
        if self.limit and self.count >= self.limit:
            return
        self.count += 1
        a = np.asarray(value, dtype=np.float32)
        detail = _fmt_stats(a) if self.stats else _fmt_excerpt(a)
        self.out.write(
            f"{self.count:4d}  {opname:<18} {str(tuple(a.shape)):<22} {detail}\n")


@contextlib.contextmanager
def instrument(rec: Recorder):
    """Wrap the shared op library so each call logs its output."""
    from .. import ops
    from ..ops import attention as attn_mod, moe as moe_mod, norms, rope

    targets = [
        (norms, "rms_norm"),
        (norms, "layer_norm"),
        (rope, "apply_rope"),
        (attn_mod, "attention"),
        (attn_mod, "attention_cached"),
        (moe_mod, "moe_ffn"),
        (moe_mod, "route"),
    ]
    saved = []

    def wrap(mod, name):
        fn = getattr(mod, name)

        def wrapped(*a, **kw):
            out = fn(*a, **kw)
            probe = out[0] if isinstance(out, tuple) else out
            try:
                rec.emit(name, probe)
            except Exception:  # tracers (jitted caller) — skip silently
                pass
            return out

        saved.append((mod, name, fn))
        setattr(mod, name, wrapped)

    for mod, name in targets:
        wrap(mod, name)
    # model modules import these symbols at module load; re-point any
    # already-bound references
    import tpullm.models as models_pkg
    import pkgutil

    rebound = []
    for m in list(sys.modules.values()):
        if not (getattr(m, "__name__", "").startswith("tpullm.models")
                or getattr(m, "__name__", "") == "tpullm.ops.attention"):
            continue
        for mod, name, fn in saved:
            if getattr(m, name, None) is fn:
                rebound.append((m, name, fn))
                setattr(m, name, getattr(mod, name))
    try:
        yield
    finally:
        for mod, name, fn in saved:
            setattr(mod, name, fn)
        for m, name, fn in rebound:
            setattr(m, name, fn)


def run_dump(engine, tokens, rec: Recorder):
    """One EAGER forward with instrumentation (compiled paths can't be
    hooked — ≡ the reference forcing the graph through the callback)."""
    import jax
    import jax.numpy as jnp

    from ..runtime.kvcache import KVCache

    hp, params = engine.hp, engine.params
    cache = engine.arch.make_cache(hp, 1, max(len(tokens), 8),
                                   engine.kv_dtype) \
        if engine.arch.make_cache else KVCache.new(
            hp, 1, max(len(tokens), 8), engine.kv_dtype)
    toks = jnp.asarray([tokens], dtype=jnp.int32)
    pos = jnp.arange(len(tokens), dtype=jnp.int32)[None]
    with jax.disable_jit(), instrument(rec):
        logits, _ = engine.arch.forward(hp, params, toks, pos, cache, 0)
    rec.emit("logits", logits[0, -1])
    return np.asarray(logits)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="tpullm-eval-callback",
                                 description=__doc__.split("\n")[0])
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-p", "--prompt", default="the quick brown fox")
    ap.add_argument("--limit", type=int, default=0,
                    help="stop after N recorded nodes (0 = all)")
    ap.add_argument("--stats", action="store_true",
                    help="print mean/std/min/max instead of a value excerpt")
    ap.add_argument("--mode", default="dense", choices=["dense", "quant", "auto"])
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from ..runtime import Engine

    eng = Engine(args.model, mode=args.mode, dtype=jnp.float32,
                 max_seq=256, kv_dtype=jnp.float32)
    ids = eng.tokenizer.tokenize(args.prompt, add_special=True)
    rec = Recorder(stats=args.stats, limit=args.limit)
    print(f"dumping {len(ids)} tokens through {eng.hp.arch} "
          f"({eng.hp.n_layer} layers)", file=sys.stderr)
    run_dump(eng, ids, rec)
    return 0


if __name__ == "__main__":
    sys.exit(main())
