"""Loaded-model handle shared across engines (≡ llama_model vs
llama_context, reference include/llama.h: llama_model_load_from_file once,
llama_init_from_model many).

The reference separates the immutable weights (llama_model) from per-session
state (llama_context: KV cache, logits buffers, sched) so N contexts share
one copy of the weights. tpullm's analog: `Model` owns the GGUF reader,
hparams, tokenizer and the device-resident (packed) params; `Engine` /
`BatchEngine` accept a Model wherever they accept a path and then hold only
per-context state (cache, jitted steps, counters). Besides API parity this
matters operationally: weights cross the host→HBM link once per process —
on a v5e the second context costs ~0s instead of a full re-upload+repack.
"""

from __future__ import annotations

import time

import jax.numpy as jnp

from ..gguf.reader import GGUFReader
from ..models.registry import get_arch, load_hparams
from .. import tokenizer as tokenizer_mod


class Model:
    """Weights + metadata, loadable once and shared by many engines.

    Parameters mirror the engine loading knobs that shape the params tree:
    `mode` ("auto"/"quant"/"dense") and compute `dtype`. Engines built from
    this Model must not ask for a different mode/dtype (they'd silently get
    this one); they check and raise instead.
    """

    def __init__(self, model_path: str, *, mode: str = "auto",
                 dtype=jnp.bfloat16, override_kv: dict | None = None):
        from ..utils.compile_cache import enable_persistent_cache

        enable_persistent_cache()  # the repack/embedding jits cache too
        t0 = time.perf_counter()
        self.path = model_path
        self.reader = GGUFReader(model_path)
        if override_kv:
            self.reader.metadata.update(override_kv)
        self.hp = load_hparams(self.reader)
        self.arch = get_arch(self.hp.arch)
        self.tokenizer = tokenizer_mod.from_gguf(self.reader)
        self.mode = mode
        self.dtype = dtype
        from ..models import weights as _w

        _w.reset_load_stats()
        t_meta = time.perf_counter() - t0
        _w.evict_repack_cache()  # size-cap the on-disk plane cache
        _w.prewarm_quant_planes(self.reader, mode)
        self.params = self.arch.build_params(
            self.reader, self.hp, mode=mode, dtype=dtype)
        _w.drop_unconsumed_planes(self.reader)
        self.t_load_s = time.perf_counter() - t0
        self.load_breakdown = (
            f"total={self.t_load_s:.1f}s meta={t_meta:.1f}s "
            + _w.load_stats.summary())
        self._fused = False

    def fused(self) -> dict:
        """Fuse QKV / gate+up once, donating the unfused planes (they'd
        otherwise be held twice in HBM), and share the fused tree with every
        single-chip engine. A Model that has been fused can no longer feed
        mesh-sharded or LoRA engines (those need the unfused names) — the
        engines check and raise."""
        if not self._fused:
            from ..models.weights import maybe_fuse_llama

            self.params = maybe_fuse_llama(self.arch, self.params, None)
            self._fused = True
        return self.params

    def check_compatible(self, mode: str, dtype) -> None:
        if mode != self.mode or dtype != self.dtype:
            raise ValueError(
                f"engine asked for mode={mode!r}/dtype={dtype}, but this "
                f"Model was loaded with mode={self.mode!r}/dtype="
                f"{self.dtype} — load a separate Model for that config"
            )
