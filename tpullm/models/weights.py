"""Weight containers: dense (dequantized-at-load) and packed-quantized linears.

Both are registered JAX pytrees so parameter trees jit/shard transparently.
`QuantLinear` keeps the ggml-packed planes HBM-resident and computes through
the fused dequant matmul in tpullm.ops.qmatmul (the MMQ/MMVQ analog — see
SURVEY.md §2.3); `DenseLinear` is the F16/BF16 fallback (≡ mmf/mmvf path).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.constants import GGMLType, TYPE_TRAITS
from ..gguf.reader import GGUFTensorInfo
from ..quant import codecs


@jax.tree_util.register_pytree_node_class
@dataclass
class DenseLinear:
    """y = x @ w, w: [n_in, n_out]."""

    w: jax.Array

    @property
    def n_in(self) -> int:
        return self.w.shape[0]

    @property
    def n_out(self) -> int:
        return self.w.shape[1]

    def __call__(self, x: jax.Array) -> jax.Array:
        return jnp.dot(x, self.w.astype(x.dtype), preferred_element_type=x.dtype)

    def tree_flatten(self):
        return (self.w,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@jax.tree_util.register_pytree_node_class
@dataclass
class QuantLinear:
    """Packed-quantized weight of logical shape (n_out, n_in).

    `planes` holds the repacked device arrays whose layout is defined by
    tpullm.ops.qmatmul for the given ggml type. Matmul dispatches to the
    Pallas fused dequant kernel (jnp fallback on CPU/interpret).
    """

    gtype: GGMLType
    n_out: int
    n_in: int
    planes: dict[str, jax.Array]

    def __call__(self, x: jax.Array) -> jax.Array:
        from ..ops import qmatmul

        return qmatmul.matmul(x, self)

    def tree_flatten(self):
        keys = tuple(sorted(self.planes))
        return tuple(self.planes[k] for k in keys), (self.gtype, self.n_out, self.n_in, keys)

    @classmethod
    def tree_unflatten(cls, aux, children):
        gtype, n_out, n_in, keys = aux
        return cls(gtype, n_out, n_in, dict(zip(keys, children)))


@jax.tree_util.register_pytree_node_class
@dataclass
class FusedLinear:
    """Output-concatenation of K same-input linears computed as ONE matmul.

    The decode step is weight-bandwidth bound; fusing QKV (and gate+up)
    into a single plane stream reads the same bytes in one long contiguous
    pass and launches one kernel instead of three (≡ the fork's MMQ batching
    discipline — fewer, larger streaming dots). Numerically exact: each
    output column is computed by the same kernel math at the same position,
    only the N-tiling grouping changes. __call__ returns the split outputs.
    """

    base: Any  # DenseLinear | QuantLinear over the concatenated n_out
    splits: tuple[int, ...]

    def __call__(self, x: jax.Array) -> tuple[jax.Array, ...]:
        out = self.base(x)
        bounds = np.cumsum(self.splits[:-1]).tolist()
        return tuple(jnp.split(out, bounds, axis=-1))

    def tree_flatten(self):
        return (self.base,), (self.splits,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0])


@jax.jit
def _concat_cols(arrs: tuple) -> jax.Array:
    """jitted axis-1 concat, shape-keyed: every layer's QKV (and gate+up)
    group has identical shapes, so ALL layers share one compiled program.
    (A single whole-tree fuse jit compiled for ~560 s on first run — a
    ~190-input concat graph; eager per-concat dispatch cost ~160 s over the
    axon link. This is the fast middle: 2-4 tiny compiles + async calls.)"""
    return jnp.concatenate(list(arrs), axis=1)


@jax.jit
def _concat_groups(groups: tuple) -> tuple:
    """One dispatch for a whole layer's fuse concats: `groups` is a tuple
    of plane tuples, each concatenated on axis 1. Shape-keyed like
    _concat_cols (all layers share one compiled program), but ~7x fewer
    dispatches — on a degraded axon relay the per-plane dispatch storm
    (~220 calls for an 8B Q4_K_M) was 4-7 minutes of Engine build."""
    return tuple(jnp.concatenate(list(g), axis=1) for g in groups)


def _fuse_plan(linears: list):
    """Fusion plan for same-type, same-n_in linears: (plane_tuples, build)
    where `build(concatenated_arrays)` produces the FusedLinear; None when
    the set is heterogeneous (e.g. Q4_K wq/wk beside a Q6_K wv — the ftype
    recipes mix per-layer types, so fusion is a per-layer decision).
    Splitting the plan from the concat lets fuse_llama_params batch a whole
    layer's concats into ONE device dispatch."""
    splits = tuple(int(l.n_out) for l in linears)
    if all(isinstance(l, DenseLinear) for l in linears):
        if len({l.w.dtype for l in linears}) != 1 or \
                len({l.n_in for l in linears}) != 1:
            return None

        def build_dense(cats):
            return FusedLinear(DenseLinear(cats[0]), splits)

        return [tuple(l.w for l in linears)], build_dense
    if all(isinstance(l, QuantLinear) for l in linears):
        if len({l.gtype for l in linears}) != 1 or \
                len({l.n_in for l in linears}) != 1 or \
                len({tuple(sorted(l.planes)) for l in linears}) != 1:
            return None
        names = list(linears[0].planes)
        gtype, n_in = linears[0].gtype, linears[0].n_in

        def build_quant(cats):
            return FusedLinear(
                QuantLinear(gtype, sum(splits), n_in,
                            dict(zip(names, cats))),
                splits,
            )

        return ([tuple(l.planes[nm] for l in linears) for nm in names],
                build_quant)
    return None


def fuse_linears(linears: list) -> "FusedLinear | None":
    """Concatenate same-type, same-n_in linears along n_out (one batched
    device dispatch); None when the set is heterogeneous."""
    plan = _fuse_plan(linears)
    if plan is None:
        return None
    groups, build = plan
    return build(_concat_groups(tuple(groups)))


def maybe_fuse_llama(arch, params: dict, mesh=None, lora: bool = False) -> dict:
    """Single fusion-eligibility policy for both engines: plain llama-family
    forwards only, unsharded (the TP rules key on the unfused names), no
    LoRA wrappers (the adapters target the named projections); the
    TPULLM_FUSE_QKV=0 env opts out."""
    import os

    from . import llama as _llama

    if mesh is not None or lora:
        return params
    if os.environ.get("TPULLM_FUSE_QKV", "1") == "0":
        return params
    if arch.forward is not _llama.forward:
        return params
    # per-group shape-keyed jitted concats (_concat_cols): all layers share
    # one compiled program per group signature, dispatches run async, and
    # the unfused planes free as each group's references drop — peak HBM
    # stays ~weights + one fused group without donation
    return fuse_llama_params(params)


def fuse_llama_params(params: dict) -> dict:
    """Fuse each layer's QKV and gate+up projections in place (llama-family
    param layout). Layers whose projections mix quant types keep the
    separate linears. Consumed by attn_block/forward via layer['wqkv'] /
    layer['wgu']; the original keys are cleared so the planes aren't held
    twice. Both groups' concats ride ONE _concat_groups dispatch per layer
    (shape-keyed: all layers share the compiled program) — the per-plane
    dispatch storm cost minutes of Engine build over a degraded relay."""
    for layer in params["layers"]:
        plans = []
        if all(layer.get(k) is not None for k in ("wq", "wk", "wv")):
            plans.append(("wqkv", ("wq", "wk", "wv"), _fuse_plan(
                [layer["wq"], layer["wk"], layer["wv"]])))
        if layer.get("w_gate") is not None and layer.get("w_up") is not None:
            plans.append(("wgu", ("w_gate", "w_up"), _fuse_plan(
                [layer["w_gate"], layer["w_up"]])))
        groups = []
        for _, _, plan in plans:
            if plan is not None:
                groups.extend(plan[0])
        if not groups:
            continue
        cats = _concat_groups(tuple(groups))
        i = 0
        for fused_key, src_keys, plan in plans:
            if plan is None:
                continue
            n = len(plan[0])
            layer[fused_key] = plan[1](cats[i:i + n])
            i += n
            for k in src_keys:
                layer[k] = None
    return params


@jax.tree_util.register_pytree_node_class
@dataclass
class QuantExpertStack:
    """Packed-quantized stacked MoE expert weights, logical (E, n_out, n_in).

    The HBM-resident form of blk.N.ffn_{gate,up,down}_exps.weight: each
    expert's weight repacked to qmatmul's plane schema and stacked on a
    leading expert axis ([E, rows, N] per plane). Experts stay at their
    GGUF-packed size — the property the reference's MUL_MAT_ID path keeps
    on CUDA (ggml-cuda/mmid.cu + mmq.cu:220 run experts in their quantized
    form) and that bf16 widening loses (~3.3x HBM + expert-read bandwidth
    at Q4_K, exactly where MoE decode is bound).

    Compute goes through ops.qmatmul.gather_matmul (decode: only routed
    experts' packed bytes are read) / stack_matmul (prefill: all experts
    stream packed once). ops/moe.py dispatches on this type.
    """

    gtype: GGMLType
    n_expert: int
    n_out: int
    n_in: int
    planes: dict[str, jax.Array]

    @property
    def shape(self) -> tuple[int, int, int]:
        # mirrors the widened array's [E, n_in, n_out] layout
        return (self.n_expert, self.n_in, self.n_out)

    def tree_flatten(self):
        keys = tuple(sorted(self.planes))
        return tuple(self.planes[k] for k in keys), (
            self.gtype, self.n_expert, self.n_out, self.n_in, keys)

    @classmethod
    def tree_unflatten(cls, aux, children):
        gtype, n_expert, n_out, n_in, keys = aux
        return cls(gtype, n_expert, n_out, n_in, dict(zip(keys, children)))


def _expert_stack_packable(info: GGUFTensorInfo) -> bool:
    """Whether a stacked expert tensor can stay packed: quantized, schema'd,
    and shaped for the stack/gather kernels."""
    import os

    from ..ops import qmatmul
    from ..ops.pallas import qmm

    if os.environ.get("TPULLM_PACKED_MOE", "1") == "0":
        return False
    if len(info.shape) != 3 or not TYPE_TRAITS[info.ggml_type].is_quantized:
        return False
    n_in, n_out = info.shape[0], info.shape[1]
    return qmatmul.supports(info.ggml_type) and qmm.supports(
        info.ggml_type, n_in, n_out)


def quant_expert_stack(info: GGUFTensorInfo) -> QuantExpertStack:
    """Repack a stacked (E, n_out, n_in) quantized tensor into stacked
    planes. Device path: packed bytes upload once, per-expert repack runs
    vmapped on-chip; host path: per-expert repack_np, stacked. The host
    path deliberately bypasses the 2-D repack disk cache (its entries are
    keyed/shaped for single linears); on TPU the device path makes the
    cache moot, and CPU runs are tests on tiny fixtures."""
    import time

    from ..ops import device_repack, qmatmul

    n_in, n_out, E = info.shape
    if device_repack.enabled() and device_repack.supports(info.ggml_type):
        t0 = time.perf_counter()
        planes = device_repack.repack_device_stack(
            info.data, info.ggml_type, n_out, n_in, E)
        load_stats.add("upload", time.perf_counter() - t0)
        load_stats.add_bytes(int(np.asarray(info.data).nbytes))
        return QuantExpertStack(info.ggml_type, E, n_out, n_in, planes)
    data = np.ascontiguousarray(info.data, dtype=np.uint8).reshape(E, -1)
    t0 = time.perf_counter()
    per_expert = [qmatmul.repack_np(data[e], info.ggml_type, n_out, n_in)
                  for e in range(E)]
    load_stats.add("repack", time.perf_counter() - t0)
    stacked = {nm: np.stack([p[nm] for p in per_expert])
               for nm in per_expert[0]}
    t0 = time.perf_counter()
    planes = qmatmul.upload_planes(stacked)
    load_stats.add("upload", time.perf_counter() - t0)
    load_stats.add_bytes(sum(v.nbytes for v in stacked.values()))
    return QuantExpertStack(info.ggml_type, E, n_out, n_in, planes)


def load_expert_stack(info: GGUFTensorInfo, mode: str = "auto",
                      dtype=jnp.bfloat16):
    """Stacked MoE expert tensor → QuantExpertStack (packed, when the type
    and shape allow and mode isn't 'dense') or a dense [E, n_in, n_out]
    device array (the old widening path, kept as fallback)."""
    if mode != "dense" and _expert_stack_packable(info):
        return quant_expert_stack(info)
    w = info.to_numpy()  # (E, n_out, n_in)
    return jnp.asarray(np.ascontiguousarray(w.transpose(0, 2, 1)),
                       dtype=dtype)


Linear = Any  # DenseLinear | QuantLinear | FusedLinear


def dense_from_info(info: GGUFTensorInfo, dtype=jnp.bfloat16) -> DenseLinear:
    """Dequantize a GGUF 2-D weight (logical (n_out, n_in)) to a dense [n_in, n_out]."""
    w = info.to_numpy()  # (n_out, n_in) float32
    return DenseLinear(jnp.asarray(np.ascontiguousarray(w.T), dtype=dtype))


class _LoadStats:
    """Cumulative per-load phase timers (thread-safe; seconds are summed
    across pool threads, so on a multi-core host they can exceed wall —
    compare ratios, not absolutes). Reset by Model/Engine at load start;
    logged so a slow load says WHERE it was slow (hash vs repack vs cache
    I/O vs device upload — the round-3 bench's 834 s load was opaque)."""

    def __init__(self):
        import threading

        self._lock = threading.Lock()
        self.t = {"hash": 0.0, "cache_read": 0.0, "repack": 0.0,
                  "cache_write": 0.0, "upload": 0.0}
        self.n = {"cache_hit": 0, "cache_miss": 0}
        self.bytes_uploaded = 0

    def add(self, key: str, dt: float):
        with self._lock:
            self.t[key] += dt

    def count(self, key: str):
        with self._lock:
            self.n[key] += 1

    def add_bytes(self, nb: int):
        with self._lock:
            self.bytes_uploaded += nb

    def summary(self) -> str:
        gb = self.bytes_uploaded / 2**30
        parts = [f"{k}={v:.1f}s" for k, v in self.t.items() if v >= 0.05]
        parts.append(f"hit/miss={self.n['cache_hit']}/{self.n['cache_miss']}")
        parts.append(f"uploaded={gb:.2f}GiB")
        return " ".join(parts)


load_stats = _LoadStats()


def reset_load_stats() -> None:
    global load_stats
    load_stats = _LoadStats()


def _repack_cache_dir() -> str | None:
    """On-disk repack cache root (None = disabled).

    The blocks→planes repack is the expensive half of loading (~220 s of
    single-thread C++ for an 8B model, + ~80 s of numpy Q6_K widening,
    measured over 226 tensors) while the planes themselves are tiny
    transforms of immutable weights — the classic cache shape. The
    reference's analog is mmap-loading the GGUF directly (its blocks ARE
    its kernel format, src/llama-mmap.cpp); the TPU kernel wants planes, so
    the cache gives back the same load-once property."""
    import os

    if os.environ.get("TPULLM_NO_REPACK_CACHE"):
        return None
    return os.environ.get(
        "TPULLM_REPACK_CACHE_DIR",
        os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "tpullm", "repack",
        ),
    )


def evict_repack_cache(root: str | None = None,
                       max_bytes: int | None = None) -> int:
    """Age-based size cap for the repack cache (ADVICE r3: it grew
    unboundedly — ~GBs per model/quant revision). Oldest entries go first
    until the root fits under TPULLM_REPACK_CACHE_MAX_GB (default 24).
    Returns bytes freed. Called once per Model load; O(#entries) stat
    walk, no data reads."""
    import os
    import shutil

    root = root if root is not None else _repack_cache_dir()
    if root is None or not os.path.isdir(root):
        return 0
    if max_bytes is None:
        max_bytes = int(float(os.environ.get(
            "TPULLM_REPACK_CACHE_MAX_GB", "24")) * 2**30)
    entries = []  # (mtime, size, path)
    total = 0
    for name in os.listdir(root):
        d = os.path.join(root, name)
        if not os.path.isdir(d):
            continue
        size = 0
        try:
            with os.scandir(d) as it:
                size = sum(e.stat().st_size for e in it if e.is_file())
            mtime = os.stat(d).st_mtime
        except OSError:
            continue
        total += size
        entries.append((mtime, size, d))
    freed = 0
    if total <= max_bytes:
        return 0
    for mtime, size, d in sorted(entries):
        if total - freed <= max_bytes:
            break
        shutil.rmtree(d, ignore_errors=True)
        freed += size
    return freed


def _repack_key(info: GGUFTensorInfo) -> str:
    """Content hash of the packed blocks + everything that shapes the plane
    layout. Full-data blake2b runs ~1 GB/s — noise next to the repack it
    saves — and keys by value, so renamed/requantized files never collide."""
    import hashlib
    import time

    from ..ops import qmatmul

    t0 = time.perf_counter()
    h = hashlib.blake2b(digest_size=16)
    wide = info.ggml_type in qmatmul.WIDE_TYPES
    h.update(repr((int(info.ggml_type), tuple(info.shape), wide,
                   qmatmul.REPACK_SCHEMA_VERSION)).encode())
    h.update(memoryview(np.ascontiguousarray(info.data)))
    load_stats.add("hash", time.perf_counter() - t0)
    return h.hexdigest()


def _read_cached_planes(d: str) -> dict[str, np.ndarray] | None:
    """Load a cache entry, or None when absent/torn/incomplete.

    Entries carry a `manifest.txt` naming every plane (written last, inside
    the tmp dir, before the atomic rename) so a hit is only taken when the
    plane set is provably complete. Corrupt .npy payloads (truncated by a
    crash mid-write on a pre-manifest entry) are treated as misses and the
    bad entry is removed so it gets rebuilt."""
    import os
    import shutil

    try:
        with open(os.path.join(d, "manifest.txt")) as f:
            names = [ln.strip() for ln in f if ln.strip()]
        if not names:
            return None
        planes = {nm: np.load(os.path.join(d, nm + ".npy"), mmap_mode="r")
                  for nm in names}
        try:  # LRU touch: eviction ranks by mtime, so hits must refresh it
            os.utime(d)
        except OSError:
            pass
        return planes
    except FileNotFoundError:
        return None
    except (OSError, ValueError, EOFError):
        shutil.rmtree(d, ignore_errors=True)  # corrupt entry: rebuild
        return None


def planes_np_for(info: GGUFTensorInfo) -> dict[str, np.ndarray]:
    """Host plane arrays for a quantized tensor: prewarmed > disk > repack.

    Disk entries are one .npy per plane + a manifest under
    <cachedir>/<content-key>/, written tmp-then-rename so concurrent loaders
    never see a torn entry; hits come back mmap'd (the device upload streams
    straight from the page cache)."""
    import os
    import shutil

    pre = info.__dict__.pop("_planes_np", None)
    if pre is not None:
        return pre
    fut = info.__dict__.pop("_planes_fut", None)
    if fut is not None and not fut.cancel():
        return fut.result()  # started/finished: take the prewarmed result
    return _planes_np_compute(info)


def _planes_np_compute(info: GGUFTensorInfo) -> dict[str, np.ndarray]:
    """Raw cache-or-repack (no prewarm consultation — this IS the prewarm
    pool's task body; consulting _planes_fut here would self-deadlock)."""
    import os
    import shutil
    import time

    n_out, n_in = info.shape[1], info.shape[0]
    from ..ops import qmatmul

    root = _repack_cache_dir()
    if root is None:
        t0 = time.perf_counter()
        planes = qmatmul.repack_np(info.data, info.ggml_type, n_out, n_in)
        load_stats.add("repack", time.perf_counter() - t0)
        return planes
    d = os.path.join(root, _repack_key(info))
    t0 = time.perf_counter()
    hit = _read_cached_planes(d)
    load_stats.add("cache_read", time.perf_counter() - t0)
    if hit is not None:
        load_stats.count("cache_hit")
        return hit
    load_stats.count("cache_miss")
    t0 = time.perf_counter()
    planes = qmatmul.repack_np(info.data, info.ggml_type, n_out, n_in)
    load_stats.add("repack", time.perf_counter() - t0)
    t0 = time.perf_counter()
    tmp = None
    try:
        os.makedirs(root, exist_ok=True)
        # unique tmp per writer: two threads repacking identical-content
        # tensors share pid, so the suffix must distinguish them or one
        # os.replace()s a torn, interleaved entry into the cache
        import tempfile

        tmp = tempfile.mkdtemp(dir=root, prefix=".tmp-")
        for nm, arr in planes.items():
            np.save(os.path.join(tmp, nm + ".npy"), arr)
        with open(os.path.join(tmp, "manifest.txt"), "w") as f:
            f.write("\n".join(planes) + "\n")
        if os.path.isdir(d):  # lost a race: another loader already wrote it
            shutil.rmtree(tmp, ignore_errors=True)
        else:
            os.replace(tmp, d)
        tmp = None
    except OSError:
        pass  # cache is best-effort (read-only FS, disk full, lost race)
    finally:
        if tmp is not None:
            shutil.rmtree(tmp, ignore_errors=True)
        load_stats.add("cache_write", time.perf_counter() - t0)
    return planes


# tensors consumed by load_embedding/load_vector rather than load_linear:
# repacking them wastes time and (worse) host RAM for the process lifetime
_NON_LINEAR_NAMES = ("token_embd.weight", "position_embd.weight",
                     "token_types.weight")


def prewarm_quant_planes(reader, mode: str = "auto",
                         max_inflight: int | None = None):
    """Repack quantized linears thread-parallel, ahead of build_params.

    The per-tensor repack path releases the GIL (ctypes C++ call, hashlib,
    numpy bit ops, np.save), so a small pool turns the serial host work into
    ~wall/nthreads. Futures attach to the tensor infos and are consumed by
    quant_from_info as build_params walks them; a background submitter keeps
    at most `max_inflight` repacked-but-unconsumed results alive so a cold
    load never materializes the whole widened model in host RAM at once
    (build_params previously streamed per tensor; this keeps that property).
    """
    import os
    import threading
    from concurrent.futures import ThreadPoolExecutor

    from ..gguf.constants import TYPE_TRAITS as _TT
    from ..ops import qmatmul

    if mode == "dense":
        return
    from ..ops import device_repack

    dev = device_repack.enabled()
    infos = [
        ti for ti in reader.tensors.values()
        if len(ti.shape) == 2 and _TT[ti.ggml_type].is_quantized
        and qmatmul.supports(ti.ggml_type)
        and ti.name not in _NON_LINEAR_NAMES
        and not (dev and device_repack.supports(ti.ggml_type))
    ]
    if len(infos) < 2:
        return None
    workers = min(8, os.cpu_count() or 1, len(infos))
    if max_inflight is None:
        max_inflight = max(2 * workers, 8)
    pool = ThreadPoolExecutor(max_workers=workers)
    unconsumed = threading.Semaphore(max_inflight)

    class _Handle:
        """Future wrapper whose semaphore permit is released exactly once —
        when the consumer takes the result (or the task is cancelled), NOT
        when the task finishes: that bounds live results, not queue depth."""

        def __init__(self, fut):
            self._fut = fut
            self._released = False
            self._lock = threading.Lock()

        def _release(self):
            with self._lock:
                if not self._released:
                    self._released = True
                    unconsumed.release()

        def cancel(self):
            ok = self._fut.cancel()
            if ok:
                self._release()
            return ok

        def result(self, timeout=None):
            out = self._fut.result(timeout)
            self._release()
            return out

    first_attached = threading.Event()

    def _submit_all():
        for ti in infos:  # reader order ≈ build_params consumption order
            unconsumed.acquire()
            ti._planes_fut = _Handle(pool.submit(_planes_np_compute, ti))
            first_attached.set()
        pool.shutdown(wait=False)

    th = threading.Thread(target=_submit_all, daemon=True)
    th.start()
    # deterministic handshake for tests/instrumentation: wait on this event
    # instead of polling tensor infos (the poll was an xdist-contention
    # flake — a starved submitter thread vs a fixed poll deadline)
    th.first_attached = first_attached
    return th


def drop_unconsumed_planes(reader) -> None:
    """Free any prewarmed plane arrays build_params did not consume (e.g. a
    quantized tensor the arch loads some other way). Without this they stay
    attached to the reader — which the engine retains — for the process
    lifetime."""
    for ti in reader.tensors.values():
        ti.__dict__.pop("_planes_np", None)
        fut = ti.__dict__.pop("_planes_fut", None)
        if fut is not None and not fut.cancel():
            try:
                fut.result()
            except Exception:  # noqa: BLE001 — freeing, not consuming
                pass


def quant_from_info(info: GGUFTensorInfo) -> QuantLinear:
    import time

    from ..ops import qmatmul

    n_out, n_in = info.shape[1], info.shape[0]
    dev = qmatmul.repack_on_device(info)
    if dev is not None:
        return QuantLinear(info.ggml_type, n_out, n_in, dev)
    planes_np = planes_np_for(info)
    t0 = time.perf_counter()
    planes = qmatmul.upload_planes(planes_np)
    load_stats.add("upload", time.perf_counter() - t0)
    load_stats.add_bytes(sum(v.nbytes for v in planes_np.values()))
    return QuantLinear(info.ggml_type, n_out, n_in, planes)


def load_linear(info: GGUFTensorInfo, mode: str = "auto", dtype=jnp.bfloat16) -> Linear:
    """mode: 'dense' forces dequant-at-load; 'quant' keeps packed planes;
    'auto' keeps quantized types packed when a fused kernel exists."""
    from ..ops import qmatmul

    tt = TYPE_TRAITS[info.ggml_type]
    if mode == "dense" or not tt.is_quantized:
        return dense_from_info(info, dtype)
    if mode == "quant" or (mode == "auto" and qmatmul.supports(info.ggml_type)):
        return quant_from_info(info)
    return dense_from_info(info, dtype)


def load_embedding(info: GGUFTensorInfo, dtype=jnp.bfloat16) -> jax.Array:
    """Embedding table as [n_vocab, n_embd] (row gather needs dense rows).

    On TPU a quantized table is uploaded packed and dequantized on-chip —
    the token_embd of an 8B model is ~0.3 GiB packed vs 1.0 GiB dense bf16
    (and ~20 s of host dequant avoided)."""
    import time

    from ..gguf.constants import TYPE_TRAITS as _TT
    from ..ops import device_repack, qmatmul

    if (len(info.shape) == 2 and _TT[info.ggml_type].is_quantized
            and qmatmul.supports(info.ggml_type)
            and device_repack.enabled()
            and device_repack.supports(info.ggml_type)):
        n_out, n_in = info.shape[1], info.shape[0]
        t0 = time.perf_counter()
        planes = device_repack.repack_device(
            info.data, info.ggml_type, n_out, n_in)
        w = _dequant_table_jit(planes, int(info.ggml_type), n_out, n_in,
                               jnp.dtype(dtype).name)
        load_stats.add("upload", time.perf_counter() - t0)
        load_stats.add_bytes(int(np.asarray(info.data).nbytes))
        return w
    return jnp.asarray(info.to_numpy(), dtype=dtype)


def _dequant_table_jit(planes, gtype_int: int, n_out: int, n_in: int,
                       dtype_name: str):
    """planes → dense [n_out, n_in] table on device (the packed planes
    free when this returns — only the dense table is kept)."""
    from ..ops import qmatmul

    @jax.jit
    def _run(planes):
        w = qmatmul.dequant_planes(planes, GGMLType(gtype_int), n_out, n_in,
                                   dtype=jnp.dtype(dtype_name))
        return w.T  # [n_in, n_out] → [n_out(n_vocab), n_in(n_embd)]

    return _run(planes)


def load_vector(info: GGUFTensorInfo, dtype=jnp.float32) -> jax.Array:
    return jnp.asarray(info.to_numpy(), dtype=dtype)
