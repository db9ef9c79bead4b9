"""Pallas fused dequantize×matmul kernel for ggml block-quant weights.

The TPU counterpart of the reference's MMQ/MMVQ CUDA kernels
(ggml-cuda/mmq.cu:220 ggml_cuda_op_mul_mat_q, mmvq.cu; fork variant
gfx906_mul_mat_vec_*_warp_coop): packed weights stream HBM→VMEM, codes are
expanded with shift/mask on the VPU, one FMA applies the repack-time
premultiplied group scale (qmatmul plane schema v2), and the MXU consumes
bf16 tiles — weights never materialize in HBM at full width. Accumulation is
f32 in a VMEM scratch tile over the K grid dimension.

The premultiplied scale/minus planes are what make this kernel stream at HBM
speed: per element the VPU does [widen, mask/shift, cast, fma] instead of
decoding ggml's factored f16×int sub-scales (measured 28 → ~800 GB/s).

Grid: (M/TM, N/TN, K/TK), K innermost; out tile revisited across K steps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...gguf.constants import GGMLType

# bf16 dequant multiply A/B (see _kernel_mat); default decided by on-chip
# end-to-end decode measurement
_BF16_MUL = __import__("os").environ.get("TPULLM_QMM_BF16_MUL", "0") == "1"

# default tile sizes; K tile must be a multiple of the type's split unit and
# large enough that every plane's K-rows-per-tile is sublane-aligned (%8)
TILE_K = 2048
TILE_N = 1024
MAX_TILE_M = 256


def available() -> bool:
    return True


def _plane_rows(gtype: GGMLType, name: str, tk: int) -> int:
    """K-tile rows of plane `name` for a tk-row weight tile."""
    from .. import qmatmul as qm

    meta = qm._SCHEMA[gtype]
    bits = meta["bits"]
    if name == "qw":  # wide int8 codes (one row per weight row)
        return tk
    if name == "qs":
        return {2: tk // 4, 3: tk // 4, 4: tk // 2, 5: tk // 2, 6: tk // 2,
                8: tk}[bits]
    if name == "qh":
        return {3: tk // 8, 5: tk // 8, 6: tk // 4}[bits]
    return tk // meta["G"]  # scale / minus


def supports(gtype: GGMLType, n_in: int, n_out: int) -> bool:
    from .. import qmatmul as qm

    if gtype not in qm._SCHEMA:
        return False
    U = qm.split_unit(gtype)
    tk = min(TILE_K, n_in)
    if n_in % max(tk, U) != 0 or tk % U != 0:
        return False
    meta = qm._SCHEMA[gtype]
    if gtype in qm.WIDE_TYPES:
        names = ["qw", "scale"]
    else:
        names = ["qs", "scale"]
        if meta["bits"] in (3, 5, 6):
            names.append("qh")
    if any(_plane_rows(gtype, nm, tk) % 8 != 0 for nm in names):
        return False
    # N tile adapts down to 128 lanes (e.g. vocab heads like 128256)
    return n_out % 128 == 0


def _acc_tile(x, tiles, acc_ref, gtype: GGMLType, tk: int, tn: int):
    """Shared dequant+dot accumulation: x (tm, tk), plane tiles (already
    loaded) → acc_ref (tm, tn) += x @ dequant(tiles). The core of every
    materializing kernel variant (2-D, expert-stack, expert-gather)."""
    from tpullm.ops import qmatmul as qm

    meta = qm._SCHEMA[gtype]
    G = meta["G"]
    n_groups = tk // G
    if _BF16_MUL and not meta.get("lut"):
        # bf16 dequant multiply: codes are exact in bf16 (|v| ≤ 256), the
        # scale plane already rides HBM at bf16, and bf16·bf16 rounds the
        # exact product the same way f32-multiply-then-round-to-bf16 does —
        # bit-identical w, fewer f32 lane ops
        vals = qm._plane_values(tiles, gtype, dtype=jnp.bfloat16)
        w = (vals.reshape(n_groups, G, tn)
             * tiles["scale"].reshape(n_groups, 1, tn)).reshape(tk, tn)
    else:
        vals = qm._plane_values(tiles, gtype)  # (tk, tn) f32
        scale = tiles["scale"].astype(jnp.float32)  # planes ride HBM at bf16
        vals = vals.reshape(n_groups, G, tn) * scale.reshape(n_groups, 1, tn)
        w = vals.reshape(tk, tn).astype(jnp.bfloat16)
    x = x.astype(jnp.bfloat16)
    acc_ref[:] += jnp.dot(x, w, preferred_element_type=jnp.float32)
    if "minus" in tiles:
        # factored min term (exact algebra): Σ_k (v_k·s_g − m_g)·x_k
        # = Σ v s x − Σ_g m_g·(Σ_{k∈g} x_k). The per-element subtract was
        # ~1/5 of the materializing kernel's VPU work; the group sums ride
        # the MXU instead via a 0/1 selector dot (x's K dim is the lane
        # dim, so a reshape-sum would split lanes, which Mosaic can't).
        minus = tiles["minus"].astype(jnp.float32)  # (ng, tn)
        kk = jax.lax.broadcasted_iota(jnp.int32, (tk, n_groups), 0)
        gg = jax.lax.broadcasted_iota(jnp.int32, (tk, n_groups), 1)
        sel = (kk // G == gg).astype(jnp.bfloat16)  # exact 0/1
        sx = jnp.dot(x, sel, preferred_element_type=jnp.float32)  # (tm, ng)
        acc_ref[:] -= jnp.dot(sx, minus, preferred_element_type=jnp.float32)


def _kernel_mat(x_ref, *refs, gtype: GGMLType, plane_names: tuple[str, ...],
                tk: int, tn: int, out_dtype):
    """Materializing dequant matmul: scaled weights built per tile, one dot.
    Wins for the simple 32-unit types and G=16 K-quants where the grouped
    formulation's batched dot lowers poorly (measured on v5e)."""
    *plane_refs, out_ref, acc_ref = refs
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    tiles = {name: ref[:] for name, ref in zip(plane_names, plane_refs)}
    _acc_tile(x_ref[:], tiles, acc_ref, gtype, tk, tn)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_dtype)


# Types routed to the group-factored kernel below. Isolated micro-benchmarks
# (dominated by tunnel dispatch jitter) suggested wins for Q4_K/Q5_K/MXFP4,
# but the device-resident decode scan — the ground truth — measured a
# regression (83.0 vs 87.9 tok/s on the 8B Q4_K_M bench), so the default is
# the materializing kernel everywhere. Override for experiments with
# TPULLM_QMM_GROUPED=Q4_K,Q5_K.
GROUPED_TYPES: set = set()
_env = __import__("os").environ.get("TPULLM_QMM_GROUPED", "")
if _env:
    GROUPED_TYPES = {GGMLType[t.strip()] for t in _env.split(",") if t.strip()}


def _kernel(x_ref, *refs, gtype: GGMLType, plane_names: tuple[str, ...],
            tk: int, tn: int, out_dtype):
    """Group-factored dequant matmul.

    Instead of materializing scaled weights (one mul + sub PER ELEMENT on
    the VPU — measured to dominate decode), the scale is pulled out of the
    inner dot:
        out[m,n] = Σ_g scale[g,n]·(Σ_k x[m,g,k]·code[g,k,n])
                   − Σ_g minus_eff[g,n]·(Σ_k x[m,g,k])
    The grouped inner dot runs on the MXU with RAW codes cast to bf16
    (integers ≤255 are exact); scale/minus touch only tk/G rows. The
    symmetric bias (q−8)·d folds into minus_eff = 8·scale.
    """
    from .. import qmatmul as qm

    *plane_refs, out_ref, acc_ref = refs
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    tiles = {name: ref[:] for name, ref in zip(plane_names, plane_refs)}
    meta = qm._SCHEMA[gtype]
    G = meta["G"]
    ng = tk // G
    if "qw" in tiles:  # wide int8 codes, bias pre-folded
        w = qm._plane_values(tiles, gtype).astype(jnp.bfloat16)
        bias_folded = True
    else:
        codes = qm._expand_codes(tiles, gtype)  # (tk, tn) int32
        if meta.get("lut"):
            w = qm._mapped_values(codes, gtype).astype(jnp.bfloat16)
        else:
            w = codes.astype(jnp.bfloat16)  # exact: |code| ≤ 255
        bias_folded = False
    # x arrives TRANSPOSED [tk, tm] so the group split only divides major
    # dims (Mosaic shape casts cannot split the minor/lane dim)
    xg = x_ref[:].astype(jnp.bfloat16).reshape(ng, G, -1)  # (ng, G, tm)
    tm = xg.shape[-1]
    scale = tiles["scale"].astype(jnp.float32)  # (ng, tn)
    # grouped dot on the MXU: (ng, G, tm) × (ng, G, tn) → (ng, tm, tn)
    dot = jax.lax.dot_general(
        xg, w.reshape(ng, G, tn),
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    acc = jnp.sum(dot * scale[:, None, :], axis=0)  # per-group scale
    bias = None if bias_folded else meta.get("bias")
    minus_eff = None
    if "minus" in tiles:
        minus_eff = tiles["minus"].astype(jnp.float32)
    elif bias:
        minus_eff = scale * float(bias)
    if minus_eff is not None:
        sx = jnp.sum(xg.astype(jnp.float32), axis=1)  # (ng, tm)
        acc = acc - jax.lax.dot_general(
            sx, minus_eff,  # Σ_g sx[g,m]·minus[g,n]
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    acc_ref[:] += acc

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("gtype", "M", "K", "N", "plane_names", "out_dtype", "interpret"),
)
def _qmm_2d(x, planes_flat, gtype, M, K, N, plane_names, out_dtype, interpret):
    tk = min(TILE_K, K)
    # largest lane-aligned divisor of N up to TILE_N (halving alone lands on
    # 256 for vocab heads like 128256 = 768·167 where 768 is available)
    tn = min(TILE_N, N)
    while N % tn and tn > 128:
        tn -= 128
    while N % tn:  # last resort (supports() guarantees N % 128 == 0)
        tn //= 2
    tm = min(MAX_TILE_M, M)
    grid = (M // tm, N // tn, K // tk)

    grouped = gtype in GROUPED_TYPES
    if grouped:
        # x passed transposed [K, M]: the kernel's group split must only
        # divide major dims
        x_spec = pl.BlockSpec((tk, tm), lambda m, n, k: (k, m),
                              memory_space=pltpu.VMEM)
    else:
        x_spec = pl.BlockSpec((tm, tk), lambda m, n, k: (m, k),
                              memory_space=pltpu.VMEM)
    in_specs = [x_spec]
    for name in plane_names:
        rows = _plane_rows(gtype, name, tk)
        in_specs.append(
            pl.BlockSpec((rows, tn), lambda m, n, k: (k, n), memory_space=pltpu.VMEM)
        )

    kernel = functools.partial(
        _kernel if grouped else _kernel_mat,
        gtype=gtype, plane_names=plane_names, tk=tk, tn=tn,
        out_dtype=out_dtype,
    )
    flops = 2 * M * K * N
    bytes_accessed = x.size * x.dtype.itemsize + sum(
        p.size * p.dtype.itemsize for p in planes_flat
    ) + M * N * np.dtype(out_dtype).itemsize
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, tn), lambda m, n, k: (m, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=int(bytes_accessed), transcendentals=0
        ),
        interpret=interpret,
    )(x.T if grouped else x, *planes_flat)


# canonical plane order: codes first, then scale fields
_ORDER = ("qw", "qs", "qh", "scale", "minus")


# ---------------------------------------------------------------------------
# expert-stack kernels: packed 3-D planes [E, rows, N], the MUL_MAT_ID analog
# (reference ggml-cuda/mmid.cu + mmq.cu consume quantized experts in place;
# these kernels keep that packed-weights property on TPU instead of widening
# expert stacks to bf16)
# ---------------------------------------------------------------------------


def _kernel_stack(x_ref, *refs, gtype: GGMLType,
                  plane_names: tuple[str, ...], tk: int, tn: int, out_dtype):
    """All-experts matmul (prefill regime): grid (E, M/tm, N/tn, K/tk);
    plane blocks carry a leading singleton expert dim."""
    *plane_refs, out_ref, acc_ref = refs
    k = pl.program_id(3)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    tiles = {name: ref[0] for name, ref in zip(plane_names, plane_refs)}
    x = x_ref[0] if x_ref.ndim == 3 else x_ref[:]
    _acc_tile(x, tiles, acc_ref, gtype, tk, tn)

    @pl.when(k == pl.num_programs(3) - 1)
    def _():
        out_ref[0] = acc_ref[:].astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("gtype", "E", "M", "K", "N", "plane_names",
                     "out_dtype", "interpret", "x_batched"),
)
def _qmm_stack(x, planes_flat, gtype, E, M, K, N, plane_names, out_dtype,
               interpret, x_batched):
    """x [M, K] (shared across experts) or [E, M, K] → out [E, M, N]."""
    tk = min(TILE_K, K)
    tn = min(TILE_N, N)
    while N % tn and tn > 128:
        tn -= 128
    while N % tn:
        tn //= 2
    tm = min(MAX_TILE_M, M)
    grid = (E, M // tm, N // tn, K // tk)

    if x_batched:
        x_spec = pl.BlockSpec((1, tm, tk), lambda e, m, n, k: (e, m, k),
                              memory_space=pltpu.VMEM)
    else:
        x_spec = pl.BlockSpec((tm, tk), lambda e, m, n, k: (m, k),
                              memory_space=pltpu.VMEM)
    in_specs = [x_spec]
    for name in plane_names:
        rows = _plane_rows(gtype, name, tk)
        in_specs.append(pl.BlockSpec(
            (1, rows, tn), lambda e, m, n, k: (e, k, n),
            memory_space=pltpu.VMEM))

    kernel = functools.partial(
        _kernel_stack, gtype=gtype, plane_names=plane_names, tk=tk, tn=tn,
        out_dtype=out_dtype)
    flops = 2 * E * M * K * N
    bytes_accessed = x.size * x.dtype.itemsize + sum(
        p.size * p.dtype.itemsize for p in planes_flat
    ) + E * M * N * np.dtype(out_dtype).itemsize
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tm, tn), lambda e, m, n, k: (e, m, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=int(bytes_accessed),
            transcendentals=0),
        interpret=interpret,
    )(x, *planes_flat)


def qmatmul_stack(x: jax.Array, stack) -> jax.Array:
    """All-experts packed matmul: x [..., M, K] ([E, M, K] per-expert inputs
    or [M, K] shared) through QuantExpertStack planes → [E, M, N]."""
    E, K, N = stack.n_expert, stack.n_in, stack.n_out
    x_batched = x.ndim == 3
    M = x.shape[-2]
    xp = x
    tm = M if M >= MAX_TILE_M else max(8, 1 << (M - 1).bit_length())
    if M % tm or (M > MAX_TILE_M and M % MAX_TILE_M):
        pad = (-M) % (MAX_TILE_M if M > MAX_TILE_M else tm)
        padding = ((0, 0), (0, pad), (0, 0)) if x_batched else ((0, pad), (0, 0))
        xp = jnp.pad(x, padding)
    Mp = xp.shape[-2]
    plane_names = tuple(nm for nm in _ORDER if nm in stack.planes)
    planes_flat = tuple(stack.planes[nm] for nm in plane_names)
    interpret = jax.default_backend() != "tpu"
    out = _qmm_stack(xp, planes_flat, stack.gtype, E, Mp, K, N, plane_names,
                     x.dtype, interpret, x_batched)
    return out[:, :M]


def _kernel_gather(ids_ref, x_ref, *refs, gtype: GGMLType,
                   plane_names: tuple[str, ...], tk: int, tn: int,
                   out_dtype):
    """Expert-gather matmul (decode regime): one token-slot row per grid
    step; plane blocks are selected by the prefetched expert id (the
    MUL_MAT_ID row-routing, done with scalar-prefetch block index maps).
    x/out ride as [T, 1, ·] so the single-row blocks are Mosaic-legal
    (a (1, tk) block of a [T, K] array violates the (8, 128) minor-dims
    tiling rule — caught by the on-chip conformance sweep; interpret mode
    never checks)."""
    del ids_ref  # consumed by the index maps
    *plane_refs, out_ref, acc_ref = refs
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    tiles = {name: ref[0] for name, ref in zip(plane_names, plane_refs)}
    _acc_tile(x_ref[0], tiles, acc_ref, gtype, tk, tn)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        out_ref[0] = acc_ref[:].astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("gtype", "E", "T", "K", "N", "plane_names",
                     "out_dtype", "interpret"),
)
def _qmm_gather(x, ids, planes_flat, gtype, E, T, K, N, plane_names,
                out_dtype, interpret):
    """x [T, K] row-per-slot, ids [T] expert per slot → out [T, N].
    Reads only the selected experts' packed bytes from HBM — the decode
    bandwidth optimum (k/E of the packed, not widened, expert bytes)."""
    tk = min(TILE_K, K)
    tn = min(TILE_N, N)
    while N % tn and tn > 128:
        tn -= 128
    while N % tn:
        tn //= 2
    grid = (T, N // tn, K // tk)

    # x/out ride as [T, 1, ·]: the middle unit dim makes the per-row block
    # (1, 1, tile) legal under Mosaic's minor-dims tiling rule (1 == the
    # array's own dim; the tile is a multiple of 128)
    x3 = x.reshape(T, 1, K)
    x_spec = pl.BlockSpec((1, 1, tk), lambda t, n, k, ids: (t, 0, k),
                          memory_space=pltpu.VMEM)
    in_specs = [x_spec]
    for name in plane_names:
        rows = _plane_rows(gtype, name, tk)
        in_specs.append(pl.BlockSpec(
            (1, rows, tn), lambda t, n, k, ids: (ids[t], k, n),
            memory_space=pltpu.VMEM))

    kernel = functools.partial(
        _kernel_gather, gtype=gtype, plane_names=plane_names, tk=tk, tn=tn,
        out_dtype=out_dtype)
    plane_bytes_per_expert = sum(
        p.size * p.dtype.itemsize for p in planes_flat) // E
    bytes_accessed = (x.size * x.dtype.itemsize
                      + T * plane_bytes_per_expert
                      + T * N * np.dtype(out_dtype).itemsize)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 1, tn), lambda t, n, k, ids: (t, 0, n)),
            scratch_shapes=[pltpu.VMEM((1, tn), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((T, 1, N), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * K * N, bytes_accessed=int(bytes_accessed),
            transcendentals=0),
        interpret=interpret,
    )(ids, x3, *planes_flat)
    return out.reshape(T, N)


def qmatmul_gather(x: jax.Array, ids: jax.Array, stack) -> jax.Array:
    """Expert-indexed packed matmul: row t of x [T, K] through expert
    ids[t]'s packed weight → [T, N] (≡ MUL_MAT_ID / mmvq for MoE decode)."""
    E, K, N = stack.n_expert, stack.n_in, stack.n_out
    T = x.shape[0]
    plane_names = tuple(nm for nm in _ORDER if nm in stack.planes)
    planes_flat = tuple(stack.planes[nm] for nm in plane_names)
    interpret = jax.default_backend() != "tpu"
    return _qmm_gather(x, ids.astype(jnp.int32), planes_flat, stack.gtype,
                       E, T, K, N, plane_names, x.dtype, interpret)


def qmatmul(x: jax.Array, ql) -> jax.Array:
    """x: [..., n_in] -> [..., n_out] through packed weight `ql` (QuantLinear)."""
    K, N = ql.n_in, ql.n_out
    lead = x.shape[:-1]
    M = int(np.prod(lead)) if lead else 1
    x2 = x.reshape(M, K)

    # pad M to a friendly tile height
    tm = M if M >= MAX_TILE_M else max(8, 1 << (M - 1).bit_length())
    if M % tm or (M > MAX_TILE_M and M % MAX_TILE_M):
        pad = (-M) % (MAX_TILE_M if M > MAX_TILE_M else tm)
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    Mp = x2.shape[0]

    plane_names = tuple(nm for nm in _ORDER if nm in ql.planes)
    planes_flat = tuple(ql.planes[nm] for nm in plane_names)
    interpret = jax.default_backend() != "tpu"
    out = _qmm_2d(
        x2, planes_flat, ql.gtype, Mp, K, N, plane_names, x.dtype, interpret
    )
    return out[:M].reshape(*lead, N)
