"""Pallas fused dequantize×matmul kernel for ggml block-quant weights.

The TPU counterpart of the reference's MMQ/MMVQ CUDA kernels
(ggml-cuda/mmq.cu:220 ggml_cuda_op_mul_mat_q, mmvq.cu; fork variant
gfx906_mul_mat_vec_*_warp_coop): packed weights stream HBM→VMEM, codes are
expanded and scaled on the VPU, and the MXU consumes bf16 tiles — weights
never materialize in HBM at full width. Accumulation is f32 in a VMEM
scratch tile over the K grid dimension.

Layout contract: see tpullm.ops.qmatmul plane schema. Tiles are
self-contained because code planes split within `split_unit` chunks.

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

# default tile sizes; K tile must be a multiple of the type's split unit
TILE_K = 512
TILE_N = 256
MAX_TILE_M = 256


def available() -> bool:
    return True


def _plane_row_factor(gtype: GGMLType, name: str) -> tuple[int, int]:
    """Rows of plane `name` per K rows, as a fraction (num, den)."""
    from .. import qmatmul as qm

    meta = qm._SCHEMA[gtype]
    G, SB = meta["G"], meta.get("SB", meta["G"])
    bits = meta["bits"]
    table = {
        "qs": (1, 2) if bits in (3, 4, 5, 6) else ((1, 4) if bits == 2 else (1, 1)),
        "qh": {5: (1, 8), 6: (1, 4), 3: (1, 8)}.get(bits, (0, 1)),
        "d": (1, SB),
        "dmin": (1, SB),
        "m": (1, G),
        "sc": (1, G),
        "e": (1, G),
    }
    if gtype == GGMLType.Q3_K:
        table["qs"] = (1, 4)  # 2-bit low plane
    if gtype == GGMLType.IQ4_XS:
        table["sc"] = (1, 32)
    return table[name]


def supports(gtype: GGMLType, n_in: int, n_out: int) -> bool:
    from .. import qmatmul as qm

    if gtype not in qm._SCHEMA:
        return False
    U = qm.split_unit(gtype)
    tk = min(TILE_K, n_in)
    if n_in % max(tk, U) != 0 or tk % U != 0:
        return False
    # N must tile onto lanes; odd heads (e.g. unpadded vocab) take the
    # jnp fallback until repack-time N padding lands
    return n_out % min(TILE_N, n_out) == 0 and n_out % 128 == 0


def _dequant_tile(plane_tiles: dict[str, jax.Array], gtype: GGMLType, tk: int, tn: int):
    """(TK, TN) bf16 weight tile from plane tiles — same math as
    qmatmul.dequant_planes, applied per tile."""
    from .. import qmatmul as qm

    meta = qm._SCHEMA[gtype]
    G = meta["G"]
    codes = qm._expand_codes(plane_tiles, gtype)  # (TK, TN) int32
    vals = codes.astype(jnp.float32)
    if meta.get("lut"):
        lut = meta["lut"]
        # branchless LUT via nested where-chain on the 4-bit code (VPU-friendly;
        # 16-entry gathers don't vectorize on TPU)
        out = jnp.full(codes.shape, float(lut[0]), dtype=jnp.float32)
        for i in range(1, len(lut)):
            out = jnp.where(codes == i, float(lut[i]), out)
        vals = out
    if meta.get("bias"):
        vals = vals - float(meta["bias"])
    scale, mins = qm._group_scales(plane_tiles, gtype, tk)
    n_groups = tk // G
    vals = vals.reshape(n_groups, G, tn) * scale.reshape(n_groups, 1, tn)
    if mins is not None:
        vals = vals - mins.reshape(n_groups, 1, tn)
    return vals.reshape(tk, tn).astype(jnp.bfloat16)


def _kernel(x_ref, *refs, gtype: GGMLType, plane_names: tuple[str, ...], tk: int, tn: int,
            out_dtype, resident_rows: tuple[int, ...]):
    *plane_refs, out_ref, acc_ref = refs
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    tiles = {}
    for name, ref, rpt in zip(plane_names, plane_refs, resident_rows):
        if rpt:
            # plane too thin to tile on K (sublane divisibility): full-K block
            # stays resident; pick this step's rows with a one-hot matmul —
            # Mosaic can't prove alignment of a dynamic sublane slice, but a
            # tiny (rpt×R)@(R×TN) MXU select is always legal
            full = ref[:].astype(jnp.float32)  # (R, tn)
            R = full.shape[0]
            col = jax.lax.broadcasted_iota(jnp.int32, (rpt, R), 1)
            row = jax.lax.broadcasted_iota(jnp.int32, (rpt, R), 0)
            sel = (col == k * rpt + row).astype(jnp.float32)
            tiles[name] = jnp.dot(sel, full, preferred_element_type=jnp.float32)
        else:
            tiles[name] = ref[:]
    w = _dequant_tile(tiles, gtype, tk, tn)
    x = x_ref[:].astype(jnp.bfloat16)
    acc_ref[:] += jnp.dot(x, w, preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("gtype", "M", "K", "N", "plane_names", "out_dtype", "interpret"),
)
def _qmm_2d(x, planes_flat, gtype, M, K, N, plane_names, out_dtype, interpret):
    from .. import qmatmul as qm

    U = qm.split_unit(gtype)
    tk = min(TILE_K, K)
    tn = min(TILE_N, N)
    tm = min(MAX_TILE_M, M)
    grid = (M // tm, N // tn, K // tk)

    in_specs = [
        pl.BlockSpec((tm, tk), lambda m, n, k: (m, k), memory_space=pltpu.VMEM)
    ]
    resident_rows = []
    for name, plane in zip(plane_names, planes_flat):
        num, den = _plane_row_factor(gtype, name)
        rows = tk * num // den
        if rows % 8 == 0 and rows == plane.shape[0] * tk // K:
            in_specs.append(
                pl.BlockSpec((rows, tn), lambda m, n, k: (k, n), memory_space=pltpu.VMEM)
            )
            resident_rows.append(0)
        else:
            # thin scale plane: keep all K rows resident, slice in-kernel
            full_rows = plane.shape[0]
            in_specs.append(
                pl.BlockSpec((full_rows, tn), lambda m, n, k: (0, n), memory_space=pltpu.VMEM)
            )
            resident_rows.append(rows)

    kernel = functools.partial(
        _kernel, gtype=gtype, plane_names=plane_names, tk=tk, tn=tn,
        out_dtype=out_dtype, resident_rows=tuple(resident_rows),
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
    )(x, *planes_flat)


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

    plane_names = tuple(sorted(ql.planes))
    planes_flat = tuple(ql.planes[k] for k in plane_names)
    interpret = jax.default_backend() != "tpu"
    out = _qmm_2d(
        x2, planes_flat, ql.gtype, Mp, K, N, plane_names, x.dtype, interpret
    )
    return out[:M].reshape(*lead, N)
