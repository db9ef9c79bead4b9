"""Device-side weight repack: packed GGUF blocks → kernel planes, on-chip.

The host repack (ops/qmatmul.repack_np) is the expensive half of loading —
hundreds of seconds of single-core bit-twiddling for an 8B model (the
round-3 bench measured 834 s cold). But the transform itself is pure
shift/mask/transpose work, i.e. HBM-bandwidth VPU work on a TPU: uploading
the ~4.6 GiB of *packed* blocks (the smallest representation that exists)
and repacking on the accelerator turns a cold load into

    mmap read  →  host→HBM upload at link speed  →  ~ms of on-chip decode

with no disk cache, no content hashing and no host RAM spike. This is the
TPU answer to the reference's mmap-and-go loading (src/llama-mmap.h:42-45,
llama-model-loader.cpp load_all_data): its blocks ARE its kernel format;
ours aren't, so we move the format change to the device where it's free.

Every function here mirrors a branch of qmatmul._decode_blocks /
repack_np exactly — the planes produced are bit-identical to the host path
(asserted by tests/test_device_repack.py), so the qmm kernel, the disk
cache and this path are interchangeable. Codebook i-quants (IQ1/2/3, TQ)
keep the host path: their nearest-LUT re-encoding is search, not bit math.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.constants import GGMLType, TYPE_TRAITS

I32 = jnp.int32


def _f16(b: jax.Array) -> jax.Array:
    """Little-endian f16 from a trailing axis of 2 uint8 → f32."""
    u16 = b[..., 0].astype(jnp.uint16) | (b[..., 1].astype(jnp.uint16) << 8)
    return jax.lax.bitcast_convert_type(u16, jnp.float16).astype(jnp.float32)


def _u32le(b: jax.Array) -> jax.Array:
    """Little-endian u32 from a trailing axis of 4 uint8 (as int32 bits)."""
    x = b.astype(jnp.uint32)
    return (x[..., 0] | (x[..., 1] << 8) | (x[..., 2] << 16)
            | (x[..., 3] << 24))


def _col(x: jax.Array, n_out: int) -> jax.Array:
    """(n_out, groups...) → (K', n_out) K-major planes (≡ qmatmul col())."""
    return jnp.moveaxis(x, 0, -1).reshape(-1, n_out)


def _half_split_pack4(codes: jax.Array, unit: int) -> jax.Array:
    K, N = codes.shape
    c = codes.reshape(K // unit, unit, N)
    return (c[:, : unit // 2] | (c[:, unit // 2:] << 4)).astype(
        jnp.uint8).reshape(K // 2, N)


def _bitplane_pack(bits: jax.Array, width: int, unit: int) -> jax.Array:
    K, N = bits.shape
    fields = 8 // width
    rows = unit * width // 8
    c = bits.reshape(K // unit, fields, rows, N)
    out = c[:, 0]
    for j in range(1, fields):
        out = out | (c[:, j] << (j * width))
    return out.astype(jnp.uint8).reshape(K * width // 8, N)


def _scale_min_k4(q: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Q4_K/Q5_K 12-byte packed 6-bit scales/mins → (sc, m) each (..., 8),
    int32 (≡ codecs._get_scale_min_k4)."""
    q = q.astype(I32)
    sc = [q[..., j] & 63 for j in range(4)]
    m = [q[..., j + 4] & 63 for j in range(4)]
    for j in range(4, 8):
        sc.append((q[..., j + 4] & 0x0F) | ((q[..., j - 4] >> 6) << 4))
        m.append((q[..., j + 4] >> 4) | ((q[..., j] >> 6) << 4))
    return jnp.stack(sc, axis=-1), jnp.stack(m, axis=-1)


def _q3k_scales(q12: jax.Array) -> jax.Array:
    """Q3_K 12-byte 6-bit scales → (..., 16) int32 minus 32
    (≡ codecs._q3_k_scales)."""
    a = [_u32le(q12[..., 4 * i: 4 * i + 4]) for i in range(3)]
    k1 = jnp.uint32(0x03030303)
    k2 = jnp.uint32(0x0F0F0F0F)
    tmp = a[2]
    aux = [
        (a[0] & k2) | (((tmp >> 0) & k1) << 4),
        (a[1] & k2) | (((tmp >> 2) & k1) << 4),
        ((a[0] >> 4) & k2) | (((tmp >> 4) & k1) << 4),
        ((a[1] >> 4) & k2) | (((tmp >> 6) & k1) << 4),
    ]
    bytes16 = [((aux[i] >> (8 * j)) & 0xFF).astype(I32)
               for i in range(4) for j in range(4)]
    return jnp.stack(bytes16, axis=-1) - 32


def _decode_blocks_jnp(b: jax.Array, gtype: GGMLType, n_out: int,
                       n_in: int):
    """jnp mirror of qmatmul._decode_blocks: packed blocks (n_out, nb, ts)
    uint8 → (codes (K,N) int32, scale (K/G,N) f32, minus|None)."""
    col = functools.partial(_col, n_out=n_out)

    if gtype in (GGMLType.Q4_0, GGMLType.Q4_1):
        off = 2 if gtype == GGMLType.Q4_0 else 4
        qs = b[..., off: off + 16].astype(I32)
        codes = jnp.concatenate([qs & 0x0F, qs >> 4], axis=2)
        d = _f16(b[..., 0:2])
        if gtype == GGMLType.Q4_0:
            return col(codes), col(d), None
        m = _f16(b[..., 2:4])
        return col(codes), col(d), col(-m)

    if gtype in (GGMLType.Q5_0, GGMLType.Q5_1):
        off = 6 if gtype == GGMLType.Q5_0 else 8
        qs = b[..., off: off + 16].astype(I32)
        qh = _u32le(b[..., off - 4: off])
        shifts = jnp.arange(32, dtype=jnp.uint32)
        hbits = ((qh[..., None] >> shifts) & 1).astype(I32)
        codes = jnp.concatenate([qs & 0x0F, qs >> 4], axis=2) | (hbits << 4)
        d = _f16(b[..., 0:2])
        if gtype == GGMLType.Q5_0:
            return col(codes), col(d), None
        m = _f16(b[..., 2:4])
        return col(codes), col(d), col(-m)

    if gtype == GGMLType.Q8_0:
        codes = b[..., 2:34].astype(I32)  # raw int8 bit patterns
        return col(codes), col(_f16(b[..., 0:2])), None

    if gtype == GGMLType.MXFP4:
        qs = b[..., 1:17].astype(I32)
        codes = jnp.concatenate([qs & 0x0F, qs >> 4], axis=2)
        e = b[..., 0].astype(I32)
        # exact 2^(e-128): bit-constructed normals; e==0 → the f32
        # subnormal 2^-128 (matches np.exp2 on host bit-for-bit)
        normal = jax.lax.bitcast_convert_type(
            ((e - 1) << 23).astype(I32), jnp.float32)
        scale = jnp.where(e >= 1, normal, jnp.float32(2.0 ** -128))
        return col(codes), col(scale), None

    if gtype == GGMLType.IQ4_NL:
        qs = b[..., 2:18].astype(I32)
        codes = jnp.concatenate([qs & 0x0F, qs >> 4], axis=2)
        return col(codes), col(_f16(b[..., 0:2])), None

    if gtype in (GGMLType.Q4_K, GGMLType.Q5_K):
        nb = b.shape[1]
        d = _f16(b[..., 0:2])
        dmin = _f16(b[..., 2:4])
        sc, mi = _scale_min_k4(b[..., 4:16])
        scale = d[..., None] * sc.astype(jnp.float32)
        minus = dmin[..., None] * mi.astype(jnp.float32)
        if gtype == GGMLType.Q4_K:
            qs = b[..., 16:144].astype(I32)
        else:
            qs = b[..., 48:176].astype(I32)
        qs = qs.reshape(n_out, nb, 4, 32)
        codes = jnp.concatenate([qs & 0x0F, qs >> 4],
                                axis=3).reshape(n_out, nb, 256)
        if gtype == GGMLType.Q5_K:
            qh = b[..., 16:48].astype(I32)
            hb = jnp.stack([(qh >> j) & 1 for j in range(8)], axis=2)
            codes = codes | (hb.reshape(n_out, nb, 256) << 4)
        return col(codes), col(scale), col(minus)

    if gtype == GGMLType.Q6_K:
        nb = b.shape[1]
        ql = b[..., 0:128].astype(I32).reshape(n_out, nb, 2, 64)
        qh = b[..., 128:192].astype(I32).reshape(n_out, nb, 2, 32)
        sc8 = b[..., 192:208].astype(I32)
        sc = (sc8 - ((sc8 & 0x80) << 1)).astype(jnp.float32)  # int8 bits
        d = _f16(b[..., 208:210])
        lo = jnp.concatenate([ql & 0x0F, ql >> 4], axis=3)
        hi = jnp.stack([(qh >> (2 * j)) & 3 for j in range(4)],
                       axis=3).reshape(n_out, nb, 2, 128)
        codes = (lo | (hi << 4)).reshape(n_out, nb, 256)
        scale = d[..., None] * sc
        return col(codes), col(scale), None

    if gtype == GGMLType.Q2_K:
        nb = b.shape[1]
        scales = b[..., 0:16].astype(I32)
        qs = b[..., 16:80].astype(I32).reshape(n_out, nb, 2, 32)
        d = _f16(b[..., 80:82])
        dmin = _f16(b[..., 82:84])
        codes = jnp.stack([(qs >> s) & 3 for s in (0, 2, 4, 6)],
                          axis=3).reshape(n_out, nb, 256)
        scale = d[..., None] * (scales & 0x0F).astype(jnp.float32)
        minus = dmin[..., None] * (scales >> 4).astype(jnp.float32)
        return col(codes), col(scale), col(minus)

    if gtype == GGMLType.Q3_K:
        nb = b.shape[1]
        hmask = b[..., 0:32].astype(I32)
        qs = b[..., 32:96].astype(I32).reshape(n_out, nb, 2, 32)
        sc = _q3k_scales(b[..., 96:108])
        d = _f16(b[..., 108:110])
        lo = jnp.stack([(qs >> s) & 3 for s in (0, 2, 4, 6)],
                       axis=3).reshape(n_out, nb, 256)
        hb = jnp.stack([(hmask >> j) & 1 for j in range(8)],
                       axis=2).reshape(n_out, nb, 256)
        codes = lo | (hb << 2)
        scale = d[..., None] * sc.astype(jnp.float32)
        return col(codes), col(scale), None

    if gtype == GGMLType.IQ4_XS:
        nb = b.shape[1]
        d = _f16(b[..., 0:2])
        scales_h = (b[..., 2].astype(I32) | (b[..., 3].astype(I32) << 8))
        scales_l = b[..., 4:8].astype(I32)
        qs = b[..., 8:136].astype(I32).reshape(n_out, nb, 8, 16)
        codes = jnp.concatenate([qs & 0x0F, qs >> 4],
                                axis=3).reshape(n_out, nb, 256)
        ls = []
        for ib in range(8):
            lsl = (scales_l[..., ib // 2] >> (4 * (ib & 1))) & 0x0F
            lsh = (scales_h >> (2 * ib)) & 3
            ls.append((lsl | (lsh << 4)) - 32)
        scale = d[..., None] * jnp.stack(ls, axis=-1).astype(jnp.float32)
        return col(codes), col(scale), None

    raise NotImplementedError(gtype.name)


DEVICE_TYPES = frozenset({
    GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1,
    GGMLType.Q8_0, GGMLType.MXFP4, GGMLType.IQ4_NL,
    GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K, GGMLType.Q2_K,
    GGMLType.Q3_K, GGMLType.IQ4_XS,
})


def _repack_planes_jnp(flat: jax.Array, gtype: GGMLType, n_out: int,
                       n_in: int, wide: bool) -> dict[str, jax.Array]:
    """Jittable: flat packed bytes → plane dict (≡ repack_np + the bf16
    scale conversion that upload_planes applies on the host path)."""
    from . import qmatmul

    tt = TYPE_TRAITS[gtype]
    nb = n_in // tt.block_size
    b = flat.reshape(n_out, nb, tt.type_size)
    codes, scale, minus = _decode_blocks_jnp(b, gtype, n_out, n_in)
    meta = qmatmul._SCHEMA[gtype]
    bits = meta["bits"]
    U = qmatmul.split_unit(gtype)
    planes: dict[str, jax.Array] = {}
    if wide:
        assert bits == 6 and minus is None, gtype
        qw = (codes - meta["bias"]).astype(jnp.int8)
        planes["qw"] = jax.lax.bitcast_convert_type(qw, jnp.uint8)
    elif bits == 4:
        planes["qs"] = _half_split_pack4(codes, U)
    elif bits == 5:
        planes["qs"] = _half_split_pack4(codes & 0x0F, U)
        planes["qh"] = _bitplane_pack(codes >> 4, 1, U)
    elif bits == 6:
        planes["qs"] = _half_split_pack4(codes & 0x0F, U)
        planes["qh"] = _bitplane_pack(codes >> 4, 2, U)
    elif bits == 3:
        planes["qs"] = _bitplane_pack(codes & 0x03, 2, U)
        planes["qh"] = _bitplane_pack(codes >> 2, 1, U)
    elif bits == 2:
        planes["qs"] = _bitplane_pack(codes, 2, U)
    elif bits == 8:
        planes["qs"] = codes.astype(jnp.uint8)
    planes["scale"] = scale.astype(jnp.bfloat16)
    if minus is not None:
        planes["minus"] = minus.astype(jnp.bfloat16)
    return planes


# no donate_argnums: blocks must stay alive while planes are computed, and
# the buffer frees on return anyway — donating only produced XLA's "donated
# buffers were not usable" warning on every load
@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _repack_jit(flat, gtype, n_out, n_in, wide):
    return _repack_planes_jnp(flat, gtype, n_out, n_in, wide)


def enabled() -> bool:
    env = os.environ.get("TPULLM_DEVICE_REPACK")
    if env is not None:
        return env not in ("0", "")
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # noqa: BLE001 — no backend at all
        return False


def supports(gtype: GGMLType) -> bool:
    return gtype in DEVICE_TYPES


def repack_device(data: np.ndarray, gtype: GGMLType, n_out: int,
                  n_in: int) -> dict[str, jax.Array]:
    """Upload packed blocks and repack on the accelerator; the uploaded
    block buffer frees when this returns (only the planes are kept)."""
    from . import qmatmul

    wide = gtype in qmatmul.WIDE_TYPES
    flat = jnp.asarray(
        np.ascontiguousarray(data, dtype=np.uint8).reshape(-1))
    return dict(_repack_jit(flat, gtype, n_out, n_in, wide))


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _repack_stack_jit(flat2d, gtype, n_out, n_in, wide):
    return jax.vmap(
        lambda f: _repack_planes_jnp(f, gtype, n_out, n_in, wide)
    )(flat2d)


def repack_device_stack(data: np.ndarray, gtype: GGMLType, n_out: int,
                        n_in: int, n_expert: int) -> dict[str, jax.Array]:
    """Stacked expert tensor (E contiguous 2-D packed weights): one packed
    upload, vmapped on-chip repack → planes with a leading expert axis
    ([E, rows, N] each)."""
    from . import qmatmul

    wide = gtype in qmatmul.WIDE_TYPES
    flat = jnp.asarray(
        np.ascontiguousarray(data, dtype=np.uint8).reshape(n_expert, -1))
    return dict(_repack_stack_jit(flat, gtype, n_out, n_in, wide))
