"""GGUF endianness converter (≡ gguf-py/gguf/scripts/gguf_convert_endian.py).

Walks the container structurally and byteswaps every multi-byte scalar:
header fields, typed KV values, the tensor index, and tensor payloads.
Quantized payloads swap only their per-block scale fields (vectorized over
blocks — the reference loops per block in Python); the code/nibble bytes
are endian-neutral. Types whose layout mixes packed sub-byte fields with
scales mid-stream in ways we don't certify (IQ*, TQ*, MXFP4) are rejected,
as the reference rejects everything beyond its four supported types.

    tpullm-gguf-convert-endian model.gguf big
    tpullm-gguf-convert-endian model-be.gguf little
"""

from __future__ import annotations

import argparse
import os
import shutil
import struct
import sys

import numpy as np

from ..gguf.constants import GGMLType, GGUFValueType, TYPE_TRAITS

# byte offsets (within one block) of 2-byte fields to swap, per quant type
_F16_FIELDS = {
    GGMLType.Q4_0: (0,),
    GGMLType.Q4_1: (0, 2),
    GGMLType.Q5_0: (0,),
    GGMLType.Q5_1: (0, 2),
    GGMLType.Q8_0: (0,),
    GGMLType.Q8_1: (0, 2),
    GGMLType.Q2_K: (80, 82),
    GGMLType.Q3_K: (108,),
    GGMLType.Q4_K: (0, 2),
    GGMLType.Q5_K: (0, 2),
    GGMLType.Q6_K: (208,),
}
# (byte offset, count) of 2-byte fields: Q8_K also swaps its 16 i16 bsums
_EXTRA_U16_RUNS = {GGMLType.Q8_K: ((260, 16),)}
_PLAIN_WIDTH = {
    GGMLType.F32: 4, GGMLType.F64: 8, GGMLType.F16: 2, GGMLType.BF16: 2,
    GGMLType.I16: 2, GGMLType.I32: 4, GGMLType.I64: 8,
}

_SCALAR_SIZES = {
    GGUFValueType.UINT8: 1, GGUFValueType.INT8: 1, GGUFValueType.BOOL: 1,
    GGUFValueType.UINT16: 2, GGUFValueType.INT16: 2,
    GGUFValueType.UINT32: 4, GGUFValueType.INT32: 4,
    GGUFValueType.FLOAT32: 4,
    GGUFValueType.UINT64: 8, GGUFValueType.INT64: 8,
    GGUFValueType.FLOAT64: 8,
}


class _Walker:
    """Structural walk that byteswaps scalars in place. `src_order` is the
    byte order the file is CURRENTLY in ('<' or '>')."""

    def __init__(self, buf: bytearray, src_order: str):
        self.buf = buf
        self.pos = 0
        self.o = src_order

    def _swap(self, size: int) -> None:
        p = self.pos
        self.buf[p:p + size] = self.buf[p:p + size][::-1]
        self.pos += size

    def u(self, size: int, swap: bool = True) -> int:
        fmt = {1: "B", 2: "H", 4: "I", 8: "Q"}[size]
        (val,) = struct.unpack_from(self.o + fmt, self.buf, self.pos)
        if swap and size > 1:
            self._swap(size)
        else:
            self.pos += size
        return val

    def string(self) -> str:
        n = self.u(8)
        s = bytes(self.buf[self.pos:self.pos + n])
        self.pos += n
        return s.decode("utf-8", errors="replace")

    def value(self, vtype: GGUFValueType) -> None:
        if vtype == GGUFValueType.STRING:
            self.string()
            return
        if vtype == GGUFValueType.ARRAY:
            elem = GGUFValueType(self.u(4))
            n = self.u(8)
            if elem == GGUFValueType.STRING:
                for _ in range(n):
                    self.string()
            elif elem == GGUFValueType.ARRAY:
                for _ in range(n):
                    self.value(GGUFValueType.ARRAY)
            else:
                size = _SCALAR_SIZES[elem]
                if size == 1:
                    self.pos += n
                else:
                    p = self.pos
                    arr = np.frombuffer(self.buf, np.uint8, n * size, p
                                        ).reshape(n, size)
                    np.copyto(arr, arr[:, ::-1])
                    self.pos += n * size
            return
        size = _SCALAR_SIZES[vtype]
        if size == 1:
            self.pos += 1
        else:
            self._swap(size)


def _swap_tensor_payload(data: np.ndarray, gtype: GGMLType,
                         name: str) -> None:
    """Byteswap one tensor's payload in place (vectorized per block)."""
    if gtype == GGMLType.I8:
        return  # endian-neutral
    width = _PLAIN_WIDTH.get(gtype)
    if width:
        arr = data.reshape(-1, width)
        np.copyto(arr, arr[:, ::-1])
        return
    fields = _F16_FIELDS.get(gtype)
    runs = _EXTRA_U16_RUNS.get(gtype, ())
    if fields is None and not runs and gtype != GGMLType.Q8_K:
        raise NotImplementedError(
            f"tensor {name}: cannot endian-convert {gtype.name} payloads "
            "(codebook/packed-scale layout not certified for byteswap)")
    ts = TYPE_TRAITS[gtype].type_size
    blocks = data.reshape(-1, ts)
    for off in fields or ():
        col = blocks[:, off:off + 2]
        np.copyto(col, col[:, ::-1])
    if gtype == GGMLType.Q8_K:  # f32 d at offset 0
        col = blocks[:, 0:4]
        np.copyto(col, col[:, ::-1])
    for off, count in runs:
        seg = blocks[:, off:off + 2 * count].reshape(-1, count, 2)
        np.copyto(seg, seg[:, :, ::-1])


def convert_endian(src: str, dst: str, order: str,
                   verbose: bool = True) -> dict:
    """Rewrite `src` as `dst` (in place when equal) with the requested
    byte order ('big' or 'little'). The payload is mmapped and swapped in
    place — no file-sized host buffer (models are routinely tens of GB).
    Returns {'tensors': n, 'order': order}."""
    import mmap

    if os.path.abspath(src) != os.path.abspath(dst):
        shutil.copyfile(src, dst)
    with open(dst, "r+b") as f:
        raw = mmap.mmap(f.fileno(), 0)
        magic = bytes(raw[0:4])
        if magic != b"GGUF":
            raise ValueError(f"{src}: not a GGUF file")
        # detect the source order from the version field
        (ver_le,) = struct.unpack_from("<I", raw, 4)
        src_big = ver_le > 0xFFFF  # version 2/3 byteswapped looks huge
        src_order = ">" if src_big else "<"
        want_big = order == "big"
        if src_big == want_big:
            if verbose:
                print(f"{src}: already {order}-endian", file=sys.stderr)
            raw.close()
            return {"tensors": 0, "order": order, "noop": True}
        w = _Walker(raw, src_order)
        w.pos = 4
        version = w.u(4)
        if version not in (2, 3):
            raise ValueError(f"unsupported GGUF version {version}")
        n_tensors = w.u(8)
        n_kv = w.u(8)
        align = 32
        for _ in range(n_kv):
            key = w.string()
            vtype = GGUFValueType(w.u(4))
            if key == "general.alignment" and vtype == GGUFValueType.UINT32:
                (align,) = struct.unpack_from(src_order + "I", raw, w.pos)
            w.value(vtype)
        infos = []
        for _ in range(n_tensors):
            name = w.string()
            n_dims = w.u(4)
            shape = [w.u(8) for _ in range(n_dims)]
            gtype = GGMLType(w.u(4))
            offset = w.u(8)
            infos.append((name, shape, gtype, offset))
        # data section starts at the next alignment boundary
        data_start = (w.pos + align - 1) // align * align
        for name, shape, gtype, offset in infos:
            n_el = int(np.prod(shape)) if shape else 1
            tt = TYPE_TRAITS[gtype]
            nbytes = n_el // tt.block_size * tt.type_size
            view = np.frombuffer(raw, np.uint8, nbytes,
                                 data_start + offset)
            _swap_tensor_payload(view, gtype, name)
            del view  # drop the exported mmap pointer before close
            if verbose:
                print(f"  {name}: {gtype.name} {nbytes} B", file=sys.stderr)
        raw.flush()
        raw.close()
    return {"tensors": n_tensors, "order": order}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="tpullm-gguf-convert-endian",
        description="Convert a GGUF file between little- and big-endian "
                    "(≡ gguf_convert_endian.py)")
    ap.add_argument("model")
    ap.add_argument("order", choices=["big", "little", "native"])
    ap.add_argument("-o", "--output",
                    help="write here instead of in-place")
    ap.add_argument("-q", "--quiet", action="store_true")
    args = ap.parse_args(argv)
    order = args.order
    if order == "native":
        order = "big" if sys.byteorder == "big" else "little"
    out = args.output or args.model
    res = convert_endian(args.model, out, order, verbose=not args.quiet)
    print(f"{out}: {res['tensors']} tensors -> {order}-endian"
          + (" (no-op)" if res.get("noop") else ""))
    return 0


if __name__ == "__main__":
    sys.exit(main())
