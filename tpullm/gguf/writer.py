"""GGUF v3 writer.

Produces files readable by the llama.cpp ecosystem (container format per
ggml/include/gguf.h; writer role analogous to reference gguf-py/gguf/gguf_writer.py
and ggml/src/gguf.cpp gguf_write_to_file — independent implementation).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Sequence

import numpy as np

from .constants import (
    GGUF_DEFAULT_ALIGNMENT,
    GGUF_MAGIC,
    GGUF_VERSION,
    GGMLType,
    GGUFValueType,
    TYPE_TRAITS,
    row_size,
)

_SCALAR_FORMATS = {
    GGUFValueType.UINT8: "<B",
    GGUFValueType.INT8: "<b",
    GGUFValueType.UINT16: "<H",
    GGUFValueType.INT16: "<h",
    GGUFValueType.UINT32: "<I",
    GGUFValueType.INT32: "<i",
    GGUFValueType.FLOAT32: "<f",
    GGUFValueType.BOOL: "<?",
    GGUFValueType.UINT64: "<Q",
    GGUFValueType.INT64: "<q",
    GGUFValueType.FLOAT64: "<d",
}


def _infer_scalar_type(v: Any) -> GGUFValueType:
    if isinstance(v, bool) or isinstance(v, np.bool_):
        return GGUFValueType.BOOL
    if isinstance(v, (int, np.integer)):
        iv = int(v)
        if iv < 0:
            return GGUFValueType.INT64 if iv < -(2**31) else GGUFValueType.INT32
        return GGUFValueType.UINT64 if iv >= 2**32 else GGUFValueType.UINT32
    if isinstance(v, (float, np.floating)):
        return GGUFValueType.FLOAT32
    if isinstance(v, str):
        return GGUFValueType.STRING
    raise TypeError(f"cannot infer GGUF type for {type(v)}")


@dataclass
class _TensorRecord:
    name: str
    shape: tuple[int, ...]  # ne order (fastest-varying first)
    ggml_type: GGMLType
    payload: bytes


class GGUFWriter:
    def __init__(self, path: str | Path, architecture: str | None = None,
                 alignment: int = GGUF_DEFAULT_ALIGNMENT):
        self.path = Path(path)
        self.alignment = alignment
        self._kv: list[tuple[str, GGUFValueType, Any]] = []
        self._tensors: list[_TensorRecord] = []
        if architecture is not None:
            self.add_kv("general.architecture", architecture)

    # -- metadata -------------------------------------------------------------

    def add_kv(self, key: str, value: Any, vtype: GGUFValueType | None = None):
        if vtype is None:
            if isinstance(value, (list, tuple, np.ndarray)):
                vtype = GGUFValueType.ARRAY
            else:
                vtype = _infer_scalar_type(value)
        self._kv.append((key, vtype, value))

    def set_kv(self, key: str, value: Any, vtype: GGUFValueType | None = None):
        """add_kv replacing any earlier write of the same key (converter
        family hooks override the generic header without duplicate keys)."""
        self._kv = [(k, t, v) for (k, t, v) in self._kv if k != key]
        self.add_kv(key, value, vtype)

    # -- tensors --------------------------------------------------------------

    def add_tensor(
        self,
        name: str,
        array: np.ndarray,
        ggml_type: GGMLType | None = None,
    ):
        """Add a tensor given in *logical* (row-major) numpy order.

        Float arrays are stored as F32/F16/quantized per `ggml_type` (encoding
        via tpullm.quant.codecs); pre-packed payloads use add_packed_tensor.
        """
        from ..quant import codecs

        if ggml_type is None:
            ggml_type = GGMLType.F32 if array.dtype != np.float16 else GGMLType.F16
        ne_shape = tuple(reversed(array.shape))
        if ggml_type == GGMLType.F32:
            payload = np.ascontiguousarray(array, dtype="<f4").tobytes()
        elif ggml_type == GGMLType.F16:
            payload = np.ascontiguousarray(array, dtype="<f2").tobytes()
        elif ggml_type == GGMLType.BF16:
            payload = codecs.f32_to_bf16_bits(
                np.ascontiguousarray(array, dtype=np.float32)
            ).tobytes()
        elif ggml_type in (GGMLType.I8, GGMLType.I16, GGMLType.I32, GGMLType.I64):
            dt = {GGMLType.I8: np.int8, GGMLType.I16: "<i2",
                  GGMLType.I32: "<i4", GGMLType.I64: "<i8"}[ggml_type]
            payload = np.ascontiguousarray(array, dtype=dt).tobytes()
        else:
            flat = np.ascontiguousarray(array, dtype=np.float32).reshape(-1)
            payload = codecs.quantize(flat, ggml_type).tobytes()
        self.add_packed_tensor(name, ne_shape, ggml_type, payload)

    def add_packed_tensor(
        self, name: str, ne_shape: Sequence[int], ggml_type: GGMLType, payload: bytes
    ):
        n_elements = int(np.prod(ne_shape)) if len(ne_shape) else 1
        tt = TYPE_TRAITS[ggml_type]
        expect = n_elements // tt.block_size * tt.type_size
        if len(payload) != expect:
            raise ValueError(
                f"tensor {name}: payload {len(payload)}B != expected {expect}B "
                f"for {ggml_type.name} {tuple(ne_shape)}"
            )
        if ne_shape and ne_shape[0] % tt.block_size != 0:
            row_size(ggml_type, ne_shape[0])  # raises with a good message
        self._tensors.append(_TensorRecord(name, tuple(ne_shape), ggml_type, payload))

    # -- serialization ----------------------------------------------------------

    def _write_str(self, out, s: str):
        raw = s.encode("utf-8")
        out.write(struct.pack("<Q", len(raw)))
        out.write(raw)

    def _write_value(self, out, vtype: GGUFValueType, value: Any):
        if vtype == GGUFValueType.STRING:
            self._write_str(out, value)
        elif vtype == GGUFValueType.ARRAY:
            if isinstance(value, np.ndarray):
                etype = {
                    "f": GGUFValueType.FLOAT32,
                    "i": GGUFValueType.INT32,
                    "u": GGUFValueType.UINT32,
                    "b": GGUFValueType.BOOL,
                }[value.dtype.kind]
                if value.dtype.itemsize == 8 and value.dtype.kind in "iu":
                    etype = GGUFValueType.INT64 if value.dtype.kind == "i" else GGUFValueType.UINT64
                elems = value.tolist()
            else:
                elems = list(value)
                etype = _infer_scalar_type(elems[0]) if elems else GGUFValueType.INT32
                # promote mixed int arrays conservatively
                if etype in (GGUFValueType.UINT32, GGUFValueType.INT32) and any(
                    isinstance(e, (int, np.integer)) and (int(e) < -(2**31) or int(e) >= 2**32)
                    for e in elems
                ):
                    etype = GGUFValueType.INT64
            out.write(struct.pack("<I", int(etype)))
            out.write(struct.pack("<Q", len(elems)))
            for e in elems:
                self._write_value(out, etype, e)
        else:
            out.write(struct.pack(_SCALAR_FORMATS[vtype], value))

    def write(self):
        align = self.alignment
        with open(self.path, "wb") as out:
            out.write(GGUF_MAGIC)
            out.write(struct.pack("<I", GGUF_VERSION))
            out.write(struct.pack("<Q", len(self._tensors)))
            out.write(struct.pack("<Q", len(self._kv)))
            for key, vtype, value in self._kv:
                self._write_str(out, key)
                out.write(struct.pack("<I", int(vtype)))
                self._write_value(out, vtype, value)

            # tensor index; offsets are relative to the aligned data section
            offset = 0
            offsets = []
            for t in self._tensors:
                offsets.append(offset)
                offset += len(t.payload)
                if offset % align:
                    offset += align - offset % align
            for t, off in zip(self._tensors, offsets):
                self._write_str(out, t.name)
                out.write(struct.pack("<I", len(t.shape)))
                for d in t.shape:
                    out.write(struct.pack("<Q", d))
                out.write(struct.pack("<I", int(t.ggml_type)))
                out.write(struct.pack("<Q", off))

            pos = out.tell()
            if pos % align:
                out.write(b"\x00" * (align - pos % align))
            for t in self._tensors:
                start = out.tell()
                out.write(t.payload)
                end = out.tell()
                if end % align:
                    out.write(b"\x00" * (align - end % align))
                del start
        return self.path
