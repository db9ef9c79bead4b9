"""Zero-copy GGUF v3 reader.

Parses the GGUF container (magic/version/KV metadata/tensor index, format per
ggml/include/gguf.h and ggml/src/gguf.cpp in the reference) and exposes tensor
payloads as zero-copy numpy views over an mmap of the file. Quantized payloads
stay packed; dequantization lives in tpullm.quant.codecs.
"""

from __future__ import annotations

import mmap
import os
import struct
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, BinaryIO

import numpy as np

from .constants import (
    GGUF_DEFAULT_ALIGNMENT,
    GGUF_MAGIC,
    GGMLType,
    GGUFValueType,
    Keys,
    TYPE_TRAITS,
)

_SCALAR_FORMATS: dict[GGUFValueType, str] = {
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

_SCALAR_NUMPY: dict[GGUFValueType, np.dtype] = {
    GGUFValueType.UINT8: np.dtype(np.uint8),
    GGUFValueType.INT8: np.dtype(np.int8),
    GGUFValueType.UINT16: np.dtype("<u2"),
    GGUFValueType.INT16: np.dtype("<i2"),
    GGUFValueType.UINT32: np.dtype("<u4"),
    GGUFValueType.INT32: np.dtype("<i4"),
    GGUFValueType.FLOAT32: np.dtype("<f4"),
    GGUFValueType.BOOL: np.dtype(np.uint8),
    GGUFValueType.UINT64: np.dtype("<u8"),
    GGUFValueType.INT64: np.dtype("<i8"),
    GGUFValueType.FLOAT64: np.dtype("<f8"),
}

_PLAIN_NUMPY: dict[GGMLType, np.dtype] = {
    GGMLType.F32: np.dtype("<f4"),
    GGMLType.F16: np.dtype("<f2"),
    GGMLType.F64: np.dtype("<f8"),
    GGMLType.I8: np.dtype(np.int8),
    GGMLType.I16: np.dtype("<i2"),
    GGMLType.I32: np.dtype("<i4"),
    GGMLType.I64: np.dtype("<i8"),
    GGMLType.BF16: np.dtype("<u2"),  # raw bits; convert via quant.codecs
}


class GGUFFormatError(ValueError):
    pass


@dataclass
class GGUFTensorInfo:
    """One entry of the tensor index.

    `shape` follows ggml `ne` convention: shape[0] is the contiguous
    (fastest-varying) dimension — i.e. a llama.cpp weight of logical shape
    (n_out, n_in) appears here as shape == (n_in, n_out).
    """

    name: str
    ggml_type: GGMLType
    shape: tuple[int, ...]
    offset: int  # relative to start of data section
    data: np.ndarray = field(repr=False, default=None)  # uint8 view, packed bytes

    @property
    def n_elements(self) -> int:
        n = 1
        for d in self.shape:
            n *= d
        return n

    @property
    def n_bytes(self) -> int:
        tt = TYPE_TRAITS[self.ggml_type]
        return self.n_elements // tt.block_size * tt.type_size

    def to_numpy(self) -> np.ndarray:
        """Dequantize/convert to a float32/native numpy array in *logical*
        (row-major, slowest-first) order: result.shape == shape[::-1]."""
        from ..quant import codecs

        logical = self.shape[::-1]
        if self.ggml_type in _PLAIN_NUMPY and self.ggml_type != GGMLType.BF16:
            return (
                self.data.view(_PLAIN_NUMPY[self.ggml_type]).reshape(logical)
            )
        if self.ggml_type == GGMLType.BF16:
            return codecs.bf16_bits_to_f32(self.data.view(np.dtype("<u2"))).reshape(logical)
        flat = codecs.dequantize(self.data, self.ggml_type, self.n_elements)
        return flat.reshape(logical)


class _Parser:
    def __init__(self, buf: memoryview):
        self.buf = buf
        self.pos = 0

    def scalar(self, vtype: GGUFValueType):
        fmt = _SCALAR_FORMATS[vtype]
        size = struct.calcsize(fmt)
        (val,) = struct.unpack_from(fmt, self.buf, self.pos)
        self.pos += size
        return val

    def string(self) -> str:
        n = self.scalar(GGUFValueType.UINT64)
        raw = bytes(self.buf[self.pos : self.pos + n])
        self.pos += n
        return raw.decode("utf-8", errors="replace")

    def value(self, vtype: GGUFValueType):
        if vtype == GGUFValueType.STRING:
            return self.string()
        if vtype == GGUFValueType.ARRAY:
            etype = GGUFValueType(self.scalar(GGUFValueType.UINT32))
            count = self.scalar(GGUFValueType.UINT64)
            if etype == GGUFValueType.STRING:
                return [self.string() for _ in range(count)]
            if etype == GGUFValueType.ARRAY:
                return [self.value(GGUFValueType.ARRAY) for _ in range(count)]
            dt = _SCALAR_NUMPY[etype]
            arr = np.frombuffer(self.buf, dtype=dt, count=count, offset=self.pos)
            self.pos += count * dt.itemsize
            if etype == GGUFValueType.BOOL:
                arr = arr.astype(bool)
            return arr
        return self.scalar(vtype)


class GGUFReader:
    """Memory-mapped GGUF file: `.metadata` dict + `.tensors` name->info map."""

    def __init__(self, path: str | os.PathLike):
        self.path = Path(path)
        self._file: BinaryIO = open(self.path, "rb")
        self._mmap = mmap.mmap(self._file.fileno(), 0, access=mmap.ACCESS_READ)
        # the mapping holds its own file reference; closing the fd now
        # avoids leaking a BufferedReader per model for process lifetime
        self._file.close()
        buf = memoryview(self._mmap)

        if bytes(buf[:4]) != GGUF_MAGIC:
            raise GGUFFormatError(f"{path}: not a GGUF file (magic {bytes(buf[:4])!r})")
        p = _Parser(buf)
        p.pos = 4
        self.version = p.scalar(GGUFValueType.UINT32)
        if self.version < 2 or self.version > 3:
            raise GGUFFormatError(f"{path}: unsupported GGUF version {self.version}")
        n_tensors = p.scalar(GGUFValueType.UINT64)
        n_kv = p.scalar(GGUFValueType.UINT64)

        self.metadata: dict[str, Any] = {}
        for _ in range(n_kv):
            key = p.string()
            vtype = GGUFValueType(p.scalar(GGUFValueType.UINT32))
            self.metadata[key] = p.value(vtype)

        self.alignment = int(self.metadata.get(Keys.General.ALIGNMENT, GGUF_DEFAULT_ALIGNMENT))

        self.tensors: dict[str, GGUFTensorInfo] = {}
        order: list[GGUFTensorInfo] = []
        for _ in range(n_tensors):
            name = p.string()
            n_dims = p.scalar(GGUFValueType.UINT32)
            shape = tuple(p.scalar(GGUFValueType.UINT64) for _ in range(n_dims))
            ggml_type = GGMLType(p.scalar(GGUFValueType.UINT32))
            offset = p.scalar(GGUFValueType.UINT64)
            info = GGUFTensorInfo(name=name, ggml_type=ggml_type, shape=shape, offset=offset)
            self.tensors[name] = info
            order.append(info)

        data_start = p.pos
        if data_start % self.alignment != 0:
            data_start += self.alignment - data_start % self.alignment
        self.data_start = data_start

        raw = np.frombuffer(self._mmap, dtype=np.uint8)
        for info in order:
            begin = data_start + info.offset
            info.data = raw[begin : begin + info.n_bytes]

        # sharded models (≡ llama_split_path, llama.h:1479): shard 1 of N
        # named <prefix>-00001-of-000NN.gguf absorbs its siblings' tensors
        self._shards: list[GGUFReader] = []
        n_split = int(self.metadata.get("split.count", 0) or 0)
        if n_split > 1 and int(self.metadata.get("split.no", 0) or 0) == 0:
            import re as _re

            m = _re.match(r"^(.*)-(\d{5})-of-(\d{5})\.gguf$", str(self.path))
            if m and int(m.group(2)) == 1:
                prefix, _, total = m.groups()
                for i in range(2, int(total) + 1):
                    sib = Path(f"{prefix}-{i:05d}-of-{total}.gguf")
                    if not sib.exists():
                        raise GGUFFormatError(f"missing shard {sib}")
                    shard = GGUFReader(sib)
                    self._shards.append(shard)
                    for name, info in shard.tensors.items():
                        if name in self.tensors:
                            raise GGUFFormatError(f"duplicate tensor {name} in {sib}")
                        self.tensors[name] = info

    # -- convenience accessors ------------------------------------------------

    @property
    def architecture(self) -> str:
        return self.metadata[Keys.General.ARCHITECTURE]

    def get(self, key: str, default=None):
        return self.metadata.get(key, default)

    def arch_key(self, template: str, default=None):
        """Look up a per-arch key, e.g. arch_key(Keys.LLM.BLOCK_COUNT)."""
        return self.metadata.get(template.format(arch=self.architecture), default)

    def close(self):
        """Best-effort close: numpy tensor views may still point into the map,
        in which case the mapping is released when they are garbage-collected."""
        for shard in getattr(self, "_shards", []):
            shard.close()
        try:
            self._mmap.close()
        except BufferError:
            pass
        finally:
            self._file.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def load_gguf(path: str | os.PathLike) -> GGUFReader:
    return GGUFReader(path)
