"""ctypes bindings for the native C++ quant codecs (native/quants.cpp).

The library is built on demand with `make` (g++, no external deps) and cached
under native/build/. All entry points degrade gracefully: if the toolchain or
the build is unavailable, callers fall back to the numpy codecs — set
TPULLM_NO_NATIVE=1 to force the fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from ..gguf.constants import GGMLType, TYPE_TRAITS

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libtpullm_quants.so")

_lock = threading.Lock()
_lib = None
_tried = False

NATIVE_DEQUANT_TYPES = {
    GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1,
    GGMLType.Q8_0, GGMLType.Q2_K, GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K,
}
NATIVE_QUANT_TYPES = {
    GGMLType.Q4_0, GGMLType.Q8_0, GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K,
}
NATIVE_REPACK_TYPES = {
    GGMLType.Q4_0, GGMLType.Q8_0, GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K,
}


def _build() -> bool:
    if not os.path.isdir(_NATIVE_DIR):
        return False
    try:
        subprocess.run(
            ["make", "-s"], cwd=_NATIVE_DIR, check=True,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL, timeout=120,
        )
    except Exception:
        return False
    return os.path.exists(_LIB_PATH)


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried or os.environ.get("TPULLM_NO_NATIVE"):
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.tq_dequant.argtypes = [
            ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.tq_dequant.restype = ctypes.c_int
        lib.tq_quantize.argtypes = [
            ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.tq_quantize.restype = ctypes.c_int
        lib.tq_repack.argtypes = [
            ctypes.c_int, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.tq_repack.restype = ctypes.c_int
        _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def dequantize(data: np.ndarray, gtype: GGMLType, n_elements: int) -> np.ndarray | None:
    """Native dequant to f32; None when the type/library is unsupported."""
    if gtype not in NATIVE_DEQUANT_TYPES:
        return None
    lib = get_lib()
    if lib is None:
        return None
    tt = TYPE_TRAITS[gtype]
    n_blocks = n_elements // tt.block_size
    src = np.ascontiguousarray(data, dtype=np.uint8)
    if src.nbytes < n_blocks * tt.type_size:
        raise ValueError("payload too small")
    out = np.empty(n_blocks * tt.block_size, dtype=np.float32)
    rc = lib.tq_dequant(
        int(gtype), src.ctypes.data, out.ctypes.data, n_blocks
    )
    if rc != 0:
        return None
    return out


def repack(data: np.ndarray, gtype: GGMLType, n_out: int, n_in: int) -> dict | None:
    """Native blocks→planes repack (≡ qmatmul plane schema v2); None when
    the type/library is unsupported. Returns numpy plane arrays."""
    if gtype not in NATIVE_REPACK_TYPES:
        return None
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(data, dtype=np.uint8)
    G = 256 if gtype in (GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K) else 32
    planes: dict[str, np.ndarray] = {}
    if gtype == GGMLType.Q8_0:
        planes["qs"] = np.empty((n_in, n_out), np.uint8)
    else:
        planes["qs"] = np.empty((n_in // 2, n_out), np.uint8)
    if gtype == GGMLType.Q5_K:
        planes["qh"] = np.empty((n_in // 8, n_out), np.uint8)
    elif gtype == GGMLType.Q6_K:
        planes["qh"] = np.empty((n_in // 4, n_out), np.uint8)
    sg = 16 if gtype == GGMLType.Q6_K else (8 if G == 256 else 1)
    n_groups = (n_in // G) * sg
    planes["scale"] = np.empty((n_groups, n_out), np.float32)
    if gtype in (GGMLType.Q4_K, GGMLType.Q5_K):
        planes["minus"] = np.empty((n_groups, n_out), np.float32)
    rc = lib.tq_repack(
        int(gtype), src.ctypes.data, n_out, n_in,
        planes["qs"].ctypes.data,
        planes["qh"].ctypes.data if "qh" in planes else None,
        planes["scale"].ctypes.data,
        planes["minus"].ctypes.data if "minus" in planes else None,
    )
    if rc != 0:
        return None
    return planes


def quantize(values: np.ndarray, gtype: GGMLType) -> np.ndarray | None:
    """Native quantize from f32; None when the type/library is unsupported."""
    if gtype not in NATIVE_QUANT_TYPES:
        return None
    lib = get_lib()
    if lib is None:
        return None
    tt = TYPE_TRAITS[gtype]
    x = np.ascontiguousarray(values, dtype=np.float32).reshape(-1)
    if x.size % tt.block_size:
        raise ValueError(f"size {x.size} not a multiple of {tt.block_size}")
    n_blocks = x.size // tt.block_size
    out = np.empty(n_blocks * tt.type_size, dtype=np.uint8)
    rc = lib.tq_quantize(int(gtype), x.ctypes.data, out.ctypes.data, n_blocks)
    if rc != 0:
        return None
    return out
