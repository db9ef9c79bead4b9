"""GGUF endian converter (≡ gguf_convert_endian.py): big<->little
roundtrip is byte-identical; swapped fields actually swap."""

import shutil
import struct

import numpy as np
import pytest

from tpullm.gguf.constants import GGMLType
from tpullm.models.testing import make_tiny_llama_gguf
from tpullm.tools.gguf_endian import convert_endian


@pytest.fixture(scope="module")
def f32_gguf(tmp_path_factory):
    return make_tiny_llama_gguf(
        tmp_path_factory.mktemp("be") / "t.gguf",
        n_layer=1, n_embd=64, n_head=4, n_head_kv=2, n_ff=96)


@pytest.mark.parametrize("qtype", [None, "Q4_K_M", "Q8_0"])
def test_roundtrip_is_identity(f32_gguf, tmp_path, qtype):
    src = f32_gguf
    if qtype:
        from tpullm.tools.quantize import quantize_model

        q = tmp_path / f"src-{qtype}.gguf"
        quantize_model(str(src), str(q), qtype, verbose=False)
        src = str(q)
    be = tmp_path / "m-be.gguf"
    back = tmp_path / "m-back.gguf"
    res = convert_endian(str(src), str(be), "big", verbose=False)
    assert res["tensors"] > 0 and not res.get("noop")
    # the BE file is genuinely different and its version field reads
    # correctly big-endian
    raw = open(be, "rb").read()
    assert raw[:4] == b"GGUF"
    assert struct.unpack_from(">I", raw, 4)[0] == 3
    assert raw != open(src, "rb").read()
    # converting a BE file to big again is a no-op copy
    noop = tmp_path / "m-noop.gguf"
    assert convert_endian(str(be), str(noop), "big",
                          verbose=False).get("noop")
    # and back to little restores the original bytes exactly
    convert_endian(str(be), str(back), "little", verbose=False)
    assert open(back, "rb").read() == open(src, "rb").read()


def test_unsupported_type_rejected(tmp_path):
    path = make_tiny_llama_gguf(
        tmp_path / "iq.gguf", n_layer=1, n_embd=256, n_head=4, n_head_kv=2,
        n_ff=256, weight_type=GGMLType.IQ4_NL)
    with pytest.raises(NotImplementedError, match="IQ4_NL"):
        convert_endian(str(path), str(tmp_path / "iq-be.gguf"), "big",
                       verbose=False)
