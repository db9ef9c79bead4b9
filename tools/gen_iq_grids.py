#!/usr/bin/env python3
"""Regenerate tpullm/quant/iq_grids.npz from the ggml codebook tables.

The i-quant formats (IQ1/IQ2/IQ3) index into fixed E8/D4-lattice codebooks
defined as numeric tables in ggml/src/ggml-common.h (iq2xxs_grid etc.).
These tables are format constants — part of the GGUF wire format, like the
IQ4_NL value list — so we ship them as a binary data file and parse them out
of a ggml checkout here rather than re-typing thousands of literals.

Usage: python tools/gen_iq_grids.py [path/to/ggml-common.h]
"""

import re
import sys

import numpy as np

HEADER = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/ggml/src/ggml-common.h"

TABLES = {
    # name -> (ctype, count, bytes-per-entry used, out dtype)
    "iq2xxs_grid": ("uint64_t", 256, 8, np.uint8),
    "iq2xs_grid": ("uint64_t", 512, 8, np.uint8),
    "iq2s_grid": ("uint64_t", 1024, 8, np.uint8),
    "iq3xxs_grid": ("uint32_t", 256, 4, np.uint8),
    "iq3s_grid": ("uint32_t", 512, 4, np.uint8),
    "iq1s_grid": ("uint64_t", 2048, 8, np.int8),
}


def main():
    src = open(HEADER).read()
    out = {}
    for name, (ctype, count, width, dt) in TABLES.items():
        m = re.search(
            r"GGML_TABLE_BEGIN\(%s,\s*%s,\s*\w+\)(.*?)GGML_TABLE_END\(\)"
            % (ctype, name),
            src,
            re.S,
        )
        if not m:
            raise SystemExit(f"table {name} not found in {HEADER}")
        vals = [int(v, 16) for v in re.findall(r"0x[0-9a-fA-F]+", m.group(1))]
        assert len(vals) == count, (name, len(vals))
        raw = np.asarray(vals, dtype="<u8").view(np.uint8).reshape(count, 8)
        out[name] = raw[:, :width].astype(dt) if dt == np.uint8 else raw[
            :, :width
        ].view(np.int8)
    np.savez_compressed("tpullm/quant/iq_grids.npz", **out)
    for k, v in out.items():
        print(k, v.shape, v.dtype)


if __name__ == "__main__":
    main()
