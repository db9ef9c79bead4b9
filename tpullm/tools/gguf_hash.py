"""tpullm-gguf-hash: per-tensor and whole-model content hashes.

≡ reference gguf-py/gguf/scripts/gguf_hash.py: prints one line per tensor
plus an overall model hash, so two GGUFs can be compared tensor-by-tensor
regardless of metadata differences (the reference offers xxh64/sha1/sha256
and a UUIDv5; xxhash isn't vendored here, so the fast hash is blake2b-64).
"""

from __future__ import annotations

import argparse
import hashlib
import sys
import uuid

# deterministic namespace for the model UUID (≡ gguf_hash.py's UUID_NAMESPACE_LLAMA_CPP role)
_UUID_NS = uuid.UUID("ef001206-dadc-5f6d-a15f-3359e577d4e5")


def hash_gguf(path: str, algos: list[str], no_layer: bool = False,
              out=None) -> dict[str, str]:
    from ..gguf.reader import GGUFReader

    out = out or sys.stdout
    r = GGUFReader(path)
    # the model UUID always derives from sha256 so two invocations with
    # different hash flags agree on the identity of the same file
    uuid_algos = list(dict.fromkeys(algos + ["sha256"]))
    whole = {a: _new(a) for a in uuid_algos}
    totals: dict[str, str] = {}
    for name, info in r.tensors.items():
        data = memoryview(info.data)
        for a in uuid_algos:
            whole[a].update(data)
        if not no_layer:
            for a in algos:
                h = _new(a)
                h.update(data)
                print(f"{a}\t{h.hexdigest()}\t{path}:{name}", file=out)
    for a in uuid_algos:
        totals[a] = whole[a].hexdigest()
        if a in algos:
            print(f"{a}\t{totals[a]}\t{path}", file=out)
    model_uuid = uuid.uuid5(_UUID_NS, totals["sha256"])
    print(f"uuid\t{model_uuid}\t{path}", file=out)
    totals["uuid"] = str(model_uuid)
    return totals


def _new(algo: str):
    if algo == "blake2b64":
        return hashlib.blake2b(digest_size=8)
    return hashlib.new(algo)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="tpullm-gguf-hash")
    ap.add_argument("model")
    ap.add_argument("--sha256", action="store_true")
    ap.add_argument("--sha1", action="store_true")
    ap.add_argument("--blake2b64", action="store_true",
                    help="fast 64-bit hash (role of the reference's xxh64)")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--no-layer", action="store_true",
                    help="overall hashes only, skip per-tensor lines")
    args = ap.parse_args(argv)
    algos = []
    if args.blake2b64 or args.all or not (args.sha256 or args.sha1):
        algos.append("blake2b64")
    if args.sha1 or args.all:
        algos.append("sha1")
    if args.sha256 or args.all:
        algos.append("sha256")
    hash_gguf(args.model, algos, no_layer=args.no_layer)
    return 0


if __name__ == "__main__":
    sys.exit(main())
