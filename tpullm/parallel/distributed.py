"""Multi-host runtime wiring (the role of the reference's ggml-rpc backend,
SURVEY.md §5.8 — redesigned).

Where the reference makes remote GPUs look local over a TCP star topology
(tools/rpc/rpc-server.cpp, ggml/src/ggml-rpc/ggml-rpc.cpp: serialized
tensors + whole graphs, no collectives, no overlap), the TPU-native design
uses the JAX multi-process runtime: every host runs the SAME program,
`jax.distributed.initialize` forms the process group over DCN, and the
global mesh spans every chip of every host. GSPMD then inserts ICI/DCN
collectives exactly as in the single-host case — sharding code does not
change at all between 1 and N hosts.

Launch recipe (≡ the reference's `rpc-server -H host -p port` + `--rpc`
flags, docs/multihost.md has the full story)::

    # host 0 (coordinator)
    tpullm-server -m model.gguf --tp 8 \
        --dist-coordinator host0:9876 --dist-nprocs 2 --dist-procid 0
    # host 1
    tpullm-server -m model.gguf --tp 8 \
        --dist-coordinator host0:9876 --dist-nprocs 2 --dist-procid 1

On TPU pods procid/nprocs are auto-detected from the pod metadata, so
`initialize()` with no arguments is enough; the explicit arguments exist
for CPU process groups (tests) and non-pod topologies.
"""

from __future__ import annotations

import os

import jax

_initialized = False


def init_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids: list[int] | None = None,
) -> dict:
    """Join (or form) the multi-host process group. Idempotent.

    Returns a summary dict {process_id, num_processes, local_devices,
    global_devices}. With no arguments on a TPU pod slice, everything is
    auto-detected; on CPU/GPU the three coordinator args are required.
    """
    global _initialized
    if not _initialized:
        kwargs: dict = {}
        if coordinator is not None:
            kwargs["coordinator_address"] = coordinator
        if num_processes is not None:
            kwargs["num_processes"] = int(num_processes)
        if process_id is not None:
            kwargs["process_id"] = int(process_id)
        if local_device_ids is not None:
            kwargs["local_device_ids"] = local_device_ids
        jax.distributed.initialize(**kwargs)
        _initialized = True
    return {
        "process_id": jax.process_index(),
        "num_processes": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def shutdown_distributed() -> None:
    global _initialized
    if _initialized:
        jax.distributed.shutdown()
        _initialized = False


def is_coordinator() -> bool:
    """True on the process that should own user-facing I/O (HTTP listener,
    progress logs). ≡ the reference's main rank vs rpc-server workers."""
    return jax.process_index() == 0


def env_config() -> dict | None:
    """Read TPULLM_DIST_* env config (≡ LLAMA_ARG_* env fallbacks for the
    --dist-* flags). Returns kwargs for init_distributed, or None if unset."""
    coord = os.environ.get("TPULLM_DIST_COORDINATOR")
    if not coord:
        return None
    return {
        "coordinator": coord,
        "num_processes": int(os.environ.get("TPULLM_DIST_NPROCS", "0")) or None,
        "process_id": int(os.environ.get("TPULLM_DIST_PROCID", "-1"))
        if "TPULLM_DIST_PROCID" in os.environ else None,
    }
