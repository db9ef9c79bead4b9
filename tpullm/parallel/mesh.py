"""Device mesh construction.

The communication layer of the framework: where the reference scales with
split-mode layer/row + the TCP RPC backend (SURVEY.md §2.9/§5.8), tpullm
shards weights and KV over an ICI mesh and lets GSPMD insert collectives.
Axes: ("data", "model") — data-parallel replicas × tensor-parallel shards —
plus an optional "expert" axis for MoE expert parallelism (stacked [E, ...]
expert tensors shard over it; the all-experts combine contracts over E, so
GSPMD turns the token-mix into a psum over the expert axis).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
EXPERT_AXIS = "expert"


def make_mesh(tp: int | None = None, dp: int | None = None,
              devices: list | None = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if tp is None and dp is None:
        tp, dp = n, 1
    elif tp is None:
        tp = n // dp
    elif dp is None:
        dp = n // tp
    if tp * dp != n:
        raise ValueError(f"tp({tp}) * dp({dp}) != n_devices({n})")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def make_mesh_ep(ep: int, tp: int = 1, dp: int = 1,
                 devices: list | None = None) -> Mesh:
    """3-axis mesh (data, expert, model) for MoE expert parallelism
    (≡ the reference's --n-gpu-layers + tensor-split expert placement,
    redesigned: experts shard over ICI instead of being manually split)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp * ep * tp != n:
        raise ValueError(f"dp({dp}) * ep({ep}) * tp({tp}) != n_devices({n})")
    arr = np.asarray(devices).reshape(dp, ep, tp)
    return Mesh(arr, (DATA_AXIS, EXPERT_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def sharding(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))
