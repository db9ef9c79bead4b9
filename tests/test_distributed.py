"""Multi-host runtime smoke test: a 2-process localhost `jax.distributed`
group (the pattern the reference uses for its RPC backend tests —
tools/rpc/README.md runs rpc-server processes on localhost; here the
"cluster" is two CPU processes forming one JAX process group over DCN)."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import os, sys
    import jax
    jax.config.update("jax_platforms", "cpu")

    from tpullm.parallel.distributed import init_distributed, is_coordinator

    coord, procid = sys.argv[1], int(sys.argv[2])
    info = init_distributed(coord, 2, procid)
    assert info["num_processes"] == 2, info
    assert info["global_devices"] == 4, info
    assert is_coordinator() == (procid == 0)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from tpullm.parallel import make_mesh

    mesh = make_mesh(tp=2, dp=2)
    # every process contributes its local shard of a global [4, 8] array
    global_shape = (4, 8)
    sharding = NamedSharding(mesh, P("data", "model"))
    local = np.arange(np.prod(global_shape), dtype=np.float32).reshape(
        global_shape
    )
    arr = jax.make_array_from_callback(
        global_shape, sharding, lambda idx: local[idx]
    )
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
    expect = float(local.sum())
    got = float(total.addressable_shards[0].data)
    assert got == expect, (got, expect)
    print(f"DIST_OK rank={procid} sum={got}")
    """
)


@pytest.mark.slow
def test_two_process_localhost_group(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_PLATFORM_NAME", None)
    # a dead axon tunnel blocks worker interpreters in sitecustomize
    env.pop("PALLAS_AXON_POOL_IPS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker hung")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\nstdout:{out}\nstderr:{err}"
        assert "DIST_OK" in out, out
