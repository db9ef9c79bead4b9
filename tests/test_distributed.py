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


# A real model forward across the process group (not just a collective):
# tp=2 with ONE local device per process, so every attention/FFN matmul's
# psum crosses the process boundary. Logits are teacher-forced against a
# single-process reference — the multi-host claim rests on a model, the way
# the reference's RPC backend is exercised with real graph compute over
# localhost (tools/rpc/README.md).
_FWD_WORKER = textwrap.dedent(
    """
    import os, sys
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")

    from tpullm.parallel.distributed import init_distributed

    coord, procid, model, ref_npz = (
        sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4])
    info = init_distributed(coord, 2, procid)
    assert info["num_processes"] == 2, info
    assert info["local_devices"] == 1, info
    assert info["global_devices"] == 2, info

    import jax.numpy as jnp
    from tpullm.parallel import make_mesh
    from tpullm.runtime.batch_engine import BatchEngine

    ref = np.load(ref_npz)
    p0, p1 = ref["p0"].tolist(), ref["p1"].tolist()
    mesh = make_mesh(tp=2)
    eng = BatchEngine(model, mode="dense", dtype=jnp.float32,
                      kv_dtype=jnp.float32, n_slots=2, max_seq=64,
                      prefill_chunk=16, mesh=mesh)
    rows = eng.prefill_slots({0: p0, 1: p1})
    np.testing.assert_allclose(rows[0], ref["pre0"], atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(rows[1], ref["pre1"], atol=1e-3, rtol=1e-3)
    steps = ref["steps"]  # [n_steps, 2] teacher-forced tokens
    for i, (t0, t1) in enumerate(steps):
        out = eng.decode_batch({0: int(t0), 1: int(t1)})
        np.testing.assert_allclose(
            out[0], ref["dec"][i, 0], atol=1e-3, rtol=1e-3)
        np.testing.assert_allclose(
            out[1], ref["dec"][i, 1], atol=1e-3, rtol=1e-3)
    print(f"DISTFWD_OK rank={procid} steps={len(steps)}")
    """
)


def _spawn_group(script_path, extra_args, n_local_devices, timeout=420):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local_devices}")
    env.pop("JAX_PLATFORM_NAME", None)
    # a dead axon tunnel blocks worker interpreters in sitecustomize
    env.pop("PALLAS_AXON_POOL_IPS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script_path), coord, str(i)] + extra_args,
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker hung")
        outs.append((p.returncode, out, err))
    return outs


@pytest.mark.slow
def test_two_process_model_forward(tmp_path):
    import numpy as np

    import jax.numpy as jnp

    from tpullm.models.testing import make_tiny_llama_gguf
    from tpullm.runtime.batch_engine import BatchEngine

    model = make_tiny_llama_gguf(
        tmp_path / "m.gguf",
        n_embd=64, n_head=4, n_head_kv=2, n_ff=128, n_layer=2,
    )
    p0 = [3, 17, 42, 7, 19, 55]
    p1 = [9, 2, 31, 4]
    eng = BatchEngine(model, mode="dense", dtype=jnp.float32,
                      kv_dtype=jnp.float32, n_slots=2, max_seq=64,
                      prefill_chunk=16)
    rows = eng.prefill_slots({0: p0, 1: p1})
    # teacher-forced trajectory from the single-process run
    steps, dec = [], []
    cur = {0: int(rows[0].argmax()), 1: int(rows[1].argmax())}
    for _ in range(4):
        steps.append([cur[0], cur[1]])
        out = eng.decode_batch(cur)
        dec.append(np.stack([out[0], out[1]]))
        cur = {0: int(out[0].argmax()), 1: int(out[1].argmax())}
    ref_npz = tmp_path / "ref.npz"
    np.savez(ref_npz, p0=np.asarray(p0), p1=np.asarray(p1),
             pre0=rows[0], pre1=rows[1],
             steps=np.asarray(steps), dec=np.stack(dec))

    script = tmp_path / "fwd_worker.py"
    script.write_text(_FWD_WORKER)
    outs = _spawn_group(script, [str(model), str(ref_npz)],
                        n_local_devices=1)
    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\nstdout:{out}\nstderr:{err}"
        assert "DISTFWD_OK" in out, out


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
