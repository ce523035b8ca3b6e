"""Two REAL jax processes joining one distributed runtime (VERDICT r2 item 9).

Everything else in the suite emulates hosts by slicing one process's device
list; this test actually executes ``maybe_initialize_distributed``'s
``jax.distributed.initialize`` branch (parallel/distributed.py:70-74): two
OS processes on the CPU backend, coordinator on localhost, rank env vars —
the exact bootstrap a real pod uses — then a cross-process collective and a
process-major pod mesh built from the merged global device list.
"""
import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

_WORKER = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, os.environ["REPO_ROOT"])
    import jax
    jax.config.update("jax_platforms", "cpu")

    from rl_agents_tpu.parallel.distributed import (
        make_pod_mesh, maybe_initialize_distributed)

    # env vars announce the multi-process run; the initialize branch must fire
    assert maybe_initialize_distributed() is True
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4 and jax.local_device_count() == 2

    # cross-process collective over the real runtime
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    ranks = multihost_utils.process_allgather(
        jnp.array([jax.process_index()], jnp.int32))
    assert ranks.ravel().tolist() == [0, 1], ranks

    # process-major pod mesh from the global device list: the host axis must
    # walk processes (DCN), the local axis this process's devices (ICI)
    mesh = make_pod_mesh(axes=("host", "dp"))
    assert dict(mesh.shape) == {"host": 2, "dp": 2}
    for h in range(2):
        procs = {d.process_index for d in mesh.devices[h].ravel()}
        assert procs == {h}, (h, procs)

    print("WORKER_OK", jax.process_index())
""")


def test_two_process_distributed_bootstrap(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    # strip the axon sitecustomize injection too: its plugin registration can
    # probe the (possibly busy) TPU tunnel during backend discovery in the
    # workers, failing the bootstrap for reasons unrelated to this test
    env_base = {k: v for k, v in os.environ.items()
                if not k.startswith(("JAX_", "XLA_", "AXON", "PALLAS_AXON",
                                     "PYTHONPATH"))}
    procs = []
    for rank in range(2):
        env = dict(
            env_base,
            REPO_ROOT=str(Path(__file__).resolve().parent.parent),
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(rank),
        )
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))

    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=180)
            outs.append((p.returncode, out, err))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail(f"distributed bootstrap hung: {outs}")

    for rank, (code, out, err) in enumerate(outs):
        assert code == 0, f"rank {rank} failed:\n{out}\n{err}"
        assert f"WORKER_OK {rank}" in out
