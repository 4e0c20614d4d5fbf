"""Two-process multi-host smoke test over localhost.

Validates the parallel.distributed glue with a REAL jax.distributed
cluster: 2 CPU processes, a global mesh, one psum — the multi-host tier
the reference has no notion of (SURVEY.md §2.5)."""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
coordinator, n, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

from libmultiviewnative_tpu.parallel.distributed import (
    describe_topology,
    host_local_views,
    initialize_multihost,
)

initialize_multihost(coordinator_address=coordinator, num_processes=n,
                     process_id=pid)
topo = describe_topology()
assert topo["process_count"] == n, topo
assert topo["process_index"] == pid, topo

# every process owns a disjoint slice of the views
mine = set(host_local_views(6))
assert len(mine) == 3

import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import numpy as np

mesh = Mesh(np.asarray(jax.devices()), ("d",))
# global array: each process contributes its local block
local = np.full((1, 4), float(pid), np.float32)
arr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("d", None)), local, (n, 4)
)
total = jax.jit(lambda a: jnp.sum(a))(arr)
# sum over both process blocks = 0*4 + 1*4 = 4
assert float(total) == 4.0, float(total)
print(f"proc {pid} OK", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(180)
def test_two_process_cluster(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", "-c", _WORKER, coordinator, "2", str(pid)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=150)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("distributed CPU cluster timed out in this environment")
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    assert any("proc 0 OK" in o for o in outs)
    assert any("proc 1 OK" in o for o in outs)
