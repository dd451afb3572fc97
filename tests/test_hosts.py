"""True multi-process tests for the multi-host layer.

``parallel/hosts.py`` wraps ``jax.distributed`` for pod deployments
(SURVEY.md §5.8 — the reference has no distributed backend at all).
Real multi-host hardware is not available in this image, so these
tests spawn TWO actual OS processes on localhost with a shared
coordinator, initialize through :func:`spectavi_tpu.parallel.hosts.
initialize`, and run a cross-process collective on the CPU backend —
the same control path a 2-host TPU slice takes over DCN.
"""

import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_cpu_collectives_implementation", "gloo")
import numpy as np

from spectavi_tpu.parallel.hosts import initialize, local_device_slice

pid = int(sys.argv[1])
initialize(coordinator_address=%(addr)r, num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == pid

import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

devs = np.array(jax.devices())
assert len(devs) == 2, devs  # one cpu device per process, global view
mesh = Mesh(devs, ("hosts",))
sharding = NamedSharding(mesh, P("hosts"))

# host-side sharded loading: each process materializes only its slice
full = np.arange(8, dtype=np.float32) + 1.0
sl = local_device_slice(8)
assert (sl.start, sl.stop) == ((0, 4) if pid == 0 else (4, 8)), sl
local = full[sl]

garr = jax.make_array_from_process_local_data(sharding, local, full.shape)
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(garr)
val = float(total)
assert val == float(full.sum()), val
print(f"worker{pid} psum ok {val}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_psum(tmp_path):
    addr = f"127.0.0.1:{_free_port()}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER % {"repo": REPO, "addr": addr})
    env = dict(os.environ)
    # pure-CPU jax: detach the axon TPU plugin (PYTHONPATH) and force
    # the cpu platform; one cpu device per process
    env["PYTHONPATH"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker{pid} failed:\n{out}"
        assert f"worker{pid} psum ok 36.0" in out, out
