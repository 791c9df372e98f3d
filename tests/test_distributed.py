"""Multi-host (multi-process) smoke test on CPU.

The container has one host + one TPU chip, so the multi-host path
(parallel/distributed.py — SURVEY.md §5 "DCN only for multi-host input
pipeline + checkpoint writes") is validated the way multi-chip is: two
REAL OS processes, Gloo-backed CPU collectives, a global 4-device mesh
(2 hosts x 2 virtual devices). Pins:

* jax.distributed.initialize via initialize_multihost -> GLOBAL device
  visibility on every process;
* shard_process_local: each process feeds only its local batch slice, and
  the jit-ed gradient of the global-batch mean loss (the train step's
  reduction structure — one psum) matches the single-process closed form
  bit-for-bit on BOTH processes;
* is_coordinator gates exactly one writer.
"""

import os
import socket
import subprocess
import sys

import numpy as np

_WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 2)
except Exception:
    pass
port, pid = sys.argv[1], int(sys.argv[2])

from nerf_for_angiography_tpu.parallel import (
    create_mesh, initialize_multihost, is_coordinator, process_local_slice,
    replicate, shard_process_local,
)

initialize_multihost(f"localhost:{port}", num_processes=2, process_id=pid)

import jax.numpy as jnp
import numpy as np

assert jax.process_count() == 2
print(f"DEVICES {pid} {jax.device_count()} {jax.local_device_count()}",
      flush=True)

mesh = create_mesh()  # global mesh across both processes

# global batch: y = 3x + noise, deterministic
rs = np.random.RandomState(0)
x_all = rs.rand(16).astype(np.float32)
y_all = (3.0 * x_all + 0.1 * rs.rand(16)).astype(np.float32)
sl = process_local_slice(16)
batch = shard_process_local(
    {"x": x_all[sl], "y": y_all[sl]}, mesh
)

w = replicate(jnp.float32(1.5), mesh)

def loss(w, b):
    return jnp.mean((w * b["x"] - b["y"]) ** 2)

g = jax.jit(jax.grad(loss))(w, batch)
# single-process closed form of the SAME global-batch gradient
want = float(np.mean(2.0 * (1.5 * x_all - y_all) * x_all))
print(f"GRAD {pid} {float(g):.8f} WANT {want:.8f}", flush=True)
assert abs(float(g) - want) < 1e-6, (float(g), want)
print(f"COORD {pid} {int(is_coordinator())}", flush=True)
print(f"OK {pid}", flush=True)
"""


def test_two_process_cpu_multihost(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env["PYTHONPATH"] = (
        "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    ).rstrip(os.pathsep)

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(port), str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert f"OK {i}" in out, out
        # global visibility: 2 processes x 2 virtual devices = 4 global
        assert f"DEVICES {i} 4 2" in out, out
    coords = sorted(
        line.split()[2]
        for out in outs
        for line in out.splitlines()
        if line.startswith("COORD ")
    )
    assert coords == ["0", "1"], coords  # exactly one writer
    grads = {
        line.split()[1]: line.split()[2]
        for out in outs
        for line in out.splitlines()
        if line.startswith("GRAD ")
    }
    assert grads["0"] == grads["1"], grads  # identical reduced gradient
