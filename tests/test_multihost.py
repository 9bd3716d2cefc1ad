"""2-process jax.distributed test of the multi-host batch staging path.

The reference exercises multi-node only on a live SLURM cluster via torchrun
(/root/reference/training/train_encoder.py:103-118); here two coordinated CPU
processes (gloo collectives) validate shard_batch_pytree's process-local
slicing (parallel/mesh.py) — each host contributes its slice of the global
batch and cross-process reductions see the full batch exactly once.
"""
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(coordinator_address=sys.argv[2],
                           num_processes=2, process_id=int(sys.argv[1]))
import jax.numpy as jnp
from omnibiote_tpu.parallel.mesh import make_mesh, shard_batch_pytree

assert jax.process_count() == 2
assert jax.local_device_count() == 4 and jax.device_count() == 8

mesh = make_mesh()
tokens = np.arange(16 * 8, dtype=np.int32).reshape(16, 8)
out = shard_batch_pytree(mesh, {"tokens": tokens}, batch_dim=0)
x = out["tokens"]
assert x.shape == (16, 8), x.shape

# each process holds exactly its contiguous row slice of the global batch
for shard in x.addressable_shards:
    lo = shard.index[0].start or 0
    rows = np.asarray(shard.data)
    np.testing.assert_array_equal(rows, tokens[lo:lo + rows.shape[0]])

# a cross-process reduction sees every row exactly once
total = int(jax.device_get(jax.jit(jnp.sum)(x)))
assert total == int(tokens.sum()), (total, int(tokens.sum()))
print(f"MULTIHOST_OK {jax.process_index()}")
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_batch_staging(tmp_path):
    coord = f"localhost:{_free_port()}"
    env = os.environ.copy()
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen([sys.executable, "-c", WORKER, str(i), coord],
                         env=env, text=True, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT)
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
        assert p.returncode == 0, f"process {i} failed:\n{out[-3000:]}"
        assert f"MULTIHOST_OK {i}" in out
