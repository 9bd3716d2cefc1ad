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


TRAIN_WORKER = r"""
import sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(coordinator_address=sys.argv[2],
                           num_processes=2, process_id=int(sys.argv[1]))
phase, ckdir = sys.argv[3], sys.argv[4]
sharding = sys.argv[5] if len(sys.argv) > 5 else "fsdp"
mesh_shape = (tuple(int(x) for x in sys.argv[6].split("x"))
              if len(sys.argv) > 6 and sys.argv[6] else None)
from omnibiote_tpu import OmniBioTAConfig, TrainConfig, EOS_TOKEN
from omnibiote_tpu.training.train import Trainer
from omnibiote_tpu.ops.segments import segment_ids_np

MODEL = OmniBioTAConfig(n_layer=2, n_head=2, n_embd=32, vocab_size=64,
                        block_size=32, dropout=0.0, attn_impl="xla",
                        compute_dtype="float32", mup_base_n_embd=16)
# fsdp: ZeRO over the full 8-device (2-process) data axis, mini 2/device;
# fsdp+pp 4x2: the dp axis (4) spans both processes, pp keeps 2 stages
tc = TrainConfig(batch_size=16, mini_batch_size=2, ctx_len=32, lr=1e-2,
                 token_budget=16 * 32 * 100.0, seed=0, sharding=sharding,
                 mesh_shape=mesh_shape, save_dir=ckdir)

def batches(seed=11):
    rng = np.random.default_rng(seed)
    while True:
        rows = []
        for _ in range(16):
            row = []
            while len(row) < 32:
                start = int(rng.integers(4, 52))
                ln = int(rng.integers(4, 10))
                row.extend(range(start, start + ln))
                row.append(EOS_TOKEN)
            rows.append(row[:32])
        toks = np.asarray(rows, np.int32)
        yield {"tokens": toks, "segments": segment_ids_np(toks)}

tr = Trainer(MODEL, tc, batch_iter=batches())
# params/moments really are cross-process sharded: device_get must be
# impossible from one process
leaves = jax.tree.leaves(tr.params)
assert any(not l.sharding.is_fully_addressable for l in leaves), \
    "no cross-process-sharded leaf?"

if phase == "A":
    for _ in range(2):
        m = tr.train_step_once()
    path = tr.save_checkpoint()
    if jax.process_index() == 0:
        with open(ckdir + "/PATH.txt", "w") as f:
            f.write(path)
    cont = [float(tr.train_step_once()["loss"]) for _ in range(2)]
    print(f"LOSSES {jax.process_index()} {cont[0]:.9e} {cont[1]:.9e}")
else:
    with open(ckdir + "/PATH.txt") as f:
        tr.restore_checkpoint(f.read().strip())
    assert tr.step == 2
    # replay the 2 batches phase A consumed before its save
    for _ in range(2):
        next(tr.batch_iter)
    cont = [float(tr.train_step_once()["loss"]) for _ in range(2)]
    print(f"LOSSES {jax.process_index()} {cont[0]:.9e} {cont[1]:.9e}")
print(f"MULTIHOST_OK {jax.process_index()}")
"""


def _run_two(script, args, extra_env=None):
    coord = f"localhost:{_free_port()}"
    env = os.environ.copy()
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.update(extra_env or {})
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, str(i), coord] + args,
            env=env, text=True, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=360)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-3000:]}"
        assert f"MULTIHOST_OK {i}" in out
    return outs


@pytest.mark.parametrize("sharding,mesh", [
    ("fsdp", ""),
    # fsdp+pp: ZeRO-3 composed with the 2-stage pipeline, dp axis spanning
    # both processes — the checkpoint leaves carry a 2-axis sharding
    ("fsdp+pp", "4x2"),
], ids=["fsdp", "fsdp_pp"])
def test_two_process_train_save_restore(tmp_path, sharding, mesh):
    """Pod-safe checkpointing: a cross-process-sharded trainer (params NOT
    fully addressable from either process) trains 2 steps, saves
    per-process shard files, and FRESH processes restore and continue
    bit-exactly."""
    ckdir = str(tmp_path / "ck")
    outs_a = _run_two(TRAIN_WORKER, ["A", ckdir, sharding, mesh])
    outs_b = _run_two(TRAIN_WORKER, ["B", ckdir, sharding, mesh])

    def losses(out):
        for line in out.splitlines():
            if line.startswith("LOSSES"):
                return line.split()[2:]
        raise AssertionError(f"no LOSSES line:\n{out[-2000:]}")

    # both processes agree within a phase, and B continues A's exact curve
    assert losses(outs_a[0]) == losses(outs_a[1])
    assert losses(outs_b[0]) == losses(outs_b[1])
    assert losses(outs_a[0]) == losses(outs_b[0]), (
        losses(outs_a[0]), losses(outs_b[0]))

    # Process-count change: the SAME shard-format checkpoint restores into a
    # single-process trainer (the conftest's 8 local devices) and continues
    # the same loss curve — the "save and restore may differ in process
    # count/layout" claim (training/checkpoint.py).
    import numpy as np
    import jax
    from omnibiote_tpu import OmniBioTAConfig, TrainConfig, EOS_TOKEN
    from omnibiote_tpu.training.train import Trainer
    from omnibiote_tpu.ops.segments import segment_ids_np

    with open(ckdir + "/PATH.txt") as f:
        path = f.read().strip()
    model = OmniBioTAConfig(n_layer=2, n_head=2, n_embd=32, vocab_size=64,
                            block_size=32, dropout=0.0, attn_impl="xla",
                            compute_dtype="float32", mup_base_n_embd=16)
    tc = TrainConfig(batch_size=16, mini_batch_size=2, ctx_len=32, lr=1e-2,
                     token_budget=16 * 32 * 100.0, seed=0, sharding=sharding,
                     mesh_shape=(tuple(int(x) for x in mesh.split("x"))
                                 if mesh else None),
                     save_dir=str(tmp_path / "ck1p"))

    def batches(seed=11):
        rng = np.random.default_rng(seed)
        while True:
            rows = []
            for _ in range(16):
                row = []
                while len(row) < 32:
                    start = int(rng.integers(4, 52))
                    ln = int(rng.integers(4, 10))
                    row.extend(range(start, start + ln))
                    row.append(EOS_TOKEN)
                rows.append(row[:32])
            toks = np.asarray(rows, np.int32)
            yield {"tokens": toks, "segments": segment_ids_np(toks)}

    tr = Trainer(model, tc, batch_iter=batches())
    tr.restore_checkpoint(path)
    assert tr.step == 2

    # eval-side entry point reads the shard format too, and its assembled
    # tree matches the restored trainer's live (checkpoint-time) params
    from omnibiote_tpu.training.checkpoint import load_model_checkpoint
    params, cfg = load_model_checkpoint(path)
    assert cfg.n_embd == 32 and cfg.n_layer == 2
    for key in ("wte", "lm_head"):
        np.testing.assert_allclose(np.asarray(params[key]),
                                   np.asarray(jax.device_get(tr.params[key])),
                                   rtol=0, atol=0)

    for _ in range(2):  # replay the batches the saving run consumed
        next(tr.batch_iter)
    cont = [float(tr.train_step_once()["loss"]) for _ in range(2)]
    want = [float(x) for x in losses(outs_b[0])]
    np.testing.assert_allclose(cont, want, rtol=1e-6)


def test_shard_restore_rejects_missing_slice(tmp_path):
    """A lost/stale .shard*.npz must fail the restore loudly: zero-filled
    parameter regions would otherwise train on silently (checkpoint.py
    _assemble_leaf coverage check)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    import pytest
    from jax.sharding import NamedSharding, PartitionSpec as P
    from omnibiote_tpu.parallel.mesh import make_mesh
    from omnibiote_tpu.training.checkpoint import (
        _save_shards, restore_tree_sharded)

    mesh = make_mesh((8,), axis_names=("data",))
    w = jax.device_put(jnp.arange(64.0).reshape(8, 8),
                       NamedSharding(mesh, P("data", None)))
    tree = {"w": w}
    _save_shards(str(tmp_path / "params"), tree)

    shard_file = str(tmp_path / "params.shard0.npz")
    with np.load(shard_file) as z:
        kept = {k: z[k] for k in list(z.files)[:-1]}  # drop one slice
    np.savez(shard_file, **kept)

    with pytest.raises((ValueError, KeyError), match="coverage|w"):
        restore_tree_sharded(str(tmp_path), "params", tree)

    # untampered file restores exactly
    _save_shards(str(tmp_path / "ok"), tree)
    back = restore_tree_sharded(str(tmp_path), "ok", tree)
    np.testing.assert_array_equal(np.asarray(back["w"]), np.asarray(w))
