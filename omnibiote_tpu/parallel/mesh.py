"""Device mesh and sharding layout.

Replaces the reference's torchrun/NCCL/Gloo distributed stack
(/root/reference/training/train_encoder.py:103-118,181-185) with a single
GSPMD mesh: the global batch is sharded over the 'data' axis, parameters and
optimizer state are replicated (DDP-equivalent), and gradient synchronisation
is one XLA all-reduce per *step* (accumulation-local grads), not one per
micro-step like the reference's DDP-without-no_sync (train_encoder.py:308,
SURVEY.md C21c).

Scalar metrics (loss, token counts) ride the same mesh as jnp reductions —
no second Gloo-style backend (train_encoder.py:334-336 gathers Python objects
on CPU every step).

A 'model' axis is reserved for tensor-parallel extensions; with
mesh_shape=None everything lands on 'data'.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
SEQ_AXIS = "seq"     # sequence axis for dp x sp long-context meshes


def make_mesh(mesh_shape: Optional[Tuple[int, ...]] = None,
              axis_names: Sequence[str] = (DATA_AXIS,),
              devices=None) -> Mesh:
    # remember whether the CALLER fixed the device order before defaulting
    # (jax.devices() returns a fresh list per call, so an identity check
    # against a second call is always False — r4 review)
    explicit_devices = devices is not None
    devices = devices if explicit_devices else jax.devices()
    if mesh_shape is None:
        mesh_shape = (len(devices),)
        axis_names = (DATA_AXIS,)
    assert np.prod(mesh_shape) == len(devices), (
        f"mesh shape {mesh_shape} != {len(devices)} devices")
    if (len(mesh_shape) > 1 and not explicit_devices
            and devices and devices[0].platform == "tpu"):
        # Multi-dim meshes on real hardware: mesh_utils maps mesh neighbors
        # onto ICI-neighbor chips (a naive reshape of the flat device list
        # need not, sending every ppermute / all-gather over multi-hop
        # links at pod scale). Explicit device lists (tests, subsets) keep
        # the caller's order; CPU fallback likewise.
        try:
            from jax.experimental import mesh_utils
            arr = mesh_utils.create_device_mesh(tuple(mesh_shape))
            return Mesh(arr, axis_names=tuple(axis_names))
        except (ValueError, AssertionError, NotImplementedError):
            pass  # e.g. host-platform CPU devices: fall through to reshape
    arr = np.asarray(devices).reshape(mesh_shape)
    return Mesh(arr, axis_names=tuple(axis_names))


def batch_sharding(mesh: Mesh, ndim: int, batch_dim: int = 0,
                   seq_dim: Optional[int] = None) -> NamedSharding:
    """Shard dimension `batch_dim` over the data axis (and, for dp x sp
    meshes, `seq_dim` over the seq axis), replicate the rest."""
    spec = [None] * ndim
    spec[batch_dim] = DATA_AXIS
    if seq_dim is not None:
        spec[seq_dim] = SEQ_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_pytree(mesh: Mesh, batch: dict, batch_dim: int = 0,
                       seq_dim: Optional[int] = None) -> dict:
    """Place a host batch dict on the mesh with the batch dim sharded over
    data.

    Single-process: a plain device_put. Multi-host (jax.distributed): every
    host builds the same global batch (the pipeline is seed-deterministic),
    and each host contributes its process-local slice via
    jax.make_array_from_process_local_data — the replacement for the
    reference's per-rank torchrun data split (train_encoder.py:115-124).
    Per-host sharded feeding (data_hosts > 1) goes through
    shard_host_local_batch instead — the host never builds the global batch.
    """
    if jax.process_count() == 1:
        return {
            k: jax.device_put(v, batch_sharding(mesh, v.ndim, batch_dim,
                                                seq_dim))
            for k, v in batch.items()
        }
    out = {}
    for k, v in batch.items():
        sharding = batch_sharding(mesh, v.ndim, batch_dim, seq_dim)
        n = v.shape[batch_dim]
        per = n // jax.process_count()
        lo = jax.process_index() * per
        idx = [slice(None)] * v.ndim
        idx[batch_dim] = slice(lo, lo + per)
        out[k] = jax.make_array_from_process_local_data(
            sharding, v[tuple(idx)], v.shape)
    return out


def shard_host_local_batch(mesh: Mesh, batch: dict, batch_dim: int = 0,
                           global_rows: Optional[int] = None) -> dict:
    """Place per-host batch BLOCKS on the mesh: each process supplies only
    its own `global_rows // process_count` rows of dimension `batch_dim`
    (built by its host-local pipeline, data/loader.py num_hosts/host_id) —
    no process ever assembles the global batch. The global array's row p*per
    .. (p+1)*per block is process p's data, matching shard_batch_pytree's
    slice layout (and the reference's per-rank split,
    /root/reference/training/train_encoder.py:118-133).

    Single-process: equivalent to shard_batch_pytree (the local block IS the
    global batch)."""
    if jax.process_count() == 1:
        return shard_batch_pytree(mesh, batch, batch_dim)
    out = {}
    for k, v in batch.items():
        sharding = batch_sharding(mesh, v.ndim, batch_dim)
        gshape = list(v.shape)
        gshape[batch_dim] = (global_rows if global_rows is not None
                             else v.shape[batch_dim] * jax.process_count())
        out[k] = jax.make_array_from_process_local_data(
            sharding, v, tuple(gshape))
    return out
