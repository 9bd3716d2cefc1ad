"""Parameter/optimizer sharding rules (FSDP-equivalent and tensor parallel).

The reference offers DDP (replicated) or FSDP full-wrap (ZeRO-3 param/grad/
optimizer sharding, train_encoder.py:181-185). The GSPMD equivalents here:

  * 'replicated' — DDP equivalent: params + optimizer state replicated,
    grads all-reduced once per step (the default).
  * 'fsdp' — ZeRO-style: every parameter and its optimizer moments are
    sharded over the data axis (largest divisible dimension); XLA inserts
    the all-gathers for the forward/backward and keeps state sharded.
  * 'tp' — tensor parallelism over a 'model' mesh axis (Megatron-style
    column/row splits of the attention and MLP projections); an EXTENSION
    beyond the reference (SURVEY.md §7 lists TP/SP as optional extensions).

These are sharding *annotations*: the train step is unchanged, XLA inserts
the collectives (scaling-book recipe: pick a mesh, annotate, let the
compiler do the rest).
"""
from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS


def _path_names(path):
    return [str(p.key) for p in path if hasattr(p, "key")]


def _tp_spec(path, leaf, stacked: bool):
    """Megatron-style TP: column-split the fan-out of wqkv/mlp-in, row-split
    the fan-in of the output projections; shard the vocab dim of the
    readout; replicate norms and embeddings."""
    names = _path_names(path)
    name = names[-1] if names else ""
    lead = (None,) if stacked and "blocks" in names else ()
    if name == "wqkv" or (name == "wi"):
        return P(*lead, None, MODEL_AXIS)      # (D, 3D)/(D, 4D): split cols
    if name == "wo":
        return P(*lead, MODEL_AXIS, None)      # (D, D)/(4D, D): split rows
    if name == "lm_head":
        return P(None, MODEL_AXIS)             # (D, V): split vocab
    return P()


def _fsdp_dim(shape, n_shards: int) -> Optional[int]:
    """Largest dimension divisible by the shard count (None = replicate)."""
    best, best_size = None, 0
    for i, s in enumerate(shape):
        if s % n_shards == 0 and s > best_size:
            best, best_size = i, s
    return best


def param_pspecs(params, mode: str, mesh: Mesh):
    """PartitionSpec pytree for the parameter tree."""
    axes = dict(zip(mesh.axis_names, mesh.devices.shape))
    n_dp = axes.get(DATA_AXIS, 1)
    has_tp = MODEL_AXIS in axes and axes[MODEL_AXIS] > 1

    def spec(path, leaf):
        base = P()
        if mode in ("tp", "fsdp+tp") and has_tp:
            base = _tp_spec(path, leaf, stacked=True)
        if mode in ("fsdp", "fsdp+tp") and n_dp > 1:
            used = set(a for a in base if a is not None)
            dims = list(base) + [None] * (leaf.ndim - len(base))
            # shard the largest still-unsharded dim over data
            free = [i for i, d in enumerate(dims) if d is None]
            sizes = [(leaf.shape[i], i) for i in free
                     if leaf.shape[i] % n_dp == 0]
            if sizes and DATA_AXIS not in used:
                _, dim = max(sizes)
                dims[dim] = DATA_AXIS
            base = P(*dims)
        return base

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params(params, mode: str, mesh: Mesh):
    """device_put the parameter tree according to the mode's specs."""
    specs = param_pspecs(params, mode, mesh)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs), specs


def shard_opt_state_like(opt_state, params, specs, mesh: Mesh):
    """Optimizer moments mirror their parameter's sharding.

    Subtrees whose structure equals the params tree (Adam's mu/nu) get
    their specs POSITIONALLY — shape-keyed matching would give every
    same-shaped parameter the FIRST one's spec, silently resharding the
    others every step (r4 review). Leaves outside such subtrees (counts,
    scalars, the clip transform's norm) fall back to shape lookup, then
    replication."""
    params_def = jax.tree.structure(params)
    spec_list = jax.tree.leaves(specs, is_leaf=lambda x: isinstance(x, P))
    shape_to_spec = {}
    for p_leaf, s in zip(jax.tree.leaves(params), spec_list):
        shape_to_spec.setdefault(tuple(p_leaf.shape), s)

    def put(leaf, s):
        return jax.device_put(leaf, NamedSharding(mesh, s)) \
            if hasattr(leaf, "shape") else leaf

    def is_params_like(node):
        if hasattr(node, "shape"):
            return False
        try:
            return jax.tree.structure(node) == params_def
        except Exception:
            return False

    def place(node):
        if is_params_like(node):
            leaves, treedef = jax.tree.flatten(node)
            return jax.tree.unflatten(
                treedef, [put(l, s) for l, s in zip(leaves, spec_list)])
        return jax.tree.map(
            lambda l: put(l, shape_to_spec.get(
                tuple(l.shape) if hasattr(l, "shape") else (), P())), node)

    return jax.tree.map(place, opt_state, is_leaf=is_params_like)
