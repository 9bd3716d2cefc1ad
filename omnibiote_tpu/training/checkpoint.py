"""Pytree checkpointing: params + optimizer state + step + data stream.

Replaces the reference's whole-pickled-module torch.save trio
(/root/reference/training/train_encoder.py:412-423): here a checkpoint is a
directory of flat .npz arrays plus a meta.json, fully framework-neutral and
safe to load without executing pickled code. Improvements over the reference:
  * optimizer state and schedule position resume exactly (the reference
    rebuilds a LinearLR whose start factor is trained/budget,
    train_encoder.py:220 — a resume at 90% restarts at 90% of peak LR);
  * the data stream position is checkpointed ROW-EXACTLY: ReaderState pins
    (epoch, chunk, intra-chunk sequence position, pending partial row,
    mixture-shuffle position), and saves record the snapshot taken before
    the next-to-train step's batch was staged — so a resumed run consumes
    exactly the rows the interrupted run would have, prefetch lookahead
    included (the reference reshuffles from scratch, SURVEY.md §5).

Rotation matches the reference: after a successful save the previous
checkpoint trio is deleted (train_encoder.py:417-420).
"""
from __future__ import annotations

import json
import os
import shutil
from typing import Dict

import jax
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k in sorted(tree):
            out.update(_flatten(tree[k], f"{prefix}{k}/"))
        return out
    if isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
        return out
    out[prefix[:-1]] = np.asarray(tree)
    return out


_BF16_SUFFIX = "::bf16"


def save_pytree(path: str, tree) -> None:
    """npz write. bfloat16 leaves (moment_dtype/grad_dtype levers) are not
    a native numpy dtype — store their raw bits as uint16 under a marked
    key and re-view at load; all other dtypes round-trip as-is."""
    import ml_dtypes
    flat = _flatten(tree)
    out = {}
    for k, v in flat.items():
        if v.dtype == ml_dtypes.bfloat16:
            out[k + _BF16_SUFFIX] = v.view(np.uint16)
        else:
            out[k] = v
    np.savez(path, **out)


def load_pytree_flat(path: str) -> Dict[str, np.ndarray]:
    import ml_dtypes
    with np.load(path, allow_pickle=False) as z:
        out = {}
        for k in z.files:
            if k.endswith(_BF16_SUFFIX):
                out[k[:-len(_BF16_SUFFIX)]] = z[k].view(ml_dtypes.bfloat16)
            else:
                out[k] = z[k]
        return out


def restore_like(template, flat: Dict[str, np.ndarray], prefix=""):
    """Rebuild arrays into the structure of `template`."""
    if isinstance(template, dict):
        return {k: restore_like(v, flat, f"{prefix}{k}/")
                for k, v in template.items()}
    if isinstance(template, (list, tuple)):
        vals = [restore_like(v, flat, f"{prefix}{i}/")
                for i, v in enumerate(template)]
        return type(template)(vals) if not hasattr(template, "_fields") \
            else type(template)(*vals)
    key = prefix[:-1]
    arr = flat[key]
    if hasattr(template, "dtype"):
        import jax.numpy as jnp
        return jnp.asarray(arr, dtype=template.dtype)
    # python scalar leaves (e.g. optax counts stored as arrays)
    return type(template)(arr) if not isinstance(template, np.ndarray) else arr


def checkpoint_dir(save_dir: str, save_name: str, tokens: int) -> str:
    return os.path.join(save_dir, f"{save_name}_{tokens}")


# --------------------------------------------------------------------------
# Multi-process (pod) support: per-process addressable shards
# --------------------------------------------------------------------------
#
# On a multi-process pod with fsdp/tp/pp sharding, jax.device_get on the
# full tree raises (arrays are not fully addressable from any one process).
# Instead every process writes ONLY its addressable shards — exactly one
# process globally per unique shard (replica_id == 0) — into its own
# `<name>.shard<pid>.npz`, with the global slice encoded in the key:
#   "<leaf-key>@<start>:<stop>,<start>:<stop>"    (scalars: "<leaf-key>@")
# Restore streams every shard file, reassembles each leaf's global array,
# and re-places it under the restoring trainer's target sharding via
# jax.make_array_from_callback — so process count and layout may differ
# between save and restore. save_dir must be a filesystem all processes
# share (GCS/NFS mount — the standard pod setup); per-host local disks
# would scatter the shard files. Reference analogue: rank-0 torch.save
# (/root/reference/training/train_encoder.py:412-423), which cannot save a
# sharded state at all.

def _index_key(leaf_key: str, index, shape) -> str:
    parts = []
    for sl, dim in zip(index, shape):
        start = 0 if sl.start is None else int(sl.start)
        stop = dim if sl.stop is None else int(sl.stop)
        parts.append(f"{start}:{stop}")
    return f"{leaf_key}@{','.join(parts)}"


def _parse_index_key(key: str):
    leaf_key, _, idx = key.rpartition("@")
    if not idx:
        return leaf_key, ()
    slices = []
    for part in idx.split(","):
        start, stop = part.split(":")
        slices.append(slice(int(start), int(stop)))
    return leaf_key, tuple(slices)


def _local_shards(tree) -> Dict[str, np.ndarray]:
    """Flatten `tree` to {key@slice: np.ndarray} holding this process's
    addressable, replica-0 shards (exactly one global writer per slice)."""
    flat = {}
    for leaf_key, leaf in _flatten_leaves(tree):
        if not hasattr(leaf, "addressable_shards"):
            # host-side scalar/numpy leaf: identical on every process;
            # process 0 owns it
            import jax
            if jax.process_index() == 0:
                arr = np.asarray(leaf)
                flat[_index_key(leaf_key, (slice(0, d) for d in arr.shape),
                                arr.shape)] = arr
            continue
        for shard in leaf.addressable_shards:
            if shard.replica_id != 0:
                continue
            arr = np.asarray(shard.data)
            flat[_index_key(leaf_key, shard.index, leaf.shape)] = arr
    return flat


def _flatten_leaves(tree, prefix=""):
    if isinstance(tree, dict):
        for k in sorted(tree):
            yield from _flatten_leaves(tree[k], f"{prefix}{k}/")
        return
    if isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _flatten_leaves(v, f"{prefix}{i}/")
        return
    yield prefix[:-1], tree


def _save_shards(path_base: str, tree) -> None:
    import jax
    import ml_dtypes
    flat = _local_shards(tree)
    out = {}
    for k, v in flat.items():
        if v.dtype == ml_dtypes.bfloat16:
            out[k + _BF16_SUFFIX] = v.view(np.uint16)
        else:
            out[k] = v
    np.savez(f"{path_base}.shard{jax.process_index()}.npz", **out)


def _load_all_shards(dirpath: str, name: str) -> Dict[str, Dict]:
    """Read every `<name>.shard*.npz` in `dirpath`; returns
    {leaf_key: {index_tuple: np.ndarray}}."""
    import glob
    import ml_dtypes
    by_leaf: Dict[str, Dict] = {}
    for f in sorted(glob.glob(os.path.join(dirpath, f"{name}.shard*.npz"))):
        with np.load(f, allow_pickle=False) as z:
            for k in z.files:
                arr = z[k]
                if k.endswith(_BF16_SUFFIX):
                    arr = arr.view(ml_dtypes.bfloat16)
                    k = k[:-len(_BF16_SUFFIX)]
                leaf_key, index = _parse_index_key(k)
                by_leaf.setdefault(leaf_key, {})[index] = arr
    return by_leaf


def _assemble_leaf(shards: Dict, shape, dtype, leaf_key="") -> np.ndarray:
    """Fill a global ndarray from {index: shard} pieces. The slices of a
    GSPMD-sharded leaf (replica 0 only) partition it exactly, so anything
    other than 100% coverage means a per-process shard file is missing or
    stale — raise rather than silently restore zero-filled regions."""
    if not shape:
        (arr,) = shards.values()
        return np.asarray(arr, dtype=dtype).reshape(())
    out = np.zeros(shape, dtype=dtype)
    filled = 0
    for index, arr in shards.items():
        out[index if index else tuple(slice(0, d) for d in shape)] = arr
        filled += int(arr.size)
    total = int(np.prod(shape))
    if filled != total:
        raise ValueError(
            f"shard coverage mismatch for {leaf_key!r}: {filled} of {total} "
            f"elements present — a .shard*.npz file is missing or duplicated")
    return out


def restore_tree_sharded(dirpath: str, name: str, template):
    """Rebuild a pytree from per-process shard files, re-placed under the
    template leaves' shardings (which may differ from the saving run's)."""
    import jax

    by_leaf = _load_all_shards(dirpath, name)

    def rebuild(leaf_key, leaf):
        shards = by_leaf[leaf_key]
        if not hasattr(leaf, "dtype"):
            arr = _assemble_leaf(shards, (), np.asarray(leaf).dtype, leaf_key)
            return type(leaf)(arr)
        host = _assemble_leaf(shards, leaf.shape, leaf.dtype, leaf_key)
        sharding = getattr(leaf, "sharding", None)
        if sharding is None or not hasattr(leaf, "addressable_shards"):
            return host
        return jax.make_array_from_callback(
            leaf.shape, sharding, lambda idx: host[idx])

    keys = dict(_flatten_leaves(template))
    rebuilt = {k: rebuild(k, v) for k, v in keys.items()}

    def walk(node, prefix=""):
        if isinstance(node, dict):
            return {k: walk(v, f"{prefix}{k}/") for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            vals = [walk(v, f"{prefix}{i}/") for i, v in enumerate(node)]
            return (type(node)(vals) if not hasattr(node, "_fields")
                    else type(node)(*vals))
        return rebuilt[prefix[:-1]]

    return walk(template)


def save_checkpoint(trainer, final: bool = False,
                    async_save: bool = False) -> str:
    """Snapshot + write. async_save=True fetches the device state
    synchronously (the snapshot must precede further train steps) but runs
    the npz/disk work in a background thread, so training overlaps the
    multi-GB write. Saves are serialised: a new save joins the previous
    writer first; Trainer.close()/wait_for_checkpoint() join the last one.
    """
    # join any in-flight writer: ordering and rotation stay sequential
    prev_thread = getattr(trainer, "_ckpt_thread", None)
    if prev_thread is not None:
        prev_thread.join()
        trainer._ckpt_thread = None
        exc = getattr(prev_thread, "exc", None)
        if exc is not None:
            raise RuntimeError(
                "previous async checkpoint write failed") from exc

    tc = trainer.train_cfg
    tokens = int(trainer.trained_tokens)
    name = tc.save_name if final else f"{tc.save_name}_{tokens}"
    path = os.path.join(tc.save_dir, name)
    tmp = path + ".tmp"
    multiproc = jax.process_count() > 1
    # A crashed earlier save can leave stale files in tmp — possibly from a
    # different save MODE (a single-process params.npz next to fresh pod
    # shard files would silently win at restore; stale shards from another
    # process count would fail shard-coverage validation). Clear before
    # writing. Every process clears (covers per-host local disks, and
    # concurrent rmtree of a shared dir is harmless with ignore_errors),
    # then a barrier keeps any writer from starting while a peer is still
    # clearing.
    shutil.rmtree(tmp, ignore_errors=True)
    if multiproc:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("obt_ckpt_tmp_clear")
    os.makedirs(tmp, exist_ok=True)
    if multiproc:
        return _save_checkpoint_multiproc(trainer, path, tmp, final)

    params_host = jax.device_get(trainer.params)
    opt_host = jax.device_get(trainer.opt_state)
    # reader positions in meta: the snapshot taken BEFORE the batch for
    # trainer.step was staged (with prefetch, the live states have run
    # ahead by the staged-but-unconsumed lookahead; the snapshot makes
    # the resumed run restage exactly the rows this run will consume)
    meta = _build_meta(trainer)
    meta["sharded"] = False
    prev_path = getattr(trainer, "_last_ckpt_path", None)

    def _write():
        save_pytree(os.path.join(tmp, "params.npz"), params_host)
        save_pytree(os.path.join(tmp, "opt_state.npz"),
                    _optstate_to_tree(opt_host))
        with open(os.path.join(tmp, "meta.json"), "w") as f:
            json.dump(meta, f, indent=2, default=str)
        if os.path.exists(path):
            shutil.rmtree(path)
        os.rename(tmp, path)
        # rotate: delete previous non-final checkpoint (reference behaviour)
        if prev_path and prev_path != path and os.path.exists(prev_path) \
                and not final:
            shutil.rmtree(prev_path)

    if async_save:
        import threading

        # _last_ckpt_path advances only after the rename lands: a failed or
        # interpreter-killed write must not be recorded as the latest
        # checkpoint (nor feed the next save's rotation). The exception is
        # stored on the thread and re-raised at the next join point.
        def _runner():
            try:
                _write()
                trainer._last_ckpt_path = path
            except BaseException as e:
                t.exc = e

        t = threading.Thread(target=_runner, daemon=True)
        t.exc = None
        t.start()
        trainer._ckpt_thread = t
    else:
        _write()
        trainer._last_ckpt_path = path
    return path


def _save_checkpoint_multiproc(trainer, path: str, tmp: str,
                               final: bool) -> str:
    """Pod-safe save: every process writes its addressable shards (one
    global writer per unique shard); process 0 writes meta.json and performs
    the atomic rename after a cross-process barrier. Synchronous (the
    per-process write is only this host's slice — a fraction of the state)."""
    import jax
    from jax.experimental import multihost_utils

    _save_shards(os.path.join(tmp, "params"), trainer.params)
    _save_shards(os.path.join(tmp, "opt_state"),
                 _optstate_to_tree(trainer.opt_state))
    if getattr(trainer, "data_hosts", 1) > 1:
        # per-host sharded feeding: every process owns a distinct stream
        # position — each writes its own snapshot (meta.json keeps process
        # 0's for single-host inspection; restore prefers these files)
        states = [s.to_dict() for s in trainer.reader_states_for_checkpoint()]
        with open(os.path.join(
                tmp, f"reader_states.proc{jax.process_index()}.json"),
                "w") as f:
            json.dump(states, f)
    if jax.process_index() == 0:
        meta = _build_meta(trainer)
        with open(os.path.join(tmp, "meta.json"), "w") as f:
            json.dump(meta, f, indent=2, default=str)
    prev_path = getattr(trainer, "_last_ckpt_path", None)
    # all shard files must land before the rename makes the dir visible
    multihost_utils.sync_global_devices("obt_ckpt_write")
    if jax.process_index() == 0:
        if os.path.exists(path):
            shutil.rmtree(path)
        os.rename(tmp, path)
        if prev_path and prev_path != path and os.path.exists(prev_path) \
                and not final:
            shutil.rmtree(prev_path)
    multihost_utils.sync_global_devices("obt_ckpt_rename")
    trainer._last_ckpt_path = path
    return path


def _build_meta(trainer) -> Dict:
    import jax
    tokens = int(trainer.trained_tokens)
    return {
        "step": trainer.step,
        "trained_tokens": tokens,
        "total_iters": trainer.total_iters,
        "data_hosts": getattr(trainer, "data_hosts", 1),
        "rng": np.asarray(
            jax.random.key_data(trainer.rng)
            if jax.dtypes.issubdtype(trainer.rng.dtype, jax.dtypes.prng_key)
            else trainer.rng).tolist(),
        "rng_impl": (str(jax.random.key_impl(trainer.rng))
                     if jax.dtypes.issubdtype(trainer.rng.dtype,
                                              jax.dtypes.prng_key)
                     else "raw"),
        "reader_states": [s.to_dict()
                          for s in trainer.reader_states_for_checkpoint()],
        "model_cfg": {k: v for k, v in vars(trainer.model_cfg).items()},
        "train_cfg": {k: (v if not isinstance(v, tuple) else list(v))
                      for k, v in vars(trainer.train_cfg).items()},
        "sharded": True,
    }


def _optstate_to_tree(opt_state):
    """optax states are namedtuples; convert to nested lists/dicts of leaves
    via jax.tree flatten with structure kept separately at restore time."""
    leaves = jax.tree.leaves(opt_state)
    return {str(i): leaf for i, leaf in enumerate(leaves)}


def _optstate_from_tree(template_state, flat_leaves: Dict[str, np.ndarray]):
    import jax.numpy as jnp
    leaves, treedef = jax.tree.flatten(template_state)
    new_leaves = []
    for i, leaf in enumerate(leaves):
        arr = flat_leaves[str(i)]
        new_leaves.append(jnp.asarray(arr, dtype=leaf.dtype)
                          if hasattr(leaf, "dtype") else arr)
    return jax.tree.unflatten(treedef, new_leaves)


def restore_into_trainer(trainer, path: str) -> None:
    import jax.numpy as jnp
    from ..data.loader import ReaderState

    # Stop the staged stream FIRST: its prefetch worker pulls batches
    # through batch_iter and mutates the live ReaderStates — left running
    # it would advance the positions this restore is about to assign
    # (r4 review).
    if trainer._staged is not None and hasattr(trainer._staged, "close"):
        trainer._staged.close()
    trainer._staged = None

    if os.path.exists(os.path.join(path, "params.npz")):
        # single-process (monolithic npz) format
        flat = load_pytree_flat(os.path.join(path, "params.npz"))
        trainer.params = restore_like(jax.device_get(trainer.params), flat)
        trainer.params = jax.tree.map(jnp.asarray, trainer.params)

        opt_flat = load_pytree_flat(os.path.join(path, "opt_state.npz"))
        opt_flat = {k: v for k, v in opt_flat.items()}
        trainer.opt_state = _optstate_from_tree(trainer.opt_state, opt_flat)

        # Re-apply the trainer's sharding layout: the arrays above landed on
        # the default device fully replicated, which would silently demote
        # an fsdp/tp run to replicated after resume.
        specs = getattr(trainer, "_param_specs", None)
        if specs is not None:
            from jax.sharding import NamedSharding
            from ..parallel.sharding import shard_opt_state_like
            trainer.params = jax.tree.map(
                lambda x, s: jax.device_put(
                    x, NamedSharding(trainer.mesh, s)),
                trainer.params, specs)
            trainer.opt_state = shard_opt_state_like(
                trainer.opt_state, trainer.params, specs, trainer.mesh)
    else:
        # per-process shard format (pod-safe save): reassemble each leaf
        # from all shard files and re-place it under THIS trainer's live
        # sharding — save and restore may differ in process count/layout
        trainer.params = restore_tree_sharded(path, "params", trainer.params)
        opt_tree = restore_tree_sharded(
            path, "opt_state", _optstate_to_tree(trainer.opt_state))
        leaves, treedef = jax.tree.flatten(trainer.opt_state)
        trainer.opt_state = jax.tree.unflatten(
            treedef, [opt_tree[str(i)] for i in range(len(leaves))])

    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    trainer.step = int(meta["step"])
    trainer.trained_tokens = int(meta["trained_tokens"])
    rng = np.asarray(meta["rng"], dtype=np.uint32)
    impl = meta.get("rng_impl", "raw")
    if impl != "raw":
        trainer.rng = jax.random.wrap_key_data(jnp.asarray(rng), impl=impl)
    else:
        trainer.rng = jnp.asarray(rng)
    saved_hosts = int(meta.get("data_hosts", 1))
    my_hosts = getattr(trainer, "data_hosts", 1)
    if saved_hosts != my_hosts and (trainer.reader_states
                                    or meta["reader_states"]):
        raise ValueError(
            f"checkpoint was saved with data_hosts={saved_hosts} but this "
            f"trainer runs data_hosts={my_hosts}: per-host streams are "
            "striped by host count, so the stream position cannot be "
            "resumed row-exactly across a host-count change — restart the "
            "data stream (reader_states=[]) or keep the host count")
    proc_file = os.path.join(
        path, f"reader_states.proc{jax.process_index()}.json")
    if my_hosts > 1 and os.path.exists(proc_file):
        with open(proc_file) as f:
            restored = [ReaderState.from_dict(d) for d in json.load(f)]
    else:
        restored = [ReaderState.from_dict(d) for d in meta["reader_states"]]
    if len(trainer.reader_states) == len(restored):
        # Mutate the live state objects in place: the data pipeline's readers
        # hold references to these very objects, so (as long as no batch has
        # been pulled yet) the stream resumes at the checkpointed position
        # without rebuilding the pipeline.
        for live, new in zip(trainer.reader_states, restored):
            live.assign(new)
    else:
        trainer.reader_states = restored
    trainer._reader_snapshots = {}
    trainer._grand = trainer._grand_seg = None
    trainer._last_ckpt_path = path


def load_model_checkpoint(path: str):
    """Load (params, model_cfg) from a checkpoint directory — the eval-side
    entry point (the reference unpickles whole modules instead,
    evals/gue.py:279)."""
    import jax.numpy as jnp
    from ..config import OmniBioTAConfig

    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    raw = dict(meta["model_cfg"])
    fields = OmniBioTAConfig.__dataclass_fields__
    cfg = OmniBioTAConfig(**{k: v for k, v in raw.items() if k in fields})

    if os.path.exists(os.path.join(path, "params.npz")):
        flat = load_pytree_flat(os.path.join(path, "params.npz"))
    else:
        # pod-saved shard format: assemble each leaf's global array
        by_leaf = _load_all_shards(path, "params")
        flat = {}
        for leaf_key, shards in by_leaf.items():
            stops = [max(s[d].stop for s in shards if s)
                     for d in range(len(next(iter(shards))))]
            dtype = next(iter(shards.values())).dtype
            flat[leaf_key] = _assemble_leaf(shards, tuple(stops), dtype)
    tree: Dict = {}
    for key, arr in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(arr)
    return tree, cfg


def latest_checkpoint(save_dir: str, save_name: str) -> str | None:
    if not os.path.isdir(save_dir):
        return None
    best, best_tok = None, -1
    for d in os.listdir(save_dir):
        full = os.path.join(save_dir, d)
        if not os.path.isdir(full) or not d.startswith(save_name):
            continue
        suffix = d[len(save_name):].lstrip("_")
        tok = int(suffix) if suffix.isdigit() else 0
        if tok > best_tok:
            best, best_tok = full, tok
    return best
