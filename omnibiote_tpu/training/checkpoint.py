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


def save_pytree(path: str, tree) -> None:
    flat = _flatten(tree)
    np.savez(path, **flat)


def load_pytree_flat(path: str) -> Dict[str, np.ndarray]:
    with np.load(path, allow_pickle=False) as z:
        return {k: z[k] for k in z.files}


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
    os.makedirs(tmp, exist_ok=True)

    params_host = jax.device_get(trainer.params)
    opt_host = jax.device_get(trainer.opt_state)
    meta = {
        "step": trainer.step,
        "trained_tokens": tokens,
        "total_iters": trainer.total_iters,
        "rng": np.asarray(jax.random.key_data(trainer.rng)
                          if jax.dtypes.issubdtype(trainer.rng.dtype, jax.dtypes.prng_key)
                          else trainer.rng).tolist(),
        "rng_impl": (str(jax.random.key_impl(trainer.rng))
                     if jax.dtypes.issubdtype(trainer.rng.dtype,
                                              jax.dtypes.prng_key) else "raw"),
        # reader positions: the snapshot taken BEFORE the batch for
        # trainer.step was staged (with prefetch, the live states have run
        # ahead by the staged-but-unconsumed lookahead; the snapshot makes
        # the resumed run restage exactly the rows this run will consume)
        "reader_states": [s.to_dict()
                          for s in trainer.reader_states_for_checkpoint()],
        "model_cfg": {k: v for k, v in vars(trainer.model_cfg).items()},
        "train_cfg": {k: (v if not isinstance(v, tuple) else list(v))
                      for k, v in vars(trainer.train_cfg).items()},
    }
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

    flat = load_pytree_flat(os.path.join(path, "params.npz"))
    trainer.params = restore_like(jax.device_get(trainer.params), flat)
    trainer.params = jax.tree.map(jnp.asarray, trainer.params)

    opt_flat = load_pytree_flat(os.path.join(path, "opt_state.npz"))
    opt_flat = {k: v for k, v in opt_flat.items()}
    trainer.opt_state = _optstate_from_tree(trainer.opt_state, opt_flat)

    # Re-apply the trainer's sharding layout: the arrays above landed on the
    # default device fully replicated, which would silently demote an
    # fsdp/tp run to replicated after resume.
    specs = getattr(trainer, "_param_specs", None)
    if specs is not None:
        from jax.sharding import NamedSharding
        from ..parallel.sharding import shard_opt_state_like
        trainer.params = jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(trainer.mesh, s)),
            trainer.params, specs)
        trainer.opt_state = shard_opt_state_like(
            trainer.opt_state, trainer.params, specs, trainer.mesh)

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
    # invalidate any staged batches built for the pre-restore step counter
    trainer._staged = None
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

    flat = load_pytree_flat(os.path.join(path, "params.npz"))
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
