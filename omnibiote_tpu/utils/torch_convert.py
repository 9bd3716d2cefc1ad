"""Convert reference PyTorch OmniBioTA weights to the JAX parameter pytree.

The reference stores whole pickled modules (train_encoder.py:412-423); its
state_dict layout is:

  transformer.wte.weight               (V, D)
  transformer.h.{i}.ln_1.weight        (D,)      [+ .bias when bias=True]
  transformer.h.{i}.attn.c_attn.weight (3D, D)   torch Linear is (out, in)
  transformer.h.{i}.attn.c_proj.weight (D, D)
  transformer.h.{i}.ln_2.weight        (D,)
  transformer.h.{i}.mlp.c_fc.weight    (4D, D)
  transformer.h.{i}.mlp.c_proj.weight  (D, 4D)
  transformer.ln_f.weight              (D,)
  lm_head.weight                       (V, D)

Our layout stores (fan_in, fan_out) and stacks blocks on a leading layer axis
for lax.scan (models/omnibiota.py).
"""
from __future__ import annotations

import json
import os
from typing import Dict, Mapping

import numpy as np

from ..config import OmniBioTAConfig


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().float().numpy()
    return np.asarray(x, dtype=np.float32)


def params_from_torch_state(state: Mapping[str, object],
                            cfg: OmniBioTAConfig) -> Dict:
    """Build the JAX pytree from a reference state_dict-like mapping."""
    L = cfg.n_layer
    get = lambda k: _np(state[k])

    def block(i):
        p = {
            "ln1": {"scale": get(f"transformer.h.{i}.ln_1.weight")},
            "ln2": {"scale": get(f"transformer.h.{i}.ln_2.weight")},
            "attn": {
                "wqkv": get(f"transformer.h.{i}.attn.c_attn.weight").T,
                "wo": get(f"transformer.h.{i}.attn.c_proj.weight").T,
            },
            "mlp": {
                "wi": get(f"transformer.h.{i}.mlp.c_fc.weight").T,
                "wo": get(f"transformer.h.{i}.mlp.c_proj.weight").T,
            },
        }
        if cfg.bias:
            p["ln1"]["bias"] = get(f"transformer.h.{i}.ln_1.bias")
            p["ln2"]["bias"] = get(f"transformer.h.{i}.ln_2.bias")
            p["attn"]["bqkv"] = get(f"transformer.h.{i}.attn.c_attn.bias")
            p["attn"]["bo"] = get(f"transformer.h.{i}.attn.c_proj.bias")
            p["mlp"]["bi"] = get(f"transformer.h.{i}.mlp.c_fc.bias")
            p["mlp"]["bo"] = get(f"transformer.h.{i}.mlp.c_proj.bias")
        return p

    blocks = [block(i) for i in range(L)]
    stacked = {}

    def stack(paths, sub):
        out = {}
        for key, val in sub.items():
            if isinstance(val, dict):
                out[key] = stack(paths + [key], val)
            else:
                out[key] = np.stack(
                    [_dig(b, paths + [key]) for b in blocks], axis=0)
        return out

    def _dig(tree, path):
        for p in path:
            tree = tree[p]
        return tree

    stacked = stack([], blocks[0])

    params = {
        "wte": get("transformer.wte.weight"),
        "blocks": stacked,
        "ln_f": {"scale": get("transformer.ln_f.weight")},
        "lm_head": get("lm_head.weight").T,
    }
    if cfg.bias:
        params["ln_f"]["bias"] = get("transformer.ln_f.bias")
    return params


def strip_prefixes(state: Mapping[str, object]) -> Dict[str, object]:
    """Drop DDP/compile wrappers ('module.', '_orig_mod.') from key names."""
    out = {}
    for k, v in state.items():
        for pre in ("module.", "_orig_mod."):
            while k.startswith(pre):
                k = k[len(pre):]
        out[k] = v
    return out


def infer_config_from_torch_state(state: Mapping[str, object],
                                  mup_base_n_embd: int = 24,
                                  dropout: float = 0.0) -> OmniBioTAConfig:
    """Recover the model config from a bare reference state_dict.

    Everything is derivable from shapes: (V, D) from wte; L from the block
    key indices; bias from ln_f.bias presence; and the persistent RoPE
    buffer freqs_cis has shape (block_size, head_dim // 2)
    (/root/reference/training/model.py:90, precompute_freqs_cis), giving
    block_size and n_head = D // head_dim. mup_base_n_embd defaults to the
    reference's set_base_shapes width of 24 (train_encoder.py:158-166).
    """
    V, D = tuple(state["transformer.wte.weight"].shape)
    L = 1 + max(int(k.split(".")[2]) for k in state
                if k.startswith("transformer.h."))
    bias = "transformer.ln_f.bias" in state
    fc = state["transformer.h.0.attn.freqs_cis"]
    block_size, half = tuple(fc.shape)
    n_head = int(D) // (2 * int(half))
    return OmniBioTAConfig(
        block_size=int(block_size), vocab_size=int(V), n_layer=int(L),
        n_head=n_head, n_embd=int(D), bias=bias, dropout=dropout,
        mup_base_n_embd=mup_base_n_embd)


def load_torch_checkpoint(path: str, reference_path: str = "",
                          mup_base_n_embd: int = 24):
    """(params, cfg) from a reference .pt file.

    Handles the three formats the reference produces or users have:
      * a whole pickled module — the reference's own save format
        (train_encoder.py:412: torch.save(model.module, ...)); unpickling
        needs the reference's model.py importable, so pass reference_path
        (the repo root or its training/ dir) and the unavailable `mup`
        package is stubbed exactly as tests/reference_oracle.py does;
      * a bare state_dict;
      * a dict wrapping one under 'model' / 'state_dict' / 'model_state_dict'.
    """
    import sys
    import types

    import torch

    if "mup" not in sys.modules:
        import torch.nn as nn

        mup_stub = types.ModuleType("mup")

        class MuReadout(nn.Linear):
            pass

        mup_stub.MuReadout = MuReadout
        sys.modules["mup"] = mup_stub

    inserted = []
    if reference_path:
        for sub in ("", "training"):
            p = os.path.join(reference_path, sub) if sub else reference_path
            if os.path.isdir(p):
                sys.path.insert(0, p)
                inserted.append(p)
    try:
        obj = torch.load(path, map_location="cpu", weights_only=False)
    finally:
        for p in inserted:
            sys.path.remove(p)

    ref_cfg = None
    if hasattr(obj, "state_dict"):
        ref_cfg = getattr(obj, "config", None)
        obj = obj.state_dict()
    if not isinstance(obj, Mapping):
        raise ValueError(f"unsupported checkpoint object: {type(obj)}")
    for key in ("model", "state_dict", "model_state_dict"):
        if key in obj and isinstance(obj[key], Mapping):
            obj = obj[key]
            break
    state = strip_prefixes(obj)

    if ref_cfg is not None:
        cfg = OmniBioTAConfig(
            block_size=int(ref_cfg.block_size),
            vocab_size=int(ref_cfg.vocab_size),
            n_layer=int(ref_cfg.n_layer), n_head=int(ref_cfg.n_head),
            n_embd=int(ref_cfg.n_embd), bias=bool(ref_cfg.bias),
            dropout=0.0, mup_base_n_embd=mup_base_n_embd)
    else:
        cfg = infer_config_from_torch_state(
            state, mup_base_n_embd=mup_base_n_embd)
    return params_from_torch_state(state, cfg), cfg


def save_converted_checkpoint(params: Dict, cfg: OmniBioTAConfig,
                              out_dir: str) -> str:
    """Write params + config in this package's checkpoint-directory format
    (readable by training.checkpoint.load_model_checkpoint and every eval
    entry point)."""
    from ..training.checkpoint import save_pytree

    os.makedirs(out_dir, exist_ok=True)
    save_pytree(os.path.join(out_dir, "params.npz"), params)
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump({"model_cfg": {k: v for k, v in vars(cfg).items()},
                   "converted_from": "reference torch checkpoint"},
                  f, indent=2, default=str)
    return out_dir


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(
        description="Convert a reference OmniBioTE torch checkpoint (.pt) "
                    "into an omnibiote_tpu checkpoint directory")
    ap.add_argument("src", help=".pt file (pickled module or state_dict)")
    ap.add_argument("out_dir", help="output checkpoint directory")
    ap.add_argument("--reference_path", default="",
                    help="reference repo root, needed to unpickle "
                         "whole-module saves")
    ap.add_argument("--mup_base_n_embd", type=int, default=24,
                    help="µP base width used at training time "
                         "(reference default: 24)")
    args = ap.parse_args(argv)
    params, cfg = load_torch_checkpoint(
        args.src, reference_path=args.reference_path,
        mup_base_n_embd=args.mup_base_n_embd)
    save_converted_checkpoint(params, cfg, args.out_dir)
    n = sum(int(np.prod(x.shape)) for x in _tree_leaves(params))
    print(f"converted {n:,} params "
          f"({cfg.n_layer}L/{cfg.n_embd}d/{cfg.n_head}h, "
          f"block_size {cfg.block_size}, bias={cfg.bias}) -> {args.out_dir}")


def _tree_leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _tree_leaves(v)
        else:
            yield v


def torch_state_from_params(params: Dict, cfg: OmniBioTAConfig) -> Dict[str, np.ndarray]:
    """Inverse conversion (JAX pytree -> reference state_dict arrays)."""
    out = {
        "transformer.wte.weight": np.asarray(params["wte"], np.float32),
        "transformer.ln_f.weight": np.asarray(params["ln_f"]["scale"], np.float32),
        "lm_head.weight": np.asarray(params["lm_head"], np.float32).T,
    }
    for i in range(cfg.n_layer):
        b = params["blocks"]
        out[f"transformer.h.{i}.ln_1.weight"] = np.asarray(b["ln1"]["scale"][i], np.float32)
        out[f"transformer.h.{i}.ln_2.weight"] = np.asarray(b["ln2"]["scale"][i], np.float32)
        out[f"transformer.h.{i}.attn.c_attn.weight"] = np.asarray(b["attn"]["wqkv"][i], np.float32).T
        out[f"transformer.h.{i}.attn.c_proj.weight"] = np.asarray(b["attn"]["wo"][i], np.float32).T
        out[f"transformer.h.{i}.mlp.c_fc.weight"] = np.asarray(b["mlp"]["wi"][i], np.float32).T
        out[f"transformer.h.{i}.mlp.c_proj.weight"] = np.asarray(b["mlp"]["wo"][i], np.float32).T
    return out


if __name__ == "__main__":
    main()
