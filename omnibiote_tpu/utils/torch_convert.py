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
