"""Maximal Update Parametrisation (µP) — native JAX implementation.

Replaces the `mup` package (reference pins mup==1.0.0; used at
/root/reference/training/model.py:19,208 and train_encoder.py:7,157-166,199).
The reference identifies infinite dimensions by constructing throwaway base
(n_embd=24, n_head=3) and delta (n_embd=48, n_head=12) models and calling
mup.set_base_shapes. Here the classification is derived statically from the
parameter tree structure — every dimension proportional to n_embd is
"infinite", vocab_size is finite:

  param            shape            inf dims  class        µP treatment
  -----------------------------------------------------------------------
  wte              (V, D)           1         vector-like  full LR, N(0,1) init
  blocks/*/ln*     (D,)             1         vector-like  full LR
  blocks/attn/wqkv (D, 3D)          2         matrix-like  LR / width_mult
  blocks/attn/wo   (D, D)           2         matrix-like  LR / width_mult
  blocks/mlp/wi    (D, 4D)          2         matrix-like  LR / width_mult
  blocks/mlp/wo    (4D, D)          2         matrix-like  LR / width_mult
  lm_head          (D, V)           1         vector-like  full LR; forward
                                               scaled by 1/width_mult
                                               (mup.MuReadout semantics)

where width_mult = n_embd / mup_base_n_embd (1024/24 for the defaults). This
matches mup.MuAdam's grouping exactly: params with two infinite dims get
lr /= infshape.width_mult() (the fan-in multiplier). mup's default
(decoupled_wd=False) also multiplies those groups' weight_decay by
width_mult, so the torch-AdamW effective decay lr*wd stays uniform across
parameter classes; the reference calls MuAdamW without decoupled_wd, so
that default is reproduced here via wd_mult_tree (TrainConfig.mup_decoupled_wd
opts into the decoupled variant, where decay shrinks with the group LR).

The remaining µP ingredients live elsewhere:
  * attention 1/d scale (8/n_embd): OmniBioTAConfig.attn_scale
  * readout forward multiplier: models/omnibiota.py forward()
  * init scalings: models/omnibiota.py init_params()
"""
from __future__ import annotations

from typing import Any, Dict

import jax

from .config import OmniBioTAConfig

MATRIX_LIKE_PATHS = ("wqkv", "wo", "wi")  # leaf names of matrix-like params


def _leaf_name(path) -> str:
    return str(path[-1].key if hasattr(path[-1], "key") else path[-1])


def is_matrix_like(path) -> bool:
    """True for params whose both dimensions scale with width."""
    name = _leaf_name(path)
    keys = {str(p.key) for p in path if hasattr(p, "key")}
    if "lm_head" in keys or "wte" in keys:
        return False
    return name in MATRIX_LIKE_PATHS


def lr_mult_tree(params: Dict[str, Any], cfg: OmniBioTAConfig,
                 force_lr: bool = False):
    """Per-leaf LR multiplier pytree: 1/width_mult for matrix-like params,
    1.0 otherwise. force_lr=True (reference --force_lr) disables µP scaling
    and returns all-ones (plain AdamW)."""
    wm = cfg.width_mult

    def mult(path, leaf):
        if force_lr or not is_matrix_like(path):
            return 1.0
        return 1.0 / wm

    return jax.tree_util.tree_map_with_path(mult, params)


def wd_mult_tree(params: Dict[str, Any], cfg: OmniBioTAConfig,
                 force_lr: bool = False, decoupled: bool = False):
    """Per-leaf weight-decay multiplier pytree.

    mup.MuAdam default (decoupled_wd=False): matrix-like groups get
    weight_decay *= width_mult, cancelling their LR / width_mult so the
    torch-AdamW effective decay lr*wd is uniform. decoupled=True leaves
    decay unscaled (it then shrinks with the µP-reduced LR)."""
    wm = cfg.width_mult

    def mult(path, leaf):
        if force_lr or decoupled or not is_matrix_like(path):
            return 1.0
        return wm

    return jax.tree_util.tree_map_with_path(mult, params)


def coord_check_stats(params, cfg, forward_fn, batch):
    """Helper for µP coordinate-check tests: returns mean |activation| of the
    final embeddings for a given width. Under correct µP these stay O(1) as
    width grows."""
    emb = forward_fn(params, cfg, batch, return_embeddings=True)
    return float(abs(emb).mean())
