"""Shared eval-harness utilities: tokenization, padded batching, schedules,
and the fine-tune optimizer with the reference's three LR parameter groups.

Protocol sources (in /root/reference/evals/):
  * tokenize-with-tag + EOS + banned-token strip: gue.py:96-97
  * PAD-to-max-len batches + pad_attn masking: gue.py:101-110
  * 3 LR groups (wte / rest / head at 1e-2) + OneCycleLR: gue.py:62-72
  * domain-adaptive MLM pretrain: gue.py:284-335

TPU adaptations: batch lengths are bucketed (rounded up to a multiple of
128) so XLA compiles a handful of shapes instead of one per batch; the extra
PAD columns are invisible through the padding mask and do not change any
real token's embedding.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import EOS_TOKEN, PAD_TOKEN, OmniBioTAConfig
from ..models.omnibiota import forward
from ..ops.segments import padding_segment_ids_np


# --------------------------------------------------------------------------
# Tokenization / batching
# --------------------------------------------------------------------------

def tokenize_sequences(sp, sequences: Sequence[str], tag: str = "",
                       banned_tokens: Sequence[int] = (),
                       append_eos: bool = True) -> List[List[int]]:
    """sp.encode(tag + seq) + [EOS], banned ids stripped (gue.py:96-97)."""
    banned = set(banned_tokens)
    out = []
    for ids in (sp.encode_batch([tag + s for s in sequences])
                if hasattr(sp, "encode_batch")
                else [sp.encode(tag + s) for s in sequences]):
        ids = [int(t) for t in ids]
        if append_eos:
            ids.append(EOS_TOKEN)
        out.append([t for t in ids if t not in banned])
    return out


def bucket_len(n: int, bucket: int = 128, max_len: Optional[int] = None) -> int:
    b = ((n + bucket - 1) // bucket) * bucket
    return min(b, max_len) if max_len else b


def pad_batch(token_lists: Sequence[Sequence[int]], bucket: int = 128,
              max_len: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
    """PAD-filled (B, L) batch + padding segment ids (pad_attn semantics).

    Sequences longer than max_len are truncated (reference truncation to 1024
    at proteinGLUE.py:416 etc.)."""
    longest = max(len(t) for t in token_lists)
    if max_len:
        longest = min(longest, max_len)
    L = bucket_len(longest, bucket, max_len)
    x = np.full((len(token_lists), L), PAD_TOKEN, np.int32)
    for i, toks in enumerate(token_lists):
        toks = list(toks)[:L]
        x[i, :len(toks)] = toks
    return x, padding_segment_ids_np(x, PAD_TOKEN)


# --------------------------------------------------------------------------
# Schedules / optimizers
# --------------------------------------------------------------------------

def onecycle(max_lr: float, total_steps: int, pct_start: float = 0.05,
             div_factor: float = 25.0, final_div_factor: float = 1e4):
    """torch OneCycleLR (cosine) equivalent (gue.py:72).

    The warmup phase must span at least one step, otherwise optax's
    piecewise interpolation divides by zero and every update is NaN.
    """
    total = max(total_steps, 2)
    pct = min(max(pct_start, 1.0 / total), 0.9)
    return optax.schedules.cosine_onecycle_schedule(
        transition_steps=total, peak_value=max_lr,
        pct_start=pct, div_factor=div_factor,
        final_div_factor=final_div_factor)


def linear_to_zero(lr: float, total_steps: int):
    def sched(count):
        frac = jnp.minimum(count, total_steps) / jnp.maximum(total_steps, 1)
        return lr * (1.0 - frac)
    return sched


@dataclasses.dataclass
class FinetuneState:
    """Model params + task head params + optimizer state."""
    params: dict        # model pytree
    head: dict          # head pytree
    opt_state: object
    step: int = 0


def group_label_tree(params: dict, head: dict):
    """(model, head) -> label pytree: 'wte' / 'rest' / 'head'
    (gue.py:62-66: wte group, non-wte group, head at fixed 1e-2)."""
    model_labels = jax.tree_util.tree_map_with_path(
        lambda path, _: "wte" if any(
            getattr(p, "key", None) == "wte" for p in path) else "rest",
        params)
    head_labels = jax.tree.map(lambda _: "head", head)
    return {"model": model_labels, "head": head_labels}


def make_finetune_optimizer(params: dict, head: dict, *, lr: float,
                            embed_lr: float, head_lr: float = 1e-2,
                            total_steps: int, schedule: str = "onecycle",
                            pct_start: float = 0.05):
    """AdamW with the reference's three LR parameter groups."""
    def make_sched(peak):
        if schedule == "onecycle":
            return onecycle(peak, total_steps, pct_start)
        return linear_to_zero(peak, total_steps)

    def adamw(peak):
        return optax.adamw(learning_rate=make_sched(peak), b1=0.9, b2=0.999,
                           eps=1e-8, weight_decay=1e-2)

    labels = group_label_tree(params, head)
    tx = optax.multi_transform(
        {"wte": adamw(embed_lr), "rest": adamw(lr), "head": adamw(head_lr)},
        labels)
    joint = {"model": params, "head": head}
    return tx, tx.init(joint)


# --------------------------------------------------------------------------
# Heads
# --------------------------------------------------------------------------

def init_linear_head(rng, in_dim: int, out_dim: int, dtype=jnp.float32):
    """torch nn.Linear default init (gue.py:60)."""
    bound = 1.0 / (in_dim ** 0.5)
    kw, kb = jax.random.split(rng)
    return {
        "w": jax.random.uniform(kw, (in_dim, out_dim), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (out_dim,), dtype, -bound, bound),
    }


def apply_linear_head(head: dict, x: jnp.ndarray) -> jnp.ndarray:
    return x @ head["w"].astype(x.dtype) + head["b"].astype(x.dtype)


# --------------------------------------------------------------------------
# Forward helpers
# --------------------------------------------------------------------------

def masked_forward_embeddings(params, cfg: OmniBioTAConfig, tokens, segments,
                              *, deterministic=True, rng=None):
    """Model forward with padding mask, returning (B, L, D) embeddings."""
    return forward(params, cfg, tokens, segment_ids=segments,
                   deterministic=deterministic, rng=rng,
                   return_embeddings=True)


def piece_lengths(sp, ids: Sequence[int]) -> List[int]:
    """Character length of each token's surface form — the label-alignment
    primitive (len(sp.decode([t])), proteinGLUE.py:218)."""
    return [len(sp.decode([int(t)])) for t in ids]
