"""Segment-id utilities for packed-sequence attention masking.

The reference materialises an O(B*T*T) additive mask per micro-batch on
device (create_attention_mask, /root/reference/training/train_encoder.py:31-57,
duplicated in evals/proteinGLUE.py:321-353 and evals/TAPE/TAPE.py:386-418).
The TPU-native design instead derives O(B*T) integer segment ids from EOS
positions; the block-diagonal mask is reconstructed inside the attention
kernel (or as a broadcast comparison on the XLA path), never materialised in
HBM.

Semantics reproduced exactly for non-PAD positions:
  * a position's segment is the number of EOS tokens strictly before it, so
    each EOS terminates its own segment (block_attn zeroes [start, eos+1),
    train_encoder.py:25-29,46);
  * with padding disabled the reference appends a virtual trailing EOS
    (train_encoder.py:33-37) -- under cumulative counting the tail after the
    last real EOS already forms its own final segment, so no special case is
    needed;
  * a row with no EOS at all is fully visible to itself
    (train_encoder.py:53-55) -- all its positions get segment 0.

PAD positions (only present with --use_padding) fall in the trailing segment
and attend only among themselves; real tokens never see them. (In the
reference, additive -1e9 rows degenerate to *unmasked* softmax for PAD
queries -- a constant shift -- so PAD query outputs are garbage there too;
they are excluded from every loss.)
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import EOS_TOKEN

NEG_INF = -1e9  # reference mask value (train_encoder.py:40)


def segment_ids_np(input_ids: np.ndarray, eos_token: int = EOS_TOKEN) -> np.ndarray:
    """Host-side segment ids: exclusive running count of EOS tokens. (B, T) int32."""
    is_eos = (input_ids == eos_token)
    incl = np.cumsum(is_eos, axis=-1)
    return (incl - is_eos).astype(np.int32)


def segment_ids_jnp(input_ids: jnp.ndarray, eos_token: int = EOS_TOKEN) -> jnp.ndarray:
    """Device-side segment ids (same semantics as segment_ids_np)."""
    is_eos = (input_ids == eos_token).astype(jnp.int32)
    incl = jnp.cumsum(is_eos, axis=-1)
    return incl - is_eos


def segment_mask(q_seg: jnp.ndarray, kv_seg: jnp.ndarray) -> jnp.ndarray:
    """Boolean (B, T, T) visibility mask: True where attention is allowed."""
    return q_seg[:, :, None] == kv_seg[:, None, :]


def additive_mask(seg: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """(B, 1, T, T) additive mask with 0 where visible, -1e9 elsewhere.

    Equivalent to the reference's create_attention_mask output expanded over
    heads (train_encoder.py:290-292), for use by the XLA attention oracle.
    """
    vis = segment_mask(seg, seg)
    return jnp.where(vis, 0.0, NEG_INF).astype(dtype)[:, None, :, :]


def padding_segment_ids_jnp(input_ids: jnp.ndarray,
                            pad_token: int) -> jnp.ndarray:
    """In-jit twin of padding_segment_ids_np: real tokens segment 0, the
    tail from the first PAD onward a distinct negative id (invisible)."""
    is_pad = jnp.cumsum(input_ids == pad_token, axis=-1) > 0
    return jnp.where(is_pad, -1, 0).astype(jnp.int32)


def padding_segment_ids_np(input_ids: np.ndarray, pad_token: int) -> np.ndarray:
    """Eval-side mask semantics (pad_attn, reference evals/gue.py:15-21):
    everything from the first PAD onward is invisible. Encoded as segment 0
    for real tokens and a distinct negative id for the padded tail, matching
    rows/cols of -1e9 after the first PAD."""
    is_pad = np.cumsum(input_ids == pad_token, axis=-1) > 0
    return np.where(is_pad, -1, 0).astype(np.int32)
