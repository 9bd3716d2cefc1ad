"""Attention dispatch: Pallas flash kernel (TPU) or XLA reference path.

The XLA path reproduces torch.nn.functional.scaled_dot_product_attention with
an additive segment mask and µP 1/d scale (reference
/root/reference/training/model.py:115-145): scores are accumulated in fp32,
softmax in fp32, with the additive -1e9 convention of create_attention_mask.
It serves as the correctness oracle for the Pallas kernel and as the CPU-test
backend.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .segments import NEG_INF


def xla_attention(
    q: jnp.ndarray,           # (B, T, H, Dh)
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float,
    segment_ids: Optional[jnp.ndarray] = None,  # (B, T) int32; None = dense
    causal: bool = False,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Bidirectional (or causal) SDPA with additive segment masking.

    Matches the reference semantics:
      * scale = 8/n_embd applied to q @ k^T (model.py:119)
      * additive -1e9 mask for cross-segment pairs (train_encoder.py:40)
      * softmax over keys in fp32
      * attention-probability dropout only when training (model.py:121)
    """
    B, T, H, Dh = q.shape
    scores = jnp.einsum(
        "bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32)
    scores = scores * jnp.float32(scale)

    if segment_ids is not None:
        vis = segment_ids[:, :, None] == segment_ids[:, None, :]  # (B, T, S)
        scores = scores + jnp.where(vis, 0.0, NEG_INF)[:, None, :, :]
    if causal:
        idx = jnp.arange(T)
        cmask = idx[:, None] >= idx[None, :]
        scores = jnp.where(cmask[None, None], scores, -jnp.inf)

    probs = jax.nn.softmax(scores, axis=-1)

    if dropout_rate > 0.0:
        if dropout_rng is None:
            raise ValueError("dropout_rate > 0 requires dropout_rng")
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)

    probs = probs.astype(v.dtype)
    out = jnp.einsum("bhts,bshd->bthd", probs, v)
    return out


def _fit_block(T: int, want: int) -> int:
    """Largest multiple of 128 that divides T and is <= want.

    The flash kernel requires T % block == 0 and Mosaic wants lane-multiple
    blocks; for any T % 128 == 0 this terminates at >= 128. Fixes the
    dispatch crash at T in {640, 768, 896, ...}: eval batches bucket to
    multiples of 128 (evals/common.py), which are not all multiples of the
    default 512/1024 block sizes.
    """
    b = max((min(want, T) // 128) * 128, 128)  # clamp: want < 128 would
    while T % b:                               # otherwise divide by zero
        b -= 128
    return b


def attention(
    q, k, v, *,
    scale: float,
    segment_ids=None,
    causal: bool = False,
    dropout_rate: float = 0.0,
    dropout_rng=None,
    impl: str = "flash",
    block_q: int = 512,
    block_kv: Optional[int] = None,
    rope=None,
    ring_mesh=None,
    ring_axis: str = "data",
    ring_batch_axis=None,
    tp_mesh=None,
    tp_axis: str = "model",
    int8: bool = False,
):
    """Dispatch to the Pallas flash kernel, the ring (sequence-parallel)
    path, or the XLA oracle.

    The flash kernel requires T to be a multiple of its block size and is
    only profitable on TPU; anything else falls back to XLA. impl='ring'
    shards the sequence over `ring_axis` of `ring_mesh` and rotates KV
    blocks around the ICI ring (long-context; see ops/ring_attention.py).

    rope=(cos, sin) tables (T, head_dim/2): callers pass q/k PRE-rotation
    and the dispatch owns RoPE — fused into the flash kernels (the rotation
    is recomputed in fwd and bwd, never touching HBM) or applied here for
    the fallback paths.
    """
    T = q.shape[1]
    H, D = q.shape[2], q.shape[3]
    if block_kv is None:
        # Measured policy (v5e, omnibiote-small shapes): T <= 1024 takes one
        # kv block spanning the sequence — the single-kv fused backward (5
        # dots/tile) wins there (2.75 vs 3.17 ms at T=1024/B=16). Longer T
        # takes 512-wide kv blocks: the multi-kv fused backward keeps the 5
        # dots AND segment-skip pruning, -21% f+b at T=2048, -22% at 4096
        # vs the old 512x1024 split-pass default.
        block_kv = T if T <= 1024 else 512
    # Mosaic tiles the last two dims of each block: head_dim must be a lane
    # multiple (or the whole feature dim when H == 1) for the flash path
    flash_ok = (T % 128 == 0) and (D % 128 == 0 or H == 1)
    take_flash = impl == "flash" and not causal and flash_ok
    if (int8 and impl == "flash" and not causal and dropout_rate == 0.0
            and T % 128 == 0 and D % 128 == 0
            and tp_mesh is None and ring_mesh is None):
        # int8 composes with single-device serving only: under tp/sp the
        # head-sharded / ring paths below own the mesh layout, and routing
        # globally-shaped arrays into the int8 kernel would silently
        # replicate compute (r3 ADVICE)
        # serving-only int8 kernel (ops/int8_attention.py): RoPE and the
        # int8 quantization both happen in-kernel on VMEM-resident tiles.
        # Guard the import like the bf16 flash branch: on hosts without
        # the Pallas TPU backend fall through to the XLA path instead of
        # crashing at dispatch (r4 review)
        try:
            from .int8_attention import int8_flash_attention
        except ImportError:
            int8_flash_attention = None
        if int8_flash_attention is not None:
            return int8_flash_attention(q, k, v, scale=scale,
                                        segment_ids=segment_ids,
                                        block_q=_fit_block(T, block_q),
                                        rope=rope)
    if rope is not None and not take_flash:
        from ..models.rope import apply_rope_half
        q, k = apply_rope_half(q, k, rope[0], rope[1])
        rope = None
    if tp_mesh is not None and take_flash:
        # tensor-parallel: run the kernel on each device's head shard
        from .flash_attention import flash_attention_tp
        return flash_attention_tp(
            q, k, v, segment_ids=segment_ids, scale=scale, mesh=tp_mesh,
            model_axis=tp_axis, dropout_rate=dropout_rate,
            dropout_rng=dropout_rng, rope=rope,
            block_q=_fit_block(T, block_q), block_kv=_fit_block(T, block_kv))
    if impl == "ring":
        from .ring_attention import ring_attention
        assert ring_mesh is not None, "impl='ring' requires ring_mesh"
        assert not causal, (
            "ring attention has no causal support — running it would be "
            "silently bidirectional; use impl='xla' for autoregressive "
            "configs (r4 review)")
        return ring_attention(q, k, v, segment_ids, scale=scale,
                              mesh=ring_mesh, seq_axis=ring_axis,
                              batch_axis=ring_batch_axis,
                              dropout_rate=dropout_rate,
                              dropout_rng=dropout_rng)
    if take_flash:
        try:
            from .flash_attention import flash_attention
        except ImportError:
            flash_attention = None
        if flash_attention is not None:
            if segment_ids is not None and T >= 4096:
                # long packed sequences: smaller kv blocks expose more
                # fully-masked tiles to the segment-skip pruning (measured
                # faster than 1024-blocks from T=4096 up)
                block_kv = min(block_kv, 512)
            # Decoupled forward: at 1024 < T <= 2048 a sequence-spanning
            # FORWARD kv block skips the online-softmax state (-13% fwd at
            # T=2048) while the backward keeps its narrower blocks; the
            # canonical-strip dropout draw keeps fwd/bwd masks identical.
            bkv_fwd = T if 1024 < T <= 2048 else None
            return flash_attention(
                q, k, v, segment_ids=segment_ids, scale=scale,
                dropout_rate=dropout_rate, dropout_rng=dropout_rng,
                rope=rope,
                block_q=_fit_block(T, block_q),
                block_kv=_fit_block(T, block_kv),
                block_kv_fwd=bkv_fwd)
        if rope is not None:
            from ..models.rope import apply_rope_half
            q, k = apply_rope_half(q, k, rope[0], rope[1])
    return xla_attention(
        q, k, v, scale=scale, segment_ids=segment_ids, causal=causal,
        dropout_rate=dropout_rate, dropout_rng=dropout_rng)
