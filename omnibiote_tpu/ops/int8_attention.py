"""Int8 flash attention for the serving path (encode()).

Completes the int8 serving story (ops/quant.py quantizes the projections;
round-2 left attention in bf16). Everything happens IN-KERNEL on
VMEM-resident tiles — measured on chip, an XLA-level rope+quantize preamble
costs more than the int8 math saves (two extra HBM round trips over q/k):

  * RoPE rotates q/k per head in fp32 (same rotate-half as the bf16 kernel);
  * q/k quantize per (token, head) symmetric int8 right after rotation;
  * scores run int8×int8 → int32 on the double-rate MXU and rescale by the
    rank-1 outer product of the row scales before the log2-space softmax;
  * probabilities — in [0,1] by construction — quantize at the fixed scale
    127 and P·V runs int8×int8 with v per-(channel) int8 (scales computed
    over the resident kv block, i.e. per batch row — tighter than a global
    per-channel scale). The softmax normaliser stays exact fp32.

Serving-only by design: no dropout, no backward, one kv block spanning the
sequence (the encode() shapes; ctx 1024 ⇒ k/v tiles of T×H·D bf16 in VMEM).
Selected by OmniBioTAConfig.attn_int8 (api.Encoder(quantize=True)).

Reference anchor: the bf16 serving semantics this accelerates are
/root/reference/training/model.py:256-278 (encode -> forward, no mask).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_attention import (DEFAULT_MASK_VALUE, LOG2E, VMEM_LIMIT,
                              _interpret_ctx, _rope_rot)


def _quant_rows(xf):
    """Symmetric per-row int8 of a fp32 (rows, D) tile.

    Returns (x8 int8, inv-scale-free row scales (rows, 1) fp32)."""
    s = jnp.max(jnp.abs(xf), axis=1, keepdims=True) * (1.0 / 127.0)
    s = jnp.where(s == 0.0, 1.0, s)
    x8 = jnp.round(xf / s).astype(jnp.int8)
    return x8, s


def _int8_fwd_kernel(q_ref, k_ref, v_ref, qseg_ref, kseg_ref, *rest,
                     scale, n_head, use_rope):
    if use_rope:
        qcos_ref, qsin_ref, kcos_ref, ksin_ref = rest[:4]
        rest = rest[4:]
    else:
        qcos_ref = qsin_ref = kcos_ref = ksin_ref = None
    (o_ref,) = rest
    D = q_ref.shape[-1] // n_head
    half = D // 2
    mask_bias = jnp.where(qseg_ref[0] == kseg_ref[0], 0.0,
                          DEFAULT_MASK_VALUE)        # (block_q, Tk)
    qrows = q_ref[0]                                 # (block_q, H*D) bf16
    krows = k_ref[0]                                 # (Tk, H*D)
    vrows = v_ref[0]

    for h in range(n_head):
        sl = slice(h * D, (h + 1) * D)
        qh = qrows[:, sl].astype(jnp.float32)
        kh = krows[:, sl].astype(jnp.float32)
        if use_rope:
            qh = _rope_rot(qh, qcos_ref[...], qsin_ref[...], half)
            kh = _rope_rot(kh, kcos_ref[...], ksin_ref[...], half)
        q8, sq = _quant_rows(qh)                     # (bq, D), (bq, 1)
        k8, sk = _quant_rows(kh)                     # (Tk, D), (Tk, 1)
        s_i = jax.lax.dot_general(
            q8, k8, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)        # (bq, Tk)
        s2 = (s_i.astype(jnp.float32) * (sq * (scale * LOG2E))
              * sk.reshape(1, -1)) + mask_bias
        m2 = jnp.max(s2, axis=1, keepdims=True)
        p = jnp.exp2(s2 - m2)                        # in [0, 1], max == 1
        l = jnp.sum(p, axis=1, keepdims=True)        # exact fp32 normaliser
        p8 = jnp.round(p * 127.0).astype(jnp.int8)
        vh = vrows[:, sl].astype(jnp.float32)
        sv = jnp.max(jnp.abs(vh), axis=0, keepdims=True) * (1.0 / 127.0)
        sv = jnp.where(sv == 0.0, 1.0, sv)           # (1, D) per channel
        v8 = jnp.round(vh / sv).astype(jnp.int8)
        pv = jax.lax.dot(p8, v8, preferred_element_type=jnp.int32)
        out = pv.astype(jnp.float32) * (sv * (1.0 / 127.0)) / l
        o_ref[0, :, sl] = out.astype(o_ref.dtype)


def int8_flash_attention(
    q: jnp.ndarray,                  # (B, T, H, D); PRE-rotation when
    k: jnp.ndarray,                  # rope is given (the kernel owns RoPE)
    v: jnp.ndarray,
    *,
    scale: float,
    segment_ids: Optional[jnp.ndarray] = None,
    block_q: int = 512,
    rope: Optional[tuple] = None,    # (cos, sin) (T, D/2) rope_tables
) -> jnp.ndarray:
    """Serving-only int8 attention; see module docstring. Requires
    T % 128 == 0 and D % 128 == 0; one kv block spans the sequence."""
    B, T, H, D = q.shape
    block_q = min(block_q, T)
    assert T % block_q == 0 and D % 128 == 0, (T, block_q, D)
    if segment_ids is None:
        segment_ids = jnp.zeros((B, T), jnp.int32)
    qseg2 = segment_ids[:, :, None].astype(jnp.int32)
    kseg2 = segment_ids[:, None, :].astype(jnp.int32)

    use_rope = rope is not None
    in_specs = [
        pl.BlockSpec((1, block_q, H * D), lambda b, qi, *_: (b, qi, 0)),
        pl.BlockSpec((1, T, H * D), lambda b, qi, *_: (b, 0, 0)),
        pl.BlockSpec((1, T, H * D), lambda b, qi, *_: (b, 0, 0)),
        pl.BlockSpec((1, block_q, 1), lambda b, qi, *_: (b, qi, 0)),
        pl.BlockSpec((1, 1, T), lambda b, qi, *_: (b, 0, 0)),
    ]
    args = [q.reshape(B, T, H * D), k.reshape(B, T, H * D),
            v.reshape(B, T, H * D), qseg2, kseg2]
    if use_rope:
        cos, sin = rope
        cos2 = jnp.concatenate([cos[:T], cos[:T]], 1).astype(jnp.float32)
        sin2 = jnp.concatenate([sin[:T], sin[:T]], 1).astype(jnp.float32)
        in_specs += [
            pl.BlockSpec((block_q, D), lambda b, qi, *_: (qi, 0)),
            pl.BlockSpec((block_q, D), lambda b, qi, *_: (qi, 0)),
            pl.BlockSpec((T, D), lambda b, qi, *_: (0, 0)),
            pl.BlockSpec((T, D), lambda b, qi, *_: (0, 0)),
        ]
        args += [cos2, sin2, cos2, sin2]

    kernel = functools.partial(_int8_fwd_kernel, scale=scale, n_head=H,
                               use_rope=use_rope)
    with _interpret_ctx():
        o = pl.pallas_call(
            kernel,
            grid=(B, T // block_q),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, block_q, H * D),
                                   lambda b, qi, *_: (b, qi, 0)),
            out_shape=jax.ShapeDtypeStruct((B, T, H * D), q.dtype),
            compiler_params=pltpu.CompilerParams(
                # q axis is parallel: each grid step writes a disjoint o
                # block with no cross-step scratch — 'arbitrary' would
                # serialize T//block_q steps on one core when B is small
                # after data sharding (r4 review)
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=VMEM_LIMIT),
        )(*args)
    return o.reshape(B, T, H, D)
