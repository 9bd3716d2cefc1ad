"""Int8 flash attention for the serving path (encode()).

Completes the int8 serving story (ops/quant.py quantizes the projections;
round-2 left attention in bf16): q/k quantize per (token, head) symmetric
int8, scores accumulate on the double-rate int8 MXU into int32 and rescale
by the rank-1 outer product of the row scales before the (fp32, log2-space)
softmax; the probabilities — in [0,1] by construction — quantize with the
fixed scale 127 and P·V runs int8×int8 (v per-channel int8). The softmax
normaliser uses the exact fp32 probabilities, so quantization error enters
only through the two matmuls.

Serving-only by design: no dropout, no backward, one kv block spanning the
sequence (the encode() shapes; ctx 1024 ⇒ k/v tiles of T×H·D int8 ≈ 1 MB
in VMEM). Replaces the bf16 kernel in encode() when
OmniBioTAConfig.attn_int8 is set (api.Encoder(quantize=True)).

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
                              _interpret_ctx)


def _int8_fwd_kernel(q_ref, k_ref, v_ref, sq_ref, sk_ref, sv_ref,
                     qseg_ref, kseg_ref, o_ref, *, scale, n_head):
    D = q_ref.shape[-1] // n_head
    mask_bias = jnp.where(qseg_ref[0] == kseg_ref[0], 0.0,
                          DEFAULT_MASK_VALUE)        # (block_q, Tk)
    q8 = q_ref[0]                                    # (block_q, H*D) int8
    k8 = k_ref[0]                                    # (Tk, H*D) int8
    v8 = v_ref[0]
    sq = sq_ref[0]                                   # (block_q, H) fp32
    sk = sk_ref[0]                                   # (Tk, H) fp32
    sv = sv_ref[...]                                 # (1, H*D) fp32

    for h in range(n_head):
        sl = slice(h * D, (h + 1) * D)
        s_i = jax.lax.dot_general(
            q8[:, sl], k8[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)        # (block_q, Tk)
        # dequant: rank-1 outer product of the per-(token, head) scales,
        # folded with the µP scale and log2e into one fp32 multiplier
        s2 = (s_i.astype(jnp.float32)
              * (sq[:, h:h + 1] * (scale * LOG2E))
              * sk[:, h].reshape(1, -1)) + mask_bias
        m2 = jnp.max(s2, axis=1, keepdims=True)
        p = jnp.exp2(s2 - m2)                        # in [0, 1], max == 1
        l = jnp.sum(p, axis=1, keepdims=True)        # exact fp32 normaliser
        p8 = jnp.round(p * 127.0).astype(jnp.int8)   # fixed scale: pmax==1
        pv = jax.lax.dot(p8, v8[:, sl],
                         preferred_element_type=jnp.int32)
        out = (pv.astype(jnp.float32)
               * (sv[0, sl][None, :] * (1.0 / 127.0)) / l)
        o_ref[0, :, sl] = out.astype(o_ref.dtype)


def _rowhead_quant(x):
    """Symmetric per-(token, head) int8: x (B, T, H, D) ->
    (x8 (B, T, H*D) int8, scales (B, T, H) fp32)."""
    B, T, H, D = x.shape
    xf = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(xf), axis=-1) / 127.0        # (B, T, H)
    s = jnp.where(s == 0.0, 1.0, s)
    x8 = jnp.clip(jnp.round(xf / s[..., None]), -127, 127).astype(jnp.int8)
    return x8.reshape(B, T, H * D), s


def int8_flash_attention(
    q: jnp.ndarray,                  # (B, T, H, D) fp32/bf16, POST-RoPE
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float,
    segment_ids: Optional[jnp.ndarray] = None,
    block_q: int = 512,
) -> jnp.ndarray:
    """Serving-only int8 attention; see module docstring. Requires
    T % 128 == 0 and D % 128 == 0 (lane-aligned tiles); one kv block spans
    the sequence."""
    B, T, H, D = q.shape
    block_q = min(block_q, T)
    assert T % block_q == 0 and D % 128 == 0, (T, block_q, D)
    if segment_ids is None:
        segment_ids = jnp.zeros((B, T), jnp.int32)

    q8, sq = _rowhead_quant(q)
    k8, sk = _rowhead_quant(k)
    # v: per-channel symmetric int8 (channels are stable across tokens)
    vf = v.astype(jnp.float32).reshape(B, T, H * D)
    sv = jnp.max(jnp.abs(vf), axis=(0, 1)) / 127.0   # (H*D,)
    sv = jnp.where(sv == 0.0, 1.0, sv)
    v8 = jnp.clip(jnp.round(vf / sv[None, None, :]), -127,
                  127).astype(jnp.int8)
    sv2 = sv.reshape(1, H * D)

    qseg2 = segment_ids[:, :, None].astype(jnp.int32)
    kseg2 = segment_ids[:, None, :].astype(jnp.int32)

    kernel = functools.partial(_int8_fwd_kernel, scale=scale, n_head=H)
    grid = (B, T // block_q)
    with _interpret_ctx():
        o = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, H * D), lambda b, qi: (b, qi, 0)),
                pl.BlockSpec((1, T, H * D), lambda b, qi: (b, 0, 0)),
                pl.BlockSpec((1, T, H * D), lambda b, qi: (b, 0, 0)),
                pl.BlockSpec((1, block_q, H), lambda b, qi: (b, qi, 0)),
                pl.BlockSpec((1, T, H), lambda b, qi: (b, 0, 0)),
                pl.BlockSpec((1, H * D), lambda b, qi: (0, 0)),
                pl.BlockSpec((1, block_q, 1), lambda b, qi: (b, qi, 0)),
                pl.BlockSpec((1, 1, T), lambda b, qi: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, H * D),
                                   lambda b, qi: (b, qi, 0)),
            out_shape=jax.ShapeDtypeStruct((B, T, H * D), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=VMEM_LIMIT),
        )(q8, k8, v8, sq, sk, sv2, qseg2, kseg2)
    return o.reshape(B, T, H, D)
