"""Int8 quantized inference for the serving path (encode()).

Beyond the reference (which serves bf16 via torch SDPA): v5e/v5p MXUs run
int8 x int8 -> int32 at twice the bf16 rate, so the encoder's matmuls —
where encode()'s FLOPs live — can run at double peak if both operands are
int8. Scheme:

  * weights: symmetric per-output-channel int8 (scale = max|w_col| / 127),
    quantized once offline by quantize_for_inference();
  * activations: symmetric per-row dynamic int8 (scale = max|x_row| / 127),
    quantized on the fly in fp32 before each matmul;
  * accumulation in int32 (dot_general preferred_element_type), rescaled by
    the rank-1 outer product of the two scales.

The quantized tree keeps the EXACT structure of the fp32/bf16 parameter
pytree — QuantizedWeight is a pytree node that models/omnibiota._linear
dispatches on — so forward()/encode() run unchanged. The RoPE de-interleave
column permutation (models/omnibiota.py:_block) is pre-folded into the
quantized wqkv at conversion time (cfg.qkv_prepermuted=True skips the
per-forward gather; attention output is exactly invariant under the shared
q/k permutation, models/rope.py:deinterleave_perm).

Training stays bf16/fp32 — this is an inference-only artifact, like the
int8 patterns in the Pallas guide (§19) expressed at the XLA level where
the compiler already fuses quantize/rescale into the matmul epilogues.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class QuantizedWeight(NamedTuple):
    """Per-output-channel symmetric int8 weight: w ~ values * scale."""
    values: jnp.ndarray          # int8, (fan_in, fan_out)
    scale: jnp.ndarray           # fp32, (fan_out,)


def quantize_weight(w: jnp.ndarray) -> QuantizedWeight:
    wf = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=0) / 127.0
    scale = jnp.where(scale == 0.0, 1.0, scale)
    q = jnp.clip(jnp.round(wf / scale[None, :]), -127, 127).astype(jnp.int8)
    return QuantizedWeight(q, scale)


def quant_linear(x: jnp.ndarray, w: QuantizedWeight, b=None) -> jnp.ndarray:
    """y = x @ dequant(w) computed as int8 x int8 -> int32 with dynamic
    per-row activation scales. x: (..., fan_in); returns x.dtype."""
    shape = x.shape
    xf = x.reshape(-1, shape[-1]).astype(jnp.float32)
    s_x = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    s_x = jnp.where(s_x == 0.0, 1.0, s_x)
    x_q = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        x_q, w.values, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (s_x * w.scale[None, :])
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.reshape(*shape[:-1], w.values.shape[-1]).astype(x.dtype)


def quantize_for_inference(params: dict, cfg) -> dict:
    """Quantize every >=2D projection weight; pre-fold the RoPE
    de-interleave into wqkv's q/k column blocks. Embedding stays bf16 (a
    gather, not a matmul); norms/biases stay as they are. Use with
    cfg.replace(qkv_prepermuted=True)."""
    from ..models.rope import qkv_col_perm

    D = cfg.n_embd
    col_perm = qkv_col_perm(cfg.n_head, cfg.head_dim)

    def permute_qkv(w):
        # stacked blocks carry a leading layer dim
        wq = jnp.take(w[..., :, :D], col_perm, axis=-1)
        wk = jnp.take(w[..., :, D:2 * D], col_perm, axis=-1)
        return jnp.concatenate([wq, wk, w[..., :, 2 * D:]], axis=-1)

    def permute_bqkv(b):
        bq = jnp.take(b[..., :D], col_perm, axis=-1)
        bk = jnp.take(b[..., D:2 * D], col_perm, axis=-1)
        return jnp.concatenate([bq, bk, b[..., 2 * D:]], axis=-1)

    def walk(path, leaf):
        names = [str(p.key) for p in path if hasattr(p, "key")]
        name = names[-1] if names else ""
        if name == "wqkv":
            leaf = permute_qkv(leaf)
        if name == "bqkv":
            return permute_bqkv(leaf)
        if name in ("wqkv", "wo", "wi", "lm_head"):
            if leaf.ndim == 3:        # stacked layers: quantize per layer
                qs = [quantize_weight(leaf[i]) for i in range(leaf.shape[0])]
                return QuantizedWeight(
                    jnp.stack([q.values for q in qs]),
                    jnp.stack([q.scale for q in qs]))
            return quantize_weight(leaf)
        return leaf

    return jax.tree_util.tree_map_with_path(walk, params)
