"""Rotary position embeddings (real-valued formulation).

Numerically equivalent to the reference's complex-number LLaMA-style RoPE
(/root/reference/training/model.py:39-61): adjacent feature pairs
(x[..., 2j], x[..., 2j+1]) are rotated by angle t * theta^(-2j/d), computed in
float32 and cast back to the input dtype, exactly as the reference does
(`xq.float()` ... `.type_as(xq)`).
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def _rope_tables_cached(head_dim: int, end: int, theta: float):
    # Computed with numpy so the cached values are trace-safe constants
    # (jnp arrays created under jit would leak tracers via the cache).
    freqs = 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float32) / head_dim))
    t = np.arange(end, dtype=np.float32)
    angles = np.outer(t, freqs).astype(np.float32)  # (end, head_dim//2)
    return np.cos(angles), np.sin(angles)


def rope_tables(head_dim: int, end: int, theta: float = 10000.0):
    """cos/sin tables of shape (end, head_dim//2), float32.

    Mirrors precompute_freqs_cis (reference model.py:53-61): freqs_cis[t, j] =
    exp(i * t * theta^(-2j/d)); here split into real cos/sin parts.
    """
    cos, sin = _rope_tables_cached(int(head_dim), int(end), float(theta))
    return jnp.asarray(cos), jnp.asarray(sin)


def deinterleave_perm(head_dim: int):
    """Permutation mapping interleaved pair layout -> rotate-half layout.

    TPU lanes hate the strided even/odd access of the complex-pair RoPE; a
    shared permutation of q and k's head_dim leaves q @ k^T (and therefore
    the attention output) exactly invariant, so we de-interleave via the
    projection weights' columns (cheap, weight-sized) and rotate contiguous
    halves instead."""
    return np.concatenate([np.arange(0, head_dim, 2),
                           np.arange(1, head_dim, 2)])


def qkv_col_perm(n_head: int, head_dim: int):
    """deinterleave_perm broadcast over every head's column block of a
    fused (D, 3D) qkv projection — the single definition shared by the
    model's on-the-fly permutation (models/omnibiota.py) and the
    serving-time weight prepermutation (ops/quant.py), so the two layouts
    can never drift (r4 review)."""
    perm = deinterleave_perm(head_dim)
    return (np.arange(n_head)[:, None] * head_dim + perm[None, :]).reshape(-1)


def apply_rope_half(q: jnp.ndarray, k: jnp.ndarray, cos: jnp.ndarray,
                    sin: jnp.ndarray):
    """Rotate-half RoPE on (B, T, H, Dh) whose head_dim is already in
    de-interleaved [evens | odds] order. Numerically identical to apply_rope
    up to the shared permutation."""
    T = q.shape[1]
    half = q.shape[-1] // 2
    cos = cos[:T][None, :, None, :]
    sin = sin[:T][None, :, None, :]

    def rot(x):
        xf = x.astype(jnp.float32)
        x1, x2 = xf[..., :half], xf[..., half:]
        return jnp.concatenate(
            [x1 * cos - x2 * sin, x1 * sin + x2 * cos], -1).astype(x.dtype)

    return rot(q), rot(k)


def apply_rope(q: jnp.ndarray, k: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """Rotate q, k of shape (B, T, H, Dh) by per-position angles.

    Tables are truncated to the runtime sequence length (variable-length
    support, reference model.py:32-33). Computation in fp32, result cast back
    to the input dtype (reference model.py:44-50).
    """
    T = q.shape[1]
    cos = cos[:T][None, :, None, :]  # (1, T, 1, Dh/2)
    sin = sin[:T][None, :, None, :]

    def rot(x):
        xf = x.astype(jnp.float32)
        x_even = xf[..., 0::2]
        x_odd = xf[..., 1::2]
        out_even = x_even * cos - x_odd * sin
        out_odd = x_even * sin + x_odd * cos
        # Interleave back: (..., Dh/2, 2) -> (..., Dh)
        out = jnp.stack([out_even, out_odd], axis=-1).reshape(x.shape)
        return out.astype(x.dtype)

    return rot(q), rot(k)
