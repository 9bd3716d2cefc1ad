"""Pallas TPU flash attention: bidirectional, segment-id masked, µP-scaled,
with in-kernel attention-probability dropout and a custom VJP.

Replaces torch SDPA FlashAttention (/root/reference/training/model.py:118,134)
plus the reference's materialised (B,H,T,T) additive masks
(train_encoder.py:31-57): the block-diagonal packed-sequence mask is
reconstructed inside the kernel from O(T) segment ids.

Design (see /opt/skills/guides/pallas_guide.md and the flash-attention notes):
  * online softmax with fp32 running max / sum / accumulator in VMEM scratch
  * grid (B, H, Tq/block_q, Tkv/block_kv); the KV axis is the sequential
    ("arbitrary") reduction dimension, batch/head/q are parallel
  * mask value -0.7*f32max (not -inf) to avoid exp(-inf - -inf) NaNs
  * dropout via the TPU PRNG, seeded per (batch, head, q-block, kv-block) so
    forward and backward regenerate the identical keep-mask without storing it
  * backward = two kernels (dkv with q as the reduction axis, dq with kv),
    using the saved logsumexp residual; di = sum(o * do) precomputed

Numerics: softmax statistics in fp32; q/k/v may be bf16; output cast to the
input dtype. The (uncommon) fully-masked row yields UNIFORM attention
(every score sits at the same mask value, so p = 1 everywhere and the
output is the mean of V) — the same as the reference's PAD-row behaviour;
downstream must keep excluding such rows (ops/segments.py). The l == 0
zero-output guard in the kernels is defensive only: it cannot fire with
the finite mask value.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
# A/B switch for the fused single-kv backward (bench ablations); the fused
# kernel computes s/dp once (5 dots/tile) vs the split pair's 7.
FUSED_SINGLE_KV_BWD = True
# A/B switch for the fused MULTI-kv backward: one (b, q, kv) pass computes
# dq, dk AND dv (5 dots/tile vs the split pair's 7), holding full-length
# fp32 dk/dv accumulators in VMEM and flushing them once per batch row.
# Only eligible while those accumulators + bf16 out buffers fit VMEM:
# Tk * H*D * (4+4+2+2) bytes <= FUSED_MULTIKV_MAX_BYTES.
FUSED_MULTIKV_BWD = True
FUSED_MULTIKV_MAX_BYTES = 64 * 1024 * 1024
# Mosaic's default scoped-vmem cap is 16 MB; the multi-head kernels use
# (block, H*D) tiles and profit from larger blocks, so raise it (v5e/v5p
# have 128 MB of VMEM per core).
VMEM_LIMIT = 100 * 1024 * 1024


import contextlib


def _interpret_ctx():
    # On the CPU backend, run kernels under the TPU interpreter (tests,
    # oracles). Note the interpreter's PRNG ignores prng_seed, so dropout
    # draws a fixed stream on CPU — identical in fwd/bwd, seed-dependent
    # only on real TPUs.
    if jax.default_backend() == "cpu":
        return pltpu.force_tpu_interpret_mode()
    return contextlib.nullcontext()


def _dropout_keep(shape, rate: float, seed_base, unique):
    """Deterministic keep-mask from the in-kernel PRNG.

    seed_base: scalar int32 (per-call seed); unique: scalar int32 that is
    distinct per (b, h, q_blk, kv_blk) so every tile draws independent bits,
    and identical between forward and backward.
    """
    pltpu.prng_seed(seed_base + unique)
    bits = pltpu.prng_random_bits(shape)  # uint32
    # keep iff bits/2^32 >= rate  <=>  bits >= rate * 2^32
    thresh = jnp.uint32(min(int(rate * (2.0 ** 32)), 2 ** 32 - 1))
    return pltpu.bitcast(bits, jnp.uint32) >= thresh


def _dropout_keep_w(shape, rate, seed_base, base_unique, w0, n_w_tot,
                    drop_w):
    """Keep-mask drawn in canonical drop_w-wide column strips.

    base_unique enumerates (b, h, q-block); strip j of this tile draws
    with unique = base_unique * n_w_tot + (w0 + j), where w0 is the tile's
    first strip in the GLOBAL kv numbering and n_w_tot the global strip
    count. When drop_w equals the tile width (and so n_w_tot the kv grid
    size, w0 the kv block index) this is exactly the historical per-tile
    draw — strips only change the stream when a caller decouples the
    forward and backward kv block sizes, and then they make both sides
    draw identical masks regardless of their own tile widths."""
    width = shape[1]
    n = width // drop_w
    if n <= 1:
        return _dropout_keep(shape, rate, seed_base,
                             base_unique * n_w_tot + w0)
    parts = [
        _dropout_keep((shape[0], drop_w), rate, seed_base,
                      base_unique * n_w_tot + w0 + j)
        for j in range(n)
    ]
    return jnp.concatenate(parts, axis=1)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, qseg_ref, kseg_ref,
                o_ref, lse_ref,
                m_scr, l_scr, acc_scr,
                *, scale, dropout_rate):
    kv_idx = pl.program_id(3)
    n_kv = pl.num_programs(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                       # (block_q, d)
    k = k_ref[0]                       # (block_kv, d)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (block_q, block_kv)
    s = s * scale

    qseg = qseg_ref[0]                 # (block_q, 1) int32
    kseg = kseg_ref[0]                 # (1, block_kv)
    mask = qseg == kseg
    s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

    m_prev = m_scr[...]                # (block_q, 1) fp32
    l_prev = l_scr[...]
    m_curr = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next)            # (block_q, block_kv)
    l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
    m_scr[...] = m_next
    l_scr[...] = l_next

    if dropout_rate > 0.0:
        b, h, qi = pl.program_id(0), pl.program_id(1), pl.program_id(2)
        nh, nq = pl.num_programs(1), pl.num_programs(2)
        unique = ((b * nh + h) * nq + qi) * n_kv + kv_idx
        keep = _dropout_keep(p.shape, dropout_rate, seed_ref[0], unique)
        p = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)

    v = v_ref[0]                       # (block_kv, d)
    acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32)

    @pl.when(kv_idx == n_kv - 1)
    def _store():
        l_fin = l_scr[...]
        l_inv = jnp.where(l_fin == 0.0, 0.0, 1.0 / l_fin)
        o_ref[0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)
        # logsumexp residual for the backward pass
        m_fin = m_scr[...]
        lse = m_fin + jnp.log(jnp.where(l_fin == 0.0, 1.0, l_fin))
        lse_ref[0, 0] = lse.astype(jnp.float32)


def _fwd(q, k, v, q_seg, kv_seg, seed, *, scale, block_q, block_kv,
         dropout_rate):
    """q,k,v: (B, T, H, D) — the model's native layout, viewed as
    (B, T, H*D) so each grid cell blocks one head's contiguous feature
    slice (no transposes bracket the kernel). Returns (o (B,T,H,D),
    lse (B,H,T,1))."""
    B, Tq, H, D = q.shape
    Tk = k.shape[1]
    grid = (B, H, Tq // block_q, Tk // block_kv)
    q = q.reshape(B, Tq, H * D)
    k = k.reshape(B, Tk, H * D)
    v = v.reshape(B, Tk, H * D)

    qseg2 = q_seg[:, :, None].astype(jnp.int32)     # (B, Tq, 1)
    kseg2 = kv_seg[:, None, :].astype(jnp.int32)    # (B, 1, Tk)
    seed_arr = jnp.asarray([seed], jnp.int32) if jnp.ndim(seed) == 0 \
        else seed.astype(jnp.int32).reshape(1)

    kernel = functools.partial(
        _fwd_kernel, scale=scale, dropout_rate=dropout_rate)

    out_shape = [
        jax.ShapeDtypeStruct((B, Tq, H * D), q.dtype),
        jax.ShapeDtypeStruct((B, H, Tq, 1), jnp.float32),
    ]
    with _interpret_ctx():
        o, lse = _fwd_call(kernel, grid, B, H, Tq, Tk, D, block_q, block_kv,
                           out_shape, seed_arr, q, k, v, qseg2, kseg2)
    return o.reshape(B, Tq, H, D), lse


def _fwd_call(kernel, grid, B, H, Tq, Tk, D, block_q, block_kv, out_shape,
              seed_arr, q, k, v, qseg2, kseg2):
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, D),
                             lambda b, h, qi, ki, *_: (b, qi, h)),
                pl.BlockSpec((1, block_kv, D),
                             lambda b, h, qi, ki, *_: (b, ki, h)),
                pl.BlockSpec((1, block_kv, D),
                             lambda b, h, qi, ki, *_: (b, ki, h)),
                pl.BlockSpec((1, block_q, 1),
                             lambda b, h, qi, ki, *_: (b, qi, 0)),
                pl.BlockSpec((1, 1, block_kv),
                             lambda b, h, qi, ki, *_: (b, 0, ki)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, D),
                             lambda b, h, qi, ki, *_: (b, qi, h)),
                pl.BlockSpec((1, 1, block_q, 1),
                             lambda b, h, qi, ki, *_: (b, h, qi, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, D), jnp.float32),
            ],
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
    )(seed_arr, q, k, v, qseg2, kseg2)


# ---------------------------------------------------------------------------
# Backward: dK, dV  (grid over kv blocks; q is the reduction axis)
# ---------------------------------------------------------------------------

def _bwd_dkv_kernel(seed_ref, q_ref, k_ref, v_ref, qseg_ref, kseg_ref, lse_ref,
                    do_ref, di_ref,
                    dk_ref, dv_ref,
                    dk_scr, dv_scr,
                    *, scale, dropout_rate):
    q_idx = pl.program_id(3)
    n_q = pl.num_programs(3)

    @pl.when(q_idx == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q = q_ref[0]                       # (block_q, d)
    k = k_ref[0]                       # (block_kv, d)
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)           # (block_q, block_kv)
    s = s * scale
    mask = qseg_ref[0] == kseg_ref[0]
    s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

    lse = lse_ref[0, 0]                # (block_q, 1)
    p = jnp.exp(s - lse)               # softmax probs (pre-dropout)

    do = do_ref[0]                     # (block_q, d), input dtype
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)           # (block_q, block_kv)

    if dropout_rate > 0.0:
        b, h, kv_i = pl.program_id(0), pl.program_id(1), pl.program_id(2)
        nh, nq = pl.num_programs(1), n_q
        n_kv = pl.num_programs(2)
        unique = ((b * nh + h) * nq + q_idx) * n_kv + kv_i
        keep = _dropout_keep(p.shape, dropout_rate, seed_ref[0], unique)
        inv = 1.0 / (1.0 - dropout_rate)
        p_drop = jnp.where(keep, p * inv, 0.0)   # dropout(P), for dV
        dp = jnp.where(keep, dp * inv, 0.0)      # mask folds into dP
    else:
        p_drop = p

    # dV += dropout(P)^T @ dO  (bf16 operands, fp32 accumulation)
    dv_scr[...] += jax.lax.dot_general(
        p_drop.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # dS = P * (mask(dP) - di); di = rowsum(o * do)
    di = di_ref[0, 0]                  # (block_q, 1)
    ds = p * (dp - di) * scale
    # dK += dS^T @ Q
    dk_scr[...] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(q_idx == n_q - 1)
    def _store():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _bwd_dq_kernel(seed_ref, q_ref, k_ref, v_ref, qseg_ref, kseg_ref, lse_ref,
                   do_ref, di_ref,
                   dq_ref,
                   dq_scr,
                   *, scale, dropout_rate):
    kv_idx = pl.program_id(3)
    n_kv = pl.num_programs(3)

    @pl.when(kv_idx == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    s = s * scale
    mask = qseg_ref[0] == kseg_ref[0]
    s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
    p = jnp.exp(s - lse_ref[0, 0])

    do = do_ref[0]
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    if dropout_rate > 0.0:
        b, h, q_i = pl.program_id(0), pl.program_id(1), pl.program_id(2)
        nh, nq = pl.num_programs(1), pl.num_programs(2)
        unique = ((b * nh + h) * nq + q_i) * n_kv + kv_idx
        keep = _dropout_keep(dp.shape, dropout_rate, seed_ref[0], unique)
        dp = jnp.where(keep, dp / (1.0 - dropout_rate), 0.0)

    ds = p * (dp - di_ref[0, 0]) * scale            # (block_q, block_kv)
    dq_scr[...] += jax.lax.dot(
        ds.astype(k.dtype), k, preferred_element_type=jnp.float32)

    @pl.when(kv_idx == n_kv - 1)
    def _store():
        dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)


def _bwd(scale, block_q, block_kv, dropout_rate, res, g):
    q, k, v, q_seg, kv_seg, seed, o, lse = res
    do, _ = g
    B, Tq, H, D = q.shape
    Tk = k.shape[1]

    # (B, H, Tq, 1) to match lse's layout (both are lane-tiny side arrays)
    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32),
                 axis=-1).transpose(0, 2, 1)[..., None]
    q = q.reshape(B, Tq, H * D)
    k = k.reshape(B, Tk, H * D)
    v = v.reshape(B, Tk, H * D)
    do = do.reshape(B, Tq, H * D)

    qseg2 = q_seg[:, :, None].astype(jnp.int32)
    kseg2 = kv_seg[:, None, :].astype(jnp.int32)
    seed_arr = jnp.asarray([seed], jnp.int32) if jnp.ndim(seed) == 0 \
        else seed.astype(jnp.int32).reshape(1)

    # --- dK, dV: grid over kv blocks, reduce over q blocks ---
    dkv_kernel = functools.partial(
        _bwd_dkv_kernel, scale=scale, dropout_rate=dropout_rate)
    with _interpret_ctx():
        dk, dv = _dkv_call(dkv_kernel, B, H, Tq, Tk, D, block_q, block_kv,
                           k, v, seed_arr, q, qseg2, kseg2, lse, do, di)
        dq_kernel = functools.partial(
            _bwd_dq_kernel, scale=scale, dropout_rate=dropout_rate)
        dq = _dq_call(dq_kernel, B, H, Tq, Tk, D, block_q, block_kv,
                      seed_arr, q, k, v, qseg2, kseg2, lse, do, di)
    # back to the model's (B, T, H, D) view
    dq = dq.reshape(B, Tq, H, D)
    dk = dk.reshape(B, Tk, H, D)
    dv = dv.reshape(B, Tk, H, D)
    return dq, dk, dv, None, None, None


def _dkv_call(dkv_kernel, B, H, Tq, Tk, D, block_q, block_kv,
              k, v, seed_arr, q, qseg2, kseg2, lse, do, di):
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, H, Tk // block_kv, Tq // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, D),
                             lambda b, h, ki, qi, *_: (b, qi, h)),      # q
                pl.BlockSpec((1, block_kv, D),
                             lambda b, h, ki, qi, *_: (b, ki, h)),      # k
                pl.BlockSpec((1, block_kv, D),
                             lambda b, h, ki, qi, *_: (b, ki, h)),      # v
                pl.BlockSpec((1, block_q, 1),
                             lambda b, h, ki, qi, *_: (b, qi, 0)),      # qseg
                pl.BlockSpec((1, 1, block_kv),
                             lambda b, h, ki, qi, *_: (b, 0, ki)),      # kseg
                pl.BlockSpec((1, 1, block_q, 1),
                             lambda b, h, ki, qi, *_: (b, h, qi, 0)),   # lse
                pl.BlockSpec((1, block_q, D),
                             lambda b, h, ki, qi, *_: (b, qi, h)),      # do
                pl.BlockSpec((1, 1, block_q, 1),
                             lambda b, h, ki, qi, *_: (b, h, qi, 0)),   # di
            ],
            out_specs=[
                pl.BlockSpec((1, block_kv, D),
                             lambda b, h, ki, qi, *_: (b, ki, h)),
                pl.BlockSpec((1, block_kv, D),
                             lambda b, h, ki, qi, *_: (b, ki, h)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_kv, D), jnp.float32),
                pltpu.VMEM((block_kv, D), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),   # (B, Tk, H*D)
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
    )(seed_arr, q, k, v, qseg2, kseg2, lse, do, di)
    return dk, dv


def _dq_call(dq_kernel, B, H, Tq, Tk, D, block_q, block_kv,
             seed_arr, q, k, v, qseg2, kseg2, lse, do, di):
    # --- dQ: grid over q blocks, reduce over kv blocks ---
    dq = pl.pallas_call(
        dq_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, H, Tq // block_q, Tk // block_kv),
            in_specs=[
                pl.BlockSpec((1, block_q, D),
                             lambda b, h, qi, ki, *_: (b, qi, h)),
                pl.BlockSpec((1, block_kv, D),
                             lambda b, h, qi, ki, *_: (b, ki, h)),
                pl.BlockSpec((1, block_kv, D),
                             lambda b, h, qi, ki, *_: (b, ki, h)),
                pl.BlockSpec((1, block_q, 1),
                             lambda b, h, qi, ki, *_: (b, qi, 0)),
                pl.BlockSpec((1, 1, block_kv),
                             lambda b, h, qi, ki, *_: (b, 0, ki)),
                pl.BlockSpec((1, 1, block_q, 1),
                             lambda b, h, qi, ki, *_: (b, h, qi, 0)),
                pl.BlockSpec((1, block_q, D),
                             lambda b, h, qi, ki, *_: (b, qi, h)),
                pl.BlockSpec((1, 1, block_q, 1),
                             lambda b, h, qi, ki, *_: (b, h, qi, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, D),
                                   lambda b, h, qi, ki, *_: (b, qi, h)),
            scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
    )(seed_arr, q, k, v, qseg2, kseg2, lse, do, di)
    return dq


# ---------------------------------------------------------------------------
# Multi-head-block kernels
# ---------------------------------------------------------------------------
#
# The per-head grid above loads (block, D) tiles out of a (B, T, H*D) array:
# each DMA row touches D*2 bytes of every H*D*2 — for H=8, 1/8 of the
# fetched stride is useful, and the measured forward tops out at ~40% MFU.
# These kernels instead block over FULL rows (block, H*D) — perfectly
# contiguous DMA — and loop the heads inside the kernel over static feature
# slices. Softmax state is (block_q, H) in one scratch. RoPE (rotate-half
# over contiguous halves, fp32, matching models/rope.py:apply_rope_half) can
# be fused: the kernel consumes pre-rotation q/k — which is also what the
# custom VJP saves, so the rotation is never materialised in HBM.


def _rope_rot(x, cosf, sinf, half):
    """rotate-half in fp32: [x1, x2] -> [x1 c - x2 s, x1 s + x2 c], written
    as x * [c|c] + [-x2, x1] * [s|s] (cosf/sinf are full-width tables)."""
    xf = x.astype(jnp.float32)
    swapped = jnp.concatenate([-xf[:, half:], xf[:, :half]], axis=1)
    return xf * cosf + swapped * sinf


def _rope_rot_inv(x, cosf, sinf, half):
    """Inverse rotation (transpose): rotate by -angle."""
    xf = x.astype(jnp.float32)
    swapped = jnp.concatenate([xf[:, half:], -xf[:, :half]], axis=1)
    return xf * cosf + swapped * sinf


LOG2E = 1.4426950408889634


def _seg_block_bounds(a_seg, b_seg, block_a, block_b):
    """Per-(batch, a-block) index range of b-blocks that may be visible.

    A (a-block, b-block) tile is fully masked whenever the blocks' segment-id
    ranges are disjoint (qseg == kseg needs a shared id; packed rows carry
    consecutive ids, so range intersection is exact, and for any id layout
    disjoint ranges are a SAFE sufficient condition to skip). Returns
    (lo, hi) int32 (B, nA); an empty intersection falls back to (0, 0) — one
    masked tile, which the kernels already handle (p underflows to 0).
    O(T) reduces + O(nA·nB) compares per call, negligible vs the kernel.
    """
    B, Ta = a_seg.shape
    Tb = b_seg.shape[1]
    na, nb = Ta // block_a, Tb // block_b
    ar = a_seg.reshape(B, na, block_a).astype(jnp.int32)
    br = b_seg.reshape(B, nb, block_b).astype(jnp.int32)
    amin, amax = ar.min(-1), ar.max(-1)              # (B, na)
    bmin, bmax = br.min(-1), br.max(-1)              # (B, nb)
    inter = ((bmin[:, None, :] <= amax[:, :, None]) &
             (bmax[:, None, :] >= amin[:, :, None]))  # (B, na, nb)
    any_ = inter.any(-1)
    lo = jnp.where(any_, jnp.argmax(inter, -1), 0).astype(jnp.int32)
    hi = jnp.where(any_, nb - 1 - jnp.argmax(inter[:, :, ::-1], -1),
                   0).astype(jnp.int32)
    return lo, hi


def _mh_scores(qrows, krows, h, D, half, mask_bias, scale,
               qcos_ref, qsin_ref, kcos_ref, ksin_ref, use_rope):
    """One head's masked scores in log2 space: s2 = (q·kᵀ)·(scale·log2e) +
    bias, a single FMA per element (replaces the old mul + where). exp2 of
    log2-space scores equals exp of the natural-space ones, and exp2 is the
    VPU's native transcendental (exp lowers to exp2 + a multiply)."""
    sl = slice(h * D, (h + 1) * D)
    q = qrows[:, sl]
    k = krows[:, sl]
    dtype = qrows.dtype
    if use_rope:
        q = _rope_rot(q, qcos_ref[...], qsin_ref[...], half).astype(dtype)
        k = _rope_rot(k, kcos_ref[...], ksin_ref[...], half).astype(dtype)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)           # (block_q, block_kv)
    return s * (scale * LOG2E) + mask_bias


def _mh_fwd_kernel(seed_ref, *refs, scale, n_head, use_rope, dropout_rate,
                   single_kv, use_bounds, drop_w, n_w_tot):
    if use_bounds:
        lo_ref, hi_ref = refs[:2]
        refs = refs[2:]
    else:
        lo_ref = hi_ref = None
    q_ref, k_ref, v_ref, qseg_ref, kseg_ref = refs[:5]
    rest = refs[5:]
    if use_rope:
        qcos_ref, qsin_ref, kcos_ref, ksin_ref = rest[:4]
        rest = rest[4:]
    else:
        qcos_ref = qsin_ref = kcos_ref = ksin_ref = None
    if single_kv:
        o_ref, lse_ref = rest
        m_scr = l_scr = acc_scr = None
    else:
        o_ref, lse_ref, m_scr, l_scr, acc_scr = rest
    kv_idx = pl.program_id(2)
    n_kv = pl.num_programs(2)
    D = q_ref.shape[-1] // n_head
    half = D // 2

    if not single_kv:
        @pl.when(kv_idx == 0)
        def _init():
            m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

    if single_kv:
        # One kv block covers the whole sequence: no online-softmax state,
        # no accumulator scratch — each head normalises and stores directly.
        mask_bias = jnp.where(qseg_ref[0] == kseg_ref[0], 0.0,
                              DEFAULT_MASK_VALUE)    # (block_q, block_kv)
        qrows = q_ref[0]                             # (block_q, H*D)
        krows = k_ref[0]                             # (block_kv, H*D)
        vrows = v_ref[0]
        dtype = qrows.dtype
        lse_cols = []
        for h in range(n_head):
            sl = slice(h * D, (h + 1) * D)
            s2 = _mh_scores(qrows, krows, h, D, half, mask_bias, scale,
                            qcos_ref, qsin_ref, kcos_ref, ksin_ref, use_rope)
            m2 = jnp.max(s2, axis=1, keepdims=True)
            p = jnp.exp2(s2 - m2)
            l = jnp.sum(p, axis=1, keepdims=True)
            if dropout_rate > 0.0:
                b, qi = pl.program_id(0), pl.program_id(1)
                nq = pl.num_programs(1)
                base = (b * n_head + h) * nq + qi
                keep = _dropout_keep_w(p.shape, dropout_rate, seed_ref[0],
                                       base, 0, n_w_tot, drop_w)
                p = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
            pv = jax.lax.dot(p.astype(dtype), vrows[:, sl],
                             preferred_element_type=jnp.float32)
            o_ref[0, :, sl] = (pv * (1.0 / l)).astype(o_ref.dtype)
            lse_cols.append(m2 + jnp.log2(l))        # log2 space
        lse_ref[0] = jnp.concatenate(lse_cols, axis=1)
        return

    def _compute():
        # additive mask in log2 space, computed ONCE per tile (all heads)
        mask_bias = jnp.where(qseg_ref[0] == kseg_ref[0], 0.0,
                              DEFAULT_MASK_VALUE)    # (block_q, block_kv)
        qrows = q_ref[0]                             # (block_q, H*D)
        krows = k_ref[0]                             # (block_kv, H*D)
        vrows = v_ref[0]
        dtype = qrows.dtype
        for h in range(n_head):
            sl = slice(h * D, (h + 1) * D)
            s2 = _mh_scores(qrows, krows, h, D, half, mask_bias, scale,
                            qcos_ref, qsin_ref, kcos_ref, ksin_ref, use_rope)

            m_prev = m_scr[:, h:h + 1]
            l_prev = l_scr[:, h:h + 1]
            m_curr = jnp.max(s2, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp2(m_prev - m_next)
            p = jnp.exp2(s2 - m_next)
            l_scr[:, h:h + 1] = alpha * l_prev + jnp.sum(p, axis=1,
                                                         keepdims=True)
            m_scr[:, h:h + 1] = m_next

            if dropout_rate > 0.0:
                b, qi = pl.program_id(0), pl.program_id(1)
                nq = pl.num_programs(1)
                base = (b * n_head + h) * nq + qi
                w_per = p.shape[1] // drop_w
                keep = _dropout_keep_w(p.shape, dropout_rate, seed_ref[0],
                                       base, kv_idx * w_per, n_w_tot,
                                       drop_w)
                p = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)

            acc_scr[:, sl] = acc_scr[:, sl] * alpha + jax.lax.dot(
                p.astype(dtype), vrows[:, sl],
                preferred_element_type=jnp.float32)

    if use_bounds:
        # Segment-aware tile skipping: kv blocks outside [lo, hi] are fully
        # masked for this (batch, q-block) — their index maps alias the
        # clamped in-range block (no DMA) and the compute is skipped.
        b_i, q_i = pl.program_id(0), pl.program_id(1)
        pl.when((kv_idx >= lo_ref[b_i, q_i]) &
                (kv_idx <= hi_ref[b_i, q_i]))(_compute)
    else:
        _compute()

    @pl.when(kv_idx == n_kv - 1)
    def _store():
        l_fin = l_scr[...]                       # (block_q, H)
        l_inv = jnp.where(l_fin == 0.0, 0.0, 1.0 / l_fin)
        m_fin = m_scr[...]
        # lse residual in LOG2 space (the backward recomputes p as
        # exp2(s2 - lse2)). The l == 0 branch is DEFENSIVE hardening, not a
        # reachable state today: _seg_block_bounds falls back to
        # (lo, hi) = (0, 0) on an empty intersection, so every row computes
        # at least one (fully masked) tile and lands at l > 0 with m at
        # DEFAULT_MASK_VALUE (r3 ADVICE). Should a future bounds variant
        # genuinely skip ALL tiles, the FINITE sentinel keeps the backward
        # sane: far below any real lse (zero weight in any downstream
        # lse-combine) yet close enough to the -2.4e38 mask bias that
        # exp2(s2 - lse) underflows to exactly 0 — -inf here would turn that
        # into exp2(+inf) = NaN in the fallback tile.
        empty = jnp.float32(-1e38)
        lse_ref[0] = jnp.where(
            l_fin == 0.0, empty, m_fin + jnp.log2(
                jnp.where(l_fin == 0.0, 1.0, l_fin)))
        o = acc_scr[...].reshape(acc_scr.shape[0], n_head, D)
        o = o * l_inv[:, :, None]
        o_ref[0] = o.reshape(acc_scr.shape).astype(o_ref.dtype)


def _mh_fwd(q, k, v, q_seg, kv_seg, cos2, sin2, seed, *, scale, block_q,
            block_kv, dropout_rate, use_rope, use_skip=False, drop_w=None):
    """Returns (o (B,T,H,D), lse (B,Tq,H))."""
    B, Tq, H, D = q.shape
    Tk = k.shape[1]
    if drop_w is None:
        drop_w = block_kv
    grid = (B, Tq // block_q, Tk // block_kv)
    single_kv = Tk == block_kv
    use_bounds = bool(use_skip) and not single_kv
    if use_bounds:
        kv_lo, kv_hi = _seg_block_bounds(q_seg, kv_seg, block_q, block_kv)
    q = q.reshape(B, Tq, H * D)
    k = k.reshape(B, Tk, H * D)
    v = v.reshape(B, Tk, H * D)
    qseg2 = q_seg[:, :, None].astype(jnp.int32)
    kseg2 = kv_seg[:, None, :].astype(jnp.int32)
    seed_arr = jnp.asarray([seed], jnp.int32) if jnp.ndim(seed) == 0 \
        else seed.astype(jnp.int32).reshape(1)

    kernel = functools.partial(
        _mh_fwd_kernel, scale=scale, n_head=H, use_rope=use_rope,
        dropout_rate=dropout_rate, single_kv=single_kv,
        use_bounds=use_bounds, drop_w=drop_w, n_w_tot=Tk // drop_w)
    out_shape = [
        jax.ShapeDtypeStruct((B, Tq, H * D), q.dtype),
        jax.ShapeDtypeStruct((B, Tq, H), jnp.float32),
    ]
    if use_bounds:
        # kv-indexed operands clamp into [lo, hi]: out-of-range grid steps
        # alias an in-range block (same index -> Pallas skips the DMA)
        def kv_map(b, qi, ki, sd, lo, hi):
            c = jnp.clip(ki, lo[b, qi], hi[b, qi])
            return (b, c, 0)

        def kseg_map(b, qi, ki, sd, lo, hi):
            c = jnp.clip(ki, lo[b, qi], hi[b, qi])
            return (b, 0, c)

        def kcos_map(b, qi, ki, sd, lo, hi):
            c = jnp.clip(ki, lo[b, qi], hi[b, qi])
            return (c, 0)
    else:
        kv_map = lambda b, qi, ki, *_: (b, ki, 0)
        kseg_map = lambda b, qi, ki, *_: (b, 0, ki)
        kcos_map = lambda b, qi, ki, *_: (ki, 0)
    in_specs = [
        pl.BlockSpec((1, block_q, H * D),
                     lambda b, qi, ki, *_: (b, qi, 0)),
        pl.BlockSpec((1, block_kv, H * D), kv_map),
        pl.BlockSpec((1, block_kv, H * D), kv_map),
        pl.BlockSpec((1, block_q, 1),
                     lambda b, qi, ki, *_: (b, qi, 0)),
        pl.BlockSpec((1, 1, block_kv), kseg_map),
    ]
    args = [seed_arr]
    if use_bounds:
        args += [kv_lo, kv_hi]
    args += [q, k, v, qseg2, kseg2]
    if use_rope:
        in_specs += [
            pl.BlockSpec((block_q, D), lambda b, qi, ki, *_: (qi, 0)),
            pl.BlockSpec((block_q, D), lambda b, qi, ki, *_: (qi, 0)),
            pl.BlockSpec((block_kv, D), kcos_map),
            pl.BlockSpec((block_kv, D), kcos_map),
        ]
        args += [cos2, sin2, cos2, sin2]
    with _interpret_ctx():
        o, lse = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3 if use_bounds else 1,
                grid=grid,
                in_specs=in_specs,
                out_specs=[
                    pl.BlockSpec((1, block_q, H * D),
                                 lambda b, qi, ki, *_: (b, qi, 0)),
                    pl.BlockSpec((1, block_q, H),
                                 lambda b, qi, ki, *_: (b, qi, 0)),
                ],
                scratch_shapes=[] if single_kv else [
                    pltpu.VMEM((block_q, H), jnp.float32),
                    pltpu.VMEM((block_q, H), jnp.float32),
                    pltpu.VMEM((block_q, H * D), jnp.float32),
                ],
            ),
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=VMEM_LIMIT),
        )(*args)
    return o.reshape(B, Tq, H, D), lse


def _mh_bwd_dkv_kernel(seed_ref, *refs, scale, n_head, use_rope,
                       dropout_rate, use_bounds, drop_w, n_w_tot):
    if use_bounds:
        lo_ref, hi_ref = refs[:2]
        refs = refs[2:]
    else:
        lo_ref = hi_ref = None
    q_ref, k_ref, v_ref, qseg_ref, kseg_ref = refs[:5]
    rest = refs[5:]
    if use_rope:
        (qcos_ref, qsin_ref, kcos_ref, ksin_ref, lse_ref, do_ref, di_ref,
         dk_ref, dv_ref, dk_scr, dv_scr) = rest
    else:
        (lse_ref, do_ref, di_ref, dk_ref, dv_ref, dk_scr, dv_scr) = rest
        qcos_ref = qsin_ref = kcos_ref = ksin_ref = None
    q_idx = pl.program_id(2)
    n_q = pl.num_programs(2)
    D = q_ref.shape[-1] // n_head
    half = D // 2

    @pl.when(q_idx == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    def _compute():
        mask_bias = jnp.where(qseg_ref[0] == kseg_ref[0], 0.0,
                              DEFAULT_MASK_VALUE)    # (block_q, block_kv)
        qrows, krows, vrows, dorows = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
        dtype = qrows.dtype

        for h in range(n_head):
            sl = slice(h * D, (h + 1) * D)
            q = qrows[:, sl]
            k = krows[:, sl]
            if use_rope:
                q = _rope_rot(q, qcos_ref[...], qsin_ref[...],
                              half).astype(dtype)
                k = _rope_rot(k, kcos_ref[...], ksin_ref[...],
                              half).astype(dtype)
            s2 = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * (scale * LOG2E) \
                + mask_bias
            p = jnp.exp2(s2 - lse_ref[0][:, h:h + 1])   # lse is log2-space

            do = dorows[:, sl]
            dp = jax.lax.dot_general(
                do, vrows[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

            if dropout_rate > 0.0:
                b, kv_i = pl.program_id(0), pl.program_id(1)
                base = (b * n_head + h) * n_q + q_idx
                w_per = p.shape[1] // drop_w
                keep = _dropout_keep_w(p.shape, dropout_rate, seed_ref[0],
                                       base, kv_i * w_per, n_w_tot, drop_w)
                inv = 1.0 / (1.0 - dropout_rate)
                p_drop = jnp.where(keep, p * inv, 0.0)
                dp = jnp.where(keep, dp * inv, 0.0)
            else:
                p_drop = p

            dv_scr[:, sl] += jax.lax.dot_general(
                p_drop.astype(dtype), do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            di = di_ref[0][:, h:h + 1]
            ds = p * (dp - di) * scale
            dk_scr[:, sl] += jax.lax.dot_general(
                ds.astype(dtype), q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    if use_bounds:
        b_i, kv_i = pl.program_id(0), pl.program_id(1)
        pl.when((q_idx >= lo_ref[b_i, kv_i]) &
                (q_idx <= hi_ref[b_i, kv_i]))(_compute)
    else:
        _compute()

    @pl.when(q_idx == n_q - 1)
    def _store():
        if use_rope:
            dk_rows = dk_scr[...]
            for h in range(n_head):
                sl = slice(h * D, (h + 1) * D)
                dk_ref[0, :, sl] = _rope_rot_inv(
                    dk_rows[:, sl], kcos_ref[...], ksin_ref[...],
                    half).astype(dk_ref.dtype)
        else:
            dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _mh_bwd_dq_kernel(seed_ref, *refs, scale, n_head, use_rope, dropout_rate,
                      single_kv, use_bounds, drop_w, n_w_tot):
    if use_bounds:
        lo_ref, hi_ref = refs[:2]
        refs = refs[2:]
    else:
        lo_ref = hi_ref = None
    q_ref, k_ref, v_ref, qseg_ref, kseg_ref = refs[:5]
    rest = refs[5:]
    if use_rope:
        qcos_ref, qsin_ref, kcos_ref, ksin_ref = rest[:4]
        rest = rest[4:]
    else:
        qcos_ref = qsin_ref = kcos_ref = ksin_ref = None
    if single_kv:
        # one kv block covers the sequence: per-head dq writes straight to
        # the output — no accumulator scratch round-trips
        lse_ref, do_ref, di_ref, dq_ref = rest
        dq_scr = None
    else:
        lse_ref, do_ref, di_ref, dq_ref, dq_scr = rest
    kv_idx = pl.program_id(2)
    n_kv = pl.num_programs(2)
    D = q_ref.shape[-1] // n_head
    half = D // 2

    if not single_kv:
        @pl.when(kv_idx == 0)
        def _init():
            dq_scr[...] = jnp.zeros_like(dq_scr)

    def _compute():
        mask_bias = jnp.where(qseg_ref[0] == kseg_ref[0], 0.0,
                              DEFAULT_MASK_VALUE)
        qrows, krows, vrows, dorows = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
        dtype = qrows.dtype

        for h in range(n_head):
            sl = slice(h * D, (h + 1) * D)
            q = qrows[:, sl]
            k = krows[:, sl]
            if use_rope:
                q = _rope_rot(q, qcos_ref[...], qsin_ref[...],
                              half).astype(dtype)
                k = _rope_rot(k, kcos_ref[...], ksin_ref[...],
                              half).astype(dtype)
            s2 = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * (scale * LOG2E) \
                + mask_bias
            p = jnp.exp2(s2 - lse_ref[0][:, h:h + 1])   # lse is log2-space

            do = dorows[:, sl]
            dp = jax.lax.dot_general(
                do, vrows[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

            if dropout_rate > 0.0:
                b, q_i = pl.program_id(0), pl.program_id(1)
                nq = pl.num_programs(1)
                base = (b * n_head + h) * nq + q_i
                w_per = dp.shape[1] // drop_w
                keep = _dropout_keep_w(dp.shape, dropout_rate, seed_ref[0],
                                       base, kv_idx * w_per, n_w_tot,
                                       drop_w)
                dp = jnp.where(keep, dp / (1.0 - dropout_rate), 0.0)

            ds = p * (dp - di_ref[0][:, h:h + 1]) * scale
            dq_h = jax.lax.dot(
                ds.astype(dtype), k, preferred_element_type=jnp.float32)
            if single_kv:
                if use_rope:
                    dq_h = _rope_rot_inv(dq_h, qcos_ref[...], qsin_ref[...],
                                         half)
                dq_ref[0, :, sl] = dq_h.astype(dq_ref.dtype)
            else:
                dq_scr[:, sl] += dq_h

    if use_bounds:
        b_i, q_i = pl.program_id(0), pl.program_id(1)
        pl.when((kv_idx >= lo_ref[b_i, q_i]) &
                (kv_idx <= hi_ref[b_i, q_i]))(_compute)
    else:
        _compute()

    if not single_kv:
        @pl.when(kv_idx == n_kv - 1)
        def _store():
            if use_rope:
                dq_rows = dq_scr[...]
                for h in range(n_head):
                    sl = slice(h * D, (h + 1) * D)
                    dq_ref[0, :, sl] = _rope_rot_inv(
                        dq_rows[:, sl], qcos_ref[...], qsin_ref[...],
                        half).astype(dq_ref.dtype)
            else:
                dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)


def _mh_bwd_fused_kernel(seed_ref, q_ref, k_ref, v_ref, qseg_ref, kseg_ref,
                         *rest, scale, n_head, use_rope, dropout_rate,
                         drop_w, n_w_tot):
    """Single-kv fused backward: when ONE kv block covers the sequence, the
    dq reduction is trivial, so dK, dV AND dQ come out of one pass over q
    blocks — the split dkv/dq kernels each recompute the s and dp dots (7
    dots/tile total); this kernel computes them once (5 dots/tile, −28% of
    backward MXU work). dk/dv accumulate in scratch over the sequential q
    grid; dq stores per q block."""
    if use_rope:
        qcos_ref, qsin_ref, kcos_ref, ksin_ref = rest[:4]
        rest = rest[4:]
    else:
        qcos_ref = qsin_ref = kcos_ref = ksin_ref = None
    (lse_ref, do_ref, di_ref, dq_ref, dk_ref, dv_ref,
     dk_scr, dv_scr) = rest
    q_idx = pl.program_id(1)
    n_q = pl.num_programs(1)
    D = q_ref.shape[-1] // n_head
    half = D // 2

    @pl.when(q_idx == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    mask_bias = jnp.where(qseg_ref[0] == kseg_ref[0], 0.0,
                          DEFAULT_MASK_VALUE)        # (block_q, Tk)
    qrows, krows, vrows, dorows = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
    dtype = qrows.dtype

    for h in range(n_head):
        sl = slice(h * D, (h + 1) * D)
        q = qrows[:, sl]
        k = krows[:, sl]
        if use_rope:
            q = _rope_rot(q, qcos_ref[...], qsin_ref[...],
                          half).astype(dtype)
            k = _rope_rot(k, kcos_ref[...], ksin_ref[...],
                          half).astype(dtype)
        s2 = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * (scale * LOG2E) + mask_bias
        p = jnp.exp2(s2 - lse_ref[0][:, h:h + 1])    # lse is log2-space

        do = dorows[:, sl]
        dp = jax.lax.dot_general(
            do, vrows[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

        if dropout_rate > 0.0:
            # same strip stream as the forward's single-kv branch
            b = pl.program_id(0)
            base = (b * n_head + h) * n_q + q_idx
            keep = _dropout_keep_w(p.shape, dropout_rate, seed_ref[0],
                                   base, 0, n_w_tot, drop_w)
            inv = 1.0 / (1.0 - dropout_rate)
            p_drop = jnp.where(keep, p * inv, 0.0)
            dp = jnp.where(keep, dp * inv, 0.0)
        else:
            p_drop = p

        dv_scr[:, sl] += jax.lax.dot_general(
            p_drop.astype(dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - di_ref[0][:, h:h + 1]) * scale
        dsb = ds.astype(dtype)
        dk_scr[:, sl] += jax.lax.dot_general(
            dsb, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dq_h = jax.lax.dot(dsb, k, preferred_element_type=jnp.float32)
        if use_rope:
            dq_h = _rope_rot_inv(dq_h, qcos_ref[...], qsin_ref[...], half)
        dq_ref[0, :, sl] = dq_h.astype(dq_ref.dtype)

    @pl.when(q_idx == n_q - 1)
    def _store():
        if use_rope:
            dk_rows = dk_scr[...]
            for h in range(n_head):
                sl = slice(h * D, (h + 1) * D)
                dk_ref[0, :, sl] = _rope_rot_inv(
                    dk_rows[:, sl], kcos_ref[...], ksin_ref[...],
                    half).astype(dk_ref.dtype)
        else:
            dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _mh_bwd_fused(scale, block_q, dropout_rate, use_rope, res, do, di,
                  drop_w=None):
    """Single-kv fused backward dispatch (block_kv == Tk): one kernel
    returns (dq, dk, dv). di already carries any dlse adjustment."""
    q, k, v, q_seg, kv_seg, cos2, sin2, seed, o, lse = res
    B, Tq, H, D = q.shape
    Tk = k.shape[1]
    if drop_w is None:
        drop_w = Tk
    q2 = q.reshape(B, Tq, H * D)
    k2 = k.reshape(B, Tk, H * D)
    v2 = v.reshape(B, Tk, H * D)
    do2 = do.reshape(B, Tq, H * D)
    qseg2 = q_seg[:, :, None].astype(jnp.int32)
    kseg2 = kv_seg[:, None, :].astype(jnp.int32)
    seed_arr = jnp.asarray([seed], jnp.int32) if jnp.ndim(seed) == 0 \
        else seed.astype(jnp.int32).reshape(1)

    specs = [
        pl.BlockSpec((1, block_q, H * D), lambda b, qi, *_: (b, qi, 0)),
        pl.BlockSpec((1, Tk, H * D), lambda b, qi, *_: (b, 0, 0)),
        pl.BlockSpec((1, Tk, H * D), lambda b, qi, *_: (b, 0, 0)),
        pl.BlockSpec((1, block_q, 1), lambda b, qi, *_: (b, qi, 0)),
        pl.BlockSpec((1, 1, Tk), lambda b, qi, *_: (b, 0, 0)),
    ]
    args = [seed_arr, q2, k2, v2, qseg2, kseg2]
    if use_rope:
        specs += [
            pl.BlockSpec((block_q, D), lambda b, qi, *_: (qi, 0)),
            pl.BlockSpec((block_q, D), lambda b, qi, *_: (qi, 0)),
            pl.BlockSpec((Tk, D), lambda b, qi, *_: (0, 0)),
            pl.BlockSpec((Tk, D), lambda b, qi, *_: (0, 0)),
        ]
        args += [cos2, sin2, cos2, sin2]
    specs += [
        pl.BlockSpec((1, block_q, H), lambda b, qi, *_: (b, qi, 0)),   # lse
        pl.BlockSpec((1, block_q, H * D), lambda b, qi, *_: (b, qi, 0)),
        pl.BlockSpec((1, block_q, H), lambda b, qi, *_: (b, qi, 0)),   # di
    ]
    args += [lse, do2, di]
    kernel = functools.partial(
        _mh_bwd_fused_kernel, scale=scale, n_head=H, use_rope=use_rope,
        dropout_rate=dropout_rate, drop_w=drop_w, n_w_tot=Tk // drop_w)
    with _interpret_ctx():
        dq, dk, dv = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(B, Tq // block_q),
                in_specs=specs,
                out_specs=[
                    pl.BlockSpec((1, block_q, H * D),
                                 lambda b, qi, *_: (b, qi, 0)),
                    pl.BlockSpec((1, Tk, H * D), lambda b, qi, *_: (b, 0, 0)),
                    pl.BlockSpec((1, Tk, H * D), lambda b, qi, *_: (b, 0, 0)),
                ],
                scratch_shapes=[
                    pltpu.VMEM((Tk, H * D), jnp.float32),
                    pltpu.VMEM((Tk, H * D), jnp.float32),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct(q2.shape, q2.dtype),
                jax.ShapeDtypeStruct(k2.shape, k2.dtype),
                jax.ShapeDtypeStruct(v2.shape, v2.dtype),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=VMEM_LIMIT),
        )(*args)
    return (dq.reshape(B, Tq, H, D), dk.reshape(B, Tk, H, D),
            dv.reshape(B, Tk, H, D))


def _mh_bwd_fusedmk_kernel(seed_ref, *refs, scale, n_head, use_rope,
                           dropout_rate, use_bounds, block_kv,
                           drop_w, n_w_tot, kv0_w):
    """Fused multi-kv backward: grid (B, q-blocks, kv-blocks), computing dq,
    dk AND dv in one pass (5 dots/tile vs the split dkv/dq pair's 7 — the
    pair recomputes the s and dp dots in each pass). dq accumulates in a
    per-q-block scratch across the inner kv sweep (as the split dq kernel
    does); dk/dv accumulate into FULL-LENGTH (Tk, H*D) fp32 VMEM scratch
    across the whole (q, kv) plane of a batch row and flush to the output
    exactly once, at the row's last grid step (the outputs use a constant
    block index so the buffer rides VMEM — one DMA out per row, no
    per-tile write-back). Segment skipping uses the dq-style per-(b, q)
    visible-kv bounds; pruned tiles contribute zero to all three grads."""
    if use_bounds:
        lo_ref, hi_ref = refs[:2]
        refs = refs[2:]
    else:
        lo_ref = hi_ref = None
    q_ref, k_ref, v_ref, qseg_ref, kseg_ref = refs[:5]
    rest = refs[5:]
    if use_rope:
        (qcos_ref, qsin_ref, kcos_ref, ksin_ref,
         kcosf_ref, ksinf_ref) = rest[:6]
        rest = rest[6:]
    else:
        qcos_ref = qsin_ref = kcos_ref = ksin_ref = None
        kcosf_ref = ksinf_ref = None
    (lse_ref, do_ref, di_ref, dq_ref, dk_ref, dv_ref,
     dq_scr, dk_scr, dv_scr) = rest
    q_idx = pl.program_id(1)
    n_q = pl.num_programs(1)
    kv_idx = pl.program_id(2)
    n_kv = pl.num_programs(2)
    D = q_ref.shape[-1] // n_head
    half = D // 2

    @pl.when((q_idx == 0) & (kv_idx == 0))
    def _init_row():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    @pl.when(kv_idx == 0)
    def _init_q():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    def _compute():
        mask_bias = jnp.where(qseg_ref[0] == kseg_ref[0], 0.0,
                              DEFAULT_MASK_VALUE)    # (block_q, block_kv)
        qrows, krows, vrows, dorows = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
        dtype = qrows.dtype
        row0 = kv_idx * block_kv                     # scratch row offset

        for h in range(n_head):
            sl = slice(h * D, (h + 1) * D)
            q = qrows[:, sl]
            k = krows[:, sl]
            if use_rope:
                q = _rope_rot(q, qcos_ref[...], qsin_ref[...],
                              half).astype(dtype)
                k = _rope_rot(k, kcos_ref[...], ksin_ref[...],
                              half).astype(dtype)
            s2 = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * (scale * LOG2E) \
                + mask_bias
            p = jnp.exp2(s2 - lse_ref[0][:, h:h + 1])   # lse is log2-space

            do = dorows[:, sl]
            dp = jax.lax.dot_general(
                do, vrows[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

            if dropout_rate > 0.0:
                # identical strip stream to the forward; when the kv axis
                # is chunked across calls, kv0_w/n_w_tot place this call's
                # strips in the GLOBAL kv numbering
                b = pl.program_id(0)
                base = (b * n_head + h) * n_q + q_idx
                w_per = p.shape[1] // drop_w
                keep = _dropout_keep_w(p.shape, dropout_rate, seed_ref[0],
                                       base, kv0_w + kv_idx * w_per,
                                       n_w_tot, drop_w)
                inv = 1.0 / (1.0 - dropout_rate)
                p_drop = jnp.where(keep, p * inv, 0.0)
                dp = jnp.where(keep, dp * inv, 0.0)
            else:
                p_drop = p

            rows = (pl.dslice(row0, block_kv), sl)
            dv_scr[rows] += jax.lax.dot_general(
                p_drop.astype(dtype), do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = p * (dp - di_ref[0][:, h:h + 1]) * scale
            dsb = ds.astype(dtype)
            dk_scr[rows] += jax.lax.dot_general(
                dsb, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dq_scr[:, sl] += jax.lax.dot(
                dsb, k, preferred_element_type=jnp.float32)

    if use_bounds:
        b_i = pl.program_id(0)
        pl.when((kv_idx >= lo_ref[b_i, q_idx]) &
                (kv_idx <= hi_ref[b_i, q_idx]))(_compute)
    else:
        _compute()

    @pl.when(kv_idx == n_kv - 1)
    def _store_dq():
        if use_rope:
            dq_rows = dq_scr[...]
            for h in range(n_head):
                sl = slice(h * D, (h + 1) * D)
                dq_ref[0, :, sl] = _rope_rot_inv(
                    dq_rows[:, sl], qcos_ref[...], qsin_ref[...],
                    half).astype(dq_ref.dtype)
        else:
            dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)

    @pl.when((q_idx == n_q - 1) & (kv_idx == n_kv - 1))
    def _store_dkv():
        if use_rope:
            dk_rows = dk_scr[...]
            for h in range(n_head):
                sl = slice(h * D, (h + 1) * D)
                dk_ref[0, :, sl] = _rope_rot_inv(
                    dk_rows[:, sl], kcosf_ref[...], ksinf_ref[...],
                    half).astype(dk_ref.dtype)
        else:
            dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _mh_bwd_fusedmk(scale, block_q, block_kv, dropout_rate, use_rope, res,
                    do, di, kv_lo, kv_hi, kcos2=None, ksin2=None,
                    n_kv_tot=None, kv0=0, drop_w=None):
    """Fused multi-kv backward dispatch: one kernel returns (dq, dk, dv).
    di already carries any dlse adjustment; kv_lo/kv_hi are the per-(b,
    q-block) visible-kv bounds (None = no skipping). kcos2/ksin2 override
    the k-side RoPE tables (used when the caller chunks the kv axis and
    passes k/v/kv_seg slices in res); kv0/n_kv_tot place this call's kv
    blocks in the global numbering so the dropout stream matches the
    forward's."""
    q, k, v, q_seg, kv_seg, cos2, sin2, seed, o, lse = res
    B, Tq, H, D = q.shape
    Tk = k.shape[1]
    use_bounds = kv_lo is not None
    if kcos2 is None:
        kcos2, ksin2 = cos2, sin2
    if n_kv_tot is None:
        n_kv_tot = Tk // block_kv
    if drop_w is None:
        drop_w = block_kv
    q2 = q.reshape(B, Tq, H * D)
    k2 = k.reshape(B, Tk, H * D)
    v2 = v.reshape(B, Tk, H * D)
    do2 = do.reshape(B, Tq, H * D)
    qseg2 = q_seg[:, :, None].astype(jnp.int32)
    kseg2 = kv_seg[:, None, :].astype(jnp.int32)
    seed_arr = jnp.asarray([seed], jnp.int32) if jnp.ndim(seed) == 0 \
        else seed.astype(jnp.int32).reshape(1)

    if use_bounds:
        def kv_map(b, qi, ki, sd, lo, hi):
            return (b, jnp.clip(ki, lo[b, qi], hi[b, qi]), 0)

        def kseg_map(b, qi, ki, sd, lo, hi):
            return (b, 0, jnp.clip(ki, lo[b, qi], hi[b, qi]))

        def kcos_map(b, qi, ki, sd, lo, hi):
            return (jnp.clip(ki, lo[b, qi], hi[b, qi]), 0)
    else:
        kv_map = lambda b, qi, ki, *_: (b, ki, 0)
        kseg_map = lambda b, qi, ki, *_: (b, 0, ki)
        kcos_map = lambda b, qi, ki, *_: (ki, 0)
    specs = [
        pl.BlockSpec((1, block_q, H * D), lambda b, qi, ki, *_: (b, qi, 0)),
        pl.BlockSpec((1, block_kv, H * D), kv_map),
        pl.BlockSpec((1, block_kv, H * D), kv_map),
        pl.BlockSpec((1, block_q, 1), lambda b, qi, ki, *_: (b, qi, 0)),
        pl.BlockSpec((1, 1, block_kv), kseg_map),
    ]
    args = [seed_arr]
    if use_bounds:
        args += [kv_lo, kv_hi]
    args += [q2, k2, v2, qseg2, kseg2]
    if use_rope:
        specs += [
            pl.BlockSpec((block_q, D), lambda b, qi, ki, *_: (qi, 0)),
            pl.BlockSpec((block_q, D), lambda b, qi, ki, *_: (qi, 0)),
            pl.BlockSpec((block_kv, D), kcos_map),
            pl.BlockSpec((block_kv, D), kcos_map),
            # full-length tables for the final dk rotate-back
            pl.BlockSpec((Tk, D), lambda b, qi, ki, *_: (0, 0)),
            pl.BlockSpec((Tk, D), lambda b, qi, ki, *_: (0, 0)),
        ]
        args += [cos2, sin2, kcos2, ksin2, kcos2, ksin2]
    specs += [
        pl.BlockSpec((1, block_q, H), lambda b, qi, ki, *_: (b, qi, 0)),
        pl.BlockSpec((1, block_q, H * D), lambda b, qi, ki, *_: (b, qi, 0)),
        pl.BlockSpec((1, block_q, H), lambda b, qi, ki, *_: (b, qi, 0)),
    ]
    args += [lse, do2, di]
    w_per = block_kv // drop_w
    kernel = functools.partial(
        _mh_bwd_fusedmk_kernel, scale=scale, n_head=H, use_rope=use_rope,
        dropout_rate=dropout_rate, use_bounds=use_bounds, block_kv=block_kv,
        drop_w=drop_w, n_w_tot=n_kv_tot * w_per, kv0_w=kv0 * w_per)
    with _interpret_ctx():
        dq, dk, dv = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3 if use_bounds else 1,
                grid=(B, Tq // block_q, Tk // block_kv),
                in_specs=specs,
                out_specs=[
                    pl.BlockSpec((1, block_q, H * D),
                                 lambda b, qi, ki, *_: (b, qi, 0)),
                    pl.BlockSpec((1, Tk, H * D),
                                 lambda b, qi, ki, *_: (b, 0, 0)),
                    pl.BlockSpec((1, Tk, H * D),
                                 lambda b, qi, ki, *_: (b, 0, 0)),
                ],
                scratch_shapes=[
                    pltpu.VMEM((block_q, H * D), jnp.float32),
                    pltpu.VMEM((Tk, H * D), jnp.float32),
                    pltpu.VMEM((Tk, H * D), jnp.float32),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct(q2.shape, q2.dtype),
                jax.ShapeDtypeStruct(k2.shape, k2.dtype),
                jax.ShapeDtypeStruct(v2.shape, v2.dtype),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary", "arbitrary"),
                vmem_limit_bytes=VMEM_LIMIT),
        )(*args)
    return (dq.reshape(B, Tq, H, D), dk.reshape(B, Tk, H, D),
            dv.reshape(B, Tk, H, D))


def _mh_bwd(scale, block_q, block_kv, dropout_rate, use_rope, res, g,
            dlse=None, use_skip=False, drop_w=None):
    """Shared backward. dlse (B, Tq, H), natural-log space: cotangent of
    the lse output for the lse-exposing variant (_flash_mh_lse). It folds
    into the existing kernels with zero kernel changes: the kernels compute
    ds = p*(dp - di), and d(lse)/ds = p, so passing di' = di - dlse yields
    ds = p*(dp - di + dlse) — exactly the combined gradient."""
    q, k, v, q_seg, kv_seg, cos2, sin2, seed, o, lse = res
    do = g
    B, Tq, H, D = q.shape
    Tk = k.shape[1]
    if drop_w is None:
        drop_w = block_kv
    n_w_tot = Tk // drop_w
    single_kv = Tk == block_kv
    dkv_bounds = bool(use_skip) and Tq != block_q
    dq_bounds = bool(use_skip) and not single_kv
    if dkv_bounds:
        # per-(b, kv-block): visible q-block range (dkv reduces over q)
        q_lo, q_hi = _seg_block_bounds(kv_seg, q_seg, block_kv, block_q)
    if dq_bounds:
        kv_lo, kv_hi = _seg_block_bounds(q_seg, kv_seg, block_q, block_kv)

    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32),
                 axis=-1)                          # (B, Tq, H)
    if dlse is not None:
        di = di - dlse.astype(jnp.float32)
    if single_kv and FUSED_SINGLE_KV_BWD:
        # one kv block covers the sequence: fused single-pass backward
        # (dq, dk, dv from one kernel — the split pair recomputes s/dp)
        dq, dk, dv = _mh_bwd_fused(scale, block_q, dropout_rate, use_rope,
                                   res, do, di, drop_w=drop_w)
        return dq, dk, dv, None, None, jnp.zeros_like(cos2), \
            jnp.zeros_like(sin2), None
    if not single_kv and FUSED_MULTIKV_BWD:
        # per-kv-row VMEM: 2 fp32 scratch accumulators + 2 OUTPUT-dtype
        # buffers (dk/dv match k's dtype — fp32 runs need 16 B/row, and the
        # old bf16-hardcoded 12 B overclaimed eligibility near the limit,
        # r4 review)
        out_bytes = jnp.dtype(k.dtype).itemsize
        unit = H * D * (8 + 2 * out_bytes)
        if Tk * unit <= FUSED_MULTIKV_MAX_BYTES:
            # multi-kv fused backward: 5 dots/tile with full-length VMEM
            # dk/dv accumulators
            dq, dk, dv = _mh_bwd_fusedmk(
                scale, block_q, block_kv, dropout_rate, use_rope, res, do,
                di, kv_lo if dq_bounds else None,
                kv_hi if dq_bounds else None, drop_w=drop_w)
            return dq, dk, dv, None, None, jnp.zeros_like(cos2), \
                jnp.zeros_like(sin2), None
        # kv axis too long for one set of VMEM accumulators: chunk it and
        # call the fused kernel per chunk (the global lse makes each call's
        # partial softmax exact — dq sums over chunks, dk/dv concatenate).
        # Extra cost: q/do/lse/di are re-read once per chunk; the 5-dot
        # saving dwarfs that at these lengths.
        max_rows = (FUSED_MULTIKV_MAX_BYTES // unit) // block_kv * block_kv
        chunk = 0
        c = max_rows
        while c >= block_kv:
            if Tk % c == 0:
                chunk = c
                break
            c -= block_kv
        if chunk:
            n_kv_tot = Tk // block_kv
            dq = None
            dks, dvs = [], []
            for ci in range(Tk // chunk):
                sl_t = slice(ci * chunk, (ci + 1) * chunk)
                kv_seg_c = kv_seg[:, sl_t]
                if dq_bounds:
                    lo_c, hi_c = _seg_block_bounds(
                        q_seg, kv_seg_c, block_q, block_kv)
                else:
                    lo_c = hi_c = None
                res_c = (q, k[:, sl_t], v[:, sl_t], q_seg, kv_seg_c,
                         cos2, sin2, seed, o, lse)
                dq_c, dk_c, dv_c = _mh_bwd_fusedmk(
                    scale, block_q, block_kv, dropout_rate, use_rope,
                    res_c, do, di, lo_c, hi_c,
                    kcos2=cos2[sl_t], ksin2=sin2[sl_t],
                    n_kv_tot=n_kv_tot, kv0=ci * (chunk // block_kv),
                    drop_w=drop_w)
                dq_c = dq_c.astype(jnp.float32)   # sum chunks in fp32
                dq = dq_c if dq is None else dq + dq_c
                dks.append(dk_c)
                dvs.append(dv_c)
            dq = dq.astype(q.dtype)
            dk = jnp.concatenate(dks, axis=1)
            dv = jnp.concatenate(dvs, axis=1)
            return dq, dk, dv, None, None, jnp.zeros_like(cos2), \
                jnp.zeros_like(sin2), None
        # no chunking possible (Tk not factorable) — fall through to split
    q = q.reshape(B, Tq, H * D)
    k = k.reshape(B, Tk, H * D)
    v = v.reshape(B, Tk, H * D)
    do = do.reshape(B, Tq, H * D)
    qseg2 = q_seg[:, :, None].astype(jnp.int32)
    kseg2 = kv_seg[:, None, :].astype(jnp.int32)
    seed_arr = jnp.asarray([seed], jnp.int32) if jnp.ndim(seed) == 0 \
        else seed.astype(jnp.int32).reshape(1)

    if dkv_bounds:
        # q-indexed operands clamp into this kv block's visible q range
        def q_map(b, ki, qi, sd, lo, hi):
            return (b, jnp.clip(qi, lo[b, ki], hi[b, ki]), 0)

        def qseg_map(b, ki, qi, sd, lo, hi):
            return (b, jnp.clip(qi, lo[b, ki], hi[b, ki]), 0)

        def qcos_map(b, ki, qi, sd, lo, hi):
            return (jnp.clip(qi, lo[b, ki], hi[b, ki]), 0)
    else:
        q_map = lambda b, ki, qi, *_: (b, qi, 0)
        qseg_map = lambda b, ki, qi, *_: (b, qi, 0)
        qcos_map = lambda b, i, j, *_: (j, 0)
    dkv_specs = [
        pl.BlockSpec((1, block_q, H * D), q_map),
        pl.BlockSpec((1, block_kv, H * D),
                     lambda b, ki, qi, *_: (b, ki, 0)),
        pl.BlockSpec((1, block_kv, H * D),
                     lambda b, ki, qi, *_: (b, ki, 0)),
        pl.BlockSpec((1, block_q, 1), qseg_map),
        pl.BlockSpec((1, 1, block_kv),
                     lambda b, ki, qi, *_: (b, 0, ki)),
    ]
    dkv_args = [seed_arr]
    if dkv_bounds:
        dkv_args += [q_lo, q_hi]
    dkv_args += [q, k, v, qseg2, kseg2]
    if use_rope:
        dkv_specs += [
            pl.BlockSpec((block_q, D), qcos_map),                      # q cos
            pl.BlockSpec((block_q, D), qcos_map),                      # q sin
            pl.BlockSpec((block_kv, D), lambda b, i, j, *_: (i, 0)),   # k cos
            pl.BlockSpec((block_kv, D), lambda b, i, j, *_: (i, 0)),   # k sin
        ]
        dkv_args += [cos2, sin2, cos2, sin2]
    dkv_specs += [
        pl.BlockSpec((1, block_q, H), qseg_map),              # lse
        pl.BlockSpec((1, block_q, H * D), q_map),             # do
        pl.BlockSpec((1, block_q, H), qseg_map),              # di
    ]
    dkv_args += [lse, do, di]
    dkv_kernel = functools.partial(
        _mh_bwd_dkv_kernel, scale=scale, n_head=H, use_rope=use_rope,
        dropout_rate=dropout_rate, use_bounds=dkv_bounds,
        drop_w=drop_w, n_w_tot=n_w_tot)
    with _interpret_ctx():
        dk, dv = pl.pallas_call(
            dkv_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3 if dkv_bounds else 1,
                grid=(B, Tk // block_kv, Tq // block_q),
                in_specs=dkv_specs,
                out_specs=[
                    pl.BlockSpec((1, block_kv, H * D),
                                 lambda b, ki, qi, *_: (b, ki, 0)),
                    pl.BlockSpec((1, block_kv, H * D),
                                 lambda b, ki, qi, *_: (b, ki, 0)),
                ],
                scratch_shapes=[
                    pltpu.VMEM((block_kv, H * D), jnp.float32),
                    pltpu.VMEM((block_kv, H * D), jnp.float32),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct(k.shape, k.dtype),
                jax.ShapeDtypeStruct(v.shape, v.dtype),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=VMEM_LIMIT),
        )(*dkv_args)

        if dq_bounds:
            def dq_kv_map(b, qi, ki, sd, lo, hi):
                return (b, jnp.clip(ki, lo[b, qi], hi[b, qi]), 0)

            def dq_kseg_map(b, qi, ki, sd, lo, hi):
                return (b, 0, jnp.clip(ki, lo[b, qi], hi[b, qi]))

            def dq_kcos_map(b, qi, ki, sd, lo, hi):
                return (jnp.clip(ki, lo[b, qi], hi[b, qi]), 0)
        else:
            dq_kv_map = lambda b, qi, ki, *_: (b, ki, 0)
            dq_kseg_map = lambda b, qi, ki, *_: (b, 0, ki)
            dq_kcos_map = lambda b, qi, ki, *_: (ki, 0)
        dq_specs = [
            pl.BlockSpec((1, block_q, H * D),
                         lambda b, qi, ki, *_: (b, qi, 0)),
            pl.BlockSpec((1, block_kv, H * D), dq_kv_map),
            pl.BlockSpec((1, block_kv, H * D), dq_kv_map),
            pl.BlockSpec((1, block_q, 1),
                         lambda b, qi, ki, *_: (b, qi, 0)),
            pl.BlockSpec((1, 1, block_kv), dq_kseg_map),
        ]
        dq_args = [seed_arr]
        if dq_bounds:
            dq_args += [kv_lo, kv_hi]
        dq_args += [q, k, v, qseg2, kseg2]
        if use_rope:
            dq_specs += [
                pl.BlockSpec((block_q, D), lambda b, qi, ki, *_: (qi, 0)),
                pl.BlockSpec((block_q, D), lambda b, qi, ki, *_: (qi, 0)),
                pl.BlockSpec((block_kv, D), dq_kcos_map),
                pl.BlockSpec((block_kv, D), dq_kcos_map),
            ]
            dq_args += [cos2, sin2, cos2, sin2]
        dq_specs += [
            pl.BlockSpec((1, block_q, H),
                         lambda b, qi, ki, *_: (b, qi, 0)),
            pl.BlockSpec((1, block_q, H * D),
                         lambda b, qi, ki, *_: (b, qi, 0)),
            pl.BlockSpec((1, block_q, H),
                         lambda b, qi, ki, *_: (b, qi, 0)),
        ]
        dq_args += [lse, do, di]
        dq_kernel = functools.partial(
            _mh_bwd_dq_kernel, scale=scale, n_head=H, use_rope=use_rope,
            dropout_rate=dropout_rate, single_kv=single_kv,
            use_bounds=dq_bounds, drop_w=drop_w, n_w_tot=n_w_tot)
        dq = pl.pallas_call(
            dq_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3 if dq_bounds else 1,
                grid=(B, Tq // block_q, Tk // block_kv),
                in_specs=dq_specs,
                out_specs=pl.BlockSpec((1, block_q, H * D),
                                       lambda b, qi, ki, *_: (b, qi, 0)),
                scratch_shapes=[] if single_kv else [
                    pltpu.VMEM((block_q, H * D), jnp.float32)],
            ),
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=VMEM_LIMIT),
        )(*dq_args)
    dq = dq.reshape(B, Tq, H, D)
    dk = dk.reshape(B, Tk, H, D)
    dv = dv.reshape(B, Tk, H, D)
    return dq, dk, dv, None, None, jnp.zeros_like(cos2), \
        jnp.zeros_like(sin2), None


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(8, 9, 10, 11, 12, 13, 14))
def _flash_mh(q, k, v, q_seg, kv_seg, cos2, sin2, seed, scale, block_q,
              block_kv, dropout_rate, use_rope, use_skip, block_kv_fwd):
    """block_kv_fwd decouples the FORWARD kv block size from the
    backward's (block_kv): a sequence-spanning forward block skips the
    online-softmax state (13% faster fwd at T=2048) while the backward
    keeps the narrower blocks the fused 5-dot kernels prefer. The dropout
    streams stay aligned because both sides draw keep-masks in canonical
    min(block_kv, block_kv_fwd)-wide strips (_dropout_keep_w)."""
    drop_w = min(block_kv, block_kv_fwd)
    o, _ = _mh_fwd(q, k, v, q_seg, kv_seg, cos2, sin2, seed, scale=scale,
                   block_q=block_q, block_kv=block_kv_fwd,
                   dropout_rate=dropout_rate, use_rope=use_rope,
                   use_skip=use_skip, drop_w=drop_w)
    return o


def _flash_mh_fwd(q, k, v, q_seg, kv_seg, cos2, sin2, seed, scale, block_q,
                  block_kv, dropout_rate, use_rope, use_skip, block_kv_fwd):
    drop_w = min(block_kv, block_kv_fwd)
    o, lse = _mh_fwd(q, k, v, q_seg, kv_seg, cos2, sin2, seed, scale=scale,
                     block_q=block_q, block_kv=block_kv_fwd,
                     dropout_rate=dropout_rate, use_rope=use_rope,
                     use_skip=use_skip, drop_w=drop_w)
    return o, (q, k, v, q_seg, kv_seg, cos2, sin2, seed, o, lse)


def _flash_mh_bwd(scale, block_q, block_kv, dropout_rate, use_rope, use_skip,
                  block_kv_fwd, res, g):
    return _mh_bwd(scale, block_q, block_kv, dropout_rate, use_rope, res, g,
                   use_skip=use_skip, drop_w=min(block_kv, block_kv_fwd))


_flash_mh.defvjp(_flash_mh_fwd, _flash_mh_bwd)


LN2 = 0.6931471805599453


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13))
def _flash_mh_lse(q, k, v, q_seg, kv_seg, cos2, sin2, seed, scale, block_q,
                  block_kv, dropout_rate, use_rope, use_skip):
    """Like _flash_mh but ALSO returns the logsumexp residual (natural-log,
    (B, Tq, H)) as a differentiable output. This is the building block for
    blockwise/ring attention: per-block (o_i, lse_i) pairs recombine as
    o = Σ o_i·e^{lse_i} / Σ e^{lse_i}, and the combine's lse cotangent
    reaches the kernels through the di adjustment (see _mh_bwd)."""
    o, lse2 = _mh_fwd(q, k, v, q_seg, kv_seg, cos2, sin2, seed, scale=scale,
                      block_q=block_q, block_kv=block_kv,
                      dropout_rate=dropout_rate, use_rope=use_rope,
                      use_skip=use_skip)
    return o, lse2 * LN2


def _flash_mh_lse_fwd(q, k, v, q_seg, kv_seg, cos2, sin2, seed, scale,
                      block_q, block_kv, dropout_rate, use_rope, use_skip):
    o, lse2 = _mh_fwd(q, k, v, q_seg, kv_seg, cos2, sin2, seed, scale=scale,
                      block_q=block_q, block_kv=block_kv,
                      dropout_rate=dropout_rate, use_rope=use_rope,
                      use_skip=use_skip)
    return (o, lse2 * LN2), (q, k, v, q_seg, kv_seg, cos2, sin2, seed, o,
                             lse2)


def _flash_mh_lse_bwd(scale, block_q, block_kv, dropout_rate, use_rope,
                      use_skip, res, g):
    do, dlse = g
    return _mh_bwd(scale, block_q, block_kv, dropout_rate, use_rope, res,
                   do, dlse=dlse, use_skip=use_skip)


_flash_mh_lse.defvjp(_flash_mh_lse_fwd, _flash_mh_lse_bwd)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _flash(q, k, v, q_seg, kv_seg, seed, scale, block_q, block_kv,
           dropout_rate):
    o, _ = _fwd(q, k, v, q_seg, kv_seg, seed, scale=scale,
                block_q=block_q, block_kv=block_kv,
                dropout_rate=dropout_rate)
    return o


def _flash_fwd(q, k, v, q_seg, kv_seg, seed, scale, block_q, block_kv,
               dropout_rate):
    o, lse = _fwd(q, k, v, q_seg, kv_seg, seed, scale=scale,
                  block_q=block_q, block_kv=block_kv,
                  dropout_rate=dropout_rate)
    return o, (q, k, v, q_seg, kv_seg, seed, o, lse)


def _flash_bwd(scale, block_q, block_kv, dropout_rate, res, g):
    return _bwd(scale, block_q, block_kv, dropout_rate, res, (g, None))


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,                     # (B, T, H, D)
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    segment_ids: Optional[jnp.ndarray] = None,   # (B, T) int32
    scale: float,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    block_q: int = 128,
    block_kv: int = 128,
    rope: Optional[tuple] = None,       # (cos, sin) (T, D/2) from rope_tables
    multi_head: bool = True,
    segment_skip: bool = True,
    block_kv_fwd: Optional[int] = None,  # decoupled FORWARD kv block size
) -> jnp.ndarray:
    """Flash attention over (B, T, H, D) inputs with segment-id masking.

    segment_ids=None means dense bidirectional attention (every position
    visible — the encode() path, reference model.py:268).

    multi_head=True (default) uses the row-blocked kernels: (block, H*D)
    contiguous tiles with the head loop inside — measured substantially
    faster than the per-head grid because the per-head grid's (block, D)
    tiles are strided reads of a (B, T, H*D) array. rope=(cos, sin) fuses
    rotate-half RoPE (models/rope.py:apply_rope_half) on q/k inside the
    kernels, so the rotation is recomputed in both passes instead of ever
    touching HBM (requires multi_head=True).

    segment_skip=True (default, multi_head only): tiles whose q/kv segment-id
    ranges are disjoint — entirely cross-segment, fully masked — are skipped
    (no DMA, no compute) via scalar-prefetched per-block bounds. Exact: only
    provably-masked tiles are pruned; replaces the reference's O(T²) work on
    the materialised block-diagonal mask (train_encoder.py:31-57) with work
    proportional to the visible tiles.
    """
    B, T, H, D = q.shape
    assert T % block_q == 0 and T % block_kv == 0, (T, block_q, block_kv)
    assert block_kv_fwd is None or T % block_kv_fwd == 0

    skip = segment_skip and segment_ids is not None and multi_head
    if segment_ids is None:
        segment_ids = jnp.zeros((B, T), jnp.int32)

    if dropout_rate > 0.0:
        if dropout_rng is None:
            raise ValueError("dropout_rate > 0 requires dropout_rng")
        seed = jax.random.randint(
            dropout_rng, (), minval=jnp.iinfo(jnp.int32).min,
            maxval=jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
    else:
        seed = jnp.int32(0)

    if multi_head:
        # full-width tables [c|c], [s|s] so the in-kernel rotation is two
        # lane-aligned multiplies + one concat (see _rope_rot)
        return _flash_mh_apply(q, k, v, segment_ids, seed, scale,
                               block_q, block_kv, dropout_rate, rope,
                               use_skip=skip, block_kv_fwd=block_kv_fwd)

    assert rope is None, "rope fusion requires the multi_head kernel"
    # the kernel consumes the model's native (B, T, H, D) layout directly —
    # no transposes (they cost ~7 ms/step at omnibiote-small scale)
    return _flash(q, k, v, segment_ids, segment_ids, seed,
                  scale, block_q, block_kv, float(dropout_rate))


def flash_attention_tp(q, k, v, *, segment_ids=None, scale,
                       mesh, model_axis="model", dropout_rate=0.0,
                       dropout_rng=None, block_q=512, block_kv=1024,
                       rope=None, segment_skip=True):
    """Head-parallel flash attention: shard H over `model_axis` and run the
    kernel per-device on its local heads (zero communication — head
    parallelism needs none; boom_attention_tricks.md §14). Use under tensor
    parallelism so the kernel consumes the already-head-sharded qkv
    activations instead of forcing an all-gather. rope=(cos, sin) fuses
    RoPE per shard (tables are position-indexed, so head sharding leaves
    them whole)."""
    from jax.sharding import PartitionSpec as P

    skip = segment_skip and segment_ids is not None
    if segment_ids is None:
        segment_ids = jnp.zeros((q.shape[0], q.shape[1]), jnp.int32)
    if dropout_rate > 0.0:
        if dropout_rng is None:
            raise ValueError("dropout_rate > 0 requires dropout_rng")
        seed = jax.random.randint(dropout_rng, (), jnp.iinfo(jnp.int32).min,
                                  jnp.iinfo(jnp.int32).max, jnp.int32)
    else:
        seed = jnp.int32(0)

    def body(q, k, v, seg, seed):
        # Fold the axis index so head shards draw independent dropout bits.
        # Mix it in with a large odd multiplier: the kernel adds a per-tile
        # counter to the seed, so a plain `seed + idx` would collide across
        # shards (device i, tile u == device i+1, tile u-1).
        idx = jax.lax.axis_index(model_axis)
        mixed = seed ^ (idx * jnp.int32(-1640531527))  # 0x9E3779B9 as int32
        return _flash_mh_apply(q, k, v, seg, mixed, scale, block_q,
                               block_kv, dropout_rate, rope, use_skip=skip)

    spec = P(None, None, model_axis, None)
    # check_vma=False: pallas_call outputs don't carry varying-axis metadata
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(spec, spec, spec, P(), P()),
        out_specs=spec, check_vma=False)
    return fn(q, k, v, segment_ids, seed)


def _flash_mh_apply(q, k, v, seg, seed, scale, block_q, block_kv,
                    dropout_rate, rope, use_skip=False, block_kv_fwd=None):
    """Shared entry into the multi-head kernel: build full-width rope
    tables (or dummies) and call the custom-vjp wrapper."""
    T = q.shape[1]
    use_rope = rope is not None
    if use_rope:
        cos, sin = rope
        cos2 = jnp.concatenate([cos[:T], cos[:T]], axis=1).astype(jnp.float32)
        sin2 = jnp.concatenate([sin[:T], sin[:T]], axis=1).astype(jnp.float32)
        # The VJP returns zero cotangents for the tables (they are position
        # constants); block differentiation so that contract can never
        # silently yield wrong grads if a caller differentiates w.r.t. them.
        cos2 = jax.lax.stop_gradient(cos2)
        sin2 = jax.lax.stop_gradient(sin2)
    else:
        cos2 = sin2 = jnp.zeros((1, 1), jnp.float32)
    if block_kv_fwd is None:
        block_kv_fwd = block_kv
    assert block_kv_fwd % min(block_kv, block_kv_fwd) == 0 \
        and block_kv % min(block_kv, block_kv_fwd) == 0
    return _flash_mh(q, k, v, seg, seg, cos2, sin2, seed, scale,
                     block_q, block_kv, float(dropout_rate), use_rope,
                     bool(use_skip), int(block_kv_fwd))
