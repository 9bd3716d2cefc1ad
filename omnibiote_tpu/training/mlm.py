"""Masked-language-model objective.

Reference semantics (/root/reference/training/train_encoder.py:273-311):
  * Bernoulli mask at p=0.15; PAD and EOS never masked
  * masked positions replaced with MASK_TOKEN (no 80/10/10 split)
  * cross-entropy restricted to masked positions, normalised by the
    micro-batch's masked count, then divided by the accumulation count

TPU-native differences:
  * masking happens on device from a per-step PRNG (the reference draws a
    host numpy binomial and ships it over PCIe each step)
  * the LM head is evaluated only at masked positions: each row's masked
    positions are compacted into a fixed-capacity buffer (T//4 slots; at
    p=0.15 the chance of overflow at T=1024 is a >8-sigma event), so the
    D x V readout matmul runs on ~15% of positions instead of all of them —
    at vocab 65536 the head dominates per-token FLOPs, so this cuts total
    step FLOPs by roughly a third versus the reference's full-logits CE.
    Overflowing positions (never in practice) simply drop out of the loss.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import EOS_TOKEN, MASK_TOKEN, PAD_TOKEN, OmniBioTAConfig
from ..models.omnibiota import forward
from ..ops.fused_ce import fused_cross_entropy, pick_chunks


def _default_capacity_frac(mask_prob: float) -> float:
    """Compaction capacity scaled to the mask rate: the historical fixed
    0.25 was sized for the reference's p=0.15 (5/3 headroom over the mean
    count) and silently DROPPED late-sequence masked positions once
    mask_prob exceeded ~0.2 — a position-biased objective (r4 review).
    The same headroom ratio is kept at every rate, capped at dense."""
    return min(1.0, mask_prob * (0.25 / 0.15))


def make_mlm_mask(rng: jax.Array, tokens: jnp.ndarray,
                  mask_prob: float = 0.15) -> jnp.ndarray:
    """Bernoulli(p) mask excluding PAD and EOS (train_encoder.py:276-278)."""
    bern = jax.random.bernoulli(rng, mask_prob, tokens.shape)
    return bern & (tokens != PAD_TOKEN) & (tokens != EOS_TOKEN)


def apply_mlm_mask(tokens: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(mask, MASK_TOKEN, tokens)


def _masked_order(mask: jnp.ndarray, capacity: int):
    """Indices of each row's first `capacity` masked positions, in order.

    Returns (order (B, cap) int32, valid (B, cap) bool). Equivalent to
    `argsort(~mask, stable)[:, :cap]` on the valid slots but built from a
    cumsum + batched binary search: slot j holds the first position t with
    cumsum(mask)[t] == j+1. A stable argsort lowers to a full O(T log^2 T)
    sorting network on TPU (~4% of the train step at T=1024); the search
    is log2(T) gather rounds over (B, cap). Superseded in the hot path
    by _compaction_onehot (MXU contraction, no serial rounds); kept as
    the independent oracle for the compaction parity test.
    """
    B, T = mask.shape
    cs = jnp.cumsum(mask.astype(jnp.int32), axis=-1)          # (B, T)
    targets = jnp.arange(1, capacity + 1, dtype=jnp.int32)    # (cap,)
    order = jax.vmap(
        lambda row: jnp.searchsorted(row, targets, side="left"))(cs)
    valid = targets[None, :] <= cs[:, -1:]                    # j+1 <= total
    order = jnp.minimum(order, T - 1).astype(jnp.int32)       # clamp overflow
    return order, valid


def _compaction_onehot(mask: jnp.ndarray, capacity: int, dtype):
    """One-hot compaction matrix P (..., cap, T) and valid (..., cap).

    P[..., j, t] = 1 iff position t is the row's (j+1)-th masked slot:
    `cumsum(mask) == j+1` intersected with mask itself — cumsum is
    monotone, so each P row has at most one hit and slot j is valid
    exactly when the row holds > j masked positions. Contractions
    against P replace both the searchsorted order build (log2(T) serial
    gather rounds) and the take_along_axis gather (a sequence-axis
    gather HLO) with MXU matmuls; on-chip the full chain is ~1.5x faster
    fwd+bwd and the backward scatter becomes P^T @ dg for free
    (tools/probes/headgather2.py: 0.84 vs 1.27 ms at the ref-default
    head shapes, bitwise parity).
    """
    cs = jnp.cumsum(mask.astype(jnp.int32), axis=-1)           # (..., T)
    targets = jnp.arange(1, capacity + 1, dtype=jnp.int32)     # (cap,)
    hit = (cs[..., None, :] == targets[:, None]) & mask[..., None, :]
    valid = targets <= cs[..., -1:]                            # (..., cap)
    return hit.astype(dtype), valid


def _gather_masked(emb: jnp.ndarray, tokens: jnp.ndarray, mask: jnp.ndarray,
                   capacity: int):
    """Compact each row's masked positions into `capacity` slots.

    Returns (gathered_emb (..., cap, D), labels (..., cap), valid
    (..., cap)); leading dims pass through, so the sequence-parallel
    (B, shards, T_local) blocks use the same code. Per-row compaction
    keeps the batch dimension local to its shard — no cross-device
    gather under the data-parallel jit. Invalid slots come back as
    zeros (callers mask by `valid` before any reduction).

    Labels ride a fp32 contraction: one-hot x int is exact up to 2^24,
    far above the 2^16 vocab.
    """
    p, valid = _compaction_onehot(mask, capacity, emb.dtype)
    gathered = jnp.einsum("...ct,...td->...cd", p, emb)
    labels = jnp.einsum("...ct,...t->...c", p.astype(jnp.float32),
                        tokens.astype(jnp.float32)).astype(jnp.int32)
    return gathered, labels, valid


def mlm_loss(
    params: dict,
    cfg: OmniBioTAConfig,
    tokens: jnp.ndarray,            # (B, T) original ids
    segment_ids: Optional[jnp.ndarray],
    rng: jax.Array,                 # consumed for mask + dropout
    *,
    mask_prob: float = 0.15,
    deterministic: bool = False,
    capacity_frac: Optional[float] = None,
    ring_mesh=None,
    ring_axis: str = "data",
    ring_batch_axis=None,
    tp_mesh=None,
    tp_axis: str = "model",
) -> Tuple[jnp.ndarray, dict]:
    """Masked-mean cross-entropy for one micro-batch.

    Returns (loss, aux) where loss = sum_masked CE / masked_count (the
    reference's per-micro-batch normalisation, train_encoder.py:301-305) and
    aux carries masked_count and non-PAD token count for metrics.
    """
    if capacity_frac is None:
        capacity_frac = _default_capacity_frac(mask_prob)
    rng_mask, rng_drop = jax.random.split(rng)
    mask = make_mlm_mask(rng_mask, tokens, mask_prob)
    masked_ids = apply_mlm_mask(tokens, mask)

    emb = forward(params, cfg, masked_ids, segment_ids=segment_ids,
                  deterministic=deterministic, rng=rng_drop,
                  return_embeddings=True, ring_mesh=ring_mesh,
                  ring_axis=ring_axis, ring_batch_axis=ring_batch_axis,
                  tp_mesh=tp_mesh, tp_axis=tp_axis)

    if ring_mesh is not None:
        # Sequence-parallel mode: a global argsort over T would gather
        # across sequence shards, so compact masked positions WITHIN each
        # T/n_shards block instead. Reshaping T -> (shards, T_local) splits
        # the sharded dimension cleanly (GSPMD keeps every blockwise op
        # shard-local and inserts the dW/loss all-reduces itself), and each
        # device evaluates the D x V head on ~15% of its local positions —
        # sp keeps the compaction FLOP saving (round-1 VERDICT #5).
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_shards = int(ring_mesh.shape[ring_axis])
        B, T = tokens.shape
        T_l = T // n_shards
        cap = max(int(T_l * capacity_frac), 8)
        blkspec = NamedSharding(ring_mesh,
                                P(ring_batch_axis, ring_axis, None))
        tok_b = jax.lax.with_sharding_constraint(
            tokens.reshape(B, n_shards, T_l), blkspec)
        mask_b = mask.reshape(B, n_shards, T_l)
        emb_b = emb.reshape(B, n_shards, T_l, emb.shape[-1])

        g_emb, labels, valid = _gather_masked(emb_b, tok_b, mask_b, cap)

        scale = jnp.asarray(cfg.mup_output_mult / cfg.width_mult, emb.dtype)
        if cfg.fused_ce:
            nll = fused_cross_entropy(g_emb * scale, params["lm_head"],
                                      labels, pick_chunks(cfg.vocab_size))
        else:
            logits = (g_emb * scale) @ params["lm_head"].astype(g_emb.dtype)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            nll = -jnp.take_along_axis(logp, labels[..., None], -1)[..., 0]
        nll = jnp.where(valid, nll, 0.0)
        masked_count = jnp.sum(valid)
        loss = jnp.sum(nll) / jnp.maximum(masked_count, 1)
        return loss, {"masked_count": masked_count,
                      "num_tokens": jnp.sum(tokens != PAD_TOKEN)}

    T = tokens.shape[1]
    capacity = max(int(T * capacity_frac), 8)
    g_emb, labels, valid = _gather_masked(emb, tokens, mask, capacity)

    # µP readout on the compacted positions only. cfg.fused_ce selects the
    # vocab-chunked fused CE (ops/fused_ce.py — never materialises (N, V)
    # fp32 logits, recomputes them in the backward) vs. the plain
    # log_softmax path (XLA saves the bf16 logits as residuals).
    scale = jnp.asarray(cfg.mup_output_mult / cfg.width_mult, dtype=g_emb.dtype)
    if cfg.fused_ce:
        nll = fused_cross_entropy((g_emb * scale), params["lm_head"],
                                  labels, pick_chunks(cfg.vocab_size))
    else:
        logits = (g_emb * scale) @ params["lm_head"].astype(g_emb.dtype)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)

    masked_count = jnp.sum(valid)
    loss = jnp.sum(nll) / jnp.maximum(masked_count, 1)
    aux = {
        "masked_count": masked_count,
        "num_tokens": jnp.sum(tokens != PAD_TOKEN),
    }
    return loss, aux
