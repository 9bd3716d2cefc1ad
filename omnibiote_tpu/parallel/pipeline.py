"""Pipeline parallelism (GPipe-style) over a 'stage' mesh axis.

An EXTENSION beyond the reference (SURVEY.md C22: the reference has DP and
FSDP only; we add tp, sp, and pp). Device s holds the contiguous layer slice
[s·L/S, (s+1)·L/S); microbatches flow left-to-right around the stage ring
via jax.lax.ppermute, so activations ride the ICI neighbour links and every
stage works on a different microbatch each tick (M + S - 1 ticks for M
microbatches over S stages — the classic GPipe schedule with its bubble).

The whole schedule is ONE lax.scan inside ONE jax.shard_map under jit:
  * the backward pass falls out of jax.grad — the transpose of ppermute is
    the reverse rotation, so the cotangents flow right-to-left through the
    same ring, giving the symmetric reverse schedule with no hand-written
    backward;
  * layer parameters are sharded over the stage axis on their stacked
    leading dim (P('stage', ...)), so each device materialises only its
    own layers' weights, activations, and optimizer state — the memory
    scaling that makes pp useful for deep models;
  * embedding/readout stay replicated: their gradient contributions from
    non-owning stages are structurally zero and shard_map's psum-on-
    replicated-input transpose sums them for free.

MLM masking and the embedding lookup happen OUTSIDE the shard_map at GSPMD
level (per microbatch, same semantics as the accumulation loop in
training/train.py); per-microbatch losses are normalised by their own
masked counts and weighted by the batch-ramp activity weights, matching
the reference's accumulation normalisation (train_encoder.py:301-305).

Head balance: when M % S == 0, the last stage's final hiddens broadcast
once over the stage ring (a psum of the is_last-masked tree) and stage s
computes the CE of its own M/S microbatch group — the readout is spread
across the pipeline instead of being replicated on every stage (the
uneven-M fallback keeps the replicate-and-mask form).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import OmniBioTAConfig, PAD_TOKEN
from ..models.omnibiota import _block, _layer_norm
from ..models.rope import rope_tables
from ..training.mlm import make_mlm_mask, apply_mlm_mask, _gather_masked
from .mesh import DATA_AXIS

STAGE_AXIS = "stage"


def pp_param_pspecs(params, fsdp_shards: int = 1):
    """blocks: stacked leading (layer) dim sharded over the stage axis;
    everything else replicated.

    fsdp_shards > 1 (sharding='fsdp+pp'): additionally shard every leaf's
    largest remaining divisible dim over the 'data' axis — ZeRO-3 composed
    with the pipeline, the standard pod recipe (stages across one mesh
    axis, each stage's weights+moments spread over the other). No kernel
    or schedule change is needed: pp_mlm_loss's shard_map in_specs demand
    the stage-only layout, so jit inserts one all-gather over 'data' on
    the bf16 compute copy per step, and its autodiff transpose is exactly
    the ZeRO reduce-scatter of the grads back to the owning shard."""
    from .sharding import _fsdp_dim

    def spec(path, leaf):
        names = [str(p.key) for p in path if hasattr(p, "key")]
        if "blocks" in names:
            dims = [STAGE_AXIS] + [None] * (leaf.ndim - 1)
            if fsdp_shards > 1:
                d = _fsdp_dim(leaf.shape[1:], fsdp_shards)
                if d is not None:
                    dims[1 + d] = DATA_AXIS
            return P(*dims)
        if fsdp_shards > 1:
            d = _fsdp_dim(leaf.shape, fsdp_shards)
            if d is not None:
                dims = [None] * leaf.ndim
                dims[d] = DATA_AXIS
                return P(*dims)
        return P()
    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params_pp(params, mesh: Mesh, fsdp: bool = False):
    axes = dict(zip(mesh.axis_names, mesh.devices.shape))
    specs = pp_param_pspecs(
        params, fsdp_shards=axes.get(DATA_AXIS, 1) if fsdp else 1)
    placed = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs)
    return placed, specs


def pp_mlm_loss(
    params: dict,
    cfg: OmniBioTAConfig,
    tokens: jnp.ndarray,            # (M, B, T) microbatches, original ids
    segments: jnp.ndarray,          # (M, B, T)
    micro_weights: jnp.ndarray,     # (M,) activity weights (batch ramp)
    rng: jax.Array,
    mesh: Mesh,
    *,
    mask_prob: float = 0.15,
    deterministic: bool = False,
    capacity_frac: Optional[float] = None,
) -> Tuple[jnp.ndarray, dict]:
    """Pipelined masked-LM loss over all M microbatches in one pass.

    Semantics match the accumulation loop (training/train.py): per-micro
    CE normalised by that micro's masked count, activity-weighted mean.
    """
    if capacity_frac is None:
        from ..training.mlm import _default_capacity_frac
        capacity_frac = _default_capacity_frac(mask_prob)
    M, B, T = tokens.shape
    S = int(mesh.shape[STAGE_AXIS])
    n_data = int(dict(zip(mesh.axis_names, mesh.devices.shape))
                 .get(DATA_AXIS, 1))
    L = cfg.n_layer
    assert L % S == 0, f"n_layer {L} must divide by {S} pipeline stages"
    Ls = L // S
    cdt = cfg.cdtype()

    # --- GSPMD level: per-microbatch MLM mask + embedding ---------------
    # Key discipline mirrors mlm_loss/forward exactly (mlm.py:81,
    # omnibiota.py:242-245) so pp with the same per-micro rngs reproduces
    # the dp accumulation path's mask AND dropout streams bit-for-bit.
    # Static python loops, not vmap: the training default 'rbg' PRNG is
    # not vmap-invariant (vmapped split/fold_in draw a different stream
    # than their scalar application), and the dp path derives per-micro
    # keys in scalar context inside the accumulation scan.
    mb_rngs = jax.vmap(lambda i: jax.random.fold_in(rng, i))(jnp.arange(M))
    from ..models.omnibiota import _dropout
    mask_rows, x0_rows, lk_rows = [], [], []
    for j in range(M):
        rng_mask, rng_drop = jax.random.split(mb_rngs[j])
        mask_j = make_mlm_mask(rng_mask, tokens[j], mask_prob)
        x0_j = jnp.take(params["wte"], apply_mlm_mask(tokens[j], mask_j),
                        axis=0).astype(cdt)
        if not deterministic:
            rng_emb, rng_layers = jax.random.split(rng_drop)
            x0_j = _dropout(x0_j, cfg.dropout, rng_emb, False)
            layer_keys = jax.random.split(rng_layers, L)
            lk_rows.append(jax.random.key_data(layer_keys))
        mask_rows.append(mask_j)
        x0_rows.append(x0_j)
    mask = jnp.stack(mask_rows)                       # (M, B, T)
    x0 = jnp.stack(x0_rows)                           # (M, B, T, D)
    if not deterministic:
        lk_data = jnp.stack(lk_rows)                  # (M, L, key_words)
        key_impl = jax.random.key_impl(rng)
    else:
        lk_data = jnp.zeros((M, L, 1), jnp.uint32)
        key_impl = None

    cos, sin = rope_tables(cfg.head_dim, cfg.block_size, cfg.rope_theta)
    n_ticks = M + S - 1

    def body(blocks_local, ln_f, lm_head, x0, tokens, segments,
             mask, micro_weights, lk_data):
        s_idx = jax.lax.axis_index(STAGE_AXIS)
        # local batch rows under dp x pp: B_l = B // n_data
        B_l = x0.shape[1]

        def run_local(blocks, x, seg, mb_idx):
            for i in range(Ls):
                bp = jax.tree.map(lambda a: a[i], blocks)
                if deterministic:
                    rngs = {}
                else:
                    gl = s_idx * Ls + i     # global layer index
                    kd = jax.lax.dynamic_index_in_dim(
                        jax.lax.dynamic_index_in_dim(
                            lk_data, mb_idx, 0, keepdims=False),
                        gl, 0, keepdims=False)
                    key = jax.random.wrap_key_data(kd, impl=key_impl)
                    if n_data > 1:
                        # decorrelate in-block dropout across data shards
                        # (the same key on each shard's row slice would
                        # tie row i of every shard to the same mask)
                        key = jax.random.fold_in(
                            key, jax.lax.axis_index(DATA_AXIS))
                    ks = jax.random.split(key, 3)
                    rngs = {"attn": ks[0], "resid1": ks[1], "resid2": ks[2]}
                x = _block(cfg, x, bp, cos, sin, seg, rngs, deterministic)
            return x

        if cfg.checkpoint_freq > 0:
            # Honor the model's remat flag on the pipeline path too: the
            # scan's autodiff otherwise stores every layer's activations for
            # all M + S - 1 ticks per stage; remat keeps only each tick's
            # block INPUT and recomputes the Ls-layer slice in the backward
            # (~Ls x smaller residuals — same policy semantics as the dp
            # forward, models/omnibiota.py:316-319). Dropout keys re-derive
            # from lk_data deterministically, so recompute is bit-identical.
            policy = (jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                      if cfg.remat_policy == "dots" else None)
            run_local = jax.checkpoint(
                run_local, prevent_cse=False, policy=policy)

        def tick(buf, t):
            mb = jnp.clip(t - s_idx, 0, M - 1)
            x_first = jax.lax.dynamic_index_in_dim(x0, jnp.clip(t, 0, M - 1),
                                                   0, keepdims=False)
            x_in = jnp.where(s_idx == 0, x_first, buf)
            seg = jax.lax.dynamic_index_in_dim(segments, mb, 0,
                                               keepdims=False)
            h = run_local(blocks_local, x_in, seg, mb)
            perm = [(i, (i + 1) % S) for i in range(S)]
            buf_next = jax.lax.ppermute(h, STAGE_AXIS, perm)
            return buf_next, h

        buf0 = jnp.zeros((B_l, T, cfg.n_embd), cdt)
        _, outs = jax.lax.scan(tick, buf0, jnp.arange(n_ticks))
        # outs[S-1 + j] on the LAST stage is microbatch j's final hidden
        final_h = jax.lax.slice_in_dim(outs, S - 1, S - 1 + M, axis=0)

        # Readout + per-micro normalised CE. Under dp x pp each data shard
        # holds B/n_data rows of every micro: the per-micro masked count
        # and nll sum reduce over 'data' BEFORE normalising, keeping the
        # semantics identical to pure dp.
        scale = jnp.asarray(cfg.mup_output_mult / cfg.width_mult, cdt)
        head = lm_head.astype(cdt)
        cap = max(int(T * capacity_frac), 8)
        is_last_f = (s_idx == S - 1).astype(cdt)

        def micro_ce(emb_j, tok_j, mask_j):
            emb = _layer_norm(emb_j, ln_f)
            g_emb, labels, valid = _gather_masked(emb, tok_j, mask_j, cap)
            if cfg.fused_ce:
                # same memory protection as mlm_loss: never materialise the
                # (cap, V) fp32 logits (ADVICE r2: pp previously ignored it)
                from ..ops.fused_ce import fused_cross_entropy, pick_chunks
                nll = fused_cross_entropy(g_emb * scale, head, labels,
                                          pick_chunks(cfg.vocab_size))
            else:
                logits = (g_emb * scale) @ head
                logp = jax.nn.log_softmax(logits.astype(jnp.float32),
                                          axis=-1)
                nll = -jnp.take_along_axis(logp, labels[..., None],
                                           -1)[..., 0]
            nll_sum = jnp.sum(jnp.where(valid, nll, 0.0))
            mcount = jnp.sum(valid).astype(jnp.float32)
            if n_data > 1:
                nll_sum = jax.lax.psum(nll_sum, DATA_AXIS)
                mcount = jax.lax.psum(mcount, DATA_AXIS)
            return nll_sum, mcount

        loss_sum = jnp.float32(0)
        masked_sum = jnp.float32(0)
        if M % S == 0:
            # Head balance: only the last stage holds valid final hiddens,
            # so broadcast them once (psum of the masked tree rides the
            # stage ring) and let stage s compute the CE of its M/S
            # microbatch group — the readout leaves the critical path's
            # last stage instead of being wastefully replicated S times.
            G = M // S
            final_all = jax.lax.psum(final_h * is_last_f, STAGE_AXIS)
            for g in range(G):
                j = s_idx * G + g          # this stage's microbatch index
                emb_j = jax.lax.dynamic_index_in_dim(final_all, j, 0,
                                                     keepdims=False)
                tok_j = jax.lax.dynamic_index_in_dim(tokens, j, 0,
                                                     keepdims=False)
                mask_j = jax.lax.dynamic_index_in_dim(mask, j, 0,
                                                      keepdims=False)
                w = jax.lax.dynamic_index_in_dim(micro_weights, j, 0,
                                                 keepdims=False)
                nll_sum, mcount = micro_ce(emb_j, tok_j, mask_j)
                loss_sum += w * nll_sum / jnp.maximum(mcount, 1)
                masked_sum += w * mcount
            # stages hold disjoint groups: a plain psum combines them
            loss_sum = jax.lax.psum(loss_sum, STAGE_AXIS)
            masked_sum = jax.lax.psum(masked_sum, STAGE_AXIS)
        else:
            for j in range(M):
                nll_sum, mcount = micro_ce(final_h[j], tokens[j], mask[j])
                w = micro_weights[j]
                loss_sum += w * nll_sum / jnp.maximum(mcount, 1)
                masked_sum += w * mcount
            is_last = (s_idx == S - 1).astype(jnp.float32)
            loss_sum = jax.lax.psum(loss_sum * is_last, STAGE_AXIS)
            masked_sum = jax.lax.psum(masked_sum * is_last, STAGE_AXIS)
        return loss_sum, masked_sum

    blocks_spec = jax.tree.map(
        lambda a: P(STAGE_AXIS, *([None] * (a.ndim - 1))), params["blocks"])
    ln_f_spec = jax.tree.map(lambda a: P(), params["ln_f"])
    # dp x pp: rows (dim 1 of (M, B, T)) shard over 'data' when present
    row = DATA_AXIS if n_data > 1 else None
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(blocks_spec, ln_f_spec, P(),
                  P(None, row, None, None),       # x0 (M, B, T, D)
                  P(None, row, None),             # tokens
                  P(None, row, None),             # segments
                  P(None, row, None),             # mask
                  P(), P()),
        out_specs=(P(), P()),
        check_vma=False)
    loss_sum, masked_sum = fn(params["blocks"], params["ln_f"],
                              params["lm_head"], x0, tokens,
                              segments, mask, micro_weights, lk_data)
    n_active = jnp.maximum(jnp.sum(micro_weights), 1.0)
    active = micro_weights > 0
    n_tok = jnp.sum(jnp.where(active[:, None, None],
                              tokens != PAD_TOKEN, False))
    return loss_sum / n_active, {
        "masked_count": masked_sum,
        "num_tokens": n_tok.astype(jnp.int32),
    }
