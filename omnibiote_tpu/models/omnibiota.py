"""OmniBioTA: bidirectional RoPE transformer encoder, TPU-native.

Functional re-design of the reference PyTorch module
(/root/reference/training/model.py). Parameters live in a plain pytree; the
layer stack is a single lax.scan over stacked block parameters (one compile,
weight-stationary), with optional rematerialisation. All linear weights are
stored (fan_in, fan_out) so the forward is `x @ W`; the torch converter
transposes.

Architecture (parity with reference):
  wte -> dropout -> N * [x + attn(ln1(x)); x + mlp(ln2(x))] -> ln_f
  * RoPE on q,k (fp32, adjacent-pair rotation)        model.py:39-61,108
  * fused qkv projection, no bias by default          model.py:79
  * µP attention scale 8/n_embd                       model.py:119
  * erf-GELU with the reference's 1.41421 constant    model.py:23-25
  * LayerNorm eps 1e-5, optional bias                 model.py:63-72
  * untied µP readout: logits = (x * output_mult / width_mult) @ W_head
                                                      model.py:208, mup.MuReadout
  * encode() pooling: mean | first | last | max | all model.py:256-278
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import OmniBioTAConfig
from ..ops.attention import attention
from .rope import rope_tables, qkv_col_perm


# --------------------------------------------------------------------------
# Initialisation (µP; see omnibiote_tpu/mup.py for the derivation)
# --------------------------------------------------------------------------

def _uniform(key, shape, bound, dtype):
    return jax.random.uniform(key, shape, dtype=jnp.float32,
                              minval=-bound, maxval=bound).astype(dtype)


def init_params(rng: jax.Array, cfg: OmniBioTAConfig) -> dict:
    """Initialise the parameter pytree.

    Matches torch defaults under mup.set_base_shapes (reference
    train_encoder.py:144-170):
      * Embedding: N(0, 1)                       (torch nn.Embedding default)
      * hidden Linear W: U(+-1/sqrt(fan_in))     (torch nn.Linear default;
        already the µP Theta(1/fan_in)-variance scaling for matrix-like params)
      * readout W: U(+-1/sqrt(fan_in)) * sqrt(width_mult)
        (mup.MuReadout._rescale_parameters multiplies by width_mult**0.5;
        the forward divides by width_mult)
      * LayerNorm: weight=1, bias=0
    """
    D = cfg.n_embd
    L = cfg.n_layer
    V = cfg.vocab_size
    pdt = cfg.pdtype()
    k_wte, k_head, k_blocks = jax.random.split(rng, 3)

    def init_block(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        b = 1.0 / (D ** 0.5)
        bm = 1.0 / ((4 * D) ** 0.5)
        p = {
            "ln1": {"scale": jnp.ones((D,), pdt)},
            "ln2": {"scale": jnp.ones((D,), pdt)},
            "attn": {
                "wqkv": _uniform(k1, (D, 3 * D), b, pdt),
                "wo": _uniform(k2, (D, D), b, pdt),
            },
            "mlp": {
                "wi": _uniform(k3, (D, 4 * D), b, pdt),
                "wo": _uniform(k4, (4 * D, D), bm, pdt),
            },
        }
        if cfg.bias:
            p["ln1"]["bias"] = jnp.zeros((D,), pdt)
            p["ln2"]["bias"] = jnp.zeros((D,), pdt)
            p["attn"]["bqkv"] = jnp.zeros((3 * D,), pdt)
            p["attn"]["bo"] = jnp.zeros((D,), pdt)
            p["mlp"]["bi"] = jnp.zeros((4 * D,), pdt)
            p["mlp"]["bo"] = jnp.zeros((D,), pdt)
        return p

    blocks = [init_block(k) for k in jax.random.split(k_blocks, L)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *blocks)

    head_bound = (1.0 / (D ** 0.5)) * (cfg.width_mult ** 0.5)
    params = {
        "wte": jax.random.normal(k_wte, (V, D), jnp.float32).astype(pdt),
        "blocks": stacked,
        "ln_f": {"scale": jnp.ones((D,), pdt)},
        "lm_head": _uniform(k_head, (D, V), head_bound, pdt),
    }
    if cfg.bias:
        params["ln_f"]["bias"] = jnp.zeros((D,), pdt)
    return params


def num_params(params: dict, non_embedding: bool = True) -> int:
    """Parameter count; non_embedding subtracts wte only (model.py:213-223)."""
    total = sum(int(x.size) for x in jax.tree.leaves(params))
    if non_embedding:
        total -= int(params["wte"].size)
    return total


# --------------------------------------------------------------------------
# Forward
# --------------------------------------------------------------------------

def _layer_norm(x, p, eps=1e-5):
    """LayerNorm with optional bias (reference model.py:63-72), fp32 stats."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def _gelu_erf(x):
    """x * 0.5 * (1 + erf(x / 1.41421)) — the reference's fused_gelu with its
    truncated sqrt(2) constant (model.py:23-25), kept for bit-parity."""
    xf = x.astype(jnp.float32)
    y = xf * 0.5 * (1.0 + jax.lax.erf(xf / 1.41421))
    return y.astype(x.dtype)


# Degree-7 (in u = x^2) weighted-LS fit of (Phi(x) - 0.5)/x on (0, 4], where
# Phi(x) = 0.5*(1 + erf(x/1.41421)) is the reference's Gaussian CDF. The full
# activation is reconstructed as x*(0.5 + x*P(x^2)) — odd-symmetric by
# construction — and clamped to the asymptotes outside |x| <= 4. Max abs
# error vs exact erf-GELU: 1.27e-4 (value), 2.6e-3 (derivative, at the +-4
# clamp seam); both are below bf16 resolution at activation scale. Fit:
# 8000 Chebyshev nodes, weight u (minimises the x^2-amplified value error).
_GELU_POLY = (
    3.9867681269e-01, -6.5885546573e-02, 9.5017678048e-03, -1.0051514547e-03,
    7.4631021951e-05, -3.6379394711e-06, 1.0337561212e-07, -1.2874154492e-09,
)
_GELU_CUT = 4.0


def _gelu_fast(x):
    """Polynomial erf-GELU: identical function as _gelu_erf to 1.3e-4 abs,
    ~3x fewer VPU ops, and a transcendental-free autodiff backward (the exact
    erf backward needs exp(-x^2/2)). Selected by cfg.gelu (config.py)."""
    xf = x.astype(jnp.float32)
    # Horner on the CLAMPED input: evaluating the degree-14 polynomial on
    # raw xf overflows to inf past |x| ~ 3e3, and even though jnp.where
    # discards that branch's VALUE, its autodiff backward multiplies the
    # branch gradient by 0 — 0 * inf = NaN — so one extreme pre-GELU
    # activation would poison the whole gradient tree. Inside the cut
    # region xc == xf, so values and gradients there are unchanged. The
    # clamp is where-based, not jnp.clip: clip's max/min backward splits
    # the gradient 0.5/0.5 at an exact |x| == CUT tie, which would halve
    # the derivative at the seam.
    xc = jnp.where(xf > _GELU_CUT, _GELU_CUT,
                   jnp.where(xf < -_GELU_CUT, -_GELU_CUT, xf))
    u = xc * xc
    p = jnp.float32(_GELU_POLY[-1])
    for c in _GELU_POLY[-2::-1]:
        p = p * u + jnp.float32(c)
    y = xc * (0.5 + xc * p)
    y = jnp.where(xf > _GELU_CUT, xf, y)
    y = jnp.where(xf < -_GELU_CUT, 0.0, y)
    return y.astype(x.dtype)


def _gelu(x, cfg):
    # 'auto' resolves to the exact erf activation: on-chip A/Bs at the
    # production config measured the polynomial no faster (erf 141.5k vs
    # fast 141.1k tok/s, tools/probes/gelubench.py; both headline bench.py
    # A/Bs agree) — the erf VPU cost hides behind the MXU at these shapes.
    # 'fast' stays available for VPU-bound configs (DESIGN.md §6).
    mode = cfg.gelu
    if mode == "auto":
        mode = "erf"
    return _gelu_fast(x) if mode == "fast" else _gelu_erf(x)


def _dropout(x, rate, rng, deterministic):
    """Inverted dropout from raw PRNG bits: keep iff bits >= rate * 2^32,
    the same threshold convention as the flash kernel's in-kernel dropout
    (ops/flash_attention.py:_dropout_keep). Skipping bernoulli's uint->fp32
    uniform conversion saves ~2% of the train step at dropout 0.1."""
    if deterministic or rate == 0.0:
        return x
    bits = jax.random.bits(rng, x.shape, dtype=jnp.uint32)
    thresh = jnp.uint32(min(int(rate * (2.0 ** 32)), 2 ** 32 - 1))
    return jnp.where(bits >= thresh, x / (1.0 - rate), jnp.zeros_like(x))


def _linear(x, w, b=None, compute_dtype=None):
    from ..ops.quant import QuantizedWeight, quant_linear
    if isinstance(w, QuantizedWeight):
        # int8 serving path (ops/quant.py): int8 x int8 -> int32 on the MXU
        return quant_linear(x, w, b)
    w = w.astype(x.dtype) if compute_dtype is None else w.astype(compute_dtype)
    y = x @ w
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def _block(cfg: OmniBioTAConfig, x, bp, cos, sin, segment_ids, rngs,
           deterministic, ring_mesh=None, ring_axis="data",
           ring_batch_axis=None, tp_mesh=None,
           tp_axis="model"):
    B, T, D = x.shape
    H, Dh = cfg.n_head, cfg.head_dim

    # --- attention (reference SelfAttention, model.py:74-152) ---
    h = _layer_norm(x, bp["ln1"])
    # Fold RoPE's pair de-interleave into the q/k projection columns: a
    # shared head_dim permutation of q and k leaves attention exactly
    # invariant, and rotate-half on contiguous halves avoids the strided
    # even/odd lane access of the complex-pair formulation (models/rope.py).
    wqkv = bp["attn"]["wqkv"]
    bqkv = bp["attn"].get("bqkv")
    if not cfg.qkv_prepermuted:
        col_perm = qkv_col_perm(H, Dh)
        wq = jnp.take(wqkv[:, :D], col_perm, axis=1)
        wk = jnp.take(wqkv[:, D:2 * D], col_perm, axis=1)
        wqkv = jnp.concatenate([wq, wk, wqkv[:, 2 * D:]], axis=1)
        if bqkv is not None:
            bq = jnp.take(bqkv[:D], col_perm)
            bk = jnp.take(bqkv[D:2 * D], col_perm)
            bqkv = jnp.concatenate([bq, bk, bqkv[2 * D:]])
    qkv = _linear(h, wqkv, bqkv)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, T, H, Dh)
    k = k.reshape(B, T, H, Dh)
    v = v.reshape(B, T, H, Dh)

    attn_rng = None
    if not deterministic and cfg.dropout > 0.0:
        attn_rng = rngs["attn"]
    # RoPE is owned by the attention dispatch: fused into the flash kernels
    # (rotation recomputed in fwd+bwd, never written to HBM) or applied as
    # apply_rope_half for the fallback paths.
    y = attention(
        q, k, v,
        scale=cfg.attn_scale,
        segment_ids=segment_ids,
        # composed with the segment mask by the dense path; the kernel
        # paths assert rather than silently run bidirectional (r4 review)
        causal=cfg.autoregressive,
        dropout_rate=0.0 if deterministic else cfg.dropout,
        dropout_rng=attn_rng,
        impl=cfg.attn_impl,
        rope=(cos, sin),
        ring_mesh=ring_mesh,
        ring_axis=ring_axis,
        ring_batch_axis=ring_batch_axis,
        tp_mesh=tp_mesh,
        tp_axis=tp_axis,
        int8=cfg.attn_int8 and deterministic,
    )
    y = y.reshape(B, T, D)
    y = _linear(y, bp["attn"]["wo"], bp["attn"].get("bo"))
    y = _dropout(y, cfg.dropout, rngs.get("resid1"), deterministic)
    x = x + y

    # --- MLP (reference MLP, model.py:154-168) ---
    h = _layer_norm(x, bp["ln2"])
    h = _linear(h, bp["mlp"]["wi"], bp["mlp"].get("bi"))
    h = _gelu(h, cfg)
    h = _linear(h, bp["mlp"]["wo"], bp["mlp"].get("bo"))
    h = _dropout(h, cfg.dropout, rngs.get("resid2"), deterministic)
    return x + h


def forward(
    params: dict,
    cfg: OmniBioTAConfig,
    idx: jnp.ndarray,                       # (B, T) int32 token ids
    segment_ids: Optional[jnp.ndarray] = None,  # (B, T) int32; None = dense
    *,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
    return_embeddings: bool = False,
    ring_mesh=None,
    ring_axis: str = "data",
    ring_batch_axis=None,
    tp_mesh=None,
    tp_axis: str = "model",
) -> jnp.ndarray:
    """Forward pass (reference model.py:225-254).

    Returns logits (B, T, V) or, with return_embeddings, the final-LN hidden
    states (B, T, D).

    Sequence parallelism: with cfg.attn_impl='ring' (plus ring_mesh /
    ring_axis), shard the T dimension of idx/segment_ids over the mesh axis;
    attention rotates KV around the ring while every other op is
    position-local and shards trivially under GSPMD. RoPE uses global
    positions because the model is written in the global view.
    """
    B, T = idx.shape
    assert T <= cfg.block_size, (
        f"Cannot forward sequence of length {T}, block size is only {cfg.block_size}")
    cdt = cfg.cdtype()

    x = jnp.take(params["wte"], idx, axis=0).astype(cdt)
    if not deterministic:
        if rng is None:
            raise ValueError("training forward requires rng")
        rng_emb, rng_layers = jax.random.split(rng)
        x = _dropout(x, cfg.dropout, rng_emb, deterministic)
        layer_rngs = jax.random.split(rng_layers, cfg.n_layer)
    else:
        layer_rngs = jnp.zeros((cfg.n_layer, 2), dtype=jnp.uint32)

    cos, sin = rope_tables(cfg.head_dim, cfg.block_size, cfg.rope_theta)

    def body(carry, scanned):
        bp, lrng = scanned
        if deterministic:
            rngs = {}
        else:
            ks = jax.random.split(lrng, 3)
            rngs = {"attn": ks[0], "resid1": ks[1], "resid2": ks[2]}
        out = _block(cfg, carry, bp, cos, sin, segment_ids, rngs,
                     deterministic, ring_mesh, ring_axis, ring_batch_axis,
                     tp_mesh, tp_axis)
        return out, None

    if cfg.checkpoint_freq > 0:
        policy = (jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                  if cfg.remat_policy == "dots" else None)
        body = jax.checkpoint(body, prevent_cse=False, policy=policy)

    if cfg.scan_layers:
        x, _ = jax.lax.scan(body, x, (params["blocks"], layer_rngs))
    else:
        for i in range(cfg.n_layer):
            bp_i = jax.tree.map(lambda a: a[i], params["blocks"])
            x, _ = body(x, (bp_i, layer_rngs[i]))
    emb = _layer_norm(x, params["ln_f"])

    if return_embeddings:
        return emb
    # µP readout (mup.MuReadout): scale input by output_mult / width_mult.
    scale = jnp.asarray(cfg.mup_output_mult / cfg.width_mult, dtype=cdt)
    logits = _linear(emb * scale, params["lm_head"])
    return logits


def encode(params: dict, cfg: OmniBioTAConfig, idx: jnp.ndarray,
           method: str = "mean") -> jnp.ndarray:
    """Pooled sequence embeddings — the public API (reference model.py:256-278).

    Note: like the reference, no attention mask is applied, so packed/padded
    inputs are mutually visible here.
    """
    assert method in ("mean", "first", "last", "max", "all"), (
        f"Unknown pooling method {method}")
    emb = forward(params, cfg, idx, segment_ids=None,
                  deterministic=True, return_embeddings=True)
    if method == "mean":
        return emb.mean(axis=1)
    if method == "first":
        return emb[:, 0]
    if method == "last":
        return emb[:, -1]
    if method == "max":
        return emb.max(axis=1)
    return emb
