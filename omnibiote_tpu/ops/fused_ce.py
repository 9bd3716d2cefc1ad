"""Vocab-chunked fused cross-entropy with a custom VJP.

The MLM head at vocab 65536 is the single largest per-step cost after flash
attention (replaces the reference's full-logits CE, train_encoder.py:301-305,
already reduced by masked-position compaction in training/mlm.py). A naive
`log_softmax(x @ W)` materialises the (N, V) logits in fp32 twice (forward
value + saved residual) — ~0.5 GB of HBM traffic per micro-batch at
N=2048, V=65536. Here:

  * forward: lax.scan over V/chunk weight slices, carrying the online
    softmax statistics (running max, sum-exp) and the label logit. Peak
    live logits: (N, chunk) fp32. The scan also keeps XLA from forming
    the full fp32 logits as a saved residual — only `lse` (N,) survives.
  * backward: second scan recomputing each chunk's logits from (x, W, lse),
    forming p = exp(logit - lse), subtracting the label one-hot, and
    accumulating dx and the per-chunk dW slices. Recompute costs one extra
    (N, D) x (D, V) matmul — cheaper than writing/reading 0.5 GB of
    residuals at TPU compute:bandwidth ratios.

All matmuls run on the MXU in the input dtype with fp32 accumulation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _chunk(W, c, size):
    return jax.lax.dynamic_slice_in_dim(W, c * size, size, axis=1)


def _fwd_scan(x, W, labels, n_chunks):
    """x: (..., D), labels: (...) — arbitrary leading dims so sharded batch
    axes pass through untouched (no reshape across a sharded axis; GSPMD
    keeps every op shard-local and inserts the dW all-reduce itself)."""
    Vc = W.shape[1] // n_chunks

    def body(carry, c):
        m, s, lab = carry
        logits = jnp.dot(x, _chunk(W, c, Vc).astype(x.dtype),
                         preferred_element_type=jnp.float32)  # (..., Vc)
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1))
        s = s * jnp.exp(m - m_new) + jnp.sum(
            jnp.exp(logits - m_new[..., None]), axis=-1)
        loc = labels - c * Vc
        in_chunk = (loc >= 0) & (loc < Vc)
        ll = jnp.take_along_axis(
            logits, jnp.clip(loc, 0, Vc - 1)[..., None], axis=-1)[..., 0]
        lab = jnp.where(in_chunk, ll, lab)
        return (m_new, s, lab), None

    # derive the init from x so the carries match x's type exactly (incl.
    # varying-axis metadata if ever traced under shard_map)
    zero = jnp.sum(x * 0.0, axis=-1, dtype=jnp.float32)       # (...,) zeros
    init = (zero - jnp.inf, zero, zero)
    (m, s, lab), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
    lse = m + jnp.log(s)
    return lse - lab, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_cross_entropy(x, W, labels, n_chunks: int):
    """Per-row -log softmax(x @ W)[labels]; x: (..., D), W: (D, V),
    labels: (...) int32. n_chunks must divide V."""
    assert W.shape[1] % n_chunks == 0, (
        f"n_chunks={n_chunks} must divide V={W.shape[1]}: a remainder "
        "would silently drop the vocab tail from the lse (wrong loss)")
    nll, _ = _fwd_scan(x, W, labels, n_chunks)
    return nll


def _fce_fwd(x, W, labels, n_chunks):
    nll, lse = _fwd_scan(x, W, labels, n_chunks)
    return nll, (x, W, labels, lse)


def _fce_bwd(n_chunks, res, g):
    x, W, labels, lse = res
    Vc = W.shape[1] // n_chunks
    batch_axes = tuple(range(x.ndim - 1))

    def body(dx, c):
        Wc = _chunk(W, c, Vc).astype(x.dtype)
        logits = jnp.dot(x, Wc, preferred_element_type=jnp.float32)
        p = jnp.exp(logits - lse[..., None])          # softmax chunk, fp32
        loc = labels - c * Vc
        in_chunk = (loc >= 0) & (loc < Vc)
        onehot = (jnp.clip(loc, 0, Vc - 1)[..., None] ==
                  jnp.arange(Vc)) & in_chunk[..., None]
        pg = (p - onehot.astype(jnp.float32)) * g[..., None]
        pg_l = pg.astype(x.dtype)
        # dWc = sum over all batch dims of x^T pg  -> (D, Vc)
        dWc = jax.lax.dot_general(
            x, pg_l, ((batch_axes, batch_axes), ((), ())),
            preferred_element_type=jnp.float32)
        dx = dx + jnp.dot(pg_l, Wc.T, preferred_element_type=jnp.float32)
        return dx, dWc

    dx0 = x.astype(jnp.float32) * 0.0   # zeros typed like x (see _fwd_scan)
    dx, dWs = jax.lax.scan(body, dx0, jnp.arange(n_chunks))
    dW = jnp.moveaxis(dWs, 0, 1).reshape(W.shape[0], n_chunks * Vc)
    return (dx.astype(x.dtype), dW.astype(W.dtype),
            np.zeros(labels.shape, jax.dtypes.float0))


fused_cross_entropy.defvjp(_fce_fwd, _fce_bwd)


def pick_chunks(vocab_size: int, target: int = 8192) -> int:
    """Largest chunk count giving chunks of ~target; 1 (single pass) for
    small vocabularies where chunking has nothing to save."""
    if vocab_size < 2 * target:
        return 1
    n = vocab_size // target
    while vocab_size % n:
        n -= 1
    return max(n, 1)
