"""A/B: the full _masked_order + gather chain vs a one-shot one-hot
compaction (no searchsorted) at the ref-default head shapes.

P[b, j, t] = (cumsum(mask)[b, t] == j+1) -- exactly one t per (b, j)
row when slot j is valid (cumsum is monotone and mask forces the hit
onto the masked position itself when intersected with mask). order,
labels, and the embedding gather all become contractions against P,
which the MXU eats; searchsorted's log2(T) serial gather rounds
disappear.

Run on the TPU: python tools/probes/headgather2.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp

from omnibiote_tpu.training.mlm import _gather_masked


def compact_onehot(emb, tokens, mask, capacity):
    B, T = mask.shape
    cs = jnp.cumsum(mask.astype(jnp.int32), axis=-1)          # (B, T)
    targets = jnp.arange(1, capacity + 1, dtype=jnp.int32)    # (cap,)
    hit = (cs[:, None, :] == targets[None, :, None]) & mask[:, None, :]
    p = hit.astype(emb.dtype)                                 # (B, cap, T)
    gathered = jnp.einsum("bct,btd->bcd", p, emb)
    labels = jnp.einsum("bct,bt->bc", p.astype(jnp.float32),
                        tokens.astype(jnp.float32)).astype(jnp.int32)
    valid = targets[None, :] <= cs[:, -1:]
    return gathered, labels, valid


def bench(fn, emb, tokens, mask, cap, steps=50, warmup=5):
    f = jax.jit(lambda e: fn(e, tokens, mask, cap))
    g = jax.jit(jax.grad(
        lambda e: jnp.sum(fn(e, tokens, mask, cap)[0].astype(jnp.float32))))
    for h, name in ((f, "fwd"), (g, "fwd+bwd")):
        out = h(emb)
        jax.block_until_ready(out)
        for _ in range(warmup):
            jax.block_until_ready(h(emb))
        t0 = time.perf_counter()
        for _ in range(steps):
            out = h(emb)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / steps * 1e3
        yield name, dt


def main():
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    for (B, T, D, cap) in ((8, 2048, 1024, 512), (16, 1024, 1024, 256)):
        emb = jnp.asarray(rng.standard_normal((B, T, D)), jnp.bfloat16)
        tokens = jnp.asarray(rng.integers(0, 2 ** 16, (B, T)), jnp.int32)
        mask = jnp.asarray(rng.random((B, T)) < 0.15)
        # correctness first
        g0, l0, v0 = jax.jit(lambda e: _gather_masked(e, tokens, mask, cap)
                             )(emb)
        g1, l1, v1 = jax.jit(lambda e: compact_onehot(e, tokens, mask, cap)
                             )(emb)
        ok = (bool(jnp.all(v0 == v1))
              and bool(jnp.all(jnp.where(v0, l0, 0) == jnp.where(v1, l1, 0)))
              and bool(jnp.all(jnp.where(v0[..., None], g0, 0)
                               == jnp.where(v1[..., None], g1, 0))))
        print(f"-- B={B} T={T} D={D} cap={cap}  parity={'OK' if ok else 'FAIL'}")
        for impl, fn in (("searchsorted+taa", _gather_masked),
                         ("one-hot one-shot", compact_onehot)):
            for name, ms in bench(fn, emb, tokens, mask, cap):
                print(f"  {impl:17s} {name:8s} {ms:8.3f} ms")


if __name__ == "__main__":
    main()
