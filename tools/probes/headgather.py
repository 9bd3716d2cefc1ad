"""A/B: take_along_axis vs one-hot-matmul for the MLM head compaction
gather (DESIGN.md §4d refgap row: "~4.7 ms is the searchsorted gather").

The compaction pulls (B, cap, D) rows out of (B, T, D) by integer index.
On TPU XLA lowers take_along_axis to a gather HLO that serializes on the
sequence axis; the alternative is a one-hot (B, cap, T) matmul against
the embeddings, which rides the MXU (17 GFLOP at the ref-default shapes
-- sub-0.1 ms at dense rates) and whose backward scatter is just the
transposed matmul.

Measures fwd and fwd+bwd (grad wrt emb) for both at the reference-default
micro shapes (B=8, T=2048, D=1024, cap=512) and the bench shapes
(B=16, T=1024, cap=256).

Run on the TPU: python tools/probes/headgather.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp


def gather_taa(emb, order):
    return jnp.take_along_axis(emb, order[:, :, None], axis=1)


def gather_onehot(emb, order):
    T = emb.shape[1]
    oh = (order[:, :, None] == jnp.arange(T, dtype=jnp.int32)[None, None, :]
          ).astype(emb.dtype)                      # (B, cap, T)
    return jnp.einsum("bct,btd->bcd", oh, emb)


def bench(fn, emb, order, steps=50, warmup=5):
    f = jax.jit(fn)
    g = jax.jit(jax.grad(lambda e, o: jnp.sum(fn(e, o).astype(jnp.float32))))
    for h, name in ((f, "fwd"), (g, "fwd+bwd")):
        out = h(emb, order)
        jax.block_until_ready(out)
        for _ in range(warmup):
            jax.block_until_ready(h(emb, order))
        t0 = time.perf_counter()
        for _ in range(steps):
            out = h(emb, order)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / steps * 1e3
        yield name, dt


def main():
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    for (B, T, D, cap) in ((8, 2048, 1024, 512), (16, 1024, 1024, 256)):
        emb = jnp.asarray(rng.standard_normal((B, T, D)), jnp.bfloat16)
        order = jnp.asarray(
            np.sort(rng.integers(0, T, size=(B, cap)), axis=-1), jnp.int32)
        print(f"-- B={B} T={T} D={D} cap={cap}")
        for impl, fn in (("take_along_axis", gather_taa),
                         ("one-hot matmul", gather_onehot)):
            for name, ms in bench(fn, emb, order):
                print(f"  {impl:16s} {name:8s} {ms:8.3f} ms")


if __name__ == "__main__":
    main()
