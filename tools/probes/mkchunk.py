"""TPU: kv-chunked fused multi-kv backward at T=8192 — parity vs split
(incl. dropout stream) and perf A/B."""
import time
import numpy as np
import jax, jax.numpy as jnp

import omnibiote_tpu as obt
from omnibiote_tpu.ops import flash_attention as fa
from omnibiote_tpu.models.rope import rope_tables
from omnibiote_tpu.ops.segments import segment_ids_np

K = 8
rng = np.random.default_rng(0)
scale = 8.0 / 1024
key = jax.random.key(0, impl="rbg")
H, D = 8, 128
B, T = 1, 8192

toks = rng.integers(20, 65000, size=(B, T)).astype(np.int32)
for r in range(B):
    toks[r, rng.integers(32, T, size=5)] = obt.EOS_TOKEN
segs = jnp.asarray(segment_ids_np(toks))
q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.bfloat16)
rope = rope_tables(D, T, 10000.0)
FB = 4.5 / 2 * 4 * B * H * T * T * D

def grad_fn(drop):
    def f(x, kk):
        return jnp.sum(fa.flash_attention(
            x, x, x, segment_ids=segs, scale=scale, block_q=512,
            block_kv=512, rope=rope, dropout_rate=drop,
            dropout_rng=kk).astype(jnp.float32))
    return jax.jit(jax.grad(f))

for drop in (0.0, 0.1):
    fa.FUSED_MULTIKV_BWD = True
    g_f = grad_fn(drop)(q, key); jax.block_until_ready(g_f)
    gf = np.asarray(g_f.astype(jnp.float32))
    fa.FUSED_MULTIKV_BWD = False
    g_s = grad_fn(drop)(q, key)
    gs = np.asarray(g_s.astype(jnp.float32))
    err = np.abs(gf - gs).max()
    rel = err / (np.abs(gs).max() + 1e-9)
    print(f"T={T} drop={drop} chunked-fused vs split: max abs {err:.3e} "
          f"rel {rel:.3e}", flush=True)
    assert rel < 2e-2

def timeit(name, f, *args, n=6):
    f = jax.jit(f)
    out = f(*args); float(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    float(out)
    dt = (time.time() - t0) / n / K * 1e3
    print(f"{name:52s} {dt:7.3f} ms  -> {FB/dt/1e9:6.1f} TF", flush=True)

def chain_grad():
    def f(c, s, kk):
        def body(x, _):
            g = jax.grad(lambda y: jnp.sum(fa.flash_attention(
                y, y, y, segment_ids=s, scale=scale, block_q=512,
                block_kv=512, rope=rope, dropout_rate=0.1,
                dropout_rng=kk).astype(jnp.float32)))(x)
            return g, None
        out, _ = jax.lax.scan(body, c, None, length=K)
        return jnp.sum(out.astype(jnp.float32))
    return f

for fused in (False, True):
    fa.FUSED_MULTIKV_BWD = fused
    timeit(f"T={T} bq=512 bkv=512 chunked-fused={int(fused)} f+b",
           chain_grad(), q, segs, key)
