"""TPU: T=1024 (headline shape, B=16): single-kv fused (512,1024) vs
multi-kv fused (512,512) — which backward wins at the bench shape?"""
import time
import numpy as np
import jax, jax.numpy as jnp

import omnibiote_tpu as obt
from omnibiote_tpu.ops import flash_attention as fa
from omnibiote_tpu.models.rope import rope_tables
from omnibiote_tpu.ops.segments import segment_ids_np

K = 16
rng = np.random.default_rng(0)
scale = 8.0 / 1024
key = jax.random.key(0, impl="rbg")
H, D = 8, 128
B, T = 16, 1024

toks = rng.integers(20, 65000, size=(B, T)).astype(np.int32)
for r in range(B):
    toks[r, rng.integers(32, T, size=3)] = obt.EOS_TOKEN
segs = jnp.asarray(segment_ids_np(toks))
q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.bfloat16)
rope = rope_tables(D, T, 10000.0)
FB = 4.5 / 2 * 4 * B * H * T * T * D

def timeit(name, f, *args, n=8):
    f = jax.jit(f)
    out = f(*args); float(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    float(out)
    dt = (time.time() - t0) / n / K * 1e3
    print(f"{name:56s} {dt:7.3f} ms  -> {FB/dt/1e9:6.1f} TF", flush=True)

def chain_grad(att):
    def f(c, s, kk):
        def body(x, _):
            g = jax.grad(lambda y: jnp.sum(att(y, s, kk).astype(jnp.float32)))(x)
            return g, None
        out, _ = jax.lax.scan(body, c, None, length=K)
        return jnp.sum(out.astype(jnp.float32))
    return f

for bq, bkv, label in [(512, 1024, "single-kv fused"),
                       (512, 512, "multi-kv fused"),
                       (256, 512, "multi-kv fused"),
                       (512, 256, "multi-kv fused"),
                       (1024, 1024, "single-kv bq1024")]:
    timeit(f"T=1024 B=16 bq={bq} bkv={bkv} ({label}) drop=0.1 f+b",
           chain_grad(lambda c, s, kk, bq=bq, bkv=bkv: fa.flash_attention(
               c, c, c, segment_ids=s, scale=scale, block_q=bq,
               block_kv=bkv, rope=rope, dropout_rate=0.1, dropout_rng=kk)),
           q, segs, key)
