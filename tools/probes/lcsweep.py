"""TPU bench: long-context block-size sweep — does a single-KV-block config
(fused 5-dot backward) beat the default 512x1024 two-pass at T=2048/4096?
Mirrors the training path: rope fused, dropout 0.1, randeos segments."""
import time
import numpy as np
import jax, jax.numpy as jnp

import omnibiote_tpu as obt
from omnibiote_tpu.ops.flash_attention import flash_attention
from omnibiote_tpu.models.rope import rope_tables
from omnibiote_tpu.ops.segments import segment_ids_np

K = 16
rng = np.random.default_rng(0)
scale = 8.0 / 1024
key = jax.random.key(0, impl="rbg")

def segs_randeos(B, T, n_eos):
    toks = rng.integers(20, 65000, size=(B, T)).astype(np.int32)
    for r in range(B):
        toks[r, rng.integers(32, T, size=n_eos)] = obt.EOS_TOKEN
    return jnp.asarray(segment_ids_np(toks))

def timeit(name, f, *args, flops=None, n=8):
    f = jax.jit(f)
    try:
        out = f(*args); float(out)
    except Exception as e:
        print(f"{name:58s} FAIL {type(e).__name__}: {str(e)[:90]}", flush=True)
        return
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    float(out)
    dt = (time.time() - t0) / n / K * 1e3
    extra = f"  -> {flops/dt/1e9:6.1f} TF" if flops else ""
    print(f"{name:58s} {dt:7.3f} ms{extra}", flush=True)

def chain_grad(att):
    def f(c, s, kk):
        def body(x, _):
            g = jax.grad(lambda y: jnp.sum(att(y, s, kk).astype(jnp.float32)))(x)
            return g, None
        out, _ = jax.lax.scan(body, c, None, length=K)
        return jnp.sum(out.astype(jnp.float32))
    return f

H, D = 8, 128
for T, B, n_eos in [(2048, 4, 5), (4096, 2, 5)]:
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.bfloat16)
    segs = segs_randeos(B, T, n_eos)
    rope = rope_tables(D, T, 10000.0)
    FB = 4.5 / 2 * 4 * B * H * T * T * D
    cfgs = [(512, 1024), (512, 2048), (1024, 2048), (512, 512),
            (256, 512), (256, 256), (256, 1024)]
    for bq, bkv in cfgs:
        if bkv > T:
            continue
        for drop in (0.1,):
            timeit(
                f"T={T} bq={bq} bkv={bkv} drop={drop} f+b",
                chain_grad(lambda c, s, kk, bq=bq, bkv=bkv, drop=drop,
                           rope=rope: flash_attention(
                               c, c, c, segment_ids=s, scale=scale,
                               block_q=bq, block_kv=bkv, rope=rope,
                               dropout_rate=drop, dropout_rng=kk)),
                q, segs, key, flops=FB)
