"""TPU: forward-only block sweep at T=2048/4096 — is a single-kv (or
wider) forward worth decoupling fwd/bwd block sizes?"""
import time
import numpy as np
import jax, jax.numpy as jnp

import omnibiote_tpu as obt
from omnibiote_tpu.ops import flash_attention as fa
from omnibiote_tpu.models.rope import rope_tables
from omnibiote_tpu.ops.segments import segment_ids_np

K = 24
rng = np.random.default_rng(0)
scale = 8.0 / 1024
key = jax.random.key(0, impl="rbg")
H, D = 8, 128

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
        print(f"{name:56s} FAIL {type(e).__name__}: {str(e)[:70]}", flush=True)
        return
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    float(out)
    dt = (time.time() - t0) / n / K * 1e3
    extra = f"  -> {flops/dt/1e9:6.1f} TF" if flops else ""
    print(f"{name:56s} {dt:7.3f} ms{extra}", flush=True)

def chain_fwd(att):
    def f(c, s, kk):
        def body(x, _):
            return att(x, s, kk).astype(jnp.bfloat16), None
        out, _ = jax.lax.scan(body, c, None, length=K)
        return jnp.sum(out.astype(jnp.float32))
    return f

for T, B in [(2048, 4), (4096, 2)]:
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.bfloat16)
    segs = segs_randeos(B, T, 5)
    rope = rope_tables(D, T, 10000.0)
    FW = 2 / 2 * 4 * B * H * T * T * D
    cfgs = [(512, 512), (512, 1024), (512, 2048)]
    if T == 4096:
        cfgs += [(512, 4096)]
    for bq, bkv in cfgs:
        timeit(f"T={T} fwd-only bq={bq} bkv={bkv} drop=0.1",
               chain_fwd(lambda c, s, kk, bq=bq, bkv=bkv, rope=rope:
                         fa.flash_attention(
                             c, c, c, segment_ids=s, scale=scale,
                             block_q=bq, block_kv=bkv, rope=rope,
                             dropout_rate=0.1, dropout_rng=kk)),
               q, segs, key, flops=FW)
