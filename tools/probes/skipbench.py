"""TPU bench: segment-skip on/off at ctx 1024/2048/4096, two segment regimes."""
import time
import numpy as np
import jax, jax.numpy as jnp

import omnibiote_tpu as obt
from omnibiote_tpu.ops.flash_attention import flash_attention
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

def segs_packed(B, T, mean_len):
    """Packed rows: segment lengths ~ clipped exponential(mean_len)."""
    seg = np.zeros((B, T), np.int32)
    for b in range(B):
        pos, s = 0, 0
        while pos < T:
            ln = max(16, int(rng.exponential(mean_len)))
            seg[b, pos:pos + ln] = s
            pos += ln; s += 1
    return jnp.asarray(seg)

def timeit(name, f, *args, flops=None, n=8):
    f = jax.jit(f)
    out = f(*args); float(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    float(out)
    dt = (time.time() - t0) / n / K * 1e3
    extra = f"  -> {flops/dt/1e9:6.1f} TF" if flops else ""
    print(f"{name:58s} {dt:7.3f} ms{extra}", flush=True)

def chain_grad(att):
    def f(c, s):
        def body(x, _):
            g = jax.grad(lambda y: jnp.sum(att(y, s).astype(jnp.float32)))(x)
            return g, None
        out, _ = jax.lax.scan(body, c, None, length=K)
        return jnp.sum(out.astype(jnp.float32))
    return f

H, D = 8, 128
for T, B in [(1024, 8), (2048, 4), (4096, 2)]:
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.bfloat16)
    FB = 3.5 * 4 * B * H * T * T * D / 2  # fwd 2 dots + bwd 7 dots = 4.5x... use 4.5/2
    FB = 4.5 / 2 * 4 * B * H * T * T * D
    for segname, segr in [("randeos5", segs_randeos(B, T, 5)),
                          ("packed400", segs_packed(B, T, 400))]:
        nseg = int(jnp.max(segr)) + 1
        for bq, bkv in [(512, 1024), (512, 512), (256, 256)]:
            if bkv > T or bq > T: continue
            for skip in (False, True):
                timeit(f"T={T} {segname} bq={bq} bkv={bkv} skip={int(skip)}",
                       chain_grad(lambda c, s, bq=bq, bkv=bkv, skip=skip:
                                  flash_attention(c, c, c, segment_ids=s,
                                                  scale=scale, block_q=bq,
                                                  block_kv=bkv,
                                                  segment_skip=skip)),
                       q, segr, flops=FB)
