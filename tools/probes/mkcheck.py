"""TPU: fused multi-kv backward — parity (vs split) and perf A/B at
T=2048/4096, bench segment regime (5 EOS), dropout on and off."""
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

def segs_randeos(B, T, n_eos):
    toks = rng.integers(20, 65000, size=(B, T)).astype(np.int32)
    for r in range(B):
        toks[r, rng.integers(32, T, size=n_eos)] = obt.EOS_TOKEN
    return jnp.asarray(segment_ids_np(toks))

def grad_fn(bq, bkv, drop, rope, segs):
    def f(x, kk):
        return jnp.sum(fa.flash_attention(
            x, x, x, segment_ids=segs, scale=scale, block_q=bq,
            block_kv=bkv, rope=rope, dropout_rate=drop,
            dropout_rng=kk).astype(jnp.float32))
    return jax.jit(jax.grad(f))

def timeit(name, f, *args, flops=None, n=8):
    f = jax.jit(f)
    out = f(*args); float(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    float(out)
    dt = (time.time() - t0) / n / K * 1e3
    extra = f"  -> {flops/dt/1e9:6.1f} TF" if flops else ""
    print(f"{name:56s} {dt:7.3f} ms{extra}", flush=True)

def chain_grad(att):
    def f(c, s, kk):
        def body(x, _):
            g = jax.grad(lambda y: jnp.sum(att(y, s, kk).astype(jnp.float32)))(x)
            return g, None
        out, _ = jax.lax.scan(body, c, None, length=K)
        return jnp.sum(out.astype(jnp.float32))
    return f

# ---- parity: fused-mk vs split, exact same inputs --------------------------
for T, B in [(2048, 4), (4096, 2)]:
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.bfloat16)
    segs = segs_randeos(B, T, 5)
    rope = rope_tables(D, T, 10000.0)
    for drop in (0.0, 0.1):
        fa.FUSED_MULTIKV_BWD = True
        g_f = grad_fn(512, 1024, drop, rope, segs)(q, key)
        jax.block_until_ready(g_f)
        fa.FUSED_MULTIKV_BWD = False
        g_s = grad_fn(512, 1024, drop, rope, segs)(q, key)
        err = float(jnp.max(jnp.abs(g_f.astype(jnp.float32)
                                    - g_s.astype(jnp.float32))))
        rel = err / (float(jnp.max(jnp.abs(g_s.astype(jnp.float32)))) + 1e-9)
        print(f"T={T} drop={drop} parity fused-mk vs split: max abs "
              f"{err:.3e} rel {rel:.3e}", flush=True)
        assert rel < 2e-2, "fused-mk backward diverges from split"

# ---- perf ------------------------------------------------------------------
for T, B in [(2048, 4), (4096, 2)]:
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.bfloat16)
    segs = segs_randeos(B, T, 5)
    rope = rope_tables(D, T, 10000.0)
    FB = 4.5 / 2 * 4 * B * H * T * T * D
    for bq, bkv in [(512, 1024), (512, 512), (256, 512), (512, 2048)]:
        if bkv >= T:
            continue
        for fused in (False, True):
            fa.FUSED_MULTIKV_BWD = fused
            timeit(f"T={T} bq={bq} bkv={bkv} fusedmk={int(fused)} f+b",
                   chain_grad(lambda c, s, kk, bq=bq, bkv=bkv, rope=rope:
                              fa.flash_attention(
                                  c, c, c, segment_ids=s, scale=scale,
                                  block_q=bq, block_kv=bkv, rope=rope,
                                  dropout_rate=0.1, dropout_rng=kk)),
                   q, segs, key, flops=FB)
