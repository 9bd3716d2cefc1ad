"""TPU A/B: fused vs split single-kv backward at identical blocking."""
import time
import numpy as np
import jax, jax.numpy as jnp
import omnibiote_tpu as obt
from omnibiote_tpu.ops import flash_attention as fa
from omnibiote_tpu.models.rope import rope_tables
from omnibiote_tpu.ops.segments import segment_ids_np

B, T, H, D = 16, 1024, 8, 128
K = 16
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.bfloat16)
toks = rng.integers(20, 65000, size=(B, T)).astype(np.int32)
for r in range(B):
    toks[r, rng.integers(32, T, size=3)] = obt.EOS_TOKEN
segs = jnp.asarray(segment_ids_np(toks))
scale = 8.0 / 1024
rope = rope_tables(D, T, 10000.0)
key = jax.random.key(0, impl="rbg")
FB = 4.5 / 2 * 4 * B * H * T * T * D

def timeit(name, f, *args, n=8):
    f = jax.jit(f)
    out = f(*args); float(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    float(out)
    dt = (time.time() - t0) / n / K * 1e3
    print(f"{name:46s} {dt:7.3f} ms  -> {FB/dt/1e9:6.1f} TF", flush=True)

def chain_grad(att):
    def f(c, s, kk):
        def body(x, _):
            g = jax.grad(lambda y: jnp.sum(att(y, s, kk).astype(jnp.float32)))(x)
            return g, None
        out, _ = jax.lax.scan(body, c, None, length=K)
        return jnp.sum(out.astype(jnp.float32))
    return f

for fused in (True, False):
    fa.FUSED_SINGLE_KV_BWD = fused
    for drop in (0.0, 0.1):
        timeit(f"f+b single-kv fused={int(fused)} drop={drop}",
               chain_grad(lambda c, s, kk, drop=drop: fa.flash_attention(
                   c, c, c, segment_ids=s, scale=scale, block_q=512,
                   block_kv=1024, rope=rope, dropout_rate=drop,
                   dropout_rng=kk)), q, segs, key)
