"""TPU bench: old per-head kernel vs multi-head kernel (fwd and fwd+bwd)."""
import time
import numpy as np
import jax, jax.numpy as jnp

import omnibiote_tpu as obt
from omnibiote_tpu.ops.flash_attention import flash_attention
from omnibiote_tpu.models.rope import rope_tables, apply_rope_half
from omnibiote_tpu.ops.segments import segment_ids_np

B, T, H, D = 8, 1024, 8, 128
K = 32
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.bfloat16)
toks = rng.integers(20, 65000, size=(B, T)).astype(np.int32)
for r in range(B):
    toks[r, rng.integers(32, T, size=3)] = obt.EOS_TOKEN
segs = jnp.asarray(segment_ids_np(toks))
scale = 8.0 / 1024
cos, sin = rope_tables(D, T, 10000.0)
FWD_FLOPS = 4 * B * H * T * T * D
key = jax.random.key(0, impl="rbg")

def timeit(name, f, *args, flops=None, n=10):
    f = jax.jit(f)
    out = f(*args); float(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    float(out)
    dt = (time.time() - t0) / n / K * 1e3
    extra = f"  -> {flops/dt/1e9:6.1f} TF ({flops/dt/1e9/197*100:4.1f}%)" if flops else ""
    print(f"{name:46s} {dt:7.3f} ms{extra}", flush=True)

def chain(att):
    def f(q, segs):
        def body(c, _):
            return att(c, segs), None
        out, _ = jax.lax.scan(body, q, None, length=K)
        return jnp.sum(out.astype(jnp.float32))
    return f

def chain_grad(att):
    def f(q, segs):
        def body(c, _):
            g = jax.grad(lambda x: jnp.sum(att(x, segs).astype(jnp.float32)))(c)
            return g, None
        out, _ = jax.lax.scan(body, q, None, length=K)
        return jnp.sum(out.astype(jnp.float32))
    return f

for bq, bkv in [(512, 1024), (512, 512), (256, 512), (256, 1024)]:
    timeit(f"old fwd bq={bq} bkv={bkv}",
           chain(lambda c, s, bq=bq, bkv=bkv: flash_attention(
               c, c, c, segment_ids=s, scale=scale, block_q=bq, block_kv=bkv,
               multi_head=False)), q, segs, flops=FWD_FLOPS)

for bq, bkv in [(512, 1024), (512, 512), (256, 512), (256, 1024), (256, 256)]:
    timeit(f"mh  fwd bq={bq} bkv={bkv}",
           chain(lambda c, s, bq=bq, bkv=bkv: flash_attention(
               c, c, c, segment_ids=s, scale=scale, block_q=bq, block_kv=bkv)),
           q, segs, flops=FWD_FLOPS)

for bq, bkv in [(512, 512), (256, 512)]:
    timeit(f"mh  fwd+rope bq={bq} bkv={bkv}",
           chain(lambda c, s, bq=bq, bkv=bkv: flash_attention(
               c, c, c, segment_ids=s, scale=scale, block_q=bq, block_kv=bkv,
               rope=(cos, sin))), q, segs, flops=FWD_FLOPS)

# fwd+bwd (3.5x fwd flops nominal: fwd 2 + bwd 5 matmuls = 7 vs 2)
for bq, bkv in [(512, 1024), (512, 512), (256, 512)]:
    timeit(f"old f+b bq={bq} bkv={bkv}",
           chain_grad(lambda c, s, bq=bq, bkv=bkv: flash_attention(
               c, c, c, segment_ids=s, scale=scale, block_q=bq, block_kv=bkv,
               multi_head=False)), q, segs, flops=FWD_FLOPS * 7 // 2, n=5)
for bq, bkv in [(512, 1024), (512, 512), (256, 512), (256, 256)]:
    timeit(f"mh  f+b bq={bq} bkv={bkv}",
           chain_grad(lambda c, s, bq=bq, bkv=bkv: flash_attention(
               c, c, c, segment_ids=s, scale=scale, block_q=bq, block_kv=bkv)),
           q, segs, flops=FWD_FLOPS * 7 // 2, n=5)
for bq, bkv in [(512, 512), (256, 512)]:
    timeit(f"mh  f+b+rope bq={bq} bkv={bkv}",
           chain_grad(lambda c, s, bq=bq, bkv=bkv: flash_attention(
               c, c, c, segment_ids=s, scale=scale, block_q=bq, block_kv=bkv,
               rope=(cos, sin))), q, segs, flops=FWD_FLOPS * 7 // 2, n=5)

# rope outside for comparison
def old_rope(c, s):
    qr, kr = apply_rope_half(c, c, cos, sin)
    return flash_attention(qr, kr, c, segment_ids=s, scale=scale,
                           block_q=512, block_kv=512)
timeit("mh fwd, rope OUTSIDE bq=512 bkv=512", chain(old_rope), q, segs,
       flops=FWD_FLOPS)

for bq, bkv in [(512, 1024), (256, 1024)]:
    timeit(f"mh  fwd+rope bq={bq} bkv={bkv}",
           chain(lambda c, s, bq=bq, bkv=bkv: flash_attention(
               c, c, c, segment_ids=s, scale=scale, block_q=bq, block_kv=bkv,
               rope=(cos, sin))), q, segs, flops=FWD_FLOPS)
    timeit(f"mh  f+b+rope bq={bq} bkv={bkv}",
           chain_grad(lambda c, s, bq=bq, bkv=bkv: flash_attention(
               c, c, c, segment_ids=s, scale=scale, block_q=bq, block_kv=bkv,
               rope=(cos, sin))), q, segs, flops=FWD_FLOPS * 7 // 2, n=5)

print("--- large blocks ---")
for bq, bkv in [(1024, 1024), (512, 1024)]:
    timeit(f"mh fwd+rope bq={bq} bkv={bkv}",
           chain(lambda c, s, bq=bq, bkv=bkv: flash_attention(
               c, c, c, segment_ids=s, scale=scale, block_q=bq, block_kv=bkv,
               rope=(cos, sin))), q, segs, flops=FWD_FLOPS)
    timeit(f"mh f+b+rope bq={bq} bkv={bkv}",
           chain_grad(lambda c, s, bq=bq, bkv=bkv: flash_attention(
               c, c, c, segment_ids=s, scale=scale, block_q=bq, block_kv=bkv,
               rope=(cos, sin))), q, segs, flops=FWD_FLOPS * 7 // 2, n=5)
    timeit(f"mh f+b+rope+drop bq={bq} bkv={bkv}",
           chain_grad(lambda c, s, bq=bq, bkv=bkv: flash_attention(
               c, c, c, segment_ids=s, scale=scale, block_q=bq, block_kv=bkv,
               rope=(cos, sin), dropout_rate=0.1,
               dropout_rng=jax.random.key(1, impl="rbg"))), q, segs,
           flops=FWD_FLOPS * 7 // 2, n=5)
