"""TPU: decoupled fwd kv block (block_kv_fwd=T) at T=2048 —
(a) fwd bit-parity vs coupled at dropout 0, (b) finite-difference grad
check THROUGH dropout (fwd/bwd strip streams must match), (c) f+b perf."""
import time
import numpy as np
import jax, jax.numpy as jnp

import omnibiote_tpu as obt
from omnibiote_tpu.ops import flash_attention as fa
from omnibiote_tpu.models.rope import rope_tables
from omnibiote_tpu.ops.segments import segment_ids_np

rng = np.random.default_rng(0)
scale = 8.0 / 1024
H, D = 8, 128
B, T = 2, 2048
key = jax.random.key(3, impl="rbg")

toks = rng.integers(20, 65000, size=(B, T)).astype(np.int32)
for r in range(B):
    toks[r, rng.integers(32, T, size=5)] = obt.EOS_TOKEN
segs = jnp.asarray(segment_ids_np(toks))
rope = rope_tables(D, T, 10000.0)

# (a) fwd bit parity, dropout 0, bf16
qb = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.bfloat16)
def fwd(bkvf):
    return fa.flash_attention(qb, qb, qb, segment_ids=segs, scale=scale,
                              block_q=512, block_kv=512, rope=rope,
                              block_kv_fwd=bkvf)
a = np.asarray(jax.jit(lambda: fwd(None))()).astype(np.float32)
b = np.asarray(jax.jit(lambda: fwd(T))()).astype(np.float32)
err = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
print(f"fwd parity coupled vs decoupled: rel {err:.3e}", flush=True)
assert err < 2e-2, "decoupled forward diverges"

# (b) FD grad check through dropout, fp32
qf = jnp.asarray(rng.standard_normal((B, T, H, D)) * 0.5, jnp.float32)
def loss(x):
    o = fa.flash_attention(x, x, x, segment_ids=segs, scale=scale,
                           block_q=512, block_kv=512, rope=rope,
                           dropout_rate=0.2, dropout_rng=key,
                           block_kv_fwd=T)
    return jnp.sum(o * o)
lossj = jax.jit(loss)
g = np.asarray(jax.jit(jax.grad(loss))(qf))
eps = 1e-2
for i in [(0, 5, 0, 3), (1, 1700, 6, 100), (0, 1023, 3, 64)]:
    d = np.zeros(qf.shape, np.float32); d[i] = eps
    fd = (float(lossj(qf + jnp.asarray(d)))
          - float(lossj(qf - jnp.asarray(d)))) / (2 * eps)
    ok = abs(g[i] - fd) <= 2e-2 * max(abs(fd), 1.0) + 2e-2
    print(f"fd-check {i}: grad {g[i]:+.4f} fd {fd:+.4f} {'OK' if ok else 'FAIL'}",
          flush=True)
    assert ok

# (c) perf: f+b coupled vs decoupled at bench shape
K = 16
qb2 = jnp.asarray(rng.standard_normal((8, T, H, D)), jnp.bfloat16)
toks2 = rng.integers(20, 65000, size=(8, T)).astype(np.int32)
for r in range(8):
    toks2[r, rng.integers(32, T, size=5)] = obt.EOS_TOKEN
segs2 = jnp.asarray(segment_ids_np(toks2))
FB = 4.5 / 2 * 4 * 8 * H * T * T * D

def chain(bkvf):
    def f(c, s, kk):
        def body(x, _):
            g = jax.grad(lambda y: jnp.sum(fa.flash_attention(
                y, y, y, segment_ids=s, scale=scale, block_q=512,
                block_kv=512, rope=rope, dropout_rate=0.1, dropout_rng=kk,
                block_kv_fwd=bkvf).astype(jnp.float32)))(x)
            return g, None
        out, _ = jax.lax.scan(body, c, None, length=K)
        return jnp.sum(out.astype(jnp.float32))
    return f

for bkvf in (None, T):
    f = jax.jit(chain(bkvf))
    out = f(qb2, segs2, key); float(out)
    t0 = time.time()
    for _ in range(8):
        out = f(qb2, segs2, key)
    float(out)
    dt = (time.time() - t0) / 8 / K * 1e3
    print(f"T={T} B=8 f+b block_kv_fwd={bkvf}: {dt:7.3f} ms "
          f"-> {FB/dt/1e9:6.1f} TF", flush=True)
