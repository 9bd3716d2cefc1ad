"""Chained in-jit probes of per-layer ops: find where forward's MFU goes."""
import time
import numpy as np
import jax, jax.numpy as jnp

import omnibiote_tpu as obt
from omnibiote_tpu.models.omnibiota import _layer_norm, _gelu_erf, _block
from omnibiote_tpu.models.rope import rope_tables, apply_rope_half
from omnibiote_tpu.ops.attention import attention
from omnibiote_tpu.ops.segments import segment_ids_np

B, T, D, H, Dh = 8, 1024, 1024, 8, 128
K = 32  # chained reps inside one jit
rng = np.random.default_rng(0)

def timeit(name, f, *args, flops=None, n=10):
    f = jax.jit(f)
    out = f(*args); float(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    float(out)
    dt = (time.time() - t0) / n / K * 1e3  # ms per single rep
    extra = ""
    if flops:
        extra = f"  -> {flops/dt/1e9:7.1f} TFLOPs ({flops/dt/1e9/197*100:4.1f}% v5e peak)"
    print(f"{name:38s} {dt:8.3f} ms/rep{extra}", flush=True)
    return dt

x = jnp.asarray(rng.standard_normal((B * T, D)), jnp.bfloat16)
w1 = jnp.asarray(rng.standard_normal((D, 4 * D)) * 0.02, jnp.bfloat16)
w2 = jnp.asarray(rng.standard_normal((4 * D, D)) * 0.02, jnp.bfloat16)

# 1. pure matmul pair (mlp shapes): 2 matmuls per rep
def mm_chain(x):
    def body(c, _):
        c = (c @ w1) @ w2
        return c, None
    out, _ = jax.lax.scan(body, x, None, length=K)
    return jnp.sum(out.astype(jnp.float32))
timeit("mlp matmul pair", mm_chain, x, flops=2 * 2 * B * T * D * 4 * D)

# 2. mlp with GELU between
def mlp_chain(x):
    def body(c, _):
        c = _gelu_erf(c @ w1) @ w2
        return c, None
    out, _ = jax.lax.scan(body, x, None, length=K)
    return jnp.sum(out.astype(jnp.float32))
timeit("mlp matmul + erf-GELU", mlp_chain, x, flops=2 * 2 * B * T * D * 4 * D)

# 3. LayerNorm alone
ln_p = {"scale": jnp.ones((D,), jnp.float32)}
def ln_chain(x):
    def body(c, _):
        return _layer_norm(c, ln_p), None
    out, _ = jax.lax.scan(body, x, None, length=K)
    return jnp.sum(out.astype(jnp.float32))
timeit("LayerNorm", ln_chain, x)

# 4. flash attention
q = jnp.asarray(rng.standard_normal((B, T, H, Dh)), jnp.bfloat16)
toks = rng.integers(20, 65000, size=(B, T)).astype(np.int32)
for r in range(B):
    toks[r, rng.integers(32, T, size=3)] = obt.EOS_TOKEN
segs = jnp.asarray(segment_ids_np(toks))
def fa_chain(q, segs):
    def body(c, _):
        o = attention(c, c, c, scale=8.0 / D, segment_ids=segs, impl="flash")
        return o, None
    out, _ = jax.lax.scan(body, q, None, length=K)
    return jnp.sum(out.astype(jnp.float32))
timeit("flash attention fwd", fa_chain, q, segs, flops=4 * B * H * T * T * Dh)

# 5. flash attention with dropout
key = jax.random.key(0, impl="rbg")
def fa_drop_chain(q, segs, key):
    def body(c, k):
        o = attention(c, c, c, scale=8.0 / D, segment_ids=segs, impl="flash",
                      dropout_rate=0.1, dropout_rng=k)
        return o, None
    out, _ = jax.lax.scan(body, q, jax.random.split(key, K))
    return jnp.sum(out.astype(jnp.float32))
timeit("flash attention fwd +dropout", fa_drop_chain, q, segs, key,
       flops=4 * B * H * T * T * Dh)

# 6. xla attention for comparison
def fa_xla_chain(q, segs):
    def body(c, _):
        o = attention(c, c, c, scale=8.0 / D, segment_ids=segs, impl="xla")
        return o, None
    out, _ = jax.lax.scan(body, q, None, length=K)
    return jnp.sum(out.astype(jnp.float32))
timeit("xla attention fwd", fa_xla_chain, q, segs, flops=4 * B * H * T * T * Dh)

# 7. RoPE
cos, sin = rope_tables(Dh, T, 10000.0)
def rope_chain(q):
    def body(c, _):
        a, b = apply_rope_half(c, c, cos, sin)
        return a + b, None
    out, _ = jax.lax.scan(body, q, None, length=K)
    return jnp.sum(out.astype(jnp.float32))
timeit("RoPE (q and k)", rope_chain, q)

# 8. full block (layer) via model._block, deterministic
cfg = obt.OmniBioTAConfig(n_layer=8, n_embd=D, n_head=H, block_size=T,
                          vocab_size=2**16, dropout=0.0, attn_impl="flash",
                          compute_dtype="bfloat16")
bp = {
    "ln1": {"scale": jnp.ones((D,), jnp.float32)},
    "ln2": {"scale": jnp.ones((D,), jnp.float32)},
    "attn": {"wqkv": jnp.asarray(rng.standard_normal((D, 3 * D)) * 0.02, jnp.bfloat16),
             "wo": jnp.asarray(rng.standard_normal((D, D)) * 0.02, jnp.bfloat16)},
    "mlp": {"wi": w1, "wo": w2},
}
x3 = x.reshape(B, T, D)
blk_flops = 2 * B * T * D * 12 * D + 4 * B * H * T * T * Dh
def blk_chain(x3, segs):
    def body(c, _):
        o = _block(cfg, c, bp, cos, sin, segs, {}, True)
        return o, None
    out, _ = jax.lax.scan(body, x3, None, length=K)
    return jnp.sum(out.astype(jnp.float32))
timeit("full block (no dropout)", blk_chain, x3, segs, flops=blk_flops)
