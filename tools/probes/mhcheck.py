"""Parity: mh flash kernel (rope fused) vs old kernel (rope outside)."""
import numpy as np
import jax, jax.numpy as jnp

from omnibiote_tpu.ops.flash_attention import flash_attention
from omnibiote_tpu.models.rope import rope_tables, apply_rope_half
from omnibiote_tpu.ops.segments import segment_ids_np

B, T, H, D = 1, 256, 2, 128
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
k = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
v = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
toks = rng.integers(20, 65000, size=(B, T)).astype(np.int32)
toks[0, 100] = 3; toks[0, 201] = 3
segs = jnp.asarray(segment_ids_np(toks))
scale = 8.0 / 1024
cos, sin = rope_tables(D, T, 10000.0)

def old(q, k, v):
    qr, kr = apply_rope_half(q, k, cos, sin)
    return flash_attention(qr, kr, v, segment_ids=segs, scale=scale,
                           block_q=128, block_kv=128, multi_head=False)

def new(q, k, v):
    return flash_attention(q, k, v, segment_ids=segs, scale=scale,
                           block_q=128, block_kv=128, rope=(cos, sin))

a, b = old(q, k, v), new(q, k, v)
err = float(jnp.max(jnp.abs(a - b)))
print("fwd rope-fused vs rope-outside:", err); assert err < 1e-5

go = jax.grad(lambda q, k, v: jnp.sum(old(q, k, v) ** 2), (0, 1, 2))(q, k, v)
gn = jax.grad(lambda q, k, v: jnp.sum(new(q, k, v) ** 2), (0, 1, 2))(q, k, v)
for name, x, y in zip("qkv", go, gn):
    err = float(jnp.max(jnp.abs(x - y)))
    rel = err / (float(jnp.max(jnp.abs(x))) + 1e-30)
    print(f"grad d{name}: abs {err:.3e} rel {rel:.3e}")
    assert rel < 1e-3

# block-size invariance (multi-kv-block online softmax, rope indexing)
c = flash_attention(q, k, v, segment_ids=segs, scale=scale,
                    block_q=256, block_kv=256, rope=(cos, sin))
err = float(jnp.max(jnp.abs(b - c)))
print("block invariance:", err); assert err < 1e-3
print("ALL OK")
