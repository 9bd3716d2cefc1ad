import numpy as np
import jax, jax.numpy as jnp
from omnibiote_tpu.ops.attention import xla_attention
from omnibiote_tpu.ops.flash_attention import flash_attention
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

ref = xla_attention(q, k, v, scale=scale, segment_ids=segs)
old = flash_attention(q, k, v, segment_ids=segs, scale=scale,
                      block_q=128, block_kv=128, multi_head=False)
new = flash_attention(q, k, v, segment_ids=segs, scale=scale,
                      block_q=128, block_kv=128, multi_head=True)
print("old vs ref:", float(jnp.max(jnp.abs(old - ref))))
print("new vs ref:", float(jnp.max(jnp.abs(new - ref))))
print("new vs old:", float(jnp.max(jnp.abs(new - old))))
d = jnp.abs(new - ref)
idx = jnp.unravel_index(jnp.argmax(d), d.shape)
print("worst idx (b,t,h,d):", [int(i) for i in idx])
# dense case
z = jnp.zeros_like(segs)
refd = xla_attention(q, k, v, scale=scale, segment_ids=z)
newd = flash_attention(q, k, v, segment_ids=z, scale=scale,
                       block_q=128, block_kv=128, multi_head=True)
print("dense new vs ref:", float(jnp.max(jnp.abs(newd - refd))))
# single kv block
new1 = flash_attention(q, k, v, segment_ids=segs, scale=scale,
                       block_q=256, block_kv=256, multi_head=True)
print("1-block new vs ref:", float(jnp.max(jnp.abs(new1 - ref))))
