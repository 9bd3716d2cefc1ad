"""Microbenchmarks of train-step components on the real TPU."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp

import omnibiote_tpu as obt
from omnibiote_tpu.config import TrainConfig
from omnibiote_tpu.training.mlm import mlm_loss, make_mlm_mask, _gather_masked
from omnibiote_tpu.models.omnibiota import init_params, forward
from omnibiote_tpu.training.optim import make_optimizer
from omnibiote_tpu.ops.segments import segment_ids_np

ctx = 1024
B = 8  # one micro-batch
rng = np.random.default_rng(0)
mcfg = obt.OmniBioTAConfig(
    n_layer=8, n_embd=1024, n_head=8, block_size=ctx, vocab_size=2**16,
    dropout=0.1, attn_impl="flash", compute_dtype="bfloat16")
tcfg = TrainConfig(batch_size=32, mini_batch_size=8, ctx_len=ctx,
                   token_budget=1e9, seed=0)

key = jax.random.key(0, impl="rbg")
params = init_params(jax.random.key(1, impl="rbg"), mcfg)
params_c = jax.tree.map(lambda p: p.astype(jnp.bfloat16) if p.ndim >= 2 else p, params)

toks = rng.integers(20, 65000, size=(B, ctx)).astype(np.int32)
for r in range(B):
    toks[r, rng.integers(32, ctx, size=3)] = obt.EOS_TOKEN
segs = segment_ids_np(toks)
toks_d = jnp.asarray(toks); segs_d = jnp.asarray(segs)

def timeit(name, fn, *args, n=20):
    # Reduce the output to one scalar INSIDE the jit so the flushing fetch
    # (block_until_ready is a no-op through the remote relay) moves only a
    # few bytes.
    f = jax.jit(lambda *a: jnp.sum(jax.tree.leaves(fn(*a))[0]
                                   .astype(jnp.float32)))
    out = f(*args)
    float(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    float(out)
    dt = (time.time() - t0) / n * 1e3
    print(f"{name:45s} {dt:8.2f} ms", flush=True)
    return dt

# 1. forward (embeddings out) with dropout
fwd = jax.jit(lambda p, t, s, k: forward(p, mcfg, t, s, deterministic=False,
                                          rng=k, return_embeddings=True))
timeit("forward (B=8, train mode)", fwd, params_c, toks_d, segs_d, key)

# 1b. forward, no dropout
mcfg0 = mcfg.replace(dropout=0.0)
fwd0 = jax.jit(lambda p, t, s: forward(p, mcfg0, t, s, deterministic=True,
                                        return_embeddings=True))
timeit("forward (B=8, no dropout)", fwd0, params_c, toks_d, segs_d)

# 2. mlm_loss value only
lossf = jax.jit(lambda p, t, s, k: mlm_loss(p, mcfg, t, s, k)[0])
timeit("mlm_loss fwd", lossf, params_c, toks_d, segs_d, key)

# 3. value_and_grad of one micro
vg = jax.jit(lambda p, t, s, k: jax.value_and_grad(
    lambda pp: mlm_loss(pp, mcfg, t, s, k)[0])(p))
timeit("micro value_and_grad", vg, params_c, toks_d, segs_d, key)

# 4. optimizer update alone (fp32 params/grads)
opt = make_optimizer(params, mcfg, tcfg, 10000)
opt_state = opt.init(params)
grads = jax.tree.map(lambda p: jnp.ones_like(p, jnp.float32), params)
upd = jax.jit(lambda g, s, p: opt.update(g, s, p))
timeit("optimizer.update", upd, grads, opt_state, params)

# 5. compaction alone (argsort path)
emb = jnp.ones((B, ctx, 1024), jnp.bfloat16)
def compact(e, t, k):
    m = make_mlm_mask(k, t)
    return _gather_masked(e, t, m, ctx // 4)
timeit("mask+argsort compaction", jax.jit(compact), emb, toks_d, key)

# 6. grad-tree accumulate (a + w*g) fp32 — one micro's cost
acc = jax.jit(lambda a, g: jax.tree.map(lambda x, y: x + 1.0 * y.astype(jnp.float32), a, g))
timeit("grad accumulate (1 micro)", acc, grads, grads)

# 7. pure matmul MFU probe at these shapes
x = jnp.ones((B * ctx, 1024), jnp.bfloat16)
w = jnp.ones((1024, 4096), jnp.bfloat16)
mm = jax.jit(lambda x, w: x @ w)
d = timeit("matmul (8192,1024)@(1024,4096)", mm, x, w, n=50)
fl = 2 * 8192 * 1024 * 4096
print(f"    -> {fl/d/1e9:.1f} TFLOPs achieved")

# 8. flash attention fwd alone
from omnibiote_tpu.ops.attention import attention
q = jnp.ones((B, ctx, 8, 128), jnp.bfloat16)
att = jax.jit(lambda q, s: attention(q, q, q, scale=8/1024., segment_ids=s, impl="flash"))
d = timeit("flash attention fwd (B=8,H=8,T=1024)", att, q, segs_d, n=50)
fl = 4 * B * 8 * ctx * ctx * 128  # qk + pv
print(f"    -> {fl/d/1e9:.1f} TFLOPs achieved")

# 9. attention fwd+bwd
attg = jax.jit(jax.grad(lambda q, s: attention(q, q, q, scale=8/1024., segment_ids=s,
                                                impl="flash").astype(jnp.float32).sum()))
d = timeit("flash attention fwd+bwd", attg, q, segs_d, n=20)
