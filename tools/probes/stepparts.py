"""Decompose train-step time by differencing step variants (all shapes equal).

Each variant is a full jitted step over (A=4, B=8, T=1024); sums all output
leaves to one scalar inside the jit so nothing is DCE-eliminable and the
flushing fetch is tiny.
"""
import time
import numpy as np
import jax, jax.numpy as jnp

import omnibiote_tpu as obt
from omnibiote_tpu.config import TrainConfig
from omnibiote_tpu.training.mlm import mlm_loss
from omnibiote_tpu.models.omnibiota import init_params
from omnibiote_tpu.training.optim import make_optimizer
from omnibiote_tpu.ops.segments import segment_ids_np

ctx, mini, A = 1024, 8, 4
rng = np.random.default_rng(0)
mcfg = obt.OmniBioTAConfig(
    n_layer=8, n_embd=1024, n_head=8, block_size=ctx, vocab_size=2**16,
    dropout=0.1, attn_impl="flash", compute_dtype="bfloat16")
mcfg0 = mcfg.replace(dropout=0.0)
tcfg = TrainConfig(batch_size=mini * A, mini_batch_size=mini, ctx_len=ctx,
                   token_budget=1e12, seed=0)

params = init_params(jax.random.key(1, impl="rbg"), mcfg)
opt = make_optimizer(params, mcfg, tcfg, 10000)
opt_state = opt.init(params)
key = jax.random.key(0, impl="rbg")

toks = rng.integers(20, 65000, size=(A, mini, ctx)).astype(np.int32)
segs = np.stack([segment_ids_np(toks[a]) for a in range(A)])
toks = jnp.asarray(toks); segs = jnp.asarray(segs)

def tree_sum(t):
    return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(t))

def cast_copy(p):
    return jax.tree.map(lambda x: x.astype(jnp.bfloat16) if x.ndim >= 2 else x, p)

def micro(p, t, s, k, cfg):
    return jax.value_and_grad(lambda pp: mlm_loss(pp, cfg, t, s, k)[0])(p)

def accum_grads(p, cfg):
    pc = cast_copy(p)
    zero = jax.tree.map(lambda x: jnp.zeros(x.shape, jnp.float32), p)
    def body(carry, xs):
        t, s, k = xs
        loss, g = micro(pc, t, s, k, cfg)
        return jax.tree.map(lambda a, b: a + b.astype(jnp.float32), carry, g), loss
    keys = jax.random.split(key, A)
    g, losses = jax.lax.scan(body, zero, (toks, segs, keys))
    return g, losses

variants = {}

# A: fwd only, 4 micros (loss, no grads)
def v_fwd(p):
    pc = cast_copy(p)
    keys = jax.random.split(key, A)
    def body(c, xs):
        t, s, k = xs
        return c + mlm_loss(pc, mcfg, t, s, k)[0], None
    out, _ = jax.lax.scan(body, jnp.float32(0), (toks, segs, keys))
    return out
variants["4x fwd only (drop 0.1)"] = (v_fwd, (params,))

def v_fwd0(p):
    pc = cast_copy(p)
    keys = jax.random.split(key, A)
    def body(c, xs):
        t, s, k = xs
        return c + mlm_loss(pc, mcfg0, t, s, k, deterministic=True)[0], None
    out, _ = jax.lax.scan(body, jnp.float32(0), (toks, segs, keys))
    return out
variants["4x fwd only (no drop)"] = (v_fwd0, (params,))

# B: grads, no accumulation materialisation (sum-of-sums so grads live but
#    carry reduced to a scalar per micro)
def v_grad_noacc(p):
    pc = cast_copy(p)
    keys = jax.random.split(key, A)
    def body(c, xs):
        t, s, k = xs
        loss, g = micro(pc, t, s, k, mcfg)
        return c + loss + tree_sum(g), None
    out, _ = jax.lax.scan(body, jnp.float32(0), (toks, segs, keys))
    return out
variants["4x fwd+bwd (scalar-reduced grads)"] = (v_grad_noacc, (params,))

def v_grad_noacc0(p):
    pc = cast_copy(p)
    keys = jax.random.split(key, A)
    def body(c, xs):
        t, s, k = xs
        loss, g = micro(pc, t, s, k, mcfg0)
        return c + loss + tree_sum(g), None
    out, _ = jax.lax.scan(body, jnp.float32(0), (toks, segs, keys))
    return out
variants["4x fwd+bwd no dropout"] = (v_grad_noacc0, (params,))

# C: grads + fp32 accumulation carry
def v_grad_acc(p):
    g, losses = accum_grads(p, mcfg)
    return tree_sum(g) + jnp.sum(losses)
variants["4x fwd+bwd + fp32 accum"] = (v_grad_acc, (params,))

# D: full step (accum + opt update + param apply)
def v_full(p, s):
    g, losses = accum_grads(p, mcfg)
    g = jax.tree.map(lambda x: x / A, g)
    updates, s2 = opt.update(g, s, p)
    p2 = jax.tree.map(lambda a, u: (a.astype(jnp.float32) + u).astype(a.dtype), p, updates)
    gn = jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in jax.tree.leaves(g)))
    return tree_sum(p2) + tree_sum(s2) + jnp.sum(losses) + gn
variants["full step (accum+opt+norm)"] = (v_full, (params, opt_state))

for name, (fn, args) in variants.items():
    f = jax.jit(fn)
    out = f(*args); float(out)
    t0 = time.time()
    n = 10
    for _ in range(n):
        out = f(*args)
    float(out)
    dt = (time.time() - t0) / n * 1e3
    print(f"{name:42s} {dt:8.1f} ms", flush=True)
