"""Isolate dropout-RNG and compaction costs inside the full fwd+bwd step."""
import time
import numpy as np
import jax, jax.numpy as jnp

import omnibiote_tpu as obt
from omnibiote_tpu.config import TrainConfig
from omnibiote_tpu.training import mlm as mlm_mod
from omnibiote_tpu.training.mlm import mlm_loss
from omnibiote_tpu.models.omnibiota import init_params
from omnibiote_tpu.ops.segments import segment_ids_np

ctx, mini, A = 1024, 8, 4
rng = np.random.default_rng(0)
mcfg = obt.OmniBioTAConfig(
    n_layer=8, n_embd=1024, n_head=8, block_size=ctx, vocab_size=2**16,
    dropout=0.1, attn_impl="flash", compute_dtype="bfloat16")
tcfg = TrainConfig(batch_size=mini * A, mini_batch_size=mini, ctx_len=ctx,
                   token_budget=1e12, seed=0)
params = init_params(jax.random.key(1, impl="rbg"), mcfg)
key = jax.random.key(0, impl="rbg")
toks = rng.integers(20, 65000, size=(A, mini, ctx)).astype(np.int32)
segs = np.stack([segment_ids_np(toks[a]) for a in range(A)])
toks = jnp.asarray(toks); segs = jnp.asarray(segs)

def tree_sum(t):
    return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(t))

def cast_copy(p):
    return jax.tree.map(lambda x: x.astype(jnp.bfloat16) if x.ndim >= 2 else x, p)

def grad4(p, cfg):
    pc = cast_copy(p)
    keys = jax.random.split(key, A)
    def body(c, xs):
        t, s, k = xs
        loss, g = jax.value_and_grad(
            lambda pp: mlm_loss(pp, cfg, t, s, k)[0])(pc)
        return c + loss + tree_sum(g), None
    out, _ = jax.lax.scan(body, jnp.float32(0), (toks, segs, keys))
    return out

def timeit(name, fn, *args, n=10):
    f = jax.jit(fn)
    out = f(*args); float(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    float(out)
    print(f"{name:48s} {(time.time()-t0)/n*1e3:8.1f} ms", flush=True)

timeit("baseline f+b (drop 0.1)", lambda p: grad4(p, mcfg), params)

# monkeypatch: no-op compaction (slice instead of argsort-gather)
orig_gather = mlm_mod._gather_masked
def fake_gather(emb, tokens, mask, capacity):
    return (emb[:, :capacity], tokens[:, :capacity],
            mask[:, :capacity])
mlm_mod._gather_masked = fake_gather
timeit("f+b with sliced (no argsort) compaction", lambda p: grad4(p, mcfg), params)
mlm_mod._gather_masked = orig_gather

# dropout via uint16 bits threshold instead of bernoulli
import omnibiote_tpu.models.omnibiota as om
orig_drop = om._dropout
def bits_dropout(x, rate, rng, deterministic):
    if deterministic or rate == 0.0:
        return x
    bits = jax.random.bits(rng, x.shape, dtype=jnp.uint16)
    thresh = int(round(rate * 65536.0))
    keep = bits >= jnp.uint16(thresh)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros_like(x))
om._dropout = bits_dropout
timeit("f+b with uint16-bits dropout", lambda p: grad4(p, mcfg), params)
om._dropout = orig_drop

# LN cost: replace _layer_norm with a cheap scale-only op (wrong math, same shapes)
orig_ln = om._layer_norm
def fake_ln(x, p, eps=1e-5):
    return x * p["scale"].astype(x.dtype)
om._layer_norm = fake_ln
timeit("f+b with identity-LN (no stats)", lambda p: grad4(p, mcfg), params)
om._layer_norm = orig_ln

# GELU cost: replace with square
orig_gelu = om._gelu_erf
om._gelu_erf = lambda x: x * x
timeit("f+b with square instead of GELU", lambda p: grad4(p, mcfg), params)
om._gelu_erf = orig_gelu

# attention cost check: no dropout in attention only is hard; instead mask off
