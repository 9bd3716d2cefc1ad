import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")

import omnibiote_tpu as obt
from omnibiote_tpu.models.omnibiota import init_params
from omnibiote_tpu.parallel.mesh import make_mesh
from omnibiote_tpu.parallel.pipeline import pp_mlm_loss, shard_params_pp, STAGE_AXIS
from omnibiote_tpu.training.mlm import mlm_loss
from omnibiote_tpu.ops.segments import segment_ids_np

cfg = obt.OmniBioTAConfig(n_layer=4, n_head=2, n_embd=64, block_size=128,
                          vocab_size=512, dropout=0.0, attn_impl="xla",
                          compute_dtype="float32", mup_base_n_embd=16)
M, B, T = 3, 2, 128
rng = np.random.default_rng(0)
toks = rng.integers(20, 500, size=(M, B, T)).astype(np.int32)
for m in range(M):
    for b in range(B):
        toks[m, b, rng.integers(16, T, size=2)] = obt.EOS_TOKEN
segs = np.stack([segment_ids_np(toks[m]) for m in range(M)])
toks_d, segs_d = jnp.asarray(toks), jnp.asarray(segs)
weights = jnp.asarray([1.0, 1.0, 0.0])

params = init_params(jax.random.key(1, impl="rbg"), cfg)
key = jax.random.key(7, impl="rbg")

mesh = make_mesh((4,), axis_names=(STAGE_AXIS,), devices=jax.devices()[:4])
params_pp, _ = shard_params_pp(params, mesh)

pp = jax.jit(lambda p, t, s, w, k: pp_mlm_loss(
    p, cfg, t, s, w, k, mesh, deterministic=True))
loss_pp, aux_pp = pp(params_pp, toks_d, segs_d, weights, key)

# reference: accumulation-loop semantics with the SAME per-micro rngs
mb_rngs = [jax.random.fold_in(key, i) for i in range(M)]
losses = []
for j in range(M):
    l, aux = mlm_loss(params, cfg, toks_d[j], segs_d[j],
                      mb_rngs[j], deterministic=True)
    losses.append(float(l))
ref = (losses[0] * 1.0 + losses[1] * 1.0 + losses[2] * 0.0) / 2.0
print("pp loss:", float(loss_pp), " ref:", ref)
assert abs(float(loss_pp) - ref) < 2e-4, (float(loss_pp), ref)

# grads: pp vs accumulation reference
def ref_loss(p):
    tot = jnp.float32(0)
    for j, w in enumerate([1.0, 1.0, 0.0]):
        l, _ = mlm_loss(p, cfg, toks_d[j], segs_d[j], mb_rngs[j],
                        deterministic=True)
        tot = tot + w * l
    return tot / 2.0

g_pp = jax.jit(jax.grad(lambda p: pp_mlm_loss(
    p, cfg, toks_d, segs_d, weights, key, mesh, deterministic=True)[0]))(params_pp)
g_ref = jax.jit(jax.grad(ref_loss))(params)
worst = 0.0
for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_pp),
        jax.tree_util.tree_leaves_with_path(g_ref)):
    err = float(jnp.max(jnp.abs(jnp.asarray(a) - b)))
    scale = float(jnp.max(jnp.abs(b))) + 1e-30
    worst = max(worst, err / scale)
    if err / scale > 1e-3:
        print("MISMATCH", jax.tree_util.keystr(path), err, scale)
print("worst rel grad err:", worst)
assert worst < 1e-3
print("PP OK")
