"""TPU: fused CE vs plain compacted CE — vocab 65536 and 131072, dense-CE
(sp-like shapes). Decides VERDICT r2 #10 (auto-select or demote)."""
import time
import numpy as np
import jax, jax.numpy as jnp
from omnibiote_tpu.ops.fused_ce import fused_cross_entropy, pick_chunks

rng = np.random.default_rng(0)
key = jax.random.key(0, impl="rbg")

def timeit(name, f, *args, n=8):
    f = jax.jit(f)
    out = f(*args); float(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    float(out)
    print(f"{name:52s} {(time.time()-t0)/n*1e3:8.2f} ms", flush=True)

D = 1024
for V in (65536, 131072):
    W = jnp.asarray(rng.standard_normal((D, V)) * 0.02, jnp.bfloat16)
    for N in (4096, 16384):   # compacted (B*T/4) and dense-ish (sp) sizes
        x = jnp.asarray(rng.standard_normal((N, D)), jnp.bfloat16)
        lab = jnp.asarray(rng.integers(0, V, size=(N,)).astype(np.int32))

        def plain(x, W, lab):
            def loss(x, W):
                logits = x @ W.astype(x.dtype)
                logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
                return jnp.sum(-jnp.take_along_axis(
                    logp, lab[:, None], -1))
            gx, gW = jax.grad(loss, argnums=(0, 1))(x, W)
            return jnp.sum(gx.astype(jnp.float32)) + jnp.sum(
                gW.astype(jnp.float32))

        def fused(x, W, lab):
            nc = pick_chunks(V)
            def loss(x, W):
                return jnp.sum(fused_cross_entropy(x, W, lab, nc))
            gx, gW = jax.grad(loss, argnums=(0, 1))(x, W)
            return jnp.sum(gx.astype(jnp.float32)) + jnp.sum(
                gW.astype(jnp.float32))

        timeit(f"V={V} N={N} plain f+b", plain, x, W, lab)
        timeit(f"V={V} N={N} fused f+b", fused, x, W, lab)
