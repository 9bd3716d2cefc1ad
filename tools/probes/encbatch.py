"""TPU: encode() throughput vs batch size, bf16 and int8-proj serving."""
import time
import numpy as np
import jax, jax.numpy as jnp
import omnibiote_tpu as obt
from omnibiote_tpu import encode
from omnibiote_tpu.models.omnibiota import init_params
from omnibiote_tpu.ops.quant import quantize_for_inference

rng = np.random.default_rng(0)
cfg = obt.OmniBioTAConfig(n_layer=8, n_embd=1024, n_head=8, block_size=1024,
                          vocab_size=2**16, dropout=0.0, attn_impl="flash",
                          compute_dtype="bfloat16")
params = init_params(jax.random.PRNGKey(0), cfg)
qp = quantize_for_inference(params, cfg)
qcfg = cfg.replace(qkv_prepermuted=True)
bf16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16) if x.ndim >= 2 else x,
                    params)
for B in (32, 64, 128):
    toks = jnp.asarray(rng.integers(20, 65000, size=(B, 1024)).astype(np.int32))
    for name, p_, c_ in [("bf16-params", bf16, cfg),
                         ("int8-proj", qp, qcfg)]:
        enc = jax.jit(lambda pp, t, c_=c_: encode(pp, c_, t, "mean"))
        e = enc(p_, toks); float(e[0, 0])
        t0 = time.time()
        n = max(4, 512 // B)
        for _ in range(n):
            e = enc(p_, toks)
        float(e[0, 0])
        print(f"B={B:4d} {name:12s} {n*B/(time.time()-t0):7.1f} seqs/s",
              flush=True)
