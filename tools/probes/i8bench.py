"""TPU: in-kernel-quant int8 attention vs bf16 flash, plus encode() e2e."""
import time
import numpy as np
import jax, jax.numpy as jnp
from omnibiote_tpu.ops.flash_attention import flash_attention
from omnibiote_tpu.ops.int8_attention import int8_flash_attention
from omnibiote_tpu.models.rope import rope_tables

B, T, H, D = 32, 1024, 8, 128
K = 16
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.bfloat16)
scale = 8.0 / 1024
rope = rope_tables(D, T, 10000.0)
FWD = 4 * B * H * T * T * D

def timeit(name, f, *args, n=8):
    f = jax.jit(f)
    out = f(*args); float(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    float(out)
    dt = (time.time() - t0) / n / K * 1e3
    print(f"{name:44s} {dt:7.3f} ms  -> {FWD/dt/1e9:6.1f} TF", flush=True)

def chain(att):
    def f(c):
        def body(x, _):
            return att(x).astype(jnp.bfloat16), None
        out, _ = jax.lax.scan(body, c, None, length=K)
        return jnp.sum(out.astype(jnp.float32))
    return f

timeit("bf16 flash fwd (fused rope)",
       chain(lambda c: flash_attention(c, c, c, scale=scale, block_q=512,
                                       block_kv=1024, rope=rope)), q)
timeit("int8 kernel (in-kernel rope+quant)",
       chain(lambda c: int8_flash_attention(c, c, c, scale=scale,
                                            block_q=512, rope=rope)), q)

# encode() end-to-end: bf16 vs int8 serving
import omnibiote_tpu as obt
from omnibiote_tpu import encode
from omnibiote_tpu.models.omnibiota import init_params
from omnibiote_tpu.ops.quant import quantize_for_inference
cfg = obt.OmniBioTAConfig(n_layer=8, n_embd=1024, n_head=8, block_size=1024,
                          vocab_size=2**16, dropout=0.0, attn_impl="flash",
                          compute_dtype="bfloat16")
params = init_params(jax.random.PRNGKey(0), cfg)
toks = jnp.asarray(rng.integers(20, 65000, size=(32, 1024)).astype(np.int32))
for name, p_, c_ in [
    ("encode bf16", params, cfg),
    ("encode int8 proj only", quantize_for_inference(params, cfg),
     cfg.replace(qkv_prepermuted=True)),
    ("encode int8 proj+attn", quantize_for_inference(params, cfg),
     cfg.replace(qkv_prepermuted=True, attn_int8=True)),
]:
    enc = jax.jit(lambda pp, t, c_=c_: encode(pp, c_, t, "mean"))
    e = enc(p_, toks); float(e[0, 0])
    t0 = time.time()
    for _ in range(16):
        e = enc(p_, toks)
    float(e[0, 0])
    sps = 16 * 32 / (time.time() - t0)
    print(f"{name:44s} {sps:7.1f} seqs/s", flush=True)
