"""Ablation timing of the train step on the real TPU."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp

import omnibiote_tpu as obt
from omnibiote_tpu.config import TrainConfig
from omnibiote_tpu.training.train import Trainer
from omnibiote_tpu.ops.segments import segment_ids_np

ctx = 1024
rng = np.random.default_rng(0)

def make_batches(batch):
    def gen():
        while True:
            toks = rng.integers(20, 65000, size=(batch, ctx)).astype(np.int32)
            for r in range(batch):
                pos = rng.integers(32, ctx, size=3)
                toks[r, pos] = obt.EOS_TOKEN
            yield {"tokens": toks, "segments": segment_ids_np(toks)}
    return gen()

def bench_variant(name, mini=8, accum=4, steps=10, **model_kw):
    kw = dict(n_layer=8, n_embd=1024, n_head=8, block_size=ctx,
              vocab_size=2**16, dropout=0.1, attn_impl="flash",
              compute_dtype="bfloat16")
    kw.update(model_kw)
    mcfg = obt.OmniBioTAConfig(**kw)
    batch = mini * accum
    tcfg = TrainConfig(batch_size=batch, mini_batch_size=mini, ctx_len=ctx,
                       token_budget=float(batch * ctx * 100000), seed=0)
    tr = Trainer(mcfg, tcfg, batch_iter=make_batches(batch), prefetch=2)
    for _ in range(3):
        m = tr.train_step_once()
    float(m["loss"])
    t0 = time.time()
    for _ in range(steps):
        m = tr.train_step_once()
    float(m["loss"])
    dt = time.time() - t0
    tps = steps * batch * ctx / dt
    print(f"{name:40s} {tps/1e3:9.1f} ktok/s  ({dt/steps*1e3:.1f} ms/step)", flush=True)
    return tps

variants = sys.argv[1:] or ["base"]
for v in variants:
    if v == "base":
        bench_variant("base (flash, drop0.1, 8x4)")
    elif v == "nodrop":
        bench_variant("dropout=0.0", dropout=0.0)
    elif v == "xla":
        bench_variant("attn=xla", attn_impl="xla")
    elif v == "noaccum":
        bench_variant("mini=32 accum=1", mini=32, accum=1)
    elif v == "mini16":
        bench_variant("mini=16 accum=2", mini=16, accum=2)
    elif v == "scan":
        bench_variant("scan_layers=True", scan_layers=True)
    elif v == "fusedce":
        bench_variant("fused_ce=True", fused_ce=True)
# extra variants appended
if "mini4" in variants: bench_variant("mini=4 accum=8", mini=4, accum=8)
if "big" in variants:
    bench_variant("12L/1536d/12h (head128)", mini=8, accum=2, steps=8,
                  n_layer=12, n_embd=1536, n_head=12)
if "big2" in variants:
    bench_variant("16L/2048d/16h (head128)", mini=4, accum=2, steps=8,
                  n_layer=16, n_embd=2048, n_head=16)
if "big3" in variants:
    bench_variant("12L/1536d/12h b=32", mini=8, accum=4, steps=8,
                  n_layer=12, n_embd=1536, n_head=12)
if "big4" in variants:
    bench_variant("12L/1536d/12h b=32 m16", mini=16, accum=2, steps=8,
                  n_layer=12, n_embd=1536, n_head=12)
