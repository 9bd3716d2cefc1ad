"""Attribute the executed-utilization gap at the reference-default config.

BENCH_SCALE's ref-default row (12L/1024d/8h, ctx 2048, mini 8, accum 128)
measures 21.46 s/step = 167.7 ms/micro against an executed-FLOPs ideal of
~109 ms/micro (mfu_executed 0.649).  This probe times each component of
the micro-step in isolation at the EXACT shapes so the ~35-point gap can
be attributed (r4 VERDICT #3):

  1. full micro fwd+bwd (mlm_loss value_and_grad)   — the thing being paid
  2. same with dropout 0                            — dropout cost
  3. body-only fwd+bwd (no MLM mask/compaction/head) — head+CE cost
  4. attention kernel fwd+bwd x 12 layers           — kernel share
  5. dense MLP/qkvo-shaped matmul chain fwd+bwd     — the dense ceiling
     for THIS shape family (not the 4096-square roofline number)
  6. grad-carry add on the 218M-param tree          — accumulation cost
  7. optimizer update (amortized /accum)            — should be noise
  8. the same micro at mini 16                      — does a bigger micro
     close the gap?

Writes /tmp/refgap.json and prints a table.  Reference anchor for the
config: /root/reference/training/model.py:183-193 (12L/1024d ctx 2048,
dropout 0.1), global batch 1024 = train_encoder.py:439.
"""
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from omnibiote_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()

import jax
import jax.numpy as jnp

import omnibiote_tpu as obt
from omnibiote_tpu.models.omnibiota import forward, init_params, num_params
from omnibiote_tpu.ops.flash_attention import flash_attention
from omnibiote_tpu.ops.segments import segment_ids_np
from omnibiote_tpu.training.mlm import mlm_loss
from omnibiote_tpu.training.metrics import (flops_per_token,
                                            flops_per_token_executed)

L, D, H, T = 12, 1024, 8, 2048
MINI = int(os.environ.get("REFGAP_MINI", "8"))
N_TIME = int(os.environ.get("REFGAP_N", "8"))
PEAK_TF = 197.0

rng = np.random.default_rng(0)
toks = rng.integers(20, 65000, size=(MINI, T)).astype(np.int32)
for r in range(MINI):
    toks[r, rng.integers(32, T, size=3)] = obt.EOS_TOKEN
segs_np = segment_ids_np(toks)
toks_j = jnp.asarray(toks)
segs_j = jnp.asarray(segs_np)
key = jax.random.key(0, impl="rbg")


def cfg_with(dropout):
    return obt.OmniBioTAConfig(
        n_layer=L, n_embd=D, n_head=H, block_size=T, vocab_size=2 ** 16,
        dropout=dropout, attn_impl="flash", compute_dtype="bfloat16")


CFG = cfg_with(0.1)
params = init_params(jax.random.key(1, impl="rbg"), CFG)
params_bf16 = jax.tree.map(
    lambda x: x.astype(jnp.bfloat16) if x.ndim >= 2 else x, params)
n_body = num_params(params, non_embedding=True)

fpt_nom = flops_per_token(n_body, L, D, T)
fpt_exec = flops_per_token_executed(n_body, L, D, T, segments=segs_np,
                                    attn_impl="flash")
tokens_micro = MINI * T


def timeit(fn, *args, n=N_TIME):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(n):
        t0 = time.time()
        out = f(*args)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    return float(np.median(times)) * 1e3  # ms


def tree_sum(t):
    return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(t))


results = {}


def record(name, ms, flops=None, note=""):
    row = {"ms": round(ms, 2)}
    if flops is not None:
        row["tf_per_s"] = round(flops / (ms / 1e3) / 1e12, 1)
        row["pct_nominal_peak"] = round(row["tf_per_s"] / PEAK_TF * 100, 1)
    if note:
        row["note"] = note
    results[name] = row
    print(f"{name:34s} {ms:8.2f} ms"
          + (f"  {row['tf_per_s']:7.1f} TF/s ({row['pct_nominal_peak']}%)"
             if flops is not None else "")
          + (f"  {note}" if note else ""), flush=True)


# --- 1/2: full micro fwd+bwd, dropout on/off --------------------------------
def micro(p, cfg, k):
    loss, g = jax.value_and_grad(
        lambda pp: mlm_loss(pp, cfg, toks_j, segs_j, k)[0])(p)
    return loss + tree_sum(g)


exec_flops_micro = fpt_exec * tokens_micro
nom_flops_micro = fpt_nom * tokens_micro
record("micro_full (dropout 0.1)",
       timeit(lambda p, k: micro(p, CFG, k), params_bf16, key),
       flops=exec_flops_micro, note="executed-FLOPs rate")
record("micro_nodrop (dropout 0.0)",
       timeit(lambda p, k: micro(p, cfg_with(0.0), k), params_bf16, key),
       flops=exec_flops_micro, note="executed-FLOPs rate")


# --- 3: body-only fwd+bwd (no mask/compaction/head) -------------------------
def micro_body(p, k):
    def loss_fn(pp):
        emb = forward(pp, CFG, toks_j, segment_ids=segs_j,
                      deterministic=False, rng=k, return_embeddings=True)
        return jnp.mean(emb.astype(jnp.float32) ** 2)
    loss, g = jax.value_and_grad(loss_fn)(p)
    return loss + tree_sum(g)


# executed body FLOPs = executed total minus the compacted head's credit
head_params = D * CFG.vocab_size
head_exec_fpt = 6 * head_params * 0.25          # T//4 slots per row
body_exec_flops = (fpt_exec - head_exec_fpt) * tokens_micro
record("micro_body (no head/mask/CE)", timeit(micro_body, params_bf16, key),
       flops=body_exec_flops, note="executed body FLOPs")


# --- 3b: per-call sync floor (relay RTT) ------------------------------------
tiny = jnp.zeros((8, 128), jnp.float32)
rtt_ms = timeit(lambda x: jnp.sum(x + 1.0), tiny)
record("per-call sync floor (relay RTT)", rtt_ms,
       note="subtract from every standalone row")


# --- 4: attention fwd+bwd x L (the model's dispatch path) -------------------
from omnibiote_tpu.ops.attention import attention
from omnibiote_tpu.models.rope import rope_tables

q = jnp.asarray(rng.standard_normal((MINI, T, H, D // H)), jnp.bfloat16)
kv_k = jnp.asarray(rng.standard_normal((MINI, T, H, D // H)), jnp.bfloat16)
kv_v = jnp.asarray(rng.standard_normal((MINI, T, H, D // H)), jnp.bfloat16)
cos_t, sin_t = rope_tables(CFG.head_dim, T, CFG.rope_theta)


def attn_fb(qq, kk, vv, k):
    def f(a, b, c):
        o = attention(a, b, c, scale=CFG.attn_scale, segment_ids=segs_j,
                      dropout_rate=CFG.dropout, dropout_rng=k, impl="flash",
                      rope=(cos_t, sin_t))
        return jnp.sum(o.astype(jnp.float32))
    l, gs = jax.value_and_grad(f, argnums=(0, 1, 2))(qq, kk, vv)
    return l + tree_sum(gs)


attn_ms_1 = timeit(attn_fb, q, kv_k, kv_v, key) - rtt_ms
# executed attention credit per token = fpt_exec minus the matmul terms:
# 6*(n_body - head) for the body params + the compacted head's 6*head*0.25.
attn_exec_fpt = fpt_exec - (6 * n_body - 6 * head_params + head_exec_fpt)
record(f"attention f+b x{L} layers", attn_ms_1 * L,
       flops=attn_exec_fpt * tokens_micro,
       note="executed tile FLOPs (segment-skip aware)")
results["attention_one_layer_ms"] = round(attn_ms_1, 2)


# --- 5: dense matmul chain at the body shapes -------------------------------
x_in = jnp.asarray(rng.standard_normal((MINI * T, D)), jnp.bfloat16)
w1 = jnp.asarray(rng.standard_normal((D, 4 * D)) * 0.02, jnp.bfloat16)
w2 = jnp.asarray(rng.standard_normal((4 * D, D)) * 0.02, jnp.bfloat16)
wq = jnp.asarray(rng.standard_normal((D, 3 * D)) * 0.02, jnp.bfloat16)
wo = jnp.asarray(rng.standard_normal((D, D)) * 0.02, jnp.bfloat16)


def dense_chain(x, a, b, c, d):
    def f(xx):
        h = xx
        for _ in range(L):
            h = ((h @ a)[:, :D] @ b + h)          # qkv + proj shaped
            h = (h @ c @ d + h)                    # MLP shaped
        return jnp.sum(h.astype(jnp.float32))
    l, g = jax.value_and_grad(f)(x)
    return l + jnp.sum(g.astype(jnp.float32))


# fwd FLOPs: per layer 2*(MINI*T)*(D*3D + D*D + D*4D + 4D*D) ; bwd only dx
# (weights are closed over -> no dW), so bwd = 1x fwd for dx. Total 2x fwd.
dense_fwd = 2 * MINI * T * (D * 3 * D + D * D + 8 * D * D) * L
record("dense chain f+b (body shapes)",
       timeit(dense_chain, x_in, wq, wo, w1, w2) - rtt_ms,
       flops=dense_fwd * 2, note="measured dense ceiling, these shapes")


# --- 6: grad-carry add on the full tree -------------------------------------
g1 = jax.tree.map(lambda x: jnp.zeros_like(x, jnp.float32), params)
g2 = jax.tree.map(lambda x: jnp.ones_like(x, jnp.float32), params)


def carry_add(a, b):
    out = jax.tree.map(lambda u, v: u + 0.5 * v, a, b)
    return tree_sum(out)


record("grad-carry add (fp32 tree)", timeit(carry_add, g1, g2),
       note="paid once per micro in the accum scan")


# --- 7: a bigger micro: mini 16 ---------------------------------------------
if os.environ.get("REFGAP_BIG", "1") == "1":
    toks16 = rng.integers(20, 65000, size=(16, T)).astype(np.int32)
    for r in range(16):
        toks16[r, rng.integers(32, T, size=3)] = obt.EOS_TOKEN
    segs16_np = segment_ids_np(toks16)
    t16, s16 = jnp.asarray(toks16), jnp.asarray(segs16_np)

    def micro16(p, k):
        loss, g = jax.value_and_grad(
            lambda pp: mlm_loss(pp, CFG, t16, s16, k)[0])(p)
        return loss + tree_sum(g)

    fpt_exec16 = flops_per_token_executed(n_body, L, D, T,
                                          segments=segs16_np,
                                          attn_impl="flash")
    record("micro_full mini=16", timeit(micro16, params_bf16, key, n=4),
           flops=fpt_exec16 * 16 * T, note="executed-FLOPs rate")

results["config"] = {"layers": L, "embd": D, "heads": H, "ctx": T,
                     "mini": MINI, "fpt_nominal": fpt_nom,
                     "fpt_executed": fpt_exec,
                     "flops_ratio_e": round(fpt_exec / fpt_nom, 4)}
with open("/tmp/refgap.json", "w") as f:
    json.dump(results, f, indent=1)
print("\nwrote /tmp/refgap.json")
