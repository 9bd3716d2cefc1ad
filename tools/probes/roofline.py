"""Roofline for the flash attention kernel shapes (VERDICT r2 #6).

Measures, at the exact score/accumulate shapes of the multi-head kernel:
  1. pure dot kernel: (block,128)x(128,block) + (block,block)x(block,128)
     chains with the same grid/DMA pattern but NO softmax/mask — the real
     MXU ceiling for this shape family on this chip.
  2. the full fwd kernel for comparison.
  3. fwd+bwd for both.
"""
import functools
import time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import omnibiote_tpu as obt
from omnibiote_tpu.ops.flash_attention import flash_attention, VMEM_LIMIT
from omnibiote_tpu.ops.segments import segment_ids_np

B, T, H, D = 8, 1024, 8, 128
K = 32
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.bfloat16)
toks = rng.integers(20, 65000, size=(B, T)).astype(np.int32)
for r in range(B):
    toks[r, rng.integers(32, T, size=3)] = obt.EOS_TOKEN
segs = jnp.asarray(segment_ids_np(toks))
scale = 8.0 / 1024
FWD_FLOPS = 4 * B * H * T * T * D          # 2 dots: QK^T and PV
BWD_FLOPS = 2.5 * FWD_FLOPS                # dkv (2 dots) + dq (... ) approx
key = jax.random.key(0, impl="rbg")


def timeit(name, f, *args, flops=None, n=10):
    f = jax.jit(f)
    out = f(*args); float(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    float(out)
    dt = (time.time() - t0) / n / K * 1e3
    extra = ""
    if flops:
        tf = flops / dt / 1e9
        extra = f"  -> {tf:6.1f} TF ({tf/197*100:4.1f}% of peak)"
    print(f"{name:52s} {dt:7.3f} ms{extra}", flush=True)


# --------------------------------------------------------------------------
# dots-only kernel: same blocking/DMA as _mh_fwd_kernel, no softmax/mask
# --------------------------------------------------------------------------

def _dots_kernel(q_ref, k_ref, v_ref, o_ref, acc_scr, *, n_head):
    kv_idx = pl.program_id(2)
    n_kv = pl.num_programs(2)
    Dh = q_ref.shape[-1] // n_head

    @pl.when(kv_idx == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    qrows = q_ref[0]
    krows = k_ref[0]
    vrows = v_ref[0]
    dtype = qrows.dtype
    for h in range(n_head):
        sl = slice(h * Dh, (h + 1) * Dh)
        s = jax.lax.dot_general(
            qrows[:, sl], krows[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_scr[:, sl] += jax.lax.dot(
            s.astype(dtype), vrows[:, sl],
            preferred_element_type=jnp.float32)

    @pl.when(kv_idx == n_kv - 1)
    def _store():
        o_ref[0] = acc_scr[...].astype(o_ref.dtype)


def dots_only(qx, block_q, block_kv):
    Bq, Tq, Hh, Dh = qx.shape
    x = qx.reshape(Bq, Tq, Hh * Dh)
    grid = (Bq, Tq // block_q, Tq // block_kv)
    return pl.pallas_call(
        functools.partial(_dots_kernel, n_head=Hh),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, Hh * Dh), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, block_kv, Hh * Dh), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, block_kv, Hh * Dh), lambda b, qi, ki: (b, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, Hh * Dh),
                               lambda b, qi, ki: (b, qi, 0)),
        scratch_shapes=[pltpu.VMEM((block_q, Hh * Dh), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT),
    )(x, x, x).reshape(Bq, Tq, Hh, Dh)


# pure big-matmul reference: one (M,K)x(K,N) at MXU-friendly shape
def big_matmul(a, b):
    return a @ b


def chain(att):
    def f(c, s):
        def body(x, _):
            return att(x, s), None
        out, _ = jax.lax.scan(body, c, None, length=K)
        return jnp.sum(out.astype(jnp.float32))
    return f


def chain_grad(att):
    def f(c, s):
        def body(x, _):
            g = jax.grad(lambda y: jnp.sum(att(y, s).astype(jnp.float32)))(x)
            return g, None
        out, _ = jax.lax.scan(body, c, None, length=K)
        return jnp.sum(out.astype(jnp.float32))
    return f


print(f"== roofline @ B={B} T={T} H={H} D={D} bf16 ==")
# 0. big dense matmul as chip sanity: (4096, 1024) x (1024, 4096)
M = 4096
a = jnp.asarray(rng.standard_normal((M, 1024)), jnp.bfloat16)
bmat = jnp.asarray(rng.standard_normal((1024, M)), jnp.bfloat16)
def mm_chain(a, bmat):
    def body(c, _):
        return (c @ bmat)[:, :1024] * 1e-3, None
    out, _ = jax.lax.scan(body, a, None, length=K)
    return jnp.sum(out.astype(jnp.float32))
timeit("dense (4096x1024)x(1024x4096)", mm_chain, a, bmat,
       flops=2 * M * 1024 * M)

for bq, bkv in [(512, 1024), (512, 512), (1024, 1024), (256, 512)]:
    timeit(f"dots-only fwd bq={bq} bkv={bkv}",
           chain(lambda c, s, bq=bq, bkv=bkv: dots_only(c, bq, bkv)),
           q, segs, flops=FWD_FLOPS)

for bq, bkv in [(512, 1024), (512, 512)]:
    timeit(f"full      fwd bq={bq} bkv={bkv}",
           chain(lambda c, s, bq=bq, bkv=bkv: flash_attention(
               c, c, c, segment_ids=s, scale=scale, block_q=bq,
               block_kv=bkv)), q, segs, flops=FWD_FLOPS)

for bq, bkv in [(512, 1024), (512, 512)]:
    timeit(f"full      f+b bq={bq} bkv={bkv}",
           chain_grad(lambda c, s, bq=bq, bkv=bkv: flash_attention(
               c, c, c, segment_ids=s, scale=scale, block_q=bq,
               block_kv=bkv)), q, segs, flops=FWD_FLOPS + BWD_FLOPS)


# --------------------------------------------------------------------------
# dkv-shaped dots-only: 4 dots per head per tile (s, dp, dv, dk), the
# backward's dkv kernel dot mix; dq-shaped: 3 dots (s, dp, dq)
# --------------------------------------------------------------------------

def _dots_n_kernel(q_ref, k_ref, v_ref, o_ref, acc_scr, *, n_head, n_dots):
    kv_idx = pl.program_id(2)
    n_kv = pl.num_programs(2)
    Dh = q_ref.shape[-1] // n_head

    @pl.when(kv_idx == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    qrows = q_ref[0]
    krows = k_ref[0]
    vrows = v_ref[0]
    dtype = qrows.dtype
    for h in range(n_head):
        sl = slice(h * Dh, (h + 1) * Dh)
        s = jax.lax.dot_general(
            qrows[:, sl], krows[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            qrows[:, sl], vrows[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = s + dp
        sb = s.astype(dtype)
        # K=block_q contraction(s): p^T do / ds^T q style
        a1 = jax.lax.dot_general(
            sb, qrows[:, sl], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)    # (bkv?, Dh) shaped
        if n_dots >= 4:
            a2 = jax.lax.dot_general(
                sb, vrows[:, sl], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            a1 = a1 + a2
        acc_scr[:, sl] += a1[:acc_scr.shape[0]]

    @pl.when(kv_idx == n_kv - 1)
    def _store():
        o_ref[0] = acc_scr[...].astype(o_ref.dtype)


def dots_n(qx, block_q, block_kv, n_dots):
    Bq, Tq, Hh, Dh = qx.shape
    x = qx.reshape(Bq, Tq, Hh * Dh)
    grid = (Bq, Tq // block_q, Tq // block_kv)
    return pl.pallas_call(
        functools.partial(_dots_n_kernel, n_head=Hh, n_dots=n_dots),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, Hh * Dh), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, block_kv, Hh * Dh), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, block_kv, Hh * Dh), lambda b, qi, ki: (b, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, Hh * Dh),
                               lambda b, qi, ki: (b, qi, 0)),
        scratch_shapes=[pltpu.VMEM((block_q, Hh * Dh), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT),
    )(x, x, x).reshape(Bq, Tq, Hh, Dh)


for nd in (3, 4):
    fl = FWD_FLOPS * nd / 2
    timeit(f"dots-only {nd}-dot bq=512 bkv=512",
           chain(lambda c, s, nd=nd: dots_n(c, 512, 512, nd)),
           q, segs, flops=fl)
