"""Roofline part 2: isolate the K=128 score-dot inefficiency.

Variants:
  A. XLA einsum at the exact shapes (batched over B*H) — compiler's rate.
  B. dots-only kernel with k stored PRE-TRANSPOSED (B, H*D, T): score dot
     becomes a standard (bq,128)@(128,bkv) — does Mosaic's implicit
     transpose of the ((1,),(1,)) contraction cost the missing factor?
  C. current orientation for comparison.
"""
import functools
import time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from omnibiote_tpu.ops.flash_attention import VMEM_LIMIT

B, T, H, D = 8, 1024, 8, 128
K = 32
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.bfloat16)
FWD_FLOPS = 4 * B * H * T * T * D
SCORE_FLOPS = 2 * B * H * T * T * D


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
        extra = f"  -> {tf:6.1f} TF"
    print(f"{name:52s} {dt:7.3f} ms{extra}", flush=True)


def chain(fn):
    def f(c):
        def body(x, _):
            return fn(x), None
        out, _ = jax.lax.scan(body, c, None, length=K)
        return jnp.sum(out.astype(jnp.float32))
    return f


# A. XLA rates at the exact shapes
qb = q.transpose(0, 2, 1, 3).reshape(B * H, T, D)          # (BH, T, 128)
def xla_scores(x):
    s = jnp.einsum("btd,bsd->bts", x, x,
                   preferred_element_type=jnp.float32)
    return (s.astype(jnp.bfloat16) @ x)[:, :, :D] * 1e-3
timeit("XLA scores+pv (BH,T,128)", chain(xla_scores), qb, flops=FWD_FLOPS)

def xla_scores_only(x):
    s = jnp.einsum("btd,bsd->bts", x, x,
                   preferred_element_type=jnp.float32)
    return s[:, :, :D].astype(jnp.bfloat16) * 1e-3
timeit("XLA scores only (BH,T,128)", chain(xla_scores_only), qb,
       flops=SCORE_FLOPS)


# B/C. pallas dots-only, k normal vs pre-transposed
def _dots_kernel(q_ref, k_ref, v_ref, o_ref, acc_scr, *, n_head, kt):
    kv_idx = pl.program_id(2)
    n_kv = pl.num_programs(2)
    Dh = q_ref.shape[-1] // n_head

    @pl.when(kv_idx == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    qrows = q_ref[0]
    vrows = v_ref[0]
    dtype = qrows.dtype
    for h in range(n_head):
        sl = slice(h * Dh, (h + 1) * Dh)
        if kt:
            kb = k_ref[0][sl, :]          # (Dh, block_kv)
            s = jax.lax.dot(qrows[:, sl], kb,
                            preferred_element_type=jnp.float32)
        else:
            kb = k_ref[0][:, sl]
            s = jax.lax.dot_general(
                qrows[:, sl], kb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        acc_scr[:, sl] += jax.lax.dot(
            s.astype(dtype), vrows[:, sl],
            preferred_element_type=jnp.float32)

    @pl.when(kv_idx == n_kv - 1)
    def _store():
        o_ref[0] = acc_scr[...].astype(o_ref.dtype)


def dots(qx, block_q, block_kv, kt):
    Bq, Tq, Hh, Dh = qx.shape
    x = qx.reshape(Bq, Tq, Hh * Dh)
    if kt:
        kx = x.transpose(0, 2, 1)     # (B, H*D, T)
        k_spec = pl.BlockSpec((1, Hh * Dh, block_kv),
                              lambda b, qi, ki: (b, 0, ki))
    else:
        kx = x
        k_spec = pl.BlockSpec((1, block_kv, Hh * Dh),
                              lambda b, qi, ki: (b, ki, 0))
    grid = (Bq, Tq // block_q, Tq // block_kv)
    return pl.pallas_call(
        functools.partial(_dots_kernel, n_head=Hh, kt=kt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, Hh * Dh), lambda b, qi, ki: (b, qi, 0)),
            k_spec,
            pl.BlockSpec((1, block_kv, Hh * Dh), lambda b, qi, ki: (b, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, Hh * Dh),
                               lambda b, qi, ki: (b, qi, 0)),
        scratch_shapes=[pltpu.VMEM((block_q, Hh * Dh), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT),
    )(x, kx, x).reshape(Bq, Tq, Hh, Dh)


for kt in (False, True):
    for bq, bkv in [(512, 1024), (512, 512)]:
        timeit(f"dots kt={int(kt)} bq={bq} bkv={bkv}",
               chain(lambda c, kt=kt, bq=bq, bkv=bkv: dots(c, bq, bkv, kt)),
               q, flops=FWD_FLOPS)


# D. scores-only kernels (no pv dot): isolate the score dot's rate
def _sc_kernel(q_ref, k_ref, o_ref, *, n_head, kt):
    Dh = q_ref.shape[-1] // n_head
    qrows = q_ref[0]
    acc = jnp.zeros((qrows.shape[0], o_ref.shape[-1]), jnp.float32)
    for h in range(n_head):
        sl = slice(h * Dh, (h + 1) * Dh)
        if kt:
            s = jax.lax.dot(qrows[:, sl], k_ref[0][sl, :],
                            preferred_element_type=jnp.float32)
        else:
            s = jax.lax.dot_general(
                qrows[:, sl], k_ref[0][:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        acc += s[:, :o_ref.shape[-1]]
    o_ref[0] = acc.astype(o_ref.dtype)


def scores(qx, block_q, block_kv, kt):
    Bq, Tq, Hh, Dh = qx.shape
    x = qx.reshape(Bq, Tq, Hh * Dh)
    if kt:
        kx = x.transpose(0, 2, 1)
        k_spec = pl.BlockSpec((1, Hh * Dh, block_kv),
                              lambda b, qi, ki: (b, 0, ki))
    else:
        kx = x
        k_spec = pl.BlockSpec((1, block_kv, Hh * Dh),
                              lambda b, qi, ki: (b, ki, 0))
    grid = (Bq, Tq // block_q, Tq // block_kv)
    return pl.pallas_call(
        functools.partial(_sc_kernel, n_head=Hh, kt=kt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, Hh * Dh), lambda b, qi, ki: (b, qi, 0)),
            k_spec,
        ],
        out_specs=pl.BlockSpec((1, block_q, Hh * Dh),
                               lambda b, qi, ki: (b, qi, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT),
    )(x, kx).reshape(Bq, Tq, Hh, Dh)


for kt in (False, True):
    timeit(f"scores-only kt={int(kt)} bq=512 bkv=1024",
           chain(lambda c, kt=kt: scores(c, 512, 1024, kt)),
           q, flops=SCORE_FLOPS)
