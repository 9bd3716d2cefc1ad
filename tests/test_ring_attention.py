"""Ring attention (sequence parallel) vs the full-attention oracle."""
import numpy as np
import jax
import jax.numpy as jnp

from omnibiote_tpu.ops.attention import xla_attention
from omnibiote_tpu.ops.ring_attention import ring_attention
from omnibiote_tpu.parallel.mesh import make_mesh


def _inputs(B=2, T=256, H=2, D=32, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    seg = np.zeros((B, T), np.int32)
    for b in range(B):
        cuts = np.sort(rng.choice(np.arange(16, T - 16), 3, replace=False))
        for i, c in enumerate(cuts):
            seg[b, c:] = i + 1
    return q, k, v, jnp.asarray(seg)


def test_ring_attention_matches_full():
    mesh = make_mesh((8,), axis_names=("data",))
    q, k, v, seg = _inputs()
    scale = 8.0 / 256
    out = ring_attention(q, k, v, seg, scale=scale, mesh=mesh)
    ref = xla_attention(q, k, v, scale=scale, segment_ids=seg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_ring_attention_grads_finite():
    mesh = make_mesh((8,), axis_names=("data",))
    q, k, v, seg = _inputs(seed=1)
    scale = 8.0 / 256

    def loss(q, k, v):
        o = ring_attention(q, k, v, seg, scale=scale, mesh=mesh)
        return jnp.sum(o ** 2)

    def loss_ref(q, k, v):
        o = xla_attention(q, k, v, scale=scale, segment_ids=seg)
        return jnp.sum(o ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, n in zip(g, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4,
                                   err_msg=f"d{n}")


def test_model_forward_with_ring_attention():
    """Full model forward with attn_impl='ring' over a T-sharded input
    matches the XLA-attention forward."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from omnibiote_tpu import OmniBioTAConfig, init_params
    from omnibiote_tpu.models.omnibiota import forward
    from omnibiote_tpu.ops.segments import segment_ids_jnp

    mesh = make_mesh((8,), axis_names=("data",))
    cfg = OmniBioTAConfig(n_layer=2, n_head=2, n_embd=64, vocab_size=256,
                          block_size=256, dropout=0.0, attn_impl="xla",
                          compute_dtype="float32")
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    idx = rng.integers(4, 250, size=(2, 256)).astype(np.int32)
    idx[:, 97] = 3
    idx[:, 201] = 3
    idx_j = jnp.asarray(idx)
    seg = segment_ids_jnp(idx_j)
    ref = forward(params, cfg, idx_j, segment_ids=seg,
                  return_embeddings=True)

    cfg_ring = cfg.replace(attn_impl="ring")
    shard = NamedSharding(mesh, P(None, "data"))
    idx_s = jax.device_put(idx_j, shard)
    seg_s = jax.device_put(seg, shard)
    out = jax.jit(
        lambda p, i, s: forward(p, cfg_ring, i, segment_ids=s,
                                return_embeddings=True,
                                ring_mesh=mesh))(params, idx_s, seg_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_sp_training_step():
    """Sequence-parallel training: T sharded over the mesh, ring attention,
    dense CE; loss matches the data-parallel (replicated-compute) step."""
    from omnibiote_tpu import OmniBioTAConfig, TrainConfig, EOS_TOKEN
    from omnibiote_tpu.training.train import Trainer
    from omnibiote_tpu.ops.segments import segment_ids_np

    rng = np.random.default_rng(0)

    def batches():
        while True:
            toks = rng.integers(4, 250, size=(4, 256)).astype(np.int32)
            toks[:, 100] = EOS_TOKEN
            yield {"tokens": toks, "segments": segment_ids_np(toks)}

    cfg_sp = OmniBioTAConfig(n_layer=2, n_head=2, n_embd=64, vocab_size=256,
                             block_size=256, dropout=0.0, attn_impl="ring",
                             compute_dtype="float32", mup_base_n_embd=32)
    mesh = make_mesh((8,), axis_names=("data",))
    tc = TrainConfig(batch_size=4, mini_batch_size=2, ctx_len=256, lr=1e-2,
                     token_budget=4 * 256 * 100.0, seed=0, sharding="sp")
    tr = Trainer(cfg_sp, tc, batch_iter=batches(), mesh=mesh)
    losses_sp = [float(tr.train_step_once()["loss"]) for _ in range(3)]
    assert all(np.isfinite(l) for l in losses_sp)

    # dp reference on the same data stream (fresh identical rng)
    rng = np.random.default_rng(0)
    cfg_dp = cfg_sp.replace(attn_impl="xla")
    tc_dp = tc.replace(sharding="replicated", mini_batch_size=4,
                       batch_size=32)  # 4 rows/slot * 8 devices... no:
    # use a single-device mesh so shapes match the sp run exactly
    mesh1 = make_mesh((1,), devices=jax.devices()[:1])
    tc_dp = tc.replace(sharding="replicated")
    tr_dp = Trainer(cfg_dp, tc_dp, batch_iter=batches(), mesh=mesh1)
    losses_dp = [float(tr_dp.train_step_once()["loss"]) for _ in range(3)]
    np.testing.assert_allclose(losses_sp, losses_dp, rtol=2e-4, atol=2e-4)


def test_ring_attention_dropout():
    """Ring dropout: deterministic per rng, unbiased-ish, grads finite, and
    a dropout-active sp train step runs."""
    mesh = make_mesh((8,), axis_names=("data",))
    q, k, v, seg = _inputs(B=1, T=256, H=2, D=32, seed=5)
    scale = 8.0 / 256
    rng = jax.random.key(3, impl="rbg")
    o1 = ring_attention(q, k, v, seg, scale=scale, mesh=mesh,
                        dropout_rate=0.3, dropout_rng=rng)
    o2 = ring_attention(q, k, v, seg, scale=scale, mesh=mesh,
                        dropout_rate=0.3, dropout_rng=rng)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    ref = xla_attention(q, k, v, scale=scale, segment_ids=seg)
    assert np.abs(np.asarray(o1) - np.asarray(ref)).max() > 1e-4  # dropout on
    assert abs(float(jnp.mean(o1)) - float(jnp.mean(ref))) < 0.05

    g = jax.grad(lambda qq: jnp.sum(ring_attention(
        qq, k, v, seg, scale=scale, mesh=mesh, dropout_rate=0.3,
        dropout_rng=rng) ** 2))(q)
    assert np.isfinite(np.asarray(g)).all()

    # dropout-active sp training step
    from omnibiote_tpu import OmniBioTAConfig, TrainConfig, EOS_TOKEN
    from omnibiote_tpu.training.train import Trainer
    from omnibiote_tpu.ops.segments import segment_ids_np
    rng_np = np.random.default_rng(0)

    def batches():
        while True:
            toks = rng_np.integers(4, 250, size=(2, 256)).astype(np.int32)
            toks[:, 100] = EOS_TOKEN
            yield {"tokens": toks, "segments": segment_ids_np(toks)}

    cfg = OmniBioTAConfig(n_layer=1, n_head=2, n_embd=64, vocab_size=256,
                          block_size=256, dropout=0.1, attn_impl="ring",
                          compute_dtype="float32", mup_base_n_embd=32)
    tc = TrainConfig(batch_size=2, mini_batch_size=2, ctx_len=256, lr=1e-2,
                     token_budget=2 * 256 * 50.0, seed=0, sharding="sp")
    tr = Trainer(cfg, tc, batch_iter=batches(), mesh=mesh)
    assert np.isfinite(float(tr.train_step_once()["loss"]))


def test_ring_dropout_uses_full_rbg_key():
    """Regression (round-1 ADVICE): rbg keys carry 4 words; the old path
    jnp.resize'd key data to (2,), silently dropping half the key material,
    so keys differing only in the upper words produced identical dropout."""
    mesh = make_mesh((8,), axis_names=("data",))
    q, k, v, seg = _inputs(B=1, T=256, H=2, D=32, seed=9)
    kd1 = np.zeros(4, np.uint32)
    kd2 = kd1.copy()
    kd2[3] = 12345  # differs ONLY in a word the old code truncated away
    k1 = jax.random.wrap_key_data(jnp.asarray(kd1), impl="rbg")
    k2 = jax.random.wrap_key_data(jnp.asarray(kd2), impl="rbg")
    o1 = ring_attention(q, k, v, seg, scale=0.1, mesh=mesh,
                        dropout_rate=0.3, dropout_rng=k1)
    o2 = ring_attention(q, k, v, seg, scale=0.1, mesh=mesh,
                        dropout_rate=0.3, dropout_rng=k2)
    assert float(jnp.abs(o1 - o2).max()) > 1e-5


def test_ring_flash_body_matches_oracle_with_grads():
    """The Pallas-kernel ring body (per-rotation _flash_mh_lse + stable
    (o, lse) recombination) matches the dense oracle, forward and dq, on a
    4-shard mesh. Exercises the lse-differentiable flash VJP."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from omnibiote_tpu.parallel.mesh import make_mesh
    from omnibiote_tpu.ops.ring_attention import ring_attention
    from omnibiote_tpu.ops.attention import xla_attention
    from omnibiote_tpu.ops.segments import segment_ids_np

    B, T, H, D = 1, 512, 2, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    toks = rng.integers(20, 65000, size=(B, T)).astype(np.int32)
    toks[0, 200] = 3
    toks[0, 400] = 3
    segs = jnp.asarray(segment_ids_np(toks))
    scale = 8.0 / 1024
    mesh = make_mesh((4,), axis_names=("data",), devices=jax.devices()[:4])
    shard = NamedSharding(mesh, P(None, "data", None, None))
    qs, ks, vs = (jax.device_put(x, shard) for x in (q, k, v))
    seg_s = jax.device_put(segs, NamedSharding(mesh, P(None, "data")))

    ref = xla_attention(q, k, v, scale=scale, segment_ids=segs)
    out = jax.jit(lambda q, k, v, s: ring_attention(
        q, k, v, s, scale=scale, mesh=mesh, use_flash=True))(qs, ks, vs,
                                                             seg_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-3, atol=3e-3)

    g = jax.grad(lambda q: jnp.sum(ring_attention(
        q, ks, vs, seg_s, scale=scale, mesh=mesh, use_flash=True) ** 2))(qs)
    g_ref = jax.grad(lambda q: jnp.sum(xla_attention(
        q, k, v, scale=scale, segment_ids=segs) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=2e-2, atol=2e-4)
