"""Training loop tests on the 8-device virtual CPU mesh: sharded step,
MLM convergence, batch ramp, checkpoint/resume equivalence."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from omnibiote_tpu import OmniBioTAConfig, TrainConfig, EOS_TOKEN
from omnibiote_tpu.training.train import (
    Trainer, effective_batch_size)
from omnibiote_tpu.training.mlm import make_mlm_mask, mlm_loss
from omnibiote_tpu.parallel.mesh import make_mesh


MODEL = OmniBioTAConfig(
    n_layer=2, n_head=2, n_embd=32, vocab_size=64, block_size=32,
    dropout=0.0, attn_impl="xla", compute_dtype="float32",
    mup_base_n_embd=16)


def synth_batches(batch_size, ctx_len, vocab=64, seed=0):
    """Infinite stream of structured batches: token t+1 follows t within
    segments, so MLM is learnable."""
    rng = np.random.default_rng(seed)

    def gen():
        while True:
            rows = []
            for _ in range(batch_size):
                row = []
                while len(row) < ctx_len:
                    start = int(rng.integers(4, vocab - 12))
                    ln = int(rng.integers(4, 10))
                    row.extend(range(start, start + ln))
                    row.append(EOS_TOKEN)
                rows.append(row[:ctx_len])
            toks = np.asarray(rows, np.int32)
            from omnibiote_tpu.ops.segments import segment_ids_np
            yield {"tokens": toks, "segments": segment_ids_np(toks)}

    return gen()


def test_mlm_mask_semantics():
    rng = jax.random.PRNGKey(0)
    toks = jnp.asarray([[1, 3, 5, 5, 5, 5, 5, 5]], jnp.int32)  # PAD, EOS, data
    mask = make_mlm_mask(rng, jnp.tile(toks, (64, 1)), mask_prob=0.5)
    m = np.asarray(mask)
    assert not m[:, 0].any()  # PAD never masked
    assert not m[:, 1].any()  # EOS never masked
    frac = m[:, 2:].mean()
    assert 0.3 < frac < 0.7


def test_compaction_onehot_matches_searchsorted_oracle():
    """The one-hot compaction (MXU contraction path) agrees with the
    searchsorted order build it replaced, on valid slots, including the
    leading-dims form the sequence-parallel branch uses."""
    from omnibiote_tpu.training.mlm import _gather_masked, _masked_order

    rng = np.random.default_rng(7)
    for B, T, cap in ((4, 64, 16), (3, 128, 8)):
        emb = jnp.asarray(rng.standard_normal((B, T, 16)), jnp.float32)
        toks = jnp.asarray(rng.integers(0, 2 ** 16, (B, T)), jnp.int32)
        # include an all-unmasked row and a row overflowing capacity
        m = rng.random((B, T)) < 0.2
        m[0] = False
        m[1] = True
        mask = jnp.asarray(m)
        g, l, v = _gather_masked(emb, toks, mask, cap)
        order, v0 = _masked_order(mask, cap)
        np.testing.assert_array_equal(np.asarray(v), np.asarray(v0))
        l0 = np.take_along_axis(np.asarray(toks), np.asarray(order), -1)
        g0 = np.take_along_axis(np.asarray(emb),
                                np.asarray(order)[:, :, None], 1)
        vv = np.asarray(v)
        np.testing.assert_array_equal(np.asarray(l)[vv], l0[vv])
        np.testing.assert_allclose(np.asarray(g)[vv], g0[vv], rtol=0)
        # invalid slots are zeros by construction
        assert not np.asarray(l)[~vv].any()
        assert not np.asarray(g)[~vv].any()
        # leading-dims (sequence-parallel block) form
        gb, lb, vb = _gather_masked(
            emb.reshape(B, 2, T // 2, 16), toks.reshape(B, 2, T // 2),
            mask.reshape(B, 2, T // 2), cap // 2)
        assert gb.shape == (B, 2, cap // 2, 16)
        assert lb.shape == vb.shape == (B, 2, cap // 2)


def test_mlm_loss_matches_full_logits():
    """The compacted-gather CE equals a dense full-logits masked CE."""
    params_rng = jax.random.PRNGKey(1)
    from omnibiote_tpu.models.omnibiota import init_params, forward
    params = init_params(params_rng, MODEL)
    batch = next(synth_batches(4, 32))
    toks = jnp.asarray(batch["tokens"])
    segs = jnp.asarray(batch["segments"])
    rng = jax.random.PRNGKey(2)

    loss, aux = mlm_loss(params, MODEL, toks, segs, rng, deterministic=True)

    # dense reference
    rng_mask, _ = jax.random.split(rng)
    mask = make_mlm_mask(rng_mask, toks, 0.15)
    masked = jnp.where(mask, 2, toks)
    emb = forward(params, MODEL, masked, segment_ids=segs,
                  return_embeddings=True)
    scale = MODEL.mup_output_mult / MODEL.width_mult
    logits = (emb * scale) @ params["lm_head"]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, toks[..., None], axis=-1)[..., 0]
    dense = jnp.sum(jnp.where(mask, nll, 0)) / jnp.maximum(mask.sum(), 1)

    np.testing.assert_allclose(float(loss), float(dense), rtol=1e-5)
    assert int(aux["masked_count"]) == int(mask.sum())


def test_batch_ramp_schedule():
    tc = TrainConfig(batch_size=64, mini_batch_size=8, batch_ramp=True,
                     warmup_period=0.5)
    sizes = [effective_batch_size(i, 100, tc, global_micro=8)
             for i in range(0, 101, 10)]
    assert sizes[0] == 8
    assert sizes[-1] == 64
    assert all(a <= b for a, b in zip(sizes, sizes[1:]))
    assert all(s % 8 == 0 for s in sizes)
    # no ramp: always full
    tc2 = tc.replace(batch_ramp=False)
    assert effective_batch_size(0, 100, tc2, 8) == 64
    # degenerate ramp windows are 'ramp complete', not ZeroDivisionError
    # (r4 review): warmup_period=0 and total_iters=0 both say full batch
    assert effective_batch_size(0, 100, tc.replace(warmup_period=0.0),
                                8) == 64
    assert effective_batch_size(0, 0, tc, 8) == 64


def test_opt_state_specs_positional_not_shape_keyed():
    """shard_opt_state_like must give each Adam moment ITS parameter's
    spec: shape-keyed matching handed every same-shaped parameter the
    first one's spec (r4 review)."""
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from omnibiote_tpu.parallel.mesh import make_mesh
    from omnibiote_tpu.parallel.sharding import shard_opt_state_like

    mesh = make_mesh((4, 2), axis_names=("data", "model"))
    params = {"a": jnp.zeros((8, 8)), "b": jnp.zeros((8, 8))}
    specs = {"a": P("data", None), "b": P(None, "model")}
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    placed = shard_opt_state_like(opt_state, params, specs, mesh)
    mu = placed[0].mu
    assert mu["a"].sharding == NamedSharding(mesh, P("data", None))
    assert mu["b"].sharding == NamedSharding(mesh, P(None, "model")), (
        "same-shaped param got the first param's spec")


@pytest.fixture(scope="module")
def trained():
    assert len(jax.devices()) == 8, "conftest should provide 8 CPU devices"
    tc = TrainConfig(
        batch_size=32, mini_batch_size=2, ctx_len=32, lr=1e-2,
        token_budget=32 * 32 * 300, seed=0, save_dir="/tmp/obt_ckpt_test")
    trainer = Trainer(MODEL, tc, batch_iter=synth_batches(32, 32))
    losses = []
    trainer.run(max_steps=60, on_metrics=lambda r: losses.append(r["loss"]))
    return trainer, losses


def test_training_loss_decreases(trained):
    _, losses = trained
    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert last < first * 0.8, (first, last)


def test_step_runs_on_mesh(trained):
    trainer, _ = trained
    assert trainer.mesh.devices.size == 8
    # params replicated across the mesh
    leaf = jax.tree.leaves(trainer.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_checkpoint_resume_exact(trained, tmp_path):
    """Save, continue 3 steps; restore, continue 3 steps; identical params."""
    trainer, _ = trained
    trainer.train_cfg = trainer.train_cfg.replace(save_dir=str(tmp_path))
    path = trainer.save_checkpoint()

    # branch A: continue in place
    batches_a = synth_batches(32, 32, seed=99)
    trainer.batch_iter = batches_a
    rng_before = np.asarray(jax.random.key_data(trainer.rng))
    for _ in range(3):
        trainer.train_step_once()
    params_a = jax.device_get(trainer.params)
    step_a = trainer.step

    # branch B: fresh trainer restored from the checkpoint
    tc = trainer.train_cfg
    t2 = Trainer(MODEL, tc, batch_iter=synth_batches(32, 32, seed=99))
    t2.restore_checkpoint(path)
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(t2.rng)), rng_before)
    for _ in range(3):
        t2.train_step_once()
    params_b = jax.device_get(t2.params)

    assert t2.step == step_a
    flat_a = jax.tree.leaves(params_a)
    flat_b = jax.tree.leaves(params_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_clears_stale_tmp(trained, tmp_path):
    """A crashed earlier save's leftovers in <name>.tmp must not be renamed
    into the new checkpoint: a stale params.npz would silently shadow fresh
    pod shard files at restore (checkpoint.py save_checkpoint)."""
    trainer, _ = trained
    trainer.train_cfg = trainer.train_cfg.replace(save_dir=str(tmp_path))
    name = f"{trainer.train_cfg.save_name}_{int(trainer.trained_tokens)}"
    stale_tmp = tmp_path / (name + ".tmp")
    stale_tmp.mkdir()
    (stale_tmp / "params.shard0of2.npz").write_bytes(b"stale shard")
    (stale_tmp / "junk.txt").write_text("crashed run leftover")

    path = trainer.save_checkpoint()
    names = sorted(os.listdir(path))
    assert "junk.txt" not in names and "params.shard0of2.npz" not in names
    assert {"params.npz", "opt_state.npz", "meta.json"} <= set(names)

    t2 = Trainer(MODEL, trainer.train_cfg,
                 batch_iter=synth_batches(32, 32, seed=99))
    t2.restore_checkpoint(path)
    for a, b in zip(jax.tree.leaves(jax.device_get(trainer.params)),
                    jax.tree.leaves(jax.device_get(t2.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_eval_step(trained):
    trainer, _ = trained
    batch = next(synth_batches(16, 32, seed=5))
    loss = trainer.eval_loss(batch["tokens"], batch["segments"])
    assert np.isfinite(loss) and loss > 0


def test_fsdp_sharding_mode():
    """ZeRO-style sharding: params/opt state sharded over the data axis,
    training still converges to the same place as replicated mode."""
    from omnibiote_tpu.parallel.sharding import param_pspecs
    from jax.sharding import PartitionSpec as P

    tc = TrainConfig(batch_size=16, mini_batch_size=2, ctx_len=32, lr=1e-2,
                     token_budget=16 * 32 * 100.0, seed=0, sharding="fsdp")
    tr = Trainer(MODEL, tc, batch_iter=synth_batches(16, 32, seed=11))
    # params actually sharded (wte (64, 32): dim0 divisible by 8)
    wte_shard = tr.params["wte"].sharding
    assert not wte_shard.is_fully_replicated
    # optimizer moments share the param sharding
    mu_leaves = [l for l in jax.tree.leaves(tr.opt_state)
                 if hasattr(l, "shape") and l.shape == tr.params["wte"].shape]
    assert mu_leaves and not mu_leaves[0].sharding.is_fully_replicated

    losses_f = []
    tr.run(max_steps=10, on_metrics=lambda r: losses_f.append(r["loss"]))

    tc_r = tc.replace(sharding="replicated")
    tr_r = Trainer(MODEL, tc_r, batch_iter=synth_batches(16, 32, seed=11))
    losses_r = []
    tr_r.run(max_steps=10, on_metrics=lambda r: losses_r.append(r["loss"]))
    np.testing.assert_allclose(losses_f, losses_r, rtol=1e-4, atol=1e-5)


def test_tp_param_specs_and_forward():
    """Tensor-parallel specs split attention/MLP projections over 'model';
    forward under a 2D mesh matches the single-device result."""
    from omnibiote_tpu.parallel.mesh import make_mesh
    from omnibiote_tpu.parallel.sharding import shard_params
    from omnibiote_tpu.models.omnibiota import init_params, forward
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = MODEL
    params = init_params(jax.random.PRNGKey(0), cfg)
    idx = jnp.asarray(
        np.random.default_rng(0).integers(4, 60, size=(4, 32)), jnp.int32)
    ref = forward(params, cfg, idx, return_embeddings=True)

    mesh = make_mesh((2, 4), axis_names=("data", "model"))
    tp_params, specs = shard_params(params, "tp", mesh)
    assert specs["blocks"]["attn"]["wqkv"] == P(None, None, "model")
    assert specs["blocks"]["attn"]["wo"] == P(None, "model", None)
    assert specs["blocks"]["mlp"]["wi"] == P(None, None, "model")
    assert specs["blocks"]["mlp"]["wo"] == P(None, "model", None)
    assert specs["lm_head"] == P(None, "model")
    assert specs["wte"] == P()

    out = jax.jit(lambda p, i: forward(p, cfg, i, return_embeddings=True))(
        tp_params, jax.device_put(idx, NamedSharding(mesh, P())))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_tp_training_step_on_2d_mesh():
    """Full train step with sharding='fsdp+tp' over a (data=4, model=2)
    mesh: runs, loss finite, matrix params sharded over 'model'."""
    from omnibiote_tpu.parallel.mesh import make_mesh

    mesh = make_mesh((4, 2), axis_names=("data", "model"))
    tc = TrainConfig(batch_size=8, mini_batch_size=1, ctx_len=32, lr=1e-2,
                     token_budget=8 * 32 * 100.0, seed=0, sharding="fsdp+tp")
    tr = Trainer(MODEL, tc, batch_iter=synth_batches(8, 32, seed=3),
                 mesh=mesh)
    wqkv = tr.params["blocks"]["attn"]["wqkv"]
    assert "model" in str(wqkv.sharding.spec)
    m = tr.train_step_once()
    assert np.isfinite(float(m["loss"]))


def test_tp_forward_with_sharded_flash_kernel():
    """TP forward using the head-sharded Pallas kernel (tp_mesh threading)
    matches the replicated XLA forward."""
    from omnibiote_tpu.parallel.mesh import make_mesh
    from omnibiote_tpu.parallel.sharding import shard_params
    from omnibiote_tpu.models.omnibiota import init_params, forward
    from omnibiote_tpu.ops.segments import segment_ids_jnp

    cfg = OmniBioTAConfig(n_layer=2, n_head=8, n_embd=64, vocab_size=128,
                          block_size=128, dropout=0.0, attn_impl="flash",
                          compute_dtype="float32")
    params = init_params(jax.random.PRNGKey(0), cfg)
    idx = jnp.asarray(
        np.random.default_rng(2).integers(4, 120, size=(2, 128)), jnp.int32)
    idx = idx.at[:, 60].set(3)
    seg = segment_ids_jnp(idx)
    ref = forward(params, cfg.replace(attn_impl="xla"), idx, segment_ids=seg,
                  return_embeddings=True)

    mesh = make_mesh((1, 8), axis_names=("data", "model"))
    tp_params, _ = shard_params(params, "tp", mesh)
    out = jax.jit(lambda p, i, s: forward(
        p, cfg, i, segment_ids=s, return_embeddings=True,
        tp_mesh=mesh))(tp_params, idx, seg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_tp_training_threads_sharded_kernel():
    """Regression (round-1 ADVICE): Trainer must thread the tp mesh into the
    train step so attention runs the head-sharded flash kernel, and must
    build the 2D mesh from TrainConfig.mesh_shape (no explicit mesh arg).
    Loss must match the replicated xla-attention trainer on the same data."""
    cfg = OmniBioTAConfig(
        n_layer=1, n_head=8, n_embd=64, vocab_size=64, block_size=128,
        dropout=0.0, attn_impl="flash", compute_dtype="float32",
        mup_base_n_embd=16)
    tc = TrainConfig(batch_size=4, mini_batch_size=2, ctx_len=128, lr=1e-2,
                     token_budget=4 * 128 * 50.0, seed=0, sharding="tp",
                     mesh_shape=(2, 4))
    tr = Trainer(cfg, tc, batch_iter=synth_batches(4, 128, seed=21))
    assert dict(zip(tr.mesh.axis_names,
                    tr.mesh.devices.shape)) == {"data": 2, "model": 4}
    assert tr.global_micro == 4  # mini(2) * n_data(2), NOT * 8 devices
    loss_tp = float(tr.train_step_once()["loss"])

    # same data-parallel degree (2) so the accumulation structure — and
    # hence the per-slot MLM rngs — line up with the tp run
    cfg_r = cfg.replace(attn_impl="xla")
    tc_r = tc.replace(sharding="replicated", mesh_shape=None)
    mesh_r = make_mesh((2,), devices=jax.devices()[:2])
    tr_r = Trainer(cfg_r, tc_r, batch_iter=synth_batches(4, 128, seed=21),
                   mesh=mesh_r)
    loss_r = float(tr_r.train_step_once()["loss"])
    np.testing.assert_allclose(loss_tp, loss_r, rtol=1e-4)


def test_prefetched_staging_matches_inline():
    """prefetch>0 moves the whole staging (row buffering, (A,micro,T)
    assembly, sharded device_put) into a background thread; losses must be
    identical to the inline path step for step."""
    tc = TrainConfig(batch_size=16, mini_batch_size=2, ctx_len=32, lr=1e-2,
                     token_budget=16 * 32 * 100.0, seed=0, batch_ramp=True,
                     warmup_period=0.2)
    tr_a = Trainer(MODEL, tc, batch_iter=synth_batches(16, 32, seed=13))
    tr_b = Trainer(MODEL, tc, batch_iter=synth_batches(16, 32, seed=13),
                   prefetch=2)
    for _ in range(6):
        la = float(tr_a.train_step_once()["loss"])
        lb = float(tr_b.train_step_once()["loss"])
        np.testing.assert_allclose(la, lb, rtol=1e-6)
    tr_b.close()   # leaked prefetch threads abort interpreter shutdown


def test_sp_long_context_8k():
    """Long-context demonstration (VERDICT #10): sequence-parallel training
    at ctx 8192 on the 8-device mesh — each device holds a 1024-position
    sequence shard, so no device ever materialises a full-length activation
    row (the dp path would need the whole 8k row per device)."""
    cfg = OmniBioTAConfig(n_layer=1, n_head=2, n_embd=32, vocab_size=64,
                          block_size=8192, dropout=0.0, attn_impl="ring",
                          compute_dtype="float32", mup_base_n_embd=16)
    tc = TrainConfig(batch_size=2, mini_batch_size=2, ctx_len=8192, lr=1e-2,
                     token_budget=2 * 8192 * 10.0, seed=0, sharding="sp")
    tr = Trainer(cfg, tc, batch_iter=synth_batches(2, 8192))
    batch, _ = next(tr._staged_iter())
    # the sequence dimension is genuinely sharded: 1024 positions per device
    shard_shapes = {s.data.shape for s in batch["tokens"].addressable_shards}
    assert shard_shapes == {(1, 2, 1024)}, shard_shapes
    tr._staged = None  # hand the staged batch back to a fresh stream
    tr._grand = tr._grand_seg = None
    m = tr.train_step_once()
    assert np.isfinite(float(m["loss"]))

    # validation probes must work under sp too: eval_step threads the ring
    # mesh like the train step (r4 review: the probe hit attention()'s
    # "impl='ring' requires ring_mesh" assert and killed sp runs), and
    # eval_loss must not consume the TRAINING rng stream
    rng_before = np.asarray(jax.random.key_data(tr.rng))
    vb = next(synth_batches(2, 8192, seed=3))
    vloss = tr.eval_loss(vb["tokens"], vb["segments"])
    assert np.isfinite(vloss)
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(tr.rng)), rng_before)


def test_pp_pipeline_matches_dp():
    """Pipeline parallelism (GPipe schedule over a 'stage' mesh axis):
    layer slices sharded per stage, microbatches flowing via ppermute.
    Losses must track the dp accumulation path step for step (same rng
    stream — parallel/pipeline.py mirrors the per-micro key discipline)."""
    from jax.sharding import PartitionSpec as P

    cfg = MODEL.replace(n_layer=4)
    tc = TrainConfig(batch_size=8, mini_batch_size=2, ctx_len=32, lr=1e-2,
                     token_budget=8 * 32 * 100.0, seed=0, sharding="pp",
                     mesh_shape=(4,))
    tr = Trainer(cfg, tc, batch_iter=synth_batches(8, 32, seed=17))
    assert tuple(tr.mesh.axis_names) == ("stage",)
    # layer stack actually sharded over the stage axis
    wqkv = tr.params["blocks"]["attn"]["wqkv"]
    assert not wqkv.sharding.is_fully_replicated

    losses_pp = []
    tr.run(max_steps=6, on_metrics=lambda r: losses_pp.append(r["loss"]))

    tc_r = tc.replace(sharding="replicated", mesh_shape=None)
    tr_r = Trainer(cfg, tc_r, batch_iter=synth_batches(8, 32, seed=17),
                   mesh=make_mesh((1,), axis_names=("data",),
                                  devices=jax.devices()[:1]))
    losses_r = []
    tr_r.run(max_steps=6, on_metrics=lambda r: losses_r.append(r["loss"]))
    np.testing.assert_allclose(losses_pp, losses_r, rtol=1e-4, atol=1e-5)


def test_pp_with_dropout_matches_dp_stream():
    """With dropout on, pp reproduces the dp path's exact mask/dropout
    streams (same per-micro fold_in/split discipline), so losses are
    bit-comparable, not just statistically similar."""
    cfg = MODEL.replace(n_layer=2, dropout=0.1)
    tc = TrainConfig(batch_size=4, mini_batch_size=2, ctx_len=32, lr=1e-2,
                     token_budget=4 * 32 * 50.0, seed=3, sharding="pp",
                     mesh_shape=(2,))
    tr = Trainer(cfg, tc, batch_iter=synth_batches(4, 32, seed=23))
    losses_pp = [float(tr.train_step_once()["loss"]) for _ in range(3)]

    tc_r = tc.replace(sharding="replicated", mesh_shape=None)
    tr_r = Trainer(cfg, tc_r, batch_iter=synth_batches(4, 32, seed=23),
                   mesh=make_mesh((1,), axis_names=("data",),
                                  devices=jax.devices()[:1]))
    losses_r = [float(tr_r.train_step_once()["loss"]) for _ in range(3)]
    np.testing.assert_allclose(losses_pp, losses_r, rtol=1e-4, atol=1e-5)


def test_pp_remat_matches_and_shrinks_memory():
    """cfg.checkpoint_freq on the pipeline path: bit-compatible losses and
    gradients (remat recompute is the same math; dropout keys re-derive
    from lk_data deterministically) with a measurably smaller temp
    footprint for the compiled step (XLA memory_analysis) — the backward
    otherwise stores every layer's activations for all M+S-1 ticks."""
    from omnibiote_tpu.parallel.pipeline import pp_mlm_loss, shard_params_pp
    from omnibiote_tpu.models.omnibiota import init_params

    base = MODEL.replace(n_layer=4, dropout=0.1)
    mesh = make_mesh((4,), axis_names=("stage",),
                     devices=jax.devices()[:4])
    M, B, T = 4, 2, 32
    batch = next(synth_batches(M * B, T, seed=41))
    toks = jnp.asarray(batch["tokens"]).reshape(M, B, T)
    segs = jnp.asarray(batch["segments"]).reshape(M, B, T)
    w = jnp.ones((M,), jnp.float32)
    rng = jax.random.PRNGKey(9)

    temps, losses, grads = {}, {}, {}
    for freq in (0, 1):
        cfg = base.replace(checkpoint_freq=freq)
        params, _ = shard_params_pp(
            init_params(jax.random.PRNGKey(1), cfg), mesh)

        def loss_fn(p, cfg=cfg):
            return pp_mlm_loss(p, cfg, toks, segs, w, rng, mesh)[0]

        compiled = jax.jit(jax.value_and_grad(loss_fn)).lower(
            params).compile()
        temps[freq] = compiled.memory_analysis().temp_size_in_bytes
        loss, grad = compiled(params)
        losses[freq] = float(loss)
        grads[freq] = jax.device_get(grad)
    np.testing.assert_allclose(losses[1], losses[0], rtol=1e-6)
    for a, b in zip(jax.tree.leaves(grads[0]), jax.tree.leaves(grads[1])):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5, atol=1e-6)
    assert temps[1] < temps[0], (
        f"remat did not shrink temp memory: {temps[1]} vs {temps[0]}")


def test_async_checkpoint_snapshot_semantics(tmp_path):
    """Async save snapshots device state BEFORE further steps: training 3
    more steps while the writer thread runs must not change what lands on
    disk, and the restore must equal a sync save taken at the same step."""
    tc = TrainConfig(batch_size=16, mini_batch_size=2, ctx_len=32, lr=1e-2,
                     token_budget=16 * 32 * 100.0, seed=0,
                     save_dir=str(tmp_path), async_checkpoint=True)
    tr = Trainer(MODEL, tc, batch_iter=synth_batches(16, 32, seed=31))
    for _ in range(3):
        tr.train_step_once()
    params_at_save = jax.device_get(tr.params)
    path = tr.save_checkpoint()          # async write starts
    for _ in range(3):                   # keep training during the write
        tr.train_step_once()
    tr.wait_for_checkpoint()

    t2 = Trainer(MODEL, tc, batch_iter=synth_batches(16, 32, seed=31))
    t2.restore_checkpoint(path)
    for a, b in zip(jax.tree.leaves(params_at_save),
                    jax.tree.leaves(jax.device_get(t2.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    tr.close()
    t2.close()


def test_dp_pp_composition_matches_dp():
    """2D (data, stage) mesh: batch rows shard over data while layers
    pipeline over stages; per-micro CE normalisation reduces over data
    before normalising, so losses track the pure-dp path exactly
    (deterministic)."""
    cfg = MODEL.replace(n_layer=4)
    tc = TrainConfig(batch_size=8, mini_batch_size=2, ctx_len=32, lr=1e-2,
                     token_budget=8 * 32 * 100.0, seed=0, sharding="pp",
                     mesh_shape=(2, 2))
    tr = Trainer(cfg, tc, batch_iter=synth_batches(8, 32, seed=41))
    assert tuple(tr.mesh.axis_names) == ("data", "stage")
    assert tr.global_micro == 4          # mini 2 x data 2

    losses_pp = []
    tr.run(max_steps=5, on_metrics=lambda r: losses_pp.append(r["loss"]))

    tc_r = tc.replace(sharding="replicated", mesh_shape=None,
                      mini_batch_size=4)
    tr_r = Trainer(cfg, tc_r, batch_iter=synth_batches(8, 32, seed=41),
                   mesh=make_mesh((1,), axis_names=("data",),
                                  devices=jax.devices()[:1]))
    losses_r = []
    tr_r.run(max_steps=5, on_metrics=lambda r: losses_r.append(r["loss"]))
    np.testing.assert_allclose(losses_pp, losses_r, rtol=1e-4, atol=1e-5)


def test_pp_flash_matches_dp_flash():
    """pp under the REAL Pallas kernels (interpret mode on CPU): the
    pipeline's _block goes through the same attention dispatch, so
    attn_impl='flash' must give pp == dp losses — the configuration a
    multi-chip TPU run would actually use (r2 VERDICT #2)."""
    cfg = MODEL.replace(n_layer=2, n_head=1, n_embd=64,
                        attn_impl="flash", block_size=128)
    tc = TrainConfig(batch_size=4, mini_batch_size=2, ctx_len=128, lr=1e-2,
                     token_budget=4 * 128 * 50.0, seed=5, sharding="pp",
                     mesh_shape=(2,))
    tr = Trainer(cfg, tc, batch_iter=synth_batches(4, 128, seed=29))
    losses_pp = [float(tr.train_step_once()["loss"]) for _ in range(3)]

    tc_r = tc.replace(sharding="replicated", mesh_shape=None)
    tr_r = Trainer(cfg, tc_r, batch_iter=synth_batches(4, 128, seed=29),
                   mesh=make_mesh((1,), axis_names=("data",),
                                  devices=jax.devices()[:1]))
    losses_r = [float(tr_r.train_step_once()["loss"]) for _ in range(3)]
    assert all(np.isfinite(l) for l in losses_pp)
    np.testing.assert_allclose(losses_pp, losses_r, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("sharding,mesh_shape",
                         [("pp", (4,)), ("fsdp+pp", (2, 2))])
def test_pp_checkpoint_resume_bitexact(tmp_path, sharding, mesh_shape):
    """pp resume: save mid-run under pipeline sharding, restore into a
    fresh pp Trainer, continue — params bit-identical to an uninterrupted
    run, and still sharded over the stage axis (r2 VERDICT #2). The
    fsdp+pp variant proves the checkpoint path round-trips 2-axis
    (stage x data) sharded params and moments."""
    cfg = MODEL.replace(n_layer=4)
    tc = TrainConfig(batch_size=8, mini_batch_size=2, ctx_len=32, lr=1e-2,
                     token_budget=8 * 32 * 100.0, seed=7, sharding=sharding,
                     mesh_shape=mesh_shape, save_dir=str(tmp_path),
                     save_name="pp")
    tr = Trainer(cfg, tc, batch_iter=synth_batches(8, 32, seed=31))
    for _ in range(2):
        tr.train_step_once()
    path = tr.save_checkpoint()

    # uninterrupted: 2 more steps
    for _ in range(2):
        tr.train_step_once()
    ref_params = jax.device_get(tr.params)

    tr2 = Trainer(cfg, tc, batch_iter=synth_batches(8, 32, seed=31))
    tr2.restore_checkpoint(path)
    assert tr2.step == 2
    # restore re-applied the stage sharding
    assert not tr2.params["blocks"]["attn"]["wqkv"].sharding \
        .is_fully_replicated
    # replay the stream to the checkpoint position (synthetic iterator:
    # skip the rows the first 2 steps consumed)
    for _ in range(2):
        next(tr2._staged_iter())
    tr2._staged = None
    tr2._grand = tr2._grand_seg = None
    for _ in range(2):
        tr2.train_step_once()
    got = jax.device_get(tr2.params)
    jax.tree_util.tree_map_with_path(
        lambda p, a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=str(p)),
        ref_params, got)


def test_dp_sp_composition_2d_mesh():
    """dp x sp on a 2D (data, seq) mesh (r2 VERDICT #3): batch rows shard
    over 'data', the sequence over 'seq', ring attention rotates over the
    seq axis only — and losses track the pure-dp path step for step."""
    cfg = OmniBioTAConfig(n_layer=1, n_head=2, n_embd=32, vocab_size=64,
                          block_size=1024, dropout=0.0, attn_impl="ring",
                          compute_dtype="float32", mup_base_n_embd=16)
    tc = TrainConfig(batch_size=8, mini_batch_size=2, ctx_len=1024, lr=1e-2,
                     token_budget=8 * 1024 * 100.0, seed=0, sharding="sp",
                     mesh_shape=(2, 4))
    tr = Trainer(cfg, tc, batch_iter=synth_batches(8, 1024, seed=41))
    assert tuple(tr.mesh.axis_names) == ("data", "seq")
    assert tr.global_micro == 4 and tr.accum_slots == 2
    batch, _ = next(tr._staged_iter())
    # each device holds a (A, mini, T/S) tile: rows AND sequence sharded
    shard_shapes = {s.data.shape for s in batch["tokens"].addressable_shards}
    assert shard_shapes == {(2, 2, 256)}, shard_shapes
    # the staging probe consumed the stream's first batch: rewind fully
    tr._staged = None
    tr._grand = tr._grand_seg = None
    tr.batch_iter = synth_batches(8, 1024, seed=41)

    losses_sp = [float(tr.train_step_once()["loss"]) for _ in range(4)]

    cfg_r = cfg.replace(attn_impl="xla")
    tc_r = tc.replace(sharding="replicated", mesh_shape=None,
                      mini_batch_size=4)
    tr_r = Trainer(cfg_r, tc_r, batch_iter=synth_batches(8, 1024, seed=41),
                   mesh=make_mesh((1,), axis_names=("data",),
                                  devices=jax.devices()[:1]))
    losses_r = [float(tr_r.train_step_once()["loss"]) for _ in range(4)]
    np.testing.assert_allclose(losses_sp, losses_r, rtol=1e-4, atol=1e-5)


def test_dp_sp_ctx8k_batch_gt1():
    """ctx-8192 dp x sp training with batch > 1 per step on the 8-device
    mesh: two data shards each holding sequence-sharded rows."""
    cfg = OmniBioTAConfig(n_layer=1, n_head=2, n_embd=32, vocab_size=64,
                          block_size=8192, dropout=0.0, attn_impl="ring",
                          compute_dtype="float32", mup_base_n_embd=16)
    tc = TrainConfig(batch_size=4, mini_batch_size=2, ctx_len=8192, lr=1e-2,
                     token_budget=4 * 8192 * 10.0, seed=0, sharding="sp",
                     mesh_shape=(2, 4))
    tr = Trainer(cfg, tc, batch_iter=synth_batches(4, 8192))
    m = tr.train_step_once()
    assert np.isfinite(float(m["loss"]))


def test_mixed_moment_and_grad_dtypes_track_fp32():
    """The 1.07B-on-one-chip memory levers (moment_dtype=bf16 Adam state +
    grad_dtype=bf16 on the A=1 path) keep training dynamics on the fp32
    curve: same data/seed, 20 steps, loss trajectories track within bf16
    rounding and the mixed run converges."""
    tc32 = TrainConfig(batch_size=16, mini_batch_size=2, ctx_len=32, lr=1e-2,
                       token_budget=16 * 32 * 200.0, seed=0)
    tcmx = tc32.replace(moment_dtype="bfloat16", grad_dtype="bfloat16")
    tr32 = Trainer(MODEL, tc32, batch_iter=synth_batches(16, 32, seed=7))
    trmx = Trainer(MODEL, tcmx, batch_iter=synth_batches(16, 32, seed=7))

    l32, lmx = [], []
    for _ in range(20):
        l32.append(float(tr32.train_step_once()["loss"]))
        lmx.append(float(trmx.train_step_once()["loss"]))
    # moments stored bf16: state dtype is what the config asked for
    mu_leaf = jax.tree.leaves(trmx.opt_state[1].mu)[0]
    assert mu_leaf.dtype == jnp.bfloat16
    assert jax.tree.leaves(tr32.opt_state[1].mu)[0].dtype == jnp.float32
    # trajectories track: same first loss (identical fwd), tight early, and
    # both converge to the same neighborhood
    np.testing.assert_allclose(l32[0], lmx[0], rtol=1e-5)
    np.testing.assert_allclose(l32, lmx, rtol=0.05)
    # both curves fall, and the mixed run lands on the fp32 neighborhood
    assert lmx[-1] < lmx[0] and l32[-1] < l32[0]
    assert abs(np.mean(l32[-5:]) - np.mean(lmx[-5:])) < 0.02 * np.mean(
        l32[-5:])


def test_mixed_moment_checkpoint_resume_exact(tmp_path):
    """bf16-moment checkpoints restore bit-exact (state round-trips npz)."""
    tc = TrainConfig(batch_size=16, mini_batch_size=2, ctx_len=32, lr=1e-2,
                     token_budget=16 * 32 * 100.0, seed=0,
                     moment_dtype="bfloat16", grad_dtype="bfloat16",
                     save_dir=str(tmp_path))
    tr = Trainer(MODEL, tc, batch_iter=synth_batches(16, 32, seed=9))
    for _ in range(4):
        tr.train_step_once()
    path = tr.save_checkpoint()
    cont = [float(tr.train_step_once()["loss"]) for _ in range(3)]

    tr2 = Trainer(MODEL, tc, batch_iter=synth_batches(16, 32, seed=9))
    tr2.restore_checkpoint(path)
    # replay the 4 pre-save batches the stream already consumed
    for _ in range(4):
        next(tr2.batch_iter)
    resumed = [float(tr2.train_step_once()["loss"]) for _ in range(3)]
    np.testing.assert_allclose(cont, resumed, rtol=0, atol=0)


def test_mixed_moments_compose_with_fsdp():
    """The bf16-moment memory lever composes with ZeRO-style sharding: the
    pod recipe for large models is fsdp + moment_dtype=bfloat16, and
    shard_opt_state_like maps specs by shape, not dtype (sharding.py:92)."""
    tc = TrainConfig(batch_size=16, mini_batch_size=2, ctx_len=32, lr=1e-2,
                     token_budget=16 * 32 * 100.0, seed=0, sharding="fsdp",
                     moment_dtype="bfloat16")
    tr = Trainer(MODEL, tc, batch_iter=synth_batches(16, 32, seed=13))
    mu_leaves = [l for l in jax.tree.leaves(tr.opt_state[1].mu)
                 if l.shape == tr.params["wte"].shape]
    assert mu_leaves[0].dtype == jnp.bfloat16
    assert not mu_leaves[0].sharding.is_fully_replicated

    losses_f = [float(tr.train_step_once()["loss"]) for _ in range(6)]

    tc_r = tc.replace(sharding="replicated")
    tr_r = Trainer(MODEL, tc_r, batch_iter=synth_batches(16, 32, seed=13))
    losses_r = [float(tr_r.train_step_once()["loss"]) for _ in range(6)]
    # elementwise adam on bf16 moments is deterministic; only the grad
    # reduction order differs between the two meshes
    np.testing.assert_allclose(losses_f, losses_r, rtol=1e-4, atol=1e-5)
    assert losses_f[-1] < losses_f[0]


def test_fsdp_pp_composition_matches_pp():
    """sharding='fsdp+pp' on a 2D (data, stage) mesh: ZeRO-3 over 'data'
    composed with the pipeline. The shard_map in_specs still demand the
    stage-only layout, so jit all-gathers the bf16 compute copy over data
    and its transpose reduce-scatters the grads — losses must track the
    plain pp run bit-for-bit while params AND Adam moments live sharded
    over both mesh axes."""
    cfg = MODEL.replace(n_layer=4)
    tc = TrainConfig(batch_size=8, mini_batch_size=2, ctx_len=32, lr=1e-2,
                     token_budget=8 * 32 * 100.0, seed=0,
                     sharding="fsdp+pp", mesh_shape=(2, 2))
    tr = Trainer(cfg, tc, batch_iter=synth_batches(8, 32, seed=41))
    assert tuple(tr.mesh.axis_names) == ("data", "stage")

    wqkv = tr.params["blocks"]["attn"]["wqkv"]
    spec = wqkv.sharding.spec
    assert "stage" in str(spec) and "data" in str(spec), spec
    assert "data" in str(tr.params["wte"].sharding.spec)
    assert "data" in str(tr.params["lm_head"].sharding.spec)
    # Adam moments mirror the param sharding (shard_opt_state_like):
    # every optimizer leaf of wqkv's shape carries the same 2-axis spec
    moment_like = [l for l in jax.tree.leaves(tr.opt_state)
                   if hasattr(l, "shape") and l.shape == wqkv.shape]
    assert moment_like, "no Adam moment leaves found for wqkv"
    for leaf in moment_like:
        assert "data" in str(leaf.sharding.spec), leaf.sharding.spec

    losses_f = []
    tr.run(max_steps=5, on_metrics=lambda r: losses_f.append(r["loss"]))

    tc_pp = tc.replace(sharding="pp")
    tr_pp = Trainer(cfg, tc_pp, batch_iter=synth_batches(8, 32, seed=41))
    losses_pp = []
    tr_pp.run(max_steps=5, on_metrics=lambda r: losses_pp.append(r["loss"]))
    np.testing.assert_allclose(losses_f, losses_pp, rtol=1e-5, atol=1e-6)


def test_bf16_grad_carry_in_accumulation_scan_tracks_fp32():
    """grad_dtype=bfloat16 with accumulation (A>1) stores the scan's grad
    CARRY in bf16 (the 1.07B accum-64 memory lever; adds are fp32-rounded
    per micro-step): dynamics must track the fp32-carry run."""
    tc32 = TrainConfig(batch_size=32, mini_batch_size=1, ctx_len=32, lr=1e-2,
                       token_budget=32 * 32 * 200.0, seed=0)
    tcmx = tc32.replace(moment_dtype="bfloat16", grad_dtype="bfloat16")
    tr32 = Trainer(MODEL, tc32, batch_iter=synth_batches(32, 32, seed=7))
    trmx = Trainer(MODEL, tcmx, batch_iter=synth_batches(32, 32, seed=7))
    assert tr32.accum_slots > 1            # really on the scan path

    l32, lmx = [], []
    for _ in range(15):
        l32.append(float(tr32.train_step_once()["loss"]))
        lmx.append(float(trmx.train_step_once()["loss"]))
    np.testing.assert_allclose(l32[0], lmx[0], rtol=1e-5)
    np.testing.assert_allclose(l32, lmx, rtol=0.05)
    assert lmx[-1] < lmx[0] and l32[-1] < l32[0]
    assert abs(np.mean(l32[-5:]) - np.mean(lmx[-5:])) < 0.02 * np.mean(
        l32[-5:])
