"""Step-level training-dynamics parity vs the PyTorch reference
(r2 VERDICT #8): 5 fp32 train steps on identical batches and mask streams.

Our side: the production optax chain (training/optim.py make_optimizer —
clip 1.0 -> Adam -> µP wd -> per-leaf -lr(t)·mult with LinearLR decay).
Reference side: torch AdamW with mup.MuAdamW's documented grouping
(matrix-like hidden weights get lr/width_mult and — mup's default
decoupled_wd=False — wd*width_mult; everything else full lr/wd), MuReadout's
1/width_mult forward scale, LinearLR(start=1.0, end=0.0), and
clip_grad_norm_(1.0), exactly as wired at
/root/reference/training/train_encoder.py:193-201,273-318.

The torch optimizer groups here are built from µP's documented semantics,
NOT from our mup.py classification — so this is an executable check that
our static classification matches mup's behaviour, not a tautology.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from omnibiote_tpu import OmniBioTAConfig, TrainConfig
from omnibiote_tpu.models.omnibiota import forward
from omnibiote_tpu.training.optim import make_optimizer, scaled_lr
from omnibiote_tpu.utils.torch_convert import params_from_torch_state
from reference_oracle import build_reference

CFG_KW = dict(block_size=64, vocab_size=128, n_layer=2, n_head=4, n_embd=32,
              dropout=0.0, bias=False, autoregressive=False,
              checkpoint_freq=0)
WIDTH_BASE = 16          # width_mult = 2: the µP grouping actually bites
MASK_TOKEN = 2
N_STEPS = 5
TOTAL_ITERS = 20
BATCH, T = 8, 64


def _batches_and_masks():
    rng = np.random.default_rng(123)
    out = []
    for _ in range(N_STEPS):
        toks = rng.integers(4, CFG_KW["vocab_size"],
                            size=(BATCH, T)).astype(np.int64)
        mask = rng.random((BATCH, T)) < 0.15
        out.append((toks, mask))
    return out


def test_training_dynamics_match_reference():
    width_mult = CFG_KW["n_embd"] / WIDTH_BASE
    ref_m, _ = build_reference(CFG_KW, seed=0)
    ref_m = ref_m.train()
    # mup.MuReadout forwards output_mult * x / width_mult; the oracle stub is
    # a plain Linear, so reproduce the division with a pre-hook
    ref_m.lm_head.register_forward_pre_hook(
        lambda mod, inp: (inp[0] / width_mult,))

    cfg = OmniBioTAConfig(**CFG_KW, attn_impl="xla",
                          compute_dtype="float32", param_dtype="float32",
                          mup_base_n_embd=WIDTH_BASE)
    params = jax.tree.map(
        jnp.asarray, params_from_torch_state(ref_m.state_dict(), cfg))

    tc = TrainConfig(batch_size=BATCH, mini_batch_size=BATCH, ctx_len=T,
                     lr=1e-2,
                     token_budget=float(BATCH * T * TOTAL_ITERS))
    opt = make_optimizer(params, cfg, tc, TOTAL_ITERS)
    opt_state = opt.init(params)
    base_lr = scaled_lr(tc)

    # --- torch optimizer: µP grouping from mup's documented semantics ---
    matrix, others = [], []
    for name, p in ref_m.named_parameters():
        if any(k in name for k in ("attn.c_attn.weight", "attn.c_proj.weight",
                                   "mlp.c_fc.weight", "mlp.c_proj.weight")):
            matrix.append(p)
        else:
            others.append(p)
    topt = torch.optim.AdamW(
        [{"params": others, "lr": base_lr, "weight_decay": 1e-2},
         {"params": matrix, "lr": base_lr / width_mult,
          "weight_decay": 1e-2 * width_mult}],
        betas=(0.9, 0.999), eps=1e-8)
    tsched = torch.optim.lr_scheduler.LinearLR(
        topt, start_factor=1.0, end_factor=0.0, total_iters=TOTAL_ITERS)

    @jax.jit
    def jax_step(params, opt_state, masked_ids, labels, mask):
        def loss_fn(p):
            emb = forward(p, cfg, masked_ids, return_embeddings=True)
            scale = jnp.float32(cfg.mup_output_mult / cfg.width_mult)
            logits = (emb * scale) @ p["lm_head"]
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(logp, labels[..., None], -1)[..., 0]
            return jnp.sum(jnp.where(mask, nll, 0.0)) / jnp.sum(mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    losses_jax, losses_ref = [], []
    for toks, mask in _batches_and_masks():
        masked = np.where(mask, MASK_TOKEN, toks)

        params, opt_state, lj = jax_step(
            params, opt_state, jnp.asarray(masked.astype(np.int32)),
            jnp.asarray(toks.astype(np.int32)), jnp.asarray(mask))
        losses_jax.append(float(lj))

        x = torch.tensor(masked, dtype=torch.long)
        y = torch.tensor(toks, dtype=torch.long)
        m = torch.tensor(mask)
        logits = ref_m.forward(x)
        lr_t = torch.nn.functional.cross_entropy(logits[m], y[m])
        topt.zero_grad()
        lr_t.backward()
        torch.nn.utils.clip_grad_norm_(ref_m.parameters(), 1.0)
        topt.step()
        tsched.step()
        losses_ref.append(float(lr_t.detach()))

    np.testing.assert_allclose(losses_jax, losses_ref, rtol=1e-4, atol=1e-5)

    # final parameters within 1e-4 rtol of the torch run's
    final_ref = jax.tree.map(
        jnp.asarray, params_from_torch_state(ref_m.state_dict(), cfg))
    jax.tree_util.tree_map_with_path(
        lambda path, a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=2e-5,
            err_msg=str(path)),
        params, final_ref)

    # and the parameters actually moved (the comparison is not vacuous)
    delta = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(
        jax.tree.leaves(params),
        jax.tree.leaves(jax.tree.map(
            jnp.asarray,
            params_from_torch_state(build_reference(CFG_KW, seed=0)[0]
                                    .state_dict(), cfg)))))
    assert delta > 1e-4, delta
