"""Generic fine-tuning engine for the downstream benchmark suite.

Implements the reference's shared eval skeleton (evals/gue.py:50-260 is the
canonical instance; TAPE.py and proteinGLUE.py repeat it with different
heads):
  * optional domain-adaptive MLM pretraining over task sequences
  * per-task fine-tune: fresh linear head, AdamW with 3 LR groups
    (wte / rest / head@1e-2), OneCycleLR(pct_start=0.05), gradient
    accumulation with uniformly sampled micro-batches
  * periodic validation; best-on-val model selection; final test metrics
    from the best checkpoint
"""
from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import MASK_TOKEN, PAD_TOKEN, OmniBioTAConfig
from ..models.omnibiota import forward
from .common import (
    apply_linear_head, init_linear_head, make_finetune_optimizer, pad_batch,
    linear_to_zero)


# --------------------------------------------------------------------------
# Domain-adaptive MLM pretraining (gue.py:284-335)
# --------------------------------------------------------------------------

def domain_mlm_pretrain(
    params: dict,
    cfg: OmniBioTAConfig,
    tokenized: List[List[int]],
    *,
    num_epochs: int = 4,
    batch_size: int = 32,
    num_accumulation_steps: int = 4,
    lr: float = 1e-3,
    seed: int = 0,
    bucket: int = 128,
    max_len: Optional[int] = None,
    log: Optional[Callable[[dict], None]] = None,
) -> dict:
    """MLM over task sequences. Reference semantics: 15% Bernoulli mask over
    ALL positions (PAD included, gue.py:321-323), CE summed over non-PAD
    targets / non-PAD count / accum steps (gue.py:326); single-group AdamW +
    LinearLR; model stays in eval mode (no dropout — gue.py never calls
    model.train() here)."""
    rng_np = np.random.default_rng(seed)
    num_steps = int(num_epochs * len(tokenized) /
                    (batch_size * num_accumulation_steps))
    tx = optax.adamw(linear_to_zero(lr, num_steps), b1=0.9, b2=0.999,
                     eps=1e-8, weight_decay=1e-2)
    opt_state = tx.init(params)
    eval_cfg = cfg.replace(dropout=0.0)

    @jax.jit
    def grad_step(params, tokens, segments, masked):
        def loss_fn(p):
            emb = forward(p, eval_cfg, masked, segment_ids=segments,
                          deterministic=True, return_embeddings=True)
            scale = jnp.asarray(cfg.mup_output_mult / cfg.width_mult,
                                emb.dtype)
            logits = ((emb * scale) @ p["lm_head"].astype(emb.dtype))
            logits = logits.astype(jnp.float32)
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(logp, tokens[..., None], -1)[..., 0]
            nonpad = tokens != PAD_TOKEN
            return jnp.sum(jnp.where(nonpad, nll, 0.0)) / jnp.maximum(
                nonpad.sum(), 1)
        return jax.value_and_grad(loss_fn)(params)

    @jax.jit
    def apply_updates(params, opt_state, grads):
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    for step in range(num_steps):
        acc = None
        total = 0.0
        for _ in range(num_accumulation_steps):
            idx = rng_np.choice(len(tokenized), min(batch_size, len(tokenized)),
                    replace=False)  # small splits must not crash
            x, seg = pad_batch([tokenized[i] for i in idx], bucket, max_len)
            mask = rng_np.random(x.shape) < 0.15
            masked = np.where(mask, MASK_TOKEN, x)
            loss, grads = grad_step(params, jnp.asarray(x), jnp.asarray(seg),
                                    jnp.asarray(masked))
            grads = jax.tree.map(lambda g: g / num_accumulation_steps, grads)
            acc = grads if acc is None else jax.tree.map(
                jnp.add, acc, grads)
            total += float(loss) / num_accumulation_steps
        params, opt_state = apply_updates(params, opt_state, acc)
        if log:
            log({"phase": "domain_mlm", "step": step, "loss": total})
    return params


# --------------------------------------------------------------------------
# Sequence-classification fine-tune (gue.py:50-260)
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _classify_fwd(eval_cfg, pool):
    """Jitted pooled-classification forward, cached per (config, pooling):
    a jit defined inside _predict_classes re-compiled the encoder for every
    evaluation call x bucket shape (r4 review)."""
    @jax.jit
    def fwd(params, head, tokens, segments):
        emb = forward(params, eval_cfg, tokens, segment_ids=segments,
                      deterministic=True, return_embeddings=True)
        pooled = emb[:, 0] if pool == "first" else emb.mean(axis=1)
        return apply_linear_head(head, pooled)
    return fwd


def _predict_classes(params, head, cfg, tokenized, batch_size, bucket,
                     max_len, pool: str = "first"):
    fwd = _classify_fwd(cfg.replace(dropout=0.0), pool)

    preds = []
    for i in range(0, len(tokenized), batch_size):
        x, seg = pad_batch(tokenized[i:i + batch_size], bucket, max_len)
        logits = fwd(params, head, jnp.asarray(x), jnp.asarray(seg))
        preds += np.asarray(jnp.argmax(logits, -1)).tolist()
    return preds


def finetune_classifier(
    params: dict,
    cfg: OmniBioTAConfig,
    data: Dict[str, Tuple[List[List[int]], np.ndarray]],  # train/val/test
    *,
    num_classes: int,
    num_epochs: int = 4,
    batch_size: int = 4,
    num_accumulation_steps: int = 8,
    lr: float = 1e-4,
    embed_lr: float = 1e-2,
    head_lr: float = 1e-2,
    test_freq: int = 100,
    seed: int = 0,
    bucket: int = 128,
    max_len: Optional[int] = None,
    metric_fn: Optional[Callable] = None,
    log: Optional[Callable[[dict], None]] = None,
) -> Tuple[float, float, dict]:
    """Returns (primary_metric, secondary_metric, aux) on test, evaluated
    with the best-on-val model (gue.py:219-260). metric_fn(y_true, y_pred)
    -> (primary, secondary); defaults to (MCC, weighted F1)."""
    from sklearn.metrics import f1_score, matthews_corrcoef

    if metric_fn is None:
        metric_fn = lambda yt, yp: (
            matthews_corrcoef(yt, yp), f1_score(yt, yp, average="weighted"))

    X_train, Y_train = data["train"]
    X_val, Y_val = data["val"]
    X_test, Y_test = data["test"]

    rng_np = np.random.default_rng(seed)
    rng = jax.random.PRNGKey(seed)
    rng, hk = jax.random.split(rng)
    head = init_linear_head(hk, cfg.n_embd, num_classes)
    ft_params = jax.tree.map(jnp.asarray, params)  # fresh copy per task

    num_steps = max(1, int(num_epochs * len(X_train) /
                           (batch_size * num_accumulation_steps)))
    tx, opt_state = make_finetune_optimizer(
        ft_params, head, lr=lr, embed_lr=embed_lr, head_lr=head_lr,
        total_steps=num_steps)

    @jax.jit
    def grad_step(joint, tokens, segments, labels, rng):
        def loss_fn(joint):
            emb = forward(joint["model"], cfg, tokens, segment_ids=segments,
                          deterministic=cfg.dropout == 0.0, rng=rng,
                          return_embeddings=True)
            logits = apply_linear_head(joint["head"], emb[:, 0])
            logits = logits.astype(jnp.float32)
            logp = jax.nn.log_softmax(logits, -1)
            return -jnp.mean(jnp.take_along_axis(
                logp, labels[:, None], -1)[:, 0])
        return jax.value_and_grad(loss_fn)(joint)

    @jax.jit
    def apply_step(joint, opt_state, grads):
        updates, opt_state = tx.update(grads, opt_state, joint)
        return optax.apply_updates(joint, updates), opt_state

    joint = {"model": ft_params, "head": head}
    best_val = -np.inf
    best_joint = None
    val_every = max(1, num_steps // test_freq)

    for step in range(num_steps):
        if step % val_every == 0:
            preds = _predict_classes(joint["model"], joint["head"], cfg,
                                     X_val, batch_size, bucket, max_len)
            vm, vf = metric_fn(Y_val[:len(preds)], preds)
            if vm > best_val:
                best_val = vm
                best_joint = jax.tree.map(lambda x: np.asarray(x), joint)
            if log:
                log({"phase": "finetune", "step": step, "val_primary": vm,
                     "val_secondary": vf})

        acc = None
        total = 0.0
        for _ in range(num_accumulation_steps):
            idx = rng_np.choice(len(X_train), min(batch_size, len(X_train)),
                    replace=False)  # small splits must not crash
            x, seg = pad_batch([X_train[i] for i in idx], bucket, max_len)
            y = Y_train[idx].astype(np.int32)
            rng, k = jax.random.split(rng)
            loss, grads = grad_step(joint, jnp.asarray(x), jnp.asarray(seg),
                                    jnp.asarray(y), k)
            grads = jax.tree.map(lambda g: g / num_accumulation_steps, grads)
            acc = grads if acc is None else jax.tree.map(jnp.add, acc, grads)
            total += float(loss) / num_accumulation_steps
        joint, opt_state = apply_step(joint, opt_state, acc)
        if log:
            log({"phase": "finetune", "step": step, "loss": total})

    # last-model test (reported by the reference, gue.py:215-217)
    preds_last = _predict_classes(joint["model"], joint["head"], cfg, X_test,
                                  batch_size, bucket, max_len)
    last_metrics = metric_fn(Y_test[:len(preds_last)], preds_last)

    # best-on-val model test — the returned result (gue.py:219-260)
    if best_joint is not None:
        joint = jax.tree.map(jnp.asarray, best_joint)
    preds_best = _predict_classes(joint["model"], joint["head"], cfg, X_test,
                                  batch_size, bucket, max_len)
    best_metrics = metric_fn(Y_test[:len(preds_best)], preds_best)

    aux = {"last_test": last_metrics, "best_val": best_val,
           "params": joint}
    return best_metrics[0], best_metrics[1], aux
