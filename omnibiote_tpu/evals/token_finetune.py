"""Token-level and single-target fine-tuning engine (TAPE / ProteinGLUE).

Protocol source: /root/reference/evals/TAPE/TAPE.py:429-626 and
evals/proteinGLUE.py:363-527 (the same skeleton, duplicated):
  * inputs are [prefix + tokens + EOS], truncated to 1024; token-level labels
    truncated to 1023; predictions read from embeddings[:, 1:len(y)+1]
    (token tasks) or embeddings[:, 0] (single-target tasks)
  * per-sample CE mean (or MSE), scaled by 1/(accum * batch)
  * AdamW + LinearLR-to-zero; periodic val; best-on-val snapshot; test with
    the best snapshot

Faithfulness note: in BOTH reference files the optimizer's parameter groups
come from `base_model` (a deepcopy) while every forward runs through `model`
(TAPE.py:446-449 vs :489; proteinGLUE.py:376-380 vs :421), so backbone
gradients land on tensors the optimizer never sees: ONLY THE HEAD TRAINS,
and the "best model" snapshot is the unmodified backbone. We reproduce that
behaviour as the default (train_backbone=False, which also lets the backbone
run deterministically in eval mode as a frozen feature extractor) and offer
train_backbone=True as the repaired full fine-tune with the reference's
three LR groups.

TPU adaptation: the reference forwards one unmasked sample at a time
(batch 1, no attention mask); we batch samples with PAD + padding masks,
which yields identical embeddings for real positions, bucketed to bounded
shapes.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import OmniBioTAConfig
from ..models.omnibiota import forward
from .common import (
    apply_linear_head, init_linear_head, linear_to_zero, pad_batch,
    make_finetune_optimizer)

MAX_TOKENS = 1024   # x[:1024] (TAPE.py:482)
MAX_LABELS = 1023   # y[:1023] (TAPE.py:485)


@functools.lru_cache(maxsize=None)
def _embed_fwd(eval_cfg):
    """Jitted eval forward, cached per (frozen, hashable) config: defining
    the jit inside the caller created a fresh closure — and a full XLA
    recompile per bucket shape — on EVERY validation call (r4 review)."""
    @jax.jit
    def fwd(params, tokens, segments):
        return forward(params, eval_cfg, tokens, segment_ids=segments,
                       deterministic=True, return_embeddings=True)
    return fwd


def _batched_embeddings(params, cfg, token_lists, batch_size, bucket):
    """Eval-mode embeddings for a list of token sequences. Returns a list of
    np arrays (len_i, D) for positions 0..len_i-1."""
    fwd = _embed_fwd(cfg.replace(dropout=0.0))

    out = []
    for i in range(0, len(token_lists), batch_size):
        chunk = [t[:MAX_TOKENS] for t in token_lists[i:i + batch_size]]
        x, seg = pad_batch(chunk, bucket, MAX_TOKENS)
        emb = np.asarray(fwd(params, jnp.asarray(x), jnp.asarray(seg)),
                         np.float32)
        for j, toks in enumerate(chunk):
            out.append(emb[j, :len(toks)])
    return out


def _predict(head, emb_list, Y, single_target, is_mse):
    """Flattened (ground_truths, predictions) over a split
    (TAPE.py:585-623)."""
    gts, preds = [], []
    w = np.asarray(head["w"], np.float32)
    b = np.asarray(head["b"], np.float32)
    for emb, y in zip(emb_list, Y):
        if single_target:
            out = emb[0] @ w + b
            gts.append(float(y) if is_mse else int(y))
            preds.append(float(out[0]) if is_mse else int(np.argmax(out)))
        else:
            y = np.asarray(y)[:MAX_LABELS]
            sl = emb[1:len(y) + 1]
            out = sl @ w + b
            gts.extend(y.tolist())
            if is_mse:
                preds.extend(out.reshape(-1).tolist())
            else:
                preds.extend(np.argmax(out, -1).tolist())
    return np.asarray(gts), np.asarray(preds)


def finetune_token_task(
    params: dict,
    cfg: OmniBioTAConfig,
    data: Dict[str, Tuple[List[List[int]], list]],   # train/val[/test]
    *,
    loss_str: str,                # 'mse' | 'cross_entropy'
    metric_fn: Callable,          # (y_true, y_pred) -> float
    single_target: bool = False,
    num_epochs: int = 64,
    batch_size: int = 32,
    num_accumulation_steps: int = 1,
    lr: float = 2e-4,
    embed_lr: float = 1e-3,
    head_lr: float = 1e-2,
    test_freq: int = 100,
    seed: int = 0,
    bucket: int = 128,
    train_backbone: bool = False,
    log: Optional[Callable[[dict], None]] = None,
):
    """Returns (best_params, best_head, history). Test evaluation is done
    separately via evaluate_token_task (the reference tests per-subtest)."""
    X_train, Y_train = data["train"]
    X_val, Y_val = data["val"]
    is_mse = loss_str == "mse"

    rng_np = np.random.default_rng(seed)
    rng = jax.random.PRNGKey(seed)
    rng, hk = jax.random.split(rng)
    if single_target:
        out_dim = 1 if is_mse else int(max(Y_train)) + 1
    else:
        out_dim = 1 if is_mse else int(
            max(v for row in Y_train for v in row)) + 1
    head = init_linear_head(hk, cfg.n_embd, out_dim)

    num_steps = max(1, int(num_epochs * len(X_train) /
                           (batch_size * num_accumulation_steps)))
    eval_cfg = cfg.replace(dropout=0.0)

    if train_backbone:
        joint = {"model": jax.tree.map(jnp.asarray, params), "head": head}
        tx, opt_state = make_finetune_optimizer(
            joint["model"], head, lr=lr, embed_lr=embed_lr, head_lr=head_lr,
            total_steps=num_steps, schedule="linear")
    else:
        joint = {"model": params, "head": head}
        tx = optax.adamw(linear_to_zero(head_lr, num_steps), b1=0.9,
                         b2=0.999, eps=1e-8, weight_decay=1e-2)
        opt_state = tx.init(head)

    def loss_terms(model_params, head_p, tokens, segments, labels, label_mask,
                   rng):
        det = (not train_backbone) or cfg.dropout == 0.0
        emb = forward(model_params, eval_cfg if det else cfg, tokens,
                      segment_ids=segments, deterministic=det, rng=rng,
                      return_embeddings=True)
        if single_target:
            out = apply_linear_head(head_p, emb[:, 0]).astype(jnp.float32)
            if is_mse:
                per = (out[:, 0] - labels) ** 2
            else:
                logp = jax.nn.log_softmax(out, -1)
                per = -jnp.take_along_axis(
                    logp, labels.astype(jnp.int32)[:, None], -1)[:, 0]
            return jnp.sum(per) / per.shape[0]
        out = apply_linear_head(head_p, emb[:, 1:]).astype(jnp.float32)
        if is_mse:
            per = (out[..., 0] - labels) ** 2
        else:
            logp = jax.nn.log_softmax(out, -1)
            per = -jnp.take_along_axis(
                logp, labels.astype(jnp.int32)[..., None], -1)[..., 0]
        per = jnp.where(label_mask, per, 0.0)
        per_seq = jnp.sum(per, -1) / jnp.maximum(label_mask.sum(-1), 1)
        return jnp.sum(per_seq) / per_seq.shape[0]

    # grads and the optimizer update are SEPARATE jitted fns so
    # num_accumulation_steps > 1 averages gradients into ONE update per
    # step (the reference accumulates then steps once, TAPE.py:477-512);
    # a per-micro-batch update would also burn the linear-to-zero schedule
    # num_accumulation_steps times too fast (r4 review)
    if train_backbone:
        @jax.jit
        def micro_grads(joint, tokens, segments, labels, lmask, rng):
            return jax.value_and_grad(
                lambda j: loss_terms(j["model"], j["head"], tokens, segments,
                                     labels, lmask, rng))(joint)

        @jax.jit
        def apply_grads(joint, opt_state, grads):
            updates, opt_state = tx.update(grads, opt_state, joint)
            return optax.apply_updates(joint, updates), opt_state
    else:
        @jax.jit
        def micro_grads(joint, tokens, segments, labels, lmask, rng):
            return jax.value_and_grad(
                lambda h: loss_terms(joint["model"], h, tokens, segments,
                                     labels, lmask, rng))(joint["head"])

        @jax.jit
        def apply_grads(joint, opt_state, grads):
            updates, opt_state = tx.update(grads, opt_state, joint["head"])
            head = optax.apply_updates(joint["head"], updates)
            return {"model": joint["model"], "head": head}, opt_state

    def stage(idx):
        toks = [X_train[i][:MAX_TOKENS] for i in idx]
        x, seg = pad_batch(toks, bucket, MAX_TOKENS)
        L = x.shape[1]
        if single_target:
            labels = np.asarray([Y_train[i] for i in idx],
                                np.float32 if is_mse else np.int32)
            lmask = np.ones((len(idx), 1), bool)
        else:
            labels = np.zeros((len(idx), L - 1),
                              np.float32 if is_mse else np.int32)
            lmask = np.zeros((len(idx), L - 1), bool)
            for j, i in enumerate(idx):
                y = np.asarray(Y_train[i])[:MAX_LABELS]
                y = y[:L - 1]
                labels[j, :len(y)] = y
                lmask[j, :len(y)] = True
        return (jnp.asarray(x), jnp.asarray(seg), jnp.asarray(labels),
                jnp.asarray(lmask))

    best_metric = -np.inf
    best_snapshot = None
    history = []
    val_every = max(1, num_steps // test_freq)

    # Frozen backbone: the validation embeddings never change — compute them
    # once instead of a full forward over the val split per validation, and
    # snapshot only the head instead of device_get-ing the whole unchanged
    # backbone on every improvement (r4 review).
    frozen_emb_val = (None if train_backbone else _batched_embeddings(
        joint["model"], cfg, X_val, batch_size, bucket))

    for step in range(num_steps):
        if step % val_every == 0:
            emb_val = (frozen_emb_val if frozen_emb_val is not None
                       else _batched_embeddings(joint["model"], cfg, X_val,
                                                batch_size, bucket))
            gts, preds = _predict(joint["head"], emb_val, Y_val,
                                  single_target, is_mse)
            m = metric_fn(gts, preds)
            history.append({"step": step, "val_metric": float(m)})
            if log:
                log(history[-1])
            if m > best_metric:
                best_metric = m
                best_snapshot = jax.tree.map(
                    np.asarray, joint if train_backbone else joint["head"])

        total = 0.0
        acc = None
        for _ in range(num_accumulation_steps):
            idx = rng_np.choice(len(X_train), min(batch_size, len(X_train)),
                                replace=False)  # small splits must not crash
            x, seg, labels, lmask = stage(idx)
            rng, k = jax.random.split(rng)
            loss, grads = micro_grads(joint, x, seg, labels, lmask, k)
            acc = grads if acc is None else jax.tree.map(
                jnp.add, acc, grads)
            total += float(loss) / num_accumulation_steps
        if num_accumulation_steps > 1:
            acc = jax.tree.map(
                lambda g: g / num_accumulation_steps, acc)
        joint, opt_state = apply_grads(joint, opt_state, acc)
        if log:
            log({"step": step, "loss": total})

    if best_snapshot is not None:
        if train_backbone:
            joint = jax.tree.map(jnp.asarray, best_snapshot)
        else:
            joint = {"model": joint["model"],
                     "head": jax.tree.map(jnp.asarray, best_snapshot)}
    return joint["model"], joint["head"], {"best_val": best_metric,
                                           "history": history}


def evaluate_token_task(params, head, cfg, X_test, Y_test, *, metric_fn,
                        single_target=False, is_mse=False, batch_size=32,
                        bucket: int = 128) -> float:
    emb = _batched_embeddings(params, cfg, X_test, batch_size, bucket)
    gts, preds = _predict(head, emb, Y_test, single_target, is_mse)
    return float(metric_fn(gts, preds))
