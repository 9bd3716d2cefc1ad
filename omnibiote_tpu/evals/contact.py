"""TAPE contact prediction (ProteinNet).

Protocol from /root/reference/evals/TAPE/contact_eval_full.py.py:
  * ProteinNet JSON -> pairwise distance matrices -> contact maps (< 8 A),
    valid-mask outer products, medium (12-23) / long (>=24) range masks
  * char->token contact-map downsampling by max-pooling over piece spans
    (process_sample, :86-125) with a pickle cache; token->char upsampling
    for evaluation (:127-143)
  * model embeddings -> Linear(d, 128) head -> pairwise outer concat
    (2*128 channels) -> ContactPredictor CNN (conv3x3 -> 8 residual blocks
    with BatchNorm2d + LeakyReLU -> conv3x3 -> sigmoid) (:184-215)
  * masked BCE over valid & non-short-range pairs (:409-417); 4 LR groups
    (wte/rest/head/cnn) with OneCycleLR (:368-377); best model by
    val medium+long precision sum; pooled precision and AUPRC for medium
    and long ranges (:300-355)

TPU adaptations: pair images are bucketed to multiples of 64 tokens and the
batch-norm statistics are computed over VALID positions only (the padded
border is excluded), so a handful of compiled shapes covers the dataset.
"""
from __future__ import annotations

import argparse
import json
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import optax
from sklearn.metrics import auc, precision_recall_curve, precision_score

from ..config import PAD_TOKEN
from ..models.omnibiota import forward
from ..ops.segments import padding_segment_ids_jnp
from ..tokenizer import SentencePieceProcessor
from ..training.checkpoint import load_model_checkpoint
from .common import apply_linear_head, init_linear_head, onecycle

HEAD_DIM = 128
CNN_CHANNELS = 64
BUCKET = 64
MAX_TOKENS = 1022  # pair image side; inputs carry +2 for <protein>/<EOS>


# --------------------------------------------------------------------------
# Data
# --------------------------------------------------------------------------

def load_proteinnet(split: str, base_dir: str):
    """(:44-77): sequences, contact maps, pair masks, range masks."""
    with open(os.path.join(base_dir,
                           f"proteinnet/proteinnet_{split}.json")) as f:
        data = json.load(f)
    seqs, cmaps, masks, med_masks, long_masks = [], [], [], [], []
    for item in data:
        seqs.append(item["primary"])
        tertiary = np.asarray(item["tertiary"], np.float64)
        dm = np.linalg.norm(
            tertiary[:, None, :] - tertiary[None, :, :], axis=2)
        m = np.float32(item["valid_mask"]).reshape(-1, 1)
        masks.append(m @ m.T)
        idx = np.abs(np.arange(len(tertiary))
                     - np.arange(len(tertiary))[:, None])
        med_masks.append(np.logical_and(idx >= 12, idx <= 23))
        long_masks.append(idx >= 24)
        cmaps.append(dm < 8)
    return seqs, cmaps, masks, med_masks, long_masks


def process_sample(sp, sequence, contact_map, mask, banned_token: int):
    """char->token max-pool downsampling (:86-125)."""
    n = len(contact_map)
    idx = np.abs(np.arange(n) - np.arange(n)[:, None])
    non_short = idx >= 12

    tokenized = [t for t in sp.encode("<protein>" + sequence + "<EOS>")
                 if t != banned_token]
    token_lens = [len(sp.decode([t])) for t in tokenized]

    masked_cm = contact_map * mask
    inner = len(tokenized) - 2
    tcm = np.zeros((inner, inner), np.float32)
    tmask = np.zeros((inner, inner), np.float32)
    tnsr = np.zeros((inner, inner), np.float32)

    # cumulative spans over the inner tokens
    spans = []
    p = 0
    for L in token_lens[1:-1]:
        spans.append((p, p + L))
        p += L
    for i, (a0, a1) in enumerate(spans):
        for j, (b0, b1) in enumerate(spans):
            tcm[i, j] = np.max(masked_cm[a0:a1, b0:b1])
            tmask[i, j] = np.max(mask[a0:a1, b0:b1])
            tnsr[i, j] = np.max(non_short[a0:a1, b0:b1])
    return tokenized, tcm, tmask, tnsr


def inverse_process_sample(sp, tokenized, pred_map):
    """token->char upsampling (:127-143). NOTE: reproduces the reference's
    off-by-one — token_lens is computed over tokenized[1:-1] and then
    re-sliced [1:-1], so the first and last sequence tokens' rows/cols stay
    zero; the returned map side is sum(token_lens of the inner tokens)."""
    token_lens = [len(sp.decode([int(t)])) for t in tokenized[1:-1]]
    side = int(np.sum(token_lens))
    out = np.zeros((side, side), np.float32)
    idx_i = 0
    for i, lx in enumerate(token_lens[1:-1]):
        idx_j = 0
        for j, ly in enumerate(token_lens[1:-1]):
            out[idx_i:idx_i + lx, idx_j:idx_j + ly] = pred_map[i, j]
            idx_j += ly
        idx_i += lx
    return out


def preprocess_split(sp, seqs, cmaps, masks, banned_token,
                     cache_path: str = None):
    if cache_path and os.path.exists(cache_path):
        with open(cache_path, "rb") as f:
            return pickle.load(f)
    toks, tcms, tmasks, tnsrs = [], [], [], []
    for s, c, m in zip(seqs, cmaps, masks):
        t, tc, tm, tn = process_sample(sp, s, c, m, banned_token)
        toks.append(t)
        tcms.append(tc)
        tmasks.append(tm)
        tnsrs.append(tn)
    out = (toks, tcms, tmasks, tnsrs)
    if cache_path:
        with open(cache_path, "wb") as f:
            pickle.dump(out, f)
    return out


# --------------------------------------------------------------------------
# CNN (ContactPredictor, :184-215) — masked BatchNorm
# --------------------------------------------------------------------------

def _conv_init(rng, cin, cout, k=3):
    # torch Conv2d default: kaiming-uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))
    fan_in = cin * k * k
    bound = 1.0 / np.sqrt(fan_in)
    kw, kb = jax.random.split(rng)
    return {
        "w": jax.random.uniform(kw, (cout, cin, k, k), jnp.float32,
                                -bound, bound),
        "b": jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound),
    }


def init_contact_predictor(rng, in_channels=2 * HEAD_DIM,
                           channels=CNN_CHANNELS, blocks=8):
    keys = jax.random.split(rng, 2 + 2 * blocks)
    params = {
        "conv_in": _conv_init(keys[0], in_channels, channels),
        "conv_out": _conv_init(keys[1], channels, 1),
        "blocks": [],
    }
    bn = lambda c: {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}
    for b in range(blocks):
        params["blocks"].append({
            "conv1": _conv_init(keys[2 + 2 * b], channels, channels),
            "conv2": _conv_init(keys[3 + 2 * b], channels, channels),
            "bn1": bn(channels),
            "bn2": bn(channels),
        })
    return params


def _conv2d(p, x):
    # x: (N, C, H, W)
    return jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW")) + p["b"][None, :, None, None]


def _masked_bn(p, x, mask, eps=1e-5):
    """BatchNorm2d with statistics over valid positions only.
    mask: (N, 1, H, W) in {0,1}."""
    cnt = jnp.maximum(jnp.sum(mask), 1.0)
    mean = jnp.sum(x * mask, axis=(0, 2, 3), keepdims=True) / cnt
    var = jnp.sum(((x - mean) ** 2) * mask, axis=(0, 2, 3), keepdims=True) / cnt
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * p["scale"][None, :, None, None] + p["bias"][None, :, None, None]


def apply_contact_predictor(params, x, mask):
    """x: (N, C, H, W); mask: (N, 1, H, W). Returns sigmoid probs (N,1,H,W).

    Every stage is re-masked: with bucket-padded pair images, the 3x3 convs
    would otherwise read PAD-region activations at the valid boundary.
    Zeroing outside the mask makes the PAD region behave exactly like the
    convs' SAME zero padding — i.e. like the reference's unpadded per-sample
    images (contact_eval_full.py.py:184-215) — so predictions on the real
    region are bit-invariant to the bucket width (tests/test_evals_contact).
    """
    act = lambda v: jax.nn.leaky_relu(v, 0.01)
    out = _conv2d(params["conv_in"], x * mask) * mask
    for blk in params["blocks"]:
        h = _conv2d(blk["conv1"], out)
        h = act(_masked_bn(blk["bn1"], h, mask)) * mask
        h = _conv2d(blk["conv2"], h)
        h = act(_masked_bn(blk["bn2"], h, mask)) * mask
        out = out + h
    out = _conv2d(params["conv_out"], out)
    return jax.nn.sigmoid(out)


# --------------------------------------------------------------------------
# Training / evaluation
# --------------------------------------------------------------------------

def _bucket(n):
    return min(((n + BUCKET - 1) // BUCKET) * BUCKET, MAX_TOKENS)


def _make_fns(cfg, tx):
    eval_cfg = cfg.replace(dropout=0.0)

    def pair_features(joint, tokens, n_inner, rng=None):
        # tokens: (1, L+2); embeddings of inner tokens -> (1, n, HEAD_DIM)
        det = rng is None or cfg.dropout == 0.0
        # PAD-bucketed positions must be invisible to attention: the
        # reference forwards UNPADDED batch-1 samples
        # (contact_eval_full.py.py:184-215), so without this mask the
        # bucket's PAD tail would perturb every real-token embedding and
        # predictions would vary with the bucket size (r4 review)
        segs = padding_segment_ids_jnp(tokens, PAD_TOKEN)
        emb = forward(joint["model"], eval_cfg if det else cfg, tokens,
                      segment_ids=segs, deterministic=det, rng=rng,
                      return_embeddings=True)[:, 1:-1]
        emb = apply_linear_head(joint["head"], emb).astype(jnp.float32)
        n = emb.shape[1]
        f = jnp.concatenate([
            jnp.broadcast_to(emb[:, :, None, :], (1, n, n, emb.shape[-1])),
            jnp.broadcast_to(emb[:, None, :, :], (1, n, n, emb.shape[-1])),
        ], axis=-1)
        return f.transpose(0, 3, 1, 2)  # (1, 2*HEAD_DIM, n, n)

    @jax.jit
    def grad_step(joint, tokens, cm, mask, nsr, weight, rng):
        def loss_fn(j):
            feats = pair_features(j, tokens, cm.shape[-1], rng)
            vmask = mask[None, None]
            probs = apply_contact_predictor(j["cnn"], feats, vmask)[0, 0]
            eps = 1e-7
            bce = -(cm * jnp.log(probs + eps)
                    + (1 - cm) * jnp.log(1 - probs + eps))
            sel = mask * nsr
            denom = jnp.maximum(sel.sum(), 1.0)
            return jnp.sum(bce * sel) / denom * weight
        return jax.value_and_grad(loss_fn)(joint)

    @jax.jit
    def apply_step(joint, opt_state, grads):
        updates, opt_state = tx.update(grads, opt_state, joint)
        return optax.apply_updates(joint, updates), opt_state

    @jax.jit
    def predict(joint, tokens, mask):
        feats = pair_features(joint, tokens, mask.shape[-1])
        return apply_contact_predictor(joint["cnn"], feats,
                                       mask[None, None])[0, 0]

    return grad_step, apply_step, predict


def _pad_sample(tok, tcm, tmask, tnsr):
    n = tcm.shape[0]
    L = _bucket(max(n, 8))
    tok_p = np.full((1, L + 2), 1, np.int32)  # PAD id 1
    tok_p[0, :len(tok)] = np.asarray(tok[:L + 2], np.int32)
    cm = np.zeros((L, L), np.float32)
    mk = np.zeros((L, L), np.float32)
    ns = np.zeros((L, L), np.float32)
    cm[:n, :n] = tcm[:L, :L]
    mk[:n, :n] = tmask[:L, :L]
    ns[:n, :n] = tnsr[:L, :L]
    return tok_p, cm, mk, ns


def evaluate_dataset(sp, predict, joint, toks, cmaps, masks, med_masks,
                     long_masks, tmasks):
    """Pooled medium/long precision and AUPRC (:300-355)."""
    med_gt, med_pred, med_prob = [], [], []
    long_gt, long_pred, long_prob = [], [], []
    for i, tok in enumerate(toks):
        if len(tok) <= 5 or len(tok) - 2 > MAX_TOKENS:
            continue
        tok_p, _, mk, _ = _pad_sample(tok, np.zeros((len(tok) - 2,) * 2,
                                                    np.float32),
                                      tmasks[i], tmasks[i] * 0 + 1)
        probs_tok = np.asarray(predict(joint, jnp.asarray(tok_p),
                                       jnp.asarray(mk)))
        n = len(tok) - 2
        pred_map = inverse_process_sample(sp, tok, probs_tok[:n, :n])
        cm, mask = cmaps[i], masks[i]
        side = pred_map.shape[0]
        cm = cm[:side, :side]
        mask = mask[:side, :side]
        mrm = med_masks[i][:side, :side]
        lrm = long_masks[i][:side, :side]
        preds = pred_map > 0.5
        sel_m = (mask * mrm) == 1
        sel_l = (mask * lrm) == 1
        med_gt.extend(cm[sel_m].ravel())
        med_pred.extend(preds[sel_m].ravel())
        med_prob.extend(pred_map[sel_m].ravel())
        long_gt.extend(cm[sel_l].ravel())
        long_pred.extend(preds[sel_l].ravel())
        long_prob.extend(pred_map[sel_l].ravel())

    def safe_prec(gt, pr):
        return float(precision_score(gt, pr, zero_division=0)) if gt else 0.0

    def safe_auprc(gt, prob):
        if not gt or len(set(map(bool, gt))) < 2:
            return 0.0
        p, r, _ = precision_recall_curve(gt, prob)
        return float(auc(r, p))

    return (safe_prec(med_gt, med_pred), safe_prec(long_gt, long_pred),
            safe_auprc(med_gt, med_prob), safe_auprc(long_gt, long_prob))


def run_contact_eval(
    tokenizer_fn: str,
    model_fn: str,
    banned_token: int = 65533,
    data_dir: str = "../datasets/TAPE/data",
    num_epochs: int = 128,
    num_accumulation_steps: int = 128,
    num_tests: int = 256,
    lr: float = 1e-4,
    embed_lr: float = 1e-4,
    head_lr: float = 1e-3,
    contact_pred_lr: float = 1e-3,
    resnet_blocks: int = 8,
    seed: int = 0,
    cache: bool = True,
    metrics_sink=None,
):
    sp = SentencePieceProcessor(tokenizer_fn)
    params, cfg = load_model_checkpoint(model_fn)

    tr = load_proteinnet("train", data_dir)
    va = load_proteinnet("valid", data_dir)
    te = load_proteinnet("test", data_dir)
    cache_path = (os.path.join(data_dir,
                               "proteinnet/processed_train_bpe_mixed.pkl")
                  if cache else None)
    tr_tok, tr_cm, tr_mask, tr_nsr = preprocess_split(
        sp, tr[0], tr[1], tr[2], banned_token, cache_path)
    # one O(n_tokens^2) preprocessing pass per split — tokens and token
    # masks come from the SAME preprocess_split call (r4 review: the masks
    # were recomputed sample-by-sample, doubling preprocessing time)
    va_pre = preprocess_split(sp, va[0], va[1], va[2], banned_token)
    te_pre = preprocess_split(sp, te[0], te[1], te[2], banned_token)
    va_tok, va_tmask = va_pre[0], va_pre[2]
    te_tok, te_tmask = te_pre[0], te_pre[2]

    rng = jax.random.PRNGKey(seed)
    k_head, k_cnn = jax.random.split(rng)
    joint = {
        "model": jax.tree.map(jnp.asarray, params),
        "head": init_linear_head(k_head, cfg.n_embd, HEAD_DIM),
        "cnn": init_contact_predictor(k_cnn, blocks=resnet_blocks),
    }

    num_steps = max(1, int(num_epochs * len(tr_tok) / num_accumulation_steps))

    # 4 LR groups (:368-373) + OneCycle + grad clip 1.0 (:454)
    def label_tree(joint):
        model_labels = jax.tree_util.tree_map_with_path(
            lambda path, _: "wte" if any(
                getattr(q, "key", None) == "wte" for q in path) else "rest",
            joint["model"])
        return {"model": model_labels,
                "head": jax.tree.map(lambda _: "headg", joint["head"]),
                "cnn": jax.tree.map(lambda _: "cnng", joint["cnn"])}

    def adamw(peak):
        return optax.adamw(onecycle(peak, num_steps), b1=0.9, b2=0.999,
                           eps=1e-8, weight_decay=1e-2)

    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.multi_transform(
            {"wte": adamw(embed_lr), "rest": adamw(lr),
             "headg": adamw(head_lr), "cnng": adamw(contact_pred_lr)},
            label_tree(joint)))
    opt_state = tx.init(joint)

    grad_step, apply_step, predict = _make_fns(cfg, tx)
    rng_np = np.random.default_rng(seed)

    best_sum = 0.0
    best_joint = None
    val_every = max(1, num_steps // num_tests)
    results = {}

    drop_rng = jax.random.PRNGKey(seed + 52000)
    for step in range(num_steps):
        acc = None
        for _ in range(num_accumulation_steps):
            i = int(rng_np.integers(0, len(tr_tok)))
            if len(tr_tok[i]) <= 5 or len(tr_tok[i]) - 2 > MAX_TOKENS:
                continue
            tok_p, cm, mk, ns = _pad_sample(tr_tok[i], tr_cm[i], tr_mask[i],
                                            tr_nsr[i])
            drop_rng, k = jax.random.split(drop_rng)
            _, grads = grad_step(
                joint, jnp.asarray(tok_p), jnp.asarray(cm), jnp.asarray(mk),
                jnp.asarray(ns), 1.0 / num_accumulation_steps, k)
            acc = grads if acc is None else jax.tree.map(jnp.add, acc, grads)
        if acc is not None:
            joint, opt_state = apply_step(joint, opt_state, acc)

        if step % val_every == 0:
            mp, lp, ma, la = evaluate_dataset(
                sp, predict, joint, va_tok, va[1], va[2], va[3], va[4],
                va_tmask)
            rec = {"step": step, "val/medium_precision": mp,
                   "val/long_precision": lp, "val/medium_auprc": ma,
                   "val/long_auprc": la}
            if metrics_sink:
                metrics_sink.log(rec)
            if mp + lp > best_sum:
                best_sum = mp + lp
                best_joint = jax.tree.map(np.asarray, joint)

    # final + best test eval (:460-480)
    results["test"] = evaluate_dataset(
        sp, predict, joint, te_tok, te[1], te[2], te[3], te[4], te_tmask)
    if best_joint is not None:
        joint = jax.tree.map(jnp.asarray, best_joint)
    results["test_best"] = evaluate_dataset(
        sp, predict, joint, te_tok, te[1], te[2], te[3], te[4], te_tmask)
    for name, (mp, lp, ma, la) in results.items():
        print(f"{name}: medium_precision {mp:.4f} long_precision {lp:.4f} "
              f"medium_auprc {ma:.4f} long_auprc {la:.4f}")
    return results


def main(argv=None):
    # positional order mirrors the reference CLI (contact_eval_full.py.py
    # argv[1:4]); the reference's 4th positional is a wandb run-name prefix,
    # optional here since runs log through metrics sinks instead
    ap = argparse.ArgumentParser(description="TAPE contact prediction eval")
    ap.add_argument("tokenizer_fn")
    ap.add_argument("model_fn")
    ap.add_argument("banned_token", type=int)
    ap.add_argument("--data_dir", default="../datasets/TAPE/data")
    ap.add_argument("--num_epochs", type=int, default=128)
    ap.add_argument("--num_accumulation_steps", type=int, default=128)
    ap.add_argument("--num_tests", type=int, default=256)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--embed_lr", type=float, default=1e-4)
    ap.add_argument("--head_lr", type=float, default=1e-3)
    ap.add_argument("--contact_pred_lr", type=float, default=1e-3)
    ap.add_argument("--resnet_blocks", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--no_cache", action="store_true")
    a = ap.parse_args(argv)
    return run_contact_eval(
        a.tokenizer_fn, a.model_fn, a.banned_token, data_dir=a.data_dir,
        num_epochs=a.num_epochs,
        num_accumulation_steps=a.num_accumulation_steps,
        num_tests=a.num_tests, lr=a.lr, embed_lr=a.embed_lr,
        head_lr=a.head_lr, contact_pred_lr=a.contact_pred_lr,
        resnet_blocks=a.resnet_blocks, seed=a.seed, cache=not a.no_cache)


if __name__ == "__main__":
    main()
