"""DeePNAP baseline: non-transformer CNN for the ProNAB ddG task.

JAX re-implementation of /root/reference/evals/DeePNAP_baseline.ipynb (the
reference's non-transformer control): one-hot-ish 9-bit protein / 5-bit
nucleotide encodings (cell 0), parallel conv towers with top/bottom padding
variants, four interaction MLPs, residual FC trunk with dropout (cell 1);
same ProNAB pretrain + grouped cross-val protocol as evals/pronab.py.

Note: the notebook's pretrain loss (cell 7) compares UN-normalised
predictions against z-NORMALISED targets; here both sides are normalised
(the apples-to-apples regression), which only changes the baseline's own
training, not the shared evaluation protocol.
"""
from __future__ import annotations

import argparse
import json
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax
from scipy.stats import pearsonr

from .common import linear_to_zero

PROTEIN_MAPPING = {
    "D": [0, 0, 0, 1, 1, 1, 1, 0, 0], "E": [0, 0, 1, 0, 1, 1, 1, 0, 0],
    "K": [0, 0, 1, 1, 0, 1, 1, 0, 0], "R": [0, 0, 1, 1, 1, 0, 1, 0, 0],
    "H": [0, 1, 0, 0, 1, 1, 1, 0, 0], "S": [0, 1, 0, 1, 0, 1, 0, 1, 0],
    "T": [0, 1, 0, 1, 1, 0, 0, 1, 0], "N": [0, 1, 1, 0, 0, 1, 0, 1, 0],
    "Q": [0, 1, 1, 0, 1, 0, 0, 1, 0], "Y": [0, 1, 1, 1, 0, 0, 0, 1, 0],
    "G": [1, 0, 0, 0, 1, 1, 0, 0, 1], "A": [1, 0, 0, 1, 0, 1, 0, 0, 1],
    "V": [1, 0, 0, 1, 1, 0, 0, 0, 1], "L": [1, 0, 1, 0, 0, 1, 0, 0, 1],
    "I": [1, 0, 1, 0, 1, 0, 0, 0, 1], "M": [1, 0, 1, 1, 0, 0, 0, 0, 1],
    "F": [1, 1, 0, 0, 0, 1, 0, 0, 1], "W": [1, 1, 0, 0, 1, 0, 0, 0, 1],
    "P": [1, 1, 0, 1, 0, 0, 0, 0, 1], "C": [1, 1, 1, 0, 0, 0, 0, 0, 1],
}
NUCLEOTIDE_MAPPING = {
    "A": [1, 0, 0, 0, 0], "C": [0, 1, 0, 0, 0], "G": [0, 0, 1, 0, 0],
    "T": [0, 0, 0, 1, 0], "U": [0, 0, 0, 0, 1],
}

P_LEN, P_DIM = 1000, 9
N_LEN, N_DIM = 75, 5


def encode_peptide(peptide: str) -> np.ndarray:
    rows = [PROTEIN_MAPPING.get(a, [0] * P_DIM) for a in peptide.upper()]
    arr = np.asarray(rows, np.float32)
    if arr.shape[0] < P_LEN:
        arr = np.concatenate([arr, np.zeros((P_LEN - arr.shape[0], P_DIM),
                                            np.float32)])
    return arr[:P_LEN]


def encode_nucleotide(seq: str) -> np.ndarray:
    rows = [NUCLEOTIDE_MAPPING.get(c, [0] * N_DIM) for c in seq.upper()
            if c in NUCLEOTIDE_MAPPING or c.isalpha()]
    arr = (np.asarray(rows, np.float32) if rows
           else np.zeros((0, N_DIM), np.float32))
    if arr.shape[0] < N_LEN:
        arr = np.concatenate([arr, np.zeros((N_LEN - arr.shape[0], N_DIM),
                                            np.float32)])
    return arr[:N_LEN]


# --------------------------------------------------------------------------
# Model
# --------------------------------------------------------------------------

def _lin(rng, fi, fo):
    b = 1.0 / np.sqrt(fi)
    kw, kb = jax.random.split(rng)
    return {"w": jax.random.uniform(kw, (fi, fo), jnp.float32, -b, b),
            "b": jax.random.uniform(kb, (fo,), jnp.float32, -b, b)}


def _conv(rng, cout, kh, kw_, cin=1):
    fan_in = cin * kh * kw_
    b = 1.0 / np.sqrt(fan_in)
    k1, k2 = jax.random.split(rng)
    return {"w": jax.random.uniform(k1, (cout, cin, kh, kw_), jnp.float32,
                                    -b, b),
            "b": jax.random.uniform(k2, (cout,), jnp.float32, -b, b)}


def init_deepnap(rng) -> Dict:
    ks = jax.random.split(rng, 16)
    return {
        "protein_conv1": _conv(ks[0], 48, 6, 9),
        "protein_conv2": _conv(ks[1], 48, 6, 9),
        "dna_conv1": _conv(ks[2], 32, 2, 5),
        "dna_conv2": _conv(ks[3], 32, 2, 5),
        "int_p1_n1": [_lin(ks[4], 168 + 39, 96), _lin(ks[5], 96, 32)],
        "int_p1_n2": [_lin(ks[6], 168 + 39, 96), _lin(ks[7], 96, 32)],
        "int_p2_n1": [_lin(ks[8], 168 + 39, 96), _lin(ks[9], 96, 32)],
        "int_p2_n2": [_lin(ks[10], 168 + 39, 96), _lin(ks[11], 96, 32)],
        "fc1": _lin(ks[12], 128, 256),
        "fc2": _lin(ks[13], 256, 128),
        "fc3": _lin(ks[14], 128, 64),
        "fc4": _lin(ks[15], 64, 1),
    }


def _conv2d(p, x, stride):
    return jax.lax.conv_general_dilated(
        x, p["w"], window_strides=stride, padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW")
    ) + p["b"][None, :, None, None]


def _tower(p, x, pad, stride, pool):
    # x: (B, 1, L, D); pad rows top/bottom, conv, channel-max pool, flatten
    x = jnp.pad(x, ((0, 0), (0, 0), pad, (0, 0)))
    h = jax.nn.relu(_conv2d(p, x, stride))       # (B, C, L', 1)
    h = jnp.max(h, axis=1)                       # max over channels
    return h.reshape(h.shape[0], -1)             # (B, L')


def apply_deepnap(params, protein, nucleotide, *, dropout_rng=None,
                  dropout_rate=0.0):
    """protein: (B, 1, 1000, 9); nucleotide: (B, 1, 75, 5) -> (B, 1)."""
    lrelu = lambda v: jax.nn.leaky_relu(v, 0.01)
    lin = lambda p, v: v @ p["w"] + p["b"]

    p1 = _tower(params["protein_conv1"], protein, (0, 8), (6, 1), 48)
    p2 = _tower(params["protein_conv2"], protein, (8, 0), (6, 1), 48)
    n1 = _tower(params["dna_conv1"], nucleotide, (0, 3), (2, 1), 32)
    n2 = _tower(params["dna_conv2"], nucleotide, (3, 0), (2, 1), 32)

    def interact(key, a, b):
        h = jnp.concatenate([a, b], -1)
        h = lrelu(lin(params[key][0], h))
        return lrelu(lin(params[key][1], h))

    x = jnp.concatenate([
        interact("int_p1_n1", p1, n1), interact("int_p1_n2", p1, n2),
        interact("int_p2_n1", p2, n1), interact("int_p2_n2", p2, n2)], -1)

    res = lrelu(lin(params["fc1"], x))
    if dropout_rate > 0 and dropout_rng is not None:
        k1, k2 = jax.random.split(dropout_rng)
        keep = jax.random.bernoulli(k1, 1 - dropout_rate, res.shape)
        res = jnp.where(keep, res / (1 - dropout_rate), 0)
    res = lrelu(lin(params["fc2"], res))
    if dropout_rate > 0 and dropout_rng is not None:
        keep = jax.random.bernoulli(k2, 1 - dropout_rate, res.shape)
        res = jnp.where(keep, res / (1 - dropout_rate), 0)
    x = x + res
    x = lrelu(lin(params["fc3"], x))
    return lin(params["fc4"], x)


# --------------------------------------------------------------------------
# ProNAB protocol with the CNN
# --------------------------------------------------------------------------

def run_deepnap(
    pronab_json: str,
    mutation_jsonl: str,
    output_suffix: str = "deepnap",
    num_epochs: int = 32,
    batch_size: int = 256,
    lr: float = 1e-3,
    folds: int = 10,
    num_epochs_cv: int = 64,
    seed: int = 0,
):
    from .pronab import process_dataset, group_by_peptide, decontaminate

    rng_np = np.random.default_rng(seed)
    with open(pronab_json) as f:
        ds = json.load(f)
    nuc, pep, Kd, G0 = process_dataset(ds, rng=rng_np)
    mutation_records = []
    with open(mutation_jsonl) as f:
        for line in f:
            mutation_records.append(json.loads(line))
    groups = group_by_peptide(mutation_records)
    nuc, pep, Kd, G0 = decontaminate(nuc, pep, Kd, G0, set(groups))

    g0_mean, g0_std = float(np.mean(G0)), float(np.std(G0))
    X_p = np.stack([encode_peptide(p)[None] for p in pep])
    X_n = np.stack([encode_nucleotide(
        n.replace("<DNA>", "").replace("<RNA>", "").replace("<EOS>", ""))
        [None] for n in nuc])
    y = (np.asarray(G0, np.float32) - g0_mean) / g0_std

    params = init_deepnap(jax.random.PRNGKey(seed))
    num_steps = max(1, int(num_epochs * len(pep) / batch_size))
    tx = optax.adamw(linear_to_zero(lr, num_steps), weight_decay=1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step_fn(params, opt_state, xp, xn, yy, rng):
        def loss_fn(p):
            out = apply_deepnap(p, xp, xn, dropout_rng=rng,
                                dropout_rate=0.5)[:, 0]
            return jnp.mean((out - yy) ** 2)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def predict(params, xp, xn):
        return apply_deepnap(params, xp, xn)[:, 0] * g0_std + g0_mean

    rng = jax.random.PRNGKey(seed + 1)
    for step in range(num_steps):
        idx = rng_np.choice(len(pep), min(batch_size, len(pep)),
                            replace=False)
        rng, k = jax.random.split(rng)
        params, opt_state, loss = step_fn(
            params, opt_state, jnp.asarray(X_p[idx]), jnp.asarray(X_n[idx]),
            jnp.asarray(y[idx]), k)

    def eval_pairs(params, records):
        xp = jnp.asarray(np.stack([
            encode_peptide(r["peptide_sequence"])[None] for r in records]))
        strip = lambda s: (s.replace("<DNA>", "").replace("<RNA>", "")
                           .replace("<EOS>", ""))
        xw = jnp.asarray(np.stack([encode_nucleotide(
            strip(r["wild_nucleotide_sequence"]))[None] for r in records]))
        xm = jnp.asarray(np.stack([encode_nucleotide(
            strip(r["mutated_nucleotide_sequence"]))[None] for r in records]))
        gw = np.asarray(predict(params, xp, xw))
        gm = np.asarray(predict(params, xp, xm))
        ddg_p = (gm - gw).tolist()
        ddg_t = [r["mutant_G0"] - r["wild_G0"] for r in records]
        dg_p = [v for pair in zip(gw.tolist(), gm.tolist()) for v in pair]
        dg_t = [v for r in records for v in (r["wild_G0"], r["mutant_G0"])]
        return {
            "pcc": float(pearsonr(ddg_t, ddg_p)[0]),
            "MAE": float(np.abs(np.asarray(ddg_t) - np.asarray(ddg_p)).mean()),
            "dG_pcc": float(pearsonr(dg_t, dg_p)[0]),
            "dG_MAE": float(np.abs(np.asarray(dg_t) - np.asarray(dg_p)).mean()),
        }

    test_all = [r for key in groups for r in groups[key]]
    results = {"zero_shot": eval_pairs(params, test_all), "folds": []}
    print(f"deepnap zero-shot: {results['zero_shot']}")
    with open(f"deepnap-mutant-dual_{output_suffix}.jsonl", "a") as f:
        f.write(json.dumps(results["zero_shot"]) + "\n")

    # grouped cross-val on the mutation data with the ddG + dG dual loss
    # (notebook cells 9-12, mirroring the pronab protocol)
    pretrained = jax.tree.map(np.asarray, params)
    strip = lambda s: (s.replace("<DNA>", "").replace("<RNA>", "")
                       .replace("<EOS>", ""))

    for split in range(folds):
        train_set, test_set = [], []
        for i, key in enumerate(groups):
            if i % folds == split:
                test_set += groups[key]
            train_set += groups[key]  # reference contamination reproduced
        if not test_set:
            continue
        fparams = jax.tree.map(jnp.asarray, pretrained)
        cv_steps = max(1, int(num_epochs_cv * len(train_set) / batch_size))
        cv_tx = optax.adamw(linear_to_zero(lr, cv_steps), weight_decay=1e-2)
        cv_opt = cv_tx.init(fparams)

        @jax.jit
        def cv_step(p, opt, xp, xw, xm, wild_g0, mut_g0, rng):
            def loss_fn(p):
                gw = apply_deepnap(p, xp, xw)[:, 0] * g0_std + g0_mean
                gm = apply_deepnap(p, xp, xm)[:, 0] * g0_std + g0_mean
                return jnp.mean((gm - gw - (mut_g0 - wild_g0)) ** 2
                                + (gw - wild_g0) ** 2 + (gm - mut_g0) ** 2)
            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, opt = cv_tx.update(grads, opt, p)
            return optax.apply_updates(p, updates), opt, loss

        rng2 = jax.random.PRNGKey(seed + 100 + split)
        for step in range(cv_steps):
            # full batch_size per step: cv_steps is sized from batch_size,
            # so a smaller draw would silently under-train the CV phase
            # relative to the stated num_epochs_cv (the reference notebook
            # samples np.random.choice(len(train), batch_size) here)
            idx = rng_np.integers(0, len(train_set),
                                  size=min(batch_size, len(train_set)))
            sub = [train_set[i] for i in idx]
            xp = jnp.asarray(np.stack([encode_peptide(
                r["peptide_sequence"])[None] for r in sub]))
            xw = jnp.asarray(np.stack([encode_nucleotide(
                strip(r["wild_nucleotide_sequence"]))[None] for r in sub]))
            xm = jnp.asarray(np.stack([encode_nucleotide(
                strip(r["mutated_nucleotide_sequence"]))[None] for r in sub]))
            wg = jnp.asarray([r["wild_G0"] for r in sub], jnp.float32)
            mg = jnp.asarray([r["mutant_G0"] for r in sub], jnp.float32)
            rng2, k = jax.random.split(rng2)
            fparams, cv_opt, _ = cv_step(fparams, cv_opt, xp, xw, xm, wg, mg, k)

        res = eval_pairs(fparams, test_set)
        results["folds"].append(res)
        with open(f"deepnap-mutant-dual_{output_suffix}.jsonl", "a") as f:
            f.write(json.dumps(res) + "\n")
        print(f"deepnap fold {split}: pcc {res['pcc']:.4f} "
              f"MAE {res['MAE']:.4f}")
    return results


def main(argv=None):
    ap = argparse.ArgumentParser(description="DeePNAP CNN baseline (ProNAB)")
    ap.add_argument("--pronab_json",
                    default="../datasets/pronab_no_mutations.json")
    ap.add_argument("--mutation_jsonl",
                    default="../datasets/mutation_data.jsonl")
    ap.add_argument("--output_suffix", default="deepnap")
    ap.add_argument("--num_epochs", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args(argv)
    return run_deepnap(a.pronab_json, a.mutation_jsonl, a.output_suffix,
                       num_epochs=a.num_epochs, seed=a.seed)


if __name__ == "__main__":
    main()
