"""ProNAB and PDB-contact eval tests over synthetic datasets."""
import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    from omnibiote_tpu import OmniBioTAConfig, TrainConfig
    from omnibiote_tpu.training.train import Trainer
    cfg = OmniBioTAConfig(n_layer=1, n_head=2, n_embd=64, vocab_size=2 ** 16,
                          block_size=256, dropout=0.0, attn_impl="xla",
                          compute_dtype="float32")
    tc = TrainConfig(batch_size=8, mini_batch_size=1, ctx_len=256,
                     token_budget=1e9,
                     save_dir=str(tmp_path_factory.mktemp("ck")), save_name="m")
    return Trainer(cfg, tc, batch_iter=iter(())).save_checkpoint(final=True)


def test_pronab_sample_prep():
    from omnibiote_tpu.evals.pronab import process_dataset, prepare_sample
    from omnibiote_tpu.tokenizer import load_reference

    ds = {
        "P1": {"Sequence": "MKVLA",
               "binding data": [["ACGT", "DNA", 1e-9, -12.0, "TGCA"],
                                ["AUGC", "RNA", 1e-6, -8.0, ""],
                                ["ACGT", "DNA", 0, -8.0, ""]]},  # skipped
    }
    nuc, pep, Kd, G0 = process_dataset(ds, rng=np.random.default_rng(0))
    assert len(nuc) == 2
    assert nuc[0] == "<DNA>ACGT<EOS>"
    assert nuc[1] == "<RNA>AUGC<EOS>"
    assert G0 == [-12.0, -8.0]
    assert abs(Kd[0] - (-9.0)) < 1e-6

    sp = load_reference("mixed")
    ids = prepare_sample(sp, "MKVLA", "<DNA>ACGT<EOS>", [65533])
    assert 18 in ids and 4 in ids and 3 in ids
    assert 65533 not in ids


def test_pronab_end_to_end(ckpt, tmp_path, monkeypatch):
    from omnibiote_tpu.evals.pronab import run_pronab

    rng = np.random.default_rng(0)
    # pronab_no_mutations.json
    ds = {}
    for k in range(12):
        pep = "".join(rng.choice(list("MKVLAGIW"), size=16))
        ds[f"P{k}"] = {"Sequence": pep, "binding data": [
            ["".join(rng.choice(list("ACGT"), size=12)), "DNA",
             float(10 ** -rng.uniform(3, 9)), float(-rng.uniform(5, 15)), ""]
        ]}
    (tmp_path / "pronab.json").write_text(json.dumps(ds))
    # mutation_data.jsonl: 6 peptide groups
    recs = []
    for k in range(6):
        pep = "".join(rng.choice(list("MKVLAGIW"), size=16))
        for m in range(3):
            wild = "".join(rng.choice(list("ACGT"), size=12))
            mut = wild[:5] + "T" + wild[6:]
            recs.append({"peptide_sequence": pep,
                         "wild_nucleotide_sequence": f"<DNA>{wild}<EOS>",
                         "mutated_nucleotide_sequence": f"<DNA>{mut}<EOS>",
                         "wild_G0": float(-rng.uniform(5, 15)),
                         "mutant_G0": float(-rng.uniform(5, 15))})
    with open(tmp_path / "mut.jsonl", "w") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")

    monkeypatch.chdir(tmp_path)
    results = run_pronab(
        "/root/reference/tokenizers/mixed_bpe.model", ckpt, "t",
        pronab_json=str(tmp_path / "pronab.json"),
        mutation_jsonl=str(tmp_path / "mut.jsonl"),
        num_epochs_pretrain=4, num_epochs_cv=4, num_accumulation_steps=8,
        micro_batch=4, folds=3, seed=0)
    assert "zero_shot" in results and len(results["folds"]) == 3
    for fold in results["folds"]:
        assert np.isfinite(fold["MAE"]) and np.isfinite(fold["dG_MAE"])
    lines = open(tmp_path / "pronab-mutant-dual_t.jsonl").readlines()
    assert len(lines) == 4  # zero-shot + 3 folds
    assert os.path.exists(tmp_path / "pronab_all_ft_t.npz")


def test_pdb_contact_end_to_end(ckpt, tmp_path, monkeypatch):
    from omnibiote_tpu.evals.pdb_contact import (
        run_pdb_contact, process_sequence, unprocess_sequence)
    from omnibiote_tpu.tokenizer import load_reference

    sp = load_reference("mixed")
    # alignment roundtrip: char count preserved
    tok, labels, plen = process_sequence(
        sp, "MKVLAGIW", "ACGTACGT", [1, 0, 0, 1, 1, 0, 0, 1], [65533])
    assert tok[0] == 18 and tok[plen + 1] == 3 and tok[plen + 2] == 4
    chars = unprocess_sequence(sp, tok[1:plen + 1], labels)
    assert len(chars) == 8
    # max-pooling: every char covered by a token with a 1 keeps the 1
    assert max(chars) == 1.0

    rng = np.random.default_rng(1)
    data = []
    for k in range(6):
        pep = "".join(rng.choice(list("MKVLAGIW"), size=14))
        for m in range(3):
            nuc = "".join(rng.choice(list("ACGT"), size=10))
            dists = rng.uniform(2, 20, size=14)
            data.append({
                "peptide_sequences": {"A": pep},
                "nucleotide_sequences": {"B": nuc},
                "closest_nucleotides": dists.tolist(),
            })
    # one malformed record (length mismatch) must be dropped
    data.append({"peptide_sequences": {"A": "MKV"},
                 "nucleotide_sequences": {"B": "ACGT"},
                 "closest_nucleotides": [1.0, 2.0]})
    (tmp_path / "dist.json").write_text(json.dumps(data))

    monkeypatch.chdir(tmp_path)
    results = run_pdb_contact(
        ckpt, "t", "/root/reference/tokenizers/mixed_bpe.model",
        distances_json=str(tmp_path / "dist.json"),
        num_epochs=2, num_accumulation_steps=8, micro_batch=4, folds=2,
        seed=0)
    assert len(results) == 2
    assert all(0.0 <= r <= 1.0 for r in results)
    lines = open(tmp_path / "pdb_contact_eval_t.jsonl").readlines()
    assert len(lines) == 2


def test_deepnap_baseline(tmp_path, monkeypatch):
    from omnibiote_tpu.evals.deepnap import (
        run_deepnap, encode_peptide, encode_nucleotide, init_deepnap,
        apply_deepnap)
    import jax, jax.numpy as jnp

    # encodings: shapes and padding
    assert encode_peptide("MKVLA").shape == (1000, 9)
    assert encode_nucleotide("ACGTU").shape == (75, 5)
    assert encode_peptide("M" * 1500).shape == (1000, 9)

    # forward shape
    params = init_deepnap(jax.random.PRNGKey(0))
    out = apply_deepnap(params,
                        jnp.zeros((2, 1, 1000, 9)), jnp.zeros((2, 1, 75, 5)))
    assert out.shape == (2, 1)

    rng = np.random.default_rng(3)
    ds = {}
    for k in range(10):
        pep = "".join(rng.choice(list("MKVLAGIW"), size=16))
        ds[f"P{k}"] = {"Sequence": pep, "binding data": [
            ["".join(rng.choice(list("ACGT"), size=12)), "DNA",
             1e-6, float(-rng.uniform(5, 15)), ""]]}
    (tmp_path / "pronab.json").write_text(json.dumps(ds))
    recs = []
    for k in range(4):
        pep = "".join(rng.choice(list("MKVLAGIW"), size=16))
        for m in range(2):
            wild = "".join(rng.choice(list("ACGT"), size=12))
            recs.append({"peptide_sequence": pep,
                         "wild_nucleotide_sequence": f"<DNA>{wild}<EOS>",
                         "mutated_nucleotide_sequence": f"<DNA>{wild[:3]}A{wild[4:]}<EOS>",
                         "wild_G0": float(-rng.uniform(5, 15)),
                         "mutant_G0": float(-rng.uniform(5, 15))})
    with open(tmp_path / "mut.jsonl", "w") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")

    monkeypatch.chdir(tmp_path)
    results = run_deepnap(str(tmp_path / "pronab.json"),
                          str(tmp_path / "mut.jsonl"),
                          num_epochs=4, batch_size=8, seed=0,
                          folds=2, num_epochs_cv=4)
    assert np.isfinite(results["zero_shot"]["MAE"])
    assert len(results["folds"]) == 2
    assert all(np.isfinite(f["MAE"]) for f in results["folds"])


REAL_PRONAB = "/root/reference/datasets/pronab_no_mutations.json"


@pytest.mark.skipif(not os.path.exists(REAL_PRONAB),
                    reason="reference ProNAB dataset not present")
def test_pronab_real_dataset_parse_and_prep():
    """Parse the REAL ProNAB dataset shipped with the reference
    (datasets/pronab_no_mutations.json, parsed by the reference at
    pronab_crossval.py:35-58): pinned record counts, value distributions,
    decontamination, and tokenization of real records."""
    from omnibiote_tpu.evals.pronab import (
        process_dataset, prepare_sample, decontaminate)
    from omnibiote_tpu.tokenizer import load_reference
    from omnibiote_tpu.config import BANNED_TOKEN

    with open(REAL_PRONAB) as f:
        ds = json.load(f)
    assert len(ds) == 757  # proteins

    nuc, pep, Kd, G0 = process_dataset(ds, rng=np.random.default_rng(0))
    total_rows = sum(len(v["binding data"]) for v in ds.values())
    assert total_rows == 14582
    assert len(nuc) == len(pep) == len(Kd) == len(G0) == 13672
    assert total_rows - len(nuc) == 910  # rows dropped by the Kd/G0==0 gate

    # modality split and tag integrity
    assert sum(n.startswith("<DNA>") for n in nuc) == 10203
    assert sum(n.startswith("<RNA>") for n in nuc) == 3469
    assert all(n.endswith("<EOS>") for n in nuc)

    # value distributions (log10 Kd and deltaG), loose but real
    kd = np.asarray(Kd)
    g0 = np.asarray(G0)
    assert -7.4 < kd.mean() < -7.2 and kd.min() > -15 and kd.max() < 0
    assert -9.9 < g0.mean() < -9.8 and g0.min() > -21 and (g0 < 0.2).all()
    assert len(set(pep)) == 741

    # decontamination against a mutation set built from real peptides
    mut_peps = set(sorted(set(pep))[:25])
    n2, p2, k2, g2 = decontaminate(nuc, pep, Kd, G0, mut_peps)
    dropped = len(nuc) - len(n2)
    assert dropped == sum(p in mut_peps for p in pep) and dropped > 0
    assert not any(p in mut_peps for p in p2)

    # tokenize a spread of real records with the real mixed tokenizer
    sp = load_reference("mixed")
    banned = [BANNED_TOKEN["mixed"]]
    for i in range(0, len(n2), 1500):
        ids = prepare_sample(sp, p2[i], n2[i], banned)
        assert len(ids) > 4
        assert BANNED_TOKEN["mixed"] not in ids
        # decodes back to sequence content (modulo the special tags)
        text = sp.decode([t for t in ids])
        assert "protein" in text or len(text) > 0
