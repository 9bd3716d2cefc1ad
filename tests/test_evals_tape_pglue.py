"""TAPE / ProteinGLUE harness tests: label alignment semantics and
end-to-end runs over synthetic datasets."""
import json
import os

import numpy as np
import pytest

from omnibiote_tpu.evals.alignment import (
    align_labels_mode, align_labels_mean, align_single, minmax_normalizer,
    zscore_normalizer, process_split)
from omnibiote_tpu.tokenizer import load_reference


@pytest.fixture(scope="module")
def sp():
    return load_reference("mixed")


def test_alignment_mode_and_mean(sp):
    seq = "MKVLAAGIWQ"
    ids = [int(t) for t in sp.encode(seq) if t != 65533]
    lens = [len(sp.decode([t])) for t in ids]
    assert sum(lens) == len(seq)

    # char labels: 0 for first 5 chars, 1 for rest
    label = [0] * 5 + [1] * 5
    ids2, modes = align_labels_mode(sp, seq, label, [65533])
    assert ids2 == ids
    # verify against a direct recomputation
    ptr = 0
    expect = []
    for t, L in zip(ids, lens):
        L = 1 if t == 0 else L
        expect.append(int(np.bincount(label[ptr:ptr + L]).argmax()))
        ptr += L
    assert modes == expect

    vals = np.linspace(0.0, 1.0, len(seq)).tolist()
    _, means = align_labels_mean(sp, seq, vals, [65533])
    ptr = 0
    for m, (t, L) in zip(means, zip(ids, lens)):
        L = 1 if t == 0 else L
        np.testing.assert_allclose(m, np.mean(vals[ptr:ptr + L]), rtol=1e-12)
        ptr += L

    _, single = align_single(sp, seq, 7, [65533])
    assert single == 7


def test_normalizers():
    norm = minmax_normalizer([[0.0, 10.0], [5.0]])
    out = norm([[0.0, 5.0, 10.0]])
    np.testing.assert_allclose(out[0], [0.0, 0.5, 1.0])
    zn = zscore_normalizer([1.0, 3.0])
    np.testing.assert_allclose(zn([2.0]), [0.0])


def test_process_split_shapes(sp):
    X, Y = process_split(sp, ["MKVL", "WQRS"], [[0, 0, 1, 1], [1, 1, 0, 0]],
                         align_labels_mode, prefix=[18], banned_tokens=[65533])
    assert all(x[0] == 18 and x[-1] == 3 for x in X)
    assert process_split(sp, None, None, align_labels_mode, [18], []) == (None, None)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    from omnibiote_tpu import OmniBioTAConfig, TrainConfig
    from omnibiote_tpu.training.train import Trainer
    cfg = OmniBioTAConfig(n_layer=1, n_head=2, n_embd=64, vocab_size=2 ** 16,
                          block_size=128, dropout=0.0, attn_impl="xla",
                          compute_dtype="float32")
    tc = TrainConfig(batch_size=8, mini_batch_size=1, ctx_len=128,
                     token_budget=1e9,
                     save_dir=str(tmp_path_factory.mktemp("ck")), save_name="m")
    return Trainer(cfg, tc, batch_iter=iter(())).save_checkpoint(final=True)


def _protein_for_class(rng, y, n=24):
    """Class-dependent composition: class 1 = W-rich, class 0 = A-rich."""
    main = "W" if y else "A"
    return "".join(rng.choice([main] * 3 + list("MKVLGI"), size=n))


def test_tape_end_to_end(ckpt, tmp_path, monkeypatch):
    from omnibiote_tpu.evals.tape import run_tape

    rng = np.random.default_rng(0)
    base = tmp_path / "tape"
    (base / "fluorescence").mkdir(parents=True)
    (base / "secondary_structure").mkdir()
    for split, n in (("train", 48), ("valid", 16), ("test", 16)):
        data = []
        for i in range(n):
            y = i % 2
            data.append({"primary": _protein_for_class(rng, y),
                         "log_fluorescence": [float(y) * 2.0 + 0.1]})
        (base / "fluorescence" / f"fluorescence_{split}.json").write_text(
            json.dumps(data))
    # tiny ss3 with per-residue labels
    for split, n in (("train", 32), ("valid", 8), ("casp12", 16),
                     ("cb513", 16), ("ts115", 16)):
        data = []
        for i in range(n):
            seq = _protein_for_class(rng, i % 2)
            ss3 = [(0 if c == "A" else 1 if c == "W" else 2) for c in seq]
            data.append({"primary": seq, "ss3": ss3, "ss8": ss3})
        (base / "secondary_structure" /
         f"secondary_structure_{split}.json").write_text(json.dumps(data))

    monkeypatch.chdir(tmp_path)
    results = run_tape(
        sp_dir="/root/reference/tokenizers/mixed_bpe.model",
        model_dir=ckpt, tape_dir=str(base), output_suffix="t",
        tasks=["structure_ss3", "fluorescence"], num_epochs=4,
        batch_size=8, seed=0)
    assert "casp12_ss3" in results and "fluorescence" in results
    # ss3 labels carry composition signal; a frozen-backbone linear probe
    # must beat 3-class chance (0.33)
    assert results["cb513_ss3"] > 0.36
    assert os.path.exists(tmp_path / "TAPE_t_results.csv")


def test_proteinglue_end_to_end(ckpt, tmp_path, monkeypatch):
    from omnibiote_tpu.evals.proteinglue import run_proteinglue

    rng = np.random.default_rng(1)
    eval_dir = tmp_path / "ProteinGLUE"
    eval_dir.mkdir()

    def write_csv(name, n, cols):
        lines = ["sequence," + ",".join(cols)]
        for i in range(n):
            seq = _protein_for_class(rng, i % 2, n=20)
            labels = []
            for col in cols:
                lab = [(0 if c == "A" else 1) for c in seq]
                labels.append("[" + " ".join(str(v) for v in lab) + "]")
            lines.append(seq + "," + ",".join(labels))
        (eval_dir / f"{name}.csv").write_text("\n".join(lines) + "\n")

    for split, n in (("training", 40), ("validation", 12), ("test", 12)):
        write_csv(f"asabu_{split}", n, ["buried", "solvent_accessibility"])

    monkeypatch.chdir(tmp_path)
    results = run_proteinglue(
        sp_dir="/root/reference/tokenizers/mixed_bpe.model",
        model_dir=ckpt, eval_dir=str(eval_dir), output_suffix="t",
        tasks=["BUR", "ASA"], num_epochs=4, batch_size=8, seed=0,
        force_clean=True)
    assert set(results) == {"BUR", "ASA"}
    assert results["BUR"] > 0.6          # composition task: ACC above chance
    assert np.isfinite(results["ASA"])   # PCC finite
    assert os.path.exists(tmp_path / "ProteinGLUE_t_results.csv")
