"""Real-biological-sequence soak: the production data path on the genuine
protein/DNA/RNA records the reference ships (r4 VERDICT missing #5).

The only real sequence data in the reference is
/root/reference/datasets/pronab_no_mutations.json (parsed like
/root/reference/evals/pronab_crossval.py:35-58). These tests drive the C++
tokenizer and the full shard->reader->packer->mixture pipeline over those
records — the same corpus the on-chip convergence / µP-transfer /
bf16-parity artifacts train on (tools/probes/realcorpus.py).
"""
import json
import os
import sys

import numpy as np
import pytest

from omnibiote_tpu.config import EOS_TOKEN, PAD_TOKEN
from omnibiote_tpu.data.loader import build_pipeline
from omnibiote_tpu.tokenizer import load_reference

PRONAB = "/root/reference/datasets/pronab_no_mutations.json"
pytestmark = pytest.mark.skipif(
    not os.path.exists(PRONAB), reason="reference ProNAB dataset not present")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools", "probes"))


@pytest.fixture(scope="module")
def records():
    with open(PRONAB) as f:
        data = json.load(f)
    peps, nucs = [], []
    for key in data:
        rec = data[key]
        peps.append(rec["Sequence"])
        for item in rec["binding data"]:
            if item[0]:
                nucs.append((item[0], item[1]))
    return peps, nucs


def test_tokenizer_roundtrips_real_records(records):
    """Tagged encode->decode is lossless on real protein and nucleic acid
    sequences, including the non-ACGT ambiguity codes real data carries."""
    peps, nucs = records
    sp = load_reference("mixed")
    rng = np.random.default_rng(0)
    for seq in [peps[i] for i in rng.integers(0, len(peps), 60)]:
        text = "<protein>" + seq + "<EOS>"
        ids = sp.encode(text)
        assert sp.decode(ids) == text
        # dummy-prefix "▁" (the banned id) leads, then the tag; EOS closes
        assert ids[0] == 65533 and ids[1] == 18 and ids[-1] == 3
    for seq, kind in [nucs[i] for i in rng.integers(0, len(nucs), 60)]:
        tag = "<RNA>" if kind == "RNA" else "<DNA>"
        ids = sp.encode(tag + seq + "<EOS>")
        assert sp.decode(ids) == tag + seq + "<EOS>"


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from realcorpus import build_real_corpus
    root = str(tmp_path_factory.mktemp("realcorpus"))
    build_real_corpus(root, shard_tokens=50_000)
    return root


def test_real_corpus_shard_layout(corpus):
    """Shards exist for both corpora, are int32, in vocab range, and each
    split's concatenated stream ends on an EOS document boundary. (The
    dummy-prefix/banned id 65533 legitimately appears in raw shards — the
    READER strips it; test_real_pipeline_soak asserts that.)"""
    total = {}
    for name in ("genbank", "uniref100"):
        for split in ("train", "val"):
            d = os.path.join(corpus, name, split)
            shards = sorted(f for f in os.listdir(d) if f.endswith(".npy"))
            assert shards, (name, split)
            n, last = 0, None
            for f in shards:
                arr = np.load(os.path.join(d, f))
                assert arr.dtype == np.int32
                assert arr.min() >= 0 and arr.max() < 65536
                n += arr.size
                last = arr[-1]
            assert last == EOS_TOKEN  # stream ends on a document boundary
            total[(name, split)] = n
    # real ProNAB yields ~20k nucleotide + ~130k protein train tokens
    assert total[("genbank", "train")] > 10_000
    assert total[("uniref100", "train")] > 80_000


def test_real_pipeline_soak(corpus):
    """40 production batches from the real corpus: ids in range, no banned
    token, EOS-delimited segments monotone from 0, and the 20/80 mixture
    holds over the window."""
    ctx, batch = 256, 8
    it, _ = build_pipeline(
        corpus, ["genbank/train", "uniref100/train"], [0.2, 0.8],
        batch_size=batch, ctx_len=ctx, banned_tokens=[65533], seed=0)
    tag_counts = {"nuc": 0, "pep": 0}
    for _ in range(40):
        b = next(it)
        toks, segs = b["tokens"], b["segments"]
        assert toks.shape == (batch, ctx) and segs.shape == (batch, ctx)
        assert toks.min() >= 0 and toks.max() < 65536
        assert not (toks == 65533).any()
        for r in range(batch):
            row, seg = toks[r], segs[r]
            # segments start at 0 and only ever step by +1, at EOS
            assert seg[0] == 0
            d = np.diff(seg.astype(np.int64))
            assert ((d == 0) | (d == 1)).all()
            bumps = np.nonzero(d == 1)[0]
            assert (row[bumps] == EOS_TOKEN).all()
        # tags: 4=<DNA>, 6=<RNA>, 18=<protein>
        tag_counts["nuc"] += int(((toks == 4) | (toks == 6)).sum())
        tag_counts["pep"] += int((toks == 18).sum())
    docs = tag_counts["nuc"] + tag_counts["pep"]
    assert docs > 0
    # mixture is 20% genbank ROWS, but nucleotide documents are ~10x
    # shorter than proteins so genbank rows pack many more docs per row —
    # require both corpora substantially present in the stream
    assert tag_counts["nuc"] > 0.15 * docs
    assert tag_counts["pep"] > 0.15 * docs


def test_real_shard_content_roundtrips_to_source(corpus):
    """Decoding a real shard reproduces the tagged source text: the C++
    tokenizer + shard writer preserve real-sequence content exactly."""
    import gzip
    sp = load_reference("mixed")
    src = gzip.open(os.path.join(corpus, "uniref100.txt.gz"), "rt").read()
    d = os.path.join(corpus, "uniref100", "train")
    f = sorted(fn for fn in os.listdir(d) if fn.endswith(".npy"))[0]
    ids = np.load(os.path.join(d, f))
    # strip the dummy-prefix/banned id (decodes to a spurious space) the
    # same way the production reader does, then decode the head of the
    # stream; the final split piece may be a truncated document — drop it
    ids = ids[ids != 65533]
    text = sp.decode(ids[:2000].tolist())
    docs = [p + "<EOS>" for p in text.split("<EOS>")[:-1] if p]
    assert len(docs) >= 3
    for doc in docs:
        assert doc in src
