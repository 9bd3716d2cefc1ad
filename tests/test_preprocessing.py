"""Preprocessing tests: GenBank parser, UniRef splitter, FTP downloader
(mock), and the end-to-end text->token-shard pipeline feeding the loader."""
import gzip
import io
import os

import numpy as np
import pytest

from omnibiote_tpu.config import EOS_TOKEN
from omnibiote_tpu.preprocessing.genbank import (
    parse_genbank_records, process_seq_gz)
from omnibiote_tpu.preprocessing.uniprot import (
    iter_sequences, tagged_shard, main as uniprot_main)
from omnibiote_tpu.preprocessing.download import download_seq_files
from omnibiote_tpu.preprocessing.tokenize_corpus import tokenize_to_shards
from omnibiote_tpu.tokenizer import load_reference


GENBANK_SAMPLE = """\
LOCUS       AB000001                 24 bp    DNA     linear   VRL 01-JAN-2000
DEFINITION  Test record one.
ORIGIN
        1 acgtacgtac gtacgtacgt acgt
//
LOCUS       AB000002                 12 bp ss-DNA     circular PHG 01-JAN-2000
DEFINITION  Test record two.
ORIGIN
        1 ttttggggcc cc
//
LOCUS       AB000003                 8 bp    mRNA    linear   PRI 01-JAN-2000
DEFINITION  No origin section record is skipped.
//
LOCUS       AB000004                 8 bp    mRNA    linear   PRI 01-JAN-2000
ORIGIN
        1 augcaugc
//
"""


def test_genbank_parser():
    recs = list(parse_genbank_records(io.StringIO(GENBANK_SAMPLE)))
    assert recs == [
        ("DNA", "ACGTACGTACGTACGTACGTACGT"),
        ("ss-DNA", "TTTTGGGGCCCC"),
        ("mRNA", "AUGCAUGC"),
    ]


def test_genbank_process_file(tmp_path):
    src = tmp_path / "gbtest1.seq.gz"
    with gzip.open(src, "wt") as f:
        f.write(GENBANK_SAMPLE)
    counts = process_seq_gz(str(src), str(tmp_path))
    assert counts == {"DNA": 1, "ss-DNA": 1, "mRNA": 1}
    with gzip.open(tmp_path / "gbtest1.txt.gz", "rt") as f:
        text = f.read()
    assert text == ("<DNA>ACGTACGTACGTACGTACGTACGT<EOS>"
                    "<ss-DNA>TTTTGGGGCCCC<EOS><mRNA>AUGCAUGC<EOS>")


def test_uniprot_chunking(tmp_path):
    fasta = ">A0A1 header one\nMKVL\nAAGI\n>A0A2 header two\nWQRS\n"
    # incremental parsing is invariant to chunk boundaries, and — unlike the
    # reference (preprocess_uniprot.py:69) — the final record is not dropped
    for size in (1, 3, 7, 16, 1000):
        chunks = [fasta[i:i + size] for i in range(0, len(fasta), size)]
        assert list(iter_sequences(chunks)) == ["MKVLAAGI", "WQRS"]
    assert tagged_shard(["AB", "CD"]) == "<protein>AB<EOS><protein>CD<EOS>"

    # end-to-end over a file
    src = tmp_path / "uniref100.fasta.gz"
    with gzip.open(src, "wt") as f:
        f.write(fasta)
    n = uniprot_main(str(src), str(tmp_path / "out"), chunk_size=16)
    shards = sorted(os.listdir(tmp_path / "out"))
    assert len(shards) == n >= 1
    text = ""
    for s in shards:
        with gzip.open(tmp_path / "out" / s, "rt") as f:
            text += f.read()
    assert "<protein>MKVLAAGI<EOS>" in text
    assert "<protein>WQRS<EOS>" in text


class FakeFTP:
    """Offline stand-in for ftplib.FTP (zero-egress environment)."""
    files = {"a.seq.gz": b"AAA", "b.seq.gz": b"BBBB", "c.txt": b"x"}
    fail_once = set()

    def __init__(self, addr):
        self.addr = addr

    def login(self):
        pass

    def cwd(self, d):
        pass

    def nlst(self):
        return list(self.files)

    def voidcmd(self, cmd):
        pass

    def size(self, name):
        return len(self.files[name])

    def retrbinary(self, cmd, cb):
        name = cmd.split(" ", 1)[1]
        if name in FakeFTP.fail_once:
            FakeFTP.fail_once.discard(name)
            raise EOFError("simulated drop")
        cb(self.files[name])


def test_downloader_mirror_resume_retry(tmp_path, monkeypatch):
    os.makedirs(tmp_path / "d", exist_ok=True)
    # pre-existing complete file is skipped
    (tmp_path / "d" / "a.seq.gz").write_bytes(b"AAA")
    FakeFTP.fail_once = {"b.seq.gz"}  # first attempt drops, retry succeeds
    logs = []
    got = download_seq_files(
        "fake.host", "/genbank", ".seq.gz", dest_dir=str(tmp_path / "d"),
        retry_delay=0.0, ftp_factory=FakeFTP, log=logs.append)
    assert got == ["b.seq.gz"]
    assert (tmp_path / "d" / "b.seq.gz").read_bytes() == b"BBBB"
    assert not (tmp_path / "d" / "c.txt").exists()  # filtered by format
    assert any("local copy already complete" in l for l in logs)
    assert any("retrying" in l for l in logs)


def test_tokenize_corpus_feeds_loader(tmp_path):
    """End-to-end: tagged text -> token shards -> shard_reader/packer."""
    rng = np.random.default_rng(0)
    txt = ""
    n_rec = 50
    for _ in range(n_rec):
        seq = "".join(rng.choice(list("ACGT"), size=int(rng.integers(20, 80))))
        txt += f"<DNA>{seq}<EOS>"
    src = tmp_path / "corpus.txt.gz"
    with gzip.open(src, "wt") as f:
        f.write(txt)

    sp = load_reference("mixed")
    stats = tokenize_to_shards(
        [str(src)], str(tmp_path / "tok"), sp, shard_tokens=200,
        val_fraction=0.1, batch_records=16, seed=0)
    assert stats["records"] == n_rec
    assert stats["train_shards"] >= 1

    # shards contain EOS separators and reconstruct to tagged text
    import glob
    shard_files = sorted(glob.glob(str(tmp_path / "tok" / "train" / "*.npy")))
    all_tokens = np.concatenate([np.load(p) for p in shard_files])
    assert (all_tokens == EOS_TOKEN).sum() >= stats["records"] * 0.8
    # decode one record: reader-side semantics
    from omnibiote_tpu.data.loader import shard_reader
    reader = shard_reader(shard_files, banned_tokens=[65533], seed=1)
    seq = next(reader)
    text = sp.decode([int(t) for t in seq])
    assert text.startswith("<DNA>")
    assert text.endswith("<EOS>")
