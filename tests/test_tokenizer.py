"""C++ tokenizer tests: vocab-file parity with the reference artifacts,
BPE merge semantics, normalization, batch encode, trainer."""
import os

import numpy as np
import pytest

from omnibiote_tpu.tokenizer import (
    SentencePieceProcessor, load_reference, train_bpe,
    REFERENCE_TOKENIZER_DIR)


@pytest.fixture(scope="module")
def mixed():
    return load_reference("mixed")


@pytest.mark.parametrize("which,banned", [
    ("mixed", 65533), ("nucleotide", 65525), ("peptide", 65530)])
def test_vocab_file_parity(which, banned):
    """id_to_piece and scores must match the .vocab files line for line."""
    sp = load_reference(which)
    vocab_path = os.path.join(REFERENCE_TOKENIZER_DIR, f"{which}_bpe.vocab")
    with open(vocab_path, "rb") as f:
        lines = f.read().decode("utf-8").split("\n")
    assert sp.vocab_size() == 65536
    step = 4099  # prime stride: covers the space without 65k ctypes calls
    for i in list(range(0, 65536, step)) + [0, 1, 19, 20, banned, 65535]:
        piece, score = lines[i].rsplit("\t", 1)
        assert sp.id_to_piece(i) == piece, i
        assert abs(sp.get_score(i) - float(score)) < 1e-4, i
    # the banned token is the lone whitespace piece
    assert sp.id_to_piece(banned) == "▁"


def test_special_token_ids(mixed):
    """Shared special ids 0-19 (SURVEY.md C5)."""
    expected = ["<unk>", "<s>", "</s>", "<EOS>", "<DNA>", "<mRNA>", "<RNA>",
                "<rRNA>", "<tRNA>", "<cRNA>", "<ss-RNA>", "<ss-DNA>",
                "<ds-mRNA>", "<ds-rRNA>", "<ds-RNA>", "<ms-DNA>", "<ms-RNA>",
                "<ds-cRNA>", "<protein>", "<antibody>"]
    for i, piece in enumerate(expected):
        assert mixed.id_to_piece(i) == piece
        assert mixed.piece_to_id(piece) == i
    assert mixed.is_control(1) and mixed.is_control(2)
    assert mixed.is_unknown(0)


def test_roundtrip(mixed):
    rng = np.random.default_rng(0)
    for _ in range(20):
        seq = "".join(rng.choice(list("ACGT"), size=int(rng.integers(5, 200))))
        ids = mixed.encode(seq)
        assert mixed.decode(ids) == seq
    # protein
    seq = "MKVLAAGIVRSTWQ"
    assert mixed.decode(mixed.encode(seq)) == seq


def test_tagged_text_user_symbols(mixed):
    """Inline corpus tags (preprocess_genbank.py:33 style) become single
    tokens, and the dummy-prefix '▁' shows up as the banned token."""
    ids = mixed.encode("<DNA>ACGT<EOS>")
    pieces = [mixed.id_to_piece(i) for i in ids]
    assert pieces[0] == "▁"        # the spurious whitespace piece
    assert ids[0] == 65533
    assert ids[1] == 4                   # <DNA>
    assert ids[-1] == 3                  # <EOS>
    # decode keeps user-defined surfaces
    assert mixed.decode(ids) == "<DNA>ACGT<EOS>"


def test_merge_respects_scores():
    """Hand-built model: merges happen highest-score-first, leftmost ties."""
    from omnibiote_tpu.tokenizer.cpp_test_util import build_model
    # vocab: specials + ab (score -1), bc (score -2), abc absent
    sp = build_model([
        ("a", -10.0), ("b", -11.0), ("c", -12.0),
        ("ab", -1.0), ("bc", -2.0),
    ])
    ids = sp.encode("abc")
    pieces = [sp.id_to_piece(i) for i in ids]
    # dummy prefix ▁ is unknown in this tiny vocab -> <unk>; then ab + c
    assert pieces[-2:] == ["ab", "c"]


def test_normalization_whitespace(mixed):
    # extra whitespace collapsed, dummy prefix added
    a = mixed.encode("ACGT")
    b = mixed.encode("  ACGT  ")
    assert a == b
    # NFKC charsmap: full-width folds to ASCII
    assert mixed.encode("ＡＣＧＴ") == mixed.encode("ACGT")


def test_batch_encode_matches_sequential(mixed):
    rng = np.random.default_rng(1)
    texts = ["".join(rng.choice(list("ACGTN"), size=int(rng.integers(10, 300))))
             for _ in range(64)]
    batch = mixed.encode_batch(texts, n_threads=8)
    for t, ids in zip(texts, batch):
        assert list(ids) == mixed.encode(t), t[:20]


def test_unknown_char(mixed):
    ids = mixed.encode("ACGT÷ACGT")  # '÷' is not in a bio vocab
    assert mixed.unk_id() in ids


def test_decode_buffer_retry_and_ndarray_input(mixed):
    """r4 review regressions: (a) decode's buffer-retry path must return the
    FULL re-decoded text, not a slice at the old capacity; (b) decode must
    accept ndarray input — encode_batch (this module) returns ndarrays."""
    # (a) blow past the 8-bytes/id estimate with the longest pieces in the
    # vocab, repeated
    lens = [(len(mixed.id_to_piece(i)), i) for i in range(20, 4000)]
    long_id = max(lens)[1]
    ids = [long_id] * 200
    text = mixed.decode(ids)
    assert text == mixed.id_to_piece(long_id).replace("▁", " ") * 200 \
        or len(text) >= 200 * max(lens)[0] - 200  # charsmap variants
    # (b) ndarray input, incl. feeding encode_batch's output straight back
    row = mixed.encode_batch(["ACGTACGTACGT"])[0]
    assert isinstance(row, np.ndarray)
    assert mixed.decode(row) == mixed.decode(list(row))


def test_control_pieces_not_text_matchable(mixed):
    """Real sentencepiece only extracts USER_DEFINED pieces from raw text:
    a literal '<s>' in input must tokenize as characters, not inject the
    CONTROL id (r4 review); the USER_DEFINED tags keep matching."""
    assert 1 not in mixed.encode("<s>") and 2 not in mixed.encode("</s>")
    assert mixed.encode("<protein>MK<EOS>")[-1] == 3   # user_defined tags
    assert mixed.is_control(1) and mixed.is_control(2)


def test_trainer_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    sents = []
    for _ in range(300):
        sents.append("<DNA>" + "".join(
            rng.choice(list("ACGT"), size=int(rng.integers(20, 60)))) + "<EOS>")
    out = str(tmp_path / "toy.model")
    train_bpe(sents, vocab_size=200, out_path=out,
              user_defined=["<EOS>", "<DNA>", "<protein>"])
    sp = SentencePieceProcessor(out)
    assert sp.vocab_size() <= 200
    # layout: specials first (reference vocab layout)
    assert sp.id_to_piece(0) == "<unk>"
    assert sp.id_to_piece(1) == "<s>"
    assert sp.id_to_piece(2) == "</s>"
    assert sp.id_to_piece(3) == "<EOS>"
    assert sp.id_to_piece(4) == "<DNA>"
    # encode/decode roundtrip with the trained model
    s = "<DNA>ACGTACGGTTACA<EOS>"
    assert sp.decode(sp.encode(s)) == s
    # merged pieces exist (multi-char)
    lens = [len(sp.id_to_piece(i)) for i in range(6, sp.vocab_size())]
    assert max(lens) > 1


def test_fast_trainer_matches_naive(tmp_path):
    """The lazy-heap fast trainer (cpp/spm.cc MergeLoopFast) must produce a
    byte-identical .model to the O(merges*corpus) naive oracle loop — same
    merge order (count desc, lexicographic tie-break), same greedy
    left-to-right application on overlapping self-pair chains."""
    rng = np.random.default_rng(7)
    sents = []
    for i in range(250):
        s = "".join(rng.choice(list("ACGT"), size=int(rng.integers(20, 70))))
        if i % 4 == 0:
            s += "A" * int(rng.integers(3, 9))  # self-pair chains "AAA..."
        if i % 6 == 0:
            s = "ABABABAB" + s  # alternating overlaps
        sents.append(s)
    for i in range(40):  # second alphabet + protected symbols mid-sentence
        sents.append("<PEP>" + "".join(rng.choice(
            list("ACDEFGHIKLMNPQRSTVWY"),
            size=int(rng.integers(10, 50)))) + "<EOS>")
    # <EOS> is USER_DEFINED, as in the reference .model files (piece type 4
    # there); CONTROL symbols are not text-matchable, per real sentencepiece
    kw = dict(vocab_size=420, user_defined=["<PEP>", "<DNA>", "<EOS>"],
              control=["<CTL>"], max_piece_len=8)
    fast = str(tmp_path / "fast.model")
    naive = str(tmp_path / "naive.model")
    train_bpe(sents, out_path=fast, **kw)
    train_bpe(sents, out_path=naive, naive=True, **kw)
    with open(fast, "rb") as f, open(naive, "rb") as g:
        assert f.read() == g.read()
    sp = SentencePieceProcessor(fast)
    assert sp.decode(sp.encode("<PEP>MKVLAW<EOS>")) == "<PEP>MKVLAW<EOS>"
    assert sp.decode(sp.encode("ACGTACGT")) == "ACGTACGT"
    # CONTROL pieces exist in the vocab but are NOT extracted from raw
    # text (sentencepiece semantics; matching them would let plain text
    # inject control ids — r4 review)
    ctl = sp.piece_to_id("<CTL>")
    assert ctl >= 0 and sp.is_control(ctl)
    assert ctl not in sp.encode("<CTL>")
