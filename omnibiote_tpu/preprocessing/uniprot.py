"""UniRef100 FASTA preprocessing.

Equivalent of /root/reference/preprocessing/preprocess_uniprot.py: stream
`uniref100.fasta.gz` in 128 MB chunks, split records on '>', strip headers,
emit numbered shards of `<protein>SEQ<EOS>...` text
(tagging at preprocess_uniprot.py:59-60).
"""
from __future__ import annotations

import gzip
import os
from typing import Iterator, List, Tuple

CHUNK_SIZE = 128 * 1024 ** 2


def read_large_gz_file(path: str, chunk_size: int = CHUNK_SIZE) -> Iterator[str]:
    with gzip.open(path, "rt") as f:
        while True:
            chunk = f.read(chunk_size)
            if not chunk:
                break
            yield chunk


def process_chunk(chunk: str, residual: str) -> Tuple[List[str], str]:
    """Split on '>' records; returns (sequences, new_residual)
    (reference process_chunk, :22-49)."""
    chunk = residual + chunk
    split = chunk.split(">")
    if split and split[0] == "":
        split = split[1:]
    if not split:
        return [], ""
    residual = split[-1]
    split = split[:-1]
    sequences = ["".join(s.split("\n")[1:]) for s in split]
    return [s for s in sequences if s != ""], residual


def shard_text(sequences: List[str]) -> str:
    return "<protein>" + "<EOS><protein>".join(sequences) + "<EOS>"


def main(fasta_path: str, out_dir: str, chunk_size: int = CHUNK_SIZE) -> int:
    os.makedirs(out_dir, exist_ok=True)
    residual = ""
    chunk_num = 0
    for chunk in read_large_gz_file(fasta_path, chunk_size):
        sequences, residual = process_chunk(chunk, residual)
        if sequences:
            with gzip.open(os.path.join(
                    out_dir, f"uniref100_{chunk_num}.txt.gz"), "wt") as f:
                f.write(shard_text(sequences))
        chunk_num += 1
    # Final record: the reference's trailing process_chunk('', residual)
    # (preprocess_uniprot.py:69) can never emit it — chunk.split('>') keeps
    # the whole residual as the next residual — so the corpus's last sequence
    # is silently dropped there. Flush it directly instead.
    last = "".join(residual.split("\n")[1:])
    if last:
        with gzip.open(os.path.join(
                out_dir, f"uniref100_{chunk_num + 1}.txt.gz"), "wt") as f:
            f.write(shard_text([last]))
    return chunk_num


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description="UniRef100 fasta.gz -> tagged shards")
    ap.add_argument("fasta_path")
    ap.add_argument("out_dir")
    ap.add_argument("--chunk_size", type=int, default=CHUNK_SIZE)
    a = ap.parse_args()
    main(a.fasta_path, a.out_dir, a.chunk_size)
