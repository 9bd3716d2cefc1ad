"""Test helper: build a tiny in-memory SentencePiece-format model file.

Constructs a minimal ModelProto (specials + given normal pieces) so BPE merge
semantics can be tested against hand-computable expectations.
"""
from __future__ import annotations

import struct
import tempfile
from typing import List, Tuple

from . import SentencePieceProcessor


def _varint(v: int) -> bytes:
    out = b""
    while v >= 0x80:
        out += bytes([v & 0x7F | 0x80])
        v >>= 7
    return out + bytes([v])


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _bytes_field(field: int, data: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(data)) + data


def _piece(piece: str, score: float, ptype: int = 1) -> bytes:
    sub = _bytes_field(1, piece.encode())
    sub += _tag(2, 5) + struct.pack("<f", score)
    if ptype != 1:
        sub += _tag(3, 0) + _varint(ptype)
    return _bytes_field(1, sub)


def build_model(normal_pieces: List[Tuple[str, float]],
                user_defined: List[str] = (),
                add_dummy_prefix: bool = True) -> SentencePieceProcessor:
    blob = _piece("<unk>", 0.0, 2) + _piece("<s>", 0.0, 3) + _piece("</s>", 0.0, 3)
    for u in user_defined:
        blob += _piece(u, 0.0, 4)
    for p, s in normal_pieces:
        blob += _piece(p, s, 1)
    # NormalizerSpec: identity (no charsmap), whitespace rules on
    norm = _bytes_field(1, b"identity")
    norm += _tag(3, 0) + _varint(1 if add_dummy_prefix else 0)
    norm += _tag(4, 0) + _varint(1)
    blob += _bytes_field(3, norm)

    f = tempfile.NamedTemporaryFile(suffix=".model", delete=False)
    f.write(blob)
    f.close()
    return SentencePieceProcessor(f.name)
