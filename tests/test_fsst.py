"""FSST round-trip tests (SURVEY.md §5.2; algorithm per the FSST paper)."""

import numpy as np
import pytest

from plc import fsst


def _planes(strings):
    data = np.frombuffer(b"".join(strings), np.uint8)
    lengths = np.array([len(s) for s in strings], np.int64)
    return data, lengths


def _roundtrip(strings):
    data, lengths = _planes(strings)
    blob, codes, code_lens = fsst.fsst_encode(data, lengths)
    out = fsst.fsst_decode(blob, codes, code_lens)
    assert out.tobytes() == data.tobytes()
    return len(blob) + codes.size, data.size


def test_sequential_doc_ids():
    strs = [f"doc-{i:012d}".encode() for i in range(3000)]
    enc, raw = _roundtrip(strs)
    assert enc < raw * 0.6, f"FSST should compress doc ids well: {enc}/{raw}"


def test_low_card_sources():
    rng = np.random.default_rng(42)
    strs = [[b"web", b"books", b"code", b"wiki"][i] for i in rng.integers(0, 4, 2000)]
    enc, raw = _roundtrip(strs)
    assert enc < raw


def test_random_hex():
    rng = np.random.default_rng(1)
    strs = [bytes(rng.integers(0, 16, 32) + 97).replace(b"p", b"a") for _ in range(500)]
    _roundtrip(strs)


def test_binary_with_escape_byte():
    # strings containing 0xFF bytes must survive escape handling
    strs = [b"\xff\xff\xff", b"a\xffb", bytes(range(250, 256)) * 3, b""]
    _roundtrip(strs)


def test_edges():
    _roundtrip([b""])                    # single empty string
    _roundtrip([b"", b"", b""])          # all empty
    _roundtrip([b"x"])                   # single 1-byte string
    _roundtrip([b"hello world"] * 1000)  # constant strings
    rng = np.random.default_rng(9)
    _roundtrip([bytes(rng.integers(0, 256, int(k)))
                for k in rng.integers(0, 40, 300)])  # arbitrary binary


def test_symbol_table_roundtrip():
    tbl = fsst.SymbolTable([b"doc-", b"0", b"00", b"x" * 8])
    tbl2 = fsst.SymbolTable.deserialize(tbl.serialize())
    assert tbl2.syms == tbl.syms


def test_empty_input():
    blob, codes, code_lens = fsst.fsst_encode(
        np.empty(0, np.uint8), np.empty(0, np.int64))
    out = fsst.fsst_decode(blob, codes, code_lens)
    assert out.size == 0
