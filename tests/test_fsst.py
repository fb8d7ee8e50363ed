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


def test_greedy_longest_match_with_prefix_symbols():
    """The on-the-fly matcher must still pick the LONGEST symbol at each
    position when shorter symbols are prefixes of longer ones, and must
    fall back down the lengths correctly at string tails."""
    tbl = fsst.SymbolTable([b"ab", b"abcd", b"abcdefgh", b"c"])
    strs = [b"abcdefgh" * 4, b"abcd", b"ab", b"abc", b"c", b"cab"]
    data, lengths = _planes(strs)
    blob, codes, code_lens = fsst.fsst_encode(data, lengths, tbl)
    out = fsst.fsst_decode(blob, codes, code_lens)
    assert out.tobytes() == data.tobytes()
    # "abcdefgh"*4 -> 4 codes; "abcd" -> 1; "ab" -> 1; "abc" -> ab + c;
    # "c" -> 1; "cab" -> c + ab
    assert code_lens.tolist() == [4, 1, 1, 2, 1, 2]


def test_skewed_row_compaction_matches_uniform():
    """One very long row among short ones exercises the active-set
    compaction (the long row walks alone for most steps); output must
    still round-trip and codes must be identical to encoding the rows
    separately."""
    long_row = b"doc-" + b"0123456789abcdef" * 500
    strs = [f"doc-{i:06d}".encode() for i in range(200)] + [long_row]
    data, lengths = _planes(strs)
    tbl = fsst.train(data, lengths)
    blob, codes, code_lens = fsst.fsst_encode(data, lengths, tbl)
    assert fsst.fsst_decode(blob, codes, code_lens).tobytes() == \
        data.tobytes()
    # per-row independence: encoding each row alone with the same table
    # yields the same per-row code streams (symbols never cross rows)
    from plc.kernels import offsets_from_lengths

    offs = offsets_from_lengths(code_lens)
    for i in (0, 123, 200):
        d_i = np.frombuffer(strs[i], np.uint8)
        _, c_i, cl_i = fsst.fsst_encode(
            d_i, np.array([len(strs[i])], np.int64), tbl)
        assert np.array_equal(c_i, codes[offs[i]:offs[i + 1]]), i
        assert cl_i[0] == code_lens[i]


def test_trainer_deterministic_and_learns_dominant_pattern():
    """The vectorized trainer breaks gain ties deterministically
    (len, key ascending), so the same plane always yields the same
    table; and a heavily repeated substring must surface as (part of)
    a learned multi-byte symbol."""
    strs = [b"common-crawl/2024/segment-%06d" % i for i in range(5000)]
    data, lengths = _planes(strs)
    t1 = fsst.train(data, lengths)
    t2 = fsst.train(data, lengths)
    assert t1.syms == t2.syms
    assert any(len(s) >= 4 and s in b"common-crawl/2024/segment-"
               for s in t1.syms), t1.syms[:20]
