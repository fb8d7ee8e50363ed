"""Cross-decoder wire conformance (SURVEY.md §5.2.2): our RLE/bit-pack
hybrid and PLAIN decoders must consume bytes that parquet-cpp (pyarrow)
actually wrote — not just our own output. We locate pages via the column
metadata offsets pyarrow exposes and parse the thrift-compact PageHeader
with a minimal reader, then hand the raw page payload to plc.kernels.

Covers: definition levels (RLE w=1), dictionary indices (RLE_DICTIONARY,
several bit widths), PLAIN dictionary values, and a null-bearing column.
Plus hand-derived golden vectors from parquet-format Encodings.md."""

import struct
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from plc.kernels import bitpack, plain_decode, rle_hybrid_decode

# --------------------------------------------------------------------------
# minimal thrift compact-protocol struct reader (test utility)
# --------------------------------------------------------------------------


def _varint(buf, pos):
    r = s = 0
    while True:
        b = buf[pos]
        pos += 1
        r |= (b & 0x7F) << s
        if not b & 0x80:
            return r, pos
        s += 7


def _zigzag(buf, pos):
    v, pos = _varint(buf, pos)
    return (v >> 1) ^ -(v & 1), pos


def read_struct(buf, pos):
    """Thrift compact struct → ({field_id: value}, end_pos)."""
    out = {}
    fid = 0
    while True:
        b = buf[pos]
        pos += 1
        if b == 0:
            return out, pos
        delta, ftype = b >> 4, b & 0xF
        if delta == 0:
            fid, pos = _zigzag(buf, pos)
        else:
            fid += delta
        if ftype in (1, 2):            # bool packed in type
            out[fid] = ftype == 1
        elif ftype in (3, 4, 5, 6):    # zigzag ints
            out[fid], pos = _zigzag(buf, pos)
        elif ftype == 8:               # binary
            ln, pos = _varint(buf, pos)
            out[fid] = bytes(buf[pos : pos + ln])
            pos += ln
        elif ftype == 12:              # struct
            out[fid], pos = read_struct(buf, pos)
        else:                          # pragma: no cover
            raise NotImplementedError(f"thrift compact type {ftype}")


def _write(vals: pa.Array) -> tuple[bytes, object]:
    f = tempfile.mktemp(suffix=".parquet")
    pq.write_table(pa.table({"x": vals}), f, compression="NONE",
                   use_dictionary=True, data_page_version="1.0")
    md = pq.ParquetFile(f).metadata.row_group(0).column(0)
    return open(f, "rb").read(), md


def _decode_dict_page(raw, md, dtype):
    hdr, pos = read_struct(raw, md.dictionary_page_offset)
    n_dict = hdr[7][1]                       # DictionaryPageHeader.num_values
    return plain_decode(raw[pos : pos + hdr[3]], dtype, n_dict)


def _data_page(raw, md):
    hdr, pos = read_struct(raw, md.data_page_offset)
    return hdr, raw[pos : pos + hdr[3]]      # uncompressed_page_size


# --------------------------------------------------------------------------
# foreign-byte decoding
# --------------------------------------------------------------------------


@pytest.mark.parametrize("card", [2, 50, 2000])
def test_decode_parquet_cpp_dictionary_page_rle(card):
    """parquet-cpp RLE_DICTIONARY indices + RLE def levels + PLAIN dict
    values, decoded bit-exactly by our kernels at several bit widths."""
    rng = np.random.default_rng(card)
    vals = rng.integers(0, card, 5000).astype(np.int32)
    raw, md = _write(pa.array(vals))
    assert "RLE_DICTIONARY" in md.encodings or "PLAIN_DICTIONARY" in \
        md.encodings

    dict_vals = _decode_dict_page(raw, md, np.int32)
    hdr, page = _data_page(raw, md)
    nvals = hdr[5][1]                        # DataPageHeader.num_values
    (dlen,) = struct.unpack_from("<I", page, 0)
    defs = rle_hybrid_decode(page[4 : 4 + dlen], 1, nvals)
    assert (defs == 1).all()
    bw = page[4 + dlen]
    idx = rle_hybrid_decode(page[4 + dlen + 1 :], bw, nvals)
    assert np.array_equal(dict_vals[idx.astype(np.int64)], vals)


def test_decode_parquet_cpp_def_levels_with_nulls():
    """Null-bearing column: the def-level RLE stream (foreign bytes) must
    reproduce the exact validity pattern."""
    rng = np.random.default_rng(1)
    base = rng.integers(0, 30, 4000).astype(np.int32)
    mask = rng.random(4000) < 0.25
    vals = pa.array(np.where(mask, None, base.astype(object)), pa.int32())
    raw, md = _write(vals)
    hdr, page = _data_page(raw, md)
    nvals = hdr[5][1]
    (dlen,) = struct.unpack_from("<I", page, 0)
    defs = rle_hybrid_decode(page[4 : 4 + dlen], 1, nvals)
    assert np.array_equal(defs.astype(bool), ~mask)
    bw = page[4 + dlen]
    idx = rle_hybrid_decode(page[4 + dlen + 1 :], bw, int((~mask).sum()))
    dict_vals = _decode_dict_page(raw, md, np.int32)
    assert np.array_equal(dict_vals[idx.astype(np.int64)], base[~mask])


def test_runny_foreign_bytes_roundtrip():
    """Run-heavy data exercises parquet-cpp's RLE-run emission (not just
    bit-packed groups); our decoder must consume those runs."""
    vals = np.repeat(np.arange(40, dtype=np.int32), 100)
    raw, md = _write(pa.array(vals))
    dict_vals = _decode_dict_page(raw, md, np.int32)
    hdr, page = _data_page(raw, md)
    nvals = hdr[5][1]
    (dlen,) = struct.unpack_from("<I", page, 0)
    bw = page[4 + dlen]
    idx = rle_hybrid_decode(page[4 + dlen + 1 :], bw, nvals)
    assert np.array_equal(dict_vals[idx.astype(np.int64)], vals)


# --------------------------------------------------------------------------
# golden vectors straight from parquet-format Encodings.md
# --------------------------------------------------------------------------


def test_spec_golden_bitpacked_run():
    """Encodings.md example: values 0..7 bit-packed at width 3 are
    0b10001000 0b11000110 0b11111010 with header (1 << 1) | 1."""
    payload = bytes([0x03]) + bytes([0b10001000, 0b11000110, 0b11111010])
    out = rle_hybrid_decode(payload, 3, 8)
    assert np.array_equal(out, np.arange(8))
    # and our encoder emits exactly the spec bytes for the same input
    assert bitpack(np.arange(8, dtype=np.uint64), 3) == \
        bytes([0b10001000, 0b11000110, 0b11111010])


def test_spec_golden_rle_run():
    """RLE run: 100 copies of value 4 at width 3 → header 100<<1 = 0xC8 0x01
    (varint), one value byte 0x04."""
    payload = bytes([0xC8, 0x01, 0x04])
    out = rle_hybrid_decode(payload, 3, 100)
    assert (out == 4).all()
