"""Wire-format + size conformance vs parquet-cpp (pyarrow), the same-format
C++ stand-in for the absent reference binary (SURVEY.md §0, §5.2.2)."""

import io

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from plc import kernels as K
from plc.chunk import EncodeConfig, pack_chunk, unpack_chunk


def _pyarrow_bytes(table: pa.Table, **kw) -> int:
    buf = io.BytesIO()
    pq.write_table(table, buf, **kw)
    return buf.tell()


def test_dict_indices_rle_size_vs_parquet_cpp():
    """K3 on dictionary indices: our RLE/bit-pack hybrid payload for a
    run-heavy low-cardinality column must not exceed parquet-cpp's
    dictionary-encoded chunk for the same data (BASELINE.json: 'compressed
    bytes <= parquet-lib's on the same chunks')."""
    rng = np.random.default_rng(42)
    values = np.repeat(rng.integers(0, 64, 4000), rng.integers(1, 30, 4000))
    values = values.astype(np.int32)
    ref, w, payload = K.rle_for_encode(values)
    ours = len(payload)
    theirs = _pyarrow_bytes(pa.table({"v": values}), use_dictionary=True,
                            compression="NONE")
    assert ours <= theirs, (ours, theirs)
    back = K.rle_for_decode(ref, w, payload, values.size, np.int32)
    np.testing.assert_array_equal(back, values)


def test_full_table_size_vs_parquet_cpp_zstd():
    """Whole-table: our chunk bytes vs parquet-cpp zstd+dict on identical
    rows (the BASELINE.md beat-this configuration)."""
    from plc import data as D

    tbl = D.synth_tokens_table(20000, regime="zipf", seed=42)
    batch = tbl.combine_chunks().to_batches()[0]
    blob, codecs = pack_chunk(batch, EncodeConfig())
    theirs = _pyarrow_bytes(tbl, compression="ZSTD", use_dictionary=True)
    assert len(blob) <= theirs, (len(blob), theirs)
    out = unpack_chunk(blob)
    for name in tbl.schema.names:
        assert batch.column(name).cast(out.column(name).type) \
            .equals(out.column(name)), name


def test_uniform_table_size_vs_parquet_cpp_zstd():
    from plc import data as D

    tbl = D.synth_tokens_table(20000, regime="uniform", seed=42)
    batch = tbl.combine_chunks().to_batches()[0]
    blob, _ = pack_chunk(batch, EncodeConfig())
    theirs = _pyarrow_bytes(tbl, compression="ZSTD", use_dictionary=True)
    assert len(blob) <= theirs, (len(blob), theirs)


def test_column_pruned_unpack():
    """Storage-level projection: pruned unpack must decode only requested
    columns and still be bit-identical on them."""
    from plc import data as D

    tbl = D.synth_tokens_table(2000, regime="zipf", seed=1)
    batch = tbl.combine_chunks().to_batches()[0]
    blob, _ = pack_chunk(batch, EncodeConfig())
    out = unpack_chunk(blob, columns=["doc_id", "n_tok"])
    assert out.schema.names == ["doc_id", "n_tok"]
    assert out.column("doc_id").equals(batch.column("doc_id"))
    assert out.column("n_tok").equals(batch.column("n_tok"))
