"""Deterministic synthetic tokens-table generator (FIXTURES.md §1).

The engine's input shape per BASELINE.json input_hint:
``doc_id:string, tokens:array<int32>, n_tok:int32, source:string``.
Row lengths are Pareto(2.5)-skewed and capped at 32768 so the skew-salting
path (SURVEY.md P3) is exercised. Seeded — no external data.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = 50257
SOURCES = np.array(["web", "books", "code", "wiki"])


def synth_tokens_table(n_rows: int, regime: str = "zipf", seed: int = 42,
                       vocab: int = VOCAB) -> pa.Table:
    """Build the FIXTURES.md §1 table as an Arrow table (vectorized)."""
    rng = np.random.default_rng(seed)
    n_tok = np.minimum((rng.pareto(2.5, n_rows) * 300 + 64).astype("int64"), 32768)
    total = int(n_tok.sum())
    if regime == "uniform":
        flat = rng.integers(0, vocab, total).astype(np.int32)
    elif regime == "zipf":
        flat = np.minimum(rng.zipf(1.1, total), vocab - 1).astype(np.int32)
    elif regime == "small-range":
        flat = rng.integers(1000, 1255, total).astype(np.int32)
    elif regime == "runs":
        flat = np.repeat(
            rng.integers(0, vocab, max((total + 15) // 16, 1)).astype(np.int32),
            16)[:total]
    elif regime == "constant":
        flat = np.full(total, 7, dtype=np.int32)
    else:
        raise ValueError(f"unknown regime {regime!r}")
    from plc.kernels import offsets_from_lengths

    offsets = offsets_from_lengths(n_tok)
    tokens = pa.LargeListArray.from_arrays(pa.array(offsets), pa.array(flat)) \
        .cast(pa.list_(pa.int32()))
    return pa.table({
        "doc_id": pa.array([f"doc-{i:012d}" for i in range(n_rows)], pa.string()),
        "tokens": tokens,
        "n_tok": pa.array(n_tok.astype(np.int32), pa.int32()),
        "source": pa.array(SOURCES[rng.integers(0, 4, n_rows)]),
    })


def synth_tokens_parquet(path: str, n_rows: int, regime: str = "zipf",
                         seed: int = 42, row_group_rows: int = 8192) -> str:
    """Materialize the synthetic table as parquet (cached if present)."""
    if not os.path.exists(path):
        tbl = synth_tokens_table(n_rows, regime, seed)
        pq.write_table(tbl, path, row_group_size=row_group_rows)
    return path


def raw_token_bytes(tbl_or_path) -> int:
    """Raw payload size (int32 token bytes) — the throughput denominator
    (BASELINE.json metric: 'GB/s of raw token data')."""
    if isinstance(tbl_or_path, str):
        tbl_or_path = pq.read_table(tbl_or_path, columns=["n_tok"])
    import pyarrow.compute as pc

    return 4 * pc.sum(tbl_or_path.column("n_tok")).as_py()
