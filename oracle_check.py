"""Driver-shaped oracle check (verify surface 3): run every declared query
against DuckDB's oracle_sql() on the same parquet and compare rows exactly.
Also covers surface 1 (kernel round-trips) and the entry() smoke test.

Usage: python oracle_check.py [sf_dir] [query1,query2,...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None


def kernel_probes() -> None:
    import numpy as np

    from plc import kernels as K

    rng = np.random.default_rng(7)
    probes = [rng.integers(0, 50257, 1_000_000, dtype=np.int32)
              .astype(np.int64),
              np.array([], dtype=np.int64), np.array([5], dtype=np.int64),
              np.full(1000, 42, dtype=np.int64),
              np.array([2**31 - 1, -2**31], dtype=np.int64)]
    for a in probes:
        ref, w, buf = K.for_encode(a)
        dec = K.for_decode(ref, w, buf, a.size, dtype=a.dtype)
        assert np.array_equal(a, dec) and a.dtype == dec.dtype, "FOR"
        ref, w, buf = K.rle_for_encode(a)
        dec2 = K.rle_for_decode(ref, w, buf, a.size, dtype=a.dtype)
        assert np.array_equal(a, dec2), "RLE"
    print("kernel probes: OK", flush=True)


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    kernel_probes()

    spark = (SparkSession.builder.master("local[32]")
             .appName("plc-oracle-check")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                     "131072")
             .config("spark.driver.memory", "48g")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.adaptive.enabled", "true")
             .getOrCreate())
    con = duckdb.connect()
    for t in E.TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS "
                        f"SELECT * FROM read_parquet('{p}')")
    oracles = E.oracle_sql()
    failures = []
    try:
        n = E.entry(spark).count()
        assert n > 0, "entry() returned no rows"
        print(f"entry(): {n} rows OK", flush=True)
        for name, q in E.queries().items():
            if ONLY and name not in ONLY:
                continue
            try:
                df = q(spark, SF_DIR)
                srows = sorted(tuple(r) for r in df.collect())
            except Exception as e:
                failures.append((name, f"spark error: {e}"))
                print(f"{name}: SPARK ERROR {e}", flush=True)
                continue
            if name not in oracles:
                print(f"{name}: {len(srows)} rows (no oracle)", flush=True)
                continue
            orows = sorted(tuple(r) for r in
                           con.execute(oracles[name]).fetchall())
            if len(srows) != len(orows):
                failures.append((name, f"rows {len(srows)} != {len(orows)}"))
                print(f"{name}: ROW COUNT MISMATCH "
                      f"{len(srows)} != {len(orows)}", flush=True)
                continue
            bad = [(a, b) for a, b in zip(srows, orows) if a != b]
            if bad:
                failures.append((name, f"{len(bad)} differing rows; "
                                       f"first: {bad[0]}"))
                print(f"{name}: VALUE MISMATCH {len(bad)} rows; "
                      f"first {bad[0]}", flush=True)
            else:
                print(f"{name}: OK ({len(srows)} rows)", flush=True)
    finally:
        spark.stop()
    if failures:
        print(f"\nFAILURES: {failures}")
        return 1
    print("\nALL OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
