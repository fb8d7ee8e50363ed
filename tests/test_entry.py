"""Driver-contract test: every queries() entry runs, and every oracle_sql()
entry matches the Spark result on sf0.01 (row count + order-insensitive
values), mimicking the driver's CORRECTNESS check."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as E

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in E.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{os.path.join(SF, t + '.parquet')}')")
    yield con
    con.close()


def _norm(rows, cols):
    """Type-aware normalization mimicking the driver's value hash: Decimal
    is NOT coerced to int (DuckDB sum(int)→HUGEINT vs Spark bigint was the
    round-1 hash_match failure that plain str() masked)."""
    out = []
    for r in rows:
        vals = []
        for c in sorted(cols):
            v = r[c]
            if isinstance(v, float):
                v = round(v, 6)
                if math.isnan(v):
                    v = "float:nan"
                else:
                    v = f"float:{v}"
            elif isinstance(v, bool):
                v = f"bool:{v}"
            elif isinstance(v, int):
                v = f"int:{v}"
            else:
                v = f"{type(v).__name__}:{v}"
            vals.append(v)
        out.append(tuple(vals))
    out.sort()
    return out


@pytest.mark.parametrize("name", sorted(E.oracle_sql()))
def test_query_matches_oracle(spark, duck, name):
    q = E.queries()[name]
    sdf = q(spark, SF)
    scols = sdf.columns
    srows = [r.asDict() for r in sdf.collect()]
    ores = duck.execute(E.oracle_sql()[name])
    ocols = [d[0] for d in ores.description]
    orows = [dict(zip(ocols, row)) for row in ores.fetchall()]
    assert sorted(scols) == sorted(ocols), f"{name}: column names differ"
    assert len(srows) == len(orows), f"{name}: row counts differ"
    assert _norm(srows, scols) == _norm(orows, ocols), f"{name}: values differ"


def test_all_queries_run(spark):
    for name, q in E.queries().items():
        df = q(spark, SF)
        assert df.count() >= 0, name


def test_entry_returns_rows(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert "enc_bytes" in df.columns


def test_roundtrip_check_clean(spark):
    row = E.queries()["roundtrip_check"](spark, SF).collect()[0]
    assert row["mismatches"] == 0
    assert row["rows_source"] == row["rows_decoded"]
