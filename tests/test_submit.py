"""spark-submit --py-files launch mode (BASELINE.json north_rule: "run via
spark-submit --py-files on a multi-executor cluster"). Regression for the
round-3 ensure_shipped fix: when plc is imported FROM the --py-files zip,
re-zipping from inside the archive raised NotADirectoryError."""

import os
import shutil
import subprocess
import sys
import tempfile
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_encode(spark):
    from plc import data as D
    from plc.pipeline import verify

    work = tempfile.mkdtemp(prefix="plc_submit_")
    try:
        zpath = os.path.join(work, "plc.zip")
        pkg = os.path.join(REPO, "plc")
        with zipfile.ZipFile(zpath, "w") as z:
            for fn in sorted(os.listdir(pkg)):
                if fn.endswith(".py"):
                    z.write(os.path.join(pkg, fn), arcname=f"plc/{fn}")
        src = os.path.join(work, "tokens.parquet")
        D.synth_tokens_parquet(src, 2000, regime="zipf", seed=3)
        dst = os.path.join(work, "out")
        proc = subprocess.run(
            ["spark-submit", "--master", "local[4]", "--py-files", zpath,
             os.path.join(pkg, "cli.py"), "encode", "--src", src,
             "--dst", dst, "--partitions", "2", "--overwrite"],
            capture_output=True, text=True, timeout=600,
            env={**os.environ, "PYSPARK_PYTHON": sys.executable})
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert '"mismatches"' not in proc.stdout  # encode report, not verify
        assert os.path.isdir(os.path.join(dst, "_manifest"))
        # the in-process session verifies what the submitted job wrote
        res = verify(spark, spark.read.parquet(src), dst)
        assert res["mismatches"] == 0, res
    finally:
        shutil.rmtree(work, ignore_errors=True)
