"""Curation funnel tests: profile → quality filter → dedup → tokenize →
encode, counters monotone, survivors verified bit-identical in the store."""

import shutil
import tempfile

from pyspark.sql import functions as F

from plc.curate import curate


def test_curate_end_to_end(spark):
    from plc.pipeline import decode
    from plc.textstats import tokens_table

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    dst = tempfile.mkdtemp(prefix="plc_curate_") + "/store"
    try:
        rep = curate(spark, docs, dst, quality_min=0.4,
                     near_dup_threshold=0.7, mode="overwrite")
        # funnel counters are monotone non-increasing
        assert rep["n_input"] >= rep["n_quality"] >= rep["n_deduped"] > 0
        assert rep["rows"] == rep["n_deduped"]
        # survivors decode back bit-identically and are exact-dup-free
        dec = decode(spark, dst)
        assert dec.count() == rep["n_deduped"]
        n_distinct = dec.select(
            F.md5(F.col("tokens").cast("string"))).distinct().count()
        assert n_distinct == rep["n_deduped"], "exact dups survived curation"
        # every survivor is a quality-passing source row
        src_tv = tokens_table(docs)
        joined = dec.join(src_tv.select("doc_id"), "doc_id", "left_semi")
        assert joined.count() == rep["n_deduped"]
    finally:
        shutil.rmtree(dst, ignore_errors=True)


def test_curate_lang_filter(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    dst = tempfile.mkdtemp(prefix="plc_curate_l_") + "/store"
    try:
        rep = curate(spark, docs, dst, quality_min=0.0,
                     lang_keep=("en",), mode="overwrite")
        from plc.textstats import text_profile

        want = text_profile(docs).filter(F.col("lang_pred") == "en").count()
        assert rep["n_quality"] == want
    finally:
        shutil.rmtree(dst, ignore_errors=True)
