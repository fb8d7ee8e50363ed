"""Text-analysis operator tests (plc.textstats): language-ID heuristic,
quality ordering, fingerprint order-sensitivity, token counts."""

from pyspark.sql import functions as F

from plc.textstats import (fingerprint, language_id, quality_score,
                           text_profile, token_counts)


def _df(spark, texts):
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                 "id int, text string")


def test_language_id(spark):
    df = _df(spark, [
        "the cat sat on a mat and it is that for the win",
        "der hund ist ein tier und die katze ist mit von",
        "el perro es un animal y la casa de los por que",
        "le chien est un animal et les maisons des une la",
        "zzz qqq xxx www",  # no stopwords at all
    ])
    got = [r[0] for r in df.select(language_id("text")).collect()]
    assert got == ["en", "de", "es", "fr", "und"]


def test_quality_ordering(spark):
    df = _df(spark, [
        "the quick brown fox jumps over the lazy dog and it is a fine day "
        "for running in the park with friends and family members around",
        "@@@ ### $$$ %%% ^^^ &&&",
        "a",
    ])
    q = [r[0] for r in df.select(quality_score("text")).collect()]
    assert q[0] > q[1] and q[0] > q[2]
    assert all(0.0 <= x <= 1.0 for x in q)


def test_fingerprint_order_sensitive(spark):
    df = _df(spark, ["alpha beta gamma", "gamma beta alpha",
                     "alpha beta gamma"])
    fps = [r[0] for r in df.select(fingerprint("text")).collect()]
    assert fps[0] == fps[2]
    assert fps[0] != fps[1]


def test_token_counts(spark):
    df = _df(spark, ["one two three", "  spaced   out  ", ""])
    nw, nsw = token_counts("text")
    rows = df.select(nw.alias("w"), nsw.alias("s")).collect()
    assert [r["w"] for r in rows] == [3, 2, 0]
    assert rows[0]["s"] == 1 + 1 + 2  # ceil(3/4)+ceil(3/4)+ceil(5/4)


def test_text_profile_runs_on_documents(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    prof = text_profile(docs)
    row = prof.agg(F.count("*").alias("n"),
                   F.countDistinct("fp").alias("u"),
                   F.min("quality").alias("qmin"),
                   F.max("quality").alias("qmax")).collect()[0]
    assert row["n"] > 0 and row["u"] > 0
    assert 0.0 <= row["qmin"] <= row["qmax"] <= 1.0
