"""operators/curation.py line-dedup surface: within-document
first-occurrence dedup (expression-only) and corpus-level frequent-
line removal (RefinedWeb boilerplate rule)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from mssql_dataframe_spark.operators import curation as C


def _df(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(rows)],
        "doc_id long, text string",
    )


def test_dedup_lines_keeps_first_occurrence_in_order(spark):
    df = _df(spark, ["a\nb\na\nc\nb\na", "x", ""])
    got = [
        r["clean"]
        for r in df.select(C.dedup_lines("text").alias("clean"))
        .orderBy("doc_id")
        .collect()
    ]
    assert got == ["a\nb\nc", "x", ""]


def test_dedup_lines_normalized_compare_emits_original(spark):
    df = _df(spark, ["Hello\n hello \nHELLO\nworld"])
    got = df.select(
        C.dedup_lines("text", normalize=True).alias("clean")
    ).collect()[0]["clean"]
    assert got == "Hello\nworld"
    # without normalization all variants survive
    raw = df.select(C.dedup_lines("text").alias("clean")).collect()[0][
        "clean"
    ]
    assert raw == "Hello\n hello \nHELLO\nworld"


def test_dedup_lines_is_shuffle_free(spark):
    df = _df(spark, ["a\na"])
    plan = df.select(
        C.dedup_lines("text").alias("c")
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_remove_frequent_lines_removes_only_frequent(spark):
    df = _df(
        spark,
        [
            "boiler\nunique one",
            "boiler\nunique two",
            "boiler\nunique three",
            "only here\nboiler",
        ],
    )
    cleaned, freq = C.remove_frequent_lines(df, min_docs=3)
    f = {r["line"]: r["doc_count"] for r in freq.collect()}
    assert f == {"boiler": 4}
    got = {
        r["doc_id"]: r["text"] for r in cleaned.orderBy("doc_id").collect()
    }
    assert got == {
        0: "unique one",
        1: "unique two",
        2: "unique three",
        3: "only here",
    }


def test_remove_frequent_lines_counts_docs_not_occurrences(spark):
    # 'dup' appears 3x in ONE doc: occurrence count 3, doc count 1 —
    # must NOT be removed at min_docs=2
    df = _df(spark, ["dup\ndup\ndup", "other"])
    cleaned, freq = C.remove_frequent_lines(df, min_docs=2)
    assert freq.count() == 0
    got = {
        r["doc_id"]: r["text"] for r in cleaned.orderBy("doc_id").collect()
    }
    assert got == {0: "dup\ndup\ndup", 1: "other"}


def test_remove_frequent_lines_can_empty_a_document(spark):
    df = _df(spark, ["b", "b", "b\nkeep"])
    cleaned, _ = C.remove_frequent_lines(df, min_docs=3)
    got = {
        r["doc_id"]: r["text"] for r in cleaned.orderBy("doc_id").collect()
    }
    assert got == {0: "", 1: "", 2: "keep"}


def test_remove_frequent_lines_cap_warns(spark, caplog):
    import logging

    df = _df(spark, ["a\nb", "a\nb", "a\nb"])
    with caplog.at_level(logging.WARNING, "mssql_dataframe_spark"):
        cleaned, _ = C.remove_frequent_lines(df, min_docs=2, max_remove=1)
    assert any("max_remove" in r.getMessage() for r in caplog.records)
    got = {
        r["doc_id"]: r["text"] for r in cleaned.orderBy("doc_id").collect()
    }
    # only the capped top-1 line ('a', ties broken on value) removed
    assert got == {0: "b", 1: "b", 2: "b"}
