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


def test_dedup_lines_literal_delimiter_with_regex_metachar(spark):
    # '.' split as a literal, not as match-any-char — and '|' too
    df = _df(spark, ["a.b.a.c"])
    got = df.select(
        C.dedup_lines("text", delimiter=".").alias("clean")
    ).collect()[0]["clean"]
    assert got == "a.b.c"
    df2 = _df(spark, ["x|y|x"])
    got2 = df2.select(
        C.dedup_lines("text", delimiter="|").alias("clean")
    ).collect()[0]["clean"]
    assert got2 == "x|y"


def test_dedup_lines_regex_opt_in(spark):
    # regex=True restores raw Java-regex split semantics
    df = _df(spark, ["a--b---a--c"])
    got = df.select(
        C.dedup_lines("text", delimiter="-+", regex=True).alias("clean")
    ).collect()[0]["clean"]
    assert got == "a-+b-+c"


def test_dedup_lines_df_fold_and_window_paths_agree(spark):
    docs = [
        "a\nb\na\nc\nb\na",
        "x",
        "",
        "Hello\n hello \nHELLO\nworld",
        "\n".join(str(i % 7) for i in range(50)),
        None,
    ]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(docs)],
        "doc_id long, text string",
    )
    for normalize in (False, True):
        fold = {
            r["doc_id"]: r["text"]
            for r in C.dedup_lines_df(
                df, normalize=normalize, giant_line_threshold=10**6
            ).collect()
        }
        window = {
            r["doc_id"]: r["text"]
            for r in C.dedup_lines_df(
                df, normalize=normalize, giant_line_threshold=0
            ).collect()
        }
        # null text is never "giant": it stays on the fold path and
        # survives as null in both runs
        assert fold == window, f"normalize={normalize}"
        assert fold[5] is None
        assert fold[0] == "a\nb\nc"


def test_dedup_lines_df_routes_giants_only(spark):
    small = "a\na\nb"
    giant = "\n".join(["dup"] * 20 + ["tail"])
    df = _df(spark, [small, giant])
    got = {
        r["doc_id"]: r["text"]
        for r in C.dedup_lines_df(df, giant_line_threshold=5).collect()
    }
    assert got == {0: "a\nb", 1: "dup\ntail"}


def test_dedup_lines_global_keeps_corpus_first_occurrence(spark):
    df = _df(spark, ["a\nb", "b\nc", "a\nc\nc"])
    got = {
        r["doc_id"]: r["text"]
        for r in C.dedup_lines_global(df, id_col="doc_id").collect()
    }
    # a,b first in doc 0; c first in doc 1; every later copy (across
    # docs AND the within-doc repeat in doc 2) is removed
    assert got == {0: "a\nb", 1: "c", 2: ""}


def test_dedup_lines_global_preserves_null_and_other_columns(spark):
    df = spark.createDataFrame(
        [Row(doc_id=0, text="x", lang="en"), Row(doc_id=1, text=None, lang="fr")],
        "doc_id long, text string, lang string",
    )
    rows = {r["doc_id"]: r for r in C.dedup_lines_global(df).collect()}
    assert rows[0]["text"] == "x" and rows[0]["lang"] == "en"
    assert rows[1]["text"] is None and rows[1]["lang"] == "fr"


def test_df_operators_reject_reserved_column_names(spark):
    import pytest

    df = spark.createDataFrame(
        [Row(doc_id=0, text="a", __did=9)],
        "doc_id long, text string, __did long",
    )
    with pytest.raises(ValueError, match="reserved"):
        C.dedup_lines_df(df)
    with pytest.raises(ValueError, match="reserved"):
        C.dedup_lines_global(df)
    with pytest.raises(ValueError, match="reserved"):
        # the literal path never builds work columns; force the
        # anti-join path to hit the guard
        C.remove_frequent_lines(df, min_docs=1, inline_threshold=0)


def test_remove_frequent_lines_anti_join_deterministic_id_col(spark):
    rows = ["b\nkeep", "b", "b"]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(rows)],
        "doc_id long, text string",
    )
    cleaned, _ = C.remove_frequent_lines(
        df, min_docs=3, inline_threshold=0, id_col="doc_id"
    )
    got = {r["doc_id"]: r["text"] for r in cleaned.collect()}
    assert got == {0: "keep", 1: "", 2: ""}


def test_remove_frequent_lines_anti_join_path_matches_literal(spark):
    rows = [
        "boiler\nunique one",
        "boiler\nunique two",
        "boiler\nunique three",
        "only here\nboiler",
        None,
    ]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(rows)],
        "doc_id long, text string",
    )
    lit_clean, _ = C.remove_frequent_lines(df, min_docs=3)
    aj_clean, _ = C.remove_frequent_lines(df, min_docs=3, inline_threshold=0)
    lit = {r["doc_id"]: r["text"] for r in lit_clean.collect()}
    aj = {r["doc_id"]: r["text"] for r in aj_clean.collect()}
    assert lit == aj
    assert aj[0] == "unique one" and aj[4] is None


def test_remove_frequent_lines_large_set_uses_broadcast_anti_join(spark):
    df = _df(spark, ["b\nkeep", "b", "b"])
    cleaned, _ = C.remove_frequent_lines(df, min_docs=3, inline_threshold=0)
    plan = cleaned._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    got = {
        r["doc_id"]: r["text"] for r in cleaned.orderBy("doc_id").collect()
    }
    assert got == {0: "keep", 1: "", 2: ""}


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
