"""Data-curation operators for LLM training-data pipelines.

Repetition filtering (Gopher-style word-n-gram metrics), benchmark
decontamination (shared-n-gram flagging, GPT-3 appendix-C style),
PII redaction, and corpus-mixture auditing. All operators are pure
built-in-function column expressions (JVM-side, whole-stage codegen)
— no Python UDFs — so they scan at full Parquet speed.

Scale notes (100 TB): every operator here is one or two shuffles keyed
on ``doc_id`` or an n-gram; nothing is quadratic in the corpus.
``decontaminate`` broadcasts the benchmark gram set (benchmarks are
O(10^5) docs — far under the broadcast threshold after distinct), so
the contamination check is a map-side hash probe over the training
scan, no shuffle of the 100 TB side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens

__all__ = [
    "word_ngrams",
    "repetition_features",
    "quality_filter",
    "decontaminate",
    "redact_pii",
    "corpus_mixture",
]


def word_ngrams(col: str | Column, n: int) -> Column:
    """Array of space-joined word ``n``-grams of a text column.

    Documents with fewer than ``n`` tokens yield an empty array.
    Generated with one ``transform`` over token positions — a single
    projection per row, no join or window, so gram generation is
    embarrassingly parallel.
    """
    toks = tokens(col)
    m = F.size(toks) - F.lit(n - 1)
    return F.when(m <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), m),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )


def repetition_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition metrics in the style of Gopher's
    repetition filters (Rae et al. 2021, table A1), adapted to
    word n-grams:

    - ``dup_word_frac``: 1 - distinct_words / total_words.
    - ``top_bigram_char_frac``: characters covered by the most
      repeated word 2-gram (count x gram length) / total chars.
      Only grams occurring >= 2 times count — a gram seen once is not
      repetition, and counting it would trivially flag every short
      document. Defined via max(count x length) so no tie-break is
      needed.
    - ``dup_trigram_char_frac``: characters covered by word 3-grams
      occurring more than once (sum of count x length over grams with
      count >= 2) / total chars. Adjacent grams overlap, so this can
      exceed 1.0 on highly repetitive text — callers threshold it,
      they don't sum it.
    - ``repetition_flag``: True when any metric crosses the
      (documented, Gopher-derived) threshold.

    Shape: explode 2-grams and 3-grams once each -> count per
    (doc, gram) -> re-aggregate per doc -> left-join back to the
    document spine so gram-less (short) docs keep zero metrics.
    Two shuffle rounds keyed on doc_id(+gram) — linear in corpus size,
    with map-side partial aggregation on both rounds.
    """
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.length(F.col(text_col)).cast("bigint").alias("n_chars"),
        F.size(tokens(text_col)).cast("bigint").alias("n_words"),
        F.size(F.array_distinct(tokens(text_col)))
        .cast("bigint")
        .alias("n_distinct_words"),
        word_ngrams(text_col, 2).alias("g2"),
        word_ngrams(text_col, 3).alias("g3"),
    )

    def gram_agg(col: str, metric: Column, alias: str) -> DataFrame:
        counts = (
            base.select("doc_id", F.explode(col).alias("gram"))
            .groupBy("doc_id", "gram")
            .agg(F.count("*").alias("cnt"))
        )
        return counts.groupBy("doc_id").agg(metric.alias(alias))

    top2 = gram_agg(
        "g2",
        F.max(
            F.when(F.col("cnt") >= 2, F.col("cnt") * F.length("gram")).otherwise(
                F.lit(0)
            )
        ),
        "top_bigram_chars",
    )
    dup3 = gram_agg(
        "g3",
        F.sum(
            F.when(F.col("cnt") >= 2, F.col("cnt") * F.length("gram")).otherwise(
                F.lit(0)
            )
        ),
        "dup_trigram_chars",
    )

    out = (
        base.drop("g2", "g3")
        .join(top2, "doc_id", "left")
        .join(dup3, "doc_id", "left")
        .select(
            "doc_id",
            F.round(
                F.when(
                    F.col("n_words") > 0,
                    1.0 - F.col("n_distinct_words") / F.col("n_words"),
                )
                .otherwise(F.lit(0.0))
                .cast("double"),
                6,
            ).alias("dup_word_frac"),
            F.round(
                (
                    F.coalesce(F.col("top_bigram_chars"), F.lit(0))
                    / F.greatest(F.col("n_chars"), F.lit(1))
                ).cast("double"),
                6,
            ).alias("top_bigram_char_frac"),
            F.round(
                (
                    F.coalesce(F.col("dup_trigram_chars"), F.lit(0))
                    / F.greatest(F.col("n_chars"), F.lit(1))
                ).cast("double"),
                6,
            ).alias("dup_trigram_char_frac"),
        )
        .withColumn(
            "repetition_flag",
            (
                (F.col("dup_word_frac") > 0.9)
                | (F.col("top_bigram_char_frac") > 0.2)
                | (F.col("dup_trigram_char_frac") > 0.6)
            ).cast("boolean"),
        )
    )
    return out


def quality_filter(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """End-to-end keep/drop verdict per document — the composed
    C4/Gopher-style curation gate: heuristic quality signals
    (:func:`mssql_dataframe_spark.operators.text.quality_features`)
    AND NOT the repetition flag (:func:`repetition_features`).

    One equi-join on ``doc_id`` between two linear scans; at 100 TB
    both sides partition on the same key, and the downstream corpus
    is ``filter(keep)`` — this frame IS the manifest of what survives
    curation, so it is what you audit before a training run.

    Returns (doc_id, n_words, quality_flag, repetition_flag, keep).
    """
    from .text import quality_features

    q = quality_features(df, text_col)
    r = repetition_features(df, text_col, id_col)
    return (
        q.select(id_col, "n_words", "quality_flag")
        .join(r.select(id_col, "repetition_flag"), id_col)
        .withColumn(
            "keep",
            (F.col("quality_flag") & ~F.col("repetition_flag")).cast("boolean"),
        )
    )


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Flag training documents sharing any word ``n``-gram with a
    benchmark/eval set (GPT-3 appendix-C style decontamination;
    production uses n=13, tests use smaller n because the synthetic
    docs are short).

    Returns (doc_id, n_overlapping_grams) for contaminated training
    docs only — n_overlapping_grams counts DISTINCT shared grams.

    Scale shape: the benchmark side is collapsed to a distinct gram
    set and broadcast (eval suites are tiny next to a 100 TB corpus),
    so the check is a map-side semi-probe over the training scan plus
    one doc_id-keyed count — the big side shuffles once, on doc_id,
    after the probe has already discarded almost every row.
    """
    bench_grams = (
        bench.select(F.explode(word_ngrams(text_col, n)).alias("gram")).distinct()
    )
    train_grams = train.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_ngrams(text_col, n)).alias("gram"),
    ).distinct()
    hits = train_grams.join(F.broadcast(bench_grams), "gram", "inner")
    return hits.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_overlapping_grams")
    )


# Redaction patterns: RE2-compatible (no lookaround, no backrefs) so
# the exact same pattern strings run on Spark (Java regex) and any
# RE2-based engine used as an oracle.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}-[0-9]{4}"
IPV4_RE = r"([0-9]{1,3}\.){3}[0-9]{1,3}"


def redact_pii(col: str | Column) -> dict[str, Column]:
    """PII redaction over a text column: emails -> <EMAIL>,
    E.164-ish phone numbers -> <PHONE>, IPv4 literals -> <IP>.

    Returns a dict of named columns: ``redacted`` (the scrubbed
    text) and per-category match counts. Order matters: emails are
    redacted before IPs so a dotted domain is never half-eaten by the
    IP pattern; counts are measured against the original text.
    Pure regexp expressions — codegen'd, no Python boundary.
    """
    c = F.col(col) if isinstance(col, str) else col
    n_emails = F.regexp_count(c, F.lit(EMAIL_RE))
    n_phones = F.regexp_count(c, F.lit(PHONE_RE))
    n_ips = F.regexp_count(c, F.lit(IPV4_RE))
    red = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    red = F.regexp_replace(red, PHONE_RE, "<PHONE>")
    red = F.regexp_replace(red, IPV4_RE, "<IP>")
    return {
        "redacted": red,
        "n_emails": n_emails.cast("bigint"),
        "n_phones": n_phones.cast("bigint"),
        "n_ips": n_ips.cast("bigint"),
    }


def corpus_mixture(
    df: DataFrame,
    by: tuple[str, ...] = ("source", "lang"),
    text_col: str = "text",
) -> DataFrame:
    """Training-mixture audit ("data card" query): per group, document
    count, token totals, length stats, and corpus share. One hash
    aggregation with map-side combine + one scalar total — the shape
    that survives any corpus size, because group cardinality
    (sources x languages) is tiny.
    """
    from pyspark.sql.window import Window

    n_tok = F.size(tokens(text_col)).cast("bigint")
    n_chars = F.length(F.col(text_col)).cast("bigint")
    agg = df.groupBy(*by).agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(n_tok).cast("bigint").alias("total_tokens"),
        F.sum(n_chars).cast("bigint").alias("total_chars"),
        F.round(F.avg(n_chars).cast("double"), 6).alias("avg_chars"),
    )
    # corpus share via an unpartitioned window over the ALREADY
    # AGGREGATED frame — its cardinality is sources x languages, so
    # the single-partition window is over dozens of rows, not the
    # corpus; no separate count() job over the 100 TB input.
    total_docs = F.sum("n_docs").over(Window.partitionBy())
    return agg.select(
        *by,
        "n_docs",
        "total_tokens",
        "total_chars",
        "avg_chars",
        F.round((F.col("n_docs") / total_docs).cast("double"), 6).alias(
            "doc_share"
        ),
    )


def per_source_cap(
    df: DataFrame,
    cap: int,
    by: str | tuple[str, ...] = "source",
    order_col: str = "doc_id",
    keep_col: str | None = None,
) -> DataFrame:
    """Per-domain/source document cap — the CommonCrawl-style curation
    rule "keep at most N documents per domain" that stops one
    boilerplate-heavy site from dominating the training mixture.

    Deterministic: within each group, rows are ranked by ``order_col``
    and the first ``cap`` survive. To prioritize by quality instead of
    id, pass e.g. ``order_col`` as a precomputed score column.

    Returns the surviving rows; with ``keep_col`` set, returns ALL
    rows plus a boolean keep flag (audit mode — lets the pipeline
    report what a cap WOULD drop before committing to it).

    Scale shape: one shuffle on the group key for ``row_number``. The
    pathological case is one giant domain; the window only needs
    per-group ORDER BY, so skew is bounded by the biggest domain's
    rows on one partition — at 100 TB prefer a two-phase variant
    (filter ``rank <= cap`` within salted subgroups first) if a single
    domain exceeds executor memory; typical web-domain distributions
    (heavy-tailed but < tens of millions per domain) fit.
    """
    from pyspark.sql.window import Window

    if cap < 1:
        raise ValueError("cap must be >= 1")
    keys = [by] if isinstance(by, str) else list(by)
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).asc())
    flagged = df.withColumn("__rn", F.row_number().over(w))
    if keep_col is not None:
        return flagged.withColumn(keep_col, F.col("__rn") <= cap).drop("__rn")
    return flagged.filter(F.col("__rn") <= cap).drop("__rn")


def quality_weighted_sample(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    floor_bp: int = 1000,
) -> DataFrame:
    """Quality-proportional source downsampling: each source keeps a
    fraction of ALL its documents equal to its quality-gate pass rate
    (in basis points, floored at ``floor_bp`` so no source vanishes) —
    data-derived mixture weights instead of the hand-tuned
    ``pct_by_stratum`` config, the common second pass after per-doc
    filtering ("low-quality domains contribute less, not just their
    failing pages").

    Determinism end to end: the pass rate is a pure count ratio turned
    into basis points with the integer round-half-up formula
    ``floor((2*10000*g + n) / (2n))`` (no ROUND-mode divergence), and
    the keep decision compares the 60-bit content-keyed md5 bucket
    against it — the same content key as dataset_split_hash, so a
    document's verdict never changes as the corpus grows.

    Returns surviving (id, source, keep_bp) rows. Scale shape: one
    quality scan + one per-source agg (broadcast back — sources are
    few), then a map-side filter; the corpus never shuffles.
    """
    from .training import _content_key

    flags = quality_filter(df, text_col=text_col, id_col=id_col).select(
        id_col, "keep"
    )
    joined = df.select(id_col, text_col, source_col).join(flags, id_col)
    rates = (
        joined.groupBy(source_col)
        .agg(
            F.sum(F.col("keep").cast("long")).alias("g"),
            F.count("*").alias("n"),
        )
        .select(
            source_col,
            F.greatest(
                F.lit(floor_bp),
                F.floor(
                    (2 * 10000 * F.col("g") + F.col("n"))
                    / (2.0 * F.col("n"))
                ).cast("int"),
            ).alias("keep_bp"),
        )
    )
    bucket = _content_key(id_col, text_col) % 10000
    return (
        joined.join(F.broadcast(rates), source_col)
        .withColumn("__bucket", bucket)
        .filter(F.col("__bucket") < F.col("keep_bp"))
        .select(id_col, source_col, "keep_bp")
    )


def fuzzy_decontaminate(
    train_df: DataFrame,
    benchmark_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    n_bands: int = 8,
    k: int = 8,
    rows_per_band: int = 2,
) -> DataFrame:
    """Fuzzy train/eval decontamination — the near-duplicate
    complement of :func:`decontamination_overlap`'s exact n-gram
    check (paraphrased or lightly-edited benchmark leakage slips past
    exact grams; GPT-3-style dedup uses Jaccard overlap instead).

    Built on the two-set LSH machinery (dedup.minhash_dedup_incremental
    with train as the probing side): band-join candidates, min-hash
    estimate prune, exact shingle-Jaccard verify — cost ∝ train size x
    bucket collisions, independent of how the benchmark suite grows,
    and the benchmark side is tiny so its signatures broadcast.

    Returns ONE ROW PER TRAIN DOC — the curation-gate shape:
    (id, contaminated, worst_jaccard, n_bench_hits); filter
    ``NOT contaminated`` to emit the clean corpus.
    """
    from .dedup import minhash_dedup_incremental

    pairs = minhash_dedup_incremental(
        train_df, benchmark_df, id_col, text_col,
        n_bands, k, threshold, rows_per_band=rows_per_band,
    )
    verdicts = pairs.groupBy("new_id").agg(
        F.max("jaccard").alias("worst_jaccard"),
        F.count("*").cast("bigint").alias("n_bench_hits"),
    )
    return (
        train_df.select(F.col(id_col))
        .join(verdicts, F.col(id_col) == F.col("new_id"), "left")
        .select(
            id_col,
            F.col("worst_jaccard").isNotNull().alias("contaminated"),
            "worst_jaccard",
            F.coalesce(F.col("n_bench_hits"), F.lit(0)).alias("n_bench_hits"),
        )
    )
