"""Training-dataset assembly ops (packing, splits) and the WAV codec."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from mssql_dataframe_spark.operators import multimodal as M
from mssql_dataframe_spark.operators import training as TR


def test_wav_roundtrip():
    s = np.array([0, 1000, -1000, 32767, -32768, 7], dtype=np.int16)
    rate, out = M.decode_wav(M.encode_wav(s, 8000))
    assert rate == 8000
    assert np.array_equal(out, s)


def test_wav_tolerates_extra_chunks():
    s = np.array([5, -5, 9], dtype=np.int16)
    payload = M.encode_wav(s, 8000)
    # splice a LIST chunk (odd size -> exercises word alignment)
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    spliced = payload[:12] + extra + payload[12:]
    rate, out = M.decode_wav(spliced)
    assert rate == 8000 and np.array_equal(out, s)


def test_wav_rejects_non_pcm_mono():
    s = np.array([1, 2], dtype=np.int16)
    payload = bytearray(M.encode_wav(s, 8000))
    struct.pack_into("<H", payload, 22, 2)  # channels = 2
    with pytest.raises(ValueError):
        M.decode_wav(bytes(payload))


def test_pack_sequences_bins(spark):
    # tokens: 3, 4, 10, 2 with budget 5 -> before = 0,3,7,17
    rows = [(1, "a b c"), (2, "d e f g"), (3, " ".join("x" * 1 for _ in range(10))), (4, "y z")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["n_tokens"], r["bin_id"], r["bin_fill"])
        for r in TR.pack_sequences(df, budget=5).collect()
    }
    assert out[1] == (3, 0, 3)
    assert out[2] == (4, 0, 7)  # overflows bin 0 (packer doesn't split docs)
    assert out[3] == (10, 1, 12)  # oversized doc owns bin 1 and spills
    assert out[4] == (2, 3, 4)
    empty = spark.createDataFrame([(9, "   ")], "doc_id long, text string")
    assert TR.pack_sequences(empty, budget=5).collect()[0]["n_tokens"] == 0


def test_split_hash_deterministic_and_leak_free(spark):
    rows = [(i, f"text {i % 7}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {r["doc_id"]: r["split"] for r in TR.split_hash(df).collect()}
    b = {r["doc_id"]: r["split"] for r in TR.split_hash(df.repartition(7)).collect()}
    assert a == b  # partitioning-independent
    assert set(a.values()) <= {"train", "val", "test"}
    # identical (id, text) duplicates land in the same split
    dup = spark.createDataFrame(
        [(1, "same"), (1, "same")], "doc_id long, text string"
    )
    assert len({r["split"] for r in TR.split_hash(dup).collect()}) == 1


def test_stratified_sample_hash(spark):
    rows = [(i, f"t{i}", "web" if i % 2 else "book") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    kept = TR.stratified_sample_hash(
        df, "source", {"book": 100, "web": 20}
    ).collect()
    books = [r for r in kept if r["source"] == "book"]
    webs = [r for r in kept if r["source"] == "web"]
    assert len(books) == 200  # 100% of books kept
    assert 10 <= len(webs) <= 90  # ~20% of 200, hash-spread


def test_shuffle_deterministic_is_a_total_permutation(spark):
    """(shard, pos) must be a total, partitioning-independent
    permutation: positions are contiguous 1..n within every shard, and
    the coordinates don't change when the input arrives repartitioned."""
    from pyspark.sql import functions as F

    from mssql_dataframe_spark.operators.training import (
        shuffle_deterministic,
    )

    df = spark.range(500).select(F.col("id").alias("doc_id"))
    out = shuffle_deterministic(df, n_shards=8).collect()
    assert len(out) == 500
    by_shard: dict[int, list[int]] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= set(range(8))
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))

    again = shuffle_deterministic(df.repartition(13), n_shards=8).collect()
    assert {(r["doc_id"], r["shard"], r["pos"]) for r in again} == {
        (r["doc_id"], r["shard"], r["pos"]) for r in out
    }


def test_bin_index_exact_past_double_mantissa(spark):
    """Pin the r14 review fix: bin assignment must use exact bigint
    division — the old double path (`__before / budget` -> DOUBLE ->
    cast) mis-bins once the running token count passes 2^53. First
    divergence: 2^53+255 with budget=256 rounds UP under double to
    bin 2^45+1 while exact floor keeps it in bin 2^45."""
    from pyspark.sql import functions as F

    from mssql_dataframe_spark.operators.training import _bin_index

    probe = [2**53 + 255, 2**53 - 1, 2**53, 0, 255, 256, 10**18]
    df = spark.createDataFrame([(v,) for v in probe], "before long")
    got = {
        r["before"]: r["bin"]
        for r in df.select(
            "before", _bin_index("before", 256).alias("bin")
        ).collect()
    }
    for v in probe:
        assert got[v] == v // 256, f"{v}: {got[v]} != {v // 256}"
    # the double path really does diverge on the pinned boundary value
    assert int(float(2**53 + 255) / 256) != (2**53 + 255) // 256


def test_normalize_event_ts_floors_pre_epoch(spark):
    """Pin the r14 review fix: nanos->micros must FLOOR (DuckDB's
    ns->us cast semantics) — plain `div` truncates toward zero and
    lands pre-epoch -1500 ns on -1 us instead of -2 us."""
    from pyspark.sql import functions as F

    from mssql_dataframe_spark.events_source import normalize_event_ts

    ns = [-1500, -1000, -1, 0, 1, 999, 1500, 1_700_000_000_123_456_789]
    df = spark.createDataFrame([(v,) for v in ns], "ts long")
    out = {
        v: us
        for v, us in normalize_event_ts(df)
        .select(F.col("ts"))
        .toPandas()["ts"]
        .pipe(lambda s: zip(ns, [int(t.value // 1000) for t in s]))
    }
    for v in ns:
        assert out[v] == v // 1000, f"{v}: {out[v]} != {v // 1000}"
