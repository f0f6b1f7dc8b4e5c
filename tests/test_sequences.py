"""SQL Server SEQUENCE analog: named generators with atomic range
reservation (sp_sequence_get_range), gap semantics, concurrency."""

from __future__ import annotations

import threading

import pytest

from mssql_dataframe_spark import errors


def test_sequence_ranges_never_overlap_across_threads(engine):
    engine.store.create_sequence("seq.ord", start=100, increment=1)
    got = []

    def draw():
        for _ in range(20):
            got.append(tuple(engine.store.next_sequence_values("seq.ord", 5)))

    threads = [threading.Thread(target=draw) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    flat = [v for block in got for v in block]
    assert len(flat) == len(set(flat)) == 400
    assert min(flat) == 100 and max(flat) == 499


def test_sequence_increment_and_errors(engine):
    engine.store.create_sequence("seq.even", start=0, increment=2)
    assert engine.store.next_sequence_values("seq.even", 3) == [0, 2, 4]
    assert engine.store.next_sequence_values("seq.even") == [6]
    with pytest.raises(ValueError, match="already exists"):
        engine.store.create_sequence("seq.even")
    with pytest.raises(errors.SQLTableDoesNotExist):
        engine.store.next_sequence_values("seq.ghost")
    engine.store.drop_sequence("seq.even")
    with pytest.raises(errors.SQLTableDoesNotExist):
        engine.store.drop_sequence("seq.even")
