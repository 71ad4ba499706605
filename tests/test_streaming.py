"""Batch/stream parity for the windowed event aggregation."""

from __future__ import annotations

import shutil
import sys
import tempfile

import pytest

sys.path.insert(0, "/root/repo")

from geo_linked_open_data_kg_spark.streaming.events import (  # noqa: E402
    read_events_stream,
    run_available_now,
    windowed_counts,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="kg_stream_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_stream_matches_batch(spark, tmpdir):
    import os
    src = f"{tmpdir}/events"
    os.makedirs(src)  # file source streams a DIRECTORY of files
    shutil.copy(f"{SF_DIR}/events.parquet", f"{src}/part-0.parquet")

    stream = read_events_stream(spark, src)
    assert stream.isStreaming
    agg = windowed_counts(stream)
    run_available_now(agg, "ev_win", f"{tmpdir}/ckpt")

    got = {tuple(r) for r in spark.sql("SELECT * FROM ev_win").collect()}
    batch = windowed_counts(
        spark.read.parquet(f"{SF_DIR}/events.parquet"))
    want = {tuple(r) for r in batch.collect()}
    assert got == want and len(got) > 0
