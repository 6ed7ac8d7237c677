"""Custom Python data source/sink contract tests (beyond the oracle
checks): offset-range replay determinism for the streaming reader, and
two-phase-commit hygiene for the KV sink (no uncommitted spools left
behind, committed store complete)."""

from __future__ import annotations

import os

from catenae_kafka_spark.sources.synthetic import (
    register,
    register_kv,
    stream_reader,
)

SF = "/root/testdata/sf0.001"


def test_stream_reader_offset_replay_is_exact():
    r = stream_reader({"rows": "100", "batchRows": "30"})
    # walk the live path
    offsets = [r.initialOffset()]
    batches = []
    while True:
        rows, nxt = r.read(offsets[-1])
        rows = list(rows)
        if not rows:
            break
        batches.append(rows)
        offsets.append(nxt)
    assert [len(b) for b in batches] == [30, 30, 30, 10]
    # replay every (start, end) range: must regenerate identical rows
    for i, batch in enumerate(batches):
        replay = list(r.readBetweenOffsets(offsets[i], offsets[i + 1]))
        assert replay == batch
    # drained source reports no data at an unchanged offset
    rows, nxt = r.read(offsets[-1])
    assert list(rows) == [] and nxt == offsets[-1]


def test_batch_reader_partitions_cover_rows_exactly(spark):
    register(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("rows", 1000)
        .option("partitions", 7)
        .load()
    )
    assert df.count() == 1000
    assert df.select("event_id").distinct().count() == 1000  # disjoint ranges


def test_kv_sink_two_phase_commit_hygiene(spark, tmp_path):
    register_kv(spark)
    out = str(tmp_path / "kv")
    from catenae_kafka_spark.catalog import catalog

    nation = catalog(spark, SF).nation
    nation.write.format("kv_store").option("path", out).mode("append").save()
    committed = os.path.join(out, "committed")
    spool = os.path.join(out, "_spool")
    # everything published, nothing half-written
    assert os.listdir(committed)
    assert os.listdir(spool) == []
    back = spark.read.json(committed)
    assert back.count() == nation.count()


def test_kv_sink_write_from_child_thread(spark, tmp_path):
    """Python data-source WRITE lookups resolve through the JVM's
    thread-local active session, which py4j child threads start
    without — stock PySpark fails DATA_SOURCE_NOT_FOUND on any
    ``.write.format("kv_store").save()`` off the session-creating
    thread (reads are unaffected). register_kv must pin the active
    session in the calling thread so parallel harnesses (check.py
    --jobs) and multi-threaded user code can use the sink."""
    import threading

    from catenae_kafka_spark.catalog import catalog

    result: dict[str, object] = {}

    def _save() -> None:
        try:
            register_kv(spark)  # pins the active session in THIS thread
            out = str(tmp_path / "kv_thread")
            catalog(spark, SF).nation.write.format("kv_store").option(
                "path", out
            ).mode("append").save()
            result["rows"] = spark.read.json(os.path.join(out, "committed")).count()
        except Exception as exc:  # noqa: BLE001
            result["err"] = exc

    t = threading.Thread(target=_save)
    t.start()
    t.join()
    assert "err" not in result, result.get("err")
    assert result["rows"] == 25
