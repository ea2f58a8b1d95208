"""Structured Streaming ingest: file-source micro-batches, streaming dedup,
checkpoint resume, stateful per-host rate gate."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from webcrawler_spark.streaming import ingest as I


def _write_batch(path: str, rows: list[tuple]) -> None:
    pdf = pd.DataFrame(
        rows, columns=["url", "source_url", "depth", "source_priority", "discovered_ts"]
    )
    pdf["discovered_ts"] = pd.to_datetime(pdf["discovered_ts"]).astype("datetime64[us]")
    pdf["source_url"] = pdf["source_url"].astype("string")
    pdf["depth"] = pdf["depth"].astype("int32")
    pdf["source_priority"] = pdf["source_priority"].astype("int32")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pdf.to_parquet(path)


@pytest.fixture()
def dirs(tmp_path):
    return {
        "in": str(tmp_path / "in"),
        "out": str(tmp_path / "out"),
        "ckpt": str(tmp_path / "ckpt"),
    }


def test_streaming_dedup_and_resume(spark, dirs):
    # batch 1: 3 urls, one exact dup and one canonical-variant dup
    _write_batch(
        f"{dirs['in']}/b1.parquet",
        [
            ("https://site1.com/a", None, 0, 0, "2024-01-01 00:00:00"),
            ("https://site1.com/a", None, 0, 0, "2024-01-01 00:00:01"),
            ("https://www.site1.com/a/", None, 0, 0, "2024-01-01 00:00:02"),
            ("https://site2.com/b", None, 0, 0, "2024-01-01 00:00:03"),
        ],
    )
    I.run_ingest(I.stream_candidates(spark, dirs["in"]), dirs["out"], dirs["ckpt"])
    out1 = spark.read.parquet(dirs["out"])
    norms1 = sorted(r["url_norm"] for r in out1.select("url_norm").collect())
    assert norms1 == ["https://site1.com/a", "https://site2.com/b"]

    # batch 2 arrives: one new url + a replay of site2 within the watermark
    _write_batch(
        f"{dirs['in']}/b2.parquet",
        [
            ("https://site2.com/b", None, 0, 0, "2024-01-01 00:00:10"),
            ("https://site3.com/c", None, 1, 0, "2024-01-01 00:00:11"),
        ],
    )
    # resume from the same checkpoint: only new files are read, dedup state
    # persists across runs
    I.run_ingest(I.stream_candidates(spark, dirs["in"]), dirs["out"], dirs["ckpt"])
    out2 = spark.read.parquet(dirs["out"])
    norms2 = sorted(r["url_norm"] for r in out2.select("url_norm").collect())
    assert norms2 == [
        "https://site1.com/a",
        "https://site2.com/b",
        "https://site3.com/c",
    ], "replayed site2/b must be deduped by checkpointed state"


def test_streaming_host_rate_gate(spark, dirs):
    rows = [
        (f"https://hot.com/p{i}", None, 0, 0, f"2024-01-01 00:00:{i:02d}")
        for i in range(6)
    ] + [("https://cold.com/x", None, 0, 0, "2024-01-01 00:01:00")]
    _write_batch(f"{dirs['in']}/b1.parquet", rows)
    deduped = I.canonical_dedup_stream(I.stream_candidates(spark, dirs["in"]))
    gated = I.host_rate_gate(deduped, budget_per_host=4)
    q = (
        gated.writeStream.format("parquet")
        .option("path", dirs["out"])
        .option("checkpointLocation", dirs["ckpt"])
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.read.parquet(dirs["out"])
    by_status = {
        (r["host"], r["status"]): r["n"]
        for r in out.groupBy("host", "status").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by_status.get(("hot.com", "scheduled")) == 4
    assert by_status.get(("hot.com", "deferred")) == 2
    assert by_status.get(("cold.com", "scheduled")) == 1


def test_streaming_seen_set_anti_join(spark, dirs):
    """Tier 2 in streaming: the stream-static left-anti join drops rows whose
    fingerprints are already in the persistent seen set, and because the
    static side re-reads per micro-batch, growing the seen table between
    runs filters later batches without restarting the stream."""
    from webcrawler_spark.functions import columns as C

    seen_dir = dirs["out"] + "_seen"
    # seed the persistent seen set with site1.com/a's canonical fingerprint
    spark.createDataFrame(
        [("https://site1.com/a",)], "url_norm string"
    ).select(C.url_fp(F.col("url_norm")).alias("url_fp")).write.parquet(seen_dir)
    seen = spark.read.parquet(seen_dir)

    _write_batch(
        f"{dirs['in']}/b1.parquet",
        [
            ("https://site1.com/a", None, 0, 0, "2024-01-01 00:00:00"),  # seen
            ("https://www.site1.com/a/", None, 0, 0, "2024-01-01 00:00:01"),  # seen (canonical dup)
            ("https://site2.com/b", None, 0, 0, "2024-01-01 00:00:02"),  # new
        ],
    )
    I.run_ingest(I.stream_candidates(spark, dirs["in"]), dirs["out"], dirs["ckpt"], seen=seen)
    out = {r["url_norm"] for r in spark.read.parquet(dirs["out"]).collect()}
    assert out == {"https://site2.com/b"}

    # grow the seen set (simulating an epoch commit), stream a second batch.
    # NOTE: a plain-parquet static side freezes its file listing when the
    # DataFrame is created, so each availableNow run re-reads the table —
    # the natural shape when ingest runs are triggered per epoch commit
    spark.createDataFrame(
        [("https://site3.com/c",)], "url_norm string"
    ).select(C.url_fp(F.col("url_norm")).alias("url_fp")).write.mode("append").parquet(seen_dir)
    seen = spark.read.parquet(seen_dir)
    _write_batch(
        f"{dirs['in']}/b2.parquet",
        [
            ("https://site3.com/c", None, 0, 0, "2024-01-01 00:01:00"),  # now seen
            ("https://site4.com/d", None, 0, 0, "2024-01-01 00:01:01"),  # new
        ],
    )
    I.run_ingest(I.stream_candidates(spark, dirs["in"]), dirs["out"], dirs["ckpt"], seen=seen)
    out = {r["url_norm"] for r in spark.read.parquet(dirs["out"]).collect()}
    assert out == {"https://site2.com/b", "https://site4.com/d"}


def test_streaming_sessionize_timeout_close(spark, tmp_path):
    """Event-time sessionization: a session emits only once the watermark
    passes last_event + gap; open sessions (plural — a within-batch gap
    opens a second one) stay buffered in state until then."""
    import pandas as pd

    src = tmp_path / "events_in"
    src.mkdir()

    def write(name, rows):
        pdf = pd.DataFrame(rows, columns=["user_id", "ts"])
        pdf["user_id"] = pdf["user_id"].astype("int64")
        pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
        pdf.to_parquet(src / name)

    # batch 1: users 1, 2 (user 1 has a within-batch gap -> 2 sessions)
    write("b1.parquet", [
        (1, "2024-01-01 00:00:00"), (1, "2024-01-01 00:00:05"),
        (1, "2024-01-01 00:10:00"),  # > 60s gap -> opens a second session
        (2, "2024-01-01 00:00:03"),
    ])
    write("b2.parquet", [(3, "2024-01-01 01:00:00")])
    write("b3.parquet", [(4, "2024-01-01 02:00:00")])

    from webcrawler_spark.streaming.ingest import streaming_sessionize

    events = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withWatermark("ts", "10 seconds")
    )
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        streaming_sessionize(events, gap_seconds=60)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in spark.read.parquet(out_dir).collect()
    }
    # user 1's sessions and user 2's time out once the watermark passes
    # each session's last+60s (the first emits in a LATER batch than it
    # was seen in — never before the watermark allows);
    # user 3 closes in the final no-data batch (watermark 01:59:50 > its
    # 01:01:00 timeout); user 4 stays open — the watermark never passes
    # 02:01:00, so no session row is emitted for it
    assert got == {
        (1, "2024-01-01 00:00:00", "2024-01-01 00:00:05", 2),
        (1, "2024-01-01 00:10:00", "2024-01-01 00:10:00", 1),
        (2, "2024-01-01 00:00:03", "2024-01-01 00:00:03", 1),
        (3, "2024-01-01 01:00:00", "2024-01-01 01:00:00", 1),
    }


def test_streaming_sessionize_late_event_bridges(spark, tmp_path):
    """An out-of-order event the watermark still admits must land INSIDE
    (here: bridge) earlier open sessions — matching the batch sessionize
    over the same admitted events — instead of fragmenting them. This is
    exactly what an eager within-batch close would get wrong."""
    import pandas as pd

    src = tmp_path / "events_in"
    src.mkdir()

    def write(name, rows):
        pdf = pd.DataFrame(rows, columns=["user_id", "ts"])
        pdf["user_id"] = pdf["user_id"].astype("int64")
        pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
        pdf.to_parquet(src / name)

    # batch 1: a >60s within-batch gap -> TWO open sessions
    write("b1.parquet", [(1, "2024-01-01 00:00:00"), (1, "2024-01-01 00:02:00")])
    # batch 2: late event in the gap (admitted — 10 min watermark) bridges them
    write("b2.parquet", [(1, "2024-01-01 00:01:00")])
    # batch 3: advances the watermark past the bridged session's close
    write("b3.parquet", [(1, "2024-01-01 01:00:00")])

    from webcrawler_spark.streaming.ingest import streaming_sessionize

    events = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withWatermark("ts", "600 seconds")
    )
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        streaming_sessionize(events, gap_seconds=60)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in spark.read.parquet(out_dir).collect()
    }
    # ONE bridged session of 3 events; the 01:00:00 session stays open
    # (watermark ends at 00:50:00 < its 01:01:00 close)
    assert got == {(1, "2024-01-01 00:00:00", "2024-01-01 00:02:00", 3)}


def test_stream_to_catalog_exactly_once(spark, dirs, tmp_path):
    """Streaming ingest commits each micro-batch as a catalog epoch;
    replays of committed batches are no-ops; resume picks up only new
    files; readers see exactly the committed union."""
    from webcrawler_spark.storage.catalog import Catalog
    from webcrawler_spark.streaming.ingest import (
        commit_stream_batch,
        stream_to_catalog,
        stream_candidates,
        canonical_dedup_stream,
    )

    cat = Catalog(spark, str(tmp_path / "cat"))
    _write_batch(
        f"{dirs['in']}/b1.parquet",
        [("https://s1.com/a", None, 0, 0, "2024-01-01 00:00:00"),
         ("https://s2.com/b", None, 0, 0, "2024-01-01 00:00:01")],
    )
    stream = canonical_dedup_stream(stream_candidates(spark, dirs["in"]))
    stream_to_catalog(stream.select("url_norm", "url_fp", "host"), cat, dirs["ckpt"])
    e0 = cat.last_committed_epoch()
    assert e0 is not None
    seen0 = {r["url_norm"] for r in cat.read_delta_union("seen", e0).collect()}
    assert seen0 == {"https://s1.com/a", "https://s2.com/b"}

    # new file arrives; resume from the same checkpoint -> one more epoch
    # (batch ids from the checkpoint may skip over trailing empty batches,
    # so epoch ids are monotone but not necessarily dense)
    _write_batch(
        f"{dirs['in']}/b2.parquet",
        [("https://s3.com/c", None, 0, 0, "2024-01-01 00:01:00")],
    )
    stream = canonical_dedup_stream(stream_candidates(spark, dirs["in"]))
    stream_to_catalog(stream.select("url_norm", "url_fp", "host"), cat, dirs["ckpt"])
    e1 = cat.last_committed_epoch()
    assert e1 > e0
    seen1 = {r["url_norm"] for r in cat.read_delta_union("seen", e1).collect()}
    assert seen1 == seen0 | {"https://s3.com/c"}

    # no new files -> no new epochs
    stream = canonical_dedup_stream(stream_candidates(spark, dirs["in"]))
    stream_to_catalog(stream.select("url_norm", "url_fp", "host"), cat, dirs["ckpt"])
    assert cat.last_committed_epoch() == e1

    # direct replay of a committed batch id is a no-op (exactly-once)
    replay = spark.createDataFrame(
        [("https://dup.com/x", 1, "dup.com")], "url_norm string, url_fp long, host string"
    )
    assert commit_stream_batch(cat, "seen", e1, replay) == 0
    assert {r["url_norm"] for r in cat.read_delta_union("seen", e1).collect()} == seen1


def test_stream_epoch_collision_raises(spark, tmp_path):
    """A stream epoch at-or-behind a catalog epoch that THIS stream did not
    write is a misconfiguration (shared catalog / wrong base_epoch) — it
    must raise, not silently drop the micro-batch."""
    from webcrawler_spark.storage.catalog import Catalog
    from webcrawler_spark.streaming.ingest import commit_stream_batch

    cat = Catalog(spark, str(tmp_path / "cat_collide"))
    df = spark.createDataFrame(
        [("https://a.com/", 1, "a.com")], "url_norm string, url_fp long, host string"
    )
    # a batch-epoch writer (no stream marker) owns epoch 5
    cat.commit_epoch(5, {"seen": cat.stage("seen", 5, df)}, {"epoch": 5})
    with pytest.raises(ValueError, match="collision"):
        commit_stream_batch(cat, "seen", 3, df)


def test_stream_cms_merges_to_batch_sketch(spark, dirs, tmp_path):
    """Per-micro-batch CMS deltas committed to the catalog sum to exactly
    the sketch a single batch build produces over the union — the
    mergeable-sketch exactly-once story — and flood estimates stay
    one-sided (>= true count per host)."""
    from webcrawler_spark.operators import sketches as SK
    from webcrawler_spark.storage.catalog import Catalog

    # two micro-batches of discovered URLs; host h0 floods in both
    batches = [
        [(f"https://h{i % 3}.test/p{j}",) for j in range(20) for i in range(1 + (j % 2))],
        [("https://h0.test/x%d" % j,) for j in range(30)],
    ]
    for bi, rows in enumerate(batches):
        pdf = pd.DataFrame(rows, columns=["url"])
        os.makedirs(dirs["in"], exist_ok=True)
        pdf.to_parquet(os.path.join(dirs["in"], f"b{bi}.parquet"))

    keyed_stream = (
        spark.readStream.schema("url string")
        .option("maxFilesPerTrigger", 1)
        .parquet(dirs["in"])
        .withColumn("host_fp", F.pmod(F.xxhash64(F.split_part(F.col("url"), F.lit("/"), F.lit(3))), F.lit(2**31)))
    )
    cat = Catalog(spark, str(tmp_path / "cms_cat"))
    I.stream_cms_to_catalog(keyed_stream, cat, dirs["ckpt"], key_col="host_fp")

    merged = I.merged_cms(cat, cat.last_committed_epoch())
    all_rows = spark.read.parquet(dirs["in"]).withColumn(
        "host_fp", F.pmod(F.xxhash64(F.split_part(F.col("url"), F.lit("/"), F.lit(3))), F.lit(2**31))
    )
    want = SK.build_cms(all_rows, "host_fp")
    a = {(r["r"], r["col"], r["cnt"]) for r in merged.collect()}
    b = {(r["r"], r["col"], r["cnt"]) for r in want.collect()}
    assert a == b and len(a) > 0

    truth = all_rows.groupBy("host_fp").agg(F.count(F.lit(1)).alias("true_cnt"))
    est = SK.estimate_cms(merged, truth, "host_fp").collect()
    assert all(r["est_cnt"] >= r["true_cnt"] for r in est)
    # the flooding host is identifiable from the sketch alone
    top = max(est, key=lambda r: r["est_cnt"])
    assert top["true_cnt"] == max(r["true_cnt"] for r in est)


def test_streaming_trending_terms_windows_and_late_drop(spark, tmp_path):
    """Sliding-window term counts over a text stream: counts land in the
    right event-time windows, a late-but-inside-watermark row still
    counts, and a window only emits once the watermark closes it
    (append mode — the emission batch is the one AFTER the watermark
    passes)."""
    from datetime import datetime

    from webcrawler_spark.streaming import ingest as I

    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ck"))
    os.makedirs(in_dir)

    def _write(name, rows):
        pdf = pd.DataFrame(rows, columns=["ts", "text"])
        pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
        pdf.to_parquet(f"{in_dir}/{name}")

    def _run():
        stream = (
            spark.readStream.schema("ts timestamp, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        q = (
            I.streaming_trending_terms(stream, window_seconds=60,
                                       watermark_seconds=30)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    t = lambda s_: datetime(2024, 1, 1, 0, 0, s_)  # noqa: E731
    _write("b1.parquet", [(t(5), "spark spark crawl"), (t(50), "crawl")])
    _run()   # watermark commits at 50-30=20s; window [0,60) still open
    # t=30 is LATE (event time < max seen) but above the 20s watermark ->
    # must still count; the 02:00 row pushes the watermark past 60s
    _write("b2.parquet", [(t(30), "spark"),
                          (datetime(2024, 1, 1, 0, 2, 0), "closer words")])
    _run()
    _write("b3.parquet", [(datetime(2024, 1, 1, 0, 4, 0), "flusher")])
    _run()   # this batch emits the closed [0,60) window
    out = spark.read.parquet(out_dir)
    rows = {(60 * r["window_start"].minute + r["window_start"].second,
             r["term"]): r["n"] for r in out.collect()}
    assert rows[(0, "spark")] == 3   # 2 from b1 + 1 late-but-in-watermark
    assert rows[(0, "crawl")] == 2
