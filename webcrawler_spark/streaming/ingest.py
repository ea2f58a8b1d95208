"""Structured Streaming ingest mode — the reference's Kafka consumers
(services/url-frontier/app.py:327-375) as a readStream pipeline.

The batch-epoch formulation (plans/epoch.py) is the primary mode — it is
what makes crawl ordering reproducible (SURVEY §1.4). This module is the
continuous-ingest alternative for the frontier's *discovery* side: a stream
of candidate URLs is canonicalized, watermarked, streaming-deduped on the
64-bit fingerprint, and appended to the frontier table; a stateful per-host
rate gate (applyInPandasWithState) mirrors the scheduler's token bucket
(politeness_manager.py:189-206).

Checkpointing is Spark's own (offsets + dedup state live in the checkpoint
dir), so `trigger(availableNow=True)` gives resumable incremental batches —
the streaming twin of the epoch snapshots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, IntegerType, LongType, StringType, StructField, StructType,
    TimestampType,
)

from ..operators import dedup as D

CANDIDATE_SCHEMA = StructType(
    [
        StructField("url", StringType(), True),
        StructField("source_url", StringType(), True),
        StructField("depth", IntegerType(), True),
        StructField("source_priority", IntegerType(), True),
        StructField("discovered_ts", TimestampType(), True),
    ]
)


def stream_candidates(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of candidate-URL batches (the Kafka stand-in:
    each dropped parquet file is a producer batch)."""
    return (
        spark.readStream.schema(CANDIDATE_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )


def canonical_dedup_stream(
    candidates: DataFrame,
    watermark_delay: str = "10 minutes",
    seen: DataFrame | None = None,
) -> DataFrame:
    """Canonicalize + streaming-dedup on url_fp.

    Tier 1 (intra-stream): dropDuplicatesWithinWatermark keeps the
    seen-fingerprint state only for the watermark horizon — bounded state at
    10^10 scale; this removes the duplicate storm the reference absorbs with
    its Redis set.

    Tier 2 (cross-epoch, optional): a stream-static left-anti join against
    the persistent ``seen`` table (the last committed epoch snapshot) — the
    streaming twin of the batch anti-join; rows seen in prior epochs never
    reach the sink. With a plain parquet path the static side's file listing
    freezes at DataFrame creation, so pass a freshly-read frame per
    availableNow run (the natural shape when ingest runs per epoch commit);
    a catalog-backed table (Iceberg/Delta) refreshes per micro-batch even in
    a long-running stream."""
    canon = D.canonicalize(candidates)
    deduped = canon.withWatermark("discovered_ts", watermark_delay).dropDuplicatesWithinWatermark(
        ["url_fp"]
    )
    if seen is not None:
        deduped = deduped.join(seen.select("url_fp"), "url_fp", "left_anti")
    return deduped


def run_ingest(
    candidates: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    watermark_delay: str = "10 minutes",
    seen: DataFrame | None = None,
) -> None:
    """One availableNow micro-batch run: process all new files, append the
    deduped canonical rows to ``out_dir``, commit offsets+state to the
    checkpoint. Re-running with the same checkpoint resumes incrementally."""
    deduped = canonical_dedup_stream(candidates, watermark_delay, seen=seen)
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# ---- stateful per-host rate gate (P8 as a streaming operator) ------------------

_GATE_STATE = StructType([StructField("used", LongType(), False)])
_GATE_OUT = StructType(
    [
        StructField("host", StringType(), True),
        StructField("url_norm", StringType(), True),
        StructField("url_fp", LongType(), True),
        StructField("status", StringType(), True),
    ]
)


def host_rate_gate(deduped: DataFrame, budget_per_host: int) -> DataFrame:
    """applyInPandasWithState: admit at most ``budget_per_host`` URLs per
    host across the stream's lifetime; overflow rows are marked deferred
    (the reference's per-domain rate counter, politeness_manager.py:189-206,
    without Redis). Deterministic within a batch: rows are admitted in
    (url_norm) order."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def gate(key, pdfs, state):
        used = state.get[0] if state.exists else 0
        # gather all Arrow chunks first: a group spanning chunks has no
        # cross-chunk ordering, and admission must follow ONE url_norm sort
        # for the determinism guarantee
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            state.update((used,))
            return
        pdf = pd.concat(chunks).sort_values("url_norm")
        n = len(pdf)
        admit = max(0, min(budget_per_host - used, n))
        used += admit
        status = ["scheduled"] * admit + ["deferred"] * (n - admit)
        state.update((used,))
        yield pd.DataFrame(
            {
                "host": pdf["host"].values,
                "url_norm": pdf["url_norm"].values,
                "url_fp": pdf["url_fp"].values,
                "status": status,
            }
        )

    return deduped.groupBy("host").applyInPandasWithState(
        gate,
        outputStructType=_GATE_OUT,
        stateStructType=_GATE_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_SESSION_OUT = StructType(
    [
        StructField("user_id", LongType(), True),
        StructField("session_start", TimestampType(), True),
        StructField("session_end", TimestampType(), True),
        StructField("n_events", LongType(), True),
    ]
)

_SESSION_STATE = StructType(
    [
        StructField("start_us", ArrayType(LongType()), True),
        StructField("last_us", ArrayType(LongType()), True),
        StructField("n", ArrayType(LongType()), True),
    ]
)


def streaming_sessionize(events: DataFrame, gap_seconds: int = 60) -> DataFrame:
    """Event-time session windows with watermark-based close (the streaming
    form of operators/sessions.sessionize: same gap rule, but a session
    EMITS only once the watermark passes last_event + gap — never earlier).

    State per user is a LIST of open sessions (three parallel long arrays),
    not a single session: a within-batch gap opens a second session but the
    first stays buffered until the watermark passes, so an out-of-order
    event the watermark still admits can land inside (or bridge) earlier
    sessions and the result matches the batch sessionize over the same
    admitted events. At web scale the state store holds a few 24-byte
    tuples per ACTIVE user — one per open session — not per event.

    ``events`` must carry (user_id long, ts timestamp) WITH a watermark
    already applied (the timeout clock is the watermark)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = gap_seconds * 1_000_000

    def sessionize(key, pdfs, state):
        if state.exists:
            starts, lasts, ns = state.get
            items = [
                (int(s), int(l), int(c)) for s, l, c in zip(starts, lasts, ns)
            ]
        else:
            items = []
        if not state.hasTimedOut:
            # a large group spans multiple Arrow chunks with NO cross-chunk
            # time ordering — gather every chunk before the one sorted merge
            for pdf in pdfs:
                if len(pdf):
                    # Arrow hands timestamps to pandas as datetime64[ns]
                    ts_us = pd.to_datetime(pdf["ts"]).astype("int64") // 1000
                    items.extend((int(t), int(t), 1) for t in ts_us)
        # one sorted sweep merges points into sessions AND sessions into
        # each other (a late point can bridge two previously-open sessions)
        items.sort()
        merged: list[tuple[int, int, int]] = []
        for s, l, c in items:
            if merged and s - merged[-1][1] <= gap_us:
                ps, pl, pc = merged[-1]
                merged[-1] = (ps, max(pl, l), pc + c)
            else:
                merged.append((s, l, c))
        # close only sessions no admissible event can still extend: an
        # event at ts >= watermark may yet arrive, so a session closes
        # strictly after watermark > last + gap
        wm_us = state.getCurrentWatermarkMs() * 1000
        closed = [x for x in merged if wm_us > 0 and x[1] + gap_us < wm_us]
        open_ = [x for x in merged if not (wm_us > 0 and x[1] + gap_us < wm_us)]
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(closed),
                    "session_start": [
                        pd.Timestamp(s, unit="us") for s, _, _ in closed
                    ],
                    "session_end": [
                        pd.Timestamp(l, unit="us") for _, l, _ in closed
                    ],
                    "n_events": [c for _, _, c in closed],
                }
            )
        if open_:
            state.update(
                (
                    [s for s, _, _ in open_],
                    [l for _, l, _ in open_],
                    [c for _, _, c in open_],
                )
            )
            # wake when the earliest open session becomes closeable;
            # Spark requires the timeout to sit strictly past the watermark
            timeout_ms = min(l for _, l, _ in open_) // 1000 + gap_seconds * 1000
            state.setTimeoutTimestamp(max(timeout_ms, wm_us // 1000 + 1))
        elif state.exists:
            state.remove()

    return events.groupBy("user_id").applyInPandasWithState(
        sessionize,
        outputStructType=_SESSION_OUT,
        stateStructType=_SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def commit_stream_batch(cat, table: str, epoch: int, batch_df: DataFrame) -> int:
    """Stage + commit one micro-batch as a catalog epoch, idempotently.

    Structured Streaming replays a failed batch under the SAME batch_id;
    both halves tolerate that: `Catalog.stage` overwrites the (uncommitted)
    epoch dir, and a batch whose epoch is already in the manifest is
    skipped entirely. Data staged by a crash that never reached
    commit_epoch is invisible to readers (snapshot isolation) and simply
    overwritten on replay."""
    committed = cat.last_committed_epoch()
    if committed is not None and committed >= epoch:
        # Distinguish a genuine replay (this stream already committed this
        # exact epoch — the marker we wrote is in the manifest) from a
        # collision (base_epoch misconfigured, or the catalog's epochs are
        # ahead because another writer shares it). Silently returning 0 on
        # a collision would drop new micro-batches with no signal.
        prior = cat.counters(epoch)
        if prior is not None and prior.get("stream_table") == table:
            return 0  # replay of an already-committed batch
        raise ValueError(
            f"stream epoch collision: catalog at {cat.root!r} has committed "
            f"epoch {committed} >= incoming stream epoch {epoch}, but epoch "
            f"{epoch} was not written by this stream (table={table!r}). "
            "Use a dedicated catalog root per stream or fix base_epoch."
        )
    n = cat.stage(table, epoch, batch_df)
    cat.commit_epoch(
        epoch, {table: n}, {"epoch": epoch, "rows": n, "stream_table": table}
    )
    return n


def stream_to_catalog(
    deduped: DataFrame,
    cat,
    checkpoint: str,
    table: str = "seen",
    base_epoch: int = 0,
) -> None:
    """foreachBatch sink: the streaming ingest feeds the SAME
    snapshot-versioned tables the batch epochs read — each micro-batch
    becomes one committed catalog epoch (``base_epoch + batch_id``),
    exactly-once (see :func:`commit_stream_batch`). Use a dedicated
    catalog root (or table) per stream; epoch ids must stay monotone."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return  # availableNow can fire a trailing empty batch
        commit_stream_batch(cat, table, base_epoch + int(batch_id), batch_df)

    q = (
        deduped.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_cms_to_catalog(
    keyed: DataFrame,
    cat,
    checkpoint: str,
    key_col: str = "host_fp",
    width: int = 256,
    base_epoch: int = 0,
    table: str = "cms_cells",
) -> None:
    """Streaming host-flood counters: each micro-batch commits its OWN
    Count-Min sketch (operators/sketches.build_cms) as a catalog epoch —
    ≤ depth×width rows per batch no matter the batch size. The global
    sketch is the cell-wise SUM over the delta union (`merged_cms`): the
    mergeable-sketch property means no read-modify-write, so exactly-once
    falls out of the same replay-skip as :func:`stream_to_catalog`, and
    the accumulated state a 10^10-URL discovery stream leaves behind is
    KBs per batch instead of a per-host counter table."""
    from ..operators import sketches as SK

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        delta = SK.build_cms(batch_df, key_col, width=width)
        commit_stream_batch(cat, table, base_epoch + int(batch_id), delta)

    q = (
        keyed.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def merged_cms(cat, upto: int, table: str = "cms_cells") -> DataFrame:
    """The global sketch over all committed micro-batches: cell-wise sum
    (CMS merge) of the per-batch deltas."""
    df = cat.read_delta_union(table, upto)
    return df.groupBy("r", "col").agg(F.sum("cnt").alias("cnt"))


def streaming_trending_terms(
    docs: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    window_seconds: int = 60,
    slide_seconds: int | None = None,
    watermark_seconds: int = 120,
    min_count: int = 1,
) -> DataFrame:
    """Windowed term-frequency stream — the "trending now" feed over
    freshly crawled text (per sliding event-time window: term counts,
    late data bounded by the watermark). Downstream takes per-window
    top-k either in the sink's foreachBatch (bounded: one window's terms)
    or by reading the append-mode output after window close.

    100 TB shape: explode → watermarked windowed hash-agg — Spark keeps
    ONE partial aggregate per (window, term) in state, not per row;
    state size is |active windows| × |vocab-in-window|, evicted at the
    watermark. The same plan as the batch keywords_global, lifted to
    event time."""
    from pyspark.sql import functions as F

    from ..operators.textstats import tokens

    slide = slide_seconds or window_seconds
    return (
        docs.withWatermark(ts_col, f"{watermark_seconds} seconds")
        .select(
            F.window(F.col(ts_col), f"{window_seconds} seconds",
                     f"{slide} seconds").alias("win"),
            F.explode(tokens(F.col(text_col))).alias("term"),
        )
        .groupBy("win", "term")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "term",
            "n",
        )
    )
