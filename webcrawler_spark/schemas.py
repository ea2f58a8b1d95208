"""Fixed explicit schemas for every engine table.

The reference is schema-by-convention (JSON dicts on Kafka, reference
services/url-frontier/app.py:167-177, init.sql:4-52); here every table has a
declared StructType so writes are enforced and resume is schema-stable.

The `pages` schema is the authoritative input hint:
(url:string, warc_ts:timestamp, html:binary, text:string, lang:string).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---- input (Common-Crawl-style web pages) -----------------------------------
PAGES = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), False),
        StructField("text", StringType(), False),
        StructField("lang", StringType(), False),
    ]
)

# seed list (reference test_frontier.py:55-71 message shape)
SEEDS = StructType(
    [
        StructField("url", StringType(), False),
        StructField("priority", IntegerType(), False),
        StructField("depth", IntegerType(), False),
    ]
)

# robots dimension table (replaces live fetch, politeness_manager.py:76-149).
# allow_prefixes carries urllib-parity Allow carve-outs; the gate is
# longest-match-wins over both arrays (columns.robots_allows).
ROBOTS = StructType(
    [
        StructField("host", StringType(), False),
        StructField("allow_prefixes", ArrayType(StringType(), False), False),
        StructField("disallow_prefixes", ArrayType(StringType(), False), False),
        StructField("crawl_delay", DoubleType(), False),
        StructField("fetched_epoch", IntegerType(), False),
    ]
)

# ---- engine state tables (checkpointed per epoch) ----------------------------
# frontier: per init.sql:4-19 plus 64-bit fingerprint. Stored merge-on-read
# (catalog MERGE_TABLES): each epoch appends only touched rows; latest
# status_epoch wins per url_fp. Read via Catalog.read_merged("frontier", E).
FRONTIER = StructType(
    [
        StructField("url", StringType(), False),
        StructField("url_norm", StringType(), False),
        StructField("url_fp", LongType(), False),
        StructField("host", StringType(), False),
        StructField("priority", IntegerType(), False),
        StructField("depth", IntegerType(), False),
        StructField("source_url", StringType(), True),
        StructField("status", StringType(), False),  # fetched|failed|deferred|rejected
        StructField("discovered_epoch", IntegerType(), False),
        StructField("status_epoch", IntegerType(), False),  # latest-wins sequence
    ]
)

# URL-seen set — delta appended per epoch (deduplicator two-tier authoritative copy)
SEEN = StructType(
    [
        StructField("url_fp", LongType(), False),
        StructField("url_norm", StringType(), False),
        StructField("host", StringType(), False),
        StructField("epoch", IntegerType(), False),
    ]
)

# bucketed delay queue as a table (url-scheduler/app.py:39-147)
DEFERRED = StructType(
    [
        StructField("url", StringType(), False),
        StructField("url_norm", StringType(), False),
        StructField("url_fp", LongType(), False),
        StructField("host", StringType(), False),
        StructField("priority", IntegerType(), False),
        StructField("depth", IntegerType(), False),
        StructField("source_url", StringType(), True),
        StructField("discovered_epoch", IntegerType(), False),
        StructField("ready_epoch", IntegerType(), False),
        StructField("reason", StringType(), False),
        StructField("attempts", IntegerType(), False),
    ]
)

# per-host adaptive politeness state (politeness_manager.py:281-288)
HOST_STATS = StructType(
    [
        StructField("host", StringType(), False),
        StructField("total_requests", LongType(), False),
        StructField("successful_requests", LongType(), False),
        StructField("failed_requests", LongType(), False),
        StructField("avg_response_time", DoubleType(), False),
        StructField("crawl_delay", DoubleType(), False),
        StructField("last_epoch", IntegerType(), False),
    ]
)

# fetch schedule emitted per epoch (scheduler→fetcher message, app.py:309-322)
FETCH_SCHEDULE = StructType(
    [
        StructField("url", StringType(), False),
        StructField("url_norm", StringType(), False),
        StructField("url_fp", LongType(), False),
        StructField("host", StringType(), False),
        StructField("priority", IntegerType(), False),
        StructField("depth", IntegerType(), False),
        StructField("rank_in_host", IntegerType(), False),
        StructField("shard_id", IntegerType(), False),
        StructField("epoch", IntegerType(), False),
    ]
)

# link records (parser/app.py:138-145 + indexer mapping app.py:146-159)
LINKS = StructType(
    [
        StructField("source_url", StringType(), False),
        StructField("target_url", StringType(), False),
        StructField("anchor_text", StringType(), True),
        StructField("link_type", StringType(), False),  # internal|external|canonical|alternate
        StructField("crawl_depth", IntegerType(), False),
        StructField("discovered_epoch", IntegerType(), False),
    ]
)

# search/index table (ES web_content mapping, indexer/app.py:84-143)
WEB_CONTENT = StructType(
    [
        StructField("url", StringType(), False),
        StructField("url_norm", StringType(), False),
        StructField("host", StringType(), False),
        StructField("title", StringType(), True),
        StructField("description", StringType(), True),
        StructField("content", StringType(), True),
        StructField("content_hash", StringType(), False),
        StructField("language", StringType(), True),
        StructField("content_type", StringType(), True),
        StructField("quality_score", DoubleType(), True),
        StructField("word_count", IntegerType(), True),
        StructField("keywords", ArrayType(StringType(), False), True),
        StructField("crawled_epoch", IntegerType(), False),
    ]
)

# extracted-link struct returned by the extract_links UDF (one row -> many)
LINK_STRUCT = StructType(
    [
        StructField("url", StringType(), False),
        StructField("anchor_text", StringType(), True),
        StructField("rel", ArrayType(StringType(), False), True),
        StructField("link_type", StringType(), False),
    ]
)

# page metadata struct (fetcher/app.py:81-136)
PAGE_META = StructType(
    [
        StructField("title", StringType(), True),
        StructField("description", StringType(), True),
        StructField("keywords", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("canonical_url", StringType(), True),
        StructField("links_count", IntegerType(), False),
        StructField("images_count", IntegerType(), False),
        StructField("text_length", IntegerType(), False),
    ]
)

# canonicalizer output struct (url_normalizer.py:35-151 + extract_domain)
CANON_STRUCT = StructType(
    [
        StructField("url_norm", StringType(), True),  # null => rejected
        StructField("host", StringType(), True),
        StructField("path", StringType(), True),
    ]
)
