"""webcrawler_spark — a PySpark-native frontier/crawl analytics engine.

A from-scratch reimplementation of the data-processing capabilities of the
reference crawler (aliqajar/WebCrawler) as batch DataFrame jobs:

- RFC-3986-style URL canonicalization + 64-bit fingerprinting
  (vectorized pandas/Arrow UDFs — no per-row Python).
- Partitioned-bloom + anti-join URL-seen set (replaces the Redis dedup store,
  reference services/url-frontier/deduplicator.py).
- Per-host politeness budgeting + robots gating + priority frontier window
  (replaces the Kafka scheduler, reference services/url-scheduler/).
- Fetch-as-join over a Common-Crawl-style page table, text extraction with a
  byte-identical per-url invariant (reference services/parser/app.py:192-277).
- Epoch checkpoint/resume over snapshot-versioned Parquet tables with
  per-partition lineage counters.

Everything is expressed with the pyspark.sql DataFrame API so Catalyst handles
pushdown/pruning/AQE; Python crossings are Arrow-batched pandas UDFs only.
"""

__version__ = "0.1.0"
