"""Near-duplicate detection + similarity search at scale.

- MinHash + LSH banding over character shingles: shingle -> minhash
  signature (vectorized numpy inside a pandas UDF) -> band buckets ->
  bucket-equi-join for candidate pairs -> exact Jaccard verify. The
  bucket join is the only shuffle; no O(n^2) stage.
- Exact n-gram Jaccard verification for candidate pairs.
- Embedding similarity: brute-force cosine top-k (native higher-order
  functions — JVM-side) and a random-hyperplane LSH-bucketed variant for the
  100 TB path (bucket join instead of full cross product).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType, IntegerType, LongType

# deterministic 64-bit mix constants (splitmix64, public domain)
_MIX1 = 0xBF58476D1CE4E5B9
_MIX2 = 0x94D049BB133111EB
_MASK = (1 << 64) - 1


def _shingle_hashes(text: str, k: int = 5):
    """Hash every k-char shingle to uint64 (numpy-vectorized)."""
    import numpy as np

    data = (text or "").lower().encode("utf-8", errors="ignore")
    if len(data) < k:
        data = data + b" " * (k - len(data))
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    # polynomial rolling base-257 hash of each window, computed by prefix trick
    n = len(arr) - k + 1
    h = np.zeros(n, dtype=np.uint64)
    for i in range(k):  # k is small (5): k vector ops, not a per-row loop
        h = h * np.uint64(257) + arr[i : i + n]
    # splitmix finalize
    h = (h ^ (h >> np.uint64(30))) * np.uint64(_MIX1) & np.uint64(_MASK)
    h = (h ^ (h >> np.uint64(27))) * np.uint64(_MIX2) & np.uint64(_MASK)
    h ^= h >> np.uint64(31)
    return np.unique(h)


def minhash_signature_udf(n_hashes: int = 64, shingle_k: int = 5, seed: int = 42):
    """Returns a pandas UDF text -> array<bigint> minhash signature.
    Permutations are (a*x+b) universal hashes with seeded coefficients."""
    import numpy as np

    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MASK, size=n_hashes, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, _MASK, size=n_hashes, dtype=np.uint64)

    @pandas_udf(ArrayType(LongType()))
    def _sig(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            sh = _shingle_hashes(t, shingle_k)
            if len(sh) == 0:
                out.append([0] * n_hashes)
                continue
            # (n_hashes x n_shingles) min over shingles
            vals = (a[:, None] * sh[None, :] + b[:, None]) & np.uint64(_MASK)
            mins = vals.min(axis=1).astype(np.int64)
            out.append(mins.tolist())
        return pd.Series(out)

    return _sig


def _banded_signatures(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int,
    bands: int,
    shingle_k: int,
) -> DataFrame:
    """(id, sig, band, bucket) banded-LSH rows — the shared core of the
    batch near-dup join and the persistable incremental index."""
    rows_per_band = n_hashes // bands
    sig = minhash_signature_udf(n_hashes, shingle_k)
    signed = docs.select(F.col(id_col).alias("id"), sig(F.col(text_col)).alias("sig"))
    return signed.select(
        "id",
        "sig",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.slice(
                        F.col("sig"), b * rows_per_band + 1, rows_per_band
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("id", "sig", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def minhash_band_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
) -> DataFrame:
    """The persistable LSH index of a corpus: one row per (doc, band) with
    the raw signature slice as the bucket key plus the full signature —
    everything a probe needs, so corpus TEXT is never re-read.

    Production shape (the 10^10-doc crawl): write once as a table
    partitioned by `band` and bucketed on `bucket` (or clustered by
    xxhash64(bucket)); each new crawl batch computes signatures for ITS
    docs only and equi-joins (band, bucket) — storage-partition pruning
    plus the bucket hash keep the probe a fraction-of-corpus read instead
    of an O(corpus) recompute per batch. Appending the surviving batch's
    own banded rows (this same function over the accepted docs) keeps the
    index current. The reference dedupes only by exact content hash per
    fetch (services/crawler, Redis seen-set); this is the near-dup
    equivalent of that incremental discipline."""
    return _banded_signatures(docs, id_col, text_col, n_hashes, bands, shingle_k)


def incremental_near_dups(
    new_docs: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.5,
    shingle_k: int = 5,
) -> DataFrame:
    """Near-dup pairs of a NEW batch against a persisted corpus band index
    (from :func:`minhash_band_index` with the same parameters), without
    recomputing or reading anything corpus-side beyond the index.

    Returns (new_id, corpus_id, est_jaccard) for pairs whose signature-
    agreement estimate >= jaccard_threshold. Batch-internal duplicates are
    NOT reported (run :func:`minhash_near_dups` on the batch for those);
    ids present on both sides are skipped as self-matches.
    Scale: signatures cost O(batch); the join is bucket-equi on
    (band, bucket) against a bucketed table — no shuffle of the corpus
    index when it is bucket-stored, no cross product."""
    banded_new = _banded_signatures(
        new_docs, id_col, text_col, n_hashes, bands, shingle_k
    )
    cands = (
        banded_new.alias("n")
        .join(
            index.alias("c"),
            (F.col("n.band") == F.col("c.band"))
            & (F.col("n.bucket") == F.col("c.bucket"))
            & (F.col("n.id") != F.col("c.id")),
        )
        .select(
            F.col("n.id").alias("new_id"),
            F.col("c.id").alias("corpus_id"),
            F.col("n.sig").alias("sig_a"),
            F.col("c.sig").alias("sig_b"),
        )
        .dropDuplicates(["new_id", "corpus_id"])
    )
    est = cands.withColumn(
        "est_jaccard",
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                lambda eq: eq,
            )
        ).cast("double")
        / F.lit(float(n_hashes)),
    )
    return est.filter(F.col("est_jaccard") >= jaccard_threshold).select(
        "new_id", "corpus_id", F.round("est_jaccard", 6).alias("est_jaccard")
    )


def minhash_near_dups(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.5,
    shingle_k: int = 5,
) -> DataFrame:
    """LSH near-dup pairs: docs agreeing on any band become candidates; the
    estimated Jaccard (signature agreement rate) filters to >= threshold.

    Returns (id_a, id_b, est_jaccard) with id_a < id_b.
    Scale: the band explode is x bands rows; the self-join is bucket-equi
    (band_id, band_slice) — skew-safe under AQE; no cross product. The
    bucket key is the band's raw signature slice (4 longs), not a hash of
    it: candidates are then EXACTLY the pairs agreeing on a band (no hash
    collisions), and the 24-byte key growth is noise next to the 512-byte
    signature each banded row already carries through the shuffle."""
    banded = _banded_signatures(docs, id_col, text_col, n_hashes, bands, shingle_k)

    left = banded.alias("l")
    right = banded.alias("r")
    cands = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.sig").alias("sig_a"),
            F.col("r.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = cands.withColumn(
        "est_jaccard",
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                lambda eq: eq,
            )
        ).cast("double")
        / F.lit(float(n_hashes)),
    )
    return est.filter(F.col("est_jaccard") >= jaccard_threshold).select(
        "id_a", "id_b", F.round("est_jaccard", 6).alias("est_jaccard")
    )


def word_ngrams(text: Column, n: int = 2) -> Column:
    """Distinct word n-grams of a text column — fully native (split +
    zip_with over shifted slices), no Python in the path."""
    toks = F.filter(F.split(F.lower(text), "[^a-z0-9]+"), lambda t: t != "")
    if n == 1:
        return F.array_distinct(toks)
    sz = F.size(toks)
    grams = F.zip_with(
        F.slice(toks, 1, sz - (n - 1)),
        F.slice(toks, n, sz - (n - 1)),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return F.array_distinct(grams)


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str = "source",
    threshold: float = 0.05,
) -> DataFrame:
    """Exact word-bigram Jaccard near-dup pairs within blocking groups.

    The block-equi self-join bounds the pair count to sum(|block|^2) — the
    scale pattern is: block on a cheap key (source/shard/LSH bucket), compute
    the exact gram-set Jaccard only inside blocks. All JVM-side (array
    intersect/union on gram arrays); no cross product, no Python.
    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    """
    g = docs.select(
        F.col(id_col).alias("id"),
        F.col(block_col).alias("block"),
        word_ngrams(F.col(text_col), 2).alias("grams"),
    )
    a, b = g.alias("a"), g.alias("b")
    pairs = a.join(
        b, (F.col("a.block") == F.col("b.block")) & (F.col("a.id") < F.col("b.id"))
    )
    inter = F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams")))
    union = F.size(F.array_union(F.col("a.grams"), F.col("b.grams")))
    jac = inter.cast("double") / union
    return (
        pairs.select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(jac, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_containment_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str = "source",
    threshold: float = 0.5,
) -> DataFrame:
    """Asymmetric shingle containment within blocking groups (Broder 1997's
    second resemblance measure): c(A→B) = |S(A)∩S(B)| / |S(A)|.

    Jaccard misses one-sided copies — a short doc fully quoted inside a long
    one scores near 0 on resemblance but 1.0 on containment.  That is the
    signature of boilerplate-wrapped syndication and quote farms, which a
    training-data pipeline wants to drop on the CONTAINED side while keeping
    the container.  Same bounded block-equi self-join shape as
    `ngram_jaccard_pairs` (block on a cheap key; at scale the block is an
    LSH band bucket), all JVM-side array ops.  Returns one row per unordered
    pair with both directions plus the deduping hint (`drop_id` = the
    contained, i.e. higher-containment-lower-size, side) where
    max(c_ab, c_ba) >= threshold.
    """
    g = docs.select(
        F.col(id_col).alias("id"),
        F.col(block_col).alias("block"),
        word_ngrams(F.col(text_col), 2).alias("grams"),
    ).filter(F.size("grams") > 0)
    a, b = g.alias("a"), g.alias("b")
    pairs = a.join(
        b, (F.col("a.block") == F.col("b.block")) & (F.col("a.id") < F.col("b.id"))
    )
    inter = F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams"))).cast("double")
    c_ab = F.round(inter / F.size(F.col("a.grams")), 6)
    c_ba = F.round(inter / F.size(F.col("b.grams")), 6)
    out = pairs.select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        c_ab.alias("cont_a_in_b"),
        c_ba.alias("cont_b_in_a"),
    ).filter(F.greatest("cont_a_in_b", "cont_b_in_a") >= threshold)
    return out.withColumn(
        "drop_id",
        F.when(F.col("cont_a_in_b") > F.col("cont_b_in_a"), F.col("id_a"))
        .when(F.col("cont_b_in_a") > F.col("cont_a_in_b"), F.col("id_b"))
        .otherwise(F.greatest("id_a", "id_b")),
    )


def embedding_near_dups(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
    threshold: float = 0.3,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within blocking groups
    (label here; LSH buckets from lsh_hyperplane_buckets at scale — same
    shape: block-equi join, exact cosine inside the block only)."""
    e = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(block_col).alias("block"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    a, b = e.alias("a"), e.alias("b")
    pairs = a.join(
        b, (F.col("a.block") == F.col("b.block")) & (F.col("a.id") < F.col("b.id"))
    )
    sim = F.round(cosine(F.col("a.v"), F.col("b.v")), 6)
    return (
        pairs.select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            sim.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def simhash_near_dups(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 6,
    bands: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs at scale: band the 64-bit fingerprint into
    ``bands`` 16-bit pieces; by pigeonhole, any pair within hamming distance
    (bands - 1) shares at least one exact band — so candidates come from a
    band-equi self-join (shuffle on (band, value)), then the exact hamming
    distance filters. Never a cross product."""
    from .textstats import hamming64, simhash_udf

    width = 64 // bands
    fps = docs.select(F.col(id_col).alias("id"), simhash_udf(F.col(text_col)).alias("fp"))
    banded = fps.select(
        "id",
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(F.col("fp"), i * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("val"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bv"),
    ).select("id", "fp", F.col("bv.band").alias("band"), F.col("bv.val").alias("val"))
    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.fp").alias("fp_a"),
            F.col("b.fp").alias("fp_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cands.withColumn("hamming", hamming64(F.col("fp_a"), F.col("fp_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


@pandas_udf(DoubleType())
def _exact_jaccard_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    out = []
    for x, y in zip(a, b):
        sa = set((x or "").lower().split())
        sb = set((y or "").lower().split())
        union = len(sa | sb)
        out.append(len(sa & sb) / union if union else 0.0)
    return pd.Series(out)


def verify_jaccard(pairs: DataFrame, docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact token-set Jaccard for candidate pairs (broadcastable dim join)."""
    d = docs.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
    out = (
        pairs.join(d.withColumnRenamed("_id", "id_a").withColumnRenamed("_t", "_ta"), "id_a")
        .join(d.withColumnRenamed("_id", "id_b").withColumnRenamed("_t", "_tb"), "id_b")
        .withColumn("jaccard", F.round(_exact_jaccard_udf("_ta", "_tb"), 6))
        .drop("_ta", "_tb")
    )
    return out


# ---- embedding similarity -------------------------------------------------------


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float|double> columns — native
    higher-order functions, fully JVM-side."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Baseline ANN: score every row against one query vector, take top-k.
    One scan + a global top-k (Spark's takeOrdered under orderBy+limit —
    per-partition heaps then a driver merge of k*P rows, no full sort)."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = embeddings.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col).cast("array<double>"), q), 6).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k)


def lsh_hyperplane_buckets(
    embeddings: DataFrame,
    n_planes: int = 12,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH: sign pattern of <v, h_i> = bucket id. Vectors in
    the same bucket are cosine-close with high probability; ANN then probes
    only the query's bucket (plus neighbors) — the 100 TB scale path where a
    full scan per query is off the table."""
    import numpy as np

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))

    @pandas_udf(IntegerType())
    def _bucket(vecs: pd.Series) -> pd.Series:
        import numpy as np

        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        signs = (mat @ planes.T) > 0
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        return pd.Series((signs @ weights).astype("int32"))

    return embeddings.withColumn("bucket", _bucket(F.col(vec_col)))


def _assign_udf(centroids):
    """pandas UDF: argmin L2 distance to the (broadcast-in-closure) centroid
    matrix. Vectorized: one matmul per Arrow batch."""
    import numpy as np

    cmat = np.asarray(centroids, dtype=np.float64)  # (k, dim)
    c_sq = (cmat * cmat).sum(axis=1)

    @pandas_udf(IntegerType())
    def _assign(vecs: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        # ||v-c||^2 = ||v||^2 - 2 v.c + ||c||^2 ; ||v||^2 constant per row
        d = -2.0 * (mat @ cmat.T) + c_sq[None, :]
        return pd.Series(np.argmin(d, axis=1).astype("int32"))

    return _assign


def ivf_index(
    embeddings: DataFrame,
    n_centroids: int = 16,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[float]]]:
    """IVF coarse quantizer: deterministic init (the n_centroids lowest-id
    vectors), then ``n_iters`` Lloyd rounds — assignment is a vectorized
    argmin UDF, the centroid update is a native posexplode + avg (one
    shuffle of (cluster, pos, value) triples; the k x dim centroid matrix is
    driver-side, tiny). Returns (embeddings + 'cluster' column, centroids).

    Scale path: the index build scans the data n_iters+1 times; queries then
    touch only nprobe/n_centroids of the corpus (ivf_topk)."""
    init_rows = (
        embeddings.select(id_col, vec_col).orderBy(F.asc(id_col)).limit(n_centroids).collect()
    )
    centroids = [list(map(float, r[vec_col])) for r in init_rows]
    vecs = embeddings.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    for _ in range(n_iters):
        assigned = vecs.withColumn("cluster", _assign_udf(centroids)(F.col("v")))
        new_rows = (
            assigned.select("cluster", F.posexplode("v").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        by_cluster: dict[int, dict[int, float]] = {}
        for r in new_rows:
            by_cluster.setdefault(r["cluster"], {})[r["pos"]] = r["m"]
        centroids = [
            [by_cluster[c][p] for p in range(len(centroids[0]))]
            if c in by_cluster
            else centroids[c]
            for c in range(n_centroids)
        ]
    out = embeddings.withColumn(
        "cluster", _assign_udf(centroids)(F.col(vec_col).cast("array<double>"))
    )
    return out, centroids


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    n_centroids: int = 16,
    nprobe: int = 4,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: probe only the nprobe clusters whose centroids are nearest
    the query, exact cosine rank inside them. The cluster filter prunes
    (1 - nprobe/n_centroids) of the corpus before any distance math."""
    import numpy as np

    indexed, centroids = ivf_index(embeddings, n_centroids, id_col=id_col, vec_col=vec_col)
    q = np.asarray(query_vec, dtype=np.float64)
    cmat = np.asarray(centroids, dtype=np.float64)
    d = ((cmat - q[None, :]) ** 2).sum(axis=1)
    probe = [int(c) for c in np.argsort(d)[:nprobe]]
    qcol = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        indexed.filter(F.col("cluster").isin(probe))
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col).cast("array<double>"), qcol), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    n_planes: int = 12,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """ANN via hyperplane LSH: compute the query's bucket driver-side, scan
    only that bucket, exact-cosine rank within it."""
    import numpy as np

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    q = np.asarray(query_vec, dtype=np.float64)
    qbucket = int(((q @ planes.T > 0) * (1 << np.arange(n_planes))).sum())
    bucketed = lsh_hyperplane_buckets(embeddings, n_planes, dim, seed, id_col, vec_col)
    qcol = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        bucketed.filter(F.col("bucket") == qbucket)
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col).cast("array<double>"), qcol), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def semantic_dedup(
    embeddings: DataFrame,
    n_centroids: int = 16,
    n_iters: int = 2,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public
    description): k-means-cluster the embeddings, compare pairs only WITHIN
    a cluster, and drop all but one member of every semantic-duplicate
    group (cosine >= threshold, transitively closed). Deterministic variant:
    the kept representative is the min id of the component (the paper keeps
    the member farthest from the centroid; any fixed rule works — this one
    needs no extra distance pass).

    Returns the kept rows of `embeddings`, schema unchanged.

    100 TB shape: pair generation is confined to IVF cells (Σ|cell|² with
    k sized so cells fit memory — k ~ sqrt(n) keeps cells ~sqrt(n)); the
    component collapse shuffles only the pair graph; the drop set joins
    left-anti against the corpus. No all-pairs stage anywhere.
    """
    from .components import dedup_keep_list, near_dup_clusters

    clustered, _ = ivf_index(embeddings, n_centroids, n_iters, id_col, vec_col)
    pairs = embedding_near_dups(
        clustered, id_col=id_col, vec_col=vec_col,
        block_col="cluster", threshold=threshold,
    )
    clusters = near_dup_clusters(pairs)
    return dedup_keep_list(embeddings, clusters.withColumnRenamed("doc_id", id_col), id_col)


def pq_index(
    embeddings: DataFrame,
    m: int = 4,
    k_sub: int = 16,
    n_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[list[float]]]]:
    """Product quantizer (Jégou, Douze & Schmid, TPAMI 2011) — the
    10^10-vector ANN memory shape: split the dim-D space into `m` subspaces,
    k-means each independently (deterministic init = the k_sub lowest-id
    vectors' subvectors, same Lloyd structure as ivf_index), and encode every
    vector as `m` small codes. A 64-dim float vector (256 B) compresses to
    m=4 bytes + id — the whole corpus's codes fit where the raw vectors
    never would, and queries scan codes, not vectors.

    Returns (embeddings + code0..code{m-1} columns, codebooks[m][k_sub][dsub]).
    Codebooks are m*k_sub*dsub floats of driver state (the IVF-centroid
    precedent); assignment is the vectorized argmin UDF per subspace, the
    update a native posexplode + avg per subspace."""
    first = embeddings.select(vec_col).first()
    dim = len(first[vec_col])
    assert dim % m == 0, f"dim {dim} not divisible into {m} subspaces"
    dsub = dim // m
    vecs = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    init = vecs.orderBy(F.asc(id_col)).limit(k_sub).collect()
    codebooks = [
        [[float(x) for x in r["v"][mi * dsub:(mi + 1) * dsub]] for r in init]
        for mi in range(m)
    ]
    for _ in range(n_iters):
        new_books = []
        for mi in range(m):
            sub = vecs.select(
                F.slice("v", mi * dsub + 1, dsub).alias("sv")
            ).withColumn("cluster", _assign_udf(codebooks[mi])(F.col("sv")))
            rows = (
                sub.select("cluster", F.posexplode("sv").alias("pos", "val"))
                .groupBy("cluster", "pos")
                .agg(F.avg("val").alias("mu"))
                .collect()
            )
            by_c: dict[int, dict[int, float]] = {}
            for r in rows:
                by_c.setdefault(r["cluster"], {})[r["pos"]] = r["mu"]
            new_books.append(
                [
                    [by_c[c][p] for p in range(dsub)] if c in by_c else codebooks[mi][c]
                    for c in range(k_sub)
                ]
            )
        codebooks = new_books
    codes = embeddings.select(
        "*",
        *[
            _assign_udf(codebooks[mi])(
                F.slice(F.col(vec_col).cast("array<double>"), mi * dsub + 1, dsub)
            ).alias(f"code{mi}")
            for mi in range(m)
        ],
    )
    return codes, codebooks


def pq_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    m: int = 4,
    k_sub: int = 16,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ ANN via asymmetric distance computation (ADC): the query builds an
    m x k_sub table of squared L2 distances to every sub-centroid
    (driver-side, tiny), and each vector's approximate distance is m table
    lookups + adds over its CODES — no per-vector float math at all. Rank
    ascending, deterministic id tiebreak."""
    import numpy as np

    codes, codebooks = pq_index(embeddings, m, k_sub, id_col=id_col, vec_col=vec_col)
    q = np.asarray(query_vec, dtype=np.float64)
    dsub = len(q) // m
    adc = None
    for mi in range(m):
        qm = q[mi * dsub:(mi + 1) * dsub]
        t = ((np.asarray(codebooks[mi], dtype=np.float64) - qm[None, :]) ** 2).sum(axis=1)
        lut = F.array(*[F.lit(float(x)) for x in t])
        term = F.element_at(lut, F.col(f"code{mi}") + 1)
        adc = term if adc is None else adc + term
    return (
        codes.select(F.col(id_col), F.round(adc, 6).alias("approx_dist"))
        .orderBy(F.asc("approx_dist"), F.asc(id_col))
        .limit(k)
    )


def ivfpq_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    n_centroids: int = 16,
    nprobe: int = 4,
    m: int = 4,
    k_sub: int = 16,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF+PQ — the canonical billion-scale ANN composition (FAISS IVFPQ,
    here the `by_residual=False` variant: PQ codebooks trained on the raw
    vectors, not per-cell residuals): the IVF coarse quantizer prunes to
    nprobe/n_centroids of the corpus, then ADC lookup tables rank the
    survivors by their m-byte codes. At 10^10 vectors the query touches
    nprobe cells' CODES only — no raw vector is read after index build."""
    import numpy as np

    indexed, centroids = ivf_index(
        embeddings, n_centroids, id_col=id_col, vec_col=vec_col
    )
    codes, codebooks = pq_index(indexed, m, k_sub, id_col=id_col, vec_col=vec_col)
    q = np.asarray(query_vec, dtype=np.float64)
    cmat = np.asarray(centroids, dtype=np.float64)
    probe = [int(c) for c in np.argsort(((cmat - q[None, :]) ** 2).sum(axis=1))[:nprobe]]
    dsub = len(q) // m
    adc = None
    for mi in range(m):
        qm = q[mi * dsub:(mi + 1) * dsub]
        t = ((np.asarray(codebooks[mi], dtype=np.float64) - qm[None, :]) ** 2).sum(axis=1)
        term = F.element_at(
            F.array(*[F.lit(float(x)) for x in t]), F.col(f"code{mi}") + 1
        )
        adc = term if adc is None else adc + term
    return (
        codes.filter(F.col("cluster").isin(probe))
        .select(F.col(id_col), F.round(adc, 6).alias("approx_dist"))
        .orderBy(F.asc("approx_dist"), F.asc(id_col))
        .limit(k)
    )


def brute_topk_batch(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "qv",
) -> DataFrame:
    """Exact top-k for a BATCH of queries: broadcast the query set against
    the corpus, score every (query, vector) pair, rank per query. This is
    the ground-truth side of ANN evaluation; cost is Q x N cosines, so it
    is the small-Q path (the broadcast side is the query set, never the
    corpus). Returns (query_id, vec_id, cos_sim, rank<=k)."""
    q = queries.select(
        F.col(qid_col).alias("query_id"),
        F.col(qvec_col).cast("array<double>").alias("_qv"),
    )
    scored = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).join(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("_v"), F.col("_qv")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", F.col("rank").cast("int").alias("rank"))
    )


def ivf_topk_batch(
    embeddings: DataFrame,
    queries: DataFrame,
    n_centroids: int = 16,
    nprobe: int = 4,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "qv",
) -> DataFrame:
    """IVF ANN for a BATCH of queries with NO driver loop — the production
    serving shape (ivf_topk's single-vector probe selection moves into the
    plan). Build the index once; each query picks its nprobe cells by an
    equi-free broadcast join against the n_centroids-row centroid dim +
    per-query rank, then candidates come from a cluster-equi join (each
    query reads only its cells). At 10^10 vectors / 10^6 queries the
    shuffle is (query x probed-cell-rows), never Q x N.

    Returns (query_id, vec_id, cos_sim, rank<=k)."""
    indexed, centroids = ivf_index(embeddings, n_centroids, id_col=id_col, vec_col=vec_col)
    spark = embeddings.sparkSession
    cent_df = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cluster int, cv array<double>",
    )
    q = queries.select(
        F.col(qid_col).alias("query_id"),
        F.col(qvec_col).cast("array<double>").alias("_qv"),
    )
    l2sq = F.aggregate(
        F.zip_with(F.col("_qv"), F.col("cv"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    wp = Window.partitionBy("query_id").orderBy(F.asc("_d"), F.asc("cluster"))
    probes = (
        q.join(F.broadcast(cent_df))
        .select("query_id", "_qv", "cluster", l2sq.alias("_d"))
        .withColumn("_r", F.row_number().over(wp))
        .filter(F.col("_r") <= nprobe)
        .select("query_id", "_qv", "cluster")
    )
    cand = indexed.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
        "cluster",
    ).join(F.broadcast(probes), "cluster")
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        cand.select(
            "query_id",
            "vec_id",
            F.round(cosine(F.col("_v"), F.col("_qv")), 6).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", F.col("rank").cast("int").alias("rank"))
    )


def ann_recall(
    embeddings: DataFrame,
    queries: DataFrame,
    n_centroids: int = 16,
    nprobe: int = 4,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "qv",
) -> DataFrame:
    """ANN quality evaluation: recall@k of the IVF index against exact
    brute-force ground truth, per query — the number every production ANN
    deployment tracks to tune (n_centroids, nprobe). Returns
    (query_id, n_hits, recall) with recall = |ivf top-k ∩ brute top-k| / k."""
    brute = brute_topk_batch(
        embeddings, queries, k, id_col, vec_col, qid_col, qvec_col
    ).select("query_id", "vec_id")
    ivf = ivf_topk_batch(
        embeddings, queries, n_centroids, nprobe, k, id_col, vec_col, qid_col, qvec_col
    ).select("query_id", "vec_id", F.lit(1).alias("_hit"))
    return (
        brute.join(ivf, ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(F.count("_hit").alias("n_hits"))
        .select(
            "query_id",
            "n_hits",
            F.round(F.col("n_hits") / F.lit(float(k)), 6).alias("recall"),
        )
    )


def semantic_decontaminate(
    embeddings: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bench_id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-space benchmark decontamination (the semantic complement
    of the n-gram `corpus_decontaminate`): for every corpus vector, the
    max cosine similarity against ANY benchmark vector, the closest
    benchmark item (ties -> smallest benchmark id, resolved inside one
    max(struct) aggregate so the argmax is deterministic), and the
    contaminated flag at `threshold`.

    100 TB shape: the benchmark suite is a bounded dim (10^3-10^5 rows) —
    BROADCAST it; the corpus streams through one scan with a |bench|-wide
    per-row loop and the (id)-keyed agg partial-aggregates map-side, so
    nothing data-sized shuffles. For benchmark sets too big to broadcast,
    the IVF route (ivf cell assignment on both sides, join on cell)
    bounds the pair space exactly as semantic_dedup's cells do."""
    b = F.broadcast(
        benchmark.select(
            F.col(bench_id_col).alias("bench_id"),
            F.col(vec_col).cast("array<double>").alias("bvec"),
        )
    )
    scored = (
        embeddings.select(
            F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
        )
        .join(b)
        .select(
            F.col(id_col),
            F.col("bench_id"),
            F.round(cosine(F.col("v"), F.col("bvec")), 6).alias("cos_sim"),
        )
    )
    best = scored.groupBy(F.col(id_col)).agg(
        F.max(
            F.struct(
                F.col("cos_sim"), (-F.col("bench_id")).alias("nid")
            )
        ).alias("m")
    )
    return best.select(
        F.col(id_col),
        F.col("m.cos_sim").alias("max_cos"),
        (-F.col("m.nid")).alias("closest_bench_id"),
        (F.col("m.cos_sim") >= F.lit(float(threshold))).alias("contaminated"),
    )
