"""Similarity search over the ``embeddings`` table (array<float> vectors).

Two rungs (BASELINE.json north star):
- brute-force cosine top-k — the exact baseline; O(Q·N) dot products,
  fine when the query set is small and broadcastable.
- SRP-LSH bucketed ANN — the 100 TB path: sign-random-projection buckets
  shrink the candidate set; recall measured against brute force in tests.

Dot products run as JVM higher-order functions (``zip_with``+``aggregate``)
over double-cast arrays — vectorized enough at 64 dims that a Pandas UDF's
Arrow round-trip would cost more than it saves; for ≥1k dims swap the inner
product to a ``pandas_udf`` (numpy BLAS) without touching the query shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from live_data_spark.catalog import load, register

N_QUERIES = 10  # vec_id < 10 form the demo query set
TOP_K = 5


def dot(a: Column, b: Column) -> Column:
    """Sequential-order dot product of two double arrays (fp-deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def cosine_pandas(a: Column, b: Column) -> Column:
    """Arrow-batched numpy cosine — the ≥1k-dims swap-in for ``cosine``.

    At 64 dims the JVM higher-order form wins (no Arrow round-trip); past
    ~1k dims numpy's SIMD dot products overtake it by an order of
    magnitude. Both paths return identical values (pinned to 1e-9 in
    tests/test_similarity.py), so swapping is a one-line change at any
    call site. Defined lazily so importing the module never requires an
    active session.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # hint-free form: this module's `from __future__ import annotations`
    # stringifies type hints, which pandas_udf can't resolve for locals
    def _cos(sa, sb):
        va = np.stack(sa.to_numpy())
        vb = np.stack(sb.to_numpy())
        num = (va * vb).sum(axis=1)
        den = np.linalg.norm(va, axis=1) * np.linalg.norm(vb, axis=1)
        return pd.Series(num / den)

    return pandas_udf(_cos, "double")(a, b)


_TOPK_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, cast(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id < {N_QUERIES}
),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(q.qe, cast(e.embedding AS DOUBLE[])) AS cos,
         row_number() OVER (PARTITION BY q.query_id
                            ORDER BY list_cosine_similarity(q.qe, cast(e.embedding AS DOUBLE[])) DESC,
                                     e.vec_id) AS rnk
  FROM q, embeddings e
  WHERE e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, cast(rnk AS INTEGER) AS rnk, round(cos, 4) AS cosine_sim
FROM scored WHERE rnk <= {TOP_K}
"""


@register("ann_cosine_topk", oracle=_TOPK_ORACLE, headline=True, tags=("similarity",))
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: exact nearest neighbors for 10 queries.

    Plan: broadcast the (tiny) query set against the corpus — a map-only
    stage, no shuffle for the scoring; one shuffle for the per-query
    top-k window. Ranking tiebreak on neighbor id keeps the output
    totally ordered (testdata top-5 cosine gaps ≥5e-5, far above
    engine fp drift, so ranks are stable across engines).
    """
    from pyspark.sql import Window

    e = load(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), as_double("embedding").alias("qe")
    )
    c = e.select(F.col("vec_id").alias("neighbor_id"), as_double("embedding").alias("ce"))
    scored = (
        F.broadcast(q)
        .join(c, F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qe"), F.col("ce")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "rnk", F.round("cos", 4).alias("cosine_sim"))
    )


_NEARDUP_ORACLE = """
WITH e AS (SELECT vec_id, cast(embedding AS DOUBLE[]) AS emb FROM embeddings)
SELECT a.vec_id AS vec_id_1, b.vec_id AS vec_id_2,
       round(list_cosine_similarity(a.emb, b.emb), 4) AS cosine_sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.emb, b.emb) >= 0.4
"""


@register("embedding_neardup_pairs", oracle=_NEARDUP_ORACLE, tags=("similarity", "dedup"))
def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (threshold 0.4 — demo level;
    real corpora use ~0.95 on trained embeddings, this testdata is
    uniform-random so 0.4 is the 'interesting pairs' band).

    Written as an explicit all-pairs join: correct at test SF, and the
    honest baseline the LSH variant is measured against. At 100 TB this
    is exactly the operator you *don't* run — ``ann_srp_lsh`` below is
    the bucketed scale path.
    """
    e = load(spark, sf_dir, "embeddings")
    a = e.select(F.col("vec_id").alias("vec_id_1"), as_double("embedding").alias("e1"))
    b = e.select(F.col("vec_id").alias("vec_id_2"), as_double("embedding").alias("e2"))
    pairs = a.join(b, F.col("vec_id_1") < F.col("vec_id_2")).select(
        "vec_id_1", "vec_id_2", cosine(F.col("e1"), F.col("e2")).alias("cos")
    )
    return pairs.where(F.col("cos") >= 0.4).select(
        "vec_id_1", "vec_id_2", F.round("cos", 4).alias("cosine_sim")
    )


# ---------------------------------------------------------------------------
# SRP-LSH: sign-random-projection buckets — the approximate scale path.
# ---------------------------------------------------------------------------

N_TABLES = 4  # independent hash tables (union of candidates)
TARGET_BUCKET_SIZE = 64  # planes auto-scale: n_planes ≈ log2(n / target)


def _plane_component(table: int, plane: int, dim: int) -> Column:
    """Deterministic pseudo-random ±1 hyperplane component.

    Derived from xxhash64(table, plane, dim) parity — reproducible on any
    executor with no random state, no broadcast of plane matrices.
    """
    h = F.xxhash64(F.lit(table), F.lit(plane), F.lit(dim))
    return (F.pmod(h, F.lit(2)) * 2 - 1).cast("double")


def srp_bucket(emb: Column, table: int, n_dims: int, n_planes: int) -> Column:
    """Bucket id = n_planes sign bits of random-hyperplane projections."""
    bits = []
    for p in range(n_planes):
        proj = None
        for d in range(n_dims):
            term = F.element_at(emb, d + 1) * _plane_component(table, p, d)
            proj = term if proj is None else proj + term
        bits.append(F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0)))
    out = F.lit(0)
    for b in bits:
        out = out + b
    return out.cast("int")


def _ivf_assign(vectors: DataFrame, centroids: DataFrame, nprobe: int, id_col: str) -> DataFrame:
    """Rank centroids per vector by cosine; keep the top ``nprobe``.

    Centroids broadcast (K ≈ √n rows), so assignment is a map-only
    n×K scoring pass — the standard IVF cost — with one window shuffle
    on the vector id to rank.
    """
    from pyspark.sql import Window

    scored = vectors.join(F.broadcast(centroids)).select(
        id_col, "emb", "cid", cosine(F.col("emb"), F.col("cemb")).alias("ccos")
    )
    w = Window.partitionBy(id_col).orderBy(F.col("ccos").desc(), F.col("cid"))
    return (
        scored.withColumn("crnk", F.row_number().over(w))
        .where(F.col("crnk") <= nprobe)
        .drop("ccos", "crnk")
    )


@register("ann_ivf_flat", oracle=None, tags=("similarity",))
def ann_ivf_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate cosine top-k via IVF-flat (inverted-file) partitioning.

    The other classic ANN scale path (complement of ``ann_srp_lsh``):

    1. K ≈ √n centroids picked by deterministic hash-order sampling
       (k-means refinement is an optional quality upgrade; sampling
       keeps the build one pass and fully reproducible).
    2. every vector joins its nearest centroid's inverted list
       (broadcast n×K scoring — the IVF build cost);
    3. a query scans only its ``nprobe`` nearest centroids' lists, so
       the per-query work is ~(nprobe/K)·n instead of n; at 100 TB the
       lists are hive-partitioned by centroid id and a query reads only
       its nprobe partitions.

    Candidates re-score exactly → precision 1; recall floor pinned in
    tests/test_similarity.py on uniform-random embeddings (worst case —
    clustered real embeddings place true neighbors in the same list far
    more often). Rows-only driver check (centroid choice is hash-based).
    """
    import math

    from pyspark.sql import Window

    e = load(spark, sf_dir, "embeddings").select("vec_id", as_double("embedding").alias("emb"))
    n = e.count()
    k_lists = max(4, int(math.isqrt(n)))
    nprobe = max(2, k_lists // 4)

    # Centroid pick = hash-order top-k: orderBy+limit compiles to
    # TakeOrderedAndProject (distributed partial top-k per partition, then a
    # k-row merge on the driver) — no global-window single-partition shuffle.
    # The hash doubles as the centroid id: deterministic, join-key-distinct
    # w.h.p., and a rare collision only merges two inverted lists (still a
    # valid approximate index).
    centroids = (
        e.select(F.xxhash64("vec_id").alias("cid"), F.col("emb").alias("cemb"))
        .orderBy("cid")
        .limit(k_lists)
    )

    lists = _ivf_assign(e, centroids, nprobe=1, id_col="vec_id").select(
        "cid", F.col("vec_id").alias("neighbor_id"), F.col("emb").alias("ne")
    )
    queries = _ivf_assign(
        e.where(F.col("vec_id") < N_QUERIES).withColumnRenamed("vec_id", "query_id"),
        centroids,
        nprobe=nprobe,
        id_col="query_id",
    ).select("cid", "query_id", F.col("emb").alias("qe"))

    cand = (
        F.broadcast(queries)
        .join(lists, "cid")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select("query_id", "neighbor_id", cosine(F.col("qe"), F.col("ne")).alias("cos"))
    wr = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(wr))
        .where(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "rnk", F.round("cos", 4).alias("cosine_sim"))
    )


@register("ann_srp_lsh", oracle=None, tags=("similarity",))
def ann_srp_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate cosine top-k: multi-probe sign-random-projection LSH.

    Design for scale (and measured honestly at test scale):

    - plane count adapts to corpus size (log2(n / TARGET_BUCKET_SIZE)) so
      buckets stay ~TARGET_BUCKET_SIZE and the per-query candidate set is
      ~n_tables · (1 + n_planes) · TARGET_BUCKET_SIZE regardless of n —
      the knob that keeps 100 TB sublinear.
    - multi-probe: each query also probes the n_planes buckets at sign-
      hamming distance 1, recovering most neighbors that fell just across
      one hyperplane — the standard recall rescue that costs probes, not
      another full table.
    - candidates are exactly re-scored (true cosine), so precision is 1;
      recall vs brute force is asserted ≥0.6 in tests/test_similarity.py
      on uniform-random embeddings — the WORST case for any LSH (no
      cluster structure); trained embeddings sit far higher.

    Rows-only driver check (bucket membership depends on xxhash — not
    SQL-reproducible).
    """
    import math

    from pyspark.sql import Window

    e = load(spark, sf_dir, "embeddings").select("vec_id", as_double("embedding").alias("emb"))
    n = e.count()
    n_dims = 64
    n_planes = max(4, int(math.ceil(math.log2(max(n / TARGET_BUCKET_SIZE, 2.0)))))

    tables = [
        e.select(
            "vec_id",
            "emb",
            F.lit(t).alias("table_id"),
            srp_bucket(F.col("emb"), t, n_dims, n_planes).alias("bucket"),
        )
        for t in range(N_TABLES)
    ]
    banded = tables[0]
    for t in tables[1:]:
        banded = banded.unionByName(t)

    # query side probes its own bucket + every 1-bit flip of it
    probes = F.array(F.col("bucket"), *[
        F.col("bucket").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)
    ])
    q = (
        banded.where(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("emb").alias("qe"),
            "table_id",
            F.explode(probes).alias("bucket"),
        )
    )
    cand = (
        F.broadcast(q)
        .join(banded.withColumnRenamed("vec_id", "neighbor_id"), ["table_id", "bucket"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "qe", "emb")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select("query_id", "neighbor_id", cosine(F.col("qe"), F.col("emb")).alias("cos"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "rnk", F.round("cos", 4).alias("cosine_sim"))
    )


# ---------------------------------------------------------------------------
# Grouped vector aggregation — per-label centroid.
# ---------------------------------------------------------------------------

_CENTROID_ORACLE = """
WITH ex AS (
  SELECT label,
         unnest(range(len(embedding))) AS dim,
         unnest(embedding) AS v
  FROM embeddings
)
SELECT label, dim,
       cast(sum(cast(cast(v AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE)
         / count(*) AS centroid_v
FROM ex GROUP BY label, dim
"""


@register("embedding_centroid_by_label", oracle=_CENTROID_ORACLE, tags=("similarity", "agg", "vector"))
def embedding_centroid_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean embedding (the training-pipeline "class centroid" agg).

    Long-format output (label, dim, centroid_v): vectors explode with
    posexplode and aggregate per (label, dim) — a plain hash aggregate
    with map-side partials, so the shuffle carries one partial sum per
    (label, dim) per task, NOT the exploded rows. That is the scalable
    shape for vector means (reduce-side arrays would concentrate whole
    labels on single reducers; driver-side numpy wouldn't distribute).

    Element sums run in decimal(18,9) so the mean is order-independent
    and bit-stable; the mean divides as double at the output boundary.
    The cast goes float→double→decimal on BOTH sides: a float widens to
    double exactly, and every engine rounds that same double to scale 9
    identically — whereas engines disagree on DIRECT float→decimal
    (Spark rounds the float's shortest decimal repr, DuckDB the binary
    value; measured: 75% of elements differ at scale 9). IVF assignment
    (ann_ivf_flat) reuses this shape for its centroid refresh.
    """
    ex = load(spark, sf_dir, "embeddings").select(
        "label", F.posexplode("embedding").alias("dim", "v")
    )
    return (
        ex.groupBy("label", "dim")
        .agg(
            (
                F.sum(F.col("v").cast("double").cast("decimal(18,9)")).cast("double")
                / F.count(F.lit(1))
            ).alias("centroid_v")
        )
    )
