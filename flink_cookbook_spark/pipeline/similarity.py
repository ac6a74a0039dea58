"""Embedding similarity search over the ``embeddings`` fixture table.

Brute-force cosine top-k as the exactness baseline, plus a random-
hyperplane (Rademacher) LSH bucketing as the scale path. All vector math
runs JVM-side on ``array<double>`` via ``zip_with``/``aggregate`` —
no Python in the hot path; hyperplanes are deterministic md5-derived
sign vectors materialized as literals so the DuckDB oracle reproduces
them bit-for-bit.

Scale notes (100 TB / billions of vectors):
- brute force is query-count x corpus-size: fine for small query sets
  (the broadcast-queries pattern below — corpus stays partitioned, the
  k queries are broadcast), wrong for all-pairs.
- the LSH path buckets vectors by projection signs: candidate generation
  becomes an equi-join on bucket id (one shuffle), and exact cosine runs
  only within buckets. More planes -> smaller buckets -> higher precision
  / lower recall; production tunes planes and uses multiple tables.
- an IVF variant (k-means centroids + nearest-centroid partition
  pruning) composes the same way: assign -> equi-join on centroid id.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_cookbook_spark.catalog import load
from flink_cookbook_spark.registry import register, rnd

N_QUERIES = 5  # queries are vec_id < N_QUERIES
TOP_K = 5
LSH_PLANES = 8
DIM = 64


def _dot(a, b) -> F.Column:
    """Sequential left-to-right fold — same order DuckDB uses, so results
    are bit-identical before rounding."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a) -> F.Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def _emb_double(df: DataFrame) -> DataFrame:
    return df.withColumn("emb", F.col("embedding").cast("array<double>"))


def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: for each query vector (vec_id < 5), the
    5 nearest corpus vectors by cosine similarity. The query side is tiny
    and broadcast; the corpus side never moves."""
    emb = _emb_double(load(spark, sf_dir, "embeddings"))
    queries = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )
    corpus = emb.select(F.col("vec_id").alias("cand_id"), F.col("emb").alias("cemb"))
    scored = (
        corpus.crossJoin(F.broadcast(queries))
        .where(F.col("cand_id") != F.col("query_id"))
        .withColumn(
            "cosine_raw",
            _dot(F.col("qemb"), F.col("cemb"))
            / (_norm(F.col("qemb")) * _norm(F.col("cemb"))),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_raw").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= TOP_K)
        .select("query_id", "rk", "cand_id", rnd("cosine_raw", 6).alias("cosine"))
    )


register(
    "cosine_topk",
    oracle=f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         list_dot_product(q.e, c.e)
           / (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e)))
           AS cosine_raw
  FROM emb q JOIN emb c ON q.vec_id < {N_QUERIES} AND c.vec_id != q.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine_raw DESC, cand_id ASC) AS rk
  FROM scored
)
SELECT query_id, CAST(rk AS INTEGER) AS rk, cand_id, round(cosine_raw + 1e-6, 6) AS cosine
FROM ranked WHERE rk <= {TOP_K}
""",
    tags=("similarity", "llm-pipeline", "bench"),
)(cosine_topk)


def embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector diagnostics: dimensionality, L2 norm, component mean —
    the sanity sweep before any similarity work."""
    emb = _emb_double(load(spark, sf_dir, "embeddings"))
    return emb.select(
        "vec_id",
        "label",
        F.size("emb").alias("dim"),
        rnd(_norm(F.col("emb")), 6).alias("l2_norm"),
        rnd(
            F.aggregate(F.col("emb"), F.lit(0.0), lambda acc, x: acc + x)
            / F.size("emb"),
            6,
        ).alias("mean_component"),
    )


register(
    "embedding_stats",
    oracle="""
WITH emb AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings)
SELECT vec_id, label,
       CAST(len(e) AS INTEGER) AS dim,
       round(sqrt(list_dot_product(e, e)) + 1e-6, 6) AS l2_norm,
       round(list_sum(e) / len(e) + 1e-6, 6) AS mean_component
FROM emb
""",
    tags=("similarity", "llm-pipeline"),
)(embedding_stats)


def _hyperplanes() -> list[list[int]]:
    """Deterministic Rademacher (+1/-1) hyperplanes from md5 — computed
    once at plan-build time, embedded as literals on both engines."""
    planes = []
    for p in range(LSH_PLANES):
        signs = []
        for j in range(DIM):
            digest = hashlib.md5(f"plane{p}:dim{j}".encode()).hexdigest()
            signs.append(1 if int(digest[0], 16) % 2 == 0 else -1)
        planes.append(signs)
    return planes


def lsh_bucket_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH: bucket id = sign bits of 8 Rademacher
    projections. Vectors with high cosine similarity collide with high
    probability (P(bit match) = 1 - angle/pi per plane)."""
    emb = _emb_double(load(spark, sf_dir, "embeddings"))
    planes = _hyperplanes()
    bucket = None
    for p, signs in enumerate(planes):
        plane_lit = F.array(*[F.lit(float(s)) for s in signs])
        proj = _dot(F.col("emb"), plane_lit)
        bit = F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return emb.select("vec_id", "label", bucket.cast("int").alias("bucket"))


def _lsh_bucket_sql() -> str:
    planes = _hyperplanes()
    terms = []
    for p, signs in enumerate(planes):
        arr = "[" + ", ".join(f"{float(s)}" for s in signs) + "]::DOUBLE[]"
        terms.append(
            f"CASE WHEN list_dot_product(e, {arr}) >= 0 THEN {1 << p} ELSE 0 END"
        )
    return " + ".join(terms)


register(
    "lsh_bucket_assignment",
    oracle=f"""
WITH emb AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings)
SELECT vec_id, label, CAST({_lsh_bucket_sql()} AS INTEGER) AS bucket
FROM emb
""",
    tags=("similarity", "llm-pipeline", "lsh"),
)(lsh_bucket_assignment)


def lsh_bucket_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket occupancy profile: how balanced is the LSH partitioning —
    the quantity that decides candidate-join cost at scale."""
    buckets = lsh_bucket_assignment(spark, sf_dir)
    return buckets.groupBy("bucket").agg(
        F.count("*").alias("n_vectors"),
        F.countDistinct("label").alias("n_labels"),
    )


register(
    "lsh_bucket_profile",
    oracle=f"""
WITH emb AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
buckets AS (
  SELECT vec_id, label, CAST({_lsh_bucket_sql()} AS INTEGER) AS bucket FROM emb
)
SELECT bucket, count(*) AS n_vectors, count(DISTINCT label) AS n_labels
FROM buckets GROUP BY bucket
""",
    tags=("similarity", "llm-pipeline", "lsh"),
)(lsh_bucket_profile)


N_CENTROIDS = 8
KMEANS_ITERS = 4


def _assign_cells(emb: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """Nearest-centroid assignment as a MAP-ONLY pass: the k x DIM
    centroid matrix enters the plan as broadcast DATA — a single row
    holding array<struct<cid, cemb>> — and the argmin is
    ``array_min(transform(...))`` over (dist, cid) structs, so assignment
    costs zero shuffles (the earlier crossJoin + groupBy(vec_id) argmin
    paid a full shuffle per k-means iteration). Shipping centroids as
    data, not literal expressions, keeps the plan structurally identical
    every iteration so Catalyst analysis/codegen cost is paid once. Ties
    resolve to the lowest centroid id via (dist, cid) struct ordering."""
    spark = emb.sparkSession
    cdf = spark.createDataFrame(
        [([(i, [float(v) for v in c]) for i, c in enumerate(centroids)],)],
        "cents array<struct<cid: int, cemb: array<double>>>",
    )
    sqdist = lambda cemb: F.aggregate(  # noqa: E731
        F.zip_with(F.col("emb"), cemb, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    best = F.array_min(
        F.transform(F.col("cents"), lambda c: F.struct(sqdist(c.cemb).alias("dist"), c.cid.alias("cid")))
    )
    return (
        emb.crossJoin(F.broadcast(cdf))  # one broadcast row, never a shuffle
        .select("vec_id", "emb", best.getField("cid").alias("cid"))
    )  # keeps emb: callers reuse the assignment as (vector, cell) pairs


def _kmeans_centroids(
    spark: SparkSession, sf_dir: str, emb: DataFrame | None = None
) -> list[list[float]]:
    """Deterministic Lloyd's k-means over the embedding corpus, expressed
    as iterative DataFrame jobs (assign = broadcast centroid join +
    min-struct argmin; update = posexplode + per-(cid, dim) mean).

    Each iteration is one distributed pass; only the k x DIM centroid
    matrix ever reaches the driver (the same driver-sized object any
    broadcast join ships). Seeds are the first k vectors by vec_id —
    deterministic, no RNG. The caller may pass a persisted ``emb`` to
    avoid re-scanning parquet each iteration.
    """
    own_cache = emb is None
    if emb is None:
        emb = _emb_double(load(spark, sf_dir, "embeddings")).select("vec_id", "emb")
        emb.persist()
    seed_rows = emb.orderBy("vec_id").limit(N_CENTROIDS).collect()
    centroids = [list(r.emb) for r in seed_rows]
    for _ in range(KMEANS_ITERS):
        assigned = _assign_cells(emb, centroids)
        # centroid update: one avg aggregate per dimension — map-side
        # partials mean the shuffle carries k x DIM running sums per
        # partition, not an exploded (row x dim) stream.
        means = assigned.groupBy("cid").agg(
            *[F.avg(F.col("emb")[i]).alias(f"d{i}") for i in range(DIM)]
        )
        new: dict[int, list[float]] = {}
        for r in means.collect():  # k rows x DIM cols — driver-sized by design
            new[r.cid] = [r[f"d{i}"] for i in range(DIM)]
        centroids = [new.get(c, centroids[c]) for c in range(N_CENTROIDS)]
    if own_cache:
        emb.unpersist()
    return centroids


def ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate nearest neighbors: k-means coarse quantizer, then
    exact cosine only within each query's nearest centroid cell (nprobe=1
    here; production probes several cells). The 100 TB shape: centroid
    assignment is a map-only pass, candidate search is an equi-join on
    cell id — corpus never cross-joins. Rows-only check (k-means is
    iterative, not SQL-expressible); recall vs brute force is pinned in
    tests/test_pipeline.py."""
    emb = _emb_double(load(spark, sf_dir, "embeddings")).select("vec_id", "emb")
    emb.persist()
    centroids = _kmeans_centroids(spark, sf_dir, emb=emb)
    cells = _assign_cells(emb, centroids)
    emb.unpersist()  # final pass below re-scans parquet once — no leak
    queries = cells.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb"), F.col("cid")
    )
    cand = cells.select(F.col("vec_id").alias("cand_id"), F.col("emb").alias("cemb"), "cid")
    scored = (
        cand.join(F.broadcast(queries), "cid")
        .where(F.col("cand_id") != F.col("query_id"))
        .withColumn(
            "cosine_raw",
            _dot(F.col("qemb"), F.col("cemb"))
            / (_norm(F.col("qemb")) * _norm(F.col("cemb"))),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_raw").desc(), F.col("cand_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= TOP_K)
        .select("query_id", "rk", "cand_id", rnd("cosine_raw", 6).alias("cosine"))
    )


register("ivf_topk", oracle=None, tags=("similarity", "llm-pipeline", "ivf", "ann", "bench"))(ivf_topk)


def embedding_cosine_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-accelerated: candidates
    share an LSH bucket; exact cosine >= 0.95 confirms. The bucket
    equi-join replaces the all-pairs cross product (the 100 TB shape)."""
    emb = _emb_double(load(spark, sf_dir, "embeddings"))
    planes = _hyperplanes()
    bucket = None
    for p, signs in enumerate(planes):
        plane_lit = F.array(*[F.lit(float(s)) for s in signs])
        proj = _dot(F.col("emb"), plane_lit)
        bit = F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    withb = emb.select("vec_id", F.col("emb"), bucket.cast("int").alias("bucket"))
    a = withb.select(
        F.col("vec_id").alias("vec1"), F.col("emb").alias("e1"), F.col("bucket").alias("b1")
    )
    b = withb.select(
        F.col("vec_id").alias("vec2"), F.col("emb").alias("e2"), F.col("bucket").alias("b2")
    )
    cos = _dot(F.col("e1"), F.col("e2")) / (_norm(F.col("e1")) * _norm(F.col("e2")))
    return (
        a.join(b, (F.col("b1") == F.col("b2")) & (F.col("vec1") < F.col("vec2")))
        .withColumn("cosine_raw", cos)
        .where(F.col("cosine_raw") >= 0.95)
        .select("vec1", "vec2", rnd("cosine_raw", 6).alias("cosine"))
    )


register(
    "embedding_cosine_dup_pairs",
    oracle=f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
buckets AS (
  SELECT vec_id, e, CAST({_lsh_bucket_sql()} AS INTEGER) AS bucket FROM emb
)
SELECT a.vec_id AS vec1, b.vec_id AS vec2,
       round(list_dot_product(a.e, b.e)
             / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))
             + 1e-6, 6) AS cosine
FROM buckets a JOIN buckets b
  ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE list_dot_product(a.e, b.e)
      / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) >= 0.95
""",
    tags=("similarity", "llm-pipeline", "near-dup", "lsh"),
)(embedding_cosine_dup_pairs)
