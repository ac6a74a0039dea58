"""Twelfth round-7 batch of round-8-prepared operators: sketch windows,
content-defined chunking, and schema discovery.

Same deferred-registration contract as ``prepared.py``. The sliding
KMV closes the sketch family's last gap — MERGEABLE DISTINCTS OVER
SLIDING WINDOWS (the exact fan-out trick of ``rolling_active_users``
costs users x days x width; at ad-tech cardinalities only the sketch
survives, and its error is hash-checked here next to the exact truth).
Content-defined chunking is how storage/dataset dedup actually splits
text — boundaries from a rolling content hash, so an insertion only
perturbs one chunk where ``doc_chunking``'s fixed stride re-shifts
every window after it. Column-similarity matching is the data-catalog
primitive: discover which columns across tables share a domain from
value-overlap sketches, no metadata required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_cookbook_spark.catalog import load
from flink_cookbook_spark.pipeline.dedup import _SQL_HASH, _portable_hash
from flink_cookbook_spark.registry import rnd


# --------------------------------------------------------------------------
# 1. sliding-window distinct via mergeable KMV partials
# --------------------------------------------------------------------------

KMV_W_K = 32  #: sketch size per day
KMV_W_DAYS = 7  #: trailing window width (days)


def sliding_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLIDING DISTINCT USERS from MERGED DAILY KMV SKETCHES: each day
    keeps its K smallest user hashes; a day's trailing-7 estimate
    re-merges the 7 daily sketches (union, re-take K smallest,
    estimate (K-1)/h_K) — the mergeable-sketch answer to the sliding
    COUNT DISTINCT that ``rolling_active_users`` computes exactly via
    the users x days x width fan-out. Daily partials are computed ONCE
    and reused by every window that covers them (the hourly->daily
    rollup discipline of ``kmv_merge_rollup``, applied to overlapping
    windows); the exact value and relative error ride along so the
    sketch's accuracy contract is itself hash-checked.

    Scale shape: daily sketches are rank-limited windows over per-day
    distinct hashes; the window merge fans out K x width SKETCH ROWS
    per day (constant, independent of corpus), and the exact side
    reuses the bounded user-day fan-out. At production cardinality the
    exact columns are dropped and only the constant-size sketch path
    runs."""
    ev = load(spark, sf_dir, "events")
    day = F.floor(F.col("ts").cast("double") / 86400).cast("long")
    h = _portable_hash(
        F.concat(F.lit("kmvw:"), F.col("user_id").cast("string"))
    )
    uday = ev.select(day.alias("day"), h.alias("h")).distinct()
    wd = Window.partitionBy("day").orderBy("h")
    daily = uday.withColumn("rk", F.row_number().over(wd)).where(
        F.col("rk") <= KMV_W_K
    )
    # each daily sketch row serves the KMV_W_DAYS window-end days it
    # falls into (bounded fan-out of SKETCH rows, not user rows)
    fanned = daily.select(
        "h",
        F.explode(
            F.sequence(
                F.col("day"), F.col("day") + (KMV_W_DAYS - 1)
            )
        ).alias("wend"),
        F.col("day").alias("src_day"),
    )
    ww = Window.partitionBy("wend").orderBy("h")
    merged = (
        fanned.select("wend", "h")
        .distinct()
        .withColumn("rk", F.row_number().over(ww))
        .where(F.col("rk") <= KMV_W_K)
    )
    est = merged.groupBy("wend").agg(
        F.count("*").alias("k_used"),
        F.max(F.when(F.col("rk") == KMV_W_K, F.col("h"))).alias("hk"),
    )
    scale = float(2**60)
    kmv = F.when(
        F.col("hk").isNotNull(),
        (KMV_W_K - 1) / (F.col("hk").cast("double") / scale),
    ).otherwise(F.col("k_used").cast("double"))
    # exact truth via the bounded user-day fan-out
    exact = (
        uday.select(
            "h",
            F.explode(
                F.sequence(F.col("day"), F.col("day") + (KMV_W_DAYS - 1))
            ).alias("wend"),
        )
        .groupBy("wend")
        .agg(F.countDistinct("h").alias("n_exact"))
    )
    valid_days = uday.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    out = (
        est.join(exact, "wend")
        .crossJoin(F.broadcast(valid_days))
        .where(
            (F.col("wend") >= F.col("d0") + (KMV_W_DAYS - 1))
            & (F.col("wend") <= F.col("d1"))
        )
    )
    return out.select(
        F.col("wend").alias("window_end_day"),
        "n_exact",
        rnd(kmv, 2).alias("kmv_estimate"),
        rnd(
            F.abs(kmv - F.col("n_exact")) / F.col("n_exact").cast("double"),
            4,
        ).alias("rel_error"),
    )


def _kmvw_oracle() -> str:
    h = _SQL_HASH.format(x="'kmvw:' || CAST(user_id AS VARCHAR)")
    scale = float(2**60)
    return f"""
WITH uday AS (
  SELECT DISTINCT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day, {h} AS h
  FROM events
),
daily AS (
  SELECT day, h FROM (
    SELECT day, h, row_number() OVER (PARTITION BY day ORDER BY h) AS rk
    FROM uday
  ) WHERE rk <= {KMV_W_K}
),
fanned AS (
  SELECT DISTINCT d.h, d.day + t.o AS wend
  FROM daily d CROSS JOIN
       (SELECT unnest(range(0, {KMV_W_DAYS})) AS o) t
),
merged AS (
  SELECT wend, h, rk FROM (
    SELECT wend, h, row_number() OVER (PARTITION BY wend ORDER BY h) AS rk
    FROM fanned
  ) WHERE rk <= {KMV_W_K}
),
est AS (
  SELECT wend, count(*) AS k_used,
         max(CASE WHEN rk = {KMV_W_K} THEN h END) AS hk
  FROM merged GROUP BY wend
),
exact AS (
  SELECT u.day + t.o AS wend, count(DISTINCT u.h) AS n_exact
  FROM uday u CROSS JOIN (SELECT unnest(range(0, {KMV_W_DAYS})) AS o) t
  GROUP BY 1
),
valid AS (SELECT min(day) AS d0, max(day) AS d1 FROM uday)
SELECT e.wend AS window_end_day,
       CAST(x.n_exact AS BIGINT) AS n_exact,
       round(CASE WHEN e.hk IS NOT NULL
                  THEN ({KMV_W_K} - 1) / (CAST(e.hk AS DOUBLE) / {scale!r})
                  ELSE CAST(e.k_used AS DOUBLE) END + 1e-6, 2)
         AS kmv_estimate,
       round(abs(CASE WHEN e.hk IS NOT NULL
                      THEN ({KMV_W_K} - 1) / (CAST(e.hk AS DOUBLE) / {scale!r})
                      ELSE CAST(e.k_used AS DOUBLE) END - x.n_exact)
             / CAST(x.n_exact AS DOUBLE) + 1e-6, 4) AS rel_error
FROM est e JOIN exact x ON e.wend = x.wend CROSS JOIN valid v
WHERE e.wend >= v.d0 + {KMV_W_DAYS - 1} AND e.wend <= v.d1
"""


# --------------------------------------------------------------------------
# 2. content-defined chunking dedup
# --------------------------------------------------------------------------

#: a token position ends a chunk when the rolling trigram hash is
#: 0 mod CDC_MOD (expected chunk length = CDC_MOD tokens).
CDC_MOD = 16


def cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTENT-DEFINED CHUNKING dedup: chunk boundaries fall where the
    rolling trigram hash hits 0 mod ``CDC_MOD`` (expected chunk ~16
    tokens), so chunk identity is anchored to CONTENT, not position —
    an insertion near a document's head re-shifts every fixed-stride
    window of ``doc_chunking`` but perturbs exactly one CDC chunk.
    Reports, per source, the chunk-level duplication ledger (chunks,
    distinct chunks, duplicated share) — the storage-dedup view of
    corpus redundancy, complementing the document-level
    ``dedup_token_savings``.

    Scale shape: boundary flags are a zero-join per-token expression
    (md5 of the token trigram), chunk ids one bounded per-doc window
    cumsum, chunk fingerprints a per-chunk listagg-equivalent ordered
    aggregate, and the ledger two stacked hash aggs."""
    docs = load(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "doc_id",
            "source",
            F.posexplode(F.split("text", " ")).alias("pos", "tok"),
        )
        .where(F.col("tok") != "")
    )
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    tri = F.concat_ws(
        "|",
        F.lag("tok", 2).over(wdoc),
        F.lag("tok", 1).over(wdoc),
        F.col("tok"),
    )
    flagged = toks.select(
        "doc_id",
        "source",
        "pos",
        "tok",
        (_portable_hash(tri) % CDC_MOD == 0).cast("int").alias("boundary"),
    )
    wcum = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    chunked = flagged.select(
        "doc_id",
        "source",
        "pos",
        "tok",
        F.coalesce(F.sum("boundary").over(wcum), F.lit(0)).alias("chunk_id"),
    )
    chunks = chunked.groupBy("doc_id", "source", "chunk_id").agg(
        F.md5(
            F.concat_ws(
                " ", F.array_sort(F.collect_list(F.struct("pos", "tok"))).getField("tok")
            )
        ).alias("fp"),
        F.count("*").alias("n_tokens"),
    )
    return chunks.groupBy("source").agg(
        F.count("*").alias("n_chunks"),
        F.countDistinct("fp").alias("n_distinct_chunks"),
        rnd(F.avg("n_tokens"), 2).alias("avg_chunk_tokens"),
        rnd(
            1.0 - F.countDistinct("fp") / F.count("*").cast("double"), 6
        ).alias("dup_chunk_share"),
    )


def _cdc_oracle() -> str:
    h = _SQL_HASH.format(x="tri")
    return f"""
WITH toks AS (
  SELECT doc_id, source, t.pos, t.tok
  FROM documents,
       LATERAL (SELECT unnest(string_split(text, ' ')) AS tok,
                       generate_subscripts(string_split(text, ' '), 1) AS pos)
         t
  WHERE t.tok != ''
),
flagged AS (
  SELECT doc_id, source, pos, tok,
         CASE WHEN {h} % {CDC_MOD} = 0 THEN 1 ELSE 0 END AS boundary
  FROM (
    SELECT doc_id, source, pos, tok,
           concat_ws('|',
                     lag(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos),
                     lag(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos),
                     tok) AS tri
    FROM toks
  )
),
chunked AS (
  SELECT doc_id, source, pos, tok,
         COALESCE(sum(boundary) OVER (PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS chunk_id
  FROM flagged
),
chunks AS (
  SELECT doc_id, source, chunk_id,
         md5(string_agg(tok, ' ' ORDER BY pos)) AS fp,
         count(*) AS n_tokens
  FROM chunked GROUP BY 1, 2, 3
)
SELECT source,
       count(*) AS n_chunks,
       CAST(count(DISTINCT fp) AS BIGINT) AS n_distinct_chunks,
       round(avg(n_tokens) + 1e-6, 2) AS avg_chunk_tokens,
       round(1.0 - count(DISTINCT fp) / CAST(count(*) AS DOUBLE) + 1e-6, 6)
         AS dup_chunk_share
FROM chunks GROUP BY source
"""


# --------------------------------------------------------------------------
# 3. column-similarity schema matching
# --------------------------------------------------------------------------

#: sketch size for the per-column KMV value sketches.
COLSIM_K = 64

#: (table, column) pairs profiled for domain overlap.
COLSIM_COLUMNS = (
    ("orders", "o_orderkey"),
    ("orders", "o_custkey"),
    ("lineitem", "l_orderkey"),
    ("lineitem", "l_partkey"),
    ("customer", "c_custkey"),
    ("part", "p_partkey"),
)


def column_similarity_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCHEMA DISCOVERY BY VALUE OVERLAP: sketch each profiled column's
    value set with KMV, estimate pairwise Jaccard from the merged
    sketches (the ``kmv_jaccard_overlap`` estimator applied all-pairs),
    and emit the candidate join-key / shared-domain pairs a data
    catalog surfaces without any metadata — o_orderkey~l_orderkey and
    o_custkey~c_custkey should score high, disjoint-domain pairs near
    zero. Values hash as strings, so the technique is type-agnostic.

    Scale shape: each column reduces to a K-row sketch (rank-limited
    window over per-column distinct hashes) regardless of table size;
    the all-pairs comparison runs over bounded sketch unions (pairs x
    K rows). Adding a column costs one scan of ITS table only — and
    only ONE: the sketch union is memoized (round-9 tier-2 bench
    finding: each of the P*(P-1)/2 pair arms filters the union, and
    left lazy, Catalyst re-scanned all P source tables per arm —
    O(P^3) scans for a table whose physical size is P x K rows)."""
    from flink_cookbook_spark.pipeline._cache import memo_persist

    def _build_sketches() -> DataFrame:
        sketches = []
        for table, col in COLSIM_COLUMNS:
            t = load(spark, sf_dir, table)
            h = _portable_hash(
                F.concat(F.lit("colsim:"), F.col(col).cast("string"))
            )
            # k smallest distinct hashes via orderBy().limit() —
            # TakeOrderedAndProject, never a global ranking window over
            # the column's distinct cardinality (billions at 100 TB)
            sketches.append(
                t.select(h.alias("h"))
                .distinct()
                .orderBy("h")
                .limit(COLSIM_K)
                .select(
                    F.lit(f"{table}.{col}").alias("col_name"), "h"
                )
            )
        out = sketches[0]
        for s in sketches[1:]:
            out = out.unionAll(s)
        return out

    allsk = memo_persist(spark, "colsim_sketches", sf_dir, _build_sketches)
    # for each unordered column pair: re-take K smallest of the union,
    # count sketch members present on both sides (the KMV Jaccard
    # estimator of ``kmv_jaccard_overlap``, applied all-pairs). ONE
    # plan for every pair (round-9: the per-pair full-outer-join arms
    # ran 3 tiny stages each — P*(P-1)/2 * 3 stages of scheduling
    # overhead): the 15-row pair list broadcast-joins the persisted
    # sketch union twice (once per side), membership is a (pair, h)
    # groupBy, the re-take-K is a window PARTITIONED by pair, and the
    # estimate is one grouped aggregate.
    names = [f"{t}.{c}" for t, c in COLSIM_COLUMNS]
    pairs = spark.createDataFrame(
        [
            (na, nb)
            for i, na in enumerate(names)
            for nb in names[i + 1:]
        ],
        "col_a string, col_b string",
    )
    sides = (
        F.broadcast(pairs)
        .join(allsk, F.col("col_name") == F.col("col_a"))
        .select("col_a", "col_b", "h", F.lit(1).alias("a"), F.lit(0).alias("b"))
        .unionAll(
            F.broadcast(pairs)
            .join(allsk, F.col("col_name") == F.col("col_b"))
            .select(
                "col_a", "col_b", "h", F.lit(0).alias("a"), F.lit(1).alias("b")
            )
        )
    )
    members = sides.groupBy("col_a", "col_b", "h").agg(
        F.max("a").alias("a"), F.max("b").alias("b")
    )
    wu = Window.partitionBy("col_a", "col_b").orderBy("h")
    unionk = members.withColumn("rk", F.row_number().over(wu)).where(
        F.col("rk") <= COLSIM_K
    )
    return (
        unionk.groupBy("col_a", "col_b")
        .agg(
            F.count("*").alias("k_used"),
            F.sum((F.col("a") * F.col("b")).cast("long")).alias("n_both"),
        )
        .select(
            "col_a",
            "col_b",
            rnd(F.col("n_both") / F.col("k_used").cast("double"), 6).alias(
                "est_jaccard"
            ),
            (
                F.col("n_both") / F.col("k_used").cast("double") > 0.5
            ).alias("same_domain_candidate"),
        )
    )


def _colsim_oracle() -> str:
    sk_ctes = []
    for table, col in COLSIM_COLUMNS:
        h = _SQL_HASH.format(x=f"'colsim:' || CAST({col} AS VARCHAR)")
        nm = f"{table}.{col}".replace(".", "_")
        sk_ctes.append(f"""sk_{nm} AS (
  SELECT h FROM (
    SELECT h, row_number() OVER (ORDER BY h) AS rk
    FROM (SELECT DISTINCT {h} AS h FROM {table})
  ) WHERE rk <= {COLSIM_K}
)""")
    names = [f"{t}.{c}" for t, c in COLSIM_COLUMNS]
    arms = []
    for i, na in enumerate(names):
        for nb in names[i + 1:]:
            sa = "sk_" + na.replace(".", "_")
            sb = "sk_" + nb.replace(".", "_")
            arms.append(f"""
SELECT '{na}' AS col_a, '{nb}' AS col_b,
       round(n_both / CAST(k_used AS DOUBLE) + 1e-6, 6) AS est_jaccard,
       n_both / CAST(k_used AS DOUBLE) > 0.5 AS same_domain_candidate
FROM (
  SELECT count(*) AS k_used, CAST(sum(a * b) AS BIGINT) AS n_both
  FROM (
    SELECT h, a, b, row_number() OVER (ORDER BY h) AS rk
    FROM (
      SELECT COALESCE(x.h, y.h) AS h,
             CASE WHEN x.h IS NULL THEN 0 ELSE 1 END AS a,
             CASE WHEN y.h IS NULL THEN 0 ELSE 1 END AS b
      FROM {sa} x FULL OUTER JOIN {sb} y ON x.h = y.h
    )
  ) WHERE rk <= {COLSIM_K}
)""")
    return (
        "WITH " + ",\n".join(sk_ctes) + "\n" + "\nUNION ALL\n".join(arms)
    )


#: name -> (query fn, oracle SQL), merged into prepared.PREPARED_R8.
PREPARED_R8_BATCH12 = {
    "sliding_kmv_distinct": (sliding_kmv_distinct, _kmvw_oracle()),
    "cdc_chunk_dedup": (cdc_chunk_dedup, _cdc_oracle()),
    "column_similarity_matching": (
        column_similarity_matching, _colsim_oracle(),
    ),
}
