"""Deterministic sampling & domain-mixture operators for training-data
pipelines.

Subsampling is how a 100 TB corpus becomes a training mix: each source
(domain) gets a keep-rate, and membership must be a PURE FUNCTION of the
row — never `rand()` — so that re-runs, retries, and incremental
backfills select the identical subset (and so an engine-independent
oracle can verify the selection). The coin is the md5-derived 60-bit
integer already used by the dedup family (portable across Spark and
DuckDB), mapped to a uniform in [0, 1).

Scale shape: both operators are a single map over the corpus followed by
(at most) one map-side-combinable aggregate — no joins, no shuffle for
the sampler itself (the filter is row-local), one hash exchange for the
mixture summary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_cookbook_spark.catalog import load
from flink_cookbook_spark.registry import register, rnd

#: coin resolution: md5-60bit % 1e6 / 1e6 — uniform enough for rate
#: comparisons at 6 decimal places, and exactly reproducible in SQL.
COIN_MOD = 1_000_000

#: keep-rate ladder by source index: src{i} keeps (i % 4 + 1) * 25%.
#: A production mix table would be a broadcast dim; a pure expression
#: keeps the oracle literal.
RATE_SQL = "((CAST(substr(source, 4) AS INTEGER) % 4) + 1) * 0.25"


def _coin(col) -> F.Column:
    """Uniform [0,1) from md5 — first 15 hex digits as int, mod 1e6."""
    h = F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
    return (h % COIN_MOD).cast("double") / COIN_MOD


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source deterministic Bernoulli sampling of ``documents``:
    keep doc iff md5-coin('sample:' || doc_id) < rate(source). Returns
    the kept rows with their coin and rate, so the oracle verifies the
    exact membership — not just the sample size."""
    docs = load(spark, sf_dir, "documents")
    rate = F.expr(RATE_SQL)
    coin = _coin(F.concat(F.lit("sample:"), F.col("doc_id").cast("string")))
    return (
        docs.select(
            "doc_id",
            "source",
            rnd(rate, 2).alias("keep_rate"),
            rnd(coin, 6).alias("coin"),
        )
        .where(F.col("coin") < F.col("keep_rate"))
    )


register(
    "stratified_sample",
    oracle=f"""
WITH coined AS (
  SELECT doc_id, source,
         round({RATE_SQL} + 1e-6, 2) AS keep_rate,
         round((CAST('0x' || substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
                % {COIN_MOD}) * 1.0 / {COIN_MOD} + 1e-6, 6) AS coin
  FROM documents
)
SELECT doc_id, source, keep_rate, coin
FROM coined WHERE coin < keep_rate
""",
    tags=("sampling", "llm-pipeline"),
)(stratified_sample)


def source_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture profile: per-source document and token counts and
    each source's normalized token share — the weights a data-mixing
    stage feeds the sampler. Token counting stays array-side (no
    explode); the share denominator is a scalar subquery (broadcast)."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("source", F.size(F.split("text", " ")).alias("n_tokens"))
    per_source = toks.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )
    total = per_source.agg(F.sum("total_tokens").alias("grand")).select("grand")
    return (
        per_source.crossJoin(F.broadcast(total))
        .select(
            "source",
            "n_docs",
            "total_tokens",
            rnd(F.col("total_tokens").cast("double") / F.col("grand"), 6).alias("token_share"),
        )
    )


register(
    "source_mixture_weights",
    oracle="""
WITH per_source AS (
  SELECT source, count(*) AS n_docs,
         sum(len(string_split(text, ' '))) AS total_tokens
  FROM documents GROUP BY source
)
SELECT source, n_docs, CAST(total_tokens AS BIGINT) AS total_tokens,
       round(CAST(total_tokens AS DOUBLE)
             / (SELECT sum(total_tokens) FROM per_source) + 1e-6, 6) AS token_share
FROM per_source
""",
    tags=("sampling", "llm-pipeline", "mixture"),
)(source_mixture_weights)


RESERVOIR_K = 5  # kept docs per source


def reservoir_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-k "reservoir" per source: the K docs with the
    smallest md5-coin per group — the debug/eyeball sample every corpus
    job wants ("show me 5 docs from each source") made reproducible
    across re-runs and engines.

    Hash-ordered top-k per key IS distributed reservoir sampling with a
    deterministic coin: rank by a pure hash, keep k. One exchange on
    source, and Spark executes the rank-filter as WindowGroupLimit —
    per-partition partial top-k before the shuffle, so the exchange
    carries at most k rows per source per map partition, never the
    corpus.
    """
    docs = load(spark, sf_dir, "documents")
    coin = _coin(F.concat(F.lit("reservoir:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(F.col("coin").asc(), F.col("doc_id").asc())
    return (
        docs.select("doc_id", "source", "n_chars", coin.alias("coin"))
        .withColumn("pick", F.row_number().over(w))
        .where(F.col("pick") <= RESERVOIR_K)
        .select(
            "source",
            F.col("pick").alias("pick"),
            "doc_id",
            "n_chars",
            rnd("coin", 6).alias("coin"),
        )
    )


register(
    "reservoir_sample_per_source",
    oracle=f"""
WITH coined AS (
  SELECT doc_id, source, n_chars,
         (CAST(('0x' || substr(md5('reservoir:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
          % {COIN_MOD}) / {COIN_MOD}.0 AS coin
  FROM documents
)
SELECT source,
       CAST(pick AS INTEGER) AS pick,
       doc_id,
       n_chars,
       round(coin + 1e-6, 6) AS coin
FROM (
  SELECT *, row_number() OVER (PARTITION BY source ORDER BY coin ASC, doc_id ASC) AS pick
  FROM coined
)
WHERE pick <= {RESERVOIR_K}
""",
    tags=("sampling", "llm-pipeline", "reservoir"),
)(reservoir_sample_per_source)


def quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft quality filtering (the CCNet-style alternative to hard
    drops): each document's keep-probability IS its quality signal —
    here the distinct-token ratio, so repetitive/boilerplate docs get
    proportionally downsampled instead of binarily rejected — and
    membership is the same deterministic md5 coin as
    ``stratified_sample`` (re-runs and backfills select identical sets;
    the oracle verifies exact membership).

    Map-only: per-row token arrays + one hash comparison; no shuffle,
    no joins, trivially 100 TB-safe.
    """
    docs = load(spark, sf_dir, "documents")
    ts = F.split("text", " ")
    p_keep = F.size(F.array_distinct(ts)).cast("double") / F.size(ts)
    coin = _coin(F.concat(F.lit("qsample:"), F.col("doc_id").cast("string")))
    return (
        docs.select(
            "doc_id",
            "source",
            rnd(p_keep, 6).alias("keep_prob"),
            rnd(coin, 6).alias("coin"),
        )
        .where(F.col("coin") < F.col("keep_prob"))
    )


register(
    "quality_weighted_sample",
    oracle=f"""
WITH scored AS (
  SELECT doc_id, source,
         round(len(list_distinct(string_split(text, ' '))) * 1.0
               / len(string_split(text, ' ')) + 1e-6, 6) AS keep_prob,
         round((CAST('0x' || substr(md5('qsample:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
                % {COIN_MOD}) * 1.0 / {COIN_MOD} + 1e-6, 6) AS coin
  FROM documents
)
SELECT doc_id, source, keep_prob, coin
FROM scored WHERE coin < keep_prob
""",
    tags=("sampling", "llm-pipeline", "quality"),
)(quality_weighted_sample)


#: docs kept per source by the weighted without-replacement sampler.
WSR_K = 10


def weighted_sample_without_replacement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efraimidis–Spirakis weighted sampling WITHOUT replacement: exactly
    ``WSR_K`` documents per source, selected with probability
    proportional to document length, deterministically.

    The exponential-race formulation: each doc draws an md5 coin
    u in (0, 1] and gets key = -ln(u) / weight (an Exp(weight) variate);
    the K smallest keys per source are the sample. This is the standard
    distributed one-pass weighted reservoir — keys are computed map-side
    and the per-source top-K is a WindowGroupLimit (never a global
    sort), so a 100 TB corpus pays one bounded exchange on source.
    Unlike ``quality_weighted_sample`` (independent Bernoulli coins,
    random sample SIZE), this guarantees the exact per-source quota.

    Keys are rounded to 6 dp on BOTH engines before ranking, with
    doc_id as the tie-break, so the selected set can never depend on a
    last-ulp ln()/division difference between Spark and DuckDB.
    """
    docs = load(spark, sf_dir, "documents")
    # (h % M + 1)/M lies in (0, 1] — never ln(0)
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("wsr:"), F.col("doc_id").cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    u = (h % COIN_MOD + 1).cast("double") / COIN_MOD
    keyed = docs.select(
        "doc_id",
        "source",
        "n_chars",
        rnd(-F.log(u) / F.col("n_chars"), 6).alias("race_key"),
    )
    w = Window.partitionBy("source").orderBy(
        F.col("race_key").asc(), F.col("doc_id").asc()
    )
    return (
        keyed.select("*", F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= WSR_K)
    )


register(
    "weighted_sample_without_replacement",
    oracle=f"""
WITH keyed AS (
  SELECT doc_id, source, n_chars,
         round(-ln(((CAST('0x' || substr(md5('wsr:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
                     % {COIN_MOD}) + 1) * 1.0 / {COIN_MOD}) / n_chars + 1e-6, 6)
           AS race_key
  FROM documents
)
SELECT doc_id, source, n_chars, race_key,
       CAST(row_number() OVER (PARTITION BY source
                               ORDER BY race_key ASC, doc_id ASC) AS INTEGER) AS rank
FROM keyed
QUALIFY rank <= {WSR_K}
""",
    tags=("sampling", "llm-pipeline", "weighted", "without-replacement"),
)(weighted_sample_without_replacement)
