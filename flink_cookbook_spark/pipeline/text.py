"""Text-analysis operators for LLM-training-data pipelines.

Token counting, language statistics and a marker-based language-ID
heuristic, quality scoring (length / token-shape / stopword ratios),
document fingerprinting, token frequencies, and TF-IDF — all pure
DataFrame expressions over the ``documents`` fixture table, each with a
DuckDB oracle.

Scale notes (100 TB): token-level operators explode to one row per
token — at corpus scale that is the dominant shuffle, so everything
that can stay per-document (quality score, fingerprint, token counts via
array functions) does, and only frequency/TF-IDF computations explode.
The explode -> groupBy pattern is map-side combinable; df (document
frequency) and other vocabulary-cardinality joins are UNHINTED — the
whitespace vocabulary of web text is 1e8-1e9 distinct strings, so a
forced broadcast would OOM at scale; AQE broadcasts when genuinely small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_cookbook_spark.catalog import load
from flink_cookbook_spark.registry import register, rnd

#: stopword markers per language for the ID heuristic (fixture vocab).
STOPWORDS = ("the", "a")


def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token statistics without exploding: counts, distinct
    counts, and mean token length via array higher-order functions."""
    docs = load(spark, sf_dir, "documents")
    ts = F.split("text", " ")
    return docs.select(
        "doc_id",
        "lang",
        F.size(ts).alias("n_tokens"),
        F.size(F.array_distinct(ts)).alias("n_distinct_tokens"),
        rnd(
            F.aggregate(
                F.transform(ts, lambda t: F.length(t)),
                F.lit(0),
                lambda acc, x: acc + x,
            ).cast("double")
            / F.size(ts),
            4,
        ).alias("mean_token_len"),
        F.col("n_chars"),
    )


register(
    "token_stats",
    oracle="""
WITH t AS (SELECT doc_id, lang, n_chars, string_split(text, ' ') AS ts FROM documents)
SELECT doc_id, lang,
       CAST(len(ts) AS INTEGER) AS n_tokens,
       CAST(len(list_distinct(ts)) AS INTEGER) AS n_distinct_tokens,
       round(CAST(list_sum(list_transform(ts, x -> length(x))) AS DOUBLE) / len(ts) + 1e-6, 4)
         AS mean_token_len,
       n_chars
FROM t
""",
    tags=("text", "llm-pipeline"),
)(token_stats)


def lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus language profile: document counts and size stats per
    declared language and source."""
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        rnd(F.avg("n_chars")).alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


register(
    "lang_stats",
    oracle="""
SELECT lang, source,
       count(*) AS n_docs,
       round(avg(n_chars) + 1e-6, 4) AS avg_chars,
       min(n_chars) AS min_chars,
       max(n_chars) AS max_chars
FROM documents GROUP BY lang, source
""",
    tags=("text", "llm-pipeline"),
)(lang_stats)


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality scoring: stopword ratio, repetition ratio
    (1 - distinct/total), mean token length, and a composite score —
    the standard cheap filters before expensive pipeline stages."""
    docs = load(spark, sf_dir, "documents")
    ts = F.split("text", " ")
    n = F.size(ts)
    stop_in = ", ".join(f"'{s}'" for s in STOPWORDS)
    n_stop = F.size(F.expr(f"filter(split(text, ' '), t -> t IN ({stop_in}))"))
    stop_ratio = n_stop.cast("double") / n
    rep_ratio = 1.0 - F.size(F.array_distinct(ts)).cast("double") / n
    score = (
        F.when(n < 10, 0.0).otherwise(1.0)
        * (1.0 - rep_ratio)
        * F.when(stop_ratio > 0.5, 0.5).otherwise(1.0)
    )
    return docs.select(
        "doc_id",
        F.col("n_chars"),
        n.alias("n_tokens"),
        rnd(stop_ratio, 4).alias("stopword_ratio"),
        rnd(rep_ratio, 4).alias("repetition_ratio"),
        rnd(score, 4).alias("quality"),
    )


register(
    "quality_score",
    oracle=f"""
WITH t AS (SELECT doc_id, n_chars, string_split(text, ' ') AS ts FROM documents),
m AS (
  SELECT doc_id, n_chars,
         len(ts) AS n,
         CAST(len(list_filter(ts, x -> x IN ({", ".join(repr(s) for s in STOPWORDS)}))) AS DOUBLE)
           / len(ts) AS stop_ratio,
         1.0 - CAST(len(list_distinct(ts)) AS DOUBLE) / len(ts) AS rep_ratio
  FROM t
)
SELECT doc_id, n_chars,
       CAST(n AS INTEGER) AS n_tokens,
       round(stop_ratio + 1e-6, 4) AS stopword_ratio,
       round(rep_ratio + 1e-6, 4) AS repetition_ratio,
       round((CASE WHEN n < 10 THEN 0.0 ELSE 1.0 END)
             * (1.0 - rep_ratio)
             * (CASE WHEN stop_ratio > 0.5 THEN 0.5 ELSE 1.0 END) + 1e-6, 4) AS quality
FROM m
""",
    tags=("text", "llm-pipeline"),
)(quality_score)


def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language ID: predict 'en' when stopword density
    clears a threshold, else 'other'; report agreement with the declared
    label. (A real n-gram model is the same shape: per-language marker
    score columns + argmax.)"""
    docs = load(spark, sf_dir, "documents")
    ts = F.split("text", " ")
    stop_in = ", ".join(f"'{s}'" for s in STOPWORDS)
    ratio = (
        F.size(F.expr(f"filter(split(text, ' '), t -> t IN ({stop_in}))")).cast("double")
        / F.size(ts)
    )
    predicted = F.when(ratio >= 0.05, F.lit("en")).otherwise(F.lit("other"))
    return docs.select(
        "doc_id",
        F.col("lang").alias("declared_lang"),
        rnd(ratio, 4).alias("marker_ratio"),
        predicted.alias("predicted_lang"),
        (predicted == F.col("lang")).alias("agrees"),
    )


register(
    "lang_id_heuristic",
    oracle=f"""
WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS ts FROM documents),
m AS (
  SELECT doc_id, lang,
         CAST(len(list_filter(ts, x -> x IN ({", ".join(repr(s) for s in STOPWORDS)}))) AS DOUBLE)
           / len(ts) AS ratio
  FROM t
)
SELECT doc_id, lang AS declared_lang,
       round(ratio + 1e-6, 4) AS marker_ratio,
       CASE WHEN ratio >= 0.05 THEN 'en' ELSE 'other' END AS predicted_lang,
       (CASE WHEN ratio >= 0.05 THEN 'en' ELSE 'other' END) = lang AS agrees
FROM m
""",
    tags=("text", "llm-pipeline"),
)(lang_id_heuristic)


def top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global token frequencies, top-20 (tie-broken by token)."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("token").asc())
        .limit(20)
    )


register(
    "top_tokens",
    oracle="""
SELECT token, count(*) AS n_occurrences
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY token ORDER BY n_occurrences DESC, token ASC LIMIT 20
""",
    tags=("text", "llm-pipeline"),
)(top_tokens)


def tf_idf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF per (document, token) for the first 50 documents:
    tf = count in doc / doc length; idf = ln(N / df). The df join is
    UNHINTED: at web scale the token vocabulary is 1e8-1e9 distinct
    strings, too big to force-broadcast — a shuffled join on `token`
    is corpus-independent, and AQE still broadcasts when small."""
    docs = load(spark, sf_dir, "documents")
    n_docs = docs.select(F.countDistinct("doc_id").alias("n"))
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    tf = (
        toks.groupBy("doc_id", "token")
        .agg(F.count("*").alias("n_tok"))
        .withColumn("doc_len", F.sum("n_tok").over(Window.partitionBy("doc_id")))
    )
    df_tbl = toks.distinct().groupBy("token").agg(F.count("*").alias("df"))
    return (
        tf.where(F.col("doc_id") < 50)
        .join(df_tbl, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            rnd(F.col("n_tok").cast("double") / F.col("doc_len"), 6).alias("tf"),
            rnd(F.log(F.col("n").cast("double") / F.col("df")), 6).alias("idf"),
            rnd(
                (F.col("n_tok").cast("double") / F.col("doc_len"))
                * F.log(F.col("n").cast("double") / F.col("df")),
                6,
            ).alias("tf_idf"),
        )
    )


register(
    "tf_idf",
    oracle="""
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
tf AS (
  SELECT doc_id, token, count(*) AS n_tok,
         sum(count(*)) OVER (PARTITION BY doc_id) AS doc_len
  FROM toks GROUP BY doc_id, token
),
df AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY token),
n AS (SELECT count(DISTINCT doc_id) AS n FROM documents)
SELECT tf.doc_id, tf.token,
       round(CAST(n_tok AS DOUBLE) / doc_len + 1e-6, 6) AS tf,
       round(ln(CAST(n.n AS DOUBLE) / df.df) + 1e-6, 6) AS idf,
       round((CAST(n_tok AS DOUBLE) / doc_len) * ln(CAST(n.n AS DOUBLE) / df.df) + 1e-6, 6)
         AS tf_idf
FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
WHERE tf.doc_id < 50
""",
    tags=("text", "llm-pipeline", "bench"),
)(tf_idf)


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: content md5 plus a coarse structural
    signature (length band x token count) for fast pre-clustering."""
    docs = load(spark, sf_dir, "documents")
    ts = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.md5("text").alias("content_md5"),
        F.concat_ws(
            ":",
            (F.col("n_chars") / 100).cast("int").cast("string"),
            F.size(ts).cast("string"),
        ).alias("structural_sig"),
    )


register(
    "doc_fingerprint",
    oracle="""
SELECT doc_id,
       md5(text) AS content_md5,
       CAST(CAST(n_chars // 100 AS INTEGER) AS VARCHAR) || ':' ||
         CAST(len(string_split(text, ' ')) AS VARCHAR) AS structural_sig
FROM documents
""",
    tags=("text", "llm-pipeline"),
)(doc_fingerprint)


#: BPE-ish pre-tokenizer (both engines' regex dialects agree on this
#: subset: no lookaround, leftmost-first alternation): contractions,
#: letter runs, 1-3 digit groups (cl100k-style number chunking), then
#: punctuation/symbol runs. Estimates subword token counts ~chars/4
#: without shipping a vocabulary — the standard cheap budget heuristic
#: for LLM-training-data sizing.
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\s']+"


def bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting, both ways the brief's pipeline needs: whitespace
    tokens (word budget) and a BPE-ish regex pre-tokenization (subword
    budget proxy) — plus chars-per-BPE-token, the compression-ratio
    quality signal (garbage text compresses badly). Pure JVM-side
    regexp_extract_all; no Python, no explode."""
    docs = load(spark, sf_dir, "documents")
    bpe = F.regexp_extract_all("text", F.lit(BPE_ISH_PATTERN), 0)
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_ws_tokens"),
        F.size(bpe).alias("n_bpe_tokens"),
        rnd(
            F.col("n_chars").cast("double")
            / F.greatest(F.size(bpe), F.lit(1)).cast("double"),
            4,
        ).alias("chars_per_bpe_token"),
    )


register(
    "bpe_token_count",
    oracle=r"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text,
         '''(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\s'']+'))
         AS INTEGER) AS n_bpe_tokens,
       round(CAST(n_chars AS DOUBLE)
             / greatest(len(regexp_extract_all(text,
               '''(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\s'']+')), 1)
             + 1e-6, 4) AS chars_per_bpe_token
FROM documents
""",
    tags=("text", "llm-pipeline", "tokenization"),
)(bpe_token_count)


def corpus_filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed pre-training corpus filter: exact-dup removal +
    length bounds + quality score + language ID, folded into one pass
    with a per-document keep/drop verdict and the FIRST failing reason
    (the order a production pipeline applies them: cheap dedup first,
    then cheap heuristics, so expensive downstream stages see only
    survivors).

    Scale shape: one window function over the content fingerprint (hash
    shuffle on md5(text) — the same shuffle exact dedup needs anyway)
    plus per-row array expressions; no joins, no explodes, one shuffle
    total. At 100 TB this is the shape you want: the entire filter is a
    single map + one keyed exchange.
    """
    docs = load(spark, sf_dir, "documents")
    ts = F.split("text", " ")
    n = F.size(ts)
    stop_in = ", ".join(f"'{s}'" for s in STOPWORDS)
    n_stop = F.size(F.expr(f"filter(split(text, ' '), t -> t IN ({stop_in}))"))
    stop_ratio = n_stop.cast("double") / n
    rep_ratio = 1.0 - F.size(F.array_distinct(ts)).cast("double") / n
    quality = (
        F.when(n < 10, 0.0).otherwise(1.0)
        * (1.0 - rep_ratio)
        * F.when(stop_ratio > 0.5, 0.5).otherwise(1.0)
    )
    dup_rank = F.row_number().over(
        Window.partitionBy(F.md5("text")).orderBy(F.col("doc_id").asc())
    )
    staged = docs.select(
        "doc_id",
        n.alias("n_tokens"),
        rnd(quality, 4).alias("quality"),
        rnd(stop_ratio, 4).alias("marker_ratio"),
        dup_rank.alias("dup_rank"),
    )
    reason = (
        F.when(F.col("dup_rank") > 1, "duplicate")
        .when(F.col("n_tokens") < 10, "too_short")
        .when(F.col("quality") < 0.5, "low_quality")
        .when(F.col("marker_ratio") < 0.05, "non_en")
        .otherwise("keep")
    )
    return staged.select(
        "doc_id",
        "n_tokens",
        "quality",
        reason.alias("reason"),
        (reason == "keep").alias("keep"),
    )


register(
    "corpus_filter_pipeline",
    oracle=f"""
WITH t AS (
  SELECT doc_id,
         string_split(text, ' ') AS ts,
         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id ASC) AS dup_rank
  FROM documents
),
m AS (
  SELECT doc_id, dup_rank,
         len(ts) AS n,
         CAST(len(list_filter(ts, x -> x IN ({", ".join(repr(s) for s in STOPWORDS)}))) AS DOUBLE)
           / len(ts) AS stop_ratio,
         1.0 - CAST(len(list_distinct(ts)) AS DOUBLE) / len(ts) AS rep_ratio
  FROM t
),
staged AS (
  SELECT doc_id,
         CAST(n AS INTEGER) AS n_tokens,
         round((CASE WHEN n < 10 THEN 0.0 ELSE 1.0 END)
               * (1.0 - rep_ratio)
               * (CASE WHEN stop_ratio > 0.5 THEN 0.5 ELSE 1.0 END) + 1e-6, 4) AS quality,
         round(stop_ratio + 1e-6, 4) AS marker_ratio,
         dup_rank
  FROM m
)
SELECT doc_id, n_tokens, quality,
       CASE WHEN dup_rank > 1 THEN 'duplicate'
            WHEN n_tokens < 10 THEN 'too_short'
            WHEN quality < 0.5 THEN 'low_quality'
            WHEN marker_ratio < 0.05 THEN 'non_en'
            ELSE 'keep' END AS reason,
       (CASE WHEN dup_rank > 1 THEN 'duplicate'
             WHEN n_tokens < 10 THEN 'too_short'
             WHEN quality < 0.5 THEN 'low_quality'
             WHEN marker_ratio < 0.05 THEN 'non_en'
             ELSE 'keep' END) = 'keep' AS keep
FROM staged
""",
    tags=("text", "llm-pipeline", "filter", "bench"),
)(corpus_filter_pipeline)


#: histogram bounds chosen to bracket the fixture corpus (n_chars
#: 44..577 at sf0.1) with headroom; out-of-range values land in the
#: ANSI width_bucket overflow buckets (0 / n+1) identically on both
#: engines.
HIST_LO, HIST_HI, HIST_BUCKETS = 0.0, 800.0, 16


def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width document-length histogram via ANSI width_bucket — the
    one-shuffle profile every corpus intake job runs first. Group count
    is bounded by the bucket count, so the aggregate is map-side
    combinable and the final exchange moves at most n_buckets+2 rows."""
    docs = load(spark, sf_dir, "documents")
    bucket = F.expr(
        f"width_bucket(CAST(n_chars AS DOUBLE), {HIST_LO}, {HIST_HI}, {HIST_BUCKETS})"
    ).cast("int")
    width = (HIST_HI - HIST_LO) / HIST_BUCKETS
    return (
        docs.select(bucket.alias("bucket"), "n_chars")
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .withColumn("bucket_lo", rnd(HIST_LO + (F.col("bucket") - 1) * F.lit(width), 2))
        .withColumn("bucket_hi", rnd(HIST_LO + F.col("bucket") * F.lit(width), 2))
    )


register(
    "doc_length_histogram",
    # DuckDB has no width_bucket — the CASE is the ANSI definition
    # (0 below range, n_buckets+1 at/above hi, else 1-based equal-width).
    oracle=f"""
SELECT CAST(CASE WHEN CAST(n_chars AS DOUBLE) < {HIST_LO} THEN 0
            WHEN CAST(n_chars AS DOUBLE) >= {HIST_HI} THEN {HIST_BUCKETS} + 1
            ELSE floor((CAST(n_chars AS DOUBLE) - {HIST_LO})
                       / {(HIST_HI - HIST_LO) / HIST_BUCKETS}) + 1 END AS INTEGER) AS bucket,
       count(*) AS n_docs,
       min(n_chars) AS min_chars,
       max(n_chars) AS max_chars,
       round({HIST_LO} + (bucket - 1) * {(HIST_HI - HIST_LO) / HIST_BUCKETS} + 1e-6, 2) AS bucket_lo,
       round({HIST_LO} + bucket * {(HIST_HI - HIST_LO) / HIST_BUCKETS} + 1e-6, 2) AS bucket_hi
FROM documents
GROUP BY 1
""",
    tags=("text", "llm-pipeline", "histogram"),
)(doc_length_histogram)


def _bigram_exploded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per adjacent-token bigram, (doc_id, bigram) — the shared
    fact stream behind ``bigram_logprob_score``, ``collocation_pmi`` and
    ``vocab_growth`` (single memoized build; previously three copies
    shared the memo key, a drift hazard).

    Documents with fewer than two tokens contribute no bigrams — the
    ``size(ts) >= 2`` guard matches the oracles' ``len(tokens) >= 2``
    filter (a 1-token doc must not emit a spurious single-token
    'bigram' via null-skipping concat).

    Tokenizes ONCE into a column: split() inlined in the transform
    lambda re-tokenizes the document per bigram element (the ~10x trap
    fixed in pipeline/curation._grams).
    """
    from flink_cookbook_spark.pipeline._cache import memo_persist

    def build() -> DataFrame:
        docs = load(spark, sf_dir, "documents")
        bi = (
            docs.select("doc_id", F.split("text", " ").alias("ts"))
            .where(F.size("ts") >= 2)
            .select(
                "doc_id",
                F.expr(
                    "transform(sequence(1, size(ts) - 1), "
                    "i -> concat(element_at(ts, i), ' ', element_at(ts, i + 1)))"
                ).alias("bigrams"),
            )
        )
        return bi.select("doc_id", F.explode("bigrams").alias("bigram"))

    return memo_persist(spark, "bigram_tokens", sf_dir, build)


def bigram_logprob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean bigram log-probability under the corpus's own
    bigram MLE model — the cheap statistical-LM fluency score (a
    perplexity filter without a neural model): for each adjacent token
    pair, ln P(w2 | w1) = ln c(w1,w2) - ln c(w1,*), averaged per doc.
    Low scores flag boilerplate-free but incoherent text; high scores
    flag repetitive/templated text — both ends get inspected before
    training.

    Scale shape: bigram extraction stays array-side (transform over
    sequence — no explode until counting); the two count tables join
    UNHINTED (the bigram vocabulary at web scale is larger than the
    unigram one — a forced broadcast would OOM; AQE broadcasts when
    genuinely small); the only corpus-sized shuffles are the two
    map-side-combinable count aggregates and the final per-doc average —
    the same explode -> groupBy shape as tf_idf.
    """
    # three consumers (bigram counts, start counts, the scoring join) —
    # materialized once per session like the shingle/minhash indexes
    exploded = _bigram_exploded(spark, sf_dir)
    big_counts = exploded.groupBy("bigram").agg(F.count("*").alias("c_bigram"))
    start_counts = (
        exploded.select(F.split_part("bigram", F.lit(" "), F.lit(1)).alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").alias("c_start"))
    )
    scored = (
        exploded.join(big_counts, "bigram")
        .withColumn("w1", F.split_part("bigram", F.lit(" "), F.lit(1)))
        .join(start_counts, "w1")
        .withColumn("lp", F.log(F.col("c_bigram").cast("double") / F.col("c_start")))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        rnd(F.avg("lp")).alias("mean_logprob"),
        rnd(F.min("lp")).alias("min_logprob"),
    )


register(
    "bigram_logprob_score",
    # split_part(bigram, ' ', 1) is w1 on both engines; DuckDB ln == Spark log.
    oracle="""
WITH bi AS (
  SELECT doc_id,
         list_transform(range(1, len(string_split(text, ' '))),
                        i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i + 1])
           AS bigrams
  FROM documents
  WHERE len(string_split(text, ' ')) >= 2
),
exploded AS (SELECT doc_id, unnest(bigrams) AS bigram FROM bi),
big_counts AS (SELECT bigram, count(*) AS c_bigram FROM exploded GROUP BY bigram),
start_counts AS (
  SELECT split_part(bigram, ' ', 1) AS w1, count(*) AS c_start
  FROM exploded GROUP BY 1
),
scored AS (
  SELECT e.doc_id, ln(CAST(b.c_bigram AS DOUBLE) / s.c_start) AS lp
  FROM exploded e
  JOIN big_counts b USING (bigram)
  JOIN start_counts s ON split_part(e.bigram, ' ', 1) = s.w1
)
SELECT doc_id, count(*) AS n_bigrams,
       round(avg(lp) + 1e-6, 4) AS mean_logprob,
       round(min(lp) + 1e-6, 4) AS min_logprob
FROM scored GROUP BY doc_id
""",
    tags=("text", "llm-pipeline", "language-model"),
)(bigram_logprob_score)


_DECILES = [round(0.1 * k, 1) for k in range(1, 10)]


def doc_length_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile-bucketed) length histogram: bucket = number
    of decile cutpoints strictly below the value.

    Deliberately NOT a global ntile() — that would sort the whole corpus
    into one partition. Instead: one exact-percentile aggregate computes
    9 cutpoints (tiny), which broadcast to a map-only bucket assignment,
    then a bounded-cardinality hash aggregate. Shuffle volume is 9
    doubles + 10 result rows regardless of corpus size.
    """
    docs = load(spark, sf_dir, "documents")
    cuts = docs.agg(
        F.expr(
            "percentile(CAST(n_chars AS DOUBLE), array("
            + ", ".join(str(d) for d in _DECILES)
            + "))"
        ).alias("cuts")
    )
    assigned = docs.crossJoin(F.broadcast(cuts)).select(
        "n_chars",
        F.aggregate(
            "cuts",
            F.lit(0),
            lambda acc, c: acc
            + F.when(F.col("n_chars").cast("double") > c, 1).otherwise(0),
        ).alias("bucket"),
    )
    return assigned.groupBy("bucket").agg(
        F.count("*").alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


register(
    "doc_length_equidepth",
    oracle=f"""
WITH cuts AS (
  SELECT quantile_cont(CAST(n_chars AS DOUBLE),
                       [{", ".join(str(d) for d in _DECILES)}]) AS c
  FROM documents
),
assigned AS (
  SELECT d.n_chars,
         CAST(len(list_filter(cuts.c, x -> x < CAST(d.n_chars AS DOUBLE)))
              AS INTEGER) AS bucket
  FROM documents d CROSS JOIN cuts
)
SELECT bucket,
       count(*) AS n_docs,
       min(n_chars) AS min_chars,
       max(n_chars) AS max_chars
FROM assigned GROUP BY 1
""",
    tags=("text", "llm-pipeline", "histogram"),
)(doc_length_equidepth)


_PROFILE_COLS = ("event_id", "ts", "user_id", "event_type", "value", "props")


def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level data profile of the events table: row count plus
    per-column null and exact distinct counts (the Deequ/"analyzer"
    intake report run before any pipeline is pointed at new data).

    One aggregate: Spark plans the multi-column count_distinct set via
    a single Expand + two-stage hash aggregate — map-side partials make
    the shuffled volume proportional to the distinct-value counts, not
    the row count.
    """
    ev = load(spark, sf_dir, "events")
    aggs = [F.count("*").alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs.append((F.count("*") - F.count(c)).alias(f"{c}_nulls"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"{c}_distinct"))
    return ev.agg(*aggs)


register(
    "table_profile",
    oracle="SELECT count(*) AS n_rows, "
    + ", ".join(
        f"count(*) - count({c}) AS {c}_nulls, "
        f"count(DISTINCT {c}) AS {c}_distinct"
        for c in _PROFILE_COLS
    )
    + " FROM events",
    tags=("profiling", "llm-pipeline"),
)(table_profile)


# --- chunking + mixture drift -------------------------------------------

CHUNK_TOKENS = 64  # tokens per training chunk
CHUNK_STRIDE = 48  # chunk start stride (16-token overlap)


def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-size chunking: each document becomes ceil-strided
    64-token windows with 16-token overlap — the context-window splitter
    that feeds sequence packing (``sequence_packing``) in a training-data
    pipeline. Chunk identity is the md5 of the joined token slice, so
    downstream chunk-level dedup composes directly.

    Map-only: tokenize once, explode the stride grid (bounded by each
    doc's own token count / stride), slice per start — zero shuffles, and
    at 100 TB the fan-out is rows x (len/stride), streamed through
    whole-stage codegen with nothing driver-side.
    """
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("ts"))
    starts = toks.select(
        "doc_id",
        "ts",
        F.explode(
            F.sequence(F.lit(0), F.size("ts") - 1, F.lit(CHUNK_STRIDE))
        ).alias("start"),
    )
    chunk = F.slice("ts", F.col("start") + 1, CHUNK_TOKENS)
    return starts.select(
        "doc_id",
        (F.col("start") / CHUNK_STRIDE).cast("int").alias("chunk_idx"),
        F.size(chunk).alias("n_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_hash"),
    )


register(
    "doc_chunking",
    oracle=f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
s AS (SELECT doc_id, ts, unnest(range(0, len(ts), {CHUNK_STRIDE})) AS start FROM t)
SELECT doc_id,
       CAST(start // {CHUNK_STRIDE} AS INTEGER) AS chunk_idx,
       CAST(len(ts[start + 1 : start + {CHUNK_TOKENS}]) AS INTEGER) AS n_tokens,
       md5(array_to_string(ts[start + 1 : start + {CHUNK_TOKENS}], ' ')) AS chunk_hash
FROM s
""",
    tags=("text", "llm-pipeline", "chunking"),
)(doc_chunking)


KL_BUCKET_CHARS = 50  # doc-length histogram bucket width for KL
KL_BUCKET_CAP = 10


def source_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KL divergence of the doc-length distribution vs the
    corpus — the mixture-drift monitor for multi-source training data
    (is src7 suddenly shipping only short docs?). KL(P_source || Q_corpus)
    over capped 50-char length buckets; Q covers every bucket P occupies
    (corpus includes the source), so the log is always finite.

    One hash aggregate to (source, bucket) counts — tiny from then on:
    the window normalizations and the KL sum run over at most
    sources x buckets rows regardless of corpus size.
    """
    docs = load(spark, sf_dir, "documents")
    c = (
        docs.select(
            "source",
            F.least(
                F.floor(F.col("n_chars") / KL_BUCKET_CHARS),
                F.lit(KL_BUCKET_CAP),
            ).alias("b"),
        )
        .groupBy("source", "b")
        .agg(F.count("*").alias("cnt"))
    )
    src_w = Window.partitionBy("source")
    bkt_w = Window.partitionBy("b")
    all_w = Window.partitionBy()
    terms = c.select(
        "source",
        (F.col("cnt") / F.sum("cnt").over(src_w)).alias("p"),
        (F.sum("cnt").over(bkt_w) / F.sum("cnt").over(all_w)).alias("q"),
        F.sum("cnt").over(src_w).alias("n_docs"),
    )
    return terms.groupBy("source").agg(
        F.max("n_docs").alias("n_docs"),
        rnd(F.sum(F.col("p") * F.log(F.col("p") / F.col("q"))), 6).alias("kl"),
    )


register(
    "source_kl_divergence",
    oracle=f"""
WITH c AS (
  SELECT source, least(n_chars // {KL_BUCKET_CHARS}, {KL_BUCKET_CAP}) AS b,
         count(*) AS cnt
  FROM documents GROUP BY 1, 2
),
terms AS (
  SELECT source,
         cnt / sum(cnt) OVER (PARTITION BY source) AS p,
         sum(cnt) OVER (PARTITION BY b) / sum(cnt) OVER () AS q,
         sum(cnt) OVER (PARTITION BY source) AS n_docs
  FROM c
)
SELECT source,
       CAST(max(n_docs) AS BIGINT) AS n_docs,
       round(sum(p * ln(p / q)) + 1e-6, 6) AS kl
FROM terms
GROUP BY source
""",
    tags=("text", "llm-pipeline", "mixture", "drift"),
)(source_kl_divergence)


PMI_MIN_COUNT = 3  # drop bigrams rarer than this before scoring


def collocation_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus collocations by pointwise mutual information: bigrams whose
    joint probability beats the independence assumption of their unigrams
    — the classic phrase-mining pass (multi-word entities, boilerplate
    idioms) that feeds tokenizer vocab decisions and boilerplate lists.

    PMI = ln( (c_xy / N_bi) / ((c_x / N_uni) * (c_y / N_uni) ) ), floored
    to bigrams seen >= PMI_MIN_COUNT times. Reuses the memoized exploded
    bigram stream (shared with ``bigram_logprob_score``). The unigram
    joins are deliberately UNHINTED: at web scale the whitespace
    vocabulary is 1e8-1e9 distinct strings (URLs, numbers, typos) — a
    forced broadcast would OOM every executor — while the probe side is
    already post-aggregate (surviving bigrams), so a shuffled hash join
    is corpus-independent; AQE still picks broadcast when the vocab is
    genuinely small. Only the two 1-row totals are broadcast.
    """
    exploded = _bigram_exploded(spark, sf_dir)
    docs = load(spark, sf_dir, "documents")
    uni = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c_uni"))
    )
    n_uni = uni.agg(F.sum("c_uni").alias("n_uni"))
    bc = (
        exploded.groupBy("bigram")
        .agg(F.count("*").alias("c_bigram"))
        .where(F.col("c_bigram") >= PMI_MIN_COUNT)
        .withColumn("w1", F.split_part("bigram", F.lit(" "), F.lit(1)))
        .withColumn("w2", F.split_part("bigram", F.lit(" "), F.lit(2)))
    )
    n_bi = exploded.agg(F.count("*").alias("n_bi"))
    u1 = uni.select(F.col("tok").alias("w1"), F.col("c_uni").alias("c_w1"))
    u2 = uni.select(F.col("tok").alias("w2"), F.col("c_uni").alias("c_w2"))
    pmi = F.log(
        (F.col("c_bigram") / F.col("n_bi"))
        / ((F.col("c_w1") / F.col("n_uni")) * (F.col("c_w2") / F.col("n_uni")))
    )
    return (
        bc.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
        # + 0.0 normalizes IEEE negative zero (DuckDB round() preserves
        # the sign of zero; Spark's doesn't — hash-relevant)
        .select("w1", "w2", "c_bigram", (rnd(pmi, 4) + F.lit(0.0)).alias("pmi"))
    )


register(
    "collocation_pmi",
    oracle=f"""
WITH bi AS (
  SELECT doc_id,
         list_transform(range(1, len(string_split(text, ' '))),
                        i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i + 1])
           AS bigrams
  FROM documents
  WHERE len(string_split(text, ' ')) >= 2
),
exploded AS (SELECT doc_id, unnest(bigrams) AS bigram FROM bi),
uni AS (
  SELECT tok, count(*) AS c_uni
  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY tok
),
totals AS (
  SELECT (SELECT sum(c_uni) FROM uni) AS n_uni,
         (SELECT count(*) FROM exploded) AS n_bi
),
bc AS (
  SELECT bigram, count(*) AS c_bigram,
         split_part(bigram, ' ', 1) AS w1,
         split_part(bigram, ' ', 2) AS w2
  FROM exploded GROUP BY bigram
  HAVING count(*) >= {PMI_MIN_COUNT}
)
SELECT b.w1, b.w2, b.c_bigram,
       round(ln((b.c_bigram * 1.0 / t.n_bi)
                / ((u1.c_uni * 1.0 / t.n_uni) * (u2.c_uni * 1.0 / t.n_uni))) + 1e-6, 4) + 0.0 AS pmi
FROM bc b
JOIN uni u1 ON b.w1 = u1.tok
JOIN uni u2 ON b.w2 = u2.tok
CROSS JOIN totals t
""",
    tags=("text", "llm-pipeline", "collocation", "pmi", "bench"),
)(collocation_pmi)


def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer fertility: subword (BPE-ish) tokens per
    whitespace word, with corpus-share context — THE metric for deciding
    whether a tokenizer under-serves a language (high fertility = more
    sequence length burned per word = worse effective context and higher
    training cost for that language).

    Rolls the per-document ``bpe_token_count`` signals up by ``lang``:
    one map pass (both token counts are array-side, no explode) + one
    combinable hash aggregate over languages.
    """
    docs = load(spark, sf_dir, "documents")
    bpe = F.regexp_extract_all("text", F.lit(BPE_ISH_PATTERN), 0)
    per_doc = docs.select(
        "lang",
        F.size(F.split("text", " ")).alias("n_ws"),
        F.size(bpe).alias("n_bpe"),
    )
    return per_doc.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_ws").alias("total_words"),
        F.sum("n_bpe").alias("total_bpe_tokens"),
        rnd(F.sum("n_bpe") / F.sum("n_ws"), 4).alias("fertility"),
    )


_BPE_SQL = BPE_ISH_PATTERN.replace("'", "''")  # SQL string-literal escaping

register(
    "tokenizer_fertility",
    oracle=rf"""
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_words,
       CAST(sum(len(regexp_extract_all(text, '{_BPE_SQL}'))) AS BIGINT) AS total_bpe_tokens,
       round(sum(len(regexp_extract_all(text, '{_BPE_SQL}'))) * 1.0
             / sum(len(string_split(text, ' '))) + 1e-6, 4) AS fertility
FROM documents
GROUP BY lang
""",
    tags=("text", "llm-pipeline", "tokenizer"),
)(tokenizer_fertility)


# --------------------------------------------------------------------------
# vocabulary growth (Heaps'-law curve)
# --------------------------------------------------------------------------

#: documents per growth checkpoint bucket.
VOCAB_BUCKET_DOCS = 50


def vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth (Heaps'-law) curve over the corpus in document
    order: cumulative distinct bigram types and cumulative bigram tokens
    at every ``VOCAB_BUCKET_DOCS``-document checkpoint.

    The corpus-health diagnostic behind tokenizer sizing and dedup QA: a
    curve that flattens early signals a boilerplate-heavy (or heavily
    duplicated) corpus; type growth that tracks Heaps' V ~ k*N^beta is
    healthy. Bigram types are used because the fixture's unigram
    vocabulary saturates in the first bucket.

    Scale shape: 'first occurrence' is a map-side-combinable MIN per
    type (one hash aggregate over the memoized bigram stream shared
    with ``bigram_logprob_score``/``collocation_pmi``); checkpoint
    counts are a second tiny aggregate; the cumulative window runs over
    n_docs/bucket rows, never over the corpus.
    """
    exploded = _bigram_exploded(spark, sf_dir)
    bucket = lambda c: F.floor(F.col(c) / VOCAB_BUCKET_DOCS).cast("long")  # noqa: E731
    firsts = exploded.groupBy("bigram").agg(F.min("doc_id").alias("first_doc"))
    new_types = firsts.groupBy(bucket("first_doc").alias("bucket")).agg(
        F.count("*").alias("new_types")
    )
    counts = exploded.groupBy(bucket("doc_id").alias("bucket")).agg(
        F.count("*").alias("n_bigrams")
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        counts.join(new_types, "bucket", "left")
        .select(
            "bucket",
            F.sum(F.coalesce("new_types", F.lit(0))).over(w).alias("vocab_size"),
            F.sum("n_bigrams").over(w).alias("cum_bigrams"),
        )
    )


register(
    "vocab_growth",
    oracle=f"""
WITH bi AS (
  SELECT doc_id,
         list_transform(range(1, len(string_split(text, ' '))),
                        i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i + 1])
           AS bigrams
  FROM documents
  WHERE len(string_split(text, ' ')) >= 2
),
exploded AS (SELECT doc_id, unnest(bigrams) AS bigram FROM bi),
firsts AS (SELECT bigram, min(doc_id) AS first_doc FROM exploded GROUP BY bigram),
new_types AS (
  SELECT CAST(floor(first_doc / {VOCAB_BUCKET_DOCS}) AS BIGINT) AS bucket,
         count(*) AS new_types
  FROM firsts GROUP BY 1
),
counts AS (
  SELECT CAST(floor(doc_id / {VOCAB_BUCKET_DOCS}) AS BIGINT) AS bucket,
         count(*) AS n_bigrams
  FROM exploded GROUP BY 1
)
SELECT c.bucket,
       CAST(sum(coalesce(n.new_types, 0)) OVER w AS BIGINT) AS vocab_size,
       CAST(sum(c.n_bigrams) OVER w AS BIGINT) AS cum_bigrams
FROM counts c LEFT JOIN new_types n USING (bucket)
WINDOW w AS (ORDER BY c.bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
    tags=("text", "llm-pipeline", "vocabulary"),
)(vocab_growth)


# --------------------------------------------------------------------------
# within-document repetition signals (Gopher/MassiveText "rep" rules)
# --------------------------------------------------------------------------


def repeated_ngram_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document n-gram repetition signals — the Gopher quality
    rules "fraction of duplicate n-grams" and "fraction covered by the
    most frequent n-gram": per document, the duplicate-bigram and
    duplicate-trigram fractions (1 - distinct/total) plus the share of
    bigram slots taken by the doc's single most repeated bigram.
    Template spam and keyword-stuffed pages spike all three while
    per-token stats look normal.

    Scale shape: trigram dup-frac stays entirely array-side
    (array_distinct in codegen — zero shuffle for that signal); the
    bigram signals ride the shared memoized bigram stream through ONE
    combinable two-level aggregate (doc x bigram counts -> per-doc
    max/sum) — no window, no join, no Python.
    """
    exploded = _bigram_exploded(spark, sf_dir)
    bi_stats = (
        exploded.groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_bigrams"),
            F.count("*").alias("n_distinct_bigrams"),
            F.max("c").alias("top_bigram_count"),
        )
    )
    docs = load(spark, sf_dir, "documents")
    tri = (
        docs.select("doc_id", F.split("text", " ").alias("ts"))
        .where(F.size("ts") >= 3)
        .select(
            "doc_id",
            F.expr(
                "transform(sequence(1, size(ts) - 2), "
                "i -> concat(ts[i - 1], ' ', ts[i], ' ', ts[i + 1]))"
            ).alias("tg"),
        )
        .select(
            "doc_id",
            F.size("tg").alias("n_trigrams"),
            F.size(F.array_distinct("tg")).alias("n_distinct_trigrams"),
        )
    )
    return bi_stats.join(tri, "doc_id").select(
        "doc_id",
        "n_bigrams",
        rnd(F.lit(1.0) - F.col("n_distinct_bigrams") / F.col("n_bigrams"), 4).alias(
            "dup_bigram_frac"
        ),
        rnd(
            F.lit(1.0) - F.col("n_distinct_trigrams") / F.col("n_trigrams"), 4
        ).alias("dup_trigram_frac"),
        rnd(F.col("top_bigram_count") / F.col("n_bigrams"), 4).alias(
            "top_bigram_share"
        ),
    )


register(
    "repeated_ngram_ratio",
    oracle="""
WITH bi AS (
  SELECT doc_id,
         list_transform(range(1, len(string_split(text, ' '))),
                        i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i + 1])
           AS bigrams
  FROM documents WHERE len(string_split(text, ' ')) >= 2
),
bc AS (
  SELECT doc_id, bigram, count(*) AS c
  FROM (SELECT doc_id, unnest(bigrams) AS bigram FROM bi)
  GROUP BY doc_id, bigram
),
bi_stats AS (
  SELECT doc_id,
         CAST(sum(c) AS BIGINT) AS n_bigrams,
         count(*) AS n_distinct_bigrams,
         max(c) AS top_bigram_count
  FROM bc GROUP BY doc_id
),
tri AS (
  SELECT doc_id,
         len(tg) AS n_trigrams,
         len(list_distinct(tg)) AS n_distinct_trigrams
  FROM (
    SELECT doc_id,
           list_transform(range(1, len(string_split(text, ' ')) - 1),
                          i -> string_split(text, ' ')[i] || ' ' ||
                               string_split(text, ' ')[i + 1] || ' ' ||
                               string_split(text, ' ')[i + 2]) AS tg
    FROM documents WHERE len(string_split(text, ' ')) >= 3
  )
)
SELECT b.doc_id,
       b.n_bigrams,
       round(1.0 - b.n_distinct_bigrams * 1.0 / b.n_bigrams + 1e-6, 4) AS dup_bigram_frac,
       round(1.0 - t.n_distinct_trigrams * 1.0 / t.n_trigrams + 1e-6, 4) AS dup_trigram_frac,
       round(b.top_bigram_count * 1.0 / b.n_bigrams + 1e-6, 4) AS top_bigram_share
FROM bi_stats b JOIN tri t USING (doc_id)
""",
    tags=("text", "llm-pipeline", "quality", "repetition"),
)(repeated_ngram_ratio)


# --------------------------------------------------------------------------
# tokenizer-training prep: BPE first-merge candidates
# --------------------------------------------------------------------------

BPE_TOP_PAIRS = 32


def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-pair-encoding merge candidates: corpus-wide frequencies of
    adjacent CHARACTER pairs inside tokens — exactly the statistic the
    first iteration of BPE tokenizer training maximizes (the most
    frequent pair becomes the first merge rule). Top BPE_TOP_PAIRS
    pairs, count-desc, pair-asc tie-break. The character-level
    counterpart of ``collocation_pmi`` (word-level) and the feeder for
    ``bpe_token_count``'s tokenizer.

    Scale shape: pair extraction is a zero-join map (token explode +
    array-side substring transform); counting is one map-side-combinable
    hash aggregate over a bounded key domain (alphabet², not corpus);
    the top-k is a TakeOrderedAndProject over that tiny aggregate.
    """
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok")).where(
        F.length("tok") >= 2
    )
    pairs = toks.select(
        F.explode(
            F.expr("transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("pair").asc())
        .limit(BPE_TOP_PAIRS)
    )


register(
    "bpe_merge_candidates",
    oracle=f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
),
pairs AS (
  SELECT unnest(list_transform(range(1, length(tok)), i -> substring(tok, i, 2))) AS pair
  FROM toks WHERE length(tok) >= 2
)
SELECT pair, count(*) AS n_occurrences
FROM pairs GROUP BY pair
ORDER BY n_occurrences DESC, pair ASC
LIMIT {BPE_TOP_PAIRS}
""",
    tags=("text", "llm-pipeline", "tokenizer", "bpe"),
)(bpe_merge_candidates)
