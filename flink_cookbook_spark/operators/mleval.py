"""Model-evaluation operators: calibration, threshold sweeps, CUPED.

The evaluation side of the engine's model surface: the engine already
trains simple models in-plan (``logistic_churn_baseline``), and this
round-8 change set adds ranking scores alongside it (the retrieval
family's ``retrieval_ndcg_mrr``); this module adds the three
classifier/experiment evaluation tables every ML platform materializes:

- ``calibration_report`` — reliability diagram bins + ECE
  contributions + per-bin Brier mass for a closed-form probabilistic
  scorer over ``events``;
- ``roc_threshold_sweep`` — confusion counts and P/R/F1 at the nine
  decile thresholds, computed from a 10-row binned histogram (ONE
  corpus pass; the threshold fan-out touches only the bounded bins,
  never the events);
- ``cuped_adjusted_lift`` — the standard variance-reduction estimator
  for online experiments: theta = cov(pre, post)/var(pre), adjusted
  metric ``post - theta * (pre - mean(pre))``, with the A/B split from
  the repo's deterministic md5 coin so both engines assign identical
  groups.

Scorer/label construction (deterministic, both engines): the predicted
probability is the closed-form sigmoid p = 1/(1+exp(-(value-50)/10))
and the label is ``value > 55`` — correlated but not degenerate, so the
reliability curve, confusion counts, and CUPED theta are all
non-trivial. Floating-point posture: p is a smooth function of a
continuous metric, so decile-bin boundary flips from last-ulp exp()
divergence are measure-zero (ARCHITECTURE.md round-7 rules); every
reported float is tie-stable-rounded via ``registry.rnd``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_cookbook_spark.catalog import load
from flink_cookbook_spark.registry import NUDGE, register, rnd

#: label threshold and sigmoid scale/center for the deterministic scorer.
SCORE_CENTER = 50.0
SCORE_SCALE = 10.0
LABEL_MIN = 55.0
#: number of reliability-diagram bins (= 1/width); thresholds sweep the
#: interior bin boundaries.
N_BINS = 10

#: Spark-side scorer/label expressions (SQL twins inline in oracles).
#: Functions, not module-level Columns: classic PySpark Column algebra
#: needs an active SparkContext, and this module must import cleanly
#: before any session exists (registry._ensure_loaded at cold start).
def _p():
    return 1.0 / (1.0 + F.exp(-(F.col("value") - SCORE_CENTER) / SCORE_SCALE))


def _y():
    return (F.col("value") > LABEL_MIN).cast("int")


_P_SQL = f"1.0 / (1.0 + exp(-(value - {SCORE_CENTER}) / {SCORE_SCALE}))"
_Y_SQL = f"CASE WHEN value > {LABEL_MIN} THEN 1 ELSE 0 END"


def _binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bounded reliability histogram: per decile bin of p, the
    event count, positive count, and p/brier sums. 10 rows out of any
    corpus size — every downstream eval table derives from this."""
    ev = load(spark, sf_dir, "events")
    b = F.least(F.floor(_p() * N_BINS), F.lit(N_BINS - 1)).cast("long")
    return (
        ev.select(
            b.alias("bin"),
            _p().alias("p"),
            _y().alias("y"),
        )
        .groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.sum("y").alias("n_pos"),
            F.sum("p").alias("p_sum"),
            F.sum((F.col("p") - F.col("y")) * (F.col("p") - F.col("y"))).alias(
                "brier_sum"
            ),
        )
    )


_BINNED_SQL = f"""
SELECT CAST(least(floor(({_P_SQL}) * {N_BINS}), {N_BINS - 1}) AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum({_Y_SQL}) AS BIGINT) AS n_pos,
       sum({_P_SQL}) AS p_sum,
       sum((({_P_SQL}) - ({_Y_SQL})) * (({_P_SQL}) - ({_Y_SQL}))) AS brier_sum
FROM events GROUP BY 1
"""


def calibration_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram: all ``N_BINS`` bins always emit (left join
    against the literal bin list — an empty bin is a zero row, never a
    missing row), with mean confidence, observed accuracy, |gap|, the
    bin's ECE contribution n/N * |acc - conf|, and its Brier mass.
    Summing the ece_part / brier_part columns reproduces the scalar
    ECE / Brier score exactly — the summary lives in the same table the
    diagram is drawn from."""
    hist = _binned(spark, sf_dir)
    bins = spark.range(N_BINS).select(F.col("id").cast("long").alias("bin"))
    total = hist.groupBy().agg(F.sum("n").alias("n_total"))
    conf = F.col("p_sum") / F.col("n")
    acc = F.col("n_pos").cast("double") / F.col("n")
    filled = (
        bins.join(hist, "bin", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "bin",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce("n_pos", F.lit(0)).alias("n_pos"),
            F.coalesce("p_sum", F.lit(0.0)).alias("p_sum"),
            F.coalesce("brier_sum", F.lit(0.0)).alias("brier_sum"),
            "n_total",
        )
    )
    nz = F.col("n") > 0
    return filled.select(
        "bin",
        "n",
        "n_pos",
        rnd(F.when(nz, conf).otherwise(0.0), 6).alias("conf"),
        rnd(F.when(nz, acc).otherwise(0.0), 6).alias("acc"),
        rnd(F.when(nz, F.abs(acc - conf)).otherwise(0.0), 6).alias("gap"),
        rnd(
            F.when(
                nz, F.col("n") / F.col("n_total") * F.abs(acc - conf)
            ).otherwise(0.0),
            6,
        ).alias("ece_part"),
        rnd(F.col("brier_sum") / F.col("n_total"), 6).alias("brier_part"),
    ).orderBy("bin")


register(
    "calibration_report",
    oracle=f"""
WITH hist AS ({_BINNED_SQL}),
bins AS (SELECT CAST(range AS BIGINT) AS bin FROM range({N_BINS})),
total AS (SELECT sum(n) AS n_total FROM hist),
filled AS (
  SELECT bins.bin,
         coalesce(hist.n, 0) AS n,
         coalesce(hist.n_pos, 0) AS n_pos,
         coalesce(hist.p_sum, 0.0) AS p_sum,
         coalesce(hist.brier_sum, 0.0) AS brier_sum,
         total.n_total
  FROM bins LEFT JOIN hist ON bins.bin = hist.bin CROSS JOIN total
)
SELECT bin,
       CAST(n AS BIGINT) AS n,
       CAST(n_pos AS BIGINT) AS n_pos,
       round(CASE WHEN n > 0 THEN p_sum / n ELSE 0.0 END + {NUDGE}, 6) AS conf,
       round(CASE WHEN n > 0 THEN CAST(n_pos AS DOUBLE) / n ELSE 0.0 END
             + {NUDGE}, 6) AS acc,
       round(CASE WHEN n > 0
             THEN abs(CAST(n_pos AS DOUBLE) / n - p_sum / n) ELSE 0.0 END
             + {NUDGE}, 6) AS gap,
       round(CASE WHEN n > 0
             THEN CAST(n AS DOUBLE) / n_total
                  * abs(CAST(n_pos AS DOUBLE) / n - p_sum / n)
             ELSE 0.0 END + {NUDGE}, 6) AS ece_part,
       round(brier_sum / n_total + {NUDGE}, 6) AS brier_part
FROM filled
""",
    tags=("mleval",),
)(calibration_report)


def roc_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion counts + precision/recall/F1 at each decile threshold
    t = k/10, k = 1..9 — always nine rows. Because thresholds sit
    exactly on the bin boundaries, ``predicted positive at t`` is
    ``bin >= k`` on the 10-row histogram: the corpus is touched ONCE,
    the 9x fan-out multiplies a constant-size aggregate."""
    hist = _binned(spark, sf_dir)
    ks = spark.range(1, N_BINS).select(F.col("id").cast("long").alias("k"))
    joined = F.broadcast(ks).crossJoin(hist)
    pos = F.col("bin") >= F.col("k")
    agg = joined.groupBy("k").agg(
        F.sum(F.when(pos, F.col("n_pos")).otherwise(0)).alias("tp"),
        F.sum(F.when(pos, F.col("n") - F.col("n_pos")).otherwise(0)).alias(
            "fp"
        ),
        F.sum(F.when(~pos, F.col("n_pos")).otherwise(0)).alias("fn"),
        F.sum(F.when(~pos, F.col("n") - F.col("n_pos")).otherwise(0)).alias(
            "tn"
        ),
    )
    prec = F.when(
        F.col("tp") + F.col("fp") > 0,
        F.col("tp").cast("double") / (F.col("tp") + F.col("fp")),
    ).otherwise(0.0)
    rec = F.when(
        F.col("tp") + F.col("fn") > 0,
        F.col("tp").cast("double") / (F.col("tp") + F.col("fn")),
    ).otherwise(0.0)
    f1 = F.when(prec + rec > 0, 2 * prec * rec / (prec + rec)).otherwise(0.0)
    return agg.select(
        rnd(F.col("k").cast("double") / N_BINS, 2).alias("threshold"),
        "tp",
        "fp",
        "fn",
        "tn",
        rnd(prec, 6).alias("precision"),
        rnd(rec, 6).alias("recall"),
        rnd(f1, 6).alias("f1"),
    )


register(
    "roc_threshold_sweep",
    oracle=f"""
WITH hist AS ({_BINNED_SQL}),
ks AS (SELECT CAST(range AS BIGINT) AS k FROM range(1, {N_BINS})),
agg AS (
  SELECT k,
         CAST(sum(CASE WHEN bin >= k THEN n_pos ELSE 0 END) AS BIGINT) AS tp,
         CAST(sum(CASE WHEN bin >= k THEN n - n_pos ELSE 0 END) AS BIGINT) AS fp,
         CAST(sum(CASE WHEN bin < k THEN n_pos ELSE 0 END) AS BIGINT) AS fn,
         CAST(sum(CASE WHEN bin < k THEN n - n_pos ELSE 0 END) AS BIGINT) AS tn
  FROM ks CROSS JOIN hist GROUP BY k
),
rates AS (
  SELECT k, tp, fp, fn, tn,
         CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / (tp + fp)
              ELSE 0.0 END AS prec,
         CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / (tp + fn)
              ELSE 0.0 END AS rec
  FROM agg
)
SELECT round(CAST(k AS DOUBLE) / {N_BINS} + {NUDGE}, 2) AS threshold,
       tp, fp, fn, tn,
       round(prec + {NUDGE}, 6) AS precision,
       round(rec + {NUDGE}, 6) AS recall,
       round(CASE WHEN prec + rec > 0 THEN 2 * prec * rec / (prec + rec)
             ELSE 0.0 END + {NUDGE}, 6) AS f1
FROM rates
""",
    tags=("mleval",),
)(roc_threshold_sweep)


#: CUPED period split (epoch seconds): the fixture month's first 14
#: days are the pre-period, the rest the experiment period.
CUPED_SPLIT_S = 1704067200 + 14 * 86400


def cuped_adjusted_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction for an A/B readout: per-user pre/post
    mean metric, deterministic md5-coin group assignment, pooled
    theta = cov(pre, post) / var(pre), adjusted metric
    ``post - theta * (pre - mean(pre))``. One row: group means raw and
    adjusted, both lifts, and the variance-reduction ratio the method
    exists for. Only users observed in BOTH periods enter (the standard
    CUPED cohort — theta is undefined for users without a pre-period).
    Scale: two keyed aggregates + moment aggregates; the user-level
    frame is one shuffle on user_id; every reduction after that is a
    1-row aggregate."""
    ev = load(spark, sf_dir, "events")
    sec = F.col("ts").cast("double")
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.avg(F.when(sec < CUPED_SPLIT_S, F.col("value"))).alias("pre"),
            F.avg(
                F.when(sec >= CUPED_SPLIT_S, F.col("value"))
            ).alias("post"),
        )
        .where(F.col("pre").isNotNull() & F.col("post").isNotNull())
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("cuped:"), F.col("user_id").cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    users = per_user.select(
        "user_id",
        "pre",
        "post",
        F.when(h % 2 == 0, F.lit("A")).otherwise(F.lit("B")).alias("grp"),
    )
    moments = users.groupBy().agg(
        F.count("*").alias("n_users"),
        F.covar_pop("pre", "post").alias("cov_pp"),
        F.var_pop("pre").alias("var_pre"),
        F.avg("pre").alias("mean_pre"),
        F.var_pop("post").alias("var_post"),
    )
    adj = (
        users.crossJoin(F.broadcast(moments))
        .select(
            "grp",
            "post",
            (
                F.col("post")
                - (F.col("cov_pp") / F.col("var_pre"))
                * (F.col("pre") - F.col("mean_pre"))
            ).alias("post_adj"),
            "n_users",
            "cov_pp",
            "var_pre",
            "var_post",
        )
    )
    return adj.groupBy().agg(
        F.max("n_users").alias("n_users"),
        rnd(F.max(F.col("cov_pp") / F.col("var_pre")), 6).alias("theta"),
        rnd(F.avg(F.when(F.col("grp") == "A", F.col("post"))), 6).alias(
            "mean_a_raw"
        ),
        rnd(F.avg(F.when(F.col("grp") == "B", F.col("post"))), 6).alias(
            "mean_b_raw"
        ),
        rnd(
            F.avg(F.when(F.col("grp") == "B", F.col("post")))
            - F.avg(F.when(F.col("grp") == "A", F.col("post"))),
            6,
        ).alias("lift_raw"),
        rnd(
            F.avg(F.when(F.col("grp") == "B", F.col("post_adj")))
            - F.avg(F.when(F.col("grp") == "A", F.col("post_adj"))),
            6,
        ).alias("lift_adj"),
        rnd(F.max("var_post"), 6).alias("var_post"),
        rnd(F.var_pop("post_adj"), 6).alias("var_adj"),
        rnd(1 - F.var_pop("post_adj") / F.max("var_post"), 6).alias(
            "var_reduction"
        ),
    )


register(
    "cuped_adjusted_lift",
    oracle=f"""
WITH per_user AS (
  SELECT user_id,
         avg(CASE WHEN epoch(ts) < {CUPED_SPLIT_S} THEN value END) AS pre,
         avg(CASE WHEN epoch(ts) >= {CUPED_SPLIT_S} THEN value END) AS post
  FROM events GROUP BY user_id
),
cohort AS (
  SELECT user_id, pre, post,
         CASE WHEN (CAST('0x' || substr(
                md5('cuped:' || CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT)
                % 2) = 0 THEN 'A' ELSE 'B' END AS grp
  FROM per_user WHERE pre IS NOT NULL AND post IS NOT NULL
),
moments AS (
  SELECT count(*) AS n_users,
         covar_pop(pre, post) AS cov_pp,
         var_pop(pre) AS var_pre,
         avg(pre) AS mean_pre,
         var_pop(post) AS var_post
  FROM cohort
),
adj AS (
  SELECT grp, post,
         post - (cov_pp / var_pre) * (pre - mean_pre) AS post_adj,
         n_users, cov_pp, var_pre, var_post
  FROM cohort CROSS JOIN moments
)
SELECT CAST(max(n_users) AS BIGINT) AS n_users,
       round(max(cov_pp / var_pre) + {NUDGE}, 6) AS theta,
       round(avg(CASE WHEN grp = 'A' THEN post END) + {NUDGE}, 6) AS mean_a_raw,
       round(avg(CASE WHEN grp = 'B' THEN post END) + {NUDGE}, 6) AS mean_b_raw,
       round(avg(CASE WHEN grp = 'B' THEN post END)
             - avg(CASE WHEN grp = 'A' THEN post END) + {NUDGE}, 6) AS lift_raw,
       round(avg(CASE WHEN grp = 'B' THEN post_adj END)
             - avg(CASE WHEN grp = 'A' THEN post_adj END) + {NUDGE}, 6)
         AS lift_adj,
       round(max(var_post) + {NUDGE}, 6) AS var_post,
       round(var_pop(post_adj) + {NUDGE}, 6) AS var_adj,
       round(1 - var_pop(post_adj) / max(var_post) + {NUDGE}, 6)
         AS var_reduction
FROM adj
""",
    tags=("mleval", "experiment"),
)(cuped_adjusted_lift)
