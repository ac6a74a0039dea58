"""Collection (array/map) function pack + unpivot + quantiles + subqueries.

Engine-scope surface beyond the reference (SURVEY.md section 2.2): the
fixture ``embeddings.embedding`` array column and string-split arrays
exercise the array family; maps are built inline (the record schemas have
none); unpivot is ``stack``; quantiles use exact interpolated percentile
(Spark ``percentile`` == DuckDB ``quantile_cont``) so they oracle-match,
unlike the sketch-based approx variants (tested separately).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_cookbook_spark.catalog import load
from flink_cookbook_spark.registry import register, rnd


def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array pack over embeddings: size/slice/contains-ish/sort/extrema
    plus higher-order transform/filter/aggregate."""
    emb = load(spark, sf_dir, "embeddings").withColumn(
        "e", F.col("embedding").cast("array<double>")
    )
    return emb.select(
        "vec_id",
        F.size("e").alias("dim"),
        rnd(F.element_at("e", 1), 6).alias("first_val"),
        rnd(F.element_at("e", -1), 6).alias("last_val"),
        rnd(F.array_max("e"), 6).alias("max_val"),
        rnd(F.array_min("e"), 6).alias("min_val"),
        F.size(F.slice("e", 1, 8)).alias("head_len"),
        F.size(F.expr("filter(e, x -> x > 0)")).alias("n_positive"),
        rnd(F.element_at(F.array_sort("e"), 32), 6).alias("median_low"),
        rnd(F.aggregate(F.expr("transform(e, x -> x * x)"), F.lit(0.0), lambda a, x: a + x), 6).alias(
            "sum_sq"
        ),
    )


register(
    "array_funcs",
    oracle="""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
SELECT vec_id,
       CAST(len(e) AS INTEGER) AS dim,
       round(e[1] + 1e-6, 6) AS first_val,
       round(e[-1] + 1e-6, 6) AS last_val,
       round(list_max(e) + 1e-6, 6) AS max_val,
       round(list_min(e) + 1e-6, 6) AS min_val,
       CAST(len(e[1:8]) AS INTEGER) AS head_len,
       CAST(len(list_filter(e, x -> x > 0)) AS INTEGER) AS n_positive,
       round(list_sort(e)[32] + 1e-6, 6) AS median_low,
       round(list_sum(list_transform(e, x -> x * x)) + 1e-6, 6) AS sum_sq
FROM emb
""",
    tags=("scalar", "array"),
)(array_funcs)


def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map pack: build a map inline from order fields, then key/value ops.
    (No map columns exist in the fixtures or the reference record schema —
    SURVEY.md section 1.2 — so the map is constructed, which is itself the
    map_from_entries surface.)"""
    o = load(spark, sf_dir, "orders")
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("priority"), F.col("o_orderpriority"),
    )
    return o.select(
        "o_orderkey",
        m.getItem("status").alias("status_val"),
        m.getItem("priority").alias("priority_val"),
        F.size(m).alias("n_keys"),
        F.array_join(F.map_keys(m), ",").alias("keys_joined"),
    )


register(
    "map_funcs",
    oracle="""
SELECT o_orderkey,
       m['status'][1] AS status_val,    -- DuckDB map subscript yields a list
       m['priority'][1] AS priority_val,
       CAST(cardinality(m) AS INTEGER) AS n_keys,
       array_to_string(map_keys(m), ',') AS keys_joined
FROM (SELECT o_orderkey,
             MAP {'status': o_orderstatus, 'priority': o_orderpriority} AS m
      FROM orders)
""",
    tags=("scalar", "map"),
)(map_funcs)


def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot via stack: lineitem's three charge components to
    (component, amount) rows."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(3, 'price', l_extendedprice, 'discount', l_discount, 'tax', l_tax)"
        ).alias("component", "amount_raw"),
    ).select(
        "l_orderkey", "l_linenumber", "component", rnd("amount_raw", 4).alias("amount")
    )


register(
    "unpivot_stack",
    oracle="""
SELECT l_orderkey, l_linenumber, component, round(amount_raw + 1e-6, 4) AS amount
FROM (
  SELECT l_orderkey, l_linenumber, 'price' AS component, l_extendedprice AS amount_raw FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem
)
""",
    tags=("unpivot",),
)(unpivot_stack)


#: percentiles computed by ``exact_quantiles`` (name -> p).
_EXACT_QUANTILE_PS = {"p50": 0.5, "p90": 0.9, "p99": 0.99}


def grouped_exact_percentiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    ps: dict[str, float],
) -> DataFrame:
    """Exact interpolated percentiles per group as a DISTRIBUTED
    two-pass order statistic — same semantics as Spark ``percentile`` /
    DuckDB ``quantile_cont`` (linear interpolation at fractional rank
    h = p*(n-1) over the sorted non-null set), WITHOUT the
    value-buffering aggregation state that makes Spark's exact
    ``percentile`` a scale-killer (its serialized partials grow with
    distinct values per group PER PARTITION and took down the 30x-probe
    JVM at 18M 97%-distinct lineitem prices — PERF.md round-10/11).

    Shape (memory bounded by distinct values per group everywhere):

    1. counts per (group, value) — one row per DISTINCT value;
    2. cumulative counts via a per-group ordered window (a sort over
       the distinct values only, which spills rather than OOMs);
    3. per-group non-null totals n -> the bracketing 1-indexed ranks
       lo = floor(h)+1 and lo+1 per percentile, broadcast back
       (groups x percentiles rows — tiny);
    4. order statistic r == MIN value whose cumulative count reaches r,
       as conditional MINs in one bounded aggregate, then interpolate
       v_lo + frac*(v_hi - v_lo) exactly as DuckDB does.

    Returns one row per group with an UNROUNDED double column per name
    in ``ps`` (callers apply ``rnd``). NULL values are ignored like the
    builtin; groups whose values are ALL null are dropped (the builtin
    would emit them with NULL percentiles — callers needing those rows
    must re-join the group list). Interpolation evaluates
    lo + frac*(hi - lo) (DuckDB's expression); Spark's Percentile uses
    lo*(1-frac) + hi*frac, which can differ by an ulp.
    """
    from pyspark.sql import Window

    gcols = list(group_cols) or ["_g"]
    if not group_cols:
        df = df.withColumn("_g", F.lit(1))
    vals = df.select(*gcols, value_col).where(F.col(value_col).isNotNull())
    vc = vals.groupBy(*gcols, value_col).agg(F.count("*").alias("cnt"))
    w = Window.partitionBy(*gcols).orderBy(value_col)
    cum = vc.withColumn("cum", F.sum("cnt").over(w))
    # per-group totals as a SECOND raw-scan aggregate, deliberately:
    # deriving n from vc (sum of cnt) reads as cheaper but Spark plans
    # the unpersisted vc subtree TWICE without exchange reuse — measured
    # 2 scans + 4 exchanges and ~10% slower warm than this shape's
    # 2 scans + 3 exchanges (the rescan is one pruned column with
    # map-side partial count; the duplicated (group, value) aggregate
    # is the expensive branch)
    targets = vals.groupBy(*gcols).agg(F.count("*").alias("n"))
    target_cols = [F.col(c) for c in gcols]
    for name, p in ps.items():
        h = F.lit(p) * (F.col("n") - 1).cast("double")
        target_cols.append(h.alias(f"_h_{name}"))
        target_cols.append((F.floor(h) + 1).alias(f"_lo_{name}"))
    targets = targets.select(*target_cols)
    j = cum.join(F.broadcast(targets), gcols)
    aggs = []
    for name in ps:
        lo_rank = F.col(f"_lo_{name}")
        aggs.append(
            F.min(F.when(F.col("cum") >= lo_rank, F.col(value_col))).alias(
                f"_vlo_{name}"
            )
        )
        aggs.append(
            F.min(F.when(F.col("cum") >= lo_rank + 1, F.col(value_col))).alias(
                f"_vhi_{name}"
            )
        )
        aggs.append(F.min(f"_h_{name}").alias(f"_h_{name}"))
    res = j.groupBy(*gcols).agg(*aggs)
    out = [] if not group_cols else [F.col(c) for c in group_cols]
    for name in ps:
        h, vlo = F.col(f"_h_{name}"), F.col(f"_vlo_{name}")
        vhi = F.coalesce(F.col(f"_vhi_{name}"), vlo)  # h integral at the top end
        frac = h - F.floor(h)
        out.append(F.when(frac == 0, vlo).otherwise(vlo + frac * (vhi - vlo)).alias(name))
    return res.select(*out)


def exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles per group via the distributed
    two-pass order statistic (``grouped_exact_percentiles`` — memory
    bounded by distinct values; no aggregate state grows with raw row
    count). Ref: src/flinkarima.py has no quantile op — this is
    engine-scope surface (SURVEY.md section 2.2)."""
    li = load(spark, sf_dir, "lineitem")
    res = grouped_exact_percentiles(
        li, ["l_returnflag"], "l_extendedprice", _EXACT_QUANTILE_PS
    )
    return res.select(
        "l_returnflag",
        *[rnd(F.col(name)).alias(name) for name in _EXACT_QUANTILE_PS],
    )


register(
    "exact_quantiles",
    oracle="""
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5) + 1e-6, 4) AS p50,
       round(quantile_cont(l_extendedprice, 0.9) + 1e-6, 4) AS p90,
       round(quantile_cont(l_extendedprice, 0.99) + 1e-6, 4) AS p99
FROM lineitem GROUP BY l_returnflag
""",
    tags=("agg", "quantile"),
)(exact_quantiles)


def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond rollup/cube): totals by (flag,
    status), by flag alone, and grand total — via SQL on a temp view so
    the construct itself is exercised."""
    li = load(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_li_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n_rows,
               round(sum(l_quantity) + 1e-6, 2) AS sum_qty,
               grouping(l_returnflag) + 2 * grouping(l_linestatus) AS gmask
        FROM _li_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


register(
    "grouping_sets_agg",
    oracle="""
SELECT l_returnflag, l_linestatus,
       count(*) AS n_rows,
       round(sum(l_quantity) + 1e-6, 2) AS sum_qty,
       CAST(GROUPING(l_returnflag) + 2 * GROUPING(l_linestatus) AS INTEGER) AS gmask
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
""",
    tags=("agg", "grouping-sets"),
)(grouping_sets_agg)


def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar + IN subqueries: orders above the global average price from
    customers in nations that have suppliers."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    supplier = load(spark, sf_dir, "supplier")
    orders.createOrReplaceTempView("_o_sub")
    customer.createOrReplaceTempView("_c_sub")
    supplier.createOrReplaceTempView("_s_sub")
    return spark.sql(
        """
        SELECT o_orderkey, round(o_totalprice + 1e-6, 2) AS total_price
        FROM _o_sub
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM _o_sub)
          AND o_custkey IN (SELECT c_custkey FROM _c_sub
                            WHERE c_nationkey IN (SELECT s_nationkey FROM _s_sub))
        """
    )


register(
    "scalar_subquery",
    oracle="""
SELECT o_orderkey, round(o_totalprice + 1e-6, 2) AS total_price
FROM orders
WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
  AND o_custkey IN (SELECT c_custkey FROM customer
                    WHERE c_nationkey IN (SELECT s_nationkey FROM supplier))
""",
    tags=("subquery",),
)(scalar_subquery)


def correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS with an aggregate-correlated predicate: customers
    whose most expensive order exceeds 1.5x their average order."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("_o_corr")
    load(spark, sf_dir, "customer").createOrReplaceTempView("_c_corr")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM _c_corr
        WHERE EXISTS (
          SELECT 1 FROM _o_corr o1
          WHERE o1.o_custkey = c_custkey
            AND o1.o_totalprice > 1.5 * (SELECT avg(o2.o_totalprice) FROM _o_corr o2
                                         WHERE o2.o_custkey = o1.o_custkey)
        )
        """
    )


register(
    "correlated_exists",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders o1
  WHERE o1.o_custkey = c_custkey
    AND o1.o_totalprice > 1.5 * (SELECT avg(o2.o_totalprice) FROM orders o2
                                 WHERE o2.o_custkey = o1.o_custkey)
)
""",
    tags=("subquery",),
)(correlated_exists)


def nested_explode_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outer-explode semantics pack: ``explode_outer`` / ``posexplode_outer``
    must emit a NULL row for an empty (or null) collection where plain
    explode silently DROPS the parent row — the lateral-view corner that
    loses data when ingest encounters empty arrays. Arrays here are
    derived so every fourth event has an empty one; the aggregate
    separates kept-by-outer null rows from element rows, proving the
    semantics rather than sampling them.
    """
    ev = load(spark, sf_dir, "events")
    arr = F.expr(
        "CASE WHEN event_id % 4 = 0 THEN CAST(array() AS array<bigint>) "
        "ELSE sequence(1, event_id % 4) END"
    )
    exploded = ev.select(
        "event_type", F.col("event_id"), F.posexplode_outer(arr).alias("pos", "x")
    )
    return exploded.groupBy("event_type").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("x").isNull().cast("long")).alias("n_null_rows"),
        F.sum(F.coalesce("x", F.lit(0))).alias("sum_elements"),
        F.sum(F.coalesce("pos", F.lit(-1))).alias("sum_pos"),
        F.countDistinct("event_id").alias("n_parents"),
    )


register(
    "nested_explode_funcs",
    oracle="""
WITH arr AS (
  SELECT event_type, event_id,
         CASE WHEN event_id % 4 = 0 THEN []::BIGINT[]
              ELSE range(1, event_id % 4 + 1) END AS a
  FROM events
),
-- outer-unnest emulation: an empty array contributes one NULL element
exploded AS (
  SELECT event_type, event_id,
         unnest(CASE WHEN len(a) = 0 THEN [NULL]::BIGINT[] ELSE a END) AS x,
         unnest(CASE WHEN len(a) = 0 THEN [NULL]::BIGINT[]
                     ELSE range(0, len(a)) END) AS pos
  FROM arr
)
SELECT event_type,
       count(*) AS n_rows,
       CAST(sum(CASE WHEN x IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_rows,
       CAST(sum(coalesce(x, 0)) AS BIGINT) AS sum_elements,
       CAST(sum(coalesce(pos, -1)) AS BIGINT) AS sum_pos,
       count(DISTINCT event_id) AS n_parents
FROM exploded
GROUP BY event_type
""",
    tags=("functions", "explode", "lateral"),
)(nested_explode_funcs)
