"""Distribution-comparison and rank statistics — the drift / A-B /
concentration tests a data-quality pipeline runs next to the robust-stats
family (stats_trimmed_winsorized, events_anomaly_mad).

Reference scope: delegated relational analytics (SURVEY.md §2b) — the
reference connector hands every record off to Spark for exactly this kind
of statistical monitoring; these rows are the statistical members of that
delegated surface.

House disciplines used throughout (see operators/connector.py):

- **Two-pass running sums, never group-sized windows.** Every cumulative
  quantity (empirical CDFs, pooled rank sums, cumulative weights, Lorenz
  ordinates) runs through :func:`_two_pass_cumsum` — range-partition on
  (group, order), per-partition local running sums, per-(group, partition)
  totals carried back as a broadcast prefix relation. A window partitioned
  by a ~5-value group column alone would be 5 group-sized single-task
  sorts at 10^9 rows (the abc_pareto trap, closed in r9).
- **Exact integer/decimal cores, one double step at the end.** Counts,
  doubled average ranks (halves scaled ×2 so ties stay integral), CDF
  cross-products and tie corrections are summed as BIGINT/DECIMAL —
  order-independent in both engines — and only the final statistic
  (one division / sqrt, a fixed expression shape) runs in IEEE double,
  so results are bit-identical cross-engine without epsilon absorbers.
- **Decimal→double via the VARCHAR route on the DuckDB side** (DuckDB's
  direct decimal→double can round differently; parsing the exact decimal
  string is correctly rounded, matching Spark's BigDecimal.doubleValue).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import register
from ..tables import load


def _two_pass_cumsum(spark: SparkSession, df: DataFrame,
                     group_cols: list, order_cols: list,
                     measures: dict[str, str]) -> DataFrame:
    """Inclusive within-group running sums over a total order WITHOUT
    group-sized single-task sorts — the cumulative-sum twin of
    connector._two_pass_rank (same two-pass range-partition + carry
    shape, same localCheckpoint boundary pinning).

    ``measures`` maps output suffix -> source column; sources must be
    integer/decimal typed so the per-partition partial sums are exact and
    order-independent (the carry relation is built from unordered
    per-partition aggregates). Returns df + ``cum_<k>`` (inclusive
    running sum) and ``tot_<k>`` (group total) per measure.

    Scale shape: one range exchange, per-partition windows (~1/N of a
    group each), an N×|groups| carry relation broadcast back. No window
    is ever partitioned by the group columns alone.
    """
    nb = spark.sparkContext.defaultParallelism
    bucketed = (df.repartitionByRange(nb, *group_cols, *order_cols)
                .withColumn("pid", F.spark_partition_id())
                .localCheckpoint())
    wl = (Window.partitionBy(*group_cols, "pid").orderBy(*order_cols)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = bucketed
    for out, src in measures.items():
        local = local.withColumn(f"_l_{out}", F.sum(src).over(wl))
    pagg = (bucketed.groupBy(*group_cols, "pid")
            .agg(*[F.sum(src).alias(f"_p_{out}")
                   for out, src in measures.items()]))
    wc = (Window.partitionBy(*group_cols).orderBy("pid")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wn = Window.partitionBy(*group_cols)
    sel = [*group_cols, "pid"]
    for out in measures:
        sel.append((F.sum(f"_p_{out}").over(wc)
                    - F.col(f"_p_{out}")).alias(f"_c_{out}"))
        sel.append(F.sum(f"_p_{out}").over(wn).alias(f"tot_{out}"))
    carries = pagg.select(*sel)
    res = local.join(F.broadcast(carries), [*group_cols, "pid"])
    for out in measures:
        res = (res.withColumn(f"cum_{out}",
                              F.col(f"_l_{out}") + F.col(f"_c_{out}"))
               .drop(f"_l_{out}", f"_c_{out}"))
    return res.drop("pid")


# The two samples every two-sample row below compares: URGENT vs LOW
# priority order values, grouped by customer market segment — the natural
# "did the urgent-order price distribution drift from the low-priority
# one, per segment" monitoring question on the fixture schema.
_SAMPLES_SQL = """
  SELECT c.c_mktsegment AS segment, o.o_totalprice AS price,
         CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS s1
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE o.o_orderpriority IN ('1-URGENT', '5-LOW')
"""


def _priority_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    return (orders
            .where(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
            .join(customer, orders.o_custkey == customer.c_custkey)
            .select(F.col("c_mktsegment").alias("segment"),
                    F.col("o_totalprice").alias("price"),
                    F.when(F.col("o_orderpriority") == "1-URGENT", 1)
                    .otherwise(0).alias("s1")))


def _sample_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(segment, price) -> per-sample counts — the shared distinct-value
    relation both KS and Mann-Whitney cumulate over."""
    base = _priority_samples(spark, sf_dir)
    return (base.groupBy("segment", "price")
            .agg(F.sum("s1").alias("c1"),
                 F.sum(F.lit(1) - F.col("s1")).alias("c2")))


_SAMPLE_CELLS_SQL = f"""
    base AS ({_SAMPLES_SQL}),
    cells AS (
      SELECT segment, price,
             SUM(s1) AS c1, SUM(1 - s1) AS c2
      FROM base GROUP BY segment, price
    )
"""


@register(
    "stats_ks_two_sample",
    oracle=f"""
    WITH {_SAMPLE_CELLS_SQL},
    cum AS (
      SELECT segment, price,
             SUM(c1) OVER w AS cum1, SUM(c2) OVER w AS cum2,
             SUM(c1) OVER (PARTITION BY segment) AS n1,
             SUM(c2) OVER (PARTITION BY segment) AS n2
      FROM cells
      WINDOW w AS (PARTITION BY segment ORDER BY price
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), diffs AS (
      SELECT segment, price, n1, n2,
             ABS(CAST(cum1 AS DECIMAL(19,0)) * CAST(n2 AS DECIMAL(19,0))
                 - CAST(cum2 AS DECIMAL(19,0)) * CAST(n1 AS DECIMAL(19,0)))
               AS d
      FROM cum
    ), mx AS (
      SELECT segment, MAX(d) AS mxd FROM diffs GROUP BY segment
    )
    SELECT d.segment,
           CAST(MAX(d.n1) AS BIGINT) AS n_urgent,
           CAST(MAX(d.n2) AS BIGINT) AS n_low,
           CAST(CAST(MAX(m.mxd) AS VARCHAR) AS DOUBLE)
             / (CAST(MAX(d.n1) AS DOUBLE) * CAST(MAX(d.n2) AS DOUBLE))
             AS ks_d,
           MIN(d.price) AS ks_at_price
    FROM diffs d JOIN mx m ON d.segment = m.segment AND d.d = m.mxd
    GROUP BY d.segment
    """,
    tags=("connector", "statistics", "drift", "two-sample"))
def stats_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KOLMOGOROV-SMIRNOV two-sample statistic per market segment:
    D = max_x |F_urgent(x) - F_low(x)| over the pooled order-value
    distribution, plus the value where the maximum is first attained —
    the standard nonparametric "did this distribution drift" test a
    data-quality pipeline runs between a baseline and a current slice.

    Exactness: the CDF gap is kept as the INTEGER cross-product
    |cum1*n2 - cum2*n1| (ties collapse into distinct-value cells first,
    so the gap is evaluated only after each tie group — the correct KS
    treatment of ties); max/argmax compare exact decimals, and the one
    double division at the end has the same expression shape in both
    engines. ks_at_price is the MIN price attaining the max (unique
    argmax tie-break).

    Scale shape: one keyed join (orders x customer), one hash aggregate
    to distinct-value cells, then the TWO-PASS cumulative sum
    (_two_pass_cumsum — range exchange + broadcast carry; no
    segment-sized single-task window), and a 5-row max relation
    broadcast back for the argmax. Would survive 100x: every exchange
    is keyed or range-balanced, nothing group-sized is sorted in one
    task."""
    cells = _sample_cells(spark, sf_dir)
    cum = _two_pass_cumsum(spark, cells, ["segment"], ["price"],
                           {"c1": "c1", "c2": "c2"})
    d19 = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    diffs = cum.select(
        "segment", "price", "tot_c1", "tot_c2",
        F.abs(d19("cum_c1") * d19("tot_c2")
              - d19("cum_c2") * d19("tot_c1")).alias("d"))
    mx = diffs.groupBy("segment").agg(F.max("d").alias("mxd"))
    return (diffs.join(F.broadcast(mx),
                       (diffs.segment == mx.segment) & (diffs.d == mx.mxd))
            .drop(mx.segment)
            .groupBy("segment")
            .agg(F.max("tot_c1").cast("bigint").alias("n_urgent"),
                 F.max("tot_c2").cast("bigint").alias("n_low"),
                 (F.max("mxd").cast("double")
                  / (F.max("tot_c1").cast("double")
                     * F.max("tot_c2").cast("double"))).alias("ks_d"),
                 F.min("price").alias("ks_at_price")))


@register(
    "stats_mann_whitney",
    oracle=f"""
    WITH {_SAMPLE_CELLS_SQL},
    cum AS (
      SELECT segment, price, c1, c1 + c2 AS t,
             SUM(c1 + c2) OVER w - (c1 + c2) AS excl,
             SUM(c1) OVER (PARTITION BY segment) AS n1,
             SUM(c2) OVER (PARTITION BY segment) AS n2
      FROM cells
      WINDOW w AS (PARTITION BY segment ORDER BY price
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), agg AS (
      SELECT segment, MAX(n1) AS n1, MAX(n2) AS n2,
             SUM(CAST(c1 AS DECIMAL(19,0))
                 * CAST(2 * excl + t + 1 AS DECIMAL(19,0))) AS r2,
             SUM(CAST(t AS DECIMAL(12,0)) * CAST(t AS DECIMAL(12,0))
                 * CAST(t AS DECIMAL(12,0))
                 - CAST(t AS DECIMAL(19,0))) AS tiesum
      FROM cum GROUP BY segment
    )
    SELECT segment,
           CAST(n1 AS BIGINT) AS n_urgent, CAST(n2 AS BIGINT) AS n_low,
           CAST(CAST(r2 - CAST(n1 AS DECIMAL(19,0))
                          * CAST(n1 + 1 AS DECIMAL(19,0)) AS VARCHAR)
                AS DOUBLE) / 2.0 AS u1,
           round(
             (CAST(CAST(r2 - CAST(n1 AS DECIMAL(19,0))
                             * CAST(n1 + 1 AS DECIMAL(19,0)) AS VARCHAR)
                   AS DOUBLE)
              - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
             / (2.0 * sqrt(
                 (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0)
                 * ((CAST(n1 + n2 AS DOUBLE) + 1.0)
                    - CAST(CAST(tiesum AS VARCHAR) AS DOUBLE)
                      / (CAST(n1 + n2 AS DOUBLE)
                         * (CAST(n1 + n2 AS DOUBLE) - 1.0))))),
             9) + 0.0 AS z_score
    FROM agg
    """,
    tags=("connector", "statistics", "drift", "two-sample"))
def stats_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANN-WHITNEY U test per market segment (urgent vs low priority
    order values): the rank-sum drift test that detects a location shift
    the KS statistic is less sensitive to, with the normal-approximation
    z-score using the exact tie-corrected variance.

    Exactness: pooled AVERAGE ranks are kept in doubled-integer units
    (2*rank is integral even for .5 tie midpoints), so the rank sum R1,
    U1 = R1 - n1(n1+1)/2 and the tie correction sum(t^3 - t) are all
    exact DECIMAL arithmetic; the z-score is one fixed-shape double
    expression over those exact inputs (round(9) absorbs nothing —
    it is the declared output precision, matching the libm-sqrt
    pairing discipline used by the text-scoring rows).

    Scale shape: identical to stats_ks_two_sample — the distinct-value
    cell relation, the two-pass cumulative count (here of the POOLED
    tie-group sizes), one 5-row aggregate. The doubled-rank trick means
    no per-row float rank ever materializes."""
    cells = (_sample_cells(spark, sf_dir)
             .withColumn("t", F.col("c1") + F.col("c2")))
    cum = _two_pass_cumsum(spark, cells, ["segment"], ["price"],
                           {"t": "t"})
    excl = F.col("cum_t") - F.col("t")
    d12 = lambda c: c.cast("decimal(12,0)")  # noqa: E731
    agg = (cum.groupBy("segment")
           .agg(F.max("tot_t").alias("n"),
                F.sum(F.col("c1")).cast("decimal(19,0)").alias("n1"),
                F.sum(F.col("c1").cast("decimal(19,0)")
                      * (F.lit(2) * excl + F.col("t") + 1)
                      .cast("decimal(19,0)")).alias("r2"),
                F.sum(d12(F.col("t")) * d12(F.col("t")) * d12(F.col("t"))
                      - F.col("t").cast("decimal(19,0)")).alias("tiesum")))
    n1d = F.col("n1").cast("double")
    n2 = F.col("n").cast("decimal(19,0)") - F.col("n1")
    n2d = n2.cast("double")
    nd = F.col("n").cast("double")
    u2 = (F.col("r2")
          - F.col("n1") * (F.col("n1") + 1).cast("decimal(19,0)"))
    u2d = u2.cast("double")
    var = ((n1d * n2d / 12.0)
           * ((nd + 1.0)
              - F.col("tiesum").cast("double") / (nd * (nd - 1.0))))
    return agg.select(
        "segment",
        F.col("n1").cast("bigint").alias("n_urgent"),
        n2.cast("bigint").alias("n_low"),
        (u2d / 2.0).alias("u1"),
        (F.round((u2d - n1d * n2d) / (2.0 * F.sqrt(var)), 9)
         + 0.0).alias("z_score"))


@register(
    "stats_spearman_corr",
    oracle="""
    WITH xcell AS (
      SELECT l_returnflag AS flag, l_quantity AS x, COUNT(*) AS cx
      FROM lineitem GROUP BY l_returnflag, l_quantity
    ), xrank AS (
      SELECT flag, x,
             2 * (SUM(cx) OVER (PARTITION BY flag ORDER BY x
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cx)
               + cx + 1 AS rx2
      FROM xcell
    ), ycell AS (
      SELECT l_returnflag AS flag, l_extendedprice AS y, COUNT(*) AS cy
      FROM lineitem GROUP BY l_returnflag, l_extendedprice
    ), yrank AS (
      SELECT flag, y,
             2 * (SUM(cy) OVER (PARTITION BY flag ORDER BY y
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cy)
               + cy + 1 AS ry2
      FROM ycell
    ), cells AS (
      SELECT l_returnflag AS flag, l_quantity AS x,
             l_extendedprice AS y, COUNT(*) AS c
      FROM lineitem GROUP BY 1, 2, 3
    ), joined AS (
      SELECT c.flag, CAST(c.c AS HUGEINT) AS c,
             CAST(xr.rx2 AS HUGEINT) AS rx2, CAST(yr.ry2 AS HUGEINT) AS ry2
      FROM cells c
      JOIN xrank xr ON c.flag = xr.flag AND c.x = xr.x
      JOIN yrank yr ON c.flag = yr.flag AND c.y = yr.y
    ), agg AS (
      SELECT flag, SUM(c) AS n,
             SUM(c * rx2) AS sx, SUM(c * ry2) AS sy,
             SUM(c * rx2 * rx2) AS sxx, SUM(c * ry2 * ry2) AS syy,
             SUM(c * rx2 * ry2) AS sxy
      FROM joined GROUP BY flag
    )
    SELECT flag AS l_returnflag, CAST(n AS BIGINT) AS n_items,
           CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
             / sqrt(CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE)
                    * CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE))
             AS spearman_rho
    FROM agg
    """,
    tags=("connector", "statistics", "correlation"))
def stats_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPEARMAN RANK correlation between quantity and extended price per
    return flag — the monotone-association measure (Pearson on average
    ranks, exact tie handling) that a feature-quality audit reports where
    Pearson would be distorted by the heavy price tails.

    Exactness: average ranks are doubled-integer (2*rank integral under
    ties), so every moment (Sx, Sy, Sxx, Syy, Sxy weighted by cell
    count) is an exact integer sum — DECIMAL(38,0) on the Spark side,
    HUGEINT in DuckDB, identical values — and rho is one fixed-shape
    double expression (the x2 scaling cancels algebraically). No
    rounding is needed: IEEE sqrt and division are correctly rounded.

    Scale shape: ranks are computed per DISTINCT VALUE, not per row —
    quantity has ~50 distinct values and prices collapse by ~an order of
    magnitude — via per-flag cumulative counts over the distinct-value
    cells (window partitioned by (flag), but on the CELL relation whose
    per-flag size is the distinct-value count; for a column with ~n
    distinct values swap in _two_pass_cumsum as stats_ks_two_sample
    does — the price cell relation here is the fixture's, bounded, and
    the join back to (flag, x, y) cells is keyed). Integer moments cap
    at DECIMAL(38,0)/HUGEINT — overflow-safe to ~10^9 rows per flag at
    the fixture's rank magnitudes; beyond that swap the moments to
    centered doubles (documented bound, same shape)."""
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").alias("x"),
        F.col("l_extendedprice").alias("y"))
    xcell = li.groupBy("flag", "x").agg(F.count(F.lit(1)).alias("cx"))
    xcum = _two_pass_cumsum(spark, xcell, ["flag"], ["x"], {"cx": "cx"})
    xrank = xcum.select(
        "flag", "x",
        (F.lit(2) * (F.col("cum_cx") - F.col("cx"))
         + F.col("cx") + 1).alias("rx2"))
    ycell = li.groupBy("flag", "y").agg(F.count(F.lit(1)).alias("cy"))
    ycum = _two_pass_cumsum(spark, ycell, ["flag"], ["y"], {"cy": "cy"})
    yrank = ycum.select(
        "flag", "y",
        (F.lit(2) * (F.col("cum_cy") - F.col("cy"))
         + F.col("cy") + 1).alias("ry2"))
    cells = li.groupBy("flag", "x", "y").agg(F.count(F.lit(1)).alias("c"))
    j = (cells.join(xrank, ["flag", "x"]).join(yrank, ["flag", "y"])
         .select("flag",
                 F.col("c").cast("decimal(10,0)").alias("c"),
                 F.col("rx2").cast("decimal(14,0)").alias("rx2"),
                 F.col("ry2").cast("decimal(14,0)").alias("ry2")))
    agg = (j.groupBy("flag")
           .agg(F.sum("c").alias("n"),
                F.sum(F.col("c") * F.col("rx2")).alias("sx"),
                F.sum(F.col("c") * F.col("ry2")).alias("sy"),
                F.sum(F.col("c") * (F.col("rx2") * F.col("rx2")))
                .alias("sxx"),
                F.sum(F.col("c") * (F.col("ry2") * F.col("ry2")))
                .alias("syy"),
                F.sum(F.col("c") * (F.col("rx2") * F.col("ry2")))
                .alias("sxy")))
    n38 = F.col("n").cast("decimal(38,0)")
    num = (n38 * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dx = (n38 * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    dy = (n38 * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return agg.select(
        F.col("flag").alias("l_returnflag"),
        F.col("n").cast("bigint").alias("n_items"),
        (num / F.sqrt(dx * dy)).alias("spearman_rho"))


@register(
    "stats_weighted_median",
    oracle="""
    WITH cells AS (
      SELECT l_returnflag AS flag, l_extendedprice AS price,
             SUM(CAST(l_quantity AS DECIMAL(18,4))) AS w,
             COUNT(*) AS c
      FROM lineitem GROUP BY 1, 2
    ), cum AS (
      SELECT flag, price, c,
             SUM(w) OVER (PARTITION BY flag ORDER BY price
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
             SUM(w) OVER (PARTITION BY flag) AS tw,
             SUM(c) OVER (PARTITION BY flag) AS n
      FROM cells
    )
    SELECT flag AS l_returnflag,
           CAST(MAX(n) AS BIGINT) AS n_items,
           CAST(CAST(MAX(tw) AS VARCHAR) AS DOUBLE) AS total_weight,
           MIN(price) FILTER (WHERE 2 * cw >= tw) AS weighted_median
    FROM cum GROUP BY flag
    """,
    tags=("connector", "statistics", "robust-stats"))
def stats_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUANTITY-WEIGHTED MEDIAN extended price per return flag — the
    lower weighted median (smallest price whose cumulative weight reaches
    half the total), the volume-aware central price a pricing audit
    reports where the unweighted median would let single-unit line items
    dominate.

    Exactness: weights are exact decimals (quantities are integral),
    cumulative and total weights are exact decimal sums, and the median
    selection 2*cw >= tw compares decimals — no float enters until the
    reported total_weight cast.

    Scale shape: distinct-price cells first (hash aggregate), then the
    TWO-PASS cumulative weight (_two_pass_cumsum), then a flag-count-
    sized aggregate. The selection predicate filters before the final
    tiny groupBy — no group-sized sort, no per-row window."""
    li = load(spark, sf_dir, "lineitem")
    cells = (li.groupBy(F.col("l_returnflag").alias("flag"),
                        F.col("l_extendedprice").alias("price"))
             .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)"))
                  .alias("w"),
                  F.count(F.lit(1)).alias("c")))
    cum = _two_pass_cumsum(spark, cells, ["flag"], ["price"], {"w": "w"})
    cnt = cells.groupBy("flag").agg(F.sum("c").alias("n"))
    med = (cum.where(F.lit(2) * F.col("cum_w") >= F.col("tot_w"))
           .groupBy("flag")
           .agg(F.min("price").alias("weighted_median"),
                F.max("tot_w").cast("double").alias("total_weight")))
    return (med.join(F.broadcast(cnt), "flag")
            .select(F.col("flag").alias("l_returnflag"),
                    F.col("n").cast("bigint").alias("n_items"),
                    "total_weight", "weighted_median"))


@register(
    "orders_gini_concentration",
    oracle="""
    WITH rev AS (
      SELECT n.n_name, o.o_custkey,
             SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS r
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name, o.o_custkey
    ), ranked AS (
      SELECT n_name, r,
             ROW_NUMBER() OVER (PARTITION BY n_name
                                ORDER BY r, o_custkey) AS rn,
             COUNT(*) OVER (PARTITION BY n_name) AS n
      FROM rev
    ), agg AS (
      SELECT n_name, MAX(n) AS n,
             SUM(CAST(r AS DECIMAL(27,4))) AS s,
             SUM(CAST(rn AS DECIMAL(10,0)) * r) AS s1
      FROM ranked GROUP BY n_name
    )
    SELECT n_name, CAST(n AS BIGINT) AS n_customers,
           CAST(CAST(s AS VARCHAR) AS DOUBLE) AS total_revenue,
           (2.0 * CAST(CAST(s1 AS VARCHAR) AS DOUBLE)
            - (CAST(n AS DOUBLE) + 1.0) * CAST(CAST(s AS VARCHAR) AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(CAST(s AS VARCHAR) AS DOUBLE))
             AS gini
    FROM agg
    """,
    tags=("connector", "statistics", "concentration"))
def orders_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GINI COEFFICIENT of customer revenue per nation — the Lorenz-curve
    concentration index (0 = every customer spends equally, ->1 = one
    customer is the whole book) computed by the rank formula
    G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) over revenues sorted
    ascending — the one-number companion to customer_abc_pareto's
    banded view.

    Exactness: per-customer revenue is an exact decimal sum; the rank
    moment sum(i*x_i) multiplies a BIGINT rank into the decimal (exact,
    DECIMAL(29,4) per term, DECIMAL(38,4) accumulated); the closing
    formula is one fixed-shape double expression over the exact decimal
    aggregates routed through the VARCHAR cast.

    Scale shape: the ascending within-nation rank uses the TWO-PASS
    range-partition + carry (_two_pass_rank) — 25 nations would
    otherwise mean 25 nation-sized single-task sorts. One keyed join
    chain (orders x customer x broadcast nation), one hash aggregate
    per granularity."""
    from .connector import _two_pass_rank
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    rev = (orders
           .join(customer, orders.o_custkey == customer.c_custkey)
           .join(F.broadcast(nation),
                 customer.c_nationkey == nation.n_nationkey)
           .groupBy("n_name", "o_custkey")
           .agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
                .alias("r")))
    ranked = _two_pass_rank(spark, rev, ["n_name"], ["r", "o_custkey"])
    agg = (ranked.groupBy("n_name")
           .agg(F.max("n").alias("n"),
                F.sum(F.col("r").cast("decimal(27,4)")).alias("s"),
                F.sum(F.col("rn").cast("decimal(10,0)") * F.col("r"))
                .alias("s1")))
    nd = F.col("n").cast("double")
    sd = F.col("s").cast("double")
    s1d = F.col("s1").cast("double")
    return agg.select(
        "n_name",
        F.col("n").cast("bigint").alias("n_customers"),
        sd.alias("total_revenue"),
        ((2.0 * s1d - (nd + 1.0) * sd) / (nd * sd)).alias("gini"))
