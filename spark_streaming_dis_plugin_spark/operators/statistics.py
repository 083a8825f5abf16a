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


PSI_BINS = 10


@register(
    "stats_psi_binned_drift",
    oracle=f"""
    WITH ids AS (
      SELECT MIN(event_id) AS mn, MAX(event_id) AS mx FROM events
    ), ev AS (
      SELECT event_type, "value",
             CASE WHEN event_id <= (mn + mx) // 2 THEN 1 ELSE 0 END AS early
      FROM events, ids
    ), rng AS (
      SELECT event_type, MIN("value") AS vmin, MAX("value") AS vmax
      FROM ev GROUP BY 1
    ), binned AS (
      SELECT e.event_type, e.early,
             CASE WHEN r.vmax = r.vmin THEN 0
                  ELSE LEAST({PSI_BINS - 1},
                             CAST(FLOOR((e."value" - r.vmin)
                                  / ((r.vmax - r.vmin) / {PSI_BINS}.0))
                                  AS INT)) END AS bin
      FROM ev e JOIN rng r ON e.event_type = r.event_type
    ), counts AS (
      SELECT event_type, bin, SUM(early) AS ce, SUM(1 - early) AS cl
      FROM binned GROUP BY 1, 2
    ), grid AS (
      SELECT t.event_type, CAST(g.range AS INT) AS bin
      FROM (SELECT DISTINCT event_type FROM ev) t, range({PSI_BINS}) g
    ), filled AS (
      SELECT g.event_type, g.bin,
             COALESCE(c.ce, 0) AS ce, COALESCE(c.cl, 0) AS cl
      FROM grid g LEFT JOIN counts c
        ON g.event_type = c.event_type AND g.bin = c.bin
    ), tot AS (
      SELECT event_type, SUM(ce) AS ne, SUM(cl) AS nl
      FROM filled GROUP BY 1
    ), contribs AS (
      SELECT f.event_type, f.bin, t.ne, t.nl,
             ((CAST(f.ce AS DOUBLE) + 1.0)
                / (CAST(t.ne AS DOUBLE) + {PSI_BINS}.0)
              - (CAST(f.cl AS DOUBLE) + 1.0)
                / (CAST(t.nl AS DOUBLE) + {PSI_BINS}.0))
             * ln(((CAST(f.ce AS DOUBLE) + 1.0)
                     / (CAST(t.ne AS DOUBLE) + {PSI_BINS}.0))
                  / ((CAST(f.cl AS DOUBLE) + 1.0)
                     / (CAST(t.nl AS DOUBLE) + {PSI_BINS}.0))) AS contrib
      FROM filled f JOIN tot t ON f.event_type = t.event_type
    )
    SELECT event_type,
           CAST(MAX(ne) AS BIGINT) AS n_early,
           CAST(MAX(nl) AS BIGINT) AS n_late,
           round(list_reduce(list_prepend(0.0, list(contrib ORDER BY bin)),
                             (a, b) -> a + b), 6) + 0.0 AS psi
    FROM contribs GROUP BY event_type
    """,
    tags=("connector", "statistics", "drift"))
def stats_psi_binned_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POPULATION STABILITY INDEX per event_type between the id-ordered
    first and second halves of the event log: Laplace-smoothed shares
    over {PSI_BINS} equal-width value bins, psi = sum((p-q)*ln(p/q)) —
    the binned drift score every model-monitoring pipeline tracks
    (rule of thumb: psi > 0.2 = population shift worth a retrain).

    Semantics: the split is by event_id midpoint (ids are ingest-ordered
    in the fixture), timezone-free by construction; bin edges come from
    the TYPE's OWN min/max over both halves; +1/+{PSI_BINS} Laplace
    smoothing keeps empty bins finite. Bin assignment is pure double
    arithmetic with one expression shape (identical IEEE results), the
    psi sum is an ORDERED fold over the {PSI_BINS}-element bin list
    (fixed summation order), and round(6) absorbs the last-ulp libm
    ln() difference — the text-scoring discipline.

    Scale shape: two scans (range + binned counts) with hash aggregates
    keyed by (type, bin); the bin grid is |types| x {PSI_BINS} (tiny,
    densified by a broadcast cross join so zero-count bins exist in
    BOTH engines); the fold runs over {PSI_BINS}-element arrays on the
    aggregated relation. The 1-row id-midpoint relation is a broadcast
    cross join, not a collect."""
    ev = load(spark, sf_dir, "events").select(
        "event_id", "event_type", "value")
    ids = ev.agg(F.min("event_id").alias("mn"), F.max("event_id").alias("mx"))
    ev2 = (ev.crossJoin(F.broadcast(ids))
           .withColumn("early",
                       (F.col("event_id") <= F.expr("(mn + mx) div 2"))
                       .cast("int")))
    rng = ev2.groupBy("event_type").agg(F.min("value").alias("vmin"),
                                        F.max("value").alias("vmax"))
    binned = (ev2.join(F.broadcast(rng), "event_type")
              .select("event_type", "early",
                      F.when(F.col("vmax") == F.col("vmin"), F.lit(0))
                      .otherwise(F.least(
                          F.lit(PSI_BINS - 1),
                          F.floor((F.col("value") - F.col("vmin"))
                                  / ((F.col("vmax") - F.col("vmin"))
                                     / float(PSI_BINS))).cast("int")))
                      .alias("bin")))
    counts = (binned.groupBy("event_type", "bin")
              .agg(F.sum("early").alias("ce"),
                   F.sum(F.lit(1) - F.col("early")).alias("cl")))
    grid = (counts.select("event_type").distinct()
            .crossJoin(spark.range(PSI_BINS)
                       .select(F.col("id").cast("int").alias("bin"))))
    filled = (grid.join(counts, ["event_type", "bin"], "left")
              .fillna(0, ["ce", "cl"]))
    tot = filled.groupBy("event_type").agg(F.sum("ce").alias("ne"),
                                           F.sum("cl").alias("nl"))
    j = filled.join(F.broadcast(tot), "event_type")
    p = (F.col("ce").cast("double") + 1.0) \
        / (F.col("ne").cast("double") + float(PSI_BINS))
    q = (F.col("cl").cast("double") + 1.0) \
        / (F.col("nl").cast("double") + float(PSI_BINS))
    contribs = j.select("event_type", "bin", "ne", "nl",
                        ((p - q) * F.log(p / q)).alias("contrib"))
    arr = F.transform(
        F.array_sort(F.collect_list(F.struct("bin", "contrib"))),
        lambda s: s["contrib"])
    return (contribs.groupBy("event_type")
            .agg(F.max("ne").cast("bigint").alias("n_early"),
                 F.max("nl").cast("bigint").alias("n_late"),
                 (F.round(F.aggregate(arr, F.lit(0.0),
                                      lambda a, x: a + x), 6)
                  + 0.0).alias("psi")))


# log10(1 + 1/d) for d = 1..9, computed once in Python and interpolated
# into BOTH engines as double literals (repr round-trips binary64).
BENFORD_SHARES = [0.3010299956639812, 0.17609125905568124,
                  0.12493873660829992, 0.09691001300805642,
                  0.07918124604762482, 0.06694678963061322,
                  0.05799194697768673, 0.05115252244738129,
                  0.04575749056067514]
_BEN_SQL = "[" + ", ".join(repr(b) for b in BENFORD_SHARES) + "]"


@register(
    "quality_benford_digits",
    oracle=f"""
    WITH digits AS (
      SELECT o_orderpriority,
             CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                              AS VARCHAR), 1, 1) AS INT) AS digit
      FROM orders WHERE o_totalprice >= 1.0
    ), counts AS (
      SELECT o_orderpriority, digit, COUNT(*) AS observed
      FROM digits GROUP BY 1, 2
    ), grid AS (
      SELECT p.o_orderpriority, CAST(g.range AS INT) AS digit
      FROM (SELECT DISTINCT o_orderpriority FROM digits) p, range(1, 10) g
    ), filled AS (
      SELECT g.o_orderpriority, g.digit,
             COALESCE(c.observed, 0) AS observed
      FROM grid g LEFT JOIN counts c
        ON g.o_orderpriority = c.o_orderpriority AND g.digit = c.digit
    ), tot AS (
      SELECT o_orderpriority, SUM(observed) AS n FROM filled GROUP BY 1
    )
    SELECT f.o_orderpriority, CAST(f.digit AS INT) AS digit,
           CAST(t.n AS BIGINT) AS n_orders,
           CAST(f.observed AS BIGINT) AS observed,
           CAST(f.observed AS DOUBLE) / CAST(t.n AS DOUBLE)
             AS observed_share,
           ({_BEN_SQL}::DOUBLE[])[f.digit] AS benford_share,
           round((CAST(f.observed AS DOUBLE)
                  - CAST(t.n AS DOUBLE) * ({_BEN_SQL}::DOUBLE[])[f.digit])
                 * (CAST(f.observed AS DOUBLE)
                    - CAST(t.n AS DOUBLE) * ({_BEN_SQL}::DOUBLE[])[f.digit])
                 / (CAST(t.n AS DOUBLE) * ({_BEN_SQL}::DOUBLE[])[f.digit]),
                 9) + 0.0 AS chi2_contrib
    FROM filled f JOIN tot t ON f.o_orderpriority = t.o_orderpriority
    """,
    tags=("connector", "statistics", "quality-audit"))
def quality_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENFORD'S-LAW first-digit audit of order values per priority
    class: observed vs expected (log10(1 + 1/d)) leading-digit shares
    with per-digit chi-square contributions — the classic forensic
    check for fabricated or truncated monetary values in an ingested
    feed.

    Exactness: the leading digit is STRING-extracted from the exact
    DECIMAL(18,2) rendering (no float log10 on the value), the Benford
    expectations are Python-computed double literals interpolated into
    both engines, and each chi-square contribution is one fixed-shape
    double expression rounded to the declared 9 dp. The digit grid is
    densified (priority x 1..9) so zero-observed digits appear in both
    engines.

    Scale shape: one scan, one (priority, digit) hash aggregate — at
    most 5 x 9 result rows; the densifying grid is a broadcast cross
    join of two tiny distinct relations."""
    orders = load(spark, sf_dir, "orders")
    digits = (orders.where(F.col("o_totalprice") >= 1.0)
              .select("o_orderpriority",
                      F.substring(F.col("o_totalprice")
                                  .cast("decimal(18,2)").cast("string"),
                                  1, 1).cast("int").alias("digit")))
    counts = (digits.groupBy("o_orderpriority", "digit")
              .agg(F.count(F.lit(1)).alias("observed")))
    grid = (counts.select("o_orderpriority").distinct()
            .crossJoin(spark.range(1, 10)
                       .select(F.col("id").cast("int").alias("digit"))))
    filled = (grid.join(counts, ["o_orderpriority", "digit"], "left")
              .fillna(0, ["observed"]))
    tot = (filled.groupBy("o_orderpriority")
           .agg(F.sum("observed").alias("n")))
    ben = F.element_at(
        F.array(*[F.lit(b) for b in BENFORD_SHARES]), F.col("digit"))
    od = F.col("observed").cast("double")
    nd = F.col("n").cast("double")
    return (filled.join(F.broadcast(tot), "o_orderpriority")
            .select("o_orderpriority", F.col("digit").cast("int"),
                    F.col("n").cast("bigint").alias("n_orders"),
                    F.col("observed").cast("bigint").alias("observed"),
                    (od / nd).alias("observed_share"),
                    ben.alias("benford_share"),
                    (F.round((od - nd * ben) * (od - nd * ben)
                             / (nd * ben), 9) + 0.0).alias("chi2_contrib")))


@register(
    "stats_chi_square_independence",
    oracle="""
    WITH obs AS (
      SELECT c.c_mktsegment AS segment, o.o_orderpriority AS priority,
             COUNT(*) AS o
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ), marg AS (
      SELECT segment, priority, o,
             SUM(o) OVER (PARTITION BY segment) AS rt,
             SUM(o) OVER (PARTITION BY priority) AS ct,
             SUM(o) OVER () AS n
      FROM obs
    ), contribs AS (
      SELECT segment, priority, n,
             (CAST(o AS DOUBLE)
              - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(o AS DOUBLE)
                - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
                  / CAST(n AS DOUBLE))
             / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
               AS contrib
      FROM marg
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_orders,
           CAST(COUNT(DISTINCT segment) AS BIGINT) AS n_segments,
           CAST(COUNT(DISTINCT priority) AS BIGINT) AS n_priorities,
           CAST((COUNT(DISTINCT segment) - 1)
                * (COUNT(DISTINCT priority) - 1) AS BIGINT) AS dof,
           round(list_reduce(
                   list_prepend(0.0, list(contrib ORDER BY segment,
                                          priority)),
                   (a, b) -> a + b), 9) + 0.0 AS chi2
    FROM contribs
    """,
    tags=("connector", "statistics", "independence"))
def stats_chi_square_independence(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """PEARSON CHI-SQUARE test of independence between customer market
    segment and order priority — the contingency-table check a
    segmentation audit runs to ask "does priority mix actually differ
    by segment, or is the crosstab just noise" (chi2 vs the (r-1)(c-1)
    dof it reports alongside).

    Exactness: observed counts and marginals are exact integers; each
    cell's (o - e)^2 / e runs as one fixed-shape double expression, and
    the 25-cell total is an ORDERED fold by (segment, priority) —
    deterministic summation order in both engines — rounded to the
    declared 9 dp.

    Scale shape: one keyed join + one hash aggregate down to the
    |segments| x |priorities| contingency relation (25 rows); all
    windows and the closing fold run on that constant-bounded relation
    (the seasonal-profile precedent), never on fact-sized data."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    obs = (orders.join(customer, orders.o_custkey == customer.c_custkey)
           .groupBy(F.col("c_mktsegment").alias("segment"),
                    F.col("o_orderpriority").alias("priority"))
           .agg(F.count(F.lit(1)).alias("o")))
    marg = obs.select(
        "segment", "priority", "o",
        F.sum("o").over(Window.partitionBy("segment")).alias("rt"),
        F.sum("o").over(Window.partitionBy("priority")).alias("ct"),
        F.sum("o").over(Window.partitionBy()).alias("n"))
    e = (F.col("rt").cast("double") * F.col("ct").cast("double")
         / F.col("n").cast("double"))
    contribs = marg.select(
        "segment", "priority", "n",
        ((F.col("o").cast("double") - e)
         * (F.col("o").cast("double") - e) / e).alias("contrib"))
    arr = F.transform(
        F.array_sort(F.collect_list(F.struct("segment", "priority",
                                             "contrib"))),
        lambda s: s["contrib"])
    return contribs.groupBy().agg(
        F.max("n").cast("bigint").alias("n_orders"),
        F.countDistinct("segment").cast("bigint").alias("n_segments"),
        F.countDistinct("priority").cast("bigint").alias("n_priorities"),
        ((F.countDistinct("segment") - 1)
         * (F.countDistinct("priority") - 1)).cast("bigint").alias("dof"),
        (F.round(F.aggregate(arr, F.lit(0.0), lambda a, x: a + x), 9)
         + 0.0).alias("chi2"))


@register(
    "stats_welch_ttest",
    oracle=f"""
    WITH base AS ({_SAMPLES_SQL}),
    moments AS (
      SELECT segment,
             SUM(s1) AS n1, SUM(1 - s1) AS n2,
             SUM(CASE WHEN s1 = 1
                 THEN CAST(price AS DECIMAL(18,4)) END) AS su1,
             SUM(CASE WHEN s1 = 0
                 THEN CAST(price AS DECIMAL(18,4)) END) AS su2,
             -- (19,4) forces int128 multiply in DuckDB (an 18,4
             -- square overflows its int64 fast path); same values
             SUM(CASE WHEN s1 = 1
                 THEN CAST(price AS DECIMAL(19,4))
                      * CAST(price AS DECIMAL(19,4)) END) AS sq1,
             SUM(CASE WHEN s1 = 0
                 THEN CAST(price AS DECIMAL(19,4))
                      * CAST(price AS DECIMAL(19,4)) END) AS sq2
      FROM base GROUP BY segment
    )
    SELECT segment,
           CAST(n1 AS BIGINT) AS n_urgent, CAST(n2 AS BIGINT) AS n_low,
           round(CAST(CAST(su1 AS VARCHAR) AS DOUBLE) / CAST(n1 AS DOUBLE)
                 - CAST(CAST(su2 AS VARCHAR) AS DOUBLE)
                   / CAST(n2 AS DOUBLE), 9) + 0.0 AS mean_diff,
           round((CAST(CAST(su1 AS VARCHAR) AS DOUBLE) / CAST(n1 AS DOUBLE)
                  - CAST(CAST(su2 AS VARCHAR) AS DOUBLE)
                    / CAST(n2 AS DOUBLE))
                 / sqrt(
                   ((CAST(CAST(sq1 AS VARCHAR) AS DOUBLE)
                     - CAST(CAST(su1 AS VARCHAR) AS DOUBLE)
                       * CAST(CAST(su1 AS VARCHAR) AS DOUBLE)
                       / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0))
                   / CAST(n1 AS DOUBLE)
                   + ((CAST(CAST(sq2 AS VARCHAR) AS DOUBLE)
                       - CAST(CAST(su2 AS VARCHAR) AS DOUBLE)
                         * CAST(CAST(su2 AS VARCHAR) AS DOUBLE)
                         / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0))
                     / CAST(n2 AS DOUBLE)), 9) + 0.0 AS t_stat
    FROM moments
    """,
    tags=("connector", "statistics", "two-sample"))
def stats_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WELCH'S UNEQUAL-VARIANCE t-TEST per market segment (urgent vs
    low priority order values) — the parametric companion to the KS /
    Mann-Whitney rows: does the MEAN differ, without assuming the two
    samples share a variance.

    Exactness: per-sample sums and sums of squares are exact decimals
    (DECIMAL(18,4) values, (37,8) squares), routed to double through
    the VARCHAR cast; mean, variance ((ssq - s^2/n)/(n-1) — the inputs
    are exact, so the cancellation-prone shape is still deterministic:
    identical IEEE inputs and expression shape give identical outputs),
    and the t statistic are one fixed double expression, rounded to the
    declared 9 dp.

    Scale shape: ONE hash aggregate to 5 segment rows — the entire test
    is map-side-combinable moments; nothing is sorted, nothing is
    windowed. The cheapest drift test in the family."""
    base = _priority_samples(spark, sf_dir)
    p4 = F.col("price").cast("decimal(18,4)")
    m = (base.groupBy("segment")
         .agg(F.sum("s1").alias("n1"),
              F.sum(F.lit(1) - F.col("s1")).alias("n2"),
              F.sum(F.when(F.col("s1") == 1, p4)).alias("su1"),
              F.sum(F.when(F.col("s1") == 0, p4)).alias("su2"),
              F.sum(F.when(F.col("s1") == 1, p4 * p4)).alias("sq1"),
              F.sum(F.when(F.col("s1") == 0, p4 * p4)).alias("sq2")))
    n1d, n2d = F.col("n1").cast("double"), F.col("n2").cast("double")
    su1, su2 = F.col("su1").cast("double"), F.col("su2").cast("double")
    sq1, sq2 = F.col("sq1").cast("double"), F.col("sq2").cast("double")
    md = su1 / n1d - su2 / n2d
    v1 = (sq1 - su1 * su1 / n1d) / (n1d - 1.0)
    v2 = (sq2 - su2 * su2 / n2d) / (n2d - 1.0)
    return m.select(
        "segment",
        F.col("n1").cast("bigint").alias("n_urgent"),
        F.col("n2").cast("bigint").alias("n_low"),
        (F.round(md, 9) + 0.0).alias("mean_diff"),
        (F.round(md / F.sqrt(v1 / n1d + v2 / n2d), 9) + 0.0)
        .alias("t_stat"))


@register(
    "events_theil_sen_trend",
    oracle="""
    WITH ranked AS (
      SELECT user_id, "value",
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n
      FROM events
    ), pairs AS (
      SELECT a.user_id, a.n, a.rn AS i,
             (b."value" - a."value") / CAST(a.n // 2 AS DOUBLE) AS slope
      FROM ranked a JOIN ranked b
        ON a.user_id = b.user_id AND b.rn = a.rn + a.n // 2
      WHERE a.n >= 2
    ), counted AS (
      SELECT user_id, MAX(n) AS n, COUNT(*) AS cnt
      FROM pairs GROUP BY user_id
    ), sl AS (
      SELECT user_id, slope,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY slope, i) AS rs
      FROM pairs
    )
    SELECT c.user_id, CAST(c.n AS BIGINT) AS n_events,
           CAST(c.cnt AS BIGINT) AS n_slopes,
           s.slope AS theil_sen_slope
    FROM counted c JOIN sl s
      ON c.user_id = s.user_id AND s.rs = (c.cnt + 1) // 2
    """,
    tags=("connector", "statistics", "timeseries", "robust-stats"))
def events_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THEIL-SEN ROBUST TREND per user (half-offset variant): the
    median of the slopes between observation i and observation
    i + n/2 — the outlier-resistant trend estimate a metrics pipeline
    reports where one bad point would swing the OLS slope
    (events_ols_trend's robust sibling). The half-offset pairing is
    the O(n) member of the Theil-Sen family (the full version's
    O(n^2) pairs cannot ship at scale); slopes are per-index-step.

    Exactness: each slope is one double division with identical
    operands (h = n div 2 is integer); the MEDIAN is pure rank
    selection — lower median, ties broken by pair index — so no float
    accumulates at all.

    Scale shape: within-key ranks via the TWO-PASS range-partition +
    carry (_two_pass_rank, twice: once by time for the pairing, once
    by slope for the median): the pairing is an EQUI-join on
    (user_id, rn + h) — no inequality join, no per-key arrays; the
    median pick is a rank filter, not a sort-and-collect."""
    from .connector import _two_pass_rank
    events = load(spark, sf_dir, "events")
    ranked = _two_pass_rank(
        spark, events.select("user_id", "ts", "event_id", "value"),
        ["user_id"], ["ts", "event_id"])
    a = ranked.where(F.col("n") >= 2).select(
        "user_id", "n", F.col("rn").alias("i"),
        F.col("value").alias("v1"),
        (F.col("rn") + F.expr("n div 2")).alias("j"))
    b = ranked.select("user_id", F.col("rn").alias("j"),
                      F.col("value").alias("v2"))
    pairs = (a.join(b, ["user_id", "j"])
             .select("user_id", "n", "i",
                     ((F.col("v2") - F.col("v1"))
                      / F.expr("n div 2").cast("double")).alias("slope")))
    counted = (pairs.groupBy("user_id")
               .agg(F.max("n").alias("n"), F.count(F.lit(1)).alias("cnt")))
    sl = _two_pass_rank(spark, pairs.select("user_id", "slope", "i"),
                        ["user_id"], ["slope", "i"]) \
        .select("user_id", "slope", F.col("rn").alias("rs"))
    return (counted.join(sl, "user_id")
            .where(F.col("rs") == F.expr("(cnt + 1) div 2"))
            .select("user_id", F.col("n").cast("bigint").alias("n_events"),
                    F.col("cnt").cast("bigint").alias("n_slopes"),
                    F.col("slope").alias("theil_sen_slope")))


LORENZ_DECILES = 10


@register(
    "orders_lorenz_curve",
    oracle=f"""
    WITH rev AS (
      SELECT n.n_name, o.o_custkey,
             SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS r
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name, o.o_custkey
    ), cum AS (
      SELECT n_name,
             ROW_NUMBER() OVER w AS rnk,
             SUM(CAST(r AS DECIMAL(27,4))) OVER
               (PARTITION BY n_name ORDER BY r, o_custkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cr,
             COUNT(*) OVER (PARTITION BY n_name) AS n,
             SUM(CAST(r AS DECIMAL(27,4)))
               OVER (PARTITION BY n_name) AS tot
      FROM rev
      WINDOW w AS (PARTITION BY n_name ORDER BY r, o_custkey)
    ), grid AS (
      SELECT CAST(g.range AS INT) AS decile FROM range(1, 11) g
    )
    SELECT c.n_name, g.decile,
           CAST(MAX(c.n) AS BIGINT) AS n_customers,
           CAST(CAST(MAX(c.cr) AS VARCHAR) AS DOUBLE)
             / CAST(CAST(MAX(c.tot) AS VARCHAR) AS DOUBLE) AS cum_share
    FROM cum c JOIN grid g
      ON c.rnk = (c.n * g.decile + {LORENZ_DECILES - 1})
                 // {LORENZ_DECILES}
    GROUP BY c.n_name, g.decile
    """,
    tags=("connector", "statistics", "concentration"))
def orders_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LORENZ CURVE of customer revenue per nation at customer-count
    deciles: cum_share(d) = share of the nation's revenue held by the
    poorest ceil(n*d/10) customers — the curve whose area complement is
    orders_gini_concentration's one number; a revenue-concentration
    dashboard plots both.

    Exactness: per-customer revenue and its running sum are exact
    decimals (order fixed by (revenue, custkey)); the decile row pick
    rnk == ceil(n*d/10) is pure integer arithmetic; the one double
    division routes both exact decimals through the VARCHAR cast.

    Scale shape: the within-nation rank AND the running revenue both
    come from ONE _two_pass_cumsum call (a unit count is just another
    measure — cum_one IS the rank), so the whole curve costs one range
    exchange plus the broadcast carry join; the 10-row decile grid is a
    broadcast join against integer targets. 25 nations would otherwise
    be 25 nation-sized single-task sorts."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    rev = (orders
           .join(customer, orders.o_custkey == customer.c_custkey)
           .join(F.broadcast(nation),
                 customer.c_nationkey == nation.n_nationkey)
           .groupBy("n_name", "o_custkey")
           .agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
                .alias("r"))
           .withColumn("one", F.lit(1))
           .withColumn("r27", F.col("r").cast("decimal(27,4)")))
    cum = _two_pass_cumsum(spark, rev, ["n_name"], ["r", "o_custkey"],
                           {"rev": "r27", "one": "one"})
    grid = (spark.range(1, LORENZ_DECILES + 1)
            .select(F.col("id").cast("int").alias("decile")))
    return (cum.crossJoin(F.broadcast(grid))
            .where(F.col("cum_one")
                   == F.expr(f"(tot_one * decile + {LORENZ_DECILES - 1}) "
                             f"div {LORENZ_DECILES}"))
            .groupBy("n_name", "decile")
            .agg(F.max("tot_one").cast("bigint").alias("n_customers"),
                 (F.max("cum_rev").cast("double")
                  / F.max("tot_rev").cast("double")).alias("cum_share")))


BOLL_WINDOW = 20   # trailing observations per band
BOLL_WIDTH = 2.0   # band half-width in rolling standard deviations


@register(
    "events_bollinger_bands",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_id, "value",
             CAST("value" AS DECIMAL(18,4)) AS v4,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ), rolled AS (
      SELECT user_id, event_id, "value", rn,
             SUM(CAST(v4 AS DECIMAL(27,4))) OVER w AS s,
             SUM(CAST(v4 AS DECIMAL(19,4)) * CAST(v4 AS DECIMAL(19,4)))
               OVER w AS sq
      FROM seq
      WINDOW w AS (PARTITION BY user_id ORDER BY rn
                   ROWS BETWEEN {BOLL_WINDOW - 1} PRECEDING
                   AND CURRENT ROW)
    )
    SELECT user_id, event_id, "value",
           round(CAST(CAST(s AS VARCHAR) AS DOUBLE) / {BOLL_WINDOW}.0, 9)
             + 0.0 AS roll_mean,
           round(CAST(CAST(s AS VARCHAR) AS DOUBLE) / {BOLL_WINDOW}.0
                 + {BOLL_WIDTH} * sqrt(
                     (CAST(CAST(sq AS VARCHAR) AS DOUBLE)
                      - CAST(CAST(s AS VARCHAR) AS DOUBLE)
                        * CAST(CAST(s AS VARCHAR) AS DOUBLE)
                        / {BOLL_WINDOW}.0) / {BOLL_WINDOW - 1}.0), 9)
             + 0.0 AS band_upper,
           round(CAST(CAST(s AS VARCHAR) AS DOUBLE) / {BOLL_WINDOW}.0
                 - {BOLL_WIDTH} * sqrt(
                     (CAST(CAST(sq AS VARCHAR) AS DOUBLE)
                      - CAST(CAST(s AS VARCHAR) AS DOUBLE)
                        * CAST(CAST(s AS VARCHAR) AS DOUBLE)
                        / {BOLL_WINDOW}.0) / {BOLL_WINDOW - 1}.0), 9)
             + 0.0 AS band_lower,
           "value" > CAST(CAST(s AS VARCHAR) AS DOUBLE) / {BOLL_WINDOW}.0
                 + {BOLL_WIDTH} * sqrt(
                     (CAST(CAST(sq AS VARCHAR) AS DOUBLE)
                      - CAST(CAST(s AS VARCHAR) AS DOUBLE)
                        * CAST(CAST(s AS VARCHAR) AS DOUBLE)
                        / {BOLL_WINDOW}.0) / {BOLL_WINDOW - 1}.0)
             OR "value" < CAST(CAST(s AS VARCHAR) AS DOUBLE)
                   / {BOLL_WINDOW}.0
                 - {BOLL_WIDTH} * sqrt(
                     (CAST(CAST(sq AS VARCHAR) AS DOUBLE)
                      - CAST(CAST(s AS VARCHAR) AS DOUBLE)
                        * CAST(CAST(s AS VARCHAR) AS DOUBLE)
                        / {BOLL_WINDOW}.0) / {BOLL_WINDOW - 1}.0)
             AS breach
    FROM rolled WHERE rn >= {BOLL_WINDOW}
    """,
    tags=("connector", "statistics", "timeseries"))
def events_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOLLINGER BANDS per user: trailing-{BOLL_WINDOW} rolling mean
    +/- {BOLL_WIDTH} rolling standard deviations around each event's
    value, plus the breach flag — the classic volatility envelope a
    monitoring pipeline draws around any per-entity metric (only full
    windows emit, so every band uses exactly {BOLL_WINDOW}
    observations).

    Exactness: the rolling sum and sum of squares are EXACT decimal
    window aggregates — the square multiplies at decimal(18,4) on the
    Spark side (18,4 x 18,4 -> exact decimal(37,8), inside Spark's
    38-digit budget so no precision-loss rounding) while the DuckDB
    oracle casts the operands to (19,4) solely to force its int128
    multiply path (its int64 fast path would overflow); both engines
    therefore hold the identical exact 8-dp sum of squares, routed to
    double through the VARCHAR cast. Mean,
    variance, bands, and the breach compare are one fixed-shape double
    expression per row, rounded to the declared 9 dp (the breach
    compares the UNROUNDED bands, same expression both engines).

    Scale shape: ONE window partitioned by user_id — an entity key with
    fixture cardinality n/67 and real-world cardinality in the
    millions, so partitions stay small and parallelism high (this is
    the GOOD window shape; the two-pass machinery exists for ~5-value
    group keys, not for entity keys). Rolling frames are
    ROWS-bounded — state per row is O({BOLL_WINDOW})."""
    events = load(spark, sf_dir, "events")
    from .connector import _two_pass_rank
    seq = _two_pass_rank(
        spark, events.select("user_id", "ts", "event_id", "value"),
        ["user_id"], ["ts", "event_id"])
    v4 = F.col("value").cast("decimal(18,4)")
    w = (Window.partitionBy("user_id").orderBy("rn")
         .rowsBetween(-(BOLL_WINDOW - 1), Window.currentRow))
    rolled = seq.select(
        "user_id", "event_id", "value", "rn",
        F.sum(v4.cast("decimal(27,4)")).over(w).alias("s"),
        F.sum(v4 * v4).over(w).alias("sq"))
    sd = F.col("s").cast("double")
    sqd = F.col("sq").cast("double")
    mean = sd / float(BOLL_WINDOW)
    sig = F.sqrt((sqd - sd * sd / float(BOLL_WINDOW))
                 / float(BOLL_WINDOW - 1))
    upper = mean + BOLL_WIDTH * sig
    lower = mean - BOLL_WIDTH * sig
    return (rolled.where(F.col("rn") >= BOLL_WINDOW)
            .select("user_id", "event_id", "value",
                    (F.round(mean, 9) + 0.0).alias("roll_mean"),
                    (F.round(upper, 9) + 0.0).alias("band_upper"),
                    (F.round(lower, 9) + 0.0).alias("band_lower"),
                    ((F.col("value") > upper)
                     | (F.col("value") < lower)).alias("breach")))


@register(
    "stats_kruskal_wallis",
    oracle="""
    WITH base AS (
      SELECT c.c_mktsegment AS segment, o.o_totalprice AS price,
             o.o_orderpriority AS grp
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), cells AS (
      SELECT segment, price, grp, COUNT(*) AS c
      FROM base GROUP BY 1, 2, 3
    ), tcells AS (
      SELECT segment, price, SUM(c) AS t FROM cells GROUP BY 1, 2
    ), cum AS (
      SELECT segment, price, t,
             SUM(t) OVER (PARTITION BY segment ORDER BY price
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t
               AS excl,
             SUM(t) OVER (PARTITION BY segment) AS n
      FROM tcells
    ), ranksums AS (
      SELECT l.segment, l.grp, MAX(m.n) AS n,
             SUM(l.c) AS ng,
             SUM(CAST(l.c AS DECIMAL(19,0))
                 * CAST(2 * m.excl + m.t + 1 AS DECIMAL(19,0))) AS r2
      FROM cells l JOIN cum m
        ON l.segment = m.segment AND l.price = m.price
      GROUP BY l.segment, l.grp
    ), ties AS (
      SELECT segment,
             SUM(CAST(t AS DECIMAL(12,0)) * CAST(t AS DECIMAL(12,0))
                 * CAST(t AS DECIMAL(12,0))
                 - CAST(t AS DECIMAL(19,0))) AS tiesum
      FROM cum GROUP BY segment
    ), folded AS (
      SELECT r.segment, MAX(r.n) AS n, COUNT(*) AS k,
             list_reduce(
               list_prepend(0.0, list(
                 (CAST(CAST(r.r2 AS VARCHAR) AS DOUBLE) / 2.0)
                 * (CAST(CAST(r.r2 AS VARCHAR) AS DOUBLE) / 2.0)
                 / CAST(r.ng AS DOUBLE)
                 ORDER BY r.grp)),
               (a, b) -> a + b) AS s
      FROM ranksums r GROUP BY r.segment
    )
    SELECT f.segment, CAST(f.n AS BIGINT) AS n_orders,
           CAST(f.k - 1 AS BIGINT) AS dof,
           round(12.0 / (CAST(f.n AS DOUBLE) * (CAST(f.n AS DOUBLE) + 1.0))
                 * f.s - 3.0 * (CAST(f.n AS DOUBLE) + 1.0), 9) + 0.0
             AS h_stat,
           round((12.0 / (CAST(f.n AS DOUBLE)
                          * (CAST(f.n AS DOUBLE) + 1.0))
                  * f.s - 3.0 * (CAST(f.n AS DOUBLE) + 1.0))
                 / (1.0 - CAST(CAST(t.tiesum AS VARCHAR) AS DOUBLE)
                    / (CAST(f.n AS DOUBLE) * CAST(f.n AS DOUBLE)
                       * CAST(f.n AS DOUBLE) - CAST(f.n AS DOUBLE))),
                 9) + 0.0 AS h_tie_corrected
    FROM folded f JOIN ties t ON f.segment = t.segment
    """,
    tags=("connector", "statistics", "k-sample"))
def stats_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KRUSKAL-WALLIS H test per market segment across ALL FIVE order
    priorities — the k-sample generalization of stats_mann_whitney
    (one-way ANOVA on midranks): does ANY priority class's order-value
    distribution sit higher than the others, with the exact tie
    correction 1 - sum(t^3 - t)/(n^3 - n).

    Exactness: the same doubled-integer midrank machinery as
    Mann-Whitney — per-group rank sums R2_g = sum(c_g*(2*excl + t + 1))
    and the tie sum are exact DECIMAL arithmetic; the per-group
    R_g^2/n_g terms fold in PRIORITY order (fixed IEEE summation over
    the 5-element group list), and H is one fixed-shape double
    expression rounded to the declared 9 dp.

    Scale shape: distinct-(segment, price) pooled tie cells, the
    TWO-PASS cumulative count (_two_pass_cumsum), one keyed join back
    to the (segment, price, group) cells, then aggregates at
    (segment, group) = 25-row granularity; the closing fold runs over
    5-element arrays. Nothing group-sized is sorted in one task."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    base = (orders.join(customer, orders.o_custkey == customer.c_custkey)
            .select(F.col("c_mktsegment").alias("segment"),
                    F.col("o_totalprice").alias("price"),
                    F.col("o_orderpriority").alias("grp")))
    cells = (base.groupBy("segment", "price", "grp")
             .agg(F.count(F.lit(1)).alias("c")))
    tcells = cells.groupBy("segment", "price").agg(F.sum("c").alias("t"))
    cum = _two_pass_cumsum(spark, tcells, ["segment"], ["price"],
                           {"t": "t"})
    m = cum.select("segment", "price", "t",
                   (F.col("cum_t") - F.col("t")).alias("excl"),
                   F.col("tot_t").alias("n"))
    d12 = lambda c: c.cast("decimal(12,0)")  # noqa: E731
    ranksums = (cells.join(m, ["segment", "price"])
                .groupBy("segment", "grp")
                .agg(F.max("n").alias("n"),
                     F.sum("c").alias("ng"),
                     F.sum(F.col("c").cast("decimal(19,0)")
                           * (F.lit(2) * F.col("excl") + F.col("t") + 1)
                           .cast("decimal(19,0)")).alias("r2")))
    ties = (m.groupBy("segment")
            .agg(F.sum(d12(F.col("t")) * d12(F.col("t")) * d12(F.col("t"))
                       - F.col("t").cast("decimal(19,0)"))
                 .alias("tiesum")))
    r2d = F.col("r2").cast("double")
    term = (r2d / 2.0) * (r2d / 2.0) / F.col("ng").cast("double")
    terms = F.transform(
        F.array_sort(F.collect_list(F.struct("grp", term.alias("term")))),
        lambda s: s["term"])
    folded = (ranksums.groupBy("segment")
              .agg(F.max("n").alias("n"),
                   F.count(F.lit(1)).alias("k"),
                   F.aggregate(terms, F.lit(0.0),
                               lambda a, x: a + x).alias("s")))
    nd = F.col("n").cast("double")
    h = 12.0 / (nd * (nd + 1.0)) * F.col("s") - 3.0 * (nd + 1.0)
    corr = (1.0 - F.col("tiesum").cast("double")
            / (nd * nd * nd - nd))
    return (folded.join(ties, "segment")
            .select("segment",
                    F.col("n").cast("bigint").alias("n_orders"),
                    (F.col("k") - 1).cast("bigint").alias("dof"),
                    (F.round(h, 9) + 0.0).alias("h_stat"),
                    (F.round(h / corr, 9) + 0.0)
                    .alias("h_tie_corrected")))


@register(
    "stats_mutual_information",
    oracle="""
    WITH base AS (
      SELECT n.n_name, c.c_mktsegment AS seg, o.o_orderpriority AS pri
      FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
    ), cells AS (
      SELECT n_name, seg, pri, COUNT(*) AS nxy FROM base GROUP BY 1, 2, 3
    ), margx AS (
      SELECT n_name, seg, SUM(nxy) AS nx FROM cells GROUP BY 1, 2
    ), margy AS (
      SELECT n_name, pri, SUM(nxy) AS ny FROM cells GROUP BY 1, 2
    ), tot AS (
      SELECT n_name, SUM(nxy) AS n FROM cells GROUP BY 1
    ), joint AS (
      SELECT c.n_name, c.seg, c.pri,
             (CAST(c.nxy AS DOUBLE) / CAST(t.n AS DOUBLE))
             * ln((CAST(c.nxy AS DOUBLE) * CAST(t.n AS DOUBLE))
                  / (CAST(x.nx AS DOUBLE) * CAST(y.ny AS DOUBLE)))
               AS contrib
      FROM cells c
        JOIN margx x ON c.n_name = x.n_name AND c.seg = x.seg
        JOIN margy y ON c.n_name = y.n_name AND c.pri = y.pri
        JOIN tot t ON c.n_name = t.n_name
    ), mi AS (
      SELECT n_name,
             list_reduce(list_prepend(0.0, list(contrib ORDER BY seg, pri)),
                         (a, b) -> a + b) AS mi
      FROM joint GROUP BY n_name
    ), hx AS (
      SELECT x.n_name,
             -list_reduce(list_prepend(0.0, list(
                 (CAST(x.nx AS DOUBLE) / CAST(t.n AS DOUBLE))
                 * ln(CAST(x.nx AS DOUBLE) / CAST(t.n AS DOUBLE))
                 ORDER BY x.seg)), (a, b) -> a + b) AS hx
      FROM margx x JOIN tot t ON x.n_name = t.n_name
      GROUP BY x.n_name
    ), hy AS (
      SELECT y.n_name,
             -list_reduce(list_prepend(0.0, list(
                 (CAST(y.ny AS DOUBLE) / CAST(t.n AS DOUBLE))
                 * ln(CAST(y.ny AS DOUBLE) / CAST(t.n AS DOUBLE))
                 ORDER BY y.pri)), (a, b) -> a + b) AS hy
      FROM margy y JOIN tot t ON y.n_name = t.n_name
      GROUP BY y.n_name
    )
    SELECT m.n_name, CAST(t.n AS BIGINT) AS n_orders,
           round(m.mi, 9) + 0.0 AS mi_nats,
           round(x.hx, 9) + 0.0 AS h_segment,
           round(y.hy, 9) + 0.0 AS h_priority,
           round(m.mi / sqrt(x.hx * y.hy), 9) + 0.0 AS nmi
    FROM mi m
      JOIN tot t ON m.n_name = t.n_name
      JOIN hx x ON m.n_name = x.n_name
      JOIN hy y ON m.n_name = y.n_name
    """,
    tags=("connector", "statistics", "information-theory"))
def stats_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MUTUAL INFORMATION per nation between a customer's market
    segment and the priority of the orders they place — MI(X;Y) =
    sum_xy p(x,y) ln(p(x,y)/(p(x)p(y))) in nats, the marginal entropies
    H(segment) and H(priority), and the normalized MI
    MI/sqrt(H_x*H_y) — the categorical-dependence screen a feature/
    curation pipeline runs to find redundant or leaking attributes
    (independence <=> MI = 0; this fixture's near-uniform generator
    should sit near 0, which the oracle pins exactly rather than
    assuming).

    Exactness: the contingency core (cell, marginal, total counts) is
    pure integers; every p-weighted log rides ONE fixed-shape double
    expression over those integers, and each of the three sums (joint,
    H_x, H_y) is an ORDERED fold over the sorted cell list, so both
    engines add in the same sequence; round(9)+0.0 absorbs the last-ulp
    libm ln() difference (the PSI/Benford discipline).

    Scale shape: one hash aggregate over the joined fact down to
    |nations| x |segments| x |priorities| cells (~625 rows at any SF);
    marginals, entropies, and the folds all live on that aggregated
    relation via broadcast-sized joins — nothing after the first
    groupBy touches the fact again. The orders-customer join is the
    fact-to-dimension hash join every TPC-H row uses; nation is a
    broadcast."""
    orders = load(spark, sf_dir, "orders").select("o_custkey",
                                                  "o_orderpriority")
    customer = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_nationkey")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    base = (orders
            .join(customer, orders.o_custkey == customer.c_custkey)
            .join(F.broadcast(nation),
                  customer.c_nationkey == nation.n_nationkey)
            .select("n_name", F.col("c_mktsegment").alias("seg"),
                    F.col("o_orderpriority").alias("pri")))
    cells = (base.groupBy("n_name", "seg", "pri")
             .agg(F.count(F.lit(1)).alias("nxy")))
    margx = cells.groupBy("n_name", "seg").agg(F.sum("nxy").alias("nx"))
    margy = cells.groupBy("n_name", "pri").agg(F.sum("nxy").alias("ny"))
    tot = cells.groupBy("n_name").agg(F.sum("nxy").alias("n"))

    nxy_d = F.col("nxy").cast("double")
    n_d = F.col("n").cast("double")
    nx_d = F.col("nx").cast("double")
    ny_d = F.col("ny").cast("double")
    joint = (cells
             .join(F.broadcast(margx), ["n_name", "seg"])
             .join(F.broadcast(margy), ["n_name", "pri"])
             .join(F.broadcast(tot), "n_name")
             .select("n_name", "seg", "pri",
                     ((nxy_d / n_d)
                      * F.log((nxy_d * n_d) / (nx_d * ny_d)))
                     .alias("contrib")))

    def _fold(df: DataFrame, order_cols: list[str], val: str) -> DataFrame:
        arr = F.transform(
            F.array_sort(F.collect_list(F.struct(*order_cols, val))),
            lambda s: s[val])
        return df.groupBy("n_name").agg(
            F.aggregate(arr, F.lit(0.0), lambda a, x: a + x).alias(val))

    mi = _fold(joint, ["seg", "pri"], "contrib") \
        .withColumnRenamed("contrib", "mi")
    hx = _fold(
        margx.join(F.broadcast(tot), "n_name")
        .select("n_name", "seg",
                ((nx_d / n_d) * F.log(nx_d / n_d)).alias("h")),
        ["seg"], "h").select("n_name", (-F.col("h")).alias("hx"))
    hy = _fold(
        margy.join(F.broadcast(tot), "n_name")
        .select("n_name", "pri",
                ((ny_d / n_d) * F.log(ny_d / n_d)).alias("h")),
        ["pri"], "h").select("n_name", (-F.col("h")).alias("hy"))
    return (mi.join(tot, "n_name").join(hx, "n_name").join(hy, "n_name")
            .select("n_name", F.col("n").cast("bigint").alias("n_orders"),
                    (F.round("mi", 9) + 0.0).alias("mi_nats"),
                    (F.round("hx", 9) + 0.0).alias("h_segment"),
                    (F.round("hy", 9) + 0.0).alias("h_priority"),
                    (F.round(F.col("mi")
                             / F.sqrt(F.col("hx") * F.col("hy")), 9)
                     + 0.0).alias("nmi")))


@register(
    "stats_kendall_tau",
    oracle="""
    WITH cells AS (
      SELECT l_returnflag AS g, l_quantity AS x, l_linenumber AS y,
             CAST(COUNT(*) AS DECIMAL(19,0)) AS c
      FROM lineitem GROUP BY 1, 2, 3
    ), conc AS (
      SELECT a.g, SUM(a.c * b.c) AS cc
      FROM cells a JOIN cells b
        ON a.g = b.g AND a.x < b.x AND a.y < b.y
      GROUP BY a.g
    ), disc AS (
      SELECT a.g, SUM(a.c * b.c) AS dd
      FROM cells a JOIN cells b
        ON a.g = b.g AND a.x < b.x AND a.y > b.y
      GROUP BY a.g
    ), mx AS (
      SELECT g, SUM(cx * (cx - 1) / 2) AS n1 FROM (
        SELECT g, x, SUM(c) AS cx FROM cells GROUP BY 1, 2
      ) GROUP BY g
    ), my AS (
      SELECT g, SUM(cy * (cy - 1) / 2) AS n2 FROM (
        SELECT g, y, SUM(c) AS cy FROM cells GROUP BY 1, 2
      ) GROUP BY g
    ), tot AS (
      SELECT g, SUM(c) AS n, SUM(c) * (SUM(c) - 1) / 2 AS n0
      FROM cells GROUP BY g
    )
    SELECT t.g AS l_returnflag, CAST(t.n AS BIGINT) AS n_items,
           CAST(co.cc AS BIGINT) AS concordant,
           CAST(di.dd AS BIGINT) AS discordant,
           round((CAST(CAST(co.cc AS VARCHAR) AS DOUBLE)
                  - CAST(CAST(di.dd AS VARCHAR) AS DOUBLE))
                 / sqrt(CAST(CAST(t.n0 - x.n1 AS VARCHAR) AS DOUBLE)
                        * CAST(CAST(t.n0 - y.n2 AS VARCHAR) AS DOUBLE)),
                 9) + 0.0 AS tau_b
    FROM tot t
      JOIN conc co ON t.g = co.g
      JOIN disc di ON t.g = di.g
      JOIN mx x ON t.g = x.g
      JOIN my y ON t.g = y.g
    """,
    tags=("connector", "statistics", "rank-correlation"))
def stats_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KENDALL'S TAU-B per return flag between line quantity and line
    number — the rank-correlation twin of stats_spearman_corr that is
    robust to the MASSIVE ties both columns carry (50 and 7 distinct
    values): tau_b = (C - D) / sqrt((n0 - n1)(n0 - n2)) with C/D the
    concordant/discordant pair counts and n1/n2 the within-column tie
    pair counts.

    The naive computation enumerates n^2/2 row pairs — unshippable.
    This plan exploits the discreteness the ties come from: aggregate
    to the |X| x |Y| CONTINGENCY CELLS first (one hash aggregate over
    the fact), then count pairs cell-against-cell — C = sum over cell
    pairs with x_i < x_j, y_i < y_j of c_i*c_j, D likewise with y
    reversed — an inequality self-join on a ~350-row aggregated
    relation per group (Theil-Sen's discipline: pick the family member
    whose pair structure collapses). Every count is exact DECIMAL
    integer algebra (products at (19,0)x(19,0) -> exact (38,0), safe to
    ~1e19 rows); tau itself is ONE fixed-shape double expression over
    those integers, round(9)+0.0, with the DuckDB decimal->double cast
    routed through VARCHAR (the moments-row ulp discipline). The
    BIGINT-cast C/D output columns bound the fixture domain, not the
    algorithm — the decimal core never leaves 38 digits.

    Scale shape: one fact-scale hash aggregate; everything after lives
    on |cells| rows (broadcastable), so the inequality join is a tiny
    nested loop by construction, not a fact-scale cross product."""
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("g"),
        F.col("l_quantity").alias("x"),
        F.col("l_linenumber").alias("y"))
    # checkpoint barrier: five consumers (conc/disc/marginals/total)
    # read the ~|X|x|Y|x|groups|-row cells relation — without it each
    # would rescan and re-aggregate the fact (plan-pinned: one scan)
    cells = (li.groupBy("g", "x", "y")
             .agg(F.count(F.lit(1)).cast("decimal(19,0)").alias("c"))
             .localCheckpoint(eager=True))
    a = cells.select(F.col("g").alias("ag"), F.col("x").alias("ax"),
                     F.col("y").alias("ay"), F.col("c").alias("ac"))
    b = cells.select(F.col("g").alias("bg"), F.col("x").alias("bx"),
                     F.col("y").alias("by"), F.col("c").alias("bc"))
    conc = (a.join(F.broadcast(b),
                   (F.col("ag") == F.col("bg"))
                   & (F.col("ax") < F.col("bx"))
                   & (F.col("ay") < F.col("by")))
            .groupBy(F.col("ag").alias("g"))
            .agg(F.sum(F.col("ac") * F.col("bc")).alias("cc")))
    disc = (a.join(F.broadcast(b),
                   (F.col("ag") == F.col("bg"))
                   & (F.col("ax") < F.col("bx"))
                   & (F.col("ay") > F.col("by")))
            .groupBy(F.col("ag").alias("g"))
            .agg(F.sum(F.col("ac") * F.col("bc")).alias("dd")))
    mx = (cells.groupBy("g", "x").agg(F.sum("c").alias("cx"))
          .groupBy("g")
          .agg(F.sum(F.col("cx") * (F.col("cx") - 1) / 2).alias("n1")))
    my = (cells.groupBy("g", "y").agg(F.sum("c").alias("cy"))
          .groupBy("g")
          .agg(F.sum(F.col("cy") * (F.col("cy") - 1) / 2).alias("n2")))
    tot = (cells.groupBy("g")
           .agg(F.sum("c").alias("n"),
                (F.sum("c") * (F.sum("c") - 1) / 2).alias("n0")))
    tau = ((F.col("cc").cast("double") - F.col("dd").cast("double"))
           / F.sqrt((F.col("n0") - F.col("n1")).cast("double")
                    * (F.col("n0") - F.col("n2")).cast("double")))
    return (tot.join(conc, "g").join(disc, "g").join(mx, "g").join(my, "g")
            .select(F.col("g").alias("l_returnflag"),
                    F.col("n").cast("bigint").alias("n_items"),
                    F.col("cc").cast("bigint").alias("concordant"),
                    F.col("dd").cast("bigint").alias("discordant"),
                    (F.round(tau, 9) + 0.0).alias("tau_b")))


@register(
    "orders_priority_markov",
    oracle="""
    WITH seq AS (
      SELECT o_custkey, o_orderpriority AS pri,
             LAG(o_orderpriority) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey) AS prev
      FROM orders
    ), trans AS (
      SELECT prev AS from_pri, pri AS to_pri, COUNT(*) AS n
      FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2
    ), rowtot AS (
      SELECT from_pri, SUM(n) AS rn FROM trans GROUP BY 1
    )
    SELECT t.from_pri, t.to_pri, CAST(t.n AS BIGINT) AS n_transitions,
           round(CAST(t.n AS DOUBLE) / CAST(r.rn AS DOUBLE), 9) + 0.0
             AS p_transition
    FROM trans t JOIN rowtot r ON t.from_pri = r.from_pri
    """,
    tags=("connector", "statistics", "sequence", "markov"))
def orders_priority_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST-ORDER MARKOV TRANSITION MATRIX over each customer's order
    priority sequence (ordered by order date, then key): for every
    (from, to) priority pair, the transition count and the
    row-normalized transition probability — the sequence-dependence
    screen behind churn models, next-action prediction, and the
    sessionized funnel rows, reduced to its exact-count core.

    Exactness: transitions are pure integer counts from one LAG over a
    deterministic per-customer order; p_transition is one double
    division, round(9)+0.0.

    Scale shape: the LAG window partitions by o_custkey — an entity key
    (fixture n/10, production millions), so partitions stay tiny and
    parallelism high (the GOOD window shape, per the Bollinger
    docstring's taxonomy); everything after the LAG is a hash aggregate
    down to |priorities|^2 = 25 rows and a broadcast-sized join."""
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = orders.select(
        F.col("o_orderpriority").alias("pri"),
        F.lag("o_orderpriority").over(w).alias("prev"))
    trans = (seq.where(F.col("prev").isNotNull())
             .groupBy(F.col("prev").alias("from_pri"),
                      F.col("pri").alias("to_pri"))
             .agg(F.count(F.lit(1)).alias("n")))
    rowtot = trans.groupBy("from_pri").agg(F.sum("n").alias("rn"))
    return (trans.join(F.broadcast(rowtot), "from_pri")
            .select("from_pri", "to_pri",
                    F.col("n").cast("bigint").alias("n_transitions"),
                    (F.round(F.col("n").cast("double")
                             / F.col("rn").cast("double"), 9) + 0.0)
                    .alias("p_transition")))


@register(
    "stats_js_divergence",
    oracle=f"""
    WITH ids AS (
      SELECT MIN(event_id) AS mn, MAX(event_id) AS mx FROM events
    ), ev AS (
      SELECT event_type, "value",
             CASE WHEN event_id <= (mn + mx) // 2 THEN 1 ELSE 0 END AS early
      FROM events, ids
    ), rng AS (
      SELECT event_type, MIN("value") AS vmin, MAX("value") AS vmax
      FROM ev GROUP BY 1
    ), binned AS (
      SELECT e.event_type, e.early,
             CASE WHEN r.vmax = r.vmin THEN 0
                  ELSE LEAST({PSI_BINS - 1},
                             CAST(FLOOR((e."value" - r.vmin)
                                  / ((r.vmax - r.vmin) / {PSI_BINS}.0))
                                  AS INT)) END AS bin
      FROM ev e JOIN rng r ON e.event_type = r.event_type
    ), counts AS (
      SELECT event_type, bin, SUM(early) AS ce, SUM(1 - early) AS cl
      FROM binned GROUP BY 1, 2
    ), grid AS (
      SELECT t.event_type, CAST(g.range AS INT) AS bin
      FROM (SELECT DISTINCT event_type FROM ev) t, range({PSI_BINS}) g
    ), filled AS (
      SELECT g.event_type, g.bin,
             COALESCE(c.ce, 0) AS ce, COALESCE(c.cl, 0) AS cl
      FROM grid g LEFT JOIN counts c
        ON g.event_type = c.event_type AND g.bin = c.bin
    ), tot AS (
      SELECT event_type, SUM(ce) AS ne, SUM(cl) AS nl
      FROM filled GROUP BY 1
    ), pq AS (
      SELECT f.event_type, f.bin, t.ne, t.nl,
             (CAST(f.ce AS DOUBLE) + 1.0)
               / (CAST(t.ne AS DOUBLE) + {PSI_BINS}.0) AS p,
             (CAST(f.cl AS DOUBLE) + 1.0)
               / (CAST(t.nl AS DOUBLE) + {PSI_BINS}.0) AS q
      FROM filled f JOIN tot t ON f.event_type = t.event_type
    ), contribs AS (
      SELECT event_type, bin, ne, nl,
             0.5 * (p * ln(p / ((p + q) / 2.0)))
             + 0.5 * (q * ln(q / ((p + q) / 2.0))) AS contrib
      FROM pq
    )
    SELECT event_type,
           CAST(MAX(ne) AS BIGINT) AS n_early,
           CAST(MAX(nl) AS BIGINT) AS n_late,
           round(list_reduce(list_prepend(0.0, list(contrib ORDER BY bin)),
                             (a, b) -> a + b), 6) + 0.0 AS js
    FROM contribs GROUP BY event_type
    """,
    tags=("connector", "statistics", "drift"))
def stats_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JENSEN-SHANNON DIVERGENCE per event_type between the id-ordered
    first and second halves of the event log — the SYMMETRIC, bounded
    ([0, ln 2]) companion to stats_psi_binned_drift: PSI explodes when a
    bin's share collapses toward zero (its ln(p/q) term is unbounded),
    while JS stays finite and comparable across features, which is why
    drift dashboards track both. Same construction as the PSI row
    (id-midpoint split, per-type equal-width {PSI_BINS}-bin grid
    densified in both engines, +1 Laplace smoothing) so the two scores
    are computed over the IDENTICAL binned relation; js = 0.5*sum(p *
    ln(p/m)) + 0.5*sum(q * ln(q/m)) with m = (p+q)/2.

    Exactness: integer bin counts; p, q, m are fixed-shape double
    expressions; the sum is an ORDERED fold over the bin list; round(6)
    absorbs the last-ulp libm ln() difference (the PSI discipline).

    Scale shape: identical to PSI — two fact scans, hash aggregates to
    the |types| x {PSI_BINS} grid, folds on the aggregated relation, no
    fact-scale shuffle after the binned counts."""
    ev = load(spark, sf_dir, "events").select(
        "event_id", "event_type", "value")
    ids = ev.agg(F.min("event_id").alias("mn"), F.max("event_id").alias("mx"))
    ev2 = (ev.crossJoin(F.broadcast(ids))
           .withColumn("early",
                       (F.col("event_id") <= F.expr("(mn + mx) div 2"))
                       .cast("int")))
    rng = ev2.groupBy("event_type").agg(F.min("value").alias("vmin"),
                                        F.max("value").alias("vmax"))
    binned = (ev2.join(F.broadcast(rng), "event_type")
              .select("event_type", "early",
                      F.when(F.col("vmax") == F.col("vmin"), F.lit(0))
                      .otherwise(F.least(
                          F.lit(PSI_BINS - 1),
                          F.floor((F.col("value") - F.col("vmin"))
                                  / ((F.col("vmax") - F.col("vmin"))
                                     / float(PSI_BINS))).cast("int")))
                      .alias("bin")))
    counts = (binned.groupBy("event_type", "bin")
              .agg(F.sum("early").alias("ce"),
                   F.sum(F.lit(1) - F.col("early")).alias("cl")))
    grid = (counts.select("event_type").distinct()
            .crossJoin(spark.range(PSI_BINS)
                       .select(F.col("id").cast("int").alias("bin"))))
    filled = (grid.join(counts, ["event_type", "bin"], "left")
              .fillna(0, ["ce", "cl"]))
    tot = filled.groupBy("event_type").agg(F.sum("ce").alias("ne"),
                                           F.sum("cl").alias("nl"))
    j = filled.join(F.broadcast(tot), "event_type")
    p = (F.col("ce").cast("double") + 1.0) \
        / (F.col("ne").cast("double") + float(PSI_BINS))
    q = (F.col("cl").cast("double") + 1.0) \
        / (F.col("nl").cast("double") + float(PSI_BINS))
    m = (p + q) / 2.0
    contribs = j.select(
        "event_type", "bin", "ne", "nl",
        (F.lit(0.5) * (p * F.log(p / m))
         + F.lit(0.5) * (q * F.log(q / m))).alias("contrib"))
    arr = F.transform(
        F.array_sort(F.collect_list(F.struct("bin", "contrib"))),
        lambda s: s["contrib"])
    return (contribs.groupBy("event_type")
            .agg(F.max("ne").cast("bigint").alias("n_early"),
                 F.max("nl").cast("bigint").alias("n_late"),
                 (F.round(F.aggregate(arr, F.lit(0.0),
                                      lambda a, x: a + x), 6)
                  + 0.0).alias("js")))


@register(
    "stats_cramers_v",
    oracle="""
    WITH obs AS (
      SELECT c.c_mktsegment AS segment, o.o_orderpriority AS priority,
             COUNT(*) AS o
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ), marg AS (
      SELECT segment, priority, o,
             SUM(o) OVER (PARTITION BY segment) AS rt,
             SUM(o) OVER (PARTITION BY priority) AS ct,
             SUM(o) OVER () AS n
      FROM obs
    ), contribs AS (
      SELECT segment, priority, n,
             (CAST(o AS DOUBLE)
              - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(o AS DOUBLE)
                - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
                  / CAST(n AS DOUBLE))
             / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
               AS contrib
      FROM marg
    ), agg AS (
      SELECT CAST(MAX(n) AS BIGINT) AS n_orders,
             CAST(COUNT(DISTINCT segment) AS BIGINT) AS r,
             CAST(COUNT(DISTINCT priority) AS BIGINT) AS c,
             list_reduce(
               list_prepend(0.0, list(contrib ORDER BY segment, priority)),
               (a, b) -> a + b) AS chi2
      FROM contribs
    )
    SELECT n_orders, r AS n_segments, c AS n_priorities,
           round(chi2, 9) + 0.0 AS chi2,
           round(sqrt(chi2 / (CAST(n_orders AS DOUBLE)
                 * CAST(LEAST(r - 1, c - 1) AS DOUBLE))), 9) + 0.0
             AS cramers_v
    FROM agg
    """,
    tags=("connector", "statistics", "independence", "effect-size"))
def stats_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CRAMER'S V effect size over the segment x priority contingency —
    the companion stats_chi_square_independence needs to be read
    correctly at scale: chi2 grows linearly with n, so at 100 TB row
    counts EVERYTHING is "significant"; V = sqrt(chi2 / (n * min(r-1,
    c-1))) is the n-normalized [0, 1] association strength that stays
    comparable across datasets and is what a feature-audit actually
    thresholds on.

    Exactness: identical contingency construction (exact integer counts,
    ordered fold over (segment, priority)); V adds one sqrt on the
    1-row aggregate; round(9) on both chi2 and V absorbs last-ulp libm
    differences.

    Scale shape: one keyed join + hash aggregate to the 25-cell
    relation; windows, fold, and sqrt all run on constant-bounded
    rows."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    obs = (orders.join(customer, orders.o_custkey == customer.c_custkey)
           .groupBy(F.col("c_mktsegment").alias("segment"),
                    F.col("o_orderpriority").alias("priority"))
           .agg(F.count(F.lit(1)).alias("o")))
    marg = obs.select(
        "segment", "priority", "o",
        F.sum("o").over(Window.partitionBy("segment")).alias("rt"),
        F.sum("o").over(Window.partitionBy("priority")).alias("ct"),
        F.sum("o").over(Window.partitionBy()).alias("n"))
    e = (F.col("rt").cast("double") * F.col("ct").cast("double")
         / F.col("n").cast("double"))
    contribs = marg.select(
        "segment", "priority", "n",
        ((F.col("o").cast("double") - e)
         * (F.col("o").cast("double") - e) / e).alias("contrib"))
    arr = F.transform(
        F.array_sort(F.collect_list(F.struct("segment", "priority",
                                             "contrib"))),
        lambda s: s["contrib"])
    agg = contribs.groupBy().agg(
        F.max("n").cast("bigint").alias("n_orders"),
        F.countDistinct("segment").cast("bigint").alias("n_segments"),
        F.countDistinct("priority").cast("bigint").alias("n_priorities"),
        F.aggregate(arr, F.lit(0.0), lambda a, x: a + x).alias("chi2_raw"))
    dof_min = F.least(F.col("n_segments") - 1,
                      F.col("n_priorities") - 1).cast("double")
    return agg.select(
        "n_orders", "n_segments", "n_priorities",
        (F.round(F.col("chi2_raw"), 9) + 0.0).alias("chi2"),
        (F.round(F.sqrt(F.col("chi2_raw")
                        / (F.col("n_orders").cast("double") * dof_min)), 9)
         + 0.0).alias("cramers_v"))
