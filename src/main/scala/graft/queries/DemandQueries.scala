package graft.queries

import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables

/** Round-7 demand-planning wave: index-number theory (Paasche/Fisher,
  * completing q384's Laspeyres), weighted order statistics, Croston's
  * intermittent-demand smoothing, the newsvendor quantile policy, and
  * binary-segmentation changepoint detection — the forecasting/
  * replenishment faces of the warehouse, each exact-integer or
  * pinned-IEEE end to end with a DuckDB oracle replaying the same
  * arithmetic.
  */
object DemandQueries {

  val all: Seq[Q] = Seq(q391, q392, q393, q394, q395)

  /** Paasche + Fisher price indices per year (base 1995): Paasche
    * re-weights by the CURRENT year's quantities (own basket), Fisher
    * is the geometric mean of the two — the index-number triple over
    * one (part, year) unit-price dim. Everything to the two ppm
    * integers is exact rational arithmetic (q384's discipline); the
    * Fisher sqrt runs on an exact ≤2^53 integer product, so the
    * correctly-rounded IEEE sqrt is bit-identical in both engines. */
  def q391: Q = Q(
    "q391_paasche_fisher_index",
    Some("""
      |WITH py AS (
      |  SELECT l_partkey AS part, CAST(year(l_shipdate) AS BIGINT) AS y,
      |         sum(CAST(floor(CAST(l_extendedprice * (1.0 - l_discount)
      |              AS DECIMAL(18,9)) * 100) AS BIGINT)) AS net,
      |         sum(CAST(l_quantity AS BIGINT)) AS qty
      |  FROM lineitem GROUP BY 1, 2),
      |up AS (SELECT part, y, (1000 * net) // qty AS upm, qty FROM py),
      |base AS (SELECT part, upm AS up0, qty AS q0 FROM up WHERE y = 1995),
      |idx AS (
      |  SELECT up.y, count(*) AS n_parts,
      |         sum(CAST(up.upm AS HUGEINT) * base.q0) AS lnum,
      |         sum(CAST(base.up0 AS HUGEINT) * base.q0) AS lden,
      |         sum(CAST(up.upm AS HUGEINT) * up.qty) AS pnum,
      |         sum(CAST(base.up0 AS HUGEINT) * up.qty) AS pden
      |  FROM up JOIN base USING (part)
      |  WHERE up.y <> 1995 GROUP BY 1),
      |px AS (
      |  SELECT y, n_parts,
      |         (1000000 * lnum) // lden AS lppm,
      |         (1000000 * pnum) // pden AS pppm
      |  FROM idx)
      |SELECT y, CAST(n_parts AS BIGINT) AS n_parts,
      |       CAST(lppm AS BIGINT) AS laspeyres_ppm,
      |       CAST(pppm AS BIGINT) AS paasche_ppm,
      |       CAST(floor(sqrt(CAST(lppm * pppm AS DOUBLE))) AS BIGINT)
      |         AS fisher_ppm
      |FROM px ORDER BY y
      |""".stripMargin)) { (s, dir) =>
    val d38 = "decimal(38,0)"
    val up = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey").as("part"),
        year(col("l_shipdate")).cast("long").as("y"))
      .agg(sum(floor((col("l_extendedprice")
          * (lit(1.0) - col("l_discount"))).cast("decimal(18,9)") * 100)
          .cast("long")).as("net"),
        sum(col("l_quantity").cast("long")).as("qty"))
      .select(col("part"), col("y"),
        expr("(1000 * net) div qty").as("upm"), col("qty"))
      .materialize() // part×year dim feeds the base AND the index join
    val base = up.where(col("y") === 1995)
      .select(col("part"), col("upm").as("up0"), col("qty").as("q0"))
    up.where(col("y") =!= 1995)
      .join(broadcast(base), Seq("part"))
      .groupBy(col("y"))
      .agg(count(lit(1)).as("n_parts"),
        sum(col("upm").cast(d38) * col("q0")).cast(d38).as("lnum"),
        sum(col("up0").cast(d38) * col("q0")).cast(d38).as("lden"),
        sum(col("upm").cast(d38) * col("qty")).cast(d38).as("pnum"),
        sum(col("up0").cast(d38) * col("qty")).cast(d38).as("pden"))
      .select(col("y"), col("n_parts"),
        expr("CAST((1000000 * lnum) div lden AS BIGINT)").as("lppm"),
        expr("CAST((1000000 * pnum) div pden AS BIGINT)").as("pppm"))
      .select(col("y"), col("n_parts"),
        col("lppm").as("laspeyres_ppm"), col("pppm").as("paasche_ppm"),
        expr("CAST(floor(sqrt(CAST(lppm * pppm AS DOUBLE))) AS BIGINT)")
          .as("fisher_ppm"))
      .orderBy(col("y"))
  }

  /** Quantity-weighted price quartiles per brand: "the price a
    * MEDIAN UNIT shipped at", not the median line — heavy lines count
    * by their volume (OrderStats.weightedQuantilesDisc). The
    * cumulative walk runs over the merged (brand, cents) value dim,
    * never the fact. */
  def q392: Q = Q(
    "q392_weighted_price_quartiles",
    Some("""
      |WITH v AS (
      |  SELECT p.p_brand AS brand,
      |         CAST(l.l_extendedprice * 100 AS BIGINT) AS cents,
      |         CAST(l.l_quantity AS BIGINT) AS w
      |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
      |a AS (SELECT brand, cents, sum(w) AS w FROM v GROUP BY 1, 2),
      |r AS (
      |  SELECT brand, cents, w,
      |         sum(w) OVER (PARTITION BY brand ORDER BY cents) AS cw,
      |         sum(w) OVER (PARTITION BY brand) AS tw
      |  FROM a)
      |SELECT brand, CAST(pm.p AS INTEGER) AS permille, r.cents AS value
      |FROM r JOIN (VALUES (250), (500), (750)) pm(p)
      |  ON r.cw - r.w < (pm.p * r.tw + 999) // 1000
      | AND (pm.p * r.tw + 999) // 1000 <= r.cw
      |ORDER BY brand, permille
      |""".stripMargin)) { (s, dir) =>
    val v = Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)),
        col("p_partkey") === col("l_partkey"))
      .select(col("p_brand").as("brand"),
        (col("l_extendedprice") * 100).cast("decimal(38,0)").cast("long")
          .as("cents"),
        col("l_quantity").cast("long").as("w"))
    graft.operators.OrderStats
      .weightedQuantilesDisc(v, Seq("brand"), "cents", "w",
        Seq(250, 500, 750))
      .orderBy(col("brand"), col("permille"))
  }

  /** Croston's method (α=0.2) over per-brand demand days: separate
    * EWMAs of the nonzero demand SIZE and the inter-demand INTERVAL,
    * forecast rate = size/interval — the intermittent-demand
    * forecaster. The fold is an OrderedFold (secondary-sorted, one
    * pass, 25 brand groups); the oracle replays the IDENTICAL IEEE op
    * sequence via list_reduce (q340's discipline: z′ = 0.2·q + 0.8·z,
    * p′ = 0.2·(d−pd) + 0.8·p, seed z=q₁, p=1), and only the three
    * final scalars are DECIMAL-quantized. */
  def q393: Q = Q(
    "q393_croston_brand_demand",
    Some("""
      |WITH d AS (
      |  SELECT p.p_brand AS brand,
      |         epoch_us(l.l_shipdate) // 86400000000 AS d,
      |         sum(CAST(l.l_quantity AS BIGINT)) AS q
      |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |  GROUP BY 1, 2),
      |v AS (
      |  SELECT brand,
      |         list({'z': CAST(q AS DOUBLE), 'p': CAST(0.0 AS DOUBLE),
      |               'pd': CAST(d AS DOUBLE)} ORDER BY d) AS vals,
      |         count(*) AS n
      |  FROM d GROUP BY brand),
      |f AS (
      |  SELECT brand, n, list_reduce(
      |    list_prepend([{'z': vals[1].z, 'p': CAST(1.0 AS DOUBLE),
      |                   'pd': vals[1].pd}],
      |      list_transform(vals[2:], x -> [x])),
      |    (acc, e) -> [{'z': 0.2 * e[1].z + 0.8 * acc[1].z,
      |                  'p': 0.2 * (e[1].pd - acc[1].pd)
      |                       + 0.8 * acc[1].p,
      |                  'pd': e[1].pd}]) AS st
      |  FROM v)
      |SELECT brand, CAST(n AS BIGINT) AS n_days,
      |       CAST(floor(CAST(st[1].z AS DECIMAL(28,6)) * 1000)
      |            AS BIGINT) AS size_milli,
      |       CAST(floor(CAST(st[1].p AS DECIMAL(28,6)) * 1000)
      |            AS BIGINT) AS interval_milli,
      |       CAST(floor(CAST(st[1].z / st[1].p AS DECIMAL(28,6)) * 1000)
      |            AS BIGINT) AS rate_milli
      |FROM f ORDER BY brand
      |""".stripMargin)) { (s, dir) =>
    import org.apache.spark.sql.types._
    val dem = Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)),
        col("p_partkey") === col("l_partkey"))
      .groupBy(col("p_brand").as("brand"),
        expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) " +
          "div 86400000000").as("d"))
      .agg(sum(col("l_quantity").cast("long")).as("q"))
      .select(col("brand"), col("d"), col("q"))
    val out = StructType(Seq(
      StructField("brand", StringType, nullable = false),
      StructField("n_days", LongType, nullable = false),
      StructField("zf", DoubleType, nullable = false),
      StructField("pf", DoubleType, nullable = false)))
    // state: (size EWMA, interval EWMA, prev day, rows); first row seeds
    graft.operators.OrderedFold.foldGroups[(Double, Double, Long, Long)](
      dem, Seq("brand"), Seq(col("d")), out)(
      init = _ => (0.0, 0.0, 0L, 0L),
      step = { case ((z, p, pd, n), row) =>
        val d = row.getLong(1)
        val q = row.getLong(2).toDouble
        if (n == 0L) (q, 1.0, d, 1L)
        else {
          val z2 = 0.2 * q + 0.8 * z
          val p2 = 0.2 * (d - pd).toDouble + 0.8 * p
          (z2, p2, d, n + 1)
        }
      },
      emit = (key, st) => Iterator(
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](key.getUTF8String(0).copy(), st._4, st._1, st._2))))
      .select(col("brand"), col("n_days"),
        expr("CAST(floor(CAST(zf AS DECIMAL(28,6)) * 1000) AS BIGINT)")
          .as("size_milli"),
        expr("CAST(floor(CAST(pf AS DECIMAL(28,6)) * 1000) AS BIGINT)")
          .as("interval_milli"),
        expr("CAST(floor(CAST(zf / pf AS DECIMAL(28,6)) * 1000) " +
          "AS BIGINT)").as("rate_milli"))
      .orderBy(col("brand"))
  }

  /** Newsvendor stocking policy per brand: underage costs 3× overage,
    * so the optimal order-up-to level is the 750‰ quantile of daily
    * demand (critical-ratio rule) — then the realized cost of that
    * policy vs the naive mean policy, replayed against the same
    * demand days. Demand-day grain (zero days carry no cost signal
    * under either policy's comparison and are stated out). All-integer
    * quantity units end to end. */
  def q394: Q = Q(
    "q394_newsvendor_policy",
    Some("""
      |WITH d AS (
      |  SELECT p.p_brand AS brand,
      |         epoch_us(l.l_shipdate) // 86400000000 AS d,
      |         sum(CAST(l.l_quantity AS BIGINT)) AS q
      |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |  GROUP BY 1, 2),
      |r AS (
      |  SELECT brand, q,
      |         row_number() OVER (PARTITION BY brand ORDER BY q) AS rn,
      |         count(*) OVER (PARTITION BY brand) AS n
      |  FROM d),
      |sel AS (SELECT brand, q AS q_opt, n FROM r
      |        WHERE rn = (750 * n + 999) // 1000),
      |mn AS (SELECT brand, sum(q) // count(*) AS q_mean FROM d
      |       GROUP BY 1),
      |c AS (
      |  SELECT d.brand,
      |         sum(CASE WHEN s.q_opt >= d.q THEN s.q_opt - d.q
      |                  ELSE 3 * (d.q - s.q_opt) END) AS cost_opt,
      |         sum(CASE WHEN m.q_mean >= d.q THEN m.q_mean - d.q
      |                  ELSE 3 * (d.q - m.q_mean) END) AS cost_mean
      |  FROM d JOIN sel s ON d.brand = s.brand
      |         JOIN mn m ON d.brand = m.brand
      |  GROUP BY 1)
      |SELECT c.brand, CAST(s.n AS BIGINT) AS n_days,
      |       CAST(s.q_opt AS BIGINT) AS q_opt,
      |       CAST(m.q_mean AS BIGINT) AS q_mean,
      |       CAST(c.cost_opt AS BIGINT) AS cost_opt,
      |       CAST(c.cost_mean AS BIGINT) AS cost_mean
      |FROM c JOIN sel s ON c.brand = s.brand
      |       JOIN mn m ON c.brand = m.brand
      |ORDER BY c.brand
      |""".stripMargin)) { (s, dir) =>
    val dem = Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)),
        col("p_partkey") === col("l_partkey"))
      .groupBy(col("p_brand").as("brand"),
        expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) " +
          "div 86400000000").as("d"))
      .agg(sum(col("l_quantity").cast("long")).as("q"))
      .select(col("brand"), col("d"), col("q"))
      .materialize() // brand-day dim feeds quantile, mean, AND cost
    val sel = graft.operators.OrderStats
      .quantilesDisc(dem, Seq("brand"), "q", Seq(750))
      .select(col("brand"), col("value").as("q_opt"))
    val stats = dem.groupBy(col("brand"))
      .agg(count(lit(1)).as("n_days"),
        expr("sum(q) div count(1)").as("q_mean"))
    val pol = sel.join(stats, Seq("brand")) // 25-row policy dim
    val cost = dem.join(broadcast(pol), Seq("brand"))
      .groupBy(col("brand"))
      .agg(sum(when(col("q_opt") >= col("q"), col("q_opt") - col("q"))
          .otherwise(lit(3L) * (col("q") - col("q_opt")))).as("cost_opt"),
        sum(when(col("q_mean") >= col("q"), col("q_mean") - col("q"))
          .otherwise(lit(3L) * (col("q") - col("q_mean"))))
          .as("cost_mean"))
    cost.join(broadcast(pol), Seq("brand"))
      .select(col("brand"), col("n_days"), col("q_opt"), col("q_mean"),
        col("cost_opt"), col("cost_mean"))
      .orderBy(col("brand"))
  }

  /** Binary-segmentation changepoint on the daily-revenue series: the
    * split maximizing the between-segment SSE gain diff²/(nl·nr)
    * where diff = sl·nr − sr·nl (prefix sums in whole dollars, so
    * diff stays long-exact). The ordering score and the reported
    * gain_ppm (gain normalized by s²/n) ride ONE shared double
    * expression — identical operand order in both engines, so the
    * argmax and the quantized output are deterministic. The only
    * ordered window runs over the daily dim (calendar-bounded, not
    * data-sized). */
  def q395: Q = {
    // shared IEEE fragment: both engines compute score identically
    val scoreExpr = "(CAST(diff AS DOUBLE) * CAST(diff AS DOUBLE))" +
      " / (CAST(nl AS DOUBLE) * CAST(nr AS DOUBLE))"
    Q("q395_revenue_changepoint",
      Some(s"""
        |WITH daily AS (
        |  SELECT epoch_us(l_shipdate) // 86400000000 AS d,
        |         CAST(sum(CAST(l_extendedprice * 100 AS HUGEINT)) // 100
        |              AS BIGINT) AS r
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT count(*) AS n, sum(r) AS s FROM daily),
        |c AS (
        |  SELECT d, row_number() OVER (ORDER BY d) AS nl,
        |         CAST(sum(r) OVER (ORDER BY d) AS BIGINT) AS sl
        |  FROM daily),
        |sc AS (
        |  SELECT c.d, c.nl, t.n - c.nl AS nr, c.sl,
        |         CAST(t.s - c.sl AS BIGINT) AS sr,
        |         c.sl * (t.n - c.nl) - CAST(t.s - c.sl AS BIGINT) * c.nl
        |           AS diff,
        |         CAST(t.s AS BIGINT) AS s, t.n
        |  FROM c CROSS JOIN t WHERE c.nl < t.n),
        |best AS (SELECT * FROM sc
        |         ORDER BY $scoreExpr DESC, d LIMIT 1)
        |SELECT CAST(d AS BIGINT) AS split_d, CAST(nl AS BIGINT) AS n_left,
        |       CAST(nr AS BIGINT) AS n_right,
        |       CAST(sl // nl AS BIGINT) AS mean_left,
        |       CAST(sr // nr AS BIGINT) AS mean_right,
        |       CAST(floor(CAST(
        |         1000000.0 * CAST(n AS DOUBLE) * ($scoreExpr)
        |         / (CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
        |       AS DECIMAL(18,6))) AS BIGINT) AS gain_ppm
        |FROM best
        |""".stripMargin)) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.lineitem(s, dir)
        .groupBy(expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) " +
          "div 86400000000").as("d"))
        .agg(expr("CAST(sum(CAST(l_extendedprice * 100 " +
          "AS DECIMAL(38,0))) div 100 AS BIGINT)").as("r"))
      val t = daily.agg(count(lit(1)).as("n"), sum(col("r")).as("s"))
      // daily dim is calendar-bounded → the total-order window is fine
      val w = Window.orderBy(col("d"))
      val c = daily
        .withColumn("nl", row_number().over(w).cast("long"))
        .withColumn("sl", sum(col("r")).over(w))
      c.crossJoin(broadcast(t))
        .where(col("nl") < col("n"))
        .select(col("d"), col("nl"), (col("n") - col("nl")).as("nr"),
          col("sl"), (col("s") - col("sl")).as("sr"),
          (col("sl") * (col("n") - col("nl"))
            - (col("s") - col("sl")) * col("nl")).as("diff"),
          col("s"), col("n"))
        .orderBy(expr(scoreExpr).desc, col("d"))
        .limit(1)
        .select(col("d").as("split_d"), col("nl").as("n_left"),
          col("nr").as("n_right"),
          expr("CAST(sl div nl AS BIGINT)").as("mean_left"),
          expr("CAST(sr div nr AS BIGINT)").as("mean_right"),
          expr(s"""CAST(floor(CAST(
            1000000.0 * CAST(n AS DOUBLE) * ($scoreExpr)
            / (CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
          AS DECIMAL(18,6))) AS BIGINT)""").as("gain_ppm"))
    }
  }
}
