package graft.queries

import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables

/** Round-7 decision-science wave: exact Markov removal-effect
  * attribution (Cramer-solved absorption probabilities), the chained
  * Laspeyres index (integer fold over year links), the bullwhip
  * ratio, the tie-collapsed two-sample Anderson-Darling statistic,
  * and the skyline (Pareto-dominance) operator. Determinant and
  * probability fragments are Scala-generated once and inlined into
  * BOTH engines.
  */
object DecisionQueries {

  val all: Seq[Q] = Seq(q421, q422, q423, q424, q425)

  /** 4×4 determinant expanded along the first row into signed det3
    * minors — generated, so the Cramer systems in q421 share one op
    * order. */
  private def det4(m: Seq[Seq[String]]): String = {
    def minor(c: Int): String = {
      val r = m.drop(1).map(row =>
        row.zipWithIndex.filter(_._2 != c).map(_._1))
      EconQueries.det3(r(0)(0), r(0)(1), r(0)(2),
        r(1)(0), r(1)(1), r(1)(2), r(2)(0), r(2)(1), r(2)(2))
    }
    s"(${m(0)(0)} * ${minor(0)} - ${m(0)(1)} * ${minor(1)}" +
      s" + ${m(0)(2)} * ${minor(2)} - ${m(0)(3)} * ${minor(3)})"
  }

  /** Markov removal-effect attribution — the chain-based sibling of
    * the positional attribution family (q171/q203/q339): session
    * journeys start → {click, view, signup}* → conversion/null give a
    * first-order transition matrix; conversion probability is the
    * EXACT absorption solve p = (I−Q)⁻¹b via Cramer determinants
    * (det3/det4 fragments, shared verbatim), and each channel's
    * removal effect is the conversion drop when its state is deleted
    * (its 3×3 subsystem). Counts are exact integers; only the
    * staged probability columns are doubles. */
  def q421: Q = {
    val froms = Seq("start" -> "s", "click" -> "k", "view" -> "v",
      "signup" -> "g")
    val tos = Seq("click" -> "k", "view" -> "v", "signup" -> "g",
      "conv" -> "c", "null" -> "n")
    // count + outflow column generators (shared names both engines)
    val cntSql = (for ((ft, fc) <- froms; (tt, tc) <- tos) yield
      s"sum(CASE WHEN f = '$ft' AND t = '$tt' THEN 1 ELSE 0 END)" +
        s" AS c_$fc$tc").mkString(",\n      ")
    val outSql = froms.map { case (ft, fc) =>
      s"sum(CASE WHEN f = '$ft' THEN 1 ELSE 0 END) AS n_$fc"
    }.mkString(",\n      ")
    def qf(i: String, j: String) =
      s"CASE WHEN n_$i > 0 THEN CAST(c_$i$j AS DOUBLE)" +
        s" / CAST(n_$i AS DOUBLE) ELSE 0.0 END"
    val qSql = (for (i <- Seq("s", "k", "v", "g"); j <- Seq("k", "v", "g"))
      yield s"${qf(i, j)} AS q$i$j").mkString(",\n      ")
    val bSql = Seq("s", "k", "v", "g")
      .map(i => s"${qf(i, "c")} AS b$i").mkString(",\n      ")
    // A = I − Q over transient states (s, k, v, g); no →start edges
    val aM = Seq(
      Seq("1.0", "(0.0 - qsk)", "(0.0 - qsv)", "(0.0 - qsg)"),
      Seq("0.0", "(1.0 - qkk)", "(0.0 - qkv)", "(0.0 - qkg)"),
      Seq("0.0", "(0.0 - qvk)", "(1.0 - qvv)", "(0.0 - qvg)"),
      Seq("0.0", "(0.0 - qgk)", "(0.0 - qgv)", "(1.0 - qgg)"))
    val bV = Seq("bs", "bk", "bv", "bg")
    def col0(m: Seq[Seq[String]], b: Seq[String]) =
      m.zip(b).map { case (row, bi) => bi +: row.drop(1) }
    val pFull = s"CASE WHEN (${det4(aM)}) <> 0.0" +
      s" THEN (${det4(col0(aM, bV))}) / (${det4(aM)}) END"
    def sub(idx: Int) = {
      val m = aM.zipWithIndex.filter(_._2 != idx).map(_._1
        .zipWithIndex.filter(_._2 != idx).map(_._1))
      val b = bV.zipWithIndex.filter(_._2 != idx).map(_._1)
      val d = EconQueries.det3(m(0)(0), m(0)(1), m(0)(2),
        m(1)(0), m(1)(1), m(1)(2), m(2)(0), m(2)(1), m(2)(2))
      val mb = col0(m, b)
      val dn = EconQueries.det3(mb(0)(0), mb(0)(1), mb(0)(2),
        mb(1)(0), mb(1)(1), mb(1)(2), mb(2)(0), mb(2)(1), mb(2)(2))
      s"CASE WHEN ($d) <> 0.0 THEN ($dn) / ($d) END"
    }
    val pmk = sub(1); val pmv = sub(2); val pmg = sub(3)
    def re(pm: String) = s"CASE WHEN p > 0.0 THEN 1.0 - $pm / p END"
    val reSum = s"(${re("pmk")} + ${re("pmv")} + ${re("pmg")})"
    def share(pm: String) = s"CASE WHEN ($reSum) > 0.0" +
      s" THEN (${re(pm)}) / ($reSum) END"
    def qm(x: String, scale: String) =
      s"CAST(floor(CAST(($x) * $scale AS DECIMAL(28,6))) AS BIGINT)"
    def outRow(ch: String, pm: String) =
      s"SELECT '$ch' AS channel, ${qm("p", "1000")} AS base_milli, " +
        s"${qm(pm, "1000")} AS p_minus_milli, " +
        s"${qm(re(pm), "1000")} AS removal_milli, " +
        s"${qm(share(pm), "1000000")} AS share_ppm FROM sol"
    Q("q421_markov_removal_attribution",
      Some(s"""
        |WITH ${SeriesQueries.sqlSessionCtes},
        |rows_ AS (
        |  SELECT user_id, grp, event_type AS ty,
        |         row_number() OVER (PARTITION BY user_id, grp
        |           ORDER BY t, event_id) AS rn
        |  FROM g
        |  WHERE event_type IN ('click', 'view', 'signup', 'purchase')),
        |pr AS (SELECT user_id, grp, min(rn) AS prn FROM rows_
        |       WHERE ty = 'purchase' GROUP BY 1, 2),
        |kept AS (
        |  SELECT r.user_id, r.grp, r.ty, r.rn, pr.prn
        |  FROM rows_ r LEFT JOIN pr
        |    ON pr.user_id = r.user_id AND pr.grp = r.grp
        |  WHERE pr.prn IS NULL OR r.rn <= pr.prn),
        |tr AS (
        |  SELECT coalesce(lag(ty) OVER (PARTITION BY user_id, grp
        |           ORDER BY rn), 'start') AS f,
        |         CASE WHEN ty = 'purchase' THEN 'conv' ELSE ty END AS t
        |  FROM kept
        |  UNION ALL
        |  SELECT ty AS f, 'null' AS t
        |  FROM (SELECT user_id, grp, ty, prn, rn,
        |               max(rn) OVER (PARTITION BY user_id, grp) AS mx
        |        FROM kept)
        |  WHERE prn IS NULL AND rn = mx),
        |cnt AS (
        |  SELECT $cntSql,
        |      $outSql
        |  FROM tr),
        |qs AS (
        |  SELECT $qSql,
        |      $bSql
        |  FROM cnt),
        |sol AS (
        |  SELECT $pFull AS p, $pmk AS pmk, $pmv AS pmv, $pmg AS pmg
        |  FROM qs)
        |${outRow("click", "pmk")}
        |UNION ALL ${outRow("view", "pmv")}
        |UNION ALL ${outRow("signup", "pmg")}
        |ORDER BY channel
        |""".stripMargin)) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"), col("grp"))
      val rows = SeriesQueries.sessionized(s, dir)
        .where(col("event_type")
          .isin("click", "view", "signup", "purchase"))
        .withColumn("rn", row_number().over(
          w.orderBy(col("ts"), col("event_id"))))
        .select(col("user_id"), col("grp"),
          col("event_type").as("ty"), col("rn"))
      val pr = rows.where(col("ty") === "purchase")
        .groupBy(col("user_id").as("__pu"), col("grp").as("__pg"))
        .agg(min(col("rn")).as("prn"))
      val kept = rows.join(pr,
        col("user_id") === col("__pu") && col("grp") === col("__pg"),
        "left")
        .where(col("prn").isNull || col("rn") <= col("prn"))
        .drop("__pu", "__pg")
        .materialize() // journeys feed both transition branches
      val trans = kept
        .withColumn("f", coalesce(lag(col("ty"), 1).over(
          w.orderBy(col("rn"))), lit("start")))
        .select(col("f"),
          when(col("ty") === "purchase", "conv").otherwise(col("ty"))
            .as("t"))
        .unionAll(kept
          .withColumn("mx", max(col("rn")).over(w))
          .where(col("prn").isNull && col("rn") === col("mx"))
          .select(col("ty").as("f"), lit("null").as("t")))
      val cntCols = (for ((ft, fc) <- froms; (tt, tc) <- tos) yield
        sum(when(col("f") === ft && col("t") === tt, 1L).otherwise(0L))
          .as(s"c_$fc$tc")) ++
        froms.map { case (ft, fc) =>
          sum(when(col("f") === ft, 1L).otherwise(0L)).as(s"n_$fc")
        }
      val qCols =
        (for (i <- Seq("s", "k", "v", "g"); j <- Seq("k", "v", "g"))
          yield expr(qf(i, j)).as(s"q$i$j")) ++
          Seq("s", "k", "v", "g").map(i => expr(qf(i, "c")).as(s"b$i"))
      val sol = trans.agg(cntCols.head, cntCols.tail: _*)
        .select(qCols: _*)
        .select(expr(pFull).as("p"), expr(pmk).as("pmk"),
          expr(pmv).as("pmv"), expr(pmg).as("pmg"))
      def row(ch: String, pm: String) = sol.select(
        lit(ch).as("channel"),
        expr(qm("p", "1000")).as("base_milli"),
        expr(qm(pm, "1000")).as("p_minus_milli"),
        expr(qm(re(pm), "1000")).as("removal_milli"),
        expr(qm(share(pm), "1000000")).as("share_ppm"))
      row("click", "pmk").unionAll(row("view", "pmv"))
        .unionAll(row("signup", "pmg"))
        .orderBy(col("channel"))
    }
  }

  /** Chained Laspeyres price index: each year's link re-bases on the
    * PREVIOUS year's basket (the fix for q384's aging 1995 weights),
    * and the chain multiplies links with an integer floor at every
    * step — c_t = (c_{t−1}·num_t) // den_t in arbitrary-precision
    * integers, replayed by a recursive CTE. The 6-row link dim is a
    * documented bounded collect on the Spark side. */
  def q422: Q = Q(
    "q422_chained_price_index",
    Some("""
      |WITH RECURSIVE py AS (
      |  SELECT l_partkey AS part, CAST(year(l_shipdate) AS BIGINT) AS y,
      |         sum(CAST(floor(CAST(l_extendedprice * (1.0 - l_discount)
      |              AS DECIMAL(18,9)) * 100) AS BIGINT)) AS net,
      |         sum(CAST(l_quantity AS BIGINT)) AS qty
      |  FROM lineitem GROUP BY 1, 2),
      |up AS (SELECT part, y, (1000 * net) // qty AS upm, qty FROM py),
      |links AS (
      |  SELECT cur.y, count(*) AS n_parts,
      |         sum(CAST(cur.upm AS HUGEINT) * prev.qty) AS num,
      |         sum(CAST(prev.upm AS HUGEINT) * prev.qty) AS den
      |  FROM up cur JOIN up prev
      |    ON prev.part = cur.part AND prev.y = cur.y - 1
      |  GROUP BY 1),
      |ch AS (
      |  SELECT CAST(1995 AS BIGINT) AS y, CAST(0 AS BIGINT) AS n_parts,
      |         CAST(1000000 AS HUGEINT) AS link_ppm,
      |         CAST(1000000 AS HUGEINT) AS chained_ppm
      |  UNION ALL
      |  SELECT l.y, l.n_parts, (1000000 * l.num) // l.den,
      |         (ch.chained_ppm * l.num) // l.den
      |  FROM ch JOIN links l ON l.y = ch.y + 1)
      |SELECT y, CAST(n_parts AS BIGINT) AS n_parts,
      |       CAST(link_ppm AS BIGINT) AS link_ppm,
      |       CAST(chained_ppm AS BIGINT) AS chained_ppm
      |FROM ch WHERE y > 1995 ORDER BY y
      |""".stripMargin)) { (s, dir) =>
    val up = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey").as("part"),
        year(col("l_shipdate")).cast("long").as("y"))
      .agg(sum(floor((col("l_extendedprice")
          * (lit(1.0) - col("l_discount"))).cast("decimal(18,9)") * 100)
          .cast("long")).as("net"),
        sum(col("l_quantity").cast("long")).as("qty"))
      .select(col("part"), col("y"),
        expr("(1000 * net) div qty").as("upm"), col("qty"))
      .materialize() // part×year dim feeds both link legs
    val links = up.join(up.select(col("part").as("__pp"),
        (col("y") + 1).as("__py"), col("upm").as("__pu"),
        col("qty").as("__pq")),
      col("part") === col("__pp") && col("y") === col("__py"))
      .groupBy(col("y"))
      .agg(count(lit(1)).as("n_parts"),
        sum(col("upm").cast("decimal(38,0)") * col("__pq"))
          .cast("decimal(38,0)").as("num"),
        sum(col("__pu").cast("decimal(38,0)") * col("__pq"))
          .cast("decimal(38,0)").as("den"))
    // year-link dim: bounded (≤ calendar years) → documented collect;
    // the chain floor must see exact integers, hence BigInt
    val rows = links.orderBy(col("y")).collect()
    var chained = BigInt(1000000)
    val out = rows.map { r =>
      val num = BigInt(r.getDecimal(2).toBigInteger)
      val den = BigInt(r.getDecimal(3).toBigInteger)
      val link = (BigInt(1000000) * num) / den
      chained = (chained * num) / den
      (r.getLong(0), r.getLong(1), link.toLong, chained.toLong)
    }.toSeq
    import s.implicits._
    out.toDF("y", "n_parts", "link_ppm", "chained_ppm").orderBy(col("y"))
  }

  /** Bullwhip ratio: CV² of daily ORDERED quantity (demand signal,
    * by order date) over CV² of daily SHIPPED quantity (fulfillment,
    * by ship date) — >1000 milli means the pipeline amplifies
    * variability. Exact integer moments, one shared variance/mean²
    * fragment per side. */
  def q423: Q = {
    def cv2(n: String, s: String, ss: String) =
      s"((CAST($n AS DOUBLE) * CAST($ss AS DOUBLE)" +
        s" - CAST($s AS DOUBLE) * CAST($s AS DOUBLE))" +
        s" / (CAST($s AS DOUBLE) * CAST($s AS DOUBLE)))"
    val od = cv2("no", "so", "sso")
    val sd = cv2("ns", "ss_", "sss")
    def qm(x: String, scale: String) =
      s"CAST(floor(CAST(($x) * $scale AS DECIMAL(28,6))) AS BIGINT)"
    Q("q423_bullwhip_ratio",
      Some(s"""
        |WITH od AS (
        |  SELECT epoch_us(o.o_orderdate) // 86400000000 AS d,
        |         sum(CAST(l.l_quantity AS BIGINT)) AS q
        |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  GROUP BY 1),
        |sd AS (
        |  SELECT epoch_us(l_shipdate) // 86400000000 AS d,
        |         sum(CAST(l_quantity AS BIGINT)) AS q
        |  FROM lineitem GROUP BY 1),
        |m AS (
        |  SELECT
        |    (SELECT count(*) FROM od) AS no,
        |    (SELECT sum(q) FROM od) AS so,
        |    (SELECT sum(CAST(q AS HUGEINT) * q) FROM od) AS sso,
        |    (SELECT count(*) FROM sd) AS ns,
        |    (SELECT sum(q) FROM sd) AS ss_,
        |    (SELECT sum(CAST(q AS HUGEINT) * q) FROM sd) AS sss)
        |SELECT CAST(no AS BIGINT) AS n_order_days,
        |       CAST(ns AS BIGINT) AS n_ship_days,
        |       ${qm(od, "1000000")} AS cv2_order_micro,
        |       ${qm(sd, "1000000")} AS cv2_ship_micro,
        |       ${qm(s"($od) / ($sd)", "1000")} AS bullwhip_milli
        |FROM m
        |""".stripMargin)) { (s, dir) =>
      val d38 = "decimal(38,0)"
      val od = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderdate")),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) " +
          "div 86400000000").as("d"))
        .agg(sum(col("l_quantity").cast("long")).as("q"))
        .agg(count(lit(1)).as("no"), sum(col("q")).as("so"),
          sum(col("q").cast(d38) * col("q")).cast(d38).as("sso"))
      val sdf = Tables.lineitem(s, dir)
        .groupBy(expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) " +
          "div 86400000000").as("d"))
        .agg(sum(col("l_quantity").cast("long")).as("q"))
        .agg(count(lit(1)).as("ns"), sum(col("q")).as("ss_"),
          sum(col("q").cast(d38) * col("q")).cast(d38).as("sss"))
      od.crossJoin(broadcast(sdf))
        .select(col("no").as("n_order_days"),
          col("ns").as("n_ship_days"),
          expr(qm(od2, "1000000")).as("cv2_order_micro"),
          expr(qm(sd2, "1000000")).as("cv2_ship_micro"),
          expr(qm(s"($od2) / ($sd2)", "1000")).as("bullwhip_milli"))
    }
  }
  // shared CV² fragments for q423's Spark side (same strings as oracle)
  private def od2 = "((CAST(no AS DOUBLE) * CAST(sso AS DOUBLE)" +
    " - CAST(so AS DOUBLE) * CAST(so AS DOUBLE))" +
    " / (CAST(so AS DOUBLE) * CAST(so AS DOUBLE)))"
  private def sd2 = "((CAST(ns AS DOUBLE) * CAST(sss AS DOUBLE)" +
    " - CAST(ss_ AS DOUBLE) * CAST(ss_ AS DOUBLE))" +
    " / (CAST(ss_ AS DOUBLE) * CAST(ss_ AS DOUBLE)))"

  /** Two-sample Anderson-Darling (tie-collapsed Pettitt form) between
    * urgent-priority and other order totals: per distinct pooled
    * value, ℓ·(N·M − m·B)²/(B·(N−B)) with cumulative counts B/M from
    * TWO bucket-parallel globalRankCum passes over the value dim (no
    * fact-sized total-order window), each term micro-quantized before
    * the order-free sum, final ÷(m·n) exact. The tail-weighted
    * sibling of q345's KS. */
  def q424: Q = {
    val term = "CAST(floor(CAST(1000000.0 * CAST(l AS DOUBLE)" +
      " * (CAST(nn * mx - m * bb AS DOUBLE)" +
      " * CAST(nn * mx - m * bb AS DOUBLE))" +
      " / (CAST(bb AS DOUBLE) * CAST(nn - bb AS DOUBLE))" +
      " AS DECIMAL(28,6))) AS BIGINT)"
    Q("q424_anderson_darling",
      Some(s"""
        |WITH v AS (
        |  SELECT CAST(o_totalprice * 100 AS BIGINT) AS cents,
        |         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
        |           AS is_x
        |  FROM orders),
        |vd AS (
        |  SELECT cents, count(*) AS l, sum(is_x) AS lx
        |  FROM v GROUP BY 1),
        |t AS (SELECT sum(l) AS nn, sum(lx) AS m FROM vd),
        |c AS (
        |  SELECT cents, l,
        |         CAST(sum(l) OVER (ORDER BY cents) AS BIGINT) AS bb,
        |         CAST(sum(lx) OVER (ORDER BY cents) AS BIGINT) AS mx
        |  FROM vd),
        |terms AS (
        |  SELECT $term AS tm
        |  FROM c CROSS JOIN t WHERE bb < nn),
        |agg AS (SELECT sum(tm) AS s_micro FROM terms)
        |SELECT CAST(t.m AS BIGINT) AS m_urgent,
        |       CAST(t.nn - t.m AS BIGINT) AS n_other,
        |       CAST(agg.s_micro // (t.m * (t.nn - t.m)) AS BIGINT)
        |         AS a2_micro
        |FROM agg CROSS JOIN t
        |""".stripMargin)) { (s, dir) =>
      val vd = Tables.orders(s, dir)
        .select((col("o_totalprice") * 100).cast("decimal(38,0)")
          .cast("long").as("cents"),
          when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)
            .as("is_x"))
        .groupBy(col("cents"))
        .agg(count(lit(1)).as("l"), sum(col("is_x")).as("lx"))
        .withColumn("__bkt", expr("cents div 100000"))
        .materialize() // value dim feeds totals and both cum passes
      val t = vd.agg(sum(col("l")).as("nn"), sum(col("lx")).as("m"))
      val cb = graft.dedup.SortedNeighborhood.globalRankCum(
        vd, idCol = "cents", bucketCol = "__bkt", tieCols = Nil,
        cumCol = Some("l"))
        .select(col("cents"), col("l"), col("__cum").as("bb"))
      val cm = graft.dedup.SortedNeighborhood.globalRankCum(
        vd, idCol = "cents", bucketCol = "__bkt", tieCols = Nil,
        cumCol = Some("lx"))
        .select(col("cents").as("__c2"), col("__cum").as("mx"))
      cb.join(cm, col("cents") === col("__c2"))
        .crossJoin(broadcast(t))
        .where(col("bb") < col("nn"))
        .select(expr(term).as("tm"))
        .agg(sum(col("tm")).as("s_micro"))
        .crossJoin(broadcast(t))
        .select(col("m").as("m_urgent"),
          (col("nn") - col("m")).as("n_other"),
          expr("CAST(s_micro div (m * (nn - m)) AS BIGINT)")
            .as("a2_micro"))
    }
  }

  /** Skyline (Pareto frontier) of suppliers over q412's three
    * criteria — revenue ↑, return rate ↓, lead time ↓: a supplier
    * survives unless some other supplier is at least as good on all
    * three and strictly better on one. Dominance is an exact-integer
    * anti-join on the supplier dim; at fact scale the dim aggregate
    * comes first, so the quadratic test never touches fact rows. */
  def q425: Q = Q(
    "q425_supplier_skyline",
    Some("""
      |WITH su AS (
      |  SELECT l.l_suppkey AS supp,
      |         sum(CAST(floor(CAST(l.l_extendedprice
      |              * (1.0 - l.l_discount) AS DECIMAL(18,9)) * 100)
      |              AS BIGINT)) AS rev,
      |         (1000000 * sum(CASE WHEN l.l_returnflag = 'R'
      |                        THEN 1 ELSE 0 END)) // count(*) AS ret,
      |         (1000 * sum(date_diff('day', o.o_orderdate,
      |                               l.l_shipdate))) // count(*) AS ld
      |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      |  GROUP BY 1)
      |SELECT CAST(a.supp AS BIGINT) AS supp,
      |       CAST(a.rev AS BIGINT) AS revenue_cents,
      |       CAST(a.ret AS BIGINT) AS return_ppm,
      |       CAST(a.ld AS BIGINT) AS lead_milli
      |FROM su a
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM su b
      |  WHERE b.rev >= a.rev AND b.ret <= a.ret AND b.ld <= a.ld
      |    AND (b.rev > a.rev OR b.ret < a.ret OR b.ld < a.ld))
      |ORDER BY supp
      |""".stripMargin)) { (s, dir) =>
    val su = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderdate")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_suppkey").as("supp"))
      .agg(sum(floor((col("l_extendedprice")
          * (lit(1.0) - col("l_discount"))).cast("decimal(18,9)") * 100)
          .cast("long")).as("net"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("nr"),
        sum(datediff(col("l_shipdate"), col("o_orderdate")).cast("long"))
          .as("sl"),
        count(lit(1)).as("n"))
      .select(col("supp"), col("net").as("rev"),
        expr("(1000000 * nr) div n").as("ret"),
        expr("(1000 * sl) div n").as("ld"))
      .materialize() // supplier dim feeds both sides of the dominance
    su.join(su.select(col("supp").as("__bs"), col("rev").as("__br"),
        col("ret").as("__bt"), col("ld").as("__bl")),
      col("__br") >= col("rev") && col("__bt") <= col("ret") &&
        col("__bl") <= col("ld") &&
        (col("__br") > col("rev") || col("__bt") < col("ret") ||
          col("__bl") < col("ld")),
      "left_anti")
      .select(col("supp"), col("rev").as("revenue_cents"),
        col("ret").as("return_ppm"), col("ld").as("lead_milli"))
      .orderBy(col("supp"))
  }
}
