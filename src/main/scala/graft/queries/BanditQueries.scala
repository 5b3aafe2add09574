package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

/** Round-11 bandit-replay wave II — offline multi-armed-bandit
  * replay on the brand×month reward grid (25 brands as arms, months
  * as steps, rewards = month revenue milli-normalized by the global
  * max cell): a UCB1 replay, its cumulative-regret checkpoints
  * against the best fixed arm, a pure-greedy contrast replay,
  * deterministic successive halving, and UCB exploration
  * accounting.
  *
  * The replay is genuinely sequential (each pick depends on the full
  * history): Spark runs it as a single-group
  * [[graft.operators.OrderedFold]] whose rows are months carrying
  * the arm-indexed reward array, with the trajectory emitted at
  * group end and cached as a SpineCache table; the oracle replays
  * the IDENTICAL recursion as a RECURSIVE CTE carrying the per-arm
  * count/sum lists. The UCB index
  * mean + 1000·√(2·ln t / n_i) is ONE shared double text — both
  * engines read identical integer state, so argmax (first index of
  * the max — DuckDB list_position ≡ the fold's strictly-greater
  * scan) matches exactly. Ties and the init phase (each arm once,
  * in arm order) are stated.
  *
  * Scale: ONE lineitem⋈part pass (the brand_day spine) aggregates
  * to the 25×~84 grid; the replay itself is month-dim work. */
object BanditQueries {

  val all: Seq[Q] = Seq(q1166, q1167, q1168, q1169, q1170)

  /** Oracle reward-grid CTEs ending in pm(arm, m, r) (dense, milli
    * rewards) and na(na)/nm(nm). */
  private def sqlPm: String = """
    |bd AS (SELECT p.p_brand AS br, CAST(l.l_shipdate AS DATE) AS dd,
    |              sum(CAST(l.l_extendedprice * 100 AS BIGINT)) AS z
    |       FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    |       GROUP BY 1, 2),
    |bm0 AS (SELECT br, (year(dd) - 1992) * 12 + month(dd) AS mraw,
    |              sum(z) AS rev
    |        FROM bd GROUP BY 1, 2),
    |mi AS (SELECT mraw, dense_rank() OVER (ORDER BY mraw) AS m
    |       FROM (SELECT DISTINCT mraw FROM bm0) q),
    |ar AS (SELECT br, dense_rank() OVER (ORDER BY br) AS arm
    |       FROM (SELECT DISTINCT br FROM bm0) q),
    |mx AS (SELECT max(rev) AS mr FROM bm0),
    |grid AS (SELECT ar.arm, mi.m FROM ar CROSS JOIN mi),
    |bm AS (SELECT ar.arm, mi.m, bm0.rev
    |       FROM bm0 JOIN ar ON ar.br = bm0.br
    |       JOIN mi ON mi.mraw = bm0.mraw),
    |pm AS (SELECT g.arm, g.m,
    |         coalesce((1000 * bm.rev) // (SELECT mr FROM mx), 0) AS r
    |       FROM grid g LEFT JOIN bm ON bm.arm = g.arm AND bm.m = g.m),
    |na AS (SELECT count(*) AS na FROM ar),
    |nm AS (SELECT count(*) AS nm FROM mi)""".stripMargin

  /** Shared UCB index text (lists sums/cnts, month t). */
  private def sqlUcbStep(greedy: Boolean): String = {
    val idx =
      if (greedy)
        "list_transform(range(1, len(sums) + 1), i ->" +
          " CAST(sums[i] AS DOUBLE) / cnts[i])"
      else
        "list_transform(range(1, len(sums) + 1), i ->" +
          " CAST(sums[i] AS DOUBLE) / cnts[i]" +
          " + 1000.0 * sqrt(2.0 * ln(CAST(m + 1 AS DOUBLE)) / cnts[i]))"
    s"""
    |pz AS (
    |  SELECT 0 AS m, CAST(0 AS BIGINT) AS pick, CAST(0 AS BIGINT) AS rew,
    |         CAST(0 AS BIGINT) AS cum, CAST(1 AS BIGINT) AS exploit,
    |         (SELECT list_transform(range(1, na.na + 1),
    |            i -> CAST(0 AS BIGINT)) FROM na) AS sums,
    |         (SELECT list_transform(range(1, na.na + 1),
    |            i -> CAST(0 AS BIGINT)) FROM na) AS cnts
    |  UNION ALL
    |  SELECT q.m + 1, q.pick2, pm.r, q.cum + pm.r, q.exploit2,
    |         list_transform(range(1, len(q.sums) + 1),
    |           i -> CASE WHEN i = q.pick2 THEN q.sums[i] + pm.r
    |                ELSE q.sums[i] END),
    |         list_transform(range(1, len(q.cnts) + 1),
    |           i -> CASE WHEN i = q.pick2 THEN q.cnts[i] + 1
    |                ELSE q.cnts[i] END)
    |  FROM (
    |    SELECT z.m, z.cum, z.sums, z.cnts,
    |      CASE WHEN z.m + 1 <= len(z.sums) THEN z.m + 1
    |           ELSE list_position(z.u, list_max(z.u)) END AS pick2,
    |      CASE WHEN z.m + 1 <= len(z.sums) THEN 1
    |           WHEN list_position(z.u, list_max(z.u))
    |             = list_position(z.mn, list_max(z.mn)) THEN 1
    |           ELSE 0 END AS exploit2
    |    FROM (SELECT m, cum, sums, cnts, $idx AS u,
    |            list_transform(range(1, len(sums) + 1), i ->
    |              CAST(sums[i] AS DOUBLE) / cnts[i]) AS mn
    |          FROM pz, nm WHERE m < nm.nm) z
    |  ) q JOIN pm ON pm.arm = q.pick2 AND pm.m = q.m + 1),
    |traj AS (SELECT m, pick, rew, cum, exploit FROM pz WHERE m >= 1)""".stripMargin
  }

  /** Spark (arm, m, r) dense milli-reward grid — ONE brand_day
    * month aggregate, SpineCache-backed (≤ 25×84 rows). */
  private def pmGrid(s: SparkSession, dir: String): DataFrame =
    graft.sources.SpineCache.table(s, dir, "brand_month_rewards",
      Seq("lineitem", "part")) {
      val bd = BrandPortfolioQueries.brandDay(s, dir)
      val bm0 = bd.groupBy(col("br"),
        ((year(col("dd")) - 1992) * 12 + month(col("dd"))).as("mraw"))
        .agg(sum(col("z")).as("rev"))
      val mi = bm0.select(col("mraw")).distinct()
        .select(col("mraw"),
          dense_rank().over(Window.orderBy(col("mraw"))).as("m"))
      val ar = bm0.select(col("br")).distinct()
        .select(col("br"),
          dense_rank().over(Window.orderBy(col("br"))).as("arm"))
      val mx = bm0.agg(max(col("rev")).as("mr"))
      val grid = ar.select(col("arm")).crossJoin(mi.select(col("m")))
      val bm = bm0.join(ar, "br").join(mi, "mraw")
        .select(col("arm").as("arm2"), col("m").as("m2"), col("rev"))
      grid.join(bm,
        col("arm2") === col("arm") && col("m2") === col("m"),
        "left_outer")
        .crossJoin(broadcast(mx))
        .select(col("arm"), col("m"),
          coalesce(expr("(1000 * rev) div mr"), lit(0L)).as("r"))
    }

  /** Spark trajectory spine: the single-group OrderedFold replay
    * (ucb or greedy), cached as parquet. Emits one row per month:
    * (m, pick, rew, cum, exploit). */
  private def traj(s: SparkSession, dir: String,
      greedy: Boolean): DataFrame = {
    val key = if (greedy) "greedy_traj" else "ucb_traj"
    graft.sources.SpineCache.table(s, dir, key,
      Seq("lineitem", "part")) {
      val pm = pmGrid(s, dir)
      val rows = pm.groupBy(col("m"))
        .agg(expr("transform(sort_array(collect_list(struct(arm, r)))," +
          " x -> x.r)").as("rw"))
        .select(lit(0L).as("g"), col("m").cast("long").as("m"),
          col("rw"))
      val out = StructType(Seq(
        StructField("m", LongType, nullable = false),
        StructField("pick", LongType, nullable = false),
        StructField("rew", LongType, nullable = false),
        StructField("cum", LongType, nullable = false),
        StructField("exploit", LongType, nullable = false)))
      // state: per-arm sums/cnts + cumulative reward + trajectory
      class St {
        var sums: Array[Long] = null
        var cnts: Array[Long] = null
        var cum: Long = 0L
        val tr = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, Long, Long, Long)]
      }
      graft.operators.OrderedFold.foldGroups[St](
        rows, Seq("g"), Seq(col("m")), out)(
        init = _ => new St,
        step = { (st, row) =>
          val m = row.getLong(1)
          val rw = row.getArray(2).toLongArray()
          val nA = rw.length
          if (st.sums == null) {
            st.sums = new Array[Long](nA); st.cnts = new Array[Long](nA)
          }
          def mean(i: Int): Double = st.sums(i).toDouble / st.cnts(i)
          def ucb(i: Int): Double =
            st.sums(i).toDouble / st.cnts(i) +
              1000.0 * math.sqrt(2.0 * math.log(m.toDouble) / st.cnts(i))
          var pick = 0
          var exploit = 1L
          if (m <= nA) pick = m.toInt - 1
          else {
            var bi = 0
            var bu = if (greedy) mean(0) else ucb(0)
            var i = 1
            while (i < nA) {
              val u = if (greedy) mean(i) else ucb(i)
              if (u > bu) { bu = u; bi = i }
              i += 1
            }
            pick = bi
            var mi2 = 0; var bm2 = mean(0); var j = 1
            while (j < nA) {
              if (mean(j) > bm2) { bm2 = mean(j); mi2 = j }
              j += 1
            }
            exploit = if (pick == mi2) 1L else 0L
          }
          val r = rw(pick)
          st.sums(pick) += r; st.cnts(pick) += 1; st.cum += r
          st.tr += ((m, pick + 1L, r, st.cum, exploit))
          st
        },
        emit = (_, st) => st.tr.iterator.map { case (m, p, r, c, e) =>
          new GenericInternalRow(Array[Any](m, p, r, c, e))
        })
    }
  }

  /** UCB1 replay: per-arm final plays and reward mass (ties and init
    * phase stated in the object doc). */
  def q1166: Q = Q(
    "q1166_ucb1_replay",
    Some(s"""
      |WITH RECURSIVE ${sqlPm},${sqlUcbStep(greedy = false)}
      |SELECT CAST(pick AS BIGINT) AS arm,
      |       CAST(count(*) AS BIGINT) AS n_plays,
      |       CAST(sum(rew) AS BIGINT) AS reward_milli,
      |       CAST(max(cum) AS BIGINT) AS cum_at_last_play
      |FROM traj GROUP BY 1 ORDER BY arm
      |""".stripMargin)) { (s, dir) =>
    traj(s, dir, greedy = false)
      .groupBy(col("pick").as("arm"))
      .agg(count(lit(1)).as("n_plays"), sum(col("rew")).as("reward_milli"),
        max(col("cum")).as("cum_at_last_play"))
      .orderBy(col("arm"))
  }

  /** Cumulative regret vs the best fixed arm at 5 checkpoints
    * (months ⌈kM/5⌉). */
  def q1167: Q = Q(
    "q1167_ucb_regret_curve",
    Some(s"""
      |WITH RECURSIVE ${sqlPm},${sqlUcbStep(greedy = false)},
      |best AS (SELECT arm, sum(r) AS tot FROM pm GROUP BY 1
      |         ORDER BY tot DESC, arm LIMIT 1),
      |bcum AS (SELECT pm.m, sum(pm.r) OVER (ORDER BY pm.m
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bc
      |         FROM pm JOIN best ON best.arm = pm.arm),
      |ck AS (SELECT k, CAST(ceil(k * nm.nm / 5.0) AS BIGINT) AS mck
      |       FROM (VALUES (1),(2),(3),(4),(5)) v(k) CROSS JOIN nm)
      |SELECT CAST(ck.k AS BIGINT) AS checkpoint,
      |       CAST(ck.mck AS BIGINT) AS month,
      |       CAST(t.cum AS BIGINT) AS ucb_cum_milli,
      |       CAST(b.bc AS BIGINT) AS best_arm_cum_milli,
      |       CAST(b.bc - t.cum AS BIGINT) AS regret_milli
      |FROM ck JOIN traj t ON t.m = ck.mck
      |        JOIN bcum b ON b.m = ck.mck
      |ORDER BY checkpoint
      |""".stripMargin)) { (s, dir) =>
    import s.implicits._
    val t = traj(s, dir, greedy = false)
    val nm = t.agg(max(col("m")).as("nmv"))
    val pmBest = pmGrid(s, dir)
    val best = pmBest.groupBy(col("arm")).agg(sum(col("r")).as("tot"))
      .orderBy(col("tot").desc, col("arm")).limit(1)
      .select(col("arm").as("barm"))
    val bcum = pmBest.join(broadcast(best), col("arm") === col("barm"))
      .select(col("m").as("bm"),
        sum(col("r")).over(Window.orderBy(col("m"))
          .rowsBetween(Window.unboundedPreceding, 0)).as("bc"))
    val ck = broadcast(Seq(1, 2, 3, 4, 5).toDF("k"))
      .crossJoin(broadcast(nm))
      .select(col("k"),
        expr("CAST(ceil(k * nmv / 5.0) AS BIGINT)").as("mck"))
    ck.join(t, col("m") === col("mck"))
      .join(bcum, col("bm") === col("mck"))
      .select(col("k").cast("long").as("checkpoint"),
        col("mck").as("month"), col("cum").as("ucb_cum_milli"),
        col("bc").as("best_arm_cum_milli"),
        (col("bc") - col("cum")).as("regret_milli"))
      .orderBy(col("checkpoint"))
  }

  /** Pure-greedy contrast replay: total reward, arms ever played,
    * plays of the modal arm. */
  def q1168: Q = Q(
    "q1168_greedy_replay",
    Some(s"""
      |WITH RECURSIVE ${sqlPm},${sqlUcbStep(greedy = true)},
      |pl AS (SELECT pick, count(*) AS c FROM traj GROUP BY 1)
      |SELECT CAST(max(t.cum) AS BIGINT) AS total_reward_milli,
      |       CAST((SELECT count(*) FROM pl) AS BIGINT) AS arms_played,
      |       CAST((SELECT max(c) FROM pl) AS BIGINT) AS modal_arm_plays
      |FROM traj t
      |""".stripMargin)) { (s, dir) =>
    val t = traj(s, dir, greedy = true)
    val pl = t.groupBy(col("pick")).agg(count(lit(1)).as("c"))
    val ap = pl.agg(count(lit(1)).as("arms_played"),
      max(col("c")).as("modal_arm_plays"))
    t.agg(max(col("cum")).as("total_reward_milli"))
      .crossJoin(broadcast(ap))
      .select(col("total_reward_milli"),
        col("arms_played").cast("long").as("arms_played"),
        col("modal_arm_plays").cast("long").as("modal_arm_plays"))
  }

  /** Deterministic successive halving over 4 equal month blocks:
    * survivors halve each round by block mean reward (ties to the
    * smaller arm id). */
  def q1169: Q = Q(
    "q1169_successive_halving",
    Some(s"""
      |WITH ${sqlPm},
      |blk AS (SELECT pm.arm, pm.m, pm.r,
      |          1 + ((pm.m - 1) * 4) // nm.nm AS rnd
      |        FROM pm CROSS JOIN nm),
      |mr AS (SELECT rnd, arm, CAST(sum(r) AS BIGINT) AS tot, count(*) AS nmth
      |       FROM blk WHERE rnd <= 4 GROUP BY 1, 2),
      |r1 AS (SELECT arm, tot FROM mr WHERE rnd = 1
      |       ORDER BY tot DESC, arm LIMIT 12),
      |r2 AS (SELECT mr.arm, mr.tot FROM mr JOIN r1 ON r1.arm = mr.arm
      |       WHERE mr.rnd = 2 ORDER BY mr.tot DESC, mr.arm LIMIT 6),
      |r3 AS (SELECT mr.arm, mr.tot FROM mr JOIN r2 ON r2.arm = mr.arm
      |       WHERE mr.rnd = 3 ORDER BY mr.tot DESC, mr.arm LIMIT 3),
      |r4 AS (SELECT mr.arm, mr.tot FROM mr JOIN r3 ON r3.arm = mr.arm
      |       WHERE mr.rnd = 4 ORDER BY mr.tot DESC, mr.arm LIMIT 1)
      |SELECT 1 AS round, CAST(count(*) AS BIGINT) AS survivors,
      |       CAST(min(arm) AS BIGINT) AS min_arm,
      |       CAST(max(tot) AS BIGINT) AS top_reward_milli FROM r1
      |UNION ALL SELECT 2, count(*), min(arm), max(tot) FROM r2
      |UNION ALL SELECT 3, count(*), min(arm), max(tot) FROM r3
      |UNION ALL SELECT 4, count(*), min(arm), max(tot) FROM r4
      |ORDER BY round
      |""".stripMargin)) { (s, dir) =>
    val pm = pmGrid(s, dir)
    val nm = pm.agg(max(col("m")).as("nmv"))
    val mr = pm.crossJoin(broadcast(nm))
      .select(col("arm"), col("r"),
        expr("CAST(1 + ((m - 1) * 4) div nmv AS INT)").as("rnd"))
      .where(col("rnd") <= 4)
      .groupBy(col("rnd"), col("arm")).agg(sum(col("r")).as("tot"))
    def round(prev: Option[DataFrame], rnd: Int, keep: Int): DataFrame = {
      val base = mr.where(col("rnd") === rnd)
      val filtered = prev match {
        case Some(p) => base.join(broadcast(p.select(col("arm")
          .as("parm"))), col("arm") === col("parm")).drop("parm")
        case None => base
      }
      filtered.orderBy(col("tot").desc, col("arm")).limit(keep)
        .select(col("arm"), col("tot"))
    }
    val r1 = round(None, 1, 12)
    val r2 = round(Some(r1), 2, 6)
    val r3 = round(Some(r2), 3, 3)
    val r4 = round(Some(r3), 4, 1)
    def summ(df: DataFrame, rnd: Int) =
      df.agg(count(lit(1)).as("survivors"), min(col("arm")).as("min_arm"),
        max(col("tot")).as("top_reward_milli"))
        .select(lit(rnd.toLong).as("round"),
          col("survivors").cast("long").as("survivors"),
          col("min_arm").cast("long").as("min_arm"),
          col("top_reward_milli").cast("long").as("top_reward_milli"))
    summ(r1, 1).unionAll(summ(r2, 2)).unionAll(summ(r3, 3))
      .unionAll(summ(r4, 4)).orderBy(col("round"))
  }

  /** UCB exploration accounting per month quartile: explore picks,
    * distinct arms, modal-arm concentration. */
  def q1170: Q = Q(
    "q1170_ucb_exploration",
    Some(s"""
      |WITH RECURSIVE ${sqlPm},${sqlUcbStep(greedy = false)},
      |qq AS (SELECT t.m, t.pick, t.exploit,
      |         1 + ((t.m - 1) * 4) // nm.nm AS quart
      |       FROM traj t CROSS JOIN nm),
      |md AS (SELECT quart, max(c) AS modal FROM
      |        (SELECT quart, pick, count(*) AS c FROM qq
      |         WHERE quart <= 4 GROUP BY 1, 2) x GROUP BY 1)
      |SELECT CAST(q.quart AS BIGINT) AS quartile,
      |       CAST(count(*) AS BIGINT) AS n_months,
      |       CAST(sum(1 - q.exploit) AS BIGINT) AS explore_picks,
      |       CAST(count(DISTINCT q.pick) AS BIGINT) AS distinct_arms,
      |       CAST(max(md.modal) AS BIGINT) AS modal_arm_plays
      |FROM qq q JOIN md ON md.quart = q.quart
      |WHERE q.quart <= 4 GROUP BY 1 ORDER BY quartile
      |""".stripMargin)) { (s, dir) =>
    val t = traj(s, dir, greedy = false)
    val nm = t.agg(max(col("m")).as("nmv"))
    val qq = t.crossJoin(broadcast(nm))
      .select(col("m"), col("pick"), col("exploit"),
        expr("CAST(1 + ((m - 1) * 4) div nmv AS BIGINT)").as("quart"))
      .where(col("quart") <= 4)
    val md = qq.groupBy(col("quart").as("qm"), col("pick"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("qm")).agg(max(col("c")).as("modal"))
    qq.join(broadcast(md), col("quart") === col("qm"))
      .groupBy(col("quart").as("quartile"))
      .agg(count(lit(1)).as("n_months"),
        sum(lit(1L) - col("exploit")).as("explore_picks"),
        countDistinct(col("pick")).as("distinct_arms"),
        max(col("modal")).as("modal_arm_plays"))
      .orderBy(col("quartile"))
  }
}
