package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Round-6: property tests for the wave's exact operators — each
  * checked against an independent brute-force reference on arbitrary
  * inputs (the PropertySpec discipline: invariants for ANY input, not
  * fixtures). */
class OpsPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def checkProp(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: rankAuc's 2U equals brute-force pair counting with ties") {
    val gen = Gen.choose(1, 40).flatMap(n => Gen.listOfN(n,
      for { y <- Gen.oneOf(0, 1); s <- Gen.choose(0L, 6L) } yield (y, s)))
    checkProp(Prop.forAll(gen) { rows =>
      val df = rows.toDF("y", "s").withColumn("g", lit("g"))
      val out = graft.operators.Stats.rankAuc(df, Seq("g"), col("y"), col("s"))
        .collect().head
      val pos = rows.filter(_._1 == 1).map(_._2)
      val neg = rows.filter(_._1 == 0).map(_._2)
      // 2U = 2·#(pos>neg) + #(pos==neg), over all (pos, neg) pairs
      val u2 = (for (p <- pos; q <- neg) yield
        if (p > q) 2L else if (p == q) 1L else 0L).sum
      out.getLong(1) == pos.size.toLong &&
        out.getLong(2) == neg.size.toLong &&
        out.getDecimal(3).longValueExact == u2
    })
  }

  test("property: LabelProp equals a sequential synchronous-LPA simulator") {
    val genEdges = Gen.choose(1, 15).flatMap(n => Gen.listOfN(n,
      for { a <- Gen.choose(0L, 7L); b <- Gen.choose(0L, 7L) if a != b }
        yield (a, b)))
    checkProp(Prop.forAll(genEdges, Gen.choose(1, 4)) { (edges, rounds) =>
      edges.isEmpty || {
        val out = graft.operators.LabelProp.propagate(
            edges.toDF("a", "b"), "a", "b", rounds)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // reference: explicit synchronous rounds over the multigraph
        val adj = (edges ++ edges.map(e => (e._2, e._1)))
          .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
        var lab = adj.keys.map(v => v -> v).toMap
        for (_ <- 1 to rounds) {
          lab = lab.map { case (v, old) =>
            val votes = adj(v).map(lab).groupBy(identity)
              .view.mapValues(_.size).toMap
            val best = votes.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
            v -> (if (votes.isEmpty) old else best)
          }
        }
        out == lab
      }
    })
  }

  test("property: rollingActives equals brute-force window distinct") {
    val gen = Gen.choose(1, 30).flatMap(n => Gen.listOfN(n,
      for { u <- Gen.choose(0L, 5L); d <- Gen.choose(0L, 9L) } yield (u, d)))
    checkProp(Prop.forAll(gen, Gen.choose(1, 4)) { (rows, w) =>
      val out = graft.operators.Funnel.rollingActives(
          rows.toDF("u", "d"), "u", "d", w)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      val days = rows.map(_._2).distinct
      days.forall { day =>
        val dau = rows.filter(_._2 == day).map(_._1).distinct.size.toLong
        val roll = rows.filter(r => r._2 <= day && r._2 > day - w)
          .map(_._1).distinct.size.toLong
        out(day) == ((dau, roll))
      } && out.keySet == days.toSet
    })
  }

  test("property: kgramCounts equals a sliding-window reference") {
    val gen = Gen.choose(1, 25).flatMap(n => Gen.listOfN(n,
      for { u <- Gen.choose(0L, 2L); t <- Gen.choose(0L, 50L)
            c <- Gen.oneOf("a", "b", "c") } yield (u, t, c)))
    checkProp(Prop.forAll(gen, Gen.choose(2, 4)) { (rows0, k) =>
      // unique (ts, id): id = index
      val rows = rows0.zipWithIndex.map { case ((u, t, c), i) =>
        (u, t, i.toLong, c) }
      val out = graft.operators.Sequences.kgramCounts(
          rows.toDF("u", "ts", "id", "typ"), "u", "ts", "id", "typ", k)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      val ref = rows.groupBy(_._1).toSeq.flatMap { case (u, es) =>
        es.sortBy(e => (e._2, e._3)).map(_._4).sliding(k)
          .filter(_.size == k).map(g => (u, g.mkString(" "))).toSeq
      }
      val refCounts = ref.groupBy(_._2).map { case (g, occ) =>
        g -> ((occ.size.toLong, occ.map(_._1).distinct.size.toLong)) }
      out == refCounts
    })
  }
}
