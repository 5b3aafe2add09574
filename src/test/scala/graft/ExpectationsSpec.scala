package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Expectations
import graft.operators.Expectations.Check

/** Round-5 wave 18: declarative data-quality expectations. */
class ExpectationsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("row checks count violations per check in one scan") {
    val t = Seq((1L, 5.0), (2L, -1.0), (3L, 0.0), (4L, 2.0))
      .toDF("id", "v")
    val got = Expectations.rowChecks(t, Seq(
      Check("v_positive", $"v" > 0),
      Check("v_small", $"v" < 100),
      Check("id_odd", $"id" % 2 === 1)))
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("v_positive", 4L, 2L), ("v_small", 4L, 0L),
      ("id_odd", 4L, 2L)))
    val plan = Expectations.rowChecks(t, Seq(Check("p", $"v" > 0)))
      .queryExecution.executedPlan.toString
    assert(plan.split("Scan").length - 1 <= 2, s"multi-scan report:\n$plan")
  }

  test("a null predicate result is a violation, not a pass") {
    val t = Seq(Some(1.0), None, Some(-2.0)).toDF("v")
    val got = Expectations.rowChecks(t, Seq(Check("pos", $"v" > 0)))
      .as[(String, Long, Long)].collect().head
    assert(got == (("pos", 3L, 2L)))
  }

  test("refCheck counts orphan foreign keys exactly, nulls exempt") {
    val facts = Seq(Some(1L), Some(2L), Some(99L), None, Some(98L), Some(1L))
      .toDF("fk")
    val dim = Seq(1L, 2L, 3L).toDF("pk")
    val got = Expectations.refCheck("fk_ok", facts, "fk", dim, "pk")
      .as[(String, Long, Long)].collect().head
    // 5 non-null FK rows; 99 and 98 are orphans
    assert(got == (("fk_ok", 5L, 2L)))
  }

  test("refCheck works when FK and PK share a column name, and with dup PKs") {
    val facts = Seq(1L, 2L, 99L).toDF("customer_id")
    val dim = Seq(1L, 1L, 2L).toDF("customer_id") // duplicate PK rows
    val got = Expectations.refCheck("fk_ok", facts, "customer_id",
      dim, "customer_id").as[(String, Long, Long)].collect().head
    // dup PKs must not double-count matched facts
    assert(got == (("fk_ok", 3L, 1L)))
  }

  test("observed checks ride the main action — zero extra passes") {
    import graft.operators.Expectations
    import org.apache.spark.sql.functions._
    val df = Seq((1, 5), (2, -1), (3, 0), (4, 7)).toDF("id", "v")
    val (instrumented, obs) = Expectations.observed(df, Seq(
      Expectations.Check("v_positive", col("v") > 0),
      Expectations.Check("id_small", col("id") < 4)))
    // the pipeline's OWN action evaluates the metrics
    assert(instrumented.count() == 4L)
    val m = obs.get()
    assert(m("n_rows") == 4L)
    assert(m("viol_v_positive") == 2L) // -1 and 0
    assert(m("viol_id_small") == 1L)   // id 4
  }

  test("observed metrics describe the rows the action processed") {
    import graft.operators.Expectations
    import org.apache.spark.sql.functions._
    val df = Seq((1, 5), (2, -1)).toDF("id", "v")
    val (instrumented, obs) = Expectations.observed(df, Seq(
      Expectations.Check("v_positive", col("v") > 0)))
    // a downstream filter BELOW the observe still sees both rows
    // (observe sits where it was attached)
    instrumented.where(col("v") > 0).count()
    assert(obs.get()("n_rows") == 2L)
  }

  test("observed() must not poison later ML-model closure serialization") {
    import graft.operators.Expectations
    import org.apache.spark.sql.functions._
    // regression: the Observation-object API initializes the session's
    // non-serializable ObservationManager; any fitted model whose
    // training summary holds the session then fails Task-serialization
    // in transform. The string-named observe must not arm that mine.
    val (inst, obs) = Expectations.observed(
      Seq((1, 2)).toDF("a", "b"),
      Seq(Expectations.Check("a_pos", col("a") > 0)))
    inst.count(); obs.get()
    val train = Seq((0.0, 0.1), (1.0, 0.9), (0.0, 0.2), (1.0, 0.8))
      .toDF("label", "x")
    val assembled = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(Array("x")).setOutputCol("features")
      .transform(train)
    val model = new org.apache.spark.ml.classification.LogisticRegression()
      .fit(assembled) // carries a trainingSummary referencing the session
    assert(model.transform(assembled).count() == 4L)
  }
}
