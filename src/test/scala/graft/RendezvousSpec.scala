package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.Sharding

/** Round-6: rendezvous/HRW sharding — validity, determinism, and the
  * stability property that motivates it: growing the shard count moves
  * only the ids the new shard wins.
  */
class RendezvousSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def assign(n: Int, nShards: Int) =
    Sharding.rendezvousAssign(
      (1L to n.toLong).toDF("id"), "id", nShards, "s1")
      .select("id", "shard").as[(Long, Long)].collect().toMap

  test("every id gets exactly one shard in [0, n)") {
    val a = assign(500, 8)
    assert(a.size == 500)
    assert(a.values.forall(s => s >= 0 && s < 8))
    // balance sanity: no shard takes more than 3x its fair share
    val sizes = a.values.groupBy(identity).map(_._2.size)
    assert(sizes.max < 3 * 500 / 8)
  }

  test("assignment is deterministic across invocations") {
    assert(assign(200, 4) == assign(200, 4))
  }

  test("adding a shard only moves ids won by the new shard") {
    val before = assign(500, 8)
    val after = assign(500, 9)
    val moved = before.keys.filter(k => before(k) != after(k)).toSeq
    // every moved id must have moved TO the new shard 8 …
    assert(moved.forall(k => after(k) == 8L))
    // … and roughly 1/9 of ids move (generous envelope)
    assert(moved.size > 500 / 9 / 3 && moved.size < 3 * 500 / 9,
      s"moved ${moved.size}")
  }

  test("different salt reshuffles") {
    val a = Sharding.rendezvousAssign((1L to 300L).toDF("id"), "id", 8, "s1")
      .select("id", "shard").as[(Long, Long)].collect().toMap
    val b = Sharding.rendezvousAssign((1L to 300L).toDF("id"), "id", 8, "s2")
      .select("id", "shard").as[(Long, Long)].collect().toMap
    assert(a.keys.count(k => a(k) != b(k)) > 150)
  }
}
