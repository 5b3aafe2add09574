package graft.operators
import graft.Materialize.MatOps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle counting — the graph-analytics kernel behind
  * clustering coefficients and community density, and the textbook
  * case of an orientation taming a join explosion. The naive
  * edges³ join is cubic; orienting every edge from its
  * lower-(degree, id) endpoint to the higher one makes each triangle
  * countable EXACTLY ONCE at its pivot (the vertex whose two edges
  * both point out), and bounds every vertex's out-degree by
  * O(√E) — so the wedge join materializes O(E^1.5) rows worst case
  * instead of Σdeg², which on a skewed graph (one celebrity vertex)
  * is the difference between feasible and not.
  *
  * Scale shape: a degree aggregate (one exchange), two broadcast-or-
  * shuffled equi-joins (Catalyst's call by size), all counts exact.
  */
object Triangles {

  /** Canonicalize an undirected edge list: self-loops dropped,
    * duplicates (either direction) collapsed, endpoints ordered
    * (src < dst). Null endpoints are dropped. */
  def canonical(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    edges
      .where(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("src"),
        greatest(col(srcCol), col(dstCol)).as("dst"))
      .distinct()

  /** The exact number of triangles in the undirected graph given by
    * `edges` (any direction, duplicates tolerated). Output: one row,
    * `n_triangles` long. */
  def triangleCount(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val canon = canonical(edges, srcCol, dstCol).materialize()
    val deg = canon.select(explode(array(col("src"), col("dst"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    // orient by (deg, id): strictly increasing along every edge, so
    // the orientation is acyclic and each triangle has ONE pivot
    val oriented = canon
      .join(deg.withColumnRenamed("v", "src")
        .withColumnRenamed("deg", "sdeg"), Seq("src"))
      .join(deg.withColumnRenamed("v", "dst")
        .withColumnRenamed("deg", "ddeg"), Seq("dst"))
      .select(
        when(col("sdeg") < col("ddeg") ||
          (col("sdeg") === col("ddeg") && col("src") < col("dst")),
          struct(col("src").as("u"), col("dst").as("w")))
          .otherwise(struct(col("dst").as("u"), col("src").as("w")))
          .as("e"))
      .select(col("e.u").as("u"), col("e.w").as("w"))
      .materialize()
    val wedges = oriented.select(col("u"), col("w").as("w1"))
      .join(oriented.select(col("u"), col("w").as("w2")), Seq("u"))
      .where(col("w1") < col("w2"))
    // the closing edge: wedge endpoints are id-ordered like canon's
    wedges
      .join(canon, col("w1") === col("src") && col("w2") === col("dst"),
        "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
  }
}
