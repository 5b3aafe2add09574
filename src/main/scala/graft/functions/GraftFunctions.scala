package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.dedup.Dedup

/** SQL registration of the native graft expressions, so `spark.sql` users
  * get the same kernels as the Column API:
  *
  *   graft_polyhash(str)            rolling-hash fingerprint
  *   graft_shingles(str, n)         word n-gram shingles
  *   graft_minhash(shingles, perms) MinHash signature
  *   graft_simhash(tokens)          32-bit SimHash
  *   graft_cosine(a, b)             cosine similarity
  *
  * Register at runtime with `GraftFunctions.register(spark)`, or at
  * session build time via `.withExtensions(new GraftExtensions)` /
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
object GraftFunctions {

  private def perms(n: Int) =
    ((0 until n).map(Dedup.permA).toArray, (0 until n).map(Dedup.permB).toArray)

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_polyhash" -> { es =>
      PolyHash(es.head, PolyHash.DefaultMult, PolyHash.DefaultMod)
    },
    "graft_shingles" -> { es =>
      SketchExprs.Shingles(es.head, es(1).eval().asInstanceOf[Int])
    },
    "graft_minhash" -> { es =>
      val n = es(1).eval().asInstanceOf[Int]
      val (a, b) = perms(n)
      SketchExprs.MinHashSig(es.head, n, PolyHash.DefaultMult, Dedup.Mod, a, b)
    },
    "graft_simhash" -> { es =>
      SketchExprs.SimHash64(es.head, 32, PolyHash.DefaultMult, Dedup.Mod)
    },
    "graft_cosine" -> { es => SketchExprs.CosineSim(es.head, es(1)) },
    "graft_canonical" -> { es => TextNorm.CanonicalText(es.head) })

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}

/** Conf-based injection: `spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.SketchExprs", name),
        builder))
    }
}
