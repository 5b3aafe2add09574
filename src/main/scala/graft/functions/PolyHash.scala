package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** JVM side of the polynomial rolling hash, shared by interpreted eval and
  * generated code. Folds unicode code points left-to-right:
  * `h' = (h * mult + codePoint) mod modulo`. With `modulo < 2^32` the
  * intermediate `h * mult` never overflows a signed 64-bit long for any
  * mult < 2^31, so the fold is exact — and reproducible in any engine with
  * 64-bit integer arithmetic (the DuckDB oracle replays it with
  * `list_reduce` over `ord()`).
  */
object PolyHashImpl {
  def hash(s: UTF8String, mult: Long, mod: Long): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * mult + cp) % mod
      i += Character.charCount(cp)
    }
    h
  }
}

/** Native Catalyst expression for document fingerprinting (rolling hash) —
  * codegen'd so it stays inside WholeStageCodegen instead of breaking the
  * stage like a Scala UDF would. Used for content-addressed dedup keys and
  * shingle hashing at 100 TB scale, where the hash runs once per
  * row/shingle in the scan stage.
  */
case class PolyHash(child: Expression, mult: Long, modulo: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    PolyHashImpl.hash(input.asInstanceOf[UTF8String], mult, modulo)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PolyHashImpl.hash($c, ${mult}L, ${modulo}L)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  /** 2^31 - 1: keeps `h * 131` well inside Long range. */
  val DefaultMod: Long = 2147483647L
  val DefaultMult: Long = 131L

  def polyHash(c: Column, mult: Long = DefaultMult, mod: Long = DefaultMod): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(PolyHash(ColumnBridge.expression(c), mult, mod))
  }

  /** Salted mixing hash: polyHash applied TWICE, salt leading the outer
    * fold — `polyHash(salt + ":" + str(polyHash(id + ":" + salt)))`.
    *
    * One fold is LINEAR in character values: two inputs differing in one
    * position differ by (Δchar · mult^k) mod M — for a trailing salt
    * that is a near-constant additive shift across every id, so "new
    * salt" rotates an ordering instead of reshuffling it, and for short
    * strings the fold never wraps the modulus at all (order-preserving
    * in the id). The decimal re-stringification between the folds is
    * the nonlinear step; the outer fold then multiplies every
    * difference — the salt's and the id's — by `mult` per remaining
    * char with per-step wrapping, which diffuses them through all
    * output bits. Use THIS (never a bare salted polyHash) wherever the
    * salt is supposed to give an independent-looking order or sample:
    * [[graft.text.Sampling.hashBucket]], epoch sharding, balanced picks.
    */
  def saltedHash(id: Column, salt: String): Column = {
    import org.apache.spark.sql.functions.{concat, lit}
    polyHash(concat(lit(salt + ":"),
      polyHash(concat(id.cast("string"), lit(":" + salt))).cast("string")))
  }
}
