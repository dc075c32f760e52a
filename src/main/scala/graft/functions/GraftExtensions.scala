package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Expression

/** SQL registration for graft's native expressions, so `spark.sql`
  * users (and thriftserver/notebook sessions) can call them directly:
  *
  *   SELECT graft_minhash(text, 16), graft_simhash60(text) FROM docs
  *
  * Two wiring modes:
  *   - runtime: `graft.functions.registerAll(spark)`
  *   - config:  `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.registrations.foreach { case (name, builder) =>
      e.injectFunction(
        (org.apache.spark.sql.catalyst.FunctionIdentifier(name),
          new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
            classOf[GraftExtensions].getName, name),
          builder))
    }
}

object GraftExtensions {

  private def one(f: Expression => Expression): Seq[Expression] => Expression =
    args => f(args.head)

  val registrations: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_minhash" -> { args =>
      val k = args(1).eval(null).asInstanceOf[Number].intValue()
      MinHashSigExpr(args.head, k)
    },
    "graft_simhash60" -> one(SimHash60Expr(_)),
    "graft_word_shingles" -> one(WordShinglesExpr(_)),
    "graft_mingram_fp" -> one(MinGramFpExpr(_)),
    "graft_cosine" -> (args => CosineSimExpr(args(0), args(1))),
  )

  /** Runtime registration into an existing session. */
  def registerAll(spark: SparkSession): Unit =
    registrations.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
