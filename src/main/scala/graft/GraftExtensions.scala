package graft

import graft.functions.{DotProduct, DotProductInt8, MinHashSketch, QuantizeInt8, WordShingles}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistryBase
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions, so `spark.sql` users get them
  * without touching the Scala Column API:
  *
  *   spark.sql("SELECT dot_product(a.v, b.v) FROM ...")
  *   spark.sql("SELECT word_shingles(split(text, ' '), 3) FROM docs")
  *
  * and injects the [[graft.plans.DivRangePushdown]] optimizer rule
  * (derived-time-unit key predicates become parquet-pushable raw bounds).
  *
  * Activate with
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * or programmatically via `SparkSession.builder.withExtensions(new
  * GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotProduct)
    ext.injectFunction(GraftExtensions.wordShingles)
    ext.injectFunction(GraftExtensions.minhashSketch)
    ext.injectFunction(GraftExtensions.quantizeInt8)
    ext.injectFunction(GraftExtensions.dotInt8)
    ext.injectOptimizerRule(_ => graft.plans.DivRangePushdown)
  }
}

object GraftExtensions {
  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  val dotProduct: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("dot_product"),
    info("dot_product",
      "dot_product(a, b) - Sequential-fold dot product of two array<double> vectors."),
    { args =>
      require(args.length == 2, s"dot_product expects 2 arguments, got ${args.length}")
      DotProduct(args(0), args(1))
    })

  val wordShingles: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("word_shingles"),
    info("word_shingles",
      "word_shingles(tokens, n) - Generator emitting (pos, s) for every n-token shingle."),
    { args =>
      require(args.length == 2, s"word_shingles expects 2 arguments, got ${args.length}")
      val n = args(1) match {
        case e if e.foldable => e.eval().asInstanceOf[Number].intValue()
        case other => throw new IllegalArgumentException(
          s"word_shingles width must be a literal, got $other")
      }
      WordShingles(args(0), n)
    })

  val minhashSketch: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash_sketch"),
    info("minhash_sketch",
      "minhash_sketch(x) - Aggregate: K-permutation MinHash signature (array<bigint>) over a BIGINT base-hash column."),
    { args =>
      require(args.length == 1, s"minhash_sketch expects 1 argument, got ${args.length}")
      MinHashSketch(args(0)).toAggregateExpression()
    })

  val quantizeInt8: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("quantize_int8"),
    info("quantize_int8",
      "quantize_int8(v) - array<double> vector to int8-packed BINARY (symmetric scale 127)."),
    { args =>
      require(args.length == 1, s"quantize_int8 expects 1 argument, got ${args.length}")
      QuantizeInt8(args(0))
    })

  val dotInt8: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("dot_int8"),
    info("dot_int8",
      "dot_int8(a, b) - Integer dot product of two int8-packed BINARY vectors."),
    { args =>
      require(args.length == 2, s"dot_int8 expects 2 arguments, got ${args.length}")
      DotProductInt8(args(0), args(1))
    })
}
