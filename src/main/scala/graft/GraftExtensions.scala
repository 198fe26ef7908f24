package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering the engine's native Catalyst expressions
  * for SQL use (`SELECT vec_cosine(a, b) ...`):
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * // or: --conf spark.sql.extensions=graft.GraftExtensions
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "4.0.0", "", "scala_udf")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two float arrays"),
      (args: Seq[Expression]) =>
        VectorFunctions.DotProduct(args(0), args(1))))
    e.injectFunction((FunctionIdentifier("vec_cosine"),
      info("vec_cosine", "vec_cosine(a, b) - cosine similarity of two float arrays"),
      (args: Seq[Expression]) =>
        VectorFunctions.CosineSimilarity(args(0), args(1))))
    e.injectFunction((FunctionIdentifier("vec_l2"),
      info("vec_l2", "vec_l2(a, b) - euclidean distance of two float arrays"),
      (args: Seq[Expression]) =>
        VectorFunctions.L2Distance(args(0), args(1))))
  }
}

object GraftExtensions {
  /** Register the same functions on an already-built session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vec_dot",
      args => VectorFunctions.DotProduct(args(0), args(1)), "scala_udf")
    reg.createOrReplaceTempFunction("vec_cosine",
      args => VectorFunctions.CosineSimilarity(args(0), args(1)), "scala_udf")
    reg.createOrReplaceTempFunction("vec_l2",
      args => VectorFunctions.L2Distance(args(0), args(1)), "scala_udf")
  }
}
