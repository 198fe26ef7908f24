package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-validation on insert — the engine's Great-Expectations analog
  * (reference: python/hsfs/engine/spark.py:1055-1109 validate_with_great_
  * expectations; suites python/hsfs/expectation_suite.py).
  *
  * Row-local expectations compile to Column predicates and are evaluated
  * in ONE aggregation pass (violation counts per expectation — no
  * per-expectation scans); set-level expectations (uniqueness) take one
  * groupBy each. Validating a 100 TB insert costs one extra scan of the
  * batch plus one shuffle per set-level rule.
  */
object Validation {

  sealed trait Expectation { def name: String }

  /** Row-local predicate rule (null-tolerant: express nullability with
    * [[notNull]]).
    */
  final case class RowExpectation(name: String, predicate: Column)
      extends Expectation

  /** Set-level uniqueness rule (needs a shuffle). */
  final case class UniqueExpectation(name: String, column: String)
      extends Expectation

  final case class ExpectationResult(name: String, success: Boolean,
                                     unexpectedCount: Long,
                                     observedRows: Long)

  final case class ValidationReport(success: Boolean,
                                    results: Seq[ExpectationResult])

  // -- expectation builders (GE core expectation types) --------------------

  def notNull(c: String): Expectation =
    RowExpectation(s"not_null($c)", col(c).isNotNull)

  def between(c: String, min: Double, max: Double): Expectation =
    RowExpectation(s"between($c,$min,$max)",
      col(c).isNull || (col(c) >= min && col(c) <= max))

  def inSet(c: String, values: Seq[Any]): Expectation =
    RowExpectation(s"in_set($c)", col(c).isNull || col(c).isin(values: _*))

  def matchesRegex(c: String, regex: String): Expectation =
    RowExpectation(s"regex($c)", col(c).isNull || col(c).rlike(regex))

  def unique(c: String): Expectation = UniqueExpectation(s"unique($c)", c)

  /** Evaluate a suite: one agg pass for all row rules + one groupBy per
    * uniqueness rule.
    */
  def validate(df: DataFrame, suite: Seq[Expectation]): ValidationReport = {
    require(suite.nonEmpty, "empty expectation suite")
    val rowRules = suite.collect { case r: RowExpectation => r }
    val uniqueRules = suite.collect { case u: UniqueExpectation => u }

    val aggs = rowRules.zipWithIndex.map { case (e, i) =>
      sum(when(!e.predicate, 1L).otherwise(0L)).as(s"v$i")
    } :+ count(lit(1)).as("total")
    val row = df.agg(aggs.head, aggs.tail: _*).collect().head
    val total = row.getAs[Long]("total")

    val rowResults = rowRules.zipWithIndex.map { case (e, i) =>
      val bad = row.getAs[Long](s"v$i")
      ExpectationResult(e.name, bad == 0, bad, total)
    }
    val uniqueResults = uniqueRules.map { u =>
      // unexpected = rows participating in duplicate groups (GE semantics)
      val bad = df.groupBy(col(u.column)).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > 1)
        .agg(coalesce(sum(col("cnt")), lit(0L))).collect().head.getLong(0)
      ExpectationResult(u.name, bad == 0, bad, total)
    }
    val results = suite.map {
      case r: RowExpectation =>
        rowResults(rowRules.indexOf(r))
      case u: UniqueExpectation =>
        uniqueResults(uniqueRules.indexOf(u))
    }
    ValidationReport(results.forall(_.success), results)
  }

  /** Validation report as a DataFrame (for logging feature groups). */
  def validateDf(df: DataFrame, suite: Seq[Expectation]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    validate(df, suite).results
      .map(r => (r.name, r.success, r.unexpectedCount, r.observedRows))
      .toDF("expectation", "success", "unexpected_count", "observed_rows")
  }

  /** Ingestion gate: validate then either pass the batch through or throw
    * (reference "STRICT" validation_ingestion_policy).
    */
  def validateOrThrow(df: DataFrame, suite: Seq[Expectation]): DataFrame = {
    val report = validate(df, suite)
    if (!report.success) {
      val failed = report.results.filterNot(_.success)
        .map(r => s"${r.name}: ${r.unexpectedCount} violations")
      throw new IllegalStateException(
        s"validation failed — ${failed.mkString("; ")}")
    }
    df
  }

  // -- persistable suites ----------------------------------------------------

  /** Serializable expectation descriptor — the persisted form of a suite
    * (the runtime [[Expectation]] holds a Column and cannot be stored;
    * reference metadata CRUD: python/hsfs/expectation_suite.py).
    */
  sealed trait ExpectationSpec { def toExpectation: Expectation }
  final case class NotNullSpec(column: String) extends ExpectationSpec {
    def toExpectation: Expectation = notNull(column)
  }
  final case class BetweenSpec(column: String, min: Double, max: Double)
      extends ExpectationSpec {
    def toExpectation: Expectation = between(column, min, max)
  }
  final case class InSetSpec(column: String, values: Seq[String])
      extends ExpectationSpec {
    def toExpectation: Expectation = inSet(column, values)
  }
  final case class RegexSpec(column: String, regex: String)
      extends ExpectationSpec {
    def toExpectation: Expectation = matchesRegex(column, regex)
  }
  final case class UniqueSpec(column: String) extends ExpectationSpec {
    def toExpectation: Expectation = unique(column)
  }

  /** Validation-on-insert policy (reference validation_ingestion_policy):
    * STRICT rejects a failing batch; ALWAYS validates and lets it through.
    */
  object Policy {
    val Strict = "STRICT"
    val Always = "ALWAYS"
  }

  final case class SuiteDef(name: String, specs: Seq[ExpectationSpec],
                            policy: String = Policy.Strict) {
    def expectations: Seq[Expectation] = specs.map(_.toExpectation)
  }
}
