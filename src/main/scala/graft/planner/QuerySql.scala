package graft.planner

import graft.ir._
import graft.model.FeatureGroup

/** IR → ANSI SQL generator: the analog of the reference's
  * `query.to_string()` surface, where the server-side constructor returns
  * the SQL string a query will execute
  * (python/hsfs/constructor/query.py:581-607 → fs_query.query /
  * core/query_constructor_api.py). Here the generator is in-process and
  * produces one portable statement — the SAME string runs under Spark SQL
  * (over temp views named per feature group) and under any ANSI engine
  * (the driver's DuckDB oracle), which is also how it is verified:
  * `spark.sql(toSql(q))` must equal `QueryPlanner.plan(spark, q)`
  * column-for-column (QuerySqlSpec), and q66 hash-matches DuckDB running
  * the very same text.
  *
  * Dialect choices for portability:
  *  - symmetric-key joins emit `USING (k…)` — both engines collapse the
  *    key pair into ONE unqualified column, matching the planner's
  *    `left.join(right, keys, type)` (coalesced under FULL);
  *  - LEFT SEMI / LEFT ANTI become correlated `[NOT] EXISTS` (Spark's
  *    `LEFT SEMI JOIN` syntax is not ANSI; EXISTS has identical
  *    null-key semantics to the planner's semi join);
  *  - identifiers are emitted bare (no backticks/quotes), so feature
  *    names must already be sanitized (Feature.sanitizeName).
  *
  * Semantics mirror [[QueryPlanner]] exactly: projection order, prefixing,
  * key inference, selected-asymmetric-key retention, ambiguity errors.
  * Time travel is NOT expressible here (it needs the lake's commit log,
  * not a plain table) — matching the reference, whose `to_string` of an
  * as-of query delegates to Hudi-specific SQL the offline engine alone
  * can run; we throw instead of emitting silently-wrong SQL.
  */
object QuerySql {

  import QueryPlanner.PlanError

  /** Render the query as one SQL statement.
    * @param nameOf table name per feature group (default: the group name;
    *               use `_.id` to address `name_version` registrations à la
    *               `FeatureStore.sql`)
    */
  def toSql(q: Query, nameOf: FeatureGroup => String = _.name): String = {
    val aliases = Iterator.from(0).map(i => s"t$i")
    render(q, Nil, nameOf, aliases).sql
  }

  private final case class Rendered(sql: String, out: Seq[String])

  /** Mirror of QueryPlanner.planKeeping: render `q`, guaranteeing
    * `extraCols` survive the final projection (join keys a parent needs).
    */
  private def render(q: Query, extraCols: Seq[String],
                     nameOf: FeatureGroup => String,
                     aliases: Iterator[String]): Rendered = {
    if (q.timeTravel.isDefined)
      throw new PlanError("time travel is not expressible in generated " +
        "SQL over plain tables — run it through QueryPlanner.plan " +
        "(the lake's commit log is not visible to an external engine)")
    val fg = q.leftFeatureGroup
    val t0 = aliases.next()

    val leftSelected: Seq[String] =
      if (q.features.nonEmpty) q.features.map(_.name)
      else if (fg.featureNames.nonEmpty) {
        // Select-all parity guard: QueryPlanner.plan expands an empty
        // projection to the MATERIALIZED frame's columns, while generated
        // SQL can only name the DECLARED features. When the physical
        // schema is statically known (a bound DataFrame source), refuse to
        // diverge silently — e.g. declared features gone stale after
        // schema evolution appended columns. For path/view sources the
        // declared features are authoritative (documented contract).
        fg.source match {
          case graft.model.DataFrameSource(df)
              if df.columns.toSeq != fg.featureNames =>
            throw new PlanError(s"select-all over ${fg.name}: declared " +
              s"features (${fg.featureNames.mkString(", ")}) do not match " +
              s"the bound frame's columns (${df.columns.mkString(", ")}) — " +
              "generated SQL would silently return a different column set " +
              "than QueryPlanner.plan; select explicitly or re-declare")
          case _ => ()
        }
        fg.featureNames
      }
      else throw new PlanError(s"select-all over ${fg.name} needs declared " +
        "features to generate SQL (schema is not inferable from text)")

    // where each OUTPUT (possibly prefixed) column lives; base-table
    // columns not in the projection remain reachable via t0 (the planner
    // keeps the full frame until its final select, so filters and later
    // join keys may use unselected columns)
    var exprOf: Map[String, String] =
      leftSelected.map(c => c -> s"$t0.$c").toMap
    def resolve(name: String): String = exprOf.getOrElse(name, s"$t0.$name")

    var out: Seq[String] = leftSelected
    var from = s"${nameOf(fg)} AS $t0"
    var existsConds: Seq[String] = Nil
    var sawSemi = false

    q.joins.foreach { j =>
      val rightFg = j.right.leftFeatureGroup
      val (lks, rks): (Seq[String], Seq[String]) =
        if (j.on.nonEmpty) (j.on, j.on)
        else if (j.leftOn.nonEmpty || j.rightOn.nonEmpty) {
          if (j.leftOn.size != j.rightOn.size)
            throw new PlanError(
              s"left_on/right_on length mismatch joining ${rightFg.name}")
          (j.leftOn, j.rightOn)
        } else {
          val inferred = fg.primaryKey.filter(rightFg.primaryKey.contains)
          if (inferred.isEmpty && j.joinType != JoinType.Cross &&
              j.joinType != JoinType.Comma)
            throw new PlanError(
              s"could not infer join keys between ${fg.name} and ${rightFg.name}")
          (inferred, inferred)
        }

      val sub = render(j.right, rks, nameOf, aliases)
      val tr = aliases.next()
      val prefix = j.prefix.getOrElse("")
      val semiLike =
        j.joinType == JoinType.LeftSemi || j.joinType == JoinType.LeftAnti
      val isCross = j.joinType == JoinType.Cross || j.joinType == JoinType.Comma
      if (sawSemi && (j.joinType == JoinType.Right || j.joinType == JoinType.Full))
        throw new PlanError("a right/full join after a semi/anti join is " +
          "not expressible as one flat SQL statement (EXISTS runs after " +
          "all joins) — reorder the joins or use QueryPlanner.plan")

      if (semiLike) {
        sawSemi = true
        // project ONLY the correlation keys, under reserved `_gk<i>`
        // aliases: a subquery exposing a column with the same name as an
        // unqualified outer reference (a USING-merged key) would capture
        // it — inner scope wins in both dialects — and silently correlate
        // against the wrong column
        val inner = aliases.next()
        val keyProj = rks.zipWithIndex
          .map { case (rk, i) => s"$inner.$rk AS _gk$i" }.mkString(", ")
        val corr = lks.zipWithIndex
          .map { case (lk, i) => s"$tr._gk$i = ${resolve(lk)}" }
          .mkString(" AND ")
        val neg = if (j.joinType == JoinType.LeftAnti) "NOT " else ""
        existsConds :+=
          s"${neg}EXISTS (SELECT 1 FROM (SELECT $keyProj FROM " +
            s"(${sub.sql}) AS $inner) AS $tr WHERE $corr)"
        // out unchanged: semi/anti keep only left columns
      } else {
        val joinWord = j.joinType match {
          case JoinType.Inner => "JOIN"
          case JoinType.Left  => "LEFT JOIN"
          case JoinType.Right => "RIGHT JOIN"
          case JoinType.Full  => "FULL JOIN"
          case _              => "CROSS JOIN"
        }
        val clause =
          if (isCross) s"CROSS JOIN (${sub.sql}) AS $tr"
          else if (j.on.nonEmpty) {
            // USING collapses the key pair into one unqualified column in
            // both dialects — rebind so later references see the merged
            // (FULL: coalesced) value, as the planner's using-join does
            lks.foreach { k => exprOf += k -> k }
            s"$joinWord (${sub.sql}) AS $tr USING (${lks.mkString(", ")})"
          } else {
            val cond = lks.zip(rks)
              .map { case (lk, rk) => s"${resolve(lk)} = $tr.$rk" }
              .mkString(" AND ")
            s"$joinWord (${sub.sql}) AS $tr ON $cond"
          }
        from = s"$from\n  $clause"

        // planner's rightOutCols: non-keys prefixed; keys survive only
        // when asymmetric AND selected, under their raw name
        val rightOutCols = sub.out.collect {
          case c if !rks.contains(c)                   => prefix + c
          case c if j.on.isEmpty && j.leftOn.nonEmpty  => c
        }
        sub.out.foreach {
          case c if !rks.contains(c)                  => exprOf += (prefix + c) -> s"$tr.$c"
          case c if j.on.isEmpty && j.leftOn.nonEmpty => exprOf += c -> s"$tr.$c"
          case _                                      => ()
        }
        val merged = out ++ rightOutCols
        val dups = merged.diff(merged.distinct).distinct
        if (dups.nonEmpty)
          throw new PlanError(s"ambiguous output columns after join with " +
            s"${rightFg.name}: ${dups.mkString(", ")} — set a join prefix")
        out = merged
      }
    }

    val whereParts =
      q.filter.map(f => s"(${renderFilter(f, resolve)})").toSeq ++ existsConds
    val where =
      if (whereParts.isEmpty) "" else s"\nWHERE ${whereParts.mkString(" AND ")}"

    val keep = out ++ extraCols.filterNot(out.contains)
    val selectList = keep.map { c =>
      val e = resolve(c)
      if (e == c) c else s"$e AS $c"
    }.mkString(", ")
    Rendered(s"SELECT $selectList\nFROM $from$where", out)
  }

  private def renderFilter(f: FilterExpr, resolve: String => String): String =
    f match {
      case FilterAnd(l, r) =>
        s"(${renderFilter(l, resolve)} AND ${renderFilter(r, resolve)})"
      case FilterOr(l, r) =>
        s"(${renderFilter(l, resolve)} OR ${renderFilter(r, resolve)})"
      case FilterLeaf(ref, cond, value) =>
        val c = resolve(ref.name)
        import FilterCondition._
        cond match {
          case Eq   => s"$c = ${literal(value)}"
          case Ne   => s"$c <> ${literal(value)}"
          case Gt   => s"$c > ${literal(value)}"
          case Ge   => s"$c >= ${literal(value)}"
          case Lt   => s"$c < ${literal(value)}"
          case Le   => s"$c <= ${literal(value)}"
          case Like => s"$c LIKE ${literal(value.toString)}"
          case In =>
            val vs = value match {
              case s: Seq[_]   => s
              case a: Array[_] => a.toSeq
              case other       => Seq(other)
            }
            s"$c IN (${vs.map(literal).mkString(", ")})"
        }
    }

  private def literal(v: Any): String = v match {
    case s: String =>
      // No portable rendering exists for a backslash: Spark's parser (with
      // default escapedStringLiterals=false) treats it as an escape
      // character while DuckDB and the planner's lit() take it literally —
      // fail loud rather than emit SQL that means different things to the
      // two engines (same policy as time travel above).
      if (s.contains("\\"))
        throw new PlanError("string literal containing a backslash is not " +
          s"portable across SQL dialects: $s — filter it through " +
          "QueryPlanner.plan instead")
      "'" + s.replace("'", "''") + "'"
    case b: Boolean             => if (b) "TRUE" else "FALSE"
    case d: java.sql.Date       => s"DATE '$d'"
    case t: java.sql.Timestamp  => s"TIMESTAMP '$t'"
    case n @ (_: Int | _: Long | _: Short | _: Byte | _: Double | _: Float) =>
      n.toString
    case bd: BigDecimal         => bd.toString
    case bd: java.math.BigDecimal => bd.toString
    case null                   => "NULL"
    case other => throw new PlanError(
      s"cannot render literal of ${other.getClass.getName} in generated SQL")
  }
}
