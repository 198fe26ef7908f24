package graft.ir

import graft.model.FeatureGroup

/** Client-side relational IR, the analog of the reference's query AST
  * (python/hsfs/constructor/query.py:38-837, join.py:27-87,
  * filter.py:24-215). The planner (graft.planner.QueryPlanner) lowers this
  * IR directly to DataFrame transformations — no SQL-string round trip.
  */

// ---------------------------------------------------------------------------
// Filters
// ---------------------------------------------------------------------------

/** The 8 predicate conditions of the reference DSL
  * (python/hsfs/constructor/filter.py:25-32).
  */
sealed trait FilterCondition
object FilterCondition {
  case object Eq extends FilterCondition
  case object Ne extends FilterCondition
  case object Gt extends FilterCondition
  case object Ge extends FilterCondition
  case object Lt extends FilterCondition
  case object Le extends FilterCondition
  case object In extends FilterCondition
  case object Like extends FilterCondition
}

/** Reference to a feature, optionally qualified by the feature-group name
  * it came from (used for disambiguation across joins).
  */
final case class FeatureRef(name: String, fgName: Option[String] = None)

/** Boolean predicate tree: leaf conditions composed with AND/OR
  * (python/hsfs/constructor/filter.py:105-215).
  */
sealed trait FilterExpr {
  def &&(other: FilterExpr): FilterExpr = FilterAnd(this, other)
  def ||(other: FilterExpr): FilterExpr = FilterOr(this, other)
}
final case class FilterLeaf(feature: FeatureRef, cond: FilterCondition, value: Any)
    extends FilterExpr
final case class FilterAnd(left: FilterExpr, right: FilterExpr) extends FilterExpr
final case class FilterOr(left: FilterExpr, right: FilterExpr) extends FilterExpr

// ---------------------------------------------------------------------------
// Joins
// ---------------------------------------------------------------------------

/** Join types of the reference DSL (python/hsfs/constructor/join.py:28-34).
  * COMMA maps to a cross join.
  */
sealed abstract class JoinType(val spark: String)
object JoinType {
  case object Inner extends JoinType("inner")
  case object Left extends JoinType("left")
  case object Right extends JoinType("right")
  case object Full extends JoinType("full")
  case object Cross extends JoinType("cross")
  case object LeftSemi extends JoinType("left_semi")
  case object LeftAnti extends JoinType("left_anti")
  case object Comma extends JoinType("cross")
}

/** One join edge: right side is itself a query (nested joins allowed,
  * python/hsfs/constructor/query.py:812-822); `on` for symmetric keys,
  * `leftOn`/`rightOn` for asymmetric; empty keys → planner infers the
  * maximal matching subset of both sides' primary keys
  * (python/hsfs/constructor/query.py:247-248); `prefix` is prepended to
  * every right-side column in the output (join.py:43,51).
  */
final case class JoinSpec(
    right: Query,
    on: Seq[String] = Nil,
    leftOn: Seq[String] = Nil,
    rightOn: Seq[String] = Nil,
    joinType: JoinType = JoinType.Left,
    prefix: Option[String] = None
)

// ---------------------------------------------------------------------------
// Time travel
// ---------------------------------------------------------------------------

/** Per-branch time-travel bounds, epoch millis:
  * `asOf` = read state as of commit time ≤ t;
  * `excludeUntil` = only commits strictly after t0 (incremental read).
  * Reference: python/hsfs/constructor/query.py:299-392 (as_of),
  * python/hsfs/core/hudi_engine.py:180-219.
  */
final case class TimeTravel(asOf: Option[Long], excludeUntil: Option[Long] = None)

// ---------------------------------------------------------------------------
// Query
// ---------------------------------------------------------------------------

/** The query AST root (python/hsfs/constructor/query.py:38-85).
  * `features == Nil` means select-all.
  */
final case class Query(
    leftFeatureGroup: FeatureGroup,
    features: Seq[FeatureRef] = Nil,
    joins: Seq[JoinSpec] = Nil,
    filter: Option[FilterExpr] = None,
    timeTravel: Option[TimeTravel] = None
) {

  /** Append a join (python/hsfs/constructor/query.py:236-297; default join
    * type LEFT, query.py:242).
    */
  def join(
      right: Query,
      on: Seq[String] = Nil,
      leftOn: Seq[String] = Nil,
      rightOn: Seq[String] = Nil,
      joinType: JoinType = JoinType.Left,
      prefix: Option[String] = None
  ): Query =
    copy(joins = joins :+ JoinSpec(right, on, leftOn, rightOn, joinType, prefix))

  /** Conjoin a filter (AND with any existing filter,
    * python/hsfs/constructor/query.py:412-480).
    */
  def where(f: FilterExpr): Query =
    copy(filter = filter.map(_ && f).orElse(Some(f)))

  /** Stamp time-travel bounds on this branch and any branches that don't
    * already carry their own (python/hsfs/constructor/query.py:299-392:
    * as_of applies to all joins unless a nested as_of was set first).
    */
  def asOf(wallclockMillis: Long, excludeUntil: Option[Long] = None): Query = {
    val tt = TimeTravel(Some(wallclockMillis), excludeUntil)
    def stamp(q: Query): Query = q.copy(
      timeTravel = q.timeTravel.orElse(Some(tt)),
      joins = q.joins.map(j => j.copy(right = stamp(j.right))))
    stamp(copy(timeTravel = Some(tt)))
  }

  /** String/date form of [[asOf]] — the reference accepts `%Y%m%d…`
    * wallclock strings, dates and epoch numbers interchangeably
    * (constructor/query.py:299-392, util.convert_event_time_to_timestamp);
    * same format sniffing as event-time parsing.
    */
  def asOf(wallclock: String): Query =
    asOf(graft.functions.TimeFunctions.toEpochMillis(wallclock))

  def asOf(wallclock: String, excludeUntil: String): Query =
    asOf(graft.functions.TimeFunctions.toEpochMillis(wallclock),
      Some(graft.functions.TimeFunctions.toEpochMillis(excludeUntil)))

  /** Add one feature to the projection
    * (python/hsfs/constructor/query.py:636-647).
    */
  def appendFeature(name: String): Query =
    copy(features = features :+ FeatureRef(name))

  /** The portable SQL this query denotes — the analog of the reference's
    * `query.to_string()` (python/hsfs/constructor/query.py:581-607), here
    * generated in-process instead of fetched from the metadata server.
    * See [[graft.planner.QuerySql]] for dialect guarantees.
    */
  def toSql: String = graft.planner.QuerySql.toSql(this)
}

object Query {
  /** select-all entry point (feature_group.select_all,
    * python/hsfs/feature_group.py:240-308).
    */
  def selectAll(fg: FeatureGroup,
                includePrimaryKey: Boolean = true,
                includeEventTime: Boolean = true): Query = {
    val excluded =
      (if (includePrimaryKey) Set.empty[String] else fg.primaryKey.toSet) ++
        (if (includeEventTime) Set.empty[String] else fg.eventTime.toSet)
    val feats =
      if (excluded.isEmpty) Nil
      else fg.featureNames.filterNot(excluded).map(FeatureRef(_, Some(fg.name)))
    Query(fg, feats)
  }

  /** Explicit projection (feature_group.select,
    * python/hsfs/feature_group.py:310-353).
    */
  def select(fg: FeatureGroup, names: Seq[String]): Query =
    Query(fg, names.map(FeatureRef(_, Some(fg.name))))

  /** Complement projection (feature_group.select_except,
    * python/hsfs/feature_group.py:354-409).
    */
  def selectExcept(fg: FeatureGroup, names: Seq[String]): Query = {
    val drop = names.toSet
    Query(fg, fg.featureNames.filterNot(drop).map(FeatureRef(_, Some(fg.name))))
  }
}

/** Column-expression builders mirroring Feature.__lt__/__eq__/isin/like
  * (python/hsfs/feature.py:230-259).
  */
object Dsl {
  implicit class FeatureOps(val name: String) extends AnyVal {
    private def ref = FeatureRef(name)
    def ===(v: Any): FilterExpr = FilterLeaf(ref, FilterCondition.Eq, v)
    def =!=(v: Any): FilterExpr = FilterLeaf(ref, FilterCondition.Ne, v)
    def >(v: Any): FilterExpr = FilterLeaf(ref, FilterCondition.Gt, v)
    def >=(v: Any): FilterExpr = FilterLeaf(ref, FilterCondition.Ge, v)
    def <(v: Any): FilterExpr = FilterLeaf(ref, FilterCondition.Lt, v)
    def <=(v: Any): FilterExpr = FilterLeaf(ref, FilterCondition.Le, v)
    def in(vs: Seq[Any]): FilterExpr = FilterLeaf(ref, FilterCondition.In, vs)
    def like(pattern: String): FilterExpr =
      FilterLeaf(ref, FilterCondition.Like, pattern)
  }
}
