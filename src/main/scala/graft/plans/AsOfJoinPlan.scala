package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.PlanBridge

import graft.market.AsofSlicing

/** A whole-operator extension (SURVEY §7.3 preference (c)): AS-OF JOIN
  * as a first-class logical operator.
  *
  * `AsOfJoin(left, right, keys, leftTs, rightTs, carry)` enriches each
  * left row with the latest `carry` values from the right side whose
  * `rightTs` ≤ the row's `leftTs`, per key — the prevailing-quote
  * pattern the reference leans on throughout (`db/get_schema.sql:
  * 363-366`, pgxn `last()` as-of aggregation). The node carries only
  * names and its schema; [[AsOfJoinExpansion]] (an injectable rule,
  * same mechanism as [[BandJoinRule]]) lowers it to the slice-parallel
  * carry plan of [[AsofSlicing]] — so every SQL/DataFrame user of the
  * operator gets the scalable physical shape, never a
  * one-task-per-key window.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    keys: Seq[String],
    leftTs: String,
    rightTs: String,
    carry: Seq[String],
    carryOutput: Seq[Attribute]) extends BinaryNode {

  /** Left columns pass through; each carried right column appears once
    * more (nullable — a row before any right match carries null). The
    * carried attributes are pinned in the constructor so their exprIds
    * survive node copies during optimizer transforms (a recomputed
    * output would mint fresh ids and orphan parent references). */
  override def output: Seq[Attribute] = left.output ++ carryOutput

  /** The operator consumes every left column (all pass through) and
    * the right side's keys + timestamp + carried columns. Declared
    * explicitly (the names live as Strings, so the default
    * expression-derived references would be EMPTY and generic rules
    * like ColumnPruning would prune the children to nothing). */
  override lazy val references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      left.output ++ right.output.filter(a =>
        keys.contains(a.name) || a.name == rightTs || carry.contains(a.name)))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {
  /** Construction surface: derives the carried output attributes once
    * (types from the right side, fresh stable exprIds). */
  def apply(left: LogicalPlan, right: LogicalPlan, keys: Seq[String],
      leftTs: String, rightTs: String, carry: Seq[String]): AsOfJoin = {
    val attrs = carry.map { c =>
      val src = right.output.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(
          s"carry column $c not found on the right side"))
      AttributeReference(c + "_asof", src.dataType, nullable = true)()
    }
    AsOfJoin(left, right, keys, leftTs, rightTs, carry, attrs)
  }
}

/** Lowers [[AsOfJoin]] to the slice-parallel union+carry plan. Runs in
  * the optimizer (injectable at runtime like [[BandJoinRule]]); the
  * expansion is wrapped in a Project that aliases back to the node's
  * original output attribute ids, so downstream references stay
  * resolved. */
object AsOfJoinExpansion extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      case aj: AsOfJoin if aj.childrenResolved => expand(aj)
    }

  private def expand(aj: AsOfJoin): LogicalPlan = {
    val spark = SparkSession.active
    val ldf = PlanBridge.ofRows(spark, aj.left)
    val rdf = PlanBridge.ofRows(spark, aj.right)

    // union shape for AsofSlicing.carry: right rows (kind 0) carry the
    // values; left rows (kind 1) receive them — at equal ts the right
    // row orders first, so the join is ties-inclusive (rightTs ≤ leftTs)
    val leftCols = ldf.columns.toSeq
    val rightSide = rdf.select(
      (aj.keys.map(col) :+ col(aj.rightTs).cast("long").as("ts") :+
        lit(0).as("kind")) ++
        aj.carry.map(col) ++
        leftCols.filterNot(aj.keys.contains)
          .map(c => lit(null).cast(ldf.schema(c).dataType).as(s"__l_$c")): _*)
    val leftSide = ldf.select(
      (aj.keys.map(col) :+ col(aj.leftTs).cast("long").as("ts") :+
        lit(1).as("kind")) ++
        aj.carry.map(c => lit(null).cast(rdf.schema(c).dataType).as(c)) ++
        leftCols.filterNot(aj.keys.contains)
          .map(c => col(c).as(s"__l_$c")): _*)

    val carried = AsofSlicing.carry(rightSide.unionByName(leftSide),
        aj.carry, partCols = aj.keys)
      .filter(col("kind") === 1)
    // restore the left schema + the carried columns, in output order
    // (the left ts travels as __l_<ts> with its original type; "ts" is
    // only the ordering key)
    val restored = carried.select(
      leftCols.map { c =>
        if (aj.keys.contains(c)) col(c)
        else col(s"__l_$c").as(c)
      } ++ aj.carry.map(c => col(s"${c}_asof")): _*)

    // re-anchor the expansion to the node's original attribute ids
    val expanded = PlanBridge.plan(restored)
    val aliases: Seq[NamedExpression] = aj.output.zip(expanded.output).map {
      case (orig, now) => Alias(now, orig.name)(exprId = orig.exprId)
    }
    Project(aliases, expanded)
  }
}

/** SQL-surface marker: `SELECT * FROM asof_join(l, r, keys, lts, rts,
  * carry)` parses to this node over two [[org.apache.spark.sql.catalyst
  * .analysis.UnresolvedRelation]]s; [[AsOfJoinResolution]] replaces it
  * with the typed [[AsOfJoin]] in the analyzer's resolution fixed point
  * (the carried output attributes need the right side's schema, so the
  * typed node cannot be built at parse time). */
case class UnresolvedAsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    keys: Seq[String],
    leftTs: String,
    rightTs: String,
    carry: Seq[String]) extends BinaryNode {
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] = Nil
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

/** Analyzer rule (injected via `GraftExtensions.injectResolutionRule`):
  * lowers the SQL marker to the typed operator once both relations are
  * resolved, with the same name validation as the DataFrame surface. */
object AsOfJoinResolution extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u: UnresolvedAsOfJoin if u.childrenResolved =>
        AsOfJoinOps.validateNames(
          u.left.output.map(_.name).toSet,
          u.right.output.map(_.name).toSet,
          u.keys, u.leftTs, u.rightTs, u.carry)
        AsOfJoin(u.left, u.right, u.keys, u.leftTs, u.rightTs, u.carry)
    }
}

/** Public construction surface for the operator. */
object AsOfJoinOps {

  /** Shared name validation for the DataFrame and SQL surfaces. */
  private[plans] def validateNames(lCols: Set[String], rCols: Set[String],
      keys: Seq[String], leftTs: String, rightTs: String,
      carry: Seq[String]): Unit = {
    (keys :+ leftTs).foreach(c => require(lCols(c),
      s"left side is missing column $c (has: ${lCols.mkString(", ")})"))
    (keys ++ carry :+ rightTs).foreach(c => require(rCols(c),
      s"right side is missing column $c (has: ${rCols.mkString(", ")})"))
    require(carry.forall(c => !lCols(c + "_asof")),
      "left side already has a *_asof column that the join would add")
    // "ts" and "kind" are reserved by the lowered union shape
    // (AsOfJoinExpansion synthesizes them); a key or carry column with
    // either name would produce an ambiguous-reference failure deep in
    // the expansion, far from the user's call — reject it here.
    // (The ts columns themselves may be named "ts": left columns travel
    // under a __l_ prefix.)
    (keys ++ carry).foreach(c => require(c != "ts" && c != "kind",
      s"""column name "$c" is reserved by the as-of lowering; rename it
         | before joining (keys/carry may not be named "ts" or "kind")"""
        .stripMargin.replaceAll("\n", "")))
    // a column listed as both key and carry (or listed twice) would be
    // projected twice by the expansion and fail there with an
    // ambiguous-reference error far from the call — reject it here
    val all = keys ++ carry
    require(all.distinct.size == all.size,
      s"keys and carry must be disjoint and duplicate-free " +
        s"(got keys=${keys.mkString(",")} carry=${carry.mkString(",")})")
  }

  /** Builder behind the `asof_join` SQL table function:
    * `asof_join('left_table', 'right_table', 'k1,k2', 'left_ts',
    * 'right_ts', 'c1,c2')`. All six arguments are string literals;
    * key/carry lists are comma-separated. */
  def sqlTableFunction(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : LogicalPlan = {
    require(exprs.length == 6,
      "asof_join takes 6 string arguments: " +
        "(left_table, right_table, keys_csv, left_ts, right_ts, carry_csv)")
    def str(i: Int): String = TvfArgs.strLit(exprs, i, "asof_join")
    def csv(s: String): Seq[String] =
      s.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    UnresolvedAsOfJoin(TvfArgs.rel(str(0)), TvfArgs.rel(str(1)),
      csv(str(2)), str(3), str(4), csv(str(5)))
  }
  /** left ⟕asof right: latest `carry` values with
    * `right.rightTs ≤ left.leftTs` per `keys` (ties inclusive). */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, carry: Seq[String]): DataFrame = {
    validateNames(left.columns.toSet, right.columns.toSet,
      keys, leftTs, rightTs, carry)
    val spark = SparkSession.active
    // Self-register the lowering rule for sessions built without
    // GraftExtensions. NOTE: this mutates session-global
    // spark.experimental.extraOptimizations as a side effect of
    // DataFrame construction (documented; prefer GraftExtensions for
    // explicit registration). The lock makes concurrent asofJoin calls
    // safe; it cannot defend against a concurrent EXTERNAL writer of
    // extraOptimizations, which is inherently last-write-wins.
    AsOfJoinOps.synchronized {
      if (!spark.experimental.extraOptimizations.contains(AsOfJoinExpansion))
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ AsOfJoinExpansion
    }
    PlanBridge.ofRows(spark,
      AsOfJoin(PlanBridge.plan(left), PlanBridge.plan(right),
        keys, leftTs, rightTs, carry))
  }
}
