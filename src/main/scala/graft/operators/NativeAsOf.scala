package graft.operators

import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType

import graft.plans.AsOfJoinPlan

/** Builder for the native as-of join plan node (`plans/AsOfJoinPlan` →
  * `plans/AsOfJoinExec`). Same contract as `AsOfJoin.backward` — for
  * every left row, the payload of the latest right row with
  * rightTime <= leftTime per key, ties resolved by the ascending
  * tiebreak (last wins), right rows with NULL keys or time never match.
  *
  * Times must be LongType (epoch ms/µs/ns) — the physical merge reads
  * them as primitive longs.
  */
object NativeAsOf {

  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[(String, String)],
      leftTime: String,
      rightTime: String,
      carry: Seq[(String, String)],
      rightTieBreak: Seq[String] = Nil,
      tolerance: Option[Long] = None): DataFrame = tolerance match {
    case Some(tol) =>
      // ride the matched right time along, then null out carries whose
      // match is older than the window (rows survive — same contract as
      // AsOfJoin.backward's tolerance)
      val rt = "__nat_rt"
      // the post-join select below resolves by BARE name over the joined
      // frame — collisions between carry outputs, left columns, and the
      // internal ride-along column would resolve ambiguously or pick the
      // wrong side; fail loudly instead
      val outs = carry.map(_._2)
      require(outs.distinct.size == outs.size,
        s"duplicate carry output names: $outs")
      require(!outs.contains(rt) && !left.columns.contains(rt),
        s"column name $rt is reserved by the as-of tolerance rewrite")
      require(outs.forall(!left.columns.contains(_)),
        s"carry output names ${outs.filter(left.columns.contains(_))} " +
          "collide with left columns; alias the carry outputs")
      val joined = backward(left, right, keys, leftTime, rightTime,
        carry :+ (rightTime -> rt), rightTieBreak, None)
      val inRange = col(rt).isNotNull && col(leftTime) - col(rt) <= tol
      joined.select(left.columns.map(col).toSeq ++
        carry.map { case (_, out) =>
          org.apache.spark.sql.functions
            .when(inRange, col(out)).otherwise(
              org.apache.spark.sql.functions.lit(null)).as(out) }: _*)
    case None => backwardImpl(left, right, keys, leftTime, rightTime,
      carry, rightTieBreak)
  }

  /** Forward as-of join via the native node: earliest right row with
    * time >= left time, per key; largest tiebreak wins among equal
    * (key, time) — matching AsOfJoin.forward. Implemented by negating
    * the (Long) time axes around the backward merge. */
  def forward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[(String, String)],
      leftTime: String,
      rightTime: String,
      carry: Seq[(String, String)],
      rightTieBreak: Seq[String] = Nil,
      tolerance: Option[Long] = None): DataFrame = {
    val nl = "__nat_negl"; val nr = "__nat_negr"
    require(!left.columns.contains(nl) && !right.columns.contains(nr) &&
      !carry.exists(c => c._2 == nl || c._2 == nr),
      s"column names $nl/$nr are reserved by the forward as-of rewrite")
    backward(
        left.withColumn(nl, -col(leftTime)),
        right.withColumn(nr, -col(rightTime)),
        keys, nl, nr, carry, rightTieBreak, tolerance)
      .drop(nl)
  }

  private def backwardImpl(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[(String, String)],
      leftTime: String,
      rightTime: String,
      carry: Seq[(String, String)],
      rightTieBreak: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "as-of join requires at least one equi-key")

    // SQL match semantics: NULL keys / NULL times never match — drop the
    // right rows up front (they could otherwise win the merge, because
    // ascending sort puts NULLS FIRST in the run)
    val rightNonNull = (keys.map { case (_, rk) => col(rk).isNotNull } :+
      col(rightTime).isNotNull).reduce(_ && _)

    val lPlan = GraftSqlBridge.analyzed(left)
    val rBase = GraftSqlBridge.analyzed(right.filter(rightNonNull))
    // Re-alias the right side's output to FRESH exprIds: when left and
    // right share lineage (the common "both sides of one source" as-of
    // shape), the analyzer's DeduplicateRelations regenerates the
    // conflicting right subtree's ids but cannot remap the expression
    // fields of a node it doesn't know — the aliases give the node
    // conflict-free attributes to reference, and the dedup rewrite stays
    // fully inside the right subtree.
    val rAliases = rBase.output.map(a =>
      org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)())
    val rPlan = org.apache.spark.sql.catalyst.plans.logical.Project(
      rAliases, rBase)
    val rOutput: Seq[Attribute] = rAliases.map(_.toAttribute)

    def resolveIn(attrs: Seq[Attribute], name: String): Attribute =
      attrs.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in ${attrs.map(_.name)}"))
    def resolve(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        name: String): Attribute = resolveIn(plan.output, name)

    val lt = resolve(lPlan, leftTime)
    val rt = resolveIn(rOutput, rightTime)
    require(lt.dataType == LongType && rt.dataType == LongType,
      s"as-of time columns must be LongType (got ${lt.dataType}/${rt.dataType})")

    val carryAttrs = carry.map { case (c, _) => resolveIn(rOutput, c) }
    val carryOut = carry.zip(carryAttrs).map { case ((_, out), a) =>
      AttributeReference(out, a.dataType, nullable = true)()
    }
    GraftSqlBridge.ofRows(left.sparkSession, AsOfJoinPlan(
      lPlan, rPlan,
      keys.map(k => resolve(lPlan, k._1)),
      keys.map(k => resolveIn(rOutput, k._2)),
      lt, rt, carryAttrs,
      rightTieBreak.map(resolveIn(rOutput, _)),
      carryOut))
  }
}
