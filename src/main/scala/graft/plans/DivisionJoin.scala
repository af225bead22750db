package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BoundReference, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.plans.{FullOuter, Inner, JoinType, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.DataType

/** Shuffle-free division join (reference `joined_dataset.py:33-34`).
  *
  * Two datasets sliced by the SAME sorted division bounds are already
  * co-partitioned: division i of the left can only match division i of
  * the right, so the join needs no Exchange at all — each division pair
  * joins independently with an in-partition hash join (build = right,
  * probe = left), exactly the reference's per-division in-memory joins,
  * but planned inside Catalyst so each division's scan keeps file
  * pruning, pushed filters and codegen.
  *
  * The logical node carries 2n children (n left division slices, then
  * n right division slices); the physical node zips each pair into one
  * single-partition RDD and unions the results. Plan size is O(n), so
  * [[graft.core.PDataset.join]] uses this path up to
  * `divisionJoinMaxDivisions` divisions and falls back to the
  * constant-plan-size Catalyst whole-frame join beyond it (at 10^4+
  * divisions, driver planning time dominates what the shuffle costs).
  *
  * Memory contract: one right-side DIVISION (not the whole dataset)
  * is built into a hash table per task — the same bound the reference
  * engine's per-division joins hold. The node does NOT reorder sides;
  * callers of `PDataset.join` should put the smaller dataset on the
  * right (the build side).
  */
case class DivisionJoinPlan(
    joinType: JoinType,
    keyNames: Seq[String],
    nDiv: Int,
    /** Key attributes of every child, flattened: child j's keys sit at
      * [j*k, (j+1)*k). Kept as EXPRESSIONS (not names) so optimizer
      * rules that rewrite attributes — RemoveRedundantAliases drops a
      * rename's alias and renames the child's output — rewrite these
      * references in lockstep; post-analysis, identity is the exprId,
      * never the name. */
    keyRefs: Seq[Attribute],
    children: Seq[LogicalPlan]) extends LogicalPlan {

  require(children.length == 2 * nDiv && nDiv > 0,
    "need one left and one right child per division")
  require(keyNames.nonEmpty && keyRefs.length == 2 * nDiv * keyNames.length,
    "need every division child's key attributes")

  private def k = keyNames.length
  private[plans] def keysOf(j: Int): Seq[Attribute] =
    keyRefs.slice(j * k, (j + 1) * k)

  /** Every child column is consumed: rows from division j are emitted
    * under division 0's attribute ids, so a column-pruning rule that
    * only sees keyRefs + division 0's attrs in the output would prune
    * divisions 1..n-1 down to their keys and misalign the emitted row
    * layout (observed: garbage non-key values). Claiming the full
    * child outputs as references keeps every division full-width. */
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      children.flatMap(_.output) ++ keyRefs)

  /** USING-join layout: keys once (under their public names), then
    * left non-keys, right non-keys. Nullability follows Catalyst's
    * join semantics per side. */
  override def output: Seq[Attribute] = {
    val keys = keysOf(0).zip(keyNames).map { case (a, n) => a.withName(n) }
    val leftKeyIds = keysOf(0).map(_.exprId).toSet
    val rightKeyIds = keysOf(nDiv).map(_.exprId).toSet
    val lRest = children.head.output.filterNot(a => leftKeyIds.contains(a.exprId))
    val rRest = children(nDiv).output.filterNot(a => rightKeyIds.contains(a.exprId))
    joinType match {
      case Inner => keys ++ lRest ++ rRest
      case LeftOuter => keys ++ lRest ++ rRest.map(_.withNullability(true))
      case FullOuter => (keys ++ lRest).map(_.withNullability(true)) ++
        rRest.map(_.withNullability(true))
      case other => throw new IllegalArgumentException(s"unsupported $other")
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[LogicalPlan]): DivisionJoinPlan =
    copy(children = newChildren)
}

object DivisionJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case dj: DivisionJoinPlan =>
      DivisionJoinExec(dj.joinType, dj.keyNames.length, dj.nDiv, dj.keyRefs,
        dj.output, dj.children.map(planLater)) :: Nil
    case _ => Nil
  }
}

case class DivisionJoinExec(
    joinType: JoinType,
    nKeys: Int,
    nDiv: Int,
    keyRefs: Seq[Attribute],
    output: Seq[Attribute],
    children: Seq[SparkPlan]) extends SparkPlan {

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[SparkPlan]): DivisionJoinExec =
    copy(children = newChildren)

  override protected def doExecute(): RDD[InternalRow] = {
    val perDivision = (0 until nDiv).map { i =>
      zipDivision(i, children(i), children(nDiv + i))
    }
    sparkContext.union(perDivision)
  }

  private def onePartition(rdd: RDD[InternalRow]): RDD[InternalRow] =
    rdd.getNumPartitions match {
      case 1 => rdd
      case 0 => sparkContext.parallelize(Seq.empty[InternalRow], 1)
      case _ => rdd.coalesce(1)
    }

  private def keysOf(j: Int): Seq[Attribute] =
    keyRefs.slice(j * nKeys, (j + 1) * nKeys)

  private def ordinalsOf(keys: Seq[Attribute], attrs: Seq[Attribute]): Array[Int] = {
    val ords = keys.map(k => attrs.indexWhere(_.exprId == k.exprId)).toArray
    require(ords.forall(_ >= 0),
      s"key attributes $keys missing from division side $attrs")
    ords
  }

  private def zipDivision(i: Int, l: SparkPlan, r: SparkPlan): RDD[InternalRow] = {
    val lAttrs = l.output
    val rAttrs = r.output
    val lTypes = lAttrs.map(_.dataType).toArray
    val rTypes = rAttrs.map(_.dataType).toArray
    val lKeyOrds = ordinalsOf(keysOf(i), lAttrs)
    val rKeyOrds = ordinalsOf(keysOf(nDiv + i), rAttrs)
    val lRestOrds =
      lAttrs.indices.filterNot(lKeyOrds.contains(_)).toArray
    val rRestOrds =
      rAttrs.indices.filterNot(rKeyOrds.contains(_)).toArray
    require(nKeys + lRestOrds.length + rRestOrds.length == output.length,
      s"division $i emits ${nKeys + lRestOrds.length + rRestOrds.length} " +
        s"columns but the declared output has ${output.length} — " +
        s"a rule pruned division children inconsistently")
    val jt = joinType
    onePartition(l.execute()).zipPartitions(onePartition(r.execute())) {
      (lIt, rIt) =>
        DivisionJoinExec.joinIterators(lIt, rIt, jt, lTypes, rTypes,
          lKeyOrds, rKeyOrds, lRestOrds, rRestOrds)
    }
  }
}

object DivisionJoinExec {

  private final class Entry(val rows: scala.collection.mutable.ArrayBuffer[InternalRow]) {
    var matched: Boolean = false
  }

  /** Test seam for [[joinIterators]]. */
  private[graft] def testJoin(
      lIt: Iterator[InternalRow], rIt: Iterator[InternalRow],
      joinType: JoinType, lTypes: Array[DataType], rTypes: Array[DataType],
      lKeyOrds: Array[Int], rKeyOrds: Array[Int],
      lRestOrds: Array[Int], rRestOrds: Array[Int]): Iterator[InternalRow] =
    joinIterators(lIt, rIt, joinType, lTypes, rTypes,
      lKeyOrds, rKeyOrds, lRestOrds, rRestOrds)

  /** Per-division hash join: build = right (copied into a hash table),
    * probe = streamed left. SQL equi-join null semantics: a null key
    * component never matches; outer-side rows with null keys still
    * emit padded with nulls. Emits UnsafeRows (parents may shuffle). */
  private[plans] def joinIterators(
      lIt: Iterator[InternalRow],
      rIt: Iterator[InternalRow],
      joinType: JoinType,
      lTypes: Array[DataType],
      rTypes: Array[DataType],
      lKeyOrds: Array[Int],
      rKeyOrds: Array[Int],
      lRestOrds: Array[Int],
      rRestOrds: Array[Int]): Iterator[InternalRow] = {
    val nKeys = lKeyOrds.length
    val width = nKeys + lRestOrds.length + rRestOrds.length
    val outTypes: Array[DataType] =
      lKeyOrds.map(lTypes) ++ lRestOrds.map(lTypes) ++ rRestOrds.map(rTypes)
    val outProj = UnsafeProjection.create(outTypes)
    // Key bytes must match Catalyst's join-key semantics: -0.0 == 0.0
    // and NaN == NaN for float/double keys (the whole-frame fallback
    // normalizes via NormalizeFloatingNumbers; raw sign bits would
    // make results depend on which path the gate picked).
    def keyExpr(o: Int, t: Array[DataType]): org.apache.spark.sql.catalyst.expressions.Expression = {
      val ref = BoundReference(o, t(o), nullable = true)
      t(o) match {
        case org.apache.spark.sql.types.FloatType |
             org.apache.spark.sql.types.DoubleType =>
          org.apache.spark.sql.catalyst.optimizer.NormalizeNaNAndZero(ref)
        case _ => ref
      }
    }
    val lKeyProj = UnsafeProjection.create(lKeyOrds.map(keyExpr(_, lTypes)))
    val rKeyProj = UnsafeProjection.create(rKeyOrds.map(keyExpr(_, rTypes)))

    def hasNullKey(row: InternalRow, ords: Array[Int]): Boolean = {
      var i = 0
      while (i < ords.length) {
        if (row.isNullAt(ords(i))) return true
        i += 1
      }
      false
    }

    // Build phase: one right DIVISION in memory, the contract the
    // reference's per-division in-memory joins hold too.
    val map = new java.util.HashMap[UnsafeRow, Entry]()
    val nullKeyRight = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    while (rIt.hasNext) {
      val r = rIt.next()
      if (hasNullKey(r, rKeyOrds)) {
        if (joinType == FullOuter) nullKeyRight += r.copy()
      } else {
        val k = rKeyProj(r).copy()
        var e = map.get(k)
        if (e == null) {
          e = new Entry(scala.collection.mutable.ArrayBuffer.empty)
          map.put(k, e)
        }
        e.rows += r.copy()
      }
    }

    val vals = new Array[Any](width)
    def emit(l: InternalRow, r: InternalRow): InternalRow = {
      var o = 0
      var i = 0
      while (i < nKeys) { // keys from whichever side is present
        vals(o) =
          if (l != null) l.get(lKeyOrds(i), lTypes(lKeyOrds(i)))
          else r.get(rKeyOrds(i), rTypes(rKeyOrds(i)))
        o += 1; i += 1
      }
      i = 0
      while (i < lRestOrds.length) {
        vals(o) =
          if (l != null) l.get(lRestOrds(i), lTypes(lRestOrds(i))) else null
        o += 1; i += 1
      }
      i = 0
      while (i < rRestOrds.length) {
        vals(o) =
          if (r != null) r.get(rRestOrds(i), rTypes(rRestOrds(i))) else null
        o += 1; i += 1
      }
      outProj(new GenericInternalRow(vals.clone()))
    }

    val probed: Iterator[InternalRow] = lIt.flatMap { l =>
      if (hasNullKey(l, lKeyOrds)) {
        if (joinType == Inner) Iterator.empty
        else Iterator.single(emit(l, null))
      } else {
        val e = map.get(lKeyProj(l))
        if (e == null) {
          if (joinType == Inner) Iterator.empty
          else Iterator.single(emit(l, null))
        } else {
          e.matched = true
          e.rows.iterator.map(r => emit(l, r))
        }
      }
    }
    // Full-outer tail: deferred until the probe is fully consumed so
    // the matched flags are final.
    val tail: Iterator[InternalRow] =
      if (joinType != FullOuter) Iterator.empty
      else Iterator.single(()).flatMap { _ =>
        import scala.jdk.CollectionConverters._
        map.values.iterator.asScala.filterNot(_.matched)
          .flatMap(_.rows.iterator.map(r => emit(null, r))) ++
          nullKeyRight.iterator.map(r => emit(null, r))
      }
    probed ++ tail
  }
}

object DivisionJoin {

  /** Install the planner strategy on the session (idempotent). */
  def ensureStrategy(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(DivisionJoinStrategy))
      spark.experimental.extraStrategies = cur :+ DivisionJoinStrategy
  }

  /** A shuffle-free division-join frame over aligned per-division
    * slices, or None when the shape doesn't qualify (no key columns,
    * or a self-join whose sides share attribute ids — Catalyst's
    * deduplication doesn't reach inside a custom node). */
  def frame(
      spark: SparkSession,
      lefts: IndexedSeq[DataFrame],
      rights: IndexedSeq[DataFrame],
      keyCols: Seq[String],
      how: String): Option[DataFrame] = {
    if (keyCols.isEmpty || lefts.isEmpty || lefts.length != rights.length)
      return None
    val jt: JoinType = how match {
      case "inner" => Inner
      case "left" => LeftOuter
      case "full" => FullOuter
      case _ => return None
    }
    val lPlans = lefts.map(_.queryExecution.analyzed)
    val rPlans = rights.map(_.queryExecution.analyzed)
    val lIds = lPlans.flatMap(_.output.map(_.exprId)).toSet
    if (rPlans.exists(_.output.exists(a => lIds.contains(a.exprId))))
      return None
    // Pin each child's key ATTRIBUTES now, while analysis-time names
    // are still intact; from here on identity is the exprId.
    val keyRefs = (lPlans ++ rPlans).flatMap { p =>
      keyCols.map(n => p.output.find(_.name == n).orNull)
    }
    if (keyRefs.contains(null)) return None
    ensureStrategy(spark)
    Some(GraftBridge.ofRows(spark,
      DivisionJoinPlan(jt, keyCols, lefts.length, keyRefs, lPlans ++ rPlans)))
  }
}
