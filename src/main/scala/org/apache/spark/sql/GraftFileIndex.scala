package org.apache.spark.sql

import org.apache.hadoop.fs.{FileStatus, Path}

import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, InSet, IsNotNull, IsNull, LessThan, LessThanOrEqual, Literal, Or, StartsWith}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

import graft.core.Lex

/** A [[FileIndex]] serving the file listing from the engine's
  * driver-side sidecar metadata, so FILE-level pruning happens inside
  * Catalyst: any pushed data filter on the leading index column
  * eliminates files whose [lb, ub] bound interval cannot contain a
  * satisfying row — before the scan plans splits, on top of (not
  * instead of) the engine's own driver-side pruning in `slice`. A
  * user who writes `ds.toDF.filter($"ts" >= x)` gets the same file
  * skipping `ds.slice(...)` would give.
  *
  * Bound semantics mirror the sidecar (null-first lex order, padawan
  * `ordering.py:69-95`): a None upper bound means the file is all-null
  * in the leading column; a None lower bound means it may contain
  * nulls. Comparisons never match null rows, IS NULL matches only
  * possibly-null files. Pruning is conservative: any filter shape it
  * doesn't recognize keeps every file.
  */
final class GraftFileIndex(
    files: IndexedSeq[(Path, Long)],
    leadingIndexCol: String,
    lbs: IndexedSeq[Option[Any]],
    ubs: IndexedSeq[Option[Any]]) extends FileIndex {

  require(files.length == lbs.length && files.length == ubs.length,
    "one (lb, ub) pair per file required")

  private val statuses: IndexedSeq[FileStatus] = files.map { case (p, len) =>
    new FileStatus(len, false, 1, 128L * 1024 * 1024, 0L, p)
  }

  override def rootPaths: Seq[Path] =
    statuses.map(_.getPath.getParent).distinct

  override def partitionSchema: StructType = StructType(Nil)

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val keep = dataFilters.foldLeft(files.indices.toSet) { (acc, f) =>
      keepSet(f).fold(acc)(acc.intersect)
    }
    Seq(PartitionDirectory(InternalRow.empty,
      statuses.indices.filter(keep).map(statuses).toArray))
  }

  /** File indices that may satisfy `e`; None = cannot analyze (keep
    * all). Conjunction intersects, disjunction unions. */
  private def keepSet(e: Expression): Option[Set[Int]] = e match {
    case And(l, r) =>
      (keepSet(l), keepSet(r)) match {
        case (Some(a), Some(b)) => Some(a.intersect(b))
        case (a, b)             => a.orElse(b)
      }
    case Or(l, r) =>
      for (a <- keepSet(l); b <- keepSet(r)) yield a.union(b)
    case GreaterThanOrEqual(a: AttributeReference, l: Literal) => cmpSet(a, l, ">=")
    case GreaterThanOrEqual(l: Literal, a: AttributeReference) => cmpSet(a, l, "<=")
    case GreaterThan(a: AttributeReference, l: Literal) => cmpSet(a, l, ">")
    case GreaterThan(l: Literal, a: AttributeReference) => cmpSet(a, l, "<")
    case LessThanOrEqual(a: AttributeReference, l: Literal) => cmpSet(a, l, "<=")
    case LessThanOrEqual(l: Literal, a: AttributeReference) => cmpSet(a, l, ">=")
    case LessThan(a: AttributeReference, l: Literal) => cmpSet(a, l, "<")
    case LessThan(l: Literal, a: AttributeReference) => cmpSet(a, l, ">")
    case EqualTo(a: AttributeReference, l: Literal) => cmpSet(a, l, "=")
    case EqualTo(l: Literal, a: AttributeReference) => cmpSet(a, l, "=")
    case IsNull(a: AttributeReference) if isLead(a) =>
      Some(files.indices.filter(i => lbs(i).isEmpty).toSet)
    case IsNotNull(a: AttributeReference) if isLead(a) =>
      Some(files.indices.filter(i => ubs(i).nonEmpty).toSet)
    // IN-list: union of the per-value equality keep sets. A null list
    // element never matches (three-valued IN), so it prunes freely.
    case In(a: AttributeReference, list)
        if isLead(a) && list.forall(_.isInstanceOf[Literal]) =>
      Some(list.collect {
        case Literal(v, dt) if v != null =>
          eqKeep(CatalystTypeConverters.convertToScala(v, dt))
      }.foldLeft(Set.empty[Int])(_ union _))
    // Optimizer-converted large IN-lists carry internal values.
    case InSet(a: AttributeReference, hset) if isLead(a) =>
      Some(hset.filter(_ != null).map(v =>
        eqKeep(CatalystTypeConverters.convertToScala(v, a.dataType)))
        .foldLeft(Set.empty[Int])(_ union _))
    // Prefix match on a string index: matching strings form the range
    // [p, sup) where sup is the least string above every p-prefixed
    // one, so string bounds make prefix pruning sound: a file may
    // match iff ub >= p and lb < sup (lb < p or lb itself p-prefixed).
    case StartsWith(a: AttributeReference, Literal(p: UTF8String, StringType))
        if isLead(a) && a.dataType == StringType =>
      val prefix = p.toString
      Some(files.indices.filter { i =>
        ubs(i).exists(u => Lex.valueCmp(u, prefix) >= 0) &&
          lbs(i).forall(lb => Lex.valueCmp(lb, prefix) < 0 ||
            lb.toString.startsWith(prefix))
      }.toSet)
    case _ => None
  }

  /** Files whose [lb, ub] may contain exactly `ext` (non-null). */
  private def eqKeep(ext: Any): Set[Int] =
    files.indices.filter { i =>
      ubs(i).exists(u => Lex.valueCmp(u, ext) >= 0) &&
        lbs(i).forall(lb => Lex.valueCmp(lb, ext) <= 0)
    }.toSet

  private def isLead(e: Expression): Boolean = e match {
    case a: AttributeReference => a.name == leadingIndexCol
    case _ => false
  }

  /** Files whose non-null value range [lb', ub] may contain a value
    * `op` the literal, where lb' is unknown-small when the stored lb
    * is null (the file mixes nulls and values). All-null files (ub
    * null) never satisfy a comparison. */
  private def cmpSet(
      attr: Expression, lit: Expression, op: String): Option[Set[Int]] =
    (attr, lit) match {
      case (a: AttributeReference, l: Literal)
          if isLead(a) && l.value != null =>
        val ext = CatalystTypeConverters.convertToScala(l.value, l.dataType)
        def geqish(strict: Boolean) = files.indices.filter { i =>
          ubs(i).exists(u =>
            if (strict) Lex.valueCmp(u, ext) > 0 else Lex.valueCmp(u, ext) >= 0)
        }
        def leqish(strict: Boolean) = files.indices.filter { i =>
          ubs(i).nonEmpty && lbs(i).forall(lb =>
            if (strict) Lex.valueCmp(lb, ext) < 0 else Lex.valueCmp(lb, ext) <= 0)
        }
        val kept = op match {
          case ">=" => geqish(strict = false)
          case ">"  => geqish(strict = true)
          case "<=" => leqish(strict = false)
          case "<"  => leqish(strict = true)
          case "="  => geqish(strict = false).toSet
            .intersect(leqish(strict = false).toSet).toIndexedSeq
        }
        Some(kept.toSet)
      case _ => None
    }

  override def inputFiles: Array[String] =
    statuses.map(_.getPath.toString).toArray
  override def refresh(): Unit = ()
  override def sizeInBytes: Long = statuses.map(_.getLen).sum
}

object GraftRelations {
  /** One parquet relation over the given files with the listing (and
    * in-Catalyst file pruning) served by [[GraftFileIndex]] from
    * sidecar bounds — no directory listing, schema from the sidecar
    * (no footer reads at plan time). */
  def sidecarParquetDF(
      spark: SparkSession,
      files: IndexedSeq[String],
      schema: StructType,
      leadingIndexCol: String,
      lbs: IndexedSeq[Option[Any]],
      ubs: IndexedSeq[Option[Any]]): DataFrame = {
    val ss = spark.asInstanceOf[classic.SparkSession]
    // Byte lengths via Hadoop FileSystem, one listing per parent dir —
    // works for local, HDFS and object-store datasets alike.
    val withSizes = graft.core.GraftFs.fileSizes(
      spark.sparkContext.hadoopConfiguration, files)
    val index = new GraftFileIndex(withSizes, leadingIndexCol, lbs, ubs)
    val rel = HadoopFsRelation(
      index,
      partitionSchema = StructType(Nil),
      dataSchema = schema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat(),
      options = Map.empty)(ss)
    classic.Dataset.ofRows(ss, LogicalRelation(rel))
  }
}
