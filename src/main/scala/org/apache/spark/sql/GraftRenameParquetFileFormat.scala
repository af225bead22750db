package org.apache.spark.sql

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.mapreduce.Job

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources
import org.apache.spark.sql.types.StructType

/** [[ParquetFileFormat]] for tables with METADATA-ONLY renamed
  * columns (the Delta column-mapping idea, implemented the same way
  * `DeltaParquetFileFormat` does it): the relation above is entirely
  * LOGICAL-facing — logical schema, logical pruning index, logical
  * pushed filters — and this class translates to the PHYSICAL
  * (on-disk) names at the one boundary where names actually reach
  * parquet: the per-file reader. Returned rows are positional, so
  * renaming the requested schemas changes nothing downstream; the
  * vectorized reader, row-group pruning and whole-stage codegen all
  * apply exactly as for an unrenamed table.
  *
  * `logicalToPhysical` maps each RENAMED logical column to the name
  * it carries inside existing data files; unlisted columns read under
  * their own name.
  */
final class GraftRenameParquetFileFormat(
    val logicalToPhysical: Map[String, String]) extends ParquetFileFormat {

  private def phys(name: String): String =
    logicalToPhysical.getOrElse(name, name)

  private def physSchema(s: StructType): StructType =
    StructType(s.fields.map(f => f.copy(name = phys(f.name))))

  /** Rename a pushed source filter into physical space; None for a
    * shape we don't recognize — parquet pushdown is advisory (Spark
    * keeps the residual Filter above the scan), so dropping one is
    * only ever a row-group-pruning loss, never wrong rows. */
  private def physFilter(
      f: sources.Filter, neg: Boolean = false): Option[sources.Filter] =
    f match {
      case sources.EqualTo(a, v) => Some(sources.EqualTo(phys(a), v))
      case sources.EqualNullSafe(a, v) =>
        Some(sources.EqualNullSafe(phys(a), v))
      case sources.GreaterThan(a, v) =>
        Some(sources.GreaterThan(phys(a), v))
      case sources.GreaterThanOrEqual(a, v) =>
        Some(sources.GreaterThanOrEqual(phys(a), v))
      case sources.LessThan(a, v) => Some(sources.LessThan(phys(a), v))
      case sources.LessThanOrEqual(a, v) =>
        Some(sources.LessThanOrEqual(phys(a), v))
      case sources.In(a, vs) => Some(sources.In(phys(a), vs))
      case sources.IsNull(a) => Some(sources.IsNull(phys(a)))
      case sources.IsNotNull(a) => Some(sources.IsNotNull(phys(a)))
      case sources.StringStartsWith(a, v) =>
        Some(sources.StringStartsWith(phys(a), v))
      case sources.StringEndsWith(a, v) =>
        Some(sources.StringEndsWith(phys(a), v))
      case sources.StringContains(a, v) =>
        Some(sources.StringContains(phys(a), v))
      case sources.And(l, r) =>
        (physFilter(l, neg), physFilter(r, neg)) match {
          case (Some(pl), Some(pr)) => Some(sources.And(pl, pr))
          // One leg of a conjunction still prunes on its own — but
          // ONLY at positive polarity. Under a Not, the weakened And
          // becomes a STRONGER pushed predicate (Not(a) can skip row
          // groups Not(And(a, b)) keeps), and rows a scan skips are
          // gone for good — the residual Filter above cannot recover
          // them. Negative polarity translates strictly or not at all.
          case (one, other) if !neg => one.orElse(other)
          case _ => None
        }
      case sources.Or(l, r) =>
        for { pl <- physFilter(l, neg); pr <- physFilter(r, neg) }
          yield sources.Or(pl, pr)
      case sources.Not(c) => physFilter(c, !neg).map(sources.Not(_))
      case sources.AlwaysTrue() => Some(f)
      case sources.AlwaysFalse() => Some(f)
      case _ => None
    }

  override def buildReaderWithPartitionValues(
      sparkSession: SparkSession,
      dataSchema: StructType,
      partitionSchema: StructType,
      requiredSchema: StructType,
      filters: Seq[sources.Filter],
      options: Map[String, String],
      hadoopConf: Configuration): PartitionedFile => Iterator[InternalRow] =
    super.buildReaderWithPartitionValues(
      sparkSession,
      physSchema(dataSchema),
      partitionSchema,
      physSchema(requiredSchema),
      filters.flatMap(physFilter(_)),
      options,
      hadoopConf)

  override def prepareWrite(
      sparkSession: SparkSession,
      job: Job,
      options: Map[String, String],
      dataSchema: StructType): org.apache.spark.sql.execution
        .datasources.OutputWriterFactory =
    // writes go through the graft sink, which maps names itself
    super.prepareWrite(sparkSession, job, options, physSchema(dataSchema))

  // HadoopFsRelation/scan-reuse equality must distinguish mappings:
  // plain ParquetFileFormat treats all instances as equal.
  override def equals(other: Any): Boolean = other match {
    case g: GraftRenameParquetFileFormat =>
      g.logicalToPhysical == logicalToPhysical
    case _ => false
  }
  override def hashCode(): Int = logicalToPhysical.hashCode()
  override def toString: String = "GraftRenameParquet"
}
