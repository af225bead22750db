package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.PDataset
import Fixtures._

/** Physical-plan assertions: the operators must not only be correct
  * but produce the plans you'd want at 100 TB — pruned scans, pushed
  * filters, partial aggregation, broadcast for small sides, and
  * whole-stage codegen over the hot expressions. */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val sf = "/root/testdata/sf0.001"

  lazy val persisted: PDataset = {
    val out = tempDir("graft-plan") + "/li.parquet"
    PDataset.scanParquet(spark, s"$sf/lineitem.parquet")
      .reindex(Seq("l_shipdate"))
      .repartition(800)
      .writeParquet(out)
  }

  test("q_metadata_groupby's declared query really folds — " +
      "LocalTableScan, no file scan") {
    val df = SparkEntry.queries("q_metadata_groupby")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan") && !plan.contains("FileScan"),
      s"the grouped fold must answer from metadata:\n$plan")
  }

  test("q_metadata_minmax's declared query folds — including the " +
      "count over a DOUBLE column") {
    val df = SparkEntry.queries("q_metadata_minmax")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan") && !plan.contains("FileScan"),
      s"the mixed metadata aggregate must fold:\n$plan")
  }

  test("q_metadata_filtered's file-aligned WHERE really folds") {
    val df = SparkEntry.queries("q_metadata_filtered")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan") && !plan.contains("FileScan"),
      s"the filter-aligned fold must answer from metadata:\n$plan")
  }

  test("quotaCap plans a map-side group limit before the shuffle") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = graft.operators.Sampling.quotaCap(docs, "source", "doc_id", 5)
      .queryExecution.executedPlan.toString
    // Spark's WindowGroupLimit caps each group at N per TASK before
    // the exchange — without it every row shuffles just to be
    // discarded by the rank filter.
    assert(plan.contains("WindowGroupLimit"),
      s"expected a partial WindowGroupLimit, got:\n$plan")
  }

  test("quotaCap self-protects: a quota the map-side limit cannot " +
      "cover refuses loudly; raising the threshold re-arms the " +
      "WindowGroupLimit at any quota") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val key = "spark.sql.optimizer.windowGroupLimitThreshold"
    val saved = spark.conf.get(key)
    val e = intercept[IllegalArgumentException] {
      graft.operators.Sampling.quotaCap(docs, "source", "doc_id", 2000)
    }
    assert(e.getMessage.contains(key), e.getMessage)
    assert(e.getMessage.contains("2000"), e.getMessage)
    try {
      spark.conf.set(key, "5000")
      val plan = graft.operators.Sampling
        .quotaCap(docs, "source", "doc_id", 2000)
        .queryExecution.executedPlan.toString
      assert(plan.contains("WindowGroupLimit"),
        s"map-side cap must fire at the raised threshold:\n$plan")
    } finally spark.conf.set(key, saved)
  }

  test("mixture sampling broadcasts counts; the corpus never shuffles") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val df = graft.operators.Sampling.mixtureByTemperature(
      docs, "lang", "doc_id", 0.5)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"per-source counts must broadcast onto the corpus:\n$plan")
    // Only the tiny count aggregate may exchange — the corpus rows
    // flow scan -> broadcast join -> filter with no shuffle.
    assert(!plan.contains("Exchange hashpartitioning(doc_id"),
      s"corpus rows must not shuffle:\n$plan")
  }

  test("heavy-hitter recount broadcasts the candidate set") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val df = graft.operators.Frequency.heavyHitters(
      li, "l_partkey", minCount = 10L, capacity = 4096)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"candidates (≤ capacity) must broadcast, got:\n$plan")
    assert(plan.contains("HashAggregate"), "recount must hash-aggregate")
  }

  test("TPC-H Q5 star join broadcasts its dimensions and partial-aggregates") {
    val df = SparkEntry.queries("q_tpch_q5")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // supplier/nation/region (at least) must come in as broadcasts;
    // the final group-by must have a map-side partial.
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 3,
      s"expected >=3 broadcast dimension joins:\n$plan")
    assert(plan.contains("partial_"), "expected a partial aggregate")
  }

  test("TPC-H Q17 broadcasts the brand part list and the per-part limits") {
    val df = SparkEntry.queries("q_tpch_q17")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // The brand's part keys and the per-part 20%-of-avg limits are
    // both tiny: they broadcast onto lineitem, which never shuffles.
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 2,
      s"expected brand filter + limits to broadcast:\n$plan")
    assert(plan.contains("partial_avg"), "expected map-side partial avg")
  }

  test("TPC-H Q21 decorrelates both EXISTS into one lineitem pass") {
    val df = SparkEntry.queries("q_tpch_q21")(spark, sf)
    df.collect()
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val plan = (df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
    // The EXISTS / NOT EXISTS pair would scan lineitem three times
    // correlated, twice naively decorrelated; the per-(order,
    // supplier) aggregate + window shape scans it ONCE.
    assert("lineitem".r.findAllIn(plan).length == 1,
      s"expected exactly one lineitem scan:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject:\n$plan")
    assert(plan.contains("partial_max"), "expected map-side partial agg")
  }

  test("TPC-H Q4 plans one semi join, no nested loop for the non-equi leg") {
    val df = SparkEntry.queries("q_tpch_q4")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // The correlated EXISTS has an equi key (orderkey) plus a
    // non-equi date condition: the condition must ride ON the hash
    // semi join, never degrade to BroadcastNestedLoopJoin.
    assert(plan.contains("LeftSemi"), s"expected a semi join:\n$plan")
    assert(!plan.contains("NestedLoop"),
      s"non-equi leg degraded to a nested loop:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderdate), " +
      "GreaterThanOrEqual(o_orderdate") || plan.contains("GreaterThanOrEqual"),
      s"expected the date window pushed to the orders scan:\n$plan")
  }

  test("TPC-H Q10 broadcasts nation and top-20s without a global sort") {
    val df = SparkEntry.queries("q_tpch_q10")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected top-K, not a global sort:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the nation dim broadcast:\n$plan")
  }

  test("TPC-H Q18 semi-filters the spine, broadcasts it, and top-Ks") {
    val df = SparkEntry.queries("q_tpch_q18")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // The HAVING-filtered big-order key set is tiny at any SF, so the
    // semi join (and everything downstream of it) must broadcast
    // rather than shuffle the customer/lineitem sides.
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"expected broadcast semi join on big-order keys:\n$plan")
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 2,
      s"expected the semi-filtered spine to broadcast onward:\n$plan")
    // ORDER BY + LIMIT 100 must be a top-K, never a global sort.
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject:\n$plan")
    assert(plan.contains("partial_sum"), "expected map-side partial agg")
  }

  test("TPC-H Q13 outer-joins then counts, with no nested loop") {
    val df = SparkEntry.queries("q_tpch_q13")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // The priority exclusion rides the JOIN CONDITION, so customers
    // with only urgent orders still appear (c_count 0): the plan must
    // keep a genuine LEFT OUTER join feeding the count aggregate —
    // never rewrite it to inner — and both aggregates must have
    // map-side partials.
    assert(plan.contains("LeftOuter"),
      s"expected a left outer join:\n$plan")
    assert(!plan.contains("NestedLoop"),
      s"outer join degraded to a nested loop:\n$plan")
    assert("partial_count".r.findAllIn(plan).length >= 2,
      s"expected map-side partials for both aggregates:\n$plan")
  }

  test("TPC-H Q20 chains semi joins over one lineitem pass") {
    val df = SparkEntry.queries("q_tpch_q20")(spark, sf)
    df.collect()
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val plan = (df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
    // The per-part total comes from a window over the per-pair
    // aggregate, never a second fact scan; the part-name, dominance,
    // and nation reductions are all semi joins (nothing widens, no
    // nested loop).
    assert("lineitem".r.findAllIn(plan).length == 1,
      s"expected exactly one lineitem scan:\n$plan")
    assert("LeftSemi".r.findAllIn(plan).length >= 3,
      s"expected three chained semi joins:\n$plan")
    assert(!plan.contains("NestedLoop"),
      s"subquery degraded to a nested loop:\n$plan")
    assert(plan.contains("Window"), s"expected the per-part window:\n$plan")
  }

  test("q_canon_fp reads only its two columns and keeps canon_text " +
      "inside whole-stage codegen") {
    val df = SparkEntry.queries("q_canon_fp")(spark, sf)
    df.collect() // AQE only inserts codegen stages as it materializes
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val inner = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val schemas = Fixtures.collectScans(inner)
      .map(_.metadata("ReadSchema")).mkString
    assert(schemas.contains("doc_id") && schemas.contains("text") &&
      !schemas.contains("lang") && !schemas.contains("source"),
      s"scan must prune to (doc_id, text): $schemas")
    // the kernel generates code (no interpreted Expression island):
    // the canon_text projection sits under a WholeStageCodegen node
    // (starred) in the final adaptive plan
    val s = inner.toString
    val projLine = s.linesIterator.find(_.contains("canon_text"))
    assert(projLine.exists(_.contains("*")),
      s"canon_text must be codegen'd (starred): ${projLine.orNull}")
  }

  test("TPC-H Q6 pushes every predicate to the scan") {
    val df = SparkEntry.queries("q_tpch_q6")(spark, sf)
    // Inspect BEFORE execution: AQE materializes stages into leaf
    // nodes that hide the scan from tree traversal. The plan STRING
    // also truncates long PushedFilters lists, so read the scan
    // node's untruncated metadata.
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val inner = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val plan = inner.toString
    val pushed = inner.collectWithSubqueries {
      case f: FileSourceScanExec => f.metadata("PushedFilters")
    }.mkString
    assert(pushed.contains("GreaterThanOrEqual(l_shipdate") &&
      pushed.contains("GreaterThanOrEqual(l_discount") &&
      pushed.contains("LessThan(l_quantity"),
      s"expected date/discount/quantity filters pushed, got: $pushed")
    assert(plan.contains("partial_sum"), "expected map-side partial sum")
  }

  test("TPC-H Q7 broadcast-reduces both dimension sides before the fact join") {
    val df = SparkEntry.queries("q_tpch_q7")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // supplier⋈nation and customer⋈nation collapse to broadcasts; the
    // nation-pair reduction must cut lineitem via a broadcast join
    // BEFORE the orders shuffle, never after.
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 3,
      s"expected nation-filtered dims broadcast onto the fact side:\n$plan")
    assert(!plan.contains("NestedLoop"),
      s"pair condition degraded to a nested loop:\n$plan")
  }

  test("TPC-H Q16 anti-joins the exclusion set and two-phases the distinct") {
    val df = SparkEntry.queries("q_tpch_q16")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti") && plan.contains("BroadcastHashJoin"),
      s"expected a broadcast anti join for NOT IN:\n$plan")
    // count(DISTINCT supplier) must partial-dedup before the shuffle
    // (two-phase distinct aggregate), not ship every duplicate row.
    assert("HashAggregate".r.findAllIn(plan).length >= 3,
      s"expected the two-phase distinct aggregate:\n$plan")
  }

  test("TPC-H Q19 keeps the disjunction as a hash-join residual") {
    val df = SparkEntry.queries("q_tpch_q19")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // Equi key on the hash join, OR-of-ANDs as its residual; the
    // union-of-ranges prefilters must reach both scans.
    assert(plan.contains("BroadcastHashJoin"),
      s"expected a broadcast hash join on partkey:\n$plan")
    assert(!plan.contains("NestedLoop"),
      s"disjunctive join degraded to a nested loop:\n$plan")
    assert(plan.contains("In(p_brand") ||
      plan.contains("PushedFilters: [IsNotNull(p_brand"),
      s"expected the brand prefilter pushed to the part scan:\n$plan")
  }

  test("TPC-H Q2 decorrelates the min into a join-back, no nested loop") {
    val df = SparkEntry.queries("q_tpch_q2")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_min"),
      s"expected the correlated min as a per-part aggregate:\n$plan")
    assert(!plan.contains("NestedLoop"),
      s"min subquery degraded to a nested loop:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected top-100 via TakeOrderedAndProject:\n$plan")
  }

  test("TPC-H Q8 computes the market share in one conditional-agg pass") {
    val df = SparkEntry.queries("q_tpch_q8")(spark, sf)
    df.collect()
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val plan = (df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
    // Numerator and denominator come from ONE scan of lineitem;
    // part/supplier/nation/region reductions broadcast.
    assert("lineitem".r.findAllIn(plan).length == 1,
      s"expected exactly one lineitem scan:\n$plan")
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 3,
      s"expected broadcast dimension reductions:\n$plan")
  }

  test("TPC-H Q11 reuses the per-part aggregate's shuffle for the total") {
    val df = SparkEntry.queries("q_tpch_q11")(spark, sf)
    df.collect()
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val plan = (df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
    // The grouped view is a val shared by the total and the filter:
    // its aggregation shuffle must appear once and be structurally
    // reused, not recomputed — i.e. one lineitem scan, one
    // ReusedExchange (or reused stage under AQE).
    assert("lineitem".r.findAllIn(plan).length == 1,
      s"expected exactly one lineitem scan:\n$plan")
    assert(plan.contains("ReusedExchange") ||
      plan.contains("ReusedQueryStage") || plan.contains("StageReuse"),
      s"expected the per-part aggregate exchange to be reused:\n$plan")
  }

  test("slice reads only overlapping partition files (driver pruning)") {
    val total = persisted.npartitions
    val lo = persisted.lowerBounds.get(2)
    val sliced = persisted.slice(lo, null)
    val filesRead = sliced.toDF.select(input_file_name()).distinct().count()
    assert(filesRead == total - 2, s"read $filesRead files of $total")
    assert(sliced.npartitions == total - 2)
  }

  test("slice residual filter is pushed down to the parquet scan") {
    val lo = persisted.lowerBounds.get(1)
    val mid: Seq[Option[Any]] = Vector(Some(
      lo.head.get.asInstanceOf[java.time.LocalDateTime].plusDays(3)))
    val sliced = persisted.slice(mid, null)
    val plan = sliced.toDF.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(l_shipdate"),
      s"expected pushed >= filter in:\n$plan")
  }

  test("interior partitions carry no residual filter (metadata elision)") {
    // slicing exactly on a partition boundary: no Filter node at all
    val lo = persisted.lowerBounds.get(1)
    val sliced = persisted.slice(lo, null)
    val plan = sliced.toDF.queryExecution.executedPlan.toString
    assert(!plan.contains("+- Filter") && !plan.contains(") Filter") &&
      plan.contains("PushedFilters: []"),
      s"expected filter-free plan:\n$plan")
  }

  test("aggregation plans partial (map-side) + final HashAggregate") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_returnflag").agg(sum("l_quantity"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_sum"), plan)
    assert(plan.contains("Exchange hashpartitioning"), plan)
    assert("HashAggregate".r.findAllIn(plan).length >= 2, plan)
  }

  test("star join broadcasts the small dimension side") {
    val c = spark.read.parquet(s"$sf/customer.parquet")
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val j = o.join(c, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").count()
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"), plan)
  }

  test("column pruning reaches the scan (ReadSchema subset)") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity").filter(col("l_quantity") > 30)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      plan)
  }

  test("embedding dedup plans bucketed equi-joins, never a pair nested-loop") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val plan = graft.operators.Dedup
      .embeddingNearDupPairs(emb, "vec_id", "embedding", 0.9)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("dedup verification rejoins are shuffled hash joins, not broadcasts") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = graft.operators.Dedup
      .minhashNearDupPairs(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"), plan)
  }

  test("SemDeDup pairs plan cell equi-joins, never a pair nested-loop") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val plan = graft.operators.Dedup
      .semDedupPairs(emb, "vec_id", "embedding", dim = 64,
        threshold = 0.99, nClusters = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("segment dedup's boilerplate anti-join is UNHINTED: AQE " +
      "broadcasts a genuinely small drop set at runtime, and with " +
      "broadcasts disabled the op degrades to a shuffled anti-join " +
      "instead of forcing an executor-OOM broadcast") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val q = graft.operators.Dedup
      .dedupSegments(docs, "doc_id", "text", maxDocFreq = 10)
    // Small drop set + default conf: AQE's runtime size check picks
    // the broadcast — but only AFTER execution (nothing forces it).
    q.collect()
    val adapted = q.queryExecution.executedPlan.toString
    assert(adapted.contains("LeftAnti"), adapted)
    assert(!adapted.contains("CartesianProduct"), adapted)
    // Broadcasts off entirely: the same op must complete through a
    // non-broadcast anti-join — the 100 TB path where the drop set
    // (a fraction of DISTINCT segments, corpus-growing) outgrows
    // executor memory.
    val conf = spark.conf
    val prev = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val q2 = graft.operators.Dedup
        .dedupSegments(docs, "doc_id", "text", maxDocFreq = 10)
      val n = q2.count()
      val plan2 = q2.queryExecution.executedPlan.toString
      assert(!plan2.contains("BroadcastHashJoin"), plan2)
      assert(plan2.contains("LeftAnti"), plan2)
      assert(n == q.count(), "shuffle path must match the broadcast path")
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      prevA match {
        case Some(v) =>
          conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None =>
          conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }

  test("incremental MinHash dedup is bucket equi-joins plus a semi join " +
      "for the hit corpus docs (AQE-sized, not hint-forced) — no pair " +
      "explosion, no corpus scan into the candidate shuffle") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val dir = Fixtures.tempDir("planspec-mh") + "/idx"
    val old = docs.filter(col("doc_id") % 10 =!= 0)
    graft.operators.Dedup.buildMinhashIndex(
      spark, old, "doc_id", "text", dir)
    val plan = graft.operators.Dedup.incrementalNearDupPairs(
      spark, docs.filter(col("doc_id") % 10 === 0), "doc_id", "text",
      old, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
    assert(plan.contains("LeftSemi"), plan)
  }

  test("sliced toDF is one relation served by the sidecar file index") {
    val lo = persisted.lowerBounds.get(2)
    val plan = persisted.slice(lo, null).toDF
      .queryExecution.executedPlan.toString
    assert(plan.contains("GraftFileIndex"), plan)
    assert(!plan.contains("Union"), plan)
  }

  test("user filter on the index column prunes files end-to-end") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    // filter at the lower bound of the LAST partition: only that file
    // may contain satisfying rows, and the scan must plan only it.
    val lastLb = persisted.lowerBounds.get.last.head.get
      .asInstanceOf[java.time.LocalDateTime]
    val df = persisted.toDF.filter(col("l_shipdate") >= lit(lastLb))
    df.collect()
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val scan = scans(df.queryExecution.executedPlan)
    assert(scan.nonEmpty, df.queryExecution.executedPlan.toString)
    val numFiles = scan.map(_.metrics("numFiles").value).sum
    assert(numFiles == 1,
      s"expected 1 file scanned of ${persisted.npartitions}, got $numFiles")
  }

  test("sidecar file index prunes files from pushed Catalyst filters") {
    import org.apache.spark.sql.GraftFileIndex
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, GreaterThanOrEqual, IsNull, LessThan, Literal}
    import org.apache.spark.sql.types.LongType
    val paths = (0 until 4).map(i =>
      (new org.apache.hadoop.fs.Path(s"file:/tmp/p$i.parquet"), 100L))
    // files: [null..5], [10..20], [30..40], all-null
    val lbs = Vector(None, Some(10L), Some(30L), None)
    val ubs = Vector(Some(5L), Some(20L), Some(40L), None)
    val idx = new GraftFileIndex(paths.toVector, "k", lbs, ubs)
    val k = AttributeReference("k", LongType)()
    def kept(e: org.apache.spark.sql.catalyst.expressions.Expression) =
      idx.listFiles(Nil, Seq(e)).head.files
        .map(_.getPath.getName).toSet
    assert(kept(GreaterThanOrEqual(k, Literal(15L))) ==
      Set("p1.parquet", "p2.parquet"))
    assert(kept(LessThan(k, Literal(10L))) == Set("p0.parquet"))
    assert(kept(EqualTo(k, Literal(35L))) == Set("p2.parquet"))
    assert(kept(IsNull(k)) == Set("p0.parquet", "p3.parquet"))
    // reversed orientation: lit <= attr
    assert(kept(org.apache.spark.sql.catalyst.expressions
      .LessThanOrEqual(Literal(30L), k)) == Set("p2.parquet"))
    // unanalyzable filter keeps everything
    assert(kept(IsNull(AttributeReference("other", LongType)())).size == 4)
  }

  test("sidecar file index prunes IN-lists and string prefixes") {
    import org.apache.spark.sql.GraftFileIndex
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, In, InSet, Literal, StartsWith}
    import org.apache.spark.sql.types.{LongType, StringType}
    val paths = (0 until 4).map(i =>
      (new org.apache.hadoop.fs.Path(s"file:/tmp/p$i.parquet"), 100L))
    // numeric files: [null..5], [10..20], [30..40], all-null
    val idx = new GraftFileIndex(paths.toVector, "k",
      Vector(None, Some(10L), Some(30L), None),
      Vector(Some(5L), Some(20L), Some(40L), None))
    val k = AttributeReference("k", LongType)()
    def kept(ix: GraftFileIndex)(
        e: org.apache.spark.sql.catalyst.expressions.Expression) =
      ix.listFiles(Nil, Seq(e)).head.files.map(_.getPath.getName).toSet
    assert(kept(idx)(In(k, Seq(Literal(5L), Literal(35L)))) ==
      Set("p0.parquet", "p2.parquet"))
    // null IN-list elements never match and prune freely
    assert(kept(idx)(In(k, Seq(Literal.create(null, LongType), Literal(5L))))
      == Set("p0.parquet"))
    assert(kept(idx)(InSet(k, Set[Any](15L, 35L))) ==
      Set("p1.parquet", "p2.parquet"))
    // an IN-list with a non-literal element keeps everything
    assert(kept(idx)(In(k, Seq(Literal(5L), k))).size == 4)

    // string files: [apple..banana], [cat..dog], [dove..fox], all-null
    val sIdx = new GraftFileIndex(paths.toVector, "s",
      Vector(Some("apple"), Some("cat"), Some("dove"), None),
      Vector(Some("banana"), Some("dog"), Some("fox"), None))
    val s = AttributeReference("s", StringType)()
    assert(kept(sIdx)(StartsWith(s, Literal("d"))) ==
      Set("p1.parquet", "p2.parquet"))
    assert(kept(sIdx)(StartsWith(s, Literal("do"))) ==
      Set("p1.parquet", "p2.parquet"))
    assert(kept(sIdx)(StartsWith(s, Literal("app"))) == Set("p0.parquet"))
    assert(kept(sIdx)(StartsWith(s, Literal("z"))) == Set.empty)
  }

  test("two-column conjunctions prune files via lex-tuple bounds") {
    import org.apache.spark.sql.GraftFileIndex
    import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, GreaterThanOrEqual, IsNotNull, LessThan, Literal}
    import org.apache.spark.sql.types.LongType
    val paths = (0 until 4).map(i =>
      (new org.apache.hadoop.fs.Path(s"file:/tmp/p$i.parquet"), 100L))
    // tuple bounds on (k, m):
    //   p0: [(1, 10) .. (1, 20)]  constant leading -> m in [10, 20]
    //   p1: [(1, 30) .. (2,  5)]  leading varies
    //   p2: [(2, 10) .. (2, 90)]  constant leading -> m in [10, 90]
    //   p3: [(3, null) .. (3, null)] constant leading, m all null
    def bb(a: Any, m: Any): graft.core.Lex.Bound =
      Vector(Option(a), Option(m))
    val idx = new GraftFileIndex(paths.toVector, Seq("k", "m"),
      Vector(bb(1L, 10L), bb(1L, 30L), bb(2L, 10L), bb(3L, null)),
      Vector(bb(1L, 20L), bb(2L, 5L), bb(2L, 90L), bb(3L, null)))
    val k = AttributeReference("k", LongType)()
    val m = AttributeReference("m", LongType)()
    def kept(es: org.apache.spark.sql.catalyst.expressions.Expression*) =
      idx.listFiles(Nil, es).head.files.map(_.getPath.getName).toSet
    // constant-leading files expose a second-column range
    assert(kept(GreaterThanOrEqual(m, Literal(25L))) ==
      Set("p1.parquet", "p2.parquet"))
    assert(kept(LessThan(m, Literal(10L))) == Set("p1.parquet"))
    // conjunction: k-range and m-range intersect
    assert(kept(And(EqualTo(k, Literal(2L)), GreaterThanOrEqual(m, Literal(25L))))
      == Set("p2.parquet"))
    // leading equality at a tuple EDGE bounds m one-sidedly: k=1 hits
    // p1's lower edge (1, 30), so m >= 30 there; m < 25 eliminates it
    assert(kept(And(EqualTo(k, Literal(1L)), LessThan(m, Literal(25L))))
      == Set("p0.parquet"))
    // all-null second column never satisfies a comparison, IS NOT NULL
    // prunes it once the leading column is constant
    assert(kept(IsNotNull(m)) == Set("p0.parquet", "p1.parquet", "p2.parquet"))
  }

  test("equality-prefix conjunctions prune by the THIRD lex column") {
    import org.apache.spark.sql.GraftFileIndex
    import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, GreaterThanOrEqual, LessThan, Literal}
    import org.apache.spark.sql.types.LongType
    val paths = (0 until 4).map(i =>
      (new org.apache.hadoop.fs.Path(s"file:/tmp/p$i.parquet"), 100L))
    def bb(a: Any, b: Any, c: Any): graft.core.Lex.Bound =
      Vector(Option(a), Option(b), Option(c))
    // tuple bounds on (k, m, n):
    //   p0: [(1,1,10) .. (1,1,20)]  const (k,m) -> n in [10,20]
    //   p1: [(1,2,30) .. (1,2,40)]  const (k,m) -> n in [30,40]
    //   p2: [(1,2,50) .. (2,1, 5)]  k varies: n derivable only via pins
    //   p3: [(2,1,10) .. (2,1,90)]  const (k,m) -> n in [10,90]
    val idx = new GraftFileIndex(paths.toVector, Seq("k", "m", "n"),
      Vector(bb(1L, 1L, 10L), bb(1L, 2L, 30L), bb(1L, 2L, 50L), bb(2L, 1L, 10L)),
      Vector(bb(1L, 1L, 20L), bb(1L, 2L, 40L), bb(2L, 1L, 5L), bb(2L, 1L, 90L)))
    val k = AttributeReference("k", LongType)()
    val m = AttributeReference("m", LongType)()
    val n = AttributeReference("n", LongType)()
    def kept(es: org.apache.spark.sql.catalyst.expressions.Expression*) =
      idx.listFiles(Nil, es).head.files.map(_.getPath.getName).toSet
    // constant two-column prefixes expose third-column ranges
    assert(kept(GreaterThanOrEqual(n, Literal(45L))) ==
      Set("p2.parquet", "p3.parquet"))
    // (k=1, m=2): p0 drops on m; p2's LOWER edge matches the pin, so
    // n >= 50 there — n < 45 keeps only p1
    assert(kept(And(And(EqualTo(k, Literal(1L)), EqualTo(m, Literal(2L))),
      LessThan(n, Literal(45L)))) == Set("p1.parquet"))
    // (k=2, m=1): p2's UPPER edge matches, so n <= 5 there; n >= 8
    // keeps only p3
    assert(kept(And(And(EqualTo(k, Literal(2L)), EqualTo(m, Literal(1L))),
      GreaterThanOrEqual(n, Literal(8L)))) == Set("p3.parquet"))
    // without a pin on the VARYING leading column, later columns of
    // p2 derive nothing — it is kept conservatively while the
    // const-prefix files prune by their own ranges
    assert(kept(And(EqualTo(m, Literal(2L)),
      GreaterThanOrEqual(n, Literal(45L)))) == Set("p2.parquet"))
  }

  test("two-column predicate prunes planned files end-to-end") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val out = tempDir("graft-plan2") + "/li2.parquet"
    val two = PDataset.scanParquet(spark, s"$sf/lineitem.parquet")
      .reindex(Seq("l_returnflag", "l_shipdate"))
      .repartition(700)
      .writeParquet(out)
    assert(two.npartitions >= 6)
    // pick a (flag, date) cut inside one flag's file run
    val flags = two.lowerBounds.get.map(_.head.get.asInstanceOf[String])
    val flag = flags.groupBy(identity).maxBy(_._2.length)._1
    val flagIdx = two.lowerBounds.get.indices.filter(i =>
      flags(i) == flag && two.upperBounds.get(i).head.get == flag)
    assert(flagIdx.length >= 2, s"fixture gives no constant-$flag files")
    val cutDate = two.lowerBounds.get(flagIdx.last)(1).get
      .asInstanceOf[java.time.LocalDateTime]
    // driver-side expectation mirroring the index's rule
    val expected = two.lowerBounds.get.indices.count { i =>
      val l = two.lowerBounds.get(i); val u = two.upperBounds.get(i)
      val kOk = graft.core.Lex.nullableCmp(l.head, Some(flag)) <= 0 &&
        graft.core.Lex.nullableCmp(Some(flag), u.head) <= 0
      val mDerivable = graft.core.Lex.nullableCmp(l.head, u.head) == 0 ||
        graft.core.Lex.nullableCmp(Some(flag), l.head) == 0 ||
        graft.core.Lex.nullableCmp(Some(flag), u.head) == 0
      val mOk = !mDerivable || {
        val ub2 = if (graft.core.Lex.nullableCmp(l.head, u.head) == 0 ||
          graft.core.Lex.nullableCmp(Some(flag), u.head) == 0) u(1) else None
        ub2.isEmpty || graft.core.Lex.valueCmp(ub2.get, cutDate) >= 0
      }
      kOk && mOk
    }
    assert(expected < two.npartitions, "fixture gives no two-column pruning")
    val df = two.toDF.filter(col("l_returnflag") === flag &&
      col("l_shipdate") >= lit(cutDate))
    df.collect()
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val numFiles = scans(df.queryExecution.executedPlan)
      .map(_.metrics("numFiles").value).sum
    assert(numFiles == expected,
      s"expected $expected files planned of ${two.npartitions}, got $numFiles")
    // correctness unchanged: matches a plain filter over the raw table
    val want = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_returnflag") === flag && col("l_shipdate") >= lit(cutDate))
      .count()
    assert(df.count() == want)
  }

  test("IN-list on the index column prunes planned files end-to-end") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val lbs = persisted.lowerBounds.get
    val ubs = persisted.upperBounds.get
    val vals = Seq(lbs(1).head.get, lbs.last.head.get)
      .map(_.asInstanceOf[java.time.LocalDateTime])
    // Driver-side expectation: files whose [lb, ub] contains any value.
    val expected = lbs.indices.count { i =>
      vals.exists(v =>
        graft.core.Lex.valueCmp(ubs(i).head.get, v) >= 0 &&
          graft.core.Lex.valueCmp(lbs(i).head.get, v) <= 0)
    }
    assert(expected < persisted.npartitions, "fixture gives no pruning")
    val df = persisted.toDF.filter(col("l_shipdate").isin(vals.map(lit): _*))
    df.collect()
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val numFiles = scans(df.queryExecution.executedPlan)
      .map(_.metrics("numFiles").value).sum
    assert(numFiles == expected,
      s"expected $expected files planned of ${persisted.npartitions}, got $numFiles")
  }

  test("unwritten repartition plans ONE source scan for toDF/collate/slice") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def scanCount(df: org.apache.spark.sql.DataFrame): Int = {
      def go(p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
        case a: AdaptiveSparkPlanExec => go(a.executedPlan)
        case _: FileSourceScanExec => 1
        case other => other.children.map(go).sum
      }
      go(df.queryExecution.executedPlan)
    }
    val ds = PDataset.scanParquet(spark, s"$sf/lineitem.parquet")
      .reindex(Seq("l_shipdate"))
    val total = ds.sizes.get.sum
    val rp = ds.repartition(total / 8)
    assert(rp.npartitions >= 6, s"fixture gives ${rp.npartitions} divisions")

    // toDF: the contiguous division slices collapse to one slice of the
    // source — a single relation, not one scan (or union branch) per
    // division.
    val whole = rp.toDF
    assert(scanCount(whole) == 1, whole.queryExecution.executedPlan.toString)
    assert(!whole.queryExecution.executedPlan.toString.contains("Union"))
    assert(whole.count() == total)

    // collate: merged batches stay a contiguous run — still one scan.
    val coll = rp.collate(total / 3)
    assert(coll.npartitions >= 2 && coll.npartitions < rp.npartitions)
    val collDF = coll.toDF
    assert(scanCount(collDF) == 1, collDF.queryExecution.executedPlan.toString)
    assert(collDF.count() == total)

    // slice: bound tightening keeps SliceParts inspectable — one scan
    // with the range filter applied, rows matching a direct filter.
    val mid = rp.lowerBounds.get(2)
    val slDF = rp.slice(mid, null).toDF
    assert(scanCount(slDF) == 1, slDF.queryExecution.executedPlan.toString)
    val expect = ds.toDF.filter(
      col("l_shipdate") >= lit(mid.head.get
        .asInstanceOf[java.time.LocalDateTime])).count()
    assert(slDF.count() == expect)
  }

  test("vec_dot participates in whole-stage codegen") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val df = emb.select(graft.functions.VectorExpressions
      .vecDot(col("embedding"), col("embedding")).as("d"))
    df.collect() // materialize so codegen spans are decided
    val plan = df.queryExecution.executedPlan.toString
    // codegen spans render as "*(n) Project [... vec_dot ...]"
    assert("""\*\(\d+\) Project \[vec_dot""".r.findFirstIn(plan).isDefined,
      plan)
  }

  test("LM scoring joins the bounded model AQE-sized (broadcast when " +
      "small, never a cartesian); DSIR's top-k is a TakeOrdered, not " +
      "a global sort") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val model = graft.operators.LanguageModel
      .trainTrigramModel(docs, "text", vocab = 1024)
    val scored = graft.operators.LanguageModel
      .lmScore(docs, "doc_id", "text", model)
    scored.collect()
    val p1 = scored.queryExecution.executedPlan.toString
    assert(!p1.contains("CartesianProduct") &&
      !p1.contains("BroadcastNestedLoopJoin"), p1)
    // the bounded model (<= vocab aggregated rows) broadcasts under
    // AQE's runtime size check — no corpus-side shuffle for the join
    assert(p1.contains("BroadcastHashJoin"), p1)

    val sel = graft.operators.ImportanceSampling.dsirSelect(
      docs, docs.filter(col("lang") === "en"), "doc_id", "text",
      k = 50, vocab = 1024)
    val p2 = sel.queryExecution.executedPlan.toString
    // top-k plans per-partition heaps + one merge, not a global sort
    assert(p2.contains("TakeOrderedAndProject"), p2)
  }
}
