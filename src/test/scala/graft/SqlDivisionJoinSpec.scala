package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import graft.core.PDataset
import Fixtures._

/** The automatic zero-Exchange SQL division join
  * (`graft.plans.SqlDivisionJoin`): an inner, LEFT, RIGHT, FULL,
  * SEMI or ANTI join between two graft reads co-clustered on the
  * join key rewrites to the engine's division join — no shuffle on
  * either side, with cross-side residual ON conjuncts evaluated
  * INSIDE the per-division join for outer/semi/anti types — while
  * every non-eligible shape (broadcastable sides, aliased keys, rule
  * disabled) keeps Spark's plan. The node also DECLARES its range
  * partitioning, so a groupBy/orderBy on the join keys above it adds
  * no Exchange either. */
class SqlDivisionJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def writeSide(dir: String, n: Long, payload: String): Unit = {
    def part(lo: Long): PDataset =
      PDataset.fromDataFrame(
        spark.range(lo, lo + 20).select(col("id").as("k"),
          (col("id") % 5).as("g"),
          concat(lit(payload), col("id")).as(s"p_$payload")), Seq("k"))
    PDataset.concat((0L until n by 20L).map(part)).writeParquet(dir)
  }

  private def plans(df: DataFrame): (String, String) =
    (df.queryExecution.optimizedPlan.toString,
      df.queryExecution.executedPlan.toString)

  test("co-clustered inner SQL join plans shuffle-free and matches " +
      "the Catalyst join; ineligible shapes keep Spark's plan") {
    PDataset.divisionJoinMinOverride = Some(2)
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      val dirA = tempDir("sqldivjoin-a") + "/ds"
      val dirB = tempDir("sqldivjoin-b") + "/ds"
      writeSide(dirA, 160, "a") // 8 files
      writeSide(dirB, 120, "b") // 6 files, keys 0-119
      spark.read.format("graft").load(dirA).createOrReplaceTempView("dja")
      spark.read.format("graft").load(dirB).createOrReplaceTempView("djb")

      // small fixtures: disable broadcast so the size gate passes
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val q = "SELECT dja.k, dja.p_a, djb.p_b, djb.k AS k2 " +
        "FROM dja JOIN djb ON dja.k = djb.k"
      val df = spark.sql(q)
      val (opt, exec) = plans(df)
      assert(opt.contains("DivisionJoin"), opt)
      assert(!exec.contains("Exchange"), exec)
      val got = df.orderBy("k").collect().toSeq
      spark.conf.set("spark.graft.sql.divisionJoin", "false")
      val want = spark.sql(q).orderBy("k").collect().toSeq
      spark.conf.set("spark.graft.sql.divisionJoin", "true")
      assert(got == want)
      assert(got.length == 120)
      assert(got.forall(r => r.getLong(0) == r.getLong(3)),
        "re-materialized right key must equal the left key")

      // filters above the scans survive (slices keep them), extra
      // ON conjuncts become a post-join filter — results identical
      val q2 = "SELECT dja.k, djb.p_b FROM dja JOIN djb " +
        "ON dja.k = djb.k AND dja.g <> djb.k % 7 " +
        "WHERE dja.k >= 40 AND djb.k < 100"
      val df2 = spark.sql(q2)
      assert(plans(df2)._1.contains("DivisionJoin"), plans(df2)._1)
      spark.conf.set("spark.graft.sql.divisionJoin", "false")
      val want2 = spark.sql(q2).orderBy("k").collect().toSeq
      spark.conf.set("spark.graft.sql.divisionJoin", "true")
      assert(df2.orderBy("k").collect().toSeq == want2)

      // SEMI joins (IN-subquery shape) rewrite too — zero Exchange
      val qS = "SELECT * FROM dja WHERE k IN (SELECT k FROM djb)"
      val dfS = spark.sql(qS)
      assert(plans(dfS)._1.contains("DivisionJoin"), plans(dfS)._1)
      assert(!plans(dfS)._2.contains("Exchange"), plans(dfS)._2)
      val gotS = dfS.collect().map(_.toString).sorted.toSeq
      spark.conf.set("spark.graft.sql.divisionJoin", "false")
      val wantS = spark.sql(qS).collect().map(_.toString).sorted.toSeq
      spark.conf.set("spark.graft.sql.divisionJoin", "true")
      assert(gotS == wantS && gotS.length == 120)

      // a broadcastable side keeps Spark's broadcast join
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      val dfB = spark.sql(
        "SELECT dja.k FROM dja JOIN djb ON dja.k = djb.k")
      assert(!plans(dfB)._1.contains("DivisionJoin"), plans(dfB)._1)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      // disabled by conf
      spark.conf.set("spark.graft.sql.divisionJoin", "false")
      val dfOff = spark.sql(q)
      assert(!plans(dfOff)._1.contains("DivisionJoin"), plans(dfOff)._1)
      spark.conf.set("spark.graft.sql.divisionJoin", "true")
    } finally {
      PDataset.divisionJoinMinOverride = None
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.set("spark.graft.sql.divisionJoin", "true")
    }
  }

  test("a cloned session gates the rewrite on ITS OWN conf — the " +
      "streaming-clone shape (SET in the clone must not read the " +
      "captured parent session)") {
    PDataset.divisionJoinMinOverride = Some(2)
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val dirA = tempDir("sqldivjoin-ca") + "/ds"
      val dirB = tempDir("sqldivjoin-cb") + "/ds"
      writeSide(dirA, 160, "a")
      writeSide(dirB, 120, "b")
      spark.read.format("graft").load(dirA).createOrReplaceTempView("cja")
      spark.read.format("graft").load(dirB).createOrReplaceTempView("cjb")
      val q = "SELECT cja.k, cjb.p_b FROM cja JOIN cjb ON cja.k = cjb.k"
      assert(spark.sql(q).queryExecution.optimizedPlan.toString
        .contains("DivisionJoin"))
      val clone = org.apache.spark.sql.GraftSqlTestBridge
        .cloneSession(spark)
      clone.conf.set("spark.graft.sql.divisionJoin", "false")
      val cp = clone.sql(q).queryExecution.optimizedPlan.toString
      assert(!cp.contains("DivisionJoin"),
        s"clone's SET divisionJoin=false was ignored:\n$cp")
      // the parent stays rewritten — per-session gating, not global
      assert(spark.sql(q).queryExecution.optimizedPlan.toString
        .contains("DivisionJoin"))
    } finally {
      PDataset.divisionJoinMinOverride = None
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
    }
  }

  test("LEFT, RIGHT and FULL SQL joins rewrite with exact " +
      "null-extension semantics; cross-side residual ON conjuncts are " +
      "evaluated inside the node (ON semantics, not a post-filter)") {
    PDataset.divisionJoinMinOverride = Some(2)
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val dirA = tempDir("sqldivjoin-la") + "/ds"
      val dirB = tempDir("sqldivjoin-lb") + "/ds"
      writeSide(dirA, 120, "a") // keys 0-119
      // keys 40-159: left-only 0-39, matched 40-119, right-only 120-159
      def partB(lo: Long): PDataset =
        PDataset.fromDataFrame(
          spark.range(lo, lo + 20).select(col("id").as("k"),
            (col("id") % 5).as("g"),
            concat(lit("b"), col("id")).as("p_b")), Seq("k"))
      PDataset.concat((40L until 160L by 20L).map(partB))
        .writeParquet(dirB)
      spark.read.format("graft").load(dirA).createOrReplaceTempView("lja")
      spark.read.format("graft").load(dirB).createOrReplaceTempView("ljb")

      def compare(q: String, expectRewrite: Boolean): Seq[String] = {
        val df = spark.sql(q)
        val (opt, exec) = plans(df)
        if (expectRewrite) {
          assert(opt.contains("DivisionJoin"), opt)
          assert(!exec.contains("Exchange"), exec)
        } else assert(!opt.contains("DivisionJoin"), opt)
        val got = df.collect().map(_.toString).sorted.toSeq
        spark.conf.set("spark.graft.sql.divisionJoin", "false")
        val want = spark.sql(q).collect().map(_.toString).sorted.toSeq
        spark.conf.set("spark.graft.sql.divisionJoin", "true")
        assert(got == want, s"rule-on != rule-off for: $q")
        got
      }

      // LEFT: unmatched left rows null-extend, incl. the RIGHT KEY
      val left = compare("SELECT lja.k, lja.p_a, ljb.k AS k2, ljb.p_b " +
        "FROM lja LEFT JOIN ljb ON lja.k = ljb.k", expectRewrite = true)
      assert(left.length == 120)
      assert(left.count(_.contains("null")) == 40,
        "keys 0-39 must null-extend")

      // FULL: both sides null-extend, each side's key gated on its
      // own presence
      val full = compare("SELECT lja.k, lja.p_a, ljb.k AS k2, ljb.p_b " +
        "FROM lja FULL JOIN ljb ON lja.k = ljb.k", expectRewrite = true)
      assert(full.length == 160)

      // a RIGHT-side-only ON conjunct was pushed into the right child
      // by Spark before the rule runs -> residual empty -> rewrites
      compare("SELECT lja.k, ljb.p_b FROM lja LEFT JOIN ljb " +
        "ON lja.k = ljb.k AND ljb.g = 2", expectRewrite = true)

      // RIGHT OUTER rewrites via the side-swap: unmatched RIGHT rows
      // (keys 120-159) null-extend on the left side, incl. lja.k
      val right = compare("SELECT lja.k, lja.p_a, ljb.k AS k2, ljb.p_b " +
        "FROM lja RIGHT JOIN ljb ON lja.k = ljb.k", expectRewrite = true)
      assert(right.length == 120) // 80 matched + 40 right-only
      assert(right.count(_.startsWith("[null")) == 40,
        "keys 120-159 must null-extend the left side")

      // a CROSS-SIDE residual decides MATCHING: key-equal pairs that
      // fail it null-extend instead of dropping — carried inside the
      // node, exact parity with Spark's outer join
      val res = compare("SELECT lja.k, lja.g, ljb.g AS g2, ljb.p_b " +
        "FROM lja LEFT JOIN ljb " +
        "ON lja.k = ljb.k AND lja.g <> ljb.g", expectRewrite = true)
      // co-clustered equal keys share k%5 so g always equals g2:
      // EVERY left row must survive null-extended
      assert(res.length == 120 && res.forall(_.contains("null")),
        s"every key-equal pair fails g<>g -> all 120 rows null-extend")
      // ...and a residual some pairs PASS: parity is the whole check
      compare("SELECT lja.k, ljb.p_b FROM lja LEFT JOIN ljb " +
        "ON lja.k = ljb.k AND lja.g + ljb.g < 6", expectRewrite = true)
      compare("SELECT lja.k, lja.p_a, ljb.k AS k2, ljb.p_b " +
        "FROM lja FULL JOIN ljb " +
        "ON lja.k = ljb.k AND lja.g + ljb.g < 6", expectRewrite = true)
      compare("SELECT lja.k, lja.p_a, ljb.k AS k2, ljb.p_b " +
        "FROM lja RIGHT JOIN ljb " +
        "ON lja.k = ljb.k AND lja.g + ljb.g < 6", expectRewrite = true)

      // multiple build rows per key under a residual: every key-equal
      // candidate matches INDEPENDENTLY (regression pin: buffering
      // emit()'s reused UnsafeRow once collapsed all of a key's
      // matches onto the last one — counts right, values wrong)
      val dirD = tempDir("sqldivjoin-dup") + "/ds"
      def partD(lo: Long): PDataset =
        PDataset.fromDataFrame(
          spark.range(lo, lo + 20).select(
            (col("id") - col("id") % 2).as("k"),
            (col("id") % 5).as("g"),
            concat(lit("d"), col("id")).as("p_d")), Seq("k"))
      PDataset.concat((40L until 160L by 20L).map(partD))
        .writeParquet(dirD)
      spark.read.format("graft").load(dirD).createOrReplaceTempView("ljd")
      compare("SELECT lja.k, lja.g, ljd.g AS g2, ljd.p_d " +
        "FROM lja LEFT JOIN ljd " +
        "ON lja.k = ljd.k AND lja.g + ljd.g < 6", expectRewrite = true)
      // ...and per-row matched flags in the FULL tail: of two build
      // rows under one key, the residual-failing one must null-extend
      compare("SELECT lja.k, lja.p_a, ljd.k AS k2, ljd.p_d " +
        "FROM lja FULL JOIN ljd ON lja.k = ljd.k AND lja.g + ljd.g < 6",
        expectRewrite = true)

      // residual matching survives the Grace spill fallback: per-row
      // matched flags work bucket-by-bucket too
      val oldThreshold =
        graft.plans.DivisionJoinExec.buildSpillThresholdBytes
      graft.plans.DivisionJoinExec.buildSpillThresholdBytes = 300L
      try {
        graft.plans.DivisionJoinExec.spillCount.set(0L)
        compare("SELECT lja.k, lja.p_a, ljb.k AS k2, ljb.p_b " +
          "FROM lja FULL JOIN ljb " +
          "ON lja.k = ljb.k AND lja.g + ljb.g < 6", expectRewrite = true)
        assert(graft.plans.DivisionJoinExec.spillCount.get > 0,
          "fixture did not exercise the spill path")
      } finally {
        graft.plans.DivisionJoinExec.buildSpillThresholdBytes =
          oldThreshold
      }
    } finally {
      PDataset.divisionJoinMinOverride = None
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.set("spark.graft.sql.divisionJoin", "true")
    }
  }

  test("the q_sql_division_join entry query really plans the " +
      "zero-Exchange division join") {
    val df = SparkEntry.queries("q_sql_division_join")(
      spark, "/root/testdata/sf0.001")
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("DivisionJoin"), opt)
    assert(!df.queryExecution.executedPlan.toString
      .contains("ShuffleExchange") ||
      // the final ORDER BY/aggregate may shuffle; the JOIN itself
      // must not — no hashpartitioning exchange on the join keys
      !df.queryExecution.executedPlan.toString
        .contains("hashpartitioning(ckey"),
      df.queryExecution.executedPlan.toString)
  }

  test("the q_sql_division_join_left entry query really plans the " +
      "zero-Exchange division join") {
    val df = SparkEntry.queries("q_sql_division_join_left")(
      spark, "/root/testdata/sf0.001")
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("DivisionJoin"), opt)
    assert(!df.queryExecution.executedPlan.toString
      .contains("hashpartitioning(ckey"),
      df.queryExecution.executedPlan.toString)
  }

  test("the q_sql_division_join_right entry query really plans the " +
      "zero-Exchange division join with its residual inside the node") {
    val df = SparkEntry.queries("q_sql_division_join_right")(
      spark, "/root/testdata/sf0.001")
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("DivisionJoin"), opt)
    // the residual rides INSIDE the node, not as a post-join Filter
    // above it (which would drop null-extended rows)
    assert(!df.queryExecution.executedPlan.toString
      .contains("hashpartitioning(ckey"),
      df.queryExecution.executedPlan.toString)
  }

  test("LEFT SEMI and LEFT ANTI joins rewrite — decontamination " +
      "shape: zero Exchange, left-only output, residuals inside the " +
      "node, parity through the spill fallback") {
    PDataset.divisionJoinMinOverride = Some(2)
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val dirA = tempDir("sqldivjoin-sa") + "/ds"
      val dirB = tempDir("sqldivjoin-sb") + "/ds"
      writeSide(dirA, 120, "a") // keys 0-119
      def partB(lo: Long): PDataset =
        PDataset.fromDataFrame(
          spark.range(lo, lo + 20).select(col("id").as("k"),
            (col("id") % 5).as("g"),
            concat(lit("b"), col("id")).as("p_b")), Seq("k"))
      PDataset.concat((40L until 160L by 20L).map(partB))
        .writeParquet(dirB) // keys 40-159
      spark.read.format("graft").load(dirA).createOrReplaceTempView("sja")
      spark.read.format("graft").load(dirB).createOrReplaceTempView("sjb")

      def compare(q: String): Seq[String] = {
        val df = spark.sql(q)
        val (opt, exec) = plans(df)
        assert(opt.contains("DivisionJoin"), opt)
        assert(!exec.contains("Exchange"), exec)
        val got = df.collect().map(_.toString).sorted.toSeq
        spark.conf.set("spark.graft.sql.divisionJoin", "false")
        val want = spark.sql(q).collect().map(_.toString).sorted.toSeq
        spark.conf.set("spark.graft.sql.divisionJoin", "true")
        assert(got == want, s"rule-on != rule-off for: $q")
        got
      }

      // SEMI via explicit syntax and via EXISTS: matched keys only
      val semi = compare("SELECT sja.k, sja.p_a FROM sja " +
        "LEFT SEMI JOIN sjb ON sja.k = sjb.k")
      assert(semi.length == 80, s"keys 40-119 survive, got ${semi.length}")
      val exists = compare("SELECT k, p_a FROM sja WHERE EXISTS " +
        "(SELECT 1 FROM sjb WHERE sja.k = sjb.k)")
      assert(exists == semi)

      // ANTI via NOT EXISTS: unmatched keys only
      val anti = compare("SELECT k, p_a FROM sja WHERE NOT EXISTS " +
        "(SELECT 1 FROM sjb WHERE sja.k = sjb.k)")
      assert(anti.length == 40, s"keys 0-39 survive, got ${anti.length}")

      // residual conjunct decides MATCHING inside the node
      compare("SELECT k, p_a FROM sja WHERE EXISTS " +
        "(SELECT 1 FROM sjb WHERE sja.k = sjb.k AND sja.g + sjb.g < 6)")
      compare("SELECT k, p_a FROM sja WHERE NOT EXISTS " +
        "(SELECT 1 FROM sjb WHERE sja.k = sjb.k AND sja.g + sjb.g < 6)")

      // null-key left rows never match: SEMI drops them, ANTI keeps
      // them (NOT-EXISTS semantics, not null-aware NOT-IN)
      val dirN = tempDir("sqldivjoin-sn") + "/ds"
      val pN1 = PDataset.fromDataFrame(
        spark.range(0, 20).select(
          when(col("id") < 3, lit(null).cast("long"))
            .otherwise(col("id")).as("k"),
          (col("id") % 5).as("g"),
          concat(lit("n"), col("id")).as("p_n")), Seq("k"))
      val pN2 = PDataset.fromDataFrame(
        spark.range(20, 40).select(col("id").as("k"),
          (col("id") % 5).as("g"),
          concat(lit("n"), col("id")).as("p_n")), Seq("k"))
      PDataset.concat(Seq(pN1, pN2)).writeParquet(dirN)
      spark.read.format("graft").load(dirN).createOrReplaceTempView("sjn")
      val semiN = compare("SELECT sjn.k, sjn.p_n FROM sjn " +
        "LEFT SEMI JOIN sja ON sjn.k = sja.k")
      assert(semiN.length == 37 && !semiN.exists(_.contains("null")),
        s"null keys never match a SEMI, got $semiN")
      val antiN = compare("SELECT k, p_n FROM sjn WHERE NOT EXISTS " +
        "(SELECT 1 FROM sja WHERE sjn.k = sja.k)")
      assert(antiN.length == 3 && antiN.forall(_.startsWith("[null")),
        s"ANTI keeps exactly the null-key rows, got $antiN")

      // DOUBLE keys: EXISTS/IN shapes reach the late optimizer pass
      // AFTER NormalizeFloatingNumbers wrapped the key equality — the
      // rewrite unwraps the normalization nodes to the bare attrs
      val dirFa = tempDir("sqldivjoin-fa") + "/ds"
      val dirFb = tempDir("sqldivjoin-fb") + "/ds"
      def partF(lo: Long, p: String): PDataset =
        PDataset.fromDataFrame(
          spark.range(lo, lo + 20).select(
            col("id").cast("double").as("k"),
            concat(lit(p), col("id")).as(s"p_$p")), Seq("k"))
      PDataset.concat((0L until 120L by 20L).map(partF(_, "fa")))
        .writeParquet(dirFa)
      PDataset.concat((40L until 160L by 20L).map(partF(_, "fb")))
        .writeParquet(dirFb)
      spark.read.format("graft").load(dirFa).createOrReplaceTempView("sfa")
      spark.read.format("graft").load(dirFb).createOrReplaceTempView("sfb")
      val antiF = compare("SELECT k, p_fa FROM sfa WHERE NOT EXISTS " +
        "(SELECT 1 FROM sfb WHERE sfa.k = sfb.k)")
      assert(antiF.length == 40, s"double-key anti, got ${antiF.length}")

      // parity survives the Grace spill fallback (keys-only buckets)
      val oldThreshold =
        graft.plans.DivisionJoinExec.buildSpillThresholdBytes
      graft.plans.DivisionJoinExec.buildSpillThresholdBytes = 100L
      try {
        graft.plans.DivisionJoinExec.spillCount.set(0L)
        val semiSpill = compare("SELECT sja.k, sja.p_a FROM sja " +
          "LEFT SEMI JOIN sjb ON sja.k = sjb.k")
        assert(semiSpill == semi)
        val antiSpill = compare("SELECT k, p_a FROM sja WHERE NOT " +
          "EXISTS (SELECT 1 FROM sjb WHERE sja.k = sjb.k)")
        assert(antiSpill == anti)
        assert(graft.plans.DivisionJoinExec.spillCount.get > 0,
          "fixture did not exercise the spill path")
      } finally {
        graft.plans.DivisionJoinExec.buildSpillThresholdBytes =
          oldThreshold
      }
    } finally {
      PDataset.divisionJoinMinOverride = None
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.set("spark.graft.sql.divisionJoin", "true")
    }
  }

  test("the division join DECLARES its range partitioning: groupBy / " +
      "orderBy on the join keys above it adds no Exchange; grouping " +
      "off the keys still shuffles") {
    PDataset.divisionJoinMinOverride = Some(2)
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val dirA = tempDir("sqldivjoin-pa") + "/ds"
      val dirB = tempDir("sqldivjoin-pb") + "/ds"
      writeSide(dirA, 160, "a")
      writeSide(dirB, 120, "b")
      spark.read.format("graft").load(dirA).createOrReplaceTempView("pja")
      spark.read.format("graft").load(dirB).createOrReplaceTempView("pjb")

      def check(q: String, expectExchange: Boolean): Unit = {
        val df = spark.sql(q)
        val (opt, exec) = plans(df)
        assert(opt.contains("DivisionJoin"), opt)
        if (expectExchange) assert(exec.contains("Exchange"), exec)
        else assert(!exec.contains("Exchange"), exec)
        val got = df.collect().map(_.toString).sorted.toSeq
        spark.conf.set("spark.graft.sql.divisionJoin", "false")
        val want = spark.sql(q).collect().map(_.toString).sorted.toSeq
        spark.conf.set("spark.graft.sql.divisionJoin", "true")
        assert(got == want, s"rule-on != rule-off for: $q")
      }

      // join + GROUP BY the join key: Exchange-free END TO END —
      // every key group lives wholly inside one division partition
      check("SELECT pja.k, count(*) AS c, sum(pjb.g) AS s " +
        "FROM pja JOIN pjb ON pja.k = pjb.k GROUP BY pja.k",
        expectExchange = false)
      // grouping FINER than the keys (key + extra) is still contained
      check("SELECT pja.k, pja.g, count(*) AS c " +
        "FROM pja JOIN pjb ON pja.k = pjb.k GROUP BY pja.k, pja.g",
        expectExchange = false)
      // ORDER BY the join key: partitions are already range-ordered —
      // a local sort per partition, no range Exchange. (OrderedDistribution
      // satisfaction upstream is LITERAL SortOrder equality, so the sort
      // reference must be qualifier-free — an output alias is; a
      // view-qualified `ORDER BY pja.k` carries the view qualifier and
      // misses the claim. ClusteredDistribution uses semanticEquals,
      // so groupBy/distinct compose regardless of qualification.)
      check("SELECT pja.k AS k2, pjb.p_b FROM pja JOIN pjb " +
        "ON pja.k = pjb.k ORDER BY k2", expectExchange = false)
      // grouping OFF the keys must still shuffle (the claim is not
      // over-broad)
      check("SELECT pja.g, count(*) AS c " +
        "FROM pja JOIN pjb ON pja.k = pjb.k GROUP BY pja.g",
        expectExchange = true)
      // DISTINCT on the key: no Exchange either
      check("SELECT DISTINCT pja.k FROM pja JOIN pjb ON pja.k = pjb.k",
        expectExchange = false)
    } finally {
      PDataset.divisionJoinMinOverride = None
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.set("spark.graft.sql.divisionJoin", "true")
    }
  }

  test("the q_sql_division_semi / _anti / _join_agg entry queries " +
      "really plan the zero-Exchange division join") {
    for (name <- Seq("q_sql_division_semi", "q_sql_division_anti",
        "q_sql_division_join_agg")) {
      val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      val opt = df.queryExecution.optimizedPlan.toString
      assert(opt.contains("DivisionJoin"), s"$name: $opt")
      val exec = df.queryExecution.executedPlan.toString
      assert(!exec.contains("hashpartitioning(ckey"), s"$name: $exec")
      if (name == "q_sql_division_join_agg")
        // join + groupBy-on-key + orderBy/limit: NO Exchange anywhere
        assert(!exec.contains("Exchange"), s"$name: $exec")
    }
  }

  test("self-join and three-way chains stay correct under the rewrite") {
    PDataset.divisionJoinMinOverride = Some(2)
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val dirA = tempDir("sqldivjoin-self") + "/ds"
      writeSide(dirA, 100, "s") // 5 files
      spark.read.format("graft").load(dirA).createOrReplaceTempView("djs")
      val q = "SELECT x.k, x.p_s, y.p_s AS q_s FROM djs x " +
        "JOIN djs y ON x.k = y.k"
      val df = spark.sql(q)
      assert(plans(df)._1.contains("DivisionJoin"), plans(df)._1)
      val got = df.orderBy("k").collect().toSeq
      spark.conf.set("spark.graft.sql.divisionJoin", "false")
      val want = spark.sql(q).orderBy("k").collect().toSeq
      spark.conf.set("spark.graft.sql.divisionJoin", "true")
      assert(got == want && got.length == 100)
    } finally {
      PDataset.divisionJoinMinOverride = None
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.set("spark.graft.sql.divisionJoin", "true")
    }
  }
}
