package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CanonTextExpr, CharGramHash64Expr, FloatVecDot, HyperplaneSigsExpr, MinHashSigExpr, SimHash64Expr, StringArrayHash64Expr, WinnowMinsExpr, WordShinglesExpr}
import graft.operators.{Dedup, Similarity}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions, so `spark.sql` users get the
  * codegen kernels too:
  *
  *   spark = SparkSession.builder()
  *     .withExtensions(new GraftExtensions).getOrCreate()
  *   spark.sql("SELECT vec_dot(a.embedding, b.embedding) ...")
  *
  * Functions: vec_dot(a, b), word_shingles(text, n),
  * minhash_sig(hashes, numPerms, seed), simhash64(hashes),
  * hyperplane_sigs(vec, dim, nPlanes, tables, seed),
  * char_gram_hash64(text, k, shift), winnow_mins(hashes, w),
  * string_array_hash64(tokens, algo).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, usage, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", null, name, usage, ""),
        builder))
    }
    // SQL table-valued change feed: SELECT * FROM graft_changes(t, 2)
    graft.plans.GraftTableFunctions.register(ext)
    // The shuffle-free division join's planner strategy (PDataset.join
    // also installs it lazily via experimental.extraStrategies for
    // sessions built without extensions).
    ext.injectPlannerStrategy(_ => graft.plans.DivisionJoinStrategy)
    // SQL inner joins between two graft tables co-clustered on the
    // join keys rewrite to the zero-Exchange division join
    // automatically (disable: SET spark.graft.sql.divisionJoin=false).
    // The builder ALSO registers the rule in the "User Provided
    // Optimizers" batch (experimental.extraOptimizations) — the only
    // extension point that runs AFTER RewriteSubquery: an EXISTS / IN
    // predicate only BECOMES a LeftSemi/LeftAnti join there, so the
    // decontamination shape (`WHERE NOT EXISTS` between co-clustered
    // corpora) is invisible to the operator-batch injection alone.
    // The builder runs once per session at optimizer construction —
    // before the first query reads extraOptimizations — and the rule
    // is idempotent (an already-rewritten plan has no Join to match),
    // so the double appearance is harmless.
    ext.injectOptimizerRule { s =>
      val rule = new graft.plans.SqlDivisionJoin(s)
      // synchronized: two threads building this session's optimizer
      // concurrently race the check-then-act append (a duplicate rule
      // would be harmless — idempotent — but unbounded growth isn't)
      s.experimental.synchronized {
        if (!s.experimental.extraOptimizations
            .exists(_.isInstanceOf[graft.plans.SqlDivisionJoin]))
          s.experimental.extraOptimizations =
            s.experimental.extraOptimizations :+ rule
      }
      rule
    }
    // SQL GROUP BY on a prefix of a graft table's index columns
    // rewrites to a union of per-division complete aggregates — no
    // Exchange (disable: SET spark.graft.sql.divisionAgg=false).
    // These three run as ONE-SHOT pre-CBO rules, after the fixed-point
    // operator batch: expanding to a g-branch Union inside the
    // fixed point made every later rule iteration walk a g× tree
    // (measured ~150 ms of driver time per branch per query); V1
    // physical planning (PhysicalOperation) still pushes the range
    // filters and pruned columns into each branch's scan, which the
    // specs pin.
    ext.injectPreCBORule { s =>
      // The division rewrites expand to g-branch Unions whose
      // branches generate BYTE-IDENTICAL codegen source (range bounds
      // ride the references array — see DivisionBoundValue), so the
      // source-keyed compile cache JIT-compiles one unit for any g.
      // Spark's stage-id-in-class-name cosmetic defeats that cache
      // (every branch's generated class gets a unique name), turning
      // one compile into g serial driver compiles (~90 ms each) —
      // disable it for graft sessions. Opt out with
      // SET spark.graft.sql.codegenSharedClassNames=false.
      if (s.conf.getOption("spark.graft.sql.codegenSharedClassNames")
          .forall(_.equalsIgnoreCase("true")))
        s.conf.set("spark.sql.codegen.useIdInClassName", "false")
      new graft.plans.SqlDivisionAgg(s)
    }
    // ... and window functions PARTITION BY'd on such a prefix
    // (disable: SET spark.graft.sql.divisionWindow=false).
    ext.injectPreCBORule(s => new graft.plans.SqlDivisionWindow(s))
    // ... and global ORDER BY in the clustering order: locally sorted
    // range slices concatenate into the global order with no
    // RangePartitioning Exchange and no sampling pass
    // (disable: SET spark.graft.sql.divisionSort=false).
    ext.injectPreCBORule(s => new graft.plans.SqlDivisionSort(s))
    // DV-pending `format("graft")` reads: splice the native
    // merge-on-read plan (broadcast anti join over the vectorized
    // sidecar scan) in place of the V1 relation during analysis, so
    // the outer query optimizes through it — pushed filters reach the
    // columnar parquet scan and GraftFileIndex file pruning fires.
    // Sessions without extensions keep the relation's own
    // InternalRow fallback (see graft.sources.DvPendingRelation).
    ext.injectResolutionRule(s => new graft.sources.DvScanSubstitution(s))
    // Catalog (name-based) reads splice down to the V1 graft relation
    // too: metadata-only folds, view rewrites and DV merge-on-read
    // apply to `SELECT ... FROM graft.db.t` exactly as to
    // `format("graft")` path reads; V2 write targets stay untouched.
    ext.injectResolutionRule(s =>
      new graft.sources.GraftV2ScanSubstitution(s))
    // SQL UPDATE / MERGE INTO on graft catalog tables: once resolved,
    // the statement rewrites onto the engine's keyed/copy-on-write
    // primitives (Maintenance.updateWhere/merge) — O(affected files),
    // one commit — instead of Spark's SupportsRowLevelOperations
    // group-based plan.
    ext.injectResolutionRule(s => new graft.plans.GraftRowLevelRewrite(s))
    // Statement-level DDL for graft tables (ALTER TABLE ... ADD/DROP
    // CONSTRAINT, SHOW CONSTRAINTS, DESCRIBE HISTORY, VACUUM),
    // addressed Delta-style by path; everything else delegates to
    // Spark's parser untouched.
    ext.injectParser((_, delegate) =>
      new graft.plans.GraftSqlParser(delegate))
    // Metadata-only count(*) is NOT injected here: it only ever
    // matches graft relations, and creating one installs it via
    // MetadataCount.ensureRule — injecting a second copy would run
    // the transform twice on every plan (ensureRule's
    // extraOptimizations.contains can't see an injected copy).
  }
}

object GraftExtensions {

  private def foldableArg(
      args: Seq[Expression], i: Int, fn: String, what: String): Any = {
    val e = args(i)
    if (!e.foldable)
      throw new org.apache.spark.sql.AnalysisException(
        "DATATYPE_MISMATCH.NON_FOLDABLE_INPUT",
        Map(
          "sqlExpr" -> s"$fn(...)",
          "inputName" -> s"`$what`",
          "inputType" -> "integer literal",
          "inputExpr" -> e.sql))
    e.eval()
  }

  private def intArg(
      args: Seq[Expression], i: Int, default: Int,
      fn: String, what: String): Int =
    if (args.length > i)
      foldableArg(args, i, fn, what).asInstanceOf[Number].intValue()
    else default

  /** Long-typed constant argument — `Number.intValue()` would silently
    * truncate a BIGINT literal (e.g. a seed > 2^31) to 32 bits and
    * select a different permutation family than the DataFrame API. */
  private def longArg(
      args: Seq[Expression], i: Int, default: Long,
      fn: String, what: String): Long =
    if (args.length > i)
      foldableArg(args, i, fn, what).asInstanceOf[Number].longValue()
    else default

  private def stringArg(
      args: Seq[Expression], i: Int, default: String,
      fn: String, what: String): String =
    if (args.length > i) foldableArg(args, i, fn, what) match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case s: String => s
      case other => throw new IllegalArgumentException(
        s"$fn: `$what` must be a string literal, got $other")
    }
    else default

  val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("vec_dot", "vec_dot(a, b) - dot product of two numeric arrays",
      (args: Seq[Expression]) => FloatVecDot(args(0), args(1))),
    ("word_shingles", "word_shingles(text, n) - distinct word n-gram shingles",
      (args: Seq[Expression]) =>
        WordShinglesExpr(args.head,
          intArg(args, 1, 3, "word_shingles", "n"))),
    ("minhash_sig", "minhash_sig(hashes, numPerms, seed) - MinHash signature",
      (args: Seq[Expression]) =>
        MinHashSigExpr(args.head,
          intArg(args, 1, 126, "minhash_sig", "numPerms"),
          longArg(args, 2, 42L, "minhash_sig", "seed"),
          Dedup.MinhashPrime)),
    ("simhash64", "simhash64(hashes) - 64-bit SimHash fingerprint",
      (args: Seq[Expression]) => SimHash64Expr(args.head)),
    ("canon_text",
      "canon_text(text) - Unicode-canonical text for dedup: NFC, " +
        "lowercase, accents stripped, non-alphanumeric runs folded " +
        "to single spaces (one codegen pass, ASCII fast path)",
      (args: Seq[Expression]) => CanonTextExpr(args.head)),
    ("hyperplane_sigs",
      "hyperplane_sigs(vec, dim, nPlanes, tables, seed) - per-table " +
        "hyperplane-LSH bucket signatures of a numeric vector",
      (args: Seq[Expression]) => {
        val nPlanes = intArg(args, 2, 4, "hyperplane_sigs", "nPlanes")
        HyperplaneSigsExpr(args.head,
          Similarity.planesFor(
            intArg(args, 1, 64, "hyperplane_sigs", "dim"),
            nPlanes,
            intArg(args, 3, 8, "hyperplane_sigs", "tables"),
            longArg(args, 4, 7L, "hyperplane_sigs", "seed")),
          nPlanes)
      }),
    ("char_gram_hash64",
      "char_gram_hash64(text, k, shift) - md5-prefix hash of every " +
        "positional character k-gram (winnowing rolling-hash stage)",
      (args: Seq[Expression]) =>
        CharGramHash64Expr(args.head,
          intArg(args, 1, 5, "char_gram_hash64", "k"),
          intArg(args, 2, 2, "char_gram_hash64", "shift"))),
    ("winnow_mins",
      "winnow_mins(hashes, w) - winnowing selection: per-window minima " +
        "of a hash array, deduplicated and sorted",
      (args: Seq[Expression]) =>
        WinnowMinsExpr(args.head, intArg(args, 1, 4, "winnow_mins", "w"))),
    ("string_array_hash64",
      "string_array_hash64(tokens, algo) - 64-bit hash per array element " +
        "(algo: xxh64_32 | md5_64 | md5_62)",
      (args: Seq[Expression]) =>
        StringArrayHash64Expr(args.head,
          stringArg(args, 1, "xxh64_32", "string_array_hash64", "algo"))))

  /** Register on an already-constructed session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, usage, builder) =>
      org.apache.spark.sql.GraftBridge.registerFunction(spark, name,
        new ExpressionInfo("graft", null, name, usage, ""), builder)
    }
}
