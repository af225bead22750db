package graft

import org.scalatest.funsuite.AnyFunSuite

/** SQL surface of the custom expressions. */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = {
    val s = TestSpark.spark
    GraftExtensions.register(s)
    s
  }

  test("vec_dot is callable from SQL") {
    val r = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .collect()(0).getDouble(0)
    assert(r == 32.0)
  }

  test("canon_text is callable from SQL") {
    val r = spark.sql(
      "SELECT canon_text('  Café -- NOIR!! 42 ') AS c")
      .collect()(0).getString(0)
    assert(r == "cafe noir 42", r)
  }

  test("word_shingles and minhash_sig compose in SQL") {
    val r = spark.sql(
      """SELECT minhash_sig(
           transform(word_shingles('a b c d e', 3),
             s -> xxhash64(s) & 4294967295),
           8, 42) AS sig""").collect()(0).getSeq[Long](0)
    assert(r.length == 8 && r.forall(_ >= 0))
  }

  test("minhash_sig bigint seed is not truncated to 32 bits") {
    import org.apache.spark.sql.functions.{col, lit, transform, xxhash64}
    val seed = (1L << 40) + 42L // intValue() would truncate this to 42
    val sql = spark.sql(
      s"SELECT minhash_sig(array(xxhash64('a'), xxhash64('b')), 8, ${seed}L) AS s")
      .collect()(0).getSeq[Long](0)
    val df = spark.range(1).select(
      graft.functions.SketchExpressions.minhashSig(
        transform(org.apache.spark.sql.functions.array(lit("a"), lit("b")),
          t => xxhash64(t)),
        8, seed, graft.operators.Dedup.MinhashPrime).as("s"))
      .collect()(0).getSeq[Long](0)
    assert(sql == df)
    val truncated = spark.sql(
      "SELECT minhash_sig(array(xxhash64('a'), xxhash64('b')), 8, 42) AS s")
      .collect()(0).getSeq[Long](0)
    assert(sql != truncated, "bigint seed collapsed to its low 32 bits")
  }

  test("non-constant scalar args raise a clear analysis error") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        """SELECT word_shingles(t, n)
           FROM VALUES ('a b c', 2) AS v(t, n)""").collect()
    }
    assert(e.getMessage.contains("foldable"), e.getMessage)
  }

  test("hyperplane_sigs from SQL matches the DataFrame kernel") {
    import org.apache.spark.sql.functions.{array, lit}
    val vec = Seq(0.3f, -1.2f, 0.8f, 2.5f)
    val sql = spark.sql(
      s"SELECT hyperplane_sigs(array(${vec.mkString("F,")}F), 4, 4, 8, 7L) AS s")
      .collect()(0).getSeq[Long](0)
    val df = spark.range(1).select(
      graft.operators.Similarity.hyperplaneSigs(
        array(vec.map(lit): _*), dim = 4, nPlanes = 4, tables = 8).as("s"))
      .collect()(0).getSeq[Long](0)
    assert(sql == df && sql.length == 8)
  }

  test("char_gram_hash64 and winnow_mins compose in SQL") {
    val sql = spark.sql(
      "SELECT winnow_mins(char_gram_hash64('abcdefgh', 3, 2), 4) AS w")
      .collect()(0).getSeq[Long](0)
    val df = spark.range(1).select(
      graft.functions.SketchExpressions.winnowMins(
        graft.functions.SketchExpressions.charGramHash64(
          org.apache.spark.sql.functions.lit("abcdefgh"), 3, 2), 4).as("w"))
      .collect()(0).getSeq[Long](0)
    assert(sql == df && sql.nonEmpty)
    assert(sql == sql.sorted && sql.distinct == sql, "winnow output is sorted distinct")
  }

  test("string_array_hash64 from SQL matches the DataFrame kernel per algo") {
    import org.apache.spark.sql.functions.{array, lit}
    Seq("xxh64_32", "md5_64", "md5_62").foreach { algo =>
      val sql = spark.sql(
        s"SELECT string_array_hash64(array('a', 'bc'), '$algo') AS h")
        .collect()(0).getSeq[Long](0)
      val df = spark.range(1).select(
        graft.functions.SketchExpressions.stringArrayHash64(
          array(lit("a"), lit("bc")), algo).as("h"))
        .collect()(0).getSeq[Long](0)
      assert(sql == df && sql.length == 2, s"algo $algo")
    }
    val e = intercept[Exception] {
      spark.sql("SELECT string_array_hash64(array('a'), 'nope')").collect()
    }
    assert(e.getMessage.contains("unknown algo"), e.getMessage)
  }

  test("simhash64 from SQL") {
    val r = spark.sql(
      """SELECT simhash64(transform(split('a b c', ' '), t -> xxhash64(t)))
         AS h""").collect()(0).getLong(0)
    val r2 = spark.sql(
      """SELECT simhash64(transform(split('a b c', ' '), t -> xxhash64(t)))
         AS h""").collect()(0).getLong(0)
    assert(r == r2)
  }
}
