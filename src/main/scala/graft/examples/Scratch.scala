package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc debugging for the dedup pipelines (dev tool). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("UTC"))
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TextFunctions
    import graft.operators.Dedup

    val ids = Seq(26L, 455L, 87L, 134L, 92L, 450L)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id").isin(ids: _*))

    // shingle sets + pairwise jaccard among the probe ids
    val sh = docs.select(col("doc_id"),
      TextFunctions.wordShingles(col("text"), 3).as("sh"))
    val a = sh.select(col("doc_id").as("idA"), col("sh").as("shA"))
    val b = sh.select(col("doc_id").as("idB"), col("sh").as("shB"))
    a.join(b, col("idA") < col("idB"))
      .select(col("idA"), col("idB"),
        (size(array_intersect(col("shA"), col("shB"))).cast("double") /
          (size(col("shA")) + size(col("shB")) -
            size(array_intersect(col("shA"), col("shB")))).cast("double"))
          .as("jaccard"))
      .filter(col("jaccard") > 0.5)
      .show(20, false)

    // full pipeline on probe docs only: are the pairs candidates?
    Dedup.minhashNearDupPairs(docs, "doc_id", "text").show(20, false)

    // signatures of 87 vs 134: how many band collisions?
    val withShingles = docs.select(col("doc_id").as("__id"),
      TextFunctions.wordShingles(col("text"), 3).as("__sh"))
      .withColumn("__h", Dedup.shingleHashes(col("__sh")))
      .repartition(col("__id"))
    val sig = withShingles.select(col("__id"),
      Dedup.minhashSignature(col("__h"), 126, 42L).as("__sig"))
    val sigs = sig.collect().map(r =>
      r.getLong(0) -> r.getSeq[Long](1)).toMap
    for (Seq(x, y) <- Seq(Seq(26L, 455L), Seq(87L, 134L), Seq(92L, 450L))) {
      val sx = sigs(x); val sy = sigs(y)
      val eq = sx.zip(sy).count { case (u, v) => u == v }
      val bandHits = (0 until 21).count { bnd =>
        (0 until 6).forall(j => sx(bnd * 6 + j) == sy(bnd * 6 + j))
      }
      println(s"pair ($x,$y): equal minhashes $eq/126, band hits $bandHits/21")
    }

    // __h overlap between 87 and 134; and a direct tiny minhash sanity test
    val hrows = withShingles.select(col("__id"), col("__h")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val h87 = hrows(87L); val h134 = hrows(134L)
    println(s"h87 size ${h87.size}, h134 size ${h134.size}, inter ${(h87 & h134).size}")
    val s87 = sigs(87L)
    println("sig87 head: " + s87.take(5).mkString(","))
    println("sig134 head: " + sigs(134L).take(5).mkString(","))
    // recompute signature on driver from __h to cross-check the Spark expression
    val rnd = new java.util.Random(42L)
    val as = Array.fill(126)((rnd.nextInt(1 << 30) | 1).toLong)
    val bs = Array.fill(126)(rnd.nextInt(Int.MaxValue).toLong)
    def sigOf(hs: Set[Long]) = (0 until 126).map(i => hs.map(x => as(i) * x + bs(i)).min)
    val d87 = sigOf(h87); val d134 = sigOf(h134)
    println("driver sig87 head: " + d87.take(5).mkString(","))
    println(s"driver equal: ${d87.zip(d134).count{case(u,v)=>u==v}}/126")
    println(s"spark-vs-driver 87 equal: ${d87.zip(s87).count{case(u,v)=>u==v}}/126")
    spark.stop()
  }
}
