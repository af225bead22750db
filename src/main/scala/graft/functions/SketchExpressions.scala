package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd sketch kernels. The logical definitions live in
  * graft.operators.Dedup as higher-order-function expressions; these
  * expressions compute the identical values (same parameters, same
  * arithmetic, bit-for-bit) with a tight generated loop instead of k
  * nested interpreted lambdas — the difference between O(rows) and
  * O(rows x perms) interpreter dispatch.
  */

/** MinHash signature over a pre-hashed shingle array:
  * sig[i] = min over h of ((a_i * h + b_i) mod p). Empty input gives
  * an array of p (the identity of min under the modulus bound).
  */
case class MinHashSigExpr(
    child: Expression,
    numPerms: Int,
    seed: Long,
    prime: Long) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val params: (Array[Long], Array[Long]) = {
    val rnd = new java.util.Random(seed)
    val as = Array.fill(numPerms)((rnd.nextInt(1 << 30) | 1).toLong)
    val bs = Array.fill(numPerms)(rnd.nextInt(Int.MaxValue).toLong)
    (as, bs)
  }

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val (as, bs) = params
    val out = new Array[Long](numPerms)
    var i = 0
    while (i < numPerms) {
      var mn = Long.MaxValue
      var j = 0
      val n = hs.numElements()
      while (j < n) {
        val v = java.lang.Math.floorMod(as(i) * hs.getLong(j) + bs(i), prime)
        if (v < mn) mn = v
        j += 1
      }
      out(i) = if (n == 0) prime else mn
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (as, bs) = params
    val aRef = ctx.addReferenceObj("minhashA", as, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bs, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val mn = ctx.freshName("mn")
      val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      s"""
        long[] $out = new long[$numPerms];
        int $n = $c.numElements();
        for (int $i = 0; $i < $numPerms; $i++) {
          long $mn = Long.MAX_VALUE;
          for (int $j = 0; $j < $n; $j++) {
            long $v = java.lang.Math.floorMod(
              $aRef[$i] * $c.getLong($j) + $bRef[$i], ${prime}L);
            if ($v < $mn) $mn = $v;
          }
          $out[$i] = ($n == 0) ? ${prime}L : $mn;
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })
  }

  override protected def withNewChildInternal(c: Expression): MinHashSigExpr =
    copy(child = c)
  override def prettyName: String = "minhash_sig"
}

/** 64-bit SimHash from a token-hash array: bit i set iff more than
  * half the tokens have bit i set. */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val counts = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = hs.getLong(j)
      var i = 0
      while (i < 64) {
        counts(i) += ((h >>> i) & 1L).toInt
        i += 1
      }
      j += 1
    }
    var sim = 0L
    var i = 0
    while (i < 64) {
      if (counts(i) * 2 > n) sim |= (1L << i)
      i += 1
    }
    sim
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val sim = ctx.freshName("sim")
      s"""
        int $n = $c.numElements();
        int[] $counts = new int[64];
        for (int $j = 0; $j < $n; $j++) {
          long $h = $c.getLong($j);
          for (int $i = 0; $i < 64; $i++) {
            $counts[$i] += (int) (($h >>> $i) & 1L);
          }
        }
        long $sim = 0L;
        for (int $i = 0; $i < 64; $i++) {
          if ($counts[$i] * 2 > $n) $sim |= (1L << $i);
        }
        ${ev.value} = $sim;
      """
    })

  override protected def withNewChildInternal(c: Expression): SimHash64Expr =
    copy(child = c)
  override def prettyName: String = "simhash64"
}

/** All hyperplane-LSH bucket signatures of a float/double vector in one
  * pass: output[t] packs sign bits of the vector against planes
  * [t*nPlanes, (t+1)*nPlanes) — bit p set iff dot(v, plane) > 0, the
  * exact arithmetic of the `when(vec_dot(v, lit_plane) > 0, 1L << p)`
  * tree it replaces (double accumulation in ascending index order,
  * null elements as 0), but as ONE tight generated loop instead of
  * tables x nPlanes separate expression trees whose codegen size grows
  * with the table count. */
case class HyperplaneSigsExpr(
    child: Expression,
    planes: Array[Array[Double]],
    nPlanes: Int) extends UnaryExpression {

  require(planes.nonEmpty && planes.length % nPlanes == 0,
    "planes count must be a positive multiple of nPlanes")
  private def tables: Int = planes.length / nPlanes

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.FloatType, _) |
           ArrayType(org.apache.spark.sql.types.DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_sigs needs array<float|double>, got $other")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType ==
      org.apache.spark.sql.types.FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val fl = isFloat
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var sig = 0L
      var p = 0
      while (p < nPlanes) {
        val pl = planes(t * nPlanes + p)
        var acc = 0.0
        val m = math.min(n, pl.length)
        var i = 0
        while (i < m) {
          val xv =
            if (v.isNullAt(i)) 0.0
            else if (fl) v.getFloat(i).toDouble else v.getDouble(i)
          acc += xv * pl(i)
          i += 1
        }
        if (acc > 0) sig |= (1L << p)
        p += 1
      }
      out(t) = sig
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("lshPlanes", planes, "double[][]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("out")
      val n = ctx.freshName("n")
      val t = ctx.freshName("t")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val pl = ctx.freshName("pl")
      val acc = ctx.freshName("acc")
      val sig = ctx.freshName("sig")
      s"""
        long[] $out = new long[$tables];
        int $n = $c.numElements();
        for (int $t = 0; $t < $tables; $t++) {
          long $sig = 0L;
          for (int $p = 0; $p < $nPlanes; $p++) {
            double[] $pl = $planesRef[$t * $nPlanes + $p];
            double $acc = 0.0;
            int $m = java.lang.Math.min($n, $pl.length);
            for (int $i = 0; $i < $m; $i++) {
              double xv = $c.isNullAt($i) ? 0.0 : (double) $c.$get($i);
              $acc += xv * $pl[$i];
            }
            if ($acc > 0) $sig |= (1L << $p);
          }
          $out[$t] = $sig;
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })
  }

  override protected def withNewChildInternal(c: Expression): HyperplaneSigsExpr =
    copy(child = c)
  override def prettyName: String = "hyperplane_sigs"
}

/** Per-element 64-bit hashes of a string array in one pass — replaces
  * `transform(arr, t => hash(t))` trees whose lambda body evaluates
  * interpreted per element (per-token md5/conv through the expression
  * interpreter was the dominant cost of the simhash pipeline).
  *
  * algo:
  *  - "xxh64_32": Spark's `xxhash64(elem)` (seed 42) masked to 32
  *    bits — the MinHash element hash.
  *  - "md5_64": first 64 bits of `md5(elem)` big-endian — the SimHash
  *    token hash, bit-identical to [[graft.operators.Dedup.md5Hash64]]
  *    and DuckDB's `('0x' || substr(md5(t), 1, 16))::UBIGINT`.
  *  - "md5_62": the md5 prefix logically shifted right by 2 — always
  *    non-negative, so signed (Spark) and unsigned (DuckDB) orderings
  *    agree; used where hash ORDER matters (winnowing min-selection).
  *
  * Elements must be non-null (both producers — tokens, shingles —
  * guarantee it); a null element hashes to 0.
  */
case class StringArrayHash64Expr(child: Expression, algo: String)
    extends UnaryExpression {

  require(Seq("xxh64_32", "md5_64", "md5_62").contains(algo),
    s"unknown algo '$algo'")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"string_array_hash64 needs array<string>, got $other")
    }

  @transient private lazy val md5Local =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** The shared kernel: called once per row from both interpreted eval
    * and generated code (one virtual call, loop in compiled Scala). */
  // reused digest sink: md.digest(buf) instead of a fresh 16-byte
  // array per element (this kernel runs per token/shingle)
  @transient private lazy val digestBuf =
    new ThreadLocal[Array[Byte]] {
      override def initialValue(): Array[Byte] = new Array[Byte](16)
    }

  def hashArray(input: ArrayData): ArrayData = {
    val n = input.numElements()
    val out = new Array[Long](n)
    val xx = algo == "xxh64_32"
    val shift = if (algo == "md5_62") 2 else 0
    val md = if (xx) null else md5Local.get()
    val buf = if (xx) null else digestBuf.get()
    var i = 0
    while (i < n) {
      out(i) =
        if (input.isNullAt(i)) 0L
        else if (xx)
          org.apache.spark.sql.catalyst.expressions.XXH64
            .hashUTF8String(input.getUTF8String(i), 42L) & 0xFFFFFFFFL
        else {
          md.reset()
          md.update(input.getUTF8String(i).getBytes)
          md.digest(buf, 0, 16)
          (((buf(0) & 0xffL) << 56) | ((buf(1) & 0xffL) << 48) |
            ((buf(2) & 0xffL) << 40) | ((buf(3) & 0xffL) << 32) |
            ((buf(4) & 0xffL) << 24) | ((buf(5) & 0xffL) << 16) |
            ((buf(6) & 0xffL) << 8) | (buf(7) & 0xffL)) >>> shift
        }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    hashArray(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenHasher", this,
      classOf[StringArrayHash64Expr].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.hashArray($c);")
  }

  override protected def withNewChildInternal(c: Expression): StringArrayHash64Expr =
    copy(child = c)
  override def prettyName: String = "string_array_hash64"
}

/** md5-prefix hashes of every positional character k-gram of a string,
  * in one pass — the winnowing rolling-hash stage. As a single
  * expression the (normalized) string child evaluates exactly once; a
  * `transform(sequence(...), i => substr(t, i, k))` tree re-evaluates
  * `t` — including its regex normalization — per gram after
  * CollapseProject inlines it into the lambda. Grams are code-point
  * based (matching SQL substr); texts shorter than k yield one
  * (short) gram. `shift` logically right-shifts each hash (62-bit
  * hashes keep signed/unsigned order identical across engines).
  */
case class CharGramHash64Expr(child: Expression, k: Int, shift: Int)
    extends UnaryExpression {

  require(k >= 1 && shift >= 0 && shift < 64, "bad k or shift")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_gram_hash64 needs a string, got $other")
    }

  @transient private lazy val md5Local =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }
  // reused digest sink: md.digest(buf) instead of a fresh 16-byte
  // array per gram (this kernel runs per character of the corpus)
  @transient private lazy val digestBuf =
    new ThreadLocal[Array[Byte]] {
      override def initialValue(): Array[Byte] = new Array[Byte](16)
    }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    // ONE pass over the UTF-8 bytes with two sliding code-point
    // cursors (gram start, gram end): each gram hashes the byte slice
    // [startB, endB) directly — md5 over exactly the bytes
    // substringSQL(i+1, k).getBytes produced, without materializing a
    // UTF8String slice + byte copy + fresh digest array per gram
    // (those allocations dominated the winnowing/LM/DSIR scans; the
    // hash value is bit-identical).
    val bytes = s.getBytes
    val total = bytes.length
    val n = s.numChars()
    val count = math.max(n - k + 1, 1)
    val md = md5Local.get()
    val buf = digestBuf.get()
    val out = new Array[Long](count)
    def step(off: Int): Int = off +
      org.apache.spark.unsafe.types.UTF8String.numBytesForFirstByte(bytes(off))
    // endB starts at the byte offset of code point min(k, n)
    var endB = 0
    var c = 0
    while (c < k && endB < total) { endB = step(endB); c += 1 }
    var startB = 0
    var i = 0
    while (i < count) {
      md.reset()
      md.update(bytes, startB, endB - startB)
      md.digest(buf, 0, 16)
      out(i) = (((buf(0) & 0xffL) << 56) | ((buf(1) & 0xffL) << 48) |
        ((buf(2) & 0xffL) << 40) | ((buf(3) & 0xffL) << 32) |
        ((buf(4) & 0xffL) << 24) | ((buf(5) & 0xffL) << 16) |
        ((buf(6) & 0xffL) << 8) | (buf(7) & 0xffL)) >>> shift
      if (startB < total) startB = step(startB)
      if (endB < total) endB = step(endB)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gramHasher", this,
      classOf[CharGramHash64Expr].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)" +
        s" $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(c: Expression): CharGramHash64Expr =
    copy(child = c)
  override def prettyName: String = "char_gram_hash64"
}

/** Winnowing selection over a rolling-hash array: the minimum of every
  * w-gram window, deduplicated and sorted — one pass over the array.
  * As a single expression the hash-array child evaluates exactly once;
  * the equivalent `transform(windows, j => array_min(slice(hs, j, w)))`
  * tree re-evaluates `hs` per window after CollapseProject inlines it
  * into the lambda (O(n^2) hashing per row). */
case class WinnowMinsExpr(child: Expression, w: Int) extends UnaryExpression {

  require(w >= 1, "window size must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val out = new java.util.TreeSet[java.lang.Long]()
    if (n > 0) {
      val nw = math.max(n - w + 1, 1)
      var j = 0
      while (j < nw) {
        var mn = Long.MaxValue
        var i = j
        val end = math.min(j + w, n)
        while (i < end) {
          val v = hs.getLong(i)
          if (v < mn) mn = v
          i += 1
        }
        out.add(mn)
        j += 1
      }
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnower", this,
      classOf[WinnowMinsExpr].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)" +
        s" $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(c: Expression): WinnowMinsExpr =
    copy(child = c)
  override def prettyName: String = "winnow_mins"
}

/** All positional k-TOKEN shingles of a string in one pass:
  * `array<struct<h:long, s:int, e:int>>` where `h` is the 62-bit
  * md5-prefix hash of the shingle's tokens joined by one space, `s`
  * the 0-based code-point offset of the shingle's first token and `e`
  * the exclusive end of its last — the ExactSubstr (Lee et al. 2022)
  * unit: equal token runs hash equal regardless of the whitespace
  * between them, and the offsets let the caller cut the matched span
  * out of the ORIGINAL text. Tokens are maximal runs of characters
  * outside {space, \t, \n, \r} (the cross-engine-safe ASCII set, so a
  * DuckDB `[^ \t\n\r]+` rederivation tokenizes identically); texts
  * with fewer than k tokens yield an empty array. One expression =
  * one text evaluation (see the class note on CharGramHash64Expr's
  * CollapseProject hazard).
  */
case class TokenSpanShinglesExpr(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, s"shingle length must be positive, got $k")

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("h", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("s",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("e",
        org.apache.spark.sql.types.IntegerType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"token_span_shingles needs a string, got $other")
    }

  @transient private lazy val md5Local =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  // reused digest sink: md.digest(buf) instead of a fresh 16-byte
  // array per shingle (this kernel runs per token of the corpus)
  @transient private lazy val digestBuf =
    new ThreadLocal[Array[Byte]] {
      override def initialValue(): Array[Byte] = new Array[Byte](16)
    }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    // ONE byte-level scan: token (start, end) in CODE POINTS (SQL
    // substr units, carried in the output) plus UTF-8 BYTE bounds for
    // hashing. The whitespace set {space, \t, \n, \r} is single-byte
    // UTF-8 and can never occur inside a multi-byte sequence, so
    // byte-wise detection tokenizes identically to the code-point
    // walk. Each shingle then md5-updates its token byte slices with
    // single-space separators — the exact bytes of
    // (tokens mkString " ").getBytes(UTF_8) — without materializing a
    // StringBuilder + String + byte copy per shingle (those
    // allocations dominated the span-dedup scans; hash bit-identical).
    val bytes = s.getBytes
    val total = bytes.length
    val cpStart = new java.util.ArrayList[Int]()
    val cpEnd = new java.util.ArrayList[Int]()
    val bStart = new java.util.ArrayList[Int]()
    val bEnd = new java.util.ArrayList[Int]()
    var off = 0
    var cp = 0
    var inTok = false
    while (off < total) {
      val b = bytes(off)
      val ws = b == ' '.toByte || b == '\t'.toByte ||
        b == '\n'.toByte || b == '\r'.toByte
      if (ws) {
        if (inTok) { cpEnd.add(cp); bEnd.add(off); inTok = false }
      } else if (!inTok) {
        cpStart.add(cp); bStart.add(off); inTok = true
      }
      off += org.apache.spark.unsafe.types.UTF8String.numBytesForFirstByte(b)
      cp += 1
    }
    if (inTok) { cpEnd.add(cp); bEnd.add(total) }
    val n = cpStart.size()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val md = md5Local.get()
    val buf = digestBuf.get()
    val out = new Array[Any](n - k + 1)
    var i = 0
    while (i <= n - k) {
      md.reset()
      var j = i
      while (j < i + k) {
        if (j > i) md.update(' '.toByte)
        md.update(bytes, bStart.get(j), bEnd.get(j) - bStart.get(j))
        j += 1
      }
      md.digest(buf, 0, 16)
      val h = (((buf(0) & 0xffL) << 56) | ((buf(1) & 0xffL) << 48) |
        ((buf(2) & 0xffL) << 40) | ((buf(3) & 0xffL) << 32) |
        ((buf(4) & 0xffL) << 24) | ((buf(5) & 0xffL) << 16) |
        ((buf(6) & 0xffL) << 8) | (buf(7) & 0xffL)) >>> 2
      out(i) = org.apache.spark.sql.catalyst.InternalRow(
        h, cpStart.get(i), cpEnd.get(i + k - 1))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("spanShingler", this,
      classOf[TokenSpanShinglesExpr].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)" +
        s" $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(c: Expression): TokenSpanShinglesExpr =
    copy(child = c)
  override def prettyName: String = "token_span_shingles"
}

object SketchExpressions {
  def tokenSpanShingles(text: Column, k: Int): Column =
    GraftBridge.toColumn(
      TokenSpanShinglesExpr(GraftBridge.toExpression(text), k))

  def charGramHash64(text: Column, k: Int, shift: Int): Column =
    GraftBridge.toColumn(
      CharGramHash64Expr(GraftBridge.toExpression(text), k, shift))

  def winnowMins(hashes: Column, w: Int): Column =
    GraftBridge.toColumn(
      WinnowMinsExpr(GraftBridge.toExpression(hashes), w))

  def stringArrayHash64(arr: Column, algo: String): Column =
    GraftBridge.toColumn(
      StringArrayHash64Expr(GraftBridge.toExpression(arr), algo))

  def minhashSig(hashes: Column, numPerms: Int, seed: Long, prime: Long): Column =
    GraftBridge.toColumn(
      MinHashSigExpr(GraftBridge.toExpression(hashes), numPerms, seed, prime))

  def simhash64(hashes: Column): Column =
    GraftBridge.toColumn(SimHash64Expr(GraftBridge.toExpression(hashes)))

  def hyperplaneSigs(
      vec: Column, planes: Array[Array[Double]], nPlanes: Int): Column =
    GraftBridge.toColumn(
      HyperplaneSigsExpr(GraftBridge.toExpression(vec), planes, nPlanes))
}
