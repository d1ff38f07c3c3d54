package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The generated Java for every native expression must actually COMPILE.
  * Spark wraps UnsafeProjection in CodeGeneratorWithInterpretedFallback:
  * a Janino compile error is swallowed as a WARN and the projection runs
  * interpreted — tests pass, performance silently dies (this bit
  * normalize_ip: its static helper was named `eval`, which clashes with
  * the inherited Expression.eval and suppresses the static forwarder).
  * GenerateUnsafeProjection.generate throws on compile failure, so these
  * are real assertions, no Spark session needed.
  */
class CodegenCompileSpec extends AnyFunSuite {

  test("normalize_ip generated code compiles and evaluates") {
    val proj = GenerateUnsafeProjection.generate(
      Seq(NormalizeIp(BoundReference(0, StringType, nullable = true))))
    val out = proj(InternalRow(UTF8String.fromString("192.168.0.1")))
    assert(out.getUTF8String(0).toString == "::ffff:192.168.0.1")
    assert(proj(InternalRow(UTF8String.fromString("junk"))).isNullAt(0))
  }

  test("sorted_intersect_size generated code compiles and evaluates") {
    val arrT = ArrayType(LongType, containsNull = false)
    val proj = GenerateUnsafeProjection.generate(Seq(SortedIntersectSize(
      BoundReference(0, arrT, nullable = true),
      BoundReference(1, arrT, nullable = true))))
    val out = proj(InternalRow(
      ArrayData.toArrayData(Array(1L, 3L, 5L, 7L)),
      ArrayData.toArrayData(Array(2L, 3L, 5L, 9L))))
    assert(out.getInt(0) == 2)
  }

  test("nfc_normalize generated code compiles; NFD recomposes, NFC passes through") {
    val proj = GenerateUnsafeProjection.generate(
      Seq(NfcNormalize(BoundReference(0, StringType, nullable = true))))
    val nfd = "cafe\u0301"   // e + combining acute (explicit escapes)
    val out = proj(InternalRow(UTF8String.fromString(nfd)))
    assert(out.getUTF8String(0).toString == "caf\u00e9")
    val already = proj(InternalRow(UTF8String.fromString("caf\u00e9")))
    assert(already.getUTF8String(0).toString == "caf\u00e9")
  }

  test("token_lcs generated code compiles; DP matches brute subsequences") {
    val arrT = ArrayType(StringType, containsNull = true)
    val proj = GenerateUnsafeProjection.generate(Seq(TokenLcs(
      BoundReference(0, arrT, nullable = true),
      BoundReference(1, arrT, nullable = true))))
    def arr(ws: String*): ArrayData =
      ArrayData.toArrayData(ws.map(w =>
        if (w == null) null else UTF8String.fromString(w)).toArray)
    // brute-force LCS over all subsequences of the shorter side
    def brute(a: Seq[String], b: Seq[String]): Int =
      (0 until (1 << a.length)).map { m =>
        val sub = a.indices.filter(i => (m & (1 << i)) != 0).map(a)
        // is sub a subsequence of b?
        var j = 0
        b.foreach { w => if (j < sub.length && sub(j) == w) j += 1 }
        if (j == sub.length) sub.length else 0
      }.max
    val cases = Seq(
      (Seq("the", "cat", "sat", "on", "mat"),
        Seq("a", "cat", "on", "a", "mat")),
      (Seq("a", "b", "a", "b"), Seq("b", "a", "b", "a")),
      (Seq.empty[String], Seq("x")),
      (Seq("x"), Seq.empty[String]),
      (Seq("q", "q", "q"), Seq("z", "z")))
    cases.foreach { case (a, b) =>
      val got = proj(InternalRow(arr(a: _*), arr(b: _*))).getInt(0)
      assert(got == brute(a, b), s"$a vs $b")
    }
    // null elements never match (SQL equality semantics)
    val withNull = proj(InternalRow(
      arr("a", null, "b"), arr(null, "a", "b"))).getInt(0)
    assert(withNull == 2)
  }

  test("vec_dot_int generated code compiles and accumulates in long") {
    val arrT = ArrayType(IntegerType, containsNull = false)
    val proj = GenerateUnsafeProjection.generate(Seq(VecDotInt(
      BoundReference(0, arrT, nullable = true),
      BoundReference(1, arrT, nullable = true))))
    val out = proj(InternalRow(
      ArrayData.toArrayData(Array(127, -127, 64)),
      ArrayData.toArrayData(Array(127, 127, 2))))
    assert(out.getLong(0) == 127L * 127 - 127L * 127 + 128L)
    // int overflow territory: 2^15 elements of 127*127 > Int.MaxValue/2
    val big = Array.fill(1 << 17)(127)
    val sum = proj(InternalRow(
      ArrayData.toArrayData(big), ArrayData.toArrayData(big))).getLong(0)
    assert(sum == (1L << 17) * 127 * 127, "must not wrap at int range")
  }

  test("simhash64 generated code compiles and matches the scalar kernel") {
    val arrT = ArrayType(StringType, containsNull = false)
    val proj = GenerateUnsafeProjection.generate(
      Seq(SimHash64(BoundReference(0, arrT, nullable = true))))
    val toks = Array("the", "quick", "brown", "fox")
    val out = proj(InternalRow(ArrayData.toArrayData(
      toks.map(UTF8String.fromString))))
    // byte-identical to the historical UDF formulation
    val acc = new Array[Int](64)
    toks.foreach { t =>
      val h1 = scala.util.hashing.MurmurHash3.stringHash(t, 0x9747b28c)
      val h2 = scala.util.hashing.MurmurHash3.stringHash(t, 0x85ebca6b)
      val h = (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
      (0 until 64).foreach(i =>
        if (((h >>> i) & 1L) == 1L) acc(i) += 1 else acc(i) -= 1)
    }
    var expect = 0L
    (0 until 64).foreach(i => if (acc(i) > 0) expect |= (1L << i))
    assert(out.getLong(0) == expect)
    // empty token array -> all acc 0 -> signature 0
    assert(proj(InternalRow(ArrayData.toArrayData(
      Array.empty[UTF8String]))).getLong(0) == 0L)
  }

  test("hyperplane_sig generated code compiles and matches the scalar kernel") {
    val arrT = ArrayType(FloatType, containsNull = false)
    val proj = GenerateUnsafeProjection.generate(
      Seq(HyperplaneSig(BoundReference(0, arrT, nullable = true),
        dim = 4, bits = 16, seed = 42L)))
    val v = Array(0.5f, -1.25f, 2.0f, 0.75f)
    val out = proj(InternalRow(ArrayData.toArrayData(v)))
    val rnd = new scala.util.Random(42L)
    val planes = Array.fill(16, 4)(rnd.nextGaussian())
    var expect = 0L
    (0 until 16).foreach { b =>
      val s = (0 until 4).map(i => planes(b)(i) * v(i)).sum
      if (s >= 0) expect |= (1L << b)
    }
    assert(out.getLong(0) == expect)
    // identical vectors share a signature regardless of scale (cosine-preserving)
    val out2 = proj(InternalRow(ArrayData.toArrayData(v.map(_ * 3.0f))))
    assert(out2.getLong(0) == out.getLong(0))
  }

  test("vec_dot / vec_cosine generated code compiles and evaluates") {
    val arrT = ArrayType(FloatType, containsNull = false)
    val a = BoundReference(0, arrT, nullable = true)
    val b = BoundReference(1, arrT, nullable = true)
    val proj = GenerateUnsafeProjection.generate(
      Seq(VecDot(a, b), VecCosine(a, b)))
    val row = InternalRow(
      ArrayData.toArrayData(Array(1.0f, 2.0f, 3.0f)),
      ArrayData.toArrayData(Array(4.0f, 5.0f, 6.0f)))
    val out = proj(row)
    assert(math.abs(out.getDouble(0) - 32.0) < 1e-9)
    assert(math.abs(out.getDouble(1) - 0.9746318) < 1e-6)
    // zero vector -> null cosine, dot 0
    val zrow = InternalRow(
      ArrayData.toArrayData(Array(0.0f, 0.0f, 0.0f)),
      ArrayData.toArrayData(Array(4.0f, 5.0f, 6.0f)))
    val zout = proj(zrow)
    assert(zout.getDouble(0) == 0.0)
    assert(zout.isNullAt(1))
  }

  test("bloom_might_contain_any generated code compiles and evaluates") {
    val bf = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
    Seq(11L, 22L, 33L).foreach(bf.putLong)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val arrT = ArrayType(LongType, containsNull = false)
    val proj = GenerateUnsafeProjection.generate(Seq(BloomMightContainAny(
      BoundReference(0, arrT, nullable = true), bos.toByteArray)))
    // a member hit anywhere in the array -> true
    assert(proj(InternalRow(
      ArrayData.toArrayData(Array(99L, 22L)))).getBoolean(0))
    // Bloom guarantees no false negatives; these probes are all
    // non-members and at fpp 1% on 3 items none should collide
    assert(!proj(InternalRow(
      ArrayData.toArrayData(Array(1L, 2L, 3L)))).getBoolean(0))
    assert(!proj(InternalRow(
      ArrayData.toArrayData(Array.empty[Long]))).getBoolean(0))
  }

  test("ipv6_pair generated code compiles and splits hi/lo correctly") {
    val proj = GenerateUnsafeProjection.generate(
      Seq(Ipv6Pair(BoundReference(0, StringType, nullable = true))))
    val out = proj(InternalRow(UTF8String.fromString("2001:db8::ff")))
    val row = out.getStruct(0, 2)
    assert(row.getLong(0) == 0x20010db800000000L)
    assert(row.getLong(1) == 0xffL)
    // v4 literal lands in the v4-mapped space
    val v4 = proj(InternalRow(UTF8String.fromString("10.1.2.3")))
      .getStruct(0, 2)
    assert(v4.getLong(0) == 0L && v4.getLong(1) == 0xffff0a010203L)
    assert(proj(InternalRow(UTF8String.fromString("nope"))).isNullAt(0))
  }

  test("bitmap set-ops generated code compiles and evaluates") {
    val arrT = ArrayType(LongType, containsNull = false)
    val a = BoundReference(0, arrT, nullable = true)
    val b = BoundReference(1, arrT, nullable = true)
    val proj = GenerateUnsafeProjection.generate(Seq(
      BitmapSetOp(a, b, "and"), BitmapSetOp(a, b, "or"),
      BitmapSetOp(a, b, "andnot"), BitmapSetOp(a, b, "xor"),
      BitmapSetOp(a, b, "has_any"), BitmapSetOp(a, b, "has_all"),
      BitmapContains(a, BoundReference(2, LongType, nullable = true))))
    val out = proj(InternalRow(
      ArrayData.toArrayData(Array(1L, 3L, 5L, 7L)),
      ArrayData.toArrayData(Array(3L, 5L)), 7L))
    assert(out.getArray(0).toLongArray.toSeq == Seq(3L, 5L))
    assert(out.getArray(1).toLongArray.toSeq == Seq(1L, 3L, 5L, 7L))
    assert(out.getArray(2).toLongArray.toSeq == Seq(1L, 7L))
    assert(out.getArray(3).toLongArray.toSeq == Seq(1L, 7L))
    assert(out.getBoolean(4) && out.getBoolean(5) && out.getBoolean(6))
  }

  test("dd_quantile generated code compiles and evaluates") {
    val alpha = 0.01
    val buf = new DdSketchAgg.Buf(scala.collection.mutable.LongMap.empty, 0L)
    val gLn = math.log(DdSketch.gamma(alpha))
    (1 to 100).foreach { i =>
      val b = DdSketch.bucketOf(i.toLong * 10, gLn).toLong
      buf.counts(b) = buf.counts.getOrElse(b, 0L) + 1L
    }
    val bytes = DdSketchAgg(alpha,
      BoundReference(0, LongType, nullable = true)).serialize(buf)
    // NON-nullable inputs are the trap: the result can still be null
    // (empty state), so ev.isNull must be a real variable — with
    // nullSafeCodeGen it is a `false` constant and Janino rejects the
    // assignment, silently falling back to interpreted
    val proj = GenerateUnsafeProjection.generate(Seq(DdQuantile(
      BoundReference(0, BinaryType, nullable = false),
      BoundReference(1, DoubleType, nullable = false), alpha)))
    val out = proj(InternalRow(bytes, 0.5))
    val est = out.getDouble(0)
    // exact median of 10,20,...,1000 at nearest-rank ceil(0.5*100)=50
    // is 500; the sketch must sit within alpha of it
    assert(math.abs(est - 500.0) <= alpha * 500.0 * 1.0001, s"est=$est")
    // empty state → null
    val empty = DdSketchAgg(alpha,
      BoundReference(0, LongType, nullable = true))
      .serialize(new DdSketchAgg.Buf(
        scala.collection.mutable.LongMap.empty, 0L))
    assert(proj(InternalRow(empty, 0.5)).isNullAt(0))
  }

  test("hll_estimate generated code compiles and matches the scalar kernel") {
    val regs = Hll.emptyRegisters()
    (1 to 500).foreach(i => Hll.add(regs,
      org.apache.spark.sql.catalyst.expressions.XxHash64Function
        .hash(i.toLong, LongType, 42L)))
    val proj = GenerateUnsafeProjection.generate(
      Seq(HllEstimate(BoundReference(0, BinaryType, nullable = true))))
    val out = proj(InternalRow(regs))
    assert(out.getLong(0) == Hll.estimate(regs))
    assert(math.abs(out.getLong(0) - 500) <= 25)
  }
}
