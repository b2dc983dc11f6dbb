package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{CountMinAgg, HllRegistersAgg, MinHashSketchAgg, SimHashAgg}

/** The TypedImperativeAggregate shuffle contract, exercised directly:
  * `serialize ∘ deserialize` must be the identity on aggregation
  * buffers (this is the bytes-through-the-exchange path map-side
  * partial aggregation depends on), and `merge` must be commutative
  * and associative so partial aggregation is repartition-invariant.
  * The parametric operator loops only exercise these indirectly —
  * a broken serializer would surface as a data-dependent wrong answer
  * miles from the cause.
  */
class AggBufferSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(99)

  test("SimHashAgg buffer survives serialize/deserialize byte-exactly") {
    val agg = SimHashAgg(null)
    val buf = Array.fill(64)(rnd.nextLong())
    val back = agg.deserialize(agg.serialize(buf.clone()))
    assert(back.toSeq == buf.toSeq)
  }

  test("SimHashAgg merge is commutative and associative") {
    val agg = SimHashAgg(null)
    def b() = Array.fill(64)((rnd.nextInt(1000) - 500).toLong)
    val (x, y, z) = (b(), b(), b())
    val xy = agg.merge(x.clone(), y.clone())
    val yx = agg.merge(y.clone(), x.clone())
    assert(xy.toSeq == yx.toSeq)
    val xy_z = agg.merge(agg.merge(x.clone(), y.clone()), z.clone())
    val x_yz = agg.merge(x.clone(), agg.merge(y.clone(), z.clone()))
    assert(xy_z.toSeq == x_yz.toSeq)
  }

  test("SimHashAgg eval packs sign bits with bit 16j as band j's MSB") {
    val agg = SimHashAgg(null)
    // counter >= 0 → bit 1; only bit 0 (MSB of band 0) positive
    val buf = Array.fill(64)(-1L)
    buf(0) = 0L
    val bands = agg.eval(buf)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray()
    assert(bands.toSeq == Seq(32768L, 0L, 0L, 0L))
  }

  test("MinHashSketchAgg buffer survives serialize/deserialize byte-exactly") {
    val agg = MinHashSketchAgg(null)
    val buf = Array.fill(64)(rnd.nextLong())
    val back = agg.deserialize(agg.serialize(buf.clone()))
    assert(back.toSeq == buf.toSeq)
  }

  test("MinHashSketchAgg merge is elementwise min (commutative, idempotent)") {
    val agg = MinHashSketchAgg(null)
    def b() = Array.fill(64)(rnd.nextLong())
    val (x, y) = (b(), b())
    val xy = agg.merge(x.clone(), y.clone())
    val yx = agg.merge(y.clone(), x.clone())
    assert(xy.toSeq == yx.toSeq)
    assert(xy.toSeq == x.zip(y).map { case (a, c) => math.min(a, c) }.toSeq)
    // merging with itself is the identity
    assert(agg.merge(x.clone(), x.clone()).toSeq == x.toSeq)
    // the empty buffer is the identity element
    assert(agg.merge(agg.createAggregationBuffer(), x.clone()).toSeq == x.toSeq)
  }

  test("GramCovAgg buffer survives serialize/deserialize byte-exactly") {
    val agg = graft.functions.GramCovAgg(null)
    val buf = new graft.functions.GramCovAgg.Buf(-1, 0L, null, null)
    buf.init(5)
    buf.n = 7L
    buf.s.indices.foreach(i => buf.s(i) = rnd.nextLong())
    buf.g.indices.foreach(i => buf.g(i) = rnd.nextLong())
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.d == 5 && back.n == 7L)
    assert(back.s.toSeq == buf.s.toSeq && back.g.toSeq == buf.g.toSeq)
    // the empty (uninitialized) buffer round-trips too
    val empty = agg.deserialize(agg.serialize(
      agg.createAggregationBuffer()))
    assert(empty.d == -1 && empty.n == 0L)
  }

  test("GramCovAgg merge is elementwise addition with empty identity") {
    val agg = graft.functions.GramCovAgg(null)
    def b(seed: Int) = {
      val r = new scala.util.Random(seed)
      val x = new graft.functions.GramCovAgg.Buf(-1, 0L, null, null)
      x.init(4)
      x.n = r.nextInt(100).toLong
      x.s.indices.foreach(i => x.s(i) = (r.nextInt(2000) - 1000).toLong)
      x.g.indices.foreach(i => x.g(i) = (r.nextInt(2000) - 1000).toLong)
      x
    }
    val xy = agg.merge(b(1), b(2))
    val yx = agg.merge(b(2), b(1))
    assert(xy.n == yx.n && xy.s.toSeq == yx.s.toSeq && xy.g.toSeq == yx.g.toSeq)
    val m1 = agg.merge(agg.merge(b(1), b(2)), b(3))
    val m2 = agg.merge(b(1), agg.merge(b(2), b(3)))
    assert(m1.s.toSeq == m2.s.toSeq && m1.g.toSeq == m2.g.toSeq && m1.n == m2.n)
    // empty is the identity in either position
    val viaEmpty = agg.merge(agg.createAggregationBuffer(), b(4))
    val ref = b(4)
    assert(viaEmpty.n == ref.n && viaEmpty.s.toSeq == ref.s.toSeq)
  }

  test("GramCovAgg numerators match the brute-force covariance algebra") {
    // drive update/merge/eval directly against a tiny corpus and check
    // n·Σxᵢxⱼ − Σxᵢ·Σxⱼ for every (i, j) pair vs plain Scala sums,
    // with the corpus split across two buffers (the map-side shape)
    val vecs = Seq(
      Array(3L, -1L, 4L), Array(1L, 5L, -9L),
      Array(2L, 6L, 5L), Array(-3L, 5L, 8L), Array(9L, -7L, 9L))
    val agg = graft.functions.GramCovAgg(
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        0, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType), nullable = true))
    def rowOf(v: Array[Long]) =
      org.apache.spark.sql.catalyst.InternalRow(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(v))
    val b1 = agg.createAggregationBuffer()
    val b2 = agg.createAggregationBuffer()
    vecs.take(2).foreach(v => agg.update(b1, rowOf(v)))
    vecs.drop(2).foreach(v => agg.update(b2, rowOf(v)))
    val merged = agg.merge(b1, b2)
    val out = agg.eval(merged)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
    val n = vecs.length.toLong
    var idx = 0
    for (i <- 0 until 3; j <- i until 3) {
      val row = out.array(idx)
        .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
      val sij = vecs.map(v => v(i) * v(j)).sum
      val si = vecs.map(_(i)).sum
      val sj = vecs.map(_(j)).sum
      assert(row.getLong(0) == i + 1 && row.getLong(1) == j + 1)
      assert(row.getLong(2) == n * sij - si * sj,
        s"pair ($i,$j): got ${row.getLong(2)}, want ${n * sij - si * sj}")
      assert(row.getLong(3) == n)
      idx += 1
    }
  }

  // ---- r13 VERDICT task 3: the two r13 sketch aggregates get the same
  // serialize/deserialize/merge-across-JVM-boundary fuzz as the older
  // TypedImperativeAggregates — arbitrary update/merge interleavings,
  // with every partial round-tripped through its wire bytes (the
  // map-side-partial → exchange → final-merge path), must be
  // bit-identical to one sequential buffer.

  private def hllAgg = HllRegistersAgg(
    org.apache.spark.sql.catalyst.expressions.BoundReference(
      0, org.apache.spark.sql.types.LongType, nullable = true))
  private def cmsAgg = CountMinAgg(
    org.apache.spark.sql.catalyst.expressions.BoundReference(
      0, org.apache.spark.sql.types.LongType, nullable = true))
  private def longRow(v: Any) =
    org.apache.spark.sql.catalyst.InternalRow(v)

  test("HllRegistersAgg buffer survives serialize/deserialize byte-exactly") {
    val agg = hllAgg
    val buf = Array.fill(HllRegistersAgg.M)(
      (rnd.nextInt(HllRegistersAgg.RHO_MAX + 1)).toByte)
    val back = agg.deserialize(agg.serialize(buf.clone()))
    assert(back.toSeq == buf.toSeq)
    // the empty buffer round-trips too
    assert(agg.deserialize(agg.serialize(agg.createAggregationBuffer()))
      .toSeq == agg.createAggregationBuffer().toSeq)
  }

  test("HllRegistersAgg merge is elementwise max (commutative, idempotent, empty identity)") {
    val agg = hllAgg
    def b() = Array.fill(HllRegistersAgg.M)(
      (rnd.nextInt(HllRegistersAgg.RHO_MAX + 1)).toByte)
    val (x, y) = (b(), b())
    val xy = agg.merge(x.clone(), y.clone())
    val yx = agg.merge(y.clone(), x.clone())
    assert(xy.toSeq == yx.toSeq)
    assert(xy.toSeq == x.zip(y).map { case (a, c) =>
      if (a > c) a else c }.toSeq)
    assert(agg.merge(x.clone(), x.clone()).toSeq == x.toSeq)
    assert(agg.merge(agg.createAggregationBuffer(), x.clone()).toSeq == x.toSeq)
  }

  test("HllRegistersAgg: arbitrary update/merge/wire interleavings are bit-identical") {
    val agg = hllAgg
    for (seed <- 1 to 6) {
      val r = new scala.util.Random(seed)
      // dense value range forces register collisions; ~4% nulls
      val values: Seq[Any] = Seq.fill(600)(
        if (r.nextInt(25) == 0) null else (r.nextLong() % 500L): java.lang.Long)
      val ref = values.foldLeft(agg.createAggregationBuffer()) {
        (b, v) => agg.update(b, longRow(v)) }
      val nParts = 1 + r.nextInt(7)
      val partials = r.shuffle(values)
        .grouped(math.max(1, values.size / nParts)).map { chunk =>
          val b = chunk.foldLeft(agg.createAggregationBuffer()) {
            (acc, v) => agg.update(acc, longRow(v)) }
          agg.deserialize(agg.serialize(b)) // the cross-JVM boundary
        }.toSeq
      val merged = r.shuffle(partials).reduce { (a, b) =>
        agg.merge(a, agg.deserialize(agg.serialize(b))) }
      assert(merged.toSeq == ref.toSeq, s"seed=$seed parts=$nParts")
      // registers are bounded by construction (rho <= 53): wire bytes
      // can never hold a value eval would misrepresent
      assert(merged.forall(v => v >= 0 && v <= HllRegistersAgg.RHO_MAX))
    }
  }

  test("CountMinAgg: arbitrary update/merge/wire interleavings are bit-identical") {
    val agg = cmsAgg
    for (seed <- 1 to 6) {
      val r = new scala.util.Random(seed)
      val values: Seq[Any] = Seq.fill(600)(
        if (r.nextInt(25) == 0) null else (r.nextLong() % 200L): java.lang.Long)
      val ref = values.foldLeft(agg.createAggregationBuffer()) {
        (b, v) => agg.update(b, longRow(v)) }
      val nParts = 1 + r.nextInt(7)
      val partials = r.shuffle(values)
        .grouped(math.max(1, values.size / nParts)).map { chunk =>
          val b = chunk.foldLeft(agg.createAggregationBuffer()) {
            (acc, v) => agg.update(acc, longRow(v)) }
          agg.deserialize(agg.serialize(b))
        }.toSeq
      val merged = r.shuffle(partials).reduce { (a, b) =>
        agg.merge(a, agg.deserialize(agg.serialize(b))) }
      assert(merged.toSeq == ref.toSeq, s"seed=$seed parts=$nParts")
      // conservation: every row increments exactly one bucket per hash
      // row, so each of the D row-sums equals the non-null input count
      val nonNull = values.count(_ != null).toLong
      for (d <- 0 until CountMinAgg.D) {
        val rowSum = (0 until CountMinAgg.W)
          .map(w => merged(d * CountMinAgg.W + w)).sum
        assert(rowSum == nonNull, s"seed=$seed row=$d sum=$rowSum")
      }
    }
  }

  test("CountMinAgg serialize is endianness-pinned (fixed wire bytes)") {
    // the wire format is ByteBuffer default big-endian on every JVM —
    // pin one counter's byte layout so a refactor to platform order
    // (which would corrupt cross-arch shuffles) fails here
    val agg = cmsAgg
    val buf = agg.createAggregationBuffer()
    buf(0) = 0x0102030405060708L
    val bytes = agg.serialize(buf)
    assert(bytes.take(8).toSeq ==
      Seq[Byte](0x01, 0x02, 0x03, 0x04, 0x05, 0x06, 0x07, 0x08))
  }

  // r11 verdict #7: the addExact/multiplyExact contract ("any 64-bit
  // wrap anywhere on the path fails loudly") was claimed in scaladoc
  // but no spec forced the ArithmeticException paths. One test per
  // exact-arithmetic site with adversarial magnitudes.
  private def gramAgg = graft.functions.GramCovAgg(
    org.apache.spark.sql.catalyst.expressions.BoundReference(
      0, org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType), nullable = true))
  private def gramRow(v: Array[Long]) =
    org.apache.spark.sql.catalyst.InternalRow(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(v))

  test("GramCovAgg update throws on per-row product overflow") {
    val agg = gramAgg
    val buf = agg.createAggregationBuffer()
    // (2^32)² = 2^64: the very first multiplyExact must throw — the
    // legacy wrap would have yielded exactly 0 (a plausible numerator)
    intercept[ArithmeticException] {
      agg.update(buf, gramRow(Array(1L << 32)))
    }
  }

  test("GramCovAgg update throws on accumulation overflow") {
    val agg = gramAgg
    val buf = agg.createAggregationBuffer()
    // q² = 9e18 fits alone; the second row's running-sum addExact
    // wraps (1.8e19 > Long.Max) — the case the finisher's own check
    // could have blessed had the accumulation wrapped silently
    val q = 3000000000L
    agg.update(buf, gramRow(Array(q)))
    intercept[ArithmeticException] {
      agg.update(buf, gramRow(Array(q)))
    }
  }

  test("GramCovAgg merge throws when partial sums overflow") {
    val agg = gramAgg
    val b1 = agg.createAggregationBuffer()
    val b2 = agg.createAggregationBuffer()
    val q = 3000000000L // q² ~ 9e18: each partial fits, their sum wraps
    agg.update(b1, gramRow(Array(q)))
    agg.update(b2, gramRow(Array(q)))
    intercept[ArithmeticException] { agg.merge(b1, b2) }
  }

  test("GramCovAgg eval throws past the n·Σxᵢxⱼ finisher bound") {
    val agg = gramAgg
    // forge the post-aggregation state directly (reaching n = 2^32 via
    // 4 billion update calls is not a unit test): n·g = 2^64 must
    // throw in the finisher's multiplyExact, not wrap to 0
    val buf = new graft.functions.GramCovAgg.Buf(-1, 0L, null, null)
    buf.init(1)
    buf.n = 1L << 32
    buf.g(0) = 1L << 32
    buf.s(0) = 0L
    intercept[ArithmeticException] { agg.eval(buf) }
  }

  test("GramCovAgg survives the exact adversarial magnitudes BELOW the bound") {
    // the loud-overflow contract must not reject legal corpora: the
    // documented envelope (|q| <= 1000 milli-quantized, n ~ 3e6) stays
    // exception-free — spot-checked here at the scaled-down extreme
    val agg = gramAgg
    val buf = agg.createAggregationBuffer()
    (1 to 1000).foreach { k =>
      agg.update(buf, gramRow(Array(1000L, if (k % 2 == 0) -1000L else 1000L)))
    }
    val out = agg.eval(buf)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
    val r0 = out.array(0)
      .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    // var(x·1000) numerator with constant x: n·Σx² − (Σx)² = 0
    assert(r0.getLong(2) == 1000L * (1000L * 1000000L) - 1000000L * 1000000L)
  }
}
