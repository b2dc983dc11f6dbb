package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{MinHashSketchAgg, SimHashAgg}

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
}
