package graft

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MisraGriesAgg

/** The Misra–Gries recall guarantee `text_heavy_hitters` is built on:
  * after any updates + merges over a length-N stream, every item with
  * true count > N/(k+1) is still tracked. Exercised directly on the
  * REAL buffer API (update/merge/serialize), independent of Spark
  * execution.
  */
class MisraGriesSpec extends AnyFunSuite {

  private def agg(k: Int) =
    MisraGriesAgg(BoundReference(0, StringType, nullable = true), k)

  /** Drive the aggregate's own update() with 1-column InternalRows. */
  private def feed(a: MisraGriesAgg,
                   buf: mutable.HashMap[String, Long],
                   items: Seq[String]): mutable.HashMap[String, Long] = {
    items.foreach(i => a.update(buf, InternalRow(UTF8String.fromString(i))))
    buf
  }

  /** Zipf-ish stream: item `i` appears ~N/i times — a realistic
    * frequent-terms shape with a heavy head and a long tail.
    */
  private def zipfStream(n: Int, rnd: scala.util.Random): Seq[String] = {
    val out = Seq.newBuilder[String]
    (1 to n).foreach { _ =>
      val r = rnd.nextDouble()
      val item = math.min((1.0 / math.max(r, 1e-9)).toInt, 5000)
      out += s"t$item"
    }
    rnd.shuffle(out.result())
  }

  test("recall guarantee holds on a sequential Zipfian stream") {
    val k = 64
    val rnd = new scala.util.Random(11)
    val stream = zipfStream(20000, rnd)
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong)
    val buf = feed(agg(k), agg(k).createAggregationBuffer(), stream)
    val bound = stream.size.toDouble / (k + 1)
    val mustSurvive = truth.filter(_._2 > bound).keys
    assert(mustSurvive.nonEmpty, "fixture produced no heavy hitters")
    mustSurvive.foreach(i => assert(buf.contains(i),
      s"$i (count ${truth(i)}) > N/(k+1)=$bound evicted"))
    assert(buf.size <= k)
  }

  test("recall guarantee survives partial-aggregation merges") {
    val k = 64
    val a = agg(k)
    val rnd = new scala.util.Random(17)
    val stream = zipfStream(30000, rnd)
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong)
    // 6 partials, merged pairwise then into one — the map-side
    // partial + exchange + final shape
    val partials = stream.grouped(5000)
      .map(chunk => feed(a, a.createAggregationBuffer(), chunk)).toSeq
    val merged = partials.reduce(a.merge)
    val bound = stream.size.toDouble / (k + 1)
    truth.filter(_._2 > bound).keys.foreach(i =>
      assert(merged.contains(i), s"$i lost across merges"))
    assert(merged.size <= k)
  }

  test("k <= 0 is rejected at construction (analysis time), not silently empty") {
    // with k = 0 every update would take the decrement-all branch and
    // the sketch would emit an empty candidate set — reading as "no
    // heavy hitters" downstream (ADVICE r5)
    intercept[IllegalArgumentException](agg(0))
    intercept[IllegalArgumentException](agg(-3))
  }

  test("buffer survives serialize/deserialize byte-exactly") {
    val a = agg(8)
    val buf = mutable.HashMap("alpha" -> 3L, "βeta" -> 7L, "c" -> 1L)
    assert(a.deserialize(a.serialize(buf)) == buf)
  }

  test("eval emits sorted candidates without counts") {
    val a = agg(8)
    val buf = mutable.HashMap("zz" -> 3L, "aa" -> 7L)
    val out = a.eval(buf)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toArray[org.apache.spark.unsafe.types.UTF8String](
        org.apache.spark.sql.types.StringType).map(_.toString).toSeq
    assert(out == Seq("aa", "zz"))
  }
}
