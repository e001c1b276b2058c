package graft.operators

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Distributed bounded-heap top-k, the grouped analog of the reference's
  * `search_knn` max-heap (`/root/reference/src/lib.rs:74-97`): each
  * partition keeps at most k `(dist, id)` pairs (map-side partial
  * aggregation), partial heaps merge pairwise, so a k-NN join shuffles
  * `O(groups * k)` rows instead of `O(groups * corpus)` — the property
  * that makes a 100 TB k-NN join feasible.
  *
  * Ordering matches the reference's result contract: ascending by
  * distance, ties broken by id (reference ties are unspecified; the id
  * tiebreak makes results deterministic for the oracle).
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {

  private def lt(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: List[(Double, Long)] = Nil

  /** Insert keeping the buffer sorted ascending and bounded at k — O(k),
    * fine for the small k of top-k queries. */
  override def reduce(buf: List[(Double, Long)], in: (Double, Long)): List[(Double, Long)] = {
    if (buf.length >= k && !lt(in, buf.last)) buf
    else {
      val (lo, hi) = buf.span(lt(_, in))
      (lo ::: in :: hi).take(k)
    }
  }

  override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] = {
    val out = new scala.collection.mutable.ListBuffer[(Double, Long)]
    var (x, y) = (a, b)
    while (out.length < k && (x.nonEmpty || y.nonEmpty)) {
      if (y.isEmpty || (x.nonEmpty && lt(x.head, y.head))) { out += x.head; x = x.tail }
      else { out += y.head; y = y.tail }
    }
    out.toList
  }

  override def finish(buf: List[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    ExpressionEncoder[List[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopK {
  /** Column function: `topK(k)(distCol, idCol)` usable in `groupBy.agg`.
    * Returns `array<struct<_1: double, _2: bigint>>` sorted ascending. */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKAggregator(k), ExpressionEncoder[(Double, Long)]())
    (dist, id) => fn(dist, id)
  }
}
