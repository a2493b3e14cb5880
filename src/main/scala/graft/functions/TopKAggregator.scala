package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator: keeps the k largest (score, id) pairs per
  * group in a bounded buffer — the distributed argmax-k primitive for
  * similarity search (SURVEY §7 step 7's optional Aggregator).
  *
  * Versus the window row_number form, the aggregation is map-side
  * combinable: each partition reduces its candidates to k before the
  * shuffle, so a query scoring N candidates moves only
  * numPartitions * k rows instead of N. At 100 TB that is the difference
  * between shuffling the corpus and shuffling kilobytes.
  *
  * Ordering is total: score desc, then id asc — ties resolve identically
  * to the `ORDER BY cos DESC, neighbor_id` window form, so results are
  * oracle-comparable.
  */
final case class Scored(id: Long, score: Double)

class TopKAggregator(k: Int) extends Aggregator[Scored, List[Scored], Seq[Scored]] {

  private def better(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: List[Scored] = Nil

  // insert keeping the buffer sorted best-first, truncated to k
  override def reduce(buf: List[Scored], x: Scored): List[Scored] = {
    val (front, back) = buf.span(better(_, x))
    (front ::: x :: back).take(k)
  }

  override def merge(a: List[Scored], b: List[Scored]): List[Scored] = {
    val builder = List.newBuilder[Scored]
    var (xs, ys) = (a, b)
    var n = 0
    while (n < k && (xs.nonEmpty || ys.nonEmpty)) {
      (xs, ys) match {
        case (x :: xt, y :: _) if better(x, y) => builder += x; xs = xt
        case (_, y :: yt)                      => builder += y; ys = yt
        case (x :: xt, Nil)                    => builder += x; xs = xt
        case _                                 => ()
      }
      n += 1
    }
    builder.result()
  }

  override def finish(r: List[Scored]): Seq[Scored] = r
  override def bufferEncoder: Encoder[List[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}
