package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One lineitem candidate for per-key top-k: total order is
  * (price DESC, orderkey ASC, linenumber ASC) — the same tie-break as the
  * q10 window formulation, so the two plans are row-identical. */
case class Priced(price: Double, orderkey: Long, linenumber: Int)

/** Exact per-key top-k as a typed [[Aggregator]] (SURVEY §2b's reserved
  * "Aggregator[IN,BUF,OUT] for exact top-k" item).
  *
  * Why this beats the window formulation at 100 TB: `row_number() OVER
  * (PARTITION BY key ORDER BY ...)` shuffles EVERY row to its key's
  * reducer and sorts the full group before discarding all but k. The
  * aggregator runs as an ObjectHashAggregate with map-side partial
  * aggregation: each input partition reduces to at most k rows per key
  * BEFORE the exchange, so the shuffle carries ≤ k·keys·partitions rows
  * (vs all rows) and no full per-group sort ever happens — for top-3 over
  * billions of lines per supplier, orders of magnitude less network and
  * no sort spill.
  *
  * The buffer is a sorted ≤k vector; `reduce` is an insertion into a
  * bounded list (k is small by contract — this is top-K, not sort),
  * `merge` a bounded merge. Both are associative and commutative with the
  * total order above, so partial aggregation is safe. */
class TopKPriced(k: Int) extends Aggregator[Priced, Seq[Priced], Seq[Priced]] {
  require(k > 0, "top-k needs k > 0")

  private def lt(a: Priced, b: Priced): Boolean =
    a.price > b.price ||
      (a.price == b.price && (a.orderkey < b.orderkey ||
        (a.orderkey == b.orderkey && a.linenumber < b.linenumber)))

  override def zero: Seq[Priced] = Vector.empty

  override def reduce(buf: Seq[Priced], in: Priced): Seq[Priced] =
    if (buf.length == k && !lt(in, buf.last)) buf // common case: not in top-k, O(1)
    else ((buf :+ in).sortWith(lt)).take(k)

  override def merge(a: Seq[Priced], b: Seq[Priced]): Seq[Priced] =
    (a ++ b).sortWith(lt).take(k)

  override def finish(r: Seq[Priced]): Seq[Priced] = r

  override def bufferEncoder: Encoder[Seq[Priced]] = TopKPriced.seqEncoder
  override def outputEncoder: Encoder[Seq[Priced]] = TopKPriced.seqEncoder
}

object TopKPriced {
  private[functions] val seqEncoder: Encoder[Seq[Priced]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Priced]]()

  /** Column function: `topk(price, orderkey, linenumber)` → ARRAY<STRUCT>
    * of the k best, already sorted. */
  def topk(k: Int): (Column, Column, Column) => Column = {
    val fn = udaf(new TopKPriced(k), Encoders.product[Priced])
    (p, o, l) => fn(p, o, l)
  }
}

/** One similarity candidate; total order (sim DESC, id ASC) — identical
  * to the ANN queries' window tie-break, so both plans are
  * row-identical. */
case class SimCand(sim: Double, id: Long)

/** [[TopKPriced]]'s shape for the ANN top-k: per query vector, the k
  * best (sim, neighbor) pairs. This is what removes the rank-window
  * bottleneck from the candidate stage — `row_number() OVER (PARTITION
  * BY query)` shuffles and sorts EVERY candidate pair (the measured
  * dominant cost of q47/q66 at 10x), while this aggregator reduces each
  * map partition to ≤ k pairs per query before the exchange. */
class TopKSim(k: Int) extends Aggregator[SimCand, Seq[SimCand], Seq[SimCand]] {
  require(k > 0, "top-k needs k > 0")

  private def lt(a: SimCand, b: SimCand): Boolean =
    a.sim > b.sim || (a.sim == b.sim && a.id < b.id)

  override def zero: Seq[SimCand] = Vector.empty

  override def reduce(buf: Seq[SimCand], in: SimCand): Seq[SimCand] =
    if (buf.length == k && !lt(in, buf.last)) buf
    else ((buf :+ in).sortWith(lt)).take(k)

  override def merge(a: Seq[SimCand], b: Seq[SimCand]): Seq[SimCand] =
    (a ++ b).sortWith(lt).take(k)

  override def finish(r: Seq[SimCand]): Seq[SimCand] = r

  override def bufferEncoder: Encoder[Seq[SimCand]] = TopKSim.seqEncoder
  override def outputEncoder: Encoder[Seq[SimCand]] = TopKSim.seqEncoder
}

object TopKSim {
  private[functions] val seqEncoder: Encoder[Seq[SimCand]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[SimCand]]()

  /** Column function: `topk(sim, id)` → sorted ARRAY<STRUCT<sim, id>>. */
  def topk(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKSim(k), Encoders.product[SimCand])
    (s, i) => fn(s, i)
  }
}
