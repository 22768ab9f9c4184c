package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries heavy-hitter CANDIDATE summary as a typed [[Aggregator]]
  * with a bounded (≤ m entries) buffer.
  *
  * Guarantee (the classical one, preserved under merge): every token whose
  * true frequency exceeds n/(m+1) over the n-token stream survives in the
  * final summary. The summary's counts are UNDERestimates (each is within
  * n/(m+1) of truth), so the engine never reports them — it uses the
  * summary only as a candidate set and re-counts candidates exactly in a
  * second pass (see [[graft.ops.Corpus.heavyTokens]]). That makes the
  * final operator output deterministic even though the intermediate
  * summary depends on merge order.
  *
  * Why this beats groupBy-count at 100 TB: a full token frequency table
  * shuffles the ENTIRE vocabulary (web-scale corpora: billions of distinct
  * tokens) to reducers. The aggregator runs as an ObjectHashAggregate with
  * partial aggregation: each input partition reduces to ≤ m (token, count)
  * entries BEFORE the exchange, so the shuffle carries ≤ m·partitions
  * entries regardless of vocabulary size; the exact re-count pass then
  * touches only the ≤ m surviving candidates (broadcast semi-join).
  *
  * reduce: classic MG step — increment a present token; insert while the
  * buffer has room; otherwise decrement ALL counters by 1 and drop zeros
  * (the O(m) decrement amortizes: it fires at most once per m stream
  * items). merge: sum counterparts, and if over m entries, subtract the
  * (m+1)-th largest count from all and keep positives — the standard
  * mergeable-summaries construction (Agarwal et al., PODS'12).
  */
class MisraGries(m: Int) extends Aggregator[String, Map[String, Long], Seq[String]] {
  require(m > 0, "Misra-Gries needs a positive buffer bound")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], tok: String): Map[String, Long] =
    buf.get(tok) match {
      case Some(c)                => buf.updated(tok, c + 1L)
      case None if buf.size < m   => buf.updated(tok, 1L)
      case None                   => buf.collect { case (k, v) if v > 1L => k -> (v - 1L) }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed =
      if (a.isEmpty) b else if (b.isEmpty) a
      else (a.keySet ++ b.keySet).iterator.map(k => k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    if (summed.size <= m) summed
    else {
      val cut = summed.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(m)
      summed.collect { case (k, v) if v > cut => k -> (v - cut) }
    }
  }

  /** Sorted for a deterministic array layout (callers treat it as a set). */
  override def finish(r: Map[String, Long]): Seq[String] = r.keys.toSeq.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] = MisraGries.mapEncoder
  override def outputEncoder: Encoder[Seq[String]] = MisraGries.seqEncoder
}

object MisraGries {
  private[functions] val mapEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  private[functions] val seqEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()

  /** Column function: `mg(token)` → ARRAY<STRING> candidate set. */
  def candidates(m: Int): Column => Column = {
    val fn = udaf(new MisraGries(m), Encoders.STRING)
    tok => fn(tok)
  }
}
