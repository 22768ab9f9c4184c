package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** KMV (k-minimum-values) distinct sketch as a typed [[Aggregator]]:
  * state = the k smallest DISTINCT hashes seen, kept sorted ascending;
  * merge = k smallest of the union.
  *
  * Unlike [[MisraGries]] (whose intermediate is merge-order-dependent and
  * only its downstream use is deterministic), the KMV buffer is a pure
  * function of the input SET — reduce and merge commute, so the finished
  * sketch is bit-identical under ANY partitioning, which is what lets the
  * OpsSpec equality gate pin it against the window form row-for-row.
  *
  * Why this beats the q230 rank-window form at 100 TB: the window form
  * shuffles EVERY distinct hash to its source's partition before ranking
  * (vocabulary-sized exchange); the aggregator runs as an
  * ObjectHashAggregate with partial aggregation — each input partition
  * reduces to ≤ k longs BEFORE the exchange, so the shuffle carries
  * ≤ k·partitions longs regardless of vocabulary size. Same answer, the
  * sketch-sized exchange (the per-shard-sketch + merge plan the q230
  * OpsSpec merge test locks, run inside one aggregation).
  *
  * reduce fast path: a full buffer rejects h ≥ max in O(1) — after
  * warmup almost every element takes it. Inserts binary-search the
  * sorted array (dedup + position in O(log k), splice O(k)). */
class KmvSketch(k: Int) extends Aggregator[java.lang.Long, Array[Long], Array[Long]] {
  require(k > 0, "KMV needs a positive sketch size")

  override def zero: Array[Long] = Array.emptyLongArray

  // boxed input so a NULL hash (a NULL-rendered value — e.g. a null
  // profile column or FD side) SKIPS the sketch instead of crashing the
  // primitive deserializer; non-null call sites pay one unbox
  override def reduce(buf: Array[Long], boxed: java.lang.Long): Array[Long] =
    if (boxed == null) buf
    else {
      val h = boxed.longValue()
      if (buf.length == k && h >= buf(buf.length - 1)) buf else insert(buf, h)
    }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    // both sides sorted: one linear merge, dedup, cut at k
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    var last = Long.MinValue; var first = true
    while (n < out.length && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
        else { val x = b(j); j += 1; x }
      if (first || v != last) { out(n) = v; n += 1; last = v; first = false }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  private def insert(buf: Array[Long], h: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(buf, h)
    if (pos >= 0) buf // already present — KMV is a set function
    else {
      val at = -pos - 1
      val n = math.min(buf.length + 1, k)
      val out = new Array[Long](n)
      System.arraycopy(buf, 0, out, 0, at)
      out(at) = h
      System.arraycopy(buf, at, out, at + 1, n - at - 1)
      out
    }
  }

  override def finish(r: Array[Long]): Array[Long] = r // already sorted

  override def bufferEncoder: Encoder[Array[Long]] = KmvSketch.arrEncoder
  override def outputEncoder: Encoder[Array[Long]] = KmvSketch.arrEncoder
}

object KmvSketch {
  private[functions] val arrEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  /** Column function: `kmv(h)` → ARRAY<BIGINT>, the sorted k-min sketch. */
  def sketch(k: Int): Column => Column = udaf(new KmvSketch(k)).apply(_)
}
