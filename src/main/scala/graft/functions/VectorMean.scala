package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Buffer for [[VectorMean]]: running element-wise sum + count. */
case class VecMeanBuf(sum: Array[Double], n: Long)

/** Typed `Aggregator` computing the element-wise mean of an
  * `array<float>` column — the k-means centroid update.
  *
  * Versus the declarative formulation (posexplode → groupBy(key, pos)
  * → avg → collect_list re-assembly), the shuffle carries one partial
  * buffer of dim doubles per (partition, key) instead of one row per
  * ELEMENT — at 100 TB × 64-dim that is a 64× reduction in shuffled
  * rows, and the map-side combine happens in the typed buffer. Output
  * order is the array order (no sort-by-position reassembly needed).
  *
  * Mean accumulation order differs from the declarative avg's, so
  * results agree to IEEE round-off (asserted ≤1e-9 in ExtSpec), not
  * bit-for-bit — fine for centroids, not for oracle-hashed output.
  *
  * Empty groups cannot occur (groupBy emits only observed keys);
  * mismatched dims take the first row's dim (embeddings are fixed-dim).
  */
class VectorMean extends Aggregator[Seq[Float], VecMeanBuf, Seq[Double]] {

  override def zero: VecMeanBuf = VecMeanBuf(Array.empty, 0L)

  override def reduce(b: VecMeanBuf, a: Seq[Float]): VecMeanBuf = {
    val s = if (b.sum.isEmpty) new Array[Double](a.length) else b.sum
    var i = 0
    val n = math.min(s.length, a.length)
    while (i < n) { s(i) += a(i); i += 1 }
    VecMeanBuf(s, b.n + 1)
  }

  override def merge(x: VecMeanBuf, y: VecMeanBuf): VecMeanBuf = {
    if (x.sum.isEmpty) y
    else if (y.sum.isEmpty) x
    else {
      val s = x.sum.clone()
      var i = 0
      val n = math.min(s.length, y.sum.length)
      while (i < n) { s(i) += y.sum(i); i += 1 }
      VecMeanBuf(s, x.n + y.n)
    }
  }

  override def finish(b: VecMeanBuf): Seq[Double] =
    if (b.n == 0) Seq.empty else b.sum.map(_ / b.n).toSeq

  override def bufferEncoder: Encoder[VecMeanBuf] = Encoders.product[VecMeanBuf]
  override def outputEncoder: Encoder[Seq[Double]] = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object VectorMean {
  /** Column-API handle: `vecMean(col("embedding"))`. */
  val vecMean: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new VectorMean(),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]())
}
