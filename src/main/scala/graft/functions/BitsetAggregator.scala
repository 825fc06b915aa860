package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Fixed-width bitset union Aggregator: IN = bit position, BUF/OUT = the
  * m-bit set as Array[Long] words. The distributed Bloom-filter build
  * (SURVEY X2 extension): each map task sets bits locally, the exchange
  * carries ONE m/64-word partial per task (never positions), merge is
  * word-wise OR. The result is driver-sized by construction — m is the
  * caller's FP-rate budget, not a function of row count.
  */
class BitsetAggregator(mBits: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(mBits > 0 && mBits % 64 == 0, s"mBits must be a positive multiple of 64: $mBits")

  override def zero: Array[Long] = new Array[Long](mBits / 64)

  override def reduce(b: Array[Long], pos: Long): Array[Long] = {
    require(pos >= 0 && pos < mBits, s"bit position out of range: $pos")
    b((pos / 64).toInt) |= (1L << (pos % 64))
    b
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { x(i) |= y(i); i += 1 }
    x
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
