package graft.functions

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.util.sketch.BloomFilter

/** Distributed Bloom-filter build as a typed aggregate: each partition
  * folds its strings into a local filter (map-side partial), partials OR
  * together in `merge` (BloomFilter union is exact for same-sized
  * filters), and `finish` serializes the bits for the index artifact /
  * the [[org.apache.spark.sql.graftx.BloomMightContainStr]] probe.
  *
  * Hash contract with the probe side: items are put as UTF-8 bytes
  * (`putBinary`), the byte encoding `UTF8String.getBytes` produces — the
  * probe never needs a String round-trip.
  *
  * Sizing is the caller's job (`expectedItems` from a count of the build
  * side; fpp fixed per artifact and folded into the artifact's stage key).
  * At 100 TB the build side of a decontamination filter is the fixed-size
  * eval-suite shingle universe, so the filter stays a few MB no matter
  * the corpus size.
  */
class BloomBuild(expectedItems: Long, fpp: Double)
    extends Aggregator[String, BloomFilter, Array[Byte]] with Serializable {

  def zero: BloomFilter = BloomFilter.create(math.max(expectedItems, 1L), fpp)

  def reduce(b: BloomFilter, item: String): BloomFilter = {
    if (item != null) b.putBinary(item.getBytes(StandardCharsets.UTF_8))
    b
  }

  def merge(a: BloomFilter, b: BloomFilter): BloomFilter = { a.mergeInPlace(b); a }

  def finish(b: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    b.writeTo(bos)
    bos.toByteArray
  }

  // BloomFilterImpl is java.io.Serializable; the buffer only crosses the
  // wire at partial/merge boundaries (one filter per partition, not per row)
  def bufferEncoder: Encoder[BloomFilter] = Encoders.javaSerialization[BloomFilter]
  def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
