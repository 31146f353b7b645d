package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature of a shingle set in one pass per row.
  *
  * For seed s ∈ [0, numHashes): signature(s) = min over shingles of
  * h(shingle, s), with h a seeded FNV-1a-style 64-bit hash. Replaces the
  * explode → groupBy(doc) → 32 × min(xxhash64) plan, which shuffled every
  * shingle instance and was the bench leader at 5 s — this computes the
  * whole signature where the shingles already are, no shuffle at all.
  *
  * MinHash is approximate machinery (recall-gated in DedupSpec, never
  * oracle-hashed), so the hash function only needs determinism and good
  * mixing, not cross-engine parity.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_minhash"

  /** One strong base hash per shingle (FNV-1a 64). */
  private def baseHash(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= bytes(i)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Seed-s permutation of the base hash: golden-ratio offset + murmur
    * finalizer avalanche. One byte pass per shingle total, instead of one
    * per (shingle, seed) — the standard one-hash-many-permutations MinHash
    * construction.
    */
  private def mix(base: Long, seed: Int): Long = {
    var h = base ^ (seed.toLong * 0x9E3779B97F4A7C15L)
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      val base = baseHash(arr.getUTF8String(i).getBytes)
      var s = 0
      while (s < numHashes) {
        val h = mix(base, s)
        if (h < sig(s)) sig(s) = h
        s += 1
      }
      i += 1
    }
    new GenericArrayData(sig.map(java.lang.Long.valueOf).toArray[Any])
  }

  override protected def withNewChildInternal(c: Expression): MinHashSignature =
    copy(child = c)
}
