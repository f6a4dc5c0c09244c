package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the hash-heavy text-dedup kernels.
  *
  * The declarative higher-order-function formulation (transform/aggregate
  * lambdas) is interpreted row-at-a-time in Spark — no whole-stage codegen,
  * no common-subexpression elimination — which made MinHash/SimHash the
  * dominant cost of the dedup pipeline. These expressions compute the same
  * results in one tight JVM pass per document:
  *
  *  - shingles are never materialized: a word n-gram of text split on
  *    single spaces is exactly a byte range of the original string
  *    (UTF-8 multibyte sequences cannot contain 0x20, so space positions
  *    are found with a raw byte scan), hashed in place via [[XXH64]];
  *  - the k-hash MinHash family uses double hashing
  *    (hᵢ = h₁ + i·h₂, Kirsch–Mitzenmacher), two XXH64 evaluations per
  *    shingle instead of k.
  *
  * Both are deterministic pure functions of their input, null on documents
  * with fewer than `ngram` tokens.
  */
object TextHashExpressions {

  private val SEED1 = 42L
  private val SEED2 = 0x9747b28cL

  /** Byte offsets where each token starts, plus a sentinel end. For text
    * with tokens t0..tm split on single spaces, token j spans
    * [starts(j), starts(j+1) - 1) and the n-gram from j spans
    * [starts(j), starts(j+n) - 1). */
  private def tokenStarts(base: AnyRef, offset: Long, len: Int): Array[Int] = {
    var spaces = 0
    var i = 0
    while (i < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, offset + i) == ' ') spaces += 1
      i += 1
    }
    val starts = new Array[Int](spaces + 2)
    starts(0) = 0
    var s = 1
    i = 0
    while (i < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, offset + i) == ' ') {
        starts(s) = i + 1; s += 1
      }
      i += 1
    }
    starts(s) = len + 1   // sentinel: "start of the token after the last"
    starts
  }

  /** Visit every word `ngram`-shingle of `text` as (byteStart, byteLen). */
  @inline private def foreachShingle(text: UTF8String, ngram: Int)
                                    (f: (AnyRef, Long, Int) => Unit): Int = {
    val base = text.getBaseObject
    val offset = text.getBaseOffset
    val len = text.numBytes()
    if (len == 0) return 0
    val starts = tokenStarts(base, offset, len)
    val nTokens = starts.length - 1
    val nShingles = nTokens - ngram + 1
    var j = 0
    while (j < nShingles) {
      val s = starts(j)
      val e = starts(j + ngram) - 1   // strip the trailing separator
      f(base, offset + s, e - s)
      j += 1
    }
    math.max(nShingles, 0)
  }

  /** `array<long>` MinHash signature of the word-`ngram` shingle set. */
  case class ShingleMinHash(child: Expression, ngram: Int, numHashes: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "shingle_minhash"

    override def nullSafeEval(input: Any): Any = {
      val text = input.asInstanceOf[UTF8String]
      val mins = Array.fill(numHashes)(Long.MaxValue)
      val n = foreachShingle(text, ngram) { (base, off, len) =>
        val h1 = XXH64.hashUnsafeBytes(base, off, len, SEED1)
        val h2 = XXH64.hashUnsafeBytes(base, off, len, SEED2)
        var k = 0
        var h = h1
        while (k < numHashes) {
          if (h < mins(k)) mins(k) = h
          h += h2
          k += 1
        }
      }
      if (n <= 0) null else new GenericArrayData(mins)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** 64-bit SimHash of the word-`ngram` shingle multiset. */
  case class SimHash(child: Expression, ngram: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "simhash64"

    override def nullSafeEval(input: Any): Any = {
      val text = input.asInstanceOf[UTF8String]
      val sums = new Array[Int](64)
      val n = foreachShingle(text, ngram) { (base, off, len) =>
        val h = XXH64.hashUnsafeBytes(base, off, len, SEED1)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) sums(b) += 1 else sums(b) -= 1
          b += 1
        }
      }
      if (n <= 0) null
      else {
        var out = 0L
        var b = 0
        while (b < 64) {
          if (sums(b) >= 0) out |= (1L << b)
          b += 1
        }
        java.lang.Long.valueOf(out)
      }
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Distinct word-`ngram` shingle strings, built in one pass (byte-range
    * views over a single copy of the text, LinkedHashSet dedup) — the fast
    * path for exact-Jaccard verification, where shingle sets must actually
    * materialize. Null when fewer than `ngram` tokens. */
  case class Shingles(child: Expression, ngram: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "shingles"

    override def nullSafeEval(input: Any): Any = {
      val text = input.asInstanceOf[UTF8String]
      val bytes = text.getBytes   // one copy; views below share it
      val out = new java.util.LinkedHashSet[UTF8String]()
      val textOffset = text.getBaseOffset
      val n = foreachShingle(text, ngram) { (_, off, len) =>
        out.add(UTF8String.fromBytes(bytes, (off - textOffset).toInt, len))
      }
      if (n <= 0) null
      else {
        val arr = new Array[Any](out.size)
        val it = out.iterator()
        var i = 0
        while (it.hasNext) { arr(i) = it.next(); i += 1 }
        new GenericArrayData(arr)
      }
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Exact Jaccard similarity of the distinct word-`ngram` shingle sets of
    * two texts, in one pass: both shingle sets are built as byte-range
    * views (one copy per text) and intersected by content hash — identical
    * to `|A∩B| / |A∪B|` over [[Shingles]] arrays, without materializing
    * either array in the plan. Null when either side has fewer than
    * `ngram` tokens. One expression instead of
    * size(array_intersect(shingles(a), shingles(b))) / … matters because
    * Catalyst inlines verification predicates into join conditions,
    * multiplying every sub-expression evaluation. */
  case class ShingleJaccard(left: Expression, right: Expression, ngram: Int)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
      with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "shingle_jaccard"

    override def nullSafeEval(l: Any, r: Any): Any = {
      val ta = l.asInstanceOf[UTF8String]
      val tb = r.asInstanceOf[UTF8String]
      val setA = new java.util.HashSet[UTF8String]()
      val bytesA = ta.getBytes
      val offA = ta.getBaseOffset
      val na = foreachShingle(ta, ngram) { (_, off, len) =>
        setA.add(UTF8String.fromBytes(bytesA, (off - offA).toInt, len))
      }
      if (na <= 0) return null
      val setB = new java.util.HashSet[UTF8String]()
      val bytesB = tb.getBytes
      val offB = tb.getBaseOffset
      val nb = foreachShingle(tb, ngram) { (_, off, len) =>
        setB.add(UTF8String.fromBytes(bytesB, (off - offB).toInt, len))
      }
      if (nb <= 0) return null
      var inter = 0
      val it = setB.iterator()
      while (it.hasNext) if (setA.contains(it.next())) inter += 1
      val uni = setA.size + setB.size - inter
      java.lang.Double.valueOf(inter.toDouble / uni)
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  import org.apache.spark.sql.graft.ColumnBridge

  def shingles(text: Column, ngram: Int = 3): Column =
    ColumnBridge.column(Shingles(ColumnBridge.expression(text), ngram))

  def shingleMinhash(text: Column, ngram: Int = 3, numHashes: Int = 64): Column =
    ColumnBridge.column(
      ShingleMinHash(ColumnBridge.expression(text), ngram, numHashes))

  def simhash64(text: Column, ngram: Int = 3): Column =
    ColumnBridge.column(SimHash(ColumnBridge.expression(text), ngram))

  def shingleJaccard(a: Column, b: Column, ngram: Int = 3): Column =
    ColumnBridge.column(
      ShingleJaccard(ColumnBridge.expression(a), ColumnBridge.expression(b), ngram))
}
