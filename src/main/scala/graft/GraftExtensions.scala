package graft

import graft.functions.TextHashExpressions.{DeletionNeighborhood, RepetitionStats, ShingleJaccard, ShingleMinHash, Shingles, SimHash, SpanHashes}
import graft.functions.VectorExpressions.{DotProduct, HyperplaneLshBucket}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: registers the engine's custom
  * expressions as SQL functions, so `spark.sql("SELECT simhash64(text) …")`
  * works next to the DataFrame API. Install with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("shingle_minhash"),
      new ExpressionInfo(classOf[ShingleMinHash].getName, "shingle_minhash"),
      (args: Seq[Expression]) => args match {
        case Seq(text) => ShingleMinHash(text, 3, 64)
        case Seq(text, n, k) =>
          ShingleMinHash(text, intArg(n, "ngram"), intArg(k, "numHashes"))
        case _ => throw new IllegalArgumentException(
          "shingle_minhash(text[, ngram, numHashes])")
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash].getName, "simhash64"),
      (args: Seq[Expression]) => args match {
        case Seq(text) => SimHash(text, 3)
        case Seq(text, n) => SimHash(text, intArg(n, "ngram"))
        case _ => throw new IllegalArgumentException("simhash64(text[, ngram])")
      }))
    ext.injectFunction((
      new FunctionIdentifier("shingles"),
      new ExpressionInfo(classOf[Shingles].getName, "shingles"),
      (args: Seq[Expression]) => args match {
        case Seq(text) => Shingles(text, 3)
        case Seq(text, n) => Shingles(text, intArg(n, "ngram"))
        case _ => throw new IllegalArgumentException("shingles(text[, ngram])")
      }))
    ext.injectFunction((
      new FunctionIdentifier("shingle_jaccard"),
      new ExpressionInfo(classOf[ShingleJaccard].getName, "shingle_jaccard"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => ShingleJaccard(a, b, 3)
        case Seq(a, b, n) => ShingleJaccard(a, b, intArg(n, "ngram"))
        case _ => throw new IllegalArgumentException("shingle_jaccard(a, b[, ngram])")
      }))
    ext.injectFunction((
      new FunctionIdentifier("span_hashes"),
      new ExpressionInfo(classOf[SpanHashes].getName, "span_hashes"),
      (args: Seq[Expression]) => args match {
        case Seq(text, n) => SpanHashes(text, intArg(n, "ngram"))
        case _ => throw new IllegalArgumentException("span_hashes(text, ngram)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("repetition_stats"),
      new ExpressionInfo(classOf[RepetitionStats].getName, "repetition_stats"),
      (args: Seq[Expression]) => args match {
        case Seq(text) => RepetitionStats(text)
        case _ => throw new IllegalArgumentException("repetition_stats(text)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("deletion_neighborhood"),
      new ExpressionInfo(classOf[DeletionNeighborhood].getName,
        "deletion_neighborhood"),
      (args: Seq[Expression]) => args match {
        case Seq(key) => DeletionNeighborhood(key, 1)
        case Seq(key, d) => DeletionNeighborhood(key, intArg(d, "maxDist"))
        case _ => throw new IllegalArgumentException(
          "deletion_neighborhood(key[, maxDist])")
      }))
    ext.injectFunction((
      new FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vector_dot"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => DotProduct(a, b)
        case _ => throw new IllegalArgumentException("vector_dot(a, b)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("hyperplane_lsh_bucket"),
      new ExpressionInfo(classOf[HyperplaneLshBucket].getName, "hyperplane_lsh_bucket"),
      (args: Seq[Expression]) => args match {
        case Seq(v, n) => HyperplaneLshBucket(v, intArg(n, "nPlanes"))
        case Seq(v, n, off) => HyperplaneLshBucket(v, intArg(n, "nPlanes"),
          intArg(off, "planeOffset"))
        case _ => throw new IllegalArgumentException(
          "hyperplane_lsh_bucket(vec, nPlanes[, planeOffset])")
      }))
  }
}
