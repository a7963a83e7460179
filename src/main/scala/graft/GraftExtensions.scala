package graft

import graft.plans.{AsOfJoinStrategy, FloatVecDot, HashEmbed, LongVecDot, LongVecSqDist, MinHashSig, ShingleHash60P, SimHash32, SortedLongIntersectCount}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook registering graft's native expressions, so
  * any session — including plain `spark-submit --conf
  * spark.sql.extensions=graft.GraftExtensions` — can call them from SQL:
  *
  *   SELECT graft_dot(a.embedding, b.embedding) FROM ...
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, null, "graft_dot",
        "graft_dot(a, b) - inner product of two float vectors in double precision",
        ""),
      (children: Seq[Expression]) => FloatVecDot(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_intersect_count"),
      new ExpressionInfo(classOf[SortedLongIntersectCount].getName, null,
        "graft_intersect_count",
        "graft_intersect_count(a, b) - |a ∩ b| for sorted distinct bigint arrays",
        ""),
      (children: Seq[Expression]) =>
        SortedLongIntersectCount(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_sqdist_l"),
      new ExpressionInfo(classOf[LongVecSqDist].getName, null, "graft_sqdist_l",
        "graft_sqdist_l(a, b) - exact squared L2 distance of two bigint vectors",
        ""),
      (children: Seq[Expression]) => LongVecSqDist(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_dot_l"),
      new ExpressionInfo(classOf[LongVecDot].getName, null, "graft_dot_l",
        "graft_dot_l(a, b) - exact inner product of two bigint vectors",
        ""),
      (children: Seq[Expression]) => LongVecDot(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, null, "graft_minhash_sig",
        "graft_minhash_sig(shs, k) - k-permutation MinHash signature of a bigint shingle-hash set",
        ""),
      (children: Seq[Expression]) => MinHashSig(children.head,
        children(1).eval(null).asInstanceOf[Int])))
    ext.injectFunction((
      new FunctionIdentifier("graft_shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHash60P].getName, null, "graft_shingle_hashes",
        "graft_shingle_hashes(text) - sorted distinct h60p word-2-gram shingle hashes",
        ""),
      (children: Seq[Expression]) => ShingleHash60P(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_hash_embed"),
      new ExpressionInfo(classOf[HashEmbed].getName, null, "graft_hash_embed",
        "graft_hash_embed(text, dim) - dense int64 hashing-trick embedder weights",
        ""),
      (children: Seq[Expression]) => HashEmbed(children.head,
        children(1).eval(null).asInstanceOf[Int])))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash32"),
      new ExpressionInfo(classOf[SimHash32].getName, null, "graft_simhash32",
        "graft_simhash32(text) - 32-bit md5 sign-vote SimHash of a document",
        ""),
      (children: Seq[Expression]) => SimHash32(children.head)))
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}
