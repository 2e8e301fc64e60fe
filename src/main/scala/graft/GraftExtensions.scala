package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{CosineSimilarity, SimHash64, WinnowFingerprints, WordShingles}

/** SparkSessionExtensions installer: registers the engine's native
  * expressions as SQL functions, so `spark.sql` users get them too:
  *
  *   spark.sql.extensions = graft.GraftExtensions
  *
  *   SELECT cosine_similarity(a.embedding, b.embedding) FROM ...
  *   SELECT word_shingles(text, 3), simhash64(hashes) FROM documents
  *
  * (The Column API in graft.functions works without this.) */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // plane-store value predicates rewrite to px_min/px_max plane bounds
    // (post-hoc resolution: must precede ColumnPruning, which would strip
    // the not-yet-referenced stats columns)
    ext.injectPostHocResolutionRule(_ => graft.plans.PushPixelValueFilter)
    // shredded-JSON serving: get_json_object over a declared lake path
    // rewrites to the materialized column (resolution batch — Spark's
    // AddMetadataColumns then threads the attribute to the scan)
    ext.injectResolutionRule(s => graft.sources.LakeJsonShred.ShredRewrite(s))
    // whole-operator extension: native as-of merge join (logical node +
    // strategy + physical operator — see graft.plans.AsOfJoin)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_similarity(a, b) takes 2 arguments")
        CosineSimilarity(args(0), args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "word_shingles(text, n) takes 2 arguments")
        val n = args(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"word_shingles n must be an integer literal, got $other")
        }
        WordShingles(args(0), n)
      }))
    ext.injectFunction((
      FunctionIdentifier("shingle_gen"),
      new ExpressionInfo(classOf[graft.functions.ShingleGenerate].getName,
        "shingle_gen"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "shingle_gen(text, n) takes 2 arguments")
        val n = args(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"shingle_gen n must be an integer literal, got $other")
        }
        graft.functions.ShingleGenerate(args(0), n)
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "simhash64(hashes) takes 1 argument")
        SimHash64(args(0))
      }))
    ext.injectFunction((
      FunctionIdentifier("winnow_fingerprints"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName,
        "winnow_fingerprints"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "winnow_fingerprints(text, k, w) takes 3 arguments")
        (args(1), args(2)) match {
          case (Literal(k: Int, _), Literal(w: Int, _)) =>
            WinnowFingerprints(args(0), k, w)
          case other => throw new IllegalArgumentException(
            s"winnow_fingerprints k and w must be integer literals, got $other")
        }
      }))
    ext.injectFunction((
      FunctionIdentifier("bloom_build"),
      new ExpressionInfo(classOf[graft.functions.BloomBuild].getName,
        "bloom_build"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "bloom_build(key, mBits) takes 2 arguments")
        val m = args(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"bloom_build mBits must be an integer literal, got $other")
        }
        graft.functions.BloomBuild(args(0), m,
          graft.functions.BloomContains.K)
      }))
    ext.injectFunction((
      FunctionIdentifier("bloom_contains"),
      new ExpressionInfo(classOf[graft.functions.BloomContains].getName,
        "bloom_contains"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "bloom_contains(bloom, key) takes 2 arguments")
        graft.functions.BloomContains(args(0), args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("cms_build"),
      new ExpressionInfo(classOf[graft.functions.CmsBuild].getName,
        "cms_build"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cms_build(key, width) takes 2 arguments")
        val w = args(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"cms_build width must be an integer literal, got $other")
        }
        graft.functions.CmsBuild(args(0), w)
      }))
    ext.injectFunction((
      FunctionIdentifier("cms_estimate"),
      new ExpressionInfo(classOf[graft.functions.CmsEstimate].getName,
        "cms_estimate"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "cms_estimate(cms, key) takes 2 arguments")
        graft.functions.CmsEstimate(args(0), args(1))
      }))
  }
}
