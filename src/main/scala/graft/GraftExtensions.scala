package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.expr.{RatcliffSimilarity, CleanCorpusExpr, DeflateLenExpr,
  ExtractDoiExpr, HtmlTextExpr, MinHashSignatureExpr, SimHash64Expr,
  HashedShinglesExpr, RollingFingerprintExpr, DotProductExpr,
  SortedIntersectCountExpr, NfcNormalizeExpr}

/** Session-extension entry point: makes every graft custom expression
  * available to plain `spark.sql` cluster-wide via
  * `--conf spark.sql.extensions=graft.GraftExtensions` (no driver-side
  * registration call needed). The same registry is installed per-session
  * by `graft.expr.functions.registerAll`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

    def info(name: String) = new ExpressionInfo("graft", name)
    def inject(name: String, builder: Seq[Expression] => Expression): Unit =
      e.injectFunction((FunctionIdentifier(name), info(name), builder))

    inject("similarity", es => RatcliffSimilarity(es(0), es(1)))
    inject("clean_corpus", es => CleanCorpusExpr(es.head))
    inject("extract_doi", es => ExtractDoiExpr(es.head))
    inject("html_text", es => HtmlTextExpr(es.head))
    inject("minhash_signature", es => MinHashSignatureExpr(es.head))
    inject("simhash64", es => SimHash64Expr(es.head))
    inject("hashed_shingles", es => HashedShinglesExpr(es.head))
    inject("rolling_fingerprint", es => RollingFingerprintExpr(es.head))
    inject("deflate_len", es => DeflateLenExpr(es.head))

    // cheap-before-expensive conjunct ordering for the kernels above
    e.injectOptimizerRule(_ => graft.plans.DeferExpensivePredicates)
    inject("dot_product", es => DotProductExpr(es(0), es(1)))
    inject("sorted_intersect_count", es => SortedIntersectCountExpr(es(0), es(1)))
    inject("nfc_normalize", es => NfcNormalizeExpr(es.head))
  }
}
