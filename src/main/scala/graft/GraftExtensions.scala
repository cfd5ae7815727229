package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSelfSimilarityRule, CosineSimilarity, DotProduct}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions. Enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or pass to
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  *
  * The DataFrame API (`graft.ext.SimilarityOps`) does not require the
  * extension — it builds the expressions directly; this registration is
  * for SQL users (`SELECT cosine_sim(a.embedding, b.embedding) ...`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectOptimizerRule(_ => CosineSelfSimilarityRule)
  }
}
