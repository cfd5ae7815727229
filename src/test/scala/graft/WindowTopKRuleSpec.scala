package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The row_number()<=k → TopKPerGroup rewrite (plans/WindowTopKRule). */
class WindowTopKRuleSpec extends SparkSuite {

  private def df: DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    (1L to 400L).map(i => (i % 7, i % 31, i)).toSeq.toDF("g", "v", "id")
  }

  private def plan(d: DataFrame): String = d.queryExecution.executedPlan.toString

  test("the window idiom plans as TopKPerGroupExec and matches the window result") {
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id").asc)
    val idiom = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
    assert(plan(idiom).contains("TopKPerGroup"), plan(idiom))
    assert(!plan(idiom).contains("Window"), plan(idiom))
    // defeat the pattern with a disjunction -> genuine Window plan
    val reference = df.withColumn("rn", row_number().over(w))
      .filter(expr("rn <= 3 OR rn < 0"))
    assert(reference.queryExecution.executedPlan.toString.contains("Window"))
    val a = idiom.orderBy(col("g"), col("rn")).collect().map(_.toSeq).toSeq
    val b = reference.orderBy(col("g"), col("rn")).collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("cast-to-long rank comparisons and conjunctions rewrite; residual filter kept") {
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id").asc)
    val q = df.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 2 && col("g") =!= 0)
    assert(plan(q).contains("TopKPerGroup"), plan(q))
    assert(!plan(q).contains("Window"), plan(q))
    val got = q.collect()
    assert(got.forall(_.getAs[Long]("g") != 0))
    assert(got.groupBy(_.getAs[Long]("g")).values.forall(_.length <= 2))
    assert(got.map(_.getAs[Long]("rn")).forall(r => r == 1L || r == 2L))
  }

  test("non-matching shapes keep the Window: lower bounds, huge k, extra window exprs") {
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id").asc)
    val lower = df.withColumn("rn", row_number().over(w)).filter(col("rn") >= 2)
    assert(lower.queryExecution.executedPlan.toString.contains("Window"))
    val huge = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 1000000)
    assert(huge.queryExecution.executedPlan.toString.contains("Window"))
    val multi = df.withColumn("rn", row_number().over(w))
      .withColumn("mx", max(col("v")).over(Window.partitionBy(col("g"))))
      .filter(col("rn") <= 3)
    // two window expressions -> Window must stay (mx still needed)
    assert(multi.queryExecution.executedPlan.toString.contains("Window"))
    assert(multi.collect().forall(r => r.getAs[Int]("rn") <= 3))
  }
}
