package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.IncrementalAgg

/** Incremental aggregate-view maintenance: the view equals a batch
  * recompute after every micro-batch, untouched bucket partitions are
  * NOT rewritten (the invariant that makes it maintenance rather than
  * recompute), and replayed batches are skipped. */
class IncrementalAggSpec extends SparkSuite {

  final case class Fact(brand: String, price: Double)

  private def bucketOf(brand: String): Long =
    spark.range(1)
      .select(pmod(xxhash64(lit(brand)), lit(IncrementalAgg.nBuckets)))
      .head().getLong(0)

  private def viewTotals(viewDir: String): Map[String, (Double, Long)] =
    IncrementalAgg.readView(spark, viewDir, Seq("brand")).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap

  test("view merges across batches, prunes untouched buckets, skips replays") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // pick two brands in DIFFERENT buckets so batch 2 provably leaves
    // brand-A's partition alone
    val Seq(brandA, brandB) = Seq("alpha", "beta", "gamma", "delta")
      .map(b => b -> bucketOf(b)).distinctBy(_._2).take(2).map(_._1)
    val viewDir = tmpDir("graft-ivm") + "/view"

    val input = MemoryStream[Fact]
    val q = IncrementalAgg.maintainView(input.toDF(), viewDir, Seq("brand"),
      "price", Trigger.ProcessingTime(0))
    try {
      input.addData(Fact(brandA, 10.50), Fact(brandA, 2.25), Fact(brandB, 5.00))
      q.processAllAvailable()
      assert(viewTotals(viewDir) ==
        Map(brandA -> (12.75, 2L), brandB -> (5.00, 1L)))

      // snapshot brand-A's partition files before a batch touching only B
      val fs = org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
      def filesOf(b: String): Map[String, Long] = {
        val dir = new Path(s"$viewDir/data/bucket=${bucketOf(b)}")
        fs.listStatus(dir).map(s => s.getPath.getName -> s.getModificationTime).toMap
      }
      val aBefore = filesOf(brandA)

      input.addData(Fact(brandB, 1.25))
      q.processAllAvailable()
      assert(viewTotals(viewDir) ==
        Map(brandA -> (12.75, 2L), brandB -> (6.25, 2L)))
      assert(filesOf(brandA) == aBefore,
        "untouched bucket partition was rewritten")
    } finally q.stop()

    // a FRESH query (batchIds restart at 0) against the same view must
    // skip its replayed batches: the view is unchanged
    val replay = MemoryStream[Fact]
    replay.addData(Fact(brandA, 99.99))
    val q2 = IncrementalAgg.maintainView(replay.toDF(), viewDir, Seq("brand"),
      "price", Trigger.AvailableNow())
    q2.processAllAvailable()
    q2.stop()
    assert(viewTotals(viewDir) ==
      Map(brandA -> (12.75, 2L), brandB -> (6.25, 2L)))
  }
}
