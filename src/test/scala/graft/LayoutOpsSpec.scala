package graft

import org.apache.spark.sql.functions._

import graft.sources.LayoutOps

/** Z-order layout: Morton-code correctness, clustering locality, and the
  * range-exchange plan shape (exact bucket stats pinned by q_zorder). */
class LayoutOpsSpec extends SparkSuite {

  test("zValue interleaves bits: known codes and monotone locality") {
    import spark.implicits._
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 2L),
      (65535L, 65535L)).toDF("x", "y")
    val z = df.select(LayoutOps.zValue(col("x"), col("y")).as("z"))
      .as[Long].collect().toSeq
    // Morton: z(1,0)=1, z(0,1)=2, z(1,1)=3, z(2,2)=12, z(max,max)=2^32-1
    assert(z == Seq(0L, 1L, 2L, 3L, 12L, (1L << 32) - 1))
  }

  test("zvalue is callable from SQL via GraftExtensions") {
    val z = spark.sql("SELECT zvalue(3, 5) AS z").collect().head.getLong(0)
    // 3 = 11b -> even bits 0101b; 5 = 101b -> odd bits 100010b; or = 100111b = 39
    assert(z == 39L)
  }

  test("z-buckets have compact bounding boxes vs the global key space") {
    val rows = LayoutOps.zOrderBuckets(spark, sf).collect()
    assert(rows.length > 1)
    val partSpan = rows.map(_.getAs[Long]("max_part")).max -
      rows.map(_.getAs[Long]("min_part")).min
    val avgBucketSpan = rows.map(r =>
      r.getAs[Long]("max_part") - r.getAs[Long]("min_part")).sum.toDouble / rows.length
    // each z-bucket must cover a small slice of the part range, not all of it
    assert(avgBucketSpan < partSpan / 2.0,
      s"buckets not localized: avg span $avgBucketSpan of $partSpan")
  }

  test("clusterByZ range-partitions on the z-value and sorts within partitions") {
    val l = spark.read.parquet(s"$sf/lineitem.parquet")
    val clustered = LayoutOps.clusterByZ(l, "l_partkey", "l_suppkey", 4)
    val plan = clustered.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("rangepartitioning"),
      s"expected a range exchange:\n$plan")
    assert(clustered.count() == l.count())
    // within every output partition, z-values are non-decreasing
    import spark.implicits._
    val ok = clustered
      .select(LayoutOps.zValue(col("l_partkey"), col("l_suppkey")).as("z"))
      .mapPartitions { it =>
        val zs = it.map(_.getLong(0))
        var prev = Long.MinValue
        var sorted = true
        zs.foreach { v => if (v < prev) sorted = false; prev = v }
        Iterator.single(sorted)
      }.collect()
    assert(ok.forall(identity), "z-values not sorted within a partition")
  }

  test("compaction plan: one exchange, consecutive bins, closed bins reach the target") {
    val target = 4096L
    val plan = LayoutOps.compactionPlan(spark, sf)
    val pstr = plan.queryExecution.executedPlan.toString
    // the explicit repartition(month) is the ONLY hash exchange: the
    // file agg, the running-sum window, and the bin roll-up all reuse
    // it (the remaining range exchange is the presentation orderBy)
    assert("(?i)hashpartitioning".r.findAllIn(pstr).size == 1, s"plan:\n$pstr")
    val rows = plan.collect()
    rows.groupBy(_.getDate(0)).foreach { case (month, bins) =>
      val sorted = bins.sortBy(_.getLong(1))
      // bin ids are consecutive from 0
      assert(sorted.map(_.getLong(1)).toSeq == (0L until sorted.length).toSeq,
        s"$month bins not consecutive")
      // day ranges ascend without overlap
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getDate(5).before(b.getDate(4)),
            s"$month bins overlap: $a vs $b")
        case _ =>
      }
      // every bin except the month's last closed at >= target bytes
      // (next-fit: the straddling file lands in the bin it closes)
      var cum = 0L
      sorted.dropRight(1).zipWithIndex.foreach { case (r, i) =>
        cum += r.getLong(3)
        assert(cum >= (i + 1) * target, s"$month bin $i closed under target")
      }
    }
    assert(rows.nonEmpty)
  }
}
