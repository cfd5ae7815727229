package graft

import org.apache.spark.sql.functions._

import graft.sources.Formats

/** Round-trip checks for the non-parquet format surface: the same rows
  * must come back from CSV.gz, JSON-lines, and ORC, with the declared
  * schema (no inference in the read path). */
class FormatsSpec extends SparkSuite {

  private lazy val nation = spark.read.parquet(s"$sf/nation.parquet")
    .select(col("n_nationkey").cast("long").as("n_nationkey"),
      col("n_name"), col("n_regionkey").cast("long").as("n_regionkey"))

  private def roundtripEqual(back: org.apache.spark.sql.DataFrame): Unit = {
    val a = nation.orderBy("n_nationkey").collect().map(_.toSeq).toSeq
    val b = back.select("n_nationkey", "n_name", "n_regionkey")
      .orderBy("n_nationkey").collect().map(_.toSeq).toSeq
    assert(b == a)
  }

  test("CSV.gz round-trip preserves rows and declared schema") {
    val dir = tmpDir("graft-csv")
    Formats.writeCsvGz(nation, s"$dir/nation_csv")
    val back = Formats.readCsv(spark, s"$dir/nation_csv", nation.schema)
    assert(back.schema == nation.schema)
    roundtripEqual(back)
  }

  test("JSON-lines round-trip preserves rows under an explicit schema") {
    val dir = tmpDir("graft-json")
    Formats.writeJsonLines(nation, s"$dir/nation_json")
    val back = Formats.readJsonLines(spark, s"$dir/nation_json", nation.schema)
    roundtripEqual(back)
  }

  test("ORC round-trip preserves rows and schema") {
    val dir = tmpDir("graft-orc")
    Formats.writeOrc(nation, s"$dir/nation_orc")
    val back = Formats.readOrc(spark, s"$dir/nation_orc")
    assert(back.schema == nation.schema)
    roundtripEqual(back)
  }

  test("CSV FAILFAST surfaces corrupt rows instead of nulling them") {
    val dir = tmpDir("graft-badcsv")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/bad"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/bad/part-0.csv"),
      "n_nationkey,n_name,n_regionkey\n0,ALGERIA,0\nnot_a_number,X,Y\n"
        .getBytes("UTF-8"))
    val ex = intercept[org.apache.spark.SparkException] {
      Formats.readCsv(spark, s"$dir/bad", nation.schema).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("malformed") ||
      ex.getCause != null)
  }

  test("partitioned parquet layout prunes partitions on read") {
    val dir = tmpDir("graft-part")
    Formats.partitionedParquet(
      spark.read.parquet(s"$sf/orders.parquet")
        .select("o_orderkey", "o_orderstatus", "o_totalprice"),
      s"$dir/orders_part", "o_orderstatus")
    val pruned = spark.read.parquet(s"$dir/orders_part")
      .filter(col("o_orderstatus") === "F")
    val plan = pruned.queryExecution.executedPlan.toString
    // the predicate must be INSIDE the PartitionFilters bracket — the
    // scan prints "PartitionFilters: []" even when nothing is pushed
    assert("PartitionFilters: \\[[^\\]]*o_orderstatus".r
      .findFirstIn(plan).isDefined, plan.take(600))
    val direct = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderstatus") === "F").count()
    assert(pruned.count() == direct)
  }

  test("bucketed tables co-locate the join: zero shuffle exchanges, answers unchanged") {
    // both sides bucketed on the join key with the SAME bucket count ⇒
    // the sort-merge join consumes the on-disk layout directly — the
    // 100 TB fact⋈fact shape where neither side can broadcast and the
    // shuffle is the cost you pre-paid at write time
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_extendedprice")
    Formats.bucketedTable(orders, "orders_b", 4, "o_orderkey")
    Formats.bucketedTable(lineitem, "lineitem_b", 4, "l_orderkey")
    // disable auto-broadcast: at test SF the dim side broadcasts and the
    // bucketed layout never engages — the shape under test is the BIG
    // fact⋈fact case where broadcasting isn't an option
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("lineitem_b").join(spark.table("orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan.take(800))
      assert(plan.contains("SortMergeJoin"), plan.take(800))
      val direct = lineitem.join(orders,
        col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == direct)
      // aggregation on the bucket key rides the same layout: no exchange
      val agg = spark.table("lineitem_b").groupBy("l_orderkey").count()
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
