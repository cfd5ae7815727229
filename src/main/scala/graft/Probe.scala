package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
// throwaway dev probe — deleted before commit
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone","UTC").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    ev.printSchema()
    ev.select(col("event_id"), expr("timestamp_micros(ts DIV 1000)").as("ts_us"))
      .orderBy("event_id").limit(5).collect().foreach(println)
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val two = emb.filter(col("vec_id") < 2).orderBy("vec_id").collect()
    val a = two(0).getSeq[Float](1); val b = two(1).getSeq[Float](1)
    var acc = 0.0; for (i <- 0 until 64) acc += a(i).toDouble * b(i).toDouble
    println(f"scala-fold-dot01 = $acc%.17g")
    var na = 0.0; var nb = 0.0
    for (i <- 0 until 64) { na += a(i).toDouble*a(i).toDouble; nb += b(i).toDouble*b(i).toDouble }
    println(f"scala-cos01 = ${acc / (math.sqrt(na)*math.sqrt(nb))}%.17g")
    val df = emb.filter(col("vec_id")===0).as("q").crossJoin(emb.filter(col("vec_id")===1).as("c"))
      .select(expr("aggregate(zip_with(q.embedding, c.embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)").as("dot"))
    df.collect().foreach(r => println(f"spark-agg-dot01 = ${r.getDouble(0)}%.17g"))
    spark.stop()
  }
}
