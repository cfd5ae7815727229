package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType

import graft.model.Tables

/** Bloom-prefiltered fact⋈fact join ([EXT]; the scale tool Spark's own
  * runtime row-level filtering uses, made explicit and pluggable).
  *
  * When the probe side is huge and the build side is selective but too
  * big (or too late in the plan) to broadcast-join, a Bloom filter of the
  * build keys cuts the probe's SHUFFLE volume: probe rows whose key
  * cannot be on the build side are dropped at the scan, before the
  * exchange. False positives are harmless — the real join still runs and
  * removes them — so the result is bit-identical to the plain join
  * (exactly what the q_bloom_join oracle checks).
  *
  * Scale notes (100 TB): the sketch is built with one tree-aggregated
  * pass over the build side (public `stat.bloomFilter`; ~1.2 MB per
  * million keys at 1% fpp) and is embedded as a binary literal under a
  * codegen'd `might_contain` predicate — no UDF, no per-row
  * deserialization (the expression caches the decoded filter). With a
  * 90%-selective filter the probe shuffle shrinks ~10×; the bloom build
  * cost is one scan of the SMALL side.
  */
object BloomOps {

  /** Join `big ⋈ small` on long keys, prefiltering `big` with a Bloom
    * filter of `small`'s keys. `expectedItems` sizes the sketch (an
    * overestimate only wastes bits, never correctness). */
  def bloomPrefilteredJoin(big: DataFrame, small: DataFrame,
                           bigKey: String, smallKey: String,
                           expectedItems: Long = 1L << 17,
                           fpp: Double = 0.01): DataFrame = {
    // an EMPTY build side NPEs inside stat.bloomFilter's aggregate
    // (null merge buffer); the prefilter is pointless there anyway —
    // the plain join is already the (empty) answer. One head(1) job
    // against the SMALL side is noise next to the sketch pass.
    if (small.isEmpty)
      return big.join(small, big(bigKey) === small(smallKey))
    val bf = small.stat.bloomFilter(smallKey, expectedItems, fpp)
    val bytes = {
      val os = new ByteArrayOutputStream()
      bf.writeTo(os)
      os.toByteArray
    }
    val pred = ColumnBridge.column(BloomFilterMightContain(
      Literal(bytes, BinaryType),
      ColumnBridge.expression(big(bigKey).cast("long"))))
    big.filter(pred).join(small, big(bigKey) === small(smallKey))
  }

  /** Query face: revenue of high-value orders (top ~10% by price) from
    * lineitem, with the lineitem scan bloom-prefiltered on the selected
    * order keys. */
  def highValueOrderRevenue(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir).filter(col("o_totalprice") > 450000)
    bloomPrefilteredJoin(l, o, "l_orderkey", "o_orderkey")
      .groupBy(col("o_orderkey"), col("o_totalprice"))
      .agg(Relational.dsum(col("l_extendedprice")).as("lineitem_price"),
        count(lit(1)).as("n_items"))
      .orderBy(col("o_orderkey"))
  }
}
