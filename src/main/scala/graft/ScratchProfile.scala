package graft
import graft.core.Tables
import graft.text.TextOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ScratchProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    def time(name: String)(f: => Any): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime(); f
        println(f"$name run$i: ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    val sh = TextOps.shingles3(docs).select(col("doc_id"), explode(col("shingles")).as("s"))
    time("shingles")(sh.agg(count(lit(1))).head())
    val md = sh.withColumn("m", md5(col("s")))
    time("shingles+md5")(md.agg(count(lit(1)), max(col("m"))).head())
    val hv = md.withColumn("hv", conv(substring(col("m"),1,8),16,10).cast("long"))
    time("+conv")(hv.agg(count(lit(1)), max(col("hv"))).head())
    val aggs = (0 until 16).map(j => min((lit(graft.dedup.Dedup.hashA(j)) * col("hv") + lit(graft.dedup.Dedup.hashB(j))) % lit(graft.dedup.Dedup.MinHashP)).as(s"m$j"))
    time("full")(hv.groupBy(col("doc_id")).agg(aggs.head, aggs.tail:_*).agg(count(lit(1))).head())
    spark.stop()
  }
}
