package graft
import graft.api.Flagship
import graft.grid.Gridding
import graft.join.{Aoi, SpatialJoins}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ScratchProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", s"${8*1024*1024}")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val path = Flagship.stageInput(spark, sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "1000000").toLong)
    def time(name: String)(f: => Any): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); f
        println(f"$name run$i: ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    val raw = spark.read.parquet(path)
    time("scan+md5")(raw.select(col("url"), md5(col("text"))).agg(count(lit(1))).head())
    val geoNP = Flagship.geocodedFromParquet(spark, path)
    time("dedup+geocode")(geoNP.agg(count(lit(1))).head())
    val geo = geoNP.persist()
    geo.count()
    time("pip")(SpatialJoins.pointInPolygon(spark, geo, Aoi.defs).count())
    time("dsm")(Gridding.dsm(Gridding.points(geo)).agg(count(lit(1)), sum(col("v"))).head())
    geo.unpersist()
    spark.stop()
  }
}
