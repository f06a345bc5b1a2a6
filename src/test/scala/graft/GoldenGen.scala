package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

/** Regenerates the committed golden parquet files under
  * src/test/resources/golden/. Run `sbt "Test/runMain graft.GoldenGen"`
  * ONLY when product semantics move intentionally; commit the diff. */
object GoldenGen {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val outDir = Paths.get("src/test/resources/golden")
    Files.createDirectories(outDir)

    val tmp = Files.createTempDirectory("golden").toString
    SparkEntry.queries("q_shr3d_dtm")(spark, "/root/testdata/sf0.001")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/dtm")
    val part = Files.list(Paths.get(s"$tmp/dtm")).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .find(_.getFileName.toString.endsWith(".parquet"))
      .getOrElse(sys.error("no parquet part written"))
    Files.copy(part, outDir.resolve("q_shr3d_dtm_sf0001.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    println(s"golden written: ${outDir.resolve("q_shr3d_dtm_sf0001.parquet")}")
    spark.stop()
  }
}
