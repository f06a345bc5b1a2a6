package graft
import graft.api.Flagship
import org.apache.spark.sql.SparkSession
object ScratchProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    def show(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"===== $name =====")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    show("q3_top_revenue", SparkEntry.queries("q3_top_revenue")(spark, dir))
    show("q_pip_join", SparkEntry.queries("q_pip_join")(spark, dir))
    show("q_dsm_grid", SparkEntry.queries("q_dsm_grid")(spark, dir))
    val staged = Flagship.stageInput(spark, 100000)
    show("flagship", Flagship.geocodedFromParquet(spark, staged))
    spark.stop()
  }
}
