package graft
import org.apache.spark.sql.SparkSession
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().appName("explain").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    for (q <- args) {
      val df = SparkEntry.queries(q)(spark, d)
      df.write.format("noop").mode("overwrite").save()
      println(s"===== $q (final adaptive plan) =====")
      println(df.queryExecution.executedPlan.toString.take(20000))
    }
    spark.stop()
  }
}
