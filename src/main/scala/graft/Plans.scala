package graft
import org.apache.spark.sql.SparkSession
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    for (name <- args) {
      println(s"===== $name =====")
      println(SparkEntry.verifyQueries(name)(spark, d).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
