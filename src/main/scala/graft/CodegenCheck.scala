package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object CodegenCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.codegen.fallback","false")
      .config("spark.sql.codegen.factoryMode","CODEGEN_ONLY")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.functions.{TextExpressions => TE, VectorExpressions => VE}
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog runs far",
      Array(0.1, 0.2, 0.3, 0.4))).toDF("id", "text", "vec")
    val out = df.select(
      TE.hashedShingles(col("text")).as("hs"),
      TE.minhashSigFromHashes(TE.hashedShingles(col("text")), 16).as("mh"),
      TE.minhashSig(split(col("text"), " "), 16).as("mhs"),
      TE.simhash64(split(col("text"), " ")).as("sim"),
      TE.winnowFingerprint(col("text")).as("wf"),
      VE.lshBuckets(col("vec"), 4, 4, 4).as("lsh"),
      VE.dotFast(col("vec"), col("vec")).as("dot"))
    out.show(1, truncate=false)
    println("CODEGEN_OK")
    spark.stop()
  }
}
