package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout

/** Z-order clustering: hand-checked bit interleave, the file-skipping
  * win over lexicographic layout (the operator's reason to exist),
  * result-equality across layouts, and the NULL / constant-column
  * quantization edges. The z-value arithmetic itself is oracle-gated
  * end-to-end by `q_layout_zorder`. */
class LayoutSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"layout-$tag").toString

  /** 128x128 integer grid — every (x, y) cell once. */
  private def grid(): DataFrame =
    spark.range(128L * 128).select(
      (col("id") / 128).cast("long").as("x"),
      pmod(col("id"), lit(128)).cast("long").as("y"))

  test("interleave matches the hand-computed bit layout") {
    // min 0 / max 7 at bits=3 makes quantization the identity:
    // x=5 (101), y=3 (011) -> bit i*2+j: 1,1,0,1,1,0 -> z=27
    val df = spark.range(8).select(col("id").as("x"), col("id").as("y"))
      .union(Seq((5L, 3L)).toDF("x", "y"))
    val z = Layout.zvalue(df, Seq("x", "y"), bits = 3, as = "z")
      .where($"x" === 5 && $"y" === 3).select("z").as[Long].head()
    assert(z == 27L, s"interleave(101, 011) must be 011011b=27: $z")
    // the diagonal (k, k) interleaves each bit twice -> 3*k in base-4
    val diag = Layout.zvalue(df, Seq("x", "y"), bits = 3, as = "z")
      .where($"x" === $"y").select("x", "z").as[(Long, Long)]
      .collect().toMap
    for (k <- 0L to 7L) {
      val want = (0 until 3).map(i => ((k >> i) & 1) * 3L << (2 * i)).sum
      assert(diag(k) == want, s"diag($k): ${diag(k)} vs $want")
    }
  }

  test("second-column box: z-order skips files, lexicographic cannot") {
    val df = grid()
    val nFiles = 16
    val lexDir = tmp("lex")
    val zDir = tmp("z")
    // lexicographic clustering: range-partition + sort on (x, y)
    df.repartitionByRange(nFiles, $"x", $"y").sortWithinPartitions("x", "y")
      .write.mode("overwrite").parquet(lexDir)
    Layout.zorder(df, Seq("x", "y"), numPartitions = nFiles)
      .write.mode("overwrite").parquet(zDir)
    val lex = spark.read.parquet(lexDir)
    val zrd = spark.read.parquet(zDir)
    val lexStats = Layout.fileStats(lex, Seq("x", "y"))
    val zStats = Layout.fileStats(zrd, Seq("x", "y"))
    assert(lexStats.count() == nFiles && zStats.count() == nFiles,
      "one output file per range partition")
    // a selective predicate on the SECOND column alone: lexicographic
    // files each span all of y, so nothing skips; z-order confines
    // low-y rows to the files owning low y-bit z-runs.
    val box = Map("y" -> (0L, 15L))
    val lexTouched = Layout.filesTouched(lexStats, box)
    val zTouched = Layout.filesTouched(zStats, box)
    assert(lexTouched == nFiles,
      s"lexicographic layout cannot skip on y: $lexTouched")
    assert(zTouched * 2 <= nFiles,
      s"z-order must skip at least half the files on a y-only box: " +
        s"$zTouched of $nFiles")
    // layouts are result-invisible: the box returns identical rows
    val a = lex.where($"y" <= 15).select("x", "y")
      .as[(Long, Long)].collect().sorted.toSeq
    val b = zrd.where($"y" <= 15).select("x", "y")
      .as[(Long, Long)].collect().sorted.toSeq
    assert(a == b && a.size == 128 * 16, "identical box results")
  }

  test("NULLs quantize to cell 0; constant columns are safe") {
    val df = Seq((Some(0L), 0L), (None, 0L), (Some(127L), 127L))
      .toDF("x", "y")
    val z = Layout.zvalue(df, Seq("x", "y"), bits = 4, as = "z")
      .select("x", "z").collect()
    val byX = z.map(r => Option(r.get(0)).map(_.asInstanceOf[Long]) ->
      r.getLong(1)).toMap
    assert(byX(None) == byX(Some(0L)),
      s"null x must share the min cell: $byX")
    // constant column: max == min -> quantizes to 0 everywhere
    val const = Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("x", "y")
    val zs = Layout.zvalue(const, Seq("x", "y"), bits = 4, as = "z")
      .select("y", "z").as[(Long, Long)].collect()
    assert(zs.forall { case (_, zv) => (zv & 0xAAL) == 0 },
      s"constant y contributes no bits: ${zs.toSeq}")
  }
}
