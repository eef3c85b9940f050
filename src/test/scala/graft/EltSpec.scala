package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.TableStore
import graft.pipeline.Elt

/** S4/S5/S11 façade: JSON staging round trip, schema drift tolerance,
  * empty-input no-op, upsert-on-load. */
class EltSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  test("extract renders timestamps as staging strings; load re-promotes") {
    val stage = tmp("elt-stage") + "/batch1"
    val store = new TableStore(spark, tmp("elt-store") + "/t")
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "attr")
      .withColumn("updated_at",
        lit("2024-01-02 03:04:05").cast(TimestampType))
    assert(Elt.extractToStaging(df, stage) == 2)

    // staged file is the reference's exchange format: string timestamp
    val rawLine = spark.read.text(stage).head().getString(0)
    assert(rawLine.contains(""""updated_at":"2024-01-02 03:04:05""""))

    Elt.loadFromStaging(spark, stage, store, Seq("id"))
    val loaded = store.read().get
    assert(loaded.schema("updated_at").dataType == TimestampType)
    assert(loaded.count() == 2)
  }

  test("load is a no-op on empty staging input (reference quirk)") {
    val stage = tmp("elt-empty") + "/b"
    val store = new TableStore(spark, tmp("elt-store2") + "/t")
    store.write(Seq((1L, "keep")).toDF("id", "attr"))
    Seq.empty[String].toDF("value").write.mode("overwrite").text(stage)
    assert(Elt.loadFromStaging(spark, stage, store, Seq("id")) == 0)
    assert(store.read().get.count() == 1)
  }

  test("schema drift: unknown staged fields skipped, missing nulled") {
    val stage = tmp("elt-drift") + "/b"
    val store = new TableStore(spark, tmp("elt-store3") + "/t")
    store.write(Seq((1L, "a", 9.9)).toDF("id", "attr", "score"))
    // staged batch has an extra column and lacks `score`
    Seq("""{"id":2,"attr":"b","surprise":"x"}""").toDF("value")
      .write.mode("overwrite").text(stage)
    Elt.loadFromStaging(spark, stage, store, Seq("id"))
    val out = store.read().get
    assert(out.columns.toSeq == Seq("id", "attr", "score"))
    assert(out.where(col("id") === 2).head().isNullAt(2))
    assert(out.count() == 2)
  }

  test("load upserts on key: re-loading a key replaces the row") {
    val stage1 = tmp("elt-up") + "/b1"
    val stage2 = tmp("elt-up") + "/b2"
    val store = new TableStore(spark, tmp("elt-store4") + "/t")
    Elt.extractToStaging(Seq((1L, "v1"), (2L, "v1")).toDF("id", "attr"), stage1)
    Elt.loadFromStaging(spark, stage1, store, Seq("id"))
    Elt.extractToStaging(Seq((2L, "v2")).toDF("id", "attr"), stage2)
    Elt.loadFromStaging(spark, stage2, store, Seq("id"))
    val out = store.read().get.as[(Long, String)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, "v1"), (2L, "v2")))
  }
}
