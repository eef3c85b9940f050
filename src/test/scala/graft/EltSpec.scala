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

  // --- JDBC incremental extraction (postgres_loader.py:73-153) -----------

  test("jdbcSourceQuery: the reference's pushed-predicate shape") {
    // full load: bare table name, no subquery
    assert(Elt.jdbcSourceQuery("public.plans", "updated_at", None)
      == "public.plans")
    // incremental: WHERE tracking > wm inside the derived table, so the
    // predicate runs in the source DB (postgres_loader.py:98-103)
    assert(Elt.jdbcSourceQuery("public.plans", "updated_at",
      Some("2024-01-02 03:04:05"))
      == "(SELECT * FROM public.plans WHERE updated_at > " +
        "'2024-01-02 03:04:05') AS spark_src")
    // quote-escaping: a single quote in the watermark value doubles
    assert(Elt.jdbcSourceQuery("t", "c", Some("o'hare"))
      .contains("c > 'o''hare'"))
    // numeric tracking column: unquoted literal for strict-typed DBs
    assert(Elt.jdbcSourceQuery("t", "seq", Some("42"), quoteWm = false)
      .contains("seq > 42"))
  }

  test("extractJdbc: incremental pull from embedded Derby honors watermark") {
    // In-JVM Derby (on the classpath via /opt/spark/jars) stands in for
    // the reference's Postgres source — same JDBC surface.
    val url = "jdbc:derby:memory:graftelt;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE plans (id INT, attr VARCHAR(20), " +
        "updated_at TIMESTAMP)")
      Seq(
        (1, "a", "2024-01-01 00:00:00"),
        (2, "b", "2024-01-02 00:00:00"),
        (3, "c", "2024-01-03 00:00:00")
      ).foreach { case (i, a, ts) =>
        st.execute(s"INSERT INTO plans VALUES ($i, '$a', TIMESTAMP('$ts'))")
      }
      st.close()

      // full load: no watermark
      val full = Elt.extractJdbc(spark, url, "plans", "updated_at", None)
      assert(full.count() == 3)

      // incremental: strictly after the watermark — row 2 excluded,
      // exactly the reference's `>` semantics (P5)
      val inc = Elt.extractJdbc(spark, url, "plans", "updated_at",
        Some("2024-01-02 00:00:00"))
      assert(inc.select("ID").as[Int].collect().toSeq == Seq(3))

      // partitioned fan-out returns the same rows (2 ranges on id)
      val part = Elt.extractJdbc(spark, url, "plans", "updated_at", None,
        partitionCol = Some("id"), numPartitions = 2,
        lowerBound = Some("1"), upperBound = Some("4"))
      assert(part.rdd.getNumPartitions == 2)
      assert(part.select("ID").as[Int].collect().sorted.toSeq == Seq(1, 2, 3))

      // composes with the staging hop: the batch lands as JSON lines
      val stage = tmp("elt-jdbc") + "/b"
      assert(Elt.extractToStaging(inc, stage) == 1)
    } finally {
      conn.close()
      // drop the in-memory DB so reruns in one JVM start clean
      try java.sql.DriverManager
        .getConnection("jdbc:derby:memory:graftelt;drop=true")
      catch { case _: java.sql.SQLException => () } // drop "fails" by design
    }
  }
}
