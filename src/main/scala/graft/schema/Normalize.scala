package graft.schema

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §1.2 boundary coercions — the reference's type semantics, encoded as
  * a normalization layer of native Column expressions (no UDFs).
  *
  * Reference evidence: mongo_loader.py:87-130 (ObjectId→String, datetime
  * →"%Y-%m-%d %H:%M:%S", one-level flatten, $-key strip, nested-field
  * delete), postgres_loader.py:128-140 (date/decimal coercions),
  * base_loader.py:808-844 (mixed→String, dict/list→JSON string).
  */
object Normalize {

  /** `$`-prefixed BSON keys stripped of `$` (mongo_loader.py:97-98). */
  def stripDollarKeys(df: DataFrame): DataFrame =
    df.columns.foldLeft(df) { (acc, c) =>
      if (c.startsWith("$")) acc.withColumnRenamed(c, c.stripPrefix("$")) else acc
    }

  /** Timestamps rendered at second precision, TZ dropped
    * (mongo_loader.py:112-120) — used only at the staging boundary; the
    * engine keeps TimestampType internally. */
  def timestampToString(c: Column): Column =
    date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Dates rendered "%Y-%m-%d" (postgres_loader.py:133-134). */
  def dateToString(c: Column): Column = date_format(c, "yyyy-MM-dd")

  /** Decimal → Double, the reference's (lossy, intentional) contract
    * (postgres_loader.py:135-136). */
  def decimalsToDouble(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (acc, f) =>
      f.dataType match {
        case _: DecimalType => acc.withColumn(f.name, col(f.name).cast(DoubleType))
        case _ => acc
      }
    }

  /** Nested struct/array columns JSON-stringified at the raw layer
    * (base_loader.py:837-838); scalars untouched. */
  def stringifyNested(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (acc, f) =>
      f.dataType match {
        case _: StructType | _: ArrayType | _: MapType =>
          acc.withColumn(f.name, to_json(col(f.name)))
        case _ => acc
      }
    }

  /** P4 — one-level flatten: `{k: {n: v}}` → column `k_n = v`
    * (mongo_loader.py:122-130). Generated from the schema — pure
    * projection, no shuffle. */
  def flattenOneLevel(df: DataFrame): DataFrame = {
    val cols: Seq[Column] = df.schema.fields.toSeq.flatMap {
      case StructField(name, st: StructType, _, _) =>
        st.fields.toSeq.map(f => col(s"$name.${f.name}").as(s"${name}_${f.name}"))
      case f => Seq(col(f.name))
    }
    df.select(cols: _*)
  }

  /** P3 — delete a field by dotted path from a struct column
    * (mongo_loader.py:62-85). Top-level names drop the column. */
  def dropNestedField(df: DataFrame, path: String): DataFrame =
    path.split("\\.").toList match {
      case top :: Nil => df.drop(top)
      case top :: rest if df.columns.contains(top) =>
        df.withColumn(top, col(top).dropFields(rest.mkString(".")))
      case _ => df
    }

  /** S7 — destination-schema projection: keep known columns, fill
    * missing with typed nulls, skip unknown incoming fields
    * (base_loader.py:90-105, 213-220, 290-304). */
  def alignToSchema(df: DataFrame, dest: StructType): DataFrame = {
    val have = df.columns.toSet
    df.select(dest.fields.map { f =>
      if (have.contains(f.name)) col(f.name).cast(f.dataType)
      else lit(null).cast(f.dataType).as(f.name)
    }.toSeq: _*)
  }
}
