package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Schema-conform transforms — the defensive ingest layer of the
  * reference pipeline re-expressed as reusable DataFrame transforms.
  *
  * Reference semantics:
  *  - rename map: full_stock_pipeline.py:282-294 (P1)
  *  - drop/select subset: full_stock_pipeline.py:296-298 (P2)
  *  - add-missing-with-default: full_stock_pipeline.py:300-305 (P3)
  *  - null-fill + cast + inf→0: full_stock_pipeline.py:308-317 (P4)
  *
  * All are pure projections: they stay inside whole-stage codegen and
  * never shuffle, so they cost one pass at any scale.
  */
object Conform {

  /** P1 — rename columns present in the map; leave others untouched. */
  def rename(df: DataFrame, mapping: Map[String, String]): DataFrame =
    mapping.foldLeft(df) { case (d, (from, to)) =>
      if (d.columns.contains(from)) d.withColumnRenamed(from, to) else d
    }

  /** P2 — keep only `cols` (ignoring requested cols that don't exist). */
  def selectSubset(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.filter(df.columns.contains).map(col): _*)

  /** P3 — ensure every (name -> default) column exists; missing ones are
    * added as literals. */
  def addMissing(df: DataFrame, defaults: Seq[(String, Column)]): DataFrame =
    defaults.foldLeft(df) { case (d, (name, default)) =>
      if (d.columns.contains(name)) d else d.withColumn(name, default)
    }

  /** P4 — cast columns, then replace null/NaN/±Inf in numeric columns
    * with `fill`. */
  def castAndFill(df: DataFrame, casts: Map[String, DataType], fill: Double): DataFrame = {
    val casted = casts.foldLeft(df) { case (d, (name, dt)) =>
      if (d.columns.contains(name)) d.withColumn(name, col(name).cast(dt)) else d
    }
    casts.keys.filter(casted.columns.contains).foldLeft(casted) { (d, name) =>
      val isFractional = d.schema(name).dataType match {
        case org.apache.spark.sql.types.DoubleType | org.apache.spark.sql.types.FloatType => true
        case _ => false
      }
      val bad =
        if (isFractional)
          col(name).isNull || isnan(col(name)) ||
            col(name) === Double.PositiveInfinity || col(name) === Double.NegativeInfinity
        else col(name).isNull
      d.withColumn(name, when(bad, lit(fill).cast(d.schema(name).dataType)).otherwise(col(name)))
    }
  }
}
