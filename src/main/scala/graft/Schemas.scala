package graft

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed views of the core tables (SURVEY.md §1.2: case-class
  * `Encoder`s where compile-time checks pay for themselves; plain
  * `DataFrame` elsewhere). The typed accessors are thin casts over the
  * schema-first readers in [[Tables]] — same scans, same pushdown,
  * plus field-name/type checking at compile time for job code.
  */
object Schemas {

  case class Lineitem(l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
                      l_linenumber: Int, l_quantity: Double, l_extendedprice: Double,
                      l_discount: Double, l_tax: Double, l_returnflag: String,
                      l_linestatus: String, l_shipdate: java.sql.Timestamp)

  case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
                   o_totalprice: Double, o_orderdate: java.sql.Timestamp,
                   o_orderpriority: String)

  case class Customer(c_custkey: Long, c_name: String, c_nationkey: Int,
                      c_acctbal: Double, c_mktsegment: String)

  case class Supplier(s_suppkey: Long, s_name: String, s_nationkey: Int,
                      s_acctbal: Double)

  case class Nation(n_nationkey: Int, n_name: String, n_regionkey: Int)

  case class Region(r_regionkey: Int, r_name: String)

  /** `ts` is the raw nanosecond Long (see [[Tables.events]]). */
  case class Event(event_id: Long, ts: Long, user_id: Long, event_type: String,
                   value: Double, props: String)

  case class Document(doc_id: Long, text: String, lang: String, source: String,
                      n_chars: Long)

  case class Embedding(vec_id: Long, embedding: Seq[Float], label: Int)

  def lineitem(spark: SparkSession, dir: String): Dataset[Lineitem] = {
    import spark.implicits._; Tables.lineitem(spark, dir).as[Lineitem]
  }
  def orders(spark: SparkSession, dir: String): Dataset[Order] = {
    import spark.implicits._; Tables.orders(spark, dir).as[Order]
  }
  def customer(spark: SparkSession, dir: String): Dataset[Customer] = {
    import spark.implicits._; Tables.customer(spark, dir).as[Customer]
  }
  def supplier(spark: SparkSession, dir: String): Dataset[Supplier] = {
    import spark.implicits._; Tables.supplier(spark, dir).as[Supplier]
  }
  def nation(spark: SparkSession, dir: String): Dataset[Nation] = {
    import spark.implicits._; Tables.nation(spark, dir).as[Nation]
  }
  def region(spark: SparkSession, dir: String): Dataset[Region] = {
    import spark.implicits._; Tables.region(spark, dir).as[Region]
  }
  def events(spark: SparkSession, dir: String): Dataset[Event] = {
    import spark.implicits._
    // Route through Tables.events so the ts → ns-Long normalization (both
    // parquet vintages) happens before the typed cast; drop the derived
    // helper columns the Event case class doesn't carry.
    Tables.events(spark, dir).drop("ts_sec", "event_date").as[Event]
  }
  def documents(spark: SparkSession, dir: String): Dataset[Document] = {
    import spark.implicits._; Tables.documents(spark, dir).as[Document]
  }
  def embeddings(spark: SparkSession, dir: String): Dataset[Embedding] = {
    import spark.implicits._; Tables.embeddings(spark, dir).as[Embedding]
  }
}
