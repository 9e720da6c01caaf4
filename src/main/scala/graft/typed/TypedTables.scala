package graft.typed

import graft.sources.Tables
import org.apache.spark.sql.{Dataset, SparkSession}
import java.sql.Timestamp

/** Typed Dataset facade over the source tables — case-class Encoders where
  * compile-time field checks help (pipeline code wiring many columns);
  * DataFrames remain the right tool where schemas are dynamic (SURVEY §1.1).
  * Field names/types mirror the parquet schemas exactly so `.as[T]` is a
  * zero-copy analyzer-level cast.
  */
object TypedTables {

  final case class Lineitem(
      l_orderkey: Long, l_partkey: Long, l_suppkey: Long, l_linenumber: Int,
      l_quantity: Double, l_extendedprice: Double, l_discount: Double,
      l_tax: Double, l_returnflag: String, l_linestatus: String,
      l_shipdate: Timestamp)

  final case class Order(
      o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
      o_totalprice: Double, o_orderdate: Timestamp, o_orderpriority: String)

  final case class Customer(
      c_custkey: Long, c_name: String, c_nationkey: Int, c_acctbal: Double,
      c_mktsegment: String)

  final case class Doc(
      doc_id: Long, text: String, lang: String, source: String, n_chars: Long)

  def lineitem(spark: SparkSession, dir: String): Dataset[Lineitem] = {
    import spark.implicits._
    Tables.load(spark, dir, "lineitem").as[Lineitem]
  }

  def orders(spark: SparkSession, dir: String): Dataset[Order] = {
    import spark.implicits._
    Tables.load(spark, dir, "orders").as[Order]
  }

  def customer(spark: SparkSession, dir: String): Dataset[Customer] = {
    import spark.implicits._
    Tables.load(spark, dir, "customer").as[Customer]
  }

  def documents(spark: SparkSession, dir: String): Dataset[Doc] = {
    import spark.implicits._
    Tables.load(spark, dir, "documents").as[Doc]
  }
}
