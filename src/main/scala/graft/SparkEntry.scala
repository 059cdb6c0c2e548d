package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every operator registry in the library; each
  * entry has a DuckDB oracle in `oracleSql` unless the operator is not
  * SQL-expressible (approximate/seeded ops → rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ LakehouseOps.queries ++ SessionOps.queries ++
      TextOps.queries ++ VectorOps.queries ++ ScaleOps.queries ++
      Multimodal.queries ++ TypedOps.queries ++ GraphOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → rows-only check. */
  def oracleSql: Map[String, String] =
    Relational.oracleSql ++ LakehouseOps.oracleSql ++ SessionOps.oracleSql ++
      TextOps.oracleSql ++ VectorOps.oracleSql ++ ScaleOps.oracleSql ++
      Multimodal.oracleSql ++ TypedOps.oracleSql ++ GraphOps.oracleSql
}
