package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of driver-checkable queries. `queries` values take
  * (session, sfDir) and read the driver fixtures from sfDir; `oracles`
  * holds the equivalent DuckDB SQL per query name (omit a key for
  * non-SQL-expressible — approximate / kernel — operators, which then get
  * the weaker rows-only check). */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
