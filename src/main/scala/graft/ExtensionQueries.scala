package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.cdc.{ApplyChanges, Fixtures, Routing}
import graft.ops.{Dedup, Multimodal, Sessionize, Similarity, Text, Vectors}

/** Extension-operator queries (SURVEY §7.4): training-data-pipeline ops
  * over `documents`/`embeddings`, plus the strict CDC dispatch form and
  * snapshot+stream union. Same oracle-parity conventions as SparkEntry.
  */
object ExtensionQueries
    extends EventsExtensionQueries
    with EventsGraphExtensionQueries
    with TextExtensionQueries
    with CorpusExtensionQueries
    with DedupExtensionQueries
    with VectorExtensionQueries
    with StatsExtensionQueries
    with MiscExtensionQueries {

  /** The single registry the driver contract reads (SparkEntry merges
    * this with the TPC-H/CDC base set). Keys are unique across the
    * family traits; the aggregation is pure concatenation. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    eventsExtQueries ++ eventsGraphExtQueries ++ textExtQueries ++ corpusExtQueries ++ dedupExtQueries ++ vectorExtQueries ++ statsExtQueries ++ miscExtQueries

  /** DuckDB oracle SQL for every key in [[queries]] — same
    * aggregation, same keys. */
  def oracleSql: Map[String, String] =
    eventsExtOracles ++ eventsGraphExtOracles ++ textExtOracles ++ corpusExtOracles ++ dedupExtOracles ++ vectorExtOracles ++ statsExtOracles ++ miscExtOracles
}
