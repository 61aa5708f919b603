package graft.sinks

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.cdc.ApplyChanges

/** Sink layer (SURVEY §2.11).
  *
  * The reference's destination is a Postgres table mutated per message
  * (consumer.py:60-91, autocommit per statement). Spark's JDBC writer
  * can only append/overwrite, so upsert semantics live here: a
  * snapshot store that applies a reduced change batch via the merge
  * operator, and a plain-JDBC upsert for real databases. Both are
  * idempotent per batch, which upgrades the reference's at-least-once
  * loss/duplicate windows (SURVEY §2.9) to effectively-exactly-once
  * under streaming checkpointing.
  */
object Sinks {

  /** D1 (test harness form): a parquet-backed keyed snapshot with
    * atomic swap. `merge` folds a change batch in via the A2 operator.
    * The swap is write-new → move-old-away → rename — crash-safe enough
    * for a single writer (streaming guarantees one foreachBatch at a
    * time per query).
    */
  final class ParquetSnapshotStore(spark: SparkSession, path: String, keys: Seq[String]) {
    private val p = Paths.get(path)

    def exists: Boolean = Files.exists(p)

    def load(): Option[DataFrame] =
      if (exists) Some(spark.read.parquet(path)) else None

    def overwrite(df: DataFrame): Unit = {
      val tmp = Paths.get(path + ".tmp")
      deleteRecursive(tmp)
      df.write.parquet(tmp.toString)
      val old = Paths.get(path + ".old")
      deleteRecursive(old)
      if (exists) Files.move(p, old, StandardCopyOption.ATOMIC_MOVE)
      Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE)
      deleteRecursive(old)
    }

    /** Apply one micro-batch of change events (any mix of actions,
      * possibly several per key) to the snapshot.
      */
    def merge(changes: DataFrame, tsCol: String, tieBreak: Seq[String] = Nil): Unit = {
      import org.apache.spark.sql.functions.col
      val reduced = ApplyChanges.latestPerKey(changes, keys, col(tsCol),
        tieBreak.map(col))
      val next = load() match {
        case Some(snap) => ApplyChanges.mergeIntoSnapshot(snap, reduced, keys)
        case None => reduced.where(org.apache.spark.sql.functions.lower(col("action")) =!= "delete")
      }
      overwrite(next)
    }

    private def deleteRecursive(dir: Path): Unit =
      if (Files.exists(dir))
        Files.walk(dir).sorted(Comparator.reverseOrder[Path]())
          .forEach(f => Files.delete(f))
  }

  /** D1 (database form): partition-parallel JDBC upsert/delete with
    * key conflict handling — `INSERT ... ON CONFLICT (k) DO UPDATE` /
    * `DELETE WHERE k = ?` per the reference's apply statements
    * (consumer.py:70-91), but one transaction per partition instead of
    * autocommit per row. Executors open their own connections, so this
    * scales out; the driver never sees the data.
    */
  final case class JdbcUpsert(url: String, table: String, keys: Seq[String],
                              props: java.util.Properties = new java.util.Properties) {
    def apply(changes: DataFrame, actionCol: String = "action"): Unit = {
      val cols = changes.columns.filterNot(_ == actionCol)
      val keyList = keys.mkString(", ")
      val colList = cols.mkString(", ")
      val placeholders = cols.map(_ => "?").mkString(", ")
      val updates = cols.filterNot(keys.contains)
        .map(c => s"$c = EXCLUDED.$c").mkString(", ")
      val upsertSql =
        s"INSERT INTO $table ($colList) VALUES ($placeholders) " +
        s"ON CONFLICT ($keyList) DO UPDATE SET $updates"
      val deleteSql = s"DELETE FROM $table WHERE " +
        keys.map(k => s"$k = ?").mkString(" AND ")
      val (u, t, pr, ac) = (url, table, props, actionCol)
      val colIdx = cols.zipWithIndex
      val keyIdx = keys.map(k => changes.columns.indexOf(k))
      val actionIdx = changes.columns.indexOf(ac)
      val allCols = changes.columns
      changes.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        if (rows.nonEmpty) {
          val conn = java.sql.DriverManager.getConnection(u, pr)
          conn.setAutoCommit(false)
          try {
            val up = conn.prepareStatement(upsertSql)
            val del = conn.prepareStatement(deleteSql)
            rows.foreach { r =>
              if ("delete".equalsIgnoreCase(String.valueOf(r.get(actionIdx)))) {
                keyIdx.zipWithIndex.foreach { case (ki, i) => del.setObject(i + 1, r.get(ki)) }
                del.addBatch()
              } else {
                colIdx.foreach { case (c, i) =>
                  up.setObject(i + 1, r.get(allCols.indexOf(c)))
                }
                up.addBatch()
              }
            }
            up.executeBatch(); del.executeBatch(); conn.commit()
          } finally conn.close()
        }
      }
    }
  }

  /** K1/K2: Kafka keyed-JSON sink options (producer.py:10-13 semantics:
    * acks=all, flush per batch). Use with a `key`/`value` DataFrame from
    * [[graft.cdc.CdcWire.toWire]] when the connector jar is present.
    */
  def kafkaSinkOptions(servers: String, topic: String): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> servers,
    "topic" -> topic,
    "kafka.acks" -> "all")
}
