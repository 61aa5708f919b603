package graft

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.Sinks.JdbcUpsert

/** JdbcUpsert against a recording fake `java.sql.Connection` — asserts
  * the generated SQL text and the per-row action dispatch (the
  * reference consumer's apply path, consumer.py:60-91) without a
  * database. In particular: statements run in ROW order, so
  * delete-then-reinsert of a key within one batch leaves the row
  * present.
  */
class JdbcUpsertSpec extends AnyFunSuite {

  /** Records `prepare:`, `addBatch:`, `exec:`, `commit` events. */
  private class Recorder {
    val events = scala.collection.mutable.ArrayBuffer[String]()

    private def proxyFor(ifaces: Array[Class[_]], h: (String, Seq[AnyRef]) => AnyRef): AnyRef =
      Proxy.newProxyInstance(getClass.getClassLoader, ifaces, new InvocationHandler {
        def invoke(p: AnyRef, m: Method, args: Array[AnyRef]): AnyRef =
          h(m.getName, Option(args).map(_.toSeq).getOrElse(Nil))
      })

    private def statement(tag: String): java.sql.PreparedStatement = {
      val params = scala.collection.mutable.ArrayBuffer[AnyRef]()
      proxyFor(Array(classOf[java.sql.PreparedStatement]), {
        case ("setObject", Seq(_, v)) => params += v; null
        case ("addBatch", _) =>
          events += s"addBatch:$tag(${params.mkString(",")})"; params.clear(); null
        case ("executeBatch", _) => events += s"exec:$tag"; Array.empty[Int]
        case ("toString", _) => s"stmt:$tag"
        case _ => null
      }).asInstanceOf[java.sql.PreparedStatement]
    }

    val connection: java.sql.Connection =
      proxyFor(Array(classOf[java.sql.Connection]), {
        case ("prepareStatement", Seq(sql: String)) =>
          events += s"prepare:$sql"
          statement(if (sql.startsWith("DELETE")) "del" else "up")
        case ("commit", _) => events += "commit"; null
        case _ => null
      }).asInstanceOf[java.sql.Connection]
  }

  private val sink = JdbcUpsert("jdbc:fake", "employees", Seq("emp_id"))
  private val cols = Seq("emp_id", "name", "action")

  test("generated SQL matches the reference's upsert/delete statements") {
    assert(sink.upsertSql(Seq("emp_id", "name")) ===
      "INSERT INTO employees (emp_id, name) VALUES (?, ?) " +
        "ON CONFLICT (emp_id) DO UPDATE SET name = EXCLUDED.name")
    assert(sink.deleteSql === "DELETE FROM employees WHERE emp_id = ?")
  }

  test("statements execute in row order: delete then re-insert survives") {
    val rec = new Recorder
    sink.applyRows(rec.connection, cols, "action", Iterator(
      Row(1, "ann", "insert"),
      Row(2, "bob", "update"),
      Row(1, null, "delete"),
      Row(1, "ann2", "insert")))
    assert(rec.events.toSeq === Seq(
      s"prepare:${sink.upsertSql(Seq("emp_id", "name"))}",
      s"prepare:${sink.deleteSql}",
      "addBatch:up(1,ann)",
      "addBatch:up(2,bob)",
      "exec:up",          // flushed before the kind switches
      "addBatch:del(1)",
      "exec:del",
      "addBatch:up(1,ann2)",
      "exec:up",          // 1 is re-inserted AFTER its delete
      "commit"))
  }

  test("unknown actions are silently skipped (reference fall-through)") {
    val rec = new Recorder
    sink.applyRows(rec.connection, cols, "action", Iterator(
      Row(1, "ann", "insert"),
      Row(2, "eve", "truncate"),
      Row(3, "kim", "UPDATE"))) // case-insensitive dispatch
    assert(rec.events.count(_.startsWith("addBatch")) === 2)
    assert(rec.events.toSeq.containsSlice(Seq(
      "addBatch:up(1,ann)", "addBatch:up(3,kim)", "exec:up", "commit")))
  }

  test("delete-only batch flushes the delete batch once") {
    val rec = new Recorder
    sink.applyRows(rec.connection, cols, "action", Iterator(
      Row(7, null, "delete"), Row(8, null, "DELETE")))
    assert(rec.events.filter(_.startsWith("exec")) === Seq("exec:del"))
    assert(rec.events.last === "commit")
  }
}
