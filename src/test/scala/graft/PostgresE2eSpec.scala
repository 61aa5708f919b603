package graft

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.nio.file.{Files, Path}
import java.sql.Timestamp
import scala.sys.process._
import org.apache.spark.sql.functions._
import graft.cdc._
import graft.sinks.Sinks.JdbcUpsert

/** REAL-Postgres end-to-end of the destination upsert path: the
  * reference DAG's 7-mutation scenario (airflow_dags/project2_dag.py:
  * 99-135) applied through [[JdbcUpsert.applyRows]] — the actual
  * batching/ordering/commit code — against a live `postgres` server,
  * asserting the reference end state: destination = exactly the Emma
  * Wood row, DLQ = 3 events (consumer.py:60-91 semantics).
  *
  * The sandbox has Postgres server binaries but no JDBC driver jar, so
  * the ONLY faked layer is the JDBC transport: a `java.sql.Connection`
  * proxy renders each bound statement to literal SQL and pipes the
  * whole transaction through `psql` at commit. Everything the sink
  * generates — `INSERT … ON CONFLICT (k) DO UPDATE SET c = EXCLUDED.c`,
  * `DELETE WHERE k = ?`, the flush-before-action-switch ordering — is
  * parsed, planned, and executed by a real Postgres 15.
  *
  * GATED: cancels (does not fail) when the environment can't host a
  * server (no binaries, or no unprivileged user to run it as — the
  * JVM runs as root and Postgres refuses root).
  */
class PostgresE2eSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------- harness

  private val pgBin = Seq("/usr/lib/postgresql/15/bin", "/usr/lib/postgresql/16/bin",
    "/usr/local/pgsql/bin").find(d => Files.exists(Path.of(d, "initdb")))

  /** Run a shell command as the unprivileged `postgres` user when we
    * are root (Postgres refuses root), directly otherwise. Returns
    * (exit code, stdout, stderr) — stderr stays separate because `su`
    * warns about the cwd it can't enter, which must not pollute query
    * results. */
  private def runAs(cmd: String): (Int, String, String) = {
    val full =
      if (System.getProperty("user.name") == "root")
        Seq("su", "-s", "/bin/bash", "postgres", "-c", s"cd /tmp && $cmd")
      else Seq("/bin/bash", "-c", cmd)
    val out = new StringBuilder
    val err = new StringBuilder
    val code = Process(full).!(ProcessLogger(l => out.append(l).append('\n'),
      l => err.append(l).append('\n')))
    (code, out.toString, err.toString)
  }

  private def canRun: Boolean =
    pgBin.isDefined && runAs("true")._1 == 0

  /** initdb + start on a private unix socket (no TCP), yield psql
    * runner + stop handle. */
  private class PgServer {
    val base: Path = Files.createTempDirectory("graft-pg")
    private val data = base.resolve("data")
    private val sock = Files.createDirectory(base.resolve("sock"))
    // the postgres user must own what the server writes
    if (System.getProperty("user.name") == "root")
      Process(Seq("chown", "-R", "postgres:postgres", base.toString)).!

    private val bin = pgBin.get
    require(runAs(s"$bin/initdb -D $data -U graft -A trust --no-sync")._1 == 0,
      "initdb failed")
    require(runAs(s"$bin/pg_ctl -D $data -w -l $base/pg.log " +
      s"""-o "-k $sock -c listen_addresses='' -p 5999" start""")._1 == 0,
      "pg_ctl start failed")

    /** Execute SQL from a file through psql; returns stdout rows
      * (tuples-only, | separated). Throws on SQL error. */
    def psqlFile(sqlFile: Path): Seq[String] = {
      val (code, out, err) = runAs(
        s"psql -h $sock -p 5999 -U graft -d postgres -v ON_ERROR_STOP=1 -At -f $sqlFile")
      if (code != 0) throw new IllegalStateException(s"psql failed:\n$out\n$err")
      out.linesIterator.filter(_.nonEmpty).toSeq
    }

    def psql(sql: String): Seq[String] = {
      val f = Files.createTempFile(base, "q", ".sql")
      Files.writeString(f, sql)
      Process(Seq("chmod", "644", f.toString)).!
      try psqlFile(f) finally Files.delete(f)
    }

    def stop(): Unit = {
      runAs(s"$bin/pg_ctl -D $data -m immediate stop")
      Process(Seq("rm", "-rf", base.toString)).!
    }
  }

  // ---------------------------------- psql-backed java.sql.Connection

  /** Renders a bound value as a Postgres literal. */
  private def pgLit(v: AnyRef): String = v match {
    case null => "NULL"
    case n: java.lang.Number => n.toString
    case other => "'" + other.toString.replace("'", "''") + "'"
  }

  /** The transport fake: PreparedStatements substitute bound params
    * into their SQL text; executeBatch moves the rendered statements
    * (in batch order) into the transaction script; commit() runs the
    * script through psql inside BEGIN/COMMIT. Statement ORDER is
    * exactly the order applyRows executes — what the e2e is pinning. */
  private class PsqlConnection(server: PgServer) {
    private val script = scala.collection.mutable.ArrayBuffer[String]()

    private def statement(sql: String): java.sql.PreparedStatement = {
      val params = scala.collection.mutable.ArrayBuffer[(Int, AnyRef)]()
      val batch = scala.collection.mutable.ArrayBuffer[String]()
      def render(): String = {
        val parts = sql.split("\\?", -1)
        val vals = params.sortBy(_._1).map(p => pgLit(p._2))
        require(vals.size == parts.length - 1, s"arity mismatch in: $sql")
        parts.zipAll(vals.map(Some(_)), "", None)
          .map { case (s, v) => s + v.getOrElse("") }.mkString + ";"
      }
      Proxy.newProxyInstance(getClass.getClassLoader,
        Array(classOf[java.sql.PreparedStatement]), new InvocationHandler {
          def invoke(p: AnyRef, m: Method, args: Array[AnyRef]): AnyRef =
            (m.getName, Option(args).map(_.toSeq).getOrElse(Nil)) match {
              case ("setObject", Seq(i: Integer, v)) => params += ((i.toInt, v)); null
              case ("addBatch", _) => batch += render(); params.clear(); null
              case ("executeBatch", _) =>
                script ++= batch; batch.clear(); Array.empty[Int]
              case _ => null
            }
        }).asInstanceOf[java.sql.PreparedStatement]
    }

    val connection: java.sql.Connection =
      Proxy.newProxyInstance(getClass.getClassLoader,
        Array(classOf[java.sql.Connection]), new InvocationHandler {
          def invoke(p: AnyRef, m: Method, args: Array[AnyRef]): AnyRef =
            (m.getName, Option(args).map(_.toSeq).getOrElse(Nil)) match {
              case ("prepareStatement", Seq(sql: String)) => statement(sql)
              case ("commit", _) =>
                server.psql(("BEGIN;" +: script.toSeq :+ "COMMIT;").mkString("\n"))
                script.clear(); null
              case _ => null
            }
        }).asInstanceOf[java.sql.Connection]
  }

  // ----------------------------------------------------------- golden

  private def ts(i: Int) = Timestamp.valueOf(f"2024-01-01 00:00:0$i")

  private lazy val golden = Seq(
    CdcEvent(0, 1L, "Alice", "Johnson", "2012-04-10", "San Francisco", 80000L, "insert", ts(1)),
    CdcEvent(0, 2L, "Emma", "Wood", "2015-07-01", "Boston", 72000L, "insert", ts(2)),
    CdcEvent(0, 3L, "Too", "Low", "2000-01-01", "LA", 50L, "insert", ts(3)),
    CdcEvent(0, 4L, "Too", "Old", "1900-01-01", "San Jose", 50000L, "insert", ts(4)),
    CdcEvent(0, -100L, "Wrong", "ID", "2000-01-01", "Chicago", 45000L, "insert", ts(5)),
    CdcEvent(0, 1L, "Alice", "Johnson", "2012-04-10", "San Francisco", 75000L, "update", ts(6)),
    CdcEvent(0, 1L, "Alice", "Johnson", "2012-04-10", "San Francisco", 75000L, "delete", ts(7))
  ).toDF()

  private val cols = Seq("emp_id", "emp_FN", "emp_LN", "emp_dob", "emp_city",
    "emp_salary", "last_updated_at", "action")

  test("reference DAG scenario against a live Postgres: dest={Emma Wood}, DLQ=3") {
    assume(canRun, "no runnable Postgres in this environment")
    val server = new PgServer
    try {
      // reference destination DDL (project2_dag.py:77-92), our column names
      server.psql(
        """CREATE TABLE employees (
          |  emp_id BIGINT PRIMARY KEY, emp_fn TEXT, emp_ln TEXT,
          |  emp_dob TEXT, emp_city TEXT, emp_salary BIGINT,
          |  last_updated_at TIMESTAMP);
          |CREATE TABLE dlq (LIKE employees INCLUDING ALL);""".stripMargin)

      val split = Routing.validateSplit(golden)
      // sequential in-order apply, the reference consumer's semantics;
      // the 7-event scenario is driver-sized by construction
      val validRows = split.valid.orderBy("last_updated_at")
        .select(cols.map(col): _*).collect()
      val dlqRows = split.invalid.orderBy("last_updated_at")
        .select(cols.map(col): _*).collect()

      val dest = JdbcUpsert("jdbc:via-psql", "employees", Seq("emp_id"))
      dest.applyRows(new PsqlConnection(server).connection, cols, "action",
        validRows.iterator)
      val dlq = JdbcUpsert("jdbc:via-psql", "dlq", Seq("emp_id"))
      dlq.applyRows(new PsqlConnection(server).connection, cols, "action",
        dlqRows.iterator)

      // the reference end state: insert+update+delete of Alice nets to
      // nothing, Emma survives, the 3 invalid events landed in the DLQ
      assert(server.psql(
        "SELECT emp_id, emp_fn, emp_ln, emp_salary FROM employees ORDER BY emp_id")
        === Seq("2|Emma|Wood|72000"))
      assert(server.psql("SELECT count(*) FROM dlq") === Seq("3"))
      assert(server.psql("SELECT emp_id FROM dlq ORDER BY emp_id")
        === Seq("-100", "3", "4"))

      // and the upsert path really updates on conflict: re-apply Emma
      // with a new salary through the same sink
      val bump = golden.where(col("emp_id") === 2L)
        .withColumn("emp_salary", lit(99000L))
        .select(cols.map(col): _*).collect()
      dest.applyRows(new PsqlConnection(server).connection, cols, "action",
        bump.iterator)
      assert(server.psql("SELECT emp_salary FROM employees WHERE emp_id = 2")
        === Seq("99000"))
    } finally server.stop()
  }
}
