package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ops.ZOrder

/** Z-order layout: bit interleave correctness, and the actual skip
  * ratio a manifest-driven planner gets from a written z-clustered
  * layout versus an unclustered one. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits (a even positions, b odd)") {
    // a=5 (101), b=3 (011): bits a0@0, b0@1, a1@2, b1@3, a2@4, b2@5
    // = 1 + 2 + 0 + 8 + 16 + 0 = 27
    val got = Seq((5L, 3L)).toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b"), 3).as("z"))
      .as[Long].head()
    assert(got === 27L)
    // SQL mirror agrees
    val viaSql = spark.sql(s"SELECT ${ZOrder.zValueSql("5", "3", 3)} AS z")
    assert(viaSql.as[Long].head() === 27L)
  }

  test("zValueN interleaves three dims round-robin") {
    // a=1 (bit0), b=1 (bit0), c=1 (bit0), k=3: positions 0,1,2 -> 7
    val df = Seq((1L, 1L, 1L)).toDF("a", "b", "c")
    val z3 = df.select(ZOrder.zValueN(Seq(col("a"), col("b"), col("c")), 2).as("z"))
      .as[Long].head()
    assert(z3 === 7L)
    // a=2 (bit1 at pos 1*3+0=3), b=0, c=1 (bit0 at pos 2) -> 8 + 4 = 12
    val z4 = Seq((2L, 0L, 1L)).toDF("a", "b", "c")
      .select(ZOrder.zValueN(Seq(col("a"), col("b"), col("c")), 2).as("z"))
      .as[Long].head()
    assert(z4 === 12L)
    // SQL mirror agrees on a mixed case
    val viaSql = spark.sql(
      s"SELECT ${ZOrder.zValueNSql(Seq("2", "0", "1"), 2)} AS z")
    assert(viaSql.as[Long].head() === 12L)
    // 2-d zValue is the k=2 special case of zValueN
    val a = Seq((5L, 3L)).toDF("a", "b")
    val viaN = a.select(ZOrder.zValueN(Seq(col("a"), col("b")), 3).as("z")).as[Long].head()
    assert(viaN === 27L)
  }

  test("z layout confines a 2-d box to few files; unclustered layout reads all") {
    val base = Files.createTempDirectory("graft-zorder")
    val zdir = base.resolve("z").toString
    val rdir = base.resolve("r").toString
    try {
      val ev = Tables.events(spark, "/root/testdata/sf0.001")
        .select(hour(col("ts")).cast("long").as("h"),
          pmod(col("user_id"), lit(256)).cast("long").as("u"))
      ZOrder.layout(ev, col("h"), col("u"), 16, 8).write.parquet(zdir)
      ev.repartition(16).write.parquet(rdir)

      val dims = Seq("h", "u")
      val zman = ZOrder.manifest(spark.read.parquet(zdir), dims).cache()
      val rman = ZOrder.manifest(spark.read.parquet(rdir), dims).cache()
      // sf0.001 ranges: h in 0..23, u = user_id in 0..14 — a quarter-
      // by-quarter box
      val box = Map("h" -> (4L, 7L), "u" -> (4L, 7L))
      val (zTotal, rTotal) = (zman.count(), rman.count())
      val zHit = ZOrder.filesForBox(zman, box).count()
      val rHit = ZOrder.filesForBox(rman, box).count()
      // unclustered: rows are spread uniformly, every file's box spans
      // the whole space; z-clustered: the box touches a small fraction
      assert(rHit >= rTotal - 1, s"unclustered should read ~all: $rHit/$rTotal")
      assert(zHit * 2 <= zTotal, s"z layout should skip >=half: $zHit/$zTotal")

      // pruning is CORRECT: scanning only the manifest-selected files
      // returns exactly the box's rows
      val files = ZOrder.filesForBox(zman, box)
        .select("_file").as[String].collect().toSeq
      val pred = col("h").between(4, 7) && col("u").between(4, 7)
      val pruned = spark.read.parquet(files: _*).where(pred).count()
      val full = spark.read.parquet(zdir).where(pred).count()
      assert(pruned === full && full > 0)
      zman.unpersist(); rman.unpersist()
    } finally {
      import scala.reflect.io.Directory
      new Directory(base.toFile).deleteRecursively()
    }
  }
}
