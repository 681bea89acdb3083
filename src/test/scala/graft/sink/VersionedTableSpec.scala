package graft.sink

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VersionedTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshPath(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-vtable-spec")
    java.nio.file.Files.delete(d)
    d.toString
  }

  test("commits version, time-travel read pins old snapshots") {
    val path = freshPath()
    val v0 = VersionedTable.commit(spark, path,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), append = false)
    assert(v0 === 0L)
    val v1 = VersionedTable.commit(spark, path,
      Seq((3L, "c")).toDF("k", "v"), append = true)
    assert(v1 === 1L)
    val v2 = VersionedTable.commit(spark, path,
      Seq((9L, "z")).toDF("k", "v"), append = false) // full replacement
    assert(v2 === 2L)
    assert(VersionedTable.versions(spark, path) === Seq(0L, 1L, 2L))
    // latest = replacement only
    assert(VersionedTable.read(spark, path).as[(Long, String)]
      .collect().toSet === Set((9L, "z")))
    // pinned v1 = v0 ∪ append — unaffected by the later replacement
    assert(VersionedTable.read(spark, path, Some(1L)).as[(Long, String)]
      .collect().toSet === Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(VersionedTable.read(spark, path, Some(0L)).as[(Long, String)]
      .collect().toSet === Set((1L, "a"), (2L, "b")))
    // a missing version names what exists
    val e = intercept[IllegalArgumentException] {
      VersionedTable.read(spark, path, Some(7L))
    }
    assert(e.getMessage.contains("version 7"))
  }

  test("append commits write only the delta; files are shared across manifests") {
    val path = freshPath()
    VersionedTable.commit(spark, path,
      spark.range(0, 1000).toDF("id"), append = false)
    VersionedTable.commit(spark, path,
      spark.range(1000, 1010).toDF("id"), append = true)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // delta commit dir holds only the 10 new rows' files, v0's data is reused
    val c1Files = fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/data/c1"))
      .count(_.getPath.getName.endsWith(".parquet"))
    assert(c1Files >= 1)
    assert(VersionedTable.read(spark, path).count() === 1010L)
    assert(VersionedTable.read(spark, path, Some(0L)).count() === 1000L)
  }

  test("commitCdc merges onto latest; old version still replays pre-merge state") {
    val path = freshPath()
    val base = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "price")
    VersionedTable.commit(spark, path, base, append = false)
    val cdc = Seq(
      (2L, 25.0, 1L, "U"), // update
      (3L, 30.0, 1L, "D"), // delete
      (4L, 40.0, 1L, "I")  // insert
    ).toDF("k", "price", "seq", "op")
    VersionedTable.commitCdc(spark, path, cdc, Seq("k"), "seq", "op")
    assert(VersionedTable.read(spark, path).as[(Long, Double)]
      .collect().toSet === Set((1L, 10.0), (2L, 25.0), (4L, 40.0)))
    assert(VersionedTable.read(spark, path, Some(0L)).as[(Long, Double)]
      .collect().toSet === Set((1L, 10.0), (2L, 20.0), (3L, 30.0)))
  }

  test("vacuum drops unreferenced files and old manifests but keeps live reads") {
    val path = freshPath()
    VersionedTable.commit(spark, path, Seq((1L, "a")).toDF("k", "v"), append = false)
    VersionedTable.commit(spark, path, Seq((2L, "b")).toDF("k", "v"), append = false)
    VersionedTable.commit(spark, path, Seq((3L, "c")).toDF("k", "v"), append = true)
    VersionedTable.vacuum(spark, path, keepVersions = 2)
    assert(VersionedTable.versions(spark, path) === Seq(1L, 2L))
    // v0's data dir (unreferenced after the v1 replacement) is gone
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/data/c0")))
    // surviving versions still read
    assert(VersionedTable.read(spark, path, Some(1L)).count() === 1L)
    assert(VersionedTable.read(spark, path, Some(2L)).as[(Long, String)]
      .collect().toSet === Set((2L, "b"), (3L, "c")))
  }

  test("reads stay plan-clean: pushdown and pruning reach the pinned files") {
    val path = freshPath()
    VersionedTable.commit(spark, path,
      spark.range(0, 10000).select($"id", ($"id" % 50).as("bucket"),
        concat(lit("pad_"), $"id").as("payload")), append = false)
    val plan = VersionedTable.read(spark, path)
      .filter($"bucket" === 7).select($"id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(bucket), EqualTo(bucket,7)]"),
      s"filter not pushed:\n$plan")
    assert(plan.contains("ReadSchema: struct<id:bigint,bucket:bigint>"),
      s"columns not pruned:\n$plan")
  }
}
