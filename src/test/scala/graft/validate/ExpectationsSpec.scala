package graft.validate

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private val frame = Seq(
    (Some(1L), Some(10L), "A", "ok@x.com"),
    (Some(2L), Some(99L), "B", "bad-email"),   // range + set violations
    (None, Some(5L), "A", "n@x.com"),          // null id
    (Some(2L), None, "C", "m@x.com"),          // dup id, null qty, bad flag
    (Some(4L), Some(20L), "A", "p@x.com"))
    .toDF("id", "qty", "flag", "email")

  test("row rules: one pass, unevaluable nulls count as violations") {
    val out = Expectations.checkRows(frame, Seq(
        Expectations.notNull("id"),
        Expectations.inRange("qty", 1L, 50L),
        Expectations.inSet("flag", Seq("A", "B")),
        Expectations.matches("email", "^[^@]+@[^@]+$")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("not_null:id") == ((1L, 5L)))
    // qty 99 out of range AND the null qty is unevaluable -> both count
    assert(out("in_range:qty") == ((2L, 5L)))
    assert(out("in_set:flag") == ((1L, 5L)))
    assert(out("matches:email") == ((1L, 5L)))
  }

  test("uniqueness counts excess rows; clean keys score zero") {
    val dup = Expectations.checkUnique(frame, Seq("id")).head()
    // id=2 twice -> 1 excess row (the two NULL/None ids group together
    // in groupBy but null==null grouping: None appears once, no excess)
    assert(dup.getString(0) == "unique:id")
    assert(dup.getLong(1) == 1L && dup.getLong(2) == 5L)
    val clean = Expectations.checkUnique(
      frame.withColumn("rid", monotonically_increasing_id()), Seq("rid")).head()
    assert(clean.getLong(1) == 0L)
  }

  test("foreign key: orphans counted, null keys exempt") {
    val dim = Seq(1L, 2L).toDF("pk")
    val r = Expectations.checkForeignKey(frame, "id", dim, "pk").head()
    assert(r.getString(0) == "fk:id->pk")
    // id=4 orphaned (1 row); the null id is exempt; ids 1,2,2 resolve
    assert(r.getLong(1) == 1L && r.getLong(2) == 5L)
  }

  test("audit composes all three shapes; empty rule set refuses") {
    val dim = Seq(1L, 2L, 4L).toDF("pk")
    val out = Expectations.audit(frame,
      rules = Seq(Expectations.notNull("id")),
      uniqueKeys = Seq(Seq("id")),
      foreignKeys = Seq(("id", dim, "pk"))).collect()
    assert(out.length == 3)
    assert(out.map(_.getString(0)).sorted.toSeq ==
      Seq("fk:id->pk", "not_null:id", "unique:id"))
    intercept[IllegalArgumentException] {
      Expectations.audit(frame, Nil)
    }
    intercept[IllegalArgumentException] {
      Expectations.checkRows(frame,
        Seq(Expectations.notNull("id"), Expectations.notNull("id")))
    }
  }

  test("empty input: zero rows, zero violations, no nulls in output") {
    val empty = frame.filter(lit(false))
    val rows = Expectations.checkRows(empty,
      Seq(Expectations.notNull("id"))).head()
    assert(rows.getLong(1) == 0L && rows.getLong(2) == 0L)
    val uniq = Expectations.checkUnique(empty, Seq("id")).head()
    assert(uniq.getLong(1) == 0L && uniq.getLong(2) == 0L)
  }
}
