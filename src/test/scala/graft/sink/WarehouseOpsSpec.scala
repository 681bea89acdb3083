package graft.sink

import org.apache.spark.sql.functions._
import graft.SparkSpec

class WarehouseOpsSpec extends SparkSpec {

  test("upsertLatest keeps the winning row per key across batches") {
    import spark.implicits._
    val existing = Seq(
      ("C1", "2024-01-01", "v1"), ("C2", "2024-02-01", "v1"),
    ).toDF("CUST_I", "CONSUL_DT", "payload")
      .withColumn("CONSUL_DT", col("CONSUL_DT").cast("date"))
    val updates = Seq(
      ("C1", "2024-03-01", "v2"), // newer → replaces
      ("C2", "2023-12-01", "v2"), // older → ignored
      ("C3", "2024-04-01", "v2"), // new key → inserted
    ).toDF("CUST_I", "CONSUL_DT", "payload")
      .withColumn("CONSUL_DT", col("CONSUL_DT").cast("date"))
    val merged = Warehouse.upsertLatest(existing, updates, Seq("CUST_I"),
      Seq(col("CONSUL_DT").desc_nulls_last, col("payload").desc))
      .orderBy("CUST_I").collect()
    assert(merged.map(r => (r.getString(0), r.getString(2))).toSeq ==
      Seq(("C1", "v2"), ("C2", "v1"), ("C3", "v2")))
  }

  test("scdType2 collapses runs, reopens on change-back, null attr is a value") {
    import spark.implicits._
    // key A: gold, gold, silver, gold  -> 3 versions (re-observation of
    //   gold at t2 extends the first run; the t4 gold REOPENS a new one)
    // key B: null, null, bronze        -> 2 versions (null run is real)
    val hist = Seq(
      ("A", Some("gold"), "2024-01-01", 1L),
      ("A", Some("gold"), "2024-02-01", 2L),
      ("A", Some("silver"), "2024-03-01", 3L),
      ("A", Some("gold"), "2024-04-01", 4L),
      ("B", None, "2024-01-15", 5L),
      ("B", None, "2024-02-15", 6L),
      ("B", Some("bronze"), "2024-03-15", 7L),
    ).toDF("k", "tier", "ts", "seq")
      .withColumn("ts", col("ts").cast("date"))
    val out = Warehouse.scdType2(hist, "k", Seq("tier"), "ts", Seq("seq"))
      .orderBy(col("k"), col("valid_from"))
      .collect()
      .map(r => (r.getString(0), Option(r.getString(1)),
        r.getDate(2).toString, Option(r.getDate(3)).map(_.toString),
        r.getBoolean(4)))
    assert(out.toSeq === Seq(
      ("A", Some("gold"), "2024-01-01", Some("2024-03-01"), false),
      ("A", Some("silver"), "2024-03-01", Some("2024-04-01"), false),
      ("A", Some("gold"), "2024-04-01", None, true),
      ("B", None, "2024-01-15", Some("2024-03-15"), false),
      ("B", Some("bronze"), "2024-03-15", None, true)))
  }

  test("scdType2 same-day tie breaks on the tie column, intervals stay chained") {
    import spark.implicits._
    val hist = Seq(
      ("C", "x", "2024-01-01", 2L), // same day: seq orders x before y? no - 2 > 1
      ("C", "y", "2024-01-01", 1L),
      ("C", "x", "2024-02-01", 3L),
    ).toDF("k", "v", "ts", "seq").withColumn("ts", col("ts").cast("date"))
    val out = Warehouse.scdType2(hist, "k", Seq("v"), "ts", Seq("seq"))
      .orderBy(col("valid_from"), col("valid_to").asc_nulls_last).collect()
      .map(r => (r.getString(1), Option(r.getDate(3)).map(_.toString), r.getBoolean(4)))
    // order: y(seq1), x(seq2) -> runs y, x; then x at 02-01 EXTENDS the x run
    assert(out.toSeq === Seq(
      ("y", Some("2024-01-01"), false),
      ("x", None, true)))
  }

  test("applyCdc: upsert/insert/delete, latest op per key wins, passthrough") {
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("k", "v")
    val cdc = Seq(
      (1L, "a2", 1L, "U"),  // plain overwrite
      (2L, "x", 1L, "U"),   // overwritten then deleted → latest wins
      (2L, "b", 2L, "D"),
      (3L, "y", 2L, "D"),   // deleted then re-upserted later → U wins
      (3L, "c3", 3L, "U"),
      (9L, "new", 1L, "I"), // brand-new key
      (5L, "e1", 1L, "U"),  // same-seq malformed tie: U beats D lexically
      (5L, "e2", 1L, "D")
    ).toDF("k", "v", "seq", "op")
    val got = Warehouse.applyCdc(base, cdc, Seq("k"), "seq", "op")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // 4 passes through untouched; 2 deleted; 3 re-upserted; 5 not in base,
    // tie resolves to U so its row lands
    assert(got == Map(1L -> "a2", 3L -> "c3", 4L -> "d", 9L -> "new", 5L -> "e1"))
    // a cdc batch missing a base column fails fast, not silently
    val e = intercept[IllegalArgumentException] {
      Warehouse.applyCdc(base, cdc.drop("v"), Seq("k"), "seq", "op")
    }
    assert(e.getMessage.contains("missing v"))
    // a NULL or unknown op is malformed-feed data loss waiting to happen
    // (NULL predicate drops the survivor while the anti-join removes the
    // base row) — it must throw, not silently delete
    val badOp = Seq((1L, "z", 5L, "X")).toDF("k", "v", "seq", "op")
    val e2 = intercept[Exception] {
      Warehouse.applyCdc(base, badOp, Seq("k"), "seq", "op").collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + msgs(t.getCause)
    assert(msgs(e2).contains("invalid op 'X'"))
  }

  test("applyCdc ≡ sequential reference on 40 random op streams") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    for (trial <- 1 to 40) {
      val baseKeys = (0L until 20L).filter(_ => rnd.nextBoolean())
      val base = baseKeys.map(k => (k, s"base$k")).toDF("k", "v")
      val nOps = 1 + rnd.nextInt(30)
      // unique (key, seq) pairs: a well-formed feed never repeats a seq per
      // key (the malformed tie case has its own deterministic-order test)
      val ops = rnd.shuffle(
        (for { k <- 0L until 25L; s <- 1L to 4L } yield (k, s)).toSeq)
        .take(nOps)
        .map { case (k, s) =>
          (k, s"v${k}_$s", s, Seq("I", "U", "D")(rnd.nextInt(3)))
        }
      val got = Warehouse.applyCdc(base,
          ops.toDF("k", "v", "seq", "op"), Seq("k"), "seq", "op")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      // reference: fold the final (max-seq) op per key over a map
      val ref = scala.collection.mutable.Map(baseKeys.map(k => k -> s"base$k"): _*)
      ops.groupBy(_._1).foreach { case (k, kOps) =>
        val (_, v, _, op) = kOps.maxBy(o => (o._3, o._4))
        if (op == "D") ref.remove(k) else ref(k) = v
      }
      assert(got == ref.toMap, s"trial $trial: ops=$ops base=$baseKeys")
    }
  }

  test("snapshotDiff labels added/removed/changed, drops unchanged, null-safe") {
    import spark.implicits._
    val before = Seq(
      (1L, Option("a"), Option(10.0)),  // unchanged
      (2L, Option("b"), Option(20.0)),  // changed value
      (3L, Option("c"), Option(30.0)),  // removed
      (4L, None: Option[String], Option(40.0)),  // null attr unchanged
      (5L, Option("e"), None: Option[Double])    // null -> value = changed
    ).toDF("k", "attr", "v")
    val after = Seq(
      (1L, Option("a"), Option(10.0)),
      (2L, Option("b"), Option(21.0)),
      (4L, None: Option[String], Option(40.0)),
      (5L, Option("e"), Option(5.5)),
      (6L, Option("f"), Option(60.0))   // added
    ).toDF("k", "attr", "v")
    val got = Warehouse.snapshotDiff(before, after, Seq("k"), Seq("attr", "v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(2L -> "changed", 3L -> "removed",
      5L -> "changed", 6L -> "added"))
  }

  test("compact rewrites many small files into few") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString + "/t"
    spark.range(10000).repartition(50).write.parquet(dir)
    def parts = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parts == 50)
    Warehouse.compact(spark, dir, targetMB = 256)
    assert(parts == 1)
    assert(spark.read.parquet(dir).count() == 10000)
  }

  test("writeBucketed overwrite resolves the managed location via the catalog") {
    import spark.implicits._
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_wb_db")
    try {
      // db-qualified, mixed-case name, non-default database: the overwrite
      // path must drop the right catalog entry and clear the right
      // directory (metastore-lowercased, under the DB location) — twice in
      // a row, which is exactly what a crashed-then-rerun JVM exercises
      val df1 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      Warehouse.writeBucketed(df1, "graft_wb_db.MixedCase", Seq("k"), numBuckets = 2)
      assert(spark.table("graft_wb_db.MixedCase").count() == 2)
      val df2 = Seq((3L, "c")).toDF("k", "v")
      Warehouse.writeBucketed(df2, "graft_wb_db.MixedCase", Seq("k"), numBuckets = 2)
      val got = spark.table("graft_wb_db.MixedCase").collect()
      assert(got.length == 1 && got.head.getLong(0) == 3L,
        "overwrite must replace, not append or collide with the old location")
      // and an unparseable identifier fails fast instead of deleting wrong dirs
      intercept[IllegalArgumentException] {
        Warehouse.writeBucketed(df2, "a.b.c", Seq("k"))
      }
    } finally spark.sql("DROP DATABASE IF EXISTS graft_wb_db CASCADE")
  }

  test("stream upsert: multi-batch merge equals batch dedup, replay is idempotent") {
    import graft.streaming.StreamingIngest
    val tmp = java.nio.file.Files.createTempDirectory("graft-supsert").toString
    val (src, tbl) = (s"$tmp/src", s"$tmp/table")
    try {
      val events = spark.read.parquet(s"${testDataDir()}/events.parquet")
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      events.repartition(3).write.parquet(src)
      val keys = Seq("user_id")
      val ord = Seq(col("ts").desc, col("event_id").desc)
      val got = StreamingIngest.runStreamUpsertBounded(spark, src, tbl, keys, ord,
        maxFilesPerTrigger = 1)
        .orderBy("user_id").collect().map(_.toSeq).toSeq
      // batch reference over the SAME normalized frame the stream sees
      val all0 = spark.read.parquet(src)
      val all = all0.withColumn("ts", graft.functions.EventTime.timestamp(all0))
      val want = graft.sink.Warehouse.upsertLatest(all.limit(0), all, keys, ord)
        .orderBy("user_id").collect().map(_.toSeq).toSeq
      assert(got === want, "multi-batch stream upsert diverged from batch dedup")
      assert(got.nonEmpty)
      // replay from scratch into the EXISTING table (fresh checkpoint →
      // every batch re-delivered): latest-wins is idempotent, so the
      // table must not change — the exactly-once-by-idempotence claim
      val again = StreamingIngest.runStreamUpsertBounded(spark, src, tbl, keys, ord,
        maxFilesPerTrigger = 1)
        .orderBy("user_id").collect().map(_.toSeq).toSeq
      assert(again === want, "replaying every batch must leave the table unchanged")
    } finally org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(tmp))
  }

  test("stream upsert self-heals crash leftovers without losing pre-crash history") {
    import graft.streaming.StreamingIngest
    val tmp = java.nio.file.Files.createTempDirectory("graft-supsert-crash").toString
    val (src, tbl) = (s"$tmp/src", s"$tmp/table")
    try {
      val events0 = spark.read.parquet(s"${testDataDir()}/events.parquet")
      val events = events0
        .select(col("user_id"), col("event_id"),
          graft.functions.EventTime.timestamp(events0).as("ts"), col("value"))
      val (old, fresh) = (events.filter(col("event_id") % 2 === 0),
        events.filter(col("event_id") % 2 =!= 0))
      fresh.write.parquet(src)
      // simulate the worst crash point of a DEAD writer: the swap moved
      // the table aside (tbl missing, __old holds all history) and left a
      // partial __upserting — both tagged with a pid that no longer exists
      var dp = 4000000L
      while (ProcessHandle.of(dp).isPresent) dp -= 1
      old.write.parquet(s"${tbl}__old_p$dp")
      old.limit(3).write.parquet(s"${tbl}__upserting_p$dp")
      val keys = Seq("user_id")
      val ord = Seq(col("ts").desc, col("event_id").desc)
      val got = StreamingIngest.runStreamUpsertBounded(spark, src, tbl, keys, ord)
        .orderBy("user_id").collect().map(_.toSeq).toSeq
      val want = graft.sink.Warehouse.upsertLatest(old, fresh, keys, ord)
        .orderBy("user_id").collect().map(_.toSeq).toSeq
      assert(got === want,
        "recovery must restore the pre-crash table before merging, not drop it")
      assert(!new java.io.File(s"${tbl}__old_p$dp").exists() &&
        !new java.io.File(s"${tbl}__upserting_p$dp").exists(),
        "dead-writer leftovers must be reclaimed")
      // a LIVE foreign writer's in-flight state is a hard stop, not a heal
      val child = new ProcessBuilder("sleep", "60").start()
      try {
        old.limit(3).write.parquet(s"${tbl}__upserting_p${child.pid()}")
        val e = intercept[Exception] {
          StreamingIngest.runStreamUpsertBounded(spark, src + "/*", tbl, keys, ord)
        }
        def chain(t: Throwable): Seq[String] = Option(t).toSeq
          .flatMap(x => Option(x.getMessage).toSeq ++ chain(x.getCause))
        assert(chain(e).exists(_.contains("concurrent writer")), chain(e).mkString("; "))
        assert(new java.io.File(s"${tbl}__upserting_p${child.pid()}").exists(),
          "the live writer's state must be left untouched")
      } finally child.destroyForcibly()
    } finally org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(tmp))
  }

  test("bucketed tables join without a shuffle") {
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
    try {
      val orders = spark.read.parquet(s"${testDataDir("0.01")}/orders.parquet")
      Warehouse.writeBucketed(orders.select("o_orderkey", "o_custkey", "o_totalprice"),
        "orders_b", Seq("o_custkey"), numBuckets = 8)
      Warehouse.writeBucketed(orders.select(col("o_custkey"), col("o_orderdate")),
        "orders_b2", Seq("o_custkey"), numBuckets = 8)
      val joined = spark.table("orders_b").join(spark.table("orders_b2"), "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS orders_b2")
    }
  }
}
