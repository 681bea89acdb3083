package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    var prev = (0 to b.length).toArray
    for (i <- 1 to a.length) {
      val cur = new Array[Int](b.length + 1)
      cur(0) = i
      for (j <- 1 to b.length)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1),
          prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      prev = cur
    }
    prev(b.length)
  }

  private def matches(recs: Seq[(Long, String)], maxBlock: Int = 4096) =
    EntityResolution.blockedMatches(recs.toDF("id", "name"), "id", "name",
        maxDist = 1, blockChars = 4, maxBlock = maxBlock)
      .orderBy(col("idA"), col("idB")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("blocking is pigeonhole-complete for single edits at length >= 8") {
    // seeded corpus: base names >= 8 chars, plus one-edit corruptions at
    // EVERY position class (head, middle, tail; sub/ins/del)
    val rnd = new scala.util.Random(42)
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    val bases = Seq.tabulate(30)(i =>
      (i.toLong, Seq.fill(8 + rnd.nextInt(5))(alpha(rnd.nextInt(26))).mkString))
    val edited = bases.map { case (id, n) =>
      val p = rnd.nextInt(n.length)
      val name = rnd.nextInt(3) match {
        case 0 => n.updated(p, '#') // substitution
        case 1 => n.substring(0, p) + "#" + n.substring(p) // insertion
        case _ => n.substring(0, p) + n.substring(math.min(p + 1, n.length)) // deletion
      }
      (id + 1000L, name)
    }
    val recs = bases ++ edited
    val brute = (for {
      (ia, na) <- recs; (ib, nb) <- recs
      if ia < ib && lev(na, nb) <= 1
    } yield (ia, ib, lev(na, nb).toLong)).sortBy(t => (t._1, t._2))
    val got = matches(recs).toSeq
    assert(got === brute,
      "two-pass window blocking must recover the exact all-pairs result")
    assert(brute.size >= 30, "every planted edit must be recovered")
  }

  test("oversized blocks are dropped whole (cap discipline)") {
    // 20 identical names: one shared block of 20 in both passes
    val recs = (1L to 20L).map(i => (i, "same name here"))
    assert(matches(recs, maxBlock = 19).isEmpty,
      "a block over the cap must contribute no pairs")
    assert(matches(recs, maxBlock = 20).length === 20 * 19 / 2)
  }

  test("entities: clusters get the min record id, transitively") {
    // chain a-b, b-c (dist 1 each); d isolated
    val recs = Seq((1L, "alpha rodent"), (2L, "alpha rodenx"),
      (3L, "alpha rodexx"), (4L, "omega unrelated"))
    val m = EntityResolution.blockedMatches(recs.toDF("id", "name"),
      "id", "name", maxDist = 1)
    val ents = EntityResolution.entities(recs.toDF("id", "name"), "id", m)
      .orderBy(col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(ents === Seq((1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (4L, 4L, true)))
  }

  test("streaming ER links records across micro-batches, ≡ batch, order-invariant") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-er-stream").toString
    try {
      // the 1-2-3 chain spans BOTH batches: 1,3 arrive first, the bridge
      // record 2 arrives later — linking it needs the standing index
      val b1 = Seq((1L, "alpha rodent"), (3L, "alpha rodexx"),
        (7L, "omega unrelated")).toDF("id", "name")
      val b2 = Seq((2L, "alpha rodenx"), (8L, "omega unrelatex")).toDF("id", "name")
      def run(src: String) = graft.streaming.StreamingIngest
        .runStreamErBounded(spark, src, "id", "name", maxDist = 1)
        .orderBy(col("id")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      val expected = {
        val recs = (Seq((1L, "alpha rodent"), (3L, "alpha rodexx"),
          (7L, "omega unrelated"), (2L, "alpha rodenx"),
          (8L, "omega unrelatex"))).toDF("id", "name")
        EntityResolution.entities(recs, "id",
            EntityResolution.blockedMatches(recs, "id", "name", maxDist = 1))
          .orderBy(col("id")).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      }
      assert(expected.map(t => (t._1, t._2)).toSeq ===
        Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L),
        "fixture sanity: the chain and the cross-batch pair must cluster")
      val srcA = s"$tmp/fwd"
      b1.coalesce(1).write.parquet(srcA)
      b2.coalesce(1).write.mode("append").parquet(srcA)
      assert(run(srcA).toSeq === expected.toSeq,
        "stream must equal batch when the bridge record arrives last")
      val srcB = s"$tmp/rev"
      b2.coalesce(1).write.parquet(srcB)
      b1.coalesce(1).write.mode("append").parquet(srcB)
      assert(run(srcB).toSeq === expected.toSeq,
        "pair discovery must be arrival-order-invariant")
    } finally org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(tmp))
  }

  test("null names are ignored rather than blocked on") {
    val df = Seq((1L, Some("alpha rodent")), (2L, Option.empty[String]),
      (3L, Some("alpha rodent"))).toDF("id", "name")
    val got = EntityResolution.blockedMatches(df, "id", "name", maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 3L)))
  }
}
