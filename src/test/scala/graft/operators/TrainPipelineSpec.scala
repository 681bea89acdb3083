package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The curation → training-prep interface: TrainPipeline.prepare must
  * carry ids, cleaned counts, and stage responsibilities across the
  * chain (the harness query proves cross-engine equivalence; this spec
  * proves the structural contract on real data). */
class TrainPipelineSpec extends SparkSpec {

  private lazy val out = {
    val sf = testDataDir()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    TrainPipeline.prepare(docs, emb,
      CorpusPipeline.Config(substringK = 4, semanticThreshold = 0.4),
      capacity = 512L).collect()
  }

  test("row set is exactly the curated set; splits partition it") {
    val sf = testDataDir()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val curated = CorpusPipeline.curateV2(docs, emb,
      CorpusPipeline.Config(substringK = 4, semanticThreshold = 0.4))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out.map(_.getLong(0)).toSet === curated)
    assert(out.map(_.getLong(2)).forall(s => s >= 0 && s <= 2))
  }

  test("train docs (and only train docs) carry packing + shard columns") {
    out.foreach { r =>
      val isTrain = r.getLong(2) == 0L
      assert(r.isNullAt(3) == !isTrain, s"seq_id null-ness wrong: $r")
      assert(r.isNullAt(5) == !isTrain, s"shard null-ness wrong: $r")
      assert(r.isNullAt(6) == !isTrain, s"pos null-ness wrong: $r")
    }
  }

  test("shard positions are dense per shard; sequences cover the train stream") {
    val train = out.filter(_.getLong(2) == 0L)
    assert(train.nonEmpty)
    for ((_, rows) <- train.groupBy(_.getLong(5)))
      assert(rows.map(_.getLong(6)).sorted.toSeq === (0L until rows.length).toSeq,
        "pos must be dense from 0 within each shard")
    // packing: in doc order, seq_id is non-decreasing and starts at 0
    val seqs = train.sortBy(_.getLong(0)).map(_.getLong(3))
    assert(seqs.head === 0L)
    assert(seqs.zip(seqs.tail).forall { case (a, b) => b >= a })
    // total tokens vs highest sequence: seq_id = floor(start/512) must be
    // consistent with the running token total
    val totTok = train.map(_.getLong(1)).sum
    assert(seqs.last <= totTok / 512)
  }

  test("curriculum: phases slice the difficulty order, dense hash-shuffled positions") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 12 docs, difficulty = id * 10 (strictly increasing): with 4 phases,
    // phase = (rank-1)*4/12 puts ids 0-2 in phase 0, 3-5 in 1, ...
    val df = (0L until 12L).map(i => (i, i * 10L)).toDF("doc_id", "d")
    val got = TrainPipeline.curriculumOrder(df, "doc_id", col("d"), phases = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length === 12)
    got.foreach { case (id, _, phase, _) => assert(phase === id / 3) }
    // positions are dense 0..2 within each phase
    for ((_, rows) <- got.groupBy(_._3))
      assert(rows.map(_._4).sorted.toSeq === (0L until 3L).toSeq)
    // ties in difficulty break on id: equal difficulties stay deterministic
    val tied = (0L until 8L).map(i => (i, 5L)).toDF("doc_id", "d")
    val t1 = TrainPipeline.curriculumOrder(tied, "doc_id", col("d"), phases = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sorted
    t1.foreach { case (id, phase) => assert(phase === id / 4) }
  }
}
