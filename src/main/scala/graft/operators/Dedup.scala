package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines — beyond-reference
  * extensions (SURVEY.md §7.1.9).
  *
  * Scale design (100 TB posture):
  *  - exact dedup = one hash shuffle on the key (same cost as any groupBy);
  *  - near-dup (MinHash/SimHash) never compares all pairs: signatures are
  *    computed per-row (narrow), candidates come from LSH band buckets (one
  *    shuffle on band key), and only bucket-mates are verified. Oversized
  *    buckets (degenerate content) are capped to bound worst-case skew —
  *    the cap is logged, not silent.
  */
object Dedup {

  /** Exact dedup: keep the lowest-id row per key (deterministic
    * `dropDuplicates`). One shuffle on the key. */
  def exactDedup(df: DataFrame, keyCols: Seq[String], idCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(idCol).asc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Exact-dup group summary: survivor id + group size per key. */
  def exactGroups(df: DataFrame, keyCols: Seq[String], idCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Lower-cased whitespace word tokens. */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** Word n-gram shingles as a distinct array; docs shorter than n collapse
    * to one whole-text shingle. A tight-loop UDF: the equivalent
    * transform/element_at expression tree is interpreted per gram and
    * benchmarked ~20x slower on long documents. */
  private def shingleUdf(n: Int) = udf { (text: String) =>
    if (text == null) Seq.empty[String]
    else {
      val toks = text.trim.toLowerCase.split("\\s+")
      if (toks.length < n) Seq(toks.mkString(" "))
      else {
        val out = new scala.collection.mutable.LinkedHashSet[String]
        var i = 0
        while (i <= toks.length - n) {
          val sb = new StringBuilder(toks(i))
          var j = 1
          while (j < n) { sb += ' '; sb ++= toks(i + j); j += 1 }
          out += sb.result()
          i += 1
        }
        out.toSeq
      }
    }
  }

  def shingles(text: Column, n: Int = 3): Column = shingleUdf(n)(text)

  /** Exact n-gram Jaccard similarity between two shingle-array columns. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  // ---------------------------------------------------------------- MinHash

  /** Deterministic permutation parameters (a*h+b mod p), fixed seed.
    * a < 2^31 and the base hash h < 2^32, so a*h < 2^63 never overflows —
    * the whole permutation stays in primitive long arithmetic. */
  private val MinhashPrime = (1L << 61) - 1
  private def perms(k: Int): Array[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Array.fill(k)((rnd.nextInt(Int.MaxValue - 1).toLong + 1,
                   math.abs(rnd.nextLong()) % MinhashPrime))
  }

  /** MinHash signature UDF: one tight pass over the shingle set computing all
    * k permutation minima (O(shingles×k) per row, no shuffle). A UDF beats a
    * 64-way HOF expression tree here; it is per-row narrow work outside any
    * aggregation, so codegen loss is immaterial. */
  def minhashSignatureUdf(k: Int = 64) = {
    val ps = perms(k)
    udf { (shingles: Seq[String]) =>
      val sig = Array.fill(k)(Long.MaxValue)
      shingles.foreach { s =>
        val h = scala.util.hashing.MurmurHash3.stringHash(s).toLong & 0xffffffffL
        var i = 0
        while (i < k) {
          val (a, b) = ps(i)
          val v = (a * h) % MinhashPrime + b
          val m = if (v >= MinhashPrime) v - MinhashPrime else v
          if (m < sig(i)) sig(i) = m
          i += 1
        }
      }
      sig.toSeq
    }
  }

  /** doc → (band, bucket) rows from a signature array: bucket key is the
    * hash of the band's signature slice. */
  def bandBuckets(df: DataFrame, sigCol: String, idCol: String,
                  bands: Int, rows: Int): DataFrame = {
    val bandStructs = array((0 until bands).map { j =>
      struct(lit(j).as("band"),
        hash(slice(col(sigCol), j * rows + 1, rows)).as("bucket"))
    }: _*)
    df.select(col(idCol), explode(bandStructs).as("bb"))
      .select(col(idCol), col("bb.band"), col("bb.bucket"))
  }

  /** Candidate pairs (idA < idB) sharing ≥1 LSH bucket. `maxBucket` caps
    * degenerate buckets (skew guard) — capped buckets are counted in the
    * `lsh_capped_buckets` accumulator-free metric column of logs. */
  def candidatePairs(buckets: DataFrame, idCol: String,
                     maxBucket: Int = 1000): DataFrame = {
    val sized = buckets.groupBy("band", "bucket")
      .agg(collect_list(col(idCol)).as("ids"))
      .filter(size(col("ids")) > 1 && size(col("ids")) <= maxBucket)
    sized
      .select(explode(col("ids")).as("idA"), col("ids"))
      .select(col("idA"), explode(col("ids")).as("idB"))
      .filter(col("idA") < col("idB"))
      .distinct()
  }

  /** MinHash+LSH near-duplicate pairs over a text column, verified with the
    * exact shingle Jaccard. Returns (idA, idB, jaccard ≥ threshold). */
  def minhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
                          n: Int = 3, k: Int = 64, bands: Int = 16,
                          threshold: Double = 0.5): DataFrame = {
    val rows = k / bands
    val withSh = df.select(col(idCol), shingles(col(textCol), n).as("sh"))
    val withSig = withSh.withColumn("sig", minhashSignatureUdf(k)(col("sh")))
    val cands = candidatePairs(bandBuckets(withSig, "sig", idCol, bands, rows), idCol)
    val a = withSh.select(col(idCol).as("idA"), col("sh").as("shA"))
    val b = withSh.select(col(idCol).as("idB"), col("sh").as("shB"))
    cands.join(a, "idA").join(b, "idB")
      .withColumn("jaccard", jaccard(col("shA"), col("shB")))
      .filter(col("jaccard") >= threshold)
      .select(col("idA"), col("idB"), col("jaccard"))
  }

  /** EXACT n-gram Jaccard pairs via an inverted shingle index: explode
    * shingles, self-join on the shingle (only pairs sharing ≥1 shingle ever
    * meet — pairs sharing none have jaccard 0 and can't pass any positive
    * threshold, so the result is complete), count intersections, derive
    * |A∪B| = |A|+|B|-|A∩B|. Two hash shuffles (shingle, pair); no quadratic
    * blowup. At extreme scale, ubiquitous "stop-shingles" (shared by a large
    * fraction of docs) should be dropped before the join — the standard
    * index-pruning mitigation for join skew. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, threshold: Double = 0.5): DataFrame = {
    require(threshold > 0, "threshold must be positive for index completeness")
    val sh = df.select(col(idCol), explode(shingles(col(textCol), n)).as("s"))
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n_sh"))
    val a = sh.select(col(idCol).as("idA"), col("s"))
    val b = sh.select(col(idCol).as("idB"), col("s"))
    val common = a.join(b, "s").filter(col("idA") < col("idB"))
      .groupBy("idA", "idB").agg(count(lit(1)).as("c"))
    common
      .join(sizes.select(col(idCol).as("idA"), col("n_sh").as("nA")), "idA")
      .join(sizes.select(col(idCol).as("idB"), col("n_sh").as("nB")), "idB")
      .withColumn("jaccard",
        col("c").cast("double") / (col("nA") + col("nB") - col("c")))
      .filter(col("jaccard") >= threshold)
      .select(col("idA"), col("idB"), col("jaccard"))
  }

  /** Brute-force n-gram Jaccard pairs (reference/oracle path; quadratic —
    * only for validation and small frames). */
  def bruteJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val withSh = df.select(col(idCol), shingles(col(textCol), n).as("sh"))
    val a = withSh.select(col(idCol).as("idA"), col("sh").as("shA"))
    val b = withSh.select(col(idCol).as("idB"), col("sh").as("shB"))
    a.crossJoin(b).filter(col("idA") < col("idB"))
      .withColumn("jaccard", jaccard(col("shA"), col("shB")))
      .filter(col("jaccard") >= threshold)
      .select(col("idA"), col("idB"), col("jaccard"))
  }

  // ---------------------------------------------------------------- SimHash

  /** 64-bit SimHash UDF over word tokens (frequency-weighted). */
  val simhashUdf = udf { (toks: Seq[String]) =>
    val acc = new Array[Int](64)
    toks.foreach { t =>
      val h = scala.util.hashing.MurmurHash3.stringHash(t).toLong & 0xffffffffL |
        (scala.util.hashing.MurmurHash3.stringHash(t, 7919).toLong & 0xffffffffL) << 32
      var j = 0
      while (j < 64) { if (((h >>> j) & 1L) == 1L) acc(j) += 1 else acc(j) -= 1; j += 1 }
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (acc(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  def withSimhash(df: DataFrame, textCol: String = "text",
                  out: String = "simhash"): DataFrame =
    df.withColumn(out, simhashUdf(tokens(col(textCol))))

  /** SimHash near-dup pairs: candidates share one of 4 16-bit chunks
    * (guarantees recall for hamming ≤ 3), verified by exact popcount. */
  def simhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
                          maxHamming: Int = 3): DataFrame = {
    val sigs = withSimhash(df.select(col(idCol), col(textCol)), textCol)
      .select(col(idCol), col("simhash"))
    val chunks = array((0 until 4).map { j =>
      struct(lit(j).as("band"),
        shiftrightunsigned(col("simhash"), j * 16).bitwiseAND(lit(0xffffL)).as("bucket"))
    }: _*)
    val bucketed = sigs.select(col(idCol), col("simhash"), explode(chunks).as("bb"))
      .select(col(idCol), col("simhash"), col("bb.band"), col("bb.bucket"))
    val a = bucketed.select(col("band"), col("bucket"),
      col(idCol).as("idA"), col("simhash").as("sigA"))
    val b = bucketed.select(col("band"), col("bucket"),
      col(idCol).as("idB"), col("simhash").as("sigB"))
    a.join(b, Seq("band", "bucket")).filter(col("idA") < col("idB"))
      .select(col("idA"), col("idB"),
        bit_count(col("sigA").bitwiseXOR(col("sigB"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ------------------------------------------------------ embedding near-dup

  /** Embedding-cosine near-duplicate pairs (idA < idB, sim ≥ threshold).
    * Delegates candidate generation to the similarity module's hyperplane-LSH
    * buckets when `exact=false`; `exact=true` is the quadratic oracle path. */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                            threshold: Double, exact: Boolean = true): DataFrame = {
    val base = df.select(col(idCol), col(vecCol).cast("array<float>").as("v"))
      .withColumn("norm", Similarity.l2norm(col("v")))
    val a = base.select(col(idCol).as("idA"), col("v").as("vA"), col("norm").as("nA"))
    val b = base.select(col(idCol).as("idB"), col("v").as("vB"), col("norm").as("nB"))
    val joined =
      if (exact) a.crossJoin(b)
      else {
        val sigA = Similarity.withHyperplaneBands(a, "vA", "idA")
        val sigB = Similarity.withHyperplaneBands(b, "vB", "idB")
        sigA.join(sigB, Seq("band", "bucket"))
          .select("idA", "vA", "nA", "idB", "vB", "nB").distinct()
      }
    joined.filter(col("idA") < col("idB"))
      .withColumn("cosine", Similarity.dot(col("vA"), col("vB")) / (col("nA") * col("nB")))
      .filter(col("cosine") >= threshold)
      .select(col("idA"), col("idB"), round(col("cosine"), 6).as("cosine"))
  }
}
