package graft.expr

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.SparkSpec
import graft.operators.Dedup

/** Hash-exactness pins for the codegen MinHash twins: the retired
  * `shingleUdf`/`minhashSignatureUdf` are the reference implementations,
  * and every property asserts the native expression reproduces them
  * byte-for-byte — so every persisted signature, LSH band bucket, and
  * `q_dedup_*` oracle hash is provably unchanged by the port. Inputs
  * cover the edges where tokenization drifts first: null, empty,
  * whitespace-only, leading/trailing tabs/newlines, repeated words
  * (LinkedHashSet order), non-ASCII (case mapping), and docs shorter
  * than the shingle width.
  */
object MinHashExprSpec extends Properties("MinHashExpr") {

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(20)

  private val genWord: Gen[String] = Gen.frequency(
    5 -> Gen.alphaNumStr.map(_.take(6)),
    2 -> Gen.oneOf("the", "The", "THE", "straße", "ΣΙΓΜΑ", "名前", "a|b"),
    1 -> Gen.const(""))
  private val genWs: Gen[String] = Gen.oneOf(" ", "  ", "\t", "\n", " \t ")
  private val genText: Gen[String] = Gen.frequency(
    8 -> (for {
      words <- Gen.listOfN(12, genWord)
      seps <- Gen.listOfN(12, genWs)
      lead <- genWs; trail <- genWs
    } yield lead + words.zip(seps).map { case (w, s) => w + s }.mkString + trail),
    1 -> Gen.const(""),
    1 -> Gen.const("   \t\n  "),
    1 -> Gen.const(null))

  private def batch(texts: List[String], n: Int, k: Int) = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val expr = df.select(col("id"),
        MinHashExpressions.shingle_array(col("text"), n).as("sh"))
      .withColumn("sig", MinHashExpressions.minhash_signature(col("sh"), k))
      .orderBy("id").collect()
    val udf0 = df.select(col("id"),
        Dedup.shingleUdf(n)(col("text")).as("sh"))
      .withColumn("sig", Dedup.minhashSignatureUdf(k)(col("sh")))
      .orderBy("id").collect()
    (expr, udf0)
  }

  property("shingle_array and minhash_signature reproduce the UDFs exactly") =
    forAll(Gen.listOfN(8, genText), Gen.choose(1, 4), Gen.oneOf(8, 16)) {
      (texts, n, k) =>
        val (e, u) = batch(texts, n, k)
        e.zip(u).forall { case (re, ru) =>
          re.getSeq[String](1) == ru.getSeq[String](1) &&
            re.getSeq[Long](2) == ru.getSeq[Long](2)
        }
    }

  property("null text yields empty shingles and the empty-set signature") =
    forAll(Gen.const(0)) { _ =>
      val (e, u) = batch(List(null, "", " "), 3, 8)
      e.zip(u).forall { case (re, ru) =>
        re.getSeq[String](1) == ru.getSeq[String](1) &&
          re.getSeq[Long](2) == ru.getSeq[Long](2)
      } && e(0).getSeq[String](1).isEmpty &&
        e(0).getSeq[Long](2).forall(_ == Long.MaxValue)
    }
}
