package graft.expr

import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MojibakeSpec extends SparkSpec {

  private def corrupt(s: String): String =
    new String(s.getBytes(UTF_8), ISO_8859_1)

  private def corruptCp1252(s: String): String =
    new String(s.getBytes(UTF_8),
      java.nio.charset.Charset.forName("windows-1252"))

  test("repairs latin-1 and CP1252 mis-decodes, single and double") {
    for (clean <- Seq("café über naïve", "— em «dash» ©", "αβγδ ok",
      "mixed ascii and é end")) {
      assert(MojibakeOps.fix(corrupt(clean)) === clean)
      assert(MojibakeOps.fix(corruptCp1252(clean)) === clean)
      // double-encoded: two wrong decodes unwrap over two passes
      assert(MojibakeOps.fix(corrupt(corrupt(clean))) === clean)
    }
  }

  test("clean text is a fixed point — no false repair") {
    for (clean <- Seq("plain ascii only", "café über naïve", "αβγδ ok",
      "— em «dash» ©", "", "Ελληνικά κείμενο")) {
      assert(MojibakeOps.fix(clean) === clean)
    }
    assert(MojibakeOps.fix(null) === null)
  }

  test("fix_mojibake expression over a DataFrame") {
    import spark.implicits._
    val got = Seq(corrupt("déjà vu"), "already clean é", "ascii")
      .toDF("t")
      .select(MojibakeExpressions.fix_mojibake($"t")).collect()
      .map(_.getString(0))
    assert(got.toSeq === Seq("déjà vu", "already clean é", "ascii"))
  }
}
