package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LinearModelSpec extends SparkSpec {

  test("exact linear data recovers the generating weights") {
    val s = spark; import s.implicits._
    // y = 3 + 2*x1 - x2, exactly, on integer grids (fixed-point friendly)
    val rows = for (x1 <- 0 to 9; x2 <- 0 to 9)
      yield (x1.toDouble, x2.toDouble, 3.0 + 2.0 * x1 - x2)
    val df = rows.toDF("x1", "x2", "y")
    val fit = LinearModel.fit(df, Seq("x1", "x2"), "y")
    assert(math.abs(fit.weights(0) - 3.0) < 1e-4, fit.weights.mkString(","))
    assert(math.abs(fit.weights(1) - 2.0) < 1e-5)
    assert(math.abs(fit.weights(2) + 1.0) < 1e-5)
    val scored = LinearModel.withPrediction(df, Seq("x1", "x2"), "y", fit)
    val maxRes = scored.agg(max(abs(col("residual")))).head().getDouble(0)
    assert(maxRes < 1e-3, s"max |residual| $maxRes")
  }

  test("collinear features fail loudly; ridge rescues the solve") {
    val s = spark; import s.implicits._
    val df = (0 to 20).map(i => (i.toDouble, 2.0 * i, i * 3.0 + 1))
      .toDF("x1", "x2", "y") // x2 = 2*x1 exactly
    val e = intercept[IllegalArgumentException] {
      LinearModel.fit(df, Seq("x1", "x2"), "y")
    }
    assert(e.getMessage.contains("singular"))
    val ridged = LinearModel.fit(df, Seq("x1", "x2"), "y", ridge = 1e-3)
    assert(ridged.weights.forall(w => !w.isNaN && !w.isInfinite))
  }

  test("solve: partial pivoting handles a zero leading pivot") {
    val a = Array(
      Array(0.0, 2.0, 1.0),
      Array(1.0, 0.0, 1.0),
      Array(2.0, 1.0, 0.0))
    val b = Array(7.0, 4.0, 4.0) // A · (1, 2, 3)
    val w = LinearModel.solve(a, b)
    assert(w.zip(Seq(1.0, 2.0, 3.0)).forall { case (x, y) => math.abs(x - y) < 1e-12 },
      w.mkString(","))
  }

  test("gradient bound holds on real data (the q_reg_verify contract)") {
    val docs = spark.read.parquet(s"${testDataDir()}/documents.parquet")
      .filter(col("text").isNotNull)
      .withColumn("__p", TextAnalysis.profile(col("text")))
      .select(
        coalesce(col("__p.n_tokens"), lit(0)).cast("double").as("f_tokens"),
        col("__p.n_stopwords").cast("double").as("f_stop"),
        col("__p.n_chars").cast("double").as("y_chars"))
    val fit = LinearModel.fit(docs, Seq("f_tokens", "f_stop"), "y_chars")
    val tol = 4.0 * (fit.gradientBound + fit.n / fit.grid)
    val grads = LinearModel.gradientSums(docs, Seq("f_tokens", "f_stop"),
      "y_chars", fit).collect()
    assert(grads.length === 3)
    grads.foreach { r =>
      val g = math.abs(r.getAs[java.math.BigDecimal]("qgrad").doubleValue() / fit.grid)
      assert(g <= tol, s"coefficient ${r.getAs[Long]("j")}: |gradient| $g > $tol")
    }
    // and a deliberately WRONG weight vector must blow the bound
    val broken = fit.copy(weights = fit.weights.updated(1, fit.weights(1) + 1.0))
    val bad = LinearModel.gradientSums(docs, Seq("f_tokens", "f_stop"),
      "y_chars", broken).collect()
    assert(bad.exists(r =>
      math.abs(r.getAs[java.math.BigDecimal]("qgrad").doubleValue() / fit.grid) > tol),
      "corrupted weights were not detected by the gradient gate")
  }

  test("groupedOls: exact rational slopes, truncating milli rendering") {
    val s = spark; import s.implicits._
    val rows = Seq(
      // up: y = 2x + 1 exactly -> slope 2.000
      ("up", 0L, 1L), ("up", 1L, 3L), ("up", 2L, 5L),
      // down: y = -3x + 10 exactly -> slope -3.000 (negative path)
      ("down", 0L, 10L), ("down", 1L, 7L), ("down", 2L, 4L),
      // frac: slope 1/3 -> trunc(1000/3) = 333
      ("frac", 0L, 0L), ("frac", 3L, 1L),
      // negfrac: slope -1/3 -> trunc(-333.3) = -333 (DuckDB // truncates
      // toward zero on negatives too — measured, matching Spark div)
      ("negfrac", 0L, 1L), ("negfrac", 3L, 0L),
      // flat x: zero variance -> NULL slope
      ("degen", 5L, 1L), ("degen", 5L, 9L))
    val out = LinearModel.groupedOls(rows.toDF("g", "x", "y"), "g",
        col("x"), col("y"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(7), r.getLong(8),
          if (r.isNullAt(9)) None else Some(r.getLong(9)))).toMap
    assert(out("up") == ((12L, 6L, Some(2000L))))
    assert(out("down") == ((-18L, 6L, Some(-3000L))))
    assert(out("frac") == ((3L, 9L, Some(333L))))
    assert(out("negfrac") == ((-3L, 9L, Some(-333L))))
    assert(out("degen") == ((0L, 0L, None)))
    // moment sums themselves are exact
    val up = LinearModel.groupedOls(rows.toDF("g", "x", "y"), "g",
        col("x"), col("y")).filter(col("grp") === "up").head()
    assert((up.getLong(1), up.getLong(2), up.getLong(3), up.getLong(4),
      up.getLong(5), up.getLong(6)) == ((3L, 3L, 9L, 5L, 35L, 13L)))
  }
}
