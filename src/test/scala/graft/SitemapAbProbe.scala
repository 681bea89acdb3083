package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Sitemap

/** Scratch diagnostic main (test scope — not shipped): A/B stamp for the
  * round-16 directive-#7 watch item — q_sitemap_seeds' quiet minimum
  * moved 0.90 → 1.34 s when round 15 added the `<changefreq>`/
  * `<priority>` field pulls to [[Sitemap.parseEntries]]. Side A is the
  * full current parse, side B a lean twin with ONLY loc+lastmod (the
  * r14 shape), both driven through the identical index-hop + anti-join
  * + rank chain over the identical synthetic fixture. Min of 3
  * alternating runs per side isolates the parse-cost delta from box
  * noise. */
object SitemapAbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    // the q_sitemap_seeds fixture, reconstructed (SparkEntry's builders
    // are private): roots = urlset for even-k domains, index for odd-k;
    // children for odd-k
    val src = docs.select(col("source")).distinct()
      .withColumn("domain", concat(col("source"), lit(".example.com")))
      .withColumn("k",
        regexp_extract(col("source"), "(\\d+)", 1).cast("long") % 25)
    val roots = src.select(col("domain"),
      concat(lit("https://www."), col("domain"), lit("/sitemap.xml"))
        .as("url"),
      when(col("k") % 2 === 0,
        Sitemap.syntheticUrlset(col("domain"), col("k"), 0, 10))
        .otherwise(Sitemap.syntheticIndex(col("domain"))).as("xml"))
    val oddSrc = src.filter(col("k") % 2 === 1)
    val children = oddSrc
      .select(col("domain"),
        concat(lit("https://www."), col("domain"), lit("/sitemap-1.xml"))
          .as("url"),
        Sitemap.syntheticUrlset(col("domain"), col("k"), 0, 5).as("xml"))
      .unionByName(oddSrc.select(col("domain"),
        concat(lit("https://www."), col("domain"), lit("/sitemap-2.xml"))
          .as("url"),
        Sitemap.syntheticUrlset(col("domain"), col("k"), 5, 10).as("xml")))
    val xmls = roots.unionByName(children)
    val crawled = docs.select(concat(lit("https://www."), col("source"),
      lit(".example.com/docs/"), (col("doc_id") % 25).cast("string"))
      .as("url")).distinct()

    /** r14-shape lean parse: the same block walk, loc+lastmod only. */
    def leanParse(df: DataFrame, xmlCol: String): DataFrame = {
      val passThrough = df.columns.filterNot(_ == xmlCol).map(col).toSeq
      def blocks(kind: String, tag: String) = df
        .select(passThrough :+ explode(regexp_extract_all(col(xmlCol),
          lit(s"(?s)<$tag>(.*?)</$tag>"), lit(1))).as("__blk"): _*)
        .withColumn("kind", lit(kind))
      val lastmodRaw = regexp_extract(col("__blk"),
        "(?s)<lastmod>\\s*(.*?)\\s*</lastmod>", 1)
      blocks("url", "url").unionByName(blocks("sitemap", "sitemap"))
        .withColumn("loc",
          regexp_extract(col("__blk"), "(?s)<loc>\\s*(.*?)\\s*</loc>", 1))
        .withColumn("lastmod",
          when(lastmodRaw === "", lit(null).cast("date"))
            .otherwise(to_date(lastmodRaw)))
        .filter(col("loc") =!= "")
        .drop("__blk")
    }

    def chain(parse: (DataFrame, String) => DataFrame): DataFrame = {
      val rootEntries = parse(roots, "xml")
      val childEntries = parse(
        xmls.join(broadcast(rootEntries.filter(col("kind") === "sitemap")
          .select(col("loc").as("url"))), Seq("url")), "xml")
      val entries = rootEntries.filter(col("kind") === "url")
        .select(col("domain"), col("kind"), col("loc"), col("lastmod"))
        .unionByName(childEntries.filter(col("kind") === "url")
          .select(col("domain"), col("kind"), col("loc"), col("lastmod")))
      Sitemap.seeds(entries, "domain", crawled, "url")
        .select(col("domain"), col("loc"), col("lastmod"), col("seed_rank"))
    }

    def consume(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm both plans once
    consume(chain(Sitemap.parseEntries))
    consume(chain(leanParse))
    var a = Double.MaxValue; var b = Double.MaxValue
    for (_ <- 1 to 3) {
      a = math.min(a, time(consume(chain(Sitemap.parseEntries))))
      b = math.min(b, time(consume(chain(leanParse))))
    }
    println(f"""{"probe":"sitemap_seeds_ab","sf":"$sfDir","full_parse_min3":$a%.3f,"lean_parse_min3":$b%.3f}""")
    spark.stop()
  }
}
