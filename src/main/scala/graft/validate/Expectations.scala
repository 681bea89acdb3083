package graft.validate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative table expectations — the warehouse-grade generalization of
  * the reference's hard-coded mandatory-field validator
  * (`data_validator.py`): a rule set evaluated over the whole table in
  * ONE aggregation pass, returning per-rule violation counts instead of
  * per-row annotations.
  *
  * Row rules (not-null, range, regex, set membership, cross-column
  * predicates) compile to `sum(when(!rule, 1))` columns inside a single
  * `agg` — one scan, one partial-aggregating reduce, no matter how many
  * rules. Table rules need their own shape and are composed in:
  * uniqueness is a keyed aggregation (any key counted twice), referential
  * integrity a broadcast-able LEFT ANTI join against the dimension's key
  * projection. Output one row per rule: (rule, n_violations, n_rows),
  * fully SQL-expressible, so the whole audit is hash-oracled.
  *
  * This is the "expectations" layer a 100 TB ingest runs BEFORE
  * publishing a partition: all-rule evaluation costs one scan of the new
  * data plus one key-join per foreign key, and the result is a bounded
  * (rule-count-sized) frame the orchestrator can gate on.
  */
object Expectations {

  /** A named row-level predicate: rows where `holds` is false (or null)
    * count as violations. */
  final case class Rule(name: String, holds: Column)

  def notNull(c: String): Rule = Rule(s"not_null:$c", col(c).isNotNull)

  def inRange(c: String, lo: Long, hi: Long): Rule =
    Rule(s"in_range:$c", col(c) >= lo && col(c) <= hi)

  def matches(c: String, regex: String): Rule =
    Rule(s"matches:$c", col(c).rlike(regex))

  def inSet(c: String, values: Seq[String]): Rule =
    Rule(s"in_set:$c", col(c).isin(values: _*))

  /** Row rules in one pass: null predicate results count as violations
    * (an unevaluable rule is a failing rule, not a silent pass). */
  def checkRows(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "checkRows: no rules")
    require(rules.map(_.name).distinct.size == rules.size,
      s"checkRows: duplicate rule names in ${rules.map(_.name)}")
    val aggs = rules.zipWithIndex.map { case (r, i) =>
      sum(when(coalesce(r.holds, lit(false)), 0L).otherwise(1L)).as(s"__v_$i")
    } :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val pairs = rules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.name).as("rule"),
        coalesce(col(s"__v_$i"), lit(0L)).as("n_violations"))
    }
    one.select(explode(array(pairs: _*)).as("__r"),
        coalesce(col("__n"), lit(0L)).as("n_rows"))
      .select(col("__r.rule").as("rule"),
        col("__r.n_violations").as("n_violations"), col("n_rows"))
  }

  /** Uniqueness: keys observed on more than one row. Violation count =
    * number of EXCESS rows (so a clean table scores 0 and the count is
    * additive across batches of disjoint keys). */
  def checkUnique(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "checkUnique: no key columns")
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__c"))
      .agg(coalesce(sum(col("__c") - 1), lit(0L)).as("n_violations"),
        coalesce(sum(col("__c")), lit(0L)).as("n_rows"))
      .select(lit(s"unique:${keyCols.mkString(",")}").as("rule"),
        col("n_violations"), col("n_rows"))
  }

  /** Referential integrity: fact rows whose non-null foreign key misses
    * the dimension. The dimension side is its key projection only —
    * broadcast-sized for real dimensions; NULL keys are not violations
    * (that's `notNull`'s job, composable separately). */
  def checkForeignKey(fact: DataFrame, fkCol: String, dim: DataFrame,
                      pkCol: String): DataFrame = {
    val total = fact.agg(count(lit(1)).as("n_rows"))
    val orphans = fact.filter(col(fkCol).isNotNull)
      .join(broadcast(dim.select(col(pkCol)).distinct()),
        col(fkCol) === col(pkCol), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
    orphans.crossJoin(total)
      .select(lit(s"fk:$fkCol->$pkCol").as("rule"),
        col("n_violations"), col("n_rows"))
  }

  /** The full audit: row rules + uniqueness + foreign keys as one
    * rule-per-row frame, ready to gate a publish step. */
  def audit(df: DataFrame, rules: Seq[Rule],
            uniqueKeys: Seq[Seq[String]] = Nil,
            foreignKeys: Seq[(String, DataFrame, String)] = Nil): DataFrame = {
    val parts =
      (if (rules.nonEmpty) Seq(checkRows(df, rules)) else Nil) ++
        uniqueKeys.map(checkUnique(df, _)) ++
        foreignKeys.map { case (fk, dim, pk) => checkForeignKey(df, fk, dim, pk) }
    require(parts.nonEmpty, "audit: nothing to check")
    parts.reduce(_.unionAll(_))
  }
}
