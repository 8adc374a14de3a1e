package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rule-based data-quality validation — the engine behind the
  * `dq_validation` stage the reference tracks in its catalog status
  * chain (`/root/reference/ingestion/dataIngestion.py` catalog fields;
  * the reference records the status but ships no validator). Each rule
  * compiles to a COUNTING aggregate over one scan: all row-local rules
  * fold into a single pass (one job, no shuffle beyond the final
  * 1-row aggregates); uniqueness and referential integrity are
  * per-rule keyed jobs because they genuinely need a shuffle (groupBy)
  * or a broadcast anti-join. Output is one row per rule:
  * (rule, column, n_violations) — empty table = publish, any row with
  * n_violations > 0 = fail the stage.
  */
object DataQuality {

  sealed trait Rule { def name: String; def column: String }
  /** Column must never be null. */
  final case class NotNull(column: String) extends Rule { val name = "not_null" }
  /** Value must lie in [lo, hi] (nulls are NotNull's business). */
  final case class InRange(column: String, lo: Double, hi: Double) extends Rule { val name = "in_range" }
  /** Value must match the regex (nulls ignored). */
  final case class Matches(column: String, regex: String) extends Rule { val name = "matches" }
  /** Column values must be unique. */
  final case class Unique(column: String) extends Rule { val name = "unique" }
  /** Every value must exist in `dim`'s `dimColumn` (nulls ignored). */
  final case class RefIntegrity(column: String, dim: DataFrame, dimColumn: String)
      extends Rule { val name = "ref_integrity" }

  private def violation(r: Rule): Column = r match {
    case NotNull(c) => col(c).isNull
    case InRange(c, lo, hi) =>
      col(c).isNotNull && (col(c) < lit(lo) || col(c) > lit(hi))
    case Matches(c, re) =>
      col(c).isNotNull && !col(c).rlike(re)
    case _ => throw new IllegalArgumentException(s"not row-local: $r")
  }

  /** Zero-extra-pass variant for row-local rules: attach the violation
    * counters to the DataFrame itself via Spark's Observation API — the
    * counts are collected DURING whatever action the caller already
    * runs (typically the landing write), so validating costs no second
    * scan at all. Read `observation.get` after the action; keys are
    * `rule:column`. Keyed rules (unique / ref-integrity) can't ride a
    * row-local observation — run [[validate]] for those. */
  def observed(df: DataFrame, rules: Seq[Rule], name: String = "dq")
      : (DataFrame, org.apache.spark.sql.Observation) = {
    require(rules.nonEmpty, "observed() needs at least one rule")
    val aggs = rules.map(r =>
      coalesce(sum(when(violation(r), 1L).otherwise(0L)), lit(0L))
        .as(s"${r.name}:${r.column}"))
    val obs = org.apache.spark.sql.Observation(name)
    (df.observe(obs, aggs.head, aggs.tail: _*), obs)
  }

  /** Violation counts for every rule, one row per rule. Row-local rules
    * share a single scan; keyed rules each add one job. */
  def validate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty,
      "validate() needs at least one rule — an empty rule list would " +
        "trivially 'pass' whatever config produced it; fix the config")
    val (local, keyed) = rules.partition {
      case _: NotNull | _: InRange | _: Matches => true
      case _ => false
    }
    val localDf: Option[DataFrame] = if (local.isEmpty) None else Some {
      val aggs = local.zipWithIndex.map { case (r, i) =>
        coalesce(sum(when(violation(r), 1L).otherwise(0L)), lit(0L))
          .as(s"v$i")
      }
      // one scan for ALL row-local rules, unpivoted lazily
      df.agg(aggs.head, aggs.tail: _*)
        .select(expr("stack(" + local.size + ", " +
          local.zipWithIndex.map { case (r, i) =>
            s"'${r.name}', '${r.column}', v$i"
          }.mkString(", ") + ") as (rule, column, n_violations)"))
    }
    val keyedDfs = keyed.map {
      case Unique(c) =>
        df.groupBy(col(c)).agg(count(lit(1)).as("n"))
          .filter(col("n") > 1)
          .agg(coalesce(sum(col("n") - 1), lit(0L)).as("v"))
          .select(lit("unique").as("rule"), lit(c).as("column"),
            col("v").as("n_violations"))
      case RefIntegrity(c, dim, dc) =>
        df.filter(col(c).isNotNull)
          .join(broadcast(dim.select(col(dc).as(c)).distinct()), Seq(c), "left_anti")
          .agg(count(lit(1)).as("v"))
          .select(lit("ref_integrity").as("rule"), lit(c).as("column"),
            col("v").as("n_violations"))
      case r => throw new IllegalArgumentException(s"unhandled rule: $r")
    }
    (localDf.toSeq ++ keyedDfs).reduce(_ unionByName _)
  }
}
