package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic data masking — the engine behind the `data_masking`
  * stage of the reference's catalog status chain (tracked there, never
  * implemented). Three standard primitives, all deterministic so masked
  * datasets remain JOINABLE and reproducible:
  *
  *  - [[pseudonym]]: keyed stable token (same salt + value → same
  *    token) via the engine-stable 60-bit md5 hash — referential
  *    integrity survives masking, raw values don't;
  *  - [[maskAllButLast]]: redact a string except its trailing chars
  *    (the credit-card/name display form);
  *  - [[generalize]]: bucket a numeric to a coarser range
  *    (k-anonymity-style generalization).
  *
  * Pure columnar expressions — masking rides the projection, adds no
  * shuffle, and composes with any downstream operator.
  */
object Masking {

  /** Stable keyed pseudonym of any column. NOT reversible; rotate the
    * salt to unlink past releases. */
  def pseudonym(c: Column, salt: String): Column =
    graft.ext.TextOps.hash60(concat(lit(salt + ":"), c.cast("string")))

  /** `*`-out all but the last `keep` characters. */
  def maskAllButLast(colName: String, keep: Int): Column =
    expr(s"concat(repeat('*', greatest(length($colName) - $keep, 0)), " +
      s"substr($colName, -$keep, $keep))")

  /** Generalize a numeric to its bucket index at `width` granularity. */
  def generalize(c: Column, width: Double): Column =
    floor(c.cast("double") / lit(width)).cast("long")
}
