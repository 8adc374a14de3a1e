package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance similarity self-join — the entity-resolution primitive
  * (near-identical customer/supplier/product names) the relational tier
  * lacked. The naive formulation is an O(n²) cross join with a
  * levenshtein filter; at corpus scale that is never acceptable, so
  * candidate generation uses the DELETION NEIGHBORHOOD signature scheme:
  *
  * For edit distance ≤ 1, define D(s) = {s} ∪ {s with one character
  * deleted}. Completeness: if ed(a,b) ≤ 1 then D(a) ∩ D(b) ≠ ∅ —
  *   - ed = 0: both contain the string itself;
  *   - insertion/deletion: the shorter string is literally a member of
  *     the longer one's deletion set (and of its own D);
  *   - substitution at position i: deleting position i from each side
  *     yields the same string.
  * Sharing a signature does NOT imply ed ≤ 1 (e.g. "ab"/"ba" share "a"),
  * so every candidate pair is verified with the codegen'd `levenshtein`
  * builtin — the signature join only has to be complete, never sound.
  *
  * Scale shape: a key of length L emits L+1 signatures, each reduced to
  * an 8-byte `xxhash64` before the shuffle (hash collisions are harmless
  * false candidates — verification filters them). The join is a plain
  * hash-bucketed equi-join on the signature hash: cost follows bucket
  * sizes (keys genuinely within distance 1 of many others), NEVER the
  * corpus square. This targets name-length entity attributes; for long
  * text near-dup use the MinHash/SimHash tier ([[Dedup]]), and for
  * ed ≤ k > 1 the partition-pigeonhole (PassJoin) generalization of the
  * same candidates-then-verify pattern is the path.
  */
object FuzzyJoin {

  /** {s} ∪ D1(s) in one higher-order transform: index i in 0..len deletes
    * the character at 0-based position i (i == len deletes nothing and
    * contributes s itself). */
  private[ext] def deletionSigs(c: Column): Column =
    transform(sequence(lit(0), length(c)),
      i => concat(c.substr(lit(1), i), c.substr(i + lit(2), length(c))))

  /** Distinct unordered pairs (key_a < key_b) of distinct values of
    * `key` with levenshtein distance ≤ 1. Output columns
    * (`key_a`, `key_b`), unordered — callers sort. */
  def selfJoinEd1(df: DataFrame, key: String): DataFrame = {
    val sigs = df.select(col(key).as("k")).where(col("k").isNotNull)
      .distinct()
      .select(col("k"), explode(deletionSigs(col("k"))).as("sig"))
      .select(col("k"), xxhash64(col("sig")).as("sig_h"))
      // a key can emit the SAME signature from several delete positions
      // (any run of repeated characters — e.g. zero-padded ids, where
      // deleting any of 5 leading zeros is one string): dedupe per key,
      // or hot buckets join every copy against every copy and the
      // candidate set inflates quadratically in the run length
      // (measured 1.5M zero-padded names: ~4× fewer candidate rows)
      .distinct()
    val a = sigs.select(col("k").as("key_a"), col("sig_h"))
    val b = sigs.select(col("k").as("key_b"), col("sig_h"))
    // both sides are the SAME corpus-sized signature table — broadcast
    // is never the right strategy here, but the aggregate above makes
    // the planner's size estimate unreliable and an attempted broadcast
    // of ~30M signature rows OOM'd an 8g driver at 100×; declare the
    // sort-merge intent (spills, never materializes a side in heap)
    a.join(b.hint("merge"), Seq("sig_h"))
      .where(col("key_a") < col("key_b"))
      // a pair can share several signatures (e.g. equal-prefix deletes):
      // dedupe BEFORE the verification scan so each pair is verified once
      .select(col("key_a"), col("key_b")).distinct()
      // cheap length gate, then the exact verification
      .where(abs(length(col("key_a")) - length(col("key_b"))) <= 1)
      .where(levenshtein(col("key_a"), col("key_b")) <= 1)
  }

  /** Incremental variant — the production entity-resolution shape: match
    * a NEW batch of keys against an existing corpus without re-joining
    * the corpus to itself. Candidates come from corpus-signature ⋈
    * batch-signature, so per-batch cost scales with the batch (the
    * corpus side contributes one signature pass, which a long-running
    * deployment amortizes by persisting its signature table — the same
    * contract as [[Dedup]]'s `minhashNearDupPairsAgainst`). Exact ed = 0
    * matches are INCLUDED (a real dedup gate wants them); output
    * (`key_new`, `key_corpus`), unordered. */
  def againstCorpusEd1(batch: DataFrame, corpus: DataFrame,
      key: String): DataFrame = {
    def sigs(df: DataFrame, out: String) =
      df.select(col(key).as(out)).where(col(out).isNotNull)
        .distinct()
        .select(col(out), explode(deletionSigs(col(out))).as("sig"))
        .select(col(out), xxhash64(col("sig")).as("sig_h"))
        .distinct()
    sigs(batch, "key_new")
      // same corpus-sized-sides contract as above: declare sort-merge
      .join(sigs(corpus, "key_corpus").hint("merge"), Seq("sig_h"))
      .select(col("key_new"), col("key_corpus")).distinct()
      .where(abs(length(col("key_new")) - length(col("key_corpus"))) <= 1)
      .where(levenshtein(col("key_new"), col("key_corpus")) <= 1)
  }
}
