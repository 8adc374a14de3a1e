package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A merges table: ranked byte-pair rules, rank = index (lower merges
  * first). Rules with left == right are rejected — with distinct sides,
  * two occurrences of the SAME pair can never overlap in one token list
  * (an overlap at i, i+1 would force right == left), so a merge pass is
  * conflict-free: every occurrence merges simultaneously, and the pass is
  * expressible both as a tight sequential loop (here) and as a parallel
  * per-position list rewrite (the DuckDB oracle) with identical results.
  */
final class BpeTable(val merges: Seq[(String, String)]) extends Serializable {
  // an EMPTY table is legitimate: the identity tokenizer (every word
  // stays characters) — what train() yields on a corpus with no
  // repeated pair, and the natural zero of the merge hierarchy
  merges.foreach { case (a, b) =>
    require(a.nonEmpty && b.nonEmpty, "empty merge side")
    require(a != b, s"self-merge rule ($a,$b) breaks conflict-free passes")
  }
  require(merges.distinct.size == merges.size, "duplicate merge rule")

  @transient private lazy val rank: Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  /** Standard BPE encode: chars -> repeatedly merge every occurrence of
    * the lowest-rank adjacent pair -> until no pair is in the table. */
  def encode(word: String): Array[String] = {
    var toks: Array[String] = word.toArray.map(_.toString)
    var done = toks.length < 2
    while (!done) {
      var best = Int.MaxValue
      var i = 0
      while (i < toks.length - 1) {
        rank.get((toks(i), toks(i + 1))).foreach(r => if (r < best) best = r)
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (a, b) = merges(best)
        val out = Array.newBuilder[String]
        var j = 0
        while (j < toks.length) {
          if (j < toks.length - 1 && toks(j) == a && toks(j + 1) == b) {
            out += a + b; j += 2
          } else { out += toks(j); j += 1 }
        }
        toks = out.result()
        done = toks.length < 2
      }
    }
    toks
  }

  /** Codegen entry point for [[graft.functions.BpeEncode]]. */
  def encodeArrayData(w: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.util.GenericArrayData =
    graft.functions.BpeEncode.toArrayData(encode(w.toString))
}

/** Merges-table BPE over columns — the real tokenizer behind the regex
  * approximation in [[TextOps.bpeTokenCount]]. The reference ships no
  * tokenizer at all (its pipeline is type-agnostic byte relay); this is
  * LLM-pipeline extension surface: token-exact counting for packing and
  * mix budgeting.
  *
  * 100 TB design: encoding is a pure per-row projection (a native
  * Catalyst expression — no shuffle, no UDF, stays in whole-stage
  * codegen). Training is one distributed word-count aggregation over the
  * corpus, after which the merge loop runs on the BOUNDED top-`maxWords`
  * word-frequency dictionary on the driver — the standard BPE-training
  * shape (the corpus pass scales with the cluster; the driver state is
  * capped regardless of corpus size).
  */
object Bpe {

  /** The engine's standard merges table: common English digraph/suffix
    * merges, hand-ranked the way a trained table orders them (frequent
    * digraphs first, composites after their parts). Fixed so results are
    * reproducible across engines and sessions; production vocabularies
    * load a trained table through the same [[BpeTable]]. */
  val StandardMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("h", "e"), ("i", "n"), ("e", "r"), ("a", "n"),
    ("r", "e"), ("o", "n"), ("a", "t"), ("e", "n"), ("n", "d"),
    ("t", "i"), ("e", "s"), ("o", "r"), ("t", "e"), ("e", "d"),
    ("i", "s"), ("i", "t"), ("a", "l"), ("a", "r"), ("s", "t"),
    ("t", "o"), ("n", "t"), ("o", "u"), ("a", "s"), ("l", "e"),
    ("m", "e"), ("w", "h"), ("w", "e"), ("c", "h"), ("s", "h"),
    ("c", "e"), ("d", "e"), ("s", "e"), ("h", "a"), ("b", "e"),
    ("p", "r"), ("n", "o"), ("l", "o"), ("l", "i"), ("r", "a"),
    ("th", "e"), ("an", "d"), ("in", "g"), ("o", "f"), ("er", "s"),
    ("i", "on"), ("at", "i"), ("en", "t"), ("w", "as"), ("f", "or"),
    ("y", "ou"), ("wh", "at"), ("th", "at"), ("th", "is"), ("pr", "o"),
    ("c", "on"), ("ati", "on"), ("t", "er"), ("al", "l"), ("w", "it"),
    ("wit", "h"), ("ha", "ve"), ("v", "e"), ("a", "re"), ("no", "t"))
    .distinct

  /** NOTE: ("ha","ve") needs "ve" = ("v","e"), which ranks AFTER it —
    * harmless (the rule simply fires only when "ve" already formed), and
    * kept to mirror real trained tables, which contain such orderings. */
  val Standard: BpeTable = new BpeTable(StandardMerges)

  /** The engine's pretokenizer — letter runs, digit runs, single
    * punctuation marks (same classes as [[TextOps.bpeTokenCount]]).
    * NULL text coalesces to the empty stream (so [[tokenCount]] yields 0,
    * not size(NULL) = -1) — matching the oracle's LEFT JOIN + coalesce
    * semantics for absent documents. */
  def pretokens(text: Column): Column =
    regexp_extract_all(coalesce(text, lit("")),
      lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))

  /** BPE-encode one word column with the standard table (registered as
    * `bpe_encode` by [[graft.functions.GraftExtensions]]). */
  def encodeWord(word: Column): Column = call_function("bpe_encode", word)

  /** The document's full subword-token stream, in order. */
  def tokens(text: Column): Column =
    flatten(transform(pretokens(text), w => encodeWord(w)))

  /** BPE-encode with an ARBITRARY merges table — the planned path for
    * TRAINED vocabularies, where the table is runtime state the
    * session-registered `bpe_encode` (pinned to [[Standard]]) cannot
    * carry. Same native expression, same codegen; only the constructor
    * argument differs. */
  def encodeWordWith(table: BpeTable, word: Column): Column =
    org.apache.spark.sql.GraftShims.column(
      graft.functions.BpeEncode(
        org.apache.spark.sql.GraftShims.expression(word), table))

  /** [[tokens]] under an arbitrary (e.g. trained) merges table. */
  def tokensWith(table: BpeTable, text: Column): Column =
    flatten(transform(pretokens(text), w => encodeWordWith(table, w)))

  /** Token-exact count — the drop-in upgrade for
    * [[TextOps.bpeTokenCount]]'s regex approximation. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Persist a merges table as (rank, left, right) parquet — the
    * production handoff: train once, load everywhere (every executor
    * plans the same expression from the same loaded table). */
  def save(spark: org.apache.spark.sql.SparkSession, table: BpeTable,
      path: String): Unit = {
    import spark.implicits._
    table.merges.zipWithIndex
      .map { case ((a, b), r) => (r, a, b) }
      .toDF("rank", "left", "right")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  /** Load a merges table saved by [[save]] (rank order restored — the
    * rank IS the merge priority, so order is semantics, not layout). */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): BpeTable =
    new BpeTable(
      spark.read.parquet(path).orderBy(col("rank")).collect()
        .map(r => (r.getAs[String]("left"), r.getAs[String]("right"))).toSeq)

  /** Left-to-right non-overlapping application of one merge to a word's
    * token sequence — the same rule [[BpeTable.encode]] replays. */
  private def applyMerge(toks: Array[String], pair: (String, String)): Array[String] = {
    val nb = Array.newBuilder[String]
    var j = 0
    while (j < toks.length) {
      if (j < toks.length - 1 && toks(j) == pair._1 && toks(j + 1) == pair._2) {
        nb += pair._1 + pair._2; j += 2
      } else { nb += toks(j); j += 1 }
    }
    nb.result()
  }

  /** Train a merges table: ONE distributed pass aggregates word counts;
    * the merge loop then runs over the top-`maxWords` dictionary on the
    * driver (bounded state). Deterministic: ties break on pair order.
    * Self-pairs (a == b) are skipped — see [[BpeTable]].
    *
    * The loop keeps pair counts INCREMENTALLY with an occurrence index
    * (pair -> word ids): each merge re-tokenizes only the words that
    * contain the chosen pair and patches their pair contributions,
    * instead of recounting and remapping the whole dictionary. Per-merge
    * cost = one min-scan over the distinct-pair map + the affected
    * words — measured ~8x faster per merge than the recount loop on a
    * 100k-word dictionary (graft.BpeTrainBench), which is what makes a
    * production 32k-merge vocabulary a minutes-scale driver job. The
    * selection rule (max count, ties to lexicographic pair order) is a
    * total order, so the learned table is bit-identical to the naive
    * recount formulation — BpeSpec pins an exact expected merge list. */
  def train(docs: DataFrame, text: Column, nMerges: Int,
      maxWords: Int = 100000): BpeTable = {
    val words = docs
      .select(explode(pretokens(text)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))

    val toks: Array[Array[String]] = words.map(_._1.toArray.map(_.toString))
    val wn: Array[Long] = words.map(_._2)
    val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
    val where = scala.collection.mutable
      .HashMap.empty[(String, String), scala.collection.mutable.Set[Int]]

    def eachPair(i: Int)(f: ((String, String)) => Unit): Unit = {
      val t = toks(i); var j = 0
      while (j < t.length - 1) {
        if (t(j) != t(j + 1)) f((t(j), t(j + 1)))
        j += 1
      }
    }
    def addWord(i: Int): Unit = eachPair(i) { p =>
      counts.updateWith(p)(c => Some(c.getOrElse(0L) + wn(i)))
      where.getOrElseUpdate(p, scala.collection.mutable.Set.empty) += i
    }
    def removeWord(i: Int): Unit = eachPair(i) { p =>
      counts.updateWith(p)(c => c.map(_ - wn(i)).filter(_ != 0L))
      where.get(p).foreach(_ -= i)
    }
    toks.indices.foreach(addWord)

    val out = Seq.newBuilder[(String, String)]
    var m = 0
    var exhausted = false
    while (m < nMerges && !exhausted) {
      if (counts.isEmpty) exhausted = true
      else {
        val (pair, _) = counts.minBy { case ((a, b), n) => (-n, a, b) }
        out += pair
        val affected = where.getOrElse(pair, Set.empty[Int]).toArray.sorted
        affected.foreach { i =>
          removeWord(i)
          toks(i) = applyMerge(toks(i), pair)
          addWord(i)
        }
        m += 1
      }
    }
    new BpeTable(out.result())
  }
}
