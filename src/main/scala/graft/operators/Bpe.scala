package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.wsTokens

/** Distributed byte-pair-encoding training (Sennrich-style, SURVEY north
  * star "token counting"): learn a ranked merge table from a corpus, then
  * count/encode with the codegen'd `BpeTokenCount` expression.
  *
  * Scale shape: one corpus pass builds the DISTINCT word vocabulary with
  * counts — the working set for every later round is vocab-sized, not
  * corpus-sized. Each merge round is one adjacent-pair aggregation
  * (map-side combinable, uniform string keys) plus a row-local pieces
  * rewrite; lineage is cut per round (localCheckpoint) so N rounds stay
  * N independent small jobs. Ties break deterministically on
  * (count desc, pair asc) — identical merges on every run and engine.
  *
  * At 100 TB one trains on a sample of the corpus (standard practice);
  * the vocabulary aggregation and per-round cost are sample-sized either
  * way, and the encode path scales with the full corpus row-locally.
  */
object Bpe {

  /** Greedy left-to-right single-pair merge of a pieces array — SQL
    * formulation used during training (vocab-scale rows, HOF interpretation
    * is fine there; the corpus-scale encode path is the codegen'd
    * expression instead). */
  private def mergeOnce(pieces: Column, a: String, b: String): Column =
    mergeManyOnce(pieces, Seq((a, b)))

  /** One left-to-right pass applying a SET of symbol-disjoint merges: the
    * right-symbol lookup is a map literal keyed by the left symbol (well
    * defined — disjointness forbids a shared left symbol), so k merges cost
    * one array traversal, not k. Equivalent to applying each pair's
    * mergeOnce in any order BECAUSE the batch builder guarantees no pair's
    * symbols or merged string collide with another's. */
  private def mergeManyOnce(pieces: Column, ms: Seq[(String, String)]): Column = {
    val rightOf = map(ms.flatMap { case (a, b) => Seq(lit(a), lit(b)) }: _*)
    aggregate(pieces, array().cast("array<string>"), (acc, x) =>
      // null lookup (last symbol not a left symbol) -> when() falls through
      when(size(acc) > 0 &&
          element_at(rightOf, element_at(acc, -1)) === x,
        concat(slice(acc, lit(1), size(acc) - 1),
          array(concat(element_at(acc, -1), x))))
        .otherwise(concat(acc, array(x))))
  }

  /** Learn `nMerges` merges from the corpus text column. Returns the
    * ranked merge table (highest-frequency pair first). Stops early when
    * no adjacent pair occurs at least `minCount` times. */
  def learnMerges(df: DataFrame, textCol: String, nMerges: Int,
                  minCount: Long = 2L): Seq[(String, String)] = {
    val spark = df.sparkSession
    import spark.implicits._
    // distinct word vocabulary with counts, pieces = codepoints
    var vocab = df
      .select(explode(wsTokens(lower(col(textCol)))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .withColumn("pieces", split(col("word"), ""))
      .select(col("cnt"), col("pieces"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ListBuffer.empty[(String, String)]
    var continue = true
    var round = 0
    while (continue && round < nMerges) {
      round += 1
      val best = vocab
        .filter(size(col("pieces")) >= 2) // sequence(0,-1) would descend
        .select(col("cnt"), explode(expr(
          "transform(sequence(0, size(pieces) - 2), j -> struct(pieces[j] AS a, pieces[j+1] AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).as[(String, String, Long)].collect()
      best.headOption match {
        case Some((a, b, n)) if n >= minCount =>
          merges += ((a, b))
          vocab = vocab
            .withColumn("pieces", mergeOnce(col("pieces"), a, b))
            .localCheckpoint(true) // cut the per-round lineage
        case _ => continue = false
      }
    }
    merges.toList
  }

  /** Batched Sennrich training: learn up to `batchSize` merges per driver
    * round instead of one, keeping every round distributed while provably
    * matching the sequential learner merge for merge. NOTE on fill: on
    * natural text the top character pairs overlap heavily, so the
    * exactness rule below often truncates a round's batch to a few merges
    * — worst case this IS the sequential learner. It is the right tool
    * only when the vocabulary cannot sit on the driver; for every other
    * case `learnMergesFast` removes the round-count limit outright (one
    * Spark job total).
    *
    * Exactness argument. Rank the round's pair table by (count desc, pair
    * asc) — the sequential tie-break. Walk the ranking and accept a PREFIX
    * of pairs that are mutually compatible (no shared symbol, no pair's
    * merged string colliding with another's symbol or merged string),
    * stopping at the first conflicting pair q. A merge only changes counts
    * of pairs sharing one of its symbols (they can only DECREASE), and the
    * pairs it newly creates inherit counts bounded by such an overlapping
    * pair's original count — every one of those is ranked at or below q,
    * so all are bounded by count(q). Truncating the accepted prefix to
    * pairs with count STRICTLY ABOVE count(q) therefore leaves a batch the
    * sequential learner would pick in exactly this order: at each replay
    * step the remaining batch pairs (counts untouched — disjointness) beat
    * every decreased, created, or unseen pair (all ≤ count(q)), and ties
    * among batch pairs resolve by the shared (count, pair) order. If the
    * truncation empties the batch, rank-1 alone is always sequential-exact
    * (it is the round's argmax by definition), so progress is guaranteed
    * and equivalence never degrades — worst case IS the sequential learner.
    * BpeSpec pins batched ≡ sequential on the fixture corpus at several
    * batch sizes.
    *
    * Returns (merges, driver rounds used). */
  def learnMergesBatched(df: DataFrame, textCol: String, nMerges: Int,
                         minCount: Long = 2L, batchSize: Int = 64):
      (Seq[(String, String)], Int) = {
    val spark = df.sparkSession
    import spark.implicits._
    require(batchSize >= 1, "batchSize must be >= 1")
    var vocab = df
      .select(explode(wsTokens(lower(col(textCol)))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .withColumn("pieces", split(col("word"), ""))
      .select(col("cnt"), col("pieces"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ListBuffer.empty[(String, String)]
    var rounds = 0
    var continue = true
    while (continue && merges.size < nMerges) {
      rounds += 1
      val want = math.min(batchSize, nMerges - merges.size)
      // fetch extra ranks so one conflict doesn't starve the batch; the
      // exactness cutoff handles whatever the fetch horizon hides
      val fetch = math.max(4 * want, 64)
      val cands = vocab
        .filter(size(col("pieces")) >= 2)
        .select(col("cnt"), explode(expr(
          "transform(sequence(0, size(pieces) - 2), j -> struct(pieces[j] AS a, pieces[j+1] AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("n"))
        .filter(col("n") >= minCount)
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(fetch).as[(String, String, Long)].collect()
      if (cands.isEmpty) continue = false
      else {
        val accepted = scala.collection.mutable.ListBuffer.empty[(String, String, Long)]
        val symbols = scala.collection.mutable.Set.empty[String]
        val merged = scala.collection.mutable.Set.empty[String]
        // count(q) of the first conflict / first unseen rank — the
        // exactness horizon (everything not accepted is bounded by it)
        var horizon: Option[Long] = None
        val it = cands.iterator
        while (horizon.isEmpty && it.hasNext) {
          val (a, b, n) = it.next()
          val ab = a + b
          val clash = accepted.size >= want ||
            symbols.contains(a) || symbols.contains(b) ||
            merged.contains(a) || merged.contains(b) ||
            symbols.contains(ab) || merged.contains(ab)
          if (clash) horizon = Some(n)
          else { accepted += ((a, b, n)); symbols += a; symbols += b; merged += ab }
        }
        if (horizon.isEmpty && cands.length == fetch)
          horizon = Some(cands.last._3) // unseen ranks are ≤ the last fetched
        val cut = horizon.getOrElse(Long.MinValue)
        val exact = accepted.takeWhile(_._3 > cut).toList match {
          case Nil => accepted.take(1).toList // rank-1 is always sequential-exact
          case xs => xs
        }
        merges ++= exact.map(t => (t._1, t._2))
        vocab = vocab
          .withColumn("pieces", mergeManyOnce(col("pieces"), exact.map(t => (t._1, t._2))))
          .localCheckpoint(true) // cut the per-round lineage
      }
    }
    (merges.toList, rounds)
  }

  /** UTF-8 binary comparison — what Spark's string orderBy (and DuckDB's
    * collation-free ORDER BY) compare, so driver-side tie-breaks match the
    * distributed learner exactly even off the ASCII range. */
  private def isAscii(s: String): Boolean = {
    var i = 0
    while (i < s.length) { if (s.charAt(i) >= 0x80) return false; i += 1 }
    true
  }

  private def utf8Compare(x: String, y: String): Int = {
    // ASCII fast path (no allocation — this comparator runs inside every
    // ranked-tree operation): ASCII orders identically under UTF-16/UTF-8
    if (isAscii(x) && isAscii(y)) return x.compareTo(y)
    val a = x.getBytes("UTF-8"); val b = y.getBytes("UTF-8")
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    a.length - b.length
  }

  /** Greedy left-to-right single-pair merge of a pieces array, driver side
    * (the in-memory mirror of mergeOnce). */
  private def mergeWord(pieces: Array[String], a: String, b: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < pieces.length) {
      if (i + 1 < pieces.length && pieces(i) == a && pieces(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += pieces(i); i += 1 }
    }
    out.toArray
  }

  /** Exact Sennrich learning at production merge counts: ONE distributed
    * pass collapses the corpus to its distinct-word vocabulary
    * (count, pieces) — the classic BPE trainer working set — and the merge
    * loop runs in driver memory with incremental pair-count updates and a
    * ranked tree (remove/re-insert on delta), exactly how reference
    * tokenizer trainers implement fast Sennrich. Identical merges to
    * `learnMerges` (BpeSpec pins it), but a 32k-merge vocabulary costs ONE
    * Spark job plus an in-memory loop instead of 32k sequential jobs —
    * the round-count scale limit is gone entirely.
    *
    * Memory honesty at 100 TB: one trains BPE on a corpus sample (standard
    * practice — the merge table saturates long before the corpus does), and
    * the distinct-word vocab of any realistic sample is millions of rows ×
    * tens of bytes — driver-trivial. `minCount` prunes the singleton tail
    * of a pathological vocab at the source. For a vocab that genuinely
    * cannot sit on the driver, `learnMergesBatched` keeps every round
    * distributed instead. */
  def learnMergesFast(df: DataFrame, textCol: String, nMerges: Int,
                      minCount: Long = 2L): Seq[(String, String)] =
    learnFromVocab(collectVocab(df.select(col(textCol)), textCol),
      nMerges, minCount)

  /** learnMergesFast PLUS the corpus row count, read from an Observation
    * riding the learner's own vocab scan — the q118 seam: the frozen-merge
    * oracle needs an `n_docs` fingerprint, and a dedicated `docs.count()`
    * would pay one extra full corpus scan for pure oracle plumbing. The
    * observation node sits upstream of the explode, so every input row is
    * counted exactly once (empty docs included) while the scan it rides
    * was happening anyway. */
  def learnMergesFastCounted(df: DataFrame, textCol: String, nMerges: Int,
                             minCount: Long = 2L): (Seq[(String, String)], Long) = {
    val obs = org.apache.spark.sql.Observation()
    val vocab = collectVocab(
      df.select(col(textCol)).observe(obs, count(lit(1)).as("n_docs")), textCol)
    val merges = learnFromVocab(vocab, nMerges, minCount)
    (merges, obs.get("n_docs").asInstanceOf[Long])
  }

  /** The one distributed pass: distinct lowercase whitespace words with
    * counts, collected (driver-trivial — see learnMergesFast scaladoc). */
  private def collectVocab(df: DataFrame, textCol: String): Array[(Long, Array[String])] =
    df.select(explode(wsTokens(lower(col(textCol)))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .collect()
      .map(r => (r.getLong(1), r.getString(0).split("")))

  private def learnFromVocab(vocab: Array[(Long, Array[String])],
                             nMerges: Int, minCount: Long): Seq[(String, String)] = {
    import scala.collection.mutable
    val words: Array[Array[String]] = vocab.map(_._2)
    val counts: Array[Long] = vocab.map(_._1)
    val pairOrd: Ordering[(Long, String, String)] = (p, q) => {
      val c = java.lang.Long.compare(q._1, p._1) // count desc
      if (c != 0) c
      else {
        val ca = utf8Compare(p._2, q._2)
        if (ca != 0) ca else utf8Compare(p._3, q._3)
      }
    }
    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    def addPairs(idx: Int, pieces: Array[String], sign: Long): Unit = {
      var i = 0
      while (i + 1 < pieces.length) {
        val p = (pieces(i), pieces(i + 1))
        val n = pairCount.getOrElse(p, 0L) + sign * counts(idx)
        if (n == 0L) pairCount.remove(p) else pairCount.update(p, n)
        if (sign > 0) pairWords.getOrElseUpdate(p, mutable.Set.empty) += idx
        i += 1
      }
    }
    words.indices.foreach(i => addPairs(i, words(i), 1L))
    val ranked = mutable.TreeSet.empty[(Long, String, String)](pairOrd)
    pairCount.foreach { case ((a, b), n) => ranked += ((n, a, b)) }
    val merges = mutable.ListBuffer.empty[(String, String)]
    var continue = true
    while (continue && merges.size < nMerges) {
      ranked.headOption.filter(_._1 >= minCount) match {
        case None => continue = false
        case Some((_, a, b)) =>
          merges += ((a, b))
          // delta-update only the words that contain the merged pair; the
          // index is cleaned lazily (a stale idx just produces zero deltas)
          val touched = pairWords.getOrElse((a, b), mutable.Set.empty).toArray
          val dirty = mutable.Set.empty[(String, String)]
          touched.foreach { idx =>
            val before = words(idx)
            val after = mergeWord(before, a, b)
            if (!java.util.Arrays.equals(
                before.asInstanceOf[Array[AnyRef]], after.asInstanceOf[Array[AnyRef]])) {
              var i = 0
              while (i + 1 < before.length) { dirty += ((before(i), before(i + 1))); i += 1 }
              i = 0
              while (i + 1 < after.length) { dirty += ((after(i), after(i + 1))); i += 1 }
              // remove old ranks BEFORE mutating counts
              dirty.foreach(p => pairCount.get(p).foreach(n => ranked -= ((n, p._1, p._2))))
              addPairs(idx, before, -1L)
              addPairs(idx, after, 1L)
              dirty.foreach(p => pairCount.get(p).foreach(n => ranked += ((n, p._1, p._2))))
              dirty.clear()
              words(idx) = after
            }
          }
          // the merged pair must leave the ranking even if some stale-index
          // bookkeeping left a residue (defensive; counts should be gone)
          pairCount.get((a, b)).foreach(n => ranked -= ((n, a, b)))
          pairCount.remove((a, b))
          pairWords.remove((a, b))
      }
    }
    merges.toList
  }

  /** Corpus-scale BPE token count with a learned merge table — the
    * codegen'd row-local encode path. */
  def bpeTokenCount(text: Column, merges: Seq[(String, String)]): Column =
    org.apache.spark.sql.graft.BpeExprs.bpeTokenCount(lower(text), merges)

  /** Corpus-scale BPE ENCODE with a learned merge table: the piece
    * sequence (array<string>, document order) a trainer consumes —
    * same kernel as [[bpeTokenCount]], so `size(bpeEncode(t, m)) ==
    * bpeTokenCount(t, m)` always. Row-local and codegen'd: tokenizing
    * 100 TB is a projection, no shuffle. Map pieces to vocab ids by
    * posexplode + join against a vocab table (ids are a catalog
    * concern, deliberately not fused into the expression). */
  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column =
    org.apache.spark.sql.graft.BpeExprs.bpeEncode(lower(text), merges)
}
