package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.QualityModel

/** QualityModel: the frozen linear classifier's logit against hand-computed
  * feature math, zero-denominator guards, and threshold semantics. */
class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  private def logitOf(text: String): Double =
    Seq(text).toDF("text")
      .select(QualityModel.logit(col("text")).as("z"))
      .as[Double].head()

  test("logit matches the hand-computed weighted feature sum") {
    // "the data is good" → 4 tokens, 16 chars, 0 punct, 2 stopwords
    // (the, is), 0 digits, 0 non-ascii
    val fLen = math.min(4.0 / 200.0, 1.0)
    val fPunct = 0.0
    val fStop = math.min(2 * 5.0 / 4.0, 1.0)
    val fDigit = 0.0
    val fCpt = math.min(16.0 / (4 * 20.0), 1.0)
    val expected = -1.2 + 2.4 * fLen + -3.5 * fPunct + 1.6 * fStop +
      -2.0 * fDigit + -0.8 * fCpt + -0.5 * 0.0
    assert(logitOf("the data is good") === expected)
  }

  test("empty text hits every zero-denominator guard, score is finite") {
    val z = logitOf("")
    assert(z === -1.2) // all features 0 → bias alone
  }

  test("noise features lower the score: punctuation, digits, markup-length tokens") {
    val clean = logitOf("the data is good and the value is fine for it")
    assert(logitOf("the data is good ##### $$$$$ and the value!!!") < clean)
    assert(logitOf("the data is 4242 4242 4242 good 127 0 0 1") < clean)
    assert(logitOf("the data is good httpxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxx") < clean)
  }

  test("keep is exactly logit > 0") {
    val df = Seq(
      "the data is good and the value is fine for it",
      "##### $$$$$ !!!!", "").toDF("text")
      .select(QualityModel.logit(col("text")).as("z"),
        QualityModel.keep(col("text")).as("keep"))
    df.as[(Double, Boolean)].collect().foreach { case (z, keep) =>
      assert(keep === (z > 0.0))
    }
  }

  test("features are all within [0, 1]") {
    val rows = Seq(
      "", "x", "the the the the the", "!!!! ????", "12345 67890",
      "one two three four five six seven eight nine ten " * 30)
      .toDF("text")
      .select(array(QualityModel.features(col("text")): _*).as("f"))
      .as[Seq[Double]].collect()
    rows.foreach(_.foreach(f => assert(f >= 0.0 && f <= 1.0, s"feature $f out of range")))
  }

  test("trainHardSigmoid: partitioning-invariant weights, a fit that beats " +
    "the keep-all base rate, and scoring consistent with the learned model") {
    import graft.functions.TextFunctions.{fixedPoint, qualityScore}
    val docs = graft.core.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val label = fixedPoint(qualityScore(col("text")), 4) >= 5000L
    val tw = QualityModel.trainHardSigmoid(docs, "text", label)
    // determinism: the fit must not depend on physical partitioning —
    // every training quantity is a sum of exact integers
    val tw7 = QualityModel.trainHardSigmoid(docs.repartition(7), "text", label)
    assert(tw === tw7, "weights must be partitioning-invariant")
    // the fit discriminates: agreement with the label beats predicting
    // the majority class everywhere (keep-all would score the base rate)
    val scored = docs.select(
      (QualityModel.trainedScoreE8(col("text"), tw) > 0L).as("keep"),
      label.as("y")).as[(Boolean, Boolean)].collect()
    val n = scored.length
    val agree = scored.count(r => r._1 == r._2).toDouble / n
    val base = math.max(scored.count(_._2), n - scored.count(_._2)).toDouble / n
    assert(agree > base,
      f"learned fit ($agree%.3f) must beat the majority base rate ($base%.3f)")
    // non-degenerate: both decisions occur
    assert(scored.exists(_._1) && scored.exists(!_._1),
      "fit must not collapse to a constant decision")
  }

  test("filter agreement (q149): cells partition each source, agree formula " +
    "holds, cells ≡ a row-level replay of q123 keep × q17 threshold") {
    import graft.functions.TextFunctions.{fixedPoint, qualityScore}
    val got = graft.queries.TextQueries.q149FilterAgreement(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (src, n, b, mo, ho, ne, agree) =>
      assert(b + mo + ho + ne === n, s"$src cells don't partition")
      assert(agree === (b + ne) * 10000 / n)
    }
    // row-level replay from the two public scoring surfaces
    val replay = graft.core.Tables(spark, sf, "documents").select(
      col("source"), QualityModel.keep(col("text")).as("mk"),
      (fixedPoint(qualityScore(col("text")), 4) >= 5000L).as("hk"))
      .as[(String, Boolean, Boolean)].collect()
      .groupBy(_._1).view.mapValues { rs =>
        (rs.length.toLong,
          rs.count(r => r._2 && r._3).toLong,
          rs.count(r => r._2 && !r._3).toLong,
          rs.count(r => !r._2 && r._3).toLong,
          rs.count(r => !r._2 && !r._3).toLong)
      }.toMap
    got.foreach { case (src, n, b, mo, ho, ne, _) =>
      assert(replay(src) === ((n, b, mo, ho, ne)), s"$src cells diverge from replay")
    }
    // the audit has signal on the fixture: the filters genuinely disagree
    // somewhere (otherwise the query proves nothing)
    assert(got.map(r => r._4 + r._5).sum > 0, "no disagreement anywhere — fixture dead")
  }
}
