package graft

import org.apache.spark.sql.functions._
import graft.text.QualityClassifier

/** Trained quality classifier ([[graft.text.QualityClassifier]]):
  * decimal-exact training is bit-identical at any partitioning, a
  * planted vocabulary signal is learned and separates the corpus, and
  * scoring classifies on the exact margin. */
class QualityClassifierSpec extends SparkSpec {

  // two disjoint vocabularies: positive docs speak "good", negatives
  // "spam" — a signal logistic regression must separate
  private def corpus = {
    import spark.implicits._
    (0 until 60).map { i =>
      if (i % 2 == 0)
        (i.toLong, s"good clean prose number $i with useful words", 1.0)
      else
        (i.toLong, s"spam junk casino pills number $i click now", 0.0)
    }.toDF("doc_id", "text", "y")
  }

  test("training is bit-identical across partitionings") {
    val base = corpus
    val models = Seq(base.repartition(2), base.repartition(17),
      base.coalesce(1)).map(df =>
      QualityClassifier.train(df, "doc_id", "text", "y",
        dim = 64, iters = 4, lr = 2.0))
    val first = models.head
    models.tail.foreach { m =>
      assert(m.bias == first.bias, "bias must be bit-identical")
      assert(m.w.toSeq == first.w.toSeq,
        "weights must be bit-identical at any partitioning")
    }
  }

  test("a planted vocabulary signal separates the corpus") {
    val model = QualityClassifier.train(corpus, "doc_id", "text", "y",
      dim = 64, iters = 24, lr = 4.0)
    val scored = QualityClassifier.score(corpus, "doc_id", "text", model)
      .join(corpus.select(col("doc_id"), col("y")), "doc_id")
      .select(col("y"), col("keep"), col("margin")).collect()
    scored.foreach { r =>
      assert(r.getBoolean(1) == (r.getDouble(0) == 1.0),
        s"doc with y=${r.getDouble(0)} classified keep=${r.getBoolean(1)} " +
          s"(margin ${r.getDouble(2)})")
    }
    // margins actually separate, not all hovering at 0
    val pos = scored.filter(_.getDouble(0) == 1.0).map(_.getDouble(2)).min
    val neg = scored.filter(_.getDouble(0) == 0.0).map(_.getDouble(2)).max
    assert(pos > 0 && neg < 0 && pos - neg > 0.1,
      s"expected a real margin gap, got [$neg, $pos]")
  }

  test("score is the rounded sigmoid of the margin; keep uses the exact margin") {
    val model = QualityClassifier.train(corpus, "doc_id", "text", "y",
      dim = 64, iters = 4, lr = 2.0)
    QualityClassifier.score(corpus, "doc_id", "text", model)
      .collect().foreach { r =>
        val margin = r.getDouble(1)
        val score = r.getDouble(2)
        val want = math.rint(1.0 / (1.0 + math.exp(-margin)) * 1e6) / 1e6
        assert(math.abs(score - want) < 1e-9,
          s"score $score != rounded sigmoid $want of margin $margin")
        assert(r.getBoolean(3) == (margin > 0))
      }
  }
}
