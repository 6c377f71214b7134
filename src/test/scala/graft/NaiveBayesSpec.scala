package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{NaiveBayes, UnigramLm}

class NaiveBayesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // hand corpus: class A = 2 docs {x x y}, {x}; class B = 1 doc {y z}
  //   counts: A: x→3, y→1 (N_A=4);  B: y→1, z→1 (N_B=2);  V=3
  //   priors: D_A=2, D_B=1, D=3
  private val train = Seq(("A", "x x y"), ("A", "x"), ("B", "y z"))
    .toDF("lang", "text")

  private def micro(d: Double): Long = math.floor(d * 1e6 + 0.5).toLong

  test("train: hand-checked lp/oov/prior micros, one ln per cell") {
    val m = NaiveBayes.train(train, "lang", "text")
      .as[(String, String, Long)].collect()
      .map(t => ((t._1, t._2), t._3)).toMap
    assert(m(("A", "x")) == micro(math.log(4.0 / 7.0)))   // (3+1)/(4+3)
    assert(m(("A", "y")) == micro(math.log(2.0 / 7.0)))
    assert(m(("B", "y")) == micro(math.log(2.0 / 5.0)))
    assert(m(("B", "z")) == micro(math.log(2.0 / 5.0)))
    assert(m(("A", UnigramLm.OovWord)) == micro(math.log(1.0 / 7.0)))
    assert(m(("B", UnigramLm.OovWord)) == micro(math.log(1.0 / 5.0)))
    assert(m(("A", NaiveBayes.PriorWord)) == micro(math.log(2.0 / 3.0)))
    assert(m(("B", NaiveBayes.PriorWord)) == micro(math.log(1.0 / 3.0)))
    // exactly per-class-vocab + C oov + C prior rows, no cross-class rows
    assert(m.size == 4 + 2 + 2 && !m.contains(("A", "z")) && !m.contains(("B", "x")))
  }

  test("score: every class scored, OOV takes class mass, sums are the hand integers") {
    val model = NaiveBayes.train(train, "lang", "text")
    // doc 1 = "x y q": q is OOV to both classes
    val got = NaiveBayes.score(Seq((1L, "x y q")).toDF("id", "txt"),
        "id", "txt", model)
      .as[(Long, String, Long, Long)].collect()
      .map(t => (t._2, (t._3, t._4))).toMap
    val expA = micro(math.log(2.0 / 3.0)) + micro(math.log(4.0 / 7.0)) +
      micro(math.log(2.0 / 7.0)) + micro(math.log(1.0 / 7.0))
    val expB = micro(math.log(1.0 / 3.0)) + micro(math.log(1.0 / 5.0)) +
      micro(math.log(2.0 / 5.0)) + micro(math.log(1.0 / 5.0))
    assert(got == Map("A" -> ((3L, expA)), "B" -> ((3L, expB))))
  }

  test("classify: argmax picks the true max; exact ties go to the LOWEST label") {
    val scored = Seq((1L, "B", 5L, -100L), (1L, "A", 5L, -90L),
        (2L, "B", 5L, -70L), (2L, "A", 5L, -70L))
      .toDF("id", "label", "n_tokens", "ll_micro")
    val got = NaiveBayes.classify(scored, "id")
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set((1L, "A", -90L), (2L, "A", -70L)))
  }

  test("partition-invariance: scores identical at 1 and 7 partitions") {
    val rng = new scala.util.Random(3)
    val langs = Seq("aa", "bb", "cc")
    val docs = (0 until 90).map { i =>
      (i.toLong, langs(i % 3),
        Seq.fill(8)(s"w${rng.nextInt(30)}").mkString(" "))
    }.toDF("doc_id", "lang", "text")
    val model = NaiveBayes.train(docs.filter($"doc_id" % 2 === 0), "lang", "text")
    def run(p: Int) = NaiveBayes.score(
        docs.filter($"doc_id" % 2 === 1).repartition(p), "doc_id", "text", model)
      .as[(Long, String, Long, Long)].collect().sorted.toSeq
    assert(run(1) == run(7) && run(1).nonEmpty)
    // every held-out doc scores against every class
    assert(run(1).size == 45 * 3)
  }
}
