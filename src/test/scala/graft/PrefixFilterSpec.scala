package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ops.Dedup.prefixFilterJoin: the lossless claim is the whole point —
  * every pair the brute-force all-pairs exact Jaccard finds at the
  * threshold must come back, bit-identically, including pairs sitting
  * EXACTLY on the threshold (where a broken ceil in the prefix-length
  * arithmetic would first lose one). */
class PrefixFilterSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def bruteForce(df: org.apache.spark.sql.DataFrame, pct: Int) = {
    val sets = df.select(col("id").as("_i"), graft.ops.Dedup.wordShingles(col("txt"), 3).as("_s"))
    sets.as("a").join(sets.as("b"), col("a._i") < col("b._i"))
      .select(col("a._i").as("id_a"), col("b._i").as("id_b"),
        size(array_intersect(col("a._s"), col("b._s"))).cast("long").as("n_inter"),
        (size(col("a._s")) + size(col("b._s"))
          - size(array_intersect(col("a._s"), col("b._s")))).cast("long").as("n_union"))
      .filter(col("n_inter") * 100 >= col("n_union") * pct)
      .select(col("id_a"), col("id_b"), col("n_inter"), col("n_union"))
  }

  private def words(seed: Int, n: Int): String =
    (0 until n).map(i => s"w${(seed * 31 + i * 7) % 23}_${(seed + i) % 11}").mkString(" ")

  test("lossless vs brute force on a mixed corpus (sizes, overlaps, duplicates)") {
    val docs = (
      (1 to 40).map(i => (i.toLong, words(i, 12 + i % 9))) ++       // varied sizes
      Seq((101L, words(3, 15)), (102L, words(3, 15)),               // exact dup pair
          (103L, words(7, 20) + " extra tail tokens here"),          // near dup of 7
          (104L, words(7, 20)),
          (105L, "tiny"), (106L, "tiny"))                            // sub-k docs
    ).toDF("id", "txt")
    for (pct <- Seq(30, 50, 80)) {
      val fast = graft.ops.Dedup.prefixFilterJoin(docs, "id", "txt", 3, pct)
        .select("id_a", "id_b", "n_inter", "n_union")
        .orderBy("id_a", "id_b").collect().toSeq
      val slow = bruteForce(docs, pct).orderBy("id_a", "id_b").collect().toSeq
      assert(fast == slow, s"pct=$pct")
      assert(fast.nonEmpty, s"pct=$pct found no pairs — fixture lost its planted dups")
    }
  }

  test("threshold boundary: jaccard exactly t is kept, one shingle less is dropped") {
    // a: shingles from 6 words → 4 distinct shingles; b shares 3 of them
    // by construction: J = 3/(4+4-3) = 0.6 exactly at pct=60
    val a = "q1 q2 q3 q4 q5 q6"          // shingles: q1q2q3 q2q3q4 q3q4q5 q4q5q6
    val b = "q1 q2 q3 q4 q5 zz"          // shares q1q2q3 q2q3q4 q3q4q5 → J=3/5
    val docs = Seq((1L, a), (2L, b)).toDF("id", "txt")
    val at = graft.ops.Dedup.prefixFilterJoin(docs, "id", "txt", 3, 60).collect()
    assert(at.length == 1 && at(0).getLong(2) == 3 && at(0).getLong(3) == 5)
    assert(at(0).getLong(4) == 600000L)
    val above = graft.ops.Dedup.prefixFilterJoin(docs, "id", "txt", 3, 61).collect()
    assert(above.isEmpty)
  }

  test("sub-k-word docs fall back to whole-text shingle and still pair up") {
    val docs = Seq((1L, "short doc"), (2L, "short doc"), (3L, "other")).toDF("id", "txt")
    val r = graft.ops.Dedup.prefixFilterJoin(docs, "id", "txt", 3, 100).collect()
    assert(r.length == 1 && r(0).getLong(0) == 1 && r(0).getLong(1) == 2)
    assert(r(0).getLong(2) == 1 && r(0).getLong(3) == 1)
  }
}
