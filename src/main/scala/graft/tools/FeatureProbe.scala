package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev probe: checks availability/semantics of Spark 4 surfaces
  * (recursive CTE, Observation, listagg, approx_top_k, named-parameter
  * SQL) on the pinned runtime before building queries on them. */
object FeatureProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def p(name: String)(body: => String): Unit =
      try println(s"$name OK: " + body)
      catch { case e: Throwable => println(s"$name FAIL: " + e.getMessage.take(300)) }
    import spark.implicits._
    Seq(1L,2L,3L,9L,10L,11L,95L,150L,999L,1500L).toDF("k").createOrReplaceTempView("keys")
    p("REC_TREE") {
      spark.sql("""
        WITH RECURSIVE chain AS (
          SELECT k, k AS root, 0 AS depth FROM keys WHERE k <= 9
          UNION ALL
          SELECT c.k, chain.root, chain.depth + 1
          FROM keys c JOIN chain ON c.k DIV 10 = chain.k
        )
        SELECT depth, count(*) AS n FROM chain GROUP BY depth ORDER BY depth
      """).collect().mkString(" ")
    }
    p("REC_TREE_GUARDED") {
      spark.sql("""
        WITH RECURSIVE chain AS (
          SELECT k, k AS root, 0 AS depth FROM keys WHERE k <= 9
          UNION ALL
          SELECT c.k, chain.root, chain.depth + 1
          FROM keys c JOIN chain ON c.k DIV 10 = chain.k
          WHERE chain.depth < 10
        )
        SELECT depth, count(*) AS n FROM chain GROUP BY depth ORDER BY depth
      """).collect().mkString(" ")
    }
    spark.stop()
  }
}
