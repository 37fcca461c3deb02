package graft.tmp
object RecProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(4)
    try {
      val df = spark.sql(
        """WITH RECURSIVE t(n) AS (
          |  SELECT 1
          |  UNION ALL
          |  SELECT n + 1 FROM t WHERE n < 5
          |) SELECT * FROM t ORDER BY n""".stripMargin)
      println("RECURSIVE_OK " + df.collect().map(_.getInt(0)).mkString(","))
      println(df.queryExecution.executedPlan.toString.take(2000))
    } catch { case e: Throwable => println("RECURSIVE_FAIL " + e.getMessage.take(300)) }
    spark.stop()
  }
}
