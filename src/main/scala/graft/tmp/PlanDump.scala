package graft.tmp
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8)
    val df = graft.SparkEntry.queries("graph_triangles")(spark, "/root/testdata/sf0.01")
    println("=== PLAN START ===")
    println(df.queryExecution.executedPlan.toString)
    println("=== PLAN END ===")
    spark.stop()
  }
}
