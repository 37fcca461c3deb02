package graft

import graft.plans.{CubeOps, CubePipeline}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The `genesis-cube` DataSource V2 reader (sources/CubeDataSource):
  * executor-side schema-from-header, one partition per cube file, zero
  * driver jobs for N cubes, column pruning pushed into the reader —
  * and row-for-row agreement with the plan-composition parse path.
  */
class CubeSourceSpec extends SparkSpec {

  private lazy val paths = Seq(CubeOps.ensureFixture(), CubeOps.ensureArea())

  private def viaSource = spark.read.format("genesis-cube")
    .load(paths: _*)

  test("source rows equal the parseAll plan path on the same files") {
    // Same cells through two independent ingestion implementations
    // (Column-expression parse vs DSv2 reader) — cube naming and the
    // shared relation's double values aligned for the compare.
    val src = viaSource
      .select(col("cube"), col("region"), to_json(col("dims")).as("dj"),
        col("time"), col("measure"), col("value"), col("quality"))
    val plan = CubePipeline.parseAll(spark,
        Seq(paths.head -> "graft_cube_12411_mini",
          paths(1) -> "graft_cube_area_mini"))
      .select(col("cube"), col("region"), to_json(col("dims")).as("dj"),
        col("time"), col("measure"),
        col("value").cast("double").as("value"), col("quality"))
    assert(src.except(plan).count() == 0 && plan.except(src).count() == 0,
      "DSv2 reader and Column parser disagree on cells")
    assert(src.count() == 10)
  }

  test("one input partition per cube file; planning runs zero Spark jobs") {
    val sc = spark.sparkContext
    val group = s"cube-source-plan-${System.nanoTime()}"
    sc.setJobGroup(group, "plan only")
    val df = viaSource
    val parts = df.queryExecution.toRdd.getNumPartitions
    sc.clearJobGroup()
    assert(parts == paths.size, s"$parts partitions for ${paths.size} files")
    assert(sc.statusTracker.getJobIdsForGroup(group).isEmpty,
      "planning the cube source must not run driver jobs")
  }

  test("column pruning reaches the reader (ReadSchema shrinks)") {
    val p = viaSource.select("cube", "measure")
      .queryExecution.executedPlan.toString
    assert(p.contains("ReadSchema: struct<cube:string,measure:string>"),
      s"pruned read schema missing: $p")
  }

  test("a directory load picks up every cube file in it") {
    val dir = Files.createTempDirectory("cube_src")
    Files.writeString(dir.resolve("a.csv"), CubeOps.fixtureContent)
    Files.writeString(dir.resolve("b.csv"), CubeOps.areaContent)
    val df = spark.read.format("genesis-cube").load(dir.toString)
    assert(df.select("cube").distinct().collect().map(_.getString(0)).sorted
      .toSeq == Seq("a", "b"))
    assert(df.count() == 10)
  }

  test("a cube predicate prunes to the matching files only") {
    val dir = Files.createTempDirectory("cube_src_prune")
    Files.writeString(dir.resolve("a.csv"), CubeOps.fixtureContent)
    Files.writeString(dir.resolve("b.csv"), CubeOps.areaContent)
    val df = spark.read.format("genesis-cube").load(dir.toString)
      .filter(col("cube") === "a")
    // file-level partition pruning: the non-matching cube never plans
    assert(df.queryExecution.toRdd.getNumPartitions == 1,
      "cube = 'a' must plan exactly one input partition")
    assert(df.count() == 6)
    assert(df.queryExecution.executedPlan.toString.contains("PushedFilters"),
      "pushed cube filter missing from scan description")
    // best-effort contract: a filter the source can't prune still
    // evaluates correctly above the scan
    val in = spark.read.format("genesis-cube").load(dir.toString)
      .filter(col("cube").isin("a", "zzz"))
    assert(in.queryExecution.toRdd.getNumPartitions == 1 && in.count() == 6)
  }

  test("time/measure predicates reach the reader and keep row parity " +
    "with the unpushed path (r16 verdict #4)") {
    // Area (two measures, 2020) plus AGS (one measure, 2019 AND 2020):
    // together every predicate below both keeps and drops rows, so
    // parity is tested with real discrimination on each side.
    val df = spark.read.format("genesis-cube")
      .load(CubeOps.ensureArea(), CubeOps.ensureAgs())
    val all = df.collect().map(_.toSeq).toSet // unpushed reference
    for ((pred, name) <- Seq(
        (col("time") === 2020, "time ="),
        (col("time") >= 2020, "time >="),
        (col("time").isin(2019, 2020), "time IN"),
        (col("measure") === "FLAECHE", "measure ="),
        (col("measure").isin("BEVDICHTE", "zzz"), "measure IN"),
        (col("time") === 2020 && col("measure") === "FLAECHE", "both"))) {
      val pushed = df.filter(pred)
      val plan = pushed.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters: [") &&
        (plan.contains("time") || plan.contains("measure")),
        s"$name must reach the scan description: $plan")
      // Row parity: the pushed scan must emit exactly the rows the
      // residual filter over the full read keeps (pruning is an
      // optimization, never a semantics change).
      val viaPush = pushed.collect().map(_.toSeq).toSet
      assert(viaPush.subsetOf(all), s"$name emitted rows outside the table")
      assert(viaPush == all.filter { r =>
        val time = r(2).asInstanceOf[Int]
        val measure = r(3).asInstanceOf[String]
        name match {
          case "time =" => time == 2020
          case "time >=" => time >= 2020
          case "time IN" => time == 2019 || time == 2020
          case "measure =" => measure == "FLAECHE"
          case "measure IN" => measure == "BEVDICHTE"
          case "both" => time == 2020 && measure == "FLAECHE"
        }
      }, s"$name row parity broke")
    }
    // Planning with pushed row filters still runs zero Spark jobs.
    val sc = spark.sparkContext
    val group = s"cube-rowfilter-plan-${System.nanoTime()}"
    sc.setJobGroup(group, "plan only")
    df.filter(col("time") === 2020).queryExecution.toRdd.getNumPartitions
    sc.clearJobGroup()
    assert(sc.statusTracker.getJobIdsForGroup(group).isEmpty,
      "planning with pushed time filters must not run driver jobs")
  }

  test("null-token values parse to NULL with the flag kept, like the parser") {
    val dir = Files.createTempDirectory("cube_src_null")
    Files.writeString(dir.resolve("n.csv"), Seq(
      "K;DQ;NULLY",
      "D;DQA;DINSG;1;1",
      "D;DQZ;JAHR;2",
      "D;DQI;BEVSTD;ANZ;FEST;GANZ;0",
      "D;QEI;DINSG;JAHR;BEVSTD",
      "D;11;2020;...;d",
      "D;02;2020;123;e").mkString("\n"))
    val rows = spark.read.format("genesis-cube").load(dir.toString)
      .select("region", "value", "quality").orderBy("region")
      .collect()
    assert(rows(0).getString(0) == "02" && rows(0).getDouble(1) == 123.0)
    assert(rows(1).getString(0) == "11" && rows(1).isNullAt(1) &&
      rows(1).getString(2) == "d")
  }
}
