package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's command surface as a library API
  * [R: genesapi-cli subcommands parse/build/schema — UNVERIFIED]:
  * many heterogeneous cube files → one normalized frame → nested fact
  * documents → a cube catalog. Each step is a plain DataFrame
  * transform; [[graft.sources.Sinks]] handles export/storage.
  *
  * Heterogeneity strategy: every cube declares its own axes
  * (schema-from-header), so per-cube frames carry different `dim_*`
  * columns. [[normalized]] folds them into one `dims MAP<STRING,
  * STRING>` column — the shared long schema (SURVEY.md §1.2) that
  * unions across cubes and partitions cleanly by (cube, time) at
  * 100 TB.
  */
object CubePipeline {

  /** Fold per-cube `dim_*` columns into a single `dims` map. */
  def normalized(parsed: DataFrame): DataFrame = {
    val dimCols = parsed.columns.filter(_.startsWith("dim_")).sorted
    val entries = dimCols.flatMap(c =>
      Seq(lit(c.stripPrefix("dim_")), col(c)))
    parsed.select(col("cube"), col("region"), col("time"),
      col("measure"), col("value"), col("quality"),
      (if (entries.isEmpty) typedLit(Map.empty[String, String])
       else map(entries: _*)).as("dims"))
  }

  /** Parse + normalize + union a set of (path, cubeName) cube files.
    * Each cube contributes its own schema-from-header parse; the union
    * is the corpus-wide long table the reference stores per download.
    */
  def parseAll(spark: SparkSession, cubes: Seq[(String, String)]): DataFrame =
    cubes.map { case (path, name) =>
      normalized(CubeParser.parse(spark, path, name))
    }.reduce(_.unionByName(_))

  /** Nested fact documents: one JSON doc per (cube, region, time, dim
    * combination), measures as a sorted map of {value, quality} — the
    * reference's Elasticsearch document shape. Maps aren't groupable,
    * so the dim context groups by its sorted entry array.
    */
  def facts(normalized: DataFrame): DataFrame =
    normalized
      .withColumn("dim_entries", sort_array(map_entries(col("dims"))))
      .groupBy("cube", "region", "time", "dim_entries")
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("measure"), struct(col("value"), col("quality"))))))
        .as("measures"))
      .select(col("cube"), col("region"), col("time"),
        to_json(struct(col("region"), col("time").as("year"),
          map_from_entries(col("dim_entries")).as("dims"),
          col("measures"))).as("doc"))

  /** Cube catalog / TOC: per-cube inventory of axes, measures, time
    * coverage, and cell counts — what the reference's schema command
    * derives to drive its API surface.
    */
  def catalog(normalized: DataFrame): DataFrame =
    normalized
      .withColumn("dim_name", explode_outer(map_keys(col("dims"))))
      .groupBy("cube")
      .agg(
        array_join(sort_array(collect_set(col("dim_name"))), ",").as("axes"),
        array_join(sort_array(collect_set(col("measure"))), ",").as("measures"),
        min(col("time")).as("time_min"),
        max(col("time")).as("time_max"),
        countDistinct(col("region"), col("time"),
          to_json(col("dims"))).as("n_cells"))
      .orderBy("cube")
}
