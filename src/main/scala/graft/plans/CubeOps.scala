package graft.plans

import graft.T
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-facing cube-ingestion keys (SURVEY.md §2.9): the GENESIS
  * flat-file parse, the heterogeneous multi-cube union, the catalog
  * inventory, and the quality-flag-aware aggregation — each
  * oracle-checked against DuckDB reading THE SAME flat files.
  *
  * The inputs are the FIXTURES.md §B miniature cubes, materialized once
  * under /tmp (deterministic content, idempotent write) — the driver's
  * sf parquet dirs don't carry a cube file, and the parse path itself
  * (schema-from-header → positional Column extraction in executors) is
  * what these keys put under the oracle gate. Scale is exercised
  * elsewhere: the parser's data pass is a distributed text scan whose
  * cost grows only with data records (ScaleSpec), and the header
  * collect is O(10) rows by construction.
  */
object CubeOps {
  type Q = (SparkSession, String) => DataFrame

  /** FIXTURES.md §B content, pinned here so runtime keys don't depend
    * on test resources. Kept byte-identical with
    * src/test/resources/cube_12411_mini.csv (asserted in CubeParserSpec).
    */
  val fixtureContent: String = Seq(
    "K;DQ;FACH-SCHL;GHH-ART;TS;\"GENESAPI MINI FIXTURE\"",
    "K;DQA;NAME;RHF-BSR;RHF-ACHSE",
    "D;DQA;DINSG;1;1",
    "D;DQA;GES;2;2",
    "K;DQZ;NAME;ZI-RHF-BSR",
    "D;DQZ;JAHR;3",
    "K;DQI;NAME;ME-NAME;DST;TYP;NKM-STELLEN",
    "D;DQI;BEVSTD;ANZ;FEST;GANZ;0",
    "D;QEI;DINSG;GES;JAHR;BEVSTD",
    "D;11;GESM;2019;1793847;e",
    "D;11;GESW;2019;1875217;e",
    "D;11;GESM;2020;1790658;p",
    "D;11;GESW;2020;1874432;p",
    "D;02;GESM;2019;934846;e",
    "D;02;GESW;2019;912384;e").mkString("\n")

  val fixturePath = "/tmp/graft_cube_12411_mini.csv"

  /** Second fixture, DIFFERENT schema (single axis, two measures of
    * differing declared scales) — exercises the heterogeneous-schema
    * union that is the reference's core multi-cube model.
    */
  val areaContent: String = Seq(
    "K;DQ;AREA",
    "D;DQA;DINSG;1;1",
    "D;DQZ;JAHR;2",
    "D;DQI;FLAECHE;QKM;FEST;DEZ;2",
    "D;DQI;BEVDICHTE;ANZ;FEST;DEZ;1",
    "D;QEI;DINSG;JAHR;FLAECHE;BEVDICHTE",
    "D;02;2020;755.09;e;2480.3;e",
    "D;11;2020;891.12;e;4090.6;p").mkString("\n")

  val areaPath = "/tmp/graft_cube_area_mini.csv"

  /** Revision 2 of the 12411 fixture: the 2020 cells arrive FINALIZED
    * (new values, flag e→`e`), 2021 lands provisionally, and neither
    * the 2019 cells nor region 02 are in the download — they must
    * survive from revision 1 under the read-time merge
    * ([[CubePipeline.latestRevision]]).
    */
  val fixtureV2Content: String = Seq(
    "K;DQ;FACH-SCHL;GHH-ART;TS;\"GENESAPI MINI FIXTURE V2\"",
    "K;DQA;NAME;RHF-BSR;RHF-ACHSE",
    "D;DQA;DINSG;1;1",
    "D;DQA;GES;2;2",
    "K;DQZ;NAME;ZI-RHF-BSR",
    "D;DQZ;JAHR;3",
    "K;DQI;NAME;ME-NAME;DST;TYP;NKM-STELLEN",
    "D;DQI;BEVSTD;ANZ;FEST;GANZ;0",
    "D;QEI;DINSG;GES;JAHR;BEVSTD",
    "D;11;GESM;2020;1792801;e",
    "D;11;GESW;2020;1876020;e",
    "D;11;GESM;2021;1795003;p",
    "D;11;GESW;2021;1878911;p").mkString("\n")

  val fixtureV2Path = "/tmp/graft_cube_12411_mini_v2.csv"

  /** Third fixture: 8-digit AGS Gemeinde codes (2-digit Land prefix,
    * 5-digit Kreis prefix — SURVEY §1.1's region hierarchy), two
    * years, mixed e/p flags — the input for the prefix rollup. Codes
    * picked so every level aggregates >1 child somewhere: Land 05 has
    * Kreise 05315 (one Gemeinde) and 05334 (two).
    */
  val agsContent: String = Seq(
    "K;DQ;AGS-MINI",
    "D;DQA;DINSG;1;1",
    "D;DQZ;JAHR;2",
    "D;DQI;BEVSTD;ANZ;FEST;GANZ;0",
    "D;QEI;DINSG;JAHR;BEVSTD",
    "D;11000000;2019;3644826;e",
    "D;11000000;2020;3669491;p",
    "D;02000000;2020;1899160;e",
    "D;05315000;2019;1085664;e",
    "D;05315000;2020;1083498;e",
    "D;05334002;2020;249070;p",
    "D;05334032;2020;110000;e").mkString("\n")

  val agsPath = "/tmp/graft_cube_ags_mini.csv"

  /** Write-once (content-checked, atomic — [[graft.T.ensureFile]]) so
    * both Spark and the driver's later DuckDB pass read the identical
    * file, even if one pass races another session's write.
    */
  private def ensure(path: String, content: String): String =
    graft.T.ensureFile(path, content)

  def ensureFixture(): String = ensure(fixturePath, fixtureContent)
  def ensureArea(): String = ensure(areaPath, areaContent)
  def ensureAgs(): String = ensure(agsPath, agsContent)
  def ensureFixtureV2(): String = ensure(fixtureV2Path, fixtureV2Content)

  val queries: Map[String, Q] = Map(
    // Schema-from-header ingestion: the reference's single most-used
    // capability, end-to-end — header drives layout, executors parse
    // data records positionally, one output row per (cell, measure).
    // value is DECIMAL(18,0) inside (declared 0 decimals) and cast to
    // double only here, in the driver-facing final projection.
    "cube_parse" -> ((s, _) => {
      val path = ensureFixture()
      CubeParser.parse(s, path, "12411_mini")
        .select(col("cube"), col("region"), col("dim_GES"), col("time"),
          col("measure"), col("value").cast("double").as("value"),
          col("quality"))
        .orderBy("region", "dim_GES", "time")
    }),

    // Heterogeneous multi-cube union: two cubes with DIFFERENT schemas
    // (axes DINSG+GES / one measure vs DINSG-only / two measures of
    // different declared scales) parse under their own layouts and
    // union into the shared long form, per-cube dims folded into a map
    // (emitted as compact JSON — the house rule bans MAP finals). The
    // reference's core storage model, driver-checked.
    "cube_union" -> ((s, _) => {
      val paths = Seq(ensureFixture() -> "12411_mini", ensureArea() -> "area")
      CubePipeline.parseAll(s, paths)
        .select(col("cube"), col("region"), to_json(col("dims")).as("dims_json"),
          col("time"), col("measure"),
          col("value").cast("double").as("value"), col("quality"))
        .orderBy("cube", "region", "dims_json", "time", "measure")
    }),

    // API serving shape (r9): the reference's product surface is a
    // region-statistics data API — "give me everything about region X"
    // returns NESTED fact documents, not long rows. cube_serve
    // composes the two halves that already exist ([[CubePipeline
    // .query]]'s pushdown selection + [[CubePipeline.facts]]'s
    // pivot-and-nest JSON rendering) into that response: filter by
    // region across ALL loaded cubes, one compact doc per
    // (cube, region, dims, time) cell group. At scale the region
    // filter prunes before the nest shuffle — the serving query never
    // aggregates what it doesn't return.
    "cube_serve" -> ((s, _) => {
      val paths = Seq(ensureFixture() -> "12411_mini", ensureArea() -> "area")
      CubePipeline.facts(
          CubePipeline.query(CubePipeline.parseAll(s, paths),
            region = Some("11")))
        .orderBy("cube", "time", "doc")
    }),

    // DSv2 ingestion (r8): the SAME two heterogeneous cubes read
    // through the `genesis-cube` DataSource V2 reader — schema-from-
    // header runs in EXECUTORS (one InputPartition per cube file, the
    // driver only lists files: O(1) driver cost at the ~10⁴-cube
    // corpus, vs parseAll's one-job header batch + per-cube plan).
    // Same cells as cube_union, so the oracle replay differs only in
    // the cube names (file basenames) and the value type (the shared
    // relation's DOUBLE vs parseAll's per-cube DECIMAL — both project
    // double at this driver-facing edge anyway).
    "cube_source" -> ((s, _) => {
      val paths = Seq(ensureFixture(), ensureArea())
      s.read.format("genesis-cube").load(paths: _*)
        .select(col("cube"), col("region"), to_json(col("dims")).as("dims_json"),
          col("time"), col("measure"), col("value"), col("quality"))
        .orderBy("cube", "region", "dims_json", "time", "measure")
    }),

    // Catalog/TOC over the parsed cube: axes (dims minus the region
    // axis), measures, time span, distinct cell count — the schema
    // command's flat inventory, driver-checked. (The nested tree form
    // is `CubePipeline.catalogNested`, golden-tested — JSON assembly
    // differs too much across engines to hash-match.)
    "cube_catalog" -> ((s, _) => {
      val path = ensureFixture()
      CubePipeline.catalog(CubePipeline.normalized(
        CubeParser.parse(s, path, "12411_mini")))
    }),

    // Flag-aware aggregation: sum excluding provisional (`p`) cells,
    // with per-flag cell counts as explicit columns.
    "cube_agg_flags" -> ((s, _) => {
      val path = ensureFixture()
      val normalized = CubePipeline.normalized(
        CubeParser.parse(s, path, "12411_mini"))
      val flagCols = CubePipeline.knownFlags.map(f => col(s"n_$f"))
      CubePipeline.aggFlags(normalized, exclude = Set("p"))
        .select(Seq(col("cube"), col("measure"), col("time"),
          T.money(col("sum_ok")).as("sum_ok"),
          col("n_used"), col("n_excluded")) ++ flagCols: _*)
        .orderBy("cube", "measure", "time")
    }),

    // AGS prefix-hierarchy rollup over PARSED cube cells (§1.1): the
    // 8-digit Gemeinde fixture rolls up to 5-digit Kreis, 2-digit
    // Land, and the DG federal total via grouping sets on substring
    // prefixes ([[CubePipeline.regionRollup]]), provisional (`p`)
    // cells excluded from sums. Oracle replays each level as a
    // conditional aggregation over the same CSV.
    "cube_region_rollup" -> ((s, _) => {
      val path = ensureAgs()
      val cells = CubePipeline.normalized(
        CubeParser.parse(s, path, "ags_mini"))
      CubePipeline.regionRollup(cells, exclude = Set("p"))
        .select(col("cube"), col("measure"), col("time"), col("level"),
          col("region_prefix"),
          T.money(col("sum_ok")).as("sum_ok"), col("n_used"))
        .orderBy("time", "level", "region_prefix")
    }),

    // Consumer lookup over the multi-cube store ([[CubePipeline
    // .query]]): one region + one year across BOTH heterogeneous
    // cubes — the reference's serving-side query shape, end of the
    // parse → store → query chain. Same projection discipline as
    // cube_union (dims as JSON, value as double).
    "cube_query" -> ((s, _) => {
      val paths = Seq(ensureFixture() -> "12411_mini", ensureArea() -> "area")
      CubePipeline.query(CubePipeline.parseAll(s, paths),
          region = Some("11"), timeFrom = Some(2020), timeTo = Some(2020))
        .select(col("cube"), col("region"), to_json(col("dims")).as("dims_json"),
          col("time"), col("measure"),
          col("value").cast("double").as("value"), col("quality"))
        .orderBy("cube", "dims_json", "measure")
    }),

    // Latest-revision-wins replay (§1.1 Storage): two downloads of the
    // SAME cube land — v2 finalizes 2020, adds 2021, omits 2019 and
    // region 02 — and the read-time merge keeps exactly the newest
    // version of every cell plus the v1-only survivors, revision
    // column showing provenance. Oracle replays the ranked-window
    // merge over both CSVs.
    "cube_latest" -> ((s, _) => {
      val v1 = CubePipeline.normalized(
        CubeParser.parse(s, ensureFixture(), "12411"))
      val v2 = CubePipeline.normalized(
        CubeParser.parse(s, ensureFixtureV2(), "12411"))
      CubePipeline.latestRevision(Seq(v1 -> 1, v2 -> 2))
        .select(col("cube"), col("region"),
          to_json(col("dims")).as("dims_json"), col("time"),
          col("measure"), col("value").cast("double").as("value"),
          col("quality"), col("revision"))
        .orderBy("region", "dims_json", "time", "measure")
    }),

    // End-to-end ETL macro (r18, r17 verdict #5): the reference's
    // whole ingest chain replayed as ONE key — parse two revisions of
    // the population cube plus the heterogeneous area cube
    // ([[CubePipeline.parseAll]]), latest-revision-wins merge across
    // the downloads ([[CubePipeline.latestRevision]]; area cells,
    // present only in revision 1, survive trivially), then the
    // nested-JSON fact-document build ([[CubePipeline.facts]]) — the
    // export shape cube_serve serves one region of. cube_latest gates
    // the merge and cube_serve the doc rendering; this key gates
    // their COMPOSITION: the full download → dedup → document chain a
    // catalog refresh runs. Scale shape: one ranked-window shuffle on
    // the cell key + one nest-agg shuffle on the doc key — one
    // shuffle per stage boundary, nothing driver-sized.
    "cube_etl" -> ((s, _) => {
      val rev1 = CubePipeline.parseAll(s,
        Seq(ensureFixture() -> "12411", ensureArea() -> "area"))
      val rev2 = CubePipeline.parseAll(s, Seq(ensureFixtureV2() -> "12411"))
      CubePipeline.facts(
          CubePipeline.latestRevision(Seq(rev1 -> 1, rev2 -> 2))
            .drop("revision"))
        .orderBy("cube", "region", "time", "doc")
    }),

    // Revision diff (r9): added/removed/changed/unchanged per cell
    // between two revisions of the same cube — the incremental-sync
    // report a catalog updater emits before applying cube_latest's
    // merge ("what did this GENESIS release actually change"). FULL
    // OUTER join on the cell key; PRESENCE markers distinguish
    // "absent from revision" from "present with NULL value" (GENESIS
    // null tokens make value-NULL a real state), and the value compare
    // is null-safe (<=>). At catalog scale this is an equi-join on the
    // cell key — shuffle-bounded, broadcastable when one revision is a
    // small delta.
    "cube_diff" -> ((s, _) => {
      def cells(path: String) =
        CubePipeline.normalized(CubeParser.parse(s, path, "12411"))
          .select(col("region"), to_json(col("dims")).as("dims_json"),
            col("time"), col("value").cast("double").as("value"))
      cellDiff(cells(ensureFixture()), cells(ensureFixtureV2()))
        .orderBy("region", "dims_json", "time")
    })
  )

  /** Revision diff core: added/removed/changed/unchanged per cell
    * between two revisions `(region, dims_json, time, value)` of the
    * same cube. FULL OUTER join on the cell key; PRESENCE markers
    * distinguish "absent from revision" from "present with NULL
    * value" (GENESIS null tokens make value-NULL a real state), and
    * the value compare is null-safe (<=>). At catalog scale this is
    * an equi-join on the cell key — shuffle-bounded, broadcastable
    * when one revision is a small delta. ≡-to-map-diff spec'd in
    * PropertySpec. */
  def cellDiff(v1: DataFrame, v2: DataFrame): DataFrame = {
    val a = v1.select(col("region"), col("dims_json"), col("time"),
      col("value").as("old_value"), lit(true).as("in_v1"))
    val b = v2.select(col("region"), col("dims_json"), col("time"),
      col("value").as("new_value"), lit(true).as("in_v2"))
    a.join(b, Seq("region", "dims_json", "time"), "full_outer")
      .select(col("region"), col("dims_json"), col("time"),
        when(coalesce(col("in_v1"), lit(false)) === false, "added")
          .when(coalesce(col("in_v2"), lit(false)) === false, "removed")
          .when(col("old_value") <=> col("new_value"), "unchanged")
          .otherwise("changed").as("status"),
        col("old_value"), col("new_value"))
  }

  // Oracle side reads the SAME /tmp files: ragged semicolon rows via
  // null_padding, then the same shape-anchored data filter and
  // positional extraction the Spark parser generates.
  private def duckReadOf(path: String) =
    s"""read_csv('$path', delim=';', header=false, quote='"',
       |  null_padding=true, auto_detect=false,
       |  columns={'c0':'VARCHAR','c1':'VARCHAR','c2':'VARCHAR',
       |  'c3':'VARCHAR','c4':'VARCHAR','c5':'VARCHAR',
       |  'c6':'VARCHAR'})""".stripMargin
  private def duckDataOf(path: String) =
    s"""SELECT * FROM ${duckReadOf(path)}
       |WHERE c0 = 'D' AND c1 NOT IN ('DQA','DQZ','DQI','QEI')""".stripMargin
  private val duckRead = duckReadOf(fixturePath)
  private val duckData = duckDataOf(fixturePath)
  private val duckNull = "('-','...','…','/','x','.')"

  val oracle: Map[String, String] = Map(
    "cube_parse" ->
      s"""WITH data AS ($duckData)
         |SELECT '12411_mini' AS cube, c1 AS region, c2 AS dim_GES,
         |  CAST(c3 AS INT) AS "time", 'BEVSTD' AS measure,
         |  CASE WHEN c4 IN $duckNull THEN NULL
         |       ELSE CAST(c4 AS DOUBLE) END AS value,
         |  c5 AS quality
         |FROM data ORDER BY region, dim_GES, "time"""".stripMargin,
    // The serving docs rebuilt by string concatenation — byte-for-byte
    // what Spark's to_json renders (field order = struct order, map
    // keys pre-sorted, doubles print identically: '1793847.0',
    // '2480.3' verified); region 11 of both fixture cubes.
    "cube_serve" ->
      s"""WITH mini AS (${duckDataOf(fixturePath)}),
         |area AS (${duckDataOf(areaPath)}),
         |docs AS (
         |  SELECT '12411_mini' AS cube, c1 AS region, CAST(c3 AS INT)
         |      AS "time",
         |    '{"region":"' || c1 || '","year":' || c3 ||
         |    ',"dims":{"GES":"' || c2 || '"},"measures":{"BEVSTD":{"value":'
         |    || CAST(CAST(c4 AS DOUBLE) AS VARCHAR) || ',"quality":"' || c5
         |    || '"}}}' AS doc
         |  FROM mini WHERE c1 = '11'
         |  UNION ALL
         |  SELECT 'area', c1, CAST(c2 AS INT),
         |    '{"region":"' || c1 || '","year":' || c2 ||
         |    ',"dims":{},"measures":{"BEVDICHTE":{"value":'
         |    || CAST(CAST(c5 AS DOUBLE) AS VARCHAR) || ',"quality":"' || c6
         |    || '"},"FLAECHE":{"value":'
         |    || CAST(CAST(c3 AS DOUBLE) AS VARCHAR) || ',"quality":"' || c4
         |    || '"}}}'
         |  FROM area WHERE c1 = '11')
         |SELECT cube, region, "time", doc FROM docs
         |ORDER BY cube, "time", doc""".stripMargin,

    // Union oracle replays both cubes' positional extraction and the
    // dims-map JSON fold, then unions — one SELECT per (cube, measure).
    "cube_union" ->
      s"""WITH mini AS (${duckDataOf(fixturePath)}),
         |area AS (${duckDataOf(areaPath)}),
         |u AS (
         |  SELECT '12411_mini' AS cube, c1 AS region,
         |    '{"GES":"' || c2 || '"}' AS dims_json,
         |    CAST(c3 AS INT) AS t, 'BEVSTD' AS measure,
         |    CASE WHEN c4 IN $duckNull THEN NULL
         |         ELSE CAST(c4 AS DOUBLE) END AS value,
         |    c5 AS quality
         |  FROM mini
         |  UNION ALL
         |  SELECT 'area', c1, '{}', CAST(c2 AS INT), 'FLAECHE',
         |    CASE WHEN c3 IN $duckNull THEN NULL
         |         ELSE CAST(c3 AS DOUBLE) END, c4
         |  FROM area
         |  UNION ALL
         |  SELECT 'area', c1, '{}', CAST(c2 AS INT), 'BEVDICHTE',
         |    CASE WHEN c5 IN $duckNull THEN NULL
         |         ELSE CAST(c5 AS DOUBLE) END, c6
         |  FROM area)
         |SELECT cube, region, dims_json, t AS "time", measure, value, quality
         |FROM u ORDER BY cube, region, dims_json, "time", measure""".stripMargin,

    // Same union replay as cube_union with the DSv2 reader's cube
    // naming (file basename minus extension).
    "cube_source" ->
      s"""WITH mini AS (${duckDataOf(fixturePath)}),
         |area AS (${duckDataOf(areaPath)}),
         |u AS (
         |  SELECT 'graft_cube_12411_mini' AS cube, c1 AS region,
         |    '{"GES":"' || c2 || '"}' AS dims_json,
         |    CAST(c3 AS INT) AS t, 'BEVSTD' AS measure,
         |    CASE WHEN c4 IN $duckNull THEN NULL
         |         ELSE CAST(c4 AS DOUBLE) END AS value,
         |    c5 AS quality
         |  FROM mini
         |  UNION ALL
         |  SELECT 'graft_cube_area_mini', c1, '{}', CAST(c2 AS INT), 'FLAECHE',
         |    CASE WHEN c3 IN $duckNull THEN NULL
         |         ELSE CAST(c3 AS DOUBLE) END, c4
         |  FROM area
         |  UNION ALL
         |  SELECT 'graft_cube_area_mini', c1, '{}', CAST(c2 AS INT), 'BEVDICHTE',
         |    CASE WHEN c5 IN $duckNull THEN NULL
         |         ELSE CAST(c5 AS DOUBLE) END, c6
         |  FROM area)
         |SELECT cube, region, dims_json, t AS "time", measure, value, quality
         |FROM u ORDER BY cube, region, dims_json, "time", measure""".stripMargin,

    // Catalog oracle derives axes/measures FROM THE HEADER RECORDS
    // (DQA names minus the QEI-leading region axis; DQI names), not
    // from literals — the same schema-from-header derivation the
    // parser performs.
    "cube_catalog" ->
      s"""WITH raw AS (SELECT * FROM $duckRead),
         |data AS ($duckData),
         |axes AS (
         |  SELECT string_agg(c2, ',' ORDER BY c2) AS axes
         |  FROM raw WHERE c0 = 'D' AND c1 = 'DQA'
         |    AND c2 <> (SELECT c2 FROM raw WHERE c0 = 'D' AND c1 = 'QEI')),
         |meas AS (
         |  SELECT string_agg(c2, ',' ORDER BY c2) AS measures
         |  FROM raw WHERE c0 = 'D' AND c1 = 'DQI')
         |SELECT '12411_mini' AS cube, axes.axes, meas.measures,
         |  min(CAST(c3 AS INT)) AS time_min,
         |  max(CAST(c3 AS INT)) AS time_max,
         |  count(DISTINCT (c1, c2, c3)) AS n_cells
         |FROM data, axes, meas
         |GROUP BY axes.axes, meas.measures
         |ORDER BY cube""".stripMargin,
    "cube_agg_flags" ->
      s"""WITH data AS ($duckData),
         |cells AS (
         |  SELECT '12411_mini' AS cube, 'BEVSTD' AS measure,
         |    CAST(c3 AS INT) AS t,
         |    CASE WHEN c4 IN $duckNull THEN NULL
         |         ELSE CAST(c4 AS DECIMAL(18,0)) END AS value,
         |    c5 AS quality
         |  FROM data)
         |SELECT cube, measure, t AS "time",
         |  CAST(round(sum(CASE WHEN quality <> 'p' THEN value END), 2)
         |       AS DOUBLE) AS sum_ok,
         |  count(CASE WHEN quality <> 'p' AND value IS NOT NULL
         |             THEN 1 END) AS n_used,
         |  count(CASE WHEN quality = 'p' THEN 1 END) AS n_excluded,
         |  count(CASE WHEN quality = 'e' THEN 1 END) AS n_e,
         |  count(CASE WHEN quality = 'p' THEN 1 END) AS n_p,
         |  count(CASE WHEN quality = 'r' THEN 1 END) AS n_r,
         |  count(CASE WHEN quality = 'd' THEN 1 END) AS n_d,
         |  count(CASE WHEN quality = 'x' THEN 1 END) AS n_x
         |FROM cells GROUP BY cube, measure, t
         |ORDER BY cube, measure, "time"""".stripMargin,
    // Each hierarchy level replayed as an explicit UNION ALL branch
    // (level-tagged prefix projection), then one conditional
    // aggregation — dialect-safe, no GROUPING_ID dependence.
    "cube_region_rollup" ->
      s"""WITH data AS (${duckDataOf(agsPath)}),
         |cells AS (
         |  SELECT c1 AS region, CAST(c2 AS INT) AS t,
         |    CASE WHEN c3 IN $duckNull THEN NULL
         |         ELSE CAST(c3 AS DECIMAL(18,0)) END AS value,
         |    c4 AS quality
         |  FROM data),
         |lv AS (
         |  SELECT 8 AS level, region AS region_prefix, t, value, quality
         |  FROM cells
         |  UNION ALL
         |  SELECT 5, substr(region, 1, 5), t, value, quality FROM cells
         |  UNION ALL
         |  SELECT 2, substr(region, 1, 2), t, value, quality FROM cells
         |  UNION ALL
         |  SELECT 0, 'DG', t, value, quality FROM cells)
         |SELECT 'ags_mini' AS cube, 'BEVSTD' AS measure, t AS "time",
         |  level, region_prefix,
         |  CAST(round(sum(CASE WHEN quality <> 'p' THEN value END), 2)
         |       AS DOUBLE) AS sum_ok,
         |  count(CASE WHEN quality <> 'p' AND value IS NOT NULL
         |             THEN 1 END) AS n_used
         |FROM lv GROUP BY t, level, region_prefix
         |ORDER BY t, level, region_prefix""".stripMargin,
    // Same union CTE as cube_union, filtered to the lookup — the
    // query key must agree with the union key's parse on every cell.
    "cube_query" ->
      s"""WITH mini AS (${duckDataOf(fixturePath)}),
         |area AS (${duckDataOf(areaPath)}),
         |u AS (
         |  SELECT '12411_mini' AS cube, c1 AS region,
         |    '{"GES":"' || c2 || '"}' AS dims_json,
         |    CAST(c3 AS INT) AS t, 'BEVSTD' AS measure,
         |    CASE WHEN c4 IN $duckNull THEN NULL
         |         ELSE CAST(c4 AS DOUBLE) END AS value,
         |    c5 AS quality
         |  FROM mini
         |  UNION ALL
         |  SELECT 'area', c1, '{}', CAST(c2 AS INT), 'FLAECHE',
         |    CASE WHEN c3 IN $duckNull THEN NULL
         |         ELSE CAST(c3 AS DOUBLE) END, c4
         |  FROM area
         |  UNION ALL
         |  SELECT 'area', c1, '{}', CAST(c2 AS INT), 'BEVDICHTE',
         |    CASE WHEN c5 IN $duckNull THEN NULL
         |         ELSE CAST(c5 AS DOUBLE) END, c6
         |  FROM area)
         |SELECT cube, region, dims_json, t AS "time", measure, value, quality
         |FROM u WHERE region = '11' AND t = 2020
         |ORDER BY cube, dims_json, measure""".stripMargin,
    // The cube_latest ranked merge feeding the cube_serve doc build:
    // 12411 cells merged across both revisions (v2 wins 2020, adds
    // 2021; 2019 and region 02 survive from v1), area cells straight
    // from their only revision — then each cell group rendered to the
    // same JSON doc strings the serve oracle pins byte-for-byte.
    "cube_etl" ->
      s"""WITH v1 AS (${duckDataOf(fixturePath)}),
         |v2 AS (${duckDataOf(fixtureV2Path)}),
         |area AS (${duckDataOf(areaPath)}),
         |u AS (
         |  SELECT 1 AS revision, c1 AS region, c2 AS ges,
         |    CAST(c3 AS INT) AS t,
         |    CASE WHEN c4 IN $duckNull THEN NULL
         |         ELSE CAST(c4 AS DOUBLE) END AS value,
         |    c5 AS quality
         |  FROM v1
         |  UNION ALL
         |  SELECT 2, c1, c2, CAST(c3 AS INT),
         |    CASE WHEN c4 IN $duckNull THEN NULL
         |         ELSE CAST(c4 AS DOUBLE) END, c5
         |  FROM v2),
         |m AS (
         |  SELECT * FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY region, ges, t ORDER BY revision DESC) AS rn
         |    FROM u) WHERE rn = 1),
         |docs AS (
         |  SELECT '12411' AS cube, region, t,
         |    '{"region":"' || region || '","year":' || t ||
         |    ',"dims":{"GES":"' || ges || '"},"measures":{"BEVSTD":{"value":'
         |    || CAST(value AS VARCHAR) || ',"quality":"' || quality
         |    || '"}}}' AS doc
         |  FROM m
         |  UNION ALL
         |  SELECT 'area', c1, CAST(c2 AS INT),
         |    '{"region":"' || c1 || '","year":' || c2 ||
         |    ',"dims":{},"measures":{"BEVDICHTE":{"value":'
         |    || CAST(CAST(c5 AS DOUBLE) AS VARCHAR) || ',"quality":"' || c6
         |    || '"},"FLAECHE":{"value":'
         |    || CAST(CAST(c3 AS DOUBLE) AS VARCHAR) || ',"quality":"' || c4
         |    || '"}}}'
         |  FROM area)
         |SELECT cube, region, t AS "time", doc FROM docs
         |ORDER BY cube, region, "time", doc""".stripMargin,
    "cube_latest" ->
      s"""WITH v1 AS (${duckDataOf(fixturePath)}),
         |v2 AS (${duckDataOf(fixtureV2Path)}),
         |u AS (
         |  SELECT 1 AS revision, c1 AS region, c2 AS ges,
         |    CAST(c3 AS INT) AS t,
         |    CASE WHEN c4 IN $duckNull THEN NULL
         |         ELSE CAST(c4 AS DOUBLE) END AS value,
         |    c5 AS quality
         |  FROM v1
         |  UNION ALL
         |  SELECT 2, c1, c2, CAST(c3 AS INT),
         |    CASE WHEN c4 IN $duckNull THEN NULL
         |         ELSE CAST(c4 AS DOUBLE) END, c5
         |  FROM v2),
         |r AS (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY region, ges, t ORDER BY revision DESC) AS rn
         |  FROM u)
         |SELECT '12411' AS cube, region,
         |  '{"GES":"' || ges || '"}' AS dims_json, t AS "time",
         |  'BEVSTD' AS measure, value, quality, revision
         |FROM r WHERE rn = 1
         |ORDER BY region, dims_json, "time", measure""".stripMargin,
    // Same cell extraction from both CSVs; FULL OUTER on the cell key
    // with presence markers, null-safe value compare via
    // IS NOT DISTINCT FROM.
    "cube_diff" ->
      s"""WITH r1 AS (${duckDataOf(fixturePath)}),
         |r2 AS (${duckDataOf(fixtureV2Path)}),
         |a AS (
         |  SELECT c1 AS region, '{"GES":"' || c2 || '"}' AS dims_json,
         |    CAST(c3 AS INT) AS t,
         |    CASE WHEN c4 IN $duckNull THEN NULL
         |         ELSE CAST(c4 AS DOUBLE) END AS old_value,
         |    true AS in_v1
         |  FROM r1),
         |b AS (
         |  SELECT c1 AS region, '{"GES":"' || c2 || '"}' AS dims_json,
         |    CAST(c3 AS INT) AS t,
         |    CASE WHEN c4 IN $duckNull THEN NULL
         |         ELSE CAST(c4 AS DOUBLE) END AS new_value,
         |    true AS in_v2
         |  FROM r2)
         |SELECT region, dims_json, t AS "time",
         |  CASE WHEN coalesce(in_v1, false) = false THEN 'added'
         |       WHEN coalesce(in_v2, false) = false THEN 'removed'
         |       WHEN old_value IS NOT DISTINCT FROM new_value
         |         THEN 'unchanged'
         |       ELSE 'changed' END AS status,
         |  old_value, new_value
         |FROM a FULL OUTER JOIN b USING (region, dims_json, t)
         |ORDER BY region, dims_json, "time"""".stripMargin
  )
}
