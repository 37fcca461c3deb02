package graft

/** Mechanical enforcement of the model-sized-collect rule (r15 verdict
  * #2, SURVEY §7.6): `.collect()` in main-source code is allowed ONLY
  * for bounded model/catalog artifacts — IVF centroid sums, the BPE
  * merge table, lang-profile trigrams, bloom bitset words, per-stratum
  * counts, cube header lines — never for data-sized results (an
  * operator iterating a data-sized `.collect()` isn't distributed).
  * The rule used to live as a prose line the judge re-verified by
  * grep each round (and which had gone stale once); this lint makes
  * it red/green.
  *
  * Contract: every `.collect()` / `.collectAsList()` call site in
  * `src/main` must carry a `bounded-collect: <why it is model-sized>`
  * annotation on the same line or within the three lines above it.
  * An unannotated site fails the lint; so does planting one in a
  * query path (LintCollectSpec demonstrates red on a planted
  * unbounded collect). Comment-only mentions (scaladoc prose citing
  * `.collect()`) are skipped by the leading `//`/`*` heuristic.
  *
  * No SparkSession — a plain source scan, milliseconds; runs with
  * [[LintBench]] at round close.
  */
object LintCollect {

  /** The annotation a legitimate site must carry near the call. */
  val marker = "bounded-collect:"

  private val callRe = """\.collect(AsList)?\(\)""".r

  private def isCommentLine(s: String): Boolean = {
    val t = s.trim
    t.startsWith("//") || t.startsWith("*") || t.startsWith("/*")
  }

  /** Failure messages for one file's lines; empty = clean. */
  def lintFile(file: String, lines: IndexedSeq[String]): Seq[String] =
    lines.zipWithIndex.flatMap { case (ln, i) =>
      if (isCommentLine(ln) || callRe.findFirstIn(ln).isEmpty) None
      else {
        val window = lines.slice(math.max(0, i - 3), i + 1)
        if (window.exists(_.contains(marker))) None
        else Some(s"$file:${i + 1}: .collect() without a " +
          s"'$marker <reason>' annotation — either the result is " +
          "bounded (say why) or this operator is not distributed")
      }
    }

  private def scalaFiles(root: java.io.File): Seq[java.io.File] = {
    val here = Option(root.listFiles()).toSeq.flatten
    here.filter(_.isFile).filter(_.getName.endsWith(".scala")) ++
      here.filter(_.isDirectory).flatMap(scalaFiles)
  }

  def lintTree(root: java.io.File): Seq[String] =
    scalaFiles(root).sortBy(_.getPath).flatMap { f =>
      val lines =
        try scala.io.Source.fromFile(f).getLines().toIndexedSeq
        catch { case _: Throwable => IndexedSeq.empty[String] }
      lintFile(f.getPath, lines)
    }

  def main(args: Array[String]): Unit = {
    val root = Seq("/root/repo/src/main/scala", "src/main/scala")
      .map(new java.io.File(_)).find(_.isDirectory)
      .getOrElse(sys.error("src/main/scala not found"))
    val failures = lintTree(root)
    if (failures.nonEmpty) {
      failures.foreach(m => System.err.println(s"LINT_COLLECT FAIL: $m"))
      sys.exit(1)
    }
    println("LINT_COLLECT OK: every main-source .collect() site carries " +
      s"a '$marker' bounded-artifact annotation")
  }
}
