package graft.corpus

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthesis of the spec-mandated corpus shape
  * (repo: string, path: string, commit: string, lang: string,
  * content: string) — BASELINE.json input_hint; no external data. One row
  * per (file, touching commit). Everything is a pure Catalyst expression of
  * (repoIdx, fileIdx, commitIdx) + the seed, so the table is identical
  * across runs, partitionings, and parallelism levels, and scales to any
  * size without a driver-side loop (generation is `spark.range`-parallel).
  *
  * Content embeds real `import` lines referencing other generated paths in
  * the same repo, so import-edge derivation has known ground truth
  * (FIXTURES.md §A).
  */
object CorpusGen {

  val Langs = Seq("scala", "java", "py", "c")
  val Exts = Map("scala" -> "scala", "java" -> "java", "py" -> "py", "c" -> "c")

  /** Deterministic path of file j given its language. */
  def pathExpr(j: org.apache.spark.sql.Column, lang: org.apache.spark.sql.Column) =
    concat(lit("src/pkg"), pmod(j, lit(7)), lit("/File"), j, lit("."),
      element_at(map(
        lit("scala"), lit("scala"), lit("java"), lit("java"),
        lit("py"), lit("py"), lit("c"), lit("c")), lang))

  /** Generate the corpus. Every file is touched by its deterministic
    * "birth commit" (k = j mod commitsPerRepo) plus a seeded-hash subset of
    * the other commits, so all files exist in the corpus and co-change
    * ground truth is known. Co-change fan-out is capped at the DERIVATION
    * side (EdgeDerivation.coChangeEdges), not here.
    */
  def generate(spark: SparkSession, nRepos: Int, filesPerRepo: Int,
               commitsPerRepo: Int, seed: Long = 42L): DataFrame = {
    // files: one row per (repo i, file j)
    val files = spark.range(nRepos.toLong * filesPerRepo)
      .select((col("id") / filesPerRepo).cast("long").as("i"),
              (col("id") % filesPerRepo).cast("long").as("j"))
      .withColumn("repo", format_string("repo-%04d", col("i")))
      .withColumn("lang", element_at(
        array(Langs.map(lit): _*), (col("j") % 4 + 1).cast("int")))
      .withColumn("path", pathExpr(col("j"), col("lang")))
      // two deterministic in-repo import targets per file
      .withColumn("imp1", (col("j") * 7 + 1) % filesPerRepo)
      .withColumn("imp2", (col("j") * 13 + 3) % filesPerRepo)

    // commits: one row per (repo i, commit k); membership decided by a
    // seeded hash, capped at filesPerCommit files per commit.
    val commits = spark.range(nRepos.toLong * commitsPerRepo)
      .select((col("id") / commitsPerRepo).cast("long").as("i"),
              (col("id") % commitsPerRepo).cast("long").as("k"))
      .withColumn("commit",
        substring(sha2(concat(lit(seed), lit(":"),
          format_string("repo-%04d", col("i")), lit("@"), col("k")), 256),
          1, 40))

    // Membership hash is md5 over a canonical string key (identical hex in
    // Spark and DuckDB) so the whole corpus — and every edge derived from
    // it — is reproducible by the ANSI-SQL oracle. First hex digit in
    // {0..4} ⇒ p = 5/16 ≈ 0.31 of the non-birth commits touch the file.
    val touched = files.join(commits, "i")
      .where((col("j") % commitsPerRepo === col("k")) ||
        substring(md5(concat(lit(seed), lit(":"), col("repo"), lit(":"),
          col("j"), lit(":"), col("k"))), 1, 1)
          .isin("0", "1", "2", "3", "4"))

    // content: pure function of (repo, path, commit) with import ground truth
    val lang1 = col("lang")
    touched.select(
      col("repo"), col("path"), col("commit"), col("lang"),
      concat(
        lit("// graft synthetic source\n"),
        lit("package pkg"), pmod(col("j"), lit(7)), lit("\n"),
        lit("import "), pathExpr(col("imp1"),
          element_at(array(Langs.map(lit): _*), (col("imp1") % 4 + 1).cast("int"))), lit("\n"),
        lit("import "), pathExpr(col("imp2"),
          element_at(array(Langs.map(lit): _*), (col("imp2") % 4 + 1).cast("int"))), lit("\n"),
        lit("object File"), col("j"), lit(" { // lang="), lang1, lit("\n"),
        lit("  val body = \""),
        sha2(concat(col("repo"), lit("/"), col("path"), lit("@"),
          col("commit")), 256),
        lit("\"\n}\n")).as("content"))
  }

  /** The per-row invariant column (BASELINE.json input_hint): sha256 of
    * content, hex. Must survive any engine round-trip byte-for-byte.
    */
  def withSha(corpus: DataFrame): DataFrame =
    corpus.withColumn("content_sha256", sha2(col("content"), 256))
}
