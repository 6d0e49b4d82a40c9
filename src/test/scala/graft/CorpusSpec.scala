package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.corpus.CorpusGen
import graft.graph.{EdgeDerivation, GraphOps}

/** Corpus determinism + the per-row sha256 invariant (BASELINE.json
  * input_hint) + edge-derivation ground truth.
  */
class CorpusSpec extends SparkSpec {

  private lazy val corpus =
    CorpusGen.generate(spark, nRepos = 5, filesPerRepo = 8,
      commitsPerRepo = 4).cache()

  test("schema matches the mandated input shape") {
    assert(corpus.columns.toSeq ===
      Seq("repo", "path", "commit", "lang", "content"))
    assert(corpus.schema.fields.forall(_.dataType.typeName === "string"))
    assert(corpus.count() > 0)
  }

  test("generation is deterministic (independent of partitioning)") {
    val a = CorpusGen.withSha(corpus)
      .select("repo", "path", "commit", "content_sha256")
      .collect().map(_.toSeq).toSet
    val b = CorpusGen.withSha(
        CorpusGen.generate(spark, 5, 8, 4).repartition(13))
      .select("repo", "path", "commit", "content_sha256")
      .collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("sha256 invariant survives a parquet round-trip") {
    val dir = Files.createTempDirectory("graft-corpus").toString
    val withSha = CorpusGen.withSha(corpus)
    withSha.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    val mismatches = back
      .where(sha2(col("content"), 256) =!= col("content_sha256"))
      .count()
    assert(mismatches === 0)
    assert(back.count() === corpus.count())
  }

  test("import edges: every file links to its two generated targets") {
    val ids = EdgeDerivation.idMap(corpus, partitions = 4).cache()
    val imp = EdgeDerivation.importEdges(corpus, ids)
    // 5 repos × 8 files, each with 2 import lines; a file may import itself
    // ((j*7+1)%8 == j has solutions) — those are dropped, and imp1==imp2
    // collapses by distinct. Check a known pair instead of exact counts:
    // file j=0 imports files 1 and 3 (j*7+1=1, j*13+3=3).
    val keyed = corpus.select(col("repo"), col("path"), col("lang")).distinct()
    val f0 = keyed.where(col("path").startsWith("src/pkg0/File0."))
      .select("repo", "path").collect()
    assert(f0.length === 5) // one per repo
    val imports = imp.count()
    assert(imports > 0)
    // resolve edge endpoints back to keys and verify File0 → File1 exists
    val idToKey = ids.select(col("id"), col("key"))
    val resolved = imp
      .join(idToKey.toDF("src", "srckey"), "src")
      .join(idToKey.toDF("dst", "dstkey"), "dst")
    assert(resolved.where(col("srckey").contains("/File0.") &&
      col("dstkey").contains("/File1.")).count() >= 5)
  }

  test("co-change edges are capped, oriented, weighted by shared commits") {
    val ids = EdgeDerivation.idMap(corpus, partitions = 4)
    val cc = EdgeDerivation.coChangeEdges(corpus, ids, filesPerCommitCap = 64)
    assert(cc.where(col("src") >= col("dst")).count() === 0)
    assert(cc.where(col("weight") < 1).count() === 0)
    assert(cc.count() > 0)
  }

  test("repo→path edges are bipartite from repo nodes to file nodes") {
    val ids = EdgeDerivation.idMap(corpus, partitions = 4)
    val rp = EdgeDerivation.repoPathEdges(corpus, ids)
    assert(rp.count() === 5L * 8L)
    // every src must be a repo node ("r:"), every dst a file node ("f:")
    val idToKey = ids.select(col("id"), col("key"))
    val bad = rp.join(idToKey.toDF("src", "srckey"), "src")
      .join(idToKey.toDF("dst", "dstkey"), "dst")
      .where(!col("srckey").startsWith("r:") ||
        !col("dstkey").startsWith("f:"))
      .count()
    assert(bad === 0)
  }

  test("dense ids are a permutation 0..V-1") {
    val ids = EdgeDerivation.idMap(corpus, partitions = 4)
    val n = ids.count()
    assert(ids.agg(min(col("id")), max(col("id"))).head().toSeq ===
      Seq(0L, n - 1))
    assert(ids.select("id").distinct().count() === n)
  }
}
