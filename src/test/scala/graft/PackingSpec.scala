package graft

import org.apache.spark.sql.functions._
import graft.text.RepoPack
import graft.corpus.CorpusGen

/** Repo-context packing: the replayable prefix rule, lossless reassembly,
  * plain ≡ ranged plan equality, and layout independence of the ranged
  * (skew-safe) path.
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def files(rows: (String, String, String, String)*) =
    rows.toDF("repo", "path", "commit", "content")

  test("packByRepo: prefix rule, headers, overflow-by-one-file, id skips") {
    // weights: a=4, b=4, c=4 → budget 8: a,b in pack 0 (excl cums 0,4),
    // c in pack 1 (excl 8); d has 20 chars → occupies pack 0 of repo2 and
    // the NEXT file's excl cum 20 → pack 2 (id 1 skipped)
    val df = files(
      ("r1", "a.sc", "c1", "aaaa"), ("r1", "b.sc", "c1", "bbbb"),
      ("r1", "c.sc", "c1", "cccc"),
      ("r2", "a.sc", "c1", "d" * 20), ("r2", "b.sc", "c1", "ee"))
    val out = RepoPack.packByRepo(df, budgetChars = 8)
      .orderBy("repo", "pack_id")
      .as[(String, Long, String, Long, Long)].collect()
    assert(out.map(r => (r._1, r._2, r._4, r._5)).toSeq === Seq(
      ("r1", 0L, 2L, 8L), ("r1", 1L, 1L, 4L),
      ("r2", 0L, 1L, 20L), ("r2", 2L, 1L, 2L)))
    assert(out(0)._3 === "<|file:a.sc|>\naaaa\n<|file:b.sc|>\nbbbb")
    assert(out(2)._3 === "<|file:a.sc|>\n" + "d" * 20)
    // reassembly is lossless: concatenating a repo's packs in id order
    // reproduces the full headered listing in (path, commit) order
    val rejoined = out.filter(_._1 == "r1").sortBy(_._2).map(_._3)
      .mkString("\n")
    assert(rejoined ===
      "<|file:a.sc|>\naaaa\n<|file:b.sc|>\nbbbb\n<|file:c.sc|>\ncccc")
  }

  test("packByRepo: null content packs as an empty slot, row preserved") {
    val df = files(("r1", "a.sc", "c1", null), ("r1", "b.sc", "c1", "xx"))
    val out = RepoPack.packByRepo(df, 100)
      .as[(String, Long, String, Long, Long)].collect()
    assert(out.toSeq === Seq(
      ("r1", 0L, "<|file:a.sc|>\n\n<|file:b.sc|>\nxx", 2L, 2L)))
  }

  test("ranged ≡ plain on the corpus, at any partitioning, budget holds") {
    // PK-duplicate triples carry different content, so dedupe to the
    // operator's uniqueness contract first (the natural pipeline order:
    // pk_dup resolution precedes packing)
    val base = CorpusGen.files(spark, 3000L).toDF()
      .groupBy("repo", "path", "commit")
      .agg(min("content").as("content"))
    val budget = 2000L
    val plain = RepoPack.packByRepo(base, budget).orderBy("repo", "pack_id")
    val a = plain.as[(String, Long, String, Long, Long)].collect().toSeq
    assert(a.nonEmpty && a.exists(_._4 > 1), "expected multi-file packs")
    for (layout <- Seq(
        base.repartition(7),
        base.repartition(3, col("path")),
        base.coalesce(1))) {
      val b = graft.util.Caches.scoped {
        RepoPack.packByRepoRanged(layout, budget, partitions = 5)
          .orderBy("repo", "pack_id")
          .as[(String, Long, String, Long, Long)].collect().toSeq
      }
      assert(b === a, "ranged plan diverged from plain plan")
    }
    // prefix rule bound: a pack overflows the budget by at most one file
    val maxW = base.select(max(length(coalesce(col("content"), lit("")))))
      .as[Int].head().toLong
    assert(a.forall(p => p._5 < budget + maxW))
    // pack ids per repo strictly increase (gaps allowed, never repeats)
    a.groupBy(_._1).foreach { case (_, ps) =>
      val ids = ps.map(_._2)
      assert(ids === ids.sorted && ids.distinct.size === ids.size)
    }
  }

  test("ranged path spreads a mega-repo: partials really straddle ranges") {
    // one repo, many files, forced over 6 range partitions — the point of
    // the ranged plan; equality with plain proves the offset arithmetic
    val df = (0 until 300)
      .map(i => ("mega", f"f$i%04d.sc", "c1", "x" * (10 + i % 17)))
      .toDF("repo", "path", "commit", "content")
    val plain = RepoPack.packByRepo(df, 500).orderBy("pack_id")
      .as[(String, Long, String, Long, Long)].collect().toSeq
    val ranged = graft.util.Caches.scoped {
      RepoPack.packByRepoRanged(df.repartition(11), 500, partitions = 6)
        .orderBy("pack_id")
        .as[(String, Long, String, Long, Long)].collect().toSeq
    }
    assert(ranged === plain)
    assert(plain.map(_._4).sum === 300L)
  }
}
