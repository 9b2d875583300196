package graft

import org.apache.spark.sql.functions._
import graft.dedup.{Dedup, Incremental}

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_incidx").resolve("idx")
      .toString

  // long, token-dense texts so MinHash has real shingle sets to agree on
  private def body(tag: String): String =
    (0 until 40).map(i => s"line $tag word${i} alpha beta gamma $i")
      .mkString("\n")

  test("probe: exact / neardup / new statuses with matched index ids") {
    val dir = tmp()
    val index = Seq((10L, body("a")), (11L, body("b")), (12L, body("c")))
      .toDF("id", "text")
    Incremental.writeIndex(index, "id", "text", dir)
    val batch = Seq(
      (100L, body("a")),            // byte-identical → exact, match 10
      (101L, body("b") + "\n\n  "), // sha differs, shingles identical →
                                    // signature agreement 1.0 → neardup, 11
      (102L, body("zz") + " totally fresh content")) // → new
      .toDF("id", "text")
    val out = Incremental.probe(batch, "id", "text", dir)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    graft.util.Caches.release()
    assert(out === Seq((100L, "exact", 10L), (101L, "neardup", 11L),
      (102L, "new", -1L)))
  }

  test("appendIndex folds keepers back: re-probe flags them exact") {
    val dir = tmp()
    Incremental.writeIndex(Seq((1L, body("x"))).toDF("id", "text"),
      "id", "text", dir)
    val batch = Seq((50L, body("y")), (51L, body("z"))).toDF("id", "text")
    val first = Incremental.probe(batch, "id", "text", dir)
    val keepers = batch.join(first.filter(col("status") === "new")
      .select(col("id")), Seq("id"), "left_semi")
    graft.util.Caches.release()
    Incremental.appendIndex(keepers, "id", "text", dir)
    val second = Incremental.probe(batch, "id", "text", dir)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    graft.util.Caches.release()
    assert(second === Seq((50L, "exact", 50L), (51L, "exact", 51L)))
  }

  test("compactIndex preserves probe results, heals double-appends, " +
    "shrinks the file count") {
    val dir = tmp()
    Incremental.writeIndex(
      Seq((1L, body("p")), (2L, body("q"))).toDF("id", "text"),
      "id", "text", dir)
    // grow the index over several appends, including a contract-violating
    // DOUBLE append of the same keeper (compaction must heal it)
    val keeper = Seq((7L, body("r"))).toDF("id", "text")
    Incremental.appendIndex(keeper, "id", "text", dir)
    Incremental.appendIndex(keeper, "id", "text", dir)
    Incremental.appendIndex(Seq((9L, body("s"))).toDF("id", "text"),
      "id", "text", dir)
    val batch = Seq((100L, body("p")), (101L, body("r")),
      (102L, body("nothing like the others"))).toDF("id", "text")
    def run() = {
      val r = Incremental.probe(batch, "id", "text", dir)
        .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
      graft.util.Caches.release()
      r
    }
    def parquetFiles(sub: String): Int = {
      val d = new java.io.File(s"$dir/$sub")
      def walk(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1 else 0
      walk(d)
    }
    val before = run()
    val filesBefore = parquetFiles("exact") + parquetFiles("bands")
    Incremental.compactIndex(spark, dir)
    val after = run()
    assert(after === before)
    assert(after.map(r => (r._1, r._2)) ===
      Seq((100L, "exact"), (101L, "exact"), (102L, "new"))
        .map(identity)) // sanity: the planted hits actually hit
    val filesAfter = parquetFiles("exact") + parquetFiles("bands")
    assert(filesAfter < filesBefore,
      s"expected fewer files after compaction: $filesAfter vs $filesBefore")
    // exact/ healed to one row per distinct content
    val exact = spark.read.parquet(s"$dir/exact")
    assert(exact.count() === exact.select("h").distinct().count())
  }

  test("probe is partition-layout independent") {
    import graft.corpus.CorpusGen
    val files = CorpusGen.files(spark, 600L).toDF()
      .selectExpr("cast(hash(repo, path, commit, content) as long) as id",
        "content as text")
    val index = files.filter(col("id") % 3 =!= 0)
    val batch = files.filter(col("id") % 3 === 0)
    val dir = tmp()
    Incremental.writeIndex(index, "id", "text", dir)
    def run(parts: Int) = {
      val r = Incremental.probe(batch.repartition(parts), "id", "text", dir)
        .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
      graft.util.Caches.release()
      r
    }
    val a = run(1)
    val b = run(13)
    assert(a === b)
    // the generated corpus plants whole-document copies — with the index
    // holding 2/3 of the corpus, some batch docs must hit it
    assert(a.exists(_._2 != "new"))
  }
}
