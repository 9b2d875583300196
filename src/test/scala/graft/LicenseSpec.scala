package graft

import graft.filter.License
import org.apache.spark.sql.functions._

class LicenseSpec extends SparkSpec {
  import spark.implicits._

  test("header phrases detect; declared order is precedence; head is bounded") {
    val docs = Seq(
      (1L, "// Licensed under the Apache License, Version 2.0\ncode"),
      (2L, "/* Permission is hereby granted, free of charge */\ncode"),
      (3L, "# under the terms of the GNU General Public License\ncode"),
      // both LGPL and GPL phrases present: the SPECIFIC variant, listed
      // first, must win
      (4L, "under the GNU Lesser General Public License; see also the " +
        "GNU General Public License for details"),
      (5L, "no license header at all"),
      // phrase beyond the bounded head must NOT match
      (6L, ("x" * 5000) + " Permission is hereby granted, free of charge"),
      (7L, null.asInstanceOf[String])).toDF("id", "text")
    val got = docs.select($"id", License.detectCol($"text").as("lic"),
      License.categoryCol(License.detectCol($"text")).as("cat"))
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) null else r.getString(1)),
          (if (r.isNullAt(2)) null else r.getString(2)))).toMap
    assert(got(1L) === (("apache-2.0", "permissive")))
    assert(got(2L) === (("mit", "permissive")))
    assert(got(3L) === (("gpl", "copyleft")))
    assert(got(4L) === (("lgpl", "weak-copyleft")))
    assert(got(5L) === ((License.Unknown, License.Unknown)))
    assert(got(6L) === ((License.Unknown, License.Unknown)))
    // null content: substring/rlike propagate null through the CASE chain
    assert(got(7L)._1 == null || got(7L)._1 == License.Unknown)
  }

  test("every declared pattern id is detected from its own phrase") {
    val probes = Seq(
      "apache-2.0" -> "Licensed under the Apache License, Version 2.0",
      "mit" -> "Permission is hereby granted, free of charge",
      "bsd" -> "Redistribution and use in source and binary forms",
      "agpl-3.0" -> "GNU Affero General Public License",
      "lgpl" -> "GNU Lesser General Public License",
      "gpl" -> "GNU General Public License",
      "mpl-2.0" -> "Mozilla Public License, v. 2.0",
      "unlicense" -> "This is free and unencumbered software")
    assert(probes.map(_._1).toSet === License.patterns.map(_._1).toSet)
    val df = probes.zipWithIndex
      .map { case ((id, t), i) => (i.toLong, id, s"header: $t\ncode") }
      .toDF("i", "expected", "text")
    val bad = df.select($"expected", License.detectCol($"text").as("got"))
      .filter($"expected" =!= $"got").collect()
    assert(bad.isEmpty, bad.mkString(", "))
  }

  test("prescreened kernel ≡ rlike chain, fuzzed (incl. case perturbations, " +
    "truncation boundary, superset-fold adversaries)") {
    assert(License.prescreens.length === License.patterns.length)
    // each prescreen literal must itself detect its pattern's id when laid
    // into a doc verbatim (i.e. the literal really is implied text of the
    // phrase, not an unrelated gate) — EXCEPT where an earlier pattern's
    // phrase contains it (gpl's literal is a substring of agpl/lgpl's)
    val phrases = License.prescreens
    val rnd = new scala.util.Random(4242)
    def perturbCase(s: String): String =
      s.map(c => if (rnd.nextBoolean()) c.toUpper else c.toLower)
    val docs = (0 until 400).map { i =>
      val parts = scala.collection.mutable.ArrayBuffer[String]()
      // 0-2 phrases, possibly case-perturbed, possibly truncated mid-phrase
      (0 until rnd.nextInt(3)).foreach { _ =>
        val p = phrases(rnd.nextInt(phrases.length))
        val q = if (rnd.nextBoolean()) perturbCase(p) else p
        parts += (if (rnd.nextInt(5) == 0) q.take(rnd.nextInt(q.length)) else q)
      }
      // padding that can push a phrase past the 4000-char head
      if (rnd.nextInt(4) == 0)
        parts.insert(0, "x" * (3900 + rnd.nextInt(300)))
      // adversarial fold character: long s (U+017F) folds to 's' under
      // regionMatches' Unicode fold but NOT under java (?i)'s ASCII fold
      // -- the prescreen may hit, the regex confirm must still reject
      if (rnd.nextInt(3) == 0)
        parts += "Licen\u017Fed under the Apache Licen\u017Fe, Version 2.0 " +
          "and Redi\u017Ftribution and u\u017Fe in \u017Fource and binary forms"
      (i.toLong, parts.mkString(" \n "))
    } :+ ((400L, null.asInstanceOf[String]))
    val df = docs.toDF("id", "text")
    val diff = df.select($"id",
        License.detectCol($"text").as("kernel"),
        License.detectColRlike($"text").as("chain"))
      .filter(!($"kernel" <=> $"chain")).collect()
    assert(diff.isEmpty, diff.take(5).mkString(", "))
  }

  // ---- repo-level propagation ----------------------------------------------

  val mitHdr = "Permission is hereby granted, free of charge, to anyone"
  val gplHdr = "under the terms of the GNU General Public License v3"
  val apacheHdr = "Licensed under the Apache License, Version 2.0"

  test("isLicensePathCol: basename match, case-insensitive, nested paths") {
    val paths = Seq(
      ("LICENSE", true), ("license.md", true), ("sub/dir/COPYING.txt", true),
      ("License", true), ("NOTICE", true), ("UNLICENSE", true),
      ("src/main.scala", false), ("licenses/apache.txt", false),
      ("mylicense", false), ("LICENSE.rst", false))
    val got = paths.map(_._1).toDF("path")
      .select($"path", License.isLicensePathCol($"path").as("is"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    paths.foreach { case (p, want) => assert(got(p) === want, p) }
  }

  test("repoLicenses: most-restrictive detection wins within a repo") {
    val files = Seq(
      // repo 1: MIT LICENSE + GPL COPYING -> gpl (copyleft outranks permissive)
      (1L, "LICENSE", mitHdr),
      (1L, "COPYING", gplHdr),
      // repo 2: permissive only
      (2L, "LICENSE.md", apacheHdr),
      // repo 3: a license FILE whose content detects nothing
      (3L, "LICENSE", "all rights reserved, custom terms"),
      // repo 4: no license files at all
      (4L, "src/a.c", mitHdr)).toDF("repo", "path", "content")
    val got = License.repoLicenses(files, "repo", "path", "content")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "gpl", 2L -> "apache-2.0", 3L -> License.Unknown))
  }

  test("effectiveLicenses: file header beats repo license; repo fills the rest") {
    val files = Seq(
      (1L, "LICENSE", gplHdr),
      (1L, "src/own.c", "/* " + mitHdr + " */\ncode"), // own header wins
      (1L, "src/plain.c", "int main() {}"),            // inherits gpl
      (2L, "src/orphan.c", "void f() {}"))             // no repo license
      .toDF("repo", "path", "content")
    val got = License.effectiveLicenses(files, "repo", "path", "content")
      .collect().map(r => r.getAs[String]("path") ->
        ((r.getAs[String]("file_license"), r.getAs[String]("repo_license"),
          r.getAs[String]("effective_license"),
          r.getAs[String]("effective_category")))).toMap
    assert(got("src/own.c") === (("mit", "gpl", "mit", "permissive")))
    assert(got("src/plain.c") === ((License.Unknown, "gpl", "gpl", "copyleft")))
    assert(got("LICENSE") === (("gpl", "gpl", "gpl", "copyleft")))
    assert(got("src/orphan.c") ===
      ((License.Unknown, License.Unknown, License.Unknown, License.Unknown)))
  }

  test("effectiveLicenses broadcast and shuffle join paths agree") {
    val files = (1L to 100L).map { i =>
      val repo = i % 10
      val path = if (i % 10 == 0) "LICENSE" else s"src/f$i.c"
      val content =
        if (i % 10 == 0) (if (repo % 2 == 0) gplHdr else mitHdr)
        else if (i % 7 == 0) apacheHdr + "\ncode"
        else s"code $i"
      (repo, path, content)
    }.toDF("repo", "path", "content")
    def run(b: Boolean) = License
      .effectiveLicenses(files, "repo", "path", "content", broadcastRepos = b)
      .select("repo", "path", "effective_license").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(run(true) === run(false))
  }
}
