package graft.filter

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** License detection for source-code corpora — the standard code-pipeline
  * gate (train only on permissively-licensed files; drop or segregate
  * copyleft). Detection is header-phrase matching over the file head, the
  * approach public code-corpus pipelines describe (SPDX-style phrase
  * lists): licenses announce themselves in the first comment block, so
  * scanning a bounded prefix keeps the cost independent of file size.
  *
  * DECLARED ORDER IS PRECEDENCE and load-bearing: "GNU Lesser/Affero
  * General Public License" contains "GNU General Public License", so the
  * specific variants must be listed before the generic one — same
  * first-match-wins contract as [[Scrub]]'s pattern chain.
  *
  * Patterns are RE2-compatible (no backreferences/lookarounds), so an
  * independent engine can re-run the same chain — the q_license oracle
  * does exactly that in DuckDB.
  */
object License {

  /** (license id, category, header regex). Category: "permissive",
    * "copyleft", "weak-copyleft", "public-domain".
    */
  val patterns: Seq[(String, String, String)] = Seq(
    ("apache-2.0", "permissive",
      "(?i)Licensed under the Apache License,? Version 2\\.0"),
    ("mit", "permissive",
      "(?i)Permission is hereby granted, free of charge"),
    ("bsd", "permissive",
      "(?i)Redistribution and use in source and binary forms"),
    ("agpl-3.0", "copyleft",
      "(?i)GNU Affero General Public License"),
    ("lgpl", "weak-copyleft",
      "(?i)GNU Lesser General Public License"),
    ("gpl", "copyleft",
      "(?i)GNU General Public License"),
    ("mpl-2.0", "weak-copyleft",
      "(?i)Mozilla Public License,? v\\.? ?2\\.0"),
    ("unlicense", "public-domain",
      "(?i)This is free and unencumbered software"))

  val Unknown = "unknown"

  /** NECESSARY case-insensitive literal implied by each pattern, in
    * [[patterns]] order — the [[Scrub]] prescreen discipline applied to
    * the detection chain (round-5 verdict item 1): every regex here has a
    * fixed literal prefix (the part before any `,?`/`\.?` optionality), so
    * a cheap CI substring scan skipping the regex pass can never change
    * output, only cost. The kernel always CONFIRMS a literal hit with the
    * real regex, so `(?i)` fold semantics are untouched; LicenseSpec
    * fuzzes byte-equality against the rlike-chain twin.
    */
  val prescreens: Seq[String] = Seq(
    "Licensed under the Apache License",
    "Permission is hereby granted, free of charge",
    "Redistribution and use in source and binary forms",
    "GNU Affero General Public License",
    "GNU Lesser General Public License",
    "GNU General Public License",
    "Mozilla Public License",
    "This is free and unencumbered software")

  /** First matching license id over the file head (first-match-wins in
    * [[patterns]] order); "unknown" when nothing matches. ONE codegen
    * expression: the head is sliced once and each regex probe is gated by
    * its [[prescreens]] literal — the rlike CASE chain re-ran all 8
    * compiled regexes over the full head for every row
    * ([[detectColRlike]], retained as the spec twin).
    */
  def detectCol(content: Column, headChars: Int = 4000): Column =
    // coalesce: NULL content detects "unknown", exactly as the rlike chain
    // (a `when` over a null predicate falls through to the final literal)
    coalesce(graft.functions.expressions.first_match(content, headChars,
      patterns.zip(prescreens).map { case ((id, _, p), pre) => (id, pre, p) },
      Unknown), lit(Unknown))

  /** The original 8-probe rlike CASE chain — the reference twin
    * [[detectCol]]'s prescreened kernel is fuzzed against (LicenseSpec).
    */
  private[graft] def detectColRlike(content: Column,
      headChars: Int = 4000): Column = {
    val head = substring(content, 1, headChars)
    patterns.foldRight(lit(Unknown): Column) { case ((id, _, p), rest) =>
      when(head.rlike(p), lit(id)).otherwise(rest)
    }
  }

  /** Category of the detected license ("unknown" passes through). */
  def categoryCol(licenseId: Column): Column = {
    val byId = patterns.map { case (id, cat, _) => (id, cat) }
    byId.foldRight(lit(Unknown): Column) { case ((id, cat), rest) =>
      when(licenseId === id, lit(cat)).otherwise(rest)
    }
  }

  // ---- repo-level license propagation -------------------------------------

  /** Basenames that declare a repository's license. Matched
    * case-insensitively against the path's final `/`-separated segment.
    */
  val licenseFileNames: Seq[String] = Seq(
    "license", "license.md", "license.txt",
    "copying", "copying.md", "copying.txt",
    "unlicense", "notice")

  /** Restrictiveness rank for conflict resolution — LOWER is MORE
    * restrictive. A training pipeline must assume the strictest grant
    * governs derived use, so a repo carrying several license files (dual
    * licensing, vendored notices) resolves to the most restrictive
    * detected one; "unknown" never wins over a detection.
    */
  val restrictiveness: Seq[(String, Int)] = Seq(
    "copyleft" -> 0, "weak-copyleft" -> 1, "permissive" -> 2,
    "public-domain" -> 3, Unknown -> 4)

  private def rankCol(licenseId: Column): Column =
    restrictiveness.foldRight(lit(4): Column) { case ((cat, r), rest) =>
      when(categoryCol(licenseId) === cat, lit(r)).otherwise(rest)
    }

  /** True when `path`'s basename is a license-declaring file. */
  def isLicensePathCol(path: Column): Column =
    lower(element_at(split(path, "/"), -1)).isin(licenseFileNames: _*)

  /** (repo, repo_license): one row per repo that carries at least one
    * license-declaring file, resolved most-restrictive-first (ties broken
    * by license id for determinism). The scan prunes to license paths
    * before any content is touched, so the aggregation input is
    * #license-files-sized, not corpus-sized.
    */
  def repoLicenses(files: DataFrame, repoCol: String, pathCol: String,
      contentCol: String): DataFrame = {
    val det = files
      .filter(isLicensePathCol(col(pathCol)))
      .select(col(repoCol), detectCol(col(contentCol)).as("__lic"))
    det
      .groupBy(col(repoCol))
      .agg(min(struct(rankCol(col("__lic")).as("r"), col("__lic").as("l")))
        .as("__m"))
      .select(col(repoCol), col("__m.l").as("repo_license"))
  }

  /** Per-file EFFECTIVE license: the file's own detected header when it
    * has one, else the repo's propagated license, else "unknown" — the
    * rule code pipelines apply (The Stack's license resolution works the
    * same way: per-file detection backed by repo-level license files).
    *
    * Output = input columns + (file_license, repo_license,
    * effective_license, effective_category).
    *
    * Scale shape: the repo-license side is one SHORT row per repo (id +
    * license string). It broadcasts by default; at extreme repo counts
    * (10⁸+) pass broadcastRepos=false and the join shuffles — still
    * keys-only on the build side, content bytes never shuffle (the probe
    * side's content stays where it is; only the repo key routes).
    */
  def effectiveLicenses(files: DataFrame, repoCol: String, pathCol: String,
      contentCol: String, broadcastRepos: Boolean = true): DataFrame = {
    val repos0 = repoLicenses(files, repoCol, pathCol, contentCol)
    val repos = if (broadcastRepos) broadcast(repos0) else repos0
    files
      .withColumn("file_license", detectCol(col(contentCol)))
      .join(repos, Seq(repoCol), "left")
      .withColumn("repo_license", coalesce(col("repo_license"), lit(Unknown)))
      .withColumn("effective_license",
        when(col("file_license") =!= Unknown, col("file_license"))
          .otherwise(col("repo_license")))
      .withColumn("effective_category", categoryCol(col("effective_license")))
  }
}
