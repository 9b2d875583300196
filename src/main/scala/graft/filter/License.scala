package graft.filter

import org.apache.spark.sql.Column
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

  /** First matching license id over the file head (first-match-wins in
    * [[patterns]] order); "unknown" when nothing matches. Pure Column
    * CASE chain of rlike probes over a bounded prefix — codegen, no UDF.
    */
  def detectCol(content: Column, headChars: Int = 4000): Column = {
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
}
