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
}
