package graft

import graft.text.CodeLang
import org.apache.spark.sql.functions._

/** Code-language identification ([[graft.text.CodeLang]]): the precedence
  * chain on closed-form fixtures, feature extraction edges, and plan
  * shape (map-side, no shuffle).
  */
class CodeLangSpec extends SparkSpec {
  import spark.implicits._

  private def detect(path: String, head: String = ""): String =
    Seq((path, head)).toDF("p", "h")
      .select(CodeLang.detect(col("p"), col("h"))).head.getString(0)

  test("extension table: common languages, case-insensitive, compound names") {
    assert(detect("src/main/App.scala") === "scala")
    assert(detect("deep/pkg/Util.JAVA") === "java")
    assert(detect("a/b/c.tar.gz") === "unknown") // "gz" not in the table
    assert(detect("nb/analysis.ipynb") === "jupyter")
    assert(detect("x.PY") === "python")
    assert(detect("mod.rs") === "rust")
  }

  test("basename specials beat the extension table") {
    assert(detect("cmake/CMakeLists.txt") === "cmake") // txt would say text
    assert(detect("Makefile") === "makefile")
    assert(detect("sub/dir/Dockerfile") === "dockerfile")
    assert(detect("proj/build.sbt") === "scala")
  }

  test("shebang probe: env indirection, flags, space after #!, precedence") {
    assert(detect("bin/run", "#!/usr/bin/env python3\nimport sys") ===
      "python")
    assert(detect("bin/go", "#! /bin/bash\nset -e") === "shell")
    assert(detect("bin/m", "#!/usr/bin/perl -w\nuse strict;") === "perl")
    assert(detect("bin/n", "#!node\nconsole.log(1)") === "javascript")
    // an extension WINS over a contradicting shebang (linguist precedence)
    assert(detect("tool.rb", "#!/usr/bin/env python\n") === "ruby")
    // unknown interpreter, no extension: unknown
    assert(detect("bin/q", "#!/opt/weird/frob\n") === "unknown")
  }

  test("feature edges: dotfiles, no-extension, empty, null") {
    assert(detect(".gitignore") === "unknown") // ext reads "gitignore"
    assert(detect("LICENSE", "Apache License 2.0") === "unknown")
    assert(detect("") === "unknown")
    val r = Seq(Tuple1(Option.empty[String])).toDF("p")
      .select(CodeLang.detect(col("p"), lit(null).cast("string"))).head
    assert(r.getString(0) === "unknown")
    // extension of a trailing-dot name is empty, not ""-after-dot
    val ext = Seq(Tuple1("weird.")).toDF("p")
      .select(CodeLang.extension(col("p"))).head.getString(0)
    assert(ext === "")
  }

  test("detection is one map-side projection: no Exchange, no UDF") {
    val plan = spark.range(8)
      .select(concat(lit("f"), col("id").cast("string"), lit(".py")).as("p"),
        lit("x = 1").as("h"))
      .select(CodeLang.detect(col("p"), col("h")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.toLowerCase.contains("scalaudf"), plan)
  }

  // ADVICE r5: this pins the SPARK side of the VT-parity fix; RE2-side
  // parity itself is enforced by the external oracle gate (q_code_lang),
  // which replays the same pattern in DuckDB
  test("shebang whitespace is the explicit [ \\t] class: U+000B is not " +
    "whitespace (Spark side of the RE2-parity fix)") {
    // java \\s includes U+000B (vertical tab), RE2's does not. The old
    // \\s-based pattern would read "#!\u000Bpython" as interpreter
    // "python" in Spark but "unknown" in the DuckDB replay. With the
    // explicit classes BOTH engines put the VT inside the interpreter
    // word, miss the lookup map, and agree on "unknown".
    assert(detect("bin/v", "#!\u000Bpython\nprint(1)") === "unknown")
    // plain space and tab after #! still behave as whitespace
    assert(detect("bin/w", "#!\t/usr/bin/env\tpython\n") === "python")
  }
}
