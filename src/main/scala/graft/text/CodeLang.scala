package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Source-language identification for code corpora — the published
  * recipe (The Stack partitions its corpus by language derived from the
  * file PATH; GitHub's linguist resolves the same way): lowercase file
  * extension → language via a fixed table, special basenames
  * (`Makefile`, `Dockerfile`, `CMakeLists.txt`) recognized outright, and
  * a `#!` shebang probe over the first line as the fallback for
  * extension-less scripts. Everything is one codegen CASE chain — pure
  * per-row, zero shuffle — because language is the partition key
  * everything downstream (per-language filters, per-language sampling
  * budgets) groups by.
  *
  * Precedence (linguist-like, replayable by an independent engine):
  *   1. special basename;
  *   2. extension table;
  *   3. shebang interpreter (only reached when 1-2 miss);
  *   4. "unknown".
  */
object CodeLang {

  /** Extension → language. Lowercased, no dot. A deliberate bounded
    * subset of linguist's ~700: the high-volume languages that dominate
    * public code corpora; unknown extensions fall through to the shebang
    * probe and then to "unknown" (downstream per-language gates treat
    * unknown as its own stratum).
    */
  val ExtensionMap: Seq[(String, String)] = Seq(
    "scala" -> "scala", "sc" -> "scala",
    "java" -> "java",
    "py" -> "python", "pyi" -> "python",
    "js" -> "javascript", "mjs" -> "javascript", "cjs" -> "javascript",
    "ts" -> "typescript", "tsx" -> "typescript", "jsx" -> "javascript",
    "c" -> "c", "h" -> "c",
    "cpp" -> "cpp", "cc" -> "cpp", "cxx" -> "cpp", "hpp" -> "cpp",
    "hh" -> "cpp",
    "go" -> "go",
    "rs" -> "rust",
    "rb" -> "ruby",
    "php" -> "php",
    "cs" -> "csharp",
    "swift" -> "swift",
    "kt" -> "kotlin", "kts" -> "kotlin",
    "sql" -> "sql",
    "sh" -> "shell", "bash" -> "shell", "zsh" -> "shell",
    "pl" -> "perl", "pm" -> "perl",
    "r" -> "r",
    "jl" -> "julia",
    "lua" -> "lua",
    "hs" -> "haskell",
    "ml" -> "ocaml", "mli" -> "ocaml",
    "ex" -> "elixir", "exs" -> "elixir",
    "erl" -> "erlang",
    "clj" -> "clojure", "cljs" -> "clojure",
    "html" -> "html", "htm" -> "html",
    "css" -> "css",
    "json" -> "json",
    "yaml" -> "yaml", "yml" -> "yaml",
    "toml" -> "toml",
    "xml" -> "xml",
    "md" -> "markdown", "markdown" -> "markdown",
    "txt" -> "text",
    "ipynb" -> "jupyter")

  /** Special basenames with no (useful) extension. Keys lowercased. */
  val BasenameMap: Seq[(String, String)] = Seq(
    "makefile" -> "makefile",
    "gnumakefile" -> "makefile",
    "dockerfile" -> "dockerfile",
    "cmakelists.txt" -> "cmake",
    "rakefile" -> "ruby",
    "gemfile" -> "ruby",
    "build.sbt" -> "scala")

  /** Shebang interpreter → language (the last path segment of the
    * interpreter, with `env X` indirection resolved first).
    */
  val ShebangMap: Seq[(String, String)] = Seq(
    "python" -> "python", "python2" -> "python", "python3" -> "python",
    "sh" -> "shell", "bash" -> "shell", "zsh" -> "shell", "dash" -> "shell",
    "perl" -> "perl",
    "ruby" -> "ruby",
    "node" -> "javascript",
    "php" -> "php",
    "rscript" -> "r")

  /** Lowercased basename of a path (RE2-compatible probe: everything
    * after the last `/`).
    */
  def basename(path: Column): Column =
    lower(regexp_extract(coalesce(path, lit("")), "([^/]*)$", 1))

  /** Lowercased extension (text after the last dot of the basename; ""
    * when the basename has no dot or ends with one). Dotfiles like
    * `.gitignore` read as extension "gitignore" — harmless, the table
    * just misses them.
    */
  def extension(path: Column): Column = {
    val b = basename(path)
    when(b.rlike("\\.[^.]+$"), regexp_extract(b, "\\.([^.]+)$", 1))
      .otherwise(lit(""))
  }

  /** The shebang interpreter of the first line ("" when none): handles
    * `#!/usr/bin/python3`, `#!/usr/bin/env python`, and flag noise after
    * the interpreter word. Whitespace is the EXPLICIT class `[ \t]` (and
    * the interpreter word excludes `\r` so CRLF first lines behave like
    * `\S` did) rather than `\s`/`\S`: java's `\s` includes U+000B where
    * RE2-ish engines' does not, and the oracle replays this pattern —
    * explicit classes keep the two engines byte-identical by construction.
    */
  def shebangInterp(content: Column): Column = {
    val first = regexp_extract(coalesce(content, lit("")), "^([^\n]*)", 1)
    val interp = regexp_extract(first,
      "^#![ \\t]*(?:/[^ \\t\\r]*/)?(?:env[ \\t]+)?([^ \\t\\r]+)", 1)
    lower(regexp_extract(interp, "([^/]*)$", 1))
  }

  // one literal-map lookup per table (element_at on a map returns null
  // for a missing key) — a compact plan vs a 50-arm CASE chain, same
  // nullability contract, still trivially replayable as CASE/VALUES by
  // an independent engine
  private def chain(key: Column, table: Seq[(String, String)]): Column =
    element_at(typedLit(table.toMap), key)

  /** Language from the path alone (basename + extension precedence). */
  def fromPath(path: Column): Column =
    coalesce(chain(basename(path), BasenameMap),
      chain(extension(path), ExtensionMap))

  /** Full detection: basename → extension → shebang → "unknown". */
  def detect(path: Column, content: Column): Column =
    coalesce(fromPath(path),
      chain(shebangInterp(content), ShebangMap),
      lit("unknown"))
}
