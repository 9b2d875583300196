package graft

import graft.checks.Drift
import graft.text.UrlFilter
import org.apache.spark.sql.functions._

/** URL hygiene ([[graft.text.UrlFilter]]) + distribution drift
  * ([[graft.checks.Drift]]): unit semantics, partition-layout
  * independence, and plan shape.
  */
class UrlDriftSpec extends SparkSpec {
  import spark.implicits._

  private def norm1(u: String): String =
    Seq(u).toDF("url").select(UrlFilter.normalizeUrl(col("url")).as("n"))
      .head.getString(0)

  private def dom1(u: String): String =
    Seq(u).toDF("url")
      .select(UrlFilter.registrableDomain(
        UrlFilter.host(UrlFilter.normalizeUrl(col("url")))).as("d"))
      .head.getString(0)

  test("normalizeUrl: scheme, userinfo, ports, tracking params, fragment") {
    // scheme lowercased; absent scheme defaults to http; host lowercased
    assert(norm1("HTTPS://WWW.Example.COM/A") === "https://www.example.com/A")
    assert(norm1("www.example.com/x") === "http://www.example.com/x")
    // userinfo stripped; default port stripped for its own scheme only
    assert(norm1("http://user:pw@example.com:80/p") === "http://example.com/p")
    assert(norm1("https://example.com:443/p") === "https://example.com/p")
    assert(norm1("http://example.com:443/p") === "http://example.com:443/p")
    assert(norm1("http://example.com:8080/p") === "http://example.com:8080/p")
    // tracking params removed in every query position; order preserved
    assert(norm1("http://e.com/p?utm_source=x&id=1") === "http://e.com/p?id=1")
    assert(norm1("http://e.com/p?id=1&gclid=y") === "http://e.com/p?id=1")
    assert(norm1("http://e.com/p?a=1&utm_term=x&b=2") === "http://e.com/p?a=1&b=2")
    assert(norm1("http://e.com/p?fbclid=z") === "http://e.com/p")
    assert(norm1("http://e.com/p?utm_campaign=a&utm_medium=b") === "http://e.com/p")
    // fragment dropped; empty path becomes /
    assert(norm1("http://e.com#sec") === "http://e.com/")
    assert(norm1("  http://e.com/x#a  ") === "http://e.com/x")
    // path case is preserved (paths are case-sensitive on most servers)
    assert(norm1("http://E.com/Path/To") === "http://e.com/Path/To")
  }

  test("registrableDomain: two-level suffixes, IPs, single labels") {
    assert(dom1("http://news.bbc.co.uk/x") === "bbc.co.uk")
    assert(dom1("http://a.b.example.org/x") === "example.org")
    assert(dom1("http://www.example.com/") === "example.com")
    assert(dom1("http://192.168.0.1:8080/x") === "192.168.0.1")
    assert(dom1("http://intranet/x") === "intranet")
    assert(dom1("http://co.uk/") === "co.uk") // bare suffix: nothing above it
  }

  test("UrlRegistrableDomain kernel is byte-equal to the Column chain") {
    // the codegen Expression (one URL read) must agree with the composed
    // Column route registrableDomain(host(normalizeUrl(u))) on every edge:
    // schemes (present/absent/upper/exotic), userinfo, default and exotic
    // ports, fragments before paths, trailing dots, interior empty labels,
    // IPs, single labels, two-level suffixes, mixed case, spaces, empties
    val urls = Seq(
      "HTTPS://WWW.Example.COM/A", "www.example.com/x",
      "http://user:pw@example.com:80/p", "https://example.com:443/p",
      "http://example.com:443/p", "http://example.com:8080/p",
      "http://news.bbc.co.uk/x", "http://a.b.example.org/x",
      "http://192.168.0.1:8080/x", "http://localhost/x",
      "http://e.com#sec", "  http://e.com/x#a  ", "http://E.com/Path/To",
      "http://example.com./x", "http://example.com../x",
      "http://a..b.com/x", "ftp://Files.example.co.jp/x",
      "mailto:foo@bar.com", "http://@example.com/x",
      "http://x.CO.UK/", "", " ", "http://", "http:///path",
      "http://e.com/p?utm_source=x&id=1", "http://com.au/",
      "http://?q=1", "http://#f", "http://10.0.0.1.", "http://...",
      "a", ".", "http://xn--bcher-kva.example/x")
    val df = urls.toDF("url")
    val both = df.select(
      UrlFilter.registrableDomainOfUrl(col("url")).as("kernel"),
      UrlFilter.registrableDomain(
        UrlFilter.host(UrlFilter.normalizeUrl(col("url")))).as("chain"))
      .collect()
    for ((r, u) <- both.zip(urls))
      assert(r.getString(0) === r.getString(1), s"url=[$u]")
    // null: the kernel is null-in-null-out (the sane Expression contract);
    // the Column chain yields "" — a concat_ws-over-nulls artifact, not a
    // domain. The one DOWNSTREAM consumer of the difference is the
    // blocklist predicate, which keeps the row either way (asserted in the
    // blocklistFilter test below)
    val nr = Seq(Option.empty[String]).toDF("url").select(
      UrlFilter.registrableDomainOfUrl(col("url")).as("kernel"),
      UrlFilter.registrableDomain(
        UrlFilter.host(UrlFilter.normalizeUrl(col("url")))).as("chain"))
      .head()
    assert(nr.isNullAt(0) && nr.getString(1) === "")
    // and over a broad generated matrix (every scheme/host/port/path/query
    // combination), so the equivalence is not just the hand-picked edges
    val gen = for {
      scheme <- Seq("", "http://", "HTTPS://", "ftp://")
      user <- Seq("", "u@", "U:p@")
      hostp <- Seq("Ex.COM", "a.b.co.uk", "127.0.0.1", "x", "x.y.z.com.",
        "b..c.org")
      port <- Seq("", ":80", ":443", ":9090")
      tail <- Seq("", "/", "/P?utm_source=1&x=2#f", "#only")
    } yield s"$scheme$user$hostp$port$tail"
    val g = gen.toDF("url").select(
      UrlFilter.registrableDomainOfUrl(col("url")).as("kernel"),
      UrlFilter.registrableDomain(
        UrlFilter.host(UrlFilter.normalizeUrl(col("url")))).as("chain"))
      .collect()
    for ((r, u) <- g.zip(gen))
      assert(r.getString(0) === r.getString(1), s"url=[$u]")
  }

  test("blocklistFilter drops by registrable domain, keeps null-host rows") {
    val df = Seq(
      (1L, "http://media.badsite.co.uk/a"), // blocked via 2-level suffix
      (2L, "http://spam.example/b"),        // blocked 2-label domain
      (3L, "http://ok.example.com/c"),
      (4L, "http://sub.spam.example/d")     // subdomain of blocked domain
    ).toDF("id", "url")
    val kept = UrlFilter.blocklistFilter(df, "url",
        Seq("spam.example", "badsite.co.uk"))
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(3L))
  }

  test("dedupByUrl: one winner per normalized URL, layout-independent") {
    val df = (1L to 300L).map { i =>
      val junk = (i % 3) match {
        case 0 => s"?utm_source=s$i"
        case 1 => s"?gclid=g$i#f"
        case _ => s"#sec-$i"
      }
      (i, s"http://Site-${i % 30}.example.com/page$junk")
    }.toDF("doc_id", "url")
    val a = UrlFilter.dedupByUrl(df, "url", Seq("doc_id"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    val b = UrlFilter.dedupByUrl(df.repartition(17, col("url")), "url",
        Seq("doc_id"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a === b)          // deterministic at any partitioning
    assert(a.size === 30)    // exactly one survivor per canonical page
    // survivors really are one-per-normalized-url
    val norms = UrlFilter.dedupByUrl(df, "url", Seq("doc_id"))
      .select(UrlFilter.normalizeUrl(col("url")).as("n"))
      .as[String].collect().toSeq
    assert(norms.distinct.size === norms.size)
  }

  test("perDomainCap: at most k per registrable domain, deterministic") {
    val df = (1L to 400L).map { i =>
      (i, s"http://h${i % 4}.site${i % 8}.com/p$i")
    }.toDF("doc_id", "url")
    val capped = UrlFilter.perDomainCap(df, "url", k = 7, Seq("doc_id"))
    val perDom = capped
      .withColumn("d", UrlFilter.registrableDomain(
        UrlFilter.host(UrlFilter.normalizeUrl(col("url")))))
      .groupBy("d").count().as[(String, Long)].collect().toMap
    assert(perDom.values.forall(_ <= 7), perDom.toString)
    assert(perDom.size === 8)
    val again = UrlFilter.perDomainCap(df.repartition(13), "url", k = 7,
      Seq("doc_id")).select("doc_id").as[Long].collect().sorted.toSeq
    assert(again === capped.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("blocklist plan evaluates the domain ONCE (single kernel reference)") {
    // range-backed (a Seq-backed LocalRelation would be constant-folded
    // away by ConvertToLocalRelation and leave no Filter to inspect)
    val df = spark.range(100).select(
      concat(lit("http://site"), pmod(col("id"), lit(7)), lit(".com/x"))
        .as("url"))
    val s = UrlFilter.blocklistFilter(df, "url", Seq("site1.com"))
      .queryExecution.executedPlan.toString
    // the 64KB blowup came from re-inlining the domain chain per reference;
    // the fixed predicate must carry exactly one graft_url_domain call
    val hits = "graft_url_domain".r.findAllIn(s).size
    assert(hits === 1, s"expected one kernel reference, got $hits:\n$s")
    assert(!s.contains("Exchange"), s"blocklist filter shuffled:\n$s")
  }

  test("url columns stay map-side: no Exchange in the enrichment plan") {
    val df = Seq((1L, "http://a.com/x")).toDF("doc_id", "url")
    val plan = UrlFilter.withUrlColumns(
      UrlFilter.blocklistFilter(df, "url", Seq("spam.example")), "url")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("bucketOf: edges, null, and oracle-rule equivalence") {
    val bs = Seq(10.0, 20.0, 30.0)
    val got = Seq(Some(5.0), Some(10.0), Some(19.9), Some(30.0), Some(99.0),
        None)
      .toDF("v").select(Drift.bucketOf(col("v"), bs).as("b"))
      .collect().map(r => if (r.isNullAt(0)) -1 else r.getInt(0)).toSeq
    assert(got === Seq(0, 1, 1, 3, 3, -1))
    intercept[IllegalArgumentException] {
      Drift.bucketOf(col("v"), Seq(3.0, 1.0))
    }
  }

  test("psi: zero on identical data, positive on a planted shift") {
    val base = (1L to 2000L).map(i => (i % 97).toDouble).toDF("v")
    val same = Drift.psi(base, base, col("v"), Seq(25.0, 50.0, 75.0))
    assert(math.abs(same) < 1e-12, s"psi=$same")
    val shifted = base.select((col("v") + 40).as("v"))
    val moved = Drift.psi(base, shifted, col("v"), Seq(25.0, 50.0, 75.0))
    assert(moved > 0.25, s"psi=$moved") // a 40-point shift is a major one
    // eps floor: a bucket empty on one side contributes a FINITE term
    val disjoint = Drift.psi(base, base.select((col("v") + 1000).as("v")),
      col("v"), Seq(25.0, 50.0, 75.0, 500.0))
    assert(disjoint.isFinite && disjoint > 1.0)
  }

  test("psiByBucket is partition-layout independent and null-excluding") {
    val base = (1L to 999L).map(i => if (i % 11 == 0) None else Some(i.toDouble))
      .toDF("v")
    val cur = (1L to 999L).map(i => Some((i + 13).toDouble)).toDF("v")
    val bs = Seq(200.0, 400.0, 600.0, 800.0)
    val a = Drift.psiByBucket(base, cur, col("v"), bs)
      .collect().map(_.toString).toSeq
    val b = Drift.psiByBucket(base.repartition(7), cur.repartition(3),
      col("v"), bs).collect().map(_.toString).toSeq
    assert(a === b)
  }

  test("categoricalDrift: shares sum to 1, TVD math, unseen category") {
    val base = Seq.fill(60)("en") ++ Seq.fill(30)("de") ++ Seq.fill(10)("fr")
    val cur = Seq.fill(50)("en") ++ Seq.fill(30)("de") ++ Seq.fill(20)("xx")
    val d = Drift.categoricalDrift(base.toDF("lang"), cur.toDF("lang"),
      col("lang"))
    val rows = d.collect().map(r => (r.getString(0), r.getLong(1),
      r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toList
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-12)
    assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-12)
    val byKey = rows.map(r => r._1 -> r).toMap
    assert(byKey("fr")._3 === 0L && byKey("xx")._2 === 0L) // full outer
    val tvd = rows.map(r => math.abs(r._6)).sum / 2
    assert(math.abs(tvd - 0.2) < 1e-12) // (0.1 + 0.1 + 0.2)/2
  }

  test("drift aggregation is partial before the shuffle (plan shape)") {
    val base = (1L to 500L).map(_.toDouble).toDF("v")
    val plan = Drift.psiByBucket(base, base, col("v"), Seq(100.0, 300.0))
      .queryExecution.executedPlan.toString
    // two-phase agg: partial_count on the map side of each histogram
    assert(plan.contains("partial_count"), plan)
  }
}
