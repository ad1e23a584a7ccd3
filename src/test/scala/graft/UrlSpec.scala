package graft

import graft.ops.Url
import org.apache.spark.sql.functions._

/** URL-level curation (round 13): canonicalizer semantics, dedup
  * first-occurrence contract, sqrt-quota stats, and plan shape. */
class UrlSpec extends SparkSpec {

  test("canonicalizeUrl: case folds, www/default-port/fragment strip, " +
    "tracking params drop, params sort, trailing slash strips") {
    import spark.implicits._
    val cases = Seq(
      // case + www + default port + fragment + param order
      ("HTTPS://WWW.Sub1.src0-site.Org:443/p/3?b=2&a=1#sec",
       "https://sub1.src0-site.org/p/3?a=1&b=2"),
      // tracking params vanish; surviving params sorted
      ("http://h.example.com/p/1?utm_source=feed&b=2&a=1",
       "http://h.example.com/p/1?a=1&b=2"),
      ("https://h.example.com/x?utm_campaign=x&gclid=z&fbclid=y",
       "https://h.example.com/x"),
      // non-default port survives; trailing slash strips
      ("http://h.example.com:8080/p/5/", "http://h.example.com:8080/p/5"),
      // root path: empty -> '/', bare '/' kept
      ("http://h.example.com", "http://h.example.com/"),
      ("http://h.example.com/", "http://h.example.com/"),
      // http :80 strips, https :80 kept (not that scheme's default)
      ("http://h.example.com:80/a", "http://h.example.com/a"),
      ("https://h.example.com:80/a", "https://h.example.com:80/a"))
    val got = cases.map(_._1).toDF("url")
      .select(Url.canonicalizeUrl(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(got === cases.map(_._2))
  }

  test("registrableDomain: last two labels off the canonical host, " +
    "port-blind") {
    import spark.implicits._
    val got = Seq("https://sub1.src0-site.org/p/3?a=1",
        "http://h.example.com:8080/p",
        "http://example.com/")
      .toDF("u").select(Url.registrableDomain(col("u")).as("d"))
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("src0-site.org", "example.com", "example.com"))
  }

  test("registrableDomain splits on the FIRST '://' — a query-param value " +
    "containing '://' cannot shift the host (round-13 ADVICE regression)") {
    import spark.implicits._
    // the surviving param carries a full URL; the old last-occurrence
    // split extracted 'evil.test' as the domain
    val got = Seq("https://example.com/p/1?next=https://evil.test/x")
      .toDF("u").select(Url.registrableDomain(col("u")).as("d"))
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("example.com"))
  }

  test("urlDedup folds scheme-case/www/port/slash/param-order variants to " +
    "one key, keeps the lowest doc_id; plan has ONE aggregate exchange " +
    "and no join") {
    import spark.implicits._
    val urls = Seq(
      (10L, 7L, "HTTP://WWW.a.example.com:80/p/1/?b=2&a=1"),
      (3L, 5L, "http://a.example.com/p/1?a=1&b=2&utm_source=x"),
      (8L, 2L, "http://a.example.com/p/2"),
      (5L, 1L, "https://a.example.com/p/1?a=1&b=2")) // scheme differs: distinct
      .toDF("doc_id", "n_chars", "url")
    val out = Url.urlDedup(urls).orderBy("url_canon").collect()
    assert(out.length === 3)
    val byUrl = out.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byUrl("http://a.example.com/p/1?a=1&b=2") === (3L, 2L))
    assert(byUrl("http://a.example.com/p/2") === (8L, 1L))
    assert(byUrl("https://a.example.com/p/1?a=1&b=2") === (5L, 1L))
    val p = Url.urlDedup(urls).queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"urlDedup joins:\n$p")
  }

  test("domainStats: sqrt-proportional integer quotas sum sanely and " +
    "every domain gets >= 1; quota sample honors quotas exactly") {
    import spark.implicits._
    // 3 domains with 16 / 4 / 1 docs -> isqrt 4 / 2 / 1, total 7:
    // quotas floor(14*4/7)=8, floor(14*2/7)=4, floor(14*1/7)=2
    val docs = ((0 until 16).map(i => (i.toLong, 10L, s"http://a.dom-a.com/p/$i")) ++
      (0 until 4).map(i => (100L + i, 10L, s"http://a.dom-b.com/p/$i")) ++
      Seq((200L, 10L, "http://a.dom-c.com/p/0")))
      .toDF("doc_id", "n_chars", "url")
    val st = Url.domainStats(docs, budget = 14L).orderBy("domain").collect()
    assert(st.map(r => (r.getString(0), r.getLong(1), r.getLong(4))).toSeq ===
      Seq(("dom-a.com", 16L, 8L), ("dom-b.com", 4L, 4L), ("dom-c.com", 1L, 2L)))
    val sample = Url.domainQuotaSample(docs, budget = 14L)
    val byDom = sample.groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // quota caps bind where n_docs > quota; small domains keep all docs
    assert(byDom === Map("dom-a.com" -> 8L, "dom-b.com" -> 4L, "dom-c.com" -> 1L))
  }

  test("syntheticUrls is deterministic and collision-bearing: re-generation " +
    "is identical, and canonical keys genuinely collapse variants") {
    import spark.implicits._
    val docs = (0L until 500L).map(i => (i, s"src${i % 3}", 64L))
      .toDF("doc_id", "source", "n_chars")
    val u1 = Url.syntheticUrls(docs).orderBy("doc_id").collect()
    val u2 = Url.syntheticUrls(docs).orderBy("doc_id").collect()
    assert(u1 === u2)
    val n = Url.urlDedup(Url.syntheticUrls(docs)).count()
    assert(n < 500, s"no canonical collisions in 500 docs ($n keys)")
    assert(n > 50, s"suspiciously few canonical keys ($n)")
    // the round-14 scheme-gate fixture: every 23rd doc is ftp
    val ftp = Url.syntheticUrls(docs)
      .filter(col("url").startsWith("ftp://")).count()
    assert(ftp === 22L, s"expected 22 ftp rows in 500 docs, got $ftp")
  }

  test("urlGate: non-http(s) schemes drop, blocklisted registrable domains " +
    "drop INCLUDING their subdomains, everything else keeps") {
    import spark.implicits._
    val urls = Seq(
      (1L, "https://www.good.example.com/p/1"),       // keep
      (2L, "FTP://files.example.com/p/2"),            // scheme drop
      (3L, "https://bad.test/p/3"),                   // domain drop (exact)
      (4L, "http://Deep.Sub.bad.test:8080/p/4"),      // domain drop (subdomain)
      (5L, "mailto://bad.test/p/5"),                  // both gates drop
      (6L, "http://good.test/p/6"))                   // keep
      .toDF("doc_id", "url")
    val got = Url.urlGate(urls, Seq("bad.test"))
      .select("doc_id", "scheme_ok", "domain_ok", "url_keep")
      .collect().map(r => (r.getLong(0),
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)))).toMap
    assert(got(1L) === ((true, true, true)))
    assert(got(2L) === ((false, true, false)))
    assert(got(3L) === ((true, false, false)))
    assert(got(4L) === ((true, false, false)))
    assert(got(5L) === ((false, false, false)))
    assert(got(6L) === ((true, true, true)))
  }

  test("urlGate plan: the blocklist probe is a broadcast join fused into " +
    "the canonicalize scan — the PROBE side never shuffles (the one " +
    "allowed exchange is the |blocklist|-row dedup on the build side)") {
    import spark.implicits._
    val urls = (0L until 64L).map(i => (i, s"https://h$i.example.com/p"))
      .toDF("doc_id", "url")
    val gated = Url.urlGate(urls, Seq("blocked.example"))
    val plan = gated.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"blocklist probe is not a broadcast join:\n$plan")
    // exactly the build-side distinct's exchange, nothing corpus-sized:
    // every hashpartitioning exchange must sit under the broadcast build
    // (i.e. above only the blocklist relation), never on the url scan
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles <= 1, s"urlGate probe side shuffles:\n$plan")
    val bcastIdx = plan.indexOf("BroadcastExchange")
    val exIdx = plan.indexOf("Exchange hashpartitioning")
    assert(exIdx === -1 || (bcastIdx >= 0 && exIdx > bcastIdx),
      s"the dedup exchange is not on the broadcast build side:\n$plan")
  }

  test("urlGate: duplicate blocklist entries do NOT duplicate matching " +
    "URL rows (round-14 ADVICE — real host blocklists repeat domains)") {
    import spark.implicits._
    val urls = Seq(
      (1L, "https://a.bad.test/p/1"),
      (2L, "http://good.test/p/2"))
      .toDF("doc_id", "url")
    val blocked = Seq("bad.test", "bad.test", "bad.test").toDF("domain")
    val out = Url.urlGate(urls, blocked).collect()
    assert(out.length === 2, "duplicated blocklist rows fanned out the join")
    val got = out.map(r => r.getAs[Long]("doc_id") ->
      r.getAs[Boolean]("url_keep")).toMap
    assert(got === Map(1L -> false, 2L -> true))
  }
}
