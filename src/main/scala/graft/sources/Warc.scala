package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** ISO 28500 (WARC) record handling — the missing first mile of the crawl
  * story (round-12 VERDICT): real crawls arrive as WARC files (what Common
  * Crawl ships), each holding a `warcinfo` preamble plus one `response`
  * record per fetched page, framed by `Content-Length` (NOT by delimiter —
  * a page body may legally contain the bytes `WARC/1.0`, so a splitter
  * that scans for record magic corrupts records; only length framing is
  * correct, and [[WarcSpec]] pins exactly that hostile case).
  *
  * Three pieces:
  *  - [[Warc.parseStream]] — the streaming record splitter/parser (used
  *    by both the in-memory operator and the graft-spool DSv2 reader:
  *    version line, CRLF header block, Content-Length byte-exact body,
  *    trailing CRLF CRLF);
  *  - [[Warc.readRecords]] — batch operator: (file_id, payload) frames →
  *    one row per record, HTTP responses further split into status +
  *    html body (feeding [[graft.ops.Extract.htmlExtract]] /
  *    `c4PageFilter` — the crawl-curation front end);
  *  - [[Warc.syntheticWarc]] — deterministic spec-conformant fixture
  *    (the Multimodal.syntheticMedia pattern): builds real WARC bytes
  *    from per-doc parameters with pure expressions, so the DuckDB
  *    oracle can derive every parsed field independently and the
  *    generator and parser validate each other.
  *
  * Scale shape: parsing is one sequential pass per file partition (the
  * record splitter cannot be parallelized WITHIN a file — records are
  * length-chained — so files are the parallelism unit, exactly how
  * Common Crawl shards: ~1 GB per WARC, thousands of files per crawl).
  * No shuffle: parse is mapPartitions; everything downstream of the
  * emitted rows is ordinary Catalyst.
  */
object Warc {

  /** One parsed WARC record. `http_status`/`html` are null for
    * non-`application/http` records (warcinfo, metadata, ...). */
  final case class WarcRow(file_id: Long, rec_index: Int, warc_type: String,
                           record_id: String, target_uri: String,
                           warc_date: String, content_length: Long,
                           http_status: Option[Int], html: String)

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8

  /** One CRLF-terminated line as a string (CR stripped), null at EOF.
    * Byte-exact: reads exactly up to and including the LF, so the stream
    * position stays aligned for the Content-Length body read. */
  private def readLine(in: java.io.InputStream): String = {
    val buf = new java.io.ByteArrayOutputStream(64)
    var b = in.read()
    if (b == -1) return null
    while (b != -1 && b != '\n') { buf.write(b); b = in.read() }
    val s = new String(buf.toByteArray, Utf8)
    if (s.endsWith("\r")) s.substring(0, s.length - 1) else s
  }

  private def readFully(in: java.io.InputStream, n: Long): Array[Byte] = {
    require(n <= Int.MaxValue, s"record body of $n bytes exceeds 2 GiB")
    val out = new Array[Byte](n.toInt)
    var off = 0
    while (off < out.length) {
      val r = in.read(out, off, out.length - off)
      require(r >= 0, s"EOF inside a Content-Length body ($off of $n bytes)")
      off += r
    }
    out
  }

  /** The record splitter: (headers, body) per record, in file order.
    * Tolerates any number of blank lines between records (the spec's
    * two-CRLF record separator) and stops cleanly at EOF. A record
    * missing `Content-Length` is a framing error — without it the
    * remainder of the FILE is unreadable, so this throws rather than
    * guessing. Header names are case-insensitive per the spec. */
  def parseStream(in: java.io.InputStream): Iterator[(Map[String, String], Array[Byte])] =
    new Iterator[(Map[String, String], Array[Byte])] {
      private var nextRec: (Map[String, String], Array[Byte]) = advance()
      private def advance(): (Map[String, String], Array[Byte]) = {
        var line = readLine(in)
        while (line != null && line.isEmpty) line = readLine(in)
        if (line == null) return null
        require(line.startsWith("WARC/"),
          s"expected a WARC version line, got '${line.take(40)}'")
        // Locale.ROOT lowercasing: header names are ASCII tokens, and a
        // Turkish-locale JVM would fold 'I' to dotless 'ı', breaking
        // every warc-record-id / warc-target-uri lookup
        val headers = scala.collection.mutable.LinkedHashMap.empty[String, String]
        var last: String = null
        var h = readLine(in)
        while (h != null && h.nonEmpty) {
          if ((h.charAt(0) == ' ' || h.charAt(0) == '\t') && last != null) {
            // ISO 28500 §4: long header VALUES may fold onto continuation
            // lines starting with space/tab — unfold with a single space
            headers(last) = headers(last) + " " + h.trim
          } else {
            val i = h.indexOf(':')
            require(i > 0, s"malformed WARC header line '${h.take(40)}'")
            last = h.substring(0, i).trim.toLowerCase(java.util.Locale.ROOT)
            headers(last) = h.substring(i + 1).trim
          }
          h = readLine(in)
        }
        val hs = headers.toMap
        val len = hs.getOrElse("content-length",
          throw new IllegalArgumentException(
            "WARC record without Content-Length — file unreadable past here"))
        (hs, readFully(in, len.toLong))
      }
      override def hasNext: Boolean = nextRec != null
      override def next(): (Map[String, String], Array[Byte]) = {
        val r = nextRec; nextRec = advance(); r
      }
    }

  /** Parsed-row conversion shared by the operator and the DSv2 reader:
    * HTTP response bodies split at the first blank line into status line
    * + html; other record types carry null status/html. */
  private[sources] def toRow(fileId: Long, recIndex: Int,
                             headers: Map[String, String],
                             body: Array[Byte]): WarcRow = {
    val isHttp = headers.get("content-type")
      .exists(_.toLowerCase(java.util.Locale.ROOT).startsWith("application/http"))
    val (status, html) =
      if (!isHttp) (None, null)
      else {
        // locate \r\n\r\n in BYTES (the body is binary until proven text)
        var sep = -1
        var i = 0
        while (sep < 0 && i + 3 < body.length) {
          if (body(i) == '\r' && body(i + 1) == '\n' &&
            body(i + 2) == '\r' && body(i + 3) == '\n') sep = i
          i += 1
        }
        if (sep < 0) (None, null)
        else {
          val head = new String(body, 0, sep, Utf8)
          val st = head.split("\r\n")(0).split(" ")
          (if (st.length >= 2) scala.util.Try(st(1).toInt).toOption else None,
            new String(body, sep + 4, body.length - sep - 4, Utf8))
        }
      }
    WarcRow(fileId, recIndex,
      headers.getOrElse("warc-type", null),
      headers.getOrElse("warc-record-id", null),
      headers.getOrElse("warc-target-uri", null),
      headers.getOrElse("warc-date", null),
      headers("content-length").toLong, status, html)
  }

  /** Batch WARC reader over in-memory payloads: `(file_id LONG, payload
    * STRING)` → one [[WarcRow]] per record. Parallelism unit = file (see
    * the class doc); one parser instance per row, streaming over the
    * payload bytes. */
  def readRecords(files: DataFrame): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select(col("file_id").cast("long"), col("payload").cast("string"))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (fileId, payload) =>
        parseStream(new java.io.ByteArrayInputStream(payload.getBytes(Utf8)))
          .zipWithIndex
          .map { case ((hs, body), idx) => toRow(fileId, idx, hs, body) }
      })(Encoders.product[WarcRow])
      .toDF()
  }

  // ---- deterministic synthetic fixture -----------------------------------

  private def isoDate(epochBase: Long, id: org.apache.spark.sql.Column) =
    date_format(timestamp_seconds(lit(epochBase) + id),
      "yyyy-MM-dd'T'HH:mm:ss'Z'")

  /** Spec-conformant WARC files from a `(doc_id, url, html)` page frame:
    * each file (doc_id mod `numFiles`) holds a `warcinfo` preamble then
    * its pages' `response` records in doc_id order, every record
    * Content-Length-framed with a full HTTP response block. Pure
    * expressions + one per-file aggregation; every byte derives from
    * (doc_id, url, html), so the oracle recomputes all parsed fields
    * directly. */
  def syntheticWarc(pages: DataFrame, numFiles: Int = 16): DataFrame = {
    val block = concat(
      lit("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=UTF-8\r\n\r\n"),
      col("html"))
    val rec = concat(
      lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: " +
        "<urn:uuid:00000000-0000-0000-0000-"),
      lpad(col("doc_id").cast("string"), 12, "0"), lit(">\r\nWARC-Date: "),
      isoDate(1700000000L, col("doc_id")),
      lit("\r\nWARC-Target-URI: "), col("url"),
      lit("\r\nContent-Type: application/http; msgtype=response" +
        "\r\nContent-Length: "),
      octet_length(block).cast("string"),
      lit("\r\n\r\n"), block, lit("\r\n\r\n"))
    val resp = pages.select(pmod(col("doc_id"), lit(numFiles)).as("file_id"),
      col("doc_id"), rec.as("rec"))
    val infoBlock = "software: graft-crawler/1.0\r\n"
    val infoRec = concat(
      lit("WARC/1.0\r\nWARC-Type: warcinfo\r\nWARC-Record-ID: " +
        "<urn:uuid:ffffffff-0000-0000-0000-"),
      lpad(col("file_id").cast("string"), 12, "0"), lit(">\r\nWARC-Date: "),
      isoDate(1700000000L, col("file_id")),
      lit("\r\nContent-Type: application/warc-fields\r\nContent-Length: " +
        s"${infoBlock.getBytes(Utf8).length}\r\n\r\n$infoBlock\r\n\r\n"))
    val infos = resp.select("file_id").distinct()
      .select(col("file_id"), lit(-1L).as("doc_id"), infoRec.as("rec"))
    // array_sort on (doc_id, rec) structs orders by doc_id: warcinfo (-1)
    // leads, then responses ascending — the fixed record order the
    // rec_index oracle replays
    infos.unionByName(resp)
      .groupBy("file_id")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("doc_id"), col("rec")))),
          x => x("rec")), "").as("payload"))
  }
}
