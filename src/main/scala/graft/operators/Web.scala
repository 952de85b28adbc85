package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.GraftFunctions

/** Web-corpus ingest operators: URL canonicalization and URL-keyed
  * dedup — the first stage of every crawl-derived training-data
  * pipeline (syntactically different URLs that fetch the same resource
  * must collapse BEFORE content dedup ever runs, or the exact-hash
  * family pays for the same page N times).
  *
  * Reference tie: the reference ETL ingests external objects keyed by
  * caller-supplied names (packages/app/bundles/custom/aws/s3/
  * s3-connector.ts:1) and its flow bundle normalizes inbound keys
  * before object writes (protolib/src/bundles/flow); URL-keyed web
  * corpora are the training-data analog of that ingest surface.
  *
  * Oracle pattern: the corpus is SYNTHESIZED from doc_id by a fixed
  * formula (five raw variants per logical page — parameter reorder,
  * case + default port + fragment, dot-segments + utm tracking,
  * percent-encoding + gclid, and a genuinely-distinct https variant),
  * and the DuckDB oracle replays the FORMULA for both the raw and the
  * canonical string — the engine must reproduce ground truth through
  * the real RFC 3986 parser ([[graft.functions.UrlCanonical]]), so a
  * parser bug hash-fails rather than being replayed on both sides.
  * Same contract as the percept family's pixel-formula oracles
  * (Mm.synthesizePixelPngs).
  *
  * Scale shape: canonicalization is a scan-fused codegen projection
  * (zero shuffle); the dedup is ONE hash aggregation on the canonical
  * key — at 100 TB the group-by shuffles the (url, doc_id) projection
  * only, never the payload, and AQE sizes the exchange.
  */
object Web {

  /** Five deterministic raw-URL variants per logical page
    * (L = doc_id div 5): v0 parameter reorder, v1 scheme/host case +
    * default port + fragment, v2 dot-segments + utm_source, v3
    * percent-encoded unreserved + `./` + gclid, v4 https (+ its own
    * default port) — canonically DISTINCT from v0-v3: scheme changes
    * must not collapse. */
  def synthesizeUrls(df: DataFrame, idCol: String): DataFrame = {
    val id = col(idCol).cast("bigint")
    val l = expr(s"cast($idCol as bigint) div 5")
    val site = pmod(l, lit(23)).cast("string")
    val p = pmod(l, lit(11)).cast("string")
    val q = pmod(l, lit(101)).cast("string")
    val v = pmod(id, lit(5))
    val raw = when(v === 0, concat(
        lit("http://www.site"), site, lit(".example.com/cat"), p,
        lit("/item?page="), p, lit("&id="), q))
      .when(v === 1, concat(
        lit("HTTP://WWW.SITE"), site, lit(".Example.COM:80/cat"), p,
        lit("/item?id="), q, lit("&page="), p, lit("#sec"), q))
      .when(v === 2, concat(
        lit("http://www.site"), site, lit(".example.com/cat"), p,
        lit("/x/../item?id="), q, lit("&utm_source=news&page="), p))
      .when(v === 3, concat(
        lit("http://www.site"), site, lit(".example.com/%63at"), p,
        lit("/./item?gclid=g"), q, lit("&id="), q, lit("&page="), p))
      .otherwise(concat(
        lit("https://www.site"), site, lit(".example.com:443/cat"), p,
        lit("/item?id="), q, lit("&page="), p))
    df.select(id.as("doc_id"), raw.as("raw_url"))
  }

  /** Canonical form beside the raw — per-row projection, zero shuffle. */
  def canonicalize(df: DataFrame, urlCol: String): DataFrame =
    df.withColumn("url", GraftFunctions.urlCanonical(col(urlCol)))

  /** URL-keyed dedup: one hash agg on the canonical key. Unparseable
    * URLs (null canonical) are EXCLUDED — they have no fetchable
    * identity; a production pipeline quarantines them (etl_quarantine
    * is the sibling path). */
  def dedupByUrl(df: DataFrame, urlCol: String, idCol: String): DataFrame =
    df.filter(col(urlCol).isNotNull)
      .groupBy(col(urlCol))
      .agg(count(lit(1)).as("n_raw"), min(col(idCol)).as("keeper"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // raw → canonical per document: the parser vs the formula
    "url_canonicalize" -> ((s, d) =>
      canonicalize(synthesizeUrls(Tables.documents(s, d), "doc_id"), "raw_url")
        .select("doc_id", "raw_url", "url")
        .orderBy("doc_id")),

    // canonical-key dedup: v0-v3 collapse, v4 survives alone
    "dedup_url" -> ((s, d) =>
      dedupByUrl(
        canonicalize(synthesizeUrls(Tables.documents(s, d), "doc_id"), "raw_url"),
        "url", "doc_id")
        .orderBy("url"))
  )

  /** DuckDB formula replay. `u` states both strings from doc_id alone —
    * the canonical is built pre-sorted/pre-normalized (id < page in
    * byte order), never parsed. */
  private val urlCte =
    """u AS (
      |  SELECT doc_id,
      |    CAST(doc_id // 5 % 23 AS VARCHAR) AS site,
      |    CAST(doc_id // 5 % 11 AS VARCHAR) AS p,
      |    CAST(doc_id // 5 % 101 AS VARCHAR) AS q,
      |    doc_id % 5 AS v
      |  FROM documents),
      |urls AS (
      |  SELECT doc_id,
      |    CASE v
      |      WHEN 0 THEN 'http://www.site' || site || '.example.com/cat' || p || '/item?page=' || p || '&id=' || q
      |      WHEN 1 THEN 'HTTP://WWW.SITE' || site || '.Example.COM:80/cat' || p || '/item?id=' || q || '&page=' || p || '#sec' || q
      |      WHEN 2 THEN 'http://www.site' || site || '.example.com/cat' || p || '/x/../item?id=' || q || '&utm_source=news&page=' || p
      |      WHEN 3 THEN 'http://www.site' || site || '.example.com/%63at' || p || '/./item?gclid=g' || q || '&id=' || q || '&page=' || p
      |      ELSE 'https://www.site' || site || '.example.com:443/cat' || p || '/item?id=' || q || '&page=' || p
      |    END AS raw_url,
      |    CASE WHEN v = 4 THEN 'https' ELSE 'http' END
      |      || '://www.site' || site || '.example.com/cat' || p || '/item?id=' || q || '&page=' || p AS url
      |  FROM u)""".stripMargin

  val oracles: Map[String, String] = Map(
    "url_canonicalize" ->
      s"WITH $urlCte SELECT doc_id, raw_url, url FROM urls ORDER BY doc_id",
    // NOTE: plain concatenation, no second stripMargin — urlCte is
    // already margin-stripped, and re-stripping would eat the leading
    // pipe of its `|| '://www.site'` continuation line (r9 ERR row)
    "dedup_url" ->
      (s"WITH $urlCte " +
        "SELECT url, count(*) AS n_raw, min(doc_id) AS keeper " +
        "FROM urls GROUP BY url ORDER BY url")
  )
}
