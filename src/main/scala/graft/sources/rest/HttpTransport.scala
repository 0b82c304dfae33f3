package graft.sources.rest

import java.net.URI
import java.net.URLEncoder
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

import scala.collection.concurrent.TrieMap

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Error envelope for non-OK responses. Status discipline mirrors the
  * reference's request wrapper (revtron/salesforce/main.py:89-100):
  * 200/201/204 pass, everything else raises with the response body.
  * `retryAfterMs` carries a parsed Retry-After header (429/503) so the
  * connector-level retry ([[RestRetry]]) can honor the server's own
  * pacing instead of guessing a backoff. */
final case class RestHttpError(status: Int, body: String,
    retryAfterMs: Option[Long] = None)
  extends RuntimeException(s"HTTP $status: $body")

/** OAuth refresh-token credentials (reference salesforce/main.py:29-46):
  * client id/secret + refresh token, given explicitly or resolved from
  * the environment. */
final case class RestCredentials(clientId: String, clientSecret: String,
    refreshToken: String)

object RestCredentials {
  /** S1 env fallback: GRAFT_REST_CLIENT_ID / GRAFT_REST_CLIENT_SECRET /
    * GRAFT_REST_REFRESH_TOKEN (the reference defaults its constructor
    * args from os.environ the same way). */
  def fromEnv(env: Map[String, String] = sys.env): Option[RestCredentials] =
    for {
      id <- env.get("GRAFT_REST_CLIENT_ID")
      sec <- env.get("GRAFT_REST_CLIENT_SECRET")
      tok <- env.get("GRAFT_REST_REFRESH_TOKEN")
    } yield RestCredentials(id, sec, tok)
}

/** Injection-safe query-fragment builder: [[RPred]] → remote WHERE text.
  * The structural predicates are the only way values reach the wire —
  * strings are escaped, field names validated — replacing the
  * reference's repr-interpolated WHERE building (main.py:123-143,
  * SURVEY §3.3 flags it as unsafe by design). */
private[rest] object Soql {
  private val FieldRe = "[A-Za-z_][A-Za-z0-9_.]*".r

  def field(f: String): String = f match {
    case FieldRe() => f
    case other => throw new IllegalArgumentException(s"illegal field name: $other")
  }

  def lit(v: Any): String = v match {
    case null => "NULL"
    case s: String => "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    case b: Boolean => b.toString
    case n @ (_: Int | _: Long | _: Short | _: Byte) => n.toString
    // plain decimal notation, never exponent form: toString yields
    // "1.0E7" for |v| >= 1e7 or < 1e-3, which the remote's literal
    // grammar rejects
    case d: Double =>
      if (d.isNaN || d.isInfinite)
        throw new IllegalArgumentException(s"non-finite numeric literal: $d")
      java.math.BigDecimal.valueOf(d).stripTrailingZeros.toPlainString
    case f: Float =>
      if (f.isNaN || f.isInfinite)
        throw new IllegalArgumentException(s"non-finite numeric literal: $f")
      new java.math.BigDecimal(f.toString).stripTrailingZeros.toPlainString
    case d: java.math.BigDecimal => d.toPlainString
    case t: java.sql.Timestamp => // ISO-8601 UTC, the remote datetime literal form
      java.time.Instant.ofEpochMilli(t.getTime).toString
    case other => throw new IllegalArgumentException(
      s"unsupported literal type: ${other.getClass.getName}")
  }

  /** LIKE pattern with the VALUE's wildcards neutralized: `%`/`_` in a
    * Contains value must match literally, not as metacharacters. */
  def containsPattern(s: String): String = {
    val escaped = s.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
      .replace("'", "\\'")
    "'%" + escaped + "%'"
  }

  def pred(p: RPred): String = p match {
    case RPred.Eq(f, v) => s"${field(f)} = ${lit(v)}"
    case RPred.Gt(f, v) => s"${field(f)} > ${lit(v)}"
    case RPred.Ge(f, v) => s"${field(f)} >= ${lit(v)}"
    case RPred.Lt(f, v) => s"${field(f)} < ${lit(v)}"
    case RPred.Le(f, v) => s"${field(f)} <= ${lit(v)}"
    case RPred.In(f, vs) => s"${field(f)} IN (${vs.map(lit).mkString(", ")})"
    case RPred.IsNull(f) => s"${field(f)} = NULL"
    case RPred.IsNotNull(f) => s"${field(f)} != NULL"
    case RPred.Contains(f, s) => s"${field(f)} LIKE ${containsPattern(s)}"
  }

  def where(preds: Seq[RPred]): String =
    if (preds.isEmpty) "" else " WHERE " + preds.map(pred).mkString(" AND ")
}

/** Production [[RestTransport]] over `java.net.http` — the real-HTTP
  * implementation of everything the reference's client does
  * (revtron/salesforce/main.py:14-104,230-249):
  *
  *  - refresh-token OAuth grant against `tokenEndpoints`, tried in
  *    order (the reference's login→test endpoint fallback, main.py:79-87);
  *  - bearer-auth requests with the 200/201/204 status discipline; one
  *    transparent re-auth + retry on 401 (expired token);
  *  - cursor-following paginated reads (`nextRecordsUrl`) with the
  *    page-size hint header (batchSize=200, main.py:152);
  *  - soft-delete visibility via the query vs queryAll path
  *    (main.py:150,175);
  *  - single-record writeback returning an error ENVELOPE, never
  *    throwing (main.py:230-249).
  *
  * Serializable: executors deserialize it inside partition readers; the
  * HttpClient and auth session are @transient and rebuilt per JVM
  * (each executor authenticates once, then reuses its token). */
final class HttpTransport(
    tokenEndpoints: Seq[String],
    creds: RestCredentials,
    instanceUrlOverride: Option[String] = None,
    apiVersion: String = "v56.0",
    timeoutMs: Long = 30000L) extends RestTransport {

  require(tokenEndpoints.nonEmpty, "at least one token endpoint required")

  private case class Session(token: String, instanceUrl: String)

  @transient private lazy val http: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofMillis(timeoutMs)).build()
  @transient private lazy val sessionRef =
    new java.util.concurrent.atomic.AtomicReference[Session](null)
  @transient private lazy val describeCache = TrieMap.empty[String, Seq[(String, String)]]

  private def urlenc(s: String): String = URLEncoder.encode(s, StandardCharsets.UTF_8)

  /** Refresh-token grant; endpoints tried in order, first 200 wins
    * (login→test fallback). Throws the LAST failure if none succeed. */
  private def authenticate(): Session = {
    val form = Seq(
      "grant_type" -> "refresh_token",
      "client_id" -> creds.clientId,
      "client_secret" -> creds.clientSecret,
      "refresh_token" -> creds.refreshToken)
      .map { case (k, v) => s"$k=${urlenc(v)}" }.mkString("&")
    var last: Throwable = null
    tokenEndpoints.foreach { ep =>
      try {
        val req = HttpRequest.newBuilder(URI.create(ep))
          .timeout(Duration.ofMillis(timeoutMs))
          .header("Content-Type", "application/x-www-form-urlencoded")
          .POST(HttpRequest.BodyPublishers.ofString(form)).build()
        val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
        if (resp.statusCode() == 200) {
          val j = JsonMethods.parse(resp.body())
          val token = (j \ "access_token") match {
            case JString(t) => t
            case _ => throw RestHttpError(200, s"no access_token in ${resp.body()}")
          }
          val inst = instanceUrlOverride.orElse((j \ "instance_url") match {
            case JString(u) => Some(u)
            case _ => None
          }).getOrElse(throw RestHttpError(200, "no instance_url in token response"))
          return Session(token, inst.stripSuffix("/"))
        } else last = RestHttpError(resp.statusCode(), resp.body())
      } catch { case scala.util.control.NonFatal(e) => last = e }
    }
    throw new IllegalStateException(
      s"authentication failed against ${tokenEndpoints.mkString(", ")}", last)
  }

  private def session(): Session = {
    val s = sessionRef.get()
    if (s != null) s
    else { val fresh = authenticate(); sessionRef.set(fresh); fresh }
  }

  /** Bearer request with status discipline; 401 re-auths once. */
  private def request(method: String, pathOrUrl: String,
      jsonBody: Option[String] = None, headers: Seq[(String, String)] = Nil,
      retried: Boolean = false): HttpResponse[String] = {
    val s = session()
    val url = if (pathOrUrl.startsWith("http")) pathOrUrl else s.instanceUrl + pathOrUrl
    val b = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofMillis(timeoutMs))
      .header("Authorization", s"Bearer ${s.token}")
    headers.foreach { case (k, v) => b.header(k, v) }
    jsonBody.foreach(_ => b.header("Content-Type", "application/json"))
    val req = (method match {
      case "GET" => b.GET()
      case "POST" => b.POST(HttpRequest.BodyPublishers.ofString(jsonBody.getOrElse("")))
      case "PATCH" => b.method("PATCH", HttpRequest.BodyPublishers.ofString(jsonBody.getOrElse("")))
      case "DELETE" => b.DELETE()
    }).build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    resp.statusCode() match {
      case 200 | 201 | 204 => resp
      case 401 if !retried => // expired token: one transparent re-auth
        sessionRef.set(null)
        request(method, pathOrUrl, jsonBody, headers, retried = true)
      case code =>
        // integer-seconds Retry-After (the throttle form); HTTP-date
        // forms are ignored and the retry layer falls back to backoff
        val retryAfter = Option(resp.headers().firstValue("Retry-After")
            .orElse(null))
          .flatMap(v => scala.util.Try(v.trim.toLong * 1000L).toOption)
          .filter(_ >= 0L)
        throw RestHttpError(code, resp.body(), retryAfter)
    }
  }

  private def dataPath(rest: String): String = s"/services/data/$apiVersion/$rest"

  // ------------------------------------------------------------- JSON → Any
  private def jvalue(v: JValue): Any = v match {
    case JString(s) => s
    case JInt(i) => i.toLong
    case JLong(l) => l
    case JDouble(d) => d
    case JDecimal(d) => d.toDouble
    case JBool(b) => b
    case JNull | JNothing => null
    case other => JsonMethods.compact(JsonMethods.render(other))
  }

  /** ISO-8601 datetime OR bare date string → epoch micros (the
    * engine-side datetime representation the DSv2 reader expects).
    * Dates resolve to midnight UTC, mirroring how the remote treats
    * date-only fields in datetime comparisons. */
  private def toMicros(v: Any): Any = v match {
    case s: String =>
      try java.time.OffsetDateTime.parse(s.replace("+0000", "Z")).toInstant.toEpochMilli * 1000L
      catch { case _: Exception =>
        try java.time.Instant.parse(s).toEpochMilli * 1000L
        catch { case _: Exception =>
          try java.time.LocalDate.parse(s)
            .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli * 1000L
          catch { case _: Exception => s }
        }
      }
    case l: Long => l
    case other => other
  }

  private def typeTag(remote: String): String = remote match {
    case "double" | "currency" | "percent" => "double"
    case "int" | "long" => "long"
    case "boolean" => "boolean"
    case "datetime" | "date" => "datetime"
    case _ => "string" // id, reference, picklist, textarea, phone, url, email…
  }

  // --------------------------------------------------------- RestTransport
  override def listObjects(): Seq[String] = {
    val j = JsonMethods.parse(request("GET", dataPath("sobjects")).body())
    (j \ "sobjects") match {
      case JArray(items) => items.collect { case o: JObject =>
        (o \ "name") match { case JString(n) => n; case _ => null }
      }.filter(_ != null).sorted
      case _ => Seq.empty
    }
  }

  override def limits(): Map[String, Long] = {
    val j = JsonMethods.parse(request("GET", dataPath("limits")).body())
    j match {
      case JObject(cats) => cats.flatMap { case (cat, v) => v match {
        case JObject(fields) => fields.collect {
          case (k, JInt(n)) => s"$cat.$k" -> n.toLong
          case (k, JLong(n)) => s"$cat.$k" -> n
        }
        case _ => Nil
      }}.toMap
      case _ => Map.empty
    }
  }

  override def describe(obj: String): Seq[(String, String)] =
    describeCache.getOrElseUpdate(obj, {
      val j = JsonMethods.parse(
        request("GET", dataPath(s"sobjects/${Soql.field(obj)}/describe")).body())
      (j \ "fields") match {
        case JArray(fields) =>
          val raw = fields.collect { case f: JObject =>
            ((f \ "name"), (f \ "type")) match {
              case (JString(n), JString(t)) => n -> t
              case _ => null
            }
          }.filter(_ != null)
          rawTypeCache.put(obj, raw.toMap)
          raw.map { case (n, t) => n -> typeTag(t) }
        case _ => throw RestHttpError(200, s"describe($obj): no fields array")
      }
    })

  /** Raw remote type per field (typeTag folds date→datetime, but the
    * WIRE forms differ: date fields want "yyyy-MM-dd", datetimes want a
    * full ISO-8601 instant). */
  @transient private lazy val rawTypeCache = TrieMap.empty[String, Map[String, String]]
  private def rawTypes(obj: String): Map[String, String] = {
    if (!rawTypeCache.contains(obj)) describe(obj) // populates the cache
    rawTypeCache.getOrElse(obj, Map.empty)
  }

  /** (datetime fields, date fields) for `obj` — computed once per
    * object per transport, NOT per upserted record (the per-row writer
    * calls upsert in a loop). Only a SUCCESSFUL describe is cached: a
    * transient describe failure must propagate (and be retried on the
    * next call), not be memoized as (empty, empty) — that would make
    * every later upsert on this transport silently send raw
    * epoch-micros longs where the wire wants ISO-8601 text. */
  @transient private lazy val wireDateFields =
    TrieMap.empty[String, (Set[String], Set[String])]
  private def dateFieldSets(obj: String): (Set[String], Set[String]) =
    wireDateFields.get(obj).getOrElse {
      val raw = rawTypes(obj) // may throw — deliberately NOT cached then
      val v = (raw.collect { case (n, "datetime") => n }.toSet,
        raw.collect { case (n, "date") => n }.toSet)
      wireDateFields.put(obj, v)
      v
    }

  private def queryPath(includeDeleted: Boolean): String =
    dataPath(if (includeDeleted) "queryAll" else "query") // main.py:150,175

  /** One query page: (records, nextRecordsUrl). */
  private def queryPage(url: String, pageSize: Int): (List[JValue], Option[String]) = {
    val resp = request("GET", url,
      headers = Seq("Sforce-Query-Options" -> s"batchSize=$pageSize")) // main.py:152
    val j = JsonMethods.parse(resp.body())
    val recs = (j \ "records") match { case JArray(r) => r; case _ => Nil }
    val next = (j \ "nextRecordsUrl") match {
      case JString(u) if u.nonEmpty => Some(u); case _ => None
    }
    (recs, next)
  }

  /** Follow the remote cursor page by page (S6 phase 1 — inherently
    * serial, runs on the driver at planning time). Terminates ONLY when
    * the cursor is exhausted (no nextRecordsUrl) — an empty page with a
    * live cursor is legal (batch sizes are approximate) and must not
    * truncate the scan. */
  private def queryAllPages(soql: String, includeDeleted: Boolean,
      pageSize: Int): Iterator[List[JValue]] = {
    val first = s"${queryPath(includeDeleted)}?q=${urlenc(soql)}"
    Iterator.unfold[List[JValue], Option[String]](Some(first)) {
      case None => None
      case Some(url) =>
        val (recs, next) = queryPage(url, pageSize)
        Some((recs, next))
    }.filter(_.nonEmpty)
  }

  override def count(obj: String, preds: Seq[RPred], includeDeleted: Boolean): Long = {
    val soql = s"SELECT COUNT() FROM ${Soql.field(obj)}${Soql.where(preds)}"
    val resp = request("GET", s"${queryPath(includeDeleted)}?q=${urlenc(soql)}")
    (JsonMethods.parse(resp.body()) \ "totalSize") match {
      case JInt(n) => n.toLong
      case JLong(n) => n
      case _ => throw RestHttpError(200, "count: no totalSize")
    }
  }

  /** One aggregate SOQL round trip — the reference's `sobject_size`
    * probe (revtron/salesforce/main.py:195 `SELECT COUNT(Id), MIN(f),
    * MAX(f)`) generalized to the pushed [[RAgg]] list. The response is
    * one record with positional `expr0…exprN` aliases; datetime
    * strings normalize to epoch micros like every other read path. */
  override def stats(obj: String, aggs: Seq[RAgg], preds: Seq[RPred],
      includeDeleted: Boolean): Seq[Any] = {
    val items = aggs.map {
      case RAgg.CountStar     => "COUNT(Id)" // SOQL COUNT() has no alias slot
      case RAgg.CountField(f) => s"COUNT(${Soql.field(f)})"
      case RAgg.Min(f)        => s"MIN(${Soql.field(f)})"
      case RAgg.Max(f)        => s"MAX(${Soql.field(f)})"
    }
    val soql = s"SELECT ${items.mkString(", ")} FROM ${Soql.field(obj)}" +
      Soql.where(preds)
    val resp = request("GET", s"${queryPath(includeDeleted)}?q=${urlenc(soql)}")
    val rec = (JsonMethods.parse(resp.body()) \ "records") match {
      case JArray((o: JObject) :: _) => o
      case _ => throw RestHttpError(200, "stats: no aggregate record")
    }
    lazy val tags = describe(obj).toMap // cached; datetime wire strings → micros
    aggs.zipWithIndex.map { case (agg, i) =>
      val v = jvalue(rec \ s"expr$i")
      agg match {
        case RAgg.CountStar | _: RAgg.CountField => v match {
          case l: Long => l
          case d: Double => d.toLong
          case _ => throw RestHttpError(200, s"stats: expr$i is not a count")
        }
        case RAgg.Min(f) if tags.get(f).contains("datetime") => toMicros(v)
        case RAgg.Max(f) if tags.get(f).contains("datetime") => toMicros(v)
        // integral JSON for a double-typed field ("MIN(Amount)": 10)
        // parses as Long — widen like fetchByIds does, or the reader's
        // type guard throws on (Long, DoubleType)
        case RAgg.Min(f) if tags.get(f).contains("double") => widen(v)
        case RAgg.Max(f) if tags.get(f).contains("double") => widen(v)
        case _ => v
      }
    }
  }

  private def widen(v: Any): Any = v match {
    case l: Long => l.toDouble
    case other => other
  }

  /** GROUP BY aggregate SOQL: group fields return by NAME, aggregates
    * as positional `expr0…exprN` (numbered over the aggregate list
    * only — SOQL's aliasing rule). Cursor-paginated like any query
    * (grouped responses are usually one page; following
    * `nextRecordsUrl` costs nothing when absent). */
  override def statsGrouped(obj: String, groupBy: Seq[String], aggs: Seq[RAgg],
      preds: Seq[RPred], includeDeleted: Boolean): Seq[Seq[Any]] = {
    val aggItems = aggs.map {
      case RAgg.CountStar     => "COUNT(Id)"
      case RAgg.CountField(f) => s"COUNT(${Soql.field(f)})"
      case RAgg.Min(f)        => s"MIN(${Soql.field(f)})"
      case RAgg.Max(f)        => s"MAX(${Soql.field(f)})"
    }
    val soql = s"SELECT ${(groupBy.map(Soql.field) ++ aggItems).mkString(", ")}" +
      s" FROM ${Soql.field(obj)}${Soql.where(preds)}" +
      s" GROUP BY ${groupBy.map(Soql.field).mkString(", ")}"
    lazy val tags = describe(obj).toMap
    def conv(f: String, v: Any): Any =
      if (tags.get(f).contains("datetime")) toMicros(v)
      else if (tags.get(f).contains("double")) widen(v) // "MIN(Amount)": 10
      else v
    queryAllPages(soql, includeDeleted, 2000).flatMap(_.map { rec =>
      groupBy.map(g => conv(g, jvalue(rec \ g))) ++
        aggs.zipWithIndex.map { case (agg, i) =>
          val v = jvalue(rec \ s"expr$i")
          agg match {
            case RAgg.CountStar | _: RAgg.CountField => v match {
              case l: Long => l
              case d: Double => d.toLong
              case _ => throw RestHttpError(200, s"statsGrouped: expr$i is not a count")
            }
            case RAgg.Min(f) => conv(f, v)
            case RAgg.Max(f) => conv(f, v)
          }
        }
    }).toSeq
  }

  override def queryIds(obj: String, preds: Seq[RPred], includeDeleted: Boolean,
      limit: Option[Int], pageSize: Int): Iterator[Seq[String]] = {
    val soql = s"SELECT Id FROM ${Soql.field(obj)}${Soql.where(preds)}" +
      limit.fold("")(n => s" LIMIT $n")
    queryAllPages(soql, includeDeleted, pageSize).map(_.collect {
      case o: JObject => (o \ "Id") match { case JString(id) => id; case _ => null }
    }.filter(_ != null))
  }

  override def fetchByIds(obj: String, ids: Seq[String],
      columns: Seq[String]): Seq[Map[String, Any]] = {
    if (ids.isEmpty) return Seq.empty
    val types = describe(obj).toMap
    val cols = if (columns.isEmpty) describe(obj).map(_._1) else columns
    val colList = cols.map(Soql.field).mkString(", ")
    // id-batch fetch with the reference's row cap (main.py:165-169)
    val soql = s"SELECT $colList FROM ${Soql.field(obj)} WHERE " +
      s"Id IN (${ids.map(Soql.lit).mkString(", ")}) LIMIT ${math.max(200, ids.size)}"
    queryAllPages(soql, includeDeleted = true, pageSize = 200).flatten.collect {
      case o: JObject =>
        cols.map { c =>
          val raw = jvalue(o \ c)
          val coerced = types.get(c) match {
            case Some("datetime") => toMicros(raw)
            // JSON integers parse as Long even for double-typed fields
            // ("Amount": 100) — coerce so the reader's type guard holds
            case Some("double") => raw match {
              case l: Long => l.toDouble
              case other => other
            }
            case _ => raw
          }
          c -> coerced
        }.toMap
    }.toSeq
  }

  override def upsert(obj: String, record: Map[String, Any]): Either[String, String] = {
    // the connector's writers (RestDataWriter, RestOps.upsertWithStatus)
    // hand temporal values over as epoch-MICROS longs — the remote
    // wants ISO-8601 text, and DATE fields specifically want
    // "yyyy-MM-dd" (a full instant is rejected); resolve both sets
    // from the raw describe() types, cached per object
    val (dtFields, dateFields) = dateFieldSets(obj)
    def instantOfMicros(us: Long): java.time.Instant =
      java.time.Instant.ofEpochSecond(
        Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L)
    val body = JsonMethods.compact(JsonMethods.render(JObject(
      record.view.filterKeys(_ != "Id").toSeq.map { case (k, v) => k -> (v match {
        case null => JNull
        case s: String => JString(s)
        case b: Boolean => JBool(b)
        case i: Int => JInt(BigInt(i))
        case l: Long if dateFields.contains(k) =>
          JString(java.time.LocalDate.ofInstant(
            instantOfMicros(l), java.time.ZoneOffset.UTC).toString)
        case l: Long if dtFields.contains(k) => JString(instantOfMicros(l).toString)
        case l: Long => JLong(l)
        case d: Double => JDouble(d)
        case f: Float => JDouble(f.toDouble)
        // wire forms the remote parses — NOT toString: Timestamp
        // renders "2024-01-01 00:00:00.0", the remote wants ISO-8601;
        // BigDecimal could render exponent notation
        case t: java.sql.Timestamp => JString(t.toInstant.toString)
        case dt: java.time.Instant => JString(dt.toString)
        case d: java.sql.Date => JString(d.toLocalDate.toString)
        case bd: java.math.BigDecimal => JDecimal(BigDecimal(bd))
        case bd: BigDecimal => JDecimal(bd)
        case other => JString(other.toString)
      })}.toList)))
    try {
      record.get("Id") match {
        case Some(id: String) if id.nonEmpty =>
          request("PATCH", dataPath(s"sobjects/${Soql.field(obj)}/${urlenc(id)}"),
            jsonBody = Some(body)) // 204 expected
          Right(id)
        case _ =>
          val resp = request("POST", dataPath(s"sobjects/${Soql.field(obj)}"),
            jsonBody = Some(body)) // 201 expected
          (JsonMethods.parse(resp.body()) \ "id") match {
            case JString(newId) => Right(newId)
            case _ => Left(s"no id in create response: ${resp.body()}")
          }
      }
    } catch {
      // error ENVELOPE for record-level failures (main.py:230-249).
      // A throttle (429) or transient 5xx is NOT a record failure —
      // the org refused or failed admission, so it PROPAGATES to the
      // connector-level retry ([[RestRetry]]); enveloping it would
      // mark a good record failed because the org was busy.
      case e @ RestHttpError(status, _, _)
          if RestRetry.RetryableStatuses.contains(status) => throw e
      case RestHttpError(status, b, _) => Left(s"HTTP $status: $b")
      case scala.util.control.NonFatal(e) => Left(e.toString)
    }
  }

  override def latestModified(obj: String, dateField: String): Long = {
    val soql = s"SELECT ${Soql.field(dateField)} FROM ${Soql.field(obj)} " +
      s"ORDER BY ${Soql.field(dateField)} DESC LIMIT 1"
    queryAllPages(soql, includeDeleted = true, pageSize = 1).flatten.toSeq.headOption
      .map { case o: JObject => toMicros(jvalue(o \ dateField)) match {
        case l: Long => l; case _ => 0L
      }; case _ => 0L }
      .getOrElse(0L)
  }
}

object HttpTransport {
  /** Build from DSv2 options (keys lowercased). Credentials resolve
    * from options first, then the GRAFT_REST_* environment. */
  def fromOptions(options: Map[String, String]): HttpTransport = {
    val creds = (for {
      id <- options.get("clientid")
      sec <- options.get("clientsecret")
      tok <- options.get("refreshtoken")
    } yield RestCredentials(id, sec, tok))
      .orElse(RestCredentials.fromEnv())
      .getOrElse(throw new IllegalArgumentException(
        "http transport needs clientId/clientSecret/refreshToken options " +
          "or GRAFT_REST_CLIENT_ID/_CLIENT_SECRET/_REFRESH_TOKEN env"))
    val endpoints = options.get("tokenurl")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(throw new IllegalArgumentException(
        "http transport needs tokenUrl (comma-separated endpoints, tried in order)"))
    new HttpTransport(
      endpoints, creds,
      instanceUrlOverride = options.get("instanceurl"),
      apiVersion = options.getOrElse("apiversion", "v56.0"),
      timeoutMs = options.getOrElse("timeoutms", "30000").toLong)
  }
}
