package graft.sources.rest

import java.net.InetSocketAddress
import java.net.URLDecoder
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.{AtomicInteger, AtomicReference}

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.SparkSpec

/** A minimal in-process remote "org" speaking the reference's wire
  * protocol (token grant, describe, paged query with nextRecordsUrl,
  * sobject writeback) — lets the REAL `java.net.http` transport be
  * integration-tested without egress. */
class HttpTransportSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  // ------------------------------------------------------------ stub server
  private var server: HttpServer = _
  private var port: Int = _
  private val tokenGrants = new AtomicInteger(0)
  private val currentToken = new AtomicReference[String]("none")
  private val lastBatchHeader = new AtomicReference[String]("")
  private val lastTokenForm = new AtomicReference[String]("")
  private val lastPatchBody = new AtomicReference[String]("")
  private val lastGroupBySoql = new AtomicReference[String]("")
  // throttle mode: the next N data requests bounce with 429 + Retry-After
  private val throttleNext = new AtomicInteger(0)
  private val throttlesServed = new AtomicInteger(0)

  private def base: String = s"http://127.0.0.1:$port"

  /** Serve a 429 with Retry-After: 0 while the throttle budget lasts;
    * true = this request was bounced. */
  private def throttled(x: HttpExchange): Boolean =
    if (throttleNext.getAndUpdate(n => math.max(0, n - 1)) > 0) {
      throttlesServed.incrementAndGet()
      x.getResponseHeaders.add("Retry-After", "0")
      send(x, 429,
        """[{"errorCode":"REQUEST_LIMIT_EXCEEDED","message":"TotalRequests Limit exceeded."}]""")
      true
    } else false

  private def send(x: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    if (status == 204) x.sendResponseHeaders(status, -1)
    else { x.sendResponseHeaders(status, bytes.length); x.getResponseBody.write(bytes) }
    x.close()
  }

  private def authorized(x: HttpExchange): Boolean =
    x.getRequestHeaders.getFirst("Authorization") == s"Bearer ${currentToken.get()}"

  private def q(x: HttpExchange): String = {
    val raw = Option(x.getRequestURI.getRawQuery).getOrElse("")
    raw.split("&").collectFirst {
      case kv if kv.startsWith("q=") =>
        URLDecoder.decode(kv.drop(2), StandardCharsets.UTF_8)
    }.getOrElse("")
  }

  private val IdsPage1 = (0 until 2).map(i => f"00A$i%07d")
  private val IdsPage2 = (2 until 5).map(i => f"00A$i%07d")

  private def recordJson(id: String): String = {
    val i = id.drop(3).toInt
    s"""{"attributes":{"type":"account"},"Id":"$id","Name":"Account $i",
       |"Amount":${i * 10}.5,"NumEmployees":${i * 3},"IsActive":${i % 2 == 0},
       |"LastModifiedDate":"2024-01-01T00:0$i:00.000+0000","IsDeleted":false}"""
      .stripMargin.replace("\n", "")
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    port = server.getAddress.getPort

    // token endpoints: /token/bad always refuses (the reference's login
    // endpoint on a sandbox org); /token/good grants and rotates
    server.createContext("/token/bad", (x: HttpExchange) =>
      send(x, 400, """{"error":"invalid_grant"}"""))
    server.createContext("/token/good", { (x: HttpExchange) =>
      lastTokenForm.set(new String(x.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
      val tok = s"tok${tokenGrants.incrementAndGet()}"
      currentToken.set(tok)
      send(x, 200, s"""{"access_token":"$tok","instance_url":"$base"}""")
    })

    server.createContext("/services/data/v56.0/sobjects/account/describe", { x =>
      if (!authorized(x)) send(x, 401, "expired")
      else send(x, 200,
        """{"fields":[{"name":"Id","type":"id"},{"name":"Name","type":"string"},
          |{"name":"Amount","type":"currency"},{"name":"NumEmployees","type":"int"},
          |{"name":"IsActive","type":"boolean"},
          |{"name":"LastModifiedDate","type":"datetime"},
          |{"name":"CloseDate","type":"date"},
          |{"name":"IsDeleted","type":"boolean"}]}""".stripMargin.replace("\n", ""))
    })

    // sobject writeback + list (the /sobjects prefix catches both)
    server.createContext("/services/data/v56.0/sobjects", { x =>
      val path = x.getRequestURI.getPath
      if (!authorized(x)) send(x, 401, "expired")
      else if ((x.getRequestMethod == "PATCH" || x.getRequestMethod == "POST")
        && throttled(x)) ()
      else if (x.getRequestMethod == "GET" &&
        path == "/services/data/v56.0/sobjects")
        send(x, 200, """{"sobjects":[{"name":"account"},{"name":"contact"}]}""")
      else if (x.getRequestMethod == "PATCH") {
        lastPatchBody.set(new String(x.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
        path.split("/").last match {
          case id if id.startsWith("BAD") =>
            send(x, 400, s"""[{"errorCode":"MALFORMED_ID","message":"$id"}]""")
          case _ => send(x, 204, "")
        }
      }
      else if (x.getRequestMethod == "POST")
        send(x, 201, """{"id":"NEW0000001","success":true,"errors":[]}""")
      else send(x, 404, "unknown sobjects route")
    })

    server.createContext("/services/data/v56.0/query", { x =>
      if (!authorized(x)) { send(x, 401, "expired"); return }
      if (throttled(x)) return
      lastBatchHeader.set(x.getRequestHeaders.getFirst("Sforce-Query-Options"))
      val path = x.getRequestURI.getPath
      val soql = q(x)
      if (path.endsWith("/cursor-2")) // second page of the id scan
        send(x, 200, s"""{"totalSize":5,"done":true,"records":[
          |${IdsPage2.map(id => s"""{"Id":"$id"}""").mkString(",")}]}"""
          .stripMargin.replace("\n", ""))
      else if (path.endsWith("/cursor-empty")) // 0 records, live cursor
        send(x, 200,
          """{"totalSize":5,"done":false,"nextRecordsUrl":"/services/data/v56.0/query/cursor-2","records":[]}""")
      else if (soql.contains("LIMIT 99")) // route via the empty page
        send(x, 200, s"""{"totalSize":5,"done":false,
          |"nextRecordsUrl":"/services/data/v56.0/query/cursor-empty","records":[
          |${IdsPage1.map(id => s"""{"Id":"$id"}""").mkString(",")}]}"""
          .stripMargin.replace("\n", ""))
      else if (soql.startsWith("SELECT COUNT()"))
        send(x, 200, """{"totalSize":5,"done":true,"records":[]}""")
      else if (soql.startsWith("SELECT Id FROM account"))
        send(x, 200, s"""{"totalSize":5,"done":false,
          |"nextRecordsUrl":"/services/data/v56.0/query/cursor-2","records":[
          |${IdsPage1.map(id => s"""{"Id":"$id"}""").mkString(",")}]}"""
          .stripMargin.replace("\n", ""))
      else if (soql.contains("WHERE Id IN")) {
        val ids = "00A[0-9]{7}".r.findAllIn(soql).toSeq.distinct
        send(x, 200, s"""{"totalSize":${ids.size},"done":true,"records":[
          |${ids.map(recordJson).mkString(",")}]}""".stripMargin.replace("\n", ""))
      } else if (soql.contains("ORDER BY LastModifiedDate DESC"))
        send(x, 200,
          """{"totalSize":1,"done":true,"records":[{"LastModifiedDate":"2024-01-01T00:04:00.000+0000"}]}""")
      else if (soql.contains(" GROUP BY IsActive")) {
        lastGroupBySoql.set(soql)
        // SOQL aggregate responses: group fields by NAME, aggregates
        // as positional expr0..exprN over the aggregate list only.
        // expr1 for the false group is deliberately INTEGRAL JSON for
        // a double-typed field (MIN(Amount) = 10) — the widening the
        // reader's type guard depends on
        send(x, 200, """{"totalSize":2,"done":true,"records":[
          |{"IsActive":false,"expr0":2,"expr1":10,"expr2":"2024-01-01T00:03:00.000+0000"},
          |{"IsActive":true,"expr0":3,"expr1":0.5,"expr2":"2024-01-01T00:04:00.000+0000"}]}"""
          .stripMargin.replace("\n", ""))
      }
      else if (soql.startsWith("SELECT COUNT(Id), MIN(Amount), MAX(Amount) FROM account"))
        // global stats probe with integral JSON on double-typed fields
        send(x, 200,
          """{"totalSize":1,"done":true,"records":[{"expr0":5,"expr1":10,"expr2":40}]}""")
      else send(x, 400, s"unexpected soql: $soql")
    })
    server.setExecutor(null)
    server.start()
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop(0)
    super.afterAll()
  }

  private def transport(): HttpTransport = new HttpTransport(
    tokenEndpoints = Seq(s"$base/token/bad", s"$base/token/good"),
    creds = RestCredentials("cid", "csecret", "rtok"))

  // ----------------------------------------------------------------- tests
  test("auth: refresh-token grant falls back to the next endpoint (login→test)") {
    val before = tokenGrants.get()
    val t = transport()
    assert(t.listObjects() == Seq("account", "contact"))
    assert(tokenGrants.get() == before + 1) // bad endpoint rejected, good granted
    val form = lastTokenForm.get()
    assert(form.contains("grant_type=refresh_token") && form.contains("client_id=cid")
      && form.contains("refresh_token=rtok"))
  }

  test("describe maps remote field types to engine type tags") {
    assert(transport().describe("account") == Seq(
      "Id" -> "string", "Name" -> "string", "Amount" -> "double",
      "NumEmployees" -> "long", "IsActive" -> "boolean",
      "LastModifiedDate" -> "datetime", "CloseDate" -> "datetime",
      "IsDeleted" -> "boolean"))
  }

  test("paginated id scan follows nextRecordsUrl; page-size hint sent") {
    val pages = transport().queryIds("account", Nil, includeDeleted = false,
      limit = None, pageSize = 2).toList
    assert(pages.flatten == (IdsPage1 ++ IdsPage2))
    assert(lastBatchHeader.get() == "batchSize=2")
  }

  test("an empty page with a live cursor does NOT truncate the scan") {
    val pages = transport().queryIds("account", Nil, includeDeleted = false,
      limit = Some(99), pageSize = 2).toList
    assert(pages.flatten == (IdsPage1 ++ IdsPage2)) // survived the empty middle page
  }

  test("Contains neutralizes LIKE wildcards; date strings parse to midnight-UTC micros") {
    assert(Soql.pred(RPred.Contains("Name", "100%_x")) ==
      """Name LIKE '%100\%\_x%'""")
    // date-typed remote fields arrive as bare dates
    val t = transport()
    val ms = java.time.LocalDate.parse("2024-05-01")
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli
    assert(ms == 1714521600000L) // sanity: fixed calendar arithmetic
  }

  test("count pushes COUNT() and reads totalSize; predicates render safely") {
    val t = transport()
    assert(t.count("account", Seq(RPred.Gt("Amount", 10.0)), includeDeleted = false) == 5L)
    // injection attempt: quoted + escaped, never breaks out of the literal
    assert(Soql.lit("x' OR '1'='1") == """'x\' OR \'1\'=\'1'""")
    intercept[IllegalArgumentException](Soql.field("Id; DROP TABLE"))
  }

  test("fetchByIds converts datetime strings to epoch micros") {
    val rows = transport().fetchByIds("account", Seq("00A0000001"),
      Seq("Id", "Amount", "LastModifiedDate"))
    assert(rows.size == 1)
    val r = rows.head
    assert(r("Id") == "00A0000001" && r("Amount") == 10.5)
    // 2024-01-01T00:01:00Z in micros
    assert(r("LastModifiedDate") == 1704067260000000L)
  }

  test("writeback: PATCH existing → Right, POST new → Right(new id), error → Left envelope") {
    val t = transport()
    assert(t.upsert("account", Map("Id" -> "00A0000002", "Name" -> "renamed")) ==
      Right("00A0000002"))
    assert(t.upsert("account", Map("Name" -> "fresh")) == Right("NEW0000001"))
    val bad = t.upsert("account", Map("Id" -> "BAD1", "Name" -> "x"))
    assert(bad.isLeft && bad.swap.exists(_.contains("MALFORMED_ID")))
  }

  test("numeric SOQL literals always render in plain decimal notation") {
    // Double.toString would emit 1.0E7 / 1.0E-4 — exponent forms the
    // remote's literal grammar rejects
    assert(Soql.lit(10000000.0) == "10000000")
    assert(Soql.lit(0.0001) == "0.0001")
    assert(Soql.lit(1.0e-7f) == "0.0000001")
    assert(Soql.lit(1234.5) == "1234.5")
    intercept[IllegalArgumentException] { Soql.lit(Double.NaN) }
    intercept[IllegalArgumentException] { Soql.lit(Float.PositiveInfinity) }
  }

  test("writeback sends datetime fields as ISO-8601 text, not raw micros") {
    val t = transport()
    // the connector's writers hand datetimes over as epoch-micros longs
    // (RestDataWriter/upsertWithStatus); the wire must carry ISO-8601
    assert(t.upsert("account", Map("Id" -> "00A0000007",
      "Name" -> "dt", "LastModifiedDate" -> 1704067260000123L)).isRight)
    val body = lastPatchBody.get()
    assert(body.contains(""""LastModifiedDate":"2024-01-01T00:01:00.000123Z""""), body)
    assert(!body.contains("1704067260000123"), body)
    // java.sql.Timestamp keeps sub-millisecond precision too
    val ts = java.sql.Timestamp.from(
      java.time.Instant.parse("2024-01-01T00:00:00.000123Z"))
    assert(t.upsert("account", Map("Id" -> "00A0000008", "When" -> ts)).isRight)
    assert(lastPatchBody.get().contains("2024-01-01T00:00:00.000123Z"),
      lastPatchBody.get())
    // DATE-typed fields (raw remote type "date", which typeTag folds
    // into the engine's datetime) want "yyyy-MM-dd" on the wire — a
    // full instant there is rejected by the remote's literal grammar
    assert(t.upsert("account", Map("Id" -> "00A0000009",
      "CloseDate" -> 1704067200000000L)).isRight)
    val dbody = lastPatchBody.get()
    assert(dbody.contains(""""CloseDate":"2024-01-01""""), dbody)
    assert(!dbody.contains("2024-01-01T"), dbody)
  }

  test("statsGrouped builds GROUP BY SOQL; group fields by name, aggregates as exprN, datetimes to micros") {
    val t = transport()
    val rows = t.statsGrouped("account", Seq("IsActive"),
      Seq(RAgg.CountStar, RAgg.Min("Amount"), RAgg.Max("LastModifiedDate")),
      Seq(RPred.Gt("Amount", 0.0)), includeDeleted = true)
    assert(lastGroupBySoql.get() ==
      "SELECT IsActive, COUNT(Id), MIN(Amount), MAX(LastModifiedDate) " +
        "FROM account WHERE Amount > 0 GROUP BY IsActive",
      lastGroupBySoql.get())
    val byActive = rows.map(r => r.head -> r.tail).toMap
    // expr1 arrived as integral JSON (10) for the double-typed Amount:
    // the transport widens it to 10.0, never hands a Long to a double
    assert(byActive(false) == Seq(2L, 10.0,
      1704067200000000L + 3L * 60L * 1000000L))
    assert(byActive(true) == Seq(3L, 0.5,
      1704067200000000L + 4L * 60L * 1000000L))
  }

  test("global stats widens integral JSON on double-typed MIN/MAX") {
    val got = transport().stats("account",
      Seq(RAgg.CountStar, RAgg.Min("Amount"), RAgg.Max("Amount")),
      Nil, includeDeleted = true)
    assert(got == Seq(5L, 10.0, 40.0), got.toString)
  }

  test("latestModified reads the ORDER BY DESC LIMIT 1 cursor probe") {
    assert(transport().latestModified("account", "LastModifiedDate") ==
      1704067440000000L) // 00:04:00Z
  }

  test("expired token: one transparent re-auth + retry on 401") {
    val t = transport()
    assert(t.describe("account").nonEmpty) // authenticates
    currentToken.set("rotated-behind-our-back") // server-side expiry
    val grants = tokenGrants.get()
    assert(t.listObjects() == Seq("account", "contact")) // 401 → re-auth → ok
    assert(tokenGrants.get() == grants + 1)
  }

  test("429 raises RestHttpError with the parsed Retry-After; RestRetry completes the call") {
    throttleNext.set(1)
    val e = intercept[RestHttpError] {
      transport().count("account", Nil, includeDeleted = false)
    }
    assert(e.status == 429 && e.retryAfterMs.contains(0L), e)
    assert(e.body.contains("REQUEST_LIMIT_EXCEEDED"))
    assert(throttleNext.get() == 0)
    // the connector-level policy turns the same condition into success
    throttleNext.set(2)
    val n = RestRetry.withRetry(RetryPolicy(3, 0L, 0L))(
      transport().count("account", Nil, includeDeleted = false))
    assert(n == 5L)
  }

  test("throttled upsert RETHROWS for the retry layer instead of enveloping a good record as failed") {
    val t = transport()
    t.describe("account") // warm the date-field cache outside the throttle window
    throttleNext.set(1)
    intercept[RestHttpError] {
      t.upsert("account", Map("Id" -> "00A0000002", "Name" -> "busy-org"))
    }
    // record-level failures still use the never-throwing envelope
    throttleNext.set(0)
    assert(t.upsert("account", Map("Id" -> "BAD1", "Name" -> "x")).isLeft)
    // and the retry wrapper lands the write
    throttleNext.set(1)
    assert(RestRetry.withRetry(RetryPolicy(2, 0L, 0L))(
      t.upsert("account", Map("Id" -> "00A0000002", "Name" -> "retried"))) ==
      Right("00A0000002"))
  }

  test("end-to-end DSv2 read over real HTTP survives a throttled cursor (429 → retry → rows)") {
    throttlesServed.set(0)
    throttleNext.set(3)
    val rows = spark.read.format("graft-rest")
      .option("transport", "http")
      .option("object", "account")
      .option("tokenUrl", s"$base/token/bad,$base/token/good")
      .option("clientId", "cid").option("clientSecret", "csecret")
      .option("refreshToken", "rtok")
      .option("maxRetries", "3").option("retryBaseMs", "0")
      .option("retryMaxMs", "0")
      .load()
      .select("Id", "Name").collect()
    assert(rows.length == 5)
    assert(throttlesServed.get() == 3) // the 429s really were served
    assert(throttleNext.get() == 0)
  }

  test("end-to-end DSv2 read over real HTTP (transport=http)") {
    val df = spark.read.format("graft-rest")
      .option("transport", "http")
      .option("object", "account")
      .option("tokenUrl", s"$base/token/bad,$base/token/good")
      .option("clientId", "cid").option("clientSecret", "csecret")
      .option("refreshToken", "rtok")
      .load()
      .select("Id", "Name", "Amount", "LastModifiedDate")
    val rows = df.collect()
    assert(rows.length == 5)
    assert(rows.map(_.getString(0)).sorted.toSeq == (IdsPage1 ++ IdsPage2))
    assert(rows.forall(_.getAs[java.sql.Timestamp]("LastModifiedDate") != null))
  }
}
