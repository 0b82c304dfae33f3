package graft.sources.rest

import java.util.concurrent.ConcurrentLinkedQueue
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/** Structural predicate pushed to the remote API — the injection-safe
  * replacement for the reference's string-interpolated SOQL WHERE
  * building (reference: revtron/salesforce/main.py:123-143, which
  * quotes values by repr — SURVEY §3.3 flags it as unsafe by design). */
sealed trait RPred
object RPred {
  final case class Eq(field: String, v: Any)        extends RPred
  final case class Gt(field: String, v: Any)        extends RPred
  final case class Ge(field: String, v: Any)        extends RPred
  final case class Lt(field: String, v: Any)        extends RPred
  final case class Le(field: String, v: Any)        extends RPred
  final case class In(field: String, vs: Seq[Any])  extends RPred
  final case class IsNull(field: String)            extends RPred
  final case class IsNotNull(field: String)         extends RPred
  final case class Contains(field: String, s: String) extends RPred
}

/** Remote-computable aggregate — the probe vocabulary of the
  * reference's `sobject_size` one-shot `SELECT COUNT(Id), MIN(f),
  * MAX(f)` (reference: revtron/salesforce/main.py:185-228, SOQL at
  * main.py:195). DSv2 aggregate pushdown translates Spark's
  * CountStar/Count/Min/Max into these; anything else stays a Spark
  * aggregate over the scan. */
sealed trait RAgg
object RAgg {
  case object CountStar                    extends RAgg
  final case class CountField(field: String) extends RAgg
  final case class Min(field: String)        extends RAgg
  final case class Max(field: String)        extends RAgg
}

/** The transport seam — everything the reference's `Salesforce` class
  * does over HTTP (auth/request/describe/query/upsert, reference:
  * revtron/salesforce/main.py:14-104,230-249), as an interface the
  * connector talks to. Production would implement this with an HTTP
  * client inside the partition reader; tests use [[FakeTransport]],
  * a deterministic in-memory "org". */
trait RestTransport extends Serializable {
  /** S3: list remote objects. */
  def listObjects(): Seq[String]
  /** S5: remaining API quota (the reference reads DailyApiRequests,
    * revtron/salesforce/main.py:102-104) — admission control before
    * planning partitions. */
  def limits(): Map[String, Long]
  /** S4: describe → ordered (fieldName, typeTag) pairs; typeTag ∈
    * string|double|long|boolean|datetime. */
  def describe(obj: String): Seq[(String, String)]
  /** S7: remote COUNT with pushed predicates. */
  def count(obj: String, preds: Seq[RPred], includeDeleted: Boolean): Long
  /** S7 generalized: ONE remote aggregate call evaluating every
    * requested [[RAgg]] (with pushed predicates) — the probe DSv2
    * aggregate pushdown lands on, so `SELECT count(*)/min/max FROM
    * rest_tbl` never walks the id cursor. Returns values aligned with
    * `aggs`: counts as Long, min/max in the field's wire type
    * (String/Double/Long/Boolean, datetimes as epoch micros), null
    * over an empty match set. */
  def stats(obj: String, aggs: Seq[RAgg], preds: Seq[RPred],
      includeDeleted: Boolean): Seq[Any]
  /** S7 grouped: ONE remote GROUP BY aggregate call (SOQL has GROUP
    * BY; the reference builds such SOQL strings by hand) — returns
    * one row per group, values aligned with `groupBy ++ aggs` (group
    * values in the field's wire type, datetimes as epoch micros;
    * aggregates as in [[stats]]). Empty match set ⇒ no rows. */
  def statsGrouped(obj: String, groupBy: Seq[String], aggs: Seq[RAgg],
      preds: Seq[RPred], includeDeleted: Boolean): Seq[Seq[Any]]
  /** S6 phase 1: the id scan, following the remote cursor page by page
    * (inherently serial — runs on the DRIVER at planInputPartitions). */
  def queryIds(obj: String, preds: Seq[RPred], includeDeleted: Boolean,
      limit: Option[Int], pageSize: Int): Iterator[Seq[String]]
  /** S6 phase 2: fetch full rows for an id batch (runs on EXECUTORS —
    * the reference's serial chunk loop, parallelized). */
  def fetchByIds(obj: String, ids: Seq[String], columns: Seq[String]): Seq[Map[String, Any]]
  /** S8: single-record upsert; Left(error) on failure, never throws. */
  def upsert(obj: String, record: Map[String, Any]): Either[String, String]
  /** Streaming cursor probe: max modification timestamp (micros) —
    * the remote high-watermark a MicroBatchStream advances to. */
  def latestModified(obj: String, dateField: String): Long
}

/** Deterministic fake "org": generated base records + a mutable
  * overlay for writebacks, keyed by the `org` option so independent
  * tests don't share state. Page/batch constants mirror the reference
  * (200-row pages, salesforce/main.py:152; soft-delete filtering via
  * query vs queryAll, main.py:150,175). */
final class FakeTransport(org: String, numRecords: Int, seed: Long,
    environment: String = "login", throttleFirst: Int = 0) extends RestTransport {
  import FakeTransport._

  /** Throttle mode (zero-egress stand-in for an org under quota
    * pressure): the first `throttleFirst` data calls on THIS transport
    * instance are refused with a 429 + Retry-After before any work —
    * exactly the admission rejection [[RestRetry]] exists for. Each
    * reader/writer builds its own transport, so `throttleFirst = n`
    * means every partition's first n attempts bounce, deterministically. */
  private val throttledCalls = new java.util.concurrent.atomic.AtomicInteger(0)
  private def admission(what: String): Unit =
    if (throttleFirst > 0 && throttledCalls.incrementAndGet() <= throttleFirst) {
      CallLog.throttles.add(s"$org/$what")
      throw RestHttpError(429,
        """[{"errorCode":"REQUEST_LIMIT_EXCEEDED","message":"TotalRequests Limit exceeded."}]""",
        retryAfterMs = Some(0L)) // tests pace by count, not wall-clock
    }

  /** S1: the reference's OAuth env fallback — a token refresh against
    * 'login' falls back to the 'test' endpoint on failure
    * (revtron/salesforce/main.py:79-87). The fake accepts both and
    * records which endpoint authenticated. */
  val authenticatedEnv: String = environment match {
    case "login" | "test" => environment
    case other => "test" // unknown env: fall back, like the reference
  }

  private val objects = Map(
    "account" -> Seq("Id" -> "string", "Name" -> "string", "Industry" -> "string",
      "Amount" -> "double", "NumEmployees" -> "long", "IsActive" -> "boolean",
      "LastModifiedDate" -> "datetime", "IsDeleted" -> "boolean"),
    "contact" -> Seq("Id" -> "string", "Name" -> "string", "AccountId" -> "string",
      "Email" -> "string", "LastModifiedDate" -> "datetime", "IsDeleted" -> "boolean"))

  override def listObjects(): Seq[String] = objects.keys.toSeq.sorted

  override def limits(): Map[String, Long] = {
    val used = CallLog.describes.size + CallLog.idQueries.size +
      CallLog.fetches.size + CallLog.stats.size
    Map("DailyApiRequests.Max" -> 100000L,
      "DailyApiRequests.Remaining" -> (100000L - used))
  }

  override def describe(obj: String): Seq[(String, String)] = {
    CallLog.describes.add(s"$org/$obj")
    objects.getOrElse(obj, throw new IllegalArgumentException(s"no such object: $obj"))
  }

  /** base epoch 2024-01-01T00:00Z in micros; record i is modified i
    * minutes later — gives a real date-window axis for S6 tests. */
  private def gen(obj: String, i: Int): Map[String, Any] = {
    val h = (seed * 1315423911L) ^ (i.toLong * 2654435761L)
    obj match {
      case "account" => Map(
        "Id" -> f"00A$i%07d", "Name" -> s"Account $i",
        "Industry" -> Industries(math.abs(h % Industries.length).toInt),
        "Amount" -> (math.abs(h % 1000000L) / 100.0),
        "NumEmployees" -> math.abs(h % 10000L),
        "IsActive" -> (h % 3 != 0),
        "LastModifiedDate" -> (BaseMicros + i * 60L * 1000000L),
        "IsDeleted" -> (i % 50 == 49))
      case "contact" => Map(
        "Id" -> f"00C$i%07d", "Name" -> s"Contact $i",
        "AccountId" -> f"00A${i % math.max(1, numRecords / 4)}%07d",
        "Email" -> s"c$i@example.test",
        "LastModifiedDate" -> (BaseMicros + i * 60L * 1000000L),
        "IsDeleted" -> (i % 50 == 49))
      case other => throw new IllegalArgumentException(s"no such object: $other")
    }
  }

  private def all(obj: String): Seq[Map[String, Any]] = {
    val overlay = Store.of(org, obj)
    val base = (0 until numRecords).map(gen(obj, _))
    val baseIds = base.map(_("Id").asInstanceOf[String]).toSet
    base.map(r => overlay.getOrElse(r("Id").asInstanceOf[String], r)) ++
      overlay.collect { case (id, r) if !baseIds.contains(id) => r }.toSeq
        .sortBy(_("Id").asInstanceOf[String])
  }

  private def matches(r: Map[String, Any], p: RPred): Boolean = {
    def cmp(f: String, v: Any): Option[Int] = (r.get(f).orNull, v) match {
      case (null, _) => None
      case (a: String, b: String) => Some(a.compareTo(b))
      case (a: Double, b) => Some(a.compareTo(b.toString.toDouble))
      case (a: Long, b) => Some(a.compareTo(b.toString.toDouble.toLong))
      case (a: Boolean, b: Boolean) => Some(a.compareTo(b))
      case _ => None
    }
    p match {
      case RPred.Eq(f, v)        => cmp(f, v).contains(0)
      case RPred.Gt(f, v)        => cmp(f, v).exists(_ > 0)
      case RPred.Ge(f, v)        => cmp(f, v).exists(_ >= 0)
      case RPred.Lt(f, v)        => cmp(f, v).exists(_ < 0)
      case RPred.Le(f, v)        => cmp(f, v).exists(_ <= 0)
      case RPred.In(f, vs)       => vs.exists(v => cmp(f, v).contains(0))
      case RPred.IsNull(f)       => r.get(f).orNull == null
      case RPred.IsNotNull(f)    => r.get(f).orNull != null
      case RPred.Contains(f, s)  => r.get(f).orNull match {
        case str: String => str.contains(s); case _ => false
      }
    }
  }

  private def filtered(obj: String, preds: Seq[RPred], includeDeleted: Boolean) =
    all(obj).filter(r => includeDeleted || r("IsDeleted") == false)
      .filter(r => preds.forall(matches(r, _)))

  override def count(obj: String, preds: Seq[RPred], includeDeleted: Boolean): Long = {
    admission(s"count:$obj")
    filtered(obj, preds, includeDeleted).size.toLong
  }

  override def stats(obj: String, aggs: Seq[RAgg], preds: Seq[RPred],
      includeDeleted: Boolean): Seq[Any] = {
    admission(s"stats:$obj")
    CallLog.stats.add(s"$org/$obj aggs=${aggs.size} preds=${preds.size}")
    val rows = filtered(obj, preds, includeDeleted)
    def vals(f: String): Seq[Any] = rows.flatMap(r => Option(r.get(f).orNull))
    def pick(f: String, keepLeft: (Any, Any) => Boolean): Any =
      vals(f).reduceOption((a, b) => if (keepLeft(a, b)) a else b).orNull
    def le(a: Any, b: Any): Boolean = (a, b) match {
      case (x: String, y: String)   => x.compareTo(y) <= 0
      case (x: Double, y: Double)   => x <= y
      case (x: Long, y: Long)       => x <= y
      case (x: Boolean, y: Boolean) => x.compareTo(y) <= 0
      case _ => true
    }
    aggs.map {
      case RAgg.CountStar     => rows.size.toLong
      case RAgg.CountField(f) => vals(f).size.toLong
      case RAgg.Min(f)        => pick(f, le)
      case RAgg.Max(f)        => pick(f, (a, b) => !le(a, b))
    }
  }

  override def statsGrouped(obj: String, groupBy: Seq[String], aggs: Seq[RAgg],
      preds: Seq[RPred], includeDeleted: Boolean): Seq[Seq[Any]] = {
    admission(s"statsGrouped:$obj")
    CallLog.stats.add(
      s"$org/$obj groupBy=${groupBy.mkString(",")} aggs=${aggs.size} preds=${preds.size}")
    val rows = filtered(obj, preds, includeDeleted)
    def le(a: Any, b: Any): Boolean = (a, b) match {
      case (x: String, y: String)   => x.compareTo(y) <= 0
      case (x: Double, y: Double)   => x <= y
      case (x: Long, y: Long)       => x <= y
      case (x: Boolean, y: Boolean) => x.compareTo(y) <= 0
      case _ => true
    }
    rows.groupBy(r => groupBy.map(g => r.get(g).orNull)).toSeq
      .sortBy(_._1.map(String.valueOf).mkString("|"))
      .map { case (key, grp) =>
        def vals(f: String): Seq[Any] = grp.flatMap(r => Option(r.get(f).orNull))
        key ++ aggs.map {
          case RAgg.CountStar     => grp.size.toLong
          case RAgg.CountField(f) => vals(f).size.toLong
          case RAgg.Min(f)        =>
            vals(f).reduceOption((a, b) => if (le(a, b)) a else b).orNull
          case RAgg.Max(f)        =>
            vals(f).reduceOption((a, b) => if (!le(a, b)) a else b).orNull
        }
      }
  }

  override def latestModified(obj: String, dateField: String): Long = {
    admission(s"latestModified:$obj")
    all(obj).flatMap(_.get(dateField)).collect { case l: Long => l }
      .foldLeft(0L)(math.max)
  }

  override def queryIds(obj: String, preds: Seq[RPred], includeDeleted: Boolean,
      limit: Option[Int], pageSize: Int): Iterator[Seq[String]] = {
    admission(s"queryIds:$obj")
    CallLog.idQueries.add(s"$org/$obj preds=${preds.size} limit=$limit")
    val ids = filtered(obj, preds, includeDeleted).map(_("Id").asInstanceOf[String])
    val limited = limit.fold(ids)(ids.take)
    limited.grouped(pageSize)
  }

  override def fetchByIds(obj: String, ids: Seq[String],
      columns: Seq[String]): Seq[Map[String, Any]] = {
    admission(s"fetchByIds:$obj")
    CallLog.fetches.add(s"$org/$obj n=${ids.size} cols=${columns.mkString(",")}")
    val idSet = ids.toSet
    val cols = if (columns.isEmpty) describe(obj).map(_._1) else columns
    all(obj).filter(r => idSet.contains(r("Id").asInstanceOf[String]))
      .map(r => cols.map(c => c -> r.get(c).orNull).toMap)
  }

  override def upsert(obj: String, record: Map[String, Any]): Either[String, String] = {
    admission(s"upsert:$obj")
    record.get("Id") match {
      case Some(id: String) if id.nonEmpty =>
        if (id.startsWith("BAD")) Left(s"MALFORMED_ID: $id")  // error channel, never throws
        else {
          val existing = all(obj).find(_("Id") == id)
          existing match {
            case Some(old) => Store.of(org, obj).put(id, old ++ record); Right(id)
            case None => Left(s"NOT_FOUND: $id")
          }
        }
      case _ =>
        val id = f"NEW${Store.nextId(org)}%07d"
        Store.of(org, obj).put(id, record + ("Id" -> id) +
          ("IsDeleted" -> false) + ("LastModifiedDate" -> BaseMicros))
        Right(id)
    }
  }
}

object FakeTransport {
  val BaseMicros: Long = 1704067200000000L // 2024-01-01T00:00:00Z
  val Industries: Seq[String] =
    Seq("Agriculture", "Banking", "Consulting", "Energy", "Media", "Retail")

  /** In-memory writeback store, JVM-wide (stands in for the remote org;
    * local-mode executors share it). */
  object Store {
    private val orgs = TrieMap.empty[String, TrieMap[String, Map[String, Any]]]
    private val counter = new java.util.concurrent.atomic.AtomicLong(0)
    def of(org: String, obj: String): TrieMap[String, Map[String, Any]] =
      orgs.getOrElseUpdate(s"$org/$obj", TrieMap.empty)
    def nextId(org: String): Long = counter.incrementAndGet()
    def clear(org: String): Unit = orgs.keys.filter(_.startsWith(s"$org/"))
      .foreach(orgs.remove)
  }

  /** Driver/test-visible call log (local mode shares the JVM). */
  object CallLog {
    val describes = new ConcurrentLinkedQueue[String]()
    val throttles = new ConcurrentLinkedQueue[String]()
    val idQueries = new ConcurrentLinkedQueue[String]()
    val fetches = new ConcurrentLinkedQueue[String]()
    val stats = new ConcurrentLinkedQueue[String]()
    def clear(): Unit = { describes.clear(); idQueries.clear()
      fetches.clear(); stats.clear(); throttles.clear() }
    def fetchCount: Int = fetches.size()
  }

  /** Keys arrive lowercased (CaseInsensitiveStringMap). */
  def fromOptions(options: Map[String, String]): FakeTransport =
    new FakeTransport(
      options.getOrElse("org", "default"),
      options.getOrElse("numrecords", "1000").toInt,
      options.getOrElse("seed", "42").toLong,
      options.getOrElse("environment", "login"),
      options.getOrElse("throttlefirst", "0").toInt)
}
