package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core._
import graft.ext.{Dedup, Multimodal, Similarity, TextOps}
import graft.operators.AsOfJoin
import graft.streaming.Streams

/** Driver contract — every operator in SURVEY.md §2 (D1–D17, S6/S7
  * batch semantics, T1) plus the north-star LLM-pipeline extensions,
  * each as a `queries` entry with (where SQL-expressible) a DuckDB
  * oracle in `oracleSql`. Column names AND types are aligned between
  * the Spark result and the oracle; all floating-point aggregates go
  * through exact DECIMAL(18,4) sums cast back to double so results are
  * order-independent and engine-portable.
  */
object SparkEntry {

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    Fx.t(s, dir, name)

  /** documents, hash-spread: each fixture table is ONE parquet file =
    * one input split, so per-row text expressions would otherwise run
    * on a single core. At real scale the split count provides this and
    * the repartition is unnecessary. */
  private def docsSpread(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "documents").repartition(col("doc_id"))

  /** Derived MULTI-LINE corpus for the paragraph-dedup contracts
    * (q119/q120): the fixture bodies carry no newlines, so boilerplate
    * paragraphs are planted arithmetically — a shared header on every
    * doc, a promo footer on every third, a unique tail elsewhere —
    * mirrored term-for-term by the oracle's `d2` CTE. */
  private def docsMultiline(s: SparkSession, dir: String): DataFrame =
    docsSpread(s, dir).select(col("doc_id"),
      concat(
        lit("shared header line\n"), col("text"), lit("\n"),
        when(col("doc_id") % 3 === 0, lit("promo footer line"))
          .otherwise(concat(lit("unique tail "), col("doc_id").cast("string"))),
        // a line repeated WITHIN one doc only — pins the distinct-doc
        // rule: df counts documents, so this must never become hot
        when(col("doc_id") % 7 === 2, concat(
          lit("\nself repeat "), col("doc_id").cast("string"),
          lit("\nself repeat "), col("doc_id").cast("string")))
          .otherwise(lit(""))
      ).as("text"))

  /** Exact, order-independent double aggregate: sum as decimal → double. */
  private def dsum(c: Column): Column = sum(c.cast("decimal(18,4)")).cast("double")

  private val Stop20 =
    "'the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','at','by','from','this','be'"

  /** DuckDB replay of the portable MinHash+LSH pipeline (k=16, 4 bands
    * of 4, 3-gram shingles, 2-universal double hashing h_i = a + i·b
    * over the md5 56-bit halves, jaccard ≥ 0.5) — mirrors
    * `Dedup.minhashNearDups(..., portable = true)` hash for hash. */
  private val MinhashOracleSql: String = {
    val k = 16; val bands = 4; val r = k / bands
    val hCols = (0 until k).map(i => s"min(ha + $i * hb) AS h$i").mkString(",\n    ")
    val bandSelects = (0 until bands).map { b =>
      val parts = (0 until r).map(i => s"h${b * r + i}").mkString(", '|', ")
      s"SELECT doc_id, $b AS band, md5(concat('$b', '|', $parts)) AS bh FROM sig"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH tk AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS tokens FROM documents),
      |sh AS (
      |  SELECT doc_id, CASE WHEN len(tokens) >= 3 THEN list_distinct(list_transform(range(1, len(tokens) - 1), i -> array_to_string(tokens[i:i+2], ' '))) ELSE [] END AS s FROM tk),
      |ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
      |hx AS (SELECT doc_id,
      |    CAST(concat('0x', substring(md5(concat('0', '|', g)), 1, 14)) AS BIGINT) AS ha,
      |    CAST(concat('0x', substring(md5(concat('0', '|', g)), 17, 14)) AS BIGINT) AS hb
      |  FROM ex),
      |sig AS (SELECT doc_id,
      |    $hCols
      |  FROM hx GROUP BY doc_id),
      |bands AS (
      |  $bandSelects),
      |cand AS (
      |  SELECT ba.doc_id AS a, bb.doc_id AS b FROM bands ba
      |  JOIN bands bb ON ba.band = bb.band AND ba.bh = bb.bh AND ba.doc_id < bb.doc_id
      |  GROUP BY 1, 2),
      |sized AS (SELECT doc_id, s, len(s) AS n FROM sh),
      |pairs AS (
      |  SELECT c.a, c.b, len(list_intersect(sa.s, sb.s)) AS inter, sa.n AS na, sb.n AS nb
      |  FROM cand c JOIN sized sa ON sa.doc_id = c.a JOIN sized sb ON sb.doc_id = c.b),
      |j AS (
      |  SELECT a, b, CASE WHEN na + nb - inter = 0 THEN 0.0
      |    ELSE CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE) END AS jaccard
      |  FROM pairs)
      |SELECT a, b, jaccard FROM j WHERE jaccard >= 0.5 ORDER BY a, b""".stripMargin
  }

  /** DuckDB replay of the CROSS-SET MinHash+LSH pipeline for q107: the
    * corpus/batch split (batch = non-corpus docs plus first-word-dropped
    * rewrites of corpus docs under offset ids), per-side signatures with
    * the same 2-universal family, banded candidates restricted to
    * batch × corpus, exact-Jaccard verify ≥ 0.5 — mirrors
    * `Dedup.incrementalNearDups(..., portable = true)`. */
  private val IncrementalMinhashOracleSql: String = {
    val k = 16; val bands = 4; val r = k / bands
    val hCols = (0 until k).map(i => s"min(ha + $i * hb) AS h$i").mkString(",\n    ")
    val bandSelects = (0 until bands).map { b =>
      val parts = (0 until r).map(i => s"h${b * r + i}").mkString(", '|', ")
      s"SELECT side, doc_id, $b AS band, md5(concat('$b', '|', $parts)) AS bh FROM sig"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH d2 AS (
      |  SELECT 'c' AS side, doc_id, text FROM documents WHERE doc_id % 3 = 0
      |  UNION ALL
      |  SELECT 'b', doc_id, text FROM documents WHERE doc_id % 3 <> 0
      |  UNION ALL
      |  SELECT 'b', doc_id + (SELECT max(doc_id) + 1 FROM documents), regexp_replace(text, '^[^ ]+ ', '') FROM documents WHERE doc_id % 3 = 0),
      |tk AS (
      |  SELECT side, doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS tokens FROM d2),
      |sh AS (
      |  SELECT side, doc_id, CASE WHEN len(tokens) >= 3 THEN list_distinct(list_transform(range(1, len(tokens) - 1), i -> array_to_string(tokens[i:i+2], ' '))) ELSE [] END AS s FROM tk),
      |ex AS (SELECT side, doc_id, unnest(s) AS g FROM sh),
      |hx AS (SELECT side, doc_id,
      |    CAST(concat('0x', substring(md5(concat('0', '|', g)), 1, 14)) AS BIGINT) AS ha,
      |    CAST(concat('0x', substring(md5(concat('0', '|', g)), 17, 14)) AS BIGINT) AS hb
      |  FROM ex),
      |sig AS (SELECT side, doc_id,
      |    $hCols
      |  FROM hx GROUP BY side, doc_id),
      |bands AS (
      |  $bandSelects),
      |cand AS (
      |  SELECT ba.doc_id AS a, bb.doc_id AS b FROM bands ba
      |  JOIN bands bb ON ba.band = bb.band AND ba.bh = bb.bh
      |  WHERE ba.side = 'b' AND bb.side = 'c'
      |  GROUP BY 1, 2),
      |sized AS (SELECT side, doc_id, s, len(s) AS n FROM sh),
      |pairs AS (
      |  SELECT c.a, c.b, len(list_intersect(sa.s, sb.s)) AS inter, sa.n AS na, sb.n AS nb
      |  FROM cand c
      |  JOIN sized sa ON sa.doc_id = c.a AND sa.side = 'b'
      |  JOIN sized sb ON sb.doc_id = c.b AND sb.side = 'c'),
      |j AS (
      |  SELECT a, b, CASE WHEN na + nb - inter = 0 THEN 0.0
      |    ELSE CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE) END AS jaccard
      |  FROM pairs)
      |SELECT a, b, jaccard FROM j WHERE jaccard >= 0.5 ORDER BY a, b""".stripMargin
  }

  /** DuckDB replay of the portable 60-bit SimHash pipeline (votes →
    * sign fold → 4×15-bit bands → Hamming ≤ 3) — mirrors
    * `Dedup.simhashNearDups(..., portable = true)` bit for bit. */
  /** DuckDB replay of the media dHash near-dup: 61 evenly-spaced probe
    * bytes read from the hex dump (probe i = byte ⌊i·(nb−1)/60⌋, two
    * hex chars at 2·idx+1), adjacent gradient-sign bits packed into
    * the 60-bit signature, 15-bit banding, bit_count Hamming ≤ 3. */
  private val DhashOracleSql: String = {
    val samples = 61
    val probes = (0 until samples).map(i =>
      s"coalesce(try_cast(concat('0x', substring(hx, CAST(2 * (($i * (n_bytes - 1)) // ${samples - 1}) + 1 AS INTEGER), 2)) AS BIGINT), 0) AS s$i")
      .mkString(",\n    ")
    val bitsSum = (0 until samples - 1).map(i =>
      s"CASE WHEN s$i > s${i + 1} THEN (CAST(1 AS BIGINT) << $i) ELSE CAST(0 AS BIGINT) END")
      .mkString(" + ")
    val bandVals = (0 until 4).map(b => s"(sig >> ${b * 15}) & ${(1L << 15) - 1}").mkString(", ")
    s"""WITH docs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000,
      |    concat(substring(text, 1, 10), 'X', substring(text, 12))
      |  FROM documents),
      |h AS (
      |  SELECT doc_id AS media_id, hex(encode(text)) AS hx,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      |  FROM docs),
      |p AS (SELECT media_id,
      |    $probes
      |  FROM h WHERE n_bytes > 0),
      |sig AS (SELECT media_id, $bitsSum AS sig FROM p
      |  UNION ALL SELECT media_id, 0 AS sig FROM h
      |  WHERE n_bytes = 0 OR n_bytes IS NULL),
      |b AS (SELECT media_id, sig, unnest([0, 1, 2, 3]) AS band, unnest([$bandVals]) AS bh FROM sig),
      |cand AS (
      |  SELECT ba.media_id AS a, bb.media_id AS b, ba.sig AS sa, bb.sig AS sb
      |  FROM b ba JOIN b bb ON ba.band = bb.band AND ba.bh = bb.bh AND ba.media_id < bb.media_id
      |  GROUP BY 1, 2, 3, 4)
      |SELECT a, b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming FROM cand
      |WHERE bit_count(xor(sa, sb)) <= 3 ORDER BY a, b""".stripMargin
  }

  /** DuckDB replay of the MMR greedy rerank, UNROLLED: the k sequential
    * argmax steps become k CTE stages (picks₁ ⊂ picks₂ ⊂ …), each
    * computing `λ·rel − (1−λ)·max-sim-to-picked` with the exact q49
    * cosine arithmetic. λ constants are the PLAIN literals 0.7/0.3 —
    * DuckDB folds decimal literals exactly, and the engine side derives
    * the same doubles via 700/1000.0 and 300/1000.0 (writing
    * `1.0 - 0.7` ANYWHERE gives 0.30000000000000004, one ulp off the
    * 0.3 literal, and the bit-exact compare catches it). */
  private val MmrOracleSql: String = {
    val k = 5
    val lam = "0.7"; val oneMinus = "0.3"
    def cos(a: String, b: String) =
      s"list_sum(list_transform(range(1, 65), i -> ($a.e[i] / $a.nrm) * ($b.e[i] / $b.nrm)))"
    val steps = (2 to k).map { n =>
      // div via join + max aggregate (DuckDB cannot correlate an outer
      // column into a lambda inside a scalar subquery), then rel/e/nrm
      // re-joined from cand for the argmax stage
      s"""d$n AS (
      |  SELECT c.query_id, c.nn_id, max(${cos("c", "p")}) AS div
      |  FROM cand c JOIN picks${n - 1} p ON p.query_id = c.query_id
      |  WHERE NOT EXISTS (SELECT 1 FROM picks${n - 1} x WHERE x.query_id = c.query_id AND x.nn_id = c.nn_id)
      |  GROUP BY c.query_id, c.nn_id),
      |e$n AS (
      |  SELECT d.query_id, d.nn_id, c.rel, c.e, c.nrm, d.div
      |  FROM d$n d JOIN cand c ON c.query_id = d.query_id AND c.nn_id = d.nn_id),
      |s$n AS (
      |  SELECT query_id, nn_id, e, nrm, ($lam * rel - $oneMinus * div) AS mmr FROM (
      |    SELECT t.*, row_number() OVER (PARTITION BY query_id ORDER BY ($lam * rel - $oneMinus * div) DESC, nn_id) AS rn
      |    FROM e$n t) WHERE rn = 1),
      |picks$n AS (SELECT * FROM picks${n - 1} UNION ALL SELECT query_id, nn_id, e, nrm FROM s$n)"""
        .stripMargin
    }.mkString(",\n")
    val unions = (1 to k).map(n =>
      s"SELECT query_id, CAST($n AS BIGINT) AS rank, nn_id, mmr FROM s$n")
      .mkString("\nUNION ALL ")
    s"""WITH v AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings),
      |n AS (SELECT vec_id, e, sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm FROM v),
      |q AS (SELECT vec_id AS query_id, e AS qe, nrm AS qn FROM n WHERE vec_id < 5),
      |scored AS (
      |  SELECT q.query_id, n.vec_id AS nn_id,
      |    list_sum(list_transform(range(1, 65), i -> (n.e[i] / n.nrm) * (q.qe[i] / q.qn))) AS rel,
      |    n.e, n.nrm
      |  FROM q CROSS JOIN n),
      |cand AS (
      |  SELECT query_id, nn_id, rel, e, nrm FROM (
      |    SELECT s.*, row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, nn_id) AS rk
      |    FROM scored s) WHERE rk <= 20),
      |s1 AS (
      |  SELECT query_id, nn_id, e, nrm, ($lam * rel - $oneMinus * 0.0) AS mmr FROM (
      |    SELECT c.*, row_number() OVER (PARTITION BY query_id ORDER BY ($lam * rel - $oneMinus * 0.0) DESC, nn_id) AS rn
      |    FROM cand c) WHERE rn = 1),
      |picks1 AS (SELECT query_id, nn_id, e, nrm FROM s1),
      |$steps
      |$unions
      |ORDER BY query_id, rank""".stripMargin
  }

  private val SimhashOracleSql: String = {
    val bits = 60; val bandBits = 15
    val votes = (0 until bits).map(i =>
      s"sum(CASE WHEN (hh >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS v$i").mkString(",\n    ")
    val bitsSum = (0 until bits).map(i =>
      s"CASE WHEN v$i > 0 THEN (CAST(1 AS BIGINT) << $i) ELSE CAST(0 AS BIGINT) END")
      .mkString(" + ")
    val bandVals = (0 until 4).map(b =>
      s"(sim >> ${b * bandBits}) & ${(1L << bandBits) - 1}").mkString(", ")
    s"""WITH tk AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS tokens FROM documents),
      |tok AS (SELECT doc_id, unnest(tokens) AS t FROM tk),
      |h AS (SELECT doc_id, CAST(concat('0x', substring(md5(concat('0', '|', t)), 1, 15)) AS BIGINT) AS hh FROM tok),
      |votes AS (SELECT doc_id,
      |    $votes
      |  FROM h GROUP BY doc_id),
      |sig AS (SELECT doc_id, $bitsSum AS sim FROM votes),
      |b AS (SELECT doc_id, sim, unnest([0, 1, 2, 3]) AS band, unnest([$bandVals]) AS bh FROM sig),
      |cand AS (
      |  SELECT ba.doc_id AS a, bb.doc_id AS b, ba.sim AS sa, bb.sim AS sb
      |  FROM b ba JOIN b bb ON ba.band = bb.band AND ba.bh = bb.bh AND ba.doc_id < bb.doc_id
      |  GROUP BY 1, 2, 3, 4)
      |SELECT a, b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming FROM cand
      |WHERE bit_count(xor(sa, sb)) <= 3 ORDER BY a, b""".stripMargin
  }

  /** DuckDB replay of the portable winnowing pipeline (5-gram hashes,
    * window-4 sliding min, distinct fingerprints, shared-count ≥ 3) —
    * mirrors `Dedup.winnowingNearDups(..., portable = true)`. */
  /** Winnowing pipeline as a reusable CTE block ending in `p` (the
    * near-dup pairs) — shared by q61 (the pairs themselves), q83
    * (connected components over them), and q105 (cluster-aware split,
    * which scopes the corpus with `where`). */
  private def winnowingPairsCtes(where: String, minShared: Int = 3): String =
    s"""tk AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS tokens FROM documents$where),
      |tok AS (
      |  SELECT doc_id, unnest(tokens) AS t, unnest(range(1, len(tokens) + 1)) AS pos FROM tk),
      |g AS (
      |  SELECT doc_id, pos,
      |    CAST(concat('0x', substring(md5(concat('0', '|',
      |      concat_ws(' ', t, lead(t, 1) OVER w, lead(t, 2) OVER w,
      |                lead(t, 3) OVER w, lead(t, 4) OVER w))), 1, 15)) AS BIGINT) AS hh,
      |    lead(t, 4) OVER w IS NOT NULL AS fullgram
      |  FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
      |f AS (
      |  SELECT doc_id,
      |    min(hh) OVER (PARTITION BY doc_id ORDER BY pos
      |                  ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fingerprint
      |  FROM g WHERE fullgram),
      |d AS (SELECT DISTINCT doc_id, fingerprint FROM f),
      |p AS (
      |  SELECT fa.doc_id AS a, fb.doc_id AS b, count(*) AS n_shared
      |  FROM d fa JOIN d fb ON fa.fingerprint = fb.fingerprint AND fa.doc_id < fb.doc_id
      |  GROUP BY 1, 2 HAVING count(*) >= $minShared)""".stripMargin

  private val WinnowingPairsCtes: String = winnowingPairsCtes("")

  /** DuckDB replay of the log-free BM25 contract (q131): per-term tf
    * columns, ONE single-row stats CTE, and the identical
    * left-associated IEEE expression tree. Every numeric literal is
    * forced through CAST(.. AS DOUBLE): DuckDB parses `1.2` as
    * DECIMAL(2,1) and would fold decimal-decimal arithmetic EXACTLY
    * where doubles round, diverging from Spark's double fold. */
  private val Bm25OracleSql: String = bm25Sql(20)

  private def bm25Sql(topK: Int): String = {
    val terms = Seq("data", "model", "learning")
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      s"CAST(len(list_filter(t, x -> x = '$t')) AS BIGINT) AS tf$i"
    }.mkString(",\n    ")
    val dfCols = terms.indices.map(i =>
      s"sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i").mkString(",\n    ")
    def d(x: String) = s"CAST($x AS DOUBLE)"
    val contrib = terms.indices.map { i =>
      s"(${d("n")} - ${d(s"df$i")} + ${d("0.5")}) / (${d(s"df$i")} + ${d("0.5")})" +
        s" * (${d(s"tf$i")} * (${d("1.2")} + ${d("1.0")}))" +
        s" / (${d(s"tf$i")} + ${d("1.2")} * (${d("1.0")} - ${d("0.75")}" +
        s" + ${d("0.75")} * ${d("dl")} / (${d("s")} / ${d("n")})))"
    }.mkString("\n    + ")
    s"""WITH tk AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS t FROM documents),
      |c AS (
      |  SELECT doc_id, CAST(len(t) AS BIGINT) AS dl,
      |    $tfCols
      |  FROM tk),
      |st AS (
      |  SELECT count(*) AS n, sum(dl) AS s,
      |    $dfCols
      |  FROM c),
      |sc AS (
      |  SELECT doc_id,
      |    $contrib AS score
      |  FROM c CROSS JOIN st)
      |SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id LIMIT $topK""".stripMargin
  }

  /** Benford first-digit expectation, floor(1e6·log10(1 + 1/d)) —
    * driver-computed once, shipped to both engines as literals
    * (in-engine log10 is not bit-portable; 9 integers are). */
  private val BenfordPpm: Seq[(Long, Long)] =
    (1 to 9).map(dd =>
      (dd.toLong, math.floor(1e6 * math.log10(1 + 1.0 / dd)).toLong))

  /** Half-life-7-day decay weights, floor(1e6·2^(−age/7)) for ages
    * 0–40 — computed ONCE here and shipped to BOTH engines (q218's
    * Spark join table and its oracle's VALUES list), because pow() is
    * not bit-portable across engines but a literal table is. */
  private val RecencyWeights: Seq[(Long, Long)] =
    (0 to 40).map(k =>
      (k.toLong, math.floor(1e6 * math.pow(2.0, -k / 7.0)).toLong))

  /** The q113 hashing-trick classifier replay as a reusable CTE block
    * ending in `scored` (doc_id, score) — shared by q113 and the
    * eval-tier contracts q205 (calibration) / q206 (confusion). */
  private val ScoredDocsCtes: String =
    """tk AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS t FROM documents),
      |uni AS (SELECT doc_id, unnest(t) AS f FROM tk),
      |bi AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])) AS f
      |  FROM tk WHERE len(t) >= 2),
      |feats AS (SELECT doc_id, f FROM uni UNION ALL SELECT doc_id, f FROM bi),
      |hb AS (
      |  SELECT doc_id,
      |    CAST(concat('0x', substring(md5(concat('7', '|', f)), 1, 15)) AS BIGINT) % 64 AS bucket
      |  FROM feats),
      |w AS (
      |  SELECT r.range AS bucket,
      |    (CAST(concat('0x', substring(md5(concat('11', '|', CAST(r.range AS VARCHAR))), 1, 15)) AS BIGINT) % 2001) - 1000 AS weight
      |  FROM range(64) r),
      |agg AS (
      |  SELECT doc_id, sum(weight) AS sw, count(*) AS nf
      |  FROM hb JOIN w USING (bucket) GROUP BY 1),
      |scored AS (
      |  SELECT d.doc_id, coalesce(CAST(agg.sw AS DOUBLE) / CAST(1000 * agg.nf AS DOUBLE), 0.0) AS score
      |  FROM documents d LEFT JOIN agg USING (doc_id))""".stripMargin

  /** DuckDB replay of the retrieval-eval contract (q199): one BM25
    * block per query term (the [[bm25Sql]] IEEE recipe, single-term),
    * top-20 ranked, then floor-ppm MRR / hit@k / recall@k arithmetic
    * against the doc_id%10=3 relevance set. */
  private val RetrievalEvalSql: String = {
    val terms = Seq("data", "model", "learning")
    def d(x: String) = s"CAST($x AS DOUBLE)"
    val contrib =
      s"(${d("n")} - ${d("df")} + ${d("0.5")}) / (${d("df")} + ${d("0.5")})" +
        s" * (${d("tf")} * (${d("1.2")} + ${d("1.0")}))" +
        s" / (${d("tf")} + ${d("1.2")} * (${d("1.0")} - ${d("0.75")}" +
        s" + ${d("0.75")} * ${d("dl")} / (${d("s")} / ${d("n")})))"
    val blocks = terms.zipWithIndex.map { case (t, i) =>
      s"""c$i AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl,
        |    CAST(len(list_filter(t, x -> x = '$t')) AS BIGINT) AS tf FROM tk),
        |st$i AS (SELECT count(*) AS n, sum(dl) AS s,
        |    sum(CASE WHEN tf > 0 THEN 1 ELSE 0 END) AS df FROM c$i),
        |sc$i AS (SELECT doc_id, $contrib AS score FROM c$i CROSS JOIN st$i),
        |rk$i AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank
        |  FROM sc$i ORDER BY score DESC, doc_id LIMIT 20),
        |m$i AS (SELECT '$t' AS term,
        |    min(CASE WHEN doc_id % 10 = 3 THEN rank END) AS first_rel_rank,
        |    CAST(sum(CASE WHEN doc_id % 10 = 3 AND rank <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS hits_at_10,
        |    CAST(sum(CASE WHEN doc_id % 10 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS hits_at_20
        |  FROM rk$i)""".stripMargin
    }.mkString(",\n")
    val union = terms.indices.map(i => s"SELECT * FROM m$i").mkString(" UNION ALL ")
    s"""WITH tk AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS t FROM documents),
      |rel AS (SELECT count(*) AS nrel FROM documents WHERE doc_id % 10 = 3),
      |$blocks,
      |m AS ($union)
      |SELECT term, first_rel_rank,
      |  CAST(coalesce(1000000 // first_rel_rank, 0) AS BIGINT) AS rr_ppm,
      |  hits_at_10, hits_at_20,
      |  CAST((hits_at_20 * 1000000) // rel.nrel AS BIGINT) AS recall_at_20_ppm
      |FROM m CROSS JOIN rel ORDER BY term""".stripMargin
  }

  /** Duplicated-span pipeline (Lee et al. exact substring dedup) as a
    * reusable CTE block ending in `sp` (doc_id, span_start, span_end,
    * n_grams) with `tok` (doc_id, t, pos 1-based) also in scope —
    * shared by q114 (the spans) and q115 (removal). Mirrors
    * `Dedup.duplicatedSpans(gramLen = 8, minDocs = 2, portable)`. */
  private val DupSpanCtes: String =
    """tk AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS tokens FROM documents),
      |tok AS (
      |  SELECT doc_id, unnest(tokens) AS t, unnest(range(1, len(tokens) + 1)) AS pos FROM tk),
      |g AS (
      |  SELECT doc_id, pos - 1 AS pos0,
      |    CAST(concat('0x', substring(md5(concat('0', '|',
      |      concat_ws(' ', t, lead(t, 1) OVER w, lead(t, 2) OVER w, lead(t, 3) OVER w,
      |                lead(t, 4) OVER w, lead(t, 5) OVER w, lead(t, 6) OVER w,
      |                lead(t, 7) OVER w))), 1, 15)) AS BIGINT) AS hh,
      |    lead(t, 7) OVER w IS NOT NULL AS fullgram
      |  FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
      |gg AS (SELECT doc_id, pos0, hh FROM g WHERE fullgram),
      |hot AS (
      |  SELECT hh FROM (SELECT DISTINCT hh, doc_id FROM gg)
      |  GROUP BY hh HAVING count(*) >= 2),
      |dup AS (SELECT gg.doc_id, gg.pos0 FROM gg JOIN hot USING (hh)),
      |brk AS (
      |  SELECT doc_id, pos0,
      |    CASE WHEN max(pos0) OVER (PARTITION BY doc_id ORDER BY pos0
      |                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 8 >= pos0
      |         THEN 0 ELSE 1 END AS is_new
      |  FROM dup),
      |isl AS (
      |  SELECT doc_id, pos0,
      |    sum(is_new) OVER (PARTITION BY doc_id ORDER BY pos0
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      |  FROM brk),
      |sp AS (
      |  SELECT doc_id, min(pos0) AS span_start, max(pos0) + 7 AS span_end,
      |    count(*) AS n_grams
      |  FROM isl GROUP BY doc_id, island)""".stripMargin

  private val WinnowingOracleSql: String =
    s"WITH $WinnowingPairsCtes\nSELECT a, b, n_shared FROM p ORDER BY a, b"

  /** Paragraph-dedup pipeline (Dolma/RefinedWeb line granularity) as a
    * reusable CTE block: `d2` is the derived MULTI-LINE corpus (the
    * fixture bodies carry no newlines, so boilerplate paragraphs are
    * planted arithmetically — a shared header on every doc, a promo
    * footer on every third, a unique tail elsewhere; exact-dup bodies
    * planted in the fixture become hot paragraphs on their own), `pp`
    * the positional segments, `hot` the ≥2-distinct-doc paragraph
    * hashes. Mirrors `Dedup.duplicatedParagraphs(minDocs = 2)`. */
  private val ParaDedupCtes: String =
    """d2 AS (
      |  SELECT doc_id,
      |    concat('shared header line', chr(10), text, chr(10),
      |      CASE WHEN doc_id % 3 = 0 THEN 'promo footer line'
      |           ELSE concat('unique tail ', CAST(doc_id AS VARCHAR)) END,
      |      CASE WHEN doc_id % 7 = 2 THEN concat(
      |          chr(10), 'self repeat ', CAST(doc_id AS VARCHAR),
      |          chr(10), 'self repeat ', CAST(doc_id AS VARCHAR))
      |        ELSE '' END) AS text
      |  FROM documents),
      |pp AS (
      |  SELECT doc_id, unnest(string_split(text, chr(10))) AS p,
      |    unnest(range(1, len(string_split(text, chr(10))) + 1)) AS pos
      |  FROM d2),
      |dp AS (
      |  SELECT DISTINCT md5(p) AS para_hash, doc_id FROM pp
      |  WHERE len(trim(p)) > 0),
      |hot AS (
      |  SELECT para_hash, count(*) AS df FROM dp
      |  GROUP BY 1 HAVING count(*) >= 2)""".stripMargin

  /** Fixed merge list for the q122 BPE-encode contract — model data
    * shipped as literals on both sides (the q113 recipe). Chained
    * merges ('d a'→'da t'→'dat a') exercise multi-character symbols
    * and merge-order sensitivity. */
  private val BpeContractMerges: Seq[(String, String)] = Seq(
    ("d", "a"), ("da", "t"), ("dat", "a"), ("t", "h"), ("th", "e"),
    ("j", "o"), ("jo", "i"), ("joi", "n"), ("s", "t"), ("o", "r"),
    ("e", "r"), ("a", "n"))

  /** Direct KMV estimate over the full lineitem (q76) — ALSO the
    * oracle for the bounded-set merge contract q157: the global k-min
    * distinct set is contained in the union of per-shard k-min sets,
    * so the merged estimate equals the direct one. */
  private val KmvDirectOracleSql: String =
    """WITH dv AS (SELECT DISTINCT l_returnflag, l_orderkey FROM lineitem),
      |h AS (
      |  SELECT l_returnflag,
      |    CAST(concat('0x', substring(md5(concat('42', '|', CAST(l_orderkey AS VARCHAR))), 1, 14)) AS BIGINT)
      |      / 72057594037927936.0 AS f
      |  FROM dv),
      |r AS (
      |  SELECT l_returnflag, f,
      |    row_number() OVER (PARTITION BY l_returnflag ORDER BY f) AS rk,
      |    count(*) OVER (PARTITION BY l_returnflag) AS n
      |  FROM h)
      |SELECT l_returnflag,
      |  CASE WHEN n < 256 THEN CAST(n AS DOUBLE) ELSE 255.0 / f END AS est_distinct
      |FROM r WHERE rk = least(256, n) ORDER BY l_returnflag""".stripMargin

  /** Direct HLL estimate over the full lineitem (q91) — ALSO the
    * oracle for the merge contract q152: per-shard registers merged
    * by max are register-identical to the direct union sketch. */
  private val HllUnionOracleSql: String =
    s"""WITH h AS (
        |  SELECT l_returnflag,
        |    CAST(concat('0x', substring(md5(concat('42', '|', CAST(l_orderkey AS VARCHAR))), 1, 14)) AS BIGINT) AS h
        |  FROM lineitem),
        |b AS (
        |  SELECT l_returnflag, h & 63 AS b,
        |    CASE WHEN (h >> 6) = 0 THEN 30
        |         ELSE least(30, 51 - length(bin(h >> 6))) END AS rho
        |  FROM h),
        |regs AS (
        |  SELECT l_returnflag, b, max(rho) AS r FROM b GROUP BY 1, 2),
        |s AS (
        |  SELECT l_returnflag,
        |    sum(${1L << 30} >> r) AS s, count(*) AS present
        |  FROM regs GROUP BY 1),
        |e AS (
        |  SELECT l_returnflag, 64 - present AS zeros,
        |    ${709L * 4096L * (1L << 30)}
        |      // (1000 * (s + (64 - present) * ${1L << 30})) AS raw
        |  FROM s)
        |SELECT l_returnflag,
        |  CAST(CASE WHEN raw <= 160 AND zeros > 0
        |    THEN ([${graft.ext.Sketches.HllLinearCounting.mkString(", ")}])[CAST(zeros AS INTEGER)]
        |    ELSE raw END AS BIGINT) AS est_distinct
        |FROM e ORDER BY l_returnflag""".stripMargin

  /** Direct count-min estimate over the full events stream (q95) —
    * ALSO the oracle for the merge contract q155: shard counter
    * matrices summed elementwise are matrix-identical to the direct
    * sketch. */
  private val CmDirectOracleSql: String =
    """WITH v AS (SELECT CAST(user_id AS VARCHAR) AS val FROM events),
      |h AS (SELECT val,
      |  CAST(concat('0x', substring(md5(concat_ws('|', '42', val)), 1, 14)) AS BIGINT) AS a,
      |  CAST(concat('0x', substring(md5(concat_ws('|', '42', val)), 17, 14)) AS BIGINT) AS b
      |  FROM v),
      |pos AS (SELECT val, i, (a + i * b) % 256 AS bucket FROM h, range(4) t(i)),
      |counters AS (SELECT i, bucket, count(*) AS cnt FROM pos GROUP BY 1, 2),
      |dv AS (SELECT DISTINCT val, i, bucket FROM pos)
      |SELECT val, min(cnt) AS est_count
      |FROM dv JOIN counters USING (i, bucket)
      |GROUP BY val ORDER BY est_count DESC, val LIMIT 50""".stripMargin

  /** DuckDB replay of the SRP-LSH embedding near-dup pipeline: the 16
    * seeded hyperplanes are embedded as literals (Double.toString
    * round-trips exactly, so DuckDB parses the identical doubles), sign
    * bits → 4 bands of 4 → band equi-join → exact cosine ≥ 0.4. Mirrors
    * `Dedup.embeddingNearDups(threshold=0.4, dim=64, planes=16,
    * bandsOf=4)` bit for bit. */
  private val SrpOracleSql: String = {
    val planes = Similarity.planesFor(64, 16, 42L)
    def planeDot(p: Array[Double]): String = {
      val lst = p.map(_.toString).mkString(", ")
      s"list_sum(list_transform(range(1, 65), i -> v[i] * ([$lst])[i]))"
    }
    val bitCols = planes.zipWithIndex.map { case (p, i) =>
      s"CASE WHEN ${planeDot(p)} >= 0 THEN 1 ELSE 0 END AS b$i"
    }.mkString(",\n    ")
    val bandLists = (0 until 4).map(b =>
      "[" + (0 until 4).map(i => s"b${b * 4 + i}").mkString(", ") + "]").mkString(", ")
    s"""WITH v0 AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings),
      |n AS (SELECT vec_id, e, sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm FROM v0),
      |v AS (SELECT vec_id, CASE WHEN nrm = 0 THEN e ELSE list_transform(e, x -> x / nrm) END AS v FROM n),
      |bits AS (SELECT vec_id, v,
      |    $bitCols
      |  FROM v),
      |banded AS (SELECT vec_id, v, unnest([0, 1, 2, 3]) AS band, unnest([$bandLists]) AS bh FROM bits),
      |cand AS (
      |  SELECT ba.vec_id AS a, bb.vec_id AS b FROM banded ba
      |  JOIN banded bb ON ba.band = bb.band AND ba.bh = bb.bh AND ba.vec_id < bb.vec_id
      |  GROUP BY 1, 2),
      |scored AS (
      |  SELECT c.a, c.b,
      |    list_sum(list_transform(range(1, 65), i -> va.v[i] * vb.v[i])) AS cosine
      |  FROM cand c JOIN v va ON va.vec_id = c.a JOIN v vb ON vb.vec_id = c.b)
      |SELECT a, b, cosine FROM scored WHERE cosine >= 0.4 ORDER BY a, b""".stripMargin
  }

  /** DuckDB replay of the FULL product-quantization pipeline with the
    * seeded codebooks as literals (the SRP recipe): per-subspace
    * argmax encode (dot − 0.5‖c‖², first index wins), per-query ADC
    * table, m lookups + left-to-right adds per candidate, top-k.
    * Mirrors `pqEncode`/`pqSearch` over `pqSeededBooks(64, 8, 16, 42)`
    * bit for bit. */
  private val PqOracleSql: String = {
    val books = Similarity.pqSeededBooks(64, 8, 16, 42L)
    val ds = books.ds
    def dotSql(vecExpr: String, off: Int, cw: Array[Double]): String = {
      val lst = cw.map(_.toString).mkString(", ")
      s"list_sum(list_transform(range(1, ${ds + 1}), i -> $vecExpr[i + $off] * ([$lst])[i]))"
    }
    val scoreCols = (0 until books.m).map { j =>
      (0 until books.ksub).map { cI =>
        s"${dotSql("v", j * ds, books.books(j)(cI))} - ${books.halfNormSq(j)(cI)}"
      }.mkString("[", ", ", "]") + s" AS s$j"
    }.mkString(",\n    ")
    val codeList = (0 until books.m)
      .map(j => s"list_position(s$j, list_max(s$j)) - 1").mkString("[", ", ", "]")
    val tCols = (0 until books.m).map { j =>
      (0 until books.ksub).map(cI => dotSql("v", j * ds, books.books(j)(cI)))
        .mkString("[", ", ", "]")
    }.mkString("[", ",\n      ", "]")
    val adcExpr = (1 to books.m).map(j => s"q.T[$j][e.codes[$j] + 1]").mkString(" + ")
    s"""WITH v0 AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings),
      |n0 AS (SELECT vec_id, e, sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm FROM v0),
      |v AS (SELECT vec_id, CASE WHEN nrm = 0 THEN e ELSE list_transform(e, x -> x / nrm) END AS v FROM n0),
      |sc AS (SELECT vec_id, v,
      |    $scoreCols
      |  FROM v),
      |enc AS (SELECT vec_id, $codeList AS codes FROM sc),
      |qt AS (SELECT vec_id AS query_id, $tCols AS T FROM v WHERE vec_id < 5),
      |adc AS (
      |  SELECT q.query_id, e.vec_id AS nn_id, $adcExpr AS adc
      |  FROM enc e CROSS JOIN qt q),
      |r AS (
      |  SELECT query_id, nn_id, adc,
      |    row_number() OVER (PARTITION BY query_id ORDER BY adc DESC, nn_id) AS rk
      |  FROM adc)
      |SELECT query_id, nn_id, round(adc, 4) AS adc, CAST(rk AS BIGINT) AS rank
      |FROM r WHERE rk <= 10 ORDER BY query_id, rank""".stripMargin
  }

  /** Per-language stopword lists as DuckDB list literals — must mirror
    * [[graft.ext.TextOps.LangStopwords]] exactly. */
  private val LangListsSql: Seq[(String, String)] = Seq(
    "en" -> "'the','and','of','to','in','is','that','it','for','with'",
    "es" -> "'el','la','de','que','y','en','un','los','del','se'",
    "de" -> "'der','die','und','das','ist','von','mit','den','ein','zu'",
    "fr" -> "'le','la','et','les','des','un','une','du','est','dans'")

  /** SQL fragment: one stopword-hit-ratio column per language (s_en,
    * s_es, …) over a `tokens` list column. */
  private val LangScoreCols: String = LangListsSql.map { case (lang, list) =>
    s"CASE WHEN len(tokens) = 0 THEN 0.0 ELSE CAST(len(list_filter(tokens, x -> list_contains([$list], x))) AS DOUBLE) / CAST(len(tokens) AS DOUBLE) END AS s_$lang"
  }.mkString(",\n    ")

  /** SQL fragment: argmax over the per-language scores with Spark's
    * tie-break (equal scores → lexicographically GREATEST lang code,
    * matching array_max over (score, lang) structs), 'und' when no
    * list matched at all. */
  private val LangArgmaxSql: String =
    """CASE WHEN greatest(s_de, s_en, s_es, s_fr) <= 0 THEN 'und'
      |    WHEN s_fr = greatest(s_de, s_en, s_es, s_fr) THEN 'fr'
      |    WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
      |    WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
      |    ELSE 'de' END""".stripMargin

  /** Shared SQL (runs verbatim in BOTH Spark SQL and DuckDB). */
  // sum_disc_price is rounded IN THE DECIMAL DOMAIN before the double
  // cast: the exact scale-8 sum reaches ~19 significant digits at
  // sf≥0.1, beyond double's 17, and Spark/DuckDB round that conversion
  // to ADJACENT ulps. round(…, 4) keeps the value exact (≤14 sig
  // digits) so both engines convert to the identical double.
  private val Q1Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_disc_price,
      |  count(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  private val Q3Sql =
    """SELECT o_orderkey,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  o_orderdate
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |  JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-03-15'
      |  AND l_shipdate > TIMESTAMP '1998-03-15'
      |GROUP BY o_orderkey, o_orderdate
      |ORDER BY revenue DESC, o_orderkey
      |LIMIT 10""".stripMargin

  private val Q5Sql =
    """SELECT n_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |  JOIN lineitem ON l_orderkey = o_orderkey
      |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1999-01-01'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  private val Q6Sql =
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  private val Q12Sql =
    """SELECT l_returnflag,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
      |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  private val Q14Sql =
    """SELECT 100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
      |    THEN CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))
      |    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
      |  / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS promo_revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-03-01'""".stripMargin

  private val SubquerySql =
    """SELECT c_custkey, c_acctbal FROM customer c
      |WHERE c_acctbal > (
      |  SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / count(*)
      |  FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
      |ORDER BY c_custkey""".stripMargin

  /** Exact cosine top-k oracle (shared by q49 brute force and q50 IVF
    * at full probe — both are exact and bit-identical). */
  private val AnnTopkSql =
    """WITH v AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings),
      |n AS (SELECT vec_id, e, sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm FROM v),
      |q AS (SELECT vec_id AS query_id, e AS qe, nrm AS qn FROM n WHERE vec_id < 5),
      |scored AS (
      |  SELECT q.query_id, n.vec_id AS nn_id,
      |    list_sum(list_transform(range(1, 65), i -> (n.e[i] / n.nrm) * (q.qe[i] / q.qn))) AS cosine
      |  FROM q CROSS JOIN n),
      |ranked AS (
      |  SELECT query_id, nn_id, cosine,
      |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, nn_id) AS rank
      |  FROM scored)
      |SELECT query_id, nn_id, cosine, rank FROM ranked WHERE rank <= 10
      |ORDER BY query_id, rank""".stripMargin

  /** TPC-H Q4 shape: date-window + EXISTS semi-join decorrelation. */
  private val ExistsSql =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders o
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q13 shape: left-outer join + two-level count distribution. */
  private val CustDistSql =
    """SELECT c_count, count(*) AS custdist FROM (
      |  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      |  FROM customer c LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
      |  GROUP BY c.c_custkey) t
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** TPC-H Q11 shape: group HAVING gated on a global scalar subquery. */
  private val HavingGlobalSql =
    """SELECT s_nationkey,
      |  CAST(sum(CAST(s_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS val
      |FROM supplier GROUP BY s_nationkey
      |HAVING CAST(sum(CAST(s_acctbal AS DECIMAL(18,4))) AS DOUBLE) >
      |  (SELECT CAST(sum(CAST(s_acctbal AS DECIMAL(18,4))) AS DOUBLE) * 0.04 FROM supplier)
      |ORDER BY val DESC, s_nationkey""".stripMargin

  /** TPC-H Q22 shape: scalar-subquery gate + NOT EXISTS anti-join. */
  private val NotExistsSql =
    """SELECT c_nationkey, count(*) AS numcust,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
      |FROM customer c
      |WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / count(*)
      |                   FROM customer WHERE c_acctbal > 0.0)
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  private val GroupingSetsSql =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  /** Flagship query on sf=0.001 (driver smoke-checks rows>0): Q3-shaped
    * star join + agg + top-k through the library combinators. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val c = T(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = T(spark, dir, "orders")
    val l = T(spark, dir, "lineitem")
    o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(l, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  // =====================================================================
  // queries
  // =====================================================================

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ----------------------------------------------------- D5/S7 aggregates
    "q01_count" -> ((s, d) =>
      T(s, d, "lineitem").agg(count(lit(1)).as("cnt"))),

    "q02_count_min_max" -> ((s, d) =>
      T(s, d, "lineitem").agg(
        count(lit(1)).as("cnt"),
        min(col("l_shipdate")).as("min_ship"),
        max(col("l_shipdate")).as("max_ship"))),

    // ----------------------------------------------------- D11 predicate DSL
    "q03_pred_eq" -> ((s, d) =>
      Query.get(T(s, d, "customer"),
        columns = Seq("c_custkey", "c_name", "c_acctbal"),
        where = Seq(Pred.Eq("c_mktsegment", "BUILDING")),
        sortBy = Seq(SortKey("c_custkey")))),

    "q04_pred_in" -> ((s, d) =>
      Query.get(T(s, d, "lineitem"),
        columns = Seq("l_orderkey", "l_linenumber", "l_returnflag"),
        where = Seq(Pred.In("l_returnflag", Seq("A", "R"))),
        sortBy = Seq(SortKey("l_orderkey"), SortKey("l_linenumber")))),

    "q05_pred_notin" -> ((s, d) =>
      Query.get(T(s, d, "orders"),
        where = Seq(Pred.NotIn("o_orderstatus", Seq("F", "P"))))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("o_orderstatus"))),

    "q06_pred_like" -> ((s, d) =>
      Query.get(T(s, d, "part"),
        columns = Seq("p_partkey", "p_name", "p_type"),
        where = Seq(Pred.Like("p_name", "%widget%")),
        sortBy = Seq(SortKey("p_partkey")))),

    "q07_pred_notlike" -> ((s, d) =>
      Query.get(T(s, d, "part"),
        columns = Seq("p_partkey", "p_name"),
        where = Seq(Pred.NotLike("p_name", "%o%")),
        sortBy = Seq(SortKey("p_partkey")))),

    "q08_pred_isnull" -> ((s, d) =>
      Query.get(
        T(s, d, "orders").withColumn("st",
          when(col("o_orderstatus") === "F", lit(null).cast("string"))
            .otherwise(col("o_orderstatus"))),
        where = Seq(Pred.IsNull("st")))
        .agg(count(lit(1)).as("cnt"))),

    "q09_pred_isnotnull" -> ((s, d) =>
      Query.get(
        T(s, d, "orders").withColumn("st",
          when(col("o_orderstatus") === "F", lit(null).cast("string"))
            .otherwise(col("o_orderstatus"))),
        where = Seq(Pred.IsNotNull("st")))
        .groupBy(col("st")).agg(count(lit(1)).as("cnt")).orderBy(col("st"))),

    "q10_pred_between" -> ((s, d) =>
      Query.get(T(s, d, "lineitem"),
        where = Seq(Pred.Between("l_shipdate", "1996-01-01", "1996-12-31")))
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag"))),

    "q11_pred_notbetween" -> ((s, d) =>
      Query.get(T(s, d, "lineitem"),
        where = Seq(Pred.NotBetween("l_quantity", 10, 40)))
        .groupBy(col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_linestatus"))),

    "q12_pred_passthrough" -> ((s, d) =>
      Query.get(T(s, d, "customer"),
        columns = Seq("c_custkey", "c_acctbal"),
        where = Seq(
          Pred.Op("c_acctbal", ">", 1000),
          Pred.Op("c_acctbal", "<=", 9000),
          Pred.Op("c_nationkey", "!=", 3)),
        sortBy = Seq(SortKey("c_custkey")))),

    "q13_pred_regexp" -> ((s, d) =>
      Query.get(T(s, d, "part"),
        columns = Seq("p_partkey", "p_name"),
        where = Seq(Pred.Op("p_name", "~", "^[bc].*t$")),
        sortBy = Seq(SortKey("p_partkey")))),

    // ----------------------------------------------------- D12 scan pipeline
    "q14_get_pipeline" -> ((s, d) =>
      Query.get(T(s, d, "orders"),
        columns = Seq("o_orderkey", "o_custkey", "o_totalprice"),
        where = Seq(Pred.Eq("o_orderstatus", "O")),
        sortBy = Seq(SortKey("o_totalprice", ascending = false), SortKey("o_orderkey")),
        limit = 20, offset = 5)),

    "q15_topk" -> ((s, d) =>
      Query.get(T(s, d, "customer"),
        columns = Seq("c_custkey", "c_name", "c_acctbal"),
        sortBy = Seq(SortKey("c_acctbal", ascending = false), SortKey("c_custkey")),
        limit = 10)),

    // ----------------------------------------------------- D8 upsert (merge)
    "q16_upsert_coalesce" -> ((s, d) => {
      val c = T(s, d, "customer")
      val mutated = c.filter(col("c_custkey") % 7 === 0).select(
        col("c_custkey"), lit(null).cast("string").as("c_name"),
        col("c_nationkey"), (col("c_acctbal") + 100).as("c_acctbal"),
        col("c_mktsegment"))
      val fresh = c.filter(col("c_custkey") % 11 === 0).select(
        (col("c_custkey") + 10000000L).as("c_custkey"),
        concat(lit("new-"), col("c_custkey").cast("string")).as("c_name"),
        lit(0).as("c_nationkey"), lit(0.0).as("c_acctbal"),
        lit("NEW").as("c_mktsegment"))
      Mutations.upsert(c, mutated.unionByName(fresh), Seq("c_custkey"))
        .orderBy(col("c_custkey"))
    }),

    "q17_upsert_overwrite" -> ((s, d) => {
      val c = T(s, d, "customer")
      val mutated = c.filter(col("c_custkey") % 7 === 0).select(
        col("c_custkey"), lit(null).cast("string").as("c_name"),
        col("c_nationkey"), (col("c_acctbal") + 100).as("c_acctbal"),
        col("c_mktsegment"))
      Mutations.upsert(c, mutated, Seq("c_custkey"), overwriteWithNull = true)
        .orderBy(col("c_custkey"))
    }),

    // ----------------------------------------------------- D13 keyed update
    "q18_update_keyed" -> ((s, d) => {
      val c = T(s, d, "customer")
      val changes = c.filter(col("c_nationkey") === 5).select(
        col("c_custkey"), lit("UPDATED").as("c_mktsegment"),
        (col("c_acctbal") * 2).as("c_acctbal"))
      Mutations.update(c, changes, Seq("c_custkey")).orderBy(col("c_custkey"))
    }),

    // ----------------------------------------------------- D14 delete
    "q19_delete_pred" -> ((s, d) =>
      Mutations.delete(T(s, d, "orders"), Seq(
        Pred.Between("o_totalprice", 50000, 200000),
        Pred.Eq("o_orderstatus", "F")))
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))),

    // ----------------------------------------------------- D15 raw SQL
    "q20_sql_q1" -> ((s, d) => { Fx.registerAll(s, d); Sql.executeRaw(s, Q1Sql) }),
    "q21_sql_q3" -> ((s, d) => { Fx.registerAll(s, d); Sql.executeRaw(s, Q3Sql) }),
    "q56_sql_q5" -> ((s, d) => { Fx.registerAll(s, d); Sql.executeRaw(s, Q5Sql) }),
    "q64_sql_q6" -> ((s, d) => { Fx.registerAll(s, d); Sql.executeRaw(s, Q6Sql) }),
    "q65_sql_q12" -> ((s, d) => { Fx.registerAll(s, d); Sql.executeRaw(s, Q12Sql) }),
    "q66_sql_q14" -> ((s, d) => { Fx.registerAll(s, d); Sql.executeRaw(s, Q14Sql) }),
    "q57_subquery_corr" -> ((s, d) => { Fx.registerAll(s, d); Sql.executeRaw(s, SubquerySql) }),
    "q70_sql_exists" -> ((s, d) => { Fx.registerAll(s, d); Sql.executeRaw(s, ExistsSql) }),
    "q71_sql_custdist" -> ((s, d) => { Fx.registerAll(s, d); Sql.executeRaw(s, CustDistSql) }),
    "q72_sql_having_global" -> ((s, d) => { Fx.registerAll(s, d); Sql.executeRaw(s, HavingGlobalSql) }),
    "q73_sql_not_exists" -> ((s, d) => { Fx.registerAll(s, d); Sql.executeRaw(s, NotExistsSql) }),
    "q58_grouping_sets" -> ((s, d) => { Fx.registerAll(s, d); Sql.executeRaw(s, GroupingSetsSql) }),

    // Rows-only: approximate aggregates (sketches differ across engines
    // by design — sanity-bounded in ScalaTest instead).
    "q59_approx_agg" -> ((s, d) =>
      T(s, d, "lineitem").groupBy(col("l_returnflag")).agg(
        approx_count_distinct(col("l_orderkey")).as("approx_orders"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("p50_price"))
        .orderBy(col("l_returnflag"))),

    // Deterministic PORTABLE sketches (ext.Sketches): unlike the
    // native HLL/GK sketches above (opaque state ⇒ rows-only), these
    // estimators are pure functions of (seed, data), so the oracle
    // replays them — an oracle-VERIFIED approximate aggregate.
    "q76_kmv_distinct" -> ((s, d) =>
      graft.ext.Sketches.kmvDistinctCount(
        T(s, d, "lineitem"), "l_returnflag", "l_orderkey", k = 256)
        .orderBy(col("l_returnflag"))),

    // KMV MERGE contract — the third mergeable-summary class
    // (bounded-set merge, after HLL max q152 and count-min sum q155):
    // per-shard k-minimum sets concatenated, deduped, re-cut at k
    // estimate exactly like the direct sketch.
    "q157_kmv_merge" -> ((s, d) => {
      val li = T(s, d, "lineitem")
      val sa = graft.ext.Sketches.kmvMinSets(
        li.filter(col("l_orderkey") % 2 === 0), "l_returnflag",
        "l_orderkey", k = 256)
      val sb = graft.ext.Sketches.kmvMinSets(
        li.filter(col("l_orderkey") % 2 =!= 0), "l_returnflag",
        "l_orderkey", k = 256)
      graft.ext.Sketches.kmvEstimateFromSets(
        graft.ext.Sketches.kmvMergeSets("l_returnflag", 256, sa, sb),
        "l_returnflag", 256)
        .orderBy(col("l_returnflag"))
    }),

    "q77_sampled_median" -> ((s, d) =>
      graft.ext.Sketches.sampledQuantile(
        T(s, d, "lineitem"), "l_returnflag", "l_extendedprice",
        keyCol = "l_orderkey", q = 0.5, fraction = 0.1)
        .orderBy(col("l_returnflag"))),

    // Portable HLL (integer-exact registers + estimator, ext.Sketches
    // scaladoc has the scheme) — q59's native approx_count_distinct
    // with the opacity removed: the oracle replays bucket/ρ/register
    // max/harmonic sum/α-division/linear-counting and hash-matches.
    "q91_hll_distinct" -> ((s, d) =>
      graft.ext.Sketches.hllDistinctCount(
        T(s, d, "lineitem"), "l_returnflag", "l_orderkey")
        .orderBy(col("l_returnflag"))),

    // HLL MERGE contract: sketch two disjoint shards independently,
    // merge the register frames (max per bucket — the lossless HLL
    // merge law), estimate from the merged state. The oracle is q91's
    // DIRECT union sketch: merged == direct, register for register —
    // the mergeable-summary property that lets per-day/per-shard
    // sketches roll up into global stats with no re-scan.
    "q152_hll_merge" -> ((s, d) => {
      val li = T(s, d, "lineitem")
      val ra = graft.ext.Sketches.hllRegisters(
        li.filter(col("l_orderkey") % 2 === 0), "l_returnflag", "l_orderkey")
      val rb = graft.ext.Sketches.hllRegisters(
        li.filter(col("l_orderkey") % 2 =!= 0), "l_returnflag", "l_orderkey")
      graft.ext.Sketches.hllFromRegisters(
        graft.ext.Sketches.hllMergeRegisters("l_returnflag", ra, rb),
        "l_returnflag")
        .orderBy(col("l_returnflag"))
    }),

    // Pivot (long→wide conditional aggregation), explicit value list so
    // the plan needs no extra distinct-values pass.
    "q78_pivot" -> ((s, d) =>
      T(s, d, "orders").groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("o_orderpriority"))),

    // Unpivot (wide→long, the inverse of q78's pivot): four measure
    // columns melt to (metric, value) rows, then a decimal-exact
    // per-flag/metric sum. The oracle is the equivalent UNION ALL.
    "q93_unpivot" -> ((s, d) =>
      T(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "metric", "value")
        .groupBy(col("l_returnflag"), col("metric"))
        .agg(dsum(col("value")).as("total"))
        .orderBy(col("l_returnflag"), col("metric"))),

    // Ordered string aggregation (LISTAGG/STRING_AGG): deterministic
    // via sort_array over the collected list — binary collation on
    // both engines, so the joined string hash-matches.
    "q94_string_agg" -> ((s, d) =>
      T(s, d, "nation").join(T(s, d, "region"), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(array_join(sort_array(collect_list(col("n_name"))), ",").as("nations"))
        .orderBy(col("r_name"))),

    // Distribution window functions: ntile buckets, percent_rank,
    // cume_dist (total order via the unique key suffix — peer groups
    // and therefore the distributions are engine-identical).
    "q79_window_dist" -> ((s, d) => {
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      T(s, d, "lineitem").filter(col("l_orderkey") < 1000)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          ntile(4).over(w).cast("long").as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // ----------------------------------------------------- joins
    "q22_join_star" -> ((s, d) =>
      T(s, d, "orders")
        .join(T(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(T(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(T(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("r_name"), col("n_name"))),

    "q23_join_semi" -> ((s, d) =>
      T(s, d, "customer")
        .join(T(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name")).orderBy(col("c_custkey"))),

    "q24_join_anti" -> ((s, d) =>
      T(s, d, "customer")
        .join(T(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name")).orderBy(col("c_custkey"))),

    // ----------------------------------------------------- window functions
    "q25_window_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      T(s, d, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    "q26_window_lag" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      T(s, d, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    "q27_window_frame" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T(s, d, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast("decimal(18,4)")).over(w)
          .cast("double").as("running_total"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // ----------------------------------------------------- aggregations
    "q28_agg_stats" -> ((s, d) =>
      T(s, d, "lineitem").groupBy(col("l_returnflag")).agg(
        count(lit(1)).as("cnt"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        dsum(col("l_quantity")).as("sum_qty"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        (dsum(col("l_quantity")) / count(col("l_quantity"))).as("avg_qty"))
        .orderBy(col("l_returnflag"))),

    "q29_agg_rollup" -> ((s, d) =>
      T(s, d, "customer")
        .join(broadcast(T(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(T(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("cnt"), dsum(col("c_acctbal")).as("sum_bal"))
        .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)),

    "q30_agg_cube" -> ((s, d) =>
      T(s, d, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)),

    // ----------------------------------------------------- set operations
    "q31_set_ops" -> ((s, d) => {
      val c = T(s, d, "customer")
      val a = c.filter(col("c_nationkey").isin(1, 2, 3)).select(col("c_custkey").as("k"))
      val b = T(s, d, "orders").filter(col("o_totalprice") > 300000)
        .select(col("o_custkey").as("k"))
      a.union(b).distinct()
        .intersect(c.filter(col("c_acctbal") > 0).select(col("c_custkey").as("k")))
        .except(c.filter(col("c_nationkey") === 2).select(col("c_custkey").as("k")))
        .orderBy(col("k"))
    }),

    // ----------------------------------------------------- scalar functions
    "q32_scalar_funcs" -> ((s, d) =>
      T(s, d, "lineitem").filter(col("l_orderkey") % 100 === 0).select(
        col("l_orderkey"), col("l_linenumber"),
        year(col("l_shipdate")).cast("long").as("y"),
        month(col("l_shipdate")).cast("long").as("m"),
        upper(col("l_returnflag")).as("rf"),
        substring(col("l_linestatus"), 1, 1).as("ls"),
        floor(col("l_extendedprice")).cast("long").as("price_floor"),
        length(concat(col("l_returnflag"), lit("-"), col("l_linestatus")))
          .cast("long").as("strlen"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    // ------------------------------------------- S6/S7 incremental windows
    "q33_date_window" -> ((s, d) => {
      val e = T(s, d, "events")
      val mx = e.agg(max(col("ts")).as("m"))
      e.crossJoin(broadcast(mx))
        .filter(col("ts") >= col("m") - expr("INTERVAL 7 DAYS"))
        .groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("event_type"))
    }),

    "q34_json_extract" -> ((s, d) =>
      T(s, d, "events")
        .select((get_json_object(col("props"), "$.k").cast("long") % 10).as("k_mod"))
        .groupBy(col("k_mod")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("k_mod"))),

    // TYPED nested JSON decode (SURVEY §1.2's sobject mapping —
    // reference salesforce/main.py:156-182): `from_json` into a nested
    // StructType with an ARRAY OF STRUCT, then typed field access
    // (doc.meta.user, readings[i].v) — the path q34's flat string
    // extraction doesn't exercise. The nested document is assembled
    // from fixture columns (integral values only, so the literal JSON
    // text is engine-identical) and re-parsed; the oracle decodes the
    // same documents with DuckDB's JSON path functions.
    "q80_nested_json" -> ((s, d) => {
      val doc = concat(
        lit("{\"meta\":{\"user\":"), col("user_id"),
        lit(",\"type\":\""), col("event_type"),
        lit("\"},\"readings\":[{\"dim\":\"val\",\"v\":"),
        floor(col("value")).cast("long"),
        lit("},{\"dim\":\"k\",\"v\":"),
        get_json_object(col("props"), "$.k").cast("long"),
        lit("}]}"))
      val schema = "meta STRUCT<user: BIGINT, type: STRING>, " +
        "readings ARRAY<STRUCT<dim: STRING, v: BIGINT>>"
      T(s, d, "events")
        .select(col("event_id"), from_json(doc,
          org.apache.spark.sql.types.StructType.fromDDL(schema)).as("doc"))
        .select(col("event_id"),
          col("doc.meta.user").as("user_id"),
          col("doc.meta.type").as("etype"),
          element_at(col("doc.readings"), 1).getField("v").as("v0"),
          element_at(col("doc.readings"), 2).getField("v").as("v1"),
          size(col("doc.readings")).cast("long").as("n_readings"))
        .orderBy(col("event_id"))
    }),

    "q35_incremental_pull" -> ((s, d) =>
      Query.get(T(s, d, "events"),
        columns = Seq("event_id", "user_id", "event_type", "value"),
        where = Seq(
          Pred.Op("ts", ">=", "2024-01-10"),
          Pred.Op("ts", "<", "2024-01-20")),
        sortBy = Seq(SortKey("event_id")))),

    // ----------------------------------------------------- as-of join
    "q36_asof_join" -> ((s, d) => {
      val e = T(s, d, "events").select(col("event_id"), col("user_id"), col("ts"))
      val o = T(s, d, "orders").groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("o_orderkey"))
      AsOfJoin.backward(e, "user_id", "ts", o, "o_custkey", "o_orderdate")
        .select(col("event_id"), col("user_id"), col("o_orderkey"), col("o_orderdate"))
        .orderBy(col("event_id"))
    }),

    // Catalog surface (D1/D3/D4/D6/D7/D10) as ONE oracle-checked
    // frame: build a fresh store, create tables, evolve one via raw
    // ALTER, store a persistent view, then emit every catalog fact as
    // (kind, name) rows. The expected state is static, so the oracle
    // is a literal VALUES table — the row set verifies liveness,
    // existence, column listing post-evolution, table and view
    // catalogs, and the empty-table count.
    "q90_catalog_ops" -> ((s, d) => {
      import s.implicits._
      import graft.core.ColumnSpec
      import org.apache.spark.sql.types.{LongType, StringType}
      val rootPath = java.nio.file.Files.createTempDirectory("graft-cat")
      val db = new graft.Database(s, rootPath.toString)
      db.createTable("t1", Seq(ColumnSpec("id", LongType), ColumnSpec("v", StringType)),
        primaryKey = Seq("id"))
      db.createTable("t2", Seq(ColumnSpec("k", LongType)))
      db.executeRaw("ALTER TABLE t1 ADD COLUMN quality DOUBLE")
      db.createView("v_all", "SELECT * FROM t1")
      db.createView("v_tmp", "SELECT id FROM t1")
      db.dropView("v_tmp")                     // must vanish from the catalog
      val viewRows = db.getView("v_all").count() // D7 resolution: replans stored SQL
      val ours = Set("v_all", "v_tmp")
      val rows =
        Seq(("alive", db.isAlive.toString),
          ("exists:t1", db.checkTableExists("t1").toString),
          ("exists:nope", db.checkTableExists("nope").toString),
          ("count:t1", db.getTableCount("t1").toString),
          ("view_rows:v_all", viewRows.toString)) ++
        db.getTables.map(("table", _)) ++
        db.getTableColumns("t1").map(("column:t1", _)) ++
        db.getViews.filter(ours).map(("view", _))
      // every fact above is a driver-side value, so the frame is a
      // LocalRelation with no file dependency — the temp store can be
      // deleted NOW instead of leaking a directory per invocation.
      // getView registered t1/t2 as session temp views pointing into
      // the store; drop them BEFORE the delete or later raw SQL that
      // happens to name them fails on the missing path.
      val out = rows.toDF("kind", "name").orderBy(col("kind"), col("name"))
      Seq("t1", "t2", "v_all", "v_tmp").foreach(s.catalog.dropTempView(_))
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(rootPath)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .iterator().asScala.foreach(p => java.nio.file.Files.deleteIfExists(p))
      out
    }),

    // Bucketed join (storage-layout operator): both sides pre-shuffled
    // into 8 buckets on the join key at WRITE time, so the join itself
    // plans with no exchange on either side (the "stop shuffling
    // 100 TB every night" answer; plan-locked in PlanShapeSpec). The
    // oracle runs the equivalent plain join.
    "q89_bucketed_join" -> ((s, d) => {
      import graft.core.Bucketing
      Bucketing.writeBucketed(
        T(s, d, "customer").select(col("c_custkey"), col("c_mktsegment")),
        "bk_customer", "c_custkey", 8, Seq("c_custkey"))
      Bucketing.writeBucketed(
        T(s, d, "orders").select(col("o_custkey").as("c_custkey"), col("o_totalprice")),
        "bk_orders", "c_custkey", 8, Seq("c_custkey"))
      Bucketing.bucketedJoin(s, "bk_customer", "bk_orders", "c_custkey")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("c_mktsegment"))
    }),

    // Z-order layout (core.Layout): quantize (user_id, event_id) to
    // 16-bit cells, interleave to the Morton z-value, and emit the
    // curve position per event — the clustering key a multi-dim
    // range-pruning layout sorts by (ZorderSpec verifies the actual
    // per-file box-narrowing; this query pins the bit-interleave
    // arithmetic cross-engine).
    "q92_zorder" -> ((s, d) => {
      import graft.core.Layout
      val e = T(s, d, "events").filter(col("event_id") <= 2000)
      e.select(col("event_id"),
          Layout.zValue(16,
            Layout.rangeBucket(col("user_id"), 0L, 9999L, 16),
            Layout.rangeBucket(col("event_id"), 0L, 65535L, 16)).as("z"))
        .orderBy(col("event_id"))
    }),

    // FORWARD as-of: each event attaches the same user's NEXT error
    // event (smallest err_ts ≥ ts) — the time-to-next-failure shape.
    // Right side deduped on (user, ts) first (as-of is ill-defined
    // under right ties). Inclusive at equal ts, like DuckDB ASOF <=.
    "q88_asof_forward" -> ((s, d) => {
      val e = T(s, d, "events").select(col("event_id"), col("user_id"), col("ts"))
      val errs = T(s, d, "events").filter(col("event_type") === "error")
        .groupBy(col("user_id").as("err_user"), col("ts").as("err_ts"))
        .agg(min(col("event_id")).as("err_id"))
      AsOfJoin.forward(e, "user_id", "ts", errs, "err_user", "err_ts")
        .select(col("event_id"), col("user_id"), col("err_id"), col("err_ts"))
        .orderBy(col("event_id"))
    }),

    // Composite enrichment: as-of order attach + JSON prop + running
    // per-user count — three operators composing in ONE plan.
    "q67_event_enrichment" -> ((s, d) => {
      val e = T(s, d, "events").select(col("event_id"), col("user_id"), col("ts"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      val o = T(s, d, "orders").groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("o_orderkey"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      AsOfJoin.backward(e, "user_id", "ts", o, "o_custkey", "o_orderdate")
        .withColumn("running_events", count(lit(1)).over(w))
        .select(col("event_id"), col("user_id"), col("k"),
          col("o_orderkey"), col("running_events"))
        .orderBy(col("event_id"))
    }),

    // ----------------------------------------------------- streaming (batch twins)
    // Pure range join (no equi key) via binning: the interval side
    // explodes into the bins it overlaps, turning the theta-join into
    // an equi-join on bin id + residual filter — never a cross
    // product. Points = lineitem ship days, intervals = 30-day windows
    // from order dates; the oracle runs the same theta-join directly.
    "q86_range_join" -> ((s, d) => {
      val epoch = to_date(lit("1970-01-01"))
      val p = T(s, d, "lineitem").filter(col("l_orderkey") < 300)
        .select(col("l_orderkey"), col("l_linenumber"),
          datediff(col("l_shipdate"), epoch).cast("long").as("pd"))
      val iv = T(s, d, "orders").filter(col("o_orderkey") < 40)
        .select(col("o_orderkey"),
          datediff(col("o_orderdate"), epoch).cast("long").as("lo"))
        .withColumn("hi", col("lo") + 30)
      graft.operators.RangeJoin.binned(p, "pd", iv, "lo", "hi", binWidth = 16L)
        .select(col("l_orderkey"), col("l_linenumber"), col("o_orderkey"),
          col("pd"), col("lo"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("o_orderkey"))
    }),

    "q37_tumbling_hour" -> ((s, d) =>
      T(s, d, "events")
        .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy(col("window_start"), col("event_type"))),

    // Sliding (hopping) windows — each event lands in length/slide
    // overlapping windows; same code runs under readStream with a
    // watermark. The oracle regenerates the 1970-aligned window starts
    // with microsecond integer arithmetic.
    "q87_sliding_window" -> ((s, d) =>
      T(s, d, "events")
        .groupBy(window(col("ts"), "2 hours", "30 minutes").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("w_start"), col("event_type"), col("n"))
        .orderBy(col("w_start"), col("event_type"))),

    "q38_sessionize" -> ((s, d) =>
      Streams.sessionizeBatch(T(s, d, "events"), "ts", "user_id", 30, Some("event_id"))
        .select(col("user_id"), col("session_id"), col("n_events"))
        .orderBy(col("user_id"), col("session_id"))),

    // ----------------------------------------------------- dedup
    "q39_dedup_exact" -> ((s, d) =>
      docsSpread(s, d)
        .groupBy(TextOps.fingerprintMd5(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_dups"))
        .orderBy(col("keeper"))),

    "q40_dedup_keep_latest" -> ((s, d) =>
      Dedup.keepLatest(T(s, d, "events"), Seq("user_id"), "ts", Some("event_id"))
        .select(col("user_id"), col("event_id"), col("event_type"))
        .orderBy(col("user_id"))),

    // ----------------------------------------------------- text analysis
    "q41_text_stats" -> ((s, d) => {
      docsSpread(s, d).select(
        col("doc_id"),
        TextOps.tokenCountWs(col("text")).as("tok_ws"),
        TextOps.tokenCountBpe(col("text")).as("tok_bpe"),
        TextOps.punctCount(col("text")).as("n_punct"),
        TextOps.stopwordCountText(col("text")).as("n_stop"),
        TextOps.stopwordRatioText(col("text")).as("stop_ratio"))
        .orderBy(col("doc_id"))
    }),

    "q42_text_quality" -> ((s, d) =>
      docsSpread(s, d)
        .select(col("doc_id"), TextOps.qualityScore(col("text")).as("quality"))
        .orderBy(col("doc_id"))),

    "q43_lang_id" -> ((s, d) =>
      docsSpread(s, d)
        .select(col("doc_id"), TextOps.langId(col("text")).as("lang_pred"))
        .groupBy(col("lang_pred")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("lang_pred"))),

    // Per-doc top distinguishing terms — log-free tf-idf (score =
    // tf·(N+1)/(df+1): one correctly-rounded division + one multiply,
    // so even the SCORES hash-match cross-engine; ln would not).
    "q85_top_terms" -> ((s, d) =>
      TextOps.topTerms(T(s, d, "documents"), "doc_id", "text", topK = 3)
        .orderBy(col("doc_id"), col("term"))),

    "q44_ngram_jaccard" -> ((s, d) =>
      Dedup.ngramJaccardPairs(T(s, d, "documents"), "doc_id", "text",
        threshold = 0.5, shingleN = 3, maxDf = 100)
        .orderBy(col("a"), col("b"))),

    // Portable-hash mode: the ENTIRE MinHash+LSH pipeline (signature,
    // banding, candidate join, Jaccard verify) is replayed by the
    // DuckDB oracle — md5-derived 60-bit hashes are engine-identical.
    "q45_minhash_neardup" -> ((s, d) =>
      Dedup.minhashNearDups(T(s, d, "documents"), "doc_id", "text",
        threshold = 0.5, k = 16, bands = 4, shingleN = 3, portable = true)
        .orderBy(col("a"), col("b"))),

    // Winnowing fingerprints — local-similarity dedup (shared
    // passages), complementing the whole-doc and set-similarity
    // schemes. Portable-hash mode: the DuckDB oracle replays k-gram
    // hashing, the sliding-window min, and the shared-count join.
    "q61_winnowing_neardup" -> ((s, d) =>
      Dedup.winnowingNearDups(T(s, d, "documents"), "doc_id", "text",
        k = 5, window = 4, minShared = 3, portable = true)
        .orderBy(col("a"), col("b"))),

    // Pairwise near-dup evidence → dedup CLUSTERS: connected
    // components over the winnowing pairs (min reachable doc_id labels
    // each cluster). The oracle replays the fixpoint with a
    // recursive-CTE transitive closure over the same pair list. The
    // returned frame is persisted by contract (recomputing it would
    // replay the whole label-propagation loop); the harnesses release
    // it via their per-query spark.catalog.clearCache().
    "q83_dedup_clusters" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val pairs = Dedup.winnowingNearDups(docs, "doc_id", "text",
        k = 5, window = 4, minShared = 3, portable = true)
      Dedup.connectedComponents(docs.select(col("doc_id")), "doc_id",
        pairs, "a", "b")
        .orderBy(col("doc_id"))
    }),

    // Portable-hash mode: DuckDB replays the 60-bit SimHash (per-bit
    // vote sums, sign fold, 4×15-bit banding, Hamming verify).
    "q46_simhash_neardup" -> ((s, d) =>
      Dedup.simhashNearDups(T(s, d, "documents"), "doc_id", "text",
        maxDistance = 3, portable = true)
        .orderBy(col("a"), col("b"))),

    // ----------------------------------------------------- similarity search
    "q47_embed_neardup" -> ((s, d) => {
      val v = T(s, d, "embeddings").filter(col("vec_id") < 500)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
        .withColumn("nrm", Similarity.norm(col("e")))
      val a = v.select(col("vec_id").as("a"), col("e").as("ea"), col("nrm").as("na"))
      val b = v.select(col("vec_id").as("b"), col("e").as("eb"), col("nrm").as("nb"))
      a.join(b, col("a") < col("b"))
        .withColumn("cosine",
          Similarity.dot(col("ea"), col("eb")) / (col("na") * col("nb")))
        .filter(col("cosine") >= 0.4)
        .select(col("a"), col("b"), col("cosine"))
        .orderBy(col("a"), col("b"))
    }),

    "q48_embed_neardup_lsh" -> ((s, d) =>
      Dedup.embeddingNearDups(T(s, d, "embeddings"), "vec_id", "embedding",
        threshold = 0.4, dim = 64, planes = 16, bandsOf = 4)
        .orderBy(col("a"), col("b"))),

    // SemDeDup (ext.Dedup.semanticNearDups): k-means-bucketed exact
    // cosine pairs. At nCentroids = 1 every pair is within-cluster, so
    // the WHOLE machinery (bounded-sample k-means build, broadcast
    // assignment, centroid equi-join, normalized-dot cosine, threshold)
    // gates against an all-pairs SQL replay; the clustered path
    // (nCentroids > 1) is spec-covered by a recall bar in DedupSpec.
    "q112_semantic_dedup" -> ((s, d) =>
      Dedup.semanticNearDups(T(s, d, "embeddings").filter(col("vec_id") < 500),
        "vec_id", "embedding", threshold = 0.4, nCentroids = 1)
        .orderBy(col("a"), col("b"))),

    // Hashed-n-gram linear quality classifier (TextOps.linearModelScore)
    // — fastText/CCNet-style model-as-broadcast-data scoring. The
    // md5-derived synthetic weight table is re-derived by the oracle;
    // integer weight sums divide ONCE at the end, so the double scores
    // hash-match cross-engine (the q85 log-free recipe).
    "q113_classifier_score" -> ((s, d) =>
      TextOps.linearModelScore(docsSpread(s, d), "doc_id", "text",
        TextOps.syntheticWeights(s, buckets = 64), buckets = 64)
        .orderBy(col("doc_id"))),

    // Duplicated-span detection (ext.Dedup.duplicatedSpans): Lee
    // et al.-style exact substring dedup — maximal token spans whose
    // 8-gram runs appear in ≥ 2 distinct docs (portable gram hashes;
    // the oracle replays the window/island arithmetic on integers).
    "q114_dup_spans" -> ((s, d) =>
      Dedup.duplicatedSpans(docsSpread(s, d), "doc_id", "text",
        gramLen = 8, minDocs = 2, portable = true)
        .orderBy(col("doc_id"), col("span_start"))),

    // Removal half of the Lee et al. recipe: q114's spans excised,
    // text rebuilt from the ordered surviving tokens.
    "q115_span_removal" -> ((s, d) => {
      val docs = docsSpread(s, d)
      val spans = Dedup.duplicatedSpans(docs, "doc_id", "text",
        gramLen = 8, minDocs = 2, portable = true)
      Dedup.removeDuplicatedSpans(docs, spans, "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // Classifier TRAINING sufficient statistics
    // (TextOps.trainFeatureCounts): per-bucket class feature counts
    // from a labeled corpus — the pure-integer half of
    // trainLogOddsWeights, replayed exactly by the oracle (the ln →
    // weight step is model data, spec-covered in TextOpsSpec). Labels
    // here: even doc_id = positive class.
    "q116_train_counts" -> ((s, d) =>
      TextOps.trainFeatureCounts(
        docsSpread(s, d).withColumn("label", col("doc_id") % 2 === 0),
        "doc_id", "text", "label", buckets = 64)
        .orderBy(col("bucket"))),

    // Perplexity-style LM filtering (TextOps.lmScore) — CCNet's other
    // filter: per-doc mean bigram milli-log-prob under a hashed-vocab
    // bigram LM shipped as broadcast model data. The md5-derived
    // synthetic LM table is re-derived by the oracle; integer weight
    // sums divide ONCE at the end (the q113 recipe), so the double
    // scores hash-match cross-engine. Trained-LM behavior is
    // spec-covered (TextOpsSpec).
    "q117_lm_score" -> ((s, d) =>
      TextOps.lmScore(docsSpread(s, d), "doc_id", "text",
        TextOps.syntheticLmWeights(s, buckets = 64), buckets = 64)
        .orderBy(col("doc_id"))),

    // LM TRAINING sufficient statistics (TextOps.bigramLmCounts):
    // hashed bigram counts over the corpus — pure integers, replayed
    // exactly (the ln → weight step of trainBigramLm is model data).
    "q118_lm_counts" -> ((s, d) =>
      TextOps.bigramLmCounts(docsSpread(s, d), "doc_id", "text",
        buckets = 64)
        .orderBy(col("ctx"), col("tok"))),

    // Paragraph-level dedup (ext.Dedup.duplicatedParagraphs — the
    // Dolma/RefinedWeb granularity): md5 + document frequency of every
    // non-blank line occurring in ≥ 2 distinct docs. The fixture
    // bodies carry no newlines, so the multi-line corpus is derived
    // arithmetically (shared header on every doc, promo footer on
    // every third, unique tail elsewhere) — identically in both
    // engines; planted exact-dup bodies become hot paragraphs too.
    "q119_dup_paragraphs" -> ((s, d) =>
      Dedup.duplicatedParagraphs(docsMultiline(s, d), "doc_id", "text",
        minDocs = 2)
        .orderBy(col("para_hash"))),

    // Removal half: hot paragraphs dropped, text rebuilt as the
    // ordered newline-joined survivors; every doc keeps a row.
    "q120_paragraph_removal" -> ((s, d) =>
      Dedup.removeDuplicatedParagraphs(docsMultiline(s, d), "doc_id",
        "text", minDocs = 2)
        .orderBy(col("doc_id"))),

    // BPE training sufficient statistics (TextOps.bpePairCounts):
    // word-frequency-weighted adjacent character-pair counts — the
    // integer table the first merge decision reads, replayed exactly
    // (the greedy merge loop of trainBpeMerges runs on the bounded
    // word dictionary and is model data, spec-covered in BpeSpec —
    // the q116/q118 trainer-gating recipe).
    "q121_bpe_pair_counts" -> ((s, d) =>
      TextOps.bpePairCounts(docsSpread(s, d), "text")
        .orderBy(col("pair"))),

    // BPE ENCODE under a fixed merge list (model-as-literal, like
    // q113's weights): the no-UDF replace-chain encoder's symbol and
    // distinct-symbol counts per doc, replayed with the identical
    // replace chain in SQL. Trained-merge behavior is spec-covered.
    "q122_bpe_encode" -> ((s, d) =>
      docsSpread(s, d).select(col("doc_id"),
        TextOps.bpeTokenCount(col("text"), BpeContractMerges).as("n_bpe"),
        size(array_distinct(TextOps.bpeSymbols(col("text"), BpeContractMerges)))
          .cast("long").as("n_types"))
        .orderBy(col("doc_id"))),

    // Session windows via the STREAMING operator run in batch mode —
    // gates sessionAgg (session_window) itself, complementing q38's
    // gaps-and-islands twin: >= boundary semantics (an event exactly
    // `gap` after the previous starts a NEW session) and the
    // last_ts + gap session end. sum_value is excluded from the
    // projection (double summation order is engine-dependent);
    // bounds + counts are exact.
    "q123_session_window" -> ((s, d) =>
      Streams.sessionAgg(T(s, d, "events"), "ts", "30 minutes")
        .select(col("user_id"), col("session_start"), col("session_end"), col("n"))
        .orderBy(col("user_id"), col("session_start"))),

    // Gopher/MassiveText quality rules (Rae et al. 2021, §A1.1): all
    // counters are codegen'd regex/length arithmetic (TextOps
    // .gopherQuality); the oracle replays them with
    // regexp_extract_all counts and list lambdas.
    "q124_gopher_quality" -> ((s, d) =>
      docsSpread(s, d)
        .select(col("doc_id"), TextOps.gopherQuality(col("text")).as("g"))
        .select(col("doc_id"),
          col("g.word_count").as("word_count"),
          col("g.mean_word_len").as("mean_word_len"),
          col("g.symbol_ratio").as("symbol_ratio"),
          col("g.bullet_ratio").as("bullet_ratio"),
          col("g.ellipsis_ratio").as("ellipsis_ratio"),
          col("g.alpha_ratio").as("alpha_ratio"),
          col("g.required_hits").as("required_hits"),
          col("g.pass").as("pass"))
        .orderBy(col("doc_id"))),

    // Quality-aware near-dup removal: winnowing pairs → connected
    // components → keep the HIGHEST-quality doc per cluster (ties →
    // min id) — the production keeper rule (best copy survives, not
    // an arbitrary one). Oracle = the q83 recursive-CTE closure + the
    // q42 quality expression + a row_number keeper pick.
    "q125_keep_best_dedup" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val pairs = Dedup.winnowingNearDups(docs, "doc_id", "text",
        k = 5, window = 4, minShared = 3, portable = true)
      Dedup.removeNearDuplicatesKeepBest(docs, "doc_id",
        TextOps.qualityScore(col("text")), pairs, "a", "b")
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    "q49_ann_topk" -> ((s, d) => {
      val emb = T(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 5)
      Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 10)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // Full probe (nprobe = nCentroids) is EXACT by construction, which
    // gives the whole IVF machinery — k-means build, bucket assignment,
    // probe join, scoring, ranking — a DuckDB hash-match oracle (same
    // SQL as q49). The approximate path (nprobe < C) is spec-covered by
    // a recall@k ≥ 0.9 assertion in SimilaritySpec.
    "q50_ann_ivf" -> ((s, d) => {
      val emb = T(s, d, "embeddings")
      val idx = Similarity.ivfBuild(emb, "vec_id", "embedding", nCentroids = 16)
      Similarity.ivfSearch(idx, emb.filter(col("vec_id") < 5), "vec_id", "embedding",
        k = 10, nprobe = 16)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // Product quantization — the third ANN tier (brute → IVF → PQ):
    // 4-bit-per-subspace codes (~64× smaller than the double vectors),
    // ADC search = m table lookups per candidate. Seeded codebooks
    // (the portable twin of pqTrainBooks' k-means) make the WHOLE
    // pipeline a pure function of (seed, data) — the oracle replays
    // encode, the per-query ADC tables, and the top-k in SQL.
    "q84_ann_pq" -> ((s, d) => {
      val emb = T(s, d, "embeddings")
      val books = Similarity.pqSeededBooks(dim = 64, m = 8, ksub = 16, seed = 42L)
      val enc = Similarity.pqEncode(emb, "vec_id", "embedding", books)
      Similarity.pqSearch(enc, "vec_id", books, emb.filter(col("vec_id") < 5),
        "vec_id", "embedding", k = 10)
        // the two engines' 8-element literal-codeword dots can differ
        // in the last ulp (~1e-16); ranks are separated by ~1e-3, so
        // order is stable — emit the score at a 4-decimal tolerance
        .withColumn("adc", round(col("adc"), 4))
        .withColumn("rank", col("rank").cast("long"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // IVF-PQ — the composed production recipe (bucket probe + ADC
    // shortlist + exact rerank). At FULL probe (nprobe = C) and a
    // corpus-sized shortlist the rerank is exact cosine over the whole
    // corpus, so the entire composition — k-means build, assignment,
    // PQ encode, probe join, ADC tables, two bounded top-k stages,
    // rerank — gates against the same oracle as q49. The approximate
    // path (nprobe < C, bounded shortlist) is spec-covered by a
    // recall@10 bar in SimilaritySpec.
    "q110_ann_ivfpq" -> ((s, d) => {
      val emb = T(s, d, "embeddings")
      val books = Similarity.pqSeededBooks(dim = 64, m = 8, ksub = 16, seed = 42L)
      val idx = Similarity.ivfPqBuild(emb, "vec_id", "embedding",
        nCentroids = 16, books)
      val out = Similarity.ivfPqSearch(idx, emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < 5), "vec_id", "embedding",
        k = 10, nprobe = 16, shortlist = emb.count().toInt)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy(col("query_id"), col("rank"))
      out
    }),

    // Distributed centroid computation (array analytics): element-wise
    // mean of embeddings per group, exact via decimal sums. The typed
    // Aggregator twin (functions.VectorAgg.mean) is spec-covered.
    "q74_embedding_centroids" -> ((s, d) =>
      T(s, d, "embeddings")
        .select((col("vec_id") % 4).as("grp"),
          posexplode(col("embedding").cast("array<double>")).as(Seq("dim0", "v")))
        .groupBy(col("grp"), (col("dim0") + 1).cast("long").as("dim"))
        .agg((sum(col("v").cast("decimal(18,8)")).cast("double") / count(lit(1))).as("m"))
        .orderBy(col("grp"), col("dim"))),

    // ----------------------------------------------------- multimodal
    "q51_media_meta" -> ((s, d) =>
      Multimodal.packAsMedia(T(s, d, "documents"), "doc_id", "text")
        .select(col("media_id"), col("media.mime").as("mime"),
          col("media.width").as("width"), col("media.height").as("height"),
          length(col("media.bytes")).cast("long").as("n_bytes"))
        .orderBy(col("media_id"))),

    // Exploded to (media_id, bin, cnt) rows: scalar columns hash cleanly
    // in the oracle harness, and the byte histogram IS expressible in
    // DuckDB over encode(text)'s hex dump (bins=16 ⇒ bin = low nibble).
    "q52_media_features" -> ((s, d) =>
      Multimodal.byteHistogram(
        Multimodal.packAsMedia(T(s, d, "documents"), "doc_id", "text"), bins = 16)
        .select(col("media_id"), posexplode(col("features")).as(Seq("bin", "cnt")),
          col("n_bytes"))
        .withColumn("bin", col("bin").cast("long"))
        .orderBy(col("media_id"), col("bin"))),

    "q53_frame_sample" -> ((s, d) =>
      Multimodal.frameSample(
        Multimodal.packAsMedia(T(s, d, "documents"), "doc_id", "text"),
        nFrames = 4, frameBytes = 32)
        .select(col("media_id"), col("frame_no").cast("long").as("frame_no"),
          col("frame_len").cast("long").as("frame_len"))
        .orderBy(col("media_id"), col("frame_no"))),

    // --------------------------------------------- S1–S9 REST connector
    // The fake org's records are a deterministic function of (seed, i),
    // so the oracle REGENERATES the remote dataset in SQL and checks
    // the whole connector path — pushdown, two-phase paginated read,
    // soft-delete filtering — against it by hash.
    "q55_rest_source" -> ((s, d) =>
      graft.sources.rest.RestOps.read(s, Map(
        "object" -> "account", "org" -> "verify",
        "numRecords" -> "2000", "seed" -> "42"))
        .filter(col("IsActive") === true && col("Amount") > 1000.0)
        .groupBy(col("Industry"))
        .agg(count(lit(1)).as("cnt"), dsum(col("Amount")).as("sum_amount"))
        .orderBy(col("Industry"))),

    // Writeback round trip (S8/S9): a deterministic update set goes
    // through the DSv2 BatchWrite into the fake org, then the org is
    // read back through the connector and aggregated. The update set
    // is itself derived from the org (every Banking account's Amount
    // becomes NumEmployees·1.5), so the oracle regenerates base state
    // AND applies the same update rule in SQL — the q55 recipe, write
    // edition. Store.clear makes each invocation start from base state
    // (re-runs are deterministic).
    "q81_rest_writeback" -> ((s, d) => {
      import graft.sources.rest.FakeTransport
      val opts = Map("object" -> "account", "org" -> "wbverify",
        "numRecords" -> "1000", "seed" -> "42")
      FakeTransport.Store.clear("wbverify")
      graft.sources.rest.RestOps.read(s, opts)
        .filter(col("Industry") === "Banking")
        .select(col("Id"), (col("NumEmployees") * lit(1.5)).as("Amount"))
        .write.format("graft-rest").options(opts).mode("append").save()
      graft.sources.rest.RestOps.read(s, opts)
        .groupBy(col("Industry"))
        .agg(count(lit(1)).as("cnt"), dsum(col("Amount")).as("sum_amount"))
        .orderBy(col("Industry"))
    }),

    // Write-status envelope (S8): per-record upsert results as a
    // STATUS frame — two poisoned records (malformed id, missing id)
    // produce error ROWS, never an exception (reference
    // salesforce/main.py:242-249). Statuses are a pure function of the
    // input ids, so the oracle regenerates them directly.
    "q82_rest_write_status" -> ((s, d) => {
      import s.implicits._
      import graft.sources.rest.FakeTransport
      FakeTransport.Store.clear("wbstatus")
      val updates = ((0 until 10).map(i => (f"00A$i%07d", i * 10.0)) ++
        Seq(("BAD0000001", 1.0), ("00A9999999", 2.0)))
        .toDF("Id", "Amount")
      graft.sources.rest.RestOps.upsertWithStatus(updates, "account",
        Map("object" -> "account", "org" -> "wbstatus",
          "numrecords" -> "100", "seed" -> "42"))
        .orderBy(col("record_id"))
    }),

    // Rows-only: end-to-end training-data curation pipeline — quality
    // gate → language filter → exact dedup → per-doc stats. The shape a
    // 100 TB corpus job takes: all narrow ops + one dedup shuffle.
    "q60_curation_pipeline" -> ((s, d) => {
      val docs = docsSpread(s, d)
        .withColumn("quality", TextOps.qualityScore(col("text")))
        .withColumn("lang_pred", TextOps.langId(col("text")))
        .filter(col("quality") >= 0.3 && col("lang_pred") =!= "und")
      Dedup.exact(docs, Seq("text"), "doc_id")
        .select(col("doc_id"), col("lang_pred"), col("quality"),
          TextOps.tokenCountWs(col("text")).as("tok_ws"),
          TextOps.fingerprintMd5(col("text")).as("fp"))
        .orderBy(col("doc_id"))
    }),

    // ----------------------------- curation: packing + sampling
    "q62_sequence_packing" -> ((s, d) =>
      graft.ext.Sampling.packSequences(
        T(s, d, "documents").select(col("doc_id"),
          TextOps.tokenCountWs(col("text")).as("tok")),
        "tok", "doc_id", maxTokens = 512L)
        .select(col("doc_id"), col("tok"), col("bin_id"))
        .orderBy(col("doc_id"))),

    // Portable (md5-bucket) deterministic sample — reproducible in
    // DuckDB SQL, so the sampled-id set itself is oracle-checked.
    "q63_deterministic_sample" -> ((s, d) =>
      graft.ext.Sampling.deterministicSample(
        T(s, d, "documents"), "doc_id", fraction = 0.25, portable = true)
        .groupBy(col("lang")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("lang"))),

    // Per-key cap (C4's host cap): at most 50 docs per lang, chosen by
    // the seeded portable hash order — reproducible, unbiased, and
    // replayed exactly by the oracle's rank over the same md5 bucket.
    "q130_cap_per_domain" -> ((s, d) =>
      graft.ext.Sampling.capPerKey(T(s, d, "documents"), "lang", "doc_id",
        n = 50, portable = true)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))),

    // BM25 ranked retrieval (keyword search): corpus stats as ONE
    // broadcast single-row aggregate, per-doc tf as narrow columns,
    // top-20 via TakeOrderedAndProject. The contract gates the
    // log-free idf form (ln never crosses engines bit-exactly); real
    // use keeps the textbook logIdf default.
    "q131_bm25_rank" -> ((s, d) =>
      TextOps.bm25Rank(T(s, d, "documents"), "doc_id", "text",
        queryTerms = Seq("data", "model", "learning"), topK = 20,
        logIdf = false)
        .orderBy(col("doc_id"))),

    // HTML boilerplate strip: the fixture text is plain prose, so a
    // deterministic page skeleton (script/style/comment/entities) is
    // wrapped around it to exercise every rule; the oracle replays the
    // same regexp/replace chain (all patterns RE2-safe).
    "q132_html_strip" -> ((s, d) =>
      docsSpread(s, d).select(col("doc_id"),
        TextOps.stripHtml(concat(
          lit("<html><head><title>T</title><style type=\"text/css\">p " +
            "{color: red}</style><script>var x = 1 < 2 && 2 > 1;" +
            "</script></head><body><h1>Head</h1><p>"),
          col("text"),
          lit("</p><!-- footer comment --><div>&amp; &lt;tag&gt; " +
            "&quot;q&quot; &#39;s&#39;&nbsp;end</div></body></html>")
        )).as("clean"))
        .orderBy(col("doc_id"))),

    // Context-window chunking: 32-token windows, stride 24 (8 tokens
    // of overlap carry context across each cut); chunk starts while
    // start < n, so the tail chunk may be short and empty docs vanish.
    "q133_chunk_windows" -> ((s, d) =>
      TextOps.chunkTokens(docsSpread(s, d), "doc_id", "text",
        window = 32, stride = 24)
        .orderBy(col("doc_id"), col("chunk_id"))),

    // SOFT dedup: duplicate-aware downweighting — every doc kept at
    // weight 1/cluster_size over the winnowing near-dup clusters
    // (q83's components), so each cluster contributes total mass 1.
    "q134_soft_dedup_weights" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val pairs = Dedup.winnowingNearDups(docs, "doc_id", "text",
        k = 5, window = 4, minShared = 3, portable = true)
      Dedup.softDedupWeights(docs, "doc_id", pairs, "a", "b")
        .orderBy(col("doc_id"))
    }),

    // Character-level fuzzy matching: winnowing candidates verified by
    // banded Levenshtein (≤ 5 edits keeps the planted one-word
    // rewrites, drops the distance-8 transitive pair).
    "q135_edit_distance_pairs" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val pairs = Dedup.winnowingNearDups(docs, "doc_id", "text",
        k = 5, window = 4, minShared = 3, portable = true)
      Dedup.editDistancePairs(docs, "doc_id", "text", pairs, "a", "b",
        maxDistance = 5)
        .select(col("a"), col("b"), col("dist").cast("long").as("dist"))
        .orderBy(col("a"), col("b"))
    }),

    // C4 line-level cleaning (Raffel et al. 2020 §2.2): the fixture
    // bodies are single-line prose, so a synthetic page is assembled
    // around each — a short header, the body as a sentence, two good
    // sentences, an unterminated nav line, plus arithmetic plants of
    // the "lorem ipsum" and curly-brace document kills — mirrored
    // term-for-term by the oracle. Line rules keep terminal-punctuated
    // lines of ≥ 5 words; docs keep ≥ 3 such lines or drop entirely.
    "q136_c4_clean" -> ((s, d) => {
      val page = docsSpread(s, d).select(col("doc_id"), concat(
        lit("Header\n"),
        col("text"), lit(".\n"),
        lit("This is a sentence with enough words.\n"),
        lit("Click here to subscribe now today\n"),
        lit("Another good sentence appears right here."),
        when(col("doc_id") % 13 === 3,
          lit("\nOur catalog of lorem ipsum samples ships today."))
          .otherwise(lit("")),
        when(col("doc_id") % 17 === 5,
          lit("\nfunction f() { return 1; }"))
          .otherwise(lit(""))
      ).as("text"))
      TextOps.c4Clean(page, "doc_id", "text").orderBy(col("doc_id"))
    }),

    // URL canonicalization + URL-level dedup: deterministic noisy URLs
    // (case soup, www, default ports, tracking params, fragments,
    // trailing slashes) are derived from (source, doc_id) and must
    // collide post-canonicalization; the oracle replays the identical
    // regexp chain (no capture-group replacements — Spark $1 vs DuckDB
    // \1 never enters the contract).
    "q137_url_canonical" -> ((s, d) => {
      val id25 = (col("doc_id") % 25).cast("string")
      val m6 = col("doc_id") % 6
      val raw = concat(
        lit("HTTPS://WWW."), col("source"), lit(".Example.COM"),
        when(m6 === 0, concat(lit(":443/Docs/"), id25, lit("/")))
          .when(m6 === 1, concat(lit("/Docs/"), id25,
            lit("?utm_source=news&page="), (col("doc_id") % 3).cast("string")))
          .when(m6 === 2, concat(lit("/Docs/"), id25,
            lit("?page="), (col("doc_id") % 3).cast("string"),
            lit("&utm_campaign=summer")))
          .when(m6 === 3, concat(lit("/Docs/"), id25, lit("#frag")))
          .when(m6 === 4, concat(lit(":80/Docs/"), id25,
            lit("?utm_medium=email")))
          .otherwise(concat(lit("/Docs/"), id25)))
      T(s, d, "documents").select(col("doc_id"),
          TextOps.canonicalizeUrl(raw).as("canonical_url"))
        .groupBy(col("canonical_url"))
        .agg(count(lit(1)).as("n_urls"), min(col("doc_id")).as("keep_doc_id"))
        .orderBy(col("canonical_url"))
    }),

    // CCNet-style perplexity bucketing (Wenzek et al. 2020): per-lang
    // head/middle/tail tertiles of the q117 LM score, computed by the
    // DISTRIBUTED ntile (Sampling.ntileByKey — range-bucketed per-key
    // ranks, never one window partition per language) and replayed by
    // the oracle's plain ntile(3). Scored frame is persisted: ntile's
    // quantile probe + two rank scans would otherwise recompute the
    // LM join per scan.
    "q138_ppl_buckets" -> ((s, d) => {
      val docs = docsSpread(s, d)
      val scored = TextOps.lmScore(docs, "doc_id", "text",
          TextOps.syntheticLmWeights(s, buckets = 64), buckets = 64)
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      graft.ext.Sampling.ntileByKey(scored, "lang", "lm_score", "doc_id", tiles = 3)
        .select(col("doc_id"), col("lang"), col("lm_score"),
          when(col("tile") === 1, lit("head"))
            .when(col("tile") === 2, lit("middle"))
            .otherwise(lit("tail")).as("ppl_bucket"))
        .orderBy(col("doc_id"))
    }),

    // DSIR importance selection (Xie et al. 2023): hashed-uni+bigram
    // importance scores under the synthetic milli-log-ratio table
    // (trained weights are model data — TextOpsSpec), then the exact
    // top-200 by (importance DESC, doc_id) via the token-budget
    // machinery with unit cost. The oracle replays features, weights,
    // integer sum, one division, rank ≤ 200.
    "q139_dsir_select" -> ((s, d) => {
      val scored = TextOps.dsirScore(docsSpread(s, d), "doc_id", "text",
          TextOps.dsirSyntheticWeights(s, buckets = 64), buckets = 64)
        .withColumn("__one", lit(1L))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      graft.ext.Sampling.selectByTokenBudget(scored, "__one", "importance",
          "doc_id", budget = 200L)
        .select(col("doc_id"), col("importance"), col("n_features"))
        .orderBy(col("doc_id"))
    }),

    // ftfy-lite text cleanup: smart quotes/dashes/ellipsis → ASCII,
    // NBSP → space, zero-width + C0 controls stripped, space runs
    // collapsed. The fixture text is clean ASCII, so a deterministic
    // messy suffix exercises every rule; full strings hash-compare.
    "q146_text_cleanup" -> ((s, d) =>
      docsSpread(s, d).select(col("doc_id"),
        TextOps.cleanText(concat(col("text"),
          lit(" \u201Cquoted\u201D \u2018s\u2019 \u2013 a\u2014b\u2026 " +
            "x\u00A0y z\u200Bw\u0007end\tq  r"))).as("clean"))
        .orderBy(col("doc_id"))),

    // URL domain blocklist (UT1-style source filtering): canonicalize,
    // extract the host, drop blocklisted domains, count survivors per
    // domain — the cheapest "remove known-bad sites" pass.
    "q147_domain_blocklist" -> ((s, d) => {
      val raw = concat(lit("HTTPS://WWW."), col("source"),
        lit(".Example.COM/p/"), (col("doc_id") % 50).cast("string"))
      T(s, d, "documents")
        .select(col("doc_id"),
          TextOps.urlDomain(TextOps.canonicalizeUrl(raw)).as("domain"))
        .filter(!col("domain").isin(
          "src3.example.com", "src7.example.com", "src12.example.com"))
        .groupBy(col("domain"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
        .orderBy(col("domain"))
    }),

    // Temperature-based mixture allocation (α = ½ "alpha sampling",
    // Conneau & Lample 2019): per-lang share ∝ √n, quantized to int64
    // milli-units so the largest-remainder apportionment of the
    // 300-doc budget is engine-exact.
    "q140_temperature_mix" -> ((s, d) =>
      graft.ext.Sampling.temperatureMix(T(s, d, "documents"), "lang", budget = 300L)
        .orderBy(col("lang"))),

    // Character-diversity filter: unbiased Gini–Simpson over character
    // counts — the log-free entropy proxy (integer counts, one double
    // division) that flags repetition garbage and near-random noise.
    "q141_char_diversity" -> ((s, d) =>
      TextOps.charDiversity(docsSpread(s, d), "doc_id", "text")
        .orderBy(col("doc_id"))),

    // Trailing event-time feature (behavioral/time-series feature
    // engineering): per user, count + decimal-exact value sum over the
    // preceding hour — a RANGE frame on microsecond epoch, so ties are
    // peers in both engines and the boundary is integer-exact. The
    // window partitions by user (bounded groups), never globally.
    "q148_rolling_hour" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts")))
        .rangeBetween(-(3600L * 1000000L - 1L), 0L)
      T(s, d, "events").select(col("event_id"), col("user_id"), col("ts"),
          count(lit(1)).over(w).as("n_1h"),
          sum(col("value").cast("decimal(18,4)")).over(w)
            .cast("double").as("sum_1h"))
        .orderBy(col("event_id"))
    }),

    // The modern curation pipeline end to end (the round-10 upgrade of
    // q60): Gopher document gate → character-diversity band (drop
    // repetition garbage and near-noise) → exact dedup keep-min →
    // quality-ranked selection under a 10k-token budget. Every stage
    // is individually oracle-gated elsewhere (q124, q141, q39, q129);
    // this pins their COMPOSITION.
    "q156_curation_v2" -> ((s, d) => {
      val docs = docsSpread(s, d)
      // the gate applies every Gopher rule EXCEPT required-words: the
      // synthetic fixture vocabulary contains no English function
      // words, so that rule would empty the corpus (it stays covered
      // by q124's flag); the remaining rules discriminate for real
      val g = TextOps.gopherQuality(col("text"))
      val gated = docs.filter(
        g.getField("word_count") >= 50L &&
          g.getField("word_count") <= 100000L &&
          g.getField("mean_word_len") >= 3.0 &&
          g.getField("mean_word_len") <= 10.0 &&
          g.getField("symbol_ratio") <= 0.1 &&
          g.getField("bullet_ratio") <= 0.9 &&
          g.getField("ellipsis_ratio") <= 0.3 &&
          g.getField("alpha_ratio") >= 0.8)
      val band = TextOps.charDiversity(gated, "doc_id", "text")
        .filter(col("char_diversity") >= 0.5 && col("char_diversity") <= 0.98)
        .select(col("doc_id"))
      val surv = gated.join(band, Seq("doc_id"))
      val keep = surv
        .groupBy(TextOps.fingerprintMd5(col("text")).as("__fp"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"))
      // persist before the budget selection: its quantile probe + two
      // rank scans would otherwise recompute the gate→diversity→dedup
      // pipeline three times (measured 8.2 s → ~3 s in-suite)
      val scored = surv.join(keep, Seq("doc_id"))
        .select(col("doc_id"),
          TextOps.tokenCount(col("text")).as("tok"),
          TextOps.qualityScore(col("text")).as("quality"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      graft.ext.Sampling.selectByTokenBudget(scored, "tok", "quality",
          "doc_id", budget = 10000L)
        .select(col("doc_id"), col("tok"), col("quality"))
        .orderBy(col("doc_id"))
    }),

    // Robust (10%-trimmed) mean price per return flag: drop the top
    // and bottom deciles via the distributed per-key NTILE, then a
    // decimal-exact mean — outlier-insensitive central tendency
    // without a per-group window sort.
    "q153_trimmed_mean" -> ((s, d) => {
      val li = T(s, d, "lineitem").select(col("l_returnflag"),
        col("l_extendedprice"),
        (col("l_orderkey") * 10L + col("l_linenumber")).as("__rid"))
      graft.ext.Sampling.ntileByKey(li, "l_returnflag", "l_extendedprice",
          "__rid", tiles = 10)
        .filter(col("tile") > 1 && col("tile") < 10)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_kept"),
          (dsum(col("l_extendedprice")) / count(lit(1)))
            .as("trimmed_mean"))
        .orderBy(col("l_returnflag"))
    }),

    // Corpus snapshot DIFF (the time-travel audit): what changed
    // between two committed versions — additions, removals, text
    // changes (by content fingerprint), unchanged. v1 derives from v0
    // arithmetically (drop doc_id%10=0, rewrite text for %7=1 among
    // survivors, add %13=2 under offset ids), so the oracle replays
    // the per-class counts directly. Counts are computed DISTRIBUTED
    // (full outer join on doc_id + fingerprint compare), then
    // materialized driver-side so the temp store can be deleted.
    "q154_snapshot_diff" -> ((s, d) => {
      import s.implicits._
      val root = java.nio.file.Files.createTempDirectory("graft-diff")
      val store = new graft.core.TableStore(s, root.toString)
      val base = T(s, d, "documents").select(col("doc_id"), col("text"))
      store.write("docs", base)                                  // v0
      val survivors = base.filter(col("doc_id") % 10 =!= 0)
        .withColumn("text", when(col("doc_id") % 7 === 1,
          concat(col("text"), lit(" v2"))).otherwise(col("text")))
      val added = base.filter(col("doc_id") % 13 === 2)
        .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
      store.write("docs", survivors.unionByName(added))          // v1
      val v0 = store.readVersion("docs", 0)
        .select(col("doc_id"), md5(col("text")).as("__f0"))
      val v1 = store.readVersion("docs", 1)
        .select(col("doc_id"), md5(col("text")).as("__f1"))
      val cls = v0.join(v1, Seq("doc_id"), "full_outer")
        .select(when(col("__f1").isNull, lit("removed"))
          .when(col("__f0").isNull, lit("added"))
          .when(col("__f0") =!= col("__f1"), lit("changed"))
          .otherwise(lit("unchanged")).as("change_type"))
        .groupBy(col("change_type")).agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
      cls.toDF("change_type", "n").orderBy(col("change_type"))
    }),

    // SPAN-level benchmark decontamination: excise just the token
    // spans covered by benchmark 5-grams instead of dropping whole
    // documents (q100's surgical complement) — bench grams broadcast
    // into a semi-join, islands merge, token-level removal. Bench
    // docs themselves (they live in the corpus too) excise fully.
    "q151_decontaminate_spans" -> ((s, d) => {
      val docs = docsSpread(s, d)
      val bench = T(s, d, "documents").filter(col("doc_id") % 17 === 0)
      val spans = Dedup.contaminatedSpans(docs, "doc_id", "text",
        bench, "doc_id", "text", gramLen = 5, portable = true)
      Dedup.removeDuplicatedSpans(docs, spans, "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // Host-authority ranking: integer-exact PageRank (5 rounds, ppm
    // mass, exact 85/100 damping under floor division) over a
    // deterministic 101-node link graph derived from doc ids — the
    // Common-Crawl-style quality weight for hosts. Every mass is an
    // int64 the oracle reproduces bit for bit by unrolling the rounds.
    "q150_pagerank" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val e1 = docs.select((col("doc_id") % 101).as("src"),
        ((col("doc_id") * 31 + 7) % 101).as("dst"))
      val e2 = docs.select((col("doc_id") % 101).as("src"),
        ((col("doc_id") * 57 + 13) % 101).as("dst"))
      graft.ext.GraphOps.pageRankInt(e1.unionByName(e2), "src", "dst",
          iterations = 5)
        .select(col("id").as("node"), col("mass"))
        .orderBy(col("node"))
    }),

    // Per-language document-length percentile bands (winsorize/outlier
    // flagging) — percentile = the distributed per-key NTILE at 100
    // tiles (the q138 machinery at a finer grain; a per-lang window
    // would serialize each language). Longest docs land in band 1;
    // the outlier flag marks the extreme 2% on both ends.
    "q149_length_outliers" -> ((s, d) => {
      val docs = T(s, d, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
      graft.ext.Sampling.ntileByKey(docs, "lang", "n_chars", "doc_id",
          tiles = 100)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          col("tile").as("pct_band"),
          (col("tile") <= 2 || col("tile") >= 99).as("is_outlier"))
        .orderBy(col("doc_id"))
    }),

    // Tokenizer fertility by language: BPE tokens per word and chars
    // per token under the fixed contract merge list — integer sums,
    // two divisions, replayed with the q122 replace-chain encoder.
    "q142_token_fertility" -> ((s, d) =>
      TextOps.bpeFertility(docsSpread(s, d), "lang", "text",
        BpeContractMerges)
        .orderBy(col("lang"))),

    // Contrastive pair mining: winnowing collisions labeled positive
    // (≥ 3 shared fingerprints — near-dups) vs hard_negative (1–2
    // shared: lexically close non-duplicates, the negatives that
    // actually teach an embedding model).
    "q143_contrastive_pairs" -> ((s, d) =>
      Dedup.contrastivePairs(T(s, d, "documents"), "doc_id", "text",
        k = 5, window = 4, posShared = 3, portable = true)
        .select(col("a"), col("b"), col("n_shared"), col("label"))
        .orderBy(col("a"), col("b"))),

    // MinHash estimator calibration: per LSH candidate pair, the
    // signature-match estimate of Jaccard next to the exact
    // shingle-set Jaccard and the absolute error — the audit that
    // says whether the sketch can be trusted before banding 100 TB.
    "q144_sketch_calibration" -> ((s, d) =>
      Dedup.minhashCalibration(T(s, d, "documents"), "doc_id", "text",
        k = 16, bands = 4, shingleN = 3, portable = true)
        .orderBy(col("a"), col("b"))),

    // Snapshot TIME TRAVEL (storage): three committed versions — base,
    // keyed balance bump, predicate delete — each read back AS OF its
    // version (TableStore.readVersion; snapshots are immutable, so
    // history reads are plain scans of old directories). Counts +
    // decimal-exact sums per version are driver-side facts
    // (LocalRelation out, temp store deleted before returning); the
    // oracle replays each version's mutation arithmetically.
    "q145_time_travel" -> ((s, d) => {
      import s.implicits._
      val root = java.nio.file.Files.createTempDirectory("graft-tt")
      val store = new graft.core.TableStore(s, root.toString)
      val base = T(s, d, "customer").select(col("c_custkey"), col("c_acctbal"))
      store.write("cust", base)                                  // v0
      val v1 = base.withColumn("c_acctbal",
        when(col("c_custkey") % 7 === 0, col("c_acctbal") + 100.0)
          .otherwise(col("c_acctbal")))
      store.write("cust", v1)                                    // v1
      store.write("cust", v1.filter(col("c_custkey") % 5 =!= 0)) // v2
      val rows = store.versions("cust").map { v =>
        val agg = store.readVersion("cust", v)
          .agg(count(lit(1)).as("n"), dsum(col("c_acctbal")).as("s")).head
        (v.toLong, agg.getLong(0), agg.getDouble(1))
      }
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
      rows.toDF("version", "n_rows", "sum_bal").orderBy(col("version"))
    }),

    // WITHIN-doc duplicate-line removal — the per-document complement
    // of q120's cross-doc paragraph dedup (Dolma runs both). The
    // multiline fixture's planted "self repeat" lines (doc_id%7==2)
    // must collapse to their first occurrence while blanks and unique
    // lines survive in order.
    "q128_within_doc_lines" -> ((s, d) =>
      Dedup.removeWithinDocDuplicateLines(docsMultiline(s, d), "doc_id", "text")
        .orderBy(col("doc_id"))),

    // Quality-ranked selection under a token budget ("take the best
    // 15k tokens"): rank by (quality DESC, doc_id), keep docs that
    // START within the budget. The oracle replays the rank + running
    // sum with the q42 quality expression; integer token cumsum is
    // exact cross-engine.
    "q129_token_budget" -> ((s, d) => {
      val docs = docsSpread(s, d).select(col("doc_id"),
        TextOps.tokenCount(col("text")).as("tok"),
        TextOps.qualityScore(col("text")).as("quality"))
      graft.ext.Sampling.selectByTokenBudget(docs, "tok", "quality",
        "doc_id", budget = 15000L)
        .select(col("doc_id"), col("tok"), col("quality"))
        .orderBy(col("doc_id"))
    }),

    // Unicode NFC normalization via the native codegen'd expression
    // (functions.NfcNormalize): the fixture text is ASCII (NFC
    // no-op — exercising the zero-allocation fast path), so a
    // decomposed suffix (e+combining acute, A+combining ring) is
    // appended to force real composition work; the oracle replays
    // with DuckDB's nfc_normalize and the full strings hash-compare.
    "q127_nfc_normalize" -> ((s, d) =>
      docsSpread(s, d)
        .select(col("doc_id"),
          graft.functions.GraftFunctions.nfc(
            concat(col("text"), lit(" cafe\u0301 A\u030A"))).as("norm"))
        .orderBy(col("doc_id"))),

    // Deterministic global shuffle into shards (epoch-0 training
    // order): hash-defined order + shard assignment, replayed by the
    // oracle with the same md5 bucket arithmetic and rank. One shard
    // exchange + per-shard sort — no global sort anywhere.
    "q126_shuffle_shards" -> ((s, d) =>
      graft.ext.Sampling.shuffleIntoShards(
        T(s, d, "documents").select(col("doc_id"), col("lang")),
        "doc_id", shards = 8, portable = true)
        .select(col("doc_id"), col("lang"), col("shard"), col("pos"))
        .orderBy(col("doc_id"))),

    // Weighted fixed-size sampling — sequential Poisson / order
    // sampling (Ohlsson 1998): order variable q = u/w over the
    // portable hash, n smallest win, inclusion ≈ proportional to
    // n_chars. Per-partition top-n + driver merge (TakeOrdered), no
    // global sort; the oracle replays u, the IEEE division, and the
    // tie-break exactly.
    "q160_pps_sample" -> ((s, d) =>
      graft.ext.Sampling.ppsSample(
        T(s, d, "documents").select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars", n = 200)
        .orderBy(col("doc_id"))),

    // Join-key skew audit (operators.SkewJoin.keySkew): the topN
    // hottest fact-side keys with ppm share and ‰-of-mean ratio, all
    // floor-integer arithmetic — the pre-flight decision input for
    // plain vs salted vs AQE-split joins.
    "q161_key_skew" -> ((s, d) =>
      graft.operators.SkewJoin.keySkew(
        T(s, d, "events"), "user_id", topN = 25)),

    // Sequence packing WITHIN a partition key (lang): the scale form —
    // each partition sorts independently instead of one global sort.
    "q68_packing_by_lang" -> ((s, d) =>
      graft.ext.Sampling.packSequences(
        T(s, d, "documents").select(col("doc_id"), col("lang"),
          TextOps.tokenCountWs(col("text")).as("tok")),
        "tok", "doc_id", maxTokens = 512L, partitionCols = Seq("lang"))
        .select(col("doc_id"), col("lang"), col("tok"), col("bin_id"))
        .orderBy(col("doc_id"))),

    // Stream-stream interval join, exercised in batch mode (the same
    // function runs under readStream with watermark-bounded state):
    // per user, how many same-user events precede each event by ≤ 5
    // minutes — the attribution-join shape over the events fixture.
    "q69_interval_join" -> ((s, d) => {
      val e = T(s, d, "events")
      val a = e.select(col("event_id").as("a_id"), col("user_id").as("a_user"),
        col("ts").as("a_ts"))
      val b = e.select(col("event_id").as("b_id"), col("user_id").as("b_user"),
        col("ts").as("b_ts"))
      Streams.intervalJoin(a, "a_user", "a_ts", b, "b_user", "b_ts",
        lookback = "5 minutes", lookahead = "0 seconds")
        .filter(col("b_id") =!= col("a_id"))
        .groupBy(col("a_user")).agg(count(lit(1)).as("n_pairs"))
        .select(col("a_user").as("user_id"), col("n_pairs"))
        .orderBy(col("user_id"))
    }),

    // Resize (thumbnail stand-in): content verified by md5 of the
    // sampled payload — DuckDB reproduces the every-4th-char sampling.
    "q75_media_resize" -> ((s, d) =>
      Multimodal.resize(
        Multimodal.packAsMedia(T(s, d, "documents"), "doc_id", "text"), factor = 4)
        .select(col("media_id"),
          md5(col("media.bytes")).as("thumb_md5"),
          length(col("media.bytes").cast("string")).cast("long").as("out_chars"),
          col("media.width").cast("long").as("width"),
          col("media.height").cast("long").as("height"))
        .orderBy(col("media_id"))),

    // ----------------------------------------------------- D9/D10 DDL
    "q54_schema_evolution" -> ((s, d) =>
      Ddl.evolveSchema(T(s, d, "documents"), Seq(
        ColumnSpec("quality", DoubleType),
        ColumnSpec("ingested", StringType, default = Some("ref"))))
        .orderBy(col("doc_id"))),

    // Count-min heavy hitters (ext.Sketches.countMinFrequency): the
    // portable 2-universal hashing means DuckDB rebuilds the identical
    // 4×256 counter matrix, so even the collision-inflated estimates
    // hash-match. Top-50 by estimate with a total tie-break order.
    "q95_heavy_hitters" -> ((s, d) =>
      graft.ext.Sketches.countMinFrequency(
        T(s, d, "events").select(col("user_id").cast("string").as("val")),
        "val", depth = 4, width = 256)
        // asc_nulls_last: events.user_id is nullable and DuckDB sorts
        // NULLS LAST by default while Spark sorts them FIRST — pin the
        // tie-break order so the NULL val can never reorder the cutoff
        .orderBy(col("est_count").desc, col("val").asc_nulls_last)
        .limit(50)),

    // Count-min MERGE contract (the additive twin of q152's HLL
    // max-merge): two disjoint shards sketched independently, counter
    // matrices summed elementwise, probed once — must hash-match
    // q95's DIRECT whole-stream oracle.
    "q155_cm_merge" -> ((s, d) => {
      val ev = T(s, d, "events")
        .select(col("event_id"), col("user_id").cast("string").as("val"))
      val ca = graft.ext.Sketches.cmCounters(
        ev.filter(col("event_id") % 2 === 0), "val", depth = 4, width = 256)
      val cb = graft.ext.Sketches.cmCounters(
        ev.filter(col("event_id") % 2 =!= 0), "val", depth = 4, width = 256)
      graft.ext.Sketches.cmEstimate(ev,
          graft.ext.Sketches.cmMergeCounters(ca, cb),
          "val", depth = 4, width = 256)
        .orderBy(col("est_count").desc, col("val").asc_nulls_last)
        .limit(50)
    }),

    // Bloom MERGE contract — the FOURTH mergeable-summary class
    // (bitwise-OR merge, after HLL max q152, count-min sum q155, KMV
    // bounded-set q157): per-shard set-bit frames unioned are
    // bit-identical to the direct filter, so merged membership answers
    // (false positives included) hash-match the direct replay. The
    // probe set (every customer key) is 10x the inserted set (event
    // user ids), so absent-key probes and the no-false-negative law
    // are both exercised.
    "q158_bloom_merge" -> ((s, d) => {
      val ev = T(s, d, "events")
        .select(col("event_id"), col("user_id").cast("string").as("val"))
      val ba = graft.ext.Sketches.bloomPositions(
        ev.filter(col("event_id") % 2 === 0), "val", mBits = 1024, k = 4)
      val bb = graft.ext.Sketches.bloomPositions(
        ev.filter(col("event_id") % 2 =!= 0), "val", mBits = 1024, k = 4)
      graft.ext.Sketches.bloomContains(
          T(s, d, "customer").select(col("c_custkey").cast("string").as("val")),
          graft.ext.Sketches.bloomMerge(ba, bb),
          "val", mBits = 1024, k = 4)
        .select(col("val").cast("long").as("c_custkey"), col("maybe_present"))
        .orderBy(col("c_custkey"))
    }),

    // Incremental MV maintenance (ext.Incremental): state(base) merged
    // with state(delta) reads out EXACTLY like a direct recompute over
    // the union — counts/sums add (decimal-exact), mins/maxes combine.
    // The oracle IS the direct recompute; the refresh never re-scans
    // the base.
    "q159_incremental_mv" -> ((s, d) => {
      val li = T(s, d, "lineitem")
      val cut = lit("1995-01-01 00:00:00").cast("timestamp")
      val keys = Seq("l_returnflag")
      val ms = Seq("l_quantity", "l_extendedprice")
      val base = graft.ext.Incremental.aggState(
        li.filter(col("l_shipdate") < cut), keys, ms)
      val delta = graft.ext.Incremental.aggState(
        li.filter(col("l_shipdate") >= cut), keys, ms)
      graft.ext.Incremental.readout(
          graft.ext.Incremental.mergeStates(keys, ms, base, delta), keys, ms)
        .orderBy(col("l_returnflag"))
    }),

    // Histogram MERGE contract — the FIFTH mergeable-summary class
    // (per-bin addition over a shared equi-width grid): per-shard
    // histograms summed, median read from the merged state with an
    // error of at most one bin width and never a sort of the data.
    // Power-of-two grid (0..131072, 1024 bins → width 128) keeps the
    // bin arithmetic exact; the oracle replays grid, cumulative scan,
    // and upper-edge readout.
    "q162_hist_quantile" -> ((s, d) => {
      val li = T(s, d, "lineitem")
      val ha = graft.ext.Sketches.histState(
        li.filter(col("l_orderkey") % 2 === 0), "l_returnflag",
        "l_extendedprice", 0.0, 131072.0, 1024)
      val hb = graft.ext.Sketches.histState(
        li.filter(col("l_orderkey") % 2 =!= 0), "l_returnflag",
        "l_extendedprice", 0.0, 131072.0, 1024)
      graft.ext.Sketches.histQuantile(
          graft.ext.Sketches.histMerge("l_returnflag", ha, hb),
          "l_returnflag", q = 0.5, 0.0, 131072.0, 1024)
        .orderBy(col("l_returnflag"))
    }),

    // Per-group top-k via the bounded heap aggregate
    // (functions.TopKByScore) on a RELATIONAL oracle: the ANN paths'
    // O(k)-state partial aggregate, pinned directly against the
    // row_number window it replaces (score DESC, id ASC — identical
    // total order, so results hash-match).
    "q163_topk_per_group" -> ((s, d) =>
      T(s, d, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(graft.functions.TopKByScore.topK(
          col("c_acctbal"), col("c_custkey"), 5).as("top"))
        .select(col("c_mktsegment"),
          posexplode(col("top")).as(Seq("__i", "e")))
        .select(col("c_mktsegment"), (col("__i") + 1).cast("long").as("rk"),
          col("e.id").as("c_custkey"), col("e.score").as("c_acctbal"))
        .orderBy(col("c_mktsegment"), col("rk"))),

    // SCD TYPE-2 intervalization (ext.History.scd2): collapse the
    // event stream into per-user validity intervals [valid_from,
    // valid_to) at each event_type change — "what was true when",
    // the audit complement of CDC's "what is true now". Two windows
    // on one (user, ts) partitioning; zero-length intervals retained.
    "q164_scd2" -> ((s, d) =>
      graft.ext.History.scd2(
        T(s, d, "events"), "user_id", "ts", "event_type", "event_id")
        .orderBy(col("user_id"), col("valid_from"), col("event_type"))),

    // Cross-source contamination matrix (ext.Dedup.sourceOverlap):
    // shared distinct 3-gram shingles per source pair behind the q44
    // df gate, with integer Jaccard — the provenance-level audit run
    // before document-level dedup.
    "q165_source_overlap" -> ((s, d) =>
      graft.ext.Dedup.sourceOverlap(
        T(s, d, "documents"), "source", "text", n = 3, dfCap = 100)
        .orderBy(col("src_a"), col("src_b"))),

    // Robust location/scale with NO per-group sort: median and MAD
    // via two composed histogram passes (Sketches.histMedianMad),
    // outliers by Hampel's 3-MAD rule — each estimate within one bin
    // width (4 chars on this grid). The oracle replays both passes.
    "q166_mad_outliers" -> ((s, d) =>
      graft.ext.Sketches.histMedianMad(
        T(s, d, "documents"), "lang", "n_chars", 0.0, 1024.0, 256)
        .orderBy(col("lang"))),

    // Winsorization by histogram-estimated percentile bounds
    // (Sketches.winsorize): per-lang p05/p95 clamp from ONE shared
    // histogram state, broadcast back over the data — the outlier-
    // taming transform with no per-group sort.
    "q167_winsorize" -> ((s, d) =>
      graft.ext.Sketches.winsorize(
        T(s, d, "documents").select(col("doc_id"), col("lang"), col("n_chars")),
        "lang", "n_chars", 0.0, 1024.0, 256)
        .orderBy(col("doc_id"))),

    // Cohort retention matrix (ext.Behavior.retentionCohorts): users
    // bucketed by first-event date, counted per active-day offset —
    // every step a hash aggregate or join on the user key.
    "q168_retention" -> ((s, d) =>
      graft.ext.Behavior.retentionCohorts(T(s, d, "events"), "user_id", "ts")
        .orderBy(col("cohort_date"), col("offset_days"))),

    // Ordered conversion funnel (ext.Behavior.funnel): first-touch
    // view -> click -> purchase, each stage's earliest event strictly
    // after the committed prior stage — conditional aggregation per
    // stage, never a per-user sequence sort.
    "q169_funnel" -> ((s, d) =>
      graft.ext.Behavior.funnel(T(s, d, "events"), "user_id", "ts",
        "event_type", Seq("view", "click", "purchase"))
        .orderBy(col("stage"))),

    // Deterministic A/B readout (ext.Behavior.abSplit): portable-hash
    // arm assignment (the assignment IS the audit trail), distinct-
    // user conversion, integer-exact ppm rates.
    "q170_ab_lift" -> ((s, d) =>
      graft.ext.Behavior.abSplit(T(s, d, "events"), "user_id",
        "event_type", convType = "purchase")
        .orderBy(col("variant"))),

    // First-order Markov transition matrix (ext.Behavior
    // .transitionMatrix): adjacent event pairs per user via one
    // user-partitioned lead window, row-normalized ppm probabilities
    // via a broadcast totals frame.
    "q171_transitions" -> ((s, d) =>
      graft.ext.Behavior.transitionMatrix(T(s, d, "events"),
        "user_id", "ts", "event_type", "event_id")
        .orderBy(col("from_type"), col("to_type"))),

    // Rolling 7-day distinct users from MERGED daily HLL sketches
    // (Sketches.hllRollingDistinct) — the merge law's production use:
    // each day sketched once, every trailing window estimated from
    // register merges; the range join runs over |days|x64 register
    // rows, never the event stream.
    "q172_rolling_wau" -> ((s, d) =>
      graft.ext.Sketches.hllRollingDistinct(
        T(s, d, "events").withColumn("day", to_date(col("ts"))),
        "day", "user_id", window = 7)
        .orderBy(col("day"))),

    // PCA projection (Similarity.pcaFit/pcaProject): one-pass O(d²)
    // moment aggregate + driver-side Jacobi on the d×d covariance,
    // projection via broadcast-literal components (no join). Like
    // q59's native sketches the eigenbasis is not SQL-replayable —
    // rows-only by design; PcaSpec pins orthonormality, variance
    // ordering, and reconstruction; the fixed-basis twin q48 (SRP)
    // IS hash-matched.
    "q173_pca_project" -> ((s, d) => {
      val emb = T(s, d, "embeddings")
      val model = graft.ext.Similarity.pcaFit(emb, "embedding", k = 4)
      graft.ext.Similarity.pcaProject(
          emb.select(col("vec_id"), col("embedding")), "embedding", model)
        .select(col("vec_id"), col("pc1"), col("pc2"), col("pc3"), col("pc4"))
        .orderBy(col("vec_id"))
    }),

    // Distribution drift per source (Sketches.histDriftTV): total-
    // variation distance in ppm between each source's length profile
    // and the rest of the corpus, from ONE histogram state — the
    // "which crawl changed shape" retrain trigger; work is state-
    // sized after the single scan.
    "q174_source_drift" -> ((s, d) =>
      graft.ext.Sketches.histDriftTV(
        T(s, d, "documents"), "source", "n_chars", 0.0, 1024.0, 256)
        .orderBy(col("source"))),

    // ROWS-frame moving aggregate (the positional twin of q148's
    // RANGE frame): per user, trailing-3-events count and decimal-
    // exact sum on one (user, ts, id) window.
    "q175_moving_window" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id")).rowsBetween(-2, 0)
      T(s, d, "events").select(col("event_id"), col("user_id"),
          count(lit(1)).over(w).as("n_3"),
          sum(col("value").cast("decimal(18,4)")).over(w)
            .cast("double").as("sum_3"))
        .orderBy(col("event_id"))
    }),

    // One-pass per-column cardinality/null profile (ext.Audit
    // .columnProfile): six lineitem columns melt to (name, value)
    // rows in one scan, then portable-HLL distincts per column — the
    // arrival-time profiling pass.
    "q176_column_profile" -> ((s, d) =>
      graft.ext.Audit.columnProfile(T(s, d, "lineitem"),
        Seq("l_orderkey", "l_partkey", "l_suppkey", "l_returnflag",
          "l_linestatus", "l_shipdate"))
        .orderBy(col("col_name"))),

    // Referential-integrity audit (ext.Audit.fkOrphans): three FK
    // relationships checked by LEFT ANTI joins, labeled counts (all
    // zero on the TPC-H-consistent fixture — the audit PASSING is the
    // contract).
    "q177_fk_orphans" -> ((s, d) =>
      graft.ext.Audit.fkOrphans(Seq(
        ("lineitem.orderkey", T(s, d, "lineitem"), "l_orderkey",
          T(s, d, "orders"), "o_orderkey"),
        ("orders.custkey", T(s, d, "orders"), "o_custkey",
          T(s, d, "customer"), "c_custkey"),
        ("customer.nationkey", T(s, d, "customer"), "c_nationkey",
          T(s, d, "nation"), "n_nationkey")))
        .orderBy(col("fk"))),

    // Gap-free daily spine (ext.Audit.fillDailyGaps): sparse per-day
    // error counts for two users, absent days zero-filled via a
    // sequence-exploded calendar — the reporting-table shape.
    "q178_date_spine" -> ((s, d) => {
      val daily = T(s, d, "events")
        .filter(col("user_id") < 2 && col("event_type") === "error")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_events"))
      graft.ext.Audit.fillDailyGaps(daily, "day", Seq("n_events"))
        .orderBy(col("day"))
    }),

    // Market-basket association rules (ext.Behavior.associationRules):
    // parts co-ordered in the same order — support/confidence/lift as
    // floor ppm/milli; per-basket pair generation on the basket key,
    // item totals broadcast back. minPairCount prunes the tail.
    "q179_assoc_rules" -> ((s, d) =>
      graft.ext.Behavior.associationRules(
        T(s, d, "lineitem").filter(col("l_orderkey") < 2000),
        "l_orderkey", "l_partkey", minPairCount = 2L)
        .orderBy(col("item_a"), col("item_b"))),

    // Engine-portable Pearson correlation (ext.Audit.exactCorrelation):
    // decimal-exact sufficient statistics, one double conversion,
    // fixed operation order — replayable where native corr() is not.
    "q180_correlation" -> ((s, d) =>
      graft.ext.Audit.exactCorrelation(T(s, d, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount"))
        .orderBy(col("col_a"), col("col_b"))),

    // The production MV loop COMPOSED: snapshot v0's state + the
    // v0→v1 snapshot DELTA (anti join on the row key between two
    // committed store versions) merged == direct recompute over v1 —
    // ties q145's time travel to q159's mergeable state; the refresh
    // reads only the delta, never re-scans the base.
    "q181_mv_snapshot_refresh" -> ((s, d) => {
      val root = java.nio.file.Files.createTempDirectory("graft-mv")
      val store = new graft.core.TableStore(s, root.toString)
      val li = T(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_returnflag"), col("l_quantity"))
      store.write("li", li.filter(col("l_orderkey") % 3 =!= 0))   // v0
      store.write("li", li)                                        // v1
      val vs = store.versions("li")
      val v0 = store.readVersion("li", vs.head)
      val v1 = store.readVersion("li", vs.last)
      val keys = Seq("l_returnflag")
      val ms = Seq("l_quantity")
      val state0 = graft.ext.Incremental.aggState(v0, keys, ms)
      val delta = v1.join(v0.select(col("l_orderkey"), col("l_linenumber")),
        Seq("l_orderkey", "l_linenumber"), "left_anti")
      val out = graft.ext.Incremental.readout(
          graft.ext.Incremental.mergeStates(keys, ms, state0,
            graft.ext.Incremental.aggState(delta, keys, ms)), keys, ms)
        .orderBy(col("l_returnflag"))
      val rows = out.collect()
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
      s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
    }),

    // Vocabulary-coverage audit (TextOps.oovRate): per-doc OOV rate
    // against the corpus's own deterministic top-500 word list —
    // TakeOrdered vocab broadcast to the token stream.
    "q182_oov_rate" -> ((s, d) =>
      TextOps.oovRate(T(s, d, "documents"), "doc_id", "text", vocabSize = 500)
        .orderBy(col("doc_id"))),

    // Join-size estimation from count-min sketches (Sketches
    // .cmJoinSizeEstimate, Cormode & Muthukrishnan §4.2): the inner
    // product of two counter matrices bounds |A ⋈ B| from above —
    // the join is priced WITHOUT co-scanning the sides. The contract
    // also computes the exact size and the floor-ppm overestimate.
    "q183_join_size_est" -> ((s, d) => {
      val li = T(s, d, "lineitem")
      val o = T(s, d, "orders")
      val est = graft.ext.Sketches.cmJoinSizeEstimate(
        li, "l_orderkey", o, "o_orderkey", depth = 4, width = 1 << 18)
      val exact = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("exact_join_rows"))
      est.crossJoin(exact)
        .select(col("est_join_rows"), col("exact_join_rows"),
          expr("((est_join_rows - exact_join_rows) * 1000000L) div exact_join_rows")
            .as("err_ppm"))
    }),

    // Integer-TF-IDF keywords (TextOps.keywords): idf as the bit
    // length of the integer df ratio, so scoring replays exactly;
    // top-3 per doc over bounded per-doc partitions.
    "q184_keywords" -> ((s, d) =>
      TextOps.keywords(T(s, d, "documents"), "doc_id", "text", k = 3)
        .orderBy(col("doc_id"), col("rank"))),

    // Next-word suggestion table (TextOps.nextWordTable): corpus
    // bigram argmax per context via one min(struct) aggregate —
    // map-side combine, no vocabulary-sized window.
    "q185_next_word" -> ((s, d) =>
      TextOps.nextWordTable(T(s, d, "documents"), "doc_id", "text",
        minCount = 5L)
        .orderBy(col("word"))),

    // Per-type linear trend of daily volume (Audit.groupedTrend):
    // int64 sufficient statistics over (day index, count) rows, one
    // double conversion, fixed operation order — replayable where
    // regr_slope() is not.
    "q186_trend" -> ((s, d) => {
      val daily = T(s, d, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_day"))
        .withColumn("x",
          datediff(col("day"), lit("2024-01-01").cast("date")).cast("long"))
      graft.ext.Audit.groupedTrend(daily, "event_type", "x", "n_day")
        .orderBy(col("event_type"))
    }),

    // Integer CUSUM changepoint (Behavior.cusumChangepoint): the day
    // of maximal cumulative deviation per event type — deviations
    // scaled through the period count so the statistic stays exact.
    "q187_changepoint" -> ((s, d) =>
      graft.ext.Behavior.cusumChangepoint(T(s, d, "events"),
        "event_type", "ts")
        .orderBy(col("event_type"))),

    // Curation pipeline v3 — the round-10-close composition over the
    // NEW tier: source drift gate (q174) → per-lang winsorized length
    // (q167) → exact dedup keep-min (q39) → weight-proportional PPS
    // sample of 100 docs (q160, weighted by the winsorized length).
    // Each stage is individually gated; this pins their COMPOSITION.
    "q188_curation_v3" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val kept = graft.ext.Sketches.histDriftTV(
          docs, "source", "n_chars", 0.0, 1024.0, 256)
        .filter(col("tv_ppm") <= 800000L).select(col("source"))
      val gated = docs.join(broadcast(kept), Seq("source"))
      val wins = graft.ext.Sketches.winsorize(
        gated, "lang", "n_chars", 0.0, 1024.0, 256)
      val keepers = wins
        .groupBy(TextOps.fingerprintMd5(col("text")).as("__fp"))
        .agg(min(col("doc_id")).as("doc_id"))
      val deduped = wins.join(keepers.select(col("doc_id")),
        Seq("doc_id"), "left_semi")
      graft.ext.Sampling.ppsSample(
          deduped.select(col("doc_id"), col("lang"), col("source"),
            col("n_chars_wins")),
          "doc_id", "n_chars_wins", n = 100)
        .orderBy(col("doc_id"))
    }),

    // Hybrid retrieval via reciprocal-rank fusion (Similarity
    // .rrfFuse): the BM25 lexical top-50 (q131's ranker) fused with
    // the cosine semantic top-50 for query vector 0 (q49's ranker) —
    // floor-integer 1000/(10+rank) contributions, no score
    // calibration. The 50-row rank windows are bounded by topK.
    "q189_hybrid_rrf" -> ((s, d) => {
      val emb = T(s, d, "embeddings")
      val lex = TextOps.bm25Rank(T(s, d, "documents"), "doc_id", "text",
          Seq("data", "model", "learning"), topK = 50, logIdf = false)
        .select(col("doc_id").as("id"),
          row_number().over(Window.orderBy(col("score").desc, col("doc_id")))
            .cast("long").as("rank"))
      val sem = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
          emb.filter(col("vec_id") === 0), "vec_id", "embedding", k = 50)
        .select(col("nn_id").as("id"), col("rank").cast("long").as("rank"))
      Similarity.rrfFuse(Seq(lex, sem), "id", k = 20)
        .orderBy(col("rrf_milli").desc, col("id"))
    }),

    // WINDOWED funnel (Behavior.funnel with maxGap): view -> click
    // within 1 hour -> purchase within 1 hour of the click — the
    // "converted promptly" refinement of q169's unbounded funnel.
    "q190_windowed_funnel" -> ((s, d) =>
      graft.ext.Behavior.funnel(T(s, d, "events"), "user_id", "ts",
        "event_type", Seq("view", "click", "purchase"),
        maxGap = Some("1 HOUR"))
        .orderBy(col("stage"))),

    // Rate-anomaly flagging (Behavior.rateAnomalies): each user's
    // peak trailing-10-minute event count via one microsecond-exact
    // RANGE frame, thresholded — the bot heuristic.
    "q191_rate_anomalies" -> ((s, d) =>
      graft.ext.Behavior.rateAnomalies(T(s, d, "events"), "user_id",
        "ts", windowSeconds = 600L, threshold = 5L)
        .orderBy(col("user_id"))),

    // Inter-event GAP quantiles per type (time-domain × sketch
    // composition): per-user lag gaps in floor seconds, median read
    // from the q162 histogram state — latency/cadence profiling with
    // no per-type sort.
    "q192_gap_quantiles" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val gaps = T(s, d, "events")
        .withColumn("__prev", lag(col("ts"), 1).over(w))
        .filter(col("__prev").isNotNull)
        .select(col("event_type"),
          expr("(unix_micros(ts) - unix_micros(__prev)) div 1000000")
            .as("gap_sec"))
      graft.ext.Sketches.histQuantile(
          graft.ext.Sketches.histState(gaps, "event_type", "gap_sec",
            0.0, 8192.0, 512),
          "event_type", 0.5, 0.0, 8192.0, 512)
        .orderBy(col("event_type"))
    }),

    // Vocabulary GROWTH curve (Heaps'-law audit): each word's first-
    // occurrence doc bucketed into doc-id quartile ranges — how fast
    // does the vocabulary still grow at the corpus tail (a saturating
    // curve says a bigger crawl adds little lexical novelty). One
    // min() aggregate per word + a 4-row rollup with window cumsum.
    "q193_vocab_growth" -> ((s, d) => {
      // BIGRAM vocabulary: the fixture's unigram lexicon is tiny and
      // saturates in the first docs; word PAIRS keep appearing —
      // the curve a Heaps'-law audit actually reads
      val firstDoc = docsSpread(s, d) // spread: single-split explode rule
        .select(col("doc_id"),
          explode(TextOps.shingles(TextOps.tokens(col("text")), 2)).as("__t"))
        .groupBy(col("__t")).agg(min(col("doc_id")).as("__first"))
      val bounds = T(s, d, "documents")
        .agg(min(col("doc_id")).as("__lo"), max(col("doc_id")).as("__hi"))
      val w = Window.orderBy(col("quartile"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      firstDoc.crossJoin(broadcast(bounds))
        .select(least(lit(4L), expr(
          "((__first - __lo) * 4) div (__hi - __lo + 1) + 1")).as("quartile"))
        .groupBy(col("quartile")).agg(count(lit(1)).as("new_words"))
        .withColumn("cum_vocab", sum(col("new_words")).over(w))
        .orderBy(col("quartile"))
    }),

    // Duplicate-cluster SIZE distribution (dedup health): how many
    // fingerprint clusters exist at each multiplicity — the shape
    // that says whether duplication is a few mega-clusters (crawl
    // boilerplate) or a long tail (mirrors). From the q39 fragment.
    // (the raw fixture is duplicate-free at this SF, so a
    // deterministic mirror slice — every 50th doc re-keyed — plants
    // 2-clusters and a 3-cluster, mirrored by the oracle)
    "q194_dup_size_dist" -> ((s, d) => {
      val docs = T(s, d, "documents").select(col("doc_id"), col("text"))
      val mirrored = docs.filter(col("doc_id") % 50 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
      val tripled = docs.filter(col("doc_id") === 0)
        .select((col("doc_id") + 200000L).as("doc_id"), col("text"))
      docs.unionByName(mirrored).unionByName(tripled)
        .groupBy(TextOps.fingerprintMd5(col("text")).as("__fp"))
        .agg(count(lit(1)).as("cluster_size"))
        .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))
        .orderBy(col("cluster_size"))
    }),

    // EXACT-permille apportionment report (largest remainder over a
    // tiny per-source aggregate): token shares that sum to exactly
    // 1000 — the q140 apportionment idiom as a presentation-grade
    // mix report (floor shares + the remainder ranking window run
    // over |sources| rows, never data).
    "q195_source_share" -> ((s, d) => {
      val counts = T(s, d, "documents")
        .groupBy(col("source"))
        .agg(sum(TextOps.tokenCountWs(col("text"))).as("tokens"))
      val total = Window.partitionBy(lit(1))
      val rankW = Window.orderBy(
        expr("(tokens * 1000) % __tot").desc, col("source"))
      counts
        .withColumn("__tot", sum(col("tokens")).over(total))
        .withColumn("__floor", expr("(tokens * 1000) div __tot"))
        .withColumn("__rk", row_number().over(rankW))
        .withColumn("__slots", expr("1000 - sum(__floor) over ()"))
        .select(col("source"), col("tokens"),
          (col("__floor") + when(col("__rk") <= col("__slots"), 1L)
            .otherwise(0L)).as("share_permille"))
        .orderBy(col("source"))
    }),

    // ANOMALOUS-day detection by robust z-score: per event type, the
    // exact median and MAD of daily counts (two exactQuantileByKey
    // passes — true order statistics, no sketch error), then flag
    // days with |x − med|·1000 > 3500·MAD (the Iglewicz–Hoban 3.5
    // modified-z rule as pure integers). Level shifts don't poison
    // the threshold the way mean/stddev would.
    "q238_anomalous_days" -> ((s, d) => {
      val daily = T(s, d, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint(true) // three passes below share it
      val med = graft.ext.Sampling.exactQuantileByKey(
          daily, "event_type", "n", "day", qPermille = 500L)
        .select(col("event_type"), col("q_value").cast("long").as("__med"))
      val dev = daily.join(broadcast(med), Seq("event_type"))
        .withColumn("__dev", abs(col("n") - col("__med")))
      val mad = graft.ext.Sampling.exactQuantileByKey(
          dev, "event_type", "__dev", "day", qPermille = 500L)
        .select(col("event_type"), col("q_value").cast("long").as("__mad"))
      dev.join(broadcast(mad), Seq("event_type"))
        .filter(col("__dev") * 1000L > lit(3500L) * col("__mad"))
        .select(col("event_type"), col("day"), col("n"),
          col("__med").as("median_n"), col("__dev").as("abs_dev"))
        .orderBy(col("event_type"), col("day"))
    }),

    // KEYSET pagination contract: three consecutive 50-row pages via
    // `key > cursor ORDER BY key LIMIT n` — O(page) per fetch where
    // OFFSET is O(skipped); each page is a TakeOrdered over a pushed
    // range filter. The cursor arithmetic (last key of page k feeds
    // page k+1) is deterministic, so the pages are hashable.
    "q239_keyset_pages" -> ((s, d) => {
      val o = T(s, d, "orders")
      def page(after: Column, n: Int): DataFrame =
        o.filter(col("o_orderkey") > after)
          .orderBy(col("o_orderkey")).limit(n)
          .select(col("o_orderkey"), col("o_totalprice"))
      // cursors resolve as scalar aggregates (no collect): page k+1
      // filters on max(key) of page k via a broadcast 1-row cross join
      val p1 = page(lit(0L), 50)
      val c1 = p1.agg(max(col("o_orderkey")).as("__c"))
      val p2 = o.crossJoin(broadcast(c1)).filter(col("o_orderkey") > col("__c"))
        .orderBy(col("o_orderkey")).limit(50)
        .select(col("o_orderkey"), col("o_totalprice"))
      val c2 = p2.agg(max(col("o_orderkey")).as("__c"))
      val p3 = o.crossJoin(broadcast(c2)).filter(col("o_orderkey") > col("__c"))
        .orderBy(col("o_orderkey")).limit(50)
        .select(col("o_orderkey"), col("o_totalprice"))
      p1.withColumn("page", lit(1L))
        .unionByName(p2.withColumn("page", lit(2L)))
        .unionByName(p3.withColumn("page", lit(3L)))
        .orderBy(col("page"), col("o_orderkey"))
    }),

    // Tie-aware TOP-K semantics: rank() keeps price ties past k where
    // row_number() cuts arbitrarily — both counts pinned per group so
    // the tie contract is explicit, not folklore.
    "q240_topk_ties" -> ((s, d) => {
      val byRank = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice").desc)
      val byRow = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      T(s, d, "orders")
        .withColumn("__rk", rank().over(byRank))
        .withColumn("__rn", row_number().over(byRow))
        .groupBy(col("o_orderstatus"))
        .agg(count(when(col("__rk") <= 3, 1L)).as("n_rank_top3"),
          count(when(col("__rn") <= 3, 1L)).as("n_rownum_top3"),
          max(when(col("__rk") <= 3, col("o_totalprice"))).as("top_price"))
        .orderBy(col("o_orderstatus"))
    }),

    // MANN–WHITNEY U: did purchases draw stochastically larger values
    // than clicks? Exact rank-sum over cents (ext.Stats — distinct-
    // value aggregate + range-bucketed prefix sum, never one global
    // window), reported as 2·U and the AUC effect size in floor ppm.
    "q241_rank_sum" -> ((s, d) =>
      graft.ext.Stats.rankSumTest(
        T(s, d, "events")
          .select(col("event_type"),
            round(col("value") * 100).cast("long").as("cents")),
        "event_type", "purchase", "click", "cents")),

    // KOLMOGOROV–SMIRNOV D between the en and fr doc-length CDFs —
    // the bin-free exact companion to q174's binned TV drift: max
    // CDF gap in exact integers (DECIMAL(38,0) cross products), one
    // ppm floor division AFTER the argmax, ties broken to the low
    // value.
    "q242_ks_test" -> ((s, d) =>
      graft.ext.Stats.ksTest(
        T(s, d, "documents").select(col("lang"), col("n_chars")),
        "lang", "en", "fr", "n_chars")),

    // L-DIVERSITY (the q200 k-anonymity companion): a large QI group
    // still leaks if everyone shares the same sensitive value — count
    // distinct balance bands per (nation, segment) group, histogram
    // by diversity.
    "q243_l_diversity" -> ((s, d) =>
      graft.ext.Audit.lDiversity(
        T(s, d, "customer")
          .withColumn("bal_band",
            floor(col("c_acctbal") / 1000).cast("long")),
        Seq("c_nationkey", "c_mktsegment"), "bal_band", l = 2L)
        .orderBy(col("diversity"))),

    // ORDER-INDEPENDENT table fingerprint — the migration checksum:
    // canonical '|'-joined row strings (NULL → '\N', doubles
    // pre-quantized to cents, dates to ISO strings) through the
    // portable 56-bit md5 hash, SUMMED (commutative ⇒ partitioning
    // and row order are irrelevant) in DECIMAL(38,0), mod 2⁶².
    "q244_fingerprint" -> ((s, d) =>
      graft.ext.Audit.fingerprint(T(s, d, "lineitem"), Seq(
        col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_linenumber"),
        round(col("l_extendedprice") * 100).cast("long"),
        round(col("l_quantity")).cast("long"),
        col("l_returnflag"), col("l_linestatus"),
        col("l_shipdate").cast("date").cast("string")))),

    // Token(byte)-WEIGHTED per-language median doc length: the
    // weighted order statistic (ext.Sampling.weightedQuantileByKey,
    // the q227 machinery summing weights instead of counting rows) —
    // "what length does the median BYTE of the corpus live in", which
    // row-median misses when long docs dominate the byte budget.
    "q245_weighted_median" -> ((s, d) =>
      graft.ext.Sampling.weightedQuantileByKey(
        T(s, d, "documents")
          .withColumn("bytes", octet_length(col("text")).cast("long")),
        "lang", "n_chars", "bytes", "doc_id", qPermille = 500L)
        .orderBy(col("lang"))),

    // PERCEPTUAL-hash media near-dup (the image-dedup pass a LAION-
    // style multimodal pipeline runs before anything expensive): dHash
    // gradient signs over 61 probe samples of the decoded signal,
    // 15-bit-band blocking (pigeonhole-complete to Hamming 3), true
    // Hamming verify — the media twin of q46's SimHash text pass. The
    // corpus unions with a one-character "re-encode" of every payload
    // (same byte positions, one sample perturbed — the perturbation
    // class dHash is BUILT to absorb), so the pass must pair each
    // original with its variant while exact byte hashing finds nothing.
    "q246_media_dhash" -> ((s, d) => {
      val docs = T(s, d, "documents").select(col("doc_id"), col("text"))
      val variants = docs.select(
        (col("doc_id") + 1000000L).as("doc_id"),
        concat(substring(col("text"), 1, 10), lit("X"),
          expr("substring(text, 12)")).as("text"))
      graft.ext.Multimodal.dHashNearDups(
        graft.ext.Multimodal.packAsMedia(
          docs.unionByName(variants), "doc_id", "text"), maxBits = 3)
        .orderBy(col("a"), col("b"))
    }),

    // HARD-NEGATIVE mining (contrastive training): per anchor, the
    // top-10 highest-cosine corpus vectors with a DIFFERENT label —
    // the label-mismatch predicate rides the scoring pass before the
    // bounded top-k heap (q49 machinery), never a post-rank refill.
    "q247_hard_negatives" -> ((s, d) => {
      val emb = T(s, d, "embeddings")
      graft.ext.Similarity.hardNegatives(
        emb, "vec_id", "embedding", "label",
        emb.filter(col("vec_id") < 5), "vec_id", "embedding", "label",
        k = 10)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // CHI-SQUARE independence: does the event mix depend on weekday?
    // Contingency cells + broadcast margins, per-cell exact floor-ppm
    // deviations (ext.Stats — the one χ² form both engines replay
    // bit for bit), dof from the level counts.
    "q248_chi_square" -> ((s, d) =>
      graft.ext.Stats.chiSquare(
        T(s, d, "events").select(col("event_type"),
          dayofweek(col("ts")).cast("long").as("dow")),
        "event_type", "dow")),

    // IMPACT-ORDERED inverted index (the artifact BM25 serving reads):
    // per term, exact df/total_tf plus the top-8 highest-tf postings
    // as a canonical doc:tf string — the posting cap is the bounded
    // TopKByScore heap ON the term aggregate (O(k) state per term
    // however hot the stopword), never a per-term window sort.
    "q249_impact_index" -> ((s, d) =>
      graft.ext.TextOps.impactIndex(
        T(s, d, "documents"), "doc_id", "text", topPostings = 8)
        .orderBy(col("term"))),

    // PERCENTILE normalization (the score-fusion primitive): every
    // doc's exact global length rank → floor-ppm percentile, via the
    // range-bucketed rank machinery — never one global window.
    "q250_percentile_norm" -> ((s, d) =>
      graft.ext.Sampling.percentileNormalize(
        T(s, d, "documents").select(col("doc_id"), col("n_chars")),
        "n_chars", "doc_id")
        .orderBy(col("doc_id"))),

    // ASYMMETRIC n-gram CONTAINMENT (quotation/subset-copy detection —
    // what Jaccard structurally misses: a short doc fully embedded in
    // a long one scores Jaccard ≈ 0 but containment ≈ 1). The q44
    // plan — df-capped shingle sets, one persisted sized pass, an
    // equi-keyed self-join — with both directed floor-ppm scores per
    // unordered pair.
    "q251_containment" -> ((s, d) =>
      graft.ext.Dedup.containmentPairs(
        T(s, d, "documents"), "doc_id", "text",
        minPpm = 500000L, shingleN = 3, maxDf = 100)
        .orderBy(col("a"), col("b"))),

    // MMR DIVERSIFIED rerank (Carbonell & Goldstein 1998): greedy
    // λ·rel − (1−λ)·max-sim-to-picked over the distributed top-20
    // shortlist — the diversity pass that keeps a top-k from
    // collapsing onto near-duplicates of one hit. The corpus scoring
    // is the q49 distributed pass; the k-step greedy runs on the
    // bounded collected shortlist (inherently sequential in k), and
    // the oracle unrolls the same five argmax stages bit for bit.
    "q252_mmr_rerank" -> ((s, d) => {
      val emb = T(s, d, "embeddings")
      graft.ext.Similarity.mmrRerank(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < 5), "vec_id", "embedding",
        k = 5, shortlist = 20, lambdaMilli = 700)
        .orderBy(col("query_id"), col("rank"))
    }),

    // SPEARMAN rank correlation (monotone association — what Pearson
    // q180 misses under nonlinearity/outliers): Pearson over doubled
    // midranks, each column ranked via a distinct-value aggregate +
    // the range-bucketed prefix sum, sufficient statistics in
    // DECIMAL(38,0) with one double conversion (the q180 recipe).
    "q253_spearman" -> ((s, d) =>
      graft.ext.Stats.spearman(
        T(s, d, "lineitem").select(
          round(col("l_quantity")).cast("long").as("qty"),
          round(col("l_extendedprice") * 100).cast("long").as("cents")),
        "qty", "cents")),

    // MARGIN-based aligned-pair mining (Artetxe & Schwenk 2019, the
    // CCMatrix bitext rule): pairs between two labeled embedding sets
    // kept when the cosine stands out against BOTH sides' k-NN
    // neighborhoods — 2k·cos/(Σfwd + Σbwd) as ONE double division,
    // forward-best per anchor, margin > 1.05.
    "q254_margin_mine" -> ((s, d) =>
      graft.ext.Similarity.marginMine(T(s, d, "embeddings"),
        "vec_id", "embedding", "label", labelA = 0, labelB = 1,
        k = 4, minMarginMilli = 1050L)
        .orderBy(col("a_id"))),

    // p50/p90/p99 value bands per event type in ONE distributed rank
    // pass (exactQuantilesByKey shares the range-bucketed rank across
    // all quantiles — the latency-band readout without re-ranking per
    // percentile).
    "q255_quantile_bands" -> ((s, d) =>
      graft.ext.Sampling.exactQuantilesByKey(
        T(s, d, "events").select(col("event_type"),
          round(col("value") * 100).cast("long").as("cents"),
          col("event_id")),
        "event_type", "cents", "event_id", Seq(500L, 900L, 990L))
        .orderBy(col("event_type"), col("q_permille"))),

    // COHEN'S KAPPA: chance-corrected agreement of the q43 lang-ID
    // classifier against the fixture labels — the scalar the q233
    // confusion matrix summarizes to; all-integer (N·D − S)/(N² − S)
    // in floor ppm, negative when worse than chance.
    "q256_cohens_kappa" -> ((s, d) =>
      graft.ext.Stats.cohensKappa(
        docsSpread(s, d).select(col("lang"),
          TextOps.langId(col("text")).as("lang_pred")),
        "lang", "lang_pred")),

    // Per-doc NOVELTY/memorization score: the fraction of each doc's
    // positional 8-grams duplicated in ≥2 docs (q114 machinery minus
    // the island pass) — the per-doc signal curation thresholds on,
    // where q114 only locates spans.
    "q257_novelty" -> ((s, d) =>
      graft.ext.Dedup.noveltyScore(docsSpread(s, d), "doc_id", "text",
        gramLen = 8, minDocs = 2, portable = true)
        .orderBy(col("doc_id"))),

    // Paired SIGN test (q241's paired sibling): did each user's event
    // values rise from the first half of January to the second? Each
    // user compares against itself via the exact integer cross-product
    // sign(ΣB·nA − ΣA·nB); directions count into the tie-dropping
    // normal z in floor milli.
    "q258_sign_test" -> ((s, d) =>
      graft.ext.Stats.signTest(
        T(s, d, "events").select(col("user_id"),
          when(col("ts") < lit("2024-01-16 00:00:00").cast("timestamp"),
            lit("h1")).otherwise(lit("h2")).as("half"),
          round(col("value") * 100).cast("long").as("cents")),
        "user_id", "half", "h1", "h2", "cents")),

    // DISTRIBUTED connected-components engaged for real — the gate's
    // one >2^20-edge graph: 355,000 four-node chains = 1,065,000
    // verified edges, past connectedComponents' 2^20-edge union-find
    // budget, so the distributed min-label-propagation loop (the
    // 100 TB path no fixture-sized pair list can reach) provably runs
    // (branch taken by edge-count arithmetic; DedupSpec pins the same
    // constants against Dedup.DefaultLocalEdgeLimit itself). Chain
    // links are arithmetic, so the oracle knows every label in closed
    // form — the FULL 1.42M-row labeling is hash-pinned node by node,
    // not summarized. Pointer-doubling (`shortcut`) keeps the
    // diameter-3 chains to two join rounds. The returned frame is
    // persisted per the connectedComponents contract (caller owns the
    // release); both harnesses clearCache between queries, so the
    // 1.42M-row block does not outlive this entry in a sweep.
    "q259_cc_distributed" -> ((s, d) => {
      val n = 1420000L // 355,000 chains of 4; edges = 3n/4 > 2^20
      val nodes = s.range(n).select(col("id"))
      val edges = s.range(n).filter(col("id") % 4 =!= 3)
        .select(col("id").as("a"), (col("id") + 1L).as("b"))
      graft.ext.Dedup.connectedComponents(nodes, "id", edges, "a", "b",
          shortcut = true)
        .orderBy(col("id"))
    }),

    // Streaming SKETCH-INGEST under at-least-once replay (q123's
    // batch-mode pattern applied to Streams.sketchIngest): the events
    // stream arrives as three arbitrary micro-batches driven through
    // sketchIngestBatch — the EXACT foreachBatch body — with batch 2
    // deliberately ingested TWICE (foreachBatch redelivery after a
    // failure). Max-merge idempotence makes the persisted register
    // table, and so every daily estimate, bit-identical to the direct
    // one-shot sketch — which IS the oracle (the q172 register replay
    // without the rolling window). A non-idempotent sink would
    // double-rank a third of the stream and shift the estimates.
    // Store facts collect driver-side (|days|-bounded) so the temp
    // store deletes before returning, the q145 recipe.
    "q260_sketch_ingest_replay" -> ((s, d) => {
      import s.implicits._
      val root = java.nio.file.Files.createTempDirectory("graft-si")
      try {
        val store = new graft.core.TableStore(s, root.toString)
        val ev = T(s, d, "events").select(col("ts"), col("user_id"))
        def ingest(b: org.apache.spark.sql.DataFrame): Unit =
          Streams.sketchIngestBatch(b, store, "daily_users",
            to_date(col("ts")), "day", "user_id")
        val b2Pred = dayofmonth(col("ts")) > 10 && dayofmonth(col("ts")) <= 20
        ingest(ev.filter(dayofmonth(col("ts")) <= 10))
        ingest(ev.filter(b2Pred))
        ingest(ev.filter(b2Pred)) // the replayed delivery
        ingest(ev.filter(dayofmonth(col("ts")) > 20))
        graft.ext.Sketches
          .hllFromRegisters(store.read("daily_users"), "day")
          .collect().map(r => (r.getDate(0), r.getLong(1)))
          .toSeq.toDF("day", "est_distinct").orderBy(col("day"))
      } finally
        org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    }),

    // WARM-START connected components (the continuous-dedup cluster
    // maintenance q99/q107 feed): epoch 1's edges build the {0,1} and
    // {2,3} pairs of every 4-chain; epoch 2 delivers only the middle
    // (1,2) links, and connectedComponentsIncremental folds them into
    // epoch 1's LABEL FRAME — never the historical edges — merging
    // each pair of clusters into the full chain (new label = min of
    // the two old minima, propagated through the star edges). The
    // 100k-row labeling is hash-pinned against the same closed form
    // as q259; the ScalaCheck law pins warm == one-shot on arbitrary
    // graphs and both execution branches.
    "q262_cc_warm_start" -> ((s, d) => {
      val n = 100000L // 25,000 chains of 4
      val nodes = s.range(n).select(col("id"))
      def links(rem: Long*) = s.range(n)
        .filter((col("id") % 4).isin(rem: _*))
        .select(col("id").as("a"), (col("id") + 1L).as("b"))
      val l1 = graft.ext.Dedup.connectedComponents(
        nodes, "id", links(0L, 2L), "a", "b")
      val out = graft.ext.Dedup.connectedComponentsIncremental(
        nodes, "id", l1, links(1L), "a", "b")
      l1.unpersist() // `out` is materialized by contract before return
      out.orderBy(col("id"))
    }),

    // WELCH'S t: are click and view event values drawn from the same
    // mean? The inference step q170's lift point-estimate stops short
    // of — exact decimal moments, one IEEE double expression, floor
    // milli (the q258 replay recipe).
    "q263_welch_t" -> ((s, d) =>
      graft.ext.Stats.welchT(
        T(s, d, "events").select(col("event_type"),
          round(col("value") * 100).cast("long").as("cents")),
        "event_type", "click", "view", "cents")),

    // THEIL–SEN robust slope of each event type's daily revenue — the
    // median-of-pairwise-slopes trend q186's least squares can't hold
    // under outlier days; pairs explode from the 30-day DAILY series
    // (days², never rows²), each slope floor-ppm exact.
    "q264_theil_sen" -> ((s, d) =>
      graft.ext.Stats.theilSen(
        T(s, d, "events")
          .groupBy(col("event_type"), dayofmonth(col("ts")).as("day"))
          .agg(sum(round(col("value") * 100).cast("long")).as("cents")),
        "event_type", "day", "cents")
        .orderBy(col("event_type"))),

    // LAG-k AUTOCORRELATION of daily event volume (lags 1–3): the
    // serial-dependence audit behind q187's CUSUM — per-lag Pearson
    // over the domain-sized daily series, exact sufficient statistics,
    // one double expression per (type, lag).
    "q265_acf" -> ((s, d) =>
      graft.ext.Stats.autocorr(
        T(s, d, "events")
          .groupBy(col("event_type"), dayofmonth(col("ts")).as("day"))
          .agg(count(lit(1)).as("n_ev")),
        "event_type", "day", "n_ev", maxLag = 3)
        .orderBy(col("event_type"), col("lag"))),

    // WALD–WOLFOWITZ runs test on daily revenue around its low median
    // — too few runs = trending/level-shifted days (the q187 signal
    // read as a significance test), too many = alternation; exact
    // integer runs, IEEE z in floor milli.
    "q266_runs_test" -> ((s, d) =>
      graft.ext.Stats.runsTest(
        T(s, d, "events")
          .groupBy(col("event_type"), dayofmonth(col("ts")).as("day"))
          .agg(sum(round(col("value") * 100).cast("long")).as("cents")),
        "event_type", "day", "cents")
        .orderBy(col("event_type"))),

    // T-CLOSENESS: the skew rung of the privacy ladder (q200 size,
    // q243 diversity, THIS distance) — per-(segment, nation) TV
    // distance between the group's $1000-acctbal-band distribution
    // and the global one, exact rational floor ppm; the release gate
    // reads max(tv_ppm) against its t.
    "q267_t_closeness" -> ((s, d) =>
      graft.ext.Audit.tCloseness(
        T(s, d, "customer").select(col("c_mktsegment"), col("c_nationkey"),
          floor(col("c_acctbal") / 1000.0).cast("long").as("bal_band")),
        Seq("c_mktsegment", "c_nationkey"), "bal_band")
        .orderBy(col("c_mktsegment"), col("c_nationkey"))),

    // KMV set-operation estimates (the capability q157's union-only
    // merge stops short of): |urgent ∩ high| customer overlap and
    // Jaccard from two 256-min sketches — both priorities have ~1300
    // distinct customers, so the (k−1)/f_k estimator branch (not the
    // exact small-set branch) is what's hash-pinned.
    "q268_kmv_intersect" -> ((s, d) =>
      graft.ext.Sketches.kmvIntersectEstimate(
        T(s, d, "orders"), "o_orderpriority", "1-URGENT", "2-HIGH",
        "o_custkey")),

    // ZIPF rank–frequency audit: top-64 tokens, cnt·rank/cnt(1) in
    // floor ppm — ≈10⁶ everywhere is healthy language, a flat head is
    // boilerplate flood, and the fixture's planted template tokens
    // show exactly that.
    "q269_zipf_profile" -> ((s, d) =>
      graft.ext.TextOps.zipfProfile(docsSpread(s, d), "text", topR = 64)
        .orderBy(col("rank"))),

    // RESOURCE-ALLOCATION link prediction on the supplier–part
    // bipartite graph: supplier pairs scored by Σ 1/deg(part) over
    // shared parts (rare parts say more), deg-capped before the pair
    // explode, per-term floor ppm, top-20.
    "q270_link_predict" -> ((s, d) =>
      graft.ext.GraphOps.resourceAllocation(
        T(s, d, "lineitem"), "l_suppkey", "l_partkey",
        maxDeg = 64, topN = 20)),

    // POISSON BOOTSTRAP CI on the mean event value — the bootstrap
    // that works at 100 TB (one pass, all 200 replicates via per-row
    // Poisson(1) weights from ONE md5, B-row shuffle); CI bounds are
    // order statistics of the replicate means, every bit replayable.
    "q271_poisson_bootstrap" -> ((s, d) =>
      graft.ext.Sampling.poissonBootstrapMean(
        T(s, d, "events").select(col("event_id"),
          round(col("value") * 100).cast("long").as("cents")),
        "event_id", "cents", b = 200, tailPermille = 25)),

    // DELETE-AWARE incremental MV (closes q159's retraction boundary,
    // Incremental object doc): the lineitem rollup absorbs an insert
    // batch AND a delete batch purely from per-batch RETRACTABLE
    // states — cnt/sum group algebra under signed merge, never a
    // rescan of the base; min/max stay append-only by contract.
    // Oracle = direct recompute over (base ∪ inserts) ∖ deletes.
    "q261_mv_retract" -> ((s, d) => {
      val li = T(s, d, "lineitem").select(col("l_orderkey"),
        col("l_returnflag"), col("l_linestatus"),
        col("l_quantity"), col("l_extendedprice"))
      val keys = Seq("l_returnflag", "l_linestatus")
      val ms = Seq("l_quantity", "l_extendedprice")
      val base = li.filter(col("l_orderkey") % 3 =!= 0)
      val ins = li.filter(col("l_orderkey") % 3 === 0)
      val del = base.filter(col("l_orderkey") % 5 === 1) // ⊆ base rows
      def st(f: org.apache.spark.sql.DataFrame) =
        graft.ext.Incremental.retractableState(f, keys, ms)
      graft.ext.Incremental.readoutRetractable(
          graft.ext.Incremental.mergeRetractable(keys, ms,
            Seq(st(base), st(ins)), Seq(st(del))),
          keys, ms)
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // GROWTH ACCOUNTING (the new/retained/resurrected/churned ledger):
    // weekly user states from first-activity and prev-week flags —
    // two user-keyed passes, never a per-user scan of history.
    "q235_growth_accounting" -> ((s, d) => {
      val weeks = T(s, d, "events")
        .select(col("user_id"),
          date_trunc("week", col("ts")).cast("date").as("wk"))
        .distinct()
      val first = weeks.groupBy(col("user_id")).agg(min(col("wk")).as("__w0"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("wk"))
      val flagged = weeks.join(first, Seq("user_id"))
        .withColumn("__prev", lag(col("wk"), 1).over(w))
        .withColumn("state",
          when(col("wk") === col("__w0"), lit("new"))
            .when(col("__prev") === date_sub(col("wk"), 7), lit("retained"))
            .otherwise(lit("resurrected")))
      val active = flagged.groupBy(col("wk"), col("state"))
        .agg(count(lit(1)).as("n_users"))
      // churned(w) = active in w-7 but not w: prev-week actives LEFT
      // ANTI current-week actives, keyed per week via a self-join on
      // the shifted week column
      val cur = weeks.select(col("user_id"), col("wk"))
      val nxt = weeks.select(col("user_id"),
        date_add(col("wk"), 7).as("wk"))
      val churned = nxt.join(cur, Seq("user_id", "wk"), "left_anti")
        .groupBy(col("wk")).agg(count(lit(1)).as("n_users"))
        .withColumn("state", lit("churned"))
        .select(col("wk"), col("state"), col("n_users"))
      active.unionByName(churned)
        .orderBy(col("wk"), col("state"))
    }),

    // GINI coefficient of customer spend, DISTRIBUTED: Σ rank·x via
    // the range-bucketed exact-rank machinery (never one global window
    // partition), all sums exact integers in cents, ONE floor division
    // composition at the end: gini_ppm = (2·Σi·xᵢ − (n+1)·Σx)·10⁶ div
    // (n·Σx) over ascending (spend, customer) ranks.
    "q236_gini" -> ((s, d) => {
      val spend = T(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("__cents"))
      // distributed ascending rank: bucket by approx quantiles, rank
      // within (bucket), offset by broadcast bucket totals (the q227
      // machinery inlined over one constant key)
      val probes = (1 until 32).map(_.toDouble / 32).toArray
      val withQ = spend.withColumn("__q", col("__cents").cast("double"))
      val bounds = Option(withQ.stat.approxQuantile("__q", probes, 0.001))
        .getOrElse(Array.empty[Double]).filterNot(_.isNaN).distinct.sorted
      val bucket = bounds.foldLeft(lit(0)) { (acc, b) =>
        acc + when(col("__q") > lit(b), 1).otherwise(0)
      }
      val withB = withQ.withColumn("__bkt", bucket)
      val wIn = Window.partitionBy(col("__bkt"))
        .orderBy(col("__cents"), col("o_custkey"))
      val rn = withB.withColumn("__rn", row_number().over(wIn).cast("long"))
      val tot = withB.groupBy(col("__bkt")).agg(count(lit(1)).as("__tot"))
      val offsets = tot.as("a")
        .join(broadcast(tot.as("b")), col("b.__bkt") < col("a.__bkt"), "left")
        .groupBy(col("a.__bkt").as("__bkt"))
        .agg(coalesce(sum(col("b.__tot")), lit(0L)).as("__off"))
      rn.join(broadcast(offsets), Seq("__bkt"))
        .withColumn("__rank", col("__off") + col("__rn"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("__cents").cast("decimal(38,0)")).as("__sx"),
          sum((col("__rank") * col("__cents")).cast("decimal(38,0)")).as("__six"))
        .select(col("n_customers"),
          col("__sx").cast("long").as("total_cents"),
          // floor division on nonneg decimals via the exact
          // (a − a mod b)/b identity — decimal `/` would HALF_UP-round
          // at scale 6 and diverge from DuckDB's integer floor
          locally {
            val a = expr("CAST((2 * __six - (n_customers + 1) * __sx) * 1000000 AS DECIMAL(38,0))")
            val b = expr("CAST(n_customers AS DECIMAL(38,0)) * __sx")
            ((a - pmod(a, b)) / b).cast("long")
          }.as("gini_ppm"))
    }),

    // BENFORD first-digit audit (the fraud screen): observed leading-
    // digit counts of order totals against the Benford expectation —
    // the log10 expectation table ships as driver-computed literals
    // (model-as-data, the q218 recipe), deviation in floor ppm.
    "q237_benford" -> ((s, d) => {
      import s.implicits._
      val expected = BenfordPpm.toDF("digit", "expected_ppm")
      val obs = T(s, d, "orders")
        .select(substring(col("o_totalprice").cast("decimal(18,2)")
          .cast("string"), 1, 1).cast("long").as("digit"))
        .filter(col("digit").between(1L, 9L))
        .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      val tot = obs.agg(sum(col("n")).as("__t"))
      obs.crossJoin(broadcast(tot))
        .join(broadcast(expected), Seq("digit"))
        .select(col("digit"), col("n"),
          expr("(n * 1000000L) div __t").as("observed_ppm"),
          col("expected_ppm"),
          abs(expr("(n * 1000000L) div __t") - col("expected_ppm"))
            .as("abs_dev_ppm"))
        .orderBy(col("digit"))
    }),

    // STICKINESS (DAU/MAU): exact daily actives over the trailing-30
    // portable-HLL monthly estimate (the q172 register machinery at a
    // 30-day window) — the engagement ratio computed without ever
    // re-scanning a month of history per day.
    "q234_stickiness" -> ((s, d) => {
      val ev = T(s, d, "events").withColumn("day", to_date(col("ts")))
      val dau = ev.groupBy(col("day"))
        .agg(countDistinct(col("user_id")).as("dau"))
      val mau = graft.ext.Sketches.hllRollingDistinct(ev, "day", "user_id",
          window = 30)
        .withColumnRenamed("est_distinct", "mau_est")
      dau.join(mau, Seq("day"))
        .withColumn("stickiness_ppm", expr("(dau * 1000000L) div mau_est"))
        .orderBy(col("day"))
    }),

    // Cumulative CONVERSION curve (discrete survival): of users whose
    // journey starts with a view, what fraction converted within 1h /
    // 4h / 24h / 1 week — floor-ppm against the view cohort, one row
    // per horizon via a tiny explode.
    "q231_conversion_curve" -> ((s, d) => {
      val ev = T(s, d, "events")
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("__v"))
      val conv = ev.filter(col("event_type") === "purchase")
        .join(v, Seq("user_id"))
        .filter(col("ts") > col("__v"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("__p"),
          first(col("__v")).as("__v0"))
        .select(col("user_id"),
          expr("(unix_micros(__p) - unix_micros(__v0)) div 1000000")
            .as("__tt"))
      val cohort = v.agg(count(lit(1)).as("__n"))
      val horizons = Seq(3600L, 14400L, 86400L, 604800L)
      conv.crossJoin(broadcast(cohort))
        .select(explode(array(horizons.map(lit(_)): _*)).as("horizon_sec"),
          col("__tt"), col("__n"))
        .groupBy(col("horizon_sec"))
        .agg(first(col("__n")).as("n_cohort"),
          count(when(col("__tt") <= col("horizon_sec"), 1L)).as("n_converted"))
        .withColumn("conv_ppm", expr("(n_converted * 1000000L) div n_cohort"))
        .orderBy(col("horizon_sec"))
    }),

    // Order↔lineitem RECONCILIATION (the ledger audit): each order's
    // header total against its detail sum in exact integer cents —
    // match / mismatch / childless counts plus the worst absolute
    // discrepancy. (The synthetic fixture prices are independent, so
    // discrepancies are EXPECTED — the contract pins the audit
    // arithmetic, not a clean ledger.)
    "q232_price_reconcile" -> ((s, d) => {
      val detail = T(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("__dc"))
      T(s, d, "orders")
        .select(col("o_orderkey"),
          round(col("o_totalprice") * 100).cast("long").as("__hc"))
        .join(detail, col("o_orderkey") === col("l_orderkey"), "left")
        .select(
          when(col("__dc").isNull, lit("childless"))
            .when(abs(col("__hc") - col("__dc")) <= 100L, lit("match"))
            .otherwise(lit("mismatch")).as("status"),
          abs(col("__hc") - coalesce(col("__dc"), lit(0L))).as("__gap"))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n_orders"),
          max(col("__gap")).as("max_gap_cents"))
        .orderBy(col("status"))
    }),

    // Language-ID CONFUSION matrix: the q43 classifier against the
    // fixture's lang labels — per (label, prediction) counts, the
    // multi-class eval every lang filter ships with.
    "q233_lang_confusion" -> ((s, d) =>
      docsSpread(s, d)
        .select(col("lang"), TextOps.langId(col("text")).as("lang_pred"))
        .groupBy(col("lang"), col("lang_pred"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("lang"), col("lang_pred"))),

    // TIME-WEIGHTED average (TWAP): each observation holds until the
    // next same-user event; the mean weights values by their holding
    // duration in floor seconds — integer-exact milli arithmetic
    // (value quantized once to milli, products bounded, one floor
    // division) so bursty sampling can't bias the average.
    "q228_twap" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      T(s, d, "events")
        .withColumn("__next", lead(col("ts"), 1).over(w))
        .filter(col("__next").isNotNull)
        .select(col("user_id"),
          round(col("value") * 1000).cast("long").as("__vm"),
          expr("(unix_micros(__next) - unix_micros(ts)) div 1000000")
            .as("__dt"))
        .filter(col("__dt") > 0)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_holds"),
          sum(col("__vm") * col("__dt")).as("__wsum"),
          sum(col("__dt")).as("held_seconds"))
        .select(col("user_id"), col("n_holds"), col("held_seconds"),
          expr("__wsum div held_seconds").as("twap_milli"))
        .orderBy(col("user_id"))
    }),

    // OHLC bars (candlesticks): per (user, hour) open/high/low/close
    // of the value stream — open/close via min/max(struct(ts, id,
    // value)) argmin/argmax, never a rank window.
    "q229_ohlc_bars" -> ((s, d) =>
      T(s, d, "events")
        .select(col("user_id"),
          date_trunc("hour", col("ts")).as("bar"),
          col("ts"), col("event_id"),
          round(col("value") * 1000).cast("long").as("__vm"))
        .groupBy(col("user_id"), col("bar"))
        .agg(count(lit(1)).as("n"),
          min(struct(col("ts"), col("event_id"), col("__vm"))).as("__o"),
          max(struct(col("ts"), col("event_id"), col("__vm"))).as("__c"),
          max(col("__vm")).as("high_milli"),
          min(col("__vm")).as("low_milli"))
        .select(col("user_id"), col("bar").cast("timestamp").as("bar"),
          col("n"), col("__o.__vm").as("open_milli"),
          col("high_milli"), col("low_milli"),
          col("__c.__vm").as("close_milli"))
        .orderBy(col("user_id"), col("bar"))),

    // Top session PATHS: the q38 sessionizer's sessions rendered as
    // ordered event-type strings (short sessions only — paths are
    // presentation artifacts, not corpus-sized strings), counted and
    // top-20'd via TakeOrdered.
    "q230_top_paths" -> ((s, d) => {
      val sessions = T(s, d, "events")
        .withColumn("__prev", lag(col("ts"), 1).over(
          Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))))
        .withColumn("__new",
          when(col("__prev").isNull ||
            unix_micros(col("ts")) - unix_micros(col("__prev")) > 1800000000L, 1L)
            .otherwise(0L))
        .withColumn("__sid", sum(col("__new")).over(
          Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      sessions
        .groupBy(col("user_id"), col("__sid"))
        .agg(count(lit(1)).as("__n"),
          array_join(transform(
            array_sort(collect_list(struct(col("ts"), col("event_id"),
              col("event_type")))),
            x => x.getField("event_type")), ">").as("path"))
        .filter(col("__n") <= 8)
        .groupBy(col("path"))
        .agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("n_sessions").desc, col("path"))
        .limit(20)
    }),

    // BLOCKED fuzzy join (record linkage): dirty customer names
    // (planted '#'-deletion typos) matched back by last-4-chars
    // blocking + banded Levenshtein + min(struct) best-match — never
    // a cross product, never a rank window.
    "q226_fuzzy_match" -> ((s, d) => {
      val cust = T(s, d, "customer")
      val dirty = cust.filter(col("c_custkey") % 10 === 0)
        .select((col("c_custkey") + 1000000L).as("dirty_id"),
          concat(substring(col("c_name"), 1, 8),
            substring(col("c_name"), 10, 30)).as("dirty_name"))
      graft.ext.Dedup.fuzzyJoin(dirty, "dirty_id", "dirty_name",
          cust.select(col("c_custkey"), col("c_name")), "c_custkey", "c_name",
          maxDistance = 1, blockKey = c => substring(c, -4, 4))
        .orderBy(col("dirty_id"))
    }),

    // EXACT per-language median length (Sampling.exactQuantileByKey):
    // the true order statistic via range-bucketed distributed ranks —
    // no per-key window partition, no sketch error.
    "q227_exact_median" -> ((s, d) =>
      graft.ext.Sampling.exactQuantileByKey(
          T(s, d, "documents").select(col("doc_id"), col("lang"), col("n_chars")),
          "lang", "n_chars", "doc_id", qPermille = 500L)
        .orderBy(col("lang"))),

    // Array HIGHER-ORDER functions parity: transform / filter /
    // aggregate / zip_with / sort + slice over token arrays, checked
    // value-for-value against DuckDB's list lambdas — the API surface
    // a feature-engineering user reaches for first.
    "q222_array_hof" -> ((s, d) =>
      docsSpread(s, d).filter(col("doc_id") < 200)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("__t"))
        .select(col("doc_id"),
          size(col("__t")).cast("long").as("n_tokens"),
          // transform: per-token lengths, then aggregate: exact sum
          aggregate(transform(col("__t"), t => length(t).cast("long")),
            lit(0L), (acc, x) => acc + x).as("chars_total"),
          // filter: long-token count
          size(filter(col("__t"), t => length(t) > 5)).cast("long")
            .as("n_long"),
          // zip_with adjacent (self shifted via slice): bigram join len
          size(zip_with(
            slice(col("__t"), lit(1), greatest(size(col("__t")) - 1, lit(0))),
            slice(col("__t"), lit(2), greatest(size(col("__t")) - 1, lit(0))),
            (a, b) => concat(a, lit(" "), b))).cast("long").as("n_bigrams"),
          // sort + first: lexicographically smallest token
          element_at(array_sort(col("__t")), 1).as("min_token"))
        .orderBy(col("doc_id"))),

    // NULL-semantics contract: the aggregate/grouping NULL rules every
    // engine must agree on — count(*) vs count(col), sum/avg skipping,
    // NULL group keys, coalesce/nullif — pinned cross-engine on a
    // derived frame with planted NULLs.
    "q223_null_semantics" -> ((s, d) => {
      val c = T(s, d, "customer")
        .select(col("c_custkey"),
          when(col("c_custkey") % 5 === 0, lit(null).cast("long"))
            .otherwise(col("c_nationkey").cast("long")).as("nk"),
          when(col("c_custkey") % 7 === 0, lit(null).cast("double"))
            .otherwise(col("c_acctbal")).as("bal"))
      c.groupBy(coalesce(col("nk"), lit(-1L)).as("nk_group"))
        .agg(count(lit(1)).as("n_rows"),
          count(col("bal")).as("n_bal"),
          dsum(col("bal")).as("sum_bal"),
          count(when(col("bal").isNull, 1L)).as("n_null_bal"),
          sum(nullif(col("nk"), lit(3L))).as("sum_nk_not3"))
        .orderBy(col("nk_group"))
    }),

    // DECIMAL-precision contract: exact fixed-point aggregation rules
    // — decimal sums, decimal×decimal products, floor/ceil to integer
    // — the arithmetic every money pipeline depends on being
    // bit-identical across engines.
    "q224_decimal_edge" -> ((s, d) =>
      T(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double")
            .as("sum_price"),
          round(sum(col("l_extendedprice").cast("decimal(18,4)") *
            col("l_quantity").cast("decimal(18,4)")), 0).cast("double")
            .as("sum_gross"),
          sum(floor(col("l_extendedprice")).cast("long")).as("floor_sum"),
          max(ceil(col("l_extendedprice")).cast("long")).as("ceil_max"))
        .orderBy(col("l_returnflag"))),

    // DATETIME function family parity: trunc/add_months/last_day/
    // dayofweek/quarter/epoch extraction over order dates — one row
    // per calendar month with every derived field hash-compared.
    "q225_datetime_family" -> ((s, d) =>
      T(s, d, "orders")
        .select(date_trunc("month", col("o_orderdate")).cast("date").as("m"),
          col("o_orderdate"))
        .groupBy(col("m"))
        .agg(count(lit(1)).as("n"),
          min(to_date(col("o_orderdate"))).as("first_day"),
          max(dayofweek(col("o_orderdate")).cast("long")).as("max_dow"),
          max(quarter(col("o_orderdate")).cast("long")).as("q"),
          min(unix_micros(col("o_orderdate"))).as("min_us"))
        .withColumn("month_end", last_day(col("m")))
        .withColumn("next_month", add_months(col("m"), 1))
        .orderBy(col("m"))),

    // RECENCY-weighted engagement score: exponential half-life decay
    // as MODEL-AS-DATA — the weight table floor(1e6·2^(−age/7)) is
    // computed ONCE driver-side and shipped to both engines as
    // literals, so the score is integer-exact (in-engine pow() is not
    // bit-portable; a 41-row broadcast table is). Ages past the table
    // weigh 0 (fully decayed).
    "q218_recency_score" -> ((s, d) => {
      import s.implicits._
      val wts = RecencyWeights.toDF("age_days", "w_ppm")
      val ev = T(s, d, "events")
      val anchor = ev.agg(max(to_date(col("ts"))).as("__anchor"))
      ev.crossJoin(broadcast(anchor))
        .withColumn("age_days",
          datediff(col("__anchor"), to_date(col("ts"))).cast("long"))
        .join(broadcast(wts), Seq("age_days"), "left")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(coalesce(col("w_ppm"), lit(0L))).as("recency_score_ppm"))
        .orderBy(col("user_id"))
    }),

    // Session BOUNCE rate: the q38 sessionizer rolled to per-user
    // single-event-session shares (floor ppm) — the engagement-quality
    // readout a product dashboard leads with.
    "q219_bounce_rate" -> ((s, d) =>
      Streams.sessionizeBatch(T(s, d, "events"), "ts", "user_id", 30,
          Some("event_id"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(when(col("n_events") === 1L, 1L).otherwise(0L)).as("n_bounces"))
        .withColumn("bounce_ppm", expr("(n_bounces * 1000000L) div n_sessions"))
        .orderBy(col("user_id"))),

    // Time-to-convert DISTRIBUTION: per-user first view → first
    // later purchase delta in floor seconds, collapsed to converter
    // count + the q162 histogram-state median — the funnel-latency
    // readout with no global sort.
    "q220_time_to_convert" -> ((s, d) => {
      val ev = T(s, d, "events")
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("__v"))
      val deltas = ev.filter(col("event_type") === "purchase")
        .join(v, Seq("user_id"))
        .filter(col("ts") > col("__v"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("__p"),
          first(col("__v")).as("__v0"))
        .select(lit("all").as("g"),
          expr("(unix_micros(__p) - unix_micros(__v0)) div 1000000")
            .as("tt_sec"))
      graft.ext.Sketches.histQuantile(
          graft.ext.Sketches.histState(deltas, "g", "tt_sec",
            0.0, 4194304.0, 1024),
          "g", 0.5, 0.0, 4194304.0, 1024)
        .orderBy(col("g"))
    }),

    // Revenue COHORT matrix: customers bucketed by first-order month,
    // decimal-exact revenue per (cohort, month offset) — the CLV
    // retention table, exact integer month arithmetic.
    "q221_revenue_cohorts" -> ((s, d) => {
      val ord = T(s, d, "orders")
        .withColumn("__m",
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).cast("long"))
      val first = ord.groupBy(col("o_custkey")).agg(min(col("__m")).as("__m0"))
      ord.join(first, Seq("o_custkey"))
        .groupBy(col("__m0").as("cohort_month"),
          (col("__m") - col("__m0")).as("offset_months"))
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("revenue"))
        .orderBy(col("cohort_month"), col("offset_months"))
    }),

    // TPC-H Q3 (shipping priority): the canonical 3-table selective
    // join-agg-topk — filters push to all three scans, the aggregate
    // is keyed on the join key, the top-10 is TakeOrdered.
    "q214_tpch_q3" -> ((s, d) => {
      val cut = lit("1998-01-01").cast("timestamp")
      T(s, d, "lineitem").filter(col("l_shipdate") > cut)
        .join(T(s, d, "orders").filter(col("o_orderdate") < cut),
          col("l_orderkey") === col("o_orderkey"))
        .join(T(s, d, "customer").filter(col("c_mktsegment") === "BUILDING"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5 (local-supplier revenue): the 6-table star with the
    // c_nationkey = s_nationkey co-location condition; region/nation
    // broadcast, the fact-side joins stay keyed.
    "q215_tpch_q5" -> ((s, d) => {
      val y0 = lit("1996-01-01").cast("timestamp")
      val y1 = lit("1997-01-01").cast("timestamp")
      T(s, d, "lineitem")
        .join(T(s, d, "orders")
            .filter(col("o_orderdate") >= y0 && col("o_orderdate") < y1),
          col("l_orderkey") === col("o_orderkey"))
        .join(T(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(T(s, d, "supplier"),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(T(s, d, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(T(s, d, "region").filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // TPC-H Q10 (returned-item customers): lost revenue per customer
    // over one quarter of returns, top 20 — join-agg-topk with the
    // dimension columns carried through the aggregate key.
    "q216_tpch_q10" -> ((s, d) => {
      val y0 = lit("1996-01-01").cast("timestamp")
      val y1 = lit("1996-04-01").cast("timestamp")
      T(s, d, "lineitem").filter(col("l_returnflag") === "R")
        .join(T(s, d, "orders")
            .filter(col("o_orderdate") >= y0 && col("o_orderdate") < y1),
          col("l_orderkey") === col("o_orderkey"))
        .join(T(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(T(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // TPC-H Q18 (large-volume customers): the agg-filter-rejoin shape
    // — a HAVING aggregate over the fact table becomes the semi-side
    // of the enrichment join, then the detail re-aggregates.
    "q217_tpch_q18" -> ((s, d) => {
      val big = T(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("decimal(18,4)")).as("__q"))
        .filter(col("__q") > 150)
        .select(col("l_orderkey").as("__bigkey"))
      T(s, d, "orders")
        .join(big, col("o_orderkey") === col("__bigkey"), "left_semi")
        .join(T(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(T(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"))
        .agg(sum(col("l_quantity").cast("decimal(18,4)")).cast("double")
          .as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),

    // Consecutive-day activity STREAKS (Behavior.activeStreaks): the
    // date-minus-rank island trick on the user partitioning.
    "q211_streaks" -> ((s, d) =>
      graft.ext.Behavior.activeStreaks(T(s, d, "events"), "user_id", "ts")
        .orderBy(col("user_id"))),

    // DEBOUNCE (Behavior.debounce): bursts collapse to island heads —
    // an event survives iff the previous same-(user,type) event is
    // > 60 s older. Reported as surviving counts per type next to the
    // raw counts (the suppression-rate readout).
    "q212_debounce" -> ((s, d) => {
      val ev = T(s, d, "events")
      val kept = graft.ext.Behavior.debounce(ev,
          Seq("user_id", "event_type"), "ts", minGapSeconds = 60L,
          tieCol = "event_id")
        .groupBy(col("event_type")).agg(count(lit(1)).as("n_kept"))
      ev.groupBy(col("event_type")).agg(count(lit(1)).as("n_raw"))
        .join(kept, Seq("event_type"))
        .withColumn("suppressed_ppm",
          expr("((n_raw - n_kept) * 1000000L) div n_raw"))
        .orderBy(col("event_type"))
    }),

    // Deterministic MODE per group (Audit.modeOf): highest count,
    // ties to the smallest value — min(struct) over the (group,value)
    // rollup, never a rank window.
    "q213_mode" -> ((s, d) =>
      graft.ext.Audit.modeOf(T(s, d, "orders"),
          Seq("o_orderstatus"), "o_orderpriority")
        .orderBy(col("o_orderstatus"))),

    // Interval-UNION coverage (Behavior.coveredTime): each event opens
    // a 5-minute window, overlaps merge via gaps-and-islands on the
    // user partitioning, per-user union length in exact seconds — the
    // "minutes of activity" measure that double-counts nothing.
    "q210_covered_time" -> ((s, d) =>
      graft.ext.Behavior.coveredTime(T(s, d, "events"), "user_id", "ts",
          windowSeconds = 300L)
        .orderBy(col("user_id"))),

    // Right-to-be-forgotten across snapshot HISTORY
    // (TableStore.forgetWhere): time travel makes ordinary deletes
    // insufficient, so erasure rewrites EVERY committed version in
    // place — gated on per-version content plus the exact removed
    // count (2 versions × the matching rows).
    "q207_forget" -> ((s, d) => {
      val store = new TableStore(s, "/tmp/graft_store_q207")
      store.drop("cust_hist")
      val c = T(s, d, "customer")
      store.write("cust_hist", c) // v0
      store.write("cust_hist", c.withColumn("flag", lit(1L))) // v1
      val removed = store.forgetWhere("cust_hist", col("c_custkey") % 7 === 0)
      store.versions("cust_hist").map { v =>
        store.readVersion("cust_hist", v)
          .agg(count(lit(1)).as("n"), dsum(col("c_acctbal")).as("bal"))
          .select(lit(v.toLong).as("version"), col("n"), col("bal"),
            lit(removed).as("n_removed"))
      }.reduce(_ unionByName _).orderBy(col("version"))
    }),

    // FUNCTIONAL-DEPENDENCY audit (Audit.functionalDependencies):
    // three fixture relations profiled for determinant→dependent
    // integrity — one lhs-keyed aggregate per dependency.
    "q208_fd_audit" -> ((s, d) =>
      graft.ext.Audit.functionalDependencies(T(s, d, "nation"),
          Seq(("n_nationkey", "n_regionkey")))
        .unionByName(graft.ext.Audit.functionalDependencies(T(s, d, "customer"),
          Seq(("c_nationkey", "c_mktsegment"), ("c_custkey", "c_nationkey"))))
        .unionByName(graft.ext.Audit.functionalDependencies(T(s, d, "orders"),
          Seq(("o_orderkey", "o_custkey"))))
        .orderBy(col("dependency"))),

    // CANDIDATE-KEY discovery (Audit.candidateKeys): declared column
    // sets checked for row-identifying uniqueness — one distinct
    // aggregate per set.
    "q209_keys" -> ((s, d) =>
      graft.ext.Audit.candidateKeys(T(s, d, "customer"), Seq(
          Seq("c_custkey"), Seq("c_name"),
          Seq("c_nationkey", "c_mktsegment")))
        .orderBy(col("key_cols"))),

    // Classifier CALIBRATION table (the reliability diagram a quality
    // model ships with): the q113 scores cut into deciles by the
    // distributed exact NTILE, per-decile positive rate against an
    // arithmetic label — monotone rates = usable ranking. Min/max
    // score are order statistics (deterministic doubles); no score
    // sums ever cross engines.
    "q205_calibration" -> ((s, d) => {
      val scored = TextOps.linearModelScore(docsSpread(s, d), "doc_id",
          "text", TextOps.syntheticWeights(s, buckets = 64), buckets = 64)
        .withColumn("label", when(col("doc_id") % 3 === 0, 1L).otherwise(0L))
        .withColumn("__g", lit(1))
        // the NTILE cut reads its input twice (eager quantile probe +
        // ranked pass) — don't hash the corpus features twice
        .localCheckpoint(true)
      graft.ext.Sampling.ntileByKey(scored, "__g", "score", "doc_id", tiles = 10)
        .groupBy(col("tile").cast("long").as("decile"))
        .agg(count(lit(1)).as("n"), sum(col("label")).as("n_pos"),
          min(col("score")).as("min_score"), max(col("score")).as("max_score"))
        .withColumn("pos_rate_ppm", expr("(n_pos * 1000000L) div n"))
        .orderBy(col("decile"))
    }),

    // Threshold SWEEP confusion matrix (Audit.binaryConfusion) over
    // the q113 scores: tp/fp/fn/tn + floor-ppm precision/recall/F1
    // (F1 in its tp-form — one integer division, engine-exact).
    "q206_confusion" -> ((s, d) => {
      val scored = TextOps.linearModelScore(docsSpread(s, d), "doc_id",
          "text", TextOps.syntheticWeights(s, buckets = 64), buckets = 64)
        .withColumn("label", when(col("doc_id") % 3 === 0, 1L).otherwise(0L))
      graft.ext.Audit.binaryConfusion(scored, "score", "label",
          thresholdsMilli = Seq(-100L, 0L, 100L))
        .orderBy(col("threshold_milli"))
    }),

    // Retrieval-quality EVALUATION (MRR / hit@k / recall@k) of the
    // q131 BM25 ranker against an arithmetic relevance set — the
    // metrics are floor-integer ppm, the ranking is the IEEE-replayed
    // score order, so the whole eval harness is oracle-exact. One
    // ranked top-20 per query term; all metric aggregates run over
    // those 20 rows + one broadcast corpus-relevance count.
    "q199_retrieval_eval" -> ((s, d) => {
      val docs = docsSpread(s, d)
      val nRel = docs.filter(col("doc_id") % 10 === 3)
        .agg(count(lit(1)).as("__nrel"))
      val terms = Seq("data", "model", "learning")
      terms.map { t =>
        val ranked = TextOps.bm25Rank(docs, "doc_id", "text", Seq(t),
            topK = 20, logIdf = false)
          .select(col("doc_id"),
            row_number().over(Window.orderBy(col("score").desc, col("doc_id")))
              .cast("long").as("rank"))
        ranked.withColumn("__rel", col("doc_id") % 10 === 3)
          .agg(
            min(when(col("__rel"), col("rank"))).as("first_rel_rank"),
            sum(when(col("__rel") && col("rank") <= 10, 1L).otherwise(0L))
              .as("hits_at_10"),
            sum(when(col("__rel"), 1L).otherwise(0L)).as("hits_at_20"))
          .crossJoin(broadcast(nRel))
          .select(lit(t).as("term"), col("first_rel_rank"),
            coalesce(expr("1000000 div first_rel_rank"), lit(0L)).as("rr_ppm"),
            col("hits_at_10"), col("hits_at_20"),
            expr("(hits_at_20 * 1000000) div __nrel").as("recall_at_20_ppm"))
      }.reduce(_ unionByName _).orderBy(col("term"))
    }),

    // Snapshot COMPACTION round trip (TableStore.compact): the orders
    // table written as a deliberately fragmented snapshot (50-row
    // files), compacted into a fresh version, and read back through
    // the store — the oracle is the raw table, so "layout-only
    // rewrite" is gated on content, not trusted. File-count shrinkage
    // is pinned in DdlAndStoreSpec.
    "q204_compaction" -> ((s, d) => {
      val store = new TableStore(s, "/tmp/graft_store_q204")
      store.drop("orders_frag") // deterministic v0/v1 history per run
      // 1000-row files: fragmented enough to make compaction real
      // (sf0.1: ~150 files) without the write itself dominating the
      // contract (50-row files cost ~28 s of pure file overhead)
      store.write("orders_frag", T(s, d, "orders"), maxRecordsPerFile = 1000L)
      store.compact("orders_frag", maxRecordsPerFile = 1000000L)
      store.read("orders_frag")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"),
          min(col("o_orderkey")).as("min_key"), max(col("o_orderkey")).as("max_key"))
        .orderBy(col("o_orderstatus"))
    }),

    // Declarative data-CONTRACT validation (Deequ-style): five
    // row-level checks in ONE scan (each a conditional count inside a
    // single aggregate) plus one key-group aggregate for uniqueness.
    "q196_constraints" -> ((s, d) => {
      import graft.ext.Audit.{Check => C}
      graft.ext.Audit.checkConstraints(T(s, d, "orders"), Seq(
          C.notNull("o_custkey"),
          C.inRange("o_totalprice", 0.0, 600000.0),
          C.inSet("o_orderstatus", Seq("F", "O", "P")),
          C.matches("o_orderpriority", "^[1-5]-"),
          C.satisfies("date_bounds",
            col("o_orderdate") >= lit("1990-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("2010-01-01").cast("timestamp"))),
        unique = Seq(Seq("o_orderkey")))
        .orderBy(col("constraint"))
    }),

    // Triangle enumeration over the q150 link graph, DEGREE-ORDERED
    // (Suri & Vassilvitskii) so hub nodes can't explode the wedge
    // join; the oracle is the textbook a<b<c three-way self-join on
    // the normalized edge set — exactness of the oriented plan is the
    // point of the contract.
    "q197_triangles" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val e1 = docs.select((col("doc_id") % 101).as("src"),
        ((col("doc_id") * 31 + 7) % 101).as("dst"))
      val e2 = docs.select((col("doc_id") % 101).as("src"),
        ((col("doc_id") * 57 + 13) % 101).as("dst"))
      graft.ext.GraphOps.triangles(e1.unionByName(e2), "src", "dst")
        .orderBy(col("a"), col("b"), col("c"))
    }),

    // RFM segmentation: three distributed exact-NTILE cuts (the q138
    // machinery) over ONE per-customer aggregate — never a global
    // ntile() window over the customer base.
    "q198_rfm" -> ((s, d) =>
      graft.ext.Behavior.rfmSegments(T(s, d, "orders"), "o_custkey",
          "o_orderdate", "o_totalprice", tiles = 5)
        .orderBy(col("o_custkey"))),

    // K-anonymity audit over (nation, segment) quasi-identifiers:
    // group-size histogram + at-risk flag, state = |distinct QI| rows.
    "q200_k_anonymity" -> ((s, d) =>
      graft.ext.Audit.kAnonymity(T(s, d, "customer"),
          Seq("c_nationkey", "c_mktsegment"), k = 5L)
        .orderBy(col("group_size"))),

    // LINEAR multi-touch attribution: each first purchase splits
    // exactly 1e6 ppm across its preceding touches (largest-remainder
    // to the earliest), aggregated per touch type — engine-exact
    // integer credit.
    "q201_attribution" -> ((s, d) =>
      graft.ext.Behavior.linearAttribution(T(s, d, "events"), "user_id",
          "ts", "event_type", convType = "purchase", tieCol = "event_id")
        .orderBy(col("event_type"))),

    // CUPED variance-reduced A/B readout: pre-period counts as the
    // covariate, θ from exact int64 sufficient statistics, sign-split
    // truncating division — bit-identical across engines.
    "q202_cuped" -> ((s, d) =>
      graft.ext.Behavior.cuped(T(s, d, "events"), "user_id", "ts",
          "event_type", splitTs = "2024-01-15 00:00:00")
        .orderBy(col("variant"))),

    // Flesch–Kincaid readability BANDS (milli-grade floor integers,
    // vowel-group syllable proxy): the grade histogram a quality pass
    // reads to kill both anchor-text soup and minified run-ons.
    "q203_readability" -> ((s, d) => {
      val stats = docsSpread(s, d).select(
        (col("doc_id") +: TextOps.readabilityStats(col("text"))): _*)
      stats.filter(col("words") > 0)
        .withColumn("band",
          when(col("fk_grade_milli") < 0, lit(0L))
            .otherwise(least(lit(20L), expr("fk_grade_milli div 1000"))))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("fk_grade_milli")).as("min_grade_milli"),
          max(col("fk_grade_milli")).as("max_grade_milli"))
        .orderBy(col("band"))
    }),

    // Bloom-pruned join (operators.BloomJoin): the big side is
    // filtered against the small side's key bitmap BEFORE the join
    // exchange; false positives are removed by the join itself, so
    // the oracle is the PLAIN join — exactness is structural.
    "q96_bloom_join" -> ((s, d) =>
      graft.operators.BloomJoin.prunedJoin(
        T(s, d, "lineitem"), "l_partkey",
        T(s, d, "part").filter(col("p_size") === 15), "p_partkey",
        numBits = 1 << 16)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("p_brand"))),

    // Gopher-style repetition quality (ext.TextOps.repetitionStats):
    // duplicate-word and duplicate-bigram fractions per document over
    // the literal single-space token stream.
    "q97_repetition" -> ((s, d) =>
      TextOps.repetitionStats(T(s, d, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))),

    // Salted skew join (operators.SkewJoin.saltedJoin): result must be
    // IDENTICAL to the plain equi-join — the salt only re-shards the
    // hot keys (left side salted by full-row hash, right side
    // replicated across the salt range).
    "q98_salted_join" -> ((s, d) => {
      val l = T(s, d, "events").select(col("user_id").as("ck"), col("event_id"))
      val r = T(s, d, "customer").select(col("c_custkey").as("ck"), col("c_mktsegment"))
      graft.operators.SkewJoin.saltedJoin(l, r, Seq("ck"), saltBuckets = 8)
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
        .orderBy(col("c_mktsegment"))
    }),

    // Incremental dedup (ext.Dedup.incrementalExact): new docs plus
    // resubmissions of corpus content under fresh ids — the
    // resubmissions must be dropped by content fingerprint even though
    // their ids are novel; the bloom split must not drop novel docs.
    "q99_incremental_dedup" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val corpus = docs.filter(col("doc_id") % 3 === 0)
      val batch = docs.filter(col("doc_id") % 3 =!= 0)
        .unionByName(corpus.withColumn("doc_id", col("doc_id") + 100000))
      // 2^16 bits is ~39 bits/key at the sf0.1 corpus (~1667 distinct
      // fingerprints) — far past the ~10 bits/key the 1 %-FP rule
      // needs; the API default (2^20) would embed a 16K-long literal
      // per union branch for a fixture-sized corpus — same result,
      // heavier plan
      Dedup.incrementalExact(batch, corpus, "text", bloomBits = 1 << 16)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    // Decontamination (ext.TextOps.contaminatedDocs): every doc
    // sharing a 5-gram with the stand-in benchmark slice (doc_id %
    // 17 = 0) is flagged with its distinct-hit count; benchmark docs
    // flag themselves, cross-doc hits come from shared shingles.
    // (n = 5, not the published 13: fixture docs are ~30-60 words.)
    "q100_decontaminate" -> ((s, d) => {
      val bench = T(s, d, "documents").filter(col("doc_id") % 17 === 0)
      TextOps.contaminatedDocs(docsSpread(s, d), "doc_id", "text",
        bench, "doc_id", "text", n = 5)
        .orderBy(col("doc_id"))
    }),

    // Stratified sampling (ext.Sampling.stratifiedSample, portable):
    // per-lang keep rates — the mixture-targeting knob of a curation
    // pipeline. Thresholds are exact integers, so DuckDB replays the
    // md5 bucket arithmetic bit-for-bit (the q63 recipe, per-stratum).
    "q104_stratified_sample" -> ((s, d) =>
      graft.ext.Sampling.stratifiedSample(T(s, d, "documents"),
        "doc_id", "lang", fractions = Map("en" -> 0.5, "zh" -> 0.25),
        default = 1.0, portable = true)
        .groupBy(col("lang")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("lang"))),

    // Domain mixing (ext.Sampling.mixToProportions): target-weight
    // subsampling under a row budget — en down-samples to its 0.5·300
    // slot, zh's slot exceeds its size (rate caps at 1, keeps all),
    // de keeps ~0.86, unweighted es/fr drop. The oracle recomputes the
    // per-domain IEEE rate arithmetic and the md5 bucket thresholds
    // from the same counts.
    "q111_domain_mix" -> ((s, d) =>
      graft.ext.Sampling.mixToProportions(T(s, d, "documents"),
        "doc_id", "lang",
        weights = Map("en" -> 0.5, "zh" -> 0.3, "de" -> 0.2),
        budget = 300, portable = true)
        .groupBy(col("lang")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("lang"))),

    // Leakage-safe split (ext.Sampling.leakageSafeSplit): near-dup
    // CLUSTERS (winnowing pairs → connected components) are assigned
    // to train/holdout as units, so no near-duplicate ever straddles
    // the split. Oracle = the q83 recursive-CTE closure + the same
    // md5 bucket on cluster_id.
    // Scoped to the even-id half of the corpus: the pair machinery is
    // already fully gated by q61/q83 on the whole table, so q105 pays
    // for the SPLIT semantics, not a third full winnowing run.
    "q105_leakage_split" -> ((s, d) => {
      val docs = T(s, d, "documents").filter(col("doc_id") % 2 === 0)
      val pairs = Dedup.winnowingNearDups(docs, "doc_id", "text",
        k = 5, window = 4, minShared = 3, portable = true)
      graft.ext.Sampling.leakageSafeSplit(docs.select(col("doc_id")),
        "doc_id", pairs, "a", "b", trainFraction = 0.8, portable = true)
        .orderBy(col("doc_id"))
    }),

    // Incremental NEAR-dup (ext.Dedup.incrementalNearDups): the LSH
    // analogue of q99 — batch docs that are light REWRITES of corpus
    // content (first word dropped, new ids) must be caught by
    // signature similarity even though their fingerprints differ;
    // cross-set candidates only. Oracle replays the per-side pipeline.
    // The rewrite-id offset is DERIVED (max(doc_id) + 1) so rewrite ids
    // can never collide with real ids at any fixture size — an id
    // collision would make the LSH path MERGE the colliding docs'
    // shingles while the oracle kept them separate (r6 verdict noted
    // the previous fixed +100000 assumed max(doc_id) < 100000).
    "q107_incremental_neardup" -> ((s, d) => {
      val docs = T(s, d, "documents")
      val offset = docs.agg(max(col("doc_id"))).head().getLong(0) + 1L
      val corpus = docs.filter(col("doc_id") % 3 === 0)
      val batch = docs.filter(col("doc_id") % 3 =!= 0)
        .unionByName(corpus
          .withColumn("doc_id", col("doc_id") + offset)
          .withColumn("text", regexp_replace(col("text"), "^[^ ]+ ", "")))
      Dedup.incrementalNearDups(batch, corpus, "doc_id", "text",
        threshold = 0.5, k = 16, bands = 4, shingleN = 3, portable = true)
        .orderBy(col("a"), col("b"))
    }),

    // ---------------------------------------- D1 multi-namespace addressing
    // The reference binds one Postgres schema per Database handle
    // (main.py:39-46 schema='public') but can address and probe other
    // schemas (main.py:67-69 explicit-schema exists). Here: two
    // namespaces under one root carry a same-named table with different
    // contents; the PUBLIC-bound handle lists/probes/reads the staging
    // namespace via `staging.geo` and the explicit-schema overload.
    // region/nation are SF-invariant (5/25 rows), so every fact is
    // fixture-replayable.
    "q109_namespaces" -> ((s, d) => {
      import s.implicits._
      import graft.core.ColumnSpec
      import org.apache.spark.sql.types.{LongType, StringType}
      val rootPath = java.nio.file.Files.createTempDirectory("graft-ns")
      val dbPub = new graft.Database(s, rootPath.toString)
      val dbStg = new graft.Database(s, rootPath.toString, namespace = "staging")
      val specs = Seq(ColumnSpec("geo_id", LongType), ColumnSpec("geo_name", StringType))
      dbPub.createTable("geo", specs, primaryKey = Seq("geo_id"))
      dbStg.createTable("geo", specs, primaryKey = Seq("geo_id"))
      dbPub.upsert("geo", T(s, d, "region")
        .select(col("r_regionkey").cast("long").as("geo_id"),
          col("r_name").as("geo_name")), pk = Seq("geo_id"))
      // qualified addressing WRITES across namespaces too
      dbPub.upsert("staging.geo", T(s, d, "nation")
        .select(col("n_nationkey").cast("long").as("geo_id"),
          col("n_name").as("geo_name")), pk = Seq("geo_id"))
      val facts = Seq(
        ("exists:geo", dbPub.checkTableExists("geo").toString),
        ("exists:staging.geo", dbPub.checkTableExists("staging.geo").toString),
        ("exists:geo@staging", dbPub.checkTableExists("geo", "staging").toString),
        ("exists:missing.geo", dbPub.checkTableExists("missing.geo").toString),
        ("count:public", dbPub.getTableCount("geo").toString),
        ("count:staging", dbPub.getTableCount("staging.geo").toString),
        ("tables:public", dbPub.getTables.mkString(",")),
        ("tables:staging", dbPub.getTables("staging").mkString(","))) ++
        // cross-namespace READ through the public handle
        dbPub.getTable("staging.geo").filter(col("geo_id") < 5)
          .collect().map(r => (s"row:${r.getLong(0)}", r.getString(1))).toSeq
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(rootPath)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .iterator().asScala.foreach(p => java.nio.file.Files.deleteIfExists(p))
      facts.toDF("kind", "name").orderBy(col("kind"), col("name"))
    }),

    // ---------------------------------------- D16 autoincrement ASSIGNMENT
    // The reference's insert-without-id flow (main.py:33, SQLAlchemy
    // autoincrement = server-assigned ids): batch 1 carries NO id column
    // at all → dense ids 1..n in (name, bal) order; batch 2 mixes an
    // explicit-id update (COALESCE keeps its old bal) with two NULL-id
    // inserts that continue the sequence from the table max. The oracle
    // replays the sequence with row_number() + max-offset.
    "q108_autoincrement" -> ((s, d) => {
      import s.implicits._
      import graft.core.ColumnSpec
      import org.apache.spark.sql.types.{DoubleType, LongType, StringType}
      val rootPath = java.nio.file.Files.createTempDirectory("graft-auto")
      val db = new graft.Database(s, rootPath.toString)
      db.createTable("acct", Seq(
        ColumnSpec("id", LongType, nullable = false, autoincrement = true),
        ColumnSpec("name", StringType),
        ColumnSpec("bal", DoubleType)), primaryKey = Seq("id"))
      val b1 = T(s, d, "customer").filter(col("c_custkey") <= 20)
        .select(col("c_name").as("name"), col("c_acctbal").as("bal"))
      db.upsert("acct", b1, pk = Seq("id"))
      val b2 = Seq(
        (Some(3L), "patched", Option.empty[Double]),
        (Option.empty[Long], "aa-new", Some(2.5)),
        (Option.empty[Long], "zz-new", Some(1.5)))
        .toDF("id", "name", "bal")
      db.upsert("acct", b2, pk = Seq("id"))
      val out = db.getTable("acct").orderBy(col("id"))
      // freeze driver-side (22 rows) before deleting the store root —
      // the returned frame must not depend on the temp snapshot files
      import scala.jdk.CollectionConverters._
      val frozen = s.createDataFrame(out.collect().toSeq.asJava, out.schema)
      java.nio.file.Files.walk(rootPath)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .iterator().asScala.foreach(p => java.nio.file.Files.deleteIfExists(p))
      frozen
    }),

    // PII scrub (ext.TextOps.scrubPii): Dolma/C4-style masking. The
    // fixture has no natural PII, so the query deterministically
    // injects an email+URL+IP tail into every 7th doc and the oracle
    // replays injection, per-type counts, and the staged scrub
    // character-for-character (portable regex subset, global replace).
    "q106_pii_scrub" -> ((s, d) => {
      val inj = T(s, d, "documents").select(col("doc_id"),
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com via http://site"), col("doc_id").cast("string"),
            lit(".example/page or 10.0.0."), (col("doc_id") % 250).cast("string")))
          .otherwise(col("text")).as("text"))
      val (ne, nu, ni) = TextOps.piiCounts(col("text"))
      inj.select(col("doc_id"), ne.as("n_email"), nu.as("n_url"), ni.as("n_ip"),
        md5(TextOps.scrubPii(col("text"))).as("scrubbed_md5"))
        .orderBy(col("doc_id"))
    }),

    // ------------------------------------------------ D9/D16 DDL contract
    // create-with-constraints → store round trip → read-back →
    // validateUnique (reference database/main.py:119-170 create_table
    // with primary_key/unique_columns, main.py:28-37 ColumnModel).
    // Every fact is a driver-side value (the q90 recipe): typed specs
    // carry default/autoincrement/FK metadata into the created schema,
    // the composite PK survives the parquet round trip, re-create over
    // an existing table evolves additively, and checkfirst=False on an
    // existing table throws instead of silently replacing.
    "q101_ddl_constraints" -> ((s, d) => {
      import s.implicits._
      import graft.core.{ColumnSpec, Ddl}
      import org.apache.spark.sql.types.{LongType, StringType}
      val rootPath = java.nio.file.Files.createTempDirectory("graft-ddl")
      val db = new graft.Database(s, rootPath.toString)
      val specs = Seq(
        ColumnSpec("region", StringType, nullable = false),
        ColumnSpec("order_id", LongType, nullable = false),
        ColumnSpec("status", StringType, default = Some("new")),
        ColumnSpec("cust_id", LongType, foreignKey = Some("customer.c_custkey")),
        ColumnSpec("seq", LongType, autoincrement = true))
      db.createTable("ord", specs, primaryKey = Seq("region", "order_id"),
        uniqueColumns = Seq("seq"))
      // constraint metadata read back THROUGH the store (parquet round
      // trip), not from the in-memory specs
      val created = db.getTable("ord").schema
      val metaFacts = created.fields.flatMap { f =>
        val m = f.metadata
        Seq(
          if (m.contains("primary_key")) Some(("pk", f.name)) else None,
          if (m.contains("unique")) Some(("unique", f.name)) else None,
          if (m.contains("default")) Some((s"default:${f.name}", m.getString("default"))) else None,
          if (m.contains("autoincrement")) Some(("autoincrement", f.name)) else None,
          if (m.contains("foreign_key")) Some((s"fk:${f.name}", m.getString("foreign_key"))) else None
        ).flatten
      }.toSeq
      val existsErr =
        try { db.createTable("ord", specs, checkExisting = false); "none" }
        catch { case _: IllegalStateException => "thrown" }
      val batch = Seq(
        ("EU", 1L, "new", 10L, 1L),
        ("EU", 2L, "paid", 11L, 2L),
        ("US", 1L, "new", 12L, 3L))
        .toDF("region", "order_id", "status", "cust_id", "seq")
      db.upsert("ord", batch, pk = Seq("region", "order_id"), validatePk = true)
      // re-create over the existing table: additive evolution only
      db.createTable("ord", specs :+ ColumnSpec("note", StringType),
        primaryKey = Seq("region", "order_id"))
      val t = db.getTable("ord")
      val rows = metaFacts ++
        Seq(
          ("count", db.getTableCount("ord").toString),
          ("create_existing", existsErr),
          ("pk_valid", Ddl.validateUnique(t, Seq("region", "order_id")).toString),
          ("status_unique", Ddl.validateUnique(t, Seq("status")).toString)) ++
        db.getTableColumns("ord").map(("column", _))
      val out = rows.toDF("kind", "name").orderBy(col("kind"), col("name"))
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(rootPath)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .iterator().asScala.foreach(p => java.nio.file.Files.deleteIfExists(p))
      out
    }),

    // ------------------------------------------------ S3 REST catalog
    // list-objects + per-object describe→schema over the deterministic
    // fake org (reference salesforce/main.py:91-100 get_sobjects +
    // describe): the remote catalog surfaced as (object, position,
    // field, Spark type) rows.
    "q102_rest_catalog" -> ((s, d) => {
      import s.implicits._
      import graft.sources.rest.RestOps
      val opts = Map("object" -> "account", "org" -> "catverify",
        "numRecords" -> "10", "seed" -> "42")
      RestOps.listObjects(opts).flatMap { o =>
        RestOps.read(s, opts + ("object" -> o)).schema.fields.zipWithIndex
          .map { case (f, i) => (o, i.toLong, f.name, f.dataType.simpleString) }
      }.toDF("obj", "pos", "field", "dtype").orderBy(col("obj"), col("pos"))
    }),

    // ------------------------------------------------ S5 quota probe
    // limits before/after a full two-phase scan (reference
    // salesforce/main.py:102-104 DailyApiRequests): the scan's API
    // spend is deterministic — 1 describe (schema inference) + 1 id
    // cursor query + ceil(400/100) = 4 id-batch fetches = 6 calls.
    // The aggregate reads a real column so column pruning keeps the
    // fetch column list non-empty (an empty list would re-describe per
    // partition and change the arithmetic).
    "q103_rest_limits" -> ((s, d) => {
      import s.implicits._
      import graft.sources.rest.{FakeTransport, RestOps}
      val opts = Map("object" -> "account", "org" -> "limitsverify",
        "numRecords" -> "400", "seed" -> "42")
      FakeTransport.CallLog.clear()
      val before = RestOps.limits(opts)
      val scanned = RestOps.read(s, opts)
        .agg(count(col("Id"))).head().getLong(0)
      val after = RestOps.limits(opts)
      Seq(
        ("max", before("DailyApiRequests.Max").toString),
        ("remaining_before", before("DailyApiRequests.Remaining").toString),
        ("remaining_after", after("DailyApiRequests.Remaining").toString),
        ("rows_scanned", scanned.toString))
        .toDF("metric", "value").orderBy(col("metric"))
    })
  )

  // =====================================================================
  // oracle SQL (DuckDB dialect; table names = fixture parquet views)
  // =====================================================================

  def oracleSql: Map[String, String] = Map(
    "q01_count" -> "SELECT count(*) AS cnt FROM lineitem",

    "q02_count_min_max" ->
      "SELECT count(*) AS cnt, min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship FROM lineitem",

    "q03_pred_eq" ->
      "SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey",

    "q04_pred_in" ->
      "SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem WHERE l_returnflag IN ('A','R') ORDER BY l_orderkey, l_linenumber",

    "q05_pred_notin" ->
      "SELECT o_orderstatus, count(*) AS cnt FROM orders WHERE o_orderstatus NOT IN ('F','P') GROUP BY o_orderstatus ORDER BY o_orderstatus",

    "q06_pred_like" ->
      "SELECT p_partkey, p_name, p_type FROM part WHERE p_name LIKE '%widget%' ORDER BY p_partkey",

    "q07_pred_notlike" ->
      "SELECT p_partkey, p_name FROM part WHERE p_name NOT LIKE '%o%' ORDER BY p_partkey",

    "q08_pred_isnull" ->
      "SELECT count(*) AS cnt FROM orders WHERE (CASE WHEN o_orderstatus = 'F' THEN NULL ELSE o_orderstatus END) IS NULL",

    "q09_pred_isnotnull" ->
      "SELECT st, count(*) AS cnt FROM (SELECT CASE WHEN o_orderstatus = 'F' THEN NULL ELSE o_orderstatus END AS st FROM orders) t WHERE st IS NOT NULL GROUP BY st ORDER BY st",

    "q10_pred_between" ->
      "SELECT l_returnflag, count(*) AS cnt FROM lineitem WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31' GROUP BY l_returnflag ORDER BY l_returnflag",

    "q11_pred_notbetween" ->
      "SELECT l_linestatus, count(*) AS cnt, CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty FROM lineitem WHERE l_quantity NOT BETWEEN 10 AND 40 GROUP BY l_linestatus ORDER BY l_linestatus",

    "q12_pred_passthrough" ->
      "SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 1000 AND c_acctbal <= 9000 AND c_nationkey != 3 ORDER BY c_custkey",

    "q13_pred_regexp" ->
      "SELECT p_partkey, p_name FROM part WHERE regexp_matches(p_name, '^[bc].*t$') ORDER BY p_partkey",

    "q14_get_pipeline" ->
      "SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderstatus = 'O' ORDER BY o_totalprice DESC, o_orderkey LIMIT 20 OFFSET 5",

    "q15_topk" ->
      "SELECT c_custkey, c_name, c_acctbal FROM customer ORDER BY c_acctbal DESC, c_custkey LIMIT 10",

    "q16_upsert_coalesce" ->
      """WITH u AS (
        |  SELECT c_custkey, CAST(NULL AS VARCHAR) AS c_name, c_nationkey, c_acctbal + 100 AS c_acctbal, c_mktsegment
        |  FROM customer WHERE c_custkey % 7 = 0
        |  UNION ALL
        |  SELECT c_custkey + 10000000, 'new-' || CAST(c_custkey AS VARCHAR), 0, 0.0, 'NEW'
        |  FROM customer WHERE c_custkey % 11 = 0)
        |SELECT coalesce(u.c_custkey, t.c_custkey) AS c_custkey,
        |  coalesce(u.c_name, t.c_name) AS c_name,
        |  coalesce(u.c_nationkey, t.c_nationkey) AS c_nationkey,
        |  coalesce(u.c_acctbal, t.c_acctbal) AS c_acctbal,
        |  coalesce(u.c_mktsegment, t.c_mktsegment) AS c_mktsegment
        |FROM customer t FULL OUTER JOIN u ON t.c_custkey = u.c_custkey
        |ORDER BY c_custkey""".stripMargin,

    "q17_upsert_overwrite" ->
      """WITH u AS (
        |  SELECT c_custkey, CAST(NULL AS VARCHAR) AS c_name, c_nationkey, c_acctbal + 100 AS c_acctbal, c_mktsegment
        |  FROM customer WHERE c_custkey % 7 = 0)
        |SELECT coalesce(u.c_custkey, t.c_custkey) AS c_custkey,
        |  CASE WHEN u.c_custkey IS NOT NULL THEN u.c_name ELSE t.c_name END AS c_name,
        |  CASE WHEN u.c_custkey IS NOT NULL THEN u.c_nationkey ELSE t.c_nationkey END AS c_nationkey,
        |  CASE WHEN u.c_custkey IS NOT NULL THEN u.c_acctbal ELSE t.c_acctbal END AS c_acctbal,
        |  CASE WHEN u.c_custkey IS NOT NULL THEN u.c_mktsegment ELSE t.c_mktsegment END AS c_mktsegment
        |FROM customer t FULL OUTER JOIN u ON t.c_custkey = u.c_custkey
        |ORDER BY c_custkey""".stripMargin,

    "q18_update_keyed" ->
      """WITH u AS (
        |  SELECT c_custkey, 'UPDATED' AS c_mktsegment, c_acctbal * 2 AS c_acctbal
        |  FROM customer WHERE c_nationkey = 5)
        |SELECT t.c_custkey, t.c_name, t.c_nationkey,
        |  CASE WHEN u.c_custkey IS NOT NULL THEN u.c_acctbal ELSE t.c_acctbal END AS c_acctbal,
        |  CASE WHEN u.c_custkey IS NOT NULL THEN u.c_mktsegment ELSE t.c_mktsegment END AS c_mktsegment
        |FROM customer t LEFT JOIN u ON t.c_custkey = u.c_custkey
        |ORDER BY t.c_custkey""".stripMargin,

    "q19_delete_pred" ->
      "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE NOT (o_totalprice BETWEEN 50000 AND 200000 AND o_orderstatus = 'F') ORDER BY o_orderkey",

    "q20_sql_q1" -> Q1Sql,
    "q21_sql_q3" -> Q3Sql,
    "q56_sql_q5" -> Q5Sql,
    "q70_sql_exists" -> ExistsSql,
    "q71_sql_custdist" -> CustDistSql,
    "q72_sql_having_global" -> HavingGlobalSql,
    "q73_sql_not_exists" -> NotExistsSql,
    "q64_sql_q6" -> Q6Sql,
    "q65_sql_q12" -> Q12Sql,
    "q66_sql_q14" -> Q14Sql,
    "q57_subquery_corr" -> SubquerySql,
    "q58_grouping_sets" -> GroupingSetsSql,

    "q22_join_star" ->
      """SELECT r_name, n_name, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "q23_join_semi" ->
      "SELECT c_custkey, c_name FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) ORDER BY c_custkey",

    "q24_join_anti" ->
      "SELECT c_custkey, c_name FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) ORDER BY c_custkey",

    "q25_window_rank" ->
      "SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders) t WHERE rn <= 3 ORDER BY o_custkey, rn",

    "q26_window_lag" ->
      "SELECT o_custkey, o_orderkey, lag(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev_price, lead(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS next_price FROM orders ORDER BY o_custkey, o_orderkey",

    "q27_window_frame" ->
      "SELECT o_custkey, o_orderkey, CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (PARTITION BY o_custkey ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total FROM orders ORDER BY o_custkey, o_orderkey",

    "q28_agg_stats" ->
      """SELECT l_returnflag, count(*) AS cnt, count(DISTINCT l_orderkey) AS n_orders,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(l_quantity) AS avg_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q29_agg_rollup" ->
      """SELECT r_name, n_name, count(*) AS cnt,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,

    "q30_agg_cube" ->
      "SELECT o_orderstatus, o_orderpriority, count(*) AS cnt FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority) ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST",

    "q31_set_ops" ->
      """SELECT k FROM (
        |  SELECT k FROM (
        |    SELECT c_custkey AS k FROM customer WHERE c_nationkey IN (1,2,3)
        |    UNION
        |    SELECT o_custkey AS k FROM orders WHERE o_totalprice > 300000)
        |  INTERSECT SELECT c_custkey AS k FROM customer WHERE c_acctbal > 0
        |  EXCEPT SELECT c_custkey AS k FROM customer WHERE c_nationkey = 2
        |) t ORDER BY k""".stripMargin,

    "q32_scalar_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(year(l_shipdate) AS BIGINT) AS y, CAST(month(l_shipdate) AS BIGINT) AS m,
        |  upper(l_returnflag) AS rf, substring(l_linestatus, 1, 1) AS ls,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        |  CAST(length(l_returnflag || '-' || l_linestatus) AS BIGINT) AS strlen
        |FROM lineitem WHERE l_orderkey % 100 = 0 ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q33_date_window" ->
      "WITH mx AS (SELECT max(ts) AS m FROM events) SELECT event_type, count(*) AS cnt FROM events, mx WHERE ts >= m - INTERVAL 7 DAY GROUP BY event_type ORDER BY event_type",

    "q34_json_extract" ->
      "SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod, count(*) AS cnt FROM events GROUP BY k_mod ORDER BY k_mod",

    // same nested document, decoded with DuckDB's JSON path functions
    // (object field, array-of-struct index, array length)
    "q80_nested_json" ->
      """WITH j AS (
        |  SELECT event_id,
        |    '{"meta":{"user":' || user_id || ',"type":"' || event_type ||
        |    '"},"readings":[{"dim":"val","v":' || CAST(floor(value) AS BIGINT) ||
        |    '},{"dim":"k","v":' || CAST(json_extract_string(props, '$.k') AS BIGINT) ||
        |    '}]}' AS doc
        |  FROM events)
        |SELECT event_id,
        |  CAST(json_extract(doc, '$.meta.user') AS BIGINT) AS user_id,
        |  json_extract_string(doc, '$.meta.type') AS etype,
        |  CAST(json_extract(doc, '$.readings[0].v') AS BIGINT) AS v0,
        |  CAST(json_extract(doc, '$.readings[1].v') AS BIGINT) AS v1,
        |  CAST(json_array_length(doc, '$.readings') AS BIGINT) AS n_readings
        |FROM j ORDER BY event_id""".stripMargin,

    "q35_incremental_pull" ->
      "SELECT event_id, user_id, event_type, value FROM events WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20' ORDER BY event_id",

    "q36_asof_join" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        |  FROM orders GROUP BY o_custkey, o_orderdate)
        |SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate
        |FROM events e ASOF LEFT JOIN o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        |ORDER BY e.event_id""".stripMargin,

    "q67_event_enrichment" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        |  FROM orders GROUP BY o_custkey, o_orderdate),
        |e AS (
        |  SELECT event_id, user_id, ts,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events),
        |j AS (
        |  SELECT e.event_id, e.user_id, e.ts, e.k, o.o_orderkey
        |  FROM e ASOF LEFT JOIN o
        |    ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate)
        |SELECT event_id, user_id, k, o_orderkey,
        |  count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_events
        |FROM j ORDER BY event_id""".stripMargin,

    "q37_tumbling_hour" ->
      "SELECT date_trunc('hour', ts) AS window_start, event_type, count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value FROM events GROUP BY 1, 2 ORDER BY 1, 2",

    "q38_sessionize" ->
      """WITH f AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |    THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM f)
        |SELECT user_id, session_id, count(*) AS n_events FROM s
        |GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,

    "q39_dedup_exact" ->
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        |  min(doc_id) AS keeper, count(*) AS n_dups
        |FROM documents GROUP BY 1 ORDER BY keeper""".stripMargin,

    "q40_dedup_keep_latest" ->
      "SELECT user_id, event_id, event_type FROM (SELECT user_id, event_id, event_type, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn FROM events) t WHERE rn = 1 ORDER BY user_id",

    "q41_text_stats" ->
      s"""WITH tk AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS tokens
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS tok_ws,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS BIGINT) AS tok_bpe,
        |  CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS BIGINT) AS n_punct,
        |  CAST(len(list_filter(tokens, x -> list_contains([$Stop20], x))) AS BIGINT) AS n_stop,
        |  CASE WHEN len(tokens) = 0 THEN 0.0 ELSE CAST(len(list_filter(tokens, x -> list_contains([$Stop20], x))) AS DOUBLE) / CAST(len(tokens) AS DOUBLE) END AS stop_ratio
        |FROM tk ORDER BY doc_id""".stripMargin,

    "q42_text_quality" ->
      s"""WITH tk AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) AS len_score,
        |    CASE WHEN len(tokens) = 0 THEN 0.0 ELSE CAST(len(list_filter(tokens, x -> list_contains([$Stop20], x))) AS DOUBLE) / CAST(len(tokens) AS DOUBLE) END AS stop_ratio,
        |    CASE WHEN length(text) = 0 THEN 0.0 ELSE CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE) END AS punct_ratio
        |  FROM tk)
        |SELECT doc_id,
        |  greatest(0.0, least(1.0, len_score * 0.5 + least(stop_ratio * 4.0, 1.0) * 0.5 - least(punct_ratio * 2.0, 1.0) * 0.25)) AS quality
        |FROM c ORDER BY doc_id""".stripMargin,

    // Regenerates FakeTransport.gen's records (Transport.scala:96-115)
    // arithmetically: h = (seed·1315423911) xor (i·2654435761); every
    // field is a pure function of h or i, so the connector's output is
    // checkable without the org being a table anywhere.
    "q55_rest_source" ->
      """WITH g AS (
        |  SELECT i, xor(CAST(42 AS BIGINT) * 1315423911, CAST(i AS BIGINT) * 2654435761) AS h
        |  FROM range(0, 2000) t(i)),
        |r AS (
        |  SELECT i,
        |    (['Agriculture', 'Banking', 'Consulting', 'Energy', 'Media', 'Retail'])[CAST(abs(h % 6) AS INTEGER) + 1] AS Industry,
        |    CAST(abs(h % 1000000) AS DOUBLE) / 100.0 AS Amount,
        |    (h % 3 != 0) AS IsActive,
        |    (i % 50 = 49) AS IsDeleted
        |  FROM g)
        |SELECT Industry, count(*) AS cnt,
        |  CAST(sum(CAST(Amount AS DECIMAL(18,4))) AS DOUBLE) AS sum_amount
        |FROM r WHERE IsActive AND Amount > 1000.0
        |GROUP BY Industry ORDER BY Industry""".stripMargin,

    // KMV distinct-count sketch: est = (k-1)/f_k over distinct-value
    // hash fractions; exact count when the group has < k distinct.
    "q76_kmv_distinct" -> KmvDirectOracleSql,
    // per-shard k-min sets merged (dedup, re-sort, keep k smallest)
    // estimate exactly like the direct sketch — the bounded-set merge
    // law; the direct oracle replays verbatim
    "q157_kmv_merge" -> KmvDirectOracleSql,

    // Portable HLL: 56-bit hash → (bucket = low 6 bits, ρ = 51 −
    // bitlength of the top 50), register max per bucket, harmonic sum
    // scaled 2^30 (integer-exact), α₆₄ = 709/1000 as one integer
    // division, linear counting via the same 64-entry table.
    "q91_hll_distinct" -> HllUnionOracleSql,
    // merged per-shard registers estimate EXACTLY like the direct
    // union sketch (max is the lossless HLL merge) — same oracle
    "q152_hll_merge" -> HllUnionOracleSql,

    // Writeback round trip: regenerate the fake org's base records
    // (same arithmetic as q55) and apply q81's update rule — Banking
    // accounts' Amount becomes NumEmployees·1.5 — then aggregate the
    // post-write state the connector reads back.
    "q81_rest_writeback" ->
      """WITH g AS (
        |  SELECT i, xor(CAST(42 AS BIGINT) * 1315423911, CAST(i AS BIGINT) * 2654435761) AS h
        |  FROM range(0, 1000) t(i)),
        |r AS (
        |  SELECT i,
        |    (['Agriculture', 'Banking', 'Consulting', 'Energy', 'Media', 'Retail'])[CAST(abs(h % 6) AS INTEGER) + 1] AS Industry,
        |    CAST(abs(h % 1000000) AS DOUBLE) / 100.0 AS Amount,
        |    abs(h % 10000) AS NumEmployees
        |  FROM g),
        |u AS (
        |  SELECT Industry,
        |    CASE WHEN Industry = 'Banking' THEN NumEmployees * 1.5 ELSE Amount END AS Amount
        |  FROM r)
        |SELECT Industry, count(*) AS cnt,
        |  CAST(sum(CAST(Amount AS DECIMAL(18,4))) AS DOUBLE) AS sum_amount
        |FROM u GROUP BY Industry ORDER BY Industry""".stripMargin,

    // statuses are a pure function of the poisoned/valid input ids:
    // ids 0..9 exist (success), BAD* trips the malformed-id error,
    // 00A9999999 is beyond the 100-record org (not found)
    "q82_rest_write_status" ->
      """SELECT record_id, success, error FROM (
        |  SELECT printf('00A%07d', i) AS record_id, TRUE AS success,
        |    CAST(NULL AS VARCHAR) AS error
        |  FROM range(0, 10) t(i)
        |  UNION ALL SELECT 'BAD0000001', FALSE, 'MALFORMED_ID: BAD0000001'
        |  UNION ALL SELECT '00A9999999', FALSE, 'NOT_FOUND: 00A9999999')
        |ORDER BY record_id""".stripMargin,

    // discrete median of the portable 10% sample (rank ⌈n/2⌉ — an
    // actual data value, no interpolation arithmetic to diverge on)
    "q77_sampled_median" ->
      """WITH s AS (
        |  SELECT l_returnflag, l_extendedprice FROM lineitem
        |  WHERE CAST(concat('0x', substring(md5(concat('42', '|', CAST(l_orderkey AS VARCHAR))), 1, 14)) AS BIGINT) % 1000000 < 100000),
        |r AS (
        |  SELECT l_returnflag, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rk,
        |    count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM s)
        |SELECT l_returnflag, l_extendedprice AS q_est
        |FROM r WHERE rk = greatest(1, CAST(ceil(0.5 * n) AS BIGINT))
        |ORDER BY l_returnflag""".stripMargin,

    "q78_pivot" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
        |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
        |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // wide→long as the explicit UNION ALL the unpivot is sugar for
    "q93_unpivot" ->
      """WITH m AS (
        |  SELECT l_returnflag, 'l_quantity' AS metric, l_quantity AS value FROM lineitem
        |  UNION ALL
        |  SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL
        |  SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
        |  UNION ALL
        |  SELECT l_returnflag, 'l_tax', l_tax FROM lineitem)
        |SELECT l_returnflag, metric,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM m GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q94_string_agg" ->
      """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q79_window_dist" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume
        |FROM lineitem WHERE l_orderkey < 1000
        |WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_extendedprice, l_orderkey, l_linenumber)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q45_minhash_neardup" -> MinhashOracleSql,

    "q46_simhash_neardup" -> SimhashOracleSql,

    "q61_winnowing_neardup" -> WinnowingOracleSql,

    "q84_ann_pq" -> PqOracleSql,

    // the catalog state is fully determined by the DDL sequence —
    // the oracle is the literal expected fact table
    "q90_catalog_ops" ->
      """SELECT * FROM (VALUES
        |  ('alive', 'true'), ('exists:t1', 'true'), ('exists:nope', 'false'),
        |  ('count:t1', '0'), ('view_rows:v_all', '0'),
        |  ('table', 't1'), ('table', 't2'),
        |  ('column:t1', 'id'), ('column:t1', 'v'), ('column:t1', 'quality'),
        |  ('view', 'v_all')) AS t(kind, name)
        |ORDER BY kind, name""".stripMargin,

    "q89_bucketed_join" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Morton interleave replay: same quantizer (integer equi-width)
    // and the same 32 shift/and/or terms, generated from one source
    "q92_zorder" -> {
      val terms = (0 until 16).flatMap(i => Seq(
        s"(((x >> $i) & 1) << ${2 * i})", s"(((y >> $i) & 1) << ${2 * i + 1})"))
      s"""WITH q AS (
        |  SELECT event_id,
        |    CASE WHEN user_id IS NULL THEN NULL
        |         ELSE (least(greatest(CAST(user_id AS BIGINT), 0), 9999) * 65536) // 10000
        |    END AS x,
        |    CASE WHEN event_id IS NULL THEN NULL
        |         ELSE (least(greatest(CAST(event_id AS BIGINT), 0), 65535) * 65536) // 65536
        |    END AS y
        |  FROM events WHERE event_id <= 2000)
        |SELECT event_id, ${terms.mkString(" | ")} AS z
        |FROM q ORDER BY event_id""".stripMargin
    },

    // DuckDB ASOF with <= is the forward direction (nearest following)
    "q88_asof_forward" ->
      """WITH er AS (
        |  SELECT user_id AS err_user, ts AS err_ts, min(event_id) AS err_id
        |  FROM events WHERE event_type = 'error' GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, er.err_id, er.err_ts
        |FROM events e ASOF LEFT JOIN er
        |  ON e.user_id = er.err_user AND e.ts <= er.err_ts
        |ORDER BY e.event_id""".stripMargin,

    // each event belongs to exactly 4 = length/slide windows whose
    // starts step back by the slide from the event's floor slot
    "q87_sliding_window" ->
      """WITH e AS (SELECT epoch_us(ts) AS us, event_type FROM events),
        |x AS (SELECT event_type, us, unnest(range(0, 4)) AS j FROM e),
        |w AS (SELECT event_type,
        |  make_timestamp(us - (us % 1800000000) - j * 1800000000) AS w_start FROM x)
        |SELECT w_start, event_type, count(*) AS n
        |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // the binned equi-join + residual filter must equal the direct
    // theta-join the oracle runs
    "q86_range_join" ->
      """WITH p AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS pd
        |  FROM lineitem WHERE l_orderkey < 300),
        |iv AS (
        |  SELECT o_orderkey,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS lo,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) + 30 AS hi
        |  FROM orders WHERE o_orderkey < 40)
        |SELECT p.l_orderkey, p.l_linenumber, iv.o_orderkey, p.pd, iv.lo
        |FROM p JOIN iv ON p.pd >= iv.lo AND p.pd < iv.hi
        |ORDER BY 1, 2, 3""".stripMargin,

    // log-free tf-idf: tf · (N+1)/(df+1) — the division and multiply
    // are single correctly-rounded IEEE ops, identical in any engine
    "q85_top_terms" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) >= 3)) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |nn AS (SELECT count(*) AS n FROM documents),
        |s AS (
        |  SELECT doc_id, t.term, t.tf, dfc.df,
        |    t.tf * ((n + 1.0) / (dfc.df + 1)) AS score
        |  FROM tf t JOIN dfc USING (term) CROSS JOIN nn),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rk
        |  FROM s)
        |SELECT doc_id, term, tf, df, score
        |FROM r WHERE rk <= 3 ORDER BY doc_id, term""".stripMargin,

    // transitive closure over the symmetric winnowing pairs; min
    // reachable node = the cluster label (matches the Spark fixpoint)
    "q83_dedup_clusters" ->
      s"""WITH RECURSIVE $WinnowingPairsCtes,
        |sym AS (SELECT a AS src, b AS dst FROM p UNION SELECT b, a FROM p),
        |reach AS (
        |  SELECT doc_id AS src, doc_id AS dst FROM documents
        |  UNION
        |  SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src)
        |SELECT src AS doc_id, min(dst) AS cluster_id
        |FROM reach GROUP BY src ORDER BY doc_id""".stripMargin,

    "q48_embed_neardup_lsh" -> SrpOracleSql,

    "q43_lang_id" ->
      s"""WITH tk AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS tokens FROM documents),
        |r AS (
        |  SELECT doc_id,
        |    $LangScoreCols
        |  FROM tk)
        |SELECT $LangArgmaxSql AS lang_pred, count(*) AS cnt
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    // df-capped shingle space: drop shingles with document frequency >
    // 100 before the self-join, recompute set sizes after the cap —
    // mirrors Dedup.ngramJaccardPairs(maxDf = 100) exactly.
    "q44_ngram_jaccard" ->
      """WITH tk AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS tokens FROM documents),
        |sh AS (
        |  SELECT doc_id, CASE WHEN len(tokens) >= 3 THEN list_distinct(list_transform(range(1, len(tokens) - 1), i -> array_to_string(tokens[i:i+2], ' '))) ELSE [] END AS s FROM tk),
        |ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |kept AS (
        |  SELECT doc_id, g FROM (
        |    SELECT doc_id, g, count(*) OVER (PARTITION BY g) AS df FROM ex)
        |  WHERE df <= 100),
        |sized AS (SELECT doc_id, g, count(*) OVER (PARTITION BY doc_id) AS n FROM kept),
        |pairs AS (
        |  SELECT ea.doc_id AS a, eb.doc_id AS b, ea.n AS na, eb.n AS nb, count(*) AS c
        |  FROM sized ea JOIN sized eb ON ea.g = eb.g AND ea.doc_id < eb.doc_id
        |  GROUP BY 1, 2, 3, 4)
        |SELECT a, b, CAST(c AS DOUBLE) / CAST(na + nb - c AS DOUBLE) AS jaccard
        |FROM pairs WHERE CAST(c AS DOUBLE) / CAST(na + nb - c AS DOUBLE) >= 0.5
        |ORDER BY a, b""".stripMargin,

    "q47_embed_neardup" ->
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings WHERE vec_id < 500),
        |n AS (SELECT vec_id, e, sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm FROM v)
        |SELECT a.vec_id AS a, b.vec_id AS b,
        |  list_sum(list_transform(range(1, 65), i -> a.e[i] * b.e[i])) / (a.nrm * b.nrm) AS cosine
        |FROM n a JOIN n b ON a.vec_id < b.vec_id
        |WHERE list_sum(list_transform(range(1, 65), i -> a.e[i] * b.e[i])) / (a.nrm * b.nrm) >= 0.4
        |ORDER BY a, b""".stripMargin,

    // all-pairs twin of the C=1 semantic dedup; cosine in the
    // NORMALIZED-dot form (x/|x| element division, then sum) — the
    // pipeline's arithmetic, not q47's dot/(na*nb)
    "q112_semantic_dedup" ->
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings WHERE vec_id < 500),
        |n AS (SELECT vec_id, e, sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm FROM v),
        |p AS (
        |  SELECT a.vec_id AS a, b.vec_id AS b,
        |    list_sum(list_transform(range(1, 65), i -> (a.e[i] / a.nrm) * (b.e[i] / b.nrm))) AS cosine
        |  FROM n a JOIN n b ON a.vec_id < b.vec_id)
        |SELECT a, b, cosine FROM p WHERE cosine >= 0.4 ORDER BY a, b""".stripMargin,

    // Replays the hashing-trick classifier end to end: unigram+bigram
    // features, 60-bit md5 bucket hash mod 64, the md5-derived integer
    // weight table, integer sum, one final double division.
    "q113_classifier_score" ->
      """WITH tk AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS t FROM documents),
        |uni AS (SELECT doc_id, unnest(t) AS f FROM tk),
        |bi AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])) AS f
        |  FROM tk WHERE len(t) >= 2),
        |feats AS (SELECT doc_id, f FROM uni UNION ALL SELECT doc_id, f FROM bi),
        |hb AS (
        |  SELECT doc_id,
        |    CAST(concat('0x', substring(md5(concat('7', '|', f)), 1, 15)) AS BIGINT) % 64 AS bucket
        |  FROM feats),
        |w AS (
        |  SELECT r.range AS bucket,
        |    (CAST(concat('0x', substring(md5(concat('11', '|', CAST(r.range AS VARCHAR))), 1, 15)) AS BIGINT) % 2001) - 1000 AS weight
        |  FROM range(64) r),
        |agg AS (
        |  SELECT doc_id, sum(weight) AS sw, count(*) AS nf
        |  FROM hb JOIN w USING (bucket) GROUP BY 1)
        |SELECT d.doc_id, coalesce(CAST(agg.sw AS DOUBLE) / CAST(1000 * agg.nf AS DOUBLE), 0.0) AS score
        |FROM documents d LEFT JOIN agg USING (doc_id) ORDER BY d.doc_id""".stripMargin,

    // Replays the span detector: positional 8-grams (lead window),
    // distinct-doc gram frequency, ≥2-doc gate, gaps-and-islands merge
    // of [pos, pos+7] intervals. Integer arithmetic throughout.
    "q114_dup_spans" ->
      s"""WITH $DupSpanCtes
        |SELECT doc_id, span_start, span_end, n_grams
        |FROM sp ORDER BY doc_id, span_start""".stripMargin,

    // Removal half: drop tokens covered by any span, rebuild the text
    // as the ordered space-joined survivors (string_agg ORDER BY ≡
    // sort_array over (pos, tok) structs). Every doc keeps a row.
    "q115_span_removal" ->
      s"""WITH $DupSpanCtes,
        |clean AS (
        |  SELECT tok.doc_id, tok.pos, tok.t FROM tok
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM sp WHERE sp.doc_id = tok.doc_id
        |      AND tok.pos - 1 BETWEEN sp.span_start AND sp.span_end)),
        |agg AS (
        |  SELECT doc_id, string_agg(t, ' ' ORDER BY pos) AS clean_text
        |  FROM clean GROUP BY 1)
        |SELECT d.doc_id, coalesce(a.clean_text, '') AS clean_text
        |FROM documents d LEFT JOIN agg a USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    // Replays the classifier-training count aggregate: same feature
    // CTEs as q113, labels = even doc_id, per-bucket class counts
    // completed over all 64 buckets. Integer arithmetic throughout.
    "q116_train_counts" ->
      """WITH tk AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS t FROM documents),
        |uni AS (SELECT doc_id, unnest(t) AS f FROM tk),
        |bi AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])) AS f
        |  FROM tk WHERE len(t) >= 2),
        |feats AS (SELECT doc_id, f FROM uni UNION ALL SELECT doc_id, f FROM bi),
        |hb AS (
        |  SELECT doc_id,
        |    CAST(concat('0x', substring(md5(concat('7', '|', f)), 1, 15)) AS BIGINT) % 64 AS bucket
        |  FROM feats),
        |agg AS (
        |  SELECT bucket,
        |    CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS pos,
        |    CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS neg
        |  FROM hb GROUP BY 1)
        |SELECT r.range AS bucket, coalesce(pos, CAST(0 AS BIGINT)) AS pos,
        |  coalesce(neg, CAST(0 AS BIGINT)) AS neg
        |FROM range(64) r LEFT JOIN agg ON agg.bucket = r.range
        |ORDER BY bucket""".stripMargin,

    // Replays the hashed-bigram LM scorer: adjacent token pairs (a
    // struct unnest keeps the sides aligned), per-side 60-bit md5
    // bucket hashes, the md5-derived synthetic weight grid, integer
    // sum, one final double division.
    "q117_lm_score" ->
      """WITH tk AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS t FROM documents),
        |bg AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(t)), i -> struct_pack(w1 := t[i], w2 := t[i + 1]))) AS p
        |  FROM tk WHERE len(t) >= 2),
        |hb AS (
        |  SELECT doc_id,
        |    CAST(concat('0x', substring(md5(concat('7', '|', p.w1)), 1, 15)) AS BIGINT) % 64 AS ctx,
        |    CAST(concat('0x', substring(md5(concat('7', '|', p.w2)), 1, 15)) AS BIGINT) % 64 AS tok
        |  FROM bg),
        |w AS (
        |  SELECT c.range AS ctx, k.range AS tok,
        |    -(CAST(concat('0x', substring(md5(concat('13', '|', CAST(c.range AS VARCHAR), '|', CAST(k.range AS VARCHAR))), 1, 15)) AS BIGINT) % 1401) AS weight
        |  FROM range(64) c CROSS JOIN range(64) k),
        |agg AS (
        |  SELECT doc_id, sum(weight) AS sw, count(*) AS nb
        |  FROM hb JOIN w USING (ctx, tok) GROUP BY 1)
        |SELECT d.doc_id, coalesce(CAST(agg.sw AS DOUBLE) / CAST(1000 * agg.nb AS DOUBLE), 0.0) AS lm_score
        |FROM documents d LEFT JOIN agg USING (doc_id) ORDER BY d.doc_id""".stripMargin,

    // Replays the bigram-LM count aggregate on the same hashed pairs.
    "q118_lm_counts" ->
      """WITH tk AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS t FROM documents),
        |bg AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(t)), i -> struct_pack(w1 := t[i], w2 := t[i + 1]))) AS p
        |  FROM tk WHERE len(t) >= 2),
        |hb AS (
        |  SELECT doc_id,
        |    CAST(concat('0x', substring(md5(concat('7', '|', p.w1)), 1, 15)) AS BIGINT) % 64 AS ctx,
        |    CAST(concat('0x', substring(md5(concat('7', '|', p.w2)), 1, 15)) AS BIGINT) % 64 AS tok
        |  FROM bg)
        |SELECT ctx, tok, count(*) AS cnt FROM hb GROUP BY 1, 2
        |ORDER BY ctx, tok""".stripMargin,

    // Replays the paragraph-frequency gate: derived multi-line corpus,
    // per-doc-distinct md5 of non-blank lines, df ≥ 2.
    "q119_dup_paragraphs" ->
      s"""WITH $ParaDedupCtes
        |SELECT para_hash, df FROM hot ORDER BY para_hash""".stripMargin,

    // Removal half: hot lines dropped, text rebuilt as the ordered
    // newline-joined survivors (string_agg ORDER BY ≡ sort_array over
    // (pos, segment) structs). Every doc keeps a row.
    "q120_paragraph_removal" ->
      s"""WITH $ParaDedupCtes,
        |kept AS (
        |  SELECT doc_id, pos, p FROM pp
        |  WHERE md5(p) NOT IN (SELECT para_hash FROM hot)),
        |agg AS (
        |  SELECT doc_id, string_agg(p, chr(10) ORDER BY pos) AS clean_text
        |  FROM kept GROUP BY 1)
        |SELECT d.doc_id, coalesce(a.clean_text, '') AS clean_text
        |FROM d2 d LEFT JOIN agg a USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    // Replays the BPE pair-count aggregate: word counts, then pairs
    // exploded from the word TABLE (vocabulary-sized). Integer
    // arithmetic throughout (DuckDB sum(BIGINT) is HUGEINT — cast).
    "q121_bpe_pair_counts" ->
      """WITH tk AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS t FROM documents),
        |w AS (SELECT unnest(t) AS w FROM tk),
        |wc AS (SELECT w, count(*) AS wc FROM w GROUP BY 1),
        |pr AS (
        |  SELECT wc, unnest(list_transform(range(1, len(w)), i -> substring(w, i, 2))) AS pair
        |  FROM wc WHERE len(w) >= 2)
        |SELECT pair, CAST(sum(wc) AS BIGINT) AS freq
        |FROM pr GROUP BY 1 ORDER BY pair""".stripMargin,

    // Replays the replace-chain BPE encoder term for term: the same
    // fixed merge list as nested replace() calls over the spaced
    // character stream, '|' word-boundary markers filtered at the end.
    "q122_bpe_encode" -> {
      val chain = BpeContractMerges.foldLeft(
        "concat(' ', regexp_replace(array_to_string(t, '|'), '(.)', '\\1 ', 'g'))") {
        case (s, (a, b)) => s"replace($s, ' $a $b ', ' ${a + b} ')"
      }
      s"""WITH tk AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS t FROM documents),
        |enc AS (
        |  SELECT doc_id,
        |    list_filter(string_split(trim($chain), ' '),
        |      x -> x <> '|' AND len(x) > 0) AS syms
        |  FROM tk)
        |SELECT doc_id, CAST(len(syms) AS BIGINT) AS n_bpe,
        |  CAST(len(list_distinct(syms)) AS BIGINT) AS n_types
        |FROM enc ORDER BY doc_id""".stripMargin
    },

    // session_window semantics: new session at gap >= 30min (the
    // half-open [ts, ts+gap) merge rule), session_end = last + gap
    "q123_session_window" ->
      """WITH f AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
        |    THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        |  SELECT user_id, ts, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM f)
        |SELECT user_id, min(ts) AS session_start,
        |  max(ts) + INTERVAL 30 MINUTE AS session_end,
        |  count(*) AS n
        |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin,

    "q124_gopher_quality" ->
      """WITH tk AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS tokens,
        |    CAST(len(regexp_extract_all(text, chr(10))) + 1 AS DOUBLE) AS n_lines
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    CAST(len(tokens) AS BIGINT) AS word_count,
        |    CASE WHEN len(tokens) = 0 THEN 0.0 ELSE CAST(length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS DOUBLE) / CAST(len(tokens) AS DOUBLE) END AS mean_word_len,
        |    CASE WHEN len(tokens) = 0 THEN 0.0 ELSE CAST(len(regexp_extract_all(text, '#')) + len(regexp_extract_all(text, '\.\.\.|…')) AS DOUBLE) / CAST(len(tokens) AS DOUBLE) END AS symbol_ratio,
        |    CAST(len(regexp_extract_all(text, '(?m)^[-*•]')) AS DOUBLE) / n_lines AS bullet_ratio,
        |    CAST(len(regexp_extract_all(text, '(?m)(\.\.\.|…)$')) AS DOUBLE) / n_lines AS ellipsis_ratio,
        |    CASE WHEN len(tokens) = 0 THEN 0.0 ELSE CAST(len(list_filter(tokens, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE) / CAST(len(tokens) AS DOUBLE) END AS alpha_ratio,
        |    CAST(list_contains(tokens, 'the') AS BIGINT) + CAST(list_contains(tokens, 'be') AS BIGINT) + CAST(list_contains(tokens, 'to') AS BIGINT) + CAST(list_contains(tokens, 'of') AS BIGINT) + CAST(list_contains(tokens, 'and') AS BIGINT) + CAST(list_contains(tokens, 'that') AS BIGINT) + CAST(list_contains(tokens, 'have') AS BIGINT) + CAST(list_contains(tokens, 'with') AS BIGINT) AS required_hits
        |  FROM tk)
        |SELECT doc_id, word_count, mean_word_len, symbol_ratio, bullet_ratio, ellipsis_ratio, alpha_ratio, required_hits,
        |  CAST(word_count >= 50 AND word_count <= 100000 AND mean_word_len >= 3.0 AND mean_word_len <= 10.0 AND symbol_ratio <= 0.1 AND bullet_ratio <= 0.9 AND ellipsis_ratio <= 0.3 AND alpha_ratio >= 0.8 AND required_hits >= 2 AS BIGINT) AS pass
        |FROM m ORDER BY doc_id""".stripMargin,

    // the q83 transitive closure + the q42 quality expression; keeper
    // = row_number 1 per cluster ordered quality DESC, doc_id ASC —
    // exactly the Spark side's min(struct(-quality, id)) aggregate
    "q125_keep_best_dedup" ->
      s"""WITH RECURSIVE $WinnowingPairsCtes,
        |sym AS (SELECT a AS src, b AS dst FROM p UNION SELECT b, a FROM p),
        |reach AS (
        |  SELECT doc_id AS src, doc_id AS dst FROM documents
        |  UNION
        |  SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src),
        |cc AS (SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src),
        |qtk AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS tokens
        |  FROM documents),
        |qc AS (
        |  SELECT doc_id,
        |    least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) AS len_score,
        |    CASE WHEN len(tokens) = 0 THEN 0.0 ELSE CAST(len(list_filter(tokens, x -> list_contains([$Stop20], x))) AS DOUBLE) / CAST(len(tokens) AS DOUBLE) END AS stop_ratio,
        |    CASE WHEN length(text) = 0 THEN 0.0 ELSE CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE) END AS punct_ratio
        |  FROM qtk),
        |qq AS (
        |  SELECT doc_id,
        |    greatest(0.0, least(1.0, len_score * 0.5 + least(stop_ratio * 4.0, 1.0) * 0.5 - least(punct_ratio * 2.0, 1.0) * 0.25)) AS quality
        |  FROM qc),
        |rk AS (
        |  SELECT cc.doc_id AS doc_id, row_number() OVER (PARTITION BY cc.cluster_id ORDER BY qq.quality DESC, cc.doc_id) AS rk
        |  FROM cc JOIN qq USING (doc_id))
        |SELECT dd.doc_id, dd.lang FROM documents dd JOIN rk USING (doc_id)
        |WHERE rk.rk = 1 ORDER BY dd.doc_id""".stripMargin,

    "q49_ann_topk" -> AnnTopkSql,

    // Same oracle as q49: IVF at full probe (nprobe = nCentroids) must
    // reproduce the exact top-k bit-for-bit — verifies build + probe +
    // scoring end-to-end.
    "q50_ann_ivf" -> AnnTopkSql,
    // full probe + corpus-sized shortlist ⇒ the exact-rerank stage IS
    // brute force — same oracle as q49/q50
    "q110_ann_ivfpq" -> AnnTopkSql,

    "q51_media_meta" ->
      """SELECT doc_id AS media_id, 'application/octet-stream' AS mime,
        |  CAST(length(text) % 1024 + 1 AS INTEGER) AS width,
        |  CAST(length(text) % 768 + 1 AS INTEGER) AS height,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |FROM documents ORDER BY media_id""".stripMargin,

    // bins=16 byte histogram: bin(byte) = byte % 16 = the byte's LOW hex
    // nibble, so hex(encode(text))'s even-position chars enumerate bins.
    "q52_media_features" ->
      """WITH h AS (
        |  SELECT doc_id AS media_id, hex(encode(text)) AS hx,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |  FROM documents),
        |pos AS (SELECT media_id, hx, unnest(range(1, n_bytes + 1)) AS p FROM h),
        |cnts AS (
        |  SELECT media_id,
        |    CAST(strpos('0123456789ABCDEF', substring(hx, CAST(2 * p AS INTEGER), 1)) - 1 AS BIGINT) AS bin,
        |    count(*) AS c
        |  FROM pos GROUP BY 1, 2),
        |grid AS (SELECT media_id, n_bytes, unnest(range(0, 16)) AS bin FROM h)
        |SELECT g.media_id, CAST(g.bin AS BIGINT) AS bin,
        |  CAST(COALESCE(c.c, 0) AS BIGINT) AS cnt, g.n_bytes
        |FROM grid g LEFT JOIN cnts c ON g.media_id = c.media_id AND g.bin = c.bin
        |ORDER BY g.media_id, g.bin""".stripMargin,

    // frame geometry is pure arithmetic over octet_length (DuckDB can't
    // substring a BLOB, but the selected columns never need the bytes):
    // off = trunc(frame_no * max(nb-32, 0) / 3) + 1 mirrors Spark's
    // (int) cast of the double division; floor == trunc (non-negative).
    "q53_frame_sample" ->
      """WITH h AS (
        |  SELECT doc_id AS media_id, CAST(octet_length(encode(text)) AS BIGINT) AS nb
        |  FROM documents),
        |f AS (SELECT media_id, nb, unnest(range(0, 4)) AS frame_no FROM h),
        |o AS (SELECT media_id, frame_no, nb,
        |  CAST(floor(frame_no * greatest(nb - 32, 0) / 3.0) AS BIGINT) + 1 AS off FROM f)
        |SELECT media_id, CAST(frame_no AS BIGINT) AS frame_no,
        |  CAST(greatest(least(32, nb - off + 1), 0) AS BIGINT) AS frame_len
        |FROM o ORDER BY media_id, frame_no""".stripMargin,

    // Full curation pipeline: quality gate → lang filter → exact dedup
    // (min doc_id per text) → stats + md5 fingerprint. Every stage is
    // engine-portable, so the composite hash-matches end to end.
    "q60_curation_pipeline" ->
      s"""WITH tk AS (
        |  SELECT doc_id, text, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS tokens FROM documents),
        |sc AS (
        |  SELECT doc_id, text, tokens,
        |    least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) AS len_score,
        |    CASE WHEN len(tokens) = 0 THEN 0.0 ELSE CAST(len(list_filter(tokens, x -> list_contains([$Stop20], x))) AS DOUBLE) / CAST(len(tokens) AS DOUBLE) END AS stop_ratio,
        |    CASE WHEN length(text) = 0 THEN 0.0 ELSE CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE) END AS punct_ratio,
        |    $LangScoreCols
        |  FROM tk),
        |q AS (
        |  SELECT doc_id, text,
        |    greatest(0.0, least(1.0, len_score * 0.5 + least(stop_ratio * 4.0, 1.0) * 0.5 - least(punct_ratio * 2.0, 1.0) * 0.25)) AS quality,
        |    $LangArgmaxSql AS lang_pred,
        |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS tok_ws
        |  FROM sc),
        |f AS (SELECT * FROM q WHERE quality >= 0.3 AND lang_pred <> 'und'),
        |d AS (SELECT * FROM f QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1)
        |SELECT doc_id, lang_pred, quality, tok_ws,
        |  md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
        |FROM d ORDER BY doc_id""".stripMargin,

    // md5-bucket sample (Sampling.portableBucket): same membership set
    // in any engine with md5 — the sample itself is what's verified.
    "q63_deterministic_sample" ->
      """WITH s AS (
        |  SELECT * FROM documents
        |  WHERE CAST(concat('0x', substring(md5(concat('42', '|', CAST(doc_id AS VARCHAR))), 1, 14)) AS BIGINT) % 1000000 < 250000)
        |SELECT lang, count(*) AS cnt FROM s GROUP BY lang ORDER BY lang""".stripMargin,

    // rank by the FULL 56-bit md5 prefix (hh), not the mod-1e6 bucket:
    // bucket collisions past ~1e6 rows/key would bias the kept subset
    // toward ascending ids (mirrors Sampling.capPerKey)
    "q130_cap_per_domain" ->
      """WITH h AS (
        |  SELECT doc_id, lang,
        |    CAST(concat('0x', substring(md5(concat('42', '|', CAST(doc_id AS VARCHAR))), 1, 14)) AS BIGINT) AS hh
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang ORDER BY hh, doc_id) AS rn
        |  FROM h)
        |SELECT doc_id, lang FROM r WHERE rn <= 50 ORDER BY doc_id""".stripMargin,

    "q131_bm25_rank" -> Bm25OracleSql,

    // the same regexp/replace chain as TextOps.stripHtml, same order:
    // script/style blocks with content, comments, tags, entity decode
    // (&amp; last), whitespace collapse
    "q132_html_strip" ->
      """SELECT doc_id,
        |  trim(regexp_replace(
        |    replace(replace(replace(replace(replace(replace(
        |      regexp_replace(
        |        regexp_replace(
        |          regexp_replace(
        |            regexp_replace(
        |              '<html><head><title>T</title><style type="text/css">p {color: red}</style><script>var x = 1 < 2 && 2 > 1;</script></head><body><h1>Head</h1><p>'
        |                || text ||
        |                '</p><!-- footer comment --><div>&amp; &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end</div></body></html>',
        |              '<script[^>]*>.*?</script>', ' ', 'gis'),
        |            '<style[^>]*>.*?</style>', ' ', 'gis'),
        |          '<!--.*?-->', ' ', 'gs'),
        |        '<[^>]*>', ' ', 'gs'),
        |      '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''), '&amp;', '&'),
        |    '\s+', ' ', 'g')) AS clean
        |FROM documents ORDER BY doc_id""".stripMargin,

    // chunk starts 0, 24, 48, … while start < n_tokens; 1-based
    // inclusive list slice == Spark's slice(t, start+1, 32)
    "q133_chunk_windows" ->
      """WITH tk AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS t FROM documents),
        |s AS (
        |  SELECT doc_id, t, unnest(range(0, len(t), 24)) AS start
        |  FROM tk WHERE len(t) > 0)
        |SELECT doc_id, CAST(start // 24 AS BIGINT) AS chunk_id,
        |  array_to_string(t[start + 1 : start + 32], ' ') AS chunk_text,
        |  CAST(len(t[start + 1 : start + 32]) AS BIGINT) AS n_tokens
        |FROM s ORDER BY doc_id, chunk_id""".stripMargin,

    // q83's transitive closure + per-cluster counts; weight is one
    // double division off an integer count
    "q134_soft_dedup_weights" ->
      s"""WITH RECURSIVE $WinnowingPairsCtes,
        |sym AS (SELECT a AS src, b AS dst FROM p UNION SELECT b, a FROM p),
        |reach AS (
        |  SELECT doc_id AS src, doc_id AS dst FROM documents
        |  UNION
        |  SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src),
        |cc AS (SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src),
        |sz AS (SELECT cluster_id, count(*) AS cluster_size FROM cc GROUP BY 1)
        |SELECT cc.doc_id, cc.cluster_id, sz.cluster_size,
        |  CAST(1.0 AS DOUBLE) / CAST(sz.cluster_size AS DOUBLE) AS weight
        |FROM cc JOIN sz USING (cluster_id) ORDER BY cc.doc_id""".stripMargin,

    // winnowing candidates verified by exact Levenshtein, ≤ 5 edits
    "q135_edit_distance_pairs" ->
      s"""WITH $WinnowingPairsCtes,
        |v AS (
        |  SELECT p.a, p.b, levenshtein(da.text, db.text) AS dist
        |  FROM p JOIN documents da ON da.doc_id = p.a
        |         JOIN documents db ON db.doc_id = p.b)
        |SELECT a, b, CAST(dist AS BIGINT) AS dist FROM v
        |WHERE dist <= 5 ORDER BY a, b""".stripMargin,

    // same synthetic page, same line rules: terminal punctuation + ≥ 5
    // words per line, "lorem ipsum" / '{' / < 3 kept lines doc kills
    "q136_c4_clean" ->
      """WITH page AS (
        |  SELECT doc_id,
        |    'Header' || chr(10) || text || '.' || chr(10) ||
        |    'This is a sentence with enough words.' || chr(10) ||
        |    'Click here to subscribe now today' || chr(10) ||
        |    'Another good sentence appears right here.' ||
        |    CASE WHEN doc_id % 13 = 3 THEN chr(10) || 'Our catalog of lorem ipsum samples ships today.' ELSE '' END ||
        |    CASE WHEN doc_id % 17 = 5 THEN chr(10) || 'function f() { return 1; }' ELSE '' END AS text
        |  FROM documents),
        |f AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, chr(10)), l ->
        |      regexp_matches(l, '[.!?"]$') AND
        |      len(list_filter(string_split_regex(lower(l), '[^a-z0-9]+'), x -> len(x) > 0)) >= 5) AS kept,
        |    len(string_split(text, chr(10))) AS total
        |  FROM page
        |  WHERE NOT contains(lower(text), 'lorem ipsum') AND NOT contains(text, '{'))
        |SELECT doc_id, array_to_string(kept, chr(10)) AS clean_text,
        |  CAST(len(kept) AS BIGINT) AS n_kept,
        |  CAST(total - len(kept) AS BIGINT) AS n_dropped
        |FROM f WHERE len(kept) >= 3 ORDER BY doc_id""".stripMargin,

    // the identical 9-step regexp chain ('g' everywhere — Spark
    // regexp_replace is always global), then group on the canonical
    "q137_url_canonical" ->
      """WITH u AS (
        |  SELECT doc_id, 'HTTPS://WWW.' || source || '.Example.COM' ||
        |    CASE doc_id % 6
        |      WHEN 0 THEN ':443/Docs/' || CAST(doc_id % 25 AS VARCHAR) || '/'
        |      WHEN 1 THEN '/Docs/' || CAST(doc_id % 25 AS VARCHAR) || '?utm_source=news&page=' || CAST(doc_id % 3 AS VARCHAR)
        |      WHEN 2 THEN '/Docs/' || CAST(doc_id % 25 AS VARCHAR) || '?page=' || CAST(doc_id % 3 AS VARCHAR) || '&utm_campaign=summer'
        |      WHEN 3 THEN '/Docs/' || CAST(doc_id % 25 AS VARCHAR) || '#frag'
        |      WHEN 4 THEN ':80/Docs/' || CAST(doc_id % 25 AS VARCHAR) || '?utm_medium=email'
        |      ELSE '/Docs/' || CAST(doc_id % 25 AS VARCHAR)
        |    END AS url
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |      lower(url),
        |      '#.*$', '', 'g'),
        |      '(utm_[a-z0-9]+|fbclid|gclid|mc_eid|ref)=[^&#]*&', '', 'g'),
        |      '[?&](utm_[a-z0-9]+|fbclid|gclid|mc_eid|ref)=[^&#]*$', '', 'g'),
        |      '^https?://', '', 'g'),
        |      '^www\.', '', 'g'),
        |      ':(80|443)/', '/', 'g'),
        |      ':(80|443)$', '', 'g'),
        |      '\?$', '', 'g'),
        |      '/+$', '', 'g') AS canonical_url
        |  FROM u)
        |SELECT canonical_url, count(*) AS n_urls, min(doc_id) AS keep_doc_id
        |FROM c GROUP BY 1 ORDER BY canonical_url""".stripMargin,

    // q117's LM-score CTEs, then plain per-lang ntile(3) on
    // (lm_score DESC, doc_id) — the distributed ntileByKey must agree
    // rank for rank
    "q138_ppl_buckets" ->
      """WITH tk AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS t FROM documents),
        |bg AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(t)), i -> struct_pack(w1 := t[i], w2 := t[i + 1]))) AS p
        |  FROM tk WHERE len(t) >= 2),
        |hb AS (
        |  SELECT doc_id,
        |    CAST(concat('0x', substring(md5(concat('7', '|', p.w1)), 1, 15)) AS BIGINT) % 64 AS ctx,
        |    CAST(concat('0x', substring(md5(concat('7', '|', p.w2)), 1, 15)) AS BIGINT) % 64 AS tok
        |  FROM bg),
        |w AS (
        |  SELECT c.range AS ctx, k.range AS tok,
        |    -(CAST(concat('0x', substring(md5(concat('13', '|', CAST(c.range AS VARCHAR), '|', CAST(k.range AS VARCHAR))), 1, 15)) AS BIGINT) % 1401) AS weight
        |  FROM range(64) c CROSS JOIN range(64) k),
        |agg AS (
        |  SELECT doc_id, sum(weight) AS sw, count(*) AS nb
        |  FROM hb JOIN w USING (ctx, tok) GROUP BY 1),
        |scored AS (
        |  SELECT d.doc_id, d.lang,
        |    coalesce(CAST(agg.sw AS DOUBLE) / CAST(1000 * agg.nb AS DOUBLE), 0.0) AS lm_score
        |  FROM documents d LEFT JOIN agg USING (doc_id)),
        |t3 AS (
        |  SELECT doc_id, lang, lm_score,
        |    ntile(3) OVER (PARTITION BY lang ORDER BY lm_score DESC, doc_id) AS tile
        |  FROM scored)
        |SELECT doc_id, lang, lm_score,
        |  CASE tile WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS ppl_bucket
        |FROM t3 ORDER BY doc_id""".stripMargin,

    // q113's feature CTEs under the DSIR synthetic ratio table
    // (seed 17, ±700 milli-log-ratio), importance rank ≤ 200
    "q139_dsir_select" ->
      """WITH tk AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS t FROM documents),
        |uni AS (SELECT doc_id, unnest(t) AS f FROM tk),
        |bi AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])) AS f
        |  FROM tk WHERE len(t) >= 2),
        |feats AS (SELECT doc_id, f FROM uni UNION ALL SELECT doc_id, f FROM bi),
        |hb AS (
        |  SELECT doc_id,
        |    CAST(concat('0x', substring(md5(concat('7', '|', f)), 1, 15)) AS BIGINT) % 64 AS bucket
        |  FROM feats),
        |w AS (
        |  SELECT r.range AS bucket,
        |    (CAST(concat('0x', substring(md5(concat('17', '|', CAST(r.range AS VARCHAR))), 1, 15)) AS BIGINT) % 1401) - 700 AS weight
        |  FROM range(64) r),
        |agg AS (
        |  SELECT doc_id, sum(weight) AS sw, count(*) AS nf
        |  FROM hb JOIN w USING (bucket) GROUP BY 1),
        |scored AS (
        |  SELECT d.doc_id,
        |    coalesce(CAST(agg.sw AS DOUBLE) / 1000.0, 0.0) AS importance,
        |    CAST(coalesce(agg.nf, 0) AS BIGINT) AS n_features
        |  FROM documents d LEFT JOIN agg USING (doc_id)),
        |r AS (
        |  SELECT doc_id, importance, n_features,
        |    row_number() OVER (ORDER BY importance DESC, doc_id) AS rn
        |  FROM scored)
        |SELECT doc_id, importance, n_features FROM r
        |WHERE rn <= 200 ORDER BY doc_id""".stripMargin,

    // the identical cleanup chain: direct replaces (curly quotes,
    // dashes, ellipsis, NBSP), zero-width strip, C0 strip, space
    // collapse — invisibles spelled chr() so the SQL stays readable
    "q146_text_cleanup" ->
      """SELECT doc_id,
        |  trim(regexp_replace(
        |    regexp_replace(
        |      regexp_replace(
        |        replace(replace(replace(replace(replace(replace(replace(replace(
        |          text || ' “quoted” ‘s’ – a—b… x' || chr(160) || 'y z' || chr(8203) || 'w' || chr(7) || 'end' || chr(9) || 'q  r',
        |          '“', '"'), '”', '"'), '‘', ''''), '’', ''''), '–', '-'), '—', '-'), '…', '...'), chr(160), ' '),
        |        '[\x{200B}\x{200C}\x{200D}\x{FEFF}]', '', 'g'),
        |      '[\x{00}-\x{08}\x{0B}\x{0C}\x{0E}-\x{1F}]', '', 'g'),
        |    '[ \t]+', ' ', 'g')) AS clean
        |FROM documents ORDER BY doc_id""".stripMargin,

    // canonicalize (the q137 chain on a simpler URL), host extract,
    // blocklist anti-filter, survivors per domain
    "q147_domain_blocklist" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    regexp_extract(
        |      regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |        lower('HTTPS://WWW.' || source || '.Example.COM/p/' || CAST(doc_id % 50 AS VARCHAR)),
        |        '#.*$', '', 'g'),
        |        '(utm_[a-z0-9]+|fbclid|gclid|mc_eid|ref)=[^&#]*&', '', 'g'),
        |        '[?&](utm_[a-z0-9]+|fbclid|gclid|mc_eid|ref)=[^&#]*$', '', 'g'),
        |        '^https?://', '', 'g'),
        |        '^www\.', '', 'g'),
        |        ':(80|443)/', '/', 'g'),
        |        ':(80|443)$', '', 'g'),
        |        '\?$', '', 'g'),
        |        '/+$', '', 'g'),
        |      '^[^/:?#]+') AS domain
        |  FROM documents)
        |SELECT domain, count(*) AS n_docs, min(doc_id) AS first_doc
        |FROM c
        |WHERE domain NOT IN ('src3.example.com', 'src7.example.com', 'src12.example.com')
        |GROUP BY 1 ORDER BY domain""".stripMargin,

    // √n quantized to int64 milli-units; largest-remainder seats by
    // (remainder DESC, lang) — all-integer apportionment
    "q140_temperature_mix" ->
      """WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
        |q AS (
        |  SELECT lang, n_docs,
        |    CAST(round(1000 * sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT) AS s
        |  FROM c),
        |t AS (SELECT CAST(sum(s) AS BIGINT) AS stot FROM q),
        |a AS (
        |  SELECT lang, n_docs, s, stot,
        |    (300 * s) // stot AS fl, (300 * s) % stot AS rmd
        |  FROM q CROSS JOIN t),
        |sp AS (SELECT 300 - CAST(sum(fl) AS BIGINT) AS spare FROM a),
        |r AS (
        |  SELECT lang, n_docs, s, stot, fl,
        |    row_number() OVER (ORDER BY rmd DESC, lang) AS rr
        |  FROM a)
        |SELECT lang, n_docs, CAST(s AS DOUBLE) / CAST(stot AS DOUBLE) AS share,
        |  CAST(fl + CASE WHEN rr <= (SELECT spare FROM sp) THEN 1 ELSE 0 END AS BIGINT) AS target_docs
        |FROM r ORDER BY lang""".stripMargin,

    // q122's replace-chain encoder aggregated per lang: integer token/
    // word/char sums, two final divisions
    "q142_token_fertility" -> {
      val chain = BpeContractMerges.foldLeft(
        "concat(' ', regexp_replace(array_to_string(t, '|'), '(.)', '\\1 ', 'g'))") {
        case (s, (a, b)) => s"replace($s, ' $a $b ', ' ${a + b} ')"
      }
      s"""WITH tk AS (
        |  SELECT doc_id, lang, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS t,
        |    length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS nc
        |  FROM documents),
        |enc AS (
        |  SELECT lang, len(t) AS nw, nc,
        |    len(list_filter(string_split(trim($chain), ' '),
        |      x -> x <> '|' AND len(x) > 0)) AS nb
        |  FROM tk WHERE len(t) > 0)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(nb) AS BIGINT) AS n_bpe,
        |  CAST(sum(nw) AS BIGINT) AS n_words,
        |  CAST(sum(nb) AS DOUBLE) / CAST(sum(nw) AS DOUBLE) AS fertility,
        |  CAST(sum(nc) AS DOUBLE) / CAST(sum(nb) AS DOUBLE) AS chars_per_token
        |FROM enc GROUP BY lang ORDER BY lang""".stripMargin
    },

    // the winnowing pair CTEs at threshold 1, labeled by overlap
    "q143_contrastive_pairs" ->
      s"""WITH ${winnowingPairsCtes("", 1)}
        |SELECT a, b, n_shared,
        |  CASE WHEN n_shared >= 3 THEN 'positive' ELSE 'hard_negative' END AS label
        |FROM p ORDER BY a, b""".stripMargin,

    // the q45 signature/band CTEs, match counting over the 16 hash
    // positions, exact Jaccard with NO threshold, one division each
    "q144_sketch_calibration" -> {
      val k = 16; val bands = 4; val r = k / bands
      val hCols = (0 until k).map(i => s"min(ha + $i * hb) AS h$i").mkString(",\n    ")
      val bandSelects = (0 until bands).map { b =>
        val parts = (0 until r).map(i => s"h${b * r + i}").mkString(", '|', ")
        s"SELECT doc_id, $b AS band, md5(concat('$b', '|', $parts)) AS bh FROM sig"
      }.mkString("\n  UNION ALL\n  ")
      val matchSum = (0 until k).map(i =>
        s"CASE WHEN sa.h$i = sb.h$i THEN 1 ELSE 0 END").mkString(" + ")
      s"""WITH tk AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS tokens FROM documents),
        |sh AS (
        |  SELECT doc_id, CASE WHEN len(tokens) >= 3 THEN list_distinct(list_transform(range(1, len(tokens) - 1), i -> array_to_string(tokens[i:i+2], ' '))) ELSE [] END AS s FROM tk),
        |ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |hx AS (SELECT doc_id,
        |    CAST(concat('0x', substring(md5(concat('0', '|', g)), 1, 14)) AS BIGINT) AS ha,
        |    CAST(concat('0x', substring(md5(concat('0', '|', g)), 17, 14)) AS BIGINT) AS hb
        |  FROM ex),
        |sig AS (SELECT doc_id,
        |    $hCols
        |  FROM hx GROUP BY doc_id),
        |bands AS (
        |  $bandSelects),
        |cand AS (
        |  SELECT ba.doc_id AS a, bb.doc_id AS b FROM bands ba
        |  JOIN bands bb ON ba.band = bb.band AND ba.bh = bb.bh AND ba.doc_id < bb.doc_id
        |  GROUP BY 1, 2),
        |m AS (
        |  SELECT c.a, c.b, CAST($matchSum AS BIGINT) AS n_match
        |  FROM cand c JOIN sig sa ON sa.doc_id = c.a JOIN sig sb ON sb.doc_id = c.b),
        |sized AS (SELECT doc_id, s, len(s) AS n FROM sh),
        |pairs AS (
        |  SELECT m.a, m.b, m.n_match, len(list_intersect(sa.s, sb.s)) AS inter, sa.n AS na, sb.n AS nb
        |  FROM m JOIN sized sa ON sa.doc_id = m.a JOIN sized sb ON sb.doc_id = m.b),
        |j AS (
        |  SELECT a, b, n_match,
        |    CAST(n_match AS DOUBLE) / CAST(16 AS DOUBLE) AS est_jaccard,
        |    CASE WHEN na + nb - inter = 0 THEN 0.0
        |      ELSE CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE) END AS jaccard
        |  FROM pairs)
        |SELECT a, b, n_match, est_jaccard, jaccard,
        |  abs(est_jaccard - jaccard) AS abs_err
        |FROM j ORDER BY a, b""".stripMargin
    },

    // each version's mutation replayed arithmetically: v0 base, v1
    // +100 on custkey%7, v2 additionally dropping custkey%5
    "q145_time_travel" ->
      """WITH v0 AS (
        |  SELECT CAST(0 AS BIGINT) AS version, count(*) AS n_rows,
        |    CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
        |  FROM customer),
        |v1 AS (
        |  SELECT CAST(1 AS BIGINT), count(*),
        |    CAST(sum(CAST(CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100.0 ELSE c_acctbal END AS DECIMAL(18,4))) AS DOUBLE)
        |  FROM customer),
        |v2 AS (
        |  SELECT CAST(2 AS BIGINT), count(*),
        |    CAST(sum(CAST(CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100.0 ELSE c_acctbal END AS DECIMAL(18,4))) AS DOUBLE)
        |  FROM customer WHERE c_custkey % 5 <> 0)
        |SELECT * FROM v0 UNION ALL SELECT * FROM v1 UNION ALL SELECT * FROM v2
        |ORDER BY version""".stripMargin,

    // each stage's established oracle fragment composed: q124 gate,
    // q141 diversity, q39 fingerprint keep-min, q42 quality, q129
    // rank-and-cumsum budget rule
    "q156_curation_v2" ->
      s"""WITH tk0 AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS tokens,
        |    CAST(len(regexp_extract_all(text, chr(10))) + 1 AS DOUBLE) AS n_lines
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, text, tokens,
        |    CAST(len(tokens) AS BIGINT) AS wc,
        |    CASE WHEN len(tokens) = 0 THEN 0.0 ELSE CAST(length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS DOUBLE) / CAST(len(tokens) AS DOUBLE) END AS mwl,
        |    CASE WHEN len(tokens) = 0 THEN 0.0 ELSE CAST(len(regexp_extract_all(text, '#')) + len(regexp_extract_all(text, '\\.\\.\\.|…')) AS DOUBLE) / CAST(len(tokens) AS DOUBLE) END AS sym,
        |    CAST(len(regexp_extract_all(text, '(?m)^[-*•]')) AS DOUBLE) / n_lines AS blr,
        |    CAST(len(regexp_extract_all(text, '(?m)(\\.\\.\\.|…)$$')) AS DOUBLE) / n_lines AS elr,
        |    CASE WHEN len(tokens) = 0 THEN 0.0 ELSE CAST(len(list_filter(tokens, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE) / CAST(len(tokens) AS DOUBLE) END AS awr,
        |    CAST(list_contains(tokens, 'the') AS BIGINT) + CAST(list_contains(tokens, 'be') AS BIGINT) + CAST(list_contains(tokens, 'to') AS BIGINT) + CAST(list_contains(tokens, 'of') AS BIGINT) + CAST(list_contains(tokens, 'and') AS BIGINT) + CAST(list_contains(tokens, 'that') AS BIGINT) + CAST(list_contains(tokens, 'have') AS BIGINT) + CAST(list_contains(tokens, 'with') AS BIGINT) AS rwh
        |  FROM tk0),
        |s1 AS (
        |  SELECT doc_id, text, tokens FROM m
        |  WHERE wc >= 50 AND wc <= 100000 AND mwl >= 3.0 AND mwl <= 10.0
        |    AND sym <= 0.1 AND blr <= 0.9 AND elr <= 0.3 AND awr >= 0.8),
        |ch AS (
        |  SELECT doc_id, substring(text, CAST(i AS INT), 1) AS c
        |  FROM (SELECT doc_id, text, unnest(range(1, len(text) + 1)) AS i FROM s1)),
        |cnt AS (SELECT doc_id, c, count(*) AS k FROM ch GROUP BY 1, 2),
        |dvr AS (SELECT doc_id, sum(k * (k - 1)) AS s2, sum(k) AS n FROM cnt GROUP BY 1),
        |s2 AS (
        |  SELECT s1.doc_id, s1.text, s1.tokens FROM s1 JOIN dvr USING (doc_id)
        |  WHERE (1.0 - CAST(dvr.s2 AS DOUBLE) / CAST(dvr.n * (dvr.n - 1) AS DOUBLE)) BETWEEN 0.5 AND 0.98),
        |keep AS (
        |  SELECT min(doc_id) AS doc_id FROM s2
        |  GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))),
        |c AS (
        |  SELECT s2.doc_id,
        |    least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) AS len_score,
        |    CASE WHEN len(tokens) = 0 THEN 0.0 ELSE CAST(len(list_filter(tokens, x -> list_contains([$Stop20], x))) AS DOUBLE) / CAST(len(tokens) AS DOUBLE) END AS stop_ratio,
        |    CASE WHEN length(text) = 0 THEN 0.0 ELSE CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE) END AS punct_ratio,
        |    CAST(len(tokens) AS BIGINT) AS tok
        |  FROM s2 JOIN keep USING (doc_id)),
        |q AS (
        |  SELECT doc_id, tok,
        |    greatest(0.0, least(1.0, len_score * 0.5 + least(stop_ratio * 4.0, 1.0) * 0.5 - least(punct_ratio * 2.0, 1.0) * 0.25)) AS quality
        |  FROM c),
        |cum AS (
        |  SELECT doc_id, tok, quality,
        |    sum(tok) OVER (ORDER BY quality DESC, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm
        |  FROM q)
        |SELECT doc_id, tok, quality FROM cum
        |WHERE cm - tok < 10000 ORDER BY doc_id""".stripMargin,

    // plain per-flag ntile(10) on (price DESC, rid), deciles 2-9,
    // decimal-exact mean
    "q153_trimmed_mean" ->
      """WITH t AS (
        |  SELECT l_returnflag, l_extendedprice,
        |    ntile(10) OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice DESC, l_orderkey * 10 + l_linenumber) AS tile
        |  FROM lineitem)
        |SELECT l_returnflag, count(*) AS n_kept,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS trimmed_mean
        |FROM t WHERE tile > 1 AND tile < 10
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // the diff classes replayed arithmetically from the v0->v1
    // construction: removed = %10=0, changed = survivors with %7=1,
    // added = %13=2 (offset ids), unchanged = the rest
    "q154_snapshot_diff" ->
      """SELECT 'added' AS change_type, count(*) AS n FROM documents WHERE doc_id % 13 = 2
        |UNION ALL
        |SELECT 'changed', count(*) FROM documents WHERE doc_id % 10 <> 0 AND doc_id % 7 = 1
        |UNION ALL
        |SELECT 'removed', count(*) FROM documents WHERE doc_id % 10 = 0
        |UNION ALL
        |SELECT 'unchanged', count(*) FROM documents WHERE doc_id % 10 <> 0 AND doc_id % 7 <> 1
        |ORDER BY change_type""".stripMargin,

    // the q114/q115 span machinery at gramLen 5 with the hot gate
    // swapped for benchmark membership (doc_id % 17 = 0), then the
    // q115 removal: ordered surviving-token rebuild
    "q151_decontaminate_spans" ->
      """WITH tk AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS tokens FROM documents),
        |tok AS (
        |  SELECT doc_id, unnest(tokens) AS t, unnest(range(1, len(tokens) + 1)) AS pos FROM tk),
        |g AS (
        |  SELECT doc_id, pos - 1 AS pos0,
        |    CAST(concat('0x', substring(md5(concat('0', '|',
        |      concat_ws(' ', t, lead(t, 1) OVER w, lead(t, 2) OVER w,
        |                lead(t, 3) OVER w, lead(t, 4) OVER w))), 1, 15)) AS BIGINT) AS hh,
        |    lead(t, 4) OVER w IS NOT NULL AS fullgram
        |  FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
        |gg AS (SELECT doc_id, pos0, hh FROM g WHERE fullgram),
        |hot AS (SELECT DISTINCT hh FROM gg WHERE doc_id % 17 = 0),
        |dup AS (SELECT gg.doc_id, gg.pos0 FROM gg JOIN hot USING (hh)),
        |brk AS (
        |  SELECT doc_id, pos0,
        |    CASE WHEN max(pos0) OVER (PARTITION BY doc_id ORDER BY pos0
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 5 >= pos0
        |         THEN 0 ELSE 1 END AS is_new
        |  FROM dup),
        |isl AS (
        |  SELECT doc_id, pos0,
        |    sum(is_new) OVER (PARTITION BY doc_id ORDER BY pos0
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM brk),
        |sp AS (
        |  SELECT doc_id, min(pos0) AS span_start, max(pos0) + 4 AS span_end
        |  FROM isl GROUP BY doc_id, island),
        |clean AS (
        |  SELECT tok.doc_id, tok.pos, tok.t FROM tok
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM sp WHERE sp.doc_id = tok.doc_id
        |      AND tok.pos - 1 BETWEEN sp.span_start AND sp.span_end)),
        |agg AS (
        |  SELECT doc_id, string_agg(t, ' ' ORDER BY pos) AS clean_text
        |  FROM clean GROUP BY 1)
        |SELECT d.doc_id, coalesce(a.clean_text, '') AS clean_text
        |FROM documents d LEFT JOIN agg a USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    // the five PageRank rounds unrolled: distinct edges, window
    // out-degree, damped floor-div contributions, left-join base —
    // integer arithmetic end to end
    "q150_pagerank" -> {
      val rounds = (1 to 5).map { i =>
        s"""m$i AS (
           |  SELECT n.id, CAST(150000 + coalesce(s.c, 0) AS BIGINT) AS mass
           |  FROM n LEFT JOIN (
           |    SELECT d.dst AS id, sum((m.mass * 85) // 100 // d.outdeg) AS c
           |    FROM deg d JOIN m${i - 1} m ON m.id = d.src GROUP BY 1) s USING (id))"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH raw AS (
        |  SELECT doc_id % 101 AS src, (doc_id * 31 + 7) % 101 AS dst FROM documents
        |  UNION ALL
        |  SELECT doc_id % 101, (doc_id * 57 + 13) % 101 FROM documents),
        |e AS (SELECT DISTINCT src, dst FROM raw),
        |deg AS (SELECT src, dst, count(*) OVER (PARTITION BY src) AS outdeg FROM e),
        |n AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
        |m0 AS (SELECT id, CAST(1000000 AS BIGINT) AS mass FROM n),
        |$rounds
        |SELECT id AS node, mass FROM m5 ORDER BY node""".stripMargin
    },

    // the same RANGE frame on epoch micros: integer boundary, ties are
    // peers, decimal-exact value sum
    "q148_rolling_hour" ->
      """SELECT event_id, user_id, ts,
        |  count(*) OVER w AS n_1h,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    // plain per-lang ntile(100) on (n_chars DESC, doc_id); the
    // distributed ntileByKey must agree band for band
    "q149_length_outliers" ->
      """WITH t AS (
        |  SELECT doc_id, lang, n_chars,
        |    ntile(100) OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS pct_band
        |  FROM documents)
        |SELECT doc_id, lang, n_chars, pct_band,
        |  (pct_band <= 2 OR pct_band >= 99) AS is_outlier
        |FROM t ORDER BY doc_id""".stripMargin,

    // per-character counts via positional substring (code-POINT chars,
    // matching Spark's split on the ASCII fixture), unbiased Simpson
    "q141_char_diversity" ->
      """WITH ch AS (
        |  SELECT doc_id, substring(text, CAST(i AS INT), 1) AS c
        |  FROM (SELECT doc_id, text, unnest(range(1, len(text) + 1)) AS i FROM documents)),
        |cnt AS (SELECT doc_id, c, count(*) AS k FROM ch GROUP BY 1, 2),
        |agg AS (
        |  SELECT doc_id, sum(k * (k - 1)) AS s2, sum(k) AS n, count(*) AS kk
        |  FROM cnt GROUP BY 1)
        |SELECT d.doc_id,
        |  CAST(coalesce(agg.n, 0) AS BIGINT) AS n_chars_counted,
        |  CAST(coalesce(agg.kk, 0) AS BIGINT) AS distinct_chars,
        |  CASE WHEN coalesce(agg.n, 0) < 2 THEN 0.0
        |    ELSE 1.0 - CAST(agg.s2 AS DOUBLE) / CAST(agg.n * (agg.n - 1) AS DOUBLE)
        |  END AS char_diversity
        |FROM documents d LEFT JOIN agg USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    // d2/pp from the paragraph CTEs (dp/hot unused here): first
    // occurrence per (doc, line), blanks always kept, ordered rebuild
    "q128_within_doc_lines" ->
      s"""WITH $ParaDedupCtes,
        |r AS (
        |  SELECT doc_id, p, pos,
        |    row_number() OVER (PARTITION BY doc_id, md5(p) ORDER BY pos) AS rn
        |  FROM pp),
        |agg AS (
        |  SELECT doc_id, string_agg(p, chr(10) ORDER BY pos) AS clean_text
        |  FROM r WHERE trim(p) = '' OR rn = 1 GROUP BY 1)
        |SELECT d.doc_id, coalesce(a.clean_text, '') AS clean_text
        |FROM d2 d LEFT JOIN agg a USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    "q129_token_budget" ->
      s"""WITH tk AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) AS len_score,
        |    CASE WHEN len(tokens) = 0 THEN 0.0 ELSE CAST(len(list_filter(tokens, x -> list_contains([$Stop20], x))) AS DOUBLE) / CAST(len(tokens) AS DOUBLE) END AS stop_ratio,
        |    CASE WHEN length(text) = 0 THEN 0.0 ELSE CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE) END AS punct_ratio,
        |    CAST(len(tokens) AS BIGINT) AS tok
        |  FROM tk),
        |q AS (
        |  SELECT doc_id, tok,
        |    greatest(0.0, least(1.0, len_score * 0.5 + least(stop_ratio * 4.0, 1.0) * 0.5 - least(punct_ratio * 2.0, 1.0) * 0.25)) AS quality
        |  FROM c),
        |cum AS (
        |  SELECT doc_id, tok, quality,
        |    sum(tok) OVER (ORDER BY quality DESC, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
        |  FROM q)
        |SELECT doc_id, tok, quality FROM cum
        |WHERE c - tok < 15000 ORDER BY doc_id""".stripMargin,

    // chr(769) = U+0301 combining acute, chr(778) = U+030A combining
    // ring — the same decomposed suffix the Spark side appends
    "q127_nfc_normalize" ->
      """SELECT doc_id, nfc_normalize(text || ' cafe' || chr(769) || ' A' || chr(778)) AS norm
        |FROM documents ORDER BY doc_id""".stripMargin,

    // shard from the mod-1e6 bucket; ORDER from the full 56-bit md5
    // prefix (hh) — bucket collisions past ~1e6 rows would degrade the
    // shuffle order toward ascending-key (mirrors shuffleIntoShards)
    "q126_shuffle_shards" ->
      """WITH h AS (
        |  SELECT doc_id, lang,
        |    CAST(concat('0x', substring(md5(concat('42', '|', CAST(doc_id AS VARCHAR))), 1, 14)) AS BIGINT) AS hh
        |  FROM documents)
        |SELECT doc_id, lang, (hh % 1000000) % 8 AS shard,
        |  CAST(row_number() OVER (PARTITION BY (hh % 1000000) % 8 ORDER BY hh, doc_id) AS BIGINT) AS pos
        |FROM h ORDER BY doc_id""".stripMargin,

    // sequential Poisson replay: same 56-bit u, same IEEE double
    // division (correctly rounded in both engines), same tie-break —
    // the winning set AND the audit column hash-match
    "q160_pps_sample" ->
      """WITH h AS (
        |  SELECT doc_id, n_chars,
        |    CAST(concat('0x', substring(md5(concat_ws('|', '42', CAST(doc_id AS VARCHAR))), 1, 14)) AS BIGINT) AS u
        |  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0)
        |SELECT * FROM (
        |  SELECT doc_id, n_chars,
        |    CAST(u AS DOUBLE) / CAST(n_chars AS DOUBLE) AS pps
        |  FROM h ORDER BY pps, doc_id LIMIT 200)
        |ORDER BY doc_id""".stripMargin,

    // floor-integer ppm/ratio arithmetic mirrored operator for
    // operator (the ratio is DEFINED as the division composition)
    "q161_key_skew" ->
      """WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY 1),
        |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total, count(*) AS keys FROM c)
        |SELECT user_id, cnt,
        |  CAST((cnt * 1000000) // total AS BIGINT) AS share_ppm,
        |  CAST((((cnt * 1000000) // total) * keys) // 1000 AS BIGINT) AS ratio_milli
        |FROM c, t ORDER BY cnt DESC, user_id ASC NULLS FIRST LIMIT 25""".stripMargin,

    "q69_interval_join" ->
      """SELECT a.user_id, count(*) AS n_pairs
        |FROM events a JOIN events b ON a.user_id = b.user_id
        |  AND b.ts >= a.ts - INTERVAL 5 MINUTE AND b.ts <= a.ts
        |  AND b.event_id <> a.event_id
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q68_packing_by_lang" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS tok
        |  FROM documents)
        |SELECT doc_id, lang, tok,
        |  CAST(floor(CAST(sum(tok) OVER (PARTITION BY lang ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tok AS DOUBLE) / 512) AS BIGINT) AS bin_id
        |FROM t ORDER BY doc_id""".stripMargin,

    // parallel unnests zip positionally in DuckDB, giving (value, dim)
    "q74_embedding_centroids" ->
      """WITH e AS (
        |  SELECT vec_id % 4 AS grp,
        |    unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v,
        |    unnest(range(1, len(embedding) + 1)) AS dim
        |  FROM embeddings)
        |SELECT grp, dim, CAST(sum(CAST(v AS DECIMAL(18,8))) AS DOUBLE) / count(*) AS m
        |FROM e GROUP BY grp, dim ORDER BY grp, dim""".stripMargin,

    "q75_media_resize" ->
      """WITH s AS (
        |  SELECT doc_id AS media_id,
        |    array_to_string(list_transform(range(1, length(text) + 1, 4),
        |      i -> substring(text, CAST(i AS INTEGER), 1)), '') AS thumb,
        |    length(text) % 1024 + 1 AS w0, length(text) % 768 + 1 AS h0
        |  FROM documents)
        |SELECT media_id, md5(thumb) AS thumb_md5,
        |  CAST(length(thumb) AS BIGINT) AS out_chars,
        |  greatest(CAST(floor(w0 / 2.0) AS BIGINT), 1) AS width,
        |  greatest(CAST(floor(h0 / 2.0) AS BIGINT), 1) AS height
        |FROM s ORDER BY media_id""".stripMargin,

    "q54_schema_evolution" ->
      "SELECT doc_id, text, lang, source, n_chars, CAST(NULL AS DOUBLE) AS quality, 'ref' AS ingested FROM documents ORDER BY doc_id",

    "q62_sequence_packing" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS tok
        |  FROM documents)
        |SELECT doc_id, tok,
        |  CAST(floor(CAST(sum(tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tok AS DOUBLE) / 512) AS BIGINT) AS bin_id
        |FROM t ORDER BY doc_id""".stripMargin,

    // Count-min replay: identical md5 halves → 2-universal buckets →
    // counter matrix → min-of-depth estimate per distinct value
    "q95_heavy_hitters" -> CmDirectOracleSql,
    // shard counter matrices summed elementwise == the direct matrix
    // (counts are additive), so the merged estimates replay q95's
    // direct oracle verbatim
    "q155_cm_merge" -> CmDirectOracleSql,

    // Bloom replay: identical md5 halves → k = 4 bit positions mod
    // 1024 → distinct set-bit set (shard-split is invisible to the
    // oracle — OR-merge is lossless by construction) → probe counts
    // per hash index, all-4-set = maybe present. False positives
    // replay identically; inserted keys (event user ids ⊂ customer
    // keys) must all probe 1 — the no-false-negative law.
    "q158_bloom_merge" ->
      """WITH v AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS val FROM events),
        |h AS (SELECT val,
        |  CAST(concat('0x', substring(md5(concat_ws('|', '42', val)), 1, 14)) AS BIGINT) AS a,
        |  CAST(concat('0x', substring(md5(concat_ws('|', '42', val)), 17, 14)) AS BIGINT) AS b
        |  FROM v),
        |pos AS (SELECT DISTINCT (a + i * b) % 1024 AS p FROM h, range(4) t(i)),
        |pr AS (SELECT DISTINCT CAST(c_custkey AS VARCHAR) AS val FROM customer),
        |ph AS (SELECT val,
        |  CAST(concat('0x', substring(md5(concat_ws('|', '42', val)), 1, 14)) AS BIGINT) AS a,
        |  CAST(concat('0x', substring(md5(concat_ws('|', '42', val)), 17, 14)) AS BIGINT) AS b
        |  FROM pr),
        |ppos AS (SELECT val, i, (a + i * b) % 1024 AS p FROM ph, range(4) t(i)),
        |hits AS (SELECT val, count(*) AS hit FROM ppos JOIN pos USING (p) GROUP BY val)
        |SELECT CAST(pr.val AS BIGINT) AS c_custkey,
        |  CAST(CASE WHEN coalesce(hit, 0) = 4 THEN 1 ELSE 0 END AS BIGINT) AS maybe_present
        |FROM pr LEFT JOIN hits USING (val)
        |ORDER BY c_custkey""".stripMargin,

    // incremental refresh law: merged (base, delta) state == direct
    // recompute — the oracle IS the direct recompute with the same
    // decimal-exact sums
    "q159_incremental_mv" ->
      """SELECT l_returnflag, count(*) AS cnt,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_l_quantity,
        |  min(l_quantity) AS min_l_quantity, max(l_quantity) AS max_l_quantity,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_l_extendedprice,
        |  min(l_extendedprice) AS min_l_extendedprice,
        |  max(l_extendedprice) AS max_l_extendedprice
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    // histogram percentile replay at 0.05/0.95, then the clamp; the
    // NULL guard mirrors the engine's explicit CASE
    "q167_winsorize" ->
      """WITH v AS (SELECT doc_id, lang, n_chars, CAST(n_chars AS DOUBLE) AS x FROM documents),
        |b AS (SELECT lang, least(255, greatest(0, CAST(floor((x - 0.0) / 1024.0 * 256) AS BIGINT))) AS bin FROM v WHERE x IS NOT NULL),
        |h AS (SELECT lang, bin, count(*) AS cnt FROM b GROUP BY 1, 2),
        |c AS (SELECT lang, bin,
        |    sum(cnt) OVER (PARTITION BY lang ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cnt) OVER (PARTITION BY lang) AS n FROM h),
        |plo AS (SELECT lang, 0.0 + (CAST(min(bin) + 1 AS DOUBLE) * 1024.0) / 256 AS wlo
        |  FROM c WHERE cum >= CAST(ceil(0.05 * n) AS BIGINT) GROUP BY 1),
        |phi AS (SELECT lang, 0.0 + (CAST(min(bin) + 1 AS DOUBLE) * 1024.0) / 256 AS whi
        |  FROM c WHERE cum >= CAST(ceil(0.95 * n) AS BIGINT) GROUP BY 1)
        |SELECT v.doc_id, v.lang, v.n_chars,
        |  CASE WHEN v.x IS NULL THEN NULL
        |       ELSE least(greatest(v.x, plo.wlo), phi.whi) END AS n_chars_wins
        |FROM v LEFT JOIN plo ON v.lang = plo.lang LEFT JOIN phi ON v.lang = phi.lang
        |ORDER BY v.doc_id""".stripMargin,

    // first-event-date cohorts, distinct active (user, offset) pairs
    "q168_retention" ->
      """WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort_date FROM events GROUP BY 1),
        |a AS (SELECT DISTINCT e.user_id, f.cohort_date,
        |    CAST(date_diff('day', f.cohort_date, CAST(e.ts AS DATE)) AS BIGINT) AS offset_days
        |  FROM events e JOIN f USING (user_id))
        |SELECT cohort_date, offset_days, count(*) AS n_users
        |FROM a GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // stage-k = earliest stage event strictly after the committed
    // stage-(k-1) time; inner joins carry the qualification forward
    "q169_funnel" ->
      """WITH s0 AS (SELECT user_id, min(ts) AS t0 FROM events WHERE event_type = 'view' GROUP BY 1),
        |s1 AS (SELECT e.user_id, min(e.ts) AS t1 FROM events e JOIN s0 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > s0.t0 GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > s1.t1 GROUP BY 1)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS stage, 'view' AS event_type,
        |    (SELECT count(*) FROM s0) AS n_users
        |  UNION ALL SELECT CAST(2 AS BIGINT), 'click', (SELECT count(*) FROM s1)
        |  UNION ALL SELECT CAST(3 AS BIGINT), 'purchase', (SELECT count(*) FROM s2))
        |ORDER BY stage""".stripMargin,

    // per-day registers, 7-day range-join merge by max, then the
    // standard integer estimator (the q91 recipe with a day dimension)
    "q172_rolling_wau" ->
      s"""WITH h AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(concat('0x', substring(md5(concat_ws('|', '42', CAST(user_id AS VARCHAR))), 1, 14)) AS BIGINT) AS h
        |  FROM events),
        |b AS (
        |  SELECT day, h & 63 AS b,
        |    CASE WHEN (h >> 6) = 0 THEN 30
        |         ELSE least(30, 51 - length(bin(h >> 6))) END AS rho
        |  FROM h),
        |regs AS (SELECT day, b, max(rho) AS r FROM b GROUP BY 1, 2),
        |days AS (SELECT DISTINCT day AS target FROM regs),
        |merged AS (
        |  SELECT d.target AS day, r.b, max(r.r) AS r
        |  FROM days d JOIN regs r ON date_diff('day', r.day, d.target) BETWEEN 0 AND 6
        |  GROUP BY 1, 2),
        |s AS (
        |  SELECT day, sum(${1L << 30} >> r) AS s, count(*) AS present
        |  FROM merged GROUP BY 1),
        |e AS (
        |  SELECT day, 64 - present AS zeros,
        |    ${709L * 4096L * (1L << 30)}
        |      // (1000 * (s + (64 - present) * ${1L << 30})) AS raw
        |  FROM s)
        |SELECT day,
        |  CAST(CASE WHEN raw <= 160 AND zeros > 0
        |    THEN ([${graft.ext.Sketches.HllLinearCounting.mkString(", ")}])[CAST(zeros AS INTEGER)]
        |    ELSE raw END AS BIGINT) AS est_distinct
        |FROM e ORDER BY day""".stripMargin,

    // portable-hash arm assignment replayed; rates are floor ppm
    "q170_ab_lift" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |v AS (SELECT user_id,
        |    CAST(concat('0x', substring(md5(concat_ws('|', '42', CAST(user_id AS VARCHAR))), 1, 14)) AS BIGINT) % 2 AS variant
        |  FROM u),
        |c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
        |SELECT v.variant, count(*) AS n_users,
        |  CAST(sum(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
        |  CAST((sum(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END) * 1000000) // count(*) AS BIGINT) AS rate_ppm
        |FROM v LEFT JOIN c USING (user_id)
        |GROUP BY v.variant ORDER BY v.variant""".stripMargin,

    // one lead window per user, pair counts, floor-ppm row normalize
    "q171_transitions" ->
      """WITH p AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |c AS (SELECT from_type, to_type, count(*) AS cnt FROM p
        |  WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT from_type, sum(cnt) AS tot FROM c GROUP BY 1)
        |SELECT c.from_type, c.to_type, c.cnt,
        |  CAST((c.cnt * 1000000) // t.tot AS BIGINT) AS p_ppm
        |FROM c JOIN t USING (from_type)
        |ORDER BY c.from_type, c.to_type""".stripMargin,

    // first-occurrence doc per BIGRAM, quartile ranges over the id span
    "q193_vocab_growth" ->
      """WITH tk0 AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS tokens
        |  FROM documents),
        |tk AS (
        |  SELECT doc_id, unnest(CASE WHEN len(tokens) >= 2
        |    THEN list_transform(range(1, len(tokens)), i -> array_to_string(tokens[i:i+1], ' '))
        |    ELSE [] END) AS t FROM tk0),
        |fd AS (SELECT t, min(doc_id) AS first FROM tk GROUP BY 1),
        |b AS (SELECT min(doc_id) AS lo, max(doc_id) AS hi FROM documents),
        |q AS (SELECT CAST(least(4, ((first - lo) * 4) // (hi - lo + 1) + 1) AS BIGINT) AS quartile
        |  FROM fd CROSS JOIN b),
        |g AS (SELECT quartile, count(*) AS new_words FROM q GROUP BY 1)
        |SELECT quartile, new_words,
        |  CAST(sum(new_words) OVER (ORDER BY quartile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_vocab
        |FROM g ORDER BY quartile""".stripMargin,

    // the q39 fingerprint clusters rolled to a size distribution,
    // over the same mirror-planted corpus
    "q194_dup_size_dist" ->
      """WITH d AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 100000, text FROM documents WHERE doc_id % 50 = 0
        |  UNION ALL SELECT doc_id + 200000, text FROM documents WHERE doc_id = 0),
        |c AS (
        |  SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        |    count(*) AS cluster_size
        |  FROM d GROUP BY 1)
        |SELECT cluster_size, count(*) AS n_clusters
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    // floor shares + largest-remainder top-up, slots from the floor
    // deficit — sums to exactly 1000 by construction
    "q195_source_share" ->
      """WITH c AS (
        |  SELECT source,
        |    CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(string_split_regex(trim(text), '\s+')) END) AS BIGINT) AS tokens
        |  FROM documents GROUP BY 1),
        |t AS (SELECT CAST(sum(tokens) AS BIGINT) AS tot FROM c),
        |f AS (SELECT source, tokens,
        |    (tokens * 1000) // t.tot AS fl, (tokens * 1000) % t.tot AS rem
        |  FROM c CROSS JOIN t),
        |r AS (SELECT source, tokens, fl,
        |    row_number() OVER (ORDER BY rem DESC, source) AS rk,
        |    (SELECT 1000 - sum(fl) FROM f) AS slots FROM f)
        |SELECT source, tokens,
        |  CAST(fl + CASE WHEN rk <= slots THEN 1 ELSE 0 END AS BIGINT) AS share_permille
        |FROM r ORDER BY source""".stripMargin,

    // each row-level check a conditional count, uniqueness a key-group
    // aggregate — one report row per constraint
    "q196_constraints" ->
      """WITH n AS (SELECT count(*) AS n_rows FROM orders),
        |v AS (
        |  SELECT 'not_null(o_custkey)' AS c,
        |    (SELECT count(*) FROM orders WHERE o_custkey IS NULL) AS nv
        |  UNION ALL SELECT 'in_range(o_totalprice)',
        |    (SELECT count(*) FROM orders WHERE o_totalprice IS NULL OR o_totalprice < 0.0 OR o_totalprice > 600000.0)
        |  UNION ALL SELECT 'in_set(o_orderstatus)',
        |    (SELECT count(*) FROM orders WHERE o_orderstatus IS NULL OR o_orderstatus NOT IN ('F', 'O', 'P'))
        |  UNION ALL SELECT 'matches(o_orderpriority)',
        |    (SELECT count(*) FROM orders WHERE o_orderpriority IS NULL OR NOT regexp_matches(o_orderpriority, '^[1-5]-'))
        |  UNION ALL SELECT 'satisfies(date_bounds)',
        |    (SELECT count(*) FROM orders WHERE NOT coalesce(o_orderdate >= TIMESTAMP '1990-01-01' AND o_orderdate < TIMESTAMP '2010-01-01', false))
        |  UNION ALL SELECT 'unique(o_orderkey)',
        |    (SELECT CAST(coalesce(sum(g.c - 1), 0) AS BIGINT)
        |     FROM (SELECT count(*) AS c FROM orders GROUP BY o_orderkey) g))
        |SELECT v.c AS "constraint", n.n_rows, CAST(v.nv AS BIGINT) AS n_violations,
        |  CAST(CASE WHEN v.nv = 0 THEN 1 ELSE 0 END AS BIGINT) AS passed
        |FROM v CROSS JOIN n ORDER BY "constraint"""".stripMargin,

    // the textbook a<b<c three-way self-join on the normalized
    // undirected edge set — the degree-ordered plan must enumerate
    // exactly these triangles
    "q197_triangles" ->
      """WITH raw AS (
        |  SELECT doc_id % 101 AS s, (doc_id * 31 + 7) % 101 AS d FROM documents
        |  UNION ALL
        |  SELECT doc_id % 101, (doc_id * 57 + 13) % 101 FROM documents),
        |e AS (SELECT DISTINCT least(s, d) AS u, greatest(s, d) AS v
        |  FROM raw WHERE s <> d)
        |SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |FROM e e1
        |JOIN e e2 ON e2.u = e1.v
        |JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
        |ORDER BY a, b, c""".stripMargin,

    // three plain ntile() windows over the per-customer rollup —
    // the distributed cut must agree tile for tile
    "q198_rfm" ->
      """WITH base AS (
        |  SELECT o_custkey,
        |    max(epoch_us(o_orderdate)) AS recency,
        |    count(*) AS frequency,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS monetary
        |  FROM orders GROUP BY 1),
        |t AS (SELECT o_custkey, recency, frequency, monetary,
        |    CAST(ntile(5) OVER (ORDER BY recency DESC, o_custkey) AS BIGINT) AS r_tile,
        |    CAST(ntile(5) OVER (ORDER BY frequency DESC, o_custkey) AS BIGINT) AS f_tile,
        |    CAST(ntile(5) OVER (ORDER BY monetary DESC, o_custkey) AS BIGINT) AS m_tile
        |  FROM base)
        |SELECT o_custkey, recency, frequency, monetary, r_tile, f_tile, m_tile,
        |  concat(r_tile, f_tile, m_tile) AS segment
        |FROM t ORDER BY o_custkey""".stripMargin,

    // QI group sizes rolled to a size histogram + at-risk flag
    "q200_k_anonymity" ->
      """WITH g AS (
        |  SELECT c_nationkey, c_mktsegment, count(*) AS sz
        |  FROM customer GROUP BY 1, 2)
        |SELECT sz AS group_size, count(*) AS n_groups,
        |  CAST(sum(sz) AS BIGINT) AS n_rows,
        |  CAST(CASE WHEN sz < 5 THEN 1 ELSE 0 END AS BIGINT) AS at_risk
        |FROM g GROUP BY sz ORDER BY group_size""".stripMargin,

    // first purchase per user, pre-conversion touches ranked, floor
    // ppm + largest-remainder credit, per-type rollup
    "q201_attribution" ->
      """WITH conv AS (
        |  SELECT user_id, min(ts) AS cts FROM events
        |  WHERE event_type = 'purchase' GROUP BY 1),
        |t AS (
        |  SELECT e.user_id, e.event_type, e.ts, e.event_id
        |  FROM events e JOIN conv c ON e.user_id = c.user_id
        |  WHERE e.event_type <> 'purchase' AND e.ts < c.cts),
        |r AS (
        |  SELECT event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rk,
        |    count(*) OVER (PARTITION BY user_id) AS n
        |  FROM t)
        |SELECT event_type, count(*) AS n_touches,
        |  CAST(sum(1000000 // n + CASE WHEN rk <= 1000000 % n THEN 1 ELSE 0 END) AS BIGINT) AS credit_ppm
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin,

    // θ from int64 sufficient statistics, sign-split division so
    // truncating (Spark div) and flooring (//) engines agree
    "q202_cuped" ->
      """WITH xy AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-15 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |v AS (SELECT *,
        |    CAST(concat('0x', substring(md5(concat_ws('|', '42', CAST(user_id AS VARCHAR))), 1, 14)) AS BIGINT) % 2 AS variant
        |  FROM xy),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(x * y) AS BIGINT) AS sxy FROM v),
        |t AS (SELECT n, sx,
        |    CASE WHEN (n * sxy - sx * sy) < 0
        |      THEN -(((-(n * sxy - sx * sy)) * 1000) // (n * sxx - sx * sx))
        |      ELSE ((n * sxy - sx * sy) * 1000) // (n * sxx - sx * sx) END AS theta_milli,
        |    (sx * 1000) // n AS xbar_milli FROM s),
        |a AS (SELECT v.variant, v.y,
        |    v.y * 1000 - (CASE WHEN t.theta_milli * (v.x * 1000 - t.xbar_milli) < 0
        |      THEN -((-(t.theta_milli * (v.x * 1000 - t.xbar_milli))) // 1000)
        |      ELSE (t.theta_milli * (v.x * 1000 - t.xbar_milli)) // 1000 END) AS adj_milli,
        |    t.theta_milli FROM v CROSS JOIN t)
        |SELECT variant, count(*) AS n_users,
        |  CAST((sum(y) * 1000) // count(*) AS BIGINT) AS mean_raw_milli,
        |  CAST(CASE WHEN sum(adj_milli) < 0
        |    THEN -((-sum(adj_milli)) // count(*))
        |    ELSE sum(adj_milli) // count(*) END AS BIGINT) AS mean_adj_milli,
        |  CAST(min(theta_milli) AS BIGINT) AS theta_milli
        |FROM a GROUP BY variant ORDER BY variant""".stripMargin,

    // whitespace words, terminal-punct sentence runs, vowel-group
    // syllables; FK milli-grade under nonneg floor division
    "q203_readability" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |      ELSE len(string_split_regex(trim(text), '\s+')) END AS words,
        |    greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS sentences,
        |    len(regexp_extract_all(lower(text), '[aeiouy]+')) AS vg
        |  FROM documents),
        |g AS (SELECT
        |    (words * 390) // sentences + (vg * 11800) // words - 15590 AS grade
        |  FROM s WHERE words > 0),
        |b AS (SELECT CASE WHEN grade < 0 THEN 0
        |    ELSE least(20, grade // 1000) END AS band, grade FROM g)
        |SELECT CAST(band AS BIGINT) AS band, count(*) AS n_docs,
        |  CAST(min(grade) AS BIGINT) AS min_grade_milli,
        |  CAST(max(grade) AS BIGINT) AS max_grade_milli
        |FROM b GROUP BY band ORDER BY band""".stripMargin,

    // per-term BM25 IEEE score replay (the q131 recipe), top-20
    // ranked, floor-ppm MRR / hit@k / recall@k arithmetic
    "q199_retrieval_eval" -> RetrievalEvalSql,

    // two serial order-statistic passes (median, MAD) + the 3.5
    // modified-z integer rule
    "q238_anomalous_days" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, n AS med FROM (
        |    SELECT event_type, n,
        |      row_number() OVER (PARTITION BY event_type ORDER BY CAST(n AS DOUBLE), day) AS rk,
        |      count(*) OVER (PARTITION BY event_type) AS c
        |    FROM daily) t
        |  WHERE rk = greatest(1, (500 * c + 999) // 1000)),
        |dev AS (SELECT d.event_type, d.day, d.n, m.med, abs(d.n - m.med) AS adev
        |  FROM daily d JOIN m USING (event_type)),
        |mad AS (SELECT event_type, adev AS mad FROM (
        |    SELECT event_type, adev,
        |      row_number() OVER (PARTITION BY event_type ORDER BY CAST(adev AS DOUBLE), day) AS rk,
        |      count(*) OVER (PARTITION BY event_type) AS c
        |    FROM dev) t
        |  WHERE rk = greatest(1, (500 * c + 999) // 1000))
        |SELECT dev.event_type, dev.day, dev.n,
        |  CAST(dev.med AS BIGINT) AS median_n, CAST(dev.adev AS BIGINT) AS abs_dev
        |FROM dev JOIN mad USING (event_type)
        |WHERE dev.adev * 1000 > 3500 * mad.mad
        |ORDER BY 1, 2""".stripMargin,

    // three cursor-chained LIMIT pages, cursors as scalar max()
    "q239_keyset_pages" ->
      """WITH p1 AS (SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_orderkey > 0 ORDER BY o_orderkey LIMIT 50),
        |c1 AS (SELECT max(o_orderkey) AS c FROM p1),
        |p2 AS (SELECT o_orderkey, o_totalprice FROM orders, c1
        |  WHERE o_orderkey > c1.c ORDER BY o_orderkey LIMIT 50),
        |c2 AS (SELECT max(o_orderkey) AS c FROM p2),
        |p3 AS (SELECT o_orderkey, o_totalprice FROM orders, c2
        |  WHERE o_orderkey > c2.c ORDER BY o_orderkey LIMIT 50)
        |SELECT o_orderkey, o_totalprice, CAST(1 AS BIGINT) AS page FROM p1
        |UNION ALL SELECT o_orderkey, o_totalprice, 2 FROM p2
        |UNION ALL SELECT o_orderkey, o_totalprice, 3 FROM p3
        |ORDER BY page, o_orderkey""".stripMargin,

    // rank() vs row_number() at the k-boundary, per group
    "q240_topk_ties" ->
      """WITH r AS (
        |  SELECT o_orderstatus, o_totalprice,
        |    rank() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC) AS rk,
        |    row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |SELECT o_orderstatus,
        |  CAST(count(CASE WHEN rk <= 3 THEN 1 END) AS BIGINT) AS n_rank_top3,
        |  CAST(count(CASE WHEN rn <= 3 THEN 1 END) AS BIGINT) AS n_rownum_top3,
        |  max(CASE WHEN rk <= 3 THEN o_totalprice END) AS top_price
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    // serial rank-sum reference: per distinct value, A-rows beat every
    // B strictly below twice and ties once; one floor ppm division
    "q241_rank_sum" ->
      """WITH e AS (
        |  SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events
        |  WHERE event_type IN ('purchase', 'click') AND value IS NOT NULL),
        |agg AS (SELECT v,
        |    sum(CASE WHEN g = 'purchase' THEN 1 ELSE 0 END) AS ca,
        |    sum(CASE WHEN g = 'click' THEN 1 ELSE 0 END) AS cb
        |  FROM e GROUP BY 1),
        |c AS (SELECT v, ca, cb, sum(cb) OVER (ORDER BY v) AS cum_b FROM agg),
        |t AS (SELECT sum(ca) AS na, sum(cb) AS nb,
        |    sum(ca * (2 * (cum_b - cb) + cb)) AS u2
        |  FROM c)
        |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  CAST(u2 AS BIGINT) AS u2,
        |  CAST((u2 * 1000000) // (2 * na * nb) AS BIGINT) AS auc_ppm
        |FROM t""".stripMargin,

    // serial KS reference: cumulative counts over the merged support,
    // max integer gap, ties to the low value, ppm after the argmax
    "q242_ks_test" ->
      """WITH e AS (
        |  SELECT lang AS g, CAST(n_chars AS BIGINT) AS v FROM documents
        |  WHERE lang IN ('en', 'fr') AND n_chars IS NOT NULL),
        |agg AS (SELECT v,
        |    sum(CASE WHEN g = 'en' THEN 1 ELSE 0 END) AS ca,
        |    sum(CASE WHEN g = 'fr' THEN 1 ELSE 0 END) AS cb
        |  FROM e GROUP BY 1),
        |c AS (SELECT v, sum(ca) OVER (ORDER BY v) AS cum_a,
        |    sum(cb) OVER (ORDER BY v) AS cum_b FROM agg),
        |t AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM agg),
        |dev AS (SELECT v, abs(cum_a * t.nb - cum_b * t.na) AS gap
        |  FROM c CROSS JOIN t),
        |sel AS (SELECT v, gap FROM dev ORDER BY gap DESC, v ASC LIMIT 1)
        |SELECT CAST(t.na AS BIGINT) AS n_a, CAST(t.nb AS BIGINT) AS n_b,
        |  CAST((sel.gap * 1000000) // (t.na * t.nb) AS BIGINT) AS d_ppm,
        |  CAST(sel.v AS BIGINT) AS at_value
        |FROM sel CROSS JOIN t""".stripMargin,

    // distinct balance bands per QI group, histogrammed by diversity
    "q243_l_diversity" ->
      """WITH g AS (
        |  SELECT c_nationkey, c_mktsegment, count(*) AS sz,
        |    count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) AS dv
        |  FROM customer GROUP BY 1, 2),
        |h AS (SELECT CAST(dv AS BIGINT) AS diversity,
        |    CAST(count(*) AS BIGINT) AS n_groups, CAST(sum(sz) AS BIGINT) AS n_rows
        |  FROM g GROUP BY 1)
        |SELECT diversity, n_groups, n_rows,
        |  CAST(CASE WHEN diversity < 2 THEN 1 ELSE 0 END AS BIGINT) AS at_risk
        |FROM h ORDER BY 1""".stripMargin,

    // the same canonical row string, 56-bit md5 hash, hugeint sum
    "q244_fingerprint" ->
      """WITH r AS (
        |  SELECT CAST(concat('0x', substring(md5(concat_ws('|', '42',
        |      concat_ws('|',
        |        coalesce(CAST(l_orderkey AS VARCHAR), '\N'),
        |        coalesce(CAST(l_partkey AS VARCHAR), '\N'),
        |        coalesce(CAST(l_suppkey AS VARCHAR), '\N'),
        |        coalesce(CAST(l_linenumber AS VARCHAR), '\N'),
        |        coalesce(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS VARCHAR), '\N'),
        |        coalesce(CAST(CAST(round(l_quantity) AS BIGINT) AS VARCHAR), '\N'),
        |        coalesce(l_returnflag, '\N'),
        |        coalesce(l_linestatus, '\N'),
        |        coalesce(CAST(CAST(l_shipdate AS DATE) AS VARCHAR), '\N')))),
        |    1, 14)) AS BIGINT) AS h
        |  FROM lineitem)
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(h) % 4611686018427387904 AS BIGINT) AS checksum
        |FROM r""".stripMargin,

    // serial weighted-quantile reference: first row whose cumulative
    // byte weight reaches ceil(500‰ · W / 1000) in (len, id) order
    "q245_weighted_median" ->
      """WITH c AS (
        |  SELECT lang, CAST(n_chars AS DOUBLE) AS q,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS w, doc_id
        |  FROM documents
        |  WHERE n_chars IS NOT NULL AND octet_length(encode(text)) > 0),
        |cum AS (SELECT lang, q, w,
        |    sum(w) OVER (PARTITION BY lang ORDER BY q, doc_id) AS cw,
        |    sum(w) OVER (PARTITION BY lang) AS wt
        |  FROM c)
        |SELECT lang, CAST(wt AS BIGINT) AS w_total, q AS q_value
        |FROM cum
        |WHERE cw >= greatest(1, (500 * wt + 999) // 1000)
        |  AND cw - w < greatest(1, (500 * wt + 999) // 1000)
        |ORDER BY lang""".stripMargin,

    "q246_media_dhash" -> DhashOracleSql,

    // the q49 scoring replay plus the label-mismatch predicate
    "q247_hard_negatives" ->
      """WITH v AS (
        |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings WHERE label IS NOT NULL),
        |n AS (SELECT vec_id, label, e, sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm FROM v),
        |q AS (SELECT vec_id AS query_id, label AS ql, e AS qe, nrm AS qn FROM n WHERE vec_id < 5),
        |scored AS (
        |  SELECT q.query_id, n.vec_id AS nn_id,
        |    list_sum(list_transform(range(1, 65), i -> (n.e[i] / n.nrm) * (q.qe[i] / q.qn))) AS cosine
        |  FROM q CROSS JOIN n WHERE n.label <> q.ql),
        |ranked AS (
        |  SELECT query_id, nn_id, cosine,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, nn_id) AS rank
        |  FROM scored)
        |SELECT query_id, nn_id, cosine, rank FROM ranked WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,

    // the same contingency arithmetic; DuckDB's Sunday-0 dayofweek
    // shimmed +1 to Spark's Sunday-1 (the q225 rule)
    "q248_chi_square" ->
      """WITH e AS (
        |  SELECT event_type AS a, CAST(dayofweek(ts) + 1 AS BIGINT) AS b
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL),
        |obs AS (SELECT a, b, count(*) AS o FROM e GROUP BY 1, 2),
        |rt AS (SELECT a, sum(o) AS r FROM obs GROUP BY 1),
        |ct AS (SELECT b, sum(o) AS c FROM obs GROUP BY 1),
        |t AS (SELECT sum(o) AS n FROM obs),
        |cells AS (
        |  SELECT (coalesce(o.o, 0) * t.n - g.r * g.c) AS dd, g.r, g.c, t.n
        |  FROM (SELECT rt.a, rt.r, ct.b, ct.c FROM rt CROSS JOIN ct) g
        |  LEFT JOIN obs o ON o.a = g.a AND o.b = g.b CROSS JOIN t),
        |s AS (SELECT sum((dd * dd * 1000000) // (r * c * n)) AS chi2_ppm,
        |    max(n) AS n FROM cells),
        |dims AS (SELECT count(DISTINCT a) AS a_levels,
        |    count(DISTINCT b) AS b_levels FROM obs)
        |SELECT CAST(s.n AS BIGINT) AS n,
        |  CAST(dims.a_levels AS BIGINT) AS a_levels,
        |  CAST(dims.b_levels AS BIGINT) AS b_levels,
        |  CAST((dims.a_levels - 1) * (dims.b_levels - 1) AS BIGINT) AS dof,
        |  CAST(s.chi2_ppm AS BIGINT) AS chi2_ppm
        |FROM s CROSS JOIN dims""".stripMargin,

    // serial impact-index reference: per-term window rank replays the
    // heap's (tf DESC, doc ASC) order; postings string_agg'd in rank order
    "q249_impact_index" ->
      """WITH tk AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS tokens
        |  FROM documents),
        |tok AS (SELECT doc_id, unnest(tokens) AS t FROM tk),
        |tf AS (SELECT t AS term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2),
        |rk AS (SELECT term, doc_id, tf,
        |    row_number() OVER (PARTITION BY term ORDER BY tf DESC, doc_id) AS rn
        |  FROM tf),
        |ag AS (SELECT term, CAST(count(*) AS BIGINT) AS df,
        |    CAST(sum(tf) AS BIGINT) AS total_tf FROM tf GROUP BY 1),
        |po AS (SELECT term,
        |    string_agg(concat(CAST(doc_id AS VARCHAR), ':', CAST(tf AS VARCHAR)), ',' ORDER BY rn) AS postings
        |  FROM rk WHERE rn <= 8 GROUP BY 1)
        |SELECT ag.term, ag.df, ag.total_tf, po.postings
        |FROM ag JOIN po USING (term) ORDER BY term""".stripMargin,

    // serial rank reference under ascending (n_chars, doc_id)
    "q250_percentile_norm" ->
      """WITH r AS (
        |  SELECT doc_id, n_chars,
        |    CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS rank,
        |    count(*) OVER () AS n
        |  FROM documents WHERE n_chars IS NOT NULL)
        |SELECT doc_id, n_chars, rank,
        |  CAST(CASE WHEN n <= 1 THEN 0
        |    ELSE ((rank - 1) * 1000000) // (n - 1) END AS BIGINT) AS pct_ppm
        |FROM r ORDER BY doc_id""".stripMargin,

    // the q44 CTEs with directed floor-ppm containments per pair
    "q251_containment" ->
      """WITH tk AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS tokens FROM documents),
        |sh AS (
        |  SELECT doc_id, CASE WHEN len(tokens) >= 3 THEN list_distinct(list_transform(range(1, len(tokens) - 1), i -> array_to_string(tokens[i:i+2], ' '))) ELSE [] END AS s FROM tk),
        |ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |kept AS (
        |  SELECT doc_id, g FROM (
        |    SELECT doc_id, g, count(*) OVER (PARTITION BY g) AS df FROM ex)
        |  WHERE df <= 100),
        |sized AS (SELECT doc_id, g, count(*) OVER (PARTITION BY doc_id) AS n FROM kept),
        |pairs AS (
        |  SELECT ea.doc_id AS a, eb.doc_id AS b, ea.n AS na, eb.n AS nb, count(*) AS c
        |  FROM sized ea JOIN sized eb ON ea.g = eb.g AND ea.doc_id < eb.doc_id
        |  GROUP BY 1, 2, 3, 4)
        |SELECT a, b, CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
        |  CAST(c AS BIGINT) AS n_shared,
        |  CAST((c * 1000000) // na AS BIGINT) AS cont_a_ppm,
        |  CAST((c * 1000000) // nb AS BIGINT) AS cont_b_ppm
        |FROM pairs
        |WHERE (c * 1000000) // na >= 500000 OR (c * 1000000) // nb >= 500000
        |ORDER BY a, b""".stripMargin,

    "q252_mmr_rerank" -> MmrOracleSql,

    // doubled midranks from value-aggregate cumulative counts; the
    // q180 double recipe term for term
    "q253_spearman" ->
      """WITH c AS (
        |  SELECT CAST(round(l_quantity) AS BIGINT) AS x,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS y
        |  FROM lineitem WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
        |rx AS (SELECT x AS v, count(*) AS cnt FROM c GROUP BY 1),
        |rxc AS (SELECT v, 2 * (sum(cnt) OVER (ORDER BY v) - cnt) + cnt + 1 AS r2 FROM rx),
        |ry AS (SELECT y AS v, count(*) AS cnt FROM c GROUP BY 1),
        |ryc AS (SELECT v, 2 * (sum(cnt) OVER (ORDER BY v) - cnt) + cnt + 1 AS r2 FROM ry),
        |j AS (SELECT CAST(rxc.r2 AS HUGEINT) AS a, CAST(ryc.r2 AS HUGEINT) AS b
        |  FROM c JOIN rxc ON c.x = rxc.v JOIN ryc ON c.y = ryc.v),
        |t AS (SELECT CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(a) AS DOUBLE) AS sa, CAST(sum(b) AS DOUBLE) AS sb,
        |    CAST(sum(a * b) AS DOUBLE) AS pab,
        |    CAST(sum(a * a) AS DOUBLE) AS paa,
        |    CAST(sum(b * b) AS DOUBLE) AS pbb
        |  FROM j)
        |SELECT CAST(n AS BIGINT) AS n,
        |  CASE WHEN sqrt(n * paa - sa * sa) * sqrt(n * pbb - sb * sb) = 0 THEN NULL
        |    ELSE (n * pab - sa * sb) /
        |      (sqrt(n * paa - sa * sa) * sqrt(n * pbb - sb * sb)) END AS spearman
        |FROM t""".stripMargin,

    // full margin replay: both directional k-NN sums from the same
    // cross scores (products are commutative-exact), one division,
    // forward-best with low-id ties
    "q254_margin_mine" ->
      """WITH v AS (
        |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings),
        |n AS (SELECT vec_id, label, e, sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm FROM v),
        |aa AS (SELECT vec_id, e, nrm FROM n WHERE label = 0),
        |bb AS (SELECT vec_id, e, nrm FROM n WHERE label = 1),
        |sc AS (
        |  SELECT aa.vec_id AS a_id, bb.vec_id AS b_id,
        |    list_sum(list_transform(range(1, 65), i -> (bb.e[i] / bb.nrm) * (aa.e[i] / aa.nrm))) AS cosine
        |  FROM aa CROSS JOIN bb),
        |fwd AS (SELECT a_id, b_id, cosine,
        |    row_number() OVER (PARTITION BY a_id ORDER BY cosine DESC, b_id) AS rk
        |  FROM sc),
        |f4 AS (SELECT a_id, b_id, cosine FROM fwd WHERE rk <= 4),
        |sa AS (SELECT a_id, sum(cosine) AS s FROM f4 GROUP BY 1),
        |bwd AS (SELECT b_id, a_id, cosine,
        |    row_number() OVER (PARTITION BY b_id ORDER BY cosine DESC, a_id) AS rk
        |  FROM sc),
        |sb AS (SELECT b_id, sum(cosine) AS s FROM bwd WHERE rk <= 4 GROUP BY 1),
        |m AS (
        |  SELECT f4.a_id, f4.b_id, f4.cosine,
        |    (8.0 * f4.cosine) / (sa.s + sb.s) AS margin
        |  FROM f4 JOIN sa USING (a_id) JOIN sb USING (b_id)
        |  WHERE (8.0 * f4.cosine) / (sa.s + sb.s) > 1.05),
        |best AS (SELECT a_id, b_id, cosine, margin,
        |    row_number() OVER (PARTITION BY a_id ORDER BY margin DESC, b_id) AS rn
        |  FROM m)
        |SELECT a_id, b_id, cosine, margin FROM best WHERE rn = 1
        |ORDER BY a_id""".stripMargin,

    // serial rank + the same ceil-rank rule per quantile
    "q255_quantile_bands" ->
      """WITH c AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v, event_id
        |  FROM events WHERE value IS NOT NULL),
        |r AS (SELECT event_type, v,
        |    row_number() OVER (PARTITION BY event_type ORDER BY v, event_id) AS rk,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM c),
        |q(q_permille) AS (VALUES (500), (900), (990))
        |SELECT r.event_type, CAST(q.q_permille AS BIGINT) AS q_permille,
        |  CAST(r.n AS BIGINT) AS n, CAST(r.v AS DOUBLE) AS q_value
        |FROM r JOIN q ON r.rk = greatest(1, (q.q_permille * r.n + 999) // 1000)
        |ORDER BY event_type, q_permille""".stripMargin,

    // the q233 lang-ID replay collapsed to the kappa integers
    "q256_cohens_kappa" ->
      s"""WITH tk AS (
        |  SELECT doc_id, lang, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS tokens FROM documents),
        |r AS (
        |  SELECT doc_id, lang,
        |    $LangScoreCols
        |  FROM tk),
        |p AS (SELECT lang AS a, $LangArgmaxSql AS b FROM r),
        |obs AS (SELECT a, b, count(*) AS o FROM p GROUP BY 1, 2),
        |t AS (SELECT sum(o) AS n,
        |    sum(CASE WHEN a = b THEN o ELSE 0 END) AS d FROM obs),
        |rt AS (SELECT a AS k, sum(o) AS r FROM obs GROUP BY 1),
        |ct AS (SELECT b AS k, sum(o) AS c FROM obs GROUP BY 1),
        |s AS (SELECT coalesce(sum(rt.r * ct.c), 0) AS s FROM rt JOIN ct USING (k)),
        |f AS (SELECT t.n, t.d, (t.n * t.d - s.s) * 1000000 AS num,
        |    t.n * t.n - s.s AS den FROM t CROSS JOIN s)
        |SELECT CAST(n AS BIGINT) AS n, CAST(d AS BIGINT) AS agree,
        |  -- DuckDB // truncates toward zero; kappa can be NEGATIVE and
        |  -- the engine floors, so floor via the nonneg-mod identity
        |  CAST(CASE WHEN den = 0 THEN NULL
        |    ELSE (num - ((num % den) + den) % den) // den END AS BIGINT) AS kappa_ppm
        |FROM f""".stripMargin,

    // the q114 gram CTEs, collapsed to per-doc counts (sp unused)
    "q257_novelty" ->
      s"""WITH $DupSpanCtes,
        |tot AS (SELECT doc_id, count(*) AS n_grams FROM gg GROUP BY 1),
        |dd AS (SELECT doc_id, count(*) AS n_dup FROM dup GROUP BY 1)
        |SELECT d.doc_id,
        |  CAST(coalesce(t.n_grams, 0) AS BIGINT) AS n_grams,
        |  CAST(coalesce(dd.n_dup, 0) AS BIGINT) AS n_dup,
        |  CAST(CASE WHEN t.n_grams IS NULL THEN NULL
        |    ELSE ((t.n_grams - coalesce(dd.n_dup, 0)) * 1000000) // t.n_grams
        |    END AS BIGINT) AS novelty_ppm
        |FROM documents d
        |LEFT JOIN tot t USING (doc_id) LEFT JOIN dd USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    // per-user half sums, exact cross-product mean compare, floor-milli z
    "q258_sign_test" ->
      """WITH e AS (
        |  SELECT user_id,
        |    CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN 'h1' ELSE 'h2' END AS half,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE value IS NOT NULL),
        |p AS (
        |  SELECT user_id,
        |    sum(CASE WHEN half = 'h1' THEN cents END) AS sa,
        |    count(CASE WHEN half = 'h1' THEN 1 END) AS na,
        |    sum(CASE WHEN half = 'h2' THEN cents END) AS sb,
        |    count(CASE WHEN half = 'h2' THEN 1 END) AS nb
        |  FROM e GROUP BY 1),
        |s AS (
        |  SELECT
        |    sum(CASE WHEN sb * na - sa * nb > 0 THEN 1 ELSE 0 END) AS n_pos,
        |    sum(CASE WHEN sb * na - sa * nb < 0 THEN 1 ELSE 0 END) AS n_neg,
        |    sum(CASE WHEN sb * na - sa * nb = 0 THEN 1 ELSE 0 END) AS n_tie
        |  FROM p WHERE na > 0 AND nb > 0)
        |SELECT CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
        |  CAST(n_tie AS BIGINT) AS n_tie,
        |  CAST(CASE WHEN n_pos + n_neg = 0 THEN NULL
        |    ELSE floor((1000.0 * CAST(n_pos - n_neg AS DOUBLE)) /
        |      sqrt(CAST(n_pos + n_neg AS DOUBLE))) END AS BIGINT) AS z_milli
        |FROM s""".stripMargin,

    // every chain label in closed form: cluster = id − id mod 4
    "q259_cc_distributed" ->
      """SELECT CAST(r.range AS BIGINT) AS id,
        |  CAST(r.range - r.range % 4 AS BIGINT) AS cluster_id
        |FROM range(0, 1420000) r ORDER BY id""".stripMargin,

    // the q172 register replay without the rolling window: the direct
    // one-shot daily sketch — what an idempotent ingest must equal
    // even after the duplicated batch delivery
    "q260_sketch_ingest_replay" ->
      s"""WITH h AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(concat('0x', substring(md5(concat_ws('|', '42', CAST(user_id AS VARCHAR))), 1, 14)) AS BIGINT) AS h
        |  FROM events),
        |b AS (
        |  SELECT day, h & 63 AS b,
        |    CASE WHEN (h >> 6) = 0 THEN 30
        |         ELSE least(30, 51 - length(bin(h >> 6))) END AS rho
        |  FROM h),
        |regs AS (SELECT day, b, max(rho) AS r FROM b GROUP BY 1, 2),
        |s AS (
        |  SELECT day, sum(${1L << 30} >> r) AS s, count(*) AS present
        |  FROM regs GROUP BY 1),
        |e AS (
        |  SELECT day, 64 - present AS zeros,
        |    ${709L * 4096L * (1L << 30)}
        |      // (1000 * (s + (64 - present) * ${1L << 30})) AS raw
        |  FROM s)
        |SELECT day,
        |  CAST(CASE WHEN raw <= 160 AND zeros > 0
        |    THEN ([${graft.ext.Sketches.HllLinearCounting.mkString(", ")}])[CAST(zeros AS INTEGER)]
        |    ELSE raw END AS BIGINT) AS est_distinct
        |FROM e ORDER BY day""".stripMargin,

    // warm-start chains land on the identical closed form
    "q262_cc_warm_start" ->
      """SELECT CAST(r.range AS BIGINT) AS id,
        |  CAST(r.range - r.range % 4 AS BIGINT) AS cluster_id
        |FROM range(0, 100000) r ORDER BY id""".stripMargin,

    // exact HUGEINT moments, then the IDENTICAL double expression
    // order as the engine (every op IEEE correctly-rounded)
    "q263_welch_t" ->
      """WITH e AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE value IS NOT NULL AND event_type IN ('click', 'view')),
        |a AS (
        |  SELECT
        |    count(CASE WHEN event_type = 'click' THEN 1 END) AS na,
        |    sum(CASE WHEN event_type = 'click' THEN CAST(cents AS HUGEINT) END) AS sa,
        |    sum(CASE WHEN event_type = 'click' THEN CAST(cents AS HUGEINT) * cents END) AS qa,
        |    count(CASE WHEN event_type = 'view' THEN 1 END) AS nb,
        |    sum(CASE WHEN event_type = 'view' THEN CAST(cents AS HUGEINT) END) AS sb,
        |    sum(CASE WHEN event_type = 'view' THEN CAST(cents AS HUGEINT) * cents END) AS qb
        |  FROM e),
        |d AS (
        |  SELECT na, nb,
        |    CAST(na AS DOUBLE) AS nad, CAST(sa AS DOUBLE) AS sad, CAST(qa AS DOUBLE) AS qad,
        |    CAST(nb AS DOUBLE) AS nbd, CAST(sb AS DOUBLE) AS sbd, CAST(qb AS DOUBLE) AS qbd
        |  FROM a),
        |v AS (
        |  SELECT *,
        |    (nad * qad - sad * sad) / (nad * (nad - 1.0)) AS va,
        |    (nbd * qbd - sbd * sbd) / (nbd * (nbd - 1.0)) AS vb
        |  FROM d),
        |w AS (SELECT *, va / nad AS sea, vb / nbd AS seb FROM v)
        |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  sad / nad AS mean_a, sbd / nbd AS mean_b,
        |  CASE WHEN na > 1 AND nb > 1 AND (va + vb) > 0
        |    THEN CAST(floor(1000.0 * ((sad / nad - sbd / nbd) / sqrt(sea + seb))) AS BIGINT)
        |    ELSE NULL END AS t_milli,
        |  CASE WHEN na > 1 AND nb > 1 AND (va + vb) > 0
        |    THEN CAST(floor(1000.0 * (((sea + seb) * (sea + seb)) /
        |      (sea * sea / (nad - 1.0) + seb * seb / (nbd - 1.0)))) AS BIGINT)
        |    ELSE NULL END AS df_milli
        |FROM w""".stripMargin,

    // daily-series pairwise slopes, each floored through the signed
    // shim (DuckDB // truncates; the engine floors toward −∞), low
    // median = rank ⌊(m+1)/2⌋ order statistic
    "q264_theil_sen" ->
      """WITH dly AS (
        |  SELECT event_type, CAST(date_part('day', ts) AS BIGINT) AS day,
        |    sum(CAST(round(value * 100) AS BIGINT)) AS cents
        |  FROM events GROUP BY 1, 2),
        |p AS (
        |  SELECT a.event_type,
        |    ((CAST(b.cents AS HUGEINT) - a.cents) * 1000000
        |      - ((((CAST(b.cents AS HUGEINT) - a.cents) * 1000000) % (b.day - a.day))
        |         + (b.day - a.day)) % (b.day - a.day)) // (b.day - a.day) AS slope,
        |    a.day AS x1, b.day AS x2
        |  FROM dly a JOIN dly b ON b.event_type = a.event_type AND b.day > a.day),
        |r AS (SELECT event_type, slope,
        |    row_number() OVER (PARTITION BY event_type ORDER BY slope, x1, x2) AS rk,
        |    count(*) OVER (PARTITION BY event_type) AS m
        |  FROM p)
        |SELECT event_type, CAST(m AS BIGINT) AS n_pairs, CAST(slope AS BIGINT) AS slope_ppm
        |FROM r WHERE rk = (m + 1) // 2
        |ORDER BY event_type""".stripMargin,

    // per-lag pair join on the daily series, exact HUGEINT sufficient
    // stats, the q253 double expression term for term
    "q265_acf" ->
      """WITH dly AS (
        |  SELECT event_type, CAST(date_part('day', ts) AS BIGINT) AS day, count(*) AS v
        |  FROM events GROUP BY 1, 2),
        |l(lag) AS (VALUES (1), (2), (3)),
        |p AS (
        |  SELECT a.event_type, l.lag, CAST(a.v AS HUGEINT) AS x, CAST(b.v AS HUGEINT) AS y
        |  FROM dly a CROSS JOIN l JOIN dly b
        |    ON b.event_type = a.event_type AND b.day = a.day + l.lag),
        |t AS (
        |  SELECT event_type, lag, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
        |  FROM p GROUP BY 1, 2),
        |d AS (
        |  SELECT event_type, lag, n,
        |    CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
        |    CAST(sxy AS DOUBLE) AS sxyd, CAST(sxx AS DOUBLE) AS sxxd, CAST(syy AS DOUBLE) AS syyd
        |  FROM t),
        |f AS (
        |  SELECT event_type, lag, n,
        |    sqrt(nd * sxxd - sxd * sxd) * sqrt(nd * syyd - syd * syd) AS den,
        |    nd * sxyd - sxd * syd AS num
        |  FROM d)
        |SELECT event_type, CAST(lag AS BIGINT) AS lag, CAST(n AS BIGINT) AS n,
        |  CASE WHEN den = 0 THEN NULL ELSE num / den END AS acf
        |FROM f ORDER BY event_type, lag""".stripMargin,

    // the engine's window pass replayed: low-median per key, equal
    // values dropped, runs from sign changes, IEEE z in floor milli
    "q266_runs_test" ->
      """WITH dly AS (
        |  SELECT event_type, CAST(date_part('day', ts) AS BIGINT) AS day,
        |    sum(CAST(round(value * 100) AS BIGINT)) AS cents
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT event_type, day, cents,
        |    row_number() OVER (PARTITION BY event_type ORDER BY cents, day) AS rk,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM dly),
        |med AS (SELECT event_type, cents AS med FROM r WHERE rk = (n + 1) // 2),
        |sg AS (
        |  SELECT d.event_type, d.day, CASE WHEN d.cents > m.med THEN 1 ELSE 0 END AS up
        |  FROM dly d JOIN med m USING (event_type) WHERE d.cents <> m.med),
        |ch AS (
        |  SELECT event_type, up,
        |    CASE WHEN lag(up) OVER (PARTITION BY event_type ORDER BY day) IS NULL THEN 0
        |         WHEN lag(up) OVER (PARTITION BY event_type ORDER BY day) <> up THEN 1
        |         ELSE 0 END AS chg
        |  FROM sg),
        |a AS (
        |  SELECT event_type, sum(up) AS n1, sum(1 - up) AS n2, sum(chg) + 1 AS runs
        |  FROM ch GROUP BY 1),
        |d2 AS (
        |  SELECT event_type, n1, n2, runs,
        |    CAST(n1 AS DOUBLE) AS n1d, CAST(n2 AS DOUBLE) AS n2d
        |  FROM a),
        |f AS (
        |  SELECT event_type, n1, n2, runs, n1d, n2d,
        |    n1d + n2d AS nd, 2.0 * n1d * n2d AS p2
        |  FROM d2),
        |g AS (
        |  SELECT *, 1.0 + p2 / nd AS e,
        |    (p2 * (p2 - nd)) / (nd * nd * (nd - 1.0)) AS vr
        |  FROM f)
        |SELECT event_type, CAST(n1 AS BIGINT) AS n_above, CAST(n2 AS BIGINT) AS n_below,
        |  CAST(runs AS BIGINT) AS runs,
        |  CASE WHEN n1 > 0 AND n2 > 0 AND n1 + n2 > 2 AND vr > 0
        |    THEN CAST(floor(1000.0 * (CAST(runs AS DOUBLE) - e) / sqrt(vr)) AS BIGINT)
        |    ELSE NULL END AS z_milli
        |FROM g ORDER BY event_type""".stripMargin,

    // exact rational TV replay: present-value terms summed in
    // HUGEINT, absent mass added arithmetically, one floor division
    "q267_t_closeness" ->
      """WITH b AS (
        |  SELECT c_mktsegment, c_nationkey,
        |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS v
        |  FROM customer WHERE c_acctbal IS NOT NULL),
        |g AS (SELECT v, count(*) AS gc FROM b GROUP BY 1),
        |-- "tot", not "N": DuckDB resolves identifiers case-insensitively
        |-- too, so N would silently bind to the per-group n
        |nn AS (SELECT CAST(sum(gc) AS HUGEINT) AS tot FROM g),
        |c AS (SELECT c_mktsegment, c_nationkey, v, count(*) AS c FROM b GROUP BY 1, 2, 3),
        |cn AS (SELECT c.*,
        |    sum(c.c) OVER (PARTITION BY c_mktsegment, c_nationkey) AS n
        |  FROM c),
        |j AS (SELECT cn.*, g.gc, nn.tot FROM cn JOIN g USING (v) CROSS JOIN nn),
        |p AS (
        |  SELECT c_mktsegment, c_nationkey, min(n) AS n, min(tot) AS tot,
        |    sum(abs(CAST(c AS HUGEINT) * tot - CAST(gc AS HUGEINT) * n)) AS present,
        |    sum(gc) AS gmatch
        |  FROM j GROUP BY 1, 2),
        |f AS (
        |  SELECT c_mktsegment, c_nationkey, n,
        |    present + (tot - gmatch) * CAST(n AS HUGEINT) AS num,
        |    2 * CAST(n AS HUGEINT) * tot AS den
        |  FROM p)
        |SELECT c_mktsegment, c_nationkey, CAST(n AS BIGINT) AS n,
        |  CAST((num * 1000000) // den AS BIGINT) AS tv_ppm
        |FROM f ORDER BY c_mktsegment, c_nationkey""".stripMargin,

    // full sketch replay: per-group 256-min sets over the portable
    // md5 fraction, k-min of the union, coincidence count, the
    // (k−1)/f_k estimator — every double op in engine order
    "q268_kmv_intersect" ->
      """WITH v AS (
        |  SELECT DISTINCT o_orderpriority AS g, CAST(o_custkey AS VARCHAR) AS val
        |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')),
        |h AS (
        |  SELECT g, val,
        |    CAST(CAST(concat('0x', substring(md5(concat_ws('|', '42', val)), 1, 14)) AS BIGINT) AS DOUBLE)
        |      / 72057594037927936.0 AS frac
        |  FROM v),
        |r AS (SELECT g, val, frac,
        |    row_number() OVER (PARTITION BY g ORDER BY frac, val) AS rk
        |  FROM h),
        |sa AS (SELECT val, frac FROM r WHERE g = '1-URGENT' AND rk <= 256),
        |sb AS (SELECT val, frac FROM r WHERE g = '2-HIGH' AND rk <= 256),
        |u0 AS (SELECT DISTINCT frac, val FROM (SELECT * FROM sa UNION ALL SELECT * FROM sb)),
        |u AS (SELECT frac, val, row_number() OVER (ORDER BY frac, val) AS rk FROM u0),
        |uk AS (SELECT * FROM u WHERE rk <= 256),
        |m AS (
        |  SELECT count(*) AS n_both FROM uk
        |  WHERE EXISTS (SELECT 1 FROM sa WHERE sa.val = uk.val AND sa.frac = uk.frac)
        |    AND EXISTS (SELECT 1 FROM sb WHERE sb.val = uk.val AND sb.frac = uk.frac)),
        |t AS (
        |  SELECT (SELECT count(*) FROM sa) AS n_a_set,
        |    (SELECT count(*) FROM sb) AS n_b_set,
        |    (SELECT count(*) FROM uk) AS nu,
        |    (SELECT n_both FROM m) AS n_both,
        |    (SELECT frac FROM uk WHERE rk = 256) AS fk),
        |e AS (
        |  SELECT *, CASE WHEN nu < 256 THEN CAST(nu AS DOUBLE)
        |    ELSE 255.0 / fk END AS est_union
        |  FROM t)
        |SELECT CAST(n_a_set AS BIGINT) AS n_a_set, CAST(n_b_set AS BIGINT) AS n_b_set,
        |  CAST(nu AS BIGINT) AS n_union_set, CAST(n_both AS BIGINT) AS n_both,
        |  CAST((n_both * 1000000) // nu AS BIGINT) AS jaccard_ppm,
        |  est_union,
        |  (CAST(n_both AS DOUBLE) / CAST(nu AS DOUBLE)) * est_union AS est_intersection
        |FROM e""".stripMargin,

    // the q256 tokenization, global counts, serial top-64 rank, exact
    // cnt·rank/cnt(1) floor ppm
    "q269_zipf_profile" ->
      """WITH tk AS (
        |  SELECT list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS toks
        |  FROM documents),
        |t AS (SELECT unnest(toks) AS tok FROM tk),
        |c AS (SELECT tok, count(*) AS cnt FROM t GROUP BY 1),
        |r AS (SELECT tok, cnt, row_number() OVER (ORDER BY cnt DESC, tok) AS rank FROM c),
        |top AS (SELECT * FROM r WHERE rank <= 64),
        |c1 AS (SELECT max(cnt) AS c1 FROM top)
        |SELECT CAST(rank AS BIGINT) AS rank, tok AS token, CAST(cnt AS BIGINT) AS cnt,
        |  CAST((CAST(cnt AS HUGEINT) * rank * 1000000) // c1 AS BIGINT) AS zipf_ppm
        |FROM top CROSS JOIN c1 ORDER BY rank""".stripMargin,

    // deg-capped shared-part pairs, per-term 10⁶//deg (positive:
    // truncation == floor), top-20 with the full tie-break
    "q270_link_predict" ->
      """WITH e AS (
        |  SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem
        |  WHERE l_suppkey IS NOT NULL AND l_partkey IS NOT NULL),
        |d AS (SELECT p, count(*) AS deg FROM e GROUP BY 1
        |  HAVING count(*) BETWEEN 2 AND 64),
        |g AS (SELECT e.s, e.p, d.deg FROM e JOIN d USING (p)),
        |pr AS (SELECT a.s AS left_a, b.s AS left_b, a.deg
        |  FROM g a JOIN g b ON a.p = b.p AND a.s < b.s),
        |ag AS (SELECT left_a, left_b, count(*) AS n_shared,
        |    sum(1000000 // deg) AS ra_ppm
        |  FROM pr GROUP BY 1, 2)
        |SELECT left_a, left_b, CAST(n_shared AS BIGINT) AS n_shared,
        |  CAST(ra_ppm AS BIGINT) AS ra_ppm
        |FROM ag ORDER BY ra_ppm DESC, left_a, left_b LIMIT 20""".stripMargin,

    // full bootstrap replay: the same (a, b) 56-bit halves, the same
    // h_r = (a + r·b) mod 2^56 family, the same 8 CDF thresholds, the
    // same order-statistic ranks
    "q271_poisson_bootstrap" ->
      s"""WITH base AS (
        |  SELECT CAST(round(value * 100) AS BIGINT) AS v,
        |    CAST(concat('0x', substring(md5(concat_ws('|', '42', CAST(event_id AS VARCHAR))), 1, 14)) AS BIGINT) AS a,
        |    CAST(concat('0x', substring(md5(concat_ws('|', '42', CAST(event_id AS VARCHAR))), 17, 14)) AS BIGINT) AS b
        |  FROM events WHERE value IS NOT NULL),
        |rep AS (
        |  SELECT v, a, b, CAST(r.range AS BIGINT) AS r
        |  FROM base CROSS JOIN range(0, 200) r),
        |h AS (SELECT v, r,
        |    (CAST(a AS HUGEINT) + r * CAST(b AS HUGEINT)) % 72057594037927936 AS hv
        |  FROM rep),
        |w AS (SELECT v, r,
        |    ${graft.ext.Sampling.PoissonThresholds.map(t =>
              s"(CASE WHEN hv >= $t THEN 1 ELSE 0 END)").mkString(" + ")} AS w
        |  FROM h),
        |pr AS (SELECT r, sum(w) AS sw, sum(CAST(w AS HUGEINT) * v) AS swv
        |  FROM w GROUP BY 1 HAVING sum(w) > 0),
        |m AS (SELECT r, CAST(swv AS DOUBLE) / CAST(sw AS DOUBLE) AS m FROM pr),
        |rk AS (SELECT r, m, row_number() OVER (ORDER BY m, r) AS rk,
        |    count(*) OVER () AS bn FROM m),
        |ci AS (SELECT
        |    min(CASE WHEN rk = greatest(1, CAST(floor(bn * 25 / 1000.0) AS BIGINT)) THEN m END) AS ci_lo,
        |    min(CASE WHEN rk = bn + 1 - greatest(1, CAST(floor(bn * 25 / 1000.0) AS BIGINT)) THEN m END) AS ci_hi,
        |    min(bn) AS be FROM rk),
        |tot AS (SELECT count(*) AS n_rows,
        |    CAST(sum(CAST(v AS HUGEINT)) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean
        |  FROM base)
        |SELECT CAST(n_rows AS BIGINT) AS n_rows, mean, CAST(be AS BIGINT) AS b,
        |  ci_lo, ci_hi
        |FROM tot CROSS JOIN ci""".stripMargin,

    // direct recompute over (base ∪ inserts) ∖ deletes — the survivor
    // predicate is the complement of the delete batch's
    "q261_mv_retract" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_l_quantity,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_l_extendedprice
        |FROM lineitem
        |WHERE NOT (l_orderkey % 3 <> 0 AND l_orderkey % 5 = 1)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // weekly states from first-week and prev-week flags; churned via
    // the shifted-week anti-join
    "q235_growth_accounting" ->
      """WITH wk AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk FROM events),
        |f AS (SELECT user_id, min(wk) AS w0 FROM wk GROUP BY 1),
        |fl AS (SELECT w.user_id, w.wk, f.w0,
        |    lag(w.wk) OVER (PARTITION BY w.user_id ORDER BY w.wk) AS prev
        |  FROM wk w JOIN f USING (user_id)),
        |a AS (SELECT wk,
        |    CASE WHEN wk = w0 THEN 'new'
        |      WHEN prev = wk - 7 THEN 'retained'
        |      ELSE 'resurrected' END AS state
        |  FROM fl),
        |ag AS (SELECT wk, state, count(*) AS n_users FROM a GROUP BY 1, 2),
        |ch AS (SELECT n.wk, 'churned' AS state, count(*) AS n_users
        |  FROM (SELECT user_id, wk + 7 AS wk FROM wk) n
        |  LEFT JOIN wk c ON n.user_id = c.user_id AND n.wk = c.wk
        |  WHERE c.user_id IS NULL GROUP BY 1)
        |SELECT wk, state, n_users FROM ag
        |UNION ALL SELECT wk, state, n_users FROM ch
        |ORDER BY wk, state""".stripMargin,

    // serial rank reference: Σ rank·cents under (cents, custkey) asc
    "q236_gini" ->
      """WITH s AS (
        |  SELECT o_custkey,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |r AS (SELECT cents, row_number() OVER (ORDER BY cents, o_custkey) AS rk FROM s),
        |t AS (SELECT count(*) AS n, sum(cents) AS sx, sum(rk * cents) AS six FROM r)
        |SELECT CAST(n AS BIGINT) AS n_customers, CAST(sx AS BIGINT) AS total_cents,
        |  CAST(((2 * six - (n + 1) * sx) * 1000000) // (n * sx) AS BIGINT) AS gini_ppm
        |FROM t""".stripMargin,

    // the SAME driver-computed log10 expectation literals
    "q237_benford" -> {
      val values = BenfordPpm.map { case (dd, p) => s"($dd, $p)" }.mkString(", ")
      s"""WITH o AS (
        |  SELECT CAST(substring(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), 1, 1) AS BIGINT) AS digit
        |  FROM orders),
        |g AS (SELECT digit, count(*) AS n FROM o WHERE digit BETWEEN 1 AND 9 GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS tt FROM g),
        |e(digit, expected_ppm) AS (VALUES $values)
        |SELECT g.digit, g.n,
        |  CAST((g.n * 1000000) // t.tt AS BIGINT) AS observed_ppm,
        |  CAST(e.expected_ppm AS BIGINT) AS expected_ppm,
        |  CAST(abs((g.n * 1000000) // t.tt - e.expected_ppm) AS BIGINT) AS abs_dev_ppm
        |FROM g CROSS JOIN t JOIN e USING (digit) ORDER BY g.digit""".stripMargin
    },

    // the q172 register replay at a 30-day window + exact DAU + ratio
    "q234_stickiness" ->
      s"""WITH h AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(concat('0x', substring(md5(concat_ws('|', '42', CAST(user_id AS VARCHAR))), 1, 14)) AS BIGINT) AS h,
        |    user_id
        |  FROM events),
        |dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM h GROUP BY 1),
        |b AS (
        |  SELECT day, h & 63 AS b,
        |    CASE WHEN (h >> 6) = 0 THEN 30
        |         ELSE least(30, 51 - length(bin(h >> 6))) END AS rho
        |  FROM h),
        |regs AS (SELECT day, b, max(rho) AS r FROM b GROUP BY 1, 2),
        |days AS (SELECT DISTINCT day AS target FROM regs),
        |merged AS (
        |  SELECT d.target AS day, r.b, max(r.r) AS r
        |  FROM days d JOIN regs r ON date_diff('day', r.day, d.target) BETWEEN 0 AND 29
        |  GROUP BY 1, 2),
        |s AS (
        |  SELECT day, sum(${1L << 30} >> r) AS s, count(*) AS present
        |  FROM merged GROUP BY 1),
        |e AS (
        |  SELECT day, 64 - present AS zeros,
        |    ${709L * 4096L * (1L << 30)}
        |      // (1000 * (s + (64 - present) * ${1L << 30})) AS raw
        |  FROM s),
        |m AS (SELECT day,
        |    CAST(CASE WHEN raw <= 160 AND zeros > 0
        |      THEN ([${graft.ext.Sketches.HllLinearCounting.mkString(", ")}])[CAST(zeros AS INTEGER)]
        |      ELSE raw END AS BIGINT) AS mau_est
        |  FROM e)
        |SELECT m.day, CAST(dau.dau AS BIGINT) AS dau, m.mau_est,
        |  CAST((dau.dau * 1000000) // m.mau_est AS BIGINT) AS stickiness_ppm
        |FROM m JOIN dau USING (day) ORDER BY m.day""".stripMargin,

    // horizons exploded against the first-view cohort
    "q231_conversion_curve" ->
      """WITH v AS (SELECT user_id, min(ts) AS v0 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |conv AS (SELECT e.user_id,
        |    (epoch_us(min(e.ts)) - epoch_us(min(v.v0))) // 1000000 AS tt
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > v.v0 GROUP BY 1),
        |n AS (SELECT count(*) AS nc FROM v),
        |h AS (SELECT unnest([3600, 14400, 86400, 604800]) AS horizon_sec)
        |SELECT CAST(h.horizon_sec AS BIGINT) AS horizon_sec,
        |  CAST(n.nc AS BIGINT) AS n_cohort,
        |  CAST(count(CASE WHEN conv.tt <= h.horizon_sec THEN 1 END) AS BIGINT) AS n_converted,
        |  CAST((count(CASE WHEN conv.tt <= h.horizon_sec THEN 1 END) * 1000000) // n.nc AS BIGINT) AS conv_ppm
        |FROM conv CROSS JOIN h CROSS JOIN n
        |GROUP BY h.horizon_sec, n.nc ORDER BY 1""".stripMargin,

    // header cents vs detail-sum cents, 1-dollar tolerance
    "q232_price_reconcile" ->
      """WITH d AS (
        |  SELECT l_orderkey,
        |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS dc
        |  FROM lineitem GROUP BY 1),
        |j AS (
        |  SELECT o_orderkey,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS hc, d.dc
        |  FROM orders LEFT JOIN d ON o_orderkey = l_orderkey),
        |c AS (SELECT
        |    CASE WHEN dc IS NULL THEN 'childless'
        |      WHEN abs(hc - dc) <= 100 THEN 'match'
        |      ELSE 'mismatch' END AS status,
        |    abs(hc - coalesce(dc, 0)) AS gap
        |  FROM j)
        |SELECT status, count(*) AS n_orders,
        |  CAST(max(gap) AS BIGINT) AS max_gap_cents
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    // the q43 scorer keyed by the fixture label: per-cell counts
    "q233_lang_confusion" ->
      s"""WITH tk AS (
        |  SELECT doc_id, lang, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS tokens FROM documents),
        |r AS (
        |  SELECT doc_id, lang,
        |    $LangScoreCols
        |  FROM tk)
        |SELECT lang, $LangArgmaxSql AS lang_pred, count(*) AS cnt
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // lead window holds, milli quantization, one floor division
    "q228_twap" ->
      """WITH h AS (
        |  SELECT user_id,
        |    CAST(round(value * 1000) AS BIGINT) AS vm,
        |    (epoch_us(lead(ts) OVER w) - epoch_us(ts)) // 1000000 AS dt
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |g AS (SELECT user_id, count(*) AS n_holds,
        |    CAST(sum(vm * dt) AS BIGINT) AS wsum,
        |    CAST(sum(dt) AS BIGINT) AS held_seconds
        |  FROM h WHERE dt IS NOT NULL AND dt > 0 GROUP BY 1)
        |SELECT user_id, n_holds, held_seconds,
        |  CAST(wsum // held_seconds AS BIGINT) AS twap_milli
        |FROM g ORDER BY user_id""".stripMargin,

    // argmin/argmax via rank-1 rows, min/max for high/low
    "q229_ohlc_bars" ->
      """WITH v AS (
        |  SELECT user_id, date_trunc('hour', ts) AS bar, ts, event_id,
        |    CAST(round(value * 1000) AS BIGINT) AS vm
        |  FROM events),
        |r AS (SELECT *,
        |    row_number() OVER (PARTITION BY user_id, bar ORDER BY ts, event_id) AS rka,
        |    row_number() OVER (PARTITION BY user_id, bar ORDER BY ts DESC, event_id DESC) AS rkz
        |  FROM v),
        |g AS (SELECT user_id, bar, count(*) AS n,
        |    max(CASE WHEN rka = 1 THEN vm END) AS open_milli,
        |    max(vm) AS high_milli, min(vm) AS low_milli,
        |    max(CASE WHEN rkz = 1 THEN vm END) AS close_milli
        |  FROM r GROUP BY 1, 2)
        |SELECT user_id, CAST(bar AS TIMESTAMP) AS bar, n, open_milli,
        |  high_milli, low_milli, close_milli
        |FROM g ORDER BY user_id, bar""".stripMargin,

    // the q38 session CTE + ordered string_agg paths + top-20
    "q230_top_paths" ->
      """WITH f AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |    THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM f),
        |p AS (
        |  SELECT user_id, sid, count(*) AS n,
        |    string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        |  FROM s GROUP BY 1, 2),
        |c AS (SELECT path, count(*) AS n_sessions FROM p WHERE n <= 8 GROUP BY 1)
        |SELECT path, n_sessions FROM c
        |ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin,

    // suffix blocking + plain levenshtein + rank-1 per dirty row
    "q226_fuzzy_match" ->
      """WITH dirty AS (
        |  SELECT c_custkey + 1000000 AS dirty_id,
        |    concat(substring(c_name, 1, 8), substring(c_name, 10, 30)) AS dirty_name
        |  FROM customer WHERE c_custkey % 10 = 0),
        |cand AS (
        |  SELECT d.dirty_id, d.dirty_name, c.c_custkey, c.c_name,
        |    levenshtein(d.dirty_name, c.c_name) AS dist
        |  FROM dirty d JOIN customer c
        |    ON substring(d.dirty_name, length(d.dirty_name) - 3, 4) = substring(c.c_name, length(c.c_name) - 3, 4)
        |  WHERE levenshtein(d.dirty_name, c.c_name) <= 1),
        |r AS (SELECT *, row_number() OVER (PARTITION BY dirty_id ORDER BY dist, c_custkey) AS rk FROM cand)
        |SELECT dirty_id, dirty_name, c_custkey, c_name, CAST(dist AS BIGINT) AS distance
        |FROM r WHERE rk = 1 ORDER BY dirty_id""".stripMargin,

    // the serial rank-window reference for the distributed order
    // statistic: value at ascending rank ceil(q*n/1000)
    "q227_exact_median" ->
      """WITH r AS (
        |  SELECT lang, CAST(n_chars AS DOUBLE) AS q, doc_id,
        |    row_number() OVER (PARTITION BY lang ORDER BY CAST(n_chars AS DOUBLE), doc_id) AS rk,
        |    count(*) OVER (PARTITION BY lang) AS n
        |  FROM documents WHERE n_chars IS NOT NULL)
        |SELECT lang, CAST(n AS BIGINT) AS n, q AS q_value
        |FROM r WHERE rk = greatest(1, (500 * n + 999) // 1000)
        |ORDER BY lang""".stripMargin,

    // DuckDB list lambdas replay the HOF chain element for element
    "q222_array_hof" ->
      """WITH tk AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS t
        |  FROM documents WHERE doc_id < 200)
        |SELECT doc_id,
        |  CAST(len(t) AS BIGINT) AS n_tokens,
        |  CAST(coalesce(list_sum(list_transform(t, x -> len(x))), 0) AS BIGINT) AS chars_total,
        |  CAST(len(list_filter(t, x -> len(x) > 5)) AS BIGINT) AS n_long,
        |  CAST(greatest(len(t) - 1, 0) AS BIGINT) AS n_bigrams,
        |  list_sort(t)[1] AS min_token
        |FROM tk ORDER BY doc_id""".stripMargin,

    // the engine-agreement NULL rules, planted and replayed
    "q223_null_semantics" ->
      """WITH c AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE CAST(c_nationkey AS BIGINT) END AS nk,
        |    CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_acctbal END AS bal
        |  FROM customer)
        |SELECT coalesce(nk, -1) AS nk_group, count(*) AS n_rows,
        |  count(bal) AS n_bal,
        |  CAST(sum(CAST(bal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal,
        |  CAST(count(CASE WHEN bal IS NULL THEN 1 END) AS BIGINT) AS n_null_bal,
        |  CAST(sum(nullif(nk, 3)) AS BIGINT) AS sum_nk_not3
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    // decimal products summed exactly, floor/ceil to integer
    "q224_decimal_edge" ->
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))), 0) AS DOUBLE) AS sum_gross,
        |  CAST(sum(CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT) AS floor_sum,
        |  CAST(max(CAST(ceil(l_extendedprice) AS BIGINT)) AS BIGINT) AS ceil_max
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    // DuckDB's dayofweek is 0=Sunday where Spark's is 1=Sunday — the
    // +1 shim IS the parity contract
    "q225_datetime_family" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
        |  count(*) AS n,
        |  min(CAST(o_orderdate AS DATE)) AS first_day,
        |  CAST(max(dayofweek(o_orderdate) + 1) AS BIGINT) AS max_dow,
        |  CAST(max(quarter(o_orderdate)) AS BIGINT) AS q,
        |  CAST(min(epoch_us(o_orderdate)) AS BIGINT) AS min_us,
        |  last_day(CAST(date_trunc('month', o_orderdate) AS DATE)) AS month_end,
        |  CAST(CAST(date_trunc('month', o_orderdate) AS DATE) + INTERVAL 1 MONTH AS DATE) AS next_month
        |FROM orders
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // the SAME driver-computed weight literals, joined by age
    "q218_recency_score" -> {
      val values = RecencyWeights.map { case (k, w) => s"($k, $w)" }.mkString(", ")
      s"""WITH w(age_days, w_ppm) AS (VALUES $values),
        |a AS (SELECT max(CAST(ts AS DATE)) AS anchor FROM events),
        |e AS (SELECT user_id,
        |    CAST(a.anchor - CAST(ts AS DATE) AS BIGINT) AS age_days
        |  FROM events CROSS JOIN a)
        |SELECT user_id, count(*) AS n_events,
        |  CAST(sum(coalesce(w.w_ppm, 0)) AS BIGINT) AS recency_score_ppm
        |FROM e LEFT JOIN w USING (age_days)
        |GROUP BY user_id ORDER BY user_id""".stripMargin
    },

    // the q38 session CTE rolled to per-user bounce shares
    "q219_bounce_rate" ->
      """WITH f AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |    THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM f),
        |g AS (SELECT user_id, session_id, count(*) AS n FROM s GROUP BY 1, 2),
        |u AS (SELECT user_id, count(*) AS n_sessions,
        |    CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces
        |  FROM g GROUP BY 1)
        |SELECT user_id, n_sessions, n_bounces,
        |  CAST((n_bounces * 1000000) // n_sessions AS BIGINT) AS bounce_ppm
        |FROM u ORDER BY user_id""".stripMargin,

    // first view -> first later purchase deltas, the q162/q192
    // histogram median replay on a 4096-second grid
    "q220_time_to_convert" ->
      """WITH v AS (SELECT user_id, min(ts) AS v0 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS p0, min(v.v0) AS v0
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > v.v0 GROUP BY 1),
        |d AS (SELECT 'all' AS g,
        |    CAST((epoch_us(p0) - epoch_us(v0)) // 1000000 AS DOUBLE) AS x FROM p),
        |b AS (SELECT g, least(1023, greatest(0, CAST(floor((x - 0.0) / 4194304.0 * 1024) AS BIGINT))) AS bin FROM d),
        |h AS (SELECT g, bin, count(*) AS cnt FROM b GROUP BY 1, 2),
        |c AS (SELECT g, bin,
        |    sum(cnt) OVER (PARTITION BY g ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cnt) OVER (PARTITION BY g) AS n FROM h)
        |SELECT g, CAST(max(n) AS BIGINT) AS n,
        |  0.0 + (CAST(min(bin) + 1 AS DOUBLE) * 4194304.0) / 1024 AS q_est
        |FROM c WHERE cum >= CAST(ceil(0.5 * n) AS BIGINT)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // exact integer month arithmetic, decimal-exact revenue
    "q221_revenue_cohorts" ->
      """WITH o AS (
        |  SELECT o_custkey, o_totalprice,
        |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS m
        |  FROM orders),
        |f AS (SELECT o_custkey, min(m) AS m0 FROM o GROUP BY 1)
        |SELECT f.m0 AS cohort_month, o.m - f.m0 AS offset_months,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM o JOIN f USING (o_custkey)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q217_tpch_q18" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        |  HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > 150)
        |GROUP BY 1, 2, 3, 4, 5
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "q214_tpch_q3" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE l_shipdate > TIMESTAMP '1998-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND c_mktsegment = 'BUILDING'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q215_tpch_q5" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "q216_tpch_q10" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |GROUP BY 1, 2, 3, 4
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    // distinct days, date-minus-rank islands, per-user rollup
    "q211_streaks" ->
      """WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |g AS (SELECT user_id, day,
        |    day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS INTEGER) AS grp
        |  FROM d),
        |i AS (SELECT user_id, grp, count(*) AS len FROM g GROUP BY 1, 2)
        |SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
        |  count(*) AS n_streaks, CAST(max(len) AS BIGINT) AS longest_streak
        |FROM i GROUP BY user_id ORDER BY user_id""".stripMargin,

    // lag-vs-previous-raw gap filter == island heads; suppression ppm
    "q212_debounce" ->
      """WITH l AS (
        |  SELECT event_type,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS gap
        |  FROM events),
        |k AS (SELECT event_type, count(*) AS n_kept FROM l
        |  WHERE gap IS NULL OR gap > 60000000 GROUP BY 1),
        |r AS (SELECT event_type, count(*) AS n_raw FROM events GROUP BY 1)
        |SELECT r.event_type, r.n_raw, k.n_kept,
        |  CAST(((r.n_raw - k.n_kept) * 1000000) // r.n_raw AS BIGINT) AS suppressed_ppm
        |FROM r JOIN k USING (event_type) ORDER BY r.event_type""".stripMargin,

    // highest count, ties to the smallest value (rank-1 of the rollup)
    "q213_mode" ->
      """WITH c AS (
        |  SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |  FROM orders WHERE o_orderpriority IS NOT NULL GROUP BY 1, 2),
        |r AS (SELECT o_orderstatus, o_orderpriority, n,
        |    row_number() OVER (PARTITION BY o_orderstatus ORDER BY n DESC, o_orderpriority) AS rk
        |  FROM c)
        |SELECT o_orderstatus, o_orderpriority AS mode_value,
        |  CAST(n AS BIGINT) AS mode_count
        |FROM r WHERE rk = 1 ORDER BY o_orderstatus""".stripMargin,

    // the same gaps-and-islands arithmetic on epoch micros
    "q210_covered_time" ->
      """WITH i AS (
        |  SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 300000000 AS e FROM events),
        |m AS (SELECT user_id, s, e,
        |    max(e) OVER (PARTITION BY user_id ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe
        |  FROM i),
        |n AS (SELECT user_id, s, e,
        |    CASE WHEN pe IS NULL OR s > pe THEN 1 ELSE 0 END AS ni FROM m),
        |isl AS (SELECT user_id, s, e,
        |    sum(ni) OVER (PARTITION BY user_id ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM n),
        |g AS (SELECT user_id, island, min(s) AS is_, max(e) AS ie FROM isl GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_islands,
        |  CAST(sum(ie - is_) // 1000000 AS BIGINT) AS covered_seconds
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,

    // both surviving versions must read the erased population; the
    // removed count is 2 versions x the matching rows
    "q207_forget" ->
      """WITH k AS (
        |  SELECT count(*) AS n,
        |    CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS bal
        |  FROM customer WHERE c_custkey % 7 <> 0),
        |r AS (SELECT 2 * (SELECT count(*) FROM customer WHERE c_custkey % 7 = 0) AS n_removed)
        |SELECT CAST(v AS BIGINT) AS version, k.n, k.bal,
        |  CAST(r.n_removed AS BIGINT) AS n_removed
        |FROM (SELECT unnest([0, 1]) AS v) CROSS JOIN k CROSS JOIN r
        |ORDER BY version""".stripMargin,

    // one lhs-group rollup per declared dependency
    "q208_fd_audit" ->
      """WITH
        |g1 AS (SELECT n_nationkey, count(DISTINCT n_regionkey) AS d FROM nation GROUP BY 1),
        |g2 AS (SELECT c_nationkey, count(DISTINCT c_mktsegment) AS d FROM customer GROUP BY 1),
        |g3 AS (SELECT c_custkey, count(DISTINCT c_nationkey) AS d FROM customer GROUP BY 1),
        |g4 AS (SELECT o_orderkey, count(DISTINCT o_custkey) AS d FROM orders GROUP BY 1),
        |u AS (
        |  SELECT 'n_nationkey->n_regionkey' AS dependency, count(*) AS n_groups,
        |    count(*) FILTER (WHERE d > 1) AS n_violating, coalesce(sum(d - 1), 0) AS extra_mappings FROM g1
        |  UNION ALL SELECT 'c_nationkey->c_mktsegment', count(*),
        |    count(*) FILTER (WHERE d > 1), coalesce(sum(d - 1), 0) FROM g2
        |  UNION ALL SELECT 'c_custkey->c_nationkey', count(*),
        |    count(*) FILTER (WHERE d > 1), coalesce(sum(d - 1), 0) FROM g3
        |  UNION ALL SELECT 'o_orderkey->o_custkey', count(*),
        |    count(*) FILTER (WHERE d > 1), coalesce(sum(d - 1), 0) FROM g4)
        |SELECT dependency, n_groups, CAST(n_violating AS BIGINT) AS n_violating,
        |  CAST(extra_mappings AS BIGINT) AS extra_mappings,
        |  CAST(CASE WHEN n_violating = 0 THEN 1 ELSE 0 END AS BIGINT) AS holds
        |FROM u ORDER BY dependency""".stripMargin,

    // one distinct-combination count per declared set
    "q209_keys" ->
      """WITH u AS (
        |  SELECT 'c_custkey' AS key_cols, (SELECT count(*) FROM customer) AS n_rows,
        |    (SELECT count(*) FROM (SELECT DISTINCT c_custkey FROM customer)) AS n_distinct
        |  UNION ALL SELECT 'c_name', (SELECT count(*) FROM customer),
        |    (SELECT count(*) FROM (SELECT DISTINCT c_name FROM customer))
        |  UNION ALL SELECT 'c_nationkey,c_mktsegment', (SELECT count(*) FROM customer),
        |    (SELECT count(*) FROM (SELECT DISTINCT c_nationkey, c_mktsegment FROM customer)))
        |SELECT key_cols, n_rows, n_distinct,
        |  CAST(CASE WHEN n_rows = n_distinct THEN 1 ELSE 0 END AS BIGINT) AS is_key
        |FROM u ORDER BY key_cols""".stripMargin,

    // the q113 score replay + plain ntile(10) + per-decile label rate
    "q205_calibration" ->
      s"""WITH $ScoredDocsCtes,
        |lab AS (SELECT doc_id, score,
        |    CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS label FROM scored),
        |t AS (SELECT *, CAST(ntile(10) OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS decile FROM lab)
        |SELECT decile, count(*) AS n, CAST(sum(label) AS BIGINT) AS n_pos,
        |  min(score) AS min_score, max(score) AS max_score,
        |  CAST((sum(label) * 1000000) // count(*) AS BIGINT) AS pos_rate_ppm
        |FROM t GROUP BY decile ORDER BY decile""".stripMargin,

    // the q113 score replay swept over milli thresholds; F1 in its
    // tp-form so every metric is one integer floor division
    "q206_confusion" ->
      s"""WITH $ScoredDocsCtes,
        |lab AS (SELECT doc_id, score,
        |    CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS label FROM scored),
        |th AS (SELECT unnest([-100, 0, 100]) AS threshold_milli),
        |p AS (SELECT th.threshold_milli,
        |    (score * CAST(1000 AS DOUBLE) >= threshold_milli) AS pred, label
        |  FROM lab CROSS JOIN th),
        |c AS (SELECT threshold_milli,
        |    CAST(count(*) FILTER (WHERE pred AND label = 1) AS BIGINT) AS tp,
        |    CAST(count(*) FILTER (WHERE pred AND label = 0) AS BIGINT) AS fp,
        |    CAST(count(*) FILTER (WHERE NOT pred AND label = 1) AS BIGINT) AS fn,
        |    CAST(count(*) FILTER (WHERE NOT pred AND label = 0) AS BIGINT) AS tn
        |  FROM p GROUP BY 1)
        |SELECT CAST(threshold_milli AS BIGINT) AS threshold_milli, tp, fp, fn, tn,
        |  CAST(CASE WHEN tp + fp = 0 THEN 0 ELSE (tp * 1000000) // (tp + fp) END AS BIGINT) AS precision_ppm,
        |  CAST(CASE WHEN tp + fn = 0 THEN 0 ELSE (tp * 1000000) // (tp + fn) END AS BIGINT) AS recall_ppm,
        |  CAST(CASE WHEN 2 * tp + fp + fn = 0 THEN 0 ELSE (2 * tp * 1000000) // (2 * tp + fp + fn) END AS BIGINT) AS f1_ppm
        |FROM c ORDER BY threshold_milli""".stripMargin,

    // content gate for the layout-only rewrite: the compacted
    // store read-back must aggregate identically to the raw table
    "q204_compaction" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
        |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    // per-user lag gaps (floor seconds), the q162 histogram replay
    // on a 16-second grid
    "q192_gap_quantiles" ->
      """WITH g AS (
        |  SELECT event_type,
        |    (epoch_us(ts) - epoch_us(lag(ts) OVER w)) // 1000000 AS gap
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |v AS (SELECT event_type, CAST(gap AS DOUBLE) AS x FROM g WHERE gap IS NOT NULL),
        |b AS (SELECT event_type, least(511, greatest(0, CAST(floor((x - 0.0) / 8192.0 * 512) AS BIGINT))) AS bin FROM v),
        |h AS (SELECT event_type, bin, count(*) AS cnt FROM b GROUP BY 1, 2),
        |c AS (SELECT event_type, bin,
        |    sum(cnt) OVER (PARTITION BY event_type ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cnt) OVER (PARTITION BY event_type) AS n FROM h)
        |SELECT event_type, CAST(max(n) AS BIGINT) AS n,
        |  0.0 + (CAST(min(bin) + 1 AS DOUBLE) * 8192.0) / 512 AS q_est
        |FROM c WHERE cum >= CAST(ceil(0.5 * n) AS BIGINT)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // q169's staged joins with the additional within-gap bound
    "q190_windowed_funnel" ->
      """WITH s0 AS (SELECT user_id, min(ts) AS t0 FROM events WHERE event_type = 'view' GROUP BY 1),
        |s1 AS (SELECT e.user_id, min(e.ts) AS t1 FROM events e JOIN s0 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > s0.t0 AND e.ts <= s0.t0 + INTERVAL 1 HOUR GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > s1.t1 AND e.ts <= s1.t1 + INTERVAL 1 HOUR GROUP BY 1)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS stage, 'view' AS event_type,
        |    (SELECT count(*) FROM s0) AS n_users
        |  UNION ALL SELECT CAST(2 AS BIGINT), 'click', (SELECT count(*) FROM s1)
        |  UNION ALL SELECT CAST(3 AS BIGINT), 'purchase', (SELECT count(*) FROM s2))
        |ORDER BY stage""".stripMargin,

    // the same trailing RANGE frame on epoch micros, then max + flag
    "q191_rate_anomalies" ->
      """WITH r AS (
        |  SELECT user_id, count(*) OVER w AS r
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |    RANGE BETWEEN 599999999 PRECEDING AND CURRENT ROW)),
        |p AS (SELECT user_id, CAST(max(r) AS BIGINT) AS peak_rate FROM r GROUP BY 1)
        |SELECT user_id, peak_rate,
        |  CAST(CASE WHEN peak_rate >= 5 THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
        |FROM p ORDER BY user_id""".stripMargin,

    // both rankers replayed (BM25 CTEs + the cosine ranking), then
    // the floor-RRF merge; DuckDB's bm25 CTE names don't clash with
    // the cosine block's
    "q189_hybrid_rrf" -> {
      val bm25 = bm25Sql(50)
      val bmCtes = bm25.stripPrefix("WITH ")
        .split("\nSELECT doc_id, score FROM sc")(0)
      s"""WITH $bmCtes,
        |lex AS (
        |  SELECT doc_id AS id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
        |  FROM (SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id LIMIT 50)),
        |v2 AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings),
        |n2 AS (SELECT vec_id, e, sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm FROM v2),
        |q2 AS (SELECT e AS qe, nrm AS qn FROM n2 WHERE vec_id = 0),
        |scored2 AS (
        |  SELECT n2.vec_id AS id,
        |    list_sum(list_transform(range(1, 65), i -> (n2.e[i] / n2.nrm) * (q2.qe[i] / q2.qn))) AS cosine
        |  FROM q2 CROSS JOIN n2),
        |sem AS (
        |  SELECT id, CAST(rank AS BIGINT) AS rank FROM (
        |    SELECT id, row_number() OVER (ORDER BY cosine DESC, id) AS rank FROM scored2)
        |  WHERE rank <= 50),
        |u AS (SELECT * FROM lex UNION ALL SELECT * FROM sem),
        |f AS (SELECT id, CAST(sum(1000 // (10 + rank)) AS BIGINT) AS rrf_milli,
        |    count(*) AS n_lists FROM u GROUP BY 1)
        |SELECT * FROM (SELECT * FROM f ORDER BY rrf_milli DESC, id LIMIT 20)
        |ORDER BY rrf_milli DESC, id""".stripMargin
    },

    // the four stage fragments (drift TV, histogram winsorize bounds,
    // md5 fingerprint keep-min, PPS order variable) composed verbatim
    "q188_curation_v3" ->
      """WITH v AS (SELECT doc_id, lang, source, text, CAST(n_chars AS DOUBLE) AS x FROM documents),
        |b1 AS (SELECT source, least(255, greatest(0, CAST(floor((x - 0.0) / 1024.0 * 256) AS BIGINT))) AS bin FROM v WHERE x IS NOT NULL),
        |st1 AS (SELECT source, bin, count(*) AS c FROM b1 GROUP BY 1, 2),
        |g1 AS (SELECT bin, sum(c) AS gc FROM st1 GROUP BY 1),
        |t1 AS (SELECT source, sum(c) AS n FROM st1 GROUP BY 1),
        |gt1 AS (SELECT sum(gc) AS gn FROM g1),
        |grid1 AS (SELECT t1.source, t1.n, g1.bin, g1.gc, coalesce(st1.c, 0) AS c, gt1.gn
        |  FROM t1 CROSS JOIN g1
        |  LEFT JOIN st1 ON st1.source = t1.source AND st1.bin = g1.bin
        |  CROSS JOIN gt1),
        |p1 AS (SELECT source, n, (c * 1000000) // n AS pa,
        |    CASE WHEN gn > n THEN ((gc - c) * 1000000) // (gn - n) END AS pr FROM grid1),
        |drift AS (SELECT source, CAST(sum(abs(pa - pr)) // 2 AS BIGINT) AS tv FROM p1 GROUP BY 1),
        |keeps AS (SELECT source FROM drift WHERE tv <= 800000),
        |gated AS (SELECT v.* FROM v JOIN keeps USING (source)),
        |b2 AS (SELECT lang, least(255, greatest(0, CAST(floor((x - 0.0) / 1024.0 * 256) AS BIGINT))) AS bin FROM gated WHERE x IS NOT NULL),
        |h2 AS (SELECT lang, bin, count(*) AS cnt FROM b2 GROUP BY 1, 2),
        |c2 AS (SELECT lang, bin,
        |    sum(cnt) OVER (PARTITION BY lang ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cnt) OVER (PARTITION BY lang) AS n FROM h2),
        |plo AS (SELECT lang, 0.0 + (CAST(min(bin) + 1 AS DOUBLE) * 1024.0) / 256 AS wlo
        |  FROM c2 WHERE cum >= CAST(ceil(0.05 * n) AS BIGINT) GROUP BY 1),
        |phi AS (SELECT lang, 0.0 + (CAST(min(bin) + 1 AS DOUBLE) * 1024.0) / 256 AS whi
        |  FROM c2 WHERE cum >= CAST(ceil(0.95 * n) AS BIGINT) GROUP BY 1),
        |wz AS (SELECT g.doc_id, g.lang, g.source, g.text,
        |    CASE WHEN g.x IS NULL THEN NULL ELSE least(greatest(g.x, plo.wlo), phi.whi) END AS w
        |  FROM gated g JOIN plo ON g.lang = plo.lang JOIN phi ON g.lang = phi.lang),
        |fp AS (SELECT doc_id, lang, source, w,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS f FROM wz),
        |keep AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY f),
        |dd AS (SELECT fp.* FROM fp JOIN keep USING (doc_id)),
        |h AS (SELECT doc_id, lang, source, w,
        |    CAST(concat('0x', substring(md5(concat_ws('|', '42', CAST(doc_id AS VARCHAR))), 1, 14)) AS BIGINT) AS u
        |  FROM dd WHERE w IS NOT NULL AND w > 0)
        |SELECT * FROM (
        |  SELECT doc_id, lang, source, w AS n_chars_wins,
        |    CAST(u AS DOUBLE) / CAST(w AS DOUBLE) AS pps
        |  FROM h ORDER BY pps, doc_id LIMIT 100)
        |ORDER BY doc_id""".stripMargin,

    // identical integer sufficient statistics and fp composition
    "q186_trend" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
        |  FROM events GROUP BY 1, 2),
        |v AS (SELECT event_type,
        |    CAST(date_diff('day', DATE '2024-01-01', day) AS BIGINT) AS x,
        |    CAST(y AS BIGINT) AS y FROM daily),
        |a AS (SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
        |    CAST(sum(x * x) AS DOUBLE) AS sxx, CAST(sum(x * y) AS DOUBLE) AS sxy
        |  FROM v GROUP BY 1)
        |SELECT event_type, CAST(n AS BIGINT) AS n,
        |  CASE WHEN n * sxx - sx * sx = 0 THEN NULL
        |       ELSE (n * sxy - sx * sy) / (n * sxx - sx * sx) END AS slope,
        |  CASE WHEN n * sxx - sx * sx = 0 THEN NULL
        |       ELSE (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n END AS intercept
        |FROM a ORDER BY event_type""".stripMargin,

    // per-type daily counts, exact scaled deviations, running sum,
    // argmax by (|cusum| DESC, day ASC)
    "q187_changepoint" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS p, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS tot, count(*) AS np
        |  FROM daily GROUP BY 1),
        |cs AS (SELECT d.event_type, d.p,
        |    sum(d.c * t.np - t.tot) OVER (PARTITION BY d.event_type ORDER BY d.p
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum
        |  FROM daily d JOIN t USING (event_type)),
        |r AS (SELECT event_type, p, abs(cusum) AS score,
        |    row_number() OVER (PARTITION BY event_type ORDER BY abs(cusum) DESC, p) AS rk
        |  FROM cs)
        |SELECT event_type, p AS change_period, CAST(score AS BIGINT) AS cusum_score
        |FROM r WHERE rk = 1 ORDER BY event_type""".stripMargin,

    // same integer idf (bit length of the floor df ratio), same
    // (score DESC, term) top-3 window
    "q184_keywords" ->
      """WITH tk AS (
        |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0)) AS t
        |  FROM documents),
        |tf AS (SELECT doc_id, t, count(*) AS tf FROM tk GROUP BY 1, 2),
        |nd AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
        |dfq AS (SELECT t, count(*) AS df FROM tf GROUP BY 1),
        |sc AS (SELECT tf.doc_id, tf.t, tf.tf,
        |    tf.tf * length(bin(nd.n // dfq.df)) AS score
        |  FROM tf JOIN dfq USING (t) CROSS JOIN nd
        |  WHERE dfq.df <= nd.n // 2),
        |r AS (SELECT doc_id, t, tf, score,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, t) AS rank
        |  FROM sc)
        |SELECT doc_id, t AS term, tf, CAST(score AS BIGINT) AS score,
        |  CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    // positional bigrams, per-context argmax (cnt DESC, next ASC)
    "q185_next_word" ->
      """WITH tk AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS tokens
        |  FROM documents),
        |bg0 AS (SELECT CASE WHEN len(tokens) >= 2
        |    THEN list_transform(range(1, len(tokens)), i -> [tokens[i], tokens[i + 1]])
        |    ELSE [] END AS ps FROM tk),
        |bg AS (SELECT p[1] AS w, p[2] AS n
        |  FROM (SELECT unnest(ps) AS p FROM bg0)),
        |c AS (SELECT w, n, count(*) AS cnt FROM bg GROUP BY 1, 2),
        |r AS (SELECT w, n, cnt,
        |    row_number() OVER (PARTITION BY w ORDER BY cnt DESC, n) AS rk
        |  FROM c)
        |SELECT w AS word, n AS next_word, cnt
        |FROM r WHERE rk = 1 AND cnt >= 5 ORDER BY word""".stripMargin,

    // both counter matrices replayed (the q95 bucket family at width
    // 2^18), per-row inner products, min, exact join count
    "q183_join_size_est" ->
      """WITH va AS (SELECT CAST(l_orderkey AS VARCHAR) AS val FROM lineitem),
        |ha AS (SELECT
        |  CAST(concat('0x', substring(md5(concat_ws('|', '42', val)), 1, 14)) AS BIGINT) AS a,
        |  CAST(concat('0x', substring(md5(concat_ws('|', '42', val)), 17, 14)) AS BIGINT) AS b
        |  FROM va),
        |ca AS (SELECT i, (a + i * b) % 262144 AS bucket, count(*) AS cnt
        |  FROM ha, range(4) t(i) GROUP BY 1, 2),
        |vb AS (SELECT CAST(o_orderkey AS VARCHAR) AS val FROM orders),
        |hb AS (SELECT
        |  CAST(concat('0x', substring(md5(concat_ws('|', '42', val)), 1, 14)) AS BIGINT) AS a,
        |  CAST(concat('0x', substring(md5(concat_ws('|', '42', val)), 17, 14)) AS BIGINT) AS b
        |  FROM vb),
        |cb AS (SELECT i, (a + i * b) % 262144 AS bucket, count(*) AS cnt
        |  FROM hb, range(4) t(i) GROUP BY 1, 2),
        |ip AS (SELECT ca.i, sum(ca.cnt * cb.cnt) AS ip
        |  FROM ca JOIN cb ON ca.i = cb.i AND ca.bucket = cb.bucket GROUP BY 1),
        |est AS (SELECT CAST(min(ip) AS BIGINT) AS est_join_rows FROM ip),
        |ex AS (SELECT count(*) AS exact_join_rows
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT est_join_rows, exact_join_rows,
        |  CAST(((est_join_rows - exact_join_rows) * 1000000) // exact_join_rows AS BIGINT) AS err_ppm
        |FROM est CROSS JOIN ex""".stripMargin,

    // the snapshot machinery is invisible to the oracle: merged
    // (v0 state, delta state) == direct recompute over v1 == the
    // full lineitem rollup (the q159 oracle restricted to one measure)
    "q181_mv_snapshot_refresh" ->
      """SELECT l_returnflag, count(*) AS cnt,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_l_quantity,
        |  min(l_quantity) AS min_l_quantity, max(l_quantity) AS max_l_quantity
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    // deterministic top-500 vocab (count DESC, word ASC), left-join
    // miss rate per doc in floor ppm
    "q182_oov_rate" ->
      """WITH tk AS (
        |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0)) AS t
        |  FROM documents),
        |vc AS (SELECT t FROM (
        |  SELECT t, count(*) AS c FROM tk GROUP BY 1
        |  ORDER BY c DESC, t LIMIT 500)),
        |j AS (SELECT tk.doc_id, CASE WHEN vc.t IS NULL THEN 1 ELSE 0 END AS oov
        |  FROM tk LEFT JOIN vc ON tk.t = vc.t)
        |SELECT doc_id, count(*) AS n_tokens, CAST(sum(oov) AS BIGINT) AS n_oov,
        |  CAST((sum(oov) * 1000000) // count(*) AS BIGINT) AS oov_ppm
        |FROM j GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // distinct (basket, item) rows, basket-keyed pair join, floor
    // ppm/milli; the basket count enters as the same integer literal
    "q179_assoc_rules" ->
      """WITH it AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
        |  FROM lineitem WHERE l_orderkey < 2000 AND l_partkey IS NOT NULL),
        |nb AS (SELECT count(DISTINCT b) AS n FROM it),
        |ic AS (SELECT i, count(*) AS ni FROM it GROUP BY 1),
        |p AS (SELECT a.i AS item_a, c.i AS item_b, count(*) AS n_ab
        |  FROM it a JOIN it c ON a.b = c.b AND a.i <> c.i
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT item_a, item_b, n_ab,
        |  CAST((n_ab * 1000000) // nb.n AS BIGINT) AS support_ppm,
        |  CAST((n_ab * 1000000) // na.ni AS BIGINT) AS conf_ppm,
        |  CAST((((n_ab * 1000000) // na.ni) * nb.n) // nbi.ni // 1000 AS BIGINT) AS lift_milli
        |FROM p
        |CROSS JOIN nb
        |JOIN ic na ON na.i = item_a
        |JOIN ic nbi ON nbi.i = item_b
        |ORDER BY item_a, item_b""".stripMargin,

    // identical sufficient statistics (decimal sums -> one double
    // conversion) and identical operation order -> bit-equal r
    "q180_correlation" ->
      """WITH v AS (SELECT
        |  CAST(round(l_quantity * 10000) AS BIGINT) AS x0,
        |  CAST(round(l_extendedprice * 10000) AS BIGINT) AS x1,
        |  CAST(round(l_discount * 10000) AS BIGINT) AS x2
        |  FROM lineitem WHERE l_quantity IS NOT NULL
        |    AND l_extendedprice IS NOT NULL AND l_discount IS NOT NULL),
        |a AS (SELECT CAST(count(*) AS DOUBLE) AS n,
        |  CAST(sum(x0) AS DOUBLE) AS s0,
        |  CAST(sum(x1) AS DOUBLE) AS s1,
        |  CAST(sum(x2) AS DOUBLE) AS s2,
        |  CAST(sum(x0 * x0) AS DOUBLE) AS p00,
        |  CAST(sum(x0 * x1) AS DOUBLE) AS p01,
        |  CAST(sum(x0 * x2) AS DOUBLE) AS p02,
        |  CAST(sum(x1 * x1) AS DOUBLE) AS p11,
        |  CAST(sum(x1 * x2) AS DOUBLE) AS p12,
        |  CAST(sum(x2 * x2) AS DOUBLE) AS p22
        |  FROM v)
        |SELECT * FROM (
        |  SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
        |    CAST(n AS BIGINT) AS n,
        |    CASE WHEN sqrt(n * p00 - s0 * s0) * sqrt(n * p11 - s1 * s1) = 0 THEN NULL
        |         ELSE (n * p01 - s0 * s1) / (sqrt(n * p00 - s0 * s0) * sqrt(n * p11 - s1 * s1)) END AS corr
        |  FROM a
        |  UNION ALL
        |  SELECT 'l_quantity', 'l_discount', CAST(n AS BIGINT),
        |    CASE WHEN sqrt(n * p00 - s0 * s0) * sqrt(n * p22 - s2 * s2) = 0 THEN NULL
        |         ELSE (n * p02 - s0 * s2) / (sqrt(n * p00 - s0 * s0) * sqrt(n * p22 - s2 * s2)) END
        |  FROM a
        |  UNION ALL
        |  SELECT 'l_extendedprice', 'l_discount', CAST(n AS BIGINT),
        |    CASE WHEN sqrt(n * p11 - s1 * s1) * sqrt(n * p22 - s2 * s2) = 0 THEN NULL
        |         ELSE (n * p12 - s1 * s2) / (sqrt(n * p11 - s1 * s1) * sqrt(n * p22 - s2 * s2)) END
        |  FROM a)
        |ORDER BY col_a, col_b""".stripMargin,

    // six-column melt via UNION ALL, then the q91 HLL recipe keyed on
    // the column name; null counts from the same melt
    "q176_column_profile" ->
      s"""WITH p AS (
        |  SELECT 'l_orderkey' AS c, CAST(l_orderkey AS VARCHAR) AS v FROM lineitem
        |  UNION ALL SELECT 'l_partkey', CAST(l_partkey AS VARCHAR) FROM lineitem
        |  UNION ALL SELECT 'l_suppkey', CAST(l_suppkey AS VARCHAR) FROM lineitem
        |  UNION ALL SELECT 'l_returnflag', l_returnflag FROM lineitem
        |  UNION ALL SELECT 'l_linestatus', l_linestatus FROM lineitem
        |  UNION ALL SELECT 'l_shipdate', CAST(l_shipdate AS VARCHAR) FROM lineitem),
        |stats AS (SELECT c, count(*) AS n_rows,
        |    CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls
        |  FROM p GROUP BY 1),
        |h AS (SELECT c,
        |    CAST(concat('0x', substring(md5(concat_ws('|', '42', v)), 1, 14)) AS BIGINT) AS h
        |  FROM p WHERE v IS NOT NULL),
        |b AS (SELECT c, h & 63 AS b,
        |    CASE WHEN (h >> 6) = 0 THEN 30
        |         ELSE least(30, 51 - length(bin(h >> 6))) END AS rho FROM h),
        |regs AS (SELECT c, b, max(rho) AS r FROM b GROUP BY 1, 2),
        |s AS (SELECT c, sum(${1L << 30} >> r) AS s, count(*) AS present FROM regs GROUP BY 1),
        |e AS (SELECT c, 64 - present AS zeros,
        |    ${709L * 4096L * (1L << 30)}
        |      // (1000 * (s + (64 - present) * ${1L << 30})) AS raw FROM s),
        |d AS (SELECT c,
        |    CAST(CASE WHEN raw <= 160 AND zeros > 0
        |      THEN ([${graft.ext.Sketches.HllLinearCounting.mkString(", ")}])[CAST(zeros AS INTEGER)]
        |      ELSE raw END AS BIGINT) AS est_distinct FROM e)
        |SELECT stats.c AS col_name, stats.n_rows, stats.n_nulls, d.est_distinct
        |FROM stats JOIN d USING (c) ORDER BY col_name""".stripMargin,

    // NOT EXISTS per relationship — the anti-join twin
    "q177_fk_orphans" ->
      """SELECT * FROM (
        |  SELECT 'customer.nationkey' AS fk,
        |    (SELECT count(*) FROM customer c WHERE c.c_nationkey IS NOT NULL
        |      AND NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)) AS n_orphans
        |  UNION ALL SELECT 'lineitem.orderkey',
        |    (SELECT count(*) FROM lineitem l WHERE l.l_orderkey IS NOT NULL
        |      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        |  UNION ALL SELECT 'orders.custkey',
        |    (SELECT count(*) FROM orders o WHERE o.o_custkey IS NOT NULL
        |      AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)))
        |ORDER BY fk""".stripMargin,

    // generate_series calendar between the data's bounds, zero-filled
    "q178_date_spine" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, count(*) AS n_events FROM events
        |  WHERE user_id < 2 AND event_type = 'error' GROUP BY 1),
        |bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
        |spine AS (
        |  SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM bounds)
        |SELECT spine.day, CAST(coalesce(n_events, 0) AS BIGINT) AS n_events
        |FROM spine LEFT JOIN daily USING (day) ORDER BY day""".stripMargin,

    // shared-grid histogram, per-source vs rest-of-corpus ppm
    // profiles, floor-TV; absent bins read as zero via the grid join
    "q174_source_drift" ->
      """WITH v AS (SELECT source, CAST(n_chars AS DOUBLE) AS x FROM documents WHERE n_chars IS NOT NULL),
        |b AS (SELECT source, least(255, greatest(0, CAST(floor((x - 0.0) / 1024.0 * 256) AS BIGINT))) AS bin FROM v),
        |st AS (SELECT source, bin, count(*) AS c FROM b GROUP BY 1, 2),
        |g AS (SELECT bin, sum(c) AS gc FROM st GROUP BY 1),
        |t AS (SELECT source, sum(c) AS n FROM st GROUP BY 1),
        |gt AS (SELECT sum(gc) AS gn FROM g),
        |grid AS (
        |  SELECT t.source, t.n, g.bin, g.gc, coalesce(st.c, 0) AS c, gt.gn
        |  FROM t CROSS JOIN g
        |  LEFT JOIN st ON st.source = t.source AND st.bin = g.bin
        |  CROSS JOIN gt),
        |p AS (SELECT source, n,
        |    (c * 1000000) // n AS pa,
        |    CASE WHEN gn > n THEN ((gc - c) * 1000000) // (gn - n) END AS pr
        |  FROM grid)
        |SELECT source, CAST(max(n) AS BIGINT) AS n,
        |  CAST(sum(abs(pa - pr)) // 2 AS BIGINT) AS tv_ppm
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,

    // the ROWS twin of q148: positional trailing-3 frame
    "q175_moving_window" ->
      """SELECT event_id, user_id,
        |  count(*) OVER w AS n_3,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_3
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    // same tokenize/shingle/df-gate pipeline as q44, aggregated to
    // the source level; integer Jaccard is floor division
    "q165_source_overlap" ->
      """WITH tk AS (
        |  SELECT doc_id, source, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS tokens
        |  FROM documents WHERE text IS NOT NULL),
        |sh AS (
        |  SELECT doc_id, source, CASE WHEN len(tokens) >= 3 THEN list_distinct(list_transform(range(1, len(tokens) - 1), i -> array_to_string(tokens[i:i+2], ' '))) ELSE [] END AS s FROM tk),
        |ex AS (SELECT doc_id, source, unnest(s) AS g FROM sh),
        |df AS (SELECT g, count(*) AS df FROM ex GROUP BY 1),
        |kept AS (SELECT DISTINCT source, g FROM ex JOIN df USING (g) WHERE df <= 100),
        |n AS (SELECT source, count(*) AS n FROM kept GROUP BY 1),
        |pairs AS (
        |  SELECT a.source AS src_a, b.source AS src_b, count(*) AS shared
        |  FROM kept a JOIN kept b USING (g) WHERE a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT src_a, src_b, CAST(shared AS BIGINT) AS shared_shingles,
        |  CAST(na.n AS BIGINT) AS n_a, CAST(nb.n AS BIGINT) AS n_b,
        |  CAST((shared * 1000) // (na.n + nb.n - shared) AS BIGINT) AS jaccard_milli
        |FROM pairs JOIN n na ON na.source = src_a JOIN n nb ON nb.source = src_b
        |ORDER BY src_a, src_b""".stripMargin,

    // two histogram passes replayed on the same power-of-two grid
    // (width 4), then Hampel's 3-MAD outlier count over the devs
    "q166_mad_outliers" ->
      """WITH v AS (SELECT lang, CAST(n_chars AS DOUBLE) AS x FROM documents WHERE n_chars IS NOT NULL),
        |b1 AS (SELECT lang, least(255, greatest(0, CAST(floor((x - 0.0) / 1024.0 * 256) AS BIGINT))) AS bin FROM v),
        |h1 AS (SELECT lang, bin, count(*) AS cnt FROM b1 GROUP BY 1, 2),
        |c1 AS (SELECT lang, bin,
        |    sum(cnt) OVER (PARTITION BY lang ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cnt) OVER (PARTITION BY lang) AS n FROM h1),
        |m1 AS (SELECT lang, CAST(max(n) AS BIGINT) AS n,
        |    0.0 + (CAST(min(bin) + 1 AS DOUBLE) * 1024.0) / 256 AS med
        |  FROM c1 WHERE cum >= CAST(ceil(0.5 * n) AS BIGINT) GROUP BY 1),
        |d AS (SELECT v.lang, abs(v.x - m1.med) AS dev FROM v JOIN m1 ON v.lang = m1.lang),
        |b2 AS (SELECT lang, least(255, greatest(0, CAST(floor((dev - 0.0) / 1024.0 * 256) AS BIGINT))) AS bin FROM d),
        |h2 AS (SELECT lang, bin, count(*) AS cnt FROM b2 GROUP BY 1, 2),
        |c2 AS (SELECT lang, bin,
        |    sum(cnt) OVER (PARTITION BY lang ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cnt) OVER (PARTITION BY lang) AS n FROM h2),
        |m2 AS (SELECT lang, 0.0 + (CAST(min(bin) + 1 AS DOUBLE) * 1024.0) / 256 AS mad
        |  FROM c2 WHERE cum >= CAST(ceil(0.5 * n) AS BIGINT) GROUP BY 1),
        |o AS (SELECT d.lang, CAST(sum(CASE WHEN d.dev > 3.0 * m2.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |  FROM d JOIN m2 ON d.lang = m2.lang GROUP BY 1)
        |SELECT m1.lang, m1.n, m1.med AS med_est, m2.mad AS mad_est, o.n_outliers
        |FROM m1 JOIN m2 ON m1.lang = m2.lang JOIN o ON m1.lang = o.lang
        |ORDER BY m1.lang""".stripMargin,

    // histogram replay: identical power-of-two grid, per-bin counts
    // (the shard split is invisible — addition is lossless), one
    // cumulative scan over ≤1024 state rows, upper-edge readout
    "q162_hist_quantile" ->
      """WITH b AS (
        |  SELECT l_returnflag,
        |    least(1023, greatest(0, CAST(floor((CAST(l_extendedprice AS DOUBLE) - 0.0) / 131072.0 * 1024) AS BIGINT))) AS bin
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |h AS (SELECT l_returnflag, bin, count(*) AS cnt FROM b GROUP BY 1, 2),
        |c AS (SELECT l_returnflag, bin, cnt,
        |    sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cnt) OVER (PARTITION BY l_returnflag) AS n
        |  FROM h)
        |SELECT l_returnflag, CAST(max(n) AS BIGINT) AS n,
        |  0.0 + (CAST(min(bin) + 1 AS DOUBLE) * 131072.0) / 1024 AS q_est
        |FROM c WHERE cum >= CAST(ceil(0.5 * n) AS BIGINT)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // the heap aggregate's total order IS the window's (score DESC,
    // id ASC), so the relational top-5 replays it row for row; null
    // scores are ignored by the aggregate, hence the WHERE
    "q163_topk_per_group" ->
      """SELECT c_mktsegment, CAST(rk AS BIGINT) AS rk, c_custkey, c_acctbal
        |FROM (
        |  SELECT c_mktsegment, c_custkey, c_acctbal,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY c_acctbal DESC, c_custkey) AS rk
        |  FROM customer WHERE c_acctbal IS NOT NULL)
        |WHERE rk <= 5 ORDER BY c_mktsegment, rk""".stripMargin,

    // SCD2 replay: change rows by null-safe lag inequality, validity
    // end by lead over the kept rows — both engines order by
    // (ts, event_id) so equal-timestamp changes intervalize alike
    "q164_scd2" ->
      """WITH o AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    lag(event_type) OVER w AS prev,
        |    row_number() OVER w AS rn
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |ch AS (
        |  SELECT user_id, ts, event_id, event_type FROM o
        |  WHERE rn = 1 OR event_type IS DISTINCT FROM prev),
        |iv AS (
        |  SELECT user_id, event_type, ts AS valid_from,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        |  FROM ch)
        |SELECT user_id, event_type, valid_from, valid_to
        |FROM iv ORDER BY user_id, valid_from, event_type""".stripMargin,

    // the bloom filter only PRUNES — the verifying join makes the
    // result exactly the plain join, which is the oracle
    "q96_bloom_join" ->
      """SELECT p_brand, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size = 15
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    // single-space split + list_distinct mirror the Spark token stream
    "q97_repetition" ->
      """WITH l AS (SELECT doc_id, string_split(text, ' ') AS w
        |  FROM documents WHERE text IS NOT NULL),
        |b AS (SELECT doc_id, w,
        |  list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]) AS g FROM l)
        |SELECT doc_id,
        |  CAST(len(w) AS BIGINT) AS n_words,
        |  1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / CAST(len(w) AS DOUBLE) AS dup_word_frac,
        |  CAST(len(g) AS BIGINT) AS n_bigrams,
        |  CASE WHEN len(g) = 0 THEN 0.0
        |       ELSE 1.0 - CAST(len(list_distinct(g)) AS DOUBLE) / CAST(len(g) AS DOUBLE)
        |  END AS dup_bigram_frac
        |FROM b ORDER BY doc_id""".stripMargin,

    // the salt is invisible in the result: plain equi-join oracle
    "q98_salted_join" ->
      """SELECT c_mktsegment, count(*) AS n
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // the bloom split is invisible in the result: anti-join by the q39
    // fingerprint. Written as LEFT JOIN … IS NULL (not NOT IN) so a
    // NULL corpus fingerprint can never collapse the result to zero
    // rows — NULL-robust exactly like the Spark side's left_anti.
    "q99_incremental_dedup" ->
      """WITH fp AS (
        |  SELECT doc_id, lang,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS f
        |  FROM documents),
        |corpus AS (SELECT DISTINCT f FROM fp WHERE doc_id % 3 = 0),
        |batch AS (
        |  SELECT doc_id, lang, f FROM fp WHERE doc_id % 3 <> 0
        |  UNION ALL
        |  SELECT doc_id + 100000 AS doc_id, lang, f FROM fp WHERE doc_id % 3 = 0)
        |SELECT b.doc_id, b.lang FROM batch b
        |LEFT JOIN corpus c ON b.f = c.f
        |WHERE c.f IS NULL
        |ORDER BY b.doc_id""".stripMargin,

    // the q44 n-gram machinery at n=5; benchmark shingles drawn from
    // the same exploded stream (the benchmark IS a corpus slice here)
    "q100_decontaminate" ->
      """WITH tk AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS tokens FROM documents),
        |sh AS (
        |  SELECT doc_id, CASE WHEN len(tokens) >= 5 THEN list_transform(range(1, len(tokens) - 3), i -> array_to_string(tokens[i:i+4], ' ')) ELSE [] END AS s FROM tk),
        |ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |bench AS (SELECT DISTINCT g FROM ex WHERE doc_id % 17 = 0)
        |SELECT e.doc_id, count(DISTINCT e.g) AS n_hits
        |FROM ex e JOIN bench b ON e.g = b.g
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // every q101 fact is a deterministic driver-side value (the q90
    // recipe): the created constraint metadata, the post-evolution
    // column set, the upserted row count, and both validateUnique
    // verdicts over the three literal rows
    "q101_ddl_constraints" ->
      """SELECT * FROM (VALUES
        |  ('autoincrement', 'seq'),
        |  ('column', 'region'), ('column', 'order_id'), ('column', 'status'),
        |  ('column', 'cust_id'), ('column', 'seq'), ('column', 'note'),
        |  ('count', '3'), ('create_existing', 'thrown'),
        |  ('default:status', 'new'), ('fk:cust_id', 'customer.c_custkey'),
        |  ('pk', 'region'), ('pk', 'order_id'),
        |  ('pk_valid', 'true'), ('status_unique', 'false'),
        |  ('unique', 'seq')) AS t(kind, name)
        |ORDER BY kind, name""".stripMargin,

    // the fake org's catalog is static: two objects with fixed field
    // lists (Transport.scala objects map) — the VALUES literal IS the
    // generator
    "q102_rest_catalog" ->
      """SELECT obj, CAST(pos AS BIGINT) AS pos, field, dtype FROM (VALUES
        |  ('account', 0, 'Id', 'string'), ('account', 1, 'Name', 'string'),
        |  ('account', 2, 'Industry', 'string'), ('account', 3, 'Amount', 'double'),
        |  ('account', 4, 'NumEmployees', 'bigint'), ('account', 5, 'IsActive', 'boolean'),
        |  ('account', 6, 'LastModifiedDate', 'timestamp'), ('account', 7, 'IsDeleted', 'boolean'),
        |  ('contact', 0, 'Id', 'string'), ('contact', 1, 'Name', 'string'),
        |  ('contact', 2, 'AccountId', 'string'), ('contact', 3, 'Email', 'string'),
        |  ('contact', 4, 'LastModifiedDate', 'timestamp'), ('contact', 5, 'IsDeleted', 'boolean')
        |) AS t(obj, pos, field, dtype)
        |ORDER BY obj, pos""".stripMargin,

    "q107_incremental_neardup" -> IncrementalMinhashOracleSql,

    // namespace facts replayed from the SF-invariant region/nation
    // fixtures (counts, probe results, cross-namespace reads)
    "q109_namespaces" ->
      """WITH facts(kind, name) AS (
        |  SELECT 'exists:geo', 'true'
        |  UNION ALL SELECT 'exists:staging.geo', 'true'
        |  UNION ALL SELECT 'exists:geo@staging', 'true'
        |  UNION ALL SELECT 'exists:missing.geo', 'false'
        |  UNION ALL SELECT 'count:public', CAST((SELECT count(*) FROM region) AS VARCHAR)
        |  UNION ALL SELECT 'count:staging', CAST((SELECT count(*) FROM nation) AS VARCHAR)
        |  UNION ALL SELECT 'tables:public', 'geo'
        |  UNION ALL SELECT 'tables:staging', 'geo'
        |  UNION ALL SELECT 'row:' || CAST(n_nationkey AS VARCHAR), n_name
        |  FROM nation WHERE n_nationkey < 5)
        |SELECT kind, name FROM facts ORDER BY kind, name""".stripMargin,

    // autoincrement sequence replay: batch 1 (no id column) numbers
    // 1..20 in (name, bal) order; batch 2's NULL-id rows continue from
    // the table max (20) in the same order; the explicit-id row merges
    // under the COALESCE rule (patched name, old bal kept)
    "q108_autoincrement" ->
      """WITH b1 AS (
        |  SELECT c_name AS name, c_acctbal AS bal FROM customer WHERE c_custkey <= 20),
        |t1 AS (
        |  SELECT row_number() OVER (ORDER BY name, bal) AS id, name, bal FROM b1),
        |news AS (
        |  SELECT (SELECT count(*) FROM b1) + row_number() OVER (ORDER BY name, bal) AS id,
        |    name, bal
        |  FROM (VALUES ('aa-new', 2.5), ('zz-new', 1.5)) v(name, bal)),
        |upd(id, name) AS (VALUES (3, 'patched')),
        |merged AS (
        |  SELECT t1.id, COALESCE(u.name, t1.name) AS name, t1.bal
        |  FROM t1 LEFT JOIN upd u ON t1.id = u.id
        |  UNION ALL
        |  SELECT id, name, bal FROM news)
        |SELECT CAST(id AS BIGINT) AS id, name, CAST(bal AS DOUBLE) AS bal
        |FROM merged ORDER BY id""".stripMargin,

    // staged scrub replay: count each type on the PREVIOUS stage's
    // text (so a URL's host never double-counts as an IP), 'g' flag =
    // Spark's replace-all default
    "q106_pii_scrub" ->
      """WITH inj AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com via http://site' || CAST(doc_id AS VARCHAR) || '.example/page or 10.0.0.' || CAST(doc_id % 250 AS VARCHAR) ELSE text END AS text
        |  FROM documents),
        |s1 AS (SELECT doc_id, text, regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1 FROM inj),
        |s2 AS (SELECT doc_id, text, t1, regexp_replace(t1, 'https?://[^ \t\n\r]+', '<URL>', 'g') AS t2 FROM s1)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
        |  CAST(len(regexp_extract_all(t1, 'https?://[^ \t\n\r]+')) AS BIGINT) AS n_url,
        |  CAST(len(regexp_extract_all(t2, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS BIGINT) AS n_ip,
        |  md5(regexp_replace(t2, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g')) AS scrubbed_md5
        |FROM s2 ORDER BY doc_id""".stripMargin,

    // per-stratum md5 bucket, exact integer thresholds (q63 recipe)
    "q104_stratified_sample" ->
      """WITH s AS (
        |  SELECT * FROM documents
        |  WHERE CAST(concat('0x', substring(md5(concat('42', '|', CAST(doc_id AS VARCHAR))), 1, 14)) AS BIGINT) % 1000000
        |    < (CASE lang WHEN 'en' THEN 500000 WHEN 'zh' THEN 250000 ELSE 1000000 END))
        |SELECT lang, count(*) AS cnt FROM s GROUP BY lang ORDER BY lang""".stripMargin,

    // per-domain thresholds replayed from the data: the same IEEE
    // double formula floor(min(1, w·B/n)·1e6) over the same counts,
    // weights CAST to DOUBLE (DuckDB parses bare 0.5 as DECIMAL, whose
    // arithmetic would diverge from Spark's doubles)
    "q111_domain_mix" ->
      """WITH w(lang, w) AS (VALUES
        |    ('en', CAST(0.5 AS DOUBLE)), ('zh', CAST(0.3 AS DOUBLE)), ('de', CAST(0.2 AS DOUBLE))),
        |cnt AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |thr AS (
        |  SELECT c.lang,
        |    CAST(floor(least(CAST(1 AS DOUBLE), COALESCE(w.w, CAST(0 AS DOUBLE)) * 300 / c.n) * 1000000) AS BIGINT) AS t
        |  FROM cnt c LEFT JOIN w ON c.lang = w.lang),
        |s AS (
        |  SELECT d.lang FROM documents d JOIN thr ON d.lang = thr.lang
        |  WHERE CAST(concat('0x', substring(md5(concat('42', '|', CAST(doc_id AS VARCHAR))), 1, 14)) AS BIGINT) % 1000000 < thr.t)
        |SELECT lang, count(*) AS cnt FROM s GROUP BY lang ORDER BY lang""".stripMargin,

    // the q83 transitive closure labels clusters; the split is the md5
    // bucket of the CLUSTER id against the exact 0.8 threshold
    "q105_leakage_split" ->
      s"""WITH RECURSIVE ${winnowingPairsCtes(" WHERE doc_id % 2 = 0")},
        |sym AS (SELECT a AS src, b AS dst FROM p UNION SELECT b, a FROM p),
        |reach AS (
        |  SELECT doc_id AS src, doc_id AS dst FROM documents WHERE doc_id % 2 = 0
        |  UNION
        |  SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src),
        |cc AS (SELECT src AS doc_id, min(dst) AS cluster_id
        |       FROM reach GROUP BY src)
        |SELECT doc_id, cluster_id,
        |  CASE WHEN CAST(concat('0x', substring(md5(concat('42', '|', CAST(cluster_id AS VARCHAR))), 1, 14)) AS BIGINT) % 1000000 < 800000
        |       THEN 'train' ELSE 'holdout' END AS split
        |FROM cc ORDER BY doc_id""".stripMargin,

    // quota arithmetic: 100000 cap; the scan spends exactly 6 calls
    // (1 describe + 1 id query + 400/100 fetch batches); all 400 rows
    // (includeDeleted defaults true) are counted
    "q103_rest_limits" ->
      """SELECT * FROM (VALUES
        |  ('max', '100000'),
        |  ('remaining_after', '99994'),
        |  ('remaining_before', '100000'),
        |  ('rows_scanned', '400')) AS t(metric, value)
        |ORDER BY metric""".stripMargin
  )
}
