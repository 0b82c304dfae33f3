package graft.core

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based laws (SURVEY §5.3): upsert idempotency, predicate-DSL
  * equivalence against a direct in-memory evaluator, and delete/select
  * complementarity. Small generated relations, few cases — each case
  * runs real Spark jobs. */
object LawsProps extends Properties("graft.core") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withWorkers(1)

  private lazy val spark = SparkTestSession.get
  import spark.implicits._

  private type Row3 = (Long, Option[String], Option[Double])

  private val genRow: Gen[Row3] = for {
    id <- Gen.chooseNum(0L, 20L)
    name <- Gen.option(Gen.oneOf("a", "b", "c", "dd"))
    bal <- Gen.option(Gen.chooseNum(-100.0, 100.0))
  } yield (id, name, bal)

  private def distinctByPk(rows: List[Row3]): List[Row3] =
    rows.groupBy(_._1).values.map(_.head).toList

  private def df(rows: List[Row3]): DataFrame =
    rows.toDF("id", "name", "bal")

  private def canon(d: DataFrame): Set[(Long, Option[String], Option[Double])] =
    d.as[Row3].collect().toSet

  // upsert(upsert(t, u), u) == upsert(t, u) — the reference's
  // ON CONFLICT merge is idempotent per batch (database/main.py:88-117)
  property("upsert idempotency") = Prop.forAll(
    Gen.listOfN(8, genRow).map(distinctByPk),
    Gen.listOfN(6, genRow).map(distinctByPk)) { (t, u) =>
    val once = Mutations.upsert(df(t), df(u), Seq("id"))
    val twice = Mutations.upsert(once, df(u), Seq("id"))
    canon(once) == canon(twice)
  }

  // predicate DSL compiled to Catalyst == direct Scala evaluation of
  // the reference's semantics (database/main.py:191-216)
  private val genPred: Gen[Pred] = Gen.oneOf(
    Gen.chooseNum(-50.0, 50.0).map(v => Pred.Op("bal", ">", v)),
    Gen.chooseNum(-50.0, 50.0).map(v => Pred.Op("bal", "<=", v)),
    Gen.chooseNum(-50.0, 50.0).flatMap(lo => Gen.chooseNum(0.0, 50.0).map(w =>
      Pred.Between("bal", lo, lo + w))),
    Gen.someOf(Seq("a", "b", "c")).map(vs => Pred.In("name", vs.toSeq)),
    Gen.const(Pred.IsNull("bal")),
    Gen.const(Pred.IsNotNull("name")),
    Gen.const(Pred.Like("name", "%d%")),
    Gen.const(Pred.NotLike("name", "a%")))

  private def evalRef(r: Row3, p: Pred): Boolean = p match {
    case Pred.Op("bal", ">", v: Double)  => r._3.exists(_ > v)
    case Pred.Op("bal", "<=", v: Double) => r._3.exists(_ <= v)
    case Pred.Between("bal", lo: Double, hi: Double) =>
      r._3.exists(b => b >= lo && b <= hi)
    case Pred.In("name", vs)   => r._2.exists(n => vs.contains(n))
    case Pred.IsNull("bal")    => r._3.isEmpty
    case Pred.IsNotNull("name") => r._2.isDefined
    case Pred.Like("name", _)  => r._2.exists(_.contains("d"))
    case Pred.NotLike("name", _) => r._2.exists(n => !n.startsWith("a"))
    case other => sys.error(s"unexpected $other")
  }

  property("predicate DSL equivalence") = Prop.forAll(
    Gen.listOfN(12, genRow), Gen.listOfN(2, genPred)) { (rows, preds) =>
    val viaSpark = Query.get(df(rows), where = preds)
      .as[Row3].collect().toList.sorted
    val direct = rows.filter(r => preds.forall(evalRef(r, _))).sorted
    viaSpark == direct
  }

  // DELETE p and SELECT WHERE p partition the table (rows where p is
  // NULL stay, matching SQL DELETE semantics — database/main.py:271-285)
  property("delete/select complementarity") = Prop.forAll(
    Gen.listOfN(10, genRow).map(distinctByPk), genPred) { (rows, p) =>
    val t = df(rows)
    val kept = canon(Mutations.delete(t, Seq(p)))
    val selected = canon(Query.get(t, where = Seq(p)))
    (kept intersect selected).isEmpty && (kept union selected) == canon(t)
  }
}
