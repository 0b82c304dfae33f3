package graft.core

import graft.SparkSpec
import org.apache.spark.sql.Row

class MutationsSpec extends SparkSpec {
  import spark.implicits._

  private def target = Seq(
    (1L, Some("a"), Some(10.0)), (2L, Some("b"), Some(20.0)), (3L, Some("c"), Some(30.0))
  ).toDF("id", "name", "bal")

  test("upsert: coalesce keeps old value when update is null; inserts new keys") {
    val updates = Seq(
      (2L, None: Option[String], Some(99.0)),   // match: bal overwritten, name kept
      (9L, Some("z"), None: Option[Double])     // insert
    ).toDF("id", "name", "bal")
    val out = Mutations.upsert(target, updates, Seq("id"))
      .orderBy("id").collect().toSeq
    assert(out == Seq(
      Row(1L, "a", 10.0), Row(2L, "b", 99.0), Row(3L, "c", 30.0), Row(9L, "z", null)))
  }

  test("upsert: overwriteWithNull takes the new value even when null (main.py:109-112)") {
    val updates = Seq((2L, None: Option[String], Some(99.0))).toDF("id", "name", "bal")
    val out = Mutations.upsert(target, updates, Seq("id"), overwriteWithNull = true)
      .orderBy("id").collect().toSeq
    assert(out(1) == Row(2L, null, 99.0))
    assert(out(0) == Row(1L, "a", 10.0))
  }

  test("upsert requires a PK (main.py:97-99)") {
    intercept[IllegalArgumentException](Mutations.upsert(target, target, Nil))
  }

  test("upsert: intra-batch duplicate PKs resolve last-wins by orderCol; orderCol is additive") {
    val updates = Seq(
      (2L, Some("first"), Some(1.0), 1L),
      (2L, Some("last"), Some(2.0), 5L)
    ).toDF("id", "name", "bal", "seq")
    val out = Mutations.upsert(target, updates, Seq("id"), orderCol = Some("seq"))
      .filter($"id" === 2L).collect().toSeq
    // seq is an updates-only column: additive evolution keeps it
    assert(out == Seq(Row(2L, "last", 2.0, 5L)))
  }

  test("upsert: orderCol that is a real target column participates in the merge") {
    val t = Seq((1L, "a", 100L)).toDF("id", "name", "updated_at")
    val updates = Seq((1L, "old", 200L), (1L, "new", 300L)).toDF("id", "name", "updated_at")
    val out = Mutations.upsert(t, updates, Seq("id"), orderCol = Some("updated_at"))
      .collect().toSeq
    assert(out == Seq(Row(1L, "new", 300L))) // last wins AND updated_at kept
  }

  test("upsert: columns only in updates are added (additive evolution at merge)") {
    val updates = Seq((2L, Some("b2"), Some(21.0), "extra")).toDF("id", "name", "bal", "note")
    val out = Mutations.upsert(target, updates, Seq("id")).orderBy("id")
    assert(out.columns.toSeq == Seq("id", "name", "bal", "note"))
    val rows = out.collect().toSeq
    assert(rows(1) == Row(2L, "b2", 21.0, "extra"))
    assert(rows(0) == Row(1L, "a", 10.0, null))
  }

  test("update: plain SET semantics — provided values overwrite, nulls included (D13)") {
    val changes = Seq((2L, None: Option[String])).toDF("id", "name")
    val out = Mutations.update(target, changes, Seq("id")).orderBy("id").collect().toSeq
    assert(out(1) == Row(2L, null, 20.0))  // name nulled, bal untouched
    assert(out(0) == Row(1L, "a", 10.0))
    assert(Mutations.updateRowCount(target, changes, Seq("id")) == 1L)
  }

  test("delete: predicate delete keeps NULL-predicate rows; no-where deletes all (D14)") {
    val t = Seq((1L, Some(5.0)), (2L, None: Option[Double]), (3L, Some(50.0)))
      .toDF("id", "x")
    // DELETE WHERE x > 10 removes only id=3; id=2 (NULL pred) survives
    val kept = Mutations.delete(t, Seq(Pred.Op("x", ">", 10.0)))
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L))
    assert(Mutations.delete(t).count() == 0)
  }
}
