package graft.sources.files

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.types._

class FileSourcesSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("bal", DoubleType)))

  test("CSV round-trip with explicit schema; partitioned layout prunes") {
    val dir = Files.createTempDirectory("graft-csv").toString + "/t"
    val df = Seq((1L, "a", 1.5), (2L, "b", -2.0), (3L, "a", 0.0))
      .toDF("id", "name", "bal")
    FileSources.writeCsv(df, dir, partitionBy = Seq("name"))
    val back = FileSources.csv(spark, dir,
      StructType(schema.filterNot(_.name == "name")), header = true)
    assert(back.count() == 3)
    // partition column comes back from the directory layout
    assert(back.columns.toSet == Set("id", "bal", "name"))
    val pruned = back.filter($"name" === "a")
    assert(pruned.count() == 2)
    assert(pruned.queryExecution.executedPlan.toString.contains("PartitionFilters"))
  }

  test("JSON lines round-trip; corrupt rows quarantined, not dropped") {
    val dir = Files.createTempDirectory("graft-json").toString
    val good = s"$dir/data.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(good),
      """{"id":1,"name":"a","bal":1.5}
        |this is not json
        |{"id":2,"name":"b","bal":2.5}""".stripMargin.getBytes("UTF-8"))
    val withCorrupt = StructType(schema.fields :+
      StructField(FileSources.CorruptCol, StringType))
    val back = FileSources.jsonLines(spark, good, withCorrupt)
    assert(back.count() == 3) // PERMISSIVE keeps the bad line
    val corrupt = FileSources.corruptRows(back).select(FileSources.CorruptCol)
      .as[String].collect()
    assert(corrupt.toSeq == Seq("this is not json"))
    val clean = back.filter($"${FileSources.CorruptCol}".isNull)
    assert(clean.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("ORC round-trip; filters push into the ORC scan") {
    val dir = Files.createTempDirectory("graft-orc").toString + "/t"
    val df = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "bal")
    FileSources.writeOrc(df, dir)
    val back = FileSources.orc(spark, dir).filter($"bal" > 15.0)
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(bal,15.0)"), plan)
    assert(back.select("id").as[Long].collect().toSet == Set(2L, 3L))
    // pinned schema read agrees
    val pinned = FileSources.orc(spark, dir, Some(schema))
    assert(pinned.schema == schema && pinned.count() == 3)
  }

  test("textLines: one row per line for raw-document ingest") {
    val f = Files.createTempDirectory("graft-txt").toString + "/d.txt"
    java.nio.file.Files.write(java.nio.file.Paths.get(f),
      "doc one\ndoc two\n".getBytes("UTF-8"))
    val lines = FileSources.textLines(spark, f)
    assert(lines.columns.toSeq == Seq("value"))
    assert(lines.as[String].collect().toSet == Set("doc one", "doc two"))
  }
}
