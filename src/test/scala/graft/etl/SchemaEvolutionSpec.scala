package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Schema-evolved lake reads: additive evolution unions drop schemas
  * with NULL backfill for pre-column rows, and a REDEFINED column
  * (same name, different type) fails loudly instead of corrupting —
  * the additive-only contract `LakeWriter.readEvolved` documents.
  */
class SchemaEvolutionSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("additive evolution: union of drop schemas, NULL backfill, data intact") {
    val spark0 = spark
    import spark0.implicits._
    val root = Files.createTempDirectory("evolve").toString
    // drop 1: the original feed
    Seq((1L, "alpha"), (2L, "beta")).toDF("id", "name")
      .write.parquet(s"$root/d=1")
    // drop 2: vendor added a score column
    Seq((3L, "gamma", 0.5), (4L, "delta", 0.75)).toDF("id", "name", "score")
      .write.parquet(s"$root/d=2")

    val lake = LakeWriter.readEvolved(spark, root)
    assert(lake.columns.toSet == Set("id", "name", "score", "d"))
    val rows = lake.collect()
    assert(rows.length == 4)
    val byId = rows.map(r => r.getAs[Long]("id") -> r).toMap
    assert(byId(1L).isNullAt(byId(1L).fieldIndex("score")), "pre-column row must read NULL")
    assert(byId(3L).getAs[Double]("score") == 0.5)
    assert(byId(2L).getAs[String]("name") == "beta")
  }

  test("a redefined column type fails the read loudly") {
    val spark0 = spark
    import spark0.implicits._
    val root = Files.createTempDirectory("evolve_bad").toString
    Seq((1L, "10")).toDF("id", "amount").write.parquet(s"$root/d=1")
    Seq((2L, 10L)).toDF("id", "amount").write.parquet(s"$root/d=2")
    val ex = intercept[Exception] {
      LakeWriter.readEvolved(spark, root).collect()
    }
    assert(ex.getMessage != null)
  }
}
