package graft

import graft.mergetree.{ColumnarMergeTree, MergeTreeConfig, MergeTreeTable}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** `TRUNCATE TABLE` (O(manifest) part retirement) and ClickHouse's
  * `ALTER TABLE … MODIFY COLUMN c Type` spelling.
  */
class TruncateSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.session

  test("TRUNCATE drops all rows in one manifest swap; table stays usable") {
    val dir = Files.createTempDirectory("trunc_").toString
    import spark.implicits._
    val df = spark.range(100).select(col("id").as("k"), col("id").as("v"))
    val t = ColumnarMergeTree.create(spark, dir, df.schema, orderBy = Seq("k"),
      config = MergeTreeConfig(maxParts = 64))
    try {
      (0 until 4).foreach(i => t.insertBatch(df.filter(col("k") % 4 === i)))
      assert(t.scan().count() == 100 && t.partCount == 4)
      val dropped = spark.sql(s"TRUNCATE TABLE '$dir'").collect()
        .head.getLong(0)
      assert(dropped == 100L)
      assert(t.scan().count() == 0 && t.partCount == 0)
      // schema and tabledef survive: the table accepts new parts
      t.insertBatch(df.filter(col("k") < 10))
      assert(t.scan().count() == 10)
      // idempotent on empty
      assert(spark.sql(s"TRUNCATE TABLE '$dir'").collect()
        .head.getLong(0) == 10L)
      assert(spark.sql(s"TRUNCATE TABLE '$dir'").collect()
        .head.getLong(0) == 0L)
    } finally MergeTreeTable.deleteRecursively(Paths.get(dir))
  }

  test("MODIFY COLUMN rewrites to ALTER COLUMN TYPE with the CH type mapped") {
    // pin the TEXT rewrite through parsePlan: the resulting plan must be
    // Spark's AlterColumns on the mapped type (no catalog table needed —
    // analysis would resolve it; parsing is what's under test)
    val plan = spark.sessionState.sqlParser.parsePlan(
      "ALTER TABLE some_t MODIFY COLUMN v Float64")
    val s = plan.toString
    assert(s.toLowerCase.contains("double"), s"expected double type in: $s")
    // unknown type names pass through for Spark to validate (loud)
    intercept[Exception] {
      spark.sessionState.sqlParser.parsePlan(
        "ALTER TABLE some_t MODIFY COLUMN v NotAType!!!")
    }
  }
}
