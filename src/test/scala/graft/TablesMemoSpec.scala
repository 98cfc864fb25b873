package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** r14 schema-memo contract: Tables caches parquet SCHEMAS (metadata)
  * keyed by path+mtime — repeated constructions skip footer inference,
  * and a same-path rewrite with a different schema is picked up. */
class TablesMemoSpec extends SparkSpec {

  test("schema memo serves repeated reads and invalidates on rewrite") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-memo").toFile.getAbsolutePath
    Seq((1L, "a")).toDF("p_partkey", "p_name")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/part.parquet")
    assert(Tables.part(spark, d).schema.fieldNames.toSeq ===
      Seq("p_partkey", "p_name"))
    // repeated construction: same schema, and the rows actually read
    assert(Tables.part(spark, d).collect().map(_.getLong(0)).toSeq === Seq(1L))

    // rewrite the SAME path with a wider schema; mtime key must
    // invalidate the memo entry (sleep past mtime granularity)
    Thread.sleep(1100)
    Seq((2L, "b", "B#1")).toDF("p_partkey", "p_name", "p_brand")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/part.parquet")
    val after = Tables.part(spark, d)
    assert(after.schema.fieldNames.toSeq === Seq("p_partkey", "p_name", "p_brand"))
    assert(after.collect().map(_.getString(2)).toSeq === Seq("B#1"))
  }
}
