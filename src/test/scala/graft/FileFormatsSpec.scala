package graft

import graft.sources.FileSources
import org.apache.spark.sql.functions._

/** ORC interchange format (FileSources.readOrc/writeOrc): roundtrip
  * fidelity against the parquet source of truth, and the two plan
  * properties that make a format usable at scale — column pruning and
  * predicate pushdown must reach the ORC scan exactly as they do the
  * parquet scan.
  */
class FileFormatsSpec extends SparkSpec {

  test("orc roundtrip preserves rows, schema, and values") {
    import spark.implicits._
    val src = Tables(spark, sfDir, "orders")
    val out = "/tmp/graft_test_orc/orders"
    FileSources.writeOrc(src, out)
    val back = FileSources.readOrc(spark, out, src.schema)
    assert(back.schema == src.schema)
    val a = src.orderBy($"o_orderkey").collect()
    val b = back.orderBy($"o_orderkey").collect()
    assert(a.sameElements(b))
  }

  test("orc scans prune columns and push predicates like parquet") {
    import spark.implicits._
    val src = Tables(spark, sfDir, "orders")
    val out = "/tmp/graft_test_orc/orders2"
    FileSources.writeOrc(src, out)
    val q = FileSources.readOrc(spark, out, src.schema)
      .filter($"o_orderkey" > 100L)
      .select($"o_orderkey", $"o_totalprice")
    val scan = q.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).find(_.contains("orc")).get
    assert(scan.contains("PushedFilters") &&
      scan.contains("GreaterThan(o_orderkey"),
      s"filter not pushed into orc scan: ${scan.take(400)}")
    assert(scan.contains("ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>"),
      s"orc scan not pruned: ${scan.take(400)}")
  }
}
