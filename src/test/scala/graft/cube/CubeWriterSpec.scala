package graft.cube

import graft.SparkSpec
import java.nio.file.Files

class CubeWriterSpec extends SparkSpec {

  test("materialized cube prunes partitions and matches direct compute") {
    val out = Files.createTempDirectory("graft-cube").toString
    CubeWriter.materialize(spark, sfDir, out)

    val slice = CubeWriter.readSlice(spark, out, "click", 5, 25)
    val plan = slice.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters") &&
      plan.contains("dataset_id"), "dataset partition pruning missing")
    assert(plan.contains("PushedFilters") && plan.contains("band"),
      "band range not pushed to the scan")

    // values identical to the on-the-fly cube
    val direct = EventCube.cube(spark, sfDir, "click")
      .filter("band BETWEEN 5 AND 25")
      .select("band", "user_id", "v")
    val mat = slice.select("band", "user_id", "v")
    assert(mat.exceptAll(direct).isEmpty && direct.exceptAll(mat).isEmpty)
  }
}
