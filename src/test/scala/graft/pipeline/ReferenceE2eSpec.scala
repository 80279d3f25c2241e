package graft.pipeline

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** The reference's own e2e assertions (test/test_main.py:20-48) run
  * against the engine on the reference's own bundled zarr data. */
class ReferenceE2eSpec extends SparkSpec {

  test("scip_zarr.yml shape on test.zarr: 10 rows, all branch families") {
    assume(Files.exists(Paths.get("/root/reference/test/data/test.zarr")))
    // the raw wide feature table (the registry entry fuses the per-row
    // digest into its map since r16 — the spec asserts on the WIDE
    // view, shared via p07Wide so the two cannot drift)
    val df = graft.rel.PipelineQueries.p07Wide(spark)
    val rows = df.collect()
    // limit -1 => every input event appears (test_main expected_n=10)
    assert(rows.length == 10)
    val cols = df.columns
    assert(cols.count(_.contains("circle-1")) > 0)
    assert(cols.count(_.contains("circle-2")) > 0)
    assert(cols.count(_.contains("spot")) > 0)
    assert(cols.count(_.contains("li")) > 0)
    // per-branch feature selection: li carries no bbox columns
    // (bbox/regions render as meta_<prefix>_ columns, reference naming)
    assert(!cols.exists(c => c.contains("li_bbox")),
      cols.filter(_.contains("bbox")).mkString(","))
    assert(cols.exists(c => c.contains("circle-1_bbox")))
    // the two circle branches stay bit-identical on real data
    // (column shapes: feat_circle-1_* and meta_circle-1_bbox/regions*)
    val c1 = cols.filter(_.contains("circle-1")).sorted
    val c2 = cols.filter(_.contains("circle-2")).sorted
    assert(c1.length == c2.length)
    rows.foreach { r =>
      c1.zip(c2).foreach { case (a, b) =>
        val va = r.getAs[Any](a); val vb = r.getAs[Any](b)
        assert(va == vb || (va == null && vb == null), s"$a=$va $b=$vb")
      }
    }
    // some events survive the mask filters with real features
    val featCols = cols.filter(_.startsWith("feat_circle-1_"))
    assert(featCols.nonEmpty)
    assert(rows.exists(r => featCols.exists(c => r.getAs[Any](c) != null)))
  }
}
