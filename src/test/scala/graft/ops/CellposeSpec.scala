package graft.ops

import graft.SparkSpec
import graft.core.Synthetic

/** cellpose-shaped segmentation (C9): exact overlap-assignment port,
  * executor-singleton model cache, batch plumbing, tombstones. */
class CellposeSpec extends SparkSpec {

  test("R5: gpu profile requests task+executor GPUs; gpu path falls back and matches on local") {
    val rp = Segmentation.cellposeGpuProfile(0.5)
    assert(rp.taskResources("gpu").amount == 0.5)
    assert(rp.executorResources("gpu").amount == 1.0)
    // local master rejects custom profiles at tagging time — the gpu
    // path must degrade to the default profile with identical output
    val cfg = Segmentation.CellposeShaped(parentChannelIndex = 0,
      dapiChannelIndex = 0, cellDiameter = 8)
    def key(e: graft.core.ImageEvent) = (e.path, e.idx, e.id)
    val cpu = Segmentation.segmentCellpose(Synthetic.cells(spark, 6, channels = 2), cfg)
      .collect().sortBy(key)
    val gpu = Segmentation.segmentCellposeGpu(Synthetic.cells(spark, 6, channels = 2), cfg)
      .collect().sortBy(key)
    assert(cpu.length == gpu.length)
    cpu.zip(gpu).foreach { case (a, b) =>
      assert(key(a) == key(b))
      assert(java.util.Arrays.equals(a.mask, b.mask))
      assert(a.regions.toSeq == b.regions.toSeq)
    }
  }

  test("assignChildren replicates the >10%-overlap rule") {
    // parent: label 1 covers cells 0-9, label 2 covers 10-19
    val parent = Array.fill(10)(1) ++ Array.fill(10)(2) ++ Array.fill(4)(0)
    // child label 7 covers 2 of parent-1's 10 px (20% -> kept) and
    // 1 of parent-2's 10 px (10%, NOT > 0.1 -> dropped);
    // child label 8 covers 1 px of parent 1 (10% -> dropped)
    val child = new Array[Int](24)
    child(0) = 7; child(1) = 7; child(10) = 7
    child(5) = 8
    child(22) = 9 // background parent: never assigned
    val out = Segmentation.assignChildren(parent, child)
    assert(out(0) == 1 && out(1) == 1)
    assert(out(10) == 0) // exactly 10% is not > 0.1
    assert(out(5) == 0)
    assert(out(22) == 0)
    assert(out.count(_ != 0) == 2)
  }

  test("assignment keeps the parent label, not the child label") {
    val parent = Array.fill(8)(3) ++ Array.fill(8)(0)
    val child = Array.fill(4)(9) ++ Array.fill(12)(0)
    val out = Segmentation.assignChildren(parent, child)
    assert(out.take(4).forall(_ == 3))
    assert(out.drop(4).forall(_ == 0))
  }

  test("model factory creates one instance per JVM (R6)") {
    val before = Segmentation.CellposeModels.instanceCount
    val a = Segmentation.CellposeModels.forWorker(Segmentation.StubCellposeFactory)
    val b = Segmentation.CellposeModels.forWorker(Segmentation.StubCellposeFactory)
    assert(a eq b)
    assert(Segmentation.CellposeModels.instanceCount <= before + 1)
  }

  test("segmentCellpose: parent channel keeps model labels, children reassigned") {
    val src = Synthetic.cells(spark, 8, channels = 2)
    val seg = Segmentation.segmentCellpose(src,
      Segmentation.CellposeShaped(parentChannelIndex = 0, dapiChannelIndex = 0,
        cellDiameter = 8, batchSize = 3)).collect()
    assert(seg.length == 8)
    seg.filter(_.hasMask).foreach { e =>
      val ps = e.planeSize
      val parentLabels = (0 until ps).map(e.mask(_)).filter(_ > 0).toSet
      val childLabels = (0 until ps).map(i => e.mask(ps + i)).filter(_ > 0).toSet
      // child labels are a subset of parent labels after reassignment
      assert(childLabels.subsetOf(parentLabels))
      assert(e.regions(0) == parentLabels.size)
    }
    assert(seg.exists(e => e.hasMask && e.regions(0) > 0), "stub must find cells")
  }

  test("segmentCellpose is deterministic and batch-size invariant") {
    val src = Synthetic.cells(spark, 6, channels = 2)
    def run(bs: Int) = Segmentation.segmentCellpose(src,
      Segmentation.CellposeShaped(0, 0, cellDiameter = 8, batchSize = bs))
      .collect().sortBy(_.idx).map(e => (e.idx, e.mask.toSeq, e.regions.toSeq)).toSeq
    assert(run(2) == run(128))
  }

  test("parent/dapi channel index beyond an event's channel count fails loudly") {
    val src = Synthetic.cells(spark, 2, channels = 2)
    val ex = intercept[org.apache.spark.SparkException] {
      Segmentation.segmentCellpose(src,
        Segmentation.CellposeShaped(parentChannelIndex = 5, dapiChannelIndex = 0,
          cellDiameter = 8)).collect()
    }
    val msg = Option(ex.getCause).getOrElse(ex).getMessage
    assert(msg.contains("cellpose parent/dapi channel"), s"got: $msg")
  }

  test("tombstones pass through segmentCellpose in order") {
    import graft.core.Codecs._
    val src = Synthetic.cells(spark, 4, channels = 2)
      .map(e => if (e.idx % 2 == 0) e.copy(pixels = null) else e)
    val out = Segmentation.segmentCellpose(src,
      Segmentation.CellposeShaped(0, 0, cellDiameter = 8)).collect().sortBy(_.idx)
    assert(out.length == 4)
    out.foreach { e =>
      if (e.idx % 2 == 0) assert(!e.hasPixels && !e.hasMask)
      else assert(e.hasPixels)
    }
  }
}
