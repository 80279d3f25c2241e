package graft.ops

import graft.core.ImageEvent
import graft.core.Codecs._
import org.apache.spark.sql.Dataset

/** Z-projection — reference P1 (projection/op.py:25-45): reduce a
  * (C, Z, H, W) stack to (C, H, W) by max or mean over Z. Events
  * carry the stack flattened with depth recorded in
  * `meta("depth")`; after projection the meta key is dropped.
  */
object Projection {

  def projectStack(px: Array[Float], channels: Int, depth: Int,
      h: Int, w: Int, op: String): Array[Float] = {
    // the reference looks the op up in a dict (projection/op.py) and
    // raises KeyError on anything unknown — don't silently mean-project
    require(op == "max" || op == "mean", s"unknown projection op '$op'")
    val ps = h * w
    val out = new Array[Float](channels * ps)
    var c = 0
    while (c < channels) {
      var i = 0
      while (i < ps) {
        var z = 0
        if (op == "max") {
          var acc = Float.MinValue
          while (z < depth) {
            val v = px((c * depth + z) * ps + i)
            if (v > acc) acc = v
            z += 1
          }
          out(c * ps + i) = acc
        } else {
          // accumulate in double: sequential float32 summation drifts
          // ~depth·2^-24 relative, past digest tolerance on deep stacks
          var acc = 0.0
          while (z < depth) {
            acc += px((c * depth + z) * ps + i)
            z += 1
          }
          out(c * ps + i) = (acc / depth).toFloat
        }
        i += 1
      }
      c += 1
    }
    out
  }

  def apply(ds: Dataset[ImageEvent], op: String): Dataset[ImageEvent] = {
    // validate at the entry point, not only inside the kernel: the
    // reference's dict lookup raises KeyError regardless of depth, so
    // an invalid op must fail even when every stack is depth-1 (where
    // projectStack is never reached)
    require(op == "max" || op == "mean", s"unknown projection op '$op'")
    ds.map(ImageEvent.whenPixels { e =>
      val depth = e.meta.get("depth").map(_.toInt).getOrElse(1)
      if (depth <= 1) e
      else e.copy(
        pixels = projectStack(e.pixels, e.channels, depth, e.height, e.width, op),
        meta = e.meta - "depth")
    })
  }
}
