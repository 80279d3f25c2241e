package graft.ops

import graft.core.ImageEvent
import graft.core.Codecs._
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.rand

/** Sampling / limit — reference L1/L2 (main.py:191-196). */
object Sampling {

  /** exact-k sample without replacement: seeded rand sort + limit.
    * At scale this is a TakeOrderedAndProject (per-partition top-k,
    * k rows to the driver stage), not a full sort. */
  def sampleExact(ds: Dataset[ImageEvent], k: Int, seed: Long = 42): Dataset[ImageEvent] = {
    import ds.sparkSession.implicits._
    ds.orderBy(rand(seed)).limit(k).as[ImageEvent]
  }

  /** plain limit */
  def limit(ds: Dataset[ImageEvent], k: Int): Dataset[ImageEvent] = ds.limit(k)
}
