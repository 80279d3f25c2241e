package graft.ops

import graft.core.ImageEvent
import graft.core.Codecs._
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Population threshold filter — reference F2
  * (filter/threshold.py:8-27, wired main.py:214-228): per-record
  * stat = sum of the main channel; population mean/std of that stat;
  * keep records with stat > Φ⁻¹(0.05; μ, σ), tombstone the rest.
  *
  * The aggregate-then-filter shape: stats are one partial+final
  * aggregate (2 doubles shuffled), broadcast back into the row pass —
  * the decorrelated-scalar-subquery plan Catalyst would build for the
  * SQL equivalent (see rel.RelQueries q18).
  */
object PopulationFilter {

  /** Φ⁻¹(0.05) — scipy.stats.norm.ppf(0.05) */
  val Z05 = -1.6448536269514722

  /** per-record stat = sum of channel 0 — the reference hardcodes
    * index 0, not the main channel (filter/threshold.py:8-13:
    * `part[i]["pixels"][0].sum()`) */
  def filterSum(e: ImageEvent): Double = {
    var s = 0.0
    var i = 0
    val ps = e.planeSize
    while (i < ps) { s += e.pixels(i); i += 1 }
    s
  }

  def apply(spark: SparkSession, ds: Dataset[ImageEvent]): Dataset[ImageEvent] = {
    import spark.implicits._
    val cached = ds.cache() // reused: stats pass + predicate pass (main.py:219 persist)
    val statsRow = cached.filter(_.hasPixels)
      .map(filterSum)
      .toDF("s")
      // dask.bag.std is the population std (ddof=0)
      .agg(avg("s").as("mu"), stddev_pop("s").as("std"))
      .head()
    val q5 =
      if (statsRow.isNullAt(0)) Double.NegativeInfinity
      else statsRow.getDouble(0) + Z05 * statsRow.getDouble(1)
    cached.map(ImageEvent.whenPixels { e =>
      if (filterSum(e) > q5) e else e.tombstone
    })
  }
}
