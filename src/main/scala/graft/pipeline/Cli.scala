package graft.pipeline

import graft.core.Synthetic
import graft.export.Export
import graft.ops._
import graft.sources.{Tiff, Zarr}
import org.apache.spark.sql.SparkSession
import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.ObjectMapper
import java.nio.file.{Files, Paths}

/** CLI batch entry point — the reference's `scip OUTPUT CONFIG
  * PATHS...` (main.py:292-376). The config may be the reference's own
  * YAML (its actual query language, parsed by the offline subset
  * parser in [[YamlConfig]] and key-normalized from the scip shape —
  * a real scip_zarr.yml runs unconverted) or the same structure as
  * JSON (Jackson ships with Spark). Below is the graft-flattened key
  * shape both front-ends normalize to:
  *
  * Config shape (all stages optional except load/mask):
  * {{{
  * { "load": {"format": "synthetic|tiff|multiframe_tiff|zarr",
  *            "paths": [...], "regex": "...", "channels": ["0","1"],
  *            "channel_names": ["ch0","ch1"], "n": 100},
  *   "project": {"op": "max"},
  *   "illumination_correction": {"median_filter_size": 50},
  *   "segment": {"method": "watershed_dapi", "cell_diameter": 10, "parent_channel": 0},
  *   "sample": {"k": 50},
  *   "filter": {"population": true},
  *   "mask": [{"name": "li", "method": "li", "smooth": [0.75]},
  *            {"name": "spot", "method": "spot", "spotsize": 5}],
  *   "mask_filters": [{"method": "std", "channels": [0], "threshold": 1.0}],
  *   "normalization": {"quantile": true},
  *   "feature_extraction": {"types": ["regions","bbox","shape","intensity","texture"]},
  *   "export": {"format": "parquet", "coalesce": 1, "quantiles_csv": true} }
  * }}}
  *
  * Usage: `runMain graft.pipeline.Cli OUTPUT_DIR CONFIG.{json,yml} [timing.json] [PATHS...]`
  *
  * PATHS are positional, after the config — the reference's own call
  * shape (`scip OUTPUT CONFIG PATHS...`): when present they override
  * the config's `load.paths`, so a verbatim scip invocation (whose
  * YAML carries no paths at all) runs unchanged. The timing output is
  * recognized ONLY as the first argument after CONFIG, and only when
  * it ends in `.json` (graft's addition — the reference spells it as
  * a `--timing` option); a `.json` among the later PATHS is an error,
  * never a silently-claimed timing file.
  */
object Cli {

  /** Split the positional args after CONFIG into (timing output,
    * data paths). The timing output is only recognized in the FIRST
    * position, and only when it ends in `.json`; a `.json` among the
    * later PATHS is an error (it used to be silently claimed as the
    * timing file — dropped from load.paths AND clobbered on disk by
    * Export.timingJson). */
  private[pipeline] def splitArgs(
      rest: Seq[String]): (Option[String], Seq[String]) = {
    val timingPath = rest.headOption.filter(_.endsWith(".json"))
    val cliPaths = rest.drop(if (timingPath.isDefined) 1 else 0)
    require(!cliPaths.exists(_.endsWith(".json")),
      "a .json data path is not supported among positional PATHS (the " +
        "timing output is only accepted directly after CONFIG): " +
        cliPaths.filter(_.endsWith(".json")).mkString(", "))
    (timingPath, cliPaths)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: Cli OUTPUT_DIR CONFIG.{json,yml,yaml} [timing.json] [PATHS...]")
    val Array(outputDir, configPath) = args.take(2)
    val (timingPath, cliPaths) = splitArgs(args.drop(2).toSeq)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .appName("graft-pipeline")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    try {
      run(spark, outputDir, configPath, cliPaths)
      val runtime = (System.nanoTime() - t0) / 1e9
      timingPath.foreach(tp => Export.timingJson(spark, tp,
        Map("output" -> outputDir, "config" -> configPath), runtime))
      println(f"Full runtime $runtime%.2f s")
    } finally spark.stop()
  }

  def run(spark: SparkSession, outputDir: String, configPath: String,
      cliPaths: Seq[String] = Nil): Unit = {
    // the reference's config IS a YAML file (main.py:119-138) —
    // accept it unconverted next to the JSON spelling: .yml/.yaml
    // goes through the offline subset parser + the scip-shape key
    // normalizer (see YamlConfig); both land on the same JsonNode
    // consumers below
    val raw =
      if (configPath.endsWith(".yml") || configPath.endsWith(".yaml"))
        YamlConfig.parse(new String(
          Files.readAllBytes(Paths.get(configPath)), "UTF-8"))
      else new ObjectMapper().readTree(Files.readAllBytes(Paths.get(configPath)))
    val root = YamlConfig.normalize(raw)
    // refuse the PRE-RELEASE key shape by name BEFORE the load-stage
    // require below — a loading:-shaped config has no `load` node, and
    // "config needs a load stage" would bury the actual problem
    // (parseConfig re-checks for the paths-in-config entry route)
    require(!(root.has("loading") || root.has("masking")),
      "config uses the reference's pre-release key shape " +
        "(loading:/masking:) which current scip also rejects — " +
        "rename to load:/mask: (see test/data/scip_zarr.yml for the " +
        "current shape)")
    // CLI-positional PATHS (the reference's shape — its configs carry
    // no paths key) override/supply load.paths
    if (cliPaths.nonEmpty) {
      val load = root.get("load")
      require(load != null && load.isObject, "config needs a load stage")
      val arr = com.fasterxml.jackson.databind.node
        .JsonNodeFactory.instance.arrayNode()
      cliPaths.foreach(arr.add)
      load.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        .set[JsonNode]("paths", arr)
      ()
    }
    val cfg = parseConfig(root)
    val source = loadSource(spark, root.get("load"))
    val exportNode = Option(root.get("export"))
    val wantQuantiles =
      exportNode.flatMap(e => Option(e.get("quantiles_csv"))).exists(_.asBoolean())

    // the processed pre-branch stream is shared between the feature run
    // and the quantiles export, so the exported extents reflect every
    // configured stage (projection, illumination, segmentation,
    // sampling, mask filters) exactly as the branches saw them.
    // cfg.normalize IS parseConfig's reading of normalization.quantile —
    // one source of truth with the export and unpersist sites below
    val cfgNeedsBoundaries = wantQuantiles || cfg.normalize
    val prepared =
      if (cfgNeedsBoundaries) Pipeline.prepare(spark, source, cfg).cache()
      else Pipeline.prepare(spark, source, cfg)
    val table = Pipeline.runPrepared(spark, prepared, cfg)
    // through the Hadoop FS layer: outputDir may be a cluster
    // destination (s3a/hdfs) — java.nio would create a literal local
    // "s3a:/..." directory on the driver
    val outPath = new org.apache.hadoop.fs.Path(outputDir)
    org.apache.hadoop.fs.FileSystem.get(outPath.toUri,
      spark.sparkContext.hadoopConfiguration).mkdirs(outPath)

    val coalesce = exportNode.flatMap(e => Option(e.get("coalesce"))).map(_.asInt()).getOrElse(0)
    // export.filename names the partition objects, exactly like the
    // reference ({filename}.{partition}.parquet / .h5ad, main.py:271)
    val filename = exportNode.flatMap(e => Option(e.get("filename")))
      .map(_.asText()).getOrElse("features")
    exportNode.flatMap(e => Option(e.get("format"))).map(_.asText()).getOrElse("parquet") match {
      case "anndata" => // K2: one .h5ad per partition
        val t = if (coalesce > 0) table.coalesce(coalesce) else table
        graft.export.AnnData.export(t, outputDir, filename)
      case _ =>
        Export.parquetPartFiles(table, outputDir, filename, coalesce)
    }

    if (cfg.normalize || wantQuantiles) {
      // channel_boundaries.csv whenever normalization runs
      // (main.py:49-60,240): wide {channel}_min/{channel}_max columns
      // indexed by group. The reference emits the SAME quantiles the
      // normalization consumed — which run after masking AND the
      // population filter — so the filter must apply here too, or the
      // CSV would report extents including tombstoned events
      var firstBranch = Masking.branch(prepared, cfg.branches.head.method,
        cfg.mainChannelIndex, cfg.combinedIndices)
      if (cfg.populationFilter)
        firstBranch = PopulationFilter(spark, firstBranch)
      val mm = Normalization.groupMinMax(spark, firstBranch)
      if (cfg.normalize)
        Export.channelBoundariesCsv(spark, mm, cfg.channelNames,
          s"$outputDir/channel_boundaries.csv")
      if (wantQuantiles) // legacy long-form export kept under its flag
        Export.quantilesCsv(spark, mm, s"$outputDir/quantiles.csv")
    }
    if (wantQuantiles || cfg.normalize) prepared.unpersist(false)
    // release the per-branch caches Normalization.normalize /
    // Illumination.correct created (their two-pass shape needs the
    // cache until the export above consumed the result; there is no
    // per-dataset completion hook, so the run boundary is the scope)
    spark.catalog.clearCache()
  }

  private def strings(n: JsonNode): Seq[String] =
    (0 until n.size()).map(n.get(_).asText())
  private def ints(n: JsonNode): Seq[Int] =
    (0 until n.size()).map(n.get(_).asInt())
  private def doubles(n: JsonNode): Seq[Double] =
    (0 until n.size()).map(n.get(_).asDouble())

  def loadSource(spark: SparkSession, load: JsonNode) = {
    require(load != null, "config needs a load stage")
    load.get("format").asText() match {
      case "synthetic" =>
        val n = Option(load.get("n")).map(_.asInt()).getOrElse(10)
        Option(load.get("kind")).map(_.asText()) match {
          case Some("cells") => Synthetic.cells(spark, n,
            // channels may be the documented array form — asInt() on
            // an ArrayNode silently returns 0 (0-channel events)
            channels = Option(load.get("channels")).map(ch =>
              if (ch.isArray) ch.size() else ch.asInt()).getOrElse(2))
          case _ => Synthetic.conftest(spark, n)
        }
      case "tiff" =>
        val regex = Option(load.get("regex")).map(_.asText()).getOrElse(
          throw new IllegalArgumentException("tiff load needs a 'regex' key"))
        val chans = Option(load.get("channels")).map(strings).getOrElse(
          throw new IllegalArgumentException("tiff load needs a 'channels' key"))
        val meta = Tiff.loadMeta(spark, strings(load.get("paths")), regex)
        Tiff.loadPixels(meta, chans)
      case "multiframe_tiff" =>
        val mfChannels = Option(load.get("channels")).map(ints).orNull
        strings(load.get("paths"))
          .map(Tiff.loadMultiframeDirectory(spark, _, mfChannels))
          .reduceLeft(_ unionByName _).as(graft.core.Codecs.imageEventEncoder)
      case "zarr" =>
        val regex = Option(load.get("regex")).map(_.asText()).orNull
        strings(load.get("paths"))
          .map(Zarr.metaFromDirectory(spark, _, regex))
          .reduceLeft(_ unionByName _) match { case meta =>
            Zarr.loadPixels(meta,
              Option(load.get("channels")).map(ints).orNull)
          }
      case "czi" =>
        val scenesNode = Option(load.get("scenes")).filterNot(_.isNull)
        val sceneList = scenesNode.filter(_.isArray).map(strings).orNull
        val sceneRegex = scenesNode.filter(_.isTextual).map(_.asText()).orNull
        val regex = Option(load.get("regex")).map(_.asText()).orNull
        strings(load.get("paths"))
          .map(p => graft.sources.Czi.metaFromDirectory(spark, p,
            scenes = sceneList, scenesRegex = sceneRegex, regex = regex))
          .reduceLeft(_ unionByName _) match { case meta =>
            graft.sources.Czi.loadPixels(meta,
              Option(load.get("channels")).map(ints).orNull)
          }
      case other => throw new IllegalArgumentException(s"unknown load format: $other")
    }
  }

  def parseConfig(root: JsonNode): PipelineConfig = {
    // the reference tree also carries PRE-RELEASE configs keyed
    // loading:/masking: (repo-root scip_czi.yml etc.) that current
    // scip itself rejects ("Config is incomplete", main.py:120-132)
    // — name the problem instead of tripping over the missing keys
    require(!(root.has("loading") || root.has("masking")),
      "config uses the reference's pre-release key shape " +
        "(loading:/masking:) which current scip also rejects — " +
        "rename to load:/mask: (see test/data/scip_zarr.yml for the " +
        "current shape)")
    val load = root.get("load")
    val channelNames = Option(load.get("channel_names")).map(strings)
      .getOrElse(Option(load.get("channels")).map(strings).getOrElse(Seq("ch0", "ch1", "ch2")))

    val maskNode = Option(root.get("mask")).filterNot(_.isNull).orNull
    // the reference's `mask: null` config: ONE pass-through "no"
    // branch (unprefixed features computed from the segmentation
    // stage's masks — see Masking.NoOp). A mask-dependent feature set
    // without a segmentation stage has no masks to read; the
    // reference KeyErrors there, this fails with the reason.
    val noMask = maskNode == null || maskNode.size() == 0
    if (noMask) {
      val types = Option(root.get("feature_extraction")).filterNot(_.isNull)
        .flatMap(f => Option(f.get("types"))).map(strings)
        .getOrElse(Seq("regions", "bbox", "shape", "intensity", "texture"))
      require(root.hasNonNull("segment") || types.forall(_ == "raw"),
        "mask: null needs a segmentation stage — its per-cell masks are " +
          "what the \"no\" branch's shape/intensity/bbox features read " +
          "(the reference's to_events contract); configure segment, a " +
          "mask, or feature_extraction types [raw]")
    }
    val branches = if (noMask)
      Seq(MaskBranchConfig("no", Masking.NoOp))
    else (0 until maskNode.size()).map { i =>
      val b = maskNode.get(i)
      val method = b.get("method").asText() match {
        case "none" | "no" => Masking.NoOp
        case "circle" => Masking.Circle
        case "threshold" | "otsu" => Masking.Otsu
        case "li" => Masking.Li(Option(b.get("smooth")).map(doubles).getOrElse(Seq(1.0)))
        case "spot" => Masking.Spot(Option(b.get("spotsize")).map(_.asInt()).getOrElse(5))
        case "sobel" => Masking.SobelQuantile(Option(b.get("quantile")).map(_.asDouble()).getOrElse(0.9))
        case "watershed" => Masking.WatershedMethod(
          Option(b.get("noisy_channels")).map(n =>
            (0 until n.size()).map(n.get(_).asInt())).getOrElse(Seq.empty))
        case m => throw new IllegalArgumentException(s"unknown mask method: $m")
      }
      MaskBranchConfig(
        Option(b.get("name")).map(_.asText()).getOrElse(b.get("method").asText()),
        method,
        // per-branch feature selection (the reference's per-branch
        // feature_extraction map, normalized by YamlConfig); absent →
        // the pipeline-level types
        featureTypes = Option(b.get("feature_types")).filterNot(_.isNull)
          .map(strings))
    }

    val maskFilters = Option(root.get("mask_filters")).toSeq.flatMap { mf =>
      (0 until mf.size()).map { i =>
        val f = mf.get(i)
        val chs = ints(f.get("channels"))
        def threshold: Double = Option(f.get("threshold")).map(_.asDouble())
          .getOrElse(throw new IllegalArgumentException(
            s"mask filter '${f.get("method").asText()}' needs a 'threshold' key"))
        f.get("method").asText() match {
          case "normaltest" => Masking.NormalTest(chs)
          case "std" => Masking.StdFilter(chs, threshold)
          case "value_range" => Masking.ValueRange(chs, threshold)
          case m => throw new IllegalArgumentException(s"unknown mask filter: $m")
        }
      }
    }

    PipelineConfig(
      channelNames = channelNames,
      mainChannelIndex = Option(root.get("main_channel_index")).map(_.asInt()).getOrElse(0),
      projectOp = Option(root.get("project")).flatMap(p => Option(p.get("op"))).map(_.asText()),
      illuminationCorrection = root.has("illumination_correction") &&
        !root.get("illumination_correction").isNull,
      // settings.median_filter_size, like the reference's
      // illumination_correction settings dict (jones_2006.correct) —
      // a SIZE (window width), the reference's only spelling. The old
      // "median_radius" alias passed the value through unconverted, so
      // radius-expecting users got a window of half the intent.
      illuminationMedianSize = Option(root.get("illumination_correction"))
        .filterNot(_.isNull).flatMap(n => Option(n.get("median_filter_size")))
        .map(_.asInt()).getOrElse(50),
      illuminationPrecomputed = Option(root.get("illumination_correction"))
        .filterNot(_.isNull).flatMap(n => Option(n.get("precomputed")))
        .map(_.asText()),
      segment = Option(root.get("segment")).filterNot(_.isNull).map { s =>
        s.get("method").asText() match {
          case "watershed_dapi" => Segmentation.WatershedDapi(
            Option(s.get("cell_diameter")).map(_.asInt()).getOrElse(10))
          case "cellpose" => Segmentation.CellposeShaped(
            parentChannelIndex = Option(s.get("parent_channel")).map(_.asInt()).getOrElse(0),
            dapiChannelIndex = Option(s.get("dapi_channel")).map(_.asInt()).getOrElse(0),
            channelIndices = Option(s.get("channels")).map(ints).orNull,
            cellDiameter = Option(s.get("cell_diameter")).map(_.asInt()).getOrElse(10),
            flowThreshold = Option(s.get("flow_threshold")).map(_.asDouble()).getOrElse(0.4))
          case m => throw new IllegalArgumentException(s"unknown segmenter: $m")
        }
      },
      segmentParentChannel = Option(root.get("segment")).filterNot(_.isNull)
        .flatMap(s => Option(s.get("parent_channel"))).map(_.asInt()).getOrElse(0),
      sampleK = Option(root.get("sample")).filterNot(_.isNull)
        .flatMap(s => Option(s.get("k"))).map(_.asInt()),
      sampleWithReplacement = Option(root.get("sample")).filterNot(_.isNull)
        .flatMap(s => Option(s.get("with_replacement"))).exists(_.asBoolean()),
      maskNpyDir = Option(root.get("segment")).filterNot(_.isNull)
        .flatMap(s => Option(s.get("export_masks"))).map(_.asText()),
      maskFilters = maskFilters,
      branches = branches,
      combinedIndices = Option(root.get("mask_combined_indices"))
        .orElse(Option(root.get("combined_indices"))).map(ints).orNull,
      populationFilter = Option(root.get("filter")).filterNot(_.isNull)
        .flatMap(f => Option(f.get("population"))).exists(_.asBoolean()),
      normalize = Option(root.get("normalization")).filterNot(_.isNull)
        .flatMap(n => Option(n.get("quantile"))).exists(_.asBoolean()),
      featureTypes = Option(root.get("feature_extraction")).filterNot(_.isNull)
        .flatMap(f => Option(f.get("types"))).map(strings)
        .getOrElse(Seq("regions", "bbox", "shape", "intensity", "texture")))
  }
}
