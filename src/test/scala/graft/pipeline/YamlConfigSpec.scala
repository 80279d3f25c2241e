package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** The offline YAML-subset parser + scip-shape normalizer, against
  * the reference's own config files (the YAML is the reference's
  * query language — main.py:119-138). */
class YamlConfigSpec extends AnyFunSuite {

  test("subset grammar: scalars, comments, inline lists, nulls, nesting") {
    val n = YamlConfig.parse(
      """# top comment
        |a: 1
        |b: "two"   # trailing comment
        |c: [0, 1.5, true]
        |d:
        |e:
        |  f: -3
        |  g:
        |    - x: 1
        |      y: hello world
        |    - x: 2
        |      y:
        |list:
        |  - plain
        |  - 'quoted'
        |""".stripMargin)
    assert(n.get("a").asLong() == 1L)
    assert(n.get("b").asText() == "two")
    assert(n.get("c").size() == 3 && n.get("c").get(1).asDouble() == 1.5 &&
      n.get("c").get(2).asBoolean())
    assert(n.get("d").isNull)
    assert(n.get("e").get("f").asLong() == -3L)
    val g = n.get("e").get("g")
    assert(g.size() == 2 && g.get(0).get("y").asText() == "hello world" &&
      g.get(1).get("y").isNull)
    assert(n.get("list").get(1).asText() == "quoted")
  }

  test("the reference's scip_zarr.yml parses and normalizes to graft keys") {
    val ref = Paths.get("/root/reference/test/data/scip_zarr.yml")
    assume(Files.exists(ref))
    val raw = YamlConfig.parse(Files.readString(ref))
    // raw tree holds the reference's own structure
    assert(raw.get("mask").get("methods").size() == 4)
    assert(raw.get("load").get("kwargs").get("regex").asText()
      .contains("(?P<group>"))
    val n = YamlConfig.normalize(raw)
    // graft keys: regex flattened + Python named group translated
    assert(n.get("load").get("regex").asText().contains("(?<group>"))
    assert(!n.get("load").get("regex").asText().contains("?P<"))
    // mask.methods → branch list with kwargs flattened
    val mask = n.get("mask")
    assert(mask.isArray && mask.size() == 4)
    val li = (0 until 4).map(mask.get).find(_.get("name").asText() == "li").get
    assert(li.get("smooth").size() == 2)
    // per-branch feature_extraction map → branch feature_types (li has
    // no bbox in the reference file)
    val liTypes = (0 until li.get("feature_types").size())
      .map(li.get("feature_types").get(_).asText())
    assert(liTypes == Seq("shape", "intensity", "regions"))
    // filters → mask_filters with channels/threshold flattened
    val mf = n.get("mask_filters")
    assert(mf.size() == 2)
    assert(mf.get(1).get("method").asText() == "std" &&
      mf.get(1).get("threshold").asDouble() == 2.0 &&
      mf.get(1).get("channels").get(0).asInt() == 1)
    // combined_indices / main_channel_index hoisted
    assert(n.get("mask_combined_indices").size() == 2)
    assert(n.get("main_channel_index").asInt() == 0)
    // null stages stay absent: no segment/project/illumination/filter
    Seq("segment", "project", "illumination_correction", "filter")
      .foreach(k => assert(!n.has(k) || n.get(k).isNull ||
        (n.get(k).isObject && n.get(k).isEmpty), k))
  }

  test("a pre-release loading:/masking: config is refused by name") {
    val ref = Paths.get("/root/reference/scip_czi.yml")
    assume(Files.exists(ref))
    val n = YamlConfig.normalize(YamlConfig.parse(Files.readString(ref)))
    val e = intercept[IllegalArgumentException] {
      Cli.parseConfig(n)
    }
    assert(e.getMessage.contains("pre-release key shape"), e.getMessage)
  }

  test("a graft-shape config passes through normalize untouched") {
    val n = YamlConfig.parse(
      """load:
        |  format: synthetic
        |  n: 6
        |mask:
        |  - name: circle
        |    method: circle
        |""".stripMargin)
    assert(YamlConfig.normalize(n) eq n)
  }
}
