package graft.pipeline

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory, ObjectNode}

/** The reference's config front-end is a YAML file — the YAML *is*
  * its query language (`scip OUTPUT CONFIG PATHS...` loads it via
  * yaml.FullLoader, reference main.py:119-138 / utils/util.py:160).
  * This is an OFFLINE-SAFE parser for exactly the subset those
  * configs use (block maps, block lists, inline `[a, b]` lists,
  * scalars, nesting by 2-space indent, `#` comments, quoted strings)
  * — no library dependency exists in this environment, and the full
  * YAML spec (anchors, multi-docs, flow maps, tags) is noise the
  * config shape never touches. Parsing lands on Jackson nodes so the
  * JSON path and the YAML path share every downstream consumer
  * ([[Cli.parseConfig]] / [[Cli.loadSource]]).
  *
  * [[normalize]] then maps the reference's ACTUAL key structure
  * (`load.kwargs.regex`, `mask.methods/filters/combined_indices`,
  * `segment.settings`, per-branch `feature_extraction` maps — the
  * shape of test/data/scip_zarr.yml) onto graft's flattened config
  * keys, so a user's real scip YAML runs UNCONVERTED; a YAML file
  * already written in graft's own key shape passes through untouched.
  */
object YamlConfig {

  private val F = JsonNodeFactory.instance

  // ---- YAML subset parser -------------------------------------------------

  private final case class Line(indent: Int, text: String)

  /** Strip a trailing comment, honoring single/double quotes (the
    * scip regexes contain no `#`, but correctness is cheap here). */
  private def stripComment(s: String): String = {
    var i = 0; var q: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (q != 0) { if (c == q) q = 0 }
      else if (c == '"' || c == '\'') q = c
      else if (c == '#' && (i == 0 || s.charAt(i - 1).isWhitespace))
        return s.substring(0, i)
      i += 1
    }
    s
  }

  private def scalar(raw: String): JsonNode = {
    val s = raw.trim
    if (s.isEmpty || s == "~" || s == "null") F.nullNode()
    else if ((s.startsWith("\"") && s.endsWith("\"") && s.length >= 2) ||
        (s.startsWith("'") && s.endsWith("'") && s.length >= 2))
      F.textNode(s.substring(1, s.length - 1))
    else if (s == "true") F.booleanNode(true)
    else if (s == "false") F.booleanNode(false)
    else if (s.matches("[+-]?\\d+")) F.numberNode(s.toLong)
    else if (s.matches("[+-]?(\\d+\\.\\d*|\\.\\d+)([eE][+-]?\\d+)?|[+-]?\\d+[eE][+-]?\\d+"))
      F.numberNode(s.toDouble)
    else F.textNode(s)
  }

  /** An inline `[a, b, c]` list of scalars (the only flow form the
    * config subset uses — no nested flow). Items split on commas
    * OUTSIDE quotes (the stripComment/keyColon scan discipline): a
    * quoted scalar containing a comma (`[a, "b,c"]`) used to silently
    * corrupt into two items. */
  private def inline(s: String): JsonNode =
    if (s.startsWith("[") && s.endsWith("]")) {
      val arr = F.arrayNode()
      val body = s.substring(1, s.length - 1).trim
      if (body.nonEmpty) {
        val items = scala.collection.mutable.ArrayBuffer.empty[String]
        val cur = new StringBuilder
        var i = 0; var q: Char = 0
        while (i < body.length) {
          val c = body.charAt(i)
          if (q != 0) { if (c == q) q = 0; cur += c }
          else if (c == '"' || c == '\'') { q = c; cur += c }
          else if (c == ',') { items += cur.result(); cur.clear() }
          else cur += c
          i += 1
        }
        require(q == 0, s"yaml: unterminated quote in flow list: [$body]")
        items += cur.result()
        items.foreach(p => arr.add(scalar(p)))
      }
      arr
    } else scalar(s)

  def parse(text: String): JsonNode = {
    val lines = text.linesIterator
      .map(l => stripComment(l.replace("\t", "  ")))
      .filter(_.trim.nonEmpty)
      .map { l =>
        val ind = l.indexWhere(!_.isWhitespace)
        Line(ind, l.trim)
      }
      .toVector
    val (node, rest) = parseBlock(lines)
    require(rest.isEmpty, s"yaml: trailing unparsed content: ${rest.head.text}")
    node
  }

  /** Parse the block starting at `lines.head` (a map or a list at its
    * indent); returns (node, remaining lines). */
  private def parseBlock(lines: Vector[Line]): (JsonNode, Vector[Line]) =
    if (lines.isEmpty) (F.nullNode(), lines)
    else if (lines.head.text.startsWith("- ") || lines.head.text == "-")
      parseList(lines, lines.head.indent)
    else parseMap(lines, lines.head.indent)

  private def parseMap(lines0: Vector[Line], indent: Int): (ObjectNode, Vector[Line]) = {
    val obj = F.objectNode()
    var lines = lines0
    while (lines.nonEmpty && lines.head.indent == indent &&
        !lines.head.text.startsWith("- ") && lines.head.text != "-") {
      val l = lines.head
      val ci = keyColon(l.text)
      require(ci > 0, s"yaml: expected 'key:' at: ${l.text}")
      val key = unquoteKey(l.text.substring(0, ci).trim)
      val rest = l.text.substring(ci + 1).trim
      lines = lines.tail
      if (rest.nonEmpty) { obj.set[JsonNode](key, inline(rest)); () }
      else if (lines.nonEmpty && lines.head.indent > indent) {
        val (child, rem) = parseBlock(lines)
        obj.set[JsonNode](key, child); lines = rem
      } else { obj.set[JsonNode](key, F.nullNode()); () }
    }
    (obj, lines)
  }

  private def parseList(lines0: Vector[Line], indent: Int): (ArrayNode, Vector[Line]) = {
    val arr = F.arrayNode()
    var lines = lines0
    while (lines.nonEmpty && lines.head.indent == indent &&
        (lines.head.text.startsWith("- ") || lines.head.text == "-")) {
      val l = lines.head
      val body = if (l.text == "-") "" else l.text.substring(2).trim
      lines = lines.tail
      if (body.isEmpty) {
        // "-" alone: item is the following more-indented block (rare)
        if (lines.nonEmpty && lines.head.indent > indent) {
          val (child, rem) = parseBlock(lines)
          arr.add(child); lines = rem
        } else arr.add(F.nullNode())
      } else if (keyColon(body) > 0) {
        // "- key: v" — a map item: its first entry is inline on the
        // dash line, the rest follow at the dash-body's indent; feed
        // the rewritten first line back through parseMap
        val itemIndent = l.indent + 2
        val (child, rem) = parseMap(Line(itemIndent, body) +: lines, itemIndent)
        arr.add(child); lines = rem
      } else arr.add(inline(body))
    }
    (arr, lines)
  }

  /** Index of the key-terminating colon: a ':' at end-of-string or
    * followed by a space, outside quotes (regex values contain ':'
    * only after the key colon in this subset). */
  private def keyColon(s: String): Int = {
    var i = 0; var q: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (q != 0) { if (c == q) q = 0 }
      else if (c == '"' || c == '\'') q = c
      else if (c == ':' && (i == s.length - 1 || s.charAt(i + 1) == ' '))
        return i
      i += 1
    }
    -1
  }

  private def unquoteKey(k: String): String =
    if ((k.startsWith("\"") && k.endsWith("\"")) ||
        (k.startsWith("'") && k.endsWith("'"))) k.substring(1, k.length - 1)
    else k

  // ---- scip-shape → graft-shape normalization ----------------------------

  private def opt(n: JsonNode, k: String): Option[JsonNode] =
    Option(n.get(k)).filterNot(_.isNull)

  /** True when the config is written in the REFERENCE's key structure
    * (main.py's consumption shape) rather than graft's: the telltale
    * is `mask` as an object with a `methods` list (graft's `mask` is
    * the branch list itself), or a `kwargs` object under `load`. */
  private def isScipShape(root: JsonNode): Boolean =
    opt(root, "mask").exists(m => m.isObject && m.has("methods")) ||
      opt(root, "load").exists(l => l.isObject && l.has("kwargs"))

  /** Rewrite a reference-shaped config into graft's flattened keys;
    * identity for configs already in graft shape. Unknown keys are
    * dropped (the reference itself ignores extras). */
  def normalize(root: JsonNode): JsonNode = {
    if (!isScipShape(root)) return root
    val out = F.objectNode()

    // the reference's illumination_correction.key names the regex
    // meta group the correction partitions on; graft's engine groups
    // on the `group` column — rename that named group in the regex so
    // the key travels (tiff_seg's `key: plate` over (?P<plate>...))
    val illumKey: Option[String] = opt(root, "illumination_correction")
      .flatMap(ic => opt(ic, "key")).map(_.asText()).filter(_ != "group")

    // load: kwargs.{regex,scenes} flatten up; channels/channel_names/
    // format/paths/n/kind pass through
    opt(root, "load").foreach { l =>
      val load = F.objectNode()
      Seq("format", "paths", "channels", "channel_names", "n", "kind")
        .foreach(k => opt(l, k).foreach(v => { load.set[JsonNode](k, v); () }))
      opt(l, "kwargs").foreach { kw =>
        // the reference's regexes are Python (named groups spelled
        // (?P<g>...)); Java wants (?<g>...) — translate so the file
        // runs verbatim, and rename the illumination key's group to
        // the engine's `group` column (see illumKey above)
        opt(kw, "regex").foreach { v =>
          var rx = v.asText().replace("(?P<", "(?<")
          illumKey.foreach(k => rx = rx.replace(s"(?<$k>", "(?<group>"))
          load.put("regex", rx); ()
        }
        opt(kw, "scenes").foreach(v => { load.set[JsonNode]("scenes", v); () })
      }
      out.set[JsonNode]("load", load); ()
    }

    // project: {method, settings:{op}} → {op}; method "max"/"mean"
    // used directly when settings carry no op (the projection module
    // name is the op for those)
    opt(root, "project").foreach { p =>
      val op = opt(p, "settings").flatMap(s => opt(s, "op"))
        .map(_.asText())
        .orElse(opt(p, "method").map(_.asText()).filter(
          m => m == "max" || m == "mean"))
      op.foreach { o =>
        val n = F.objectNode(); n.put("op", o)
        out.set[JsonNode]("project", n); ()
      }
    }

    // illumination_correction: presence enables; settings.median_filter_size
    opt(root, "illumination_correction").foreach { ic =>
      val n = F.objectNode()
      opt(ic, "settings").flatMap(s => opt(s, "median_filter_size"))
        .orElse(opt(ic, "median_filter_size"))
        .foreach(v => { n.set[JsonNode]("median_filter_size", v); () })
      opt(ic, "precomputed")
        .foreach(v => { n.set[JsonNode]("precomputed", v); () })
      out.set[JsonNode]("illumination_correction", n); ()
    }

    // segment: settings.{cell_diameter, parent_channel_index,
    // dapi_channel_index, flow_threshold, channels} flatten up
    opt(root, "segment").foreach { sg =>
      val n = F.objectNode()
      opt(sg, "method").foreach(v => { n.set[JsonNode]("method", v); () })
      val st = opt(sg, "settings").getOrElse(F.objectNode())
      opt(st, "cell_diameter")
        .foreach(v => { n.set[JsonNode]("cell_diameter", v); () })
      opt(st, "parent_channel_index").orElse(opt(st, "parent_channel"))
        .foreach(v => { n.set[JsonNode]("parent_channel", v); () })
      opt(st, "dapi_channel_index").orElse(opt(st, "dapi_channel"))
        .foreach(v => { n.set[JsonNode]("dapi_channel", v); () })
      opt(st, "flow_threshold")
        .foreach(v => { n.set[JsonNode]("flow_threshold", v); () })
      opt(st, "channels")
        .foreach(v => { n.set[JsonNode]("channels", v); () })
      if (n.has("method")) { out.set[JsonNode]("segment", n); () }
    }

    // the per-branch feature_extraction map ({branch: [types]}) feeds
    // branch-level feature_types below — collected first so the mask
    // rewrite can attach them
    val perBranchTypes: Map[String, JsonNode] =
      opt(root, "feature_extraction").filter(fe => !fe.has("types"))
        .map { fe =>
          val b = Map.newBuilder[String, JsonNode]
          fe.fieldNames().forEachRemaining { k =>
            opt(fe, k).filter(_.isArray).foreach(ts => b += k -> ts)
          }
          b.result()
        }.getOrElse(Map.empty)

    // mask: methods[{method,name,kwargs}] → branch list (kwargs
    // flatten into the branch; the branch's feature_extraction list,
    // when the per-branch map form is used, lands as feature_types);
    // filters[{method,channel_indices,settings.threshold}] →
    // mask_filters; combined_indices and main_channel_index hoist to
    // the root
    opt(root, "mask").foreach { m =>
      opt(m, "methods").foreach { ms =>
        val arr = F.arrayNode()
        (0 until ms.size()).foreach { i =>
          val b = ms.get(i)
          val n = F.objectNode()
          Seq("method", "name").foreach(k =>
            opt(b, k).foreach(v => { n.set[JsonNode](k, v); () }))
          opt(b, "kwargs").foreach { kw =>
            kw.fieldNames().forEachRemaining { k =>
              opt(kw, k).foreach(v => { n.set[JsonNode](k, v); () })
            }
          }
          val bname = opt(b, "name").map(_.asText())
            .orElse(opt(b, "method").map(_.asText()))
          bname.flatMap(perBranchTypes.get).foreach { ts =>
            n.set[JsonNode]("feature_types", ts); ()
          }
          arr.add(n)
        }
        out.set[JsonNode]("mask", arr); ()
      }
      opt(m, "filters").foreach { fs =>
        val arr = F.arrayNode()
        (0 until fs.size()).foreach { i =>
          val f = fs.get(i)
          val n = F.objectNode()
          opt(f, "method").foreach(v => { n.set[JsonNode]("method", v); () })
          opt(f, "channel_indices").orElse(opt(f, "channels"))
            .foreach(v => { n.set[JsonNode]("channels", v); () })
          opt(f, "settings").flatMap(s => opt(s, "threshold"))
            .orElse(opt(f, "threshold"))
            .foreach(v => { n.set[JsonNode]("threshold", v); () })
          arr.add(n)
        }
        out.set[JsonNode]("mask_filters", arr); ()
      }
      opt(m, "combined_indices")
        .foreach(v => { out.set[JsonNode]("mask_combined_indices", v); () })
      opt(m, "main_channel_index")
        .foreach(v => { out.set[JsonNode]("main_channel_index", v); () })
    }

    // filter: the reference names a filter MODULE; "population" is the
    // one that exists (reference src/scip/filter/population.py)
    opt(root, "filter").foreach { f =>
      if (opt(f, "name").exists(_.asText() == "population") ||
          opt(f, "population").exists(_.asBoolean())) {
        val n = F.objectNode(); n.put("population", true)
        out.set[JsonNode]("filter", n); ()
      }
    }

    // sample: the reference exposes limit/with_replacement as CLI
    // flags, not config — accept a config spelling for parity with
    // graft's own
    opt(root, "sample").foreach(v => { out.set[JsonNode]("sample", v); () })

    // normalization: presence (lower/upper quantile args) → quantile
    opt(root, "normalization").foreach { _ =>
      val n = F.objectNode(); n.put("quantile", true)
      out.set[JsonNode]("normalization", n); ()
    }

    // feature_extraction: {types:[...]} passes through; the per-branch
    // map form ({branch: [types]}) takes the UNION — graft computes
    // one static feature schema across branches
    opt(root, "feature_extraction").foreach { fe =>
      val types = scala.collection.mutable.LinkedHashSet.empty[String]
      opt(fe, "types") match {
        case Some(ts) => (0 until ts.size()).foreach(i => types += ts.get(i).asText())
        case None =>
          fe.fieldNames().forEachRemaining { k =>
            opt(fe, k).foreach { ts =>
              if (ts.isArray)
                (0 until ts.size()).foreach(i => types += ts.get(i).asText())
            }
          }
      }
      if (types.nonEmpty) {
        val n = F.objectNode()
        val arr = F.arrayNode()
        types.foreach(arr.add)
        n.set[JsonNode]("types", arr)
        out.set[JsonNode]("feature_extraction", n); ()
      }
    }

    opt(root, "export").foreach(v => { out.set[JsonNode]("export", v); () })
    out
  }
}
