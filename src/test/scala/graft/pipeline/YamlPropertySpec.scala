package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.JsonNodeFactory

/** ScalaCheck properties for the hand-written YAML-subset parser that
  * now sits on the CLI's front door (r14 advice: its only coverage was
  * example-based). Documents are generated as an ADT carrying BOTH a
  * rendering in the subset grammar and the Jackson tree the rendering
  * must parse to — so every sample checks parse(render(doc)) == tree
  * across nesting depth ≤ 4, block/inline lists, list-of-map items in
  * both the `- key: v` inline-first and `-` + block forms, and quoted
  * scalars containing the grammar's own metacharacters (`#`, `:`,
  * `,`, `[`, `]`, `-`).
  */
class YamlPropertySpec extends AnyFunSuite {

  private val F = JsonNodeFactory.instance

  /** deterministic sampler (the PropertySpec pattern — no
    * scalatestplus bridge in the offline cache) */
  def forAll[A](gen: Gen[A], n: Int = 120)(check: A => Any): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(check(_))
    }

  // ---- document model: rendering + expected node, built together ----

  private sealed trait Y { def node: JsonNode }
  private final case class YScalar(render: String, node: JsonNode) extends Y
  private final case class YFlow(items: List[YScalar]) extends Y {
    def node: JsonNode = {
      val a = F.arrayNode(); items.foreach(i => a.add(i.node)); a
    }
  }
  private final case class YMap(entries: List[(String, Y)]) extends Y {
    def node: JsonNode = {
      val o = F.objectNode()
      entries.foreach { case (k, v) => o.set[JsonNode](k, v.node); () }
      o
    }
  }
  private final case class YList(items: List[Y]) extends Y {
    def node: JsonNode = {
      val a = F.arrayNode(); items.foreach(i => a.add(i.node)); a
    }
  }

  // ---- scalar generators (rendering and node constructed in lockstep)

  private val word: Gen[String] =
    Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar))
      .map(_.mkString)
      .suchThat(w => w != "true" && w != "false" && w != "null")

  private val plainString: Gen[YScalar] =
    Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, word))
      .map(ws => ws.mkString(" "))
      .map(s => YScalar(s, F.textNode(s)))

  /** double-quoted scalar over an alphabet that includes every
    * metachar the quote-aware scans must protect: comment hash,
    * key colon, flow comma/brackets, dash, spaces. */
  private val quotedString: Gen[YScalar] = {
    val meta = Gen.oneOf(" #", ": ", ",", "[", "]", "- ", " ", "'")
    Gen.choose(1, 5)
      .flatMap(n => Gen.listOfN(n, Gen.frequency(2 -> word, 1 -> meta)))
      .map(_.mkString)
      .suchThat(s => !s.contains("\"") && s.trim == s)
      .map(s => YScalar("\"" + s + "\"", F.textNode(s)))
  }

  private val intScalar: Gen[YScalar] =
    Gen.choose(-1000000L, 1000000L)
      .map(v => YScalar(v.toString, F.numberNode(v)))

  private val doubleScalar: Gen[YScalar] =
    for {
      a <- Gen.choose(-9999, 9999); b <- Gen.choose(0, 999)
    } yield {
      val s = s"$a.$b"
      YScalar(s, F.numberNode(s.toDouble))
    }

  private val boolScalar: Gen[YScalar] =
    Gen.oneOf(YScalar("true", F.booleanNode(true)),
      YScalar("false", F.booleanNode(false)))

  private val nullScalar: Gen[YScalar] =
    Gen.oneOf("null", "~").map(s => YScalar(s, F.nullNode()))

  private val scalar: Gen[YScalar] = Gen.frequency(
    3 -> plainString, 3 -> quotedString, 2 -> intScalar,
    2 -> doubleScalar, 1 -> boolScalar, 1 -> nullScalar)

  private val flow: Gen[YFlow] =
    Gen.choose(0, 4).flatMap(n => Gen.listOfN(n, scalar)).map(YFlow(_))

  private val key: Gen[String] = word

  // ---- containers, depth-bounded --------------------------------------

  private def yAt(depth: Int): Gen[Y] =
    if (depth >= 4) Gen.frequency(3 -> scalar, 1 -> flow)
    else Gen.frequency(
      4 -> scalar, 2 -> flow,
      2 -> Gen.lzy(mapAt(depth + 1)), 2 -> Gen.lzy(listAt(depth + 1)))

  private def mapAt(depth: Int): Gen[YMap] =
    Gen.choose(1, 4)
      .flatMap(n => Gen.listOfN(n, Gen.zip(key, yAt(depth))))
      .map(es => YMap(es.distinctBy(_._1)))

  private def listAt(depth: Int): Gen[YList] =
    Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, Gen.frequency(
      3 -> scalar, 1 -> flow,
      2 -> Gen.lzy(mapAt(depth + 1)),
      1 -> Gen.lzy(listAt(depth + 1))))).map(YList(_))

  private val doc: Gen[YMap] = mapAt(1)

  // ---- rendering in the subset grammar ---------------------------------

  private def pad(n: Int): String = " " * n

  private def renderValueInline(v: Y): Option[String] = v match {
    case YScalar(r, _) => Some(r)
    case YFlow(items)  => Some(items.map(_.render).mkString("[", ", ", "]"))
    case _             => None
  }

  private def renderMap(m: YMap, indent: Int): List[String] =
    m.entries.flatMap { case (k, v) =>
      renderValueInline(v) match {
        case Some(r) => List(s"${pad(indent)}$k: $r")
        case None => s"${pad(indent)}$k:" :: (v match {
          case mm: YMap  => renderMap(mm, indent + 2)
          case ll: YList => renderList(ll, indent + 2)
          case _         => Nil
        })
      }
    }

  private def renderList(l: YList, indent: Int): List[String] =
    l.items.flatMap {
      case s: YScalar => List(s"${pad(indent)}- ${s.render}")
      case f: YFlow =>
        List(s"${pad(indent)}- ${renderValueInline(f).get}")
      case m: YMap =>
        // inline-first form when the first entry's value fits on the
        // dash line; `-` + block form otherwise
        renderValueInline(m.entries.head._2) match {
          case Some(r) =>
            s"${pad(indent)}- ${m.entries.head._1}: $r" ::
              renderMap(YMap(m.entries.tail), indent + 2)
          case None =>
            s"${pad(indent)}-" :: renderMap(m, indent + 2)
        }
      case ll: YList =>
        s"${pad(indent)}-" :: renderList(ll, indent + 2)
    }

  // ---- the properties --------------------------------------------------

  test("parse(render(doc)) == the directly-built Jackson tree, for " +
    "random subset documents (depth ≤ 4)") {
    forAll(doc) { d =>
      val text = renderMap(d, 0).mkString("\n") + "\n"
      val parsed =
        try YamlConfig.parse(text)
        catch {
          case e: Exception =>
            fail(s"parse failed: $e\n--- document ---\n$text")
        }
      assert(parsed == d.node,
        s"--- document ---\n$text\n--- parsed ---\n$parsed\n" +
          s"--- expected ---\n${d.node}")
    }
  }

  test("comments and blank lines are invisible: interleaving them " +
    "between rendered lines changes nothing") {
    forAll(doc, n = 60) { d =>
      val plain = renderMap(d, 0)
      val noisy = plain.zipWithIndex.flatMap { case (l, i) =>
        if (i % 2 == 0) List(l, "# interleaved comment", "")
        else List(l + "   # trailing comment")
      }
      // trailing comments are only safe to append when the line does
      // not END inside an unterminated quoted scalar; renderings here
      // never do (quotes are single-line)
      assert(YamlConfig.parse(noisy.mkString("\n")) == d.node)
    }
  }

  test("a quoted flow item containing commas parses as ONE item " +
    "(the r14 quote-aware-split fix)") {
    val n = YamlConfig.parse("""k: [a, "b,c", 3]""" + "\n")
    val arr = n.get("k")
    assert(arr.size() == 3 && arr.get(1).asText() == "b,c" &&
      arr.get(2).asLong() == 3L)
  }

  test("an unterminated quote inside a flow list fails loudly") {
    val e = intercept[IllegalArgumentException] {
      YamlConfig.parse("""k: [a, "b,c]""" + "\n")
    }
    assert(e.getMessage.contains("unterminated quote"), e.getMessage)
  }
}
