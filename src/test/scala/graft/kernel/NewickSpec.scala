package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

/** Ported from reference test/cpp/test_NewickParser.cpp and
  * test/cpp/test_InsertFullyResolved.cpp.
  */
class NewickSpec extends AnyFunSuite {
  import Newick._

  test("parse single leaf") {
    val t = parse("A;")
    assert(t.numNodes == 1 && t.numTips == 1)
    assert(t.nodes(t.root).name == "A" && t.isTip(t.root))
  }

  test("parse simple two-leaf tree: order preserved") {
    val t = parse("(A,B);")
    assert(t.numNodes == 3 && t.numTips == 2)
    val ch = t.nodes(t.root).children
    assert(t.nodes(t.root).name == "" && !t.isTip(t.root))
    assert(ch.map(t.nodes(_).name) == Seq("A", "B"))
    assert(ch.forall(c => t.nodes(c).parent == t.root))
  }

  test("parse nested and multifurcating") {
    val t = parse("((A,B),(C,D));")
    assert(t.numNodes == 7 && t.numTips == 4)
    val rc = t.nodes(t.root).children
    assert(rc.length == 2)
    assert(rc.flatMap(c => t.nodes(c).children).map(t.nodes(_).name)
      == Seq("A", "B", "C", "D"))
    val m = parse("(A,B,C,D);")
    assert(m.nodes(m.root).children.map(m.nodes(_).name) == Seq("A", "B", "C", "D"))
  }

  test("branch lengths: present, missing (NaN), zero, scientific") {
    val t = parse("(A:0.1,B:0.2):0.3;")
    assert(t.nodes(t.root).branchLength == 0.3)
    val ch = t.nodes(t.root).children
    assert(t.nodes(ch(0)).branchLength == 0.1)
    assert(t.nodes(ch(1)).branchLength == 0.2)
    assert(parse("(A,B);").nodes.forall(_.branchLength.isNaN))
    assert(parse("(A:0,B);").nodes.exists(_.branchLength == 0.0))
    assert(parse("(A:1e-3,B);").nodes.exists(_.branchLength == 0.001))
  }

  test("edge identifiers (jplace)") {
    val t = parse("((A:0.1{0},B:0.2{1}):0.3{2},C:0.4{3}):0.0{4};")
    val byEdge = t.buildEdgeIndex()
    assert(byEdge.keySet == Set(0L, 1L, 2L, 3L, 4L))
    assert(t.nodes(byEdge(0L)).name == "A")
    val noBl = parse("(A{0},B{1}){2};")
    assert(noBl.buildEdgeIndex().size == 3)
  }

  test("quoted labels") {
    val t = parse("('Species A','Species B');")
    assert(t.nodes(t.root).children.map(t.nodes(_).name) == Seq("Species A", "Species B"))
    val sp = parse("('A:0.1',\"B,C\");")
    assert(sp.nodes(sp.root).children.map(sp.nodes(_).name) == Seq("A:0.1", "B,C"))
    val semi = parse("('foo; bar','baz;qux');")
    assert(semi.nodes(semi.root).children.map(semi.nodes(_).name) == Seq("foo; bar", "baz;qux"))
    val esc = parse("('It''s a test');")
    assert(esc.nodes(esc.root).children.map(esc.nodes(_).name) == Seq("It's a test"))
  }

  test("whitespace and newlines") {
    assert(parse("( A , B ) ;").numNodes == 3)
    assert(parse("(\n  A:0.1,\n  B:0.2\n);").numNodes == 3)
  }

  test("strict errors") {
    def msg(s: String): String =
      intercept[NewickException](parse(s)).getMessage
    assert(msg("").contains("empty"))
    assert(msg("(A,B)").toLowerCase.contains("semicolon"))
    assert(msg("(A,B;").contains("parenthes"))
    assert(msg("A,B);").toLowerCase.contains("semicolon"))
    assert(msg("(A:0.1{0,B:0.2{1});").toLowerCase.contains("brace"))
    assert(msg("(A:abc,B);").contains("branch length"))
    assert(msg("(A{abc},B);").toLowerCase.contains("edge"))
    assert(msg("('A,B);").toLowerCase.contains("quote"))
    assert(msg("(A[unclosed comment,B);").contains("Unclosed comment"))
    assert(msg("(A:1.2.3,B);").contains("branch length"))
    assert(msg("(A:--5,B);").contains("branch length"))
  }

  test("distance helpers") {
    val t = parse("((A:1.0,B:2.0):0.5,C:3.0):0.0;")
    val a = t.findNodeByName("A").get
    val b = t.findNodeByName("B").get
    val c = t.findNodeByName("C").get
    assert(t.distanceToRoot(a) == 1.5)
    assert(t.distanceToRoot(b) == 2.5)
    assert(t.distanceToRoot(c) == 3.0)
    assert(t.distanceToRoot(t.root) == 0.0)
    assert(t.pairwiseDistance(a, b) == 3.0)
    assert(t.pairwiseDistance(a, c) == 4.5)
    // NaN branch lengths contribute 0
    val nan = parse("((A,B),C);")
    assert(nan.distanceToRoot(nan.findNodeByName("A").get) == 0.0)
  }

  test("insert_fully_resolved single placement") {
    val t = parse("((A:1.0{0},B:2.0{1}):0.5{2},C:3.0{3}):0.0{4};")
    t.insertFullyResolved(Seq(Placement("F", 0, 0.3, 0.1, 1.0)))
    assert(t.numNodes == 7 && t.numTips == 4)
    val f = t.findNodeByName("F").get
    val a = t.findNodeByName("A").get
    assert(t.isTip(f) && t.nodes(f).branchLength == 0.1)
    assert(t.nodes(a).branchLength == 0.3)
    assert(math.abs(t.nodes(t.nodes(a).parent).branchLength - 0.7) < 1e-12)
    assert(t.nodes(f).parent == t.nodes(a).parent)
  }

  test("insert preserves original pairwise distances") {
    val t = parse("((A:1.0{0},B:2.0{1}):0.5{2},C:3.0{3}):0.0{4};")
    def d(x: String, y: String) =
      t.pairwiseDistance(t.findNodeByName(x).get, t.findNodeByName(y).get)
    val (ab, ac, bc) = (d("A", "B"), d("A", "C"), d("B", "C"))
    t.insertFullyResolved(Seq(
      Placement("F1", 0, 0.3, 0.1, 1.0), Placement("F2", 1, 0.5, 0.2, 1.0)))
    assert(math.abs(d("A", "B") - ab) < 1e-12)
    assert(math.abs(d("A", "C") - ac) < 1e-12)
    assert(math.abs(d("B", "C") - bc) < 1e-12)
  }

  test("insert multiple placements on same edge: distal-desc chain") {
    val t = parse("((A:1.0{0},B:2.0{1}):0.5{2},C:3.0{3}):0.0{4};")
    t.insertFullyResolved(Seq(
      Placement("F1", 0, 0.7, 0.1, 1.0), Placement("F2", 0, 0.3, 0.2, 1.0)))
    assert(t.numNodes == 9 && t.numTips == 5)
    val a = t.findNodeByName("A").get
    val f1 = t.findNodeByName("F1").get
    val f2 = t.findNodeByName("F2").get
    assert(math.abs(t.nodes(a).branchLength - 0.3) < 1e-12)
    assert(t.nodes(f2).parent == t.nodes(a).parent)
    assert(t.nodes(f1).branchLength == 0.1 && t.nodes(f2).branchLength == 0.2)
  }

  test("insert dedup: best like_weight_ratio wins; tiebreak lower pendant") {
    val t = parse("((A:1.0{0},B:2.0{1}):0.5{2},C:3.0{3}):0.0{4};")
    t.insertFullyResolved(Seq(
      Placement("F", 1, 0.5, 0.1, 0.5), Placement("F", 0, 0.3, 0.2, 1.0)))
    assert(t.numTips == 4)
    val f = t.findNodeByName("F").get
    assert(t.nodes(f).branchLength == 0.2)
    assert(t.nodes(f).parent == t.nodes(t.findNodeByName("A").get).parent)

    val t2 = parse("((A:1.0{0},B:2.0{1}):0.5{2},C:3.0{3}):0.0{4};")
    t2.insertFullyResolved(Seq(
      Placement("F", 0, 0.3, 0.5, 1.0), Placement("F", 1, 0.5, 0.1, 1.0)))
    val f2 = t2.findNodeByName("F").get
    assert(t2.nodes(f2).branchLength == 0.1) // lower pendant won → edge 1
    assert(t2.nodes(f2).parent == t2.nodes(t2.findNodeByName("B").get).parent)
  }

  test("insert validation errors") {
    val t = parse("((A:1.0{0},B:2.0{1}):0.5{2},C:3.0{3}):0.0{4};")
    assert(intercept[NewickException](
      t.insertFullyResolved(Seq(Placement("F", 99, 0.1, 0.1, 1.0))))
      .getMessage.contains("Unknown edge_id"))
    assert(intercept[NewickException](
      t.insertFullyResolved(Seq(Placement("F", 0, -0.1, 0.1, 1.0))))
      .getMessage.contains("Negative distal_length"))
    assert(intercept[NewickException](
      t.insertFullyResolved(Seq(Placement("F", 0, 0.1, -0.1, 1.0))))
      .getMessage.contains("Negative pendant_length"))
    assert(intercept[NewickException](
      t.insertFullyResolved(Seq(Placement("F", 0, 5.0, 0.1, 1.0))))
      .getMessage.contains("exceeds edge length"))
  }

  test("round-trip: parse → toNewick → parse is stable") {
    for (s <- Seq(
      "((A:0.1,B:0.2):0.3,C:0.4);",
      "((A:0.1{0},B:0.2{1}):0.3{2},C:0.4{3}):0{4};",
      "('Species A',B);",
      "(A,B,C,D);")) {
      val once = parse(s).toNewick
      assert(parse(once).toNewick == once, s"unstable for $s")
    }
  }

  test("build validates roots, parents, connectivity") {
    val ok = build(Seq(
      NodeInput(0, None, "", Double.NaN, None),
      NodeInput(1, Some(0), "A", 1.0, None),
      NodeInput(2, Some(0), "B", 2.0, None)))
    assert(ok.numNodes == 3 && ok.numTips == 2)
    assert(intercept[NewickException](build(Seq(
      NodeInput(0, Some(1), "", 1.0, None),
      NodeInput(1, Some(0), "", 1.0, None))))
      .getMessage.nonEmpty) // no root (and cyclic)
    assert(intercept[NewickException](build(Seq(
      NodeInput(0, None, "", 1.0, None),
      NodeInput(1, None, "", 1.0, None))))
      .getMessage.contains("roots"))
    assert(intercept[NewickException](build(Seq(
      NodeInput(0, None, "", 1.0, None),
      NodeInput(1, Some(99), "A", 1.0, None))))
      .getMessage.contains("unknown parent"))
  }
}
