package graft.kernel

import scala.collection.mutable.ArrayBuffer

/** Newick tree codec + placement grafting — no Spark dependencies.
  *
  * Semantics ported from the reference's tree engine
  * (reference: src/NewickTree.cpp, src/include/NewickTree.hpp,
  * test/cpp/test_NewickParser.cpp, test/cpp/test_InsertFullyResolved
  * .cpp): strict recursive-descent parse (quoted labels with ''
  * escapes, [comments], {edge-id} jplace syntax, whitespace), NaN for
  * absent branch lengths, parent-pointer node table, build() with
  * one-root/valid-parent/acyclic validation, quoting serializer, and
  * insert_fully_resolved (best-placement dedup by like_weight_ratio
  * then pendant_length, per-edge distal-desc chain insertion).
  */
object Newick {

  final class NewickException(msg: String) extends IllegalArgumentException(msg)

  final case class Placement(
      fragmentId: String,
      edgeId: Long,
      distalLength: Double,
      pendantLength: Double,
      likeWeightRatio: Double)

  final case class NodeInput(
      nodeId: Long,
      parentId: Option[Long],
      name: String,
      branchLength: Double,
      edgeId: Option[Long])

  final class Node(
      var name: String,
      var branchLength: Double,
      var edgeId: Option[Long]) {
    var parent: Int = -1
    val children: ArrayBuffer[Int] = new ArrayBuffer[Int]()
  }

  final class Tree {
    val nodes: ArrayBuffer[Node] = new ArrayBuffer[Node]()
    var root: Int = -1

    def addNode(name: String, branchLength: Double, edgeId: Option[Long]): Int = {
      nodes += new Node(name, branchLength, edgeId)
      nodes.length - 1
    }

    def setParent(child: Int, parent: Int): Unit = {
      require(child != parent, "Cannot make node its own parent")
      if (nodes(child).parent >= 0) {
        val old = nodes(nodes(child).parent)
        old.children -= child
      }
      nodes(child).parent = parent
      nodes(parent).children += child
    }

    def isTip(i: Int): Boolean = nodes(i).children.isEmpty
    def numNodes: Int = nodes.length
    def numTips: Int = nodes.indices.count(isTip)
    def tips: Seq[Int] = nodes.indices.filter(isTip)
    def findNodeByName(name: String): Option[Int] =
      nodes.indices.find(nodes(_).name == name)

    def distanceToRoot(i: Int): Double = {
      var d = 0.0
      var cur = i
      while (nodes(cur).parent >= 0) {
        val bl = nodes(cur).branchLength
        if (!bl.isNaN) d += bl
        cur = nodes(cur).parent
      }
      d
    }

    def findLca(a: Int, b: Int): Int = {
      val ancestors = scala.collection.mutable.Set[Int]()
      var cur = a
      while (cur >= 0) { ancestors += cur; cur = nodes(cur).parent }
      cur = b
      while (!ancestors.contains(cur)) cur = nodes(cur).parent
      cur
    }

    def pairwiseDistance(a: Int, b: Int): Double = {
      val l = findLca(a, b)
      distanceToRoot(a) + distanceToRoot(b) - 2 * distanceToRoot(l)
    }

    def buildEdgeIndex(): Map[Long, Int] =
      nodes.indices.flatMap(i => nodes(i).edgeId.map(_ -> i)).toMap

    /** Port of insert_fully_resolved (NewickTree.cpp:789-925). */
    def insertFullyResolved(placements: Seq[Placement]): Unit = {
      if (placements.isEmpty) return
      val edgeIndex = buildEdgeIndex()
      // validate ALL placements upfront
      for (p <- placements) {
        if (!edgeIndex.contains(p.edgeId))
          throw new NewickException(
            s"Unknown edge_id ${p.edgeId} for fragment '${p.fragmentId}'")
        if (p.distalLength < 0)
          throw new NewickException(
            s"Negative distal_length ${p.distalLength} for fragment '${p.fragmentId}'")
        if (p.pendantLength < 0)
          throw new NewickException(
            s"Negative pendant_length ${p.pendantLength} for fragment '${p.fragmentId}'")
        val edgeLen = nodes(edgeIndex(p.edgeId)).branchLength
        if (!edgeLen.isNaN && p.distalLength > edgeLen)
          throw new NewickException(
            s"distal_length ${p.distalLength} exceeds edge length $edgeLen " +
              s"for fragment '${p.fragmentId}'")
      }
      // dedup by fragment: highest like_weight_ratio (eps 1e-9), then
      // lowest pendant_length
      val eps = 1e-9
      val best = scala.collection.mutable.LinkedHashMap[String, Placement]()
      for (p <- placements) {
        best.get(p.fragmentId) match {
          case None => best(p.fragmentId) = p
          case Some(e) =>
            val diff = p.likeWeightRatio - e.likeWeightRatio
            if (diff > eps) best(p.fragmentId) = p
            else if (math.abs(diff) <= eps && p.pendantLength < e.pendantLength)
              best(p.fragmentId) = p
        }
      }
      // group by edge, sort distal desc, insert chains
      val byEdge = best.values.toSeq.groupBy(_.edgeId)
      for ((edgeId, ps) <- byEdge) {
        val sorted = ps.sortBy(p => -p.distalLength)
        val edgeNode = edgeIndex(edgeId)
        val originalLength = nodes(edgeNode).branchLength
        val originalParent = nodes(edgeNode).parent
        if (originalParent >= 0) {
          nodes(originalParent).children -= edgeNode
          nodes(edgeNode).parent = -1
        }
        var remaining = originalLength
        var currentParent = originalParent
        for (p <- sorted) {
          val internalBl =
            if (remaining.isNaN) Double.NaN else remaining - p.distalLength
          val newInternal = addNode("", internalBl, None)
          val fragment = addNode(p.fragmentId, p.pendantLength, None)
          if (currentParent >= 0) setParent(newInternal, currentParent)
          else root = newInternal
          setParent(fragment, newInternal)
          currentParent = newInternal
          remaining = p.distalLength
        }
        nodes(edgeNode).branchLength = remaining
        setParent(edgeNode, currentParent)
      }
    }

    /** Serialize with quoting rules (NewickTree.cpp:349-420). */
    def toNewick: String = {
      if (nodes.isEmpty) return ";"
      val sb = new StringBuilder
      def needsQuote(name: String): Boolean =
        name.exists(c => "(),:;{}'\"[]".contains(c) || c.isWhitespace)
      def emitNode(i: Int): Unit = {
        val n = nodes(i)
        if (n.children.nonEmpty) {
          sb.append('(')
          for ((c, k) <- n.children.zipWithIndex) {
            if (k > 0) sb.append(',')
            emitNode(c)
          }
          sb.append(')')
        }
        if (n.name.nonEmpty) {
          if (needsQuote(n.name)) {
            sb.append('\'').append(n.name.replace("'", "''")).append('\'')
          } else sb.append(n.name)
        }
        if (!n.branchLength.isNaN) {
          sb.append(':')
          val bl = n.branchLength
          if (bl == bl.toLong.toDouble) sb.append(bl.toLong)
          else sb.append(bl)
        }
        n.edgeId.foreach(e => sb.append('{').append(e).append('}'))
      }
      emitNode(root)
      sb.append(';')
      sb.toString
    }
  }

  /** Strict recursive-descent parse. */
  def parse(input: String): Tree = {
    val s = input
    if (s.trim.isEmpty) throw new NewickException("Newick string is empty")
    val tree = new Tree
    var pos = 0

    def skipWs(): Unit = {
      var continue = true
      while (continue && pos < s.length) {
        val c = s.charAt(pos)
        if (c.isWhitespace) pos += 1
        else if (c == '[') { // comment
          val end = s.indexOf(']', pos)
          if (end < 0) throw new NewickException("Unclosed comment")
          pos = end + 1
        } else continue = false
      }
    }

    def parseQuoted(quote: Char): String = {
      pos += 1 // opening quote
      val sb = new StringBuilder
      var closed = false
      while (!closed) {
        if (pos >= s.length) throw new NewickException("Unclosed quote in label")
        val c = s.charAt(pos)
        if (c == quote) {
          if (quote == '\'' && pos + 1 < s.length && s.charAt(pos + 1) == '\'') {
            sb.append('\''); pos += 2
          } else { closed = true; pos += 1 }
        } else { sb.append(c); pos += 1 }
      }
      sb.toString
    }

    def parseLabel(): String = {
      skipWs()
      if (pos < s.length && (s.charAt(pos) == '\'' || s.charAt(pos) == '"'))
        parseQuoted(s.charAt(pos))
      else {
        val sb = new StringBuilder
        while (pos < s.length && !"(),:;{}[".contains(s.charAt(pos))
          && !s.charAt(pos).isWhitespace) {
          sb.append(s.charAt(pos)); pos += 1
        }
        sb.toString
      }
    }

    def parseNumber(what: String): Double = {
      skipWs()
      val start = pos
      while (pos < s.length && ("+-.eE0123456789".contains(s.charAt(pos))))
        pos += 1
      val str = s.substring(start, pos)
      if (str.isEmpty) throw new NewickException(s"Invalid $what: empty")
      try str.toDouble
      catch {
        case _: NumberFormatException =>
          throw new NewickException(s"Invalid $what: '$str'")
      }
    }

    def parseNode(): Int = {
      skipWs()
      val idx =
        if (pos < s.length && s.charAt(pos) == '(') {
          val internal = tree.addNode("", Double.NaN, None)
          pos += 1 // '('
          var done = false
          while (!done) {
            val child = parseNode()
            tree.setParent(child, internal)
            skipWs()
            if (pos >= s.length)
              throw new NewickException("Unmatched opening parenthesis")
            s.charAt(pos) match {
              case ',' => pos += 1
              case ')' => pos += 1; done = true
              case ';' => throw new NewickException("Unmatched opening parenthesis")
              case other =>
                throw new NewickException(s"Unexpected character '$other' in tree")
            }
          }
          internal
        } else tree.addNode("", Double.NaN, None)
      // label, branch length, edge id (any may be absent)
      val name = parseLabel()
      tree.nodes(idx).name = name
      skipWs()
      if (pos < s.length && s.charAt(pos) == ':') {
        pos += 1
        tree.nodes(idx).branchLength = parseNumber("branch length")
      }
      skipWs()
      if (pos < s.length && s.charAt(pos) == '{') {
        pos += 1
        skipWs()
        val start = pos
        while (pos < s.length && s.charAt(pos).isDigit) pos += 1
        if (pos == start) throw new NewickException("Invalid edge identifier")
        val id = s.substring(start, pos).toLong
        skipWs()
        if (pos >= s.length || s.charAt(pos) != '}')
          throw new NewickException("Unclosed brace in edge identifier")
        pos += 1
        tree.nodes(idx).edgeId = Some(id)
      }
      idx
    }

    val root = parseNode()
    tree.root = root
    skipWs()
    if (pos >= s.length || s.charAt(pos) != ';')
      throw new NewickException("Missing semicolon at end of Newick string")
    pos += 1
    skipWs()
    if (pos < s.length)
      throw new NewickException("Unexpected content after semicolon")
    tree
  }

  /** Build a tree from node rows with validation (one root, valid
    * parents, acyclic/connected) — reference NewickTree::build.
    */
  def build(inputs: Seq[NodeInput]): Tree = {
    if (inputs.isEmpty) throw new NewickException("Cannot build tree from zero nodes")
    val tree = new Tree
    val idToIdx = scala.collection.mutable.HashMap[Long, Int]()
    for (in <- inputs) {
      if (idToIdx.contains(in.nodeId))
        throw new NewickException(s"Duplicate node_id ${in.nodeId}")
      idToIdx(in.nodeId) = tree.addNode(in.name, in.branchLength, in.edgeId)
    }
    val roots = inputs.filter(_.parentId.isEmpty)
    if (roots.isEmpty) throw new NewickException("Tree has no root (all nodes have parents)")
    if (roots.length > 1)
      throw new NewickException(s"Tree has ${roots.length} roots (exactly one required)")
    for (in <- inputs; pid <- in.parentId) {
      val p = idToIdx.getOrElse(pid,
        throw new NewickException(s"Node ${in.nodeId} references unknown parent $pid"))
      tree.setParent(idToIdx(in.nodeId), p)
    }
    tree.root = idToIdx(roots.head.nodeId)
    // acyclicity/connectivity: every node must reach the root
    for (i <- tree.nodes.indices) {
      var cur = i
      var steps = 0
      while (tree.nodes(cur).parent >= 0) {
        cur = tree.nodes(cur).parent
        steps += 1
        if (steps > tree.nodes.length)
          throw new NewickException("Cycle detected in tree")
      }
      if (cur != tree.root)
        throw new NewickException("Tree is not connected (node unreachable from root)")
    }
    tree
  }
}
