package graft.operators

/** Shared local ground truth for every connected-components / survivor
  * test: a min-root union-find over an edge list. One copy, so the
  * reference the engine is checked against cannot silently diverge
  * between specs. */
object UnionFindRef {

  /** Returns the component function id → min-member-label after unioning
    * all edges. Ids never seen in an edge map to themselves. */
  def components(edges: Iterable[(Long, Long)]): Long => Long = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    find
  }
}
