package graft.index

/** Growable primitive int array — the adjacency-list cell. scala.collection
  * ArrayBuffer[Int] boxes every element; adjacency iteration is the hottest
  * loop in HNSW search, so the index stores neighbors unboxed.
  */
private[index] final class IntVec(initialCapacity: Int = 8) extends Serializable {
  private var elems = new Array[Int](math.max(initialCapacity, 1))
  private var n = 0

  def length: Int = n
  def apply(i: Int): Int = elems(i)

  def +=(v: Int): Unit = {
    if (n == elems.length) elems = java.util.Arrays.copyOf(elems, n * 2)
    elems(n) = v
    n += 1
  }

  /** Remove every occurrence of `v`, preserving order. */
  def removeValue(v: Int): Unit = {
    var r = 0; var w = 0
    while (r < n) {
      if (elems(r) != v) { elems(w) = elems(r); w += 1 }
      r += 1
    }
    n = w
  }

  def toArray: Array[Int] = java.util.Arrays.copyOf(elems, n)
}

private[index] object IntVec {
  def of(vs: Iterable[Int]): IntVec = {
    val iv = new IntVec(math.max(vs.size, 1))
    vs.foreach(iv += _)
    iv
  }
}

/** Binary heap over parallel (distance, node) primitive arrays, with the
  * same ordering semantics as the boxed PriorityQueue it replaces:
  * min-heap pops smallest (dist, idx); max-heap pops largest (dist, idx) —
  * ties always broken by idx for determinism.
  */
private[index] final class DistHeap(max: Boolean, initialCapacity: Int = 16) {
  private var ds = new Array[Double](math.max(initialCapacity, 2))
  private var xs = new Array[Int](ds.length)
  private var n = 0

  def size: Int = n
  def nonEmpty: Boolean = n > 0
  def topDist: Double = ds(0)
  def topIdx: Int = xs(0)

  // "a should be nearer the top than b"
  private def before(da: Double, xa: Int, db: Double, xb: Int): Boolean =
    if (max) da > db || (da == db && xa > xb)
    else da < db || (da == db && xa < xb)

  def add(d: Double, x: Int): Unit = {
    if (n == ds.length) {
      ds = java.util.Arrays.copyOf(ds, n * 2)
      xs = java.util.Arrays.copyOf(xs, n * 2)
    }
    var i = n
    n += 1
    while (i > 0) {
      val p = (i - 1) >> 1
      if (before(d, x, ds(p), xs(p))) { ds(i) = ds(p); xs(i) = xs(p); i = p }
      else { ds(i) = d; xs(i) = x; return }
    }
    ds(0) = d; xs(0) = x
  }

  def pop(): Unit = {
    n -= 1
    val d = ds(n); val x = xs(n)
    var i = 0
    while (true) {
      val l = 2 * i + 1
      if (l >= n) { ds(i) = d; xs(i) = x; return }
      var c = l
      val r = l + 1
      if (r < n && before(ds(r), xs(r), ds(l), xs(l))) c = r
      if (before(ds(c), xs(c), d, x)) { ds(i) = ds(c); xs(i) = xs(c); i = c }
      else { ds(i) = d; xs(i) = x; return }
    }
  }

  /** Drain into (dist, idx) pairs — unsorted heap order. */
  def toBuffer: scala.collection.mutable.ArrayBuffer[(Double, Int)] = {
    val out = new scala.collection.mutable.ArrayBuffer[(Double, Int)](n)
    var i = 0
    while (i < n) { out += ((ds(i), xs(i))); i += 1 }
    out
  }
}
