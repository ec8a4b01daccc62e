package graft.index

/** Primitive (dist, id) binary heap for the serving traversal — the
  * allocation-free replacement for
  * `mutable.PriorityQueue[(Double, Int)](Ordering.by(_._1))`, whose
  * every enqueue boxed a Double and allocated a Tuple2, with the
  * comparator unboxing both on every sift comparison — measurable
  * against a distance kernel that is a plain float loop (guide
  * "per-task work").
  *
  * EXACT-REPLICA CONTRACT: the heaps' dist-only comparator means tie
  * placement (and therefore which of two equal-distance candidates an
  * ef-bounded pool EVICTS) is decided by the sift algorithm's
  * structural moves. Several serving-path queries are hash-oracled
  * and the recall pins are value-exact, so this class replicates
  * scala.collection.mutable.PriorityQueue (2.13) move-for-move —
  * 1-based array, `fixUp`: sift while `lt(parent, child)` (strict);
  * `dequeue`: move LAST element to the root, then `fixDown` choosing
  * the right child only when `lt(left, right)` (strict) and stopping
  * on `gteq(node, child)` — verified against the scala-library
  * bytecode and pinned by DistHeapProps' differential fuzz (random op
  * sequences with heavy exact ties, asserting identical head and
  * drain order at every step). `min = true` flips the comparisons
  * (`.reverse` ordering), nothing else.
  */
private[index] final class DistHeap(min: Boolean) {
  // slot 0 unused (PriorityQueue's ResizableArrayAccess layout);
  // elements live at 1..n
  private var ds = new Array[Double](17)
  private var is = new Array[Int](17)
  private var n = 0

  @inline private def lt(a: Double, b: Double): Boolean = if (min) b < a else a < b
  @inline private def gteq(a: Double, b: Double): Boolean = !lt(a, b)

  def size: Int = n
  def nonEmpty: Boolean = n > 0
  def clear(): Unit = n = 0
  /** Root element — the max (or min when `min = true`). Callers check
    * nonEmpty first, exactly like PriorityQueue.head. */
  def headDist: Double = ds(1)
  def headId: Int = is(1)

  @inline private def swap(i: Int, j: Int): Unit = {
    val td = ds(i); ds(i) = ds(j); ds(j) = td
    val ti = is(i); is(i) = is(j); is(j) = ti
  }

  def enqueue(d: Double, id: Int): Unit = {
    if (n + 1 == ds.length) {
      ds = java.util.Arrays.copyOf(ds, ds.length * 2)
      is = java.util.Arrays.copyOf(is, is.length * 2)
    }
    n += 1
    ds(n) = d; is(n) = id
    // fixUp(as, n): sift while the parent is strictly less
    var k = n
    while (k > 1 && lt(ds(k / 2), ds(k))) {
      swap(k, k / 2)
      k /= 2
    }
  }

  /** Remove the root (callers read headDist/headId first) — mirrors
    * PriorityQueue.dequeue: last element to the root, fixDown over the
    * shrunken range. */
  def removeHead(): Unit = {
    ds(1) = ds(n); is(1) = is(n)
    n -= 1
    // fixDown(as, 1, n)
    var k = 1
    var done = false
    while (!done && 2 * k <= n) {
      var j = 2 * k
      if (j < n && lt(ds(j), ds(j + 1))) j += 1
      if (gteq(ds(k), ds(j))) done = true
      else {
        swap(k, j)
        k = j
      }
    }
  }
}
