package graft.index

import scala.collection.mutable

/** Single-node serving engine: the LM-DiskANN greedy graph search plus
  * online insert/delete, mirroring the reference's observable semantics
  * (`/root/reference/src/LMDiskANN.jl`):
  *
  *  - public IDs are 1-based, internal 0-based (SURVEY §4.3 Q1;
  *    reference `:477-479,564-565`)
  *  - auto-key = stringified public ID (Q2; `:553-556`)
  *  - insert wires via self-search with ef=300 then truncation-prunes
  *    each touched neighbor to the maxdegree closest (`:531-584`,
  *    `_prune_neighbors` `:491-505` — plain truncation, NOT the α-RNG
  *    prune, deliberately matching the reference)
  *  - delete unlinks the victim from its neighbors only — no
  *    connectivity repair (Q3; `:605-646`); entrypoint re-election is
  *    first-live-ascending (Q4; `:630-638`); freed slots are recycled
  *    LIFO (`:534,640`)
  *  - search = greedy best-first bounded by ef, exact re-rank, then
  *    key lookup; deleted nodes are unreachable (Q5; `:383-481`)
  *
  * Differences from the reference are fixes, not drift: candidate/result
  * queues are heaps (the reference re-sorts a vector each iteration,
  * SURVEY §4.2), and re-inserting an existing key atomically remaps it
  * (Q7 stale-reverse-entry bug fixed).
  *
  * Role in the Spark architecture: this is the *driver/serving-side*
  * component — graph construction and batch search run distributed (see
  * [[GraphBuilder]] / [[VectorIndex]]); this class serves point queries
  * over a built graph, exactly like the reference's mmap-resident index
  * serves queries on one node. At 100 TB the graph is sharded: one
  * ServingIndex per partition-range with a top-level router (scatter-
  * gather over k shards), which composes because greedy search is
  * per-shard local and the final exact re-rank merges k sorted lists.
  */
final class ServingIndex(
    val dim: Int,
    val maxDegree: Int = ServingIndex.DefaultMaxDegree,
    val metric: Metric = Metric.Euclidean,
    val defaultEf: Int = ServingIndex.DefaultEfSearch,
    val alpha: Double = 0.0) extends Serializable {

  // One writer XOR many readers: searches take the read lock, mutations
  // (insert/insertAt/delete/enable/unregister) the write lock — a live
  // router maintained by StreamingOps.routerMaintenance keeps serving
  // concurrent queries while micro-batches land (an unguarded reader
  // could otherwise observe an ArrayBuffer mid-resize or a code slot
  // mid-null). Reentrant, so deleteByKey->delete nests fine. Lock cost
  // is nanoseconds against a graph traversal. Mutations themselves are
  // expected from ONE maintenance thread (the streaming foreachBatch
  // contract); the lock makes reads safe against that writer.
  private val rw = new java.util.concurrent.locks.ReentrantReadWriteLock()
  @inline private def withRead[T](f: => T): T = {
    rw.readLock().lock(); try f finally rw.readLock().unlock()
  }
  @inline private def withWrite[T](f: => T): T = {
    rw.writeLock().lock(); try f finally rw.writeLock().unlock()
  }

  private val vecs = mutable.ArrayBuffer.empty[Array[Float]]
  private val adj = mutable.ArrayBuffer.empty[mutable.ArrayBuffer[Int]]
  private val freelist = mutable.ArrayBuffer.empty[Int] // LIFO via last
  // free-slot membership as a bitset: isLive runs once per VISITED node
  // inside the greedy traversal's inner loop, and a boxed HashSet[Int]
  // probe there (hash + box per neighbor) was measurable against the
  // distance kernel; BitSet.get is one word load (guide §"per-task work")
  private val freeSet = new java.util.BitSet()
  private var entryPoint: Int = -1
  private val keyToId = mutable.HashMap.empty[String, Int]
  private val idToKey = mutable.HashMap.empty[Int, String]
  // Low-memory traversal (LM-DiskANN's node layout, paper.md:23): when
  // enabled, greedy traversal scores candidates by ADC over m-byte PQ
  // codes — the RAM-hot structure is codes + adjacency; full vectors
  // are touched only by the final exact re-rank (the "disk" tier).
  private var pq: Quantization.PQModel = null
  private val pqCodes = mutable.ArrayBuffer.empty[Array[Byte]]

  def numPoints: Int = withRead { vecs.length - freelist.length }

  /** True when an internal slot currently holds a live vector —
    * replay convergence checks (applyRouterBatch) probe this before
    * re-inserting. */
  private[index] def isLiveSlot(slot: Int): Boolean = withRead { isLive(slot) }

  /** The slot the next insert will use (LIFO freelist top, else the
    * append position) — lets routers compute an id-derived key before
    * inserting. */
  def peekNextId: Int = withRead { if (freelist.nonEmpty) freelist.last else vecs.length }
  def entrypoint: Int = entryPoint
  def isEmpty: Boolean = numPoints == 0

  private def isLive(id: Int): Boolean =
    id >= 0 && id < vecs.length && !freeSet.get(id)

  private def d(q: Array[Float], id: Int): Double = metric.dist(q, vecs(id))

  /** The value PQ encodes/scores for a vector: the vector itself under
    * Euclidean; its L2-normalized copy under cosine (for unit vectors
    * ||a-b||² = 2 - 2·cos, so ADC over normalized codes ranks cosine
    * correctly; the exact re-rank stays true cosine on raw vectors). */
  private def pqInput(v: Array[Float]): Array[Float] = metric match {
    case Metric.Cosine =>
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
      val n = math.sqrt(s)
      if (n == 0.0) v
      else {
        val out = new Array[Float](v.length)
        i = 0
        while (i < v.length) { out(i) = (v(i) / n).toFloat; i += 1 }
        out
      }
    case _ => v
  }

  /** Switch greedy traversal to PQ-compressed scoring (LM-DiskANN's
    * low-memory mode): every existing vector is encoded to m bytes;
    * inserts encode incrementally. Traversal then reads codes only
    * (32x less hot data at d=64/m=8) and the exact re-rank restores
    * precision over the ef-bounded candidate pool. Cosine indexes
    * encode L2-NORMALIZED vectors (see [[pqInput]] — the model must
    * have been fit on normalized values too) and re-rank in true
    * cosine, mirroring the reference's cosine parameter
    * (/root/reference/src/LMDiskANN.jl:242, test/runtests.jl:37-67). */
  def enableLowMemoryTraversal(model: Quantization.PQModel): Unit = withWrite {
    require(model.dim == dim, s"model dim ${model.dim} != index dim $dim")
    // ADC scores codes in L2 space (normalized-L2 for cosine); under a
    // user metric that approximation has no defined relationship to
    // metric.dist — full-precision traversal stays available
    require(!metric.isInstanceOf[Metric.Custom],
      s"PQ low-memory traversal supports the built-in metrics only; " +
        s"custom metric '${metric.name}' serves full-precision")
    pq = model
    pqCodes.clear()
    var i = 0
    while (i < vecs.length) {
      pqCodes += (if (vecs(i) != null) model.encodeOne(pqInput(vecs(i))) else null)
      i += 1
    }
  }

  /** The code slot for a live id. Codes are written ONLY by
    * enableLowMemoryTraversal (all live rows) and insert (one row) —
    * never here: a lazy fill would turn concurrent read-only searches
    * into racing writers of the shared buffer. */
  private def codeFor(id: Int): Array[Byte] = {
    val c = if (id < pqCodes.length) pqCodes(id) else null
    if (c == null)
      throw new IllegalStateException(
        s"PQ code missing for live id $id — was the index mutated outside insert/delete?")
    c
  }

  /** Greedy best-first expansion bounded by ef (reference `_search_graph`,
    * src/LMDiskANN.jl:383-431). Returns internal IDs sorted by distance.
    * With PQ enabled, candidate scoring is ADC over the code column —
    * every distance in one traversal comes from the same (squared,
    * approximate) domain, so the heap ordering stays consistent. */
  private def searchGraph(q: Array[Float], ef: Int): IndexedSeq[Int] = {
    if (entryPoint < 0 || !isLive(entryPoint)) return IndexedSeq.empty
    val dist: Int => Double =
      if (pq == null) id => d(q, id)
      else {
        val lut = pq.lutFor(pqInput(q))
        id => Quantization.adc(codeFor(id), lut, pq.k)
      }
    // min-heap of candidates to expand; max-heap of kept results —
    // primitive (dist, id) array heaps replicating
    // mutable.PriorityQueue's sift algorithm move-for-move (see
    // [[DistHeap]]): no Tuple2/boxed-Double allocation per visited
    // node, and — because the comparisons and element moves are
    // identical, ties included — the kept pool, the eviction choices
    // on equal distances, and the drained order are bit-for-bit what
    // the boxed heaps produced (pinned by DistHeapProps' differential
    // fuzz against PriorityQueue itself).
    val candidates = new DistHeap(min = true)
    val results = new DistHeap(min = false)
    // visited as a bitset: one word load/store per neighbor probe vs a
    // boxed HashSet add/contains — membership semantics identical, so
    // traversal order and the candidate pool are bit-for-bit unchanged
    val visited = new java.util.BitSet(vecs.length)
    val d0 = dist(entryPoint)
    candidates.enqueue(d0, entryPoint)
    results.enqueue(d0, entryPoint)
    visited.set(entryPoint)
    while (candidates.nonEmpty) {
      val cd = candidates.headDist
      val c = candidates.headId
      candidates.removeHead()
      // terminate when the best remaining candidate is worse than the
      // worst kept result and the result list is full
      if (results.size >= ef && cd > results.headDist) {
        candidates.clear()
      } else {
        val nbrs = adj(c)
        var i = 0
        while (i < nbrs.length) {
          val nb = nbrs(i)
          // isLive first: it bounds-checks nb, so the BitSet probe can
          // never see a negative/out-of-range id (conditions are pure —
          // order is semantically free)
          if (isLive(nb) && !visited.get(nb)) {
            visited.set(nb)
            val nd = dist(nb)
            if (results.size < ef || nd < results.headDist) {
              candidates.enqueue(nd, nb)
              results.enqueue(nd, nb)
              if (results.size > ef) results.removeHead()
            }
          }
          i += 1
        }
      }
    }
    // drain max-first into the tail — the exact reverse(dequeueAll)
    // order of the boxed formulation, equal distances included
    val out = new Array[Int](results.size)
    var i = results.size - 1
    while (results.nonEmpty) {
      out(i) = results.headId
      results.removeHead()
      i -= 1
    }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
  }

  /** Top-k ANN search. Returns (key, 1-based public id) pairs, nearest
    * first — reference `search` (src/LMDiskANN.jl:455-481). */
  def search(q: Array[Float], topk: Int = 10, ef: Int = -1): IndexedSeq[(Option[String], Long)] =
    searchWithDistances(q, topk, ef).map { case (key, pid, _) => (key, pid) }

  /** [[search]] that also returns each hit's exact distance — the
    * re-rank computes them anyway; routers (ShardedServing) need them
    * for the cross-shard merge without recomputing per hit. */
  def searchWithDistances(q: Array[Float], topk: Int = 10, ef: Int = -1): IndexedSeq[(Option[String], Long, Double)] = withRead {
    if (isEmpty) IndexedSeq.empty
    else {
      require(q.length == dim, s"query dim ${q.length} != index dim $dim")
      val effEf = math.max(topk, if (ef <= 0) defaultEf else ef)
      val cand = searchGraph(q, effEf)
      // exact re-rank: compute each candidate's distance ONCE (sortBy
      // with a keyed tuple, not a re-evaluating comparator)
      cand.map(id => (d(q, id), id))
        .sortBy { case (dist, id) => (dist, id) }
        .take(topk)
        .map { case (dist, id) => (idToKey.get(id), (id + 1).toLong, dist) }
    }
  }

  /** Filtered top-k: like [[searchWithDistances]] but only hits whose
    * 1-based public id satisfies `allow` are returned. The graph is
    * traversed UNFILTERED (navigation must route through disallowed
    * nodes or a selective predicate strands the search), then the
    * candidate pool is post-filtered; if fewer than topk allowed
    * candidates survive, the expansion bound doubles and the search
    * retries until the pool is exhausted — the standard filtered-ANN
    * compromise between recall and traversal cost. An EXPLICIT ef is
    * honored down to topk (the caller may trade recall for latency);
    * the topk*4 floor applies only when ef is defaulted. */
  def searchFiltered(
      q: Array[Float],
      topk: Int,
      allow: Long => Boolean,
      ef: Int = -1): IndexedSeq[(Option[String], Long, Double)] = withRead {
    if (isEmpty) IndexedSeq.empty
    else {
      require(q.length == dim, s"query dim ${q.length} != index dim $dim")
      var effEf = if (ef <= 0) math.max(topk * 4, defaultEf) else math.max(topk, ef)
      var filtered = searchGraph(q, effEf).filter(id => allow((id + 1).toLong))
      while (filtered.size < topk && effEf < numPoints) {
        effEf = math.min(effEf * 2, math.max(numPoints, 1))
        filtered = searchGraph(q, effEf).filter(id => allow((id + 1).toLong))
      }
      filtered.map(id => (d(q, id), id))
        .sortBy { case (dist, id) => (dist, id) }
        .take(topk)
        .map { case (dist, id) => (idToKey.get(id), (id + 1).toLong, dist) }
    }
  }

  /** Range search: every hit within `radius` of the query, nearest
    * first. The expansion bound grows until the pool's WORST kept
    * candidate is outside the radius (then the frontier provably moved
    * past the ball for this traversal) or the pool covers the index —
    * the graph generalization of top-k to radius queries. */
  def rangeSearch(
      q: Array[Float],
      radius: Double,
      ef: Int = -1): IndexedSeq[(Option[String], Long, Double)] = withRead {
    if (isEmpty) IndexedSeq.empty
    else {
      require(q.length == dim, s"query dim ${q.length} != index dim $dim")
      var effEf = math.max(16, if (ef <= 0) defaultEf else ef)
      var cand = searchGraph(q, effEf)
      var scored = cand.map(id => (d(q, id), id))
      while (cand.size >= effEf && scored.map(_._1).max <= radius && effEf < numPoints) {
        effEf = math.min(effEf * 2, math.max(numPoints, 1))
        cand = searchGraph(q, effEf)
        scored = cand.map(id => (d(q, id), id))
      }
      scored.filter(_._1 <= radius)
        .sortBy { case (dist, id) => (dist, id) }
        .map { case (dist, id) => (idToKey.get(id), (id + 1).toLong, dist) }
    }
  }

  /** Degree-bound prune. Default (alpha <= 1): plain truncation to the
    * maxDegree closest — reference-faithful (`_prune_neighbors`,
    * src/LMDiskANN.jl:491-505). With alpha > 1: the Vamana α-RNG
    * diversifying prune ([[AlphaPrune]]), an opt-in improvement the
    * reference lacks (SURVEY §4.2). */
  private def prune(nodeId: Int, candidates: Iterable[Int]): mutable.ArrayBuffer[Int] = {
    val base = vecs(nodeId)
    val distinct = candidates.toSeq.distinct.filter(c => c != nodeId && isLive(c))
    if (alpha > 1.0) {
      val triples = distinct.map(c => (metric.dist(base, vecs(c)), c.toLong, vecs(c))).toIndexedSeq
      mutable.ArrayBuffer.from(AlphaPrune.pruneOne(triples, maxDegree, alpha, metric).map(_.toInt))
    } else {
      val kept =
        if (distinct.size <= maxDegree) distinct
        else distinct.sortBy(c => (metric.dist(base, vecs(c)), c)).take(maxDegree)
      mutable.ArrayBuffer.from(kept)
    }
  }

  /** Insert a vector; returns (key, 1-based public id) — reference
    * `ann_insert!` (src/LMDiskANN.jl:531-584). */
  def insert(v: Array[Float], key: Option[String] = None): (String, Long) = withWrite {
    require(v.length == dim, s"vector dim ${v.length} != index dim $dim")
    val id =
      if (freelist.nonEmpty) { val r = freelist.remove(freelist.length - 1); freeSet.clear(r); r }
      else { vecs += null; adj += mutable.ArrayBuffer.empty[Int]; vecs.length - 1 }
    wireAndRegister(id, v, key)
  }

  /** [[insert]] into a SPECIFIC internal slot — the router-maintenance
    * path mirrors the durable snapshot's id assignment into a live
    * fleet, so the fleet and a later fromIndex rebuild agree on every
    * id. The slot must not be live: either a freed slot (claimed out
    * of LIFO order — the snapshot's global LIFO interleaves shards, so
    * a shard's recycling order is dictated externally) or at/past the
    * append end (intermediate slots created by the extension join the
    * freelist, like finishLoad's never-loaded rule). Wiring is
    * identical to [[insert]].
    *
    * CONTRACT: once a fleet is driven through insertAt (snapshot-owned
    * id assignment), plain [[insert]] must NOT be mixed in. The
    * extension path below pushes filler slots onto the freelist in
    * ascending order, so a later insert() (LIFO) would recycle the
    * highest filler — a different order than a fromIndex rebuild of
    * the snapshot's global freelist would produce, silently diverging
    * auto-key/id assignment from the snapshot. The id-agreement
    * guarantee only holds while the snapshot owns ALL id assignment. */
  def insertAt(slot: Int, v: Array[Float], key: Option[String] = None): (String, Long) = withWrite {
    require(v.length == dim, s"vector dim ${v.length} != index dim $dim")
    require(slot >= 0 && !isLive(slot), s"slot $slot is live or invalid")
    if (freeSet.get(slot)) {
      freeSet.clear(slot)
      freelist.remove(freelist.lastIndexOf(slot))
    } else {
      while (vecs.length <= slot) {
        vecs += null; adj += mutable.ArrayBuffer.empty[Int]
        val filler = vecs.length - 1
        if (filler != slot) { freelist += filler; freeSet.set(filler) }
      }
    }
    wireAndRegister(slot, v, key)
  }

  private def wireAndRegister(id: Int, v: Array[Float], key: Option[String]): (String, Long) = {
    vecs(id) = v.clone()
    if (pq != null) {
      while (pqCodes.length < vecs.length) pqCodes += null
      pqCodes(id) = pq.encodeOne(pqInput(vecs(id)))
    }
    val publicId = (id + 1).toLong
    val k = key.getOrElse(publicId.toString)
    if (entryPoint < 0 || numPoints == 1) {
      entryPoint = id
      adj(id) = mutable.ArrayBuffer.empty[Int]
    } else {
      // self-search for wiring targets (reference uses topk=maxdegree,
      // default ef=300 — effective ef_construction is 300, SURVEY §4.1)
      val nbrs = searchGraph(v, math.max(maxDegree, defaultEf)).take(maxDegree).filter(_ != id)
      adj(id) = prune(id, nbrs)
      var i = 0
      while (i < adj(id).length) {
        val nb = adj(id)(i)
        adj(nb) += id
        if (adj(nb).length > maxDegree) adj(nb) = prune(nb, adj(nb))
        i += 1
      }
    }
    // key registration; re-registering a key remaps it atomically (Q7
    // fix: no stale reverse entry). The PREVIOUS vector stays live but
    // keyless — same as the reference, where a re-used key leaves the
    // old vector searchable and deletable only by its numeric id
    // (src/LMDiskANN.jl:576-583 never unlinks the old vector either).
    keyToId.get(k).foreach(old => idToKey.remove(old))
    keyToId(k) = id
    idToKey(id) = k
    (k, publicId)
  }

  /** Delete by 1-based public ID — reference `ann_delete!`
    * (src/LMDiskANN.jl:605-646). Silently ignores missing IDs. */
  def delete(publicId: Long): Unit = withWrite {
    val id = publicId.toInt - 1
    if (isLive(id)) {
      // unlink from every neighbor's list (no further repair — Q3)
      adj(id).foreach { nb => if (isLive(nb)) adj(nb) = adj(nb).filter(_ != id) }
      adj(id) = mutable.ArrayBuffer.empty[Int]
      freelist += id
      freeSet.set(id)
      vecs(id) = null
      if (pq != null && id < pqCodes.length) pqCodes(id) = null
      if (entryPoint == id) {
        // first-live-ascending re-election (Q4)
        entryPoint = (0 until vecs.length).find(isLive).getOrElse(-1)
      }
      idToKey.remove(id).foreach(keyToId.remove)
    }
  }

  /** Delete by key; returns false if the key is unknown. */
  def deleteByKey(key: String): Boolean = withWrite {
    keyToId.get(key) match {
      case Some(id) => delete(id + 1L); true
      case None => false
    }
  }

  /** Embedding by 1-based public ID (reference src/LMDiskANN.jl:658-667). */
  def embeddingById(publicId: Long): Array[Float] = withRead {
    val id = publicId.toInt - 1
    require(isLive(id), s"id $publicId is not a live vector")
    vecs(id).clone()
  }

  /** Embedding by key (reference src/LMDiskANN.jl:678-687). */
  def embeddingByKey(key: String): Array[Float] =
    embeddingById(keyToId.getOrElse(key,
      throw new NoSuchElementException(s"unknown key: $key")) + 1L)

  /** Drop a key's mapping without touching its vector (the re-register
    * contract: the previous vector stays live but keyless). Used by
    * routers to keep a key unique across shards. Returns true if the
    * key was mapped. */
  private[index] def unregisterKey(key: String): Boolean = withWrite {
    keyToId.remove(key) match {
      case Some(id) => idToKey.remove(id); true
      case None => false
    }
  }

  def idForKey(key: String): Option[Long] = withRead { keyToId.get(key).map(_ + 1L) }
  def keyForId(publicId: Long): Option[String] = withRead { idToKey.get(publicId.toInt - 1) }
  def allKeys: Seq[String] = withRead { keyToId.keys.toSeq.sorted }
  def countKeys: Int = withRead { keyToId.size }

  /** Internal snapshot accessors for persistence ([[VectorIndex]]).
    * liveRows materializes eagerly under the read lock — a lazy
    * iterator would walk the buffers after the lock is released. */
  private[index] def liveRows: Iterator[(Long, String, Array[Float], Array[Int])] = withRead {
    (0 until vecs.length).filter(isLive).map { id =>
      (id.toLong, idToKey.getOrElse(id, (id + 1).toString), vecs(id), adj(id).toArray)
    }.iterator
  }
  private[index] def freeSlots: Seq[Int] = withRead { freelist.toSeq }

  private[index] def loadRow(id: Int, key: String, v: Array[Float], nbrs: Array[Int]): Unit = {
    while (vecs.length <= id) { vecs += null; adj += mutable.ArrayBuffer.empty[Int] }
    vecs(id) = v
    adj(id) = mutable.ArrayBuffer.from(nbrs)
    keyToId(key) = id
    idToKey(id) = key
  }
  private[index] def finishLoad(entry: Int, free: Seq[Int]): Unit = {
    // grow the arrays to cover freelist slots past the last live row
    // (deleting the highest id leaves such a slot) and dedupe entries —
    // a reused slot must exist and be poppable exactly once
    val distinctFree = free.distinct
    val maxSlot = (distinctFree.iterator ++ Iterator(vecs.length - 1)).max
    while (vecs.length <= maxSlot) { vecs += null; adj += mutable.ArrayBuffer.empty[Int] }
    freelist.clear(); freelist ++= distinctFree
    freeSet.clear(); distinctFree.foreach(i => freeSet.set(i))
    // any slot never loaded and not in freelist is free too
    (0 until vecs.length).foreach { i =>
      if (vecs(i) == null && !freeSet.get(i)) { freelist += i; freeSet.set(i) }
    }
    entryPoint = if (entry >= 0 && isLive(entry)) entry else (0 until vecs.length).find(isLive).getOrElse(-1)
  }
}

object ServingIndex {
  /** Reference defaults (src/LMDiskANN.jl:18,20). */
  val DefaultMaxDegree = 64
  val DefaultEfSearch = 300
}
