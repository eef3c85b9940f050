package graft.operators

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Bounded build-once serving-root cache — the lifecycle manager for
  * the per-process served-index roots behind the `*_search` keys
  * (BM25 / IVF / PQ / IVF-PQ). Each entry maps a corpus-snapshot
  * fingerprint to a temp directory holding the persisted index; the
  * cache is an access-ordered LRU of `capacity` roots, and EVICTION
  * DELETES the evicted temp root — so a long-lived serving process
  * re-indexing a daily-refreshed corpus holds at most `capacity`
  * index copies on disk instead of leaking one per snapshot for the
  * JVM lifetime (each root also self-deletes at JVM exit as a
  * backstop).
  *
  * Contract: `capacity` must cover the set of corpora ACTIVELY being
  * served — an evicted root's files disappear, so a still-lazy plan
  * over it would fail on execution. The default capacity at the call
  * sites (8) is well above the harness's concurrent corpus count; a
  * real deployment sizes it to its live-corpus working set. Builds run
  * under the cache lock: concurrent requests for the same snapshot
  * build once and share (the `computeIfAbsent` semantics the unbounded
  * map had), at the cost of serializing distinct builds — acceptable
  * where builds are rare (per corpus snapshot) and serving is the hot
  * path. */
final class ServeCache(capacity: Int, prefix: String) {
  require(capacity > 0, "capacity must be positive")

  // access-order = true: get() refreshes recency, so eviction is LRU
  private val roots = new java.util.LinkedHashMap[String, String](16, 0.75f, true)

  private def deleteRec(root: String): Unit = {
    ServeCache.liveRoots.remove(root)
    ServeCache.deleteDir(root)
  }

  /** Root for `key`, building (into a fresh temp dir) on first
    * request; the least-recently-used root is deleted when the cache
    * exceeds capacity. `build` must fully persist the index into the
    * given root before returning — the entry publishes only after it
    * succeeds (a throwing build deletes its partial root and caches
    * nothing). */
  def getOrBuild(key: String)(build: String => Unit): String = synchronized {
    val hit = roots.get(key)
    if (hit != null) hit
    else {
      val dir = Files.createTempDirectory(prefix)
      val r = dir.toString
      ServeCache.track(r) // JVM-exit backstop — ONE hook, shared set
      try build(r)
      catch { case e: Throwable => deleteRec(r); throw e }
      roots.put(key, r)
      if (roots.size > capacity) {
        val it = roots.entrySet().iterator()
        val eldest = it.next()
        it.remove()
        // Visible eviction: an undersized deployment whose held lazy
        // plan later hits FileNotFoundException can tie it back here.
        ServeCache.log.warn(
          s"ServeCache($prefix) over capacity $capacity: evicting LRU " +
            s"root ${eldest.getValue} (key ${eldest.getKey}); any " +
            "still-lazy plan over it will fail at execution")
        deleteRec(eldest.getValue)
      }
      r
    }
  }

  /** Current root for `key` without building and WITHOUT refreshing
    * its recency (specs). */
  private[graft] def peek(key: String): Option[String] = synchronized {
    import scala.jdk.CollectionConverters._
    roots.entrySet().asScala.find(_.getKey == key).map(_.getValue)
  }

  private[graft] def size: Int = synchronized(roots.size)
}

object ServeCache {

  private val log = org.slf4j.LoggerFactory.getLogger(classOf[ServeCache])

  /** Roots awaiting JVM-exit cleanup. ONE shutdown hook iterates this
    * set — registering a hook Thread per build would accumulate
    * unboundedly in exactly the long-lived serving process the class
    * targets (eviction deletes the dir but a per-dir hook would keep
    * its Thread until exit). `deleteRec` removes evicted roots so the
    * set tracks only live directories. */
  private val liveRoots =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private lazy val installHook: Unit = {
    sys.addShutdownHook {
      liveRoots.forEach(r => deleteDir(r))
    }
    ()
  }

  private def track(root: String): Unit = {
    installHook
    liveRoots.add(root)
    ()
  }

  private def deleteDir(root: String): Unit = {
    val dir = java.nio.file.Paths.get(root)
    if (Files.exists(dir)) {
      val walk = Files.walk(dir)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(p => { Files.deleteIfExists(p); () })
      finally walk.close()
    }
  }
}
