package graft.wap

/** Storage seam for the REFS POINTER — the single mutable, contended
  * object in the catalog (everything else is immutable, uuid-named data
  * and metadata). Version N+1 must be published with an atomic
  * create-if-absent so optimistic committers detect lost races; this is
  * the role the reference delegates to Nessie's commit protocol
  * (reference app.py:264-269).
  *
  * The default backend (built into [[BranchCatalog]]) uses filesystem
  * create-if-absent, which is atomic on local/HDFS/abfs. Object stores
  * without atomic create need [[ConditionalPutRefsStore]] instead.
  */
trait RefsStore {
  /** All committed refs versions (any order; callers take the max). */
  def listVersions(): Seq[Long]

  /** The JSON document of one committed version. */
  def read(version: Long): String

  /** Publish `version` iff it does not already exist.
    * @return true = committed; false = lost the race (caller re-reads
    *         and retries on the next version) */
  def commit(version: Long, content: String): Boolean
}

/** The minimal object-store contract a conditional-put refs backend
  * needs — the shape of S3 `PutObject` + `If-None-Match: *` (supported
  * since 2024), GCS `ifGenerationMatch=0`, or Azure `If-None-Match: *`.
  * A production adapter implements these three calls with the vendor
  * SDK; [[InMemoryObjectStore]] implements them for tests so the whole
  * optimistic-commit protocol is exercised against conditional-put
  * semantics without network access. */
trait ConditionalObjectStore {
  /** Keys under `prefix` (non-recursive listing is fine). */
  def list(prefix: String): Seq[String]

  def get(key: String): Array[Byte]

  /** Write iff `key` does not exist — the whole operation atomic on the
    * store side. True = written; false = key already existed. */
  def putIfAbsent(key: String, value: Array[Byte]): Boolean
}

/** Refs over any [[ConditionalObjectStore]]: version v lives at
  * `<prefix>refs-<v>.json`; commit maps to one conditional put. */
class ConditionalPutRefsStore(store: ConditionalObjectStore, prefix: String)
    extends RefsStore {
  private def key(v: Long) = f"${prefix}refs-$v%012d.json"

  override def listVersions(): Seq[Long] =
    store.list(prefix)
      .map(k => k.substring(k.lastIndexOf('/') + 1))
      .filter(n => n.startsWith("refs-") && n.endsWith(".json"))
      .map(n => n.stripPrefix("refs-").stripSuffix(".json").toLong)

  override def read(version: Long): String =
    new String(store.get(key(version)), java.nio.charset.StandardCharsets.UTF_8)

  override def commit(version: Long, content: String): Boolean =
    store.putIfAbsent(key(version),
      content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
}

/** In-memory conditional-put store: the test double for S3-style
  * backends. `putIfAbsent` is atomic (ConcurrentHashMap), so racing
  * committers exercise exactly the semantics a real conditional put
  * provides. */
class InMemoryObjectStore extends ConditionalObjectStore {
  private val objects = new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()

  override def list(prefix: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    objects.keySet().asScala.filter(_.startsWith(prefix)).toSeq
  }

  override def get(key: String): Array[Byte] = {
    val v = objects.get(key)
    require(v != null, s"no such object: $key")
    v
  }

  override def putIfAbsent(key: String, value: Array[Byte]): Boolean =
    objects.putIfAbsent(key, value) == null
}
