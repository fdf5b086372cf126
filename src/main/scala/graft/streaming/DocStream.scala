package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming corpus hygiene: exact first-seen deduplication of an unbounded
  * DOCUMENT stream — the streaming twin of [[graft.operators.TextDedup.exact]]
  * (and of the batch incremental form `exactIncremental`, without ever
  * rebuilding the corpus hash set per batch).
  *
  * Shape: `groupByKey(content hash)` + `flatMapGroupsWithState` with ONE
  * tiny state record per distinct content ever seen, NoTimeout — corpus
  * identity does not expire, unlike event re-delivery
  * ([[EventStream.dedupByEventId]] bounds its state by watermark instead).
  * State is hash-partitioned across executors by the state store, so at
  * corpus scale the memory bound per executor is (distinct docs ×
  * ~24 bytes) / executors (use the RocksDB state store provider when that
  * outgrows the heap). A doc re-crawled in ANY later micro-batch is dropped
  * map-side after one state lookup — no join against the corpus, no
  * re-shingling, O(batch) per batch.
  */
object DocStream {

  final case class Doc(doc_id: Long, text: String)
  final case class Seen(keep_id: Long, n_copies: Long)
  final case class Kept(doc_id: Long, content_hash: String)

  /** Executor-side md5 hex — same value as `md5(text)` in SQL, so keepers
    * line up with the batch [[graft.operators.TextDedup.exact]] output.
    * MessageDigest is not thread-safe and `getInstance` is not free —
    * thread-local instance, reused per row (same pattern as the SimHash
    * expression's hasher). */
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private[graft] def md5Hex(s: String): String = {
    val bytes = md.get().digest(s.getBytes("UTF-8")) // digest() resets the instance
    val sb = new StringBuilder(bytes.length * 2)
    bytes.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** Emit each distinct content exactly once (the smallest doc_id of its
    * first micro-batch); duplicates — within a batch or across batches —
    * update the copy count in state and emit nothing. */
  def firstSeen(docs: Dataset[Doc]): Dataset[Kept] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(d => md5Hex(d.text))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(firstSeenFn)
  }

  private[graft] def firstSeenFn(hash: String, docs: Iterator[Doc],
      state: GroupState[Seen]): Iterator[Kept] = {
    var n = 0L
    var minId = Long.MaxValue
    docs.foreach { d => n += 1; if (d.doc_id < minId) minId = d.doc_id }
    state.getOption match {
      case Some(s) =>
        state.update(s.copy(n_copies = s.n_copies + n))
        Iterator.empty
      case None =>
        state.update(Seen(minId, n))
        Iterator.single(Kept(minId, hash))
    }
  }
}
