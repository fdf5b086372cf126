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
  * corpus scale the memory bound per executor is (distinct docs × one
  * key + 1-byte marker) / executors (use the RocksDB state store provider
  * when that outgrows the heap). A doc re-crawled in ANY later micro-batch is dropped
  * map-side after one state lookup — no join against the corpus, no
  * re-shingling, O(batch) per batch.
  */
object DocStream {

  final case class Doc(doc_id: Long, text: String)
  /** Presence marker only: the keeper was already emitted when the state
    * was created, so carrying ids/counts here would be dead payload on a
    * store that holds one entry per distinct doc FOREVER — at corpus scale
    * every byte of this record is multiplied by billions of keys. */
  final case class Seen(seen: Boolean)
  final case class Kept(doc_id: Long, content_hash: String)

  /** Executor-side md5 hex — same value as `md5(text)` in SQL, so keepers
    * line up with the batch [[graft.operators.TextDedup.exact]] output.
    * One shared implementation ([[graft.functions.Hashing.md5HexLocal]],
    * thread-local digest): the hash-derivation rule must never fork
    * between the batch operators, their oracles, and the streaming twins. */
  private[graft] def md5Hex(s: String): String =
    graft.functions.Hashing.md5HexLocal(s)

  final case class SpanState(nDocs: Long, nOcc: Long)
  final case class SpanStat(span_hash: Long, n_docs: Long, n_occurrences: Long)

  /** LIVING SPAN INVENTORY over an unbounded document stream — the
    * streaming twin of [[graft.operators.TextDedup.spanStats]], closing the
    * batch/stream asymmetry of the crawl path (the batch form appends
    * per-batch partials and merges at read time; here the state store IS
    * the merge). Every w-token window of every arriving doc is hashed
    * map-side (identical tokenization + 60-bit hash to the batch op and
    * its DuckDB oracle), then `mapGroupsWithState` keyed by span_hash adds
    * the batch's occurrence/doc counts to the span's running totals.
    *
    * Update-mode emissions: each micro-batch emits the UPDATED totals for
    * exactly the spans it touched, so a sink's latest row per span is the
    * inventory (totals are monotone — `max` per span recovers the latest
    * from an append-style sink). Mergeability contract mirrors the batch
    * partials': each document arrives in exactly ONE micro-batch (compose
    * [[firstSeen]] upstream when re-crawls are possible). State is one
    * (n_docs, n_occurrences) pair per distinct span — the same cardinality
    * the stored batch inventory carries; use the RocksDB state store
    * provider when that outgrows the heap. */
  def spanInventory(docs: Dataset[Doc],
      width: Int = graft.operators.TextDedup.DefaultSpanWidth): Dataset[SpanStat] = {
    import docs.sparkSession.implicits._
    docs.flatMap { d =>
      val toks = d.text.split(" ", -1)
      if (toks.length < width) Iterator.empty
      else (0 to toks.length - width).iterator.map(p =>
        (d.doc_id, graft.functions.Hashing.hash64Local(toks.slice(p, p + width).mkString(" "))))
    }.groupByKey(_._2)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (hash: Long, occ: Iterator[(Long, Long)], state: GroupState[SpanState]) =>
          var n = 0L
          val batchDocs = scala.collection.mutable.HashSet.empty[Long]
          occ.foreach { case (id, _) => n += 1; batchDocs += id }
          val prev = state.getOption.getOrElse(SpanState(0L, 0L))
          val next = SpanState(prev.nDocs + batchDocs.size, prev.nOcc + n)
          state.update(next)
          SpanStat(hash, next.nDocs, next.nOcc)
      }
  }

  /** Emit each distinct content exactly once (the smallest doc_id of its
    * first micro-batch); duplicates — within a batch or across batches —
    * emit nothing. */
  def firstSeen(docs: Dataset[Doc]): Dataset[Kept] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(d => md5Hex(d.text))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(firstSeenFn)
  }

  private[graft] def firstSeenFn(hash: String, docs: Iterator[Doc],
      state: GroupState[Seen]): Iterator[Kept] = {
    if (state.exists) Iterator.empty
    else {
      var minId = Long.MaxValue
      docs.foreach(d => if (d.doc_id < minId) minId = d.doc_id)
      state.update(Seen(true))
      Iterator.single(Kept(minId, hash))
    }
  }

  /** [[firstSeen]] with BOUNDED state: each content key's marker expires
    * after `ttlMs` of processing-time inactivity (sliding — every arrival
    * of the key, duplicate or not, re-arms it). For feeds whose identity
    * has a natural horizon — re-delivery windows, session-scoped dedup,
    * retention-capped crawls — this caps the store at (keys active within
    * one TTL) instead of (keys ever seen): the knob that keeps a
    * year-running dedup stream from accreting a corpus-sized store. The
    * documented trade: a duplicate arriving AFTER its key expired is
    * re-emitted (exactly the [[EventStream.dedupByEventId]]
    * watermark-bounds-state trade, on the content axis). */
  def firstSeenTtl(docs: Dataset[Doc], ttlMs: Long): Dataset[Kept] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(d => md5Hex(d.text))
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.ProcessingTimeTimeout)(firstSeenTtlFn(ttlMs))
  }

  private[graft] def firstSeenTtlFn(ttlMs: Long)(hash: String, docs: Iterator[Doc],
      state: GroupState[Seen]): Iterator[Kept] = {
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      val out =
        if (state.exists) Iterator.empty
        else {
          var minId = Long.MaxValue
          docs.foreach(d => if (d.doc_id < minId) minId = d.doc_id)
          state.update(Seen(true))
          Iterator.single(Kept(minId, hash))
        }
      // re-arm on EVERY arrival: the TTL is inactivity, not age
      state.setTimeoutDuration(ttlMs)
      out
    }
  }
}
