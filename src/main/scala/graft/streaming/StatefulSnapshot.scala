package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Incremental CDC snapshot maintenance (SURVEY §7.3 hard part 3): the
  * streaming counterpart of [[graft.operators.Cdc.snapshot]].
  *
  * State = one [[SnapshotRow]] per live (id,name) key — the latest image by
  * (eventMicros, seq). Each micro-batch folds its rows into the state and
  * emits the key's new latest row (update semantics); REMOVE rows stay in
  * state as tombstones so late-arriving older events cannot resurrect a
  * deleted key, and readers filter `event != "REMOVE"`.
  *
  * Scale: state size is O(live keys), not O(events) — the same bound the
  * batch max_by aggregation has per shuffle, held across time. For bounded
  * state under key churn, swap NoTimeout for event-time timeout at the
  * watermark horizon (tombstone GC) — kept simple here because the batch
  * recompute (Q28) remains the source of truth, exactly like the
  * reference's lake-side-dedupe stance (firehose_transformation.py:16).
  */
object StatefulSnapshot {

  /** Flattened CDC row (the Q27 shape) keyed by the table's composite key. */
  case class SnapshotRow(id: String, name: String, event: String,
                         eventMicros: Long, seq: Long, attrsJson: String)

  private def later(a: SnapshotRow, b: SnapshotRow): SnapshotRow =
    if (Ordering[(Long, Long)].gteq((a.eventMicros, a.seq), (b.eventMicros, b.seq))) a else b

  /** One updated snapshot row per key per micro-batch. */
  def updates(flat: Dataset[SnapshotRow]): Dataset[SnapshotRow] = {
    implicit val enc = Encoders.product[SnapshotRow]
    implicit val kenc = Encoders.product[(String, String)]
    flat.groupByKey(r => (r.id, r.name))
      .mapGroupsWithState[SnapshotRow, SnapshotRow](GroupStateTimeout.NoTimeout) {
        case (_, rows, state: GroupState[SnapshotRow]) =>
          val incoming = rows.reduce(later)
          val merged = state.getOption.map(later(_, incoming)).getOrElse(incoming)
          state.update(merged)
          merged
      }
  }
}
