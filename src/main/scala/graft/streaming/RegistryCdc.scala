package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Device-registry CDC (R11/R12): the keyed upsert/delete state machine of
  * influx_service.py:324-342, as `flatMapGroupsWithState` keyed by device.
  *
  * Reference semantics preserved:
  *   - `new` / `update`: replace the device's transducer set with the fetched
  *     document's set (influx_service.py:331-336)
  *   - `delete`: drop the device (influx_service.py:338-342)
  *   - events are applied in event-time order per device (the reference
  *     applies them in MQTT arrival order through a single queue)
  *
  * The snapshot bootstrap ordering (events subscribed BEFORE the snapshot
  * load so no update is missed, influx_service.py:424-432) maps to: start
  * this stream first, then union the snapshot as `new` events with the
  * snapshot's read timestamp — per-device event-time ordering then resolves
  * the race exactly like the reference's re-fetch does.
  *
  * State is per-key and watermark-free (registries are small and live
  * forever, like the reference's dict — but distributed across executors,
  * never on the driver).
  */
object RegistryCdc {

  /** One control-plane event, parsed from the events topic JSON
    * `{action, thing:{id}}` + the fetched device document's transducer list
    * (influx_service.py:325-336).
    */
  case class ServiceEvent(deviceId: String, action: String, transducers: Seq[String], tsUs: Long)

  /** Current registry row set for a device after applying a batch of events. */
  case class RegistrySnapshot(deviceId: String, transducers: Seq[String], active: Boolean, asOfUs: Long)

  /** Per-device keyed state (public: the state encoder's generated code
    * needs constructor access).
    */
  case class DeviceState(transducers: Seq[String], active: Boolean, tsUs: Long)

  private def applyEvents(deviceId: String, events: Iterator[ServiceEvent],
                          state: GroupState[DeviceState]): Iterator[RegistrySnapshot] = {
    val ordered = events.toSeq.sortBy(_.tsUs)
    var cur = state.getOption.getOrElse(DeviceState(Nil, active = false, Long.MinValue))
    ordered.foreach { ev =>
      if (ev.tsUs >= cur.tsUs) {
        cur = ev.action match {
          case "new" | "update" => DeviceState(ev.transducers.map(_.toLowerCase).distinct, active = true, ev.tsUs)
          case "delete"         => DeviceState(Nil, active = false, ev.tsUs)
          case _                => cur // unknown actions ignored, like the reference's no-op dispatch
        }
      }
    }
    state.update(cur)
    Iterator.single(RegistrySnapshot(deviceId, cur.transducers, cur.active, cur.tsUs))
  }

  /** Apply a CDC event stream; emits the device's current snapshot each time
    * it changes (OutputMode.Update downstream).
    */
  def apply(events: Dataset[ServiceEvent])(implicit spark: SparkSession): Dataset[RegistrySnapshot] = {
    import spark.implicits._
    events
      .groupByKey(_.deviceId)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(applyEvents)
  }

  /** Batch-mode fold of the same semantics (for bootstrap/backfill): the
    * final registry after replaying all events — used to materialize the
    * registry dimension table the ingest semi-join broadcasts.
    */
  def replayBatch(events: Dataset[ServiceEvent]): Dataset[RegistrySnapshot] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.deviceId)
      .flatMapGroups { (id, evs) =>
        var cur = DeviceState(Nil, active = false, Long.MinValue)
        evs.toSeq.sortBy(_.tsUs).foreach { ev =>
          cur = ev.action match {
            case "new" | "update" => DeviceState(ev.transducers.map(_.toLowerCase).distinct, active = true, ev.tsUs)
            case "delete"         => DeviceState(Nil, active = false, ev.tsUs)
            case _                => cur
          }
        }
        Iterator.single(RegistrySnapshot(id, cur.transducers, cur.active, cur.tsUs))
      }
  }
}
