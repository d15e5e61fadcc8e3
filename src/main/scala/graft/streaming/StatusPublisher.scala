package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** R10/R15 — the periodic status publisher (influx_service.py:310-322):
  * takes the windowed [[StreamingIngest.statusCounts]] stream and publishes
  * one JSON status message per closed window to an MQTT topic, exactly the
  * reference's `{"message": "Points written 10 min avg: N / #Devices: D"}`
  * shape (influx_service.py:318-320).
  *
  * `foreachBatch` collects only the handful of closed windows per trigger
  * (bounded by the watermark), so the publish step is O(windows), not
  * O(points).
  */
object StatusPublisher {

  type Publish = (String, String) => Unit // (topic, payload)

  /** Default publisher: back onto the in-process bus (stand-in for the MQTT
    * client's publish, influx_service.py:85-88).
    */
  val busPublish: Publish = (topic, payload) => MqttBus.publish(topic, payload)

  def statusJson(pointsWritten: Long, nDevices: Long): String =
    s"""{"message": "Points written 10 min avg: $pointsWritten / #Devices: $nDevices"}"""

  def start(statusCounts: DataFrame, statusTopic: String,
            publish: Publish = busPublish,
            checkpoint: String, trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    statusCounts.writeStream
      .outputMode("append") // a window is published once, when it closes
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.select("points_written", "n_devices").collect().foreach { r: Row =>
          publish(statusTopic, statusJson(r.getLong(0), r.getLong(1)))
        }
      }
      .trigger(trigger)
      .start()
}
