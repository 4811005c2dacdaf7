package graft.sink

import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.DataFrame

/** HTTP forwarding beam — the reference's HttpBeam surface (upstream
  * server/.../HttpBeam.scala: forward events to a remote tranquility server
  * over `/v1/post/{dataSource}`, SURVEY §2.1 "HTTP forwarding beam, v2").
  *
  * Spark-first shape: a `foreachBatch` body; each PARTITION posts its rows
  * as NDJSON chunks of `maxBatchSize` (the reference's send-batch bound)
  * straight from the executor — no driver collect, parallelism = upstream
  * partitioning. A non-2xx reply or connect failure throws, so Spark's task
  * retry → micro-batch retry → checkpoint replay gives the reference's
  * at-least-once forwarding contract. As with the reference's HttpBeam,
  * at-least-once means a failed-then-retried send can re-deliver chunks
  * that already reached the receiver — the receiver spools each POST as
  * new events, so exactly-once across the hop requires idempotency keys in
  * the payload (dedup downstream on an event id), not transport tricks.
  */
object HttpForwardBeam {

  /** foreachBatch body: rows → NDJSON → POST `url` in bounded chunks. */
  def forward(url: String, maxBatchSize: Int = 2000)(df: DataFrame, batchId: Long): Unit =
    df.toJSON.foreachPartition { (it: Iterator[String]) =>
      it.grouped(maxBatchSize).foreach(chunk => post(url, chunk.mkString("\n")))
    }

  /** POST with bounded retry (3 attempts, linear backoff); throws on final
    * failure so the task — and therefore the micro-batch — retries.
    */
  private[graft] def post(url: String, body: String, attempts: Int = 3): Unit = {
    var n = 0
    while (true) {
      n += 1
      try {
        val conn = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
        try {
          conn.setRequestMethod("POST")
          conn.setRequestProperty("Content-Type", "application/json")
          conn.setConnectTimeout(5000)
          conn.setReadTimeout(60000)
          conn.setDoOutput(true)
          conn.getOutputStream.write(body.getBytes(UTF_8))
          conn.getOutputStream.close()
          val code = conn.getResponseCode
          if (code < 200 || code >= 300)
            throw new java.io.IOException(s"receiver replied HTTP $code")
          return
        } finally conn.disconnect()
      } catch {
        case e: java.io.IOException if n < attempts => Thread.sleep(200L * n)
      }
    }
  }
}
