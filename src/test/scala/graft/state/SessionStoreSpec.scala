package graft.state

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec

/** K9 TTL'd session store (session_helper.py:29-95): create/read round
  * trip, the `expires_at > now` read gate, upsert-replace on re-put,
  * cleanup sweep, and crash-safe versioning. */
class SessionStoreSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("put/get round trip; expired read returns nothing") {
    val dir = Files.createTempDirectory("sessions").toString
    val t0 = ts("2024-01-01 10:00:00")
    SessionStore.put(spark, dir, "s-1", """[{"batch":"B_1"}]""", t0)

    // within the hour: visible
    assert(SessionStore.get(spark, dir, "s-1", ts("2024-01-01 10:59:59"))
      .contains("""[{"batch":"B_1"}]"""))
    // at/after expiry (strict >): gone, though the row still exists on disk
    assert(SessionStore.get(spark, dir, "s-1", ts("2024-01-01 11:00:00")).isEmpty)
    assert(SessionStore.get(spark, dir, "missing", t0).isEmpty)
  }

  test("re-put replaces the payload and refreshes the TTL (UNIQUE session_id)") {
    val dir = Files.createTempDirectory("sessions").toString
    SessionStore.put(spark, dir, "s-1", "v1", ts("2024-01-01 10:00:00"))
    SessionStore.put(spark, dir, "s-1", "v2", ts("2024-01-01 10:30:00"))

    assert(SessionStore.readAll(spark, dir).count() === 1)
    // old TTL would have expired at 11:00; the refresh extends to 11:30
    assert(SessionStore.get(spark, dir, "s-1", ts("2024-01-01 11:15:00")).contains("v2"))
  }

  test("cleanup sweeps expired rows; live ones survive") {
    val dir = Files.createTempDirectory("sessions").toString
    SessionStore.put(spark, dir, "old", "o", ts("2024-01-01 08:00:00"))
    SessionStore.put(spark, dir, "new", "n", ts("2024-01-01 10:30:00"))

    assert(SessionStore.cleanup(spark, dir, ts("2024-01-01 10:45:00")) === 1)
    val left = SessionStore.readAll(spark, dir)
      .select("session_id").collect().map(_.getString(0)).toSeq
    assert(left === Seq("new"))
  }

  test("put also sweeps: cleanup-before-insert call order of the reference") {
    val dir = Files.createTempDirectory("sessions").toString
    SessionStore.put(spark, dir, "old", "o", ts("2024-01-01 08:00:00"))
    // by the second put, "old" has expired — the new snapshot drops it
    SessionStore.put(spark, dir, "new", "n", ts("2024-01-01 10:30:00"))
    val keys = SessionStore.readAll(spark, dir)
      .select("session_id").collect().map(_.getString(0)).toSeq
    assert(keys === Seq("new"))
  }

  test("versioned layout: a second put publishes a new snapshot and the pointer moves") {
    val dir = Files.createTempDirectory("sessions").toString
    SessionStore.put(spark, dir, "a", "1", ts("2024-01-01 10:00:00"))
    SessionStore.put(spark, dir, "b", "2", ts("2024-01-01 10:01:00"))
    val ptr = scala.io.Source.fromFile(s"$dir/CURRENT").mkString.trim
    assert(ptr === "2")
    assert(SessionStore.readAll(spark, dir).count() === 2)
  }
}
