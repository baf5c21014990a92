package graft.state

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec

/** Reference-parity cases for the cross-run TTL'd result cache
  * (utility.py:275-334,497-747): TTL gate, first-writer-wins conflict
  * (including the expired-tombstone quirk), write-side single-element
  * normalization, self-healing reads, invalidation, empty sweep, and the
  * cache-aside getOrFetch composition.
  */
class ResultCacheSpec extends SparkSpec {

  private def freshDir() =
    Files.createTempDirectory("result-cache").toString

  private val t0 = Timestamp.valueOf("2026-01-01 00:00:00")
  private def plus(sec: Long) = new Timestamp(t0.getTime + sec * 1000L)

  test("put/get round trip inside the TTL window") {
    val dir = freshDir()
    ResultCache.put(spark, dir, "k1", """{"a":1}""", t0)
    assert(ResultCache.get(spark, dir, "k1", plus(3599)) === Some("""{"a":1}"""))
  }

  test("TTL gate: an expired entry is a miss (utility.py:513-516)") {
    val dir = freshDir()
    ResultCache.put(spark, dir, "k1", """{"a":1}""", t0)
    assert(ResultCache.get(spark, dir, "k1", plus(3601)) === None)
  }

  test("first-writer-wins: a second put of a live key is a no-op (ON CONFLICT DO NOTHING)") {
    val dir = freshDir()
    ResultCache.put(spark, dir, "k1", """{"v":"first"}""", t0)
    ResultCache.put(spark, dir, "k1", """{"v":"second"}""", plus(10))
    assert(ResultCache.get(spark, dir, "k1", plus(20)) === Some("""{"v":"first"}"""))
  }

  test("expired-tombstone quirk: a stale row blocks re-insertion until invalidated") {
    val dir = freshDir()
    ResultCache.put(spark, dir, "k1", """{"v":"old"}""", t0)
    // the key has expired; a fresh put is still skipped (the reference
    // never sweeps by age, so the conflict fires against the stale row)
    ResultCache.put(spark, dir, "k1", """{"v":"new"}""", plus(4000))
    assert(ResultCache.get(spark, dir, "k1", plus(4001)) === None)
    // invalidate clears the tombstone; the next put lands
    assert(ResultCache.invalidate(spark, dir, "k1"))
    ResultCache.put(spark, dir, "k1", """{"v":"new"}""", plus(4100))
    assert(ResultCache.get(spark, dir, "k1", plus(4101)) === Some("""{"v":"new"}"""))
  }

  test("write normalization: a single-element JSON array stores as its element") {
    val dir = freshDir()
    ResultCache.put(spark, dir, "k1", """[{"only":true}]""", t0)
    assert(ResultCache.get(spark, dir, "k1", plus(1)) === Some("""{"only":true}"""))
    // multi-element arrays store verbatim
    ResultCache.put(spark, dir, "k2", """[1,2]""", t0)
    assert(ResultCache.get(spark, dir, "k2", plus(1)) === Some("""[1,2]"""))
  }

  test("self-healing read: an empty cached value deletes the entry and misses") {
    val dir = freshDir()
    ResultCache.put(spark, dir, "k1", "[]", t0)
    assert(ResultCache.get(spark, dir, "k1", plus(1)) === None)
    // the entry is gone, so a put of the same key now lands (no conflict)
    ResultCache.put(spark, dir, "k1", """{"a":1}""", plus(2))
    assert(ResultCache.get(spark, dir, "k1", plus(3)) === Some("""{"a":1}"""))
  }

  test("self-healing read: invalid JSON deletes the entry and misses") {
    val dir = freshDir()
    ResultCache.put(spark, dir, "k1", "{not json", t0)
    assert(ResultCache.get(spark, dir, "k1", plus(1)) === None)
    assert(ResultCache.readAll(spark, dir).count() === 0)
  }

  test("invalidate: targeted delete, reports whether a row existed") {
    val dir = freshDir()
    ResultCache.put(spark, dir, "k1", """{"a":1}""", t0)
    ResultCache.put(spark, dir, "k2", """{"b":2}""", t0)
    assert(ResultCache.invalidate(spark, dir, "k1"))
    assert(!ResultCache.invalidate(spark, dir, "k1"))
    assert(ResultCache.get(spark, dir, "k1", plus(1)) === None)
    assert(ResultCache.get(spark, dir, "k2", plus(1)) === Some("""{"b":2}"""))
  }

  test("cleanupEmpty sweeps [], '', and null responses (utility.py:661-666)") {
    val dir = freshDir()
    ResultCache.put(spark, dir, "k1", "[]", t0)
    ResultCache.put(spark, dir, "k2", " [ ] ", t0)
    ResultCache.put(spark, dir, "k3", "", t0)
    ResultCache.put(spark, dir, "k4", """{"keep":1}""", t0)
    assert(ResultCache.cleanupEmpty(spark, dir) === 3L)
    assert(ResultCache.readAll(spark, dir).count() === 1)
    assert(ResultCache.get(spark, dir, "k4", plus(1)) === Some("""{"keep":1}"""))
  }

  test("getOrFetch: miss fetches and caches; hit skips the fetch") {
    val dir = freshDir()
    var fetches = 0
    def fetch(): Option[String] = { fetches += 1; Some("""{"fresh":1}""") }
    val (v1, hit1) = ResultCache.getOrFetch(spark, dir, "k1", t0)(fetch())
    assert(v1 === Some("""{"fresh":1}""") && !hit1 && fetches === 1)
    val (v2, hit2) = ResultCache.getOrFetch(spark, dir, "k1", plus(10))(fetch())
    assert(v2 === Some("""{"fresh":1}""") && hit2 && fetches === 1)
  }

  test("getOrFetch never caches an empty fetch result (utility.py:322-329)") {
    val dir = freshDir()
    val (v1, _) = ResultCache.getOrFetch(spark, dir, "k1", t0)(Some("[]"))
    assert(v1 === Some("[]"))
    assert(ResultCache.readAll(spark, dir).count() === 0)
    val (v2, _) = ResultCache.getOrFetch(spark, dir, "k1", plus(1))(None)
    assert(v2 === None)
    assert(ResultCache.readAll(spark, dir).count() === 0)
  }
}
