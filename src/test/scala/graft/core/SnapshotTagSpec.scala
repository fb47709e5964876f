package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Named snapshot tags: stable refs that pin a table state against
  * snapshot expiry — the training-data lineage primitive ("tag the
  * snapshot this model trained on" stays reproducible forever). */
class SnapshotTagSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def newTable() = {
    val cat = Catalog.open(spark, SparkFixture.tmpDir("graft-tag-").toString)
    cat.createTable("default.t", Seq("id" -> "long"), Nil, Map.empty)
    cat.loadTable("default.t")
  }

  test("tag resolves in readAsOf and pins the exact state") {
    val t = newTable()
    t.append(Seq(1L).toDF("id"))
    val taggedId = t.tagSnapshot("v1-training")
    t.append(Seq(2L).toDF("id"))
    assert(t.tags == Map("v1-training" -> taggedId))
    assert(t.readAsOf("v1-training").count() == 1)
    assert(t.readAsOf(taggedId.toString).count() == 1)
    assert(t.read().count() == 2)
    // explicit ref form tags an older snapshot
    t.tagSnapshot("first", Some(taggedId.toString))
    assert(t.tags("first") == taggedId)
  }

  test("expire never drops a tagged snapshot; untagging releases it") {
    val t = newTable()
    t.append(Seq(1L).toDF("id")) // snap 1
    t.tagSnapshot("pinned")
    t.append(Seq(2L).toDF("id")) // snap 2
    t.append(Seq(3L).toDF("id")) // snap 3
    val expired = t.expireSnapshots(retainLast = Some(1))
    assert(!expired.contains(1L), s"tagged snapshot expired: $expired")
    assert(expired == List(2L), expired.toString)
    assert(t.readAsOf("pinned").count() == 1)
    t.removeTag("pinned")
    assert(t.tags.isEmpty)
    val expired2 = t.expireSnapshots(retainLast = Some(1))
    assert(expired2 == List(1L), expired2.toString)
  }

  test("rollbackTo accepts a tag name") {
    val t = newTable()
    t.append(Seq(1L).toDF("id"))
    t.tagSnapshot("good")
    t.append(Seq(2L).toDF("id"))
    t.rollbackTo("good")
    assert(t.read().count() == 1)
  }

  test("id-shaped and timestamp-shaped tag names are refused") {
    val t = newTable()
    t.append(Seq(1L).toDF("id"))
    intercept[IllegalArgumentException] { t.tagSnapshot("42") }
    intercept[IllegalArgumentException] { t.tagSnapshot("2024-01-01") }
    intercept[IllegalArgumentException] { t.tagSnapshot("") }
    intercept[IllegalArgumentException] {
      t.tagSnapshot("nope", Some("999")) // unknown snapshot ref
    }
  }

  test("a tag created while expire retries is honored (pin set re-read per attempt)") {
    val cat = Catalog.open(spark, SparkFixture.tmpDir("graft-tagrace-").toString)
    cat.createTable("default.t", Seq("id" -> "long"), Nil, Map.empty)
    val t = cat.loadTable("default.t")
    val other = cat.loadTable("default.t")
    t.append(Seq(1L).toDF("id")) // snap 1
    t.append(Seq(2L).toDF("id")) // snap 2
    t.append(Seq(3L).toDF("id")) // snap 3
    var fired = false
    // the simulated foreign process tags snap 1 AND commits an append,
    // forcing expire's first CAS attempt to lose; the retry must re-read
    // the pin set and keep snap 1
    t.onCommitAttempt = _ => if (!fired) {
      fired = true
      other.tagSnapshot("late-pin", Some("1"))
      other.append(Seq(4L).toDF("id")) // snap 4
    }
    val expired =
      try t.expireSnapshots(retainLast = Some(1))
      finally t.onCommitAttempt = _ => ()
    assert(!expired.contains(1L),
      s"snapshot tagged mid-expire was dropped: $expired")
    assert(expired.toSet == Set(2L, 3L), expired.toString)
    assert(t.readAsOf("late-pin").count() == 1)
  }

  test("tagging a snapshot that an in-flight expire drops fails loudly, no dangling tag") {
    val cat = Catalog.open(spark, SparkFixture.tmpDir("graft-tagdie-").toString)
    cat.createTable("default.t", Seq("id" -> "long"), Nil, Map.empty)
    val t = cat.loadTable("default.t")
    val other = cat.loadTable("default.t")
    t.append(Seq(1L).toDF("id")) // snap 1
    t.append(Seq(2L).toDF("id")) // snap 2
    var fired = false
    // the simulated foreign expire lands between tagSnapshot's snapshot
    // resolve and its metadata CAS: the pin is not yet visible, snap 1
    // drops, and the post-validation must remove the tag and throw
    t.onMetaAttempt = _ => if (!fired) {
      fired = true
      assert(other.expireSnapshots(retainLast = Some(1)) == List(1L))
    }
    try intercept[java.util.ConcurrentModificationException] {
      t.tagSnapshot("doomed", Some("1"))
    } finally t.onMetaAttempt = _ => ()
    assert(t.tags.isEmpty, "dangling tag survived the post-validation")
  }

  test("re-tagging moves the name; foreign ref.tag properties are ignored") {
    val t = newTable()
    t.append(Seq(1L).toDF("id"))
    t.tagSnapshot("v")
    t.append(Seq(2L).toDF("id"))
    t.tagSnapshot("v") // moves to current
    assert(t.tags("v") == t.currentSnapshot.get.id)
    // a hand-set non-numeric ref.tag.* property is not a tag
    t.setProperty("ref.tag.broken", "not-a-number")
    assert(!t.tags.contains("broken"))
  }
}
