package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.ops.{CatSeq, SnapshotTable}

/** The O(Δ) commit plane (r19): versions stitch their positional facts
  * lazily from segment views ([[graft.ops.CatSeq]]) and append-shape
  * commits extend the base arrays as two-part CatSeqs whose first part
  * IS the base object — identity is the carry proof (immutable arrays:
  * identity ⇒ bit-equality), so the segmented render re-references
  * base segments verbatim without an O(files) verification walk.
  * Pinned here: the CatSeq contract itself, the fast path ENGAGING on
  * every append-shaped write path (a silent fallback would only
  * surface as latency), verbatim segment re-reference, and the
  * non-append shapes still taking the verified slow path.
  */
class CatSeqCarrySpec extends SparkSpec {

  private def freshPath(): String =
    Files.createTempDirectory("catseq").toString + "/t"

  test("CatSeq contract: random + sequential access, iterator order, " +
      "Seq equality, serialization, and cat2/extendsBase semantics") {
    val a = Vector(1L, 2L, 3L)
    val b = Vector(4L, 5L)
    val c = CatSeq.cat2(a, b)
    assert(c === Vector(1L, 2L, 3L, 4L, 5L)) // Seq equality holds
    assert(c.length === 5)
    assert(c(0) === 1L && c(4) === 5L && c(3) === 4L && c(1) === 2L)
    intercept[IndexOutOfBoundsException](c(5))
    intercept[IndexOutOfBoundsException](c(-1))
    assert(c.iterator.toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    assert(c.sum === 15L)
    // identity proof semantics
    assert(CatSeq.extendsBase(c, a))
    assert(!CatSeq.extendsBase(c, b))
    assert(!CatSeq.extendsBase(c, Vector(1L, 2L, 3L))) // equal, NOT eq
    assert(!CatSeq.extendsBase(a, a)) // not a CatSeq at all
    assert(CatSeq.freshPart(c) === b)
    // a List fresh side converts; base identity still holds
    val cl = CatSeq.cat2(a, List(9L))
    assert(CatSeq.extendsBase(cl, a) && cl === Vector(1L, 2L, 3L, 9L))
    // empty sides collapse to the other object
    assert(CatSeq.cat2(Vector.empty[Long], b).asInstanceOf[AnyRef] eq b)
    assert(CatSeq.cat2(a, Vector.empty[Long]).asInstanceOf[AnyRef] eq a)
    // serialization round-trip (facts ride Version objects)
    val bos = new java.io.ByteArrayOutputStream()
    new java.io.ObjectOutputStream(bos).writeObject(c)
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[Seq[Long]]
    assert(back === c)
  }

  test("append-shape commits on a segmented table take the identity " +
      "carry: fast path engages, base segments re-reference verbatim, " +
      "and the parsed version round-trips exactly") {
    import spark.implicits._
    val path = freshPath()
    spark.conf.set("spark.graft.manifest.segmentThreshold", "4")
    try {
      SnapshotTable.append(
        (0 until 400).map(i => (i.toLong, i * 2L)).toDF("k", "x"),
        path, 8, statsCol = Some("k"), statsCols = Seq("x"))
      val v1 = SnapshotTable.readVersion(spark, path, 1)
      assert(v1.segRefs.exists(_.nonEmpty), "fixture: table must segment")
      val hits0 = SnapshotTable.fastCarryHits.get()
      SnapshotTable.append(
        (400 until 500).map(i => (i.toLong, i * 2L)).toDF("k", "x"),
        path, 2, statsCol = Some("k"))
      assert(SnapshotTable.fastCarryHits.get() === hits0 + 1,
        "plain append did not take the identity carry")
      val v2 = SnapshotTable.readVersion(spark, path, 2)
      // verbatim re-reference: every v1 segment appears in v2's refs
      val v2segs = v2.segRefs.get.map(_.name).toSet
      assert(v1.segRefs.get.forall(r => v2segs(r.name)),
        "append must re-reference the base's segments verbatim")
      // the parsed round-trip is exact: facts equal the slow-path
      // arithmetic recomputed from scratch
      assert(v2.files.length === v1.files.length + 2)
      assert(v2.files.take(v1.files.length) === v1.files)
      assert(v2.rows === 500)
      assert(v2.fileRows.get.sum === 500L)
      assert(v2.stats.get.mins.length === v2.files.length)
      assert(v2.colStats.head.mins.length === v2.files.length)
      // and the data plane agrees
      val (s2, _, rows2) = SnapshotTable.scanAt(spark, path, 2)
      assert(rows2 === 500 && s2.count() === 500)
      assert(s2.agg(sum("x")).head.getLong(0) === (0L until 500L).map(_ * 2).sum)
    } finally spark.conf.unset("spark.graft.manifest.segmentThreshold")
  }

  test("commitAppendFiles (the streaming epoch shape) and partitioned " +
      "appends take the identity carry too") {
    import spark.implicits._
    import graft.ops.SnapshotTable.{PartField, PartSpec}
    val path = freshPath()
    spark.conf.set("spark.graft.manifest.segmentThreshold", "4")
    try {
      val spec = PartSpec(Seq(PartField("g", "identity", 0L, "string")))
      SnapshotTable.appendPartitioned(
        (0 until 200).map(i => (s"g${i % 4}", i.toLong)).toDF("g", "v"),
        path, spec, statsCol = Some("v"))
      val hits0 = SnapshotTable.fastCarryHits.get()
      SnapshotTable.appendPartitioned(
        (200 until 300).map(i => (s"g${i % 4}", i.toLong)).toDF("g", "v"),
        path, spec, statsCol = Some("v"))
      assert(SnapshotTable.fastCarryHits.get() === hits0 + 1,
        "partitioned append did not take the identity carry")
      assert(SnapshotTable.scanAt(spark, path, 2)._1.count() === 300)
      // typed tuples survived the carry
      val v2 = SnapshotTable.readVersion(spark, path, 2)
      assert(v2.partKeys.get.nFiles === v2.files.length)
    } finally spark.conf.unset("spark.graft.manifest.segmentThreshold")
  }

  test("non-append shapes (COW delete) do NOT take the identity fast " +
      "path and still commit exact, verified carries") {
    import spark.implicits._
    val path = freshPath()
    spark.conf.set("spark.graft.manifest.segmentThreshold", "4")
    try {
      SnapshotTable.append(
        (0 until 400).map(i => (i.toLong, i * 2L)).toDF("k", "x"),
        path, 8, statsCol = Some("k"))
      val hits0 = SnapshotTable.fastCarryHits.get()
      SnapshotTable.deleteStatsRange(spark, path, 100, 149)
      assert(SnapshotTable.fastCarryHits.get() === hits0,
        "a delete must not claim the append-shape identity carry")
      val (s2, _, _) = SnapshotTable.scanAt(spark, path, 2)
      assert(s2.count() === 350)
      // untouched segments still re-referenced by the slow (verified)
      // derivation
      val v1 = SnapshotTable.readVersion(spark, path, 1)
      val v2 = SnapshotTable.readVersion(spark, path, 2)
      assert(v2.segRefs.get.map(_.name)
        .exists(v1.segRefs.get.map(_.name).toSet),
        "delete must re-reference untouched segments")
    } finally spark.conf.unset("spark.graft.manifest.segmentThreshold")
  }
}
