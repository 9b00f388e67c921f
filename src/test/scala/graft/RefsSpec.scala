package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.ops.SnapshotTable

/** Branches/tags on the snapshot table log (r19): named refs pin
  * versions (`log/refs/<name>.json`), branches fast-forward atomically,
  * tags are frozen, scans take `.option("ref", name)`, and expire
  * retains ref-reachable versions — the primitives write-audit-publish
  * composes from (q209 oracle-gates the full WAP flow).
  */
class RefsSpec extends SparkSpec {

  private def freshPath(): String =
    Files.createTempDirectory("refs").toString + "/t"

  private def mk(path: String, batches: Int): Unit = {
    import spark.implicits._
    (0 until batches).foreach(b => SnapshotTable.append(
      (b * 100 until b * 100 + 100).map(i => (i.toLong, i.toLong * 2))
        .toDF("k", "v"), path, 2, statsCol = Some("k")))
  }

  test("create/resolve/advance/drop: branches move forward only, tags " +
      "refuse to move, names are validated, doubles are loud") {
    val path = freshPath()
    mk(path, 3)
    assert(SnapshotTable.createBranch(path, "main", 2) === 2)
    assert(SnapshotTable.createTag(path, "rel-1.0", 1) === 1)
    assert(SnapshotTable.refs(path).map(r => (r.name, r.kind, r.version))
      === Seq(("main", "branch", 2L), ("rel-1.0", "tag", 1L)))
    // forward ok, backward loud
    assert(SnapshotTable.advanceBranch(path, "main", 3) === 3)
    val back = intercept[IllegalArgumentException] {
      SnapshotTable.advanceBranch(path, "main", 1)
    }
    assert(back.getMessage.contains("fast-forward"))
    // tags frozen
    val tag = intercept[IllegalArgumentException] {
      SnapshotTable.advanceBranch(path, "rel-1.0", 3)
    }
    assert(tag.getMessage.contains("immutable"))
    // bad names / dup / dangling version
    intercept[IllegalArgumentException] {
      SnapshotTable.createBranch(path, "a/b", 1)
    }
    intercept[java.nio.file.FileAlreadyExistsException] {
      SnapshotTable.createBranch(path, "main", 1)
    }
    intercept[IllegalArgumentException] {
      SnapshotTable.createBranch(path, "x", 99)
    }
    SnapshotTable.dropRef(path, "rel-1.0")
    assert(SnapshotTable.refs(path).map(_.name) === Seq("main"))
    intercept[IllegalArgumentException] {
      SnapshotTable.resolveRef(path, "rel-1.0")
    }
    // ref updates are CONDITIONAL PUTS, not last-wins replaces: every
    // successful advance claims a FRESH sequence file, so a racing
    // advance can collide (FileAlreadyExistsException) but can never
    // silently overwrite a concurrent publish — the lost-update that
    // could move a branch backwards is unrepresentable. Pin: N
    // concurrent advances leave exactly (successes) new pin files and
    // the resolved version is the advanced one.
    val rdir = java.nio.file.Paths.get(path, "log", "refs", "main")
    val before = java.nio.file.Files.list(rdir).count()
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val results = Await.result(Future.sequence((0 until 8).map(_ =>
      Future {
        try { SnapshotTable.advanceBranch(path, "main", 3); 1 }
        catch { case _: java.nio.file.FileAlreadyExistsException => 0 }
      })), 60.seconds)
    val ok = results.sum
    assert(ok >= 1, "no advance succeeded")
    assert(java.nio.file.Files.list(rdir).count() === before + ok,
      "a successful advance must be a fresh pin file, never a replace")
    assert(SnapshotTable.resolveRef(path, "main").version === 3)
  }

  test("scans by ref: the API scan and the DSv2 option read the " +
      "pinned version, and a later commit does not move readers") {
    val path = freshPath()
    mk(path, 2)
    SnapshotTable.createBranch(path, "main") // at v2 = 200 rows
    mk(path, 1) // v3 = 300 rows, head moves; main does not
    val (df, v, rows) = SnapshotTable.scanRef(spark, path, "main")
    assert(v === 2 && rows === 200 && df.count() === 200)
    val t = spark.read.format("graft_table").option("path", path)
      .option("ref", "main").load()
    assert(t.count() === 200)
    assert(spark.read.format("graft_table").option("path", path)
      .load().count() === 300)
    // publish: one metadata-only move, readers follow
    SnapshotTable.advanceBranch(path, "main", 3)
    graft.source.v2.GraftTableSource.invalidate(path)
    assert(spark.read.format("graft_table").option("path", path)
      .option("ref", "main").load().count() === 300)
  }

  test("expire retains ref-reachable versions: the pinned manifest " +
      "and its files survive a sweep that expires everything else") {
    import spark.implicits._
    val path = freshPath()
    // v1..v4, each replacing most files via delete+append would be
    // complex — plain appends: v1 files remain referenced by v4, so
    // pin a TAG at v1 and expire from v4; the v1 manifest must stay
    mk(path, 4)
    SnapshotTable.createTag(path, "audit-v1", 1)
    val r = SnapshotTable.expire(spark, path, keepFrom = 4)
    // v2 and v3 manifests expired; v1 retained by the tag
    assert(r.manifestsDeleted === 2, s"expired ${r.manifestsDeleted}")
    val (d1, _, rows1) = SnapshotTable.scanAt(spark, path, 1)
    assert(rows1 === 100 && d1.count() === 100)
    // dropping the tag releases it: the next sweep takes v1 too
    SnapshotTable.dropRef(path, "audit-v1")
    val r2 = SnapshotTable.expire(spark, path, keepFrom = 4)
    assert(r2.manifestsDeleted === 1)
    intercept[IllegalArgumentException] {
      SnapshotTable.readVersion(spark, path, 1)
    }
    // head unaffected throughout
    assert(SnapshotTable.scanAt(spark, path, 4)._1.count() === 400)
  }

  test("SQL surface: CALL create_branch/create_tag/fast_forward/" +
      "drop_ref, VERSION AS OF by ref name, and the t.refs metadata " +
      "table") {
    val r = Files.createTempDirectory("refscat").toString
    spark.conf.set("spark.sql.catalog.graft_rf",
      "graft.source.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_rf.root", r)
    spark.sql("CREATE TABLE graft_rf.db.t (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO graft_rf.db.t SELECT id, id * 2 FROM range(100)")
    assert(spark.sql(
      "CALL graft_rf.system.create_branch('db.t', 'main', -1)")
      .head.getLong(0) === 1)
    spark.sql("INSERT INTO graft_rf.db.t " +
      "SELECT id, id * 2 FROM range(100, 150)")
    assert(spark.sql(
      "CALL graft_rf.system.create_branch('db.t', 'staging', -1)")
      .head.getLong(0) === 2)
    // readers: head sees both, the published ref sees v1 — by SQL
    // VERSION AS OF with the REF NAME (the Iceberg idiom)
    assert(spark.sql("SELECT count(*) FROM graft_rf.db.t")
      .head.getLong(0) === 150)
    assert(spark.sql(
      "SELECT count(*) FROM graft_rf.db.t VERSION AS OF 'main'")
      .head.getLong(0) === 100)
    // publish = one CALL; the ref read follows
    assert(spark.sql(
      "CALL graft_rf.system.fast_forward('db.t', 'main', 'staging')")
      .head.getLong(0) === 2)
    graft.source.v2.GraftTableSource.invalidate(s"$r/db/t")
    assert(spark.sql(
      "SELECT count(*) FROM graft_rf.db.t VERSION AS OF 'main'")
      .head.getLong(0) === 150)
    // the refs metadata table
    spark.sql("CALL graft_rf.system.create_tag('db.t', 'rel', 1)")
    val refs = spark.sql("""SELECT name, kind, version
      FROM graft_rf.db.t.refs ORDER BY name""").collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2))).toSeq
    assert(refs === Seq(("main", "branch", 2L), ("rel", "tag", 1L),
      ("staging", "branch", 2L)))
    assert(spark.sql("CALL graft_rf.system.drop_ref('db.t', 'rel')")
      .head.getBoolean(0))
    assert(spark.sql("SELECT count(*) FROM graft_rf.db.t.refs")
      .head.getLong(0) === 2)
    spark.sql("DROP TABLE graft_rf.db.t")
  }

  test("write-audit-publish: staged commits move the head, main moves " +
      "only on publish, and a failed audit leaves main untouched") {
    import spark.implicits._
    val path = freshPath()
    mk(path, 1)
    SnapshotTable.createBranch(path, "main") // published = v1
    // stage a good batch on a branch
    SnapshotTable.append((1000L until 1100L).map(i => (i, i * 2))
      .toDF("k", "v"), path, 2, statsCol = Some("k"))
    SnapshotTable.createBranch(path, "staging") // = v2
    // audit the STAGING version, not the head-by-habit
    val (staged, sv, _) = SnapshotTable.scanRef(spark, path, "staging")
    assert(sv === 2)
    val bad = staged.filter(col("v") =!= col("k") * 2).count()
    assert(bad === 0)
    SnapshotTable.fastForward(path, "main", "staging")
    assert(SnapshotTable.resolveRef(path, "main").version === 2)
    // stage a BAD batch; audit fails; main must not move
    SnapshotTable.append(Seq((5000L, 1L)).toDF("k", "v"), path, 1,
      statsCol = Some("k"))
    SnapshotTable.advanceBranch(path, "staging", 3)
    val (s3, _, _) = SnapshotTable.scanRef(spark, path, "staging")
    assert(s3.filter(col("v") =!= col("k") * 2).count() === 1)
    // the audit failed: no fastForward — main still serves v2
    val (pub, pv, rows) = SnapshotTable.scanRef(spark, path, "main")
    assert(pv === 2 && rows === 200)
    assert(pub.filter(col("v") =!= col("k") * 2).count() === 0)
  }

  test("publish cherry-picks the staged batch past a failed-audit " +
      "ancestor: the published state carries D but NOT C, and C's " +
      "txn watermark never leaks into the published lineage") {
    import spark.implicits._
    val path = freshPath()
    mk(path, 1) // batch A = v1
    SnapshotTable.createBranch(path, "main") // published = v1
    // batch C: POISONED (v=1 breaks v = k*2), staged, audit FAILS
    SnapshotTable.append(
      ((2000L until 2050L).map(i => (i, i * 2)) :+ (5000L, 1L))
        .toDF("k", "v"), path, 2, statsCol = Some("k"),
      txn = Some(("writerC", 1L)))
    SnapshotTable.createBranch(path, "staging", 2)
    SnapshotTable.stageBranch(path, "staging", 2, 1)
    val (sc, _, _) = SnapshotTable.scanRef(spark, path, "staging")
    assert(sc.filter(col("v") =!= col("k") * 2).count() === 1)
    // audit failed → abandon C. batch D: clean, staged base = v2
    SnapshotTable.append((3000L until 3080L).map(i => (i, i * 2))
      .toDF("k", "v"), path, 2, statsCol = Some("k"),
      txn = Some(("writerD", 7L)))
    SnapshotTable.stageBranch(path, "staging", 3, 2)
    val (sd, _, _) = SnapshotTable.scanRef(spark, path, "staging")
    // D's slice audits clean (C's poison is visible at the staged
    // version — the audit scopes to the batch's key range)
    assert(sd.filter(col("k") >= 3000L && col("k") < 4000L)
      .filter(col("v") =!= col("k") * 2).count() === 0)
    val r = SnapshotTable.publish(spark, path, "main", "staging")
    assert(r.mode === "cherry-pick" && r.version === 4)
    assert(SnapshotTable.resolveRef(path, "main").version === 4)
    val (pub, _, pubRows) = SnapshotTable.scanRef(spark, path, "main")
    assert(pubRows === 180, s"published rows $pubRows")    // A + D
    assert(pub.filter(col("k") >= 2000L && col("k") < 3000L).count()
      === 0, "the failed-audit batch leaked into the published state")
    assert(pub.filter(col("k") >= 3000L).count() === 80)
    assert(pub.filter(col("v") =!= col("k") * 2).count() === 0)
    // C's watermark must NOT be published (a retry of C must not
    // think it committed); D's must be
    val v4 = SnapshotTable.readVersion(spark, path, 4)
    assert(!v4.txns.contains("writerC"), "failed batch's txn leaked")
    assert(v4.txns.get("writerD").contains(7L))
    // stats survive the transplant: a key-range scan still prunes
    val (_, filesRead, filesTotal) =
      SnapshotTable.scanStatsRange(spark, path, 4, 3000L, 3010L)
    assert(filesRead < filesTotal,
      s"cherry-picked manifest lost stats pruning ($filesRead/" +
        s"$filesTotal)")
    // time travel unbroken: the staged versions still read their
    // full lineage (C included) — cherry-pick rewrote nothing
    assert(SnapshotTable.scanAt(spark, path, 3)._1.count() === 231)
  }

  test("publish is a plain fast-forward when nothing foreign sits " +
      "under the batch, and refuses without a staged base") {
    import spark.implicits._
    val path = freshPath()
    mk(path, 1)
    SnapshotTable.createBranch(path, "main")
    SnapshotTable.append((900L until 950L).map(i => (i, i * 2))
      .toDF("k", "v"), path, 1, statsCol = Some("k"))
    SnapshotTable.createBranch(path, "staging", 2)
    // plain advance records no base → publish refuses, fastForward
    // remains the explicit whole-range publish
    val noBase = intercept[IllegalArgumentException] {
      SnapshotTable.publish(spark, path, "main", "staging")
    }
    assert(noBase.getMessage.contains("stageBranch"))
    SnapshotTable.stageBranch(path, "staging", 2, 1)
    val r = SnapshotTable.publish(spark, path, "main", "staging")
    assert(r.mode === "fast-forward" && r.version === 2)
    assert(SnapshotTable.resolveRef(path, "main").version === 2)
    assert(SnapshotTable.latestVersion(path) === 2,
      "fast-forward publish must not mint a new version")
  }

  test("publish rejects a batch that touched an unpublished batch's " +
      "data: removed files and DV deletes against staged-only files " +
      "both fail loudly") {
    import spark.implicits._
    val path = freshPath()
    mk(path, 1) // v1: k in [0, 100)
    SnapshotTable.createBranch(path, "main")
    // batch C (unpublished): k in [2000, 2050)
    SnapshotTable.append((2000L until 2050L).map(i => (i, i * 2))
      .toDF("k", "v"), path, 1, statsCol = Some("k"))
    // batch E: COW-deletes rows C added → rewrites C's file
    SnapshotTable.deleteStatsRange(spark, path, 2000L, 2010L)
    SnapshotTable.createBranch(path, "staging", 3)
    SnapshotTable.stageBranch(path, "staging", 3, 2)
    val e = intercept[java.util.ConcurrentModificationException] {
      SnapshotTable.publish(spark, path, "main", "staging")
    }
    assert(e.getMessage.contains("UNPUBLISHED"))
    assert(SnapshotTable.resolveRef(path, "main").version === 1,
      "a rejected publish must not move the published ref")
    // DV flavor: delete via deletion vectors against C's rows
    SnapshotTable.setDvPolicy(path, maxDvFiles = 100,
      maxDvFraction = 1.0)
    SnapshotTable.deleteRowsWhere(spark, path, "k = 2020")
    SnapshotTable.stageBranch(path, "staging", 4, 3)
    val e2 = intercept[java.util.ConcurrentModificationException] {
      SnapshotTable.publish(spark, path, "main", "staging")
    }
    assert(e2.getMessage.contains("deletion vectors") ||
      e2.getMessage.contains("UNPUBLISHED"))
  }

  test("ref hygiene: digit-only names refuse (VERSION AS OF " +
      "ambiguity), a dropped ref stays dropped, and refs() tolerates " +
      "a half-created name") {
    val path = freshPath()
    mk(path, 2)
    val digits = intercept[IllegalArgumentException] {
      SnapshotTable.createBranch(path, "2026", 1)
    }
    assert(digits.getMessage.contains("version NUMBER"))
    SnapshotTable.createBranch(path, "main", 1)
    SnapshotTable.dropRef(path, "main")
    intercept[IllegalArgumentException] {
      SnapshotTable.advanceBranch(path, "main", 2)
    }
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(path, "log", "refs", "main")),
      "a failed advance after drop must not resurrect the ref dir")
    // a ref dir with no pin yet (a creator crashed mid-create, or a
    // concurrent drop won): listing skips it instead of failing
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(path, "log", "refs", "halfway"))
    assert(SnapshotTable.refs(path).map(_.name) === Seq.empty)
  }

  test("SQL surface: CALL stage_branch + publish cherry-pick from " +
      "pure SQL") {
    val r = Files.createTempDirectory("refscat2").toString
    spark.conf.set("spark.sql.catalog.graft_rp",
      "graft.source.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_rp.root", r)
    spark.sql("CREATE TABLE graft_rp.db.t (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO graft_rp.db.t SELECT id, id * 2 FROM range(100)")
    spark.sql("CALL graft_rp.system.create_branch('db.t', 'main', -1)")
    // staged batch C (poison), audit fails
    spark.sql("INSERT INTO graft_rp.db.t VALUES (5000, 1)")
    spark.sql("CALL graft_rp.system.create_branch('db.t', 'staging', 2)")
    spark.sql("CALL graft_rp.system.stage_branch('db.t', 'staging', 2, 1)")
    // staged batch D (clean), audit passes, publish
    spark.sql("INSERT INTO graft_rp.db.t " +
      "SELECT id, id * 2 FROM range(100, 150)")
    spark.sql("CALL graft_rp.system.stage_branch('db.t', 'staging', 3, 2)")
    val pr = spark.sql(
      "CALL graft_rp.system.publish('db.t', 'main', 'staging')").head
    assert(pr.getString(2) === "cherry-pick")
    assert(spark.sql(
      "SELECT count(*) FROM graft_rp.db.t VERSION AS OF 'main'")
      .head.getLong(0) === 150)
    assert(spark.sql("SELECT count(*) FROM graft_rp.db.t " +
      "VERSION AS OF 'main' WHERE v <> k * 2").head.getLong(0) === 0)
    spark.sql("DROP TABLE graft_rp.db.t")
  }
}
