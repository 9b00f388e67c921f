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
}
