package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.types._
import java.nio.file.Files

/** The Iceberg VIEW spec surface (versioned SQL views) over the REST
  * catalog: create/load/list/drop/rename, replace-as-new-version with
  * immutable history, uuid requirement refusal, racing redefinitions
  * serialized without losing a version, registry restart recovery, and
  * the GraftSql CREATE/ALTER/DROP VIEW statements in both local and
  * catalog mode (including second-session discovery and views over
  * views).
  */
class ViewCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_view").toString
  private val conf = new org.apache.hadoop.conf.Configuration()

  private def withServer[A](f: (RestCatalogServer, RestCatalogClient) => A): A = {
    val srv = new RestCatalogServer(tmp(), conf)
    try f(srv, new RestCatalogClient(srv.uri)) finally srv.stop()
  }

  private val viewSchema = StructType(Seq(
    StructField("k", IntegerType), StructField("total", DoubleType)))

  test("create + load: uuid, version 1, SQL representation, schema round-trip") {
    withServer { (_, c) =>
      c.createNamespace(Seq("lake"))
      val created = c.createView(Seq("lake"), "v", "SELECT k, total FROM t", viewSchema)
      assert(created.metadataLocation.endsWith("v1.view.json"))
      val m = c.loadView(Seq("lake"), "v").metadata
      assert(m.viewUuid.nonEmpty)
      assert(m.currentVersionId == 1)
      assert(m.versions.map(_.versionId) == Seq(1))
      assert(m.currentVersion.sqlFor("spark") == "SELECT k, total FROM t")
      assert(m.currentVersion.defaultNamespace == Seq("lake"))
      assert(m.schemaOf(m.currentVersion) == viewSchema)
      assert(m.versionLog.map(_._2) == Seq(1))
      assert(c.listViews(Seq("lake")) == Seq("v"))
      assert(c.viewExists(Seq("lake"), "v"))
      assert(!c.viewExists(Seq("lake"), "nope"))
      // a view is NOT a table: the table listing stays empty
      assert(c.listTables(Seq("lake")).isEmpty)
      val dup = intercept[c.CatalogException](
        c.createView(Seq("lake"), "v", "SELECT 1", viewSchema))
      assert(dup.code == 409)
    }
  }

  test("replace appends an immutable version; history stays replayable") {
    withServer { (_, c) =>
      c.createNamespace(Seq("lake"))
      c.createView(Seq("lake"), "v", "SELECT k FROM t", viewSchema)
      val base = c.loadView(Seq("lake"), "v").metadata
      val wider = StructType(viewSchema.fields :+ StructField("n", LongType))
      val replaced = c.replaceView(Seq("lake"), "v", base,
        "SELECT k, total, n FROM t", wider).metadata
      assert(replaced.viewUuid == base.viewUuid) // uuid survives redefinition
      assert(replaced.currentVersionId == 2)
      assert(replaced.versions.map(_.versionId) == Seq(1, 2))
      // version 1 unchanged, byte for byte
      assert(replaced.versionAt(1).sqlFor("spark") == "SELECT k FROM t")
      assert(replaced.versionAt(2).sqlFor("spark") == "SELECT k, total, n FROM t")
      assert(replaced.schemaOf(replaced.versionAt(2)) == wider)
      assert(replaced.schemaOf(replaced.versionAt(1)) == viewSchema)
      assert(replaced.versionLog.map(_._2) == Seq(1, 2))
      // metadata FILE version advanced through the CAS
      assert(c.loadView(Seq("lake"), "v").metadataLocation.endsWith("v2.view.json"))
    }
  }

  test("assert-view-uuid refusal: a wrong uuid is a 409, nothing changes") {
    withServer { (_, c) =>
      c.createNamespace(Seq("lake"))
      c.createView(Seq("lake"), "v", "SELECT k FROM t", viewSchema)
      val base = c.loadView(Seq("lake"), "v").metadata
      val bad = base.copy(viewUuid = "00000000-0000-0000-0000-000000000000")
      val e = intercept[c.CatalogException](
        c.replaceView(Seq("lake"), "v", bad, "SELECT 1", viewSchema))
      assert(e.code == 409 && e.errorType == "CommitFailedException")
      val after = c.loadView(Seq("lake"), "v").metadata
      assert(after.currentVersionId == 1 && after.versions.size == 1)
    }
  }

  test("racing redefinitions serialize: both versions land, none lost") {
    withServer { (_, c) =>
      c.createNamespace(Seq("lake"))
      c.createView(Seq("lake"), "v", "SELECT k FROM t", viewSchema)
      val base = c.loadView(Seq("lake"), "v").metadata
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration._
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      try {
        Await.result(Future.sequence(Seq("SELECT 10 AS k", "SELECT 20 AS k").map {
          sql => Future { c.replaceView(Seq("lake"), "v", base, sql, viewSchema) }
        }), 60.seconds)
      } finally pool.shutdown()
      val m = c.loadView(Seq("lake"), "v").metadata
      // uuid is stable across redefinitions, so BOTH commits pass the
      // requirement; the per-view lock serializes them — versions 2 and 3
      // both exist, current is one of them, history is linear
      assert(m.versions.map(_.versionId) == Seq(1, 2, 3))
      val sqls = m.versions.map(_.sqlFor("spark")).toSet
      assert(sqls == Set("SELECT k FROM t", "SELECT 10 AS k", "SELECT 20 AS k"))
      assert(Set(2, 3).contains(m.currentVersionId))
    }
  }

  test("set-properties, drop, rename, namespace emptiness, restart recovery") {
    val wh = tmp()
    val srv = new RestCatalogServer(wh, conf)
    try {
      val c = new RestCatalogClient(srv.uri)
      c.createNamespace(Seq("lake"))
      c.createNamespace(Seq("mart"))
      c.createView(Seq("lake"), "v", "SELECT k FROM t", viewSchema)
      val base = c.loadView(Seq("lake"), "v").metadata
      val withProps = c.setViewProperties(Seq("lake"), "v", base,
        Map("comment" -> "totals view")).metadata
      assert(withProps.properties("comment") == "totals view")
      // versions untouched by a properties-only commit
      assert(withProps.versions.map(_.versionId) == Seq(1))
      // a namespace holding only a view refuses to drop
      val full = intercept[c.CatalogException](c.dropNamespace(Seq("lake")))
      assert(full.code == 409)
      c.renameView(Seq("lake"), "v", Seq("mart"), "v2")
      assert(c.listViews(Seq("lake")).isEmpty)
      assert(c.listViews(Seq("mart")) == Seq("v2"))
      assert(c.loadView(Seq("mart"), "v2").metadata.viewUuid == base.viewUuid)
      c.dropNamespace(Seq("lake")) // empty now
      srv.stop()
      // a restarted server over the same warehouse recovers the registry
      val srv2 = new RestCatalogServer(wh, conf)
      try {
        val c2 = new RestCatalogClient(srv2.uri)
        assert(c2.listViews(Seq("mart")) == Seq("v2"))
        assert(c2.loadView(Seq("mart"), "v2").metadata.currentVersionId == 1)
      } finally srv2.stop()
    } finally srv.stop()
  }

  test("GraftSql local mode: create, read, alter, read, duplicate refusal, drop") {
    val g = new graft.sources.GraftSql(spark, tmp())
    val t = graft.tables.GraftTable.createAs(spark, tmp() + "/t",
      Seq((1, 10.0), (2, 20.0), (3, 30.0)).toDF("k", "total"))
    g.register("base_t", t.location)
    g.sql("CREATE VIEW big AS SELECT k, total FROM base_t WHERE total > 15.0")
    assert(g.sql("SELECT * FROM big").count() == 2)
    val dup = intercept[IllegalArgumentException](
      g.sql("CREATE VIEW big AS SELECT k FROM base_t"))
    assert(dup.getMessage.contains("already exists"))
    g.sql("ALTER VIEW big AS SELECT k, total FROM base_t WHERE total > 25.0")
    assert(g.sql("SELECT * FROM big").count() == 1)
    g.sql("CREATE OR REPLACE VIEW big AS SELECT k, total FROM base_t")
    assert(g.sql("SELECT * FROM big").count() == 3)
    // a view over a view
    g.sql("CREATE VIEW big2 AS SELECT k FROM big WHERE k >= 2")
    assert(g.sql("SELECT * FROM big2").count() == 2)
    assert(g.sql("SHOW VIEWS").as[String].collect().toSeq == Seq("big", "big2"))
    g.sql("DROP VIEW big2")
    assert(g.sql("SHOW VIEWS").as[String].collect().toSeq == Seq("big"))
  }

  test("GraftSql catalog mode: versions through the catalog, 2nd-session discovery") {
    withServer { (_, c) =>
      c.createNamespace(Seq("lake"))
      val wh = tmp()
      val t = graft.tables.GraftTable.createAs(spark, s"$wh/t",
        Seq((1, 10.0), (2, 20.0), (3, 30.0)).toDF("k", "total"))
      val g = new graft.sources.GraftSql(spark, wh, Some((c, Seq("lake"))))
      g.register("base_t", t.location)
      g.sql("CREATE VIEW big AS SELECT k, total FROM base_t WHERE total > 15.0")
      g.sql("ALTER VIEW big AS SELECT k, total FROM base_t WHERE total > 5.0")
      val m = c.loadView(Seq("lake"), "big").metadata
      assert(m.versions.map(_.versionId) == Seq(1, 2))
      assert(m.currentVersionId == 2)
      // analyzed schema recorded per version
      assert(m.schemaOf(m.versionAt(2)).fieldNames.toSeq == Seq("k", "total"))
      // a SECOND session discovers the view (and its base table) purely
      // from the catalog and reads the CURRENT definition
      val g2 = new graft.sources.GraftSql(spark, wh, Some((c, Seq("lake"))))
      assert(g2.sql("SELECT * FROM big").count() == 3)
      // the historical definition replays from metadata
      assert(g2.sql(m.versionAt(1).sqlFor("spark")).count() == 2)
      g2.sql("DROP VIEW big")
      assert(c.listViews(Seq("lake")).isEmpty)
    }
  }
}
