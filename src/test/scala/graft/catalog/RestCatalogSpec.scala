package graft.catalog

import graft.SparkSpec
import graft.tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** The Iceberg REST catalog protocol over graft tables: discovery
  * (namespaces, create/register/load/rename/drop), commit-via-
  * requirements/updates CAS mapped onto the version-file commit, conflict
  * refusal + rebase retry over the wire, diff/apply identity across every
  * commit shape the engine produces, and registry recovery on restart.
  */
class RestCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_cat").toString
  private val conf = new org.apache.hadoop.conf.Configuration()

  private def withServer[A](f: (RestCatalogServer, RestCatalogClient) => A): A = {
    val srv = new RestCatalogServer(tmp(), conf)
    try f(srv, new RestCatalogClient(srv.uri)) finally srv.stop()
  }

  test("namespace lifecycle: create, list, duplicate 409, non-empty 409, drop") {
    withServer { (_, c) =>
      c.createNamespace(Seq("lake"))
      c.createNamespace(Seq("lake", "raw")) // multi-level
      assert(c.listNamespaces() == Seq(Seq("lake"), Seq("lake", "raw")))
      val dup = intercept[c.CatalogException](c.createNamespace(Seq("lake")))
      assert(dup.code == 409 && dup.errorType == "AlreadyExistsException")
      c.createTable(Seq("lake"), "t", StructType(Seq(StructField("a", IntegerType))))
      val full = intercept[c.CatalogException](c.dropNamespace(Seq("lake")))
      assert(full.code == 409)
      c.dropTable(Seq("lake"), "t")
      c.dropNamespace(Seq("lake"))
      assert(c.listNamespaces() == Seq(Seq("lake", "raw")))
    }
  }

  test("create + load + catalog-mediated append + read back") {
    withServer { (_, c) =>
      c.createNamespace(Seq("lake"))
      val region = spark.read.parquet(s"$sf/region.parquet")
      c.createTable(Seq("lake"), "region", region.schema)
      assert(c.listTables(Seq("lake")) == Seq("region"))
      assert(c.tableExists(Seq("lake"), "region"))
      assert(!c.tableExists(Seq("lake"), "nope"))

      val t = c.table(spark, Seq("lake"), "region")
      t.append(region)
      // a SECOND session-handle (fresh discovery through the catalog)
      // sees the committed rows — the shared-table story
      val t2 = c.table(spark, Seq("lake"), "region")
      assert(t2.toDF().count() == region.count())
      // loadTable's metadata-location points at the CURRENT version file
      val lr = c.loadTable(Seq("lake"), "region")
      assert(lr.metadataLocation.endsWith(s"v${t2.meta.version}.metadata.json"))
      assert(lr.metadata.currentSnapshotId == t2.meta.currentSnapshotId)

      val missing = intercept[c.CatalogException](c.loadTable(Seq("lake"), "nope"))
      assert(missing.code == 404 && missing.errorType == "NoSuchTableException")
    }
  }

  test("register adopts an existing graft table; rename moves it") {
    withServer { (_, c) =>
      c.createNamespace(Seq("lake"))
      c.createNamespace(Seq("mart"))
      val t = GraftTable.createAs(spark, tmp() + "/t",
        spark.read.parquet(s"$sf/nation.parquet"))
      val metaLoc = MetaIO.metadataPath(t.location,
        MetaIO.currentVersion(conf, t.location).get)
      c.registerTable(Seq("lake"), "nation", metaLoc)
      assert(c.table(spark, Seq("lake"), "nation").toDF().count() == 25)
      c.renameTable(Seq("lake"), "nation", Seq("mart"), "nations")
      assert(!c.tableExists(Seq("lake"), "nation"))
      assert(c.table(spark, Seq("mart"), "nations").toDF().count() == 25)
    }
  }

  test("diff/apply is the identity on every commit shape the engine makes") {
    // shim delegate: every commit round-trips base --diff--> updates
    // --apply--> next' and must land EXACTLY on the client's next before
    // the real publish — run a battery of heterogeneous ops under it
    val loc = tmp() + "/t"
    val t = GraftTable.createAs(spark, loc,
      spark.read.parquet(s"$sf/region.parquet"))
    var commits = 0
    t.commitDelegate = Some { next =>
      val base = MetaIO.metaFromJson(MetaIO.readString(conf,
        MetaIO.metadataPath(loc, next.version - 1)))
      val p = MetaDiff.diff(base, next)
      assert(MetaDiff.checkRequirements(base, p.requirements).isEmpty)
      val applied = MetaDiff.applyUpdates(base, p.updates)
      assert(applied == next,
        s"diff/apply drift on commit ${next.version}:\n$applied\nvs\n$next")
      commits += 1
      MetaIO.commitMeta(conf, next)
    }
    t.append(Seq((90, "x", "c")).toDF("r_regionkey", "r_name", "r_comment"))
    t.setProperties(Map("write.sort-order" -> "r_regionkey", "x" -> "1"))
    t.addColumn("score", LongType)                       // schema evolution
    t.renameColumn("score", "rank")
    t.setPartitionSpec(Seq(PartitionField("r_regionkey", "bucket[4]", "rk_bucket")))
    t.append(Seq((91, "y", "c", 5L)).toDF("r_regionkey", "r_name", "r_comment", "rank"))
    t.createTag("v1", t.meta.currentSnapshotId.get)      // refs
    t.createBranch("dev", t.meta.currentSnapshotId)
    t.delete("r_regionkey = 90")                          // CoW rewrite
    val firstSnap = t.meta.snapshots.head.id
    t.rollback(t.meta.snapshots(1).id)                    // pointer move
    t.dropRef("dev")
    t.expireSnapshots(System.currentTimeMillis() + 1000)  // snapshot removal
    // WAP shape: stage on a branch, cherry-pick onto main, drop the branch
    t.createBranch("wap", t.meta.currentSnapshotId)
    t.appendToBranch(Seq((95, "z", "c", 9L))
      .toDF("r_regionkey", "r_name", "r_comment", "rank"), "wap")
    t.cherryPick(t.meta.refs("wap").snapshotId)
    t.dropRef("wap")
    // merge-on-read commits (DV delete + materialization rewrite)
    t.deleteMergeOnReadDV("r_regionkey = 95")
    t.materializeDeletes()
    assert(commits >= 15, s"only $commits commits exercised")
    assert(t.meta.snapshots.nonEmpty && firstSnap >= 0)
  }

  test("stale commit gets 409 CommitFailedException; retry loop rebases over the wire") {
    withServer { (_, c) =>
      c.createNamespace(Seq("lake"))
      val orders = spark.read.parquet(s"$sf/orders.parquet").limit(200)
      c.createTable(Seq("lake"), "orders", orders.schema,
        properties = Map(TableFormat.CommitRetries -> "16"))
      c.table(spark, Seq("lake"), "orders").append(orders)

      // hand-rolled STALE proposal: base v1 when the table is at v2
      val cur = c.loadTable(Seq("lake"), "orders").metadata
      val v1 = MetaIO.metaFromJson(MetaIO.readString(conf,
        MetaIO.metadataPath(cur.location, 1)))
      val e = intercept[java.util.ConcurrentModificationException](
        c.commit(Seq("lake"), "orders", v1,
          v1.copy(version = 2, properties = v1.properties + ("p" -> "x"))))
      assert(e.getMessage.contains("conflict"))

      // t33 semantics over the wire: four writers race through the
      // catalog; losers must 409, rebase onto the winner's base, retry —
      // all rows land, history stays linear
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration._
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      try {
        Await.result(Future.sequence((1 to 4).map { i =>
          Future {
            c.table(spark, Seq("lake"), "orders").append(
              orders.withColumn("o_orderkey", col("o_orderkey") + lit(1000000L * i)))
          }
        }), 300.seconds)
      } finally pool.shutdown()
      val t = c.table(spark, Seq("lake"), "orders")
      val m = t.meta
      assert(m.snapshots.count(_.operation == "append") == 5)
      assert(m.currentAncestors.size == m.snapshots.size, "history must stay linear")
      assert(t.toDF().count() == 5 * orders.count())
      assert(t.toDF().select("o_orderkey").distinct().count() == 5 * orders.count())
    }
  }

  test("a ref named 'main' is refused (it would shadow the current pointer)") {
    val loc = tmp() + "/t"
    val t = GraftTable.createAs(spark, loc,
      spark.read.parquet(s"$sf/region.parquet"))
    t.createBranch("main", t.meta.currentSnapshotId)
    val base = MetaIO.metaFromJson(MetaIO.readString(conf,
      MetaIO.metadataPath(loc, t.meta.version - 1)))
    val e = intercept[IllegalArgumentException](MetaDiff.diff(base, t.meta))
    assert(e.getMessage.contains("main"))
  }

  test("server restart recovers the registry from catalog.json") {
    val wh = tmp()
    val srv1 = new RestCatalogServer(wh, conf)
    val c1 = new RestCatalogClient(srv1.uri)
    c1.createNamespace(Seq("lake"))
    c1.createTable(Seq("lake"), "region",
      spark.read.parquet(s"$sf/region.parquet").schema)
    c1.table(spark, Seq("lake"), "region")
      .append(spark.read.parquet(s"$sf/region.parquet"))
    srv1.stop()
    val srv2 = new RestCatalogServer(wh, conf)
    try {
      val c2 = new RestCatalogClient(srv2.uri)
      assert(c2.listNamespaces() == Seq(Seq("lake")))
      assert(c2.listTables(Seq("lake")) == Seq("region"))
      assert(c2.table(spark, Seq("lake"), "region").toDF().count() == 5)
    } finally srv2.stop()
  }

  test("two SparkSessions share one table through the catalog") {
    // separate Spark SESSIONS (isolated SQL conf/temp views over one
    // context): A creates and writes through the catalog, B discovers
    // the table by name and reads — then commits its own append, which A
    // observes. No shared driver state beyond the catalog itself.
    withServer { (_, c) =>
      val sessionA = spark.newSession()
      val sessionB = spark.newSession()
      c.createNamespace(Seq("lake"))
      val region = sessionA.read.parquet(s"$sf/region.parquet")
      c.createTable(Seq("lake"), "shared", region.schema)
      c.table(sessionA, Seq("lake"), "shared").append(region)
      val viaB = c.table(sessionB, Seq("lake"), "shared")
      assert(viaB.toDF().count() == 5)
      viaB.append(sessionB.createDataFrame(
        sessionA.sparkContext.parallelize(Seq(
          org.apache.spark.sql.Row(200, "via-b", "c"))), region.schema))
      assert(c.table(sessionA, Seq("lake"), "shared").toDF().count() == 6)
      assert(c.loadTable(Seq("lake"), "shared").metadata.snapshots.size == 2)
    }
  }

  test("streaming sink commits through the catalog: one REST commit per micro-batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.types._
    implicit val sqlCtx = spark.sqlContext
    withServer { (_, c) =>
      c.createNamespace(Seq("lake"))
      c.createTable(Seq("lake"), "ev",
        StructType(Seq(StructField("event_id", LongType), StructField("value", DoubleType))))
      // st04's sink over a catalog-attached handle: every micro-batch
      // append is a requirements/updates proposal over the wire
      val table = c.table(spark, Seq("lake"), "ev")
      val input = MemoryStream[(Long, Double)]
      val q = graft.streaming.Streams.writeToTable(
        input.toDF().toDF("event_id", "value"), table, "cat_st04")
      try {
        input.addData((1L, 1.0), (2L, 2.0))
        q.processAllAvailable()
        val v1 = c.loadTable(Seq("lake"), "ev").metadata.version
        input.addData((3L, 3.0))
        q.processAllAvailable()
        val m = c.loadTable(Seq("lake"), "ev").metadata
        assert(m.version == v1 + 1, "each micro-batch is one catalog commit")
        assert(m.snapshots.size == 2)
        assert(c.table(spark, Seq("lake"), "ev").toDF().count() == 3)
      } finally q.stop()
    }
  }

  test("names with '+', '%', and spaces survive the path encoding (review finding)") {
    withServer { (_, c) =>
      c.createNamespace(Seq("a+b"))
      c.createTable(Seq("a+b"), "my table",
        StructType(Seq(StructField("x", IntegerType))))
      c.createTable(Seq("a+b"), "p%t",
        StructType(Seq(StructField("x", IntegerType))))
      assert(c.tableExists(Seq("a+b"), "my table"))
      assert(c.tableExists(Seq("a+b"), "p%t"))
      assert(c.listTables(Seq("a+b")).toSet == Set("my table", "p%t"))
      assert(c.loadTable(Seq("a+b"), "p%t").metadataLocation.nonEmpty)
      c.dropTable(Seq("a+b"), "my table")
      assert(!c.tableExists(Seq("a+b"), "my table"))
    }
  }

  test("pagination: pageSize chunks listings, tokens resume, client reassembles") {
    withServer { (srv, c) =>
      c.createNamespace(Seq("lake"))
      (1 to 7).foreach(i => c.createTable(Seq("lake"), f"t$i%02d",
        StructType(Seq(StructField("a", IntegerType)))))
      // raw paged request: 3 at a time with a resume token
      val http = java.net.http.HttpClient.newHttpClient()
      def get(path: String): com.fasterxml.jackson.databind.JsonNode =
        new com.fasterxml.jackson.databind.ObjectMapper().readTree(
          http.send(java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(s"${srv.uri}$path")).GET().build(),
            java.net.http.HttpResponse.BodyHandlers.ofString()).body())
      val p1 = get("/v1/namespaces/lake/tables?pageSize=3")
      assert(p1.get("identifiers").size() == 3)
      val tok = p1.get("next-page-token").asText()
      assert(tok == "t03")
      val p2 = get(s"/v1/namespaces/lake/tables?pageSize=3&pageToken=$tok")
      assert(p2.get("identifiers").size() == 3)
      assert(p2.get("identifiers").get(0).get("name").asText() == "t04")
      // the client reassembles all pages transparently
      assert(c.listTables(Seq("lake")).size == 7)
      // metrics endpoint: accepted and dropped per spec
      val mr = http.send(java.net.http.HttpRequest.newBuilder(
        java.net.URI.create(s"${srv.uri}/v1/namespaces/lake/tables/t01/metrics"))
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString("{}")).build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(mr.statusCode() == 204)
    }
  }

  test("bearer-token auth: 401 without the token, full surface with it") {
    val srv = new RestCatalogServer(tmp(), conf, bearerToken = Some("s3cret"))
    try {
      val anon = new RestCatalogClient(srv.uri)
      val e = intercept[anon.CatalogException](anon.listNamespaces())
      assert(e.code == 401 && e.errorType == "NotAuthorizedException")
      val bad = new RestCatalogClient(srv.uri, bearerToken = Some("wrong"))
      assert(intercept[bad.CatalogException](bad.listNamespaces()).code == 401)
      val ok = new RestCatalogClient(srv.uri, bearerToken = Some("s3cret"))
      ok.createNamespace(Seq("lake"))
      ok.createTable(Seq("lake"), "t",
        StructType(Seq(StructField("a", IntegerType))))
      ok.table(spark, Seq("lake"), "t")
        .append(spark.range(3).selectExpr("CAST(id AS INT) AS a"))
      assert(ok.table(spark, Seq("lake"), "t").toDF().count() == 3)
    } finally srv.stop()
  }

  test("wire shapes: config endpoint, error envelope, spec paths") {
    withServer { (srv, c) =>
      // raw HTTP against the spec paths (no client sugar)
      val http = java.net.http.HttpClient.newHttpClient()
      def get(path: String): java.net.http.HttpResponse[String] =
        http.send(java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"${srv.uri}$path")).GET().build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
      val cfg = get("/v1/config")
      assert(cfg.statusCode() == 200)
      assert(cfg.body().contains("\"defaults\"") && cfg.body().contains("\"overrides\""))
      val nf = get("/v1/namespaces/nope/tables/ghost")
      assert(nf.statusCode() == 404)
      val err = new com.fasterxml.jackson.databind.ObjectMapper().readTree(nf.body())
      assert(err.get("error").get("type").asText() == "NoSuchTableException")
      assert(err.get("error").get("code").asInt() == 404)
      assert(c.listNamespaces().isEmpty)
    }
  }

  test("multi-table transaction: atomic commit, any requirement failure rolls back both") {
    withServer { (_, c) =>
      c.createNamespace(Seq("lake"))
      val region = spark.read.parquet(s"$sf/region.parquet")
      c.createTable(Seq("lake"), "a", region.schema)
      c.createTable(Seq("lake"), "b", region.schema)
      val ta = c.table(spark, Seq("lake"), "a"); ta.append(region)
      val tb = c.table(spark, Seq("lake"), "b"); tb.append(region.limit(2))
      val (baseA, baseB) = (ta.meta, tb.meta)

      // happy path: both property updates land as ONE transaction
      c.commitTransaction(Seq(
        c.TxChange(Seq("lake"), "a", baseA, Some(baseA.copy(
          version = baseA.version + 1,
          properties = baseA.properties + ("tx.mark" -> "yes")))),
        c.TxChange(Seq("lake"), "b", baseB, Some(baseB.copy(
          version = baseB.version + 1,
          properties = baseB.properties + ("tx.mark" -> "yes"))))))
      val (ma, mb) = (c.loadTable(Seq("lake"), "a").metadata,
        c.loadTable(Seq("lake"), "b").metadata)
      assert(ma.properties.get("tx.mark").contains("yes"))
      assert(mb.properties.get("tx.mark").contains("yes"))

      // a STALE base on table a (requirement failure) must refuse the
      // whole transaction: b keeps its version, nothing published
      val freshB = mb
      val e = intercept[java.util.ConcurrentModificationException](
        c.commitTransaction(Seq(
          c.TxChange(Seq("lake"), "a", baseA, Some(baseA.copy(
            version = baseA.version + 1,
            properties = baseA.properties + ("tx.mark2" -> "no")))),
          c.TxChange(Seq("lake"), "b", freshB, Some(freshB.copy(
            version = freshB.version + 1,
            properties = freshB.properties + ("tx.mark2" -> "no")))))))
      assert(e.getMessage.contains("lake.a"))
      assert(c.loadTable(Seq("lake"), "a").metadata.version == ma.version,
        "failed transaction must not advance table a")
      assert(c.loadTable(Seq("lake"), "b").metadata.version == mb.version,
        "failed transaction must not advance table b either (atomicity)")
      assert(!c.loadTable(Seq("lake"), "b").metadata.properties.contains("tx.mark2"))

      // assertion-only member: commit to b ONLY IF a is unmoved — first
      // passes, then a moves and the same shape refuses cleanly
      val mb2 = c.loadTable(Seq("lake"), "b").metadata
      c.commitTransaction(Seq(
        c.TxChange(Seq("lake"), "a", ma, None),
        c.TxChange(Seq("lake"), "b", mb2, Some(mb2.copy(
          version = mb2.version + 1,
          properties = mb2.properties + ("guarded" -> "1"))))))
      assert(c.loadTable(Seq("lake"), "a").metadata.version == ma.version,
        "assertion-only member must not publish a version")
      assert(c.loadTable(Seq("lake"), "b").metadata.properties.get("guarded").contains("1"))
      ta.append(region.limit(1)) // a moves
      val mb3 = c.loadTable(Seq("lake"), "b").metadata
      intercept[java.util.ConcurrentModificationException](
        c.commitTransaction(Seq(
          c.TxChange(Seq("lake"), "a", ma, None),
          c.TxChange(Seq("lake"), "b", mb3, Some(mb3.copy(
            version = mb3.version + 1,
            properties = mb3.properties + ("guarded" -> "2")))))))
      assert(c.loadTable(Seq("lake"), "b").metadata.properties.get("guarded").contains("1"))
    }
  }

  test("replicator over transactions: replica applies only while the source holds still") {
    withServer { (_, c) =>
      import spark.implicits._
      c.createNamespace(Seq("lake"))
      val srcLoc = tmp() + "/src"
      val repLoc = tmp() + "/rep"
      val orders = spark.read.parquet(s"$sf/orders.parquet").limit(100)
      val src = GraftTable.createAs(spark, srcLoc, orders)
      val rep = TableReplicator.create(spark, repLoc, src, Seq("o_orderkey"))
      c.registerTable(Seq("lake"), "src", s"$srcLoc/metadata/v${src.meta.version}.metadata.json")
      c.registerTable(Seq("lake"), "rep", s"$repLoc/metadata/v${rep.meta.version}.metadata.json")
      // two source commits, then a transactional sync: each replica
      // commit rides a transaction asserting the source never moved
      src.append(orders.limit(10).withColumn("o_orderkey", $"o_orderkey" + 1000000L))
      src.delete("o_orderkey <= 5")
      val applied = TableReplicator.syncTransactional(spark, repLoc, c,
        Seq("lake"), "src", Seq("lake"), "rep")
      assert(applied == 2)
      assert(GraftTable.load(spark, repLoc).toDF().count() == src.toDF().count())
      // stale source assertion → the whole transaction refuses, replica
      // version does not move (the mid-sync source-writer race, replayed
      // deterministically through the same wire shape)
      val staleSrc = src.meta
      src.append(orders.limit(1).withColumn("o_orderkey", $"o_orderkey" + 2000000L))
      val repM = GraftTable.load(spark, repLoc).meta
      intercept[java.util.ConcurrentModificationException](
        c.commitTransaction(Seq(
          c.TxChange(Seq("lake"), "src", staleSrc, None),
          c.TxChange(Seq("lake"), "rep", repM, Some(repM.copy(
            version = repM.version + 1,
            properties = repM.properties + ("should" -> "not-land")))))))
      assert(GraftTable.load(spark, repLoc).meta.version == repM.version)
      // and the NEXT transactional sync catches the replica up
      assert(TableReplicator.syncTransactional(spark, repLoc, c,
        Seq("lake"), "src", Seq("lake"), "rep") == 1)
      assert(GraftTable.load(spark, repLoc).toDF().count() == src.toDF().count())
    }
  }

  test("malformed set-snapshot-ref commit gets a spec 400, not an opaque 500") {
    withServer { (srv, c) =>
      c.createNamespace(Seq("lake"))
      c.createTable(Seq("lake"), "t", StructType(Seq(StructField("a", IntegerType))))
      val http = java.net.http.HttpClient.newHttpClient()
      def post(path: String, body: String): java.net.http.HttpResponse[String] =
        http.send(java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"${srv.uri}$path"))
          .header("Content-Type", "application/json")
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      // missing snapshot-id on a non-main ref; then a null type
      for (bad <- Seq(
          """{"requirements": [], "updates": [
            |  {"action": "set-snapshot-ref", "ref-name": "audit", "type": "branch"}]}""".stripMargin,
          """{"requirements": [], "updates": [
            |  {"action": "set-snapshot-ref", "ref-name": "audit", "type": null, "snapshot-id": 1}]}""".stripMargin)) {
        val resp = post("/v1/namespaces/lake/tables/t", bad)
        assert(resp.statusCode() == 400, s"got ${resp.statusCode()}: ${resp.body()}")
        val e = mapper.readTree(resp.body()).get("error")
        assert(e.get("type").asText() == "BadRequestException")
        assert(e.get("message").asText().contains("set-snapshot-ref"))
      }
    }
  }
}
