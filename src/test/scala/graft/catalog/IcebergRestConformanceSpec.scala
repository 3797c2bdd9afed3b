package graft.catalog

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.SparkSpec
import graft.tables._
import org.apache.spark.sql.functions._
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

/** The foreign-engine leg of the REST catalog: a STOCK Iceberg client
  * (no graft extension headers — the pyiceberg/Java request shape is a
  * plain GET against the OpenAPI paths) must receive a spec-conformant
  * `LoadTableResult` whose `metadata` is an Iceberg v2 TableMetadata
  * document — schemas, partition specs, snapshots, refs, sort orders in
  * the Iceberg vocabulary — with `metadata-location` resolving to a real
  * file and `manifest-list` pointers resolving to real Avro containers a
  * foreign scan can walk. No foreign engine ships in this environment,
  * so the exchange is fixture-pinned against the PUBLIC
  * `rest-catalog-open-api.yaml` + table-spec shapes (the reference's
  * interoperability story: pyspark-iceberg/interoperability.md:1-10 — a
  * foreign engine reads the table; the binary wire format itself is
  * refereed end-to-end by IcebergAvroInteropSpec/t48/t49).
  */
class IcebergRestConformanceSpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new ObjectMapper()
  private val conf = new org.apache.hadoop.conf.Configuration()
  private def tmp(): String = Files.createTempDirectory("graft_irest").toString

  private val http = HttpClient.newHttpClient()
  /** A stock client's request: plain GET, no graft headers. */
  private def stockGet(uri: String, path: String): HttpResponse[String] =
    http.send(HttpRequest.newBuilder(URI.create(s"$uri$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  /** Table with the surfaces the document must carry: identity + derived
    * partitioning, several snapshot operations, a tag and a branch.
    */
  private def buildTable(loc: String): GraftTable = {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_orderdate",
        $"o_totalprice")
    var t = GraftTable.createAs(spark, loc, orders.filter($"o_orderkey" % 3 === 0),
      Seq(PartitionField("o_orderstatus", "identity", "o_orderstatus"),
        PartitionField("o_orderdate", "months", "o_month")))
    t = t.append(orders.filter($"o_orderkey" % 3 === 1))
    val tagAt = t.meta.currentSnapshotId.get
    t = t.createTag("after-second", tagAt)
    t = t.delete("o_orderkey % 10 = 4")
    t = t.createBranch("audit", None)
    t
  }

  private def withIcebergServer[A](scan: Boolean)(
      f: (RestCatalogServer, RestCatalogClient, GraftTable) => A): A = {
    val srv = new RestCatalogServer(tmp(), conf, icebergDialect = true,
      icebergScanExporter = if (scan) Some(spark) else None)
    try {
      val c = new RestCatalogClient(srv.uri)
      c.createNamespace(Seq("lake"))
      val t = buildTable(tmp() + "/orders")
      val metaLoc = MetaIO.metadataPath(t.location,
        MetaIO.currentVersion(conf, t.location).get)
      c.registerTable(Seq("lake"), "orders", metaLoc)
      f(srv, c, t)
    } finally srv.stop()
  }

  private def fieldIds(schema: JsonNode): Seq[Int] = {
    val b = Seq.newBuilder[Int]
    schema.get("fields").forEach(fo => { b += fo.get("id").asInt(); () })
    b.result()
  }

  test("stock GET loadTable returns a spec-conformant Iceberg v2 LoadTableResult") {
    withIcebergServer(scan = true) { (srv, _, t) =>
      // the recorded pyiceberg exchange: config probe, then load
      val cfg = stockGet(srv.uri, "/v1/config")
      assert(cfg.statusCode() == 200)
      val cfgDoc = mapper.readTree(cfg.body())
      assert(cfgDoc.has("defaults") && cfgDoc.has("overrides"))

      val resp = stockGet(srv.uri, "/v1/namespaces/lake/tables/orders")
      assert(resp.statusCode() == 200)
      val lr = mapper.readTree(resp.body())
      // LoadTableResult: metadata-location, metadata, config
      assert(lr.has("metadata-location") && lr.has("metadata") && lr.has("config"))
      val md = lr.get("metadata")

      // ---- TableMetadata required fields (v2) ----
      assert(md.get("format-version").asInt() == 2)
      java.util.UUID.fromString(md.get("table-uuid").asText()) // parses
      assert(md.get("location").asText() == t.location)
      assert(md.get("last-sequence-number").asLong() ==
        t.meta.snapshots.map(_.id).max)
      assert(md.get("last-updated-ms").asLong() ==
        t.meta.snapshots.map(_.timestampMs).max)
      assert(md.get("last-column-id").asInt() == 5)

      // schemas keyed by current-schema-id; field ids 1..N assigned
      val curSchemaId = md.get("current-schema-id").asInt()
      val schemaIds = {
        val b = Seq.newBuilder[Int]
        md.get("schemas").forEach(s => { b += s.get("schema-id").asInt(); () })
        b.result()
      }
      assert(schemaIds.contains(curSchemaId))
      val schema = md.get("schemas").get(0)
      assert(schema.get("type").asText() == "struct")
      assert(fieldIds(schema) == Seq(1, 2, 3, 4, 5))

      // partition-specs keyed by default-spec-id; transforms in the
      // Iceberg vocabulary; source-ids resolve to schema field ids
      val defSpecId = md.get("default-spec-id").asInt()
      var specSeen = false
      md.get("partition-specs").forEach { s =>
        if (s.get("spec-id").asInt() == defSpecId) {
          specSeen = true
          val transforms = Seq.newBuilder[(String, Int, Int)]
          s.get("fields").forEach(fo => {
            transforms += ((fo.get("transform").asText(),
              fo.get("source-id").asInt(), fo.get("field-id").asInt()))
            ()
          })
          val ts = transforms.result()
          assert(ts.map(_._1) == Seq("identity", "month") ||
            ts.map(_._1) == Seq("identity", "months"),
            s"unexpected transforms $ts")
          assert(ts.map(_._3) == Seq(1000, 1001))
          assert(ts.forall(x => fieldIds(schema).contains(x._2)))
        }
      }
      assert(specSeen)
      assert(md.get("last-partition-id").asInt() == 1001)

      // sort orders (v2 required)
      assert(md.get("default-sort-order-id").asInt() == 0)
      assert(md.get("sort-orders").get(0).get("order-id").asInt() == 0)

      // snapshots: current id present, every snapshot spec-shaped,
      // operations restricted to the spec's enum
      val curSnap = md.get("current-snapshot-id").asLong()
      assert(t.meta.currentSnapshotId.contains(curSnap))
      val snapIds = scala.collection.mutable.Set.empty[Long]
      val ops = Seq.newBuilder[String]
      md.get("snapshots").forEach { s =>
        snapIds += s.get("snapshot-id").asLong()
        assert(s.has("sequence-number") && s.has("timestamp-ms"))
        assert(s.has("manifest-list"))
        ops += s.get("summary").get("operation").asText()
      }
      assert(snapIds.contains(curSnap))
      val allowed = Set("append", "replace", "overwrite", "delete")
      assert(ops.result().forall(allowed), ops.result().toString)
      assert(ops.result().contains("append") && ops.result().contains("delete"))

      // snapshot-log entries reference known snapshots
      md.get("snapshot-log").forEach(e =>
        assert(snapIds.contains(e.get("snapshot-id").asLong())))

      // refs: main BRANCH at the current snapshot, plus the tag + branch
      val refs = md.get("refs")
      assert(refs.get("main").get("snapshot-id").asLong() == curSnap)
      assert(refs.get("main").get("type").asText() == "BRANCH")
      assert(refs.get("after-second").get("type").asText() == "TAG")
      assert(refs.get("audit").get("type").asText() == "BRANCH")
      assert(snapIds.contains(refs.get("after-second").get("snapshot-id").asLong()))

      // metadata-location resolves to a real file holding this document
      val metaLoc = lr.get("metadata-location").asText()
      assert(MetaIO.exists(conf, metaLoc))
      assert(mapper.readTree(MetaIO.readString(conf, metaLoc)) == md)

      // manifest-list pointers resolve to REAL Avro containers (the
      // binary wire format a foreign scan walks — refereed in t48/t49)
      md.get("snapshots").forEach { s =>
        val ml = s.get("manifest-list").asText()
        assert(MetaIO.exists(conf, ml), ml)
        val head = java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(new java.net.URI(ml).getPath)).take(4)
        assert(head.sameElements(Array[Byte]('O', 'b', 'j', 1)), ml)
      }
    }
  }

  test("error envelope on a missing table matches the spec shape for stock clients") {
    withIcebergServer(scan = false) { (srv, _, _) =>
      val resp = stockGet(srv.uri, "/v1/namespaces/lake/tables/nope")
      assert(resp.statusCode() == 404)
      val e = mapper.readTree(resp.body()).get("error")
      assert(e.get("type").asText() == "NoSuchTableException")
      assert(e.get("code").asInt() == 404)
    }
  }

  test("one server, two client populations: stock gets Iceberg, graft client stays native") {
    withIcebergServer(scan = true) { (srv, c, t) =>
      // graft's client pins its dialect per-request; commits + loads keep
      // working against the iceberg-default server
      val lr = c.loadTable(Seq("lake"), "orders")
      assert(lr.metadata.currentSnapshotId == t.meta.currentSnapshotId)
      val handle = c.table(spark, Seq("lake"), "orders")
      val before = handle.toDF().count()
      handle.append(spark.read.parquet(s"$sf/orders.parquet")
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_orderdate",
          $"o_totalprice").filter($"o_orderkey" % 3 === 2))
      // the stock view advances with the commit (no stale cache): the new
      // current snapshot appears in the freshly served document
      val t2 = GraftTable.load(spark, t.location)
      val resp = stockGet(srv.uri, "/v1/namespaces/lake/tables/orders")
      val md = mapper.readTree(resp.body()).get("metadata")
      assert(md.get("current-snapshot-id").asLong() ==
        t2.meta.currentSnapshotId.get)
      assert(handle.toDF().count() > before)
    }
  }

  test("without a scan exporter the served document is still spec-shaped, manifests declared json") {
    withIcebergServer(scan = false) { (srv, _, t) =>
      val resp = stockGet(srv.uri, "/v1/namespaces/lake/tables/orders")
      assert(resp.statusCode() == 200, resp.body())
      val md = mapper.readTree(resp.body()).get("metadata")
      assert(md.get("format-version").asInt() == 2)
      assert(md.get("current-schema-id").asInt() == 0)
      assert(md.get("refs").get("main").get("type").asText() == "BRANCH")
      // the honesty boundary: manifest pointers are graft JSON manifests,
      // declared on the document itself
      assert(md.get("properties").get("graft.manifest-format").asText() == "json")
      // and the document still lands at a real metadata-location
      val metaLoc = mapper.readTree(resp.body()).get("metadata-location").asText()
      assert(MetaIO.exists(conf, metaLoc))
      assert(t.meta.currentSnapshotId.isDefined)
    }
  }

  test("per-request override: a graft-default server serves Iceberg on demand") {
    val srv = new RestCatalogServer(tmp(), conf) // graft dialect default
    try {
      val c = new RestCatalogClient(srv.uri)
      c.createNamespace(Seq("lake"))
      val t = buildTable(tmp() + "/orders")
      c.registerTable(Seq("lake"), "orders", MetaIO.metadataPath(t.location,
        MetaIO.currentVersion(conf, t.location).get))
      // stock GET against a graft-default server → graft vocabulary
      val native = mapper.readTree(
        stockGet(srv.uri, "/v1/namespaces/lake/tables/orders").body())
      assert(!native.get("metadata").has("format-version")) // graft doc
      // explicit header flips THIS request to the Iceberg vocabulary
      val resp = http.send(HttpRequest.newBuilder(
        URI.create(s"${srv.uri}/v1/namespaces/lake/tables/orders"))
        .header("X-Graft-Metadata-Dialect", "iceberg").GET().build(),
        HttpResponse.BodyHandlers.ofString())
      val md = mapper.readTree(resp.body()).get("metadata")
      assert(md.get("format-version").asInt() == 2)
    } finally srv.stop()
  }
}
