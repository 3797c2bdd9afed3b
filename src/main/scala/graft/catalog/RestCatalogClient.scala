package graft.catalog

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.tables.{GraftTable, MetaIO, TableMeta}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets

/** Client side of the Iceberg-REST-catalog protocol ([[RestCatalogServer]];
  * public spec: apache/iceberg `rest-catalog-open-api.yaml`): discovery
  * (namespaces, listing, loadTable → metadata location) plus
  * catalog-mediated commits. `table()` returns a [[GraftTable]] whose
  * commits are rerouted through the catalog — each commit becomes a
  * [[MetaDiff]] requirements/updates proposal, and a 409
  * `CommitFailedException` surfaces as the same
  * `ConcurrentModificationException` the native file CAS throws, so the
  * existing append rebase-and-retry loop works unchanged over the wire.
  *
  * Scale posture: one small HTTP round trip per COMMIT (metadata bytes
  * only — data/manifest files go straight to shared storage from the
  * executors, never through the catalog), one per table load. The
  * catalog is not on the per-row path anywhere.
  */
class RestCatalogClient(val baseUri: String, bearerToken: Option[String] = None) {
  private val mapper = new ObjectMapper()
  // connect + per-request timeouts: a hung catalog server must surface as
  // an error the caller can handle, never block every writer's commit
  // (the delegate-routed commit path retries in a loop) indefinitely
  private val http = HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(10))
    .build()
  private val requestTimeout = java.time.Duration.ofSeconds(60)

  class CatalogException(val code: Int, val errorType: String, message: String)
    extends RuntimeException(s"$errorType ($code): $message")

  private def send(method: String, path: String, body: Option[String] = None): JsonNode = {
    val b0 = HttpRequest.newBuilder(URI.create(s"$baseUri$path"))
      .timeout(requestTimeout)
      .header("Content-Type", "application/json")
      // pin the graft-native metadata vocabulary per-request: this client
      // parses TableMeta, so it must keep working against a server that
      // serves stock Iceberg clients by default (icebergDialect = true)
      .header("X-Graft-Metadata-Dialect", "graft")
    val b = bearerToken.fold(b0)(t => b0.header("Authorization", s"Bearer $t"))
    val req = (method match {
      case "GET" => b.GET()
      case "HEAD" => b.method("HEAD", HttpRequest.BodyPublishers.noBody())
      case "DELETE" => b.DELETE()
      case "POST" => b.POST(HttpRequest.BodyPublishers.ofString(
        body.getOrElse("{}"), StandardCharsets.UTF_8))
    }).build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() >= 400) {
      val (typ, msg) =
        try {
          val e = mapper.readTree(resp.body()).get("error")
          (e.get("type").asText(), e.get("message").asText())
        } catch { case _: Exception => ("HttpError", resp.body()) }
      throw new CatalogException(resp.statusCode(), typ, msg)
    }
    if (resp.body() == null || resp.body().isEmpty) mapper.createObjectNode()
    else mapper.readTree(resp.body())
  }

  /** Percent-encode one path segment (URLEncoder is form-style — its
    * '+' means space — so rewrite to the %20 percent form the server's
    * path decode expects).
    */
  private def seg(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8").replace("+", "%20")

  // multi-level namespaces join on the spec's %1F unit separator
  private def nsPath(ns: Seq[String]): String = seg(ns.mkString("\u001f"))

  // -------------------------------------------------------- namespaces

  def createNamespace(ns: Seq[String], properties: Map[String, String] = Map.empty): Unit = {
    val o = mapper.createObjectNode()
    val a = o.putArray("namespace"); ns.foreach(a.add)
    val p = o.putObject("properties")
    properties.foreach { case (k, v) => p.put(k, v) }
    send("POST", "/v1/namespaces", Some(mapper.writeValueAsString(o)))
    ()
  }

  /** Follow `next-page-token` until the listing is exhausted. */
  private def paged(path: String)(consume: JsonNode => Unit): Unit = {
    var token: Option[String] = None
    var more = true
    while (more) {
      val q = token.map(t => s"?pageToken=${seg(t)}").getOrElse("")
      val resp = send("GET", path + q)
      consume(resp)
      token = Option(resp.get("next-page-token")).filterNot(_.isNull).map(_.asText())
      more = token.isDefined
    }
  }

  def listNamespaces(): Seq[Seq[String]] = {
    val out = Seq.newBuilder[Seq[String]]
    paged("/v1/namespaces")(_.get("namespaces").forEach { a =>
      val parts = Seq.newBuilder[String]
      a.forEach(n => { parts += n.asText(); () })
      out += parts.result()
    })
    out.result()
  }

  def dropNamespace(ns: Seq[String]): Unit = {
    send("DELETE", s"/v1/namespaces/${nsPath(ns)}"); ()
  }

  // ------------------------------------------------------------ tables

  def listTables(ns: Seq[String]): Seq[String] = {
    val out = Seq.newBuilder[String]
    paged(s"/v1/namespaces/${nsPath(ns)}/tables")(_.get("identifiers")
      .forEach(id => { out += id.get("name").asText(); () }))
    out.result()
  }

  def tableExists(ns: Seq[String], name: String): Boolean =
    try { send("HEAD", s"/v1/namespaces/${nsPath(ns)}/tables/${seg(name)}"); true }
    catch { case e: CatalogException if e.code == 404 => false }

  /** Create an empty table through the catalog (server writes v1). */
  def createTable(ns: Seq[String], name: String, schema: StructType,
      partitionFields: Seq[(String, String, String)] = Nil,
      properties: Map[String, String] = Map.empty,
      location: Option[String] = None): LoadResult = {
    val o = mapper.createObjectNode()
    o.put("name", name)
    location.foreach(o.put("location", _))
    o.set[JsonNode]("schema", mapper.readTree(schema.json))
    if (partitionFields.nonEmpty) {
      val pa = o.putArray("partition-spec")
      partitionFields.foreach { case (src, transform, fname) =>
        val fo = pa.addObject()
        fo.put("source-id", src); fo.put("transform", transform); fo.put("name", fname)
      }
    }
    val p = o.putObject("properties")
    properties.foreach { case (k, v) => p.put(k, v) }
    LoadResult(send("POST", s"/v1/namespaces/${nsPath(ns)}/tables",
      Some(mapper.writeValueAsString(o))))
  }

  /** Adopt an existing graft table (the spec's `register` endpoint). */
  def registerTable(ns: Seq[String], name: String, metadataLocation: String): LoadResult = {
    val o = mapper.createObjectNode()
    o.put("name", name)
    o.put("metadata-location", metadataLocation)
    LoadResult(send("POST", s"/v1/namespaces/${nsPath(ns)}/register",
      Some(mapper.writeValueAsString(o))))
  }

  def loadTable(ns: Seq[String], name: String): LoadResult =
    LoadResult(send("GET", s"/v1/namespaces/${nsPath(ns)}/tables/${seg(name)}"))

  def dropTable(ns: Seq[String], name: String): Unit = {
    send("DELETE", s"/v1/namespaces/${nsPath(ns)}/tables/${seg(name)}"); ()
  }

  def renameTable(ns: Seq[String], name: String, toNs: Seq[String], toName: String): Unit = {
    val o = mapper.createObjectNode()
    def ident(n: Seq[String], t: String, key: String): Unit = {
      val id = o.putObject(key)
      val a = id.putArray("namespace"); n.foreach(a.add)
      id.put("name", t); ()
    }
    ident(ns, name, "source"); ident(toNs, toName, "destination")
    send("POST", "/v1/tables/rename", Some(mapper.writeValueAsString(o)))
    ()
  }

  case class LoadResult(raw: JsonNode) {
    def metadataLocation: String = raw.get("metadata-location").asText()
    /** Table root: …/metadata/vN.metadata.json → two levels up. */
    def location: String = new org.apache.hadoop.fs.Path(metadataLocation)
      .getParent.getParent.toString
    def metadata: TableMeta = MetaIO.metaFromJson(raw.get("metadata").toString)
  }

  // ------------------------------------------------------------- views

  def listViews(ns: Seq[String]): Seq[String] = {
    val out = Seq.newBuilder[String]
    paged(s"/v1/namespaces/${nsPath(ns)}/views")(_.get("identifiers")
      .forEach(id => { out += id.get("name").asText(); () }))
    out.result()
  }

  def viewExists(ns: Seq[String], name: String): Boolean =
    try { send("HEAD", s"/v1/namespaces/${nsPath(ns)}/views/${seg(name)}"); true }
    catch { case e: CatalogException if e.code == 404 => false }

  private def viewVersionNode(sql: String, dialect: String,
      defaultNamespace: Seq[String], operation: String,
      schemaId: Int): JsonNode = {
    val vv = mapper.createObjectNode()
    vv.put("schema-id", schemaId)
    val s = vv.putObject("summary")
    s.put("engine-name", "graft"); s.put("operation", operation)
    val reps = vv.putArray("representations")
    val r = reps.addObject()
    r.put("type", "sql"); r.put("sql", sql); r.put("dialect", dialect)
    val dn = vv.putArray("default-namespace")
    defaultNamespace.foreach(dn.add)
    vv
  }

  /** Create a versioned SQL view (the spec's CreateViewRequest: name +
    * schema + the first view-version). The schema is the analyzed output
    * schema of `sql` — the engine computes it, the catalog records it.
    */
  def createView(ns: Seq[String], name: String, sql: String,
      schema: StructType, dialect: String = "spark",
      properties: Map[String, String] = Map.empty,
      location: Option[String] = None): ViewLoadResult = {
    val o = mapper.createObjectNode()
    o.put("name", name)
    location.foreach(o.put("location", _))
    o.set[JsonNode]("schema", mapper.readTree(schema.json))
    o.set[JsonNode]("view-version", viewVersionNode(sql, dialect, ns, "create", 0))
    val p = o.putObject("properties")
    properties.foreach { case (k, v) => p.put(k, v) }
    ViewLoadResult(send("POST", s"/v1/namespaces/${nsPath(ns)}/views",
      Some(mapper.writeValueAsString(o))))
  }

  def loadView(ns: Seq[String], name: String): ViewLoadResult =
    ViewLoadResult(send("GET", s"/v1/namespaces/${nsPath(ns)}/views/${seg(name)}"))

  /** Redefine the view: one commit carrying `assert-view-uuid` (against
    * `base` — a concurrent redefinition surfaces as the familiar 409) +
    * add-schema + add-view-version + set-current-view-version(-1). The
    * old definition stays in `versions`, replayable forever.
    */
  def replaceView(ns: Seq[String], name: String, base: ViewMeta, sql: String,
      schema: StructType, dialect: String = "spark"): ViewLoadResult = {
    val o = mapper.createObjectNode()
    val reqs = o.putArray("requirements")
    val r = reqs.addObject()
    r.put("type", "assert-view-uuid"); r.put("uuid", base.viewUuid)
    val ups = o.putArray("updates")
    val addSchema = ups.addObject()
    addSchema.put("action", "add-schema")
    addSchema.set[JsonNode]("schema", mapper.readTree(schema.json))
    val addVersion = ups.addObject()
    addVersion.put("action", "add-view-version")
    addVersion.set[JsonNode]("view-version",
      viewVersionNode(sql, dialect, ns, "replace", -1))
    val setCur = ups.addObject()
    setCur.put("action", "set-current-view-version")
    setCur.put("view-version-id", -1)
    ViewLoadResult(send("POST", s"/v1/namespaces/${nsPath(ns)}/views/${seg(name)}",
      Some(mapper.writeValueAsString(o))))
  }

  def setViewProperties(ns: Seq[String], name: String, base: ViewMeta,
      updates: Map[String, String]): ViewLoadResult = {
    val o = mapper.createObjectNode()
    val reqs = o.putArray("requirements")
    val r = reqs.addObject()
    r.put("type", "assert-view-uuid"); r.put("uuid", base.viewUuid)
    val ups = o.putArray("updates")
    val set = ups.addObject()
    set.put("action", "set-properties")
    val u = set.putObject("updates")
    updates.foreach { case (k, v) => u.put(k, v) }
    ViewLoadResult(send("POST", s"/v1/namespaces/${nsPath(ns)}/views/${seg(name)}",
      Some(mapper.writeValueAsString(o))))
  }

  def dropView(ns: Seq[String], name: String): Unit = {
    send("DELETE", s"/v1/namespaces/${nsPath(ns)}/views/${seg(name)}"); ()
  }

  def renameView(ns: Seq[String], name: String, toNs: Seq[String], toName: String): Unit = {
    val o = mapper.createObjectNode()
    def ident(n: Seq[String], t: String, key: String): Unit = {
      val id = o.putObject(key)
      val a = id.putArray("namespace"); n.foreach(a.add)
      id.put("name", t); ()
    }
    ident(ns, name, "source"); ident(toNs, toName, "destination")
    send("POST", "/v1/views/rename", Some(mapper.writeValueAsString(o)))
    ()
  }

  case class ViewLoadResult(raw: JsonNode) {
    def metadataLocation: String = raw.get("metadata-location").asText()
    def metadata: ViewMeta = ViewIO.viewFromNode(raw.get("metadata"))
  }

  // ----------------------------------------------------------- commit

  /** Propose a (base → next) metadata transition; 409 surfaces as the
    * native CAS's ConcurrentModificationException so retry loops rebase.
    */
  def commit(ns: Seq[String], name: String, base: TableMeta, next: TableMeta): Unit = {
    val proposal = MetaDiff.diff(base, next)
    try {
      send("POST", s"/v1/namespaces/${nsPath(ns)}/tables/${seg(name)}",
        Some(proposal.toJson(Some((ns, name)))))
      ()
    } catch {
      case e: CatalogException if e.code == 409 =>
        throw new java.util.ConcurrentModificationException(
          s"catalog commit conflict for ${ns.mkString(".")}.$name: ${e.getMessage}")
    }
  }

  /** One member of a multi-table transaction: a (base → next) metadata
    * transition, or — with `next` absent — a pure ASSERTION that the
    * table is still at `base` (requirements only, no updates), the
    * cross-table consistency primitive.
    */
  case class TxChange(ns: Seq[String], name: String, base: TableMeta,
      next: Option[TableMeta])

  /** Commit several tables atomically through the spec's
    * `/v1/transactions/commit`: the server checks every member's
    * requirements against current metadata BEFORE publishing anything, so
    * a conflict on any member refuses the whole transaction (409 →
    * ConcurrentModificationException, same as single-table commits).
    */
  def commitTransaction(changes: Seq[TxChange]): Unit = {
    val root = mapper.createObjectNode()
    val arr = root.putArray("table-changes")
    changes.foreach { c =>
      val proposal = c.next match {
        case Some(n) => MetaDiff.diff(c.base, n)
        case None => MetaDiff.diff(c.base, c.base.copy(version = c.base.version + 1))
      }
      val o = arr.addObject()
      val id = o.putObject("identifier")
      val nsArr = id.putArray("namespace"); c.ns.foreach(nsArr.add)
      id.put("name", c.name)
      o.set[com.fasterxml.jackson.databind.node.ObjectNode](
        "requirements", proposal.requirements)
      o.set[com.fasterxml.jackson.databind.node.ObjectNode]("updates",
        if (c.next.isDefined) proposal.updates
        else mapper.createArrayNode())  // assertion-only member
      ()
    }
    try { send("POST", "/v1/transactions/commit", Some(mapper.writeValueAsString(root))); () }
    catch {
      case e: CatalogException if e.code == 409 =>
        throw new java.util.ConcurrentModificationException(
          s"catalog transaction conflict: ${e.getMessage}")
    }
  }

  /** A table handle whose COMMITS go through the catalog: reads resolve
    * the location via `loadTable`, and the commit delegate rebuilds the
    * (base → next) diff from the immutable previous version file — the
    * base a commit was computed from is always `v{N-1}`, which no writer
    * ever mutates.
    */
  def table(spark: SparkSession, ns: Seq[String], name: String): GraftTable =
    attach(spark, ns, name, loadTable(ns, name).location)

  /** Delegate-attached handle for an ALREADY-RESOLVED location (the
    * location of a catalog table is immutable, so a caller that has it —
    * e.g. the SQL facade's per-name cache — skips the loadTable round
    * trip on every subsequent statement).
    */
  def attach(spark: SparkSession, ns: Seq[String], name: String,
      location: String): GraftTable = {
    val t = GraftTable.load(spark, location)
    val conf = spark.sparkContext.hadoopConfiguration
    t.commitDelegate = Some { next =>
      val base = MetaIO.metaFromJson(MetaIO.readString(conf,
        MetaIO.metadataPath(next.location, next.version - 1)))
      commit(ns, name, base, next)
    }
    t
  }
}
