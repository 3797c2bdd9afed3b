package graft.catalog

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.tables._
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.types.{DataType, StructType}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap

/** A from-scratch Iceberg-REST-catalog-protocol server (public spec:
  * apache/iceberg `rest-catalog-open-api.yaml`) arbitrating graft tables —
  * the catalog leg of the reference's integration story
  * (pyspark-iceberg/interoperability.md:5: "For full integration ... Spark
  * needs to register a catalog"): engines DISCOVER tables through the
  * catalog (`loadTable` returns the current metadata location; data and
  * metadata files stay on shared storage) and COMMIT through it
  * (requirements/updates CAS — [[MetaDiff]]), instead of racing on
  * filesystem rename.
  *
  * Endpoints (prefix-less `/v1/...` paths, namespaces single-level or
  * `%1F`-joined per the spec):
  *  - `GET  /v1/config`
  *  - `GET|POST /v1/namespaces`, `GET|DELETE /v1/namespaces/{ns}`
  *  - `GET|POST /v1/namespaces/{ns}/tables` (list / create)
  *  - `POST /v1/namespaces/{ns}/register` (adopt an existing graft table)
  *  - `GET|HEAD|DELETE|POST /v1/namespaces/{ns}/tables/{t}` (load /
  *    exists / drop / commit)
  *  - `POST /v1/tables/rename`
  *
  * Commit maps onto graft's existing version-file CAS: the server
  * validates the request's requirements against the CURRENT metadata,
  * applies the update list, and publishes `v{N+1}.metadata.json` through
  * [[MetaIO.commitMeta]] — per-table serialization makes the catalog the
  * single commit arbiter (the HadoopTableOperations → catalog upgrade
  * Iceberg itself prescribes for object stores, where rename is not
  * atomic and a filesystem CAS cannot exist). Requirement violations and
  * CAS losses surface as 409 `CommitFailedException`, which clients treat
  * exactly like the native CAS conflict: reload, rebase, retry.
  *
  * Scale posture: the server touches METADATA only — requests are O(bytes
  * of metadata.json), never data IO; a commit is one read + one write of
  * a metadata file. Registry state (namespaces + name → location) persists
  * to `catalog.json` under the warehouse so a restarted server recovers.
  */
class RestCatalogServer(val warehouse: String,
    conf: Configuration = new Configuration(), port: Int = 0,
    bearerToken: Option[String] = None,
    icebergDialect: Boolean = false,
    icebergScanExporter: Option[org.apache.spark.sql.SparkSession] = None) {
  private val mapper = new ObjectMapper()

  // registry: namespace -> (table name -> location); namespace props;
  // views get their own name -> location map (the spec keeps table and
  // view identifiers in separate listings; a name may exist in both)
  private val namespaces = new ConcurrentHashMap[String, java.util.Map[String, String]]()
  private val tables = new ConcurrentHashMap[String, java.util.Map[String, String]]()
  private val views = new ConcurrentHashMap[String, java.util.Map[String, String]]()
  private val registryLock = new Object
  private val tableLocks = new ConcurrentHashMap[String, Object]()

  private val catalogFile = s"$warehouse/catalog.json"
  loadRegistry()

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  server.createContext("/", (ex: HttpExchange) => route(ex))
  // daemon workers: a leaked (or long-lived) catalog must never keep the
  // host JVM alive past main — stop() also drains the pool explicitly
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(8,
    (r: Runnable) => {
      val t = new Thread(r, "graft-rest-catalog")
      t.setDaemon(true)
      t
    })
  server.setExecutor(pool)
  server.start()

  def boundPort: Int = server.getAddress.getPort
  def uri: String = s"http://127.0.0.1:$boundPort"
  def stop(): Unit = { server.stop(0); pool.shutdown() }

  // --------------------------------------------------------- registry

  private def loadRegistry(): Unit = registryLock.synchronized {
    if (MetaIO.exists(conf, catalogFile)) {
      val root = mapper.readTree(MetaIO.readString(conf, catalogFile))
      root.get("namespaces").fieldNames().forEachRemaining { ns =>
        val props = new java.util.concurrent.ConcurrentHashMap[String, String]()
        val pn = root.get("namespaces").get(ns)
        pn.fieldNames().forEachRemaining(k => props.put(k, pn.get(k).asText()))
        namespaces.put(ns, props)
      }
      root.get("tables").fieldNames().forEachRemaining { ns =>
        val m = new java.util.concurrent.ConcurrentHashMap[String, String]()
        val tn = root.get("tables").get(ns)
        tn.fieldNames().forEachRemaining(k => m.put(k, tn.get(k).asText()))
        tables.put(ns, m)
      }
      // registries written before views existed have no "views" node
      Option(root.get("views")).filterNot(_.isNull).foreach { vroot =>
        vroot.fieldNames().forEachRemaining { ns =>
          val m = new java.util.concurrent.ConcurrentHashMap[String, String]()
          val vn = vroot.get(ns)
          vn.fieldNames().forEachRemaining(k => m.put(k, vn.get(k).asText()))
          views.put(ns, m)
        }
      }
    }
  }

  private def saveRegistry(): Unit = registryLock.synchronized {
    val root = mapper.createObjectNode()
    val nsNode = root.putObject("namespaces")
    namespaces.forEach { (ns, props) =>
      val o = nsNode.putObject(ns)
      props.forEach((k, v) => { o.put(k, v); () })
    }
    val tNode = root.putObject("tables")
    tables.forEach { (ns, m) =>
      val o = tNode.putObject(ns)
      m.forEach((k, v) => { o.put(k, v); () })
    }
    val vNode = root.putObject("views")
    views.forEach { (ns, m) =>
      val o = vNode.putObject(ns)
      m.forEach((k, v) => { o.put(k, v); () })
    }
    MetaIO.writeStringAtomic(conf, catalogFile,
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root))
  }

  // ---------------------------------------------------------- routing

  private def route(ex: HttpExchange): Unit = {
    try {
      // static bearer auth (the spec's `token` credential shape): when
      // the server declares a token, every request must present it
      bearerToken.foreach { tok =>
        val auth = Option(ex.getRequestHeaders.getFirst("Authorization"))
        if (!auth.contains(s"Bearer $tok"))
          return error(ex, 401, "NotAuthorizedException", "missing or bad bearer token")
      }
      // getRawPath keeps percent-escapes intact so names containing '/'
      // or '%' can't shift segment boundaries; each segment then decodes
      // exactly once, percent-style (a literal '+' is a plus, not a
      // space — URLDecoder alone would form-decode it)
      val segs = ex.getRequestURI.getRawPath.split("/").filter(_.nonEmpty).toSeq
        .map(s => java.net.URLDecoder.decode(s.replace("+", "%2B"), "UTF-8"))
      val method = ex.getRequestMethod
      (method, segs) match {
        case ("GET", Seq("v1", "config")) =>
          val o = mapper.createObjectNode()
          o.putObject("defaults"); o.putObject("overrides")
          json(ex, 200, o)
        case ("GET", Seq("v1", "namespaces")) => listNamespaces(ex)
        case ("POST", Seq("v1", "namespaces")) => createNamespace(ex)
        case ("GET", Seq("v1", "namespaces", ns)) => getNamespace(ex, ns)
        case ("DELETE", Seq("v1", "namespaces", ns)) => dropNamespace(ex, ns)
        case ("GET", Seq("v1", "namespaces", ns, "tables")) => listTables(ex, ns)
        case ("POST", Seq("v1", "namespaces", ns, "tables")) => createTable(ex, ns)
        case ("POST", Seq("v1", "namespaces", ns, "register")) => registerTable(ex, ns)
        case ("GET", Seq("v1", "namespaces", ns, "tables", t)) => loadTable(ex, ns, t)
        case ("HEAD", Seq("v1", "namespaces", ns, "tables", t)) =>
          if (locationOf(ns, t).isDefined) { ex.sendResponseHeaders(204, -1); ex.close() }
          else error(ex, 404, "NoSuchTableException", s"table $ns.$t not found")
        case ("DELETE", Seq("v1", "namespaces", ns, "tables", t)) => dropTable(ex, ns, t)
        case ("POST", Seq("v1", "namespaces", ns, "tables", t)) => commitTable(ex, ns, t)
        case ("POST", Seq("v1", "namespaces", ns, "tables", t, "metrics")) =>
          // spec: engines report scan metrics here; accepted and dropped
          if (locationOf(ns, t).isEmpty)
            error(ex, 404, "NoSuchTableException", s"table $ns.$t not found")
          else { body(ex); ex.sendResponseHeaders(204, -1); ex.close() }
        case ("POST", Seq("v1", "tables", "rename")) => renameTable(ex)
        case ("GET", Seq("v1", "namespaces", ns, "views")) => listViews(ex, ns)
        case ("POST", Seq("v1", "namespaces", ns, "views")) => createView(ex, ns)
        case ("GET", Seq("v1", "namespaces", ns, "views", v)) => loadView(ex, ns, v)
        case ("HEAD", Seq("v1", "namespaces", ns, "views", v)) =>
          if (viewLocationOf(ns, v).isDefined) { ex.sendResponseHeaders(204, -1); ex.close() }
          else error(ex, 404, "NoSuchViewException", s"view $ns.$v not found")
        case ("DELETE", Seq("v1", "namespaces", ns, "views", v)) => dropView(ex, ns, v)
        case ("POST", Seq("v1", "namespaces", ns, "views", v)) => commitView(ex, ns, v)
        case ("POST", Seq("v1", "views", "rename")) => renameView(ex)
        case ("POST", Seq("v1", "transactions", "commit")) => commitTransaction(ex)
        case _ =>
          error(ex, 404, "NotFoundException", s"$method ${ex.getRequestURI.getPath}")
      }
    } catch {
      case e: Exception =>
        try error(ex, 500, "InternalServerError", String.valueOf(e.getMessage))
        catch { case _: Exception => () }
    }
  }

  private def body(ex: HttpExchange): JsonNode =
    mapper.readTree(new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))

  private def json(ex: HttpExchange, code: Int, node: JsonNode): Unit = {
    val bytes = mapper.writeValueAsString(node).getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  /** Spec error envelope: `{"error": {message, type, code}}`. */
  private def error(ex: HttpExchange, code: Int, typ: String, msg: String): Unit = {
    val o = mapper.createObjectNode()
    val e = o.putObject("error")
    e.put("message", msg); e.put("type", typ); e.put("code", code)
    json(ex, code, o)
  }

  // the spec's multi-level namespace separator (unit separator, %1F)
  private val NsSep = '\u001f'

  private def nsParts(ns: String): Seq[String] = ns.split(NsSep).toSeq

  private def locationOf(ns: String, t: String): Option[String] =
    Option(tables.get(ns)).flatMap(m => Option(m.get(t)))

  // ------------------------------------------------------- namespaces

  /** Spec pagination: `pageSize` caps a response, `next-page-token`
    * carries the resume point (the last name served — names sort, so the
    * token stays valid under concurrent create/drop).
    */
  private def page(ex: HttpExchange, names: Seq[String]): (Seq[String], Option[String]) = {
    val params = Option(ex.getRequestURI.getRawQuery).toSeq
      .flatMap(_.split("&")).flatMap(_.split("=", 2) match {
        case Array(k, v) => Some(k -> java.net.URLDecoder.decode(v, "UTF-8"))
        case _ => None
      }).toMap
    val after = params.get("pageToken").map(t => names.filter(_ > t)).getOrElse(names)
    // non-positive pageSize is not a valid cap (an empty page with no
    // token would read as "nothing exists") — ignored like a bad token
    params.get("pageSize").flatMap(s => scala.util.Try(s.toInt).toOption) match {
      case Some(n) if n > 0 && after.size > n =>
        (after.take(n), after.take(n).lastOption)
      case _ => (after, None)
    }
  }

  private def listNamespaces(ex: HttpExchange): Unit = {
    val o = mapper.createObjectNode()
    import scala.jdk.CollectionConverters._
    val (names, token) = page(ex, namespaces.keySet().asScala.toSeq.sorted)
    val arr = o.putArray("namespaces")
    names.foreach { ns => val a = arr.addArray(); nsParts(ns).foreach(a.add) }
    token.foreach(o.put("next-page-token", _))
    json(ex, 200, o)
  }

  private def createNamespace(ex: HttpExchange): Unit = {
    val b = body(ex)
    val parts = Seq.newBuilder[String]
    b.get("namespace").forEach(n => { parts += n.asText(); () })
    val ns = parts.result().mkString(NsSep.toString)
    registryLock.synchronized {
      if (namespaces.containsKey(ns))
        return error(ex, 409, "AlreadyExistsException", s"namespace $ns exists")
      val props = new java.util.concurrent.ConcurrentHashMap[String, String]()
      Option(b.get("properties")).foreach(p =>
        p.fieldNames().forEachRemaining(k => props.put(k, p.get(k).asText())))
      namespaces.put(ns, props)
      tables.putIfAbsent(ns, new java.util.concurrent.ConcurrentHashMap[String, String]())
      saveRegistry()
    }
    val o = mapper.createObjectNode()
    val a = o.putArray("namespace"); nsParts(ns).foreach(a.add)
    o.putObject("properties")
    json(ex, 200, o)
  }

  private def getNamespace(ex: HttpExchange, ns: String): Unit =
    Option(namespaces.get(ns)) match {
      case None => error(ex, 404, "NoSuchNamespaceException", s"namespace $ns not found")
      case Some(props) =>
        val o = mapper.createObjectNode()
        val a = o.putArray("namespace"); nsParts(ns).foreach(a.add)
        val p = o.putObject("properties")
        props.forEach((k, v) => { p.put(k, v); () })
        json(ex, 200, o)
    }

  private def dropNamespace(ex: HttpExchange, ns: String): Unit =
    registryLock.synchronized {
      if (!namespaces.containsKey(ns))
        error(ex, 404, "NoSuchNamespaceException", s"namespace $ns not found")
      else if (!Option(tables.get(ns)).forall(_.isEmpty))
        error(ex, 409, "NamespaceNotEmptyException", s"namespace $ns has tables")
      else if (!Option(views.get(ns)).forall(_.isEmpty))
        error(ex, 409, "NamespaceNotEmptyException", s"namespace $ns has views")
      else {
        namespaces.remove(ns); tables.remove(ns); views.remove(ns); saveRegistry()
        ex.sendResponseHeaders(204, -1); ex.close()
      }
    }

  // ----------------------------------------------------------- tables

  private def listTables(ex: HttpExchange, ns: String): Unit = {
    if (!namespaces.containsKey(ns))
      return error(ex, 404, "NoSuchNamespaceException", s"namespace $ns not found")
    val o = mapper.createObjectNode()
    import scala.jdk.CollectionConverters._
    val all = Option(tables.get(ns)).map(_.keySet().asScala.toSeq.sorted)
      .getOrElse(Nil)
    val (names, token) = page(ex, all)
    val arr = o.putArray("identifiers")
    names.foreach { t =>
      val id = arr.addObject()
      val a = id.putArray("namespace"); nsParts(ns).foreach(a.add)
      id.put("name", t)
    }
    token.foreach(o.put("next-page-token", _))
    json(ex, 200, o)
  }

  /** Which metadata vocabulary a response carries. Spec-conformant
    * foreign clients send no extra headers and get the CONFIGURED
    * dialect (construct with `icebergDialect = true` to serve stock
    * Iceberg clients); graft's own client pins its dialect per-request
    * via the `X-Graft-Metadata-Dialect` extension header, so one server
    * can arbitrate both client populations.
    */
  private def wantIceberg(ex: HttpExchange): Boolean =
    Option(ex.getRequestHeaders.getFirst("X-Graft-Metadata-Dialect")) match {
      case Some(d) => d.equalsIgnoreCase("iceberg")
      case None => icebergDialect
    }

  // location -> (version, metadata-location, document): at most ONE
  // cached export per location (the newest seen), so a long-lived server
  // over actively-committed tables holds O(tables) memory, not
  // O(commits) — old-version entries would never be requested again
  // (loads always resolve the current version) but used to accumulate
  // forever. Replacement is version-monotonic, so a commit racing the
  // export can never regress the cache to an older document.
  private val icebergCache =
    new ConcurrentHashMap[String, (Int, String, String)]()

  /** LoadTableResult in the Iceberg vocabulary: the metadata document is
    * [[IcebergExport]]'s translation of the CURRENT version, written
    * beside the native metadata so `metadata-location` resolves to a
    * real file. With a SparkSession configured, the export is the FULL
    * binary artifact (real Avro manifest lists — a stock engine can scan
    * it end-to-end); without one, the metadata-only translation (all
    * catalog surfaces — schemas, specs, snapshots, refs — conformant,
    * manifest format declared `json`). Exports are cached per immutable
    * (location, version); serving a cached load is O(metadata bytes)
    * with no Spark on the path.
    */
  private def icebergLoadResult(loc: String): ObjectNode = {
    val v = MetaIO.currentVersion(conf, loc).getOrElse(
      throw new IllegalStateException(s"no metadata at $loc"))
    val (_, metaLoc, json) = Option(icebergCache.get(loc))
      .filter(_._1 >= v).getOrElse {
      val built = icebergScanExporter.flatMap { spark =>
        try {
          val t = graft.tables.GraftTable.load(spark, loc)
          // a commit may land between the version read and the load;
          // export what was actually loaded and cache under ITS version
          val ver = t.meta.version
          val json = IcebergExport.exportBinary(t,
            s"${MetaIO.metadataDir(loc)}/iceberg/v$ver",
            formatVersion = 2)
          Some((ver, s"${MetaIO.metadataDir(loc)}/iceberg/v$ver/metadata.json", json))
        } catch {
          // unrepresentable states (pending predicate deletes) fall back
          // to the metadata-only translation below
          case _: IllegalStateException => None
        }
      }.getOrElse {
        val m = MetaIO.loadMeta(conf, loc)
        val json = IcebergExport.metadataJson(m, conf, formatVersion = 2)
        val p = s"${MetaIO.metadataDir(loc)}/iceberg/v${m.version}/metadata.json"
        MetaIO.writeStringAtomic(conf, p, json)
        (m.version, p, json)
      }
      icebergCache.merge(loc, built,
        (old, nw) => if (nw._1 >= old._1) nw else old)
      built
    }
    val o = mapper.createObjectNode()
    o.put("metadata-location", metaLoc)
    o.set[ObjectNode]("metadata",
      mapper.readTree(json).asInstanceOf[ObjectNode])
    o.putObject("config")
    o
  }

  private def loadTableResult(ex: HttpExchange, ns: String, t: String,
      loc: String): ObjectNode = {
    if (wantIceberg(ex)) return icebergLoadResult(loc)
    val v = MetaIO.currentVersion(conf, loc).getOrElse(
      throw new IllegalStateException(s"no metadata at $loc"))
    val o = mapper.createObjectNode()
    o.put("metadata-location", MetaIO.metadataPath(loc, v))
    o.set[ObjectNode]("metadata",
      mapper.readTree(MetaIO.readString(conf, MetaIO.metadataPath(loc, v)))
        .asInstanceOf[ObjectNode])
    o.putObject("config")
    o
  }

  private def createTable(ex: HttpExchange, ns: String): Unit = {
    if (!namespaces.containsKey(ns))
      return error(ex, 404, "NoSuchNamespaceException", s"namespace $ns not found")
    val b = body(ex)
    val name = b.get("name").asText()
    val loc = Option(b.get("location")).filterNot(_.isNull).map(_.asText())
      .getOrElse(s"$warehouse/${nsParts(ns).mkString("/")}/$name")
    registryLock.synchronized {
      if (locationOf(ns, name).isDefined)
        return error(ex, 409, "AlreadyExistsException", s"table $ns.$name exists")
      val schema = DataType.fromJson(b.get("schema").toString).asInstanceOf[StructType]
      val fields = Seq.newBuilder[PartitionField]
      Option(b.get("partition-spec")).filterNot(_.isNull).foreach(_.forEach { fo =>
        fields += PartitionField(fo.get("source-id").asText(),
          fo.get("transform").asText(), fo.get("name").asText())
      })
      val props = Map.newBuilder[String, String]
      Option(b.get("properties")).filterNot(_.isNull).foreach(p =>
        p.fieldNames().forEachRemaining(k => props += k -> p.get(k).asText()))
      if (MetaIO.currentVersion(conf, loc).isDefined)
        return error(ex, 409, "AlreadyExistsException", s"metadata exists at $loc")
      MetaIO.commitMeta(conf, TableMeta(loc, 1, schema,
        Seq(PartitionSpec(0, fields.result())), 0, Nil, None, props.result()))
      tables.computeIfAbsent(ns, _ =>
        new java.util.concurrent.ConcurrentHashMap[String, String]()).put(name, loc)
      saveRegistry()
    }
    json(ex, 200, loadTableResult(ex, ns, name, loc))
  }

  private def registerTable(ex: HttpExchange, ns: String): Unit = {
    if (!namespaces.containsKey(ns))
      return error(ex, 404, "NoSuchNamespaceException", s"namespace $ns not found")
    val b = body(ex)
    val name = b.get("name").asText()
    // metadata-location per spec; the table dir is its grandparent
    // (…/metadata/vN.metadata.json)
    val metaLoc = b.get("metadata-location").asText()
    val loc = new org.apache.hadoop.fs.Path(metaLoc).getParent.getParent.toString
    registryLock.synchronized {
      if (locationOf(ns, name).isDefined)
        return error(ex, 409, "AlreadyExistsException", s"table $ns.$name exists")
      if (MetaIO.currentVersion(conf, loc).isEmpty)
        return error(ex, 404, "NoSuchTableException", s"no graft metadata at $loc")
      tables.computeIfAbsent(ns, _ =>
        new java.util.concurrent.ConcurrentHashMap[String, String]()).put(name, loc)
      saveRegistry()
    }
    json(ex, 200, loadTableResult(ex, ns, name, loc))
  }

  private def loadTable(ex: HttpExchange, ns: String, t: String): Unit =
    locationOf(ns, t) match {
      case None => error(ex, 404, "NoSuchTableException", s"table $ns.$t not found")
      case Some(loc) => json(ex, 200, loadTableResult(ex, ns, t, loc))
    }

  private def dropTable(ex: HttpExchange, ns: String, t: String): Unit =
    registryLock.synchronized {
      locationOf(ns, t) match {
        case None => error(ex, 404, "NoSuchTableException", s"table $ns.$t not found")
        case Some(_) =>
          tables.get(ns).remove(t); saveRegistry()
          ex.sendResponseHeaders(204, -1); ex.close()
      }
    }

  private def renameTable(ex: HttpExchange): Unit = {
    val b = body(ex)
    def ident(n: JsonNode): (String, String) = {
      val parts = Seq.newBuilder[String]
      n.get("namespace").forEach(x => { parts += x.asText(); () })
      (parts.result().mkString(NsSep.toString), n.get("name").asText())
    }
    val (sNs, sName) = ident(b.get("source"))
    val (dNs, dName) = ident(b.get("destination"))
    registryLock.synchronized {
      locationOf(sNs, sName) match {
        case None =>
          error(ex, 404, "NoSuchTableException", s"table $sNs.$sName not found")
        case Some(loc) =>
          if (!namespaces.containsKey(dNs))
            error(ex, 404, "NoSuchNamespaceException", s"namespace $dNs not found")
          else if (locationOf(dNs, dName).isDefined)
            error(ex, 409, "AlreadyExistsException", s"table $dNs.$dName exists")
          else {
            tables.get(sNs).remove(sName)
            tables.computeIfAbsent(dNs, _ =>
              new java.util.concurrent.ConcurrentHashMap[String, String]())
              .put(dName, loc)
            saveRegistry()
            ex.sendResponseHeaders(204, -1); ex.close()
          }
      }
    }
  }

  // ------------------------------------------------------------ views

  private def viewLocationOf(ns: String, v: String): Option[String] =
    Option(views.get(ns)).flatMap(m => Option(m.get(v)))

  private def viewLoadResult(loc: String): ObjectNode = {
    val m = ViewIO.load(conf, loc)
    val o = mapper.createObjectNode()
    o.put("metadata-location", ViewIO.metadataPath(loc, m.version))
    o.set[ObjectNode]("metadata",
      mapper.readTree(ViewIO.toJson(m)).asInstanceOf[ObjectNode])
    o.putObject("config")
    o
  }

  private def listViews(ex: HttpExchange, ns: String): Unit = {
    if (!namespaces.containsKey(ns))
      return error(ex, 404, "NoSuchNamespaceException", s"namespace $ns not found")
    val o = mapper.createObjectNode()
    import scala.jdk.CollectionConverters._
    val all = Option(views.get(ns)).map(_.keySet().asScala.toSeq.sorted)
      .getOrElse(Nil)
    val (names, token) = page(ex, all)
    val arr = o.putArray("identifiers")
    names.foreach { v =>
      val id = arr.addObject()
      val a = id.putArray("namespace"); nsParts(ns).foreach(a.add)
      id.put("name", v)
    }
    token.foreach(o.put("next-page-token", _))
    json(ex, 200, o)
  }

  /** Parse the spec's `view-version` shape (representations +
    * default-namespace + summary); `schema-id` is assigned by the caller
    * (create pins 0; commit resolves the -1 = "last added" sentinel).
    */
  private def parseViewVersion(n: JsonNode, versionId: Int,
      schemaId: Int): ViewVersion = {
    val reps = Seq.newBuilder[ViewRepresentation]
    n.get("representations").forEach(r =>
      reps += ViewRepresentation(r.get("type").asText(), r.get("sql").asText(),
        Option(r.get("dialect")).filterNot(_.isNull).map(_.asText())
          .getOrElse("spark")))
    val dn = Seq.newBuilder[String]
    Option(n.get("default-namespace")).filterNot(_.isNull)
      .foreach(_.forEach(x => { dn += x.asText(); () }))
    val summary = Map.newBuilder[String, String]
    Option(n.get("summary")).filterNot(_.isNull).foreach(s =>
      s.fieldNames().forEachRemaining(k => summary += k -> s.get(k).asText()))
    ViewVersion(versionId, System.currentTimeMillis(), schemaId,
      summary.result(), reps.result(), dn.result())
  }

  private def createView(ex: HttpExchange, ns: String): Unit = {
    if (!namespaces.containsKey(ns))
      return error(ex, 404, "NoSuchNamespaceException", s"namespace $ns not found")
    val b = body(ex)
    val name = b.get("name").asText()
    val loc = Option(b.get("location")).filterNot(_.isNull).map(_.asText())
      .getOrElse(s"$warehouse/${nsParts(ns).mkString("/")}/$name")
    registryLock.synchronized {
      if (viewLocationOf(ns, name).isDefined)
        return error(ex, 409, "AlreadyExistsException", s"view $ns.$name exists")
      if (ViewIO.currentFileVersion(conf, loc).isDefined)
        return error(ex, 409, "AlreadyExistsException", s"view metadata exists at $loc")
      val schema = DataType.fromJson(b.get("schema").toString).asInstanceOf[StructType]
      val vv = parseViewVersion(b.get("view-version"), versionId = 1, schemaId = 0)
      val props = Map.newBuilder[String, String]
      Option(b.get("properties")).filterNot(_.isNull).foreach(p =>
        p.fieldNames().forEachRemaining(k => props += k -> p.get(k).asText()))
      ViewIO.commit(conf, ViewMeta(loc, 1,
        java.util.UUID.randomUUID().toString, 1, Seq(vv),
        Seq((vv.timestampMs, 1)), Map(0 -> schema), props.result()))
      views.computeIfAbsent(ns, _ =>
        new java.util.concurrent.ConcurrentHashMap[String, String]()).put(name, loc)
      saveRegistry()
    }
    json(ex, 200, viewLoadResult(loc))
  }

  private def loadView(ex: HttpExchange, ns: String, v: String): Unit =
    viewLocationOf(ns, v) match {
      case None => error(ex, 404, "NoSuchViewException", s"view $ns.$v not found")
      case Some(loc) => json(ex, 200, viewLoadResult(loc))
    }

  private def dropView(ex: HttpExchange, ns: String, v: String): Unit =
    registryLock.synchronized {
      viewLocationOf(ns, v) match {
        case None => error(ex, 404, "NoSuchViewException", s"view $ns.$v not found")
        case Some(_) =>
          views.get(ns).remove(v); saveRegistry()
          ex.sendResponseHeaders(204, -1); ex.close()
      }
    }

  private def renameView(ex: HttpExchange): Unit = {
    val b = body(ex)
    def ident(n: JsonNode): (String, String) = {
      val parts = Seq.newBuilder[String]
      n.get("namespace").forEach(x => { parts += x.asText(); () })
      (parts.result().mkString(NsSep.toString), n.get("name").asText())
    }
    val (sNs, sName) = ident(b.get("source"))
    val (dNs, dName) = ident(b.get("destination"))
    registryLock.synchronized {
      viewLocationOf(sNs, sName) match {
        case None =>
          error(ex, 404, "NoSuchViewException", s"view $sNs.$sName not found")
        case Some(loc) =>
          if (!namespaces.containsKey(dNs))
            error(ex, 404, "NoSuchNamespaceException", s"namespace $dNs not found")
          else if (viewLocationOf(dNs, dName).isDefined)
            error(ex, 409, "AlreadyExistsException", s"view $dNs.$dName exists")
          else {
            views.get(sNs).remove(sName)
            views.computeIfAbsent(dNs, _ =>
              new java.util.concurrent.ConcurrentHashMap[String, String]())
              .put(dName, loc)
            saveRegistry()
            ex.sendResponseHeaders(204, -1); ex.close()
          }
      }
    }
  }

  /** View commit: `assert-view-uuid` requirement checked against the
    * CURRENT metadata, then spec updates applied — `add-schema`,
    * `add-view-version` (schema-id -1 = last added schema),
    * `set-current-view-version` (-1 = last added version),
    * `set-properties` / `remove-properties` — and the next metadata FILE
    * version published through the shared CAS under the view's lock.
    * Versions are append-only: a redefinition never rewrites history.
    */
  private def commitView(ex: HttpExchange, ns: String, v: String): Unit =
    viewLocationOf(ns, v) match {
      case None => error(ex, 404, "NoSuchViewException", s"view $ns.$v not found")
      case Some(loc) =>
        val lock = tableLocks.computeIfAbsent(s"view:$ns$NsSep$v", _ => new Object)
        lock.synchronized {
          val b = body(ex)
          val cur = ViewIO.load(conf, loc)
          var bad: Option[String] = None
          Option(b.get("requirements")).filterNot(_.isNull).foreach(_.forEach { r =>
            r.get("type").asText() match {
              case "assert-view-uuid" =>
                val want = r.get("uuid").asText()
                if (want != cur.viewUuid && bad.isEmpty)
                  bad = Some(s"requirement failed: view uuid is ${cur.viewUuid}, not $want")
              case other =>
                if (bad.isEmpty) bad = Some(s"unsupported view requirement: $other")
            }
          })
          bad match {
            case Some(msg) => error(ex, 409, "CommitFailedException", msg)
            case None =>
              var m = cur
              var lastSchemaId = -1
              var lastVersionId = -1
              try {
                Option(b.get("updates")).filterNot(_.isNull).foreach(_.forEach { u =>
                  u.get("action").asText() match {
                    case "add-schema" =>
                      val st = DataType.fromJson(u.get("schema").toString)
                        .asInstanceOf[StructType]
                      lastSchemaId = if (m.schemas.isEmpty) 0 else m.schemas.keys.max + 1
                      m = m.copy(schemas = m.schemas + (lastSchemaId -> st))
                    case "add-view-version" =>
                      val nextId = m.versions.map(_.versionId).max + 1
                      val sidRaw = Option(u.get("view-version").get("schema-id"))
                        .filterNot(_.isNull).map(_.asInt()).getOrElse(-1)
                      val sid = if (sidRaw == -1) lastSchemaId else sidRaw
                      require(m.schemas.contains(sid),
                        s"add-view-version references unknown schema $sidRaw")
                      val vv = parseViewVersion(u.get("view-version"), nextId, sid)
                      lastVersionId = nextId
                      m = m.copy(versions = m.versions :+ vv)
                    case "set-current-view-version" =>
                      val idRaw = u.get("view-version-id").asInt()
                      val id = if (idRaw == -1) lastVersionId else idRaw
                      require(m.versions.exists(_.versionId == id),
                        s"set-current-view-version targets unknown version $idRaw")
                      m = m.copy(currentVersionId = id,
                        versionLog = m.versionLog :+ ((System.currentTimeMillis(), id)))
                    case "set-properties" =>
                      val ups = Map.newBuilder[String, String]
                      u.get("updates").fieldNames().forEachRemaining(k =>
                        ups += k -> u.get("updates").get(k).asText())
                      m = m.copy(properties = m.properties ++ ups.result())
                    case "remove-properties" =>
                      val rm = Seq.newBuilder[String]
                      u.get("removals").forEach(x => { rm += x.asText(); () })
                      m = m.copy(properties = m.properties -- rm.result())
                    case other =>
                      throw new IllegalArgumentException(
                        s"unsupported view update action: $other")
                  }
                })
              } catch {
                case e: IllegalArgumentException =>
                  return error(ex, 400, "BadRequestException", e.getMessage)
              }
              try ViewIO.commit(conf, m.copy(version = cur.version + 1))
              catch {
                case e: java.util.ConcurrentModificationException =>
                  return error(ex, 409, "CommitFailedException", e.getMessage)
              }
              json(ex, 200, viewLoadResult(loc))
          }
        }
    }

  // ----------------------------------------------------------- commit

  /** The CAS: requirements checked against the CURRENT metadata, updates
    * applied, the new version published through graft's version-file
    * commit — all under a per-table lock, so the catalog serializes
    * writers (the role interoperability.md assigns to the catalog).
    */
  private def commitTable(ex: HttpExchange, ns: String, t: String): Unit =
    locationOf(ns, t) match {
      case None => error(ex, 404, "NoSuchTableException", s"table $ns.$t not found")
      case Some(loc) =>
        val lock = tableLocks.computeIfAbsent(s"$ns\u001f$t", _ => new Object)
        lock.synchronized {
          val b = body(ex)
          val cur = MetaIO.loadMeta(conf, loc)
          MetaDiff.checkRequirements(cur, b.get("requirements")) match {
            case Some(msg) => error(ex, 409, "CommitFailedException", msg)
            case None =>
              val next =
                try MetaDiff.applyUpdates(cur, b.get("updates"))
                catch {
                  case e: IllegalArgumentException =>
                    return error(ex, 400, "BadRequestException", e.getMessage)
                }
              try MetaIO.commitMeta(conf, next)
              catch {
                case e: java.util.ConcurrentModificationException =>
                  // an out-of-band writer hit the version file directly —
                  // the file CAS stays authoritative even under a catalog
                  return error(ex, 409, "CommitFailedException", e.getMessage)
              }
              json(ex, 200, loadTableResult(ex, ns, t, loc))
          }
        }
    }

  /** The spec's `/v1/transactions/commit` (CommitTransactionRequest):
    * commit several tables' requirements/updates as ONE transaction.
    * Every table's lock is taken (in canonical order — no deadlock with
    * concurrent transactions), then ALL requirements are checked against
    * ALL current metadatas BEFORE anything publishes: a failure on any
    * table refuses the whole transaction with 409 and no table changes.
    * A change with an EMPTY update list is a pure assertion — the
    * cross-table consistency primitive (e.g. "apply to the replica only
    * if the source is still at the snapshot I replayed").
    *
    * Publication is per-table version-file CAS under the held locks;
    * catalog-routed writers are fully serialized, so mid-publish
    * conflicts can only come from OUT-OF-BAND direct-filesystem writers —
    * in that case already-published tables are reverted best-effort (a
    * compensating commit restoring the prior logical state) and the
    * transaction still reports 409.
    */
  private def commitTransaction(ex: HttpExchange): Unit = {
    val b = body(ex)
    val changesNode = Option(b.get("table-changes")).filterNot(_.isNull).getOrElse(
      return error(ex, 400, "BadRequestException", "missing table-changes"))
    case class Change(ns: String, name: String, loc: String,
        reqs: JsonNode, ups: JsonNode)
    val changes = scala.collection.mutable.ListBuffer.empty[Change]
    val it = changesNode.elements()
    while (it.hasNext) {
      val c = it.next()
      val ident = Option(c.get("identifier")).filterNot(_.isNull).getOrElse(
        return error(ex, 400, "BadRequestException", "table change missing identifier"))
      val nsParts = scala.collection.mutable.ListBuffer.empty[String]
      ident.get("namespace").forEach(n => nsParts += n.asText())
      val ns = nsParts.mkString("\u001f")
      val name = ident.get("name").asText()
      locationOf(ns, name) match {
        case None =>
          return error(ex, 404, "NoSuchTableException", s"table $ns.$name not found")
        case Some(loc) =>
          changes += Change(ns, name, loc, c.get("requirements"), c.get("updates"))
      }
    }
    if (changes.isEmpty)
      return error(ex, 400, "BadRequestException", "empty transaction")
    // one lock per distinct table, canonical order
    val lockKeys = changes.map(c => s"${c.ns}\u001f${c.name}").distinct.sorted
    def locked(ks: List[String])(f: => Unit): Unit = ks match {
      case Nil => f
      case k :: rest =>
        tableLocks.computeIfAbsent(k, _ => new Object)
          .synchronized(locked(rest)(f))
    }
    locked(lockKeys.toList) {
      // fold multiple changes to one table in request order; requirements
      // of later changes check against the intermediate state, spec-style
      val state = scala.collection.mutable.LinkedHashMap.empty[String, (TableMeta, Boolean)]
      changes.foreach { c =>
        val (cur, dirty) = state.getOrElseUpdate(c.loc,
          (MetaIO.loadMeta(conf, c.loc), false))
        MetaDiff.checkRequirements(cur, c.reqs) match {
          case Some(msg) =>
            return error(ex, 409, "CommitFailedException", s"${c.ns}.${c.name}: $msg")
          case None => ()
        }
        val hasUpdates = c.ups != null && !c.ups.isNull && c.ups.size() > 0
        if (hasUpdates) {
          val next =
            try MetaDiff.applyUpdates(cur, c.ups)
            catch {
              case e: IllegalArgumentException =>
                return error(ex, 400, "BadRequestException",
                  s"${c.ns}.${c.name}: ${e.getMessage}")
            }
          state(c.loc) = (next, true)
        }
      }
      // all requirements held, all updates applied in memory — publish
      val published = scala.collection.mutable.ListBuffer.empty[(String, TableMeta)]
      state.foreach { case (loc, (next, dirty)) =>
        if (dirty) {
          try {
            MetaIO.commitMeta(conf, next)
            published += loc -> next
          } catch {
            case e: java.util.ConcurrentModificationException =>
              // out-of-band writer raced a member table: compensate the
              // already-published members back to their prior state
              published.reverse.foreach { case (ploc, pm) =>
                val prior = MetaIO.metaFromJson(MetaIO.readString(conf,
                  MetaIO.metadataPath(ploc, pm.version - 1)))
                try MetaIO.commitMeta(conf,
                  prior.copy(version = pm.version + 1))
                catch { case _: Exception => () }
              }
              return error(ex, 409, "CommitFailedException", e.getMessage)
          }
        }
      }
      ex.sendResponseHeaders(204, -1); ex.close()
    }
  }
}
