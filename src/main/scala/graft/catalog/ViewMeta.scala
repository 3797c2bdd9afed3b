package graft.catalog

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import graft.tables.MetaIO
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.types.{DataType, StructType}

/** Versioned SQL VIEW metadata — the Iceberg VIEW spec's data model
  * (public spec: apache/iceberg `view-spec`, format-version 1) over
  * graft's metadata-file + CAS publish discipline. A view is a named,
  * VERSIONED query definition: every redefinition appends an immutable
  * [[ViewVersion]] (SQL representations + the schema the definition
  * produced) and moves `current-version-id`; nothing is ever rewritten,
  * so any historical definition stays replayable — the view-level
  * counterpart of table time travel.
  *
  * Scale posture: view metadata is O(versions × definition bytes), pure
  * metadata — loading or committing a view never touches data. Engines
  * resolve a view to its current SQL once per query plan.
  */
case class ViewRepresentation(typ: String, sql: String, dialect: String)

case class ViewVersion(versionId: Int, timestampMs: Long, schemaId: Int,
    summary: Map[String, String], representations: Seq[ViewRepresentation],
    defaultNamespace: Seq[String]) {
  /** The first SQL representation in `dialect`, else the first at all —
    * the spec's resolution order for an engine with one dialect.
    */
  def sqlFor(dialect: String): String =
    representations.find(r => r.typ == "sql" && r.dialect == dialect)
      .orElse(representations.find(_.typ == "sql"))
      .getOrElse(throw new IllegalArgumentException(
        s"view version $versionId has no SQL representation")).sql
}

/** `version` is the metadata FILE version (v1.view.json, v2.view.json, …
  * — the CAS unit), distinct from the view's `currentVersionId` (a
  * pointer into `versions`, which only grows).
  */
case class ViewMeta(location: String, version: Int, viewUuid: String,
    currentVersionId: Int, versions: Seq[ViewVersion],
    versionLog: Seq[(Long, Int)], schemas: Map[Int, StructType],
    properties: Map[String, String]) {
  def currentVersion: ViewVersion = versionAt(currentVersionId)
  def versionAt(id: Int): ViewVersion = versions.find(_.versionId == id)
    .getOrElse(throw new IllegalArgumentException(
      s"no view version $id at $location (have ${versions.map(_.versionId)})"))
  def schemaOf(v: ViewVersion): StructType = schemas.getOrElse(v.schemaId,
    throw new IllegalArgumentException(s"no schema ${v.schemaId} at $location"))
}

/** JSON (spec field names: `view-uuid`, `current-version-id`,
  * `versions[].representations`, `version-log`, …; schemas carry graft's
  * native Spark StructType JSON like table metadata does) + the
  * version-file CAS publish — same primitives, same crash/race story as
  * table commits.
  */
object ViewIO {
  private val mapper = new ObjectMapper()

  def metadataPath(location: String, v: Int): String =
    s"$location/metadata/v$v.view.json"

  private val VersionFile = """v(\d+)\.view\.json""".r

  /** Largest committed view-metadata file version (directory scan — view
    * commits are rare enough that the advisory-hint optimization isn't
    * worth a second file).
    */
  def currentFileVersion(conf: Configuration, location: String): Option[Int] = {
    val dir = new org.apache.hadoop.fs.Path(s"$location/metadata")
    val fs = MetaIO.fs(conf, location)
    if (!fs.exists(dir)) None
    else {
      val vs = fs.listStatus(dir).flatMap(_.getPath.getName match {
        case VersionFile(n) => Some(n.toInt)
        case _ => None
      })
      if (vs.isEmpty) None else Some(vs.max)
    }
  }

  def load(conf: Configuration, location: String): ViewMeta = {
    val v = currentFileVersion(conf, location).getOrElse(
      throw new IllegalStateException(s"no view metadata at $location"))
    fromJson(MetaIO.readString(conf, metadataPath(location, v))).copy(version = v)
  }

  /** Publish `m` as its file version via the shared CAS primitive —
    * exactly one writer wins a given version; losers get the same
    * ConcurrentModificationException the table commit path throws.
    */
  def commit(conf: Configuration, m: ViewMeta): Unit =
    if (!MetaIO.casPublish(conf, metadataPath(m.location, m.version), toJson(m)))
      throw new java.util.ConcurrentModificationException(
        s"view commit conflict at ${m.location}: file version ${m.version} " +
          "was committed by another writer")

  def toJson(m: ViewMeta): String = {
    val root = mapper.createObjectNode()
    root.put("view-uuid", m.viewUuid)
    root.put("format-version", 1)
    root.put("location", m.location)
    root.put("current-version-id", m.currentVersionId)
    val vs = root.putArray("versions")
    m.versions.foreach { v =>
      val o = vs.addObject()
      o.put("version-id", v.versionId)
      o.put("timestamp-ms", v.timestampMs)
      o.put("schema-id", v.schemaId)
      val s = o.putObject("summary")
      v.summary.foreach { case (k, x) => s.put(k, x) }
      val reps = o.putArray("representations")
      v.representations.foreach { r =>
        val ro = reps.addObject()
        ro.put("type", r.typ); ro.put("sql", r.sql); ro.put("dialect", r.dialect)
      }
      val dn = o.putArray("default-namespace")
      v.defaultNamespace.foreach(dn.add)
    }
    val log = root.putArray("version-log")
    m.versionLog.foreach { case (ts, id) =>
      val o = log.addObject()
      o.put("timestamp-ms", ts); o.put("version-id", id)
    }
    val ss = root.putArray("schemas")
    m.schemas.toSeq.sortBy(_._1).foreach { case (id, st) =>
      val o = ss.addObject()
      o.put("schema-id", id)
      o.set[ObjectNode]("fields", mapper.readTree(st.json).asInstanceOf[ObjectNode])
    }
    val ps = root.putObject("properties")
    m.properties.foreach { case (k, v) => ps.put(k, v) }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  def fromJson(json: String): ViewMeta = viewFromNode(mapper.readTree(json))

  def viewFromNode(root: JsonNode): ViewMeta = {
    def strMap(n: JsonNode): Map[String, String] = {
      val b = Map.newBuilder[String, String]
      if (n != null && !n.isNull)
        n.fieldNames().forEachRemaining(k => b += k -> n.get(k).asText())
      b.result()
    }
    val versions = Seq.newBuilder[ViewVersion]
    root.get("versions").forEach { v =>
      val reps = Seq.newBuilder[ViewRepresentation]
      v.get("representations").forEach(r =>
        reps += ViewRepresentation(r.get("type").asText(), r.get("sql").asText(),
          r.get("dialect").asText()))
      val dn = Seq.newBuilder[String]
      Option(v.get("default-namespace")).filterNot(_.isNull)
        .foreach(_.forEach(x => { dn += x.asText(); () }))
      versions += ViewVersion(v.get("version-id").asInt(),
        v.get("timestamp-ms").asLong(), v.get("schema-id").asInt(),
        strMap(v.get("summary")), reps.result(), dn.result())
    }
    val log = Seq.newBuilder[(Long, Int)]
    root.get("version-log").forEach(e =>
      log += ((e.get("timestamp-ms").asLong(), e.get("version-id").asInt())))
    val schemas = Map.newBuilder[Int, StructType]
    root.get("schemas").forEach(s =>
      schemas += s.get("schema-id").asInt() ->
        DataType.fromJson(s.get("fields").toString).asInstanceOf[StructType])
    ViewMeta(root.get("location").asText(),
      // file version is not serialized (it IS the filename); loaders
      // that need it track it beside the parse — default 0 for wire use
      0,
      root.get("view-uuid").asText(),
      root.get("current-version-id").asInt(), versions.result(),
      log.result(), schemas.result(), strMap(root.get("properties")))
  }
}
