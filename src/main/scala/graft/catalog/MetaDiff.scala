package graft.catalog

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import graft.tables._
import org.apache.spark.sql.types.{DataType, StructType}

/** Requirements/updates vocabulary for catalog-mediated commits — the
  * Iceberg REST catalog protocol's `CommitTableRequest` model (public
  * spec: apache/iceberg `rest-catalog-open-api.yaml`; cf. reference
  * pyspark-iceberg/interoperability.md:5 — full integration runs table
  * commits through a catalog instead of filesystem CAS).
  *
  * A graft commit is computed client-side as a whole [[TableMeta]]
  * transition (base → next). On the wire it becomes:
  *
  *  - requirements — what must still hold at the server for the commit to
  *    apply: `assert-ref-snapshot-id` on `main` (the spec's optimistic
  *    concurrency primitive) plus graft's stricter `assert-version`
  *    (graft serializes whole-metadata transitions, so ANY interleaved
  *    commit — even a property-only one — must force the client to rebase,
  *    exactly matching the native version-file CAS semantics).
  *  - updates — the spec's granular action list (`add-snapshot`,
  *    `remove-snapshots`, `set-snapshot-ref`, `remove-snapshot-ref`,
  *    `add-schema`, `set-current-schema`, `add-spec`, `set-default-spec`,
  *    `set-properties`, `remove-properties`), with graft's own metadata
  *    vocabulary as the payload encoding (both ends of this protocol are
  *    graft; binary Iceberg interchange is the IcebergExport/Import path).
  *
  * `applyUpdates(base, diff(base, next)) == next` for every commit shape
  * the engine produces — pinned by RestCatalogSpec over a scripted
  * multi-op session.
  */
object MetaDiff {
  private val mapper = new ObjectMapper()

  /** The wire name graft's current-snapshot pointer travels under. Iceberg
    * models "current" AS the `main` branch; graft keeps them separate, so
    * a user ref literally named `main` would shadow the pointer on the
    * wire — refused loudly rather than silently merged.
    */
  val MainRef = "main"

  // ------------------------------------------------------------- diff

  case class CommitProposal(requirements: ArrayNode, updates: ArrayNode) {
    def toJson(identifier: Option[(Seq[String], String)] = None): String = {
      val root = mapper.createObjectNode()
      identifier.foreach { case (ns, name) =>
        val id = root.putObject("identifier")
        val nsArr = id.putArray("namespace")
        ns.foreach(nsArr.add)
        id.put("name", name)
      }
      root.set[ObjectNode]("requirements", requirements)
      root.set[ObjectNode]("updates", updates)
      mapper.writeValueAsString(root)
    }
  }

  def diff(base: TableMeta, next: TableMeta): CommitProposal = {
    require(next.location == base.location,
      s"catalog commit cannot relocate a table: ${base.location} -> ${next.location}")
    require(next.version == base.version + 1,
      s"catalog commit must advance exactly one version: ${base.version} -> ${next.version}")
    require(!base.refs.contains(MainRef) && !next.refs.contains(MainRef),
      "a graft ref named 'main' would shadow the current-snapshot pointer " +
        "on the catalog wire — rename the ref")
    // applyUpdates reproduces `next` under the id-sorted snapshot-list
    // invariant (adds land in id position); refuse loudly if a producer
    // ever hands over an unsorted list instead of round-tripping wrong
    def sorted(ss: Seq[Snapshot]): Boolean =
      ss.iterator.map(_.id).sliding(2).forall(w => w.size < 2 || w(0) < w(1))
    require(sorted(base.snapshots) && sorted(next.snapshots),
      "catalog commit requires id-sorted snapshot lists (engine invariant)")
    val reqs = mapper.createArrayNode()
    val rv = reqs.addObject()
    rv.put("type", "assert-version"); rv.put("version", base.version)
    val rm = reqs.addObject()
    rm.put("type", "assert-ref-snapshot-id"); rm.put("ref", MainRef)
    base.currentSnapshotId match {
      case Some(id) => rm.put("snapshot-id", id)
      case None     => rm.putNull("snapshot-id")
    }

    val ups = mapper.createArrayNode()
    // snapshots: upsert changed/new, remove dropped (expire/orphan ops)
    val baseSnaps = base.snapshots.map(s => s.id -> s).toMap
    val nextIds = next.snapshots.map(_.id).toSet
    val removed = base.snapshots.map(_.id).filterNot(nextIds)
    if (removed.nonEmpty) {
      val o = ups.addObject()
      o.put("action", "remove-snapshots")
      val ids = o.putArray("snapshot-ids")
      removed.foreach(ids.add)
    }
    next.snapshots.filter(s => !baseSnaps.get(s.id).contains(s)).foreach { s =>
      val o = ups.addObject()
      o.put("action", "add-snapshot")
      o.set[ObjectNode]("snapshot", snapshotToNode(s))
    }
    // schema history, then the current pointer (carries the full schema —
    // graft stores the current schema denormalized, and field-metadata
    // changes like column defaults evolve it without a new schema id)
    val baseHist = base.schemasHistory.map(v => v.id -> v.schema).toMap
    next.schemasHistory.filter(v => !baseHist.get(v.id).contains(v.schema))
      .foreach { v =>
        val o = ups.addObject()
        o.put("action", "add-schema")
        o.put("schema-id", v.id)
        o.set[ObjectNode]("schema", schemaToNode(v.schema))
      }
    if (next.schema != base.schema || next.currentSchemaId != base.currentSchemaId) {
      val o = ups.addObject()
      o.put("action", "set-current-schema")
      o.put("schema-id", next.currentSchemaId)
      o.set[ObjectNode]("schema", schemaToNode(next.schema))
    }
    // partition specs
    val baseSpecs = base.specs.map(s => s.specId -> s).toMap
    next.specs.filter(s => !baseSpecs.get(s.specId).contains(s)).foreach { s =>
      val o = ups.addObject()
      o.put("action", "add-spec")
      o.set[ObjectNode]("spec", specToNode(s))
    }
    if (next.currentSpecId != base.currentSpecId) {
      val o = ups.addObject()
      o.put("action", "set-default-spec")
      o.put("spec-id", next.currentSpecId)
    }
    // current-snapshot pointer rides as the main branch
    if (next.currentSnapshotId != base.currentSnapshotId) {
      val o = ups.addObject()
      o.put("action", "set-snapshot-ref")
      o.put("ref-name", MainRef)
      o.put("type", "branch")
      next.currentSnapshotId match {
        case Some(id) => o.put("snapshot-id", id)
        case None     => o.putNull("snapshot-id")
      }
    }
    // named refs (branches/tags)
    base.refs.keys.filterNot(next.refs.contains).foreach { name =>
      val o = ups.addObject()
      o.put("action", "remove-snapshot-ref"); o.put("ref-name", name)
    }
    next.refs.foreach { case (name, r) =>
      if (!base.refs.get(name).contains(r)) {
        val o = ups.addObject()
        o.put("action", "set-snapshot-ref")
        o.put("ref-name", name)
        o.put("type", r.kind)
        o.put("snapshot-id", r.snapshotId)
      }
    }
    // properties
    val setProps = next.properties.filter { case (k, v) =>
      !base.properties.get(k).contains(v) }
    if (setProps.nonEmpty) {
      val o = ups.addObject()
      o.put("action", "set-properties")
      val u = o.putObject("updates")
      setProps.toSeq.sortBy(_._1).foreach { case (k, v) => u.put(k, v) }
    }
    val removedProps = base.properties.keys.filterNot(next.properties.contains)
    if (removedProps.nonEmpty) {
      val o = ups.addObject()
      o.put("action", "remove-properties")
      val r = o.putArray("removals")
      removedProps.toSeq.sorted.foreach(r.add)
    }
    CommitProposal(reqs, ups)
  }

  // ------------------------------------------------------ requirements

  /** First violated requirement, as a CommitFailedException message; None
    * when the commit may apply.
    */
  def checkRequirements(cur: TableMeta, reqs: JsonNode): Option[String] = {
    var err: Option[String] = None
    reqs.forEach { r =>
      if (err.isEmpty) r.get("type").asText() match {
        case "assert-version" =>
          val want = r.get("version").asInt()
          if (cur.version != want)
            err = Some(s"Requirement failed: version is ${cur.version}, expected $want")
        case "assert-ref-snapshot-id" =>
          val ref = r.get("ref").asText()
          val want = Option(r.get("snapshot-id")).filterNot(_.isNull).map(_.asLong())
          val have =
            if (ref == MainRef) cur.currentSnapshotId
            else cur.refs.get(ref).map(_.snapshotId)
          if (have != want)
            err = Some(s"Requirement failed: ref '$ref' is at " +
              s"${have.getOrElse("absent")}, expected ${want.getOrElse("absent")}")
        case "assert-create" =>
          err = Some("Requirement failed: table already exists")
        case other =>
          err = Some(s"unsupported requirement type: $other")
      }
    }
    err
  }

  // ----------------------------------------------------------- apply

  def applyUpdates(cur: TableMeta, ups: JsonNode): TableMeta = {
    var snaps = cur.snapshots
    var schema = cur.schema
    var hist = cur.schemasHistory
    var curSchemaId = cur.currentSchemaId
    var specs = cur.specs
    var curSpecId = cur.currentSpecId
    var curSnap = cur.currentSnapshotId
    var refs = cur.refs
    var props = cur.properties
    ups.forEach { u =>
      u.get("action").asText() match {
        case "remove-snapshots" =>
          val ids = scala.collection.mutable.Set[Long]()
          u.get("snapshot-ids").forEach(n => { ids += n.asLong(); () })
          snaps = snaps.filterNot(s => ids(s.id))
        case "add-snapshot" =>
          val s = snapshotFromNode(u.get("snapshot"))
          // keep the id-sorted invariant: every producer's snapshot list
          // ascends (the engine allocates max+1 and appends; expiration
          // filters preserve order), so an add must land in id POSITION.
          // A plain append breaks round-tripping when an expire freed the
          // max id and a later add reuses it: apply would put the reborn
          // id after younger ones and diff/apply stops being the identity
          // (found by MetaDiffFuzzSpec).
          snaps = (snaps.filterNot(_.id == s.id) :+ s).sortBy(_.id)
        case "add-schema" =>
          val v = SchemaVersion(u.get("schema-id").asInt(),
            schemaFromNode(u.get("schema")))
          hist =
            if (hist.exists(_.id == v.id))
              hist.map(x => if (x.id == v.id) v else x)
            else hist :+ v
        case "set-current-schema" =>
          curSchemaId = u.get("schema-id").asInt()
          schema = schemaFromNode(u.get("schema"))
        case "add-spec" =>
          val s = specFromNode(u.get("spec"))
          specs =
            if (specs.exists(_.specId == s.specId))
              specs.map(x => if (x.specId == s.specId) s else x)
            else specs :+ s
        case "set-default-spec" =>
          curSpecId = u.get("spec-id").asInt()
        case "set-snapshot-ref" =>
          val name = u.get("ref-name").asText()
          if (name == MainRef)
            curSnap = Option(u.get("snapshot-id")).filterNot(_.isNull).map(_.asLong())
          else {
            // malformed non-main refs (missing/null type or snapshot-id)
            // must refuse as IllegalArgument — the server maps that to a
            // spec 400 BadRequestException, not an opaque NPE 500
            val typ = Option(u.get("type")).filterNot(_.isNull)
              .getOrElse(throw new IllegalArgumentException(
                s"set-snapshot-ref '$name': missing 'type'")).asText()
            val sid = Option(u.get("snapshot-id")).filterNot(_.isNull)
              .getOrElse(throw new IllegalArgumentException(
                s"set-snapshot-ref '$name': missing 'snapshot-id'")).asLong()
            refs = refs.updated(name, Ref(typ, sid))
          }
        case "remove-snapshot-ref" =>
          refs = refs - u.get("ref-name").asText()
        case "set-properties" =>
          val ud = u.get("updates")
          ud.fieldNames().forEachRemaining(k =>
            props = props.updated(k, ud.get(k).asText()))
        case "remove-properties" =>
          u.get("removals").forEach(n => props = props - n.asText())
        case other =>
          throw new IllegalArgumentException(s"unsupported update action: $other")
      }
    }
    cur.copy(version = cur.version + 1, schema = schema, specs = specs,
      currentSpecId = curSpecId, snapshots = snaps, currentSnapshotId = curSnap,
      properties = props, refs = refs, schemasHistory = hist,
      currentSchemaId = curSchemaId)
  }

  // --------------------------------------------------- node encoders

  private def schemaToNode(s: StructType): ObjectNode =
    mapper.readTree(s.json).asInstanceOf[ObjectNode]

  private def schemaFromNode(n: JsonNode): StructType =
    DataType.fromJson(n.toString).asInstanceOf[StructType]

  private def snapshotToNode(s: Snapshot): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("snapshot-id", s.id)
    s.parentId.foreach(o.put("parent-snapshot-id", _))
    o.put("timestamp-ms", s.timestampMs)
    o.put("operation", s.operation)
    o.put("manifest", s.manifest)
    o.put("added-files", s.addedFiles)
    o.put("total-files", s.totalFiles)
    o.put("total-records", s.totalRecords)
    o.put("schema-id", s.schemaId)
    o
  }

  private def snapshotFromNode(n: JsonNode): Snapshot = Snapshot(
    n.get("snapshot-id").asLong(),
    Option(n.get("parent-snapshot-id")).map(_.asLong()),
    n.get("timestamp-ms").asLong(),
    n.get("operation").asText(),
    n.get("manifest").asText(),
    n.get("added-files").asLong(),
    n.get("total-files").asLong(),
    n.get("total-records").asLong(),
    n.get("schema-id").asInt())

  private def specToNode(s: PartitionSpec): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("spec-id", s.specId)
    val fa = o.putArray("fields")
    s.fields.foreach { f =>
      val fo = fa.addObject()
      fo.put("source-id", f.source)
      fo.put("transform", f.transform)
      fo.put("name", f.name)
    }
    o
  }

  private def specFromNode(n: JsonNode): PartitionSpec = {
    val fields = Seq.newBuilder[PartitionField]
    n.get("fields").forEach { fo =>
      fields += PartitionField(fo.get("source-id").asText(),
        fo.get("transform").asText(), fo.get("name").asText())
    }
    PartitionSpec(n.get("spec-id").asInt(), fields.result())
  }
}
