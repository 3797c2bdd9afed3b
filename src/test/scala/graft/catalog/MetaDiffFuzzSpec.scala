package graft.catalog

import graft.tables._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property fuzz for the catalog commit vocabulary: random metadata
  * transitions (snapshot add/remove/mutate, pointer moves, ref churn,
  * schema/spec evolution, property churn — composed in random
  * combinations) must satisfy `applyUpdates(base, diff(base, next)) ==
  * next` and pass their own requirements. The scripted battery in
  * RestCatalogSpec covers the transitions the ENGINE produces; this
  * covers transitions no code path has produced yet.
  */
class MetaDiffFuzzSpec extends AnyFunSuite {

  private def check(label: String, p: Prop, min: Int = 120): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(min), p)
    assert(res.passed, s"$label: $res")
  }

  private val genSnapshot: Gen[Snapshot] = for {
    id <- Gen.chooseNum(1L, 50L)
    parent <- Gen.option(Gen.chooseNum(1L, 50L))
    ts <- Gen.chooseNum(1L, 1L << 40)
    op <- Gen.oneOf("append", "delete", "merge", "replace", "update")
    files <- Gen.chooseNum(0L, 100L)
    records <- Gen.chooseNum(0L, 100000L)
    schemaId <- Gen.chooseNum(0, 3)
  } yield Snapshot(id, parent, ts, op, s"manifest-$id.json", files, files,
    records, schemaId)

  private def genSchema(nCols: Int): StructType = StructType(
    (0 until nCols).map(i => StructField(s"c$i",
      if (i % 2 == 0) LongType else StringType)))

  private val genBase: Gen[TableMeta] = for {
    version <- Gen.chooseNum(1, 30)
    snapsRaw <- Gen.listOf(genSnapshot)
    snaps = snapsRaw.groupBy(_.id).values.map(_.head).toSeq.sortBy(_.id)
    current <- if (snaps.isEmpty) Gen.const(None)
               else Gen.option(Gen.oneOf(snaps.map(_.id)))
    nCols <- Gen.choose(1, 5)
    props <- Gen.mapOf(Gen.zip(Gen.identifier, Gen.identifier))
    refs <- Gen.mapOf(Gen.zip(
      Gen.identifier.suchThat(_ != "main"),
      Gen.zip(Gen.oneOf("tag", "branch"), Gen.chooseNum(1L, 50L))
        .map { case (k, s) => Ref(k, s) }))
    nSpecs <- Gen.choose(1, 3)
  } yield TableMeta("/tmp/fuzz", version, genSchema(nCols),
    (0 until nSpecs).map(i => PartitionSpec(i,
      if (i == 0) Nil else Seq(PartitionField("c0", "identity", s"p$i")))),
    0, snaps, current, props, refs,
    if (nCols > 2) Seq(SchemaVersion(0, genSchema(2)), SchemaVersion(1, genSchema(nCols))) else Nil,
    if (nCols > 2) 1 else 0)

  /** One random mutation — the commit shapes a transition composes. */
  private def genMutation(m: TableMeta): Gen[TableMeta] = {
    val addSnap = genSnapshot.map { s0 =>
      val s = s0.copy(id = (m.snapshots.map(_.id).maxOption.getOrElse(0L)) + 1)
      m.copy(snapshots = m.snapshots :+ s, currentSnapshotId = Some(s.id))
    }
    val dropSnaps =
      if (m.snapshots.isEmpty) addSnap
      else Gen.someOf(m.snapshots).map { dropped =>
        val kept = m.snapshots.filterNot(dropped.contains)
        m.copy(snapshots = kept,
          currentSnapshotId = m.currentSnapshotId.filter(id => kept.exists(_.id == id)))
      }
    val mutateSnap =
      if (m.snapshots.isEmpty) addSnap
      else for {
        victim <- Gen.oneOf(m.snapshots)
        newManifest <- Gen.identifier
      } yield m.copy(snapshots = m.snapshots.map(s =>
        if (s.id == victim.id) s.copy(manifest = s"$newManifest.json") else s))
    val movePointer =
      if (m.snapshots.isEmpty) addSnap
      else Gen.oneOf(m.snapshots).map(s => m.copy(currentSnapshotId = Some(s.id)))
    val propChurn = for {
      add <- Gen.mapOf(Gen.zip(Gen.identifier, Gen.identifier))
      removed <- Gen.someOf(m.properties.keys.toSeq)
    } yield m.copy(properties = m.properties -- removed ++ add)
    val refChurn = for {
      name <- Gen.identifier.suchThat(_ != "main")
      kind <- Gen.oneOf("tag", "branch")
      snap <- Gen.chooseNum(1L, 50L)
      removed <- Gen.someOf(m.refs.keys.toSeq)
    } yield m.copy(refs = m.refs -- removed + (name -> Ref(kind, snap)))
    val evolveSchema = Gen.choose(2, 6).map { n =>
      val next = genSchema(n)
      m.copy(schema = next, currentSchemaId = m.currentSchemaId + 1,
        schemasHistory = m.schemasHistory :+ SchemaVersion(m.currentSchemaId + 1, next))
    }
    val evolveSpec = Gen.const {
      val id = m.specs.map(_.specId).max + 1
      m.copy(specs = m.specs :+ PartitionSpec(id,
        Seq(PartitionField("c0", "bucket[4]", s"b$id"))), currentSpecId = id)
    }
    Gen.oneOf(addSnap, dropSnaps, mutateSnap, movePointer, propChurn,
      refChurn, evolveSchema, evolveSpec)
  }

  test("diff/apply is the identity on RANDOM metadata transitions") {
    val gen = for {
      base <- genBase
      n <- Gen.choose(1, 4)
      next <- (1 to n).foldLeft(Gen.const(base))((g, _) => g.flatMap(genMutation))
    } yield (base, next.copy(version = base.version + 1))
    check("metadiff", Prop.forAll(gen) { case (base, next) =>
      val p = MetaDiff.diff(base, next)
      MetaDiff.checkRequirements(base, p.requirements).isEmpty &&
        MetaDiff.applyUpdates(base, p.updates) == next
    })
  }

  test("drop-then-readd of a freed max id round-trips (fuzz counterexample)") {
    // expire snapshot 50, then two commits re-allocate ids 49 and 50: the
    // reborn 50 has NEW content and must land in id position, not at the
    // list tail where a plain apply-append would put it
    def snap(id: Long, ts: Long): Snapshot =
      Snapshot(id, None, ts, "append", s"manifest-$id.json", 1, 1, 1, 0)
    val base = TableMeta("/tmp/fuzz", 3, genSchema(2),
      Seq(PartitionSpec(0, Nil)), 0,
      Seq(snap(4, 10), snap(48, 20), snap(50, 30)), Some(50), Map(), Map(), Nil, 0)
    val next = base.copy(version = 4,
      snapshots = Seq(snap(4, 10), snap(48, 20), snap(49, 40), snap(50, 99)),
      currentSnapshotId = Some(50))
    val p = MetaDiff.diff(base, next)
    assert(MetaDiff.checkRequirements(base, p.requirements).isEmpty)
    assert(MetaDiff.applyUpdates(base, p.updates) == next)
  }

  test("requirements refuse every out-of-date base") {
    val gen = for {
      base <- genBase
      next <- genMutation(base).map(_.copy(version = base.version + 1))
      // the interloper commit that makes `base` stale
      moved <- genMutation(base).map(_.copy(version = base.version + 1))
        .suchThat(m => m.currentSnapshotId != base.currentSnapshotId ||
          m.version != base.version)
    } yield (base, next, moved)
    check("stale", Prop.forAll(gen) { case (base, next, moved) =>
      val p = MetaDiff.diff(base, next)
      // against the MOVED state, at least the version assertion fails
      MetaDiff.checkRequirements(moved, p.requirements).isDefined
    }, min = 80)
  }
}
