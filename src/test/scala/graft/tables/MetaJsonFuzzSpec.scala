package graft.tables

import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property fuzz for the metadata PERSISTENCE layer (the MetaDiffFuzzSpec
  * pattern pointed at serialization instead of diff/apply): random table
  * metadata and random manifests must satisfy `fromJson(toJson(x)) == x`,
  * including stat min/max TYPE preservation across the declared value
  * envelope (long / finite double / string / boolean — what FooterStats
  * produces; NaN bounds are dropped at the producer, see
  * FooterStats.scala). The scripted suites cover metadata the engine
  * writes; this covers shapes no code path has produced yet.
  */
class MetaJsonFuzzSpec extends AnyFunSuite {

  private def check(label: String, p: Prop, min: Int = 120): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(min), p)
    assert(res.passed, s"$label: $res")
  }

  private val utf: Gen[String] = Gen.listOf(Gen.frequency(
    8 -> Gen.choose(32, 126), 2 -> Gen.choose(0xA1, 0x2FA0)))
    .map(_.map(_.toChar).mkString)

  private val statValue: Gen[Any] = Gen.oneOf(
    Gen.chooseNum(Long.MinValue, Long.MaxValue).map(x => x: Any),
    Gen.chooseNum(-1e18, 1e18).map(x => x: Any),
    utf.map(x => x: Any),
    Gen.oneOf(true, false).map(x => x: Any))

  private val genColStats: Gen[ColStats] = for {
    min <- Gen.option(statValue)
    max <- Gen.option(statValue)
    nulls <- Gen.chooseNum(0L, 1L << 40)
  } yield ColStats(min, max, nulls)

  private val genStats: Gen[Map[String, ColStats]] =
    Gen.mapOf(Gen.zip(Gen.identifier, genColStats))

  private val genDataFile: Gen[DataFile] = for {
    path <- Gen.identifier.map(n => s"data/$n.parquet")
    specId <- Gen.chooseNum(0, 3)
    pv <- Gen.mapOf(Gen.zip(Gen.identifier, utf))
    records <- Gen.chooseNum(0L, 1L << 40)
    bytes <- Gen.chooseNum(0L, 1L << 50)
    stats <- genStats
    seq <- Gen.oneOf(Gen.const(0L), Gen.chooseNum(1L, 1000L))
    trusted <- Gen.oneOf(true, false)
    frid <- Gen.option(Gen.chooseNum(0L, 1L << 40))
  } yield DataFile(path, specId, pv, records, bytes, stats, seq, trusted, frid)

  private val genEqDelete: Gen[EqualityDelete] = for {
    cols <- Gen.nonEmptyListOf(Gen.identifier)
    files <- Gen.nonEmptyListOf(Gen.identifier.map(n => s"deletes/$n.parquet"))
    seq <- Gen.chooseNum(1L, 1000L)
    stats <- genStats
  } yield EqualityDelete(cols.distinct, files, seq, stats)

  test("manifest toJson/fromJson is the identity, stat types preserved") {
    val gen = for {
      files <- Gen.listOf(genDataFile)
      preds <- Gen.listOf(Gen.identifier.map(c => s"$c > 5"))
      pos <- Gen.listOf(Gen.identifier.map(n => s"deletes/$n.parquet"))
      eqs <- Gen.listOf(genEqDelete)
    } yield (files, preds, pos, eqs)
    check("manifest", Prop.forAll(gen) { case (files, preds, pos, eqs) =>
      val json = MetaIO.manifestToJson(files, preds, pos, eqs)
      MetaIO.manifestData(json) == ManifestData(files, preds, pos, eqs)
    })
  }

  private val genSnapshot: Gen[Snapshot] = for {
    id <- Gen.chooseNum(1L, 1L << 60)
    parent <- Gen.option(Gen.chooseNum(1L, 1L << 60))
    ts <- Gen.chooseNum(1L, 1L << 42)
    op <- Gen.oneOf("append", "delete", "merge", "replace", "update")
    files <- Gen.chooseNum(0L, 100L)
    records <- Gen.chooseNum(0L, 100000L)
    schemaId <- Gen.chooseNum(0, 3)
  } yield Snapshot(id, parent, ts, op, s"manifest-$id.json", files, files,
    records, schemaId)

  private def genSchema(nCols: Int): StructType = StructType(
    (0 until nCols).map(i => StructField(s"c$i",
      if (i % 2 == 0) LongType else StringType)))

  private val genMeta: Gen[TableMeta] = for {
    version <- Gen.chooseNum(1, 1 << 20)
    snapsRaw <- Gen.listOf(genSnapshot)
    snaps = snapsRaw.groupBy(_.id).values.map(_.head).toSeq.sortBy(_.id)
    current <- if (snaps.isEmpty) Gen.const(None)
               else Gen.option(Gen.oneOf(snaps.map(_.id)))
    nCols <- Gen.choose(1, 5)
    props <- Gen.mapOf(Gen.zip(Gen.identifier, utf))
    refs <- Gen.mapOf(Gen.zip(Gen.identifier,
      Gen.zip(Gen.oneOf("tag", "branch"), Gen.chooseNum(1L, 1L << 60))
        .map { case (k, s) => Ref(k, s) }))
    nSpecs <- Gen.choose(1, 3)
    // invariant: current_schema_id rides the schemas array — without
    // history it is 0 (the engine never evolves without appending)
    hist <- Gen.oneOf(true, false)
  } yield TableMeta("/tmp/fuzz", version, genSchema(nCols),
    (0 until nSpecs).map(i => PartitionSpec(i,
      if (i == 0) Nil else Seq(PartitionField("c0", "identity", s"p$i")))),
    nSpecs - 1, snaps, current, props, refs,
    if (hist) Seq(SchemaVersion(0, genSchema(2)), SchemaVersion(1, genSchema(nCols))) else Nil,
    if (hist) 1 else 0)

  test("table metadata toJson/fromJson is the identity") {
    check("meta", Prop.forAll(genMeta) { m =>
      MetaIO.metaFromJson(MetaIO.metaToJson(m)) == m
    })
  }
}
