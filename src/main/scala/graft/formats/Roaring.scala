package graft.formats

import java.nio.{ByteBuffer, ByteOrder}

/** From-scratch 64-bit Roaring bitmap PORTABLE serialization — the wire
  * format Iceberg v3 deletion vectors mandate (`deletion-vector-v1`
  * Puffin blobs carry "a RoaringBitmap in the 64-bit portable
  * serialization"). Written against the PUBLIC RoaringFormatSpec only;
  * the RoaringBitmap jar Spark carries is used as a TEST-SIDE referee
  * (RoaringSpec cross-checks both directions against
  * `Roaring64NavigableMap.serializePortable/deserializePortable`) — the
  * shipping codec takes no dependency, mirroring [[Avro]]/[[Puffin]].
  *
  * Portable 64-bit layout (everything little-endian):
  *   u64 bucket count, then per bucket in ascending key order:
  *   u32 high-32 key + one standard 32-bit roaring bitmap of the low
  *   32 bits.
  *
  * Standard 32-bit layout: cookie header (12346 `no-run` → u32 cookie,
  *   u32 container count; 12347 `with-runs` → cookie | (count-1)<<16,
  *   then a ceil(n/8)-byte run-container bitset), descriptive header
  *   (per container: u16 high-16 key, u16 cardinality-1), an offset
  *   header (u32 per container, from the start of this 32-bit bitmap;
  *   present for cookie 12346 always, for 12347 only when n ≥ 4), then
  *   container payloads in order: ARRAY (cardinality ≤ 4096: sorted u16
  *   values), BITMAP (1024 u64 words), RUN (u16 run count, then per run
  *   u16 start + u16 length-1).
  *
  * The writer always emits cookie 12346 (array/bitmap containers only —
  * spec-legal for any value set, and deletion positions rarely run);
  * the reader accepts both cookies and all three container kinds, so
  * foreign DVs written by run-optimizing implementations decode.
  */
object Roaring {

  private val NoRunCookie = 12346
  private val RunCookie = 12347
  private val NoOffsetThreshold = 4

  /** Serialize SORTED DISTINCT non-negative positions. */
  def serialize(sorted: Array[Long]): Array[Byte] = {
    var i = 0
    while (i < sorted.length) {
      require(sorted(i) >= 0, s"negative position ${sorted(i)}")
      require(i == 0 || sorted(i - 1) < sorted(i), "positions not sorted distinct")
      i += 1
    }
    // bucket = high 32 bits; container = next 16; value = low 16.
    // One pass marks bucket/container boundaries in the sorted input.
    final case class Container(key: Int, from: Int, until: Int) {
      def card: Int = until - from
    }
    final case class Bucket(key: Int, containers: Seq[Container])
    val buckets = Seq.newBuilder[Bucket]
    i = 0
    while (i < sorted.length) {
      val hb = (sorted(i) >>> 32).toInt
      val containers = Seq.newBuilder[Container]
      while (i < sorted.length && (sorted(i) >>> 32).toInt == hb) {
        val ck = ((sorted(i) >>> 16) & 0xffff).toInt
        val from = i
        while (i < sorted.length && (sorted(i) >>> 32).toInt == hb &&
          ((sorted(i) >>> 16) & 0xffff).toInt == ck) i += 1
        containers += Container(ck, from, i)
      }
      buckets += Bucket(hb, containers.result())
    }
    val bs = buckets.result()

    def payloadSize(c: Container): Int = if (c.card <= 4096) 2 * c.card else 8192
    def bitmap32Size(cs: Seq[Container]): Int =
      8 + 4 * cs.size + 4 * cs.size + cs.map(payloadSize).sum
    val total = 8 + bs.map(b => 4 + bitmap32Size(b.containers)).sum
    val buf = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    buf.putLong(bs.size.toLong)
    bs.foreach { b =>
      buf.putInt(b.key)
      val start = buf.position()
      val cs = b.containers
      buf.putInt(NoRunCookie)
      buf.putInt(cs.size)
      cs.foreach { c =>
        buf.putShort((c.key & 0xffff).toShort)
        buf.putShort(((c.card - 1) & 0xffff).toShort)
      }
      // offsets from the start of THIS 32-bit bitmap
      var off = 8 + 4 * cs.size + 4 * cs.size
      cs.foreach { c => buf.putInt(off); off += payloadSize(c) }
      cs.foreach { c =>
        if (c.card <= 4096) {
          var j = c.from
          while (j < c.until) { buf.putShort((sorted(j) & 0xffff).toShort); j += 1 }
        } else {
          val words = new Array[Long](1024)
          var j = c.from
          while (j < c.until) {
            val v = (sorted(j) & 0xffff).toInt
            words(v >>> 6) |= (1L << (v & 63))
            j += 1
          }
          var w = 0
          while (w < 1024) { buf.putLong(words(w)); w += 1 }
        }
      }
      require(buf.position() - start == bitmap32Size(cs), "size accounting bug")
    }
    buf.array()
  }

  /** Deserialize a portable 64-bit roaring bitmap to sorted positions. */
  def deserialize(bytes: Array[Byte]): Array[Long] =
    try deserialize0(bytes) catch {
      case e: IllegalArgumentException => throw e
      // untrusted-input boundary (the codec-battery contract): a hostile
      // byte stream can drive the ByteBuffer walk into underflow or the
      // count fields negative — surface the DECLARED refusal, cause kept
      case e: RuntimeException =>
        throw new IllegalArgumentException(s"corrupt roaring bitmap: " +
          s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(160)}", e)
    }

  private def deserialize0(bytes: Array[Byte]): Array[Long] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val nBuckets = buf.getLong
    require(nBuckets >= 0 && nBuckets <= Int.MaxValue, s"bucket count $nBuckets out of range")
    val out = scala.collection.mutable.ArrayBuilder.make[Long]
    var prevKey = Long.MinValue
    var b = 0L
    while (b < nBuckets) {
      val key = buf.getInt.toLong & 0xffffffffL
      // the u64 format addresses the full range, but graft positions are
      // row indexes (< 2^63): a high-bit bucket key would decode to
      // NEGATIVE longs that downstream Bitmaps.encode cannot represent —
      // refuse loudly, never fabricate. Same for out-of-order or
      // duplicate buckets: the spec mandates strictly ascending keys, and
      // silently re-sorting would mask duplicate positions.
      require(key <= 0x7fffffffL,
        s"bucket key $key out of supported position range (< 2^63)")
      require(b == 0 || key > prevKey,
        s"bucket keys not strictly ascending ($prevKey then $key)")
      prevKey = key
      val high = key << 32
      // one 32-bit roaring bitmap
      val cookie = buf.getInt
      val (nCont, runFlags) =
        if ((cookie & 0xffff) == RunCookie) {
          val n = (cookie >>> 16) + 1
          val flags = new Array[Byte]((n + 7) / 8)
          buf.get(flags)
          (n, flags)
        } else if (cookie == NoRunCookie) {
          val n = buf.getInt
          // validate BEFORE the per-container allocations: a corrupt
          // count must refuse, not drive a multi-GB allocation (OOM is
          // un-catchable — found by the hostile sweep). A 32-bit roaring
          // bitmap holds at most 65536 containers, each >= 4 header bytes.
          // n == 0 is allowed: the portable format permits an empty
          // bitmap (cookie, size 0), and a conforming foreign writer
          // (the Iceberg-interop surface this reader serves) may emit
          // one even though this serializer never does.
          require(n >= 0 && n <= 65536 && buf.remaining() >= n.toLong * 4,
            s"roaring container count $n out of range for ${buf.remaining()} bytes")
          (n, null)
        } else throw new IllegalArgumentException(
          s"unrecognized roaring cookie $cookie")
      def isRun(c: Int): Boolean =
        runFlags != null && (runFlags(c / 8) & (1 << (c % 8))) != 0
      val keys = new Array[Int](nCont)
      val cards = new Array[Int](nCont)
      var c = 0
      while (c < nCont) {
        keys(c) = buf.getShort & 0xffff
        cards(c) = (buf.getShort & 0xffff) + 1
        c += 1
      }
      // offset header: present for 12347 always; for 12346 when n >= 4.
      // Containers are stored in order, so sequential reading works —
      // consume and ignore the offsets.
      if (runFlags == null || nCont >= NoOffsetThreshold) {
        c = 0
        while (c < nCont) { buf.getInt; c += 1 }
      }
      c = 0
      while (c < nCont) {
        val base = high | (keys(c).toLong << 16)
        if (isRun(c)) {
          val nRuns = buf.getShort & 0xffff
          var r = 0
          while (r < nRuns) {
            val start = buf.getShort & 0xffff
            val len = (buf.getShort & 0xffff) + 1
            // an overflowing run would OR past bit 16 into the container
            // key — silently wrong positions; refuse instead
            require(start + len <= 65536,
              s"run [$start, +$len) overflows the 16-bit container")
            var v = start
            while (v < start + len) { out += base | v; v += 1 }
            r += 1
          }
        } else if (cards(c) <= 4096) {
          var j = 0
          while (j < cards(c)) { out += base | (buf.getShort & 0xffff); j += 1 }
        } else {
          var w = 0
          while (w < 1024) {
            var word = buf.getLong
            val wordBase = base | (w.toLong << 6)
            while (word != 0L) {
              val bit = java.lang.Long.numberOfTrailingZeros(word)
              out += wordBase | bit
              word &= word - 1
            }
            w += 1
          }
        }
        c += 1
      }
      b += 1
    }
    out.result()
  }
}
