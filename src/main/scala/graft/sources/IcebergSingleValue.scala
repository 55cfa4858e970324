package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.types._

/** Iceberg's "Binary single-value serialization" (table spec, Appendix D)
  * — the byte encoding manifest `lower_bounds`/`upper_bounds` carry, keyed
  * by field id:
  *
  *   - boolean: 1 byte, 0x00 false / 0x01 true
  *   - int (+ date, as days from epoch): 4-byte little-endian
  *   - long (+ timestamp/timestamptz, as micros from epoch): 8-byte LE
  *   - float / double: IEEE-754 bits, little-endian
  *   - string: UTF-8 bytes
  *   - decimal(p, s): minimal two's-complement BIG-endian unscaled value
  *     at the type's scale
  *
  * This catalog's stats travel internally as STRINGS (the exact renderings
  * the pruners parse back — [[graft.sources.dsv2.WriterStats]]); this
  * codec converts between that string domain and the spec bytes so
  * exported manifests are stock-consumable and stock manifests import.
  * Both directions are total functions onto Option: an unparseable string
  * or an unmappable type drops the bound (bounds are a pruning
  * optimization — a dropped bound only costs a file open, a WRONG bound
  * silently prunes matching rows).
  */
object IcebergSingleValue {

  private def le(n: Long, width: Int): Array[Byte] =
    Array.tabulate(width)(i => ((n >>> (8 * i)) & 0xff).toByte)

  private def leLong(b: Array[Byte]): Option[Long] =
    if (b.length < 1 || b.length > 8) None
    else {
      var v = 0L
      var i = b.length - 1
      while (i >= 0) { v = (v << 8) | (b(i) & 0xffL); i -= 1 }
      // sign-extend from the declared width
      val shift = 64 - 8 * b.length
      Some((v << shift) >> shift)
    }

  // The catalog's timestamp stats strings come from Spark's
  // cast-to-string ("yyyy-MM-dd HH:mm:ss[.fraction]"), which renders a
  // TIMESTAMPTZ (TimestampType) instant in `spark.sql.session.timeZone`
  // and a TIMESTAMP_NTZ wall-clock verbatim. The codec must convert
  // through the SAME zone per type, or on a non-UTC session every
  // exported binary timestamptz bound shifts by the zone offset — and a
  // stock engine pruning on the shifted bound silently skips files that
  // contain matching rows (the exact hazard the class doc warns about).
  // NTZ wall-clocks convert via UTC by definition (zone-free domain).
  private def sessionZone: java.time.ZoneId =
    try java.time.ZoneId.of(
      org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
    catch { case _: RuntimeException => java.time.ZoneOffset.UTC }

  private def zoneFor(dt: DataType): java.time.ZoneId = dt match {
    case TimestampType => sessionZone
    case _ => java.time.ZoneOffset.UTC
  }

  // parse also accepts the ISO 'T' separator and a raw micros long.
  // A wall-clock that is AMBIGUOUS or SKIPPED in the zone (the DST
  // fall-back / spring-forward hours) has no single instant — encoding
  // either candidate offset could shift a bound across real rows, so the
  // bound DROPS (absence never prunes; a wrong bound silently would).
  private def parseMicros(s: String, zone: java.time.ZoneId): Option[Long] =
    s.toLongOption.orElse {
      try {
        val iso = s.trim.replace(' ', 'T')
        val ldt =
          if (iso.contains("T")) java.time.LocalDateTime.parse(iso)
          else java.time.LocalDate.parse(iso).atStartOfDay()
        if (zone.getRules.getValidOffsets(ldt).size != 1) None
        else {
          val inst = ldt.atZone(zone).toInstant
          Some(Math.addExact(
            Math.multiplyExact(inst.getEpochSecond, 1000000L),
            inst.getNano / 1000L))
        }
      } catch { case _: RuntimeException => None }
    }

  private def renderMicros(us: Long, zone: java.time.ZoneId): String = {
    val secs = Math.floorDiv(us, 1000000L)
    val frac = Math.floorMod(us, 1000000L)
    val ldt = java.time.LocalDateTime.ofInstant(
      java.time.Instant.ofEpochSecond(secs, frac * 1000L), zone)
    val base = f"${ldt.getYear}%04d-${ldt.getMonthValue}%02d-" +
      f"${ldt.getDayOfMonth}%02d ${ldt.getHour}%02d:${ldt.getMinute}%02d:" +
      f"${ldt.getSecond}%02d"
    if (frac == 0L) base
    else base + "." + f"$frac%06d".reverse.dropWhile(_ == '0').reverse
  }

  /** Encode honoring the column's PHYSICAL Iceberg type annotation
    * ([[FieldIds.IcebergTypeKey]]) where the Spark mapping is lossy:
    *
    *   - `uuid` (Spark string, canonical 8-4-4-4-12 form): 16 bytes
    *     big-endian, per Appendix D
    *   - `fixed[n]` (Spark binary, hex string rendering): the raw n
    *     bytes, length-checked — hex is the catalog's string domain for
    *     fixed because it is total AND order-preserving (lowercase hex of
    *     bytes sorts like unsigned bytes, so lexical pruning stays sound)
    *   - `time` / `timestamp_ns` / `timestamptz_ns` (Spark long of µs /
    *     ns): the plain long path already matches the spec's 8-byte LE
    *     layout — no branch needed
    */
  def encode(dt: DataType, s: String, physical: Option[String]): Option[Array[Byte]] =
    physical match {
      case Some("uuid") =>
        try {
          val u = java.util.UUID.fromString(s.trim)
          val bb = java.nio.ByteBuffer.allocate(16)
          bb.putLong(u.getMostSignificantBits)
          bb.putLong(u.getLeastSignificantBits)
          Some(bb.array())
        } catch { case _: RuntimeException => None }
      case Some(fx) if fx.startsWith("fixed[") =>
        val n = fx.stripPrefix("fixed[").stripSuffix("]").toIntOption
        val hex = s.trim.toLowerCase(java.util.Locale.ROOT)
        if (hex.length % 2 != 0 || !hex.forall(c =>
          (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f'))) None
        else {
          val bytes = hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
          if (n.contains(bytes.length)) Some(bytes) else None
        }
      case _ => encode(dt, s)
    }

  /** Spec bytes → string rendering, honoring the physical annotation —
    * the inverse of the 3-arg [[encode]].
    */
  def decode(dt: DataType, b: Array[Byte], physical: Option[String]): Option[String] =
    physical match {
      case Some("uuid") =>
        if (b.length != 16) None
        else {
          val bb = java.nio.ByteBuffer.wrap(b)
          Some(new java.util.UUID(bb.getLong, bb.getLong).toString)
        }
      case Some(fx) if fx.startsWith("fixed[") =>
        val n = fx.stripPrefix("fixed[").stripSuffix("]").toIntOption
        if (!n.contains(b.length)) None
        else Some(b.map(x => f"${x & 0xff}%02x").mkString)
      case _ => decode(dt, b)
    }

  /** String rendering → spec bytes for `dt`. Lenient on integrals ("1.0"
    * accepted — [[graft.wire.WireBridge]]'s historical coercion) and on
    * dates/timestamps (ISO strings or raw epoch numbers).
    */
  def encode(dt: DataType, s: String): Option[Array[Byte]] =
    try dt match {
      case BooleanType => s.toBooleanOption.map(b =>
        Array[Byte](if (b) 1 else 0))
      case ByteType | ShortType | IntegerType =>
        // exact integer parse first; the double coercion ("1.0") is a
        // lenient fallback and must never cost large values their low bits
        s.toIntOption.map(_.toLong)
          .orElse(Some(s.toDouble.toInt.toLong)).map(le(_, 4))
      case LongType =>
        s.toLongOption.orElse(Some(s.toDouble.toLong)).map(le(_, 8))
      case FloatType =>
        Some(le(java.lang.Float.floatToIntBits(s.toFloat).toLong, 4))
      case DoubleType =>
        Some(le(java.lang.Double.doubleToLongBits(s.toDouble), 8))
      case StringType => Some(s.getBytes(StandardCharsets.UTF_8))
      case DateType =>
        s.toIntOption.map(_.toLong)
          .orElse(try Some(java.time.LocalDate.parse(s).toEpochDay)
            catch { case _: RuntimeException => None })
          .map(le(_, 4))
      case TimestampType | TimestampNTZType =>
        parseMicros(s, zoneFor(dt)).map(le(_, 8))
      case d: DecimalType =>
        val bd = new java.math.BigDecimal(s)
          .setScale(d.scale, java.math.RoundingMode.UNNECESSARY)
        Some(bd.unscaledValue.toByteArray) // minimal two's-complement BE
      case _ => None // binary/nested: no string rendering exists to encode
    } catch { case _: RuntimeException => None }

  /** Spec bytes → the string rendering this catalog's pruners parse. */
  def decode(dt: DataType, b: Array[Byte]): Option[String] =
    try dt match {
      case BooleanType =>
        if (b.length != 1) None else Some((b(0) != 0).toString)
      case ByteType | ShortType | IntegerType =>
        if (b.length != 4) None else leLong(b).map(_.toInt.toString)
      case LongType =>
        if (b.length != 8) None else leLong(b).map(_.toString)
      case FloatType =>
        if (b.length != 4) None
        else leLong(b).map(v =>
          java.lang.Float.intBitsToFloat(v.toInt).toString)
      case DoubleType =>
        if (b.length != 8) None
        else leLong(b).map(v =>
          java.lang.Double.longBitsToDouble(v).toString)
      case StringType => Some(new String(b, StandardCharsets.UTF_8))
      case DateType =>
        if (b.length != 4) None
        else leLong(b).map(d =>
          java.time.LocalDate.ofEpochDay(d.toInt.toLong).toString)
      case TimestampType | TimestampNTZType =>
        if (b.length != 8) None
        else leLong(b).map(renderMicros(_, zoneFor(dt)))
      case d: DecimalType =>
        if (b.isEmpty) None
        else Some(new java.math.BigDecimal(
          new java.math.BigInteger(b), d.scale).toPlainString)
      case _ => None
    } catch { case _: RuntimeException => None }
}
