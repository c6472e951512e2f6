package graft.output

import java.time.ZoneOffset
import java.time.format.DateTimeFormatter

/** Shared formatting helpers behind the artifact-naming contracts
  * (request ids, filenames, ISO timestamps) — one implementation so the
  * reference's md5-shortening / timestamp formats can't silently diverge
  * between OutputManager and RequestRunner.
  */
object Fmt {
  private val stampFmt =
    DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss").withZone(ZoneOffset.UTC)

  def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** `yyyyMMdd_HHmmss` UTC stamp used in request ids and filenames. */
  def stamp(clock: Clock): String = stampFmt.format(clock.now())

  private val isoSecondsFmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss").withZone(ZoneOffset.UTC)

  /** ISO-8601 local-datetime string matching Python
    * `datetime.isoformat()` EXACTLY: seconds always printed (Java's
    * LocalDateTime.toString drops ":00"), fraction either absent or
    * exactly 6 digits (Python has µs resolution; Java would print 3 or 9
    * digits and omit zero fractions differently).
    */
  def iso(clock: Clock): String = {
    val now = clock.now()
    val base = isoSecondsFmt.format(now)
    val micros = now.getNano / 1000
    if (micros == 0) base else f"$base.$micros%06d"
  }

  /** ISO-8601 with explicit `+00:00` offset (reference
    * `datetime.now(timezone.utc).isoformat()`, `src/pipeline.py:87` —
    * Python spells UTC `+00:00`, Java's OffsetDateTime prints `Z`).
    */
  def isoUtcOffset(clock: Clock): String = iso(clock) + "+00:00"

  /** Python `repr(float)` — the exact string pandas `to_csv` emits for a
    * double. Both Python and this produce the SHORTEST decimal string
    * that round-trips to the same IEEE double, found by probing 1..17
    * significant digits; they then differ from Java's `Double.toString`
    * only in formatting: Python stays positional for exponents in
    * [-4, 16) (Java switches to scientific outside [1e-3, 1e7)) and
    * spells scientific as `1.5e+20` / `1e-05`.
    */
  def pyFloat(d: Double): String = {
    if (d.isNaN) return "nan"
    if (d.isInfinite) return if (d > 0) "inf" else "-inf"
    if (d == 0.0)
      return if (java.lang.Double.doubleToRawLongBits(d) != 0L) "-0.0" else "0.0"
    val neg = d < 0
    val x = math.abs(d)
    var sci: String = null
    var p = 1
    while (sci == null && p <= 17) {
      val cand = String.format(java.util.Locale.ROOT, s"%.${p - 1}e", Double.box(x))
      if (cand.toDouble == x) sci = cand
      p += 1
    }
    val Array(mant, expStr) = sci.split("e")
    val exp = expStr.toInt
    val digits = mant.replace(".", "")
    val body =
      if (exp >= 16 || exp < -4) {
        val m = if (digits.length == 1) digits else s"${digits.head}.${digits.tail}"
        val sign = if (exp < 0) "-" else "+"
        s"${m}e$sign${"%02d".format(math.abs(exp))}"
      } else if (exp >= digits.length - 1) {
        digits + "0" * (exp - (digits.length - 1)) + ".0"
      } else if (exp >= 0) {
        digits.substring(0, exp + 1) + "." + digits.substring(exp + 1)
      } else {
        "0." + "0" * (-exp - 1) + digits
      }
    if (neg) "-" + body else body
  }
}
