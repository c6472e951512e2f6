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

  /** ISO-8601 local-datetime string (reference `datetime.now().isoformat()`). */
  def iso(clock: Clock): String =
    clock.now().atOffset(ZoneOffset.UTC).toLocalDateTime.toString
}
