package graft

/** Collects scale-probe measurements and writes them as ONE committed
  * JSON artifact (VERDICT r17 next-round #6 — the BPE_PROBE.json
  * pattern: SURVEY §4's scale claims cite re-runnable files the
  * driver can regenerate and diff, not archival prose). Numbers round
  * to 3 decimals so reruns diff cleanly. */
final class ProbeJson(probe: String, outPath: String) {
  private val rows = collection.mutable.ArrayBuffer[String]()

  private def fmt(v: Any): String = v match {
    case s: String =>
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    case d: Double =>
      if (d.isNaN || d.isInfinite) "null"
      else BigDecimal(d).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    case x => x.toString
  }

  def add(fields: (String, Any)*): Unit =
    rows += fields.map { case (k, v) => s""""$k":${fmt(v)}""" }
      .mkString("{", ",", "}")

  def write(extra: (String, Any)*): Unit = {
    val head = (Seq[(String, Any)]("probe" -> probe) ++ extra)
      .map { case (k, v) => s""""$k":${fmt(v)}""" }.mkString(",")
    val json = s"""{$head,\n"rows":[\n ${rows.mkString(",\n ")}\n]}\n"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      json.getBytes("UTF-8"))
    println(s"[$probe] wrote $outPath")
  }
}
