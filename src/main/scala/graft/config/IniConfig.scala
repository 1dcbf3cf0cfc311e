package graft.config

/** Minimal INI parsing for the reference's config surface (A8):
  * settings/secrets/job-config, quote stripping, `%%` unescaping, and
  * `site_list:db_name:resource_list` job specs
  * (cnics_to_fhir.py:180-185, 219-222, 251-255). Plain Scala — config
  * is control plane, not data plane. */
object IniConfig {

  final case class JobSpec(sites: Seq[String], dbName: String, resources: Set[String])

  def parse(text: String): Map[String, Map[String, String]] = {
    val out = scala.collection.mutable.Map[String, scala.collection.mutable.Map[String, String]]()
    var section = ""
    text.linesIterator.foreach { raw =>
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith("#") && !line.startsWith(";")) {
        if (line.startsWith("[") && line.endsWith("]")) {
          section = line.substring(1, line.length - 1)
          out.getOrElseUpdate(section, scala.collection.mutable.Map())
        } else line.split("=", 2) match {
          case Array(k, v) =>
            out.getOrElseUpdate(section, scala.collection.mutable.Map())
              .update(k.trim, stripQuotes(v.trim))
          case _ => ()
        }
      }
    }
    out.map { case (k, v) => k -> v.toMap }.toMap
  }

  /** The reference strips surrounding double quotes everywhere
    * (`.strip('"')`, cnics_to_fhir.py:74-101 et al.). */
  def stripQuotes(s: String): String = s.stripPrefix("\"").stripSuffix("\"")

  /** configparser escapes literal % as %% — undo before handing the
    * fragment to Spark's expr() (SURVEY.md §2 C3). */
  def unescapeIni(s: String): String = s.replace("%%", "%")

  /** `"site1 site2:db:resourceA resourceB"` (cnics_to_fhir.py:251-255). */
  def parseJobSpec(spec: String): JobSpec = {
    val parts = stripQuotes(spec).split(":")
    JobSpec(
      parts(0).split("[ ,]+").filter(_.nonEmpty).toSeq,
      if (parts.length > 1) parts(1) else "",
      if (parts.length > 2) parts(2).split("[ ,]+").filter(_.nonEmpty).map(_.toLowerCase).toSet
      else Set())
  }
}
