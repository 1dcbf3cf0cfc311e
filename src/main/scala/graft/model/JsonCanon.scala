package graft.model

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Canonical JSON for content hashing: object keys sorted, no
  * whitespace, arrays kept in order, scalars in Jackson's compact
  * form. The driver-gate hash check on `cnics_patient_resources` and
  * the golden-JSON specs share this form, so a serialization change
  * that alters CONTENT turns the gate red while a mere key-order or
  * whitespace difference cannot.
  *
  * Reference context: cnics_to_fhir.py emits resources via
  * fhirclient's `as_json()` (dict order); canonicalization makes the
  * cross-engine comparison order-independent.
  */
object JsonCanon extends Serializable {
  @transient private lazy val mapper = new ObjectMapper()

  def canonical(json: String): String = render(mapper.readTree(json))

  def sha256Canonical(json: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(canonical(json).getBytes("UTF-8"))
    d.map(b => f"$b%02x").mkString
  }

  private def render(n: JsonNode): String =
    if (n.isObject)
      n.fields().asScala.toSeq.map(e => (e.getKey, e.getValue))
        .sortBy(_._1)
        .map { case (k, v) =>
          com.fasterxml.jackson.databind.node.TextNode.valueOf(k).toString +
            ":" + render(v)
        }
        .mkString("{", ",", "}")
    else if (n.isArray)
      n.elements().asScala.map(render).mkString("[", ",", "]")
    else n.toString // scalars: Jackson compact form (quoted/escaped strings)
}
